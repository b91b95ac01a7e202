"""Streamed convergence diagnostics in collect="moments" (SURVEY.md §6:
structured metrics incl. R̂/ESS must exist in the production sampling mode,
where samples are never materialized).

The streamed split-R̂ must EQUAL ``utils.diagnostics.split_rhat`` computed
on the materialized [S, C, n] samples of the very same run (same key →
identical chains in both collect modes).
"""

import numpy as np
import jax
import jax.numpy as jnp

from lhvi_tpu import compile_graph
from lhvi_tpu.engines import hmc, nuts
from lhvi_tpu.models.toy import hybrid_chain
from lhvi_tpu.utils.diagnostics import split_rhat


def _gaussian_pair():
    from lhvi_tpu import Domain, RV, F, Graph
    from lhvi_tpu.potentials import GaussianPotential

    dom = Domain([-20, 20], continuous=True)
    a, b = RV(dom, name="a"), RV(dom, name="b")
    g = Graph(
        [a, b],
        [F(GaussianPotential([1.0, -2.0], [[1.0, 0.6], [0.6, 2.0]]), [a, b])],
    )
    return g


def test_hmc_streamed_rhat_matches_materialized():
    g, _ = hybrid_chain()
    fg = compile_graph(g)
    cfg = hmc.HMCConfig(n_leapfrog=6, init_step_size=0.3)
    key = jax.random.PRNGKey(7)
    kw = dict(n_chains=8, n_warmup=100, n_samples=200)

    s_xc, _, _ = hmc.run_hmc(fg, key, cfg, collect="samples", **kw)
    moments, _, diag = hmc.run_hmc(fg, key, cfg, collect="moments", **kw)

    ref = np.asarray(split_rhat(s_xc))
    got = np.asarray(diag["rhat"])
    assert got.shape == (fg.n_cont,)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    # a converged short run: R̂ near 1, ESS proxy positive and ≤ n_obs-ish
    assert np.all(got < 1.3), got
    ess = np.asarray(diag["ess_proxy"])
    assert np.all(ess > 0)
    assert np.all(ess <= kw["n_samples"] * kw["n_chains"] * 1.01)


def test_nuts_streamed_rhat_matches_materialized():
    g = _gaussian_pair()
    fg = compile_graph(g)
    cfg = nuts.NUTSConfig(max_depth=5, init_step_size=0.2)
    key = jax.random.PRNGKey(3)
    kw = dict(n_chains=8, n_warmup=100, n_samples=150)

    s_xc, _, _ = nuts.run_nuts(fg, key, cfg, collect="samples", **kw)
    moments, _, diag = nuts.run_nuts(fg, key, cfg, collect="moments", **kw)

    ref = np.asarray(split_rhat(s_xc))
    got = np.asarray(diag["rhat"])
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    assert np.isfinite(np.asarray(diag["ess_proxy"])).all()


def test_streamed_rhat_detects_nonconvergence():
    """Two chain groups stuck in different regions → R̂ well above 1.

    Drive the accumulators directly (unit-level): chains 0-3 sample near
    +5, chains 4-7 near −5; any useful R̂ must flag this split."""
    from lhvi_tpu.engines.hmc import (
        _stream_diag_init, _stream_diag_update, _stream_diag_finalize,
    )

    S, C, n = 100, 8, 2
    rng = np.random.default_rng(0)
    offs = np.where(np.arange(C) < C // 2, 5.0, -5.0)[:, None]
    sd = _stream_diag_init(C, n)
    xs = rng.normal(0, 0.3, (S, C, n)) + offs[None]
    # drive under ONE jitted update: an eager lax.cond loop compiles a
    # fresh executable per iteration (branch closures bake the changing
    # accumulators in as constants) — hundreds of such executables
    # segfaulted the XLA CPU client late in the full suite
    upd = jax.jit(lambda sd, t, x: _stream_diag_update(sd, t, x, S // 2))
    for t in range(S):
        sd = upd(sd, jnp.asarray(t), jnp.asarray(xs[t], jnp.float32))
    out = _stream_diag_finalize(sd, S)
    ref = np.asarray(split_rhat(jnp.asarray(xs, jnp.float32)))
    np.testing.assert_allclose(np.asarray(out["rhat"]), ref, rtol=1e-3)
    assert np.all(np.asarray(out["rhat"]) > 2.0)


def test_gibbs_unroll_invalid_is_clamped():
    """unroll=0 (previously an obscure lax.scan error) runs fine."""
    g, _ = hybrid_chain()
    fg = compile_graph(g)
    cfg = hmc.HMCConfig(n_leapfrog=3, gibbs_unroll=0)
    moments, _, diag = hmc.run_hmc(
        fg, jax.random.PRNGKey(0), cfg,
        n_chains=4, n_warmup=5, n_samples=6, collect="moments",
    )
    assert np.isfinite(float(diag["accept_rate"]))


def test_nuts_gibbs_unroll_passthrough():
    cfg = nuts.NUTSConfig(gibbs_unroll=4)
    assert cfg.to_hmc().gibbs_unroll == 4


def test_streamed_rhat_with_thinning():
    """thin>1 streams inside the scan step; the streamed R̂ must match the
    materialized samples of the same thinned run."""
    g, _ = hybrid_chain()
    fg = compile_graph(g)
    cfg = hmc.HMCConfig(n_leapfrog=4, init_step_size=0.3)
    key = jax.random.PRNGKey(11)
    kw = dict(n_chains=6, n_warmup=60, n_samples=80, thin=3)

    s_xc, _, _ = hmc.run_hmc(fg, key, cfg, collect="samples", **kw)
    _, _, diag = hmc.run_hmc(fg, key, cfg, collect="moments", **kw)
    np.testing.assert_allclose(
        np.asarray(diag["rhat"]), np.asarray(split_rhat(s_xc)),
        rtol=2e-4, atol=2e-4,
    )
