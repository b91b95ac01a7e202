"""Randomized engine fuzz: exact samplers vs the brute-force oracle.

Random small hybrid graphs (same generator as ``test_fuzz_compile``) are
run through the asymptotically-exact samplers — HMC-within-Gibbs and
annealed SMC — and their moments compared against
``utils.oracle.ExactPosterior`` (which never touches the compiler).
Tolerances are Monte-Carlo-sized; seeds are pinned.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lhvi_tpu import compile_graph
from lhvi_tpu.engines import hmc, smc
from lhvi_tpu.utils.oracle import ExactPosterior

from test_fuzz_compile import _rand_graph


def _small_graph(seed):
    """Reject fuzzed graphs too large for the dense oracle grid."""
    rng = np.random.default_rng(1000 + seed)
    while True:
        g = _rand_graph(rng)
        nc = sum(1 for rv in g.rvs
                 if rv.domain.continuous and rv.value is None)
        nd = [rv for rv in g.rvs
              if not rv.domain.continuous and rv.value is None]
        n_states = int(np.prod([len(rv.domain.values) for rv in nd] or [1]))
        if 1 <= nc <= 2 and n_states <= 16:
            return g


def _check(res, oracle, g, mean_tol, var_rtol, disc_tol):
    for rv in g.rvs:
        if rv.value is not None:
            continue
        if rv.domain.continuous:
            m, v = oracle.mean(rv), oracle.var(rv)
            assert abs(float(res.mean(rv)) - m) < mean_tol, (rv.name, m)
            assert abs(float(res.var(rv)) - v) < var_rtol * max(v, 0.2), (
                rv.name, v,
            )
        else:
            pw = np.asarray(res.disc_marginal(rv))
            want = oracle.disc_marginal(rv)
            assert np.abs(pw[: len(want)] - want).max() < disc_tol, (
                rv.name, pw, want,
            )


@pytest.mark.parametrize("seed", range(4))
def test_fuzzed_graph_hmc_matches_oracle(seed):
    g = _small_graph(seed)
    fg = compile_graph(g)
    oracle = ExactPosterior(g)
    res = hmc.sample(
        fg, jax.random.PRNGKey(seed),
        cfg=hmc.HMCConfig(n_leapfrog=8),
        n_chains=512, n_warmup=400, n_samples=400,
    )
    _check(res, oracle, g, mean_tol=0.12, var_rtol=0.3, disc_tol=0.05)


@pytest.mark.parametrize("seed", range(4, 6))
def test_fuzzed_graph_smc_matches_oracle(seed):
    g = _small_graph(seed)
    fg = compile_graph(g)
    oracle = ExactPosterior(g)
    res = smc.sample(
        fg, jax.random.PRNGKey(seed),
        cfg=smc.SMCConfig(n_particles=8192, n_temps=60, n_moves=2),
    )
    _check(res, oracle, g, mean_tol=0.15, var_rtol=0.35, disc_tol=0.07)
    # evidence estimate vs the oracle's Riemann log-normalizer (both are
    # w.r.t. Lebesgue x counting measure: SMC's base is normalized)
    assert abs(float(res.log_z) - oracle.log_z) < 0.2, (
        float(res.log_z), oracle.log_z,
    )


@pytest.mark.parametrize("seed", range(10, 12))
def test_fuzzed_graph_nuts_matches_oracle(seed):
    from lhvi_tpu.engines import nuts

    g = _small_graph(seed)
    fg = compile_graph(g)
    oracle = ExactPosterior(g)
    res = nuts.sample(
        fg, jax.random.PRNGKey(seed),
        cfg=nuts.NUTSConfig(max_depth=6),
        n_chains=256, n_warmup=400, n_samples=400,
    )
    _check(res, oracle, g, mean_tol=0.12, var_rtol=0.3, disc_tol=0.06)


@pytest.mark.parametrize("seed", range(12, 15))
def test_fuzzed_graph_mws_reaches_oracle_map_value(seed):
    """MaxWalkSAT's best state scores at least the oracle MAP's joint
    log-prob minus grid slop (the search may land on a better off-grid
    continuous point, never meaningfully below)."""
    from lhvi_tpu.engines.map_search import HybridMaxWalkSAT, MWSConfig

    g = _small_graph(seed)
    fg = compile_graph(g)
    oracle = ExactPosterior(g)
    ms = oracle.map_state()
    xc = np.zeros(fg.n_cont, np.float32)
    xd = np.zeros(fg.n_disc, np.int32)
    for rv, v in ms.items():
        kind, i = fg.meta.loc(rv)
        if kind == "c":
            xc[i] = v
        else:
            xd[i] = rv.domain.value_index(v)
    want = float(fg.log_prob(jnp.asarray(xc), jnp.asarray(xd)))
    eng = HybridMaxWalkSAT(
        fg, MWSConfig(n_walkers=64, n_steps=300)
    ).run(jax.random.PRNGKey(seed))
    got = float(fg.log_prob(jnp.asarray(eng.xc, jnp.float32),
                            jnp.asarray(eng.xd, jnp.int32)))
    assert got > want - 0.1, (got, want)


@pytest.mark.parametrize("seed", range(6, 10))
def test_fuzzed_graph_vi_elbo_lower_bounds_log_z(seed):
    """The quadrature ELBO (with the Jensen mixture-entropy bound) must
    lower-bound the true log-normalizer on any model — catches sign or
    measure errors in any ELBO term."""
    from lhvi_tpu.engines import vi

    g = _small_graph(seed)
    fg = compile_graph(g)
    oracle = ExactPosterior(g)
    _, trace = vi.fit(fg, jax.random.PRNGKey(seed),
                      vi.VIConfig(K=3, n_iters=400))
    final = float(np.asarray(trace)[-1])
    assert np.isfinite(final)
    assert final <= oracle.log_z + 0.05, (final, oracle.log_z)
