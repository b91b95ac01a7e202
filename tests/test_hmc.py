"""Golden inference test: HMC-within-Gibbs vs exact enumeration on the
3-variable hybrid chain (BASELINE config 1; SURVEY.md §5.2)."""

import numpy as np
import jax

from lhvi_tpu import compile_graph
from lhvi_tpu.engines import hmc
from lhvi_tpu.models.toy import hybrid_chain
from lhvi_tpu.utils.oracle import ExactPosterior


def test_hmc_hybrid_chain_posterior():
    g, (d, x1, x2) = hybrid_chain()
    exact = ExactPosterior(g, cont_grid=161)
    fg = compile_graph(g)

    res = hmc.sample(
        fg,
        jax.random.PRNGKey(0),
        n_chains=32,
        n_warmup=500,
        n_samples=2000,
        cfg=hmc.HMCConfig(n_leapfrog=8, init_step_size=0.3),
    )

    assert res.diag["accept_rate"] > 0.5, res.diag
    for rv in (x1, x2):
        m_err = abs(res.mean(rv) - exact.mean(rv))
        assert m_err < 0.08, (rv, res.mean(rv), exact.mean(rv))
        v_rel = abs(res.var(rv) - exact.var(rv)) / exact.var(rv)
        assert v_rel < 0.15, (rv, res.var(rv), exact.var(rv))
    pd = res.disc_marginal(d)
    assert np.abs(pd - exact.disc_marginal(d)).max() < 0.05, (
        pd,
        exact.disc_marginal(d),
    )


def test_hmc_pure_continuous_gaussian():
    """HMC on a 2D Gaussian matches the analytic moments."""
    from lhvi_tpu import Domain, RV, F, Graph
    from lhvi_tpu.potentials import GaussianPotential

    mu = [1.0, -2.0]
    sig = [[1.0, 0.6], [0.6, 2.0]]
    dom = Domain([-20, 20], continuous=True)
    a, b = RV(dom, name="a"), RV(dom, name="b")
    g = Graph([a, b], [F(GaussianPotential(mu, sig), [a, b])])
    fg = compile_graph(g)
    res = hmc.sample(
        fg, jax.random.PRNGKey(1), n_chains=32, n_warmup=400, n_samples=1000
    )
    assert abs(res.mean(a) - 1.0) < 0.08
    assert abs(res.mean(b) + 2.0) < 0.12
    assert abs(res.var(a) - 1.0) / 1.0 < 0.15
    assert abs(res.var(b) - 2.0) / 2.0 < 0.15


def test_hmc_moments_collection_matches_exact():
    """collect="moments" streams sufficient statistics on-device; results
    must match the exact posterior like the sample-collection path (also
    exercises the fused-quadratic leapfrog fallback on CPU)."""
    from lhvi_tpu.engines import gabp
    from lhvi_tpu.models.toy import gaussian_grid

    g, _ = gaussian_grid(5, 5, seed=4, evidence_frac=0.2)
    oracle, latents = gabp.dense_gaussian_marginals(g)
    fg = compile_graph(g)
    assert fg.cont_pure_quad
    res = hmc.sample(
        fg, jax.random.PRNGKey(3), n_chains=64, n_warmup=400,
        n_samples=800, collect="moments",
    )
    errs = [abs(res.mean(rv) - oracle[id(rv)][0]) for rv in latents]
    vrel = [abs(res.var(rv) - oracle[id(rv)][1]) / oracle[id(rv)][1]
            for rv in latents]
    assert np.mean(errs) < 0.08, np.mean(errs)
    assert np.mean(vrel) < 0.2, np.mean(vrel)


def test_hmc_moments_hybrid():
    g, (d, x1, x2) = hybrid_chain()
    exact = ExactPosterior(g, cont_grid=161)
    fg = compile_graph(g)
    res = hmc.sample(
        fg, jax.random.PRNGKey(4), n_chains=64, n_warmup=400,
        n_samples=2500, collect="moments",
    )
    assert abs(res.mean(x1) - exact.mean(x1)) < 0.1
    assert np.abs(res.disc_marginal(d) - exact.disc_marginal(d)).max() < 0.05
