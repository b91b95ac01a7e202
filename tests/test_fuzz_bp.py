"""Randomized BP fuzz: structural exactness on generated trees.

Belief propagation is exact on trees, so random tree-structured models
give tight oracles for the approximate engines: HybridLBP on random
discrete trees vs brute-force enumeration, and GaBP on random Gaussian
trees vs the dense-precision oracle. Random shapes (degrees, domain
sizes, evidence patterns) sweep the bucket/gather layouts far beyond
the hand-built tree tests.
"""

import numpy as np
import jax
import pytest

from lhvi_tpu import Domain, RV, F, Graph, compile_graph
from lhvi_tpu.engines import gabp, lbp
from lhvi_tpu.potentials import (
    GaussianPotential,
    TablePotential,
    XYPotential,
)
from lhvi_tpu.utils.oracle import ExactPosterior


def _rand_tree_edges(rng, n):
    """Random labeled tree: attach node i to a uniform earlier node."""
    return [(int(rng.integers(0, i)), i) for i in range(1, n)]


@pytest.mark.parametrize("seed", range(6))
def test_lbp_exact_on_random_discrete_trees(seed):
    rng = np.random.default_rng(3000 + seed)
    n = int(rng.integers(4, 8))
    rvs = []
    for i in range(n):
        size = int(rng.integers(2, 5))
        rvs.append(RV(Domain(list(range(size))), name=f"d{i}"))
    factors = []
    for i in range(n):
        t = rng.uniform(0.2, 1.0, size=len(rvs[i].domain.values))
        factors.append(F(TablePotential(list(t)), [rvs[i]]))
    for a, b in _rand_tree_edges(rng, n):
        t = rng.uniform(0.2, 1.5, size=(len(rvs[a].domain.values),
                                        len(rvs[b].domain.values)))
        factors.append(F(TablePotential(t), [rvs[a], rvs[b]]))
    # observe one non-root node sometimes
    if rng.integers(0, 2):
        rv = rvs[int(rng.integers(1, n))]
        rv.value = rv.domain.values[
            int(rng.integers(0, len(rv.domain.values)))
        ]
    g = Graph(rvs, factors)
    oracle = ExactPosterior(g)
    eng = lbp.HybridLBP(compile_graph(g)).run(n_iters=2 * n, damping=0.0)
    for rv in rvs:
        if rv.value is not None:
            continue
        got = np.asarray(eng.disc_marginal(rv))
        want = oracle.disc_marginal(rv)
        np.testing.assert_allclose(got[: len(want)], want, atol=1e-3)


@pytest.mark.parametrize("seed", range(3))
def test_epbp_on_random_hybrid_trees(seed):
    """EPBP (stochastic approximation) on small random hybrid trees:
    tolerances sized to its P=192 single-particle-set MC error."""
    from lhvi_tpu.engines.epbp import EPBP, EPBPConfig

    rng = np.random.default_rng(5000 + seed)
    # the dense oracle enumerates a grid^n_cont product: keep n small
    n = int(rng.integers(2, 4))
    dom_c = Domain([-8, 8], continuous=True)
    rvs = [RV(dom_c, name=f"x{i}") for i in range(n)]
    d = RV(Domain([0, 1]), name="d")
    factors = [
        F(GaussianPotential([float(rng.normal())], [[2.0]]), [rv])
        for rv in rvs
    ]
    t = rng.uniform(0.3, 1.0, size=2)
    factors.append(F(TablePotential(list(t)), [d]))
    for a, b in _rand_tree_edges(rng, n):
        factors.append(
            F(XYPotential(float(rng.uniform(-0.5, 0.5)), 1.5),
              [rvs[a], rvs[b]])
        )
    from lhvi_tpu.potentials import MLNPotential

    c0 = float(rng.uniform(-1.5, 1.5))
    factors.append(
        F(MLNPotential(lambda a: -((a[1] - c0 * a[0]) ** 2) / 4.0,
                       w=1.0, formula_name="dx"), [d, rvs[0]])
    )
    g = Graph(rvs + [d], factors)
    oracle = ExactPosterior(g, cont_grid=61 if n == 3 else 121)
    eng = EPBP(compile_graph(g),
               EPBPConfig(n_particles=192, n_iters=40)).run(
        jax.random.PRNGKey(seed)
    )
    assert np.abs(
        np.asarray(eng.disc_marginal(d))[:2] - oracle.disc_marginal(d)
    ).max() < 0.1
    for rv in rvs:
        assert abs(eng.mean(rv) - oracle.mean(rv)) < 0.25, rv.name


@pytest.mark.parametrize("seed", range(6))
def test_gabp_exact_on_random_gaussian_trees(seed):
    rng = np.random.default_rng(4000 + seed)
    n = int(rng.integers(4, 9))
    dom = Domain([-10, 10], continuous=True)
    rvs = [RV(dom, name=f"x{i}") for i in range(n)]
    factors = [
        F(GaussianPotential([float(rng.normal())],
                            [[float(rng.uniform(0.5, 3.0))]]), [rv])
        for rv in rvs
    ]
    for a, b in _rand_tree_edges(rng, n):
        factors.append(
            F(XYPotential(float(rng.uniform(-0.8, 0.8)), 1.2),
              [rvs[a], rvs[b]])
        )
    if rng.integers(0, 2):
        rvs[-1].value = float(rng.normal())
    g = Graph(rvs, factors)
    eng = gabp.GaBP(g).run(iters=4 * n)
    marg, latents = gabp.dense_gaussian_marginals(g)
    for rv in latents:
        m, v = marg[id(rv)]
        np.testing.assert_allclose(eng.mean(rv), m, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(eng.var(rv), v, rtol=1e-4, atol=1e-5)
