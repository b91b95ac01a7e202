"""Hybrid LBP tests: exact on discrete trees; close to exact/GaBP on hybrid
and Gaussian models; lifted == grounded on symmetric graphs."""

import numpy as np
import jax

from lhvi_tpu import Domain, RV, F, Graph, compile_graph
from lhvi_tpu.engines.lbp import HybridLBP
from lhvi_tpu.lift import compile_lifted
from lhvi_tpu.models.toy import hybrid_chain
from lhvi_tpu.potentials import GaussianPotential, LinearGaussianPotential, TablePotential
from lhvi_tpu.utils.oracle import ExactPosterior


def test_lbp_discrete_tree_exact():
    dom = Domain([0, 1])
    a, b, c = RV(dom, name="a"), RV(dom, name="b"), RV(dom, name="c")
    g = Graph(
        [a, b, c],
        [
            F(TablePotential([0.4, 0.6]), [a]),
            F(TablePotential([[4.0, 1.0], [1.0, 3.0]]), [a, b]),
            F(TablePotential([[2.0, 1.0], [1.0, 2.0]]), [b, c]),
        ],
    )
    exact = ExactPosterior(g)
    eng = HybridLBP(compile_graph(g)).run(n_iters=20, damping=0.0)
    for rv in (a, b, c):
        err = np.abs(eng.disc_marginal(rv) - exact.disc_marginal(rv)).max()
        assert err < 1e-4, (rv, eng.disc_marginal(rv), exact.disc_marginal(rv))


def test_lbp_hybrid_chain():
    g, (d, x1, x2) = hybrid_chain()
    # denser integral grid for decent discretization
    for rv in (x1, x2):
        rv.domain.integral_points = np.linspace(-6, 6, 64)
    exact = ExactPosterior(g, cont_grid=161)
    eng = HybridLBP(compile_graph(g)).run(n_iters=30)
    assert np.abs(eng.disc_marginal(d) - exact.disc_marginal(d)).max() < 0.05
    assert abs(eng.mean(x1) - exact.mean(x1)) < 0.1
    assert abs(eng.mean(x2) - exact.mean(x2)) < 0.1


def test_lbp_gaussian_chain_vs_gabp():
    from lhvi_tpu.engines import gabp

    dom = Domain([-8, 8], continuous=True,
                 integral_points=np.linspace(-8, 8, 80))
    xs = [RV(dom, name=f"x{i}") for i in range(4)]
    fs = [F(GaussianPotential([0.5], [[1.0]]), [xs[0]])]
    for i in range(3):
        fs.append(F(LinearGaussianPotential(0.7, 1.5), [xs[i], xs[i + 1]]))
    g = Graph(xs, fs)
    oracle, _ = gabp.dense_gaussian_marginals(g)
    eng = HybridLBP(compile_graph(g)).run(n_iters=25)
    for rv in xs:
        m, v = oracle[id(rv)]
        assert abs(eng.mean(rv) - m) < 0.1, (eng.mean(rv), m)
        assert abs(eng.var(rv) - v) / v < 0.2, (eng.var(rv), v)


def test_lifted_lbp_matches_grounded():
    """Star graph: lifted LBP (messages per cluster edge with multiplicity
    weights) must match grounded LBP beliefs."""
    from tests.test_lift import star_graph

    g, center, leaves = star_graph(5)
    dom_ip = np.linspace(-6, 6, 48)
    for rv in [center] + leaves:
        rv.domain.integral_points = dom_ip

    eng_g = HybridLBP(compile_graph(g)).run(n_iters=25)
    eng_l = HybridLBP(compile_lifted(g)).run(n_iters=25)
    assert abs(eng_g.mean(center) - eng_l.mean(center)) < 1e-3
    assert abs(eng_g.mean(leaves[0]) - eng_l.mean(leaves[0])) < 1e-3
    assert abs(eng_g.var(leaves[0]) - eng_l.var(leaves[0])) < 5e-3
