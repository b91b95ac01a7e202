"""EPBP tests: particle-BP marginals vs exact enumeration / GaBP."""

import numpy as np
import jax

from lhvi_tpu import Domain, RV, F, Graph, compile_graph
from lhvi_tpu.engines.epbp import EPBP, EPBPConfig
from lhvi_tpu.models.toy import hybrid_chain
from lhvi_tpu.potentials import GaussianPotential, LinearGaussianPotential
from lhvi_tpu.utils.oracle import ExactPosterior


def test_epbp_hybrid_chain():
    g, (d, x1, x2) = hybrid_chain()
    exact = ExactPosterior(g, cont_grid=161)
    fg = compile_graph(g)
    eng = EPBP(fg, EPBPConfig(n_particles=128, n_iters=40)).run(
        jax.random.PRNGKey(1)
    )
    # EPBP is a stochastic message-passing approximation: tolerances sized
    # to its single-particle-set MC error at P=128
    assert np.abs(eng.disc_marginal(d) - exact.disc_marginal(d)).max() < 0.08
    assert abs(eng.mean(x1) - exact.mean(x1)) < 0.22
    assert abs(eng.mean(x2) - exact.mean(x2)) < 0.22
    assert abs(eng.var(x2) - exact.var(x2)) / exact.var(x2) < 0.4


def test_epbp_gaussian_chain_vs_gabp():
    from lhvi_tpu.engines import gabp

    dom = Domain([-10, 10], continuous=True)
    xs = [RV(dom, name=f"x{i}") for i in range(4)]
    fs = [F(GaussianPotential([1.0], [[1.0]]), [xs[0]])]
    for i in range(3):
        fs.append(F(LinearGaussianPotential(0.7, 1.2), [xs[i], xs[i + 1]]))
    g = Graph(xs, fs)
    oracle, _ = gabp.dense_gaussian_marginals(g)
    fg = compile_graph(g)
    eng = EPBP(fg, EPBPConfig(n_particles=128, n_iters=50)).run(
        jax.random.PRNGKey(0)
    )
    for rv in xs:
        m, v = oracle[id(rv)]
        assert abs(eng.mean(rv) - m) < 0.25, (rv, eng.mean(rv), m)
        assert abs(eng.var(rv) - v) / v < 0.4, (rv, eng.var(rv), v)


def test_epbp_rejects_small_particle_count():
    g, _ = hybrid_chain()
    fg = compile_graph(g)
    try:
        EPBP(fg, EPBPConfig(n_particles=1))
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_epbp_arity3_hybrid_factor():
    """Ternary factors (2 discrete + 1 continuous): the O(P^3) grid path."""
    from lhvi_tpu.potentials import MLNPotential, TablePotential

    b = Domain([0, 1])
    z1, z2 = RV(b, name="z1"), RV(b, name="z2")
    x = RV(Domain([-6, 6], continuous=True), name="x")
    g = Graph(
        [z1, z2, x],
        [
            F(TablePotential([0.7, 0.3]), [z1]),
            F(TablePotential([[2.0, 1.0], [1.0, 2.0]]), [z1, z2]),
            F(
                MLNPotential(
                    lambda a: -a[0] * a[1] * (a[2] - 2.0) ** 2
                    - (1.0 - a[0] * a[1]) * (a[2] + 1.0) ** 2 * 0.5,
                    w=0.8,
                    formula_name="gate_mean",
                ),
                [z1, z2, x],
            ),
        ],
    )
    exact = ExactPosterior(g, cont_grid=161)
    fg = compile_graph(g)
    eng = EPBP(fg, EPBPConfig(n_particles=64, n_iters=40)).run(
        jax.random.PRNGKey(2)
    )
    assert np.abs(eng.disc_marginal(z1) - exact.disc_marginal(z1)).max() < 0.08
    assert np.abs(eng.disc_marginal(z2) - exact.disc_marginal(z2)).max() < 0.08
    assert abs(eng.mean(x) - exact.mean(x)) < 0.3
