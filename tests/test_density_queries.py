"""Arbitrary-x density queries for the BP engines (reference
``belief(x, rv)`` / ``probability(x, rv)`` parity — SURVEY.md §4.4/§4.5;
mount empty). Off-grid densities are checked against the exact
enumeration-×-quadrature oracle on the hybrid chain and against the dense
Gaussian oracle on a Gaussian chain."""

import numpy as np
import jax

from lhvi_tpu import Domain, RV, F, Graph, compile_graph
from lhvi_tpu.engines.epbp import EPBP, EPBPConfig
from lhvi_tpu.engines.lbp import HybridLBP
from lhvi_tpu.models.toy import hybrid_chain
from lhvi_tpu.potentials import GaussianPotential, LinearGaussianPotential
from lhvi_tpu.utils.oracle import ExactPosterior

# deliberately off-grid, irrational-ish query points
XQ = np.array([-2.831, -1.117, -0.303, 0.517, 1.293, 2.719])


def test_epbp_belief_at_arbitrary_x_hybrid_chain():
    g, (d, x1, x2) = hybrid_chain()
    exact = ExactPosterior(g, cont_grid=161)
    fg = compile_graph(g)
    eng = EPBP(fg, EPBPConfig(n_particles=128, n_iters=40)).run(
        jax.random.PRNGKey(1)
    )
    for rv in (x1, x2):
        got = eng.belief(XQ, rv)
        want = exact.density(XQ, rv)
        assert got.shape == XQ.shape
        assert np.abs(got - want).max() < 0.09, (rv, got, want)
        # scalar query returns a float
        assert isinstance(eng.belief(float(XQ[0]), rv), float)
        # belief integrates to ~1
        xs = np.linspace(-8.0, 8.0, 401)
        total = np.trapezoid(eng.belief(xs, rv), xs)
        assert abs(total - 1.0) < 0.05, (rv, total)
        # probability == belief up to one positive constant
        p = eng.probability(XQ, rv)
        b = eng.belief(XQ, rv)
        ratios = p[b > 1e-8] / b[b > 1e-8]
        assert ratios.max() / ratios.min() < 1.0 + 1e-6
    # discrete query: belief at a domain value == disc_marginal entry
    pm = eng.disc_marginal(d)
    assert abs(eng.belief(1, d) - pm[1]) < 1e-12


def test_lbp_belief_at_arbitrary_x_hybrid_chain():
    g, (d, x1, x2) = hybrid_chain()
    for rv in (x1, x2):
        rv.domain.integral_points = np.linspace(-6, 6, 64)
    exact = ExactPosterior(g, cont_grid=161)
    eng = HybridLBP(compile_graph(g)).run(n_iters=30)
    for rv in (x1, x2):
        got = eng.belief(XQ, rv)
        want = exact.density(XQ, rv)
        assert np.abs(got - want).max() < 0.06, (rv, got, want)
        xs = np.linspace(-6.0, 6.0, 301)
        total = np.trapezoid(eng.belief(xs, rv), xs)
        assert abs(total - 1.0) < 0.05, (rv, total)
        p = eng.probability(XQ, rv)
        b = eng.belief(XQ, rv)
        ratios = p[b > 1e-8] / b[b > 1e-8]
        assert ratios.max() / ratios.min() < 1.0 + 1e-6
    pm = eng.disc_marginal(d)
    assert abs(eng.belief(0, d) - pm[0]) < 1e-12


def test_epbp_belief_matches_gaussian_pdf():
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
        q = m + np.sqrt(v) * np.array([-1.5, -0.5, 0.31, 1.13])
        want = np.exp(-0.5 * (q - m) ** 2 / v) / np.sqrt(2 * np.pi * v)
        got = eng.belief(q, rv)
        assert np.abs(got - want).max() < 0.12, (rv, got, want)


def test_oracle_density_self_consistent():
    g, (d, x1, x2) = hybrid_chain()
    exact = ExactPosterior(g, cont_grid=161)
    xs = np.linspace(-8.0, 8.0, 801)
    for rv in (x1, x2):
        dens = exact.density(xs, rv)
        total = np.trapezoid(dens, xs)
        assert abs(total - 1.0) < 0.02, total
        m = np.trapezoid(dens * xs, xs)
        assert abs(m - exact.mean(rv)) < 0.02
