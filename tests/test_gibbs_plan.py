"""GibbsColorPlan identity + sampler regression tests.

The compile-time per-color tables must reproduce ``CompiledFG.disc_logits``
EXACTLY (same joint-substitution semantics, same weights) at any state; the
planned sweep must leave engine posteriors unchanged vs the exact oracle.
"""

import numpy as np
import jax
import jax.numpy as jnp

from lhvi_tpu import Domain, RV, F, Graph, compile_graph
from lhvi_tpu.engines import hmc
from lhvi_tpu.models.toy import hybrid_chain
from lhvi_tpu.potentials import TablePotential, MLNPotential
from lhvi_tpu.utils.oracle import ExactPosterior


def _rand_state(fg, seed=0):
    key = jax.random.PRNGKey(seed)
    return fg.init_state(key)


def _assert_plan_matches(fg, seeds=(0, 1, 2)):
    assert fg.color_plan is not None
    for s in seeds:
        xc, xd = _rand_state(fg, s)
        want = np.asarray(fg.disc_logits(xc, xd))
        got = np.asarray(hmc.planned_logits(fg, xc, xd))
        # compare only valid candidate slots (both sides carry -1e30 pads)
        valid = np.arange(want.shape[1])[None, :] < np.asarray(fg.disc_sizes)[:, None]
        assert np.allclose(got[valid], want[valid], rtol=1e-5, atol=1e-4), (
            np.abs(got[valid] - want[valid]).max()
        )


def test_plan_identity_hybrid_chain():
    g, _ = hybrid_chain()
    _assert_plan_matches(compile_graph(g))


def test_plan_identity_friends_smokers():
    from lhvi_tpu.models.relational import friends_smokers

    rg = friends_smokers(n_people=6, hybrid=True)
    rg.observe("smokes", ("p0",), 1)
    g, _ = rg.ground()
    _assert_plan_matches(compile_graph(g))


def test_plan_identity_repeated_slot_factor():
    # factor referencing the same discrete latent twice: joint substitution
    dom = Domain([0, 1, 2])
    a, b = RV(dom, name="a"), RV(dom, name="b")
    tbl = np.random.default_rng(0).uniform(0.5, 2.0, (3, 3))
    g = Graph(
        [a, b],
        [
            F(TablePotential(tbl), [a, a]),
            F(TablePotential(tbl), [a, b]),
            F(TablePotential([1.0, 2.0, 0.5]), [b]),
        ],
    )
    _assert_plan_matches(compile_graph(g))


def test_plan_identity_mixed_domains():
    # different domain sizes force per-var candidate masking
    d2, d4 = Domain([0, 1]), Domain([0, 1, 2, 3])
    a, b, c = RV(d2, name="a"), RV(d4, name="b"), RV(d2, name="c")
    x = RV(Domain([-5, 5], continuous=True), name="x")
    rng = np.random.default_rng(1)
    g = Graph(
        [a, b, c, x],
        [
            F(TablePotential(rng.uniform(0.5, 2.0, (2, 4))), [a, b]),
            F(TablePotential(rng.uniform(0.5, 2.0, (4, 2))), [b, c]),
            F(
                MLNPotential(
                    lambda ar: -((ar[1] - ar[0]) ** 2), w=0.7,
                    formula_name="link"
                ),
                [a, x],
            ),
        ],
    )
    _assert_plan_matches(compile_graph(g))


def test_planned_sweep_matches_exact_marginals():
    # discrete-only chain: Gibbs via the plan must recover exact marginals
    dom = Domain([0, 1])
    rvs = [RV(dom, name=f"z{i}") for i in range(5)]
    rng = np.random.default_rng(3)
    fs = [F(TablePotential([1.0, 1.8]), [rvs[0]])]
    for i in range(4):
        fs.append(F(TablePotential(rng.uniform(0.5, 2.0, (2, 2))),
                    [rvs[i], rvs[i + 1]]))
    g = Graph(rvs, fs)
    exact = ExactPosterior(g)
    fg = compile_graph(g)
    assert fg.color_plan is not None

    C, S = 256, 400

    @jax.jit
    def run(key):
        xc, xd = fg.init_state_batched(key, C)

        def it(xd, k):
            keys = jax.random.split(k, C)
            xd = jax.vmap(
                lambda kk, xdi: hmc.gibbs_sweep_planned(fg, kk, xc[0], xdi)
            )(keys, xd)
            return xd, xd

        _, hist = jax.lax.scan(it, xd, jax.random.split(key, S))
        return hist  # [S, C, n_disc]

    hist = np.asarray(run(jax.random.PRNGKey(0)))[100:]  # burn-in
    for i, rv in enumerate(rvs):
        p1 = hist[..., i].mean()
        want = exact.disc_marginal(rv)[1]
        assert abs(p1 - want) < 0.02, (i, p1, want)


def _clique_model(n=12, seed=0):
    """All-pairs soft-MLN clique: the conflict graph needs n colors — the
    worst case for chromatic sweeps (n sequential color steps)."""
    dom = Domain([0, 1])
    zs = [RV(dom, name=f"z{i}") for i in range(n)]
    rng = np.random.default_rng(seed)
    fs = [F(TablePotential([0.6, 0.4]), [z]) for z in zs]
    for i in range(n):
        for j in range(i + 1, n):
            w = float(rng.normal(0, 0.35))
            fs.append(
                F(MLNPotential(lambda a: (a[0] == a[1]) * 1.0, w=w,
                               formula_name="agree"), [zs[i], zs[j]])
            )
    return Graph(zs, fs), zs


def test_clique_sweep_matches_exact_marginals():
    """Planned chromatic Gibbs recovers the exact marginals of an
    enumerable 12-var all-pairs clique (singleton color classes)."""
    g, zs = _clique_model()
    exact = ExactPosterior(g)
    fg = compile_graph(g)

    C, S = 256, 400

    @jax.jit
    def run(key):
        xc, xd = fg.init_state_batched(key, C)

        def it(xd, k):
            keys = jax.random.split(k, C)
            xd = jax.vmap(
                lambda kk, xdi: hmc.gibbs_sweep_planned(fg, kk, xc[0], xdi)
            )(keys, xd)
            return xd, xd

        _, hist = jax.lax.scan(it, xd, jax.random.split(key, S))
        return hist

    hist = np.asarray(run(jax.random.PRNGKey(1)))[100:]
    for i, rv in enumerate(zs):
        p1 = hist[..., i].mean()
        want = exact.disc_marginal(rv)[1]
        assert abs(p1 - want) < 0.025, (i, p1, want)

def test_planned_sweep_unroll_identical():
    """gibbs_unroll changes scheduling only: same keys -> bitwise-equal
    sweep output for any unroll factor (incl. non-divisors of n_colors)."""
    g, _ = _clique_model(n=7, seed=5)
    fg = compile_graph(g)
    assert fg.color_plan is not None
    xc, xd = fg.init_state_batched(jax.random.PRNGKey(0), 4)
    k = jax.random.PRNGKey(42)
    base = jax.jit(
        lambda: jax.vmap(lambda xdi: hmc.gibbs_sweep_planned(
            fg, k, xc[0], xdi, unroll=1))(xd)
    )()
    for unroll in (2, 3, 16):
        out = jax.jit(
            lambda u=unroll: jax.vmap(lambda xdi: hmc.gibbs_sweep_planned(
                fg, k, xc[0], xdi, unroll=u))(xd)
        )()
        assert (np.asarray(out) == np.asarray(base)).all(), unroll

def test_plan_identity_nontrivial_domain_values():
    """Value-space sweep tables (disc_cval/sub_vals/vals_) with domains
    whose VALUES are not 0..V-1 — MLN formulas read values, so any
    index/value confusion shows up here; includes an observed slot (baked
    const value) and a repeated-slot factor."""
    dv = Domain([2.5, -1.0, 0.25])
    db = Domain([-3.0, 7.0])
    a, b, c = RV(dv, name="a"), RV(db, name="b"), RV(dv, name="c")
    x = RV(Domain([-5, 5], continuous=True), name="x")
    c.value = 0.25  # observed at index 2 -> disc_cval path
    g = Graph(
        [a, b, c, x],
        [
            F(MLNPotential(lambda ar: ar[0] * ar[1], w=0.3,
                           formula_name="prod"), [a, b]),
            F(MLNPotential(lambda ar: -((ar[0] - ar[1]) ** 2) / 4.0, w=0.5,
                           formula_name="sqdiff"), [a, c]),
            F(MLNPotential(lambda ar: ar[0] * ar[1], w=0.2,
                           formula_name="self"), [b, b]),
            F(MLNPotential(lambda ar: -((ar[1] - ar[0]) ** 2) / 8.0, w=0.4,
                           formula_name="link"), [a, x]),
        ],
    )
    fg = compile_graph(g)
    _assert_plan_matches(fg)

    # and the sweep itself: marginals vs exact enumeration
    exact = ExactPosterior(g, cont_grid=121)
    C, S = 256, 600

    @jax.jit
    def run(key):
        xc, xd = fg.init_state_batched(key, C)

        def it(carry, k):
            xc, xd = carry
            keys = jax.random.split(k, C)
            xd = jax.vmap(
                lambda kk, xci, xdi: hmc.gibbs_sweep_planned(fg, kk, xci, xdi)
            )(keys, xc, xd)
            return (xc, xd), xd

        _, hist = jax.lax.scan(it, (xc, xd), jax.random.split(key, S))
        return hist

    hist = np.asarray(run(jax.random.PRNGKey(0)))[100:]
    for rv, vals in ((a, dv.values), (b, db.values)):
        kind, i = fg.meta.loc(rv)
        got = np.array([(hist[..., i] == k).mean() for k in range(len(vals))])
        want = exact.disc_marginal(rv)
        assert np.abs(got - want).max() < 0.03, (rv.name, got, want)
