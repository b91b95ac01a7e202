"""IR-level lifted compile (lift/fast.py) vs the object-graph path.

Three invariants:
  1. the vectorized refinement computes the SAME variable partition as
     the object-graph color refinement (exact, not statistical);
  2. the lifted ELBO with orbit-tied params equals the grounded ELBO
     with those params broadcast (the same identity test_fuzz_lift.py
     runs for compile_lifted);
  3. composed with fast_compile (no object graph anywhere), lifted VI
     reproduces the closed-form friends-smokers marginal.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lhvi_tpu import compile_graph
from lhvi_tpu.engines import vi
from lhvi_tpu.lift.color import color_refine, lifting_report
from lhvi_tpu.lift.fast import fast_lift, fast_lifting_report, refine_ir
from lhvi_tpu.models.relational import friends_smokers
from lhvi_tpu.relational.fast import fast_compile

from test_fuzz_compile import _rand_graph
from test_fuzz_lift import _k_copies


def _partition(groups):
    return set(frozenset(s) for s in groups.values())


def test_partition_matches_object_path():
    rg = friends_smokers(n_people=8, hybrid=True)
    for i in range(3):
        rg.observe("smokes", (f"p{i}",), i % 2)
    g, _ = rg.ground()
    fg = compile_graph(g)

    rvc, _ = color_refine(g)
    vcol_c, vcol_d, _ = refine_ir(fg)

    obj = {}
    for rv in g.rvs:
        if rv.observed:
            continue
        kind, i = fg.meta.loc(rv)
        obj.setdefault(rvc[id(rv)], set()).add((kind, i))
    fast = {}
    for i, c in enumerate(vcol_c):
        fast.setdefault(("c", int(c)), set()).add(("c", i))
    for i, c in enumerate(vcol_d):
        fast.setdefault(("d", int(c)), set()).add(("d", i))
    assert _partition(obj) == _partition(fast)


@pytest.mark.parametrize("seed", range(6))
def test_partition_matches_on_random_copied_graphs(seed):
    rng = np.random.default_rng(4100 + seed)
    g = _k_copies(_rand_graph(rng), int(rng.integers(2, 5)))
    fg = compile_graph(g)
    rvc, _ = color_refine(g)
    vcol_c, vcol_d, _ = refine_ir(fg)
    obj = {}
    for rv in g.rvs:
        if rv.observed:
            continue
        kind, i = fg.meta.loc(rv)
        obj.setdefault(rvc[id(rv)], set()).add((kind, i))
    fast = {}
    for i, c in enumerate(vcol_c):
        fast.setdefault(("c", int(c)), set()).add(("c", i))
    for i, c in enumerate(vcol_d):
        fast.setdefault(("d", int(c)), set()).add(("d", i))
    assert _partition(obj) == _partition(fast)


@pytest.mark.parametrize("rounds", [1, None])
@pytest.mark.parametrize("seed", range(6))
def test_fast_lift_elbo_equals_grounded(seed, rounds):
    # rounds=1: TRUNCATED refinement (a C2F stage) — the identity must
    # hold at any depth because factor orbits are re-keyed on the final
    # var coloring (regression for the unbounded-entropy NaN: a merged
    # representative used to drop a coarser orbit's factor terms)
    rng = np.random.default_rng(4200 + seed)
    g = _k_copies(_rand_graph(rng), int(rng.integers(2, 5)))
    fg_g = compile_graph(g)
    fg_l = fast_lift(fg_g, max_rounds=10_000 if rounds is None else rounds)

    if fg_g.n_cont + fg_g.n_disc == 0:
        pytest.skip("all observed")
    assert fg_l.n_cont + fg_l.n_disc <= fg_g.n_cont + fg_g.n_disc

    key = jax.random.PRNGKey(seed)
    cfg = vi.VIConfig(K=3)
    p_l = vi.init_params(fg_l, key, cfg)

    gather_c = np.zeros(fg_g.n_cont, np.int64)
    gather_d = np.zeros(fg_g.n_disc, np.int64)
    for rv in g.rvs:
        if rv.value is not None:
            continue
        kind_g, i_g = fg_g.meta.loc(rv)
        kind_l, i_l = fg_l.meta.loc(rv)  # delegating meta, same rv object
        assert kind_g == kind_l
        (gather_c if kind_g == "c" else gather_d)[i_g] = i_l
    p_g = vi.VIParams(
        log_w=p_l.log_w,
        mu=p_l.mu[:, gather_c] if fg_g.n_cont else jnp.zeros((cfg.K, 0)),
        log_sigma=p_l.log_sigma[:, gather_c] if fg_g.n_cont
        else jnp.zeros((cfg.K, 0)),
        logits=p_l.logits[:, gather_d] if fg_g.n_disc
        else jnp.zeros((cfg.K, 0, fg_g.max_v)),
    )
    e_l = float(vi.elbo(fg_l, p_l, n_quad=7))
    e_g = float(vi.elbo(fg_g, p_g, n_quad=7))
    np.testing.assert_allclose(e_l, e_g, rtol=1e-4, atol=2e-3)


def test_fast_compile_fast_lift_closed_form():
    # no object graph anywhere: template → array IR → lifted IR → VI.
    # Evidence mirrors the pod config (smokes(p_i)=i%2): an observed
    # smoker pins P(cancer)=sigmoid(w=1.2); an observed NON-smoker makes
    # imp(0, c) constant, so P(cancer)=1/2 exactly. (An UNobserved
    # person's marginal is not 1/2 here: mean-field tips everyone to
    # smoking through the friends rule — the grounded object path gives
    # the same 0.768, verified when this test was written.)
    rg = friends_smokers(n_people=12, hybrid=True)
    rg.observe("smokes", ("p0",), 0)
    rg.observe("smokes", ("p1",), 1)
    fg = fast_lift(fast_compile(rg))

    # orbit counts agree with the object-path report
    g, _ = friends_smokers(n_people=12, hybrid=True).ground()
    rep = fast_lifting_report(fast_compile(friends_smokers(
        n_people=12, hybrid=True)))
    assert rep["n_rv_orbits"] == lifting_report(g)["n_rv_orbits"]

    res = vi.infer(fg, jax.random.PRNGKey(0),
                   vi.VIConfig(K=2, n_iters=400, lr=0.08))
    m1 = res.disc_marginal(("cancer", ("p1",)))
    m0 = res.disc_marginal(("cancer", ("p0",)))
    assert abs(m1[1] - 0.7685) < 0.03
    assert abs(m0[1] - 0.5) < 0.03


def test_lifted_lbp_on_fast_lift_matches_grounded():
    # reference "lifted BP" parity on the IR path: HybridLBP consumes a
    # fast_lift graph (cluster messages weighted by orbit counts) and
    # agrees with grounded LBP on the same model
    from lhvi_tpu.engines.lbp import HybridLBP

    rg = friends_smokers(n_people=8, hybrid=False)
    rg.observe("smokes", ("p0",), 1)
    fg = fast_compile(rg)
    fgl = fast_lift(fg)

    e_l = HybridLBP(fgl)
    e_l.run(30)
    e_g = HybridLBP(fg)
    e_g.run(30)
    for key in [("cancer", ("p0",)), ("smokes", ("p3",))]:
        np.testing.assert_allclose(
            e_l.disc_marginal(key), e_g.disc_marginal(key), atol=5e-3
        )
