"""Coarse-to-fine lifted VI tests (reference OSI C2F variant parity)."""

import numpy as np
import jax

from lhvi_tpu.engines import vi
from lhvi_tpu.lift import compile_lifted
from lhvi_tpu.models.relational import friends_smokers
from lhvi_tpu.utils.oracle import ExactPosterior


def test_c2f_matches_exact_on_small_mln():
    rg = friends_smokers(n_people=3, hybrid=False,
                         w_smokes_cancer=0.7, w_friends=0.4)
    rg.observe("smokes", ("p0",), 1)
    g, index = rg.ground()
    exact = ExactPosterior(g)

    res = vi.infer_c2f(
        g, jax.random.PRNGKey(0),
        vi.VIConfig(K=2, n_iters=2400, lr=5e-2),
        schedule=(0, None, "ground"),
    )
    for key in [("cancer", ("p0",)), ("smokes", ("p1",))]:
        rv = index[key]
        err = np.abs(res.disc_marginal(rv) - exact.disc_marginal(rv)).max()
        assert err < 0.1, (key, res.disc_marginal(rv), exact.disc_marginal(rv))


def test_c2f_stage_partitions_refine():
    """Truncated refinement gives coarser partitions than the fixpoint."""
    rg = friends_smokers(n_people=6, hybrid=True)
    rg.observe("smokes", ("p0",), 1)
    g, _ = rg.ground()
    n0 = compile_lifted(g, max_rounds=0).n_disc
    nf = compile_lifted(g).n_disc
    ng = sum(1 for rv in g.rvs if not rv.observed and not rv.domain.continuous)
    assert n0 <= nf <= ng
    assert n0 < ng


def test_c2f_final_stage_is_grounded():
    rg = friends_smokers(n_people=4, hybrid=True)
    g, index = rg.ground()
    res = vi.infer_c2f(
        g, jax.random.PRNGKey(1),
        vi.VIConfig(K=2, n_iters=600),
        schedule=(None, "ground"),
    )
    # final fg is grounded: every latent RV has its own slot
    n_lat_disc = sum(
        1 for rv in g.rvs if not rv.observed and not rv.domain.continuous
    )
    assert res.fg.n_disc == n_lat_disc
    assert np.isfinite(res.trace).all()
    # per-individual query works post-C2F
    p = res.disc_marginal(index[("smokes", ("p2",))])
    assert abs(p.sum() - 1.0) < 1e-5


def test_c2f_fast_matches_exact_on_small_mln():
    """infer_c2f_fast: same C2F semantics with no object graph anywhere
    (fast_compile -> truncated refine_ir partitions -> ground)."""
    from lhvi_tpu.relational.fast import fast_compile

    rg = friends_smokers(n_people=3, hybrid=False,
                         w_smokes_cancer=0.7, w_friends=0.4)
    rg.observe("smokes", ("p0",), 1)
    fg = fast_compile(rg)

    # oracle on the object-path ground graph (same model)
    rg2 = friends_smokers(n_people=3, hybrid=False,
                          w_smokes_cancer=0.7, w_friends=0.4)
    rg2.observe("smokes", ("p0",), 1)
    g, index = rg2.ground()
    exact = ExactPosterior(g)

    res = vi.infer_c2f_fast(
        fg, jax.random.PRNGKey(0),
        vi.VIConfig(K=2, n_iters=2400, lr=5e-2),
        schedule=(1, None, "ground"),
    )
    for key in [("cancer", ("p0",)), ("smokes", ("p1",))]:
        err = np.abs(
            res.disc_marginal(key) - exact.disc_marginal(index[key])
        ).max()
        assert err < 0.1, (key, res.disc_marginal(key))


def test_c2f_fast_stages_refine_and_final_is_grounded():
    from lhvi_tpu.lift.fast import fast_lift
    from lhvi_tpu.relational.fast import fast_compile

    rg = friends_smokers(n_people=6, hybrid=True)
    rg.observe("smokes", ("p0",), 1)
    fg = fast_compile(rg)
    n1 = fast_lift(fg, max_rounds=1).n_disc
    nf = fast_lift(fg).n_disc
    assert n1 <= nf <= fg.n_disc
    assert n1 < fg.n_disc

    res = vi.infer_c2f_fast(
        fg, jax.random.PRNGKey(1),
        vi.VIConfig(K=2, n_iters=600),
        schedule=(None, "ground"),
    )
    assert res.fg.n_disc == fg.n_disc  # final stage IS the input graph
    assert np.isfinite(res.trace).all()
    p = res.disc_marginal(("smokes", ("p2",)))
    assert abs(p.sum() - 1.0) < 1e-5

def test_c2f_schedule_validation():
    """Empty schedules raise; non-coarse-to-fine fast schedules raise
    instead of silently picking an arbitrary warm-start writer."""
    import pytest
    from lhvi_tpu.relational.fast import fast_compile

    rg = friends_smokers(n_people=4, hybrid=False)
    rg.observe("smokes", ("p0",), 1)
    g, _ = rg.ground()
    fg = fast_compile(rg)
    cfg = vi.VIConfig(K=2, n_iters=20)

    with pytest.raises(ValueError):
        vi.infer_c2f(g, jax.random.PRNGKey(0), cfg, schedule=())
    with pytest.raises(ValueError):
        vi.infer_c2f_fast(fg, jax.random.PRNGKey(0), cfg, schedule=())
    # fine -> coarse is not a refinement: must raise, not mis-transfer
    with pytest.raises(ValueError):
        vi.infer_c2f_fast(fg, jax.random.PRNGKey(0), cfg,
                          schedule=("ground", 1))


def test_c2f_iters_total_matches_config():
    """The final stage absorbs the integer-division remainder so the
    trace length equals cfg.n_iters exactly."""
    from lhvi_tpu.relational.fast import fast_compile

    rg = friends_smokers(n_people=3, hybrid=False)
    fg = fast_compile(rg)
    res = vi.infer_c2f_fast(
        fg, jax.random.PRNGKey(0),
        vi.VIConfig(K=2, n_iters=100),
        schedule=(1, None, "ground"),  # 100 = 33 + 33 + 34
    )
    assert len(res.trace) == 100

def test_c2f_tiny_iters_clamp():
    """n_iters < len(schedule): each stage runs its 1-iteration minimum
    and the remainder is NOT added on top of the clamp."""
    from lhvi_tpu.relational.fast import fast_compile

    rg = friends_smokers(n_people=3, hybrid=False)
    fg = fast_compile(rg)
    res = vi.infer_c2f_fast(
        fg, jax.random.PRNGKey(0),
        vi.VIConfig(K=2, n_iters=2),
        schedule=(1, None, "ground"),
    )
    assert len(res.trace) == 3  # 1 per stage, no remainder on top
