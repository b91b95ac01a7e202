"""Pallas fused log-potential/leapfrog kernel: interpret-mode correctness.

The kernel (``ops/logpot.py``) evaluates the continuous-part energy of a
non-quadratic model (quad form + planar potential buckets, optionally
tempered against a diagonal base) and integrates the whole leapfrog
trajectory in one kernel. Here it runs through the Pallas TPU interpreter
on the CPU test mesh and is checked against the exact XLA fallback (the
same math via ``CompiledFG.log_prob_cont_batched`` + autodiff).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from lhvi_tpu import compile_graph
from lhvi_tpu.ops import logpot


def _robot_fg(n_segments=10):
    from lhvi_tpu.models.relational import robot_map, robot_scan_evidence
    from lhvi_tpu.relational.data import load_evidence

    text, _ = robot_scan_evidence(n_segments, seed=0)
    rg = robot_map(n_segments, evidence=load_evidence(text))
    g, _ = rg.ground()
    return compile_graph(g)


def _denoise_fg(rows=6, cols=6):
    from lhvi_tpu.models.image import denoise_grid

    out = denoise_grid(rows, cols, seed=0)
    g = out[0] if isinstance(out, tuple) else out
    return compile_graph(g)


def _rand_states(fg, C, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(C, fg.n_cont)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(C, fg.n_cont)).astype(np.float32))
    if fg.n_disc:
        sizes = np.asarray(fg.disc_sizes)
        xd = jnp.asarray(
            rng.integers(0, sizes[None, :], (C, fg.n_disc)).astype(np.int32)
        )
    else:
        xd = jnp.zeros((C, 0), jnp.int32)
    return x, p, xd


@pytest.mark.parametrize("model", ["robot", "denoise"])
def test_fused_leapfrog_matches_xla_fallback(model):
    fg = _robot_fg() if model == "robot" else _denoise_fg()
    assert not fg.cont_pure_quad  # these are the non-quad targets
    plan = logpot.logpot_plan(fg)
    assert plan is not None, "model should fit the fused-kernel gate"
    C, steps, eps = 16, 5, 0.03
    x, p, xd = _rand_states(fg, C)
    im = jnp.ones((fg.n_cont,), jnp.float32)

    x0, p0, e00, e10 = logpot.logpot_leapfrog(
        fg, x, p, xd, im, eps, steps, plan=None
    )
    with pltpu.force_tpu_interpret_mode():
        x1, p1, e01, e11 = logpot.logpot_leapfrog(
            fg, x, p, xd, im, eps, steps, plan=plan
        )
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(e01), np.asarray(e00),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(e11), np.asarray(e10),
                               rtol=2e-4, atol=2e-4)


def test_fused_leapfrog_tempered_matches_fallback():
    fg = _robot_fg()
    plan = logpot.logpot_plan(fg)
    assert plan is not None
    C, steps, eps = 8, 4, 0.05
    x, p, xd = _rand_states(fg, C, seed=1)
    im = jnp.ones((fg.n_cont,), jnp.float32)
    mid = 0.5 * (fg.cont_lo + fg.cont_hi)
    is2 = jnp.full((fg.n_cont,), 1.0 / 4.0, jnp.float32)
    beta = 0.37

    x0, p0, e00, e10 = logpot.logpot_leapfrog(
        fg, x, p, xd, im, eps, steps, beta=beta, base_mid=mid,
        base_inv_s2=is2, plan=None,
    )
    with pltpu.force_tpu_interpret_mode():
        x1, p1, e01, e11 = logpot.logpot_leapfrog(
            fg, x, p, xd, im, eps, steps, beta=beta, base_mid=mid,
            base_inv_s2=is2, plan=plan,
        )
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(e11), np.asarray(e10),
                               rtol=2e-4, atol=2e-4)


def test_energy_matches_log_prob_cont_batched():
    """lp0 returned by BOTH paths equals log_prob_cont_batched exactly
    (up to float assoc) — not just up to a constant."""
    fg = _robot_fg()
    C = 8
    x, p, xd = _rand_states(fg, C, seed=2)
    im = jnp.ones((fg.n_cont,), jnp.float32)
    want = np.asarray(fg.log_prob_cont_batched(x, xd))
    _, _, e0, _ = logpot.logpot_leapfrog(fg, x, p, xd, im, 0.01, 1,
                                         plan=None)
    np.testing.assert_allclose(np.asarray(e0), want, rtol=1e-5, atol=1e-5)
    plan = logpot.logpot_plan(fg)
    with pltpu.force_tpu_interpret_mode():
        _, _, e0k, _ = logpot.logpot_leapfrog(fg, x, p, xd, im, 0.01, 1,
                                              plan=plan)
    np.testing.assert_allclose(np.asarray(e0k), want, rtol=1e-4, atol=1e-4)


def test_plan_gate_rejects_oversized_models():
    fg = _denoise_fg(10, 10)
    assert logpot.logpot_plan(fg, max_bytes=1 << 10) is None


def test_fused_leapfrog_padded_chain_block():
    """Chain count NOT a multiple of the 8-sublane padding (regression:
    padded disc-value columns were sourced from the unpadded [C, 1]
    slice and failed to broadcast whenever C != c_pad)."""
    fg = _robot_fg()
    plan = logpot.logpot_plan(fg)
    assert plan is not None
    C, steps, eps = 13, 3, 0.03
    x, p, xd = _rand_states(fg, C, seed=3)
    im = jnp.ones((fg.n_cont,), jnp.float32)
    x0, p0, e00, e10 = logpot.logpot_leapfrog(
        fg, x, p, xd, im, eps, steps, plan=None
    )
    with pltpu.force_tpu_interpret_mode():
        x1, p1, e01, e11 = logpot.logpot_leapfrog(
            fg, x, p, xd, im, eps, steps, plan=plan
        )
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(e11), np.asarray(e10),
                               rtol=2e-4, atol=2e-4)


def test_plan_cache_returns_one_object_per_graph():
    """plan='auto' resolves through a per-CompiledFG cache so retraces of
    a jitted caller reuse one plan (one host build, one Mosaic compile)."""
    fg = _robot_fg()
    p1 = logpot.logpot_plan_cached(fg)
    p2 = logpot.logpot_plan_cached(fg)
    assert p1 is not None and p1 is p2
    assert logpot.logpot_plan_cached(_denoise_fg()) is not p1
