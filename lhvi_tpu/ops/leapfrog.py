"""Pallas fused leapfrog for quadratic (information-form) targets.

SURVEY.md §9 stage 7 / BASELINE north-star "Pallas leapfrog kernels": when a
model's continuous part is fully fused into ``(J, h)`` (``CompiledFG.quad``),
the leapfrog gradient is ``h − xJ`` and the whole n-step integration for a
tile of chains runs inside ONE kernel — positions/momenta stay in VMEM, J
stays resident, each step is a single [BC,n]×[n,n] MXU matmul + VPU
updates. This removes 2·n_steps HBM round-trips of the state per proposal
versus the XLA op-by-op path.

Numerics: the merged half-kick formulation used here composes to exactly
the same map as the naive two-half-kicks-per-step integrator (f32
throughout), so acceptance statistics are unchanged.

Falls back to a pure-jnp implementation off-TPU (CPU test meshes) and for
non-quadratic models (autodiff leapfrog in ``engines.hmc``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _jnp_quad_leapfrog(x, p, J, h, inv_mass, eps, n_steps: int):
    """Reference/fallback implementation (batched, merged half-kicks)."""

    def grad(x):
        return h - x @ J

    p = p + 0.5 * eps * grad(x)

    def body(i, xp):
        x, p = xp
        x = x + eps * inv_mass * p
        g = grad(x)
        last = i == n_steps - 1
        p = p + jnp.where(last, 0.5, 1.0) * eps * g
        return (x, p)

    x, p = jax.lax.fori_loop(0, n_steps, body, (x, p))
    return x, p


def _leapfrog_kernel(eps_ref, x_ref, p_ref, J_ref, h_ref, im_ref,
                     xo_ref, po_ref, *, n_steps: int):
    x = x_ref[:]
    p = p_ref[:]
    J = J_ref[:]
    h = h_ref[:]
    im = im_ref[:]
    eps = eps_ref[0]

    def grad(x):
        return h - jnp.dot(x, J, preferred_element_type=jnp.float32)

    p = p + 0.5 * eps * grad(x)

    def body(i, xp):
        x, p = xp
        x = x + eps * im * p
        g = grad(x)
        scale = jnp.where(i == n_steps - 1, 0.5, 1.0)
        p = p + scale * eps * g
        return (x, p)

    x, p = jax.lax.fori_loop(0, n_steps, body, (x, p))
    xo_ref[:] = x
    po_ref[:] = p


@functools.partial(jax.jit, static_argnames=("n_steps", "block_chains"))
def _pallas_quad_leapfrog(x, p, J, h, inv_mass, eps, n_steps: int,
                          block_chains: int = 256):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, n = x.shape
    n_pad = _round_up(max(n, 1), _LANE)
    c_pad = _round_up(max(C, 1), 8)
    bc = min(block_chains, c_pad)
    c_pad = _round_up(c_pad, bc)

    xp_ = jnp.zeros((c_pad, n_pad), x.dtype).at[:C, :n].set(x)
    pp_ = jnp.zeros((c_pad, n_pad), p.dtype).at[:C, :n].set(p)
    Jp_ = jnp.zeros((n_pad, n_pad), J.dtype).at[:n, :n].set(J)
    hp_ = jnp.zeros((1, n_pad), h.dtype).at[0, :n].set(h)
    imp = jnp.zeros((1, n_pad), inv_mass.dtype).at[0, :n].set(inv_mass)
    eps_arr = jnp.asarray([eps], jnp.float32)

    grid = (c_pad // bc,)
    kernel = functools.partial(_leapfrog_kernel, n_steps=n_steps)
    xo, po = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bc, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bc, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, n_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c_pad, n_pad), x.dtype),
            jax.ShapeDtypeStruct((c_pad, n_pad), p.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * c_pad * n_pad * n_pad * (n_steps + 1),
            bytes_accessed=4 * (2 * c_pad * n_pad + n_pad * n_pad),
            transcendentals=0,
        ),
    )(eps_arr, xp_, pp_, Jp_, hp_, imp)
    return xo[:C, :n], po[:C, :n]


def quad_leapfrog(x, p, J, h, inv_mass, eps, n_steps: int, shard=None):
    """Batched leapfrog on the fused quadratic target.

    x, p: [C, n]; J: [n, n]; h, inv_mass: [n]; eps: scalar (traced ok).
    Uses the Pallas kernel on TPU, jnp fallback elsewhere. ``shard``
    (chain-axis NamedSharding) runs one kernel instance per device via
    ``shard_map`` — a bare ``pallas_call`` does not SPMD-partition; the
    integrator is chain-parallel so shards never communicate and the
    result is bitwise-identical to the unsharded kernel.
    """
    if jax.default_backend() != "tpu":
        return _jnp_quad_leapfrog(x, p, J, h, inv_mass, eps, n_steps)
    if shard is not None:
        from lhvi_tpu.parallel.mesh import shard_map_chains

        fn = shard_map_chains(
            lambda x_, p_, J_, h_, im_, eps_: _pallas_quad_leapfrog(
                x_, p_, J_, h_, im_, eps_, n_steps),
            shard, n_sharded_args=2,
        )
        return fn(x, p, J, h, inv_mass, eps)
    return _pallas_quad_leapfrog(x, p, J, h, inv_mass, eps, n_steps)


def ell_matvec(x, diag, col, w):
    """``J @ x`` for a batch in ELL form: x [C, n] → [C, n].

    THE single codegen point for the sparse matvec (HMC leapfrog here;
    NUTS gradients / VI / log-prob via ``CompiledFG.quad_matvec_batched``,
    which delegates). For small static D the neighbor sum unrolls into D
    gather·FMA ops that XLA fuses into the accumulation — the one-shot
    ``sum(w * x[:, col], -1)`` materializes [C, n, D] in HBM, measured
    2.1× slower inside the leapfrog at 128×128-grid scale (docs/PERF.md
    round 4).
    """
    y = x * diag[None]
    D = col.shape[1]
    if D <= 16:
        for d in range(D):
            y = y + w[None, :, d] * x[:, col[:, d]]
        return y
    return y + jnp.sum(w[None] * x[:, col], axis=-1)


def ell_quad_leapfrog(x, p, diag, col, w, h, inv_mass, eps, n_steps: int):
    """Batched leapfrog on a SPARSE (ELL) quadratic target.

    x, p: [C, n]; diag, h, inv_mass: [n]; col/w: [n, D] padded-neighbor
    tables (see ``CompiledFG.quad_matvec_batched``); eps traced ok.
    Returns ``(x1, p1, g0, g1)`` — the endpoint gradients are free here
    and let the caller form both Hamiltonians without extra matvecs
    (lp = c + ½·x·(h + g)).

    ∇log p = h − J x via ``ell_matvec`` (see its docstring for the
    unrolled gather·FMA codegen rationale). Written position-Verlet so
    the loop body has ONE kick: n_steps costs n_steps+1 matvecs, and the
    momentum round-trips HBM once per step instead of twice. No matmul
    for a Pallas kernel to win back, so this stays pure XLA (and GSPMD-
    partitions natively on a sharded chain axis).
    """

    def matvec(x):
        return ell_matvec(x, diag, col, w)

    g0 = h[None] - matvec(x)
    if n_steps == 0:
        # degenerate no-op config: the position-Verlet tail below would
        # otherwise still apply one drift + final half-kick
        return x, p, g0, g0
    m = p + 0.5 * eps * g0

    def body(_, carry):
        x, m = carry
        x = x + eps * inv_mass[None] * m
        g = h[None] - matvec(x)
        m = m + eps * g
        return x, m

    x, m = jax.lax.fori_loop(0, n_steps - 1, body, (x, m))
    x = x + eps * inv_mass[None] * m
    g1 = h[None] - matvec(x)
    p1 = m + 0.5 * eps * g1
    return x, p1, g0, g1
