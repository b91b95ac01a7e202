"""Trajectory-resident Pallas leapfrog for BANDED (DIA) quadratic targets.

VERDICT r4 #7 / docs/PERF.md "ELL sparse quad path": the fused ELL matvec
runs at ~85% of HBM speed-of-light, so the only remaining lever at grid
scale is TRAFFIC — keeping the whole n-step trajectory's state in VMEM.
An in-kernel ELL gather is blocked by Mosaic ("Multiple source vregs
along gather dimension"), but grid/chain/banded information matrices
have a handful of DIAGONALS: J x = diag·x + Σ_k w_k · shift(x, o_k) for
a small static offset set {o_k}. Static shifts need no gather — Mosaic
lowers ``pltpu.roll`` on the lane axis directly — so the whole
integration runs in one kernel: positions/momenta round-trip HBM ONCE
per proposal instead of once per step.

Correctness of the circular roll: an entry ``w_k[i] ≠ 0`` implies the
edge (i, i+o_k) exists, hence ``0 ≤ i+o_k < n ≤ n_pad`` — every
wrapped-around lane is multiplied by a structural zero, so no masking
is needed (asserted by construction in ``ell_to_dia``).

The reference (SURVEY.md §3.1) has no sparse-matrix machinery at all —
its dense Gaussian tooling stops at a few thousand variables.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_LANE = 128

# largest embedded width the whole-trajectory kernels fit in VMEM for
# (measured: [16, 16384] blocks fill ~16 MB with double-buffering and the
# loop-body temporaries; [8, 32768] is the same budget; 256²-grid widths
# overflow even at the minimum 8-sublane block → those stay on the ELL
# gather path)
DIA_MAX_EMB = 32 * 1024


def _auto_bc(n_pad: int) -> int:
    return 16 if n_pad <= 16 * 1024 else 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def ell_to_dia(col: np.ndarray, w: np.ndarray, pos: np.ndarray = None,
               max_offsets: int = 8):
    """Detect a banded structure in padded-neighbor (ELL) tables.

    col/w: [n, D] neighbor tables (``CompiledFG.quad_ell_col/_w``).
    pos: optional i32 [n] EMBEDDING of each latent into a larger banded
    coordinate space — evidence conditioning compacts latent indices, so
    a grid with observed nodes has irregular latent-index offsets, while
    its declaration-order positions (latents + observed interleaved)
    keep the {±1, ±W} template; the embedded vector simply carries inert
    zero lanes at evidence positions.

    Returns ``(offsets, wdia, pos)`` — a static tuple of K ≤ max_offsets
    diagonal offsets, the f32 [K, n_emb] per-diagonal weights with
    ``(J x)[pos[i]] = Σ_k wdia[k, pos[i]]·x_emb[pos[i] + offsets[k]]``
    (diagonal handled separately), and the embedding (``None`` when it
    is the identity) — or ``None`` when the active offsets don't fit the
    budget (then the ELL gather path stands). Grid MRFs yield K=4
    ({±1, ±W}); chains K=2.
    """
    col = np.asarray(col)
    w = np.asarray(w, np.float32)
    n, D = col.shape
    if n == 0:
        return None
    if pos is not None:
        pos = np.asarray(pos, np.int64)
        if np.array_equal(pos, np.arange(n)):
            pos = None
    if pos is None:
        n_emb = n
        posv = np.arange(n, dtype=np.int64)
    else:
        n_emb = int(pos.max()) + 1
        posv = pos
    offs = posv[col] - posv[:, None]  # [n, D] embedded-coordinate offsets
    active = w != 0.0
    if not active.any():
        return (), np.zeros((0, n_emb), np.float32), pos
    uoffs = np.unique(offs[active])
    if len(uoffs) > max_offsets:
        return None
    wdia = np.zeros((len(uoffs), n_emb), np.float32)
    for k, o in enumerate(uoffs):
        contrib = np.where(active & (offs == o), w, 0.0).sum(axis=1)
        np.add.at(wdia[k], posv, contrib)
        # structural-zero invariant that makes the circular roll exact
        i = np.flatnonzero(wdia[k])
        assert i.size == 0 or (0 <= i.min() + o and i.max() + o < n_emb)
    return tuple(int(o) for o in uoffs), wdia, pos


def _embed(a, pos, n_emb: int):
    """Scatter latent-space rows [..., n] into the declaration-order
    embedded space [..., n_emb] (inert zeros at evidence positions)."""
    return jnp.zeros(a.shape[:-1] + (n_emb,), a.dtype).at[..., pos].set(a)


def pos_to_inv(pos: np.ndarray, n: int) -> np.ndarray:
    """Inverse embedding index: i32 [n_emb] mapping each embedded lane to
    its latent index, with the sentinel ``n`` at gap (evidence) lanes —
    lets ``_embed_gather`` express the scatter as a GATHER (TPU scatters
    are an order of magnitude slower than gathers on [C, 13k] rows)."""
    pos = np.asarray(pos)
    n_emb = int(pos.max()) + 1
    inv = np.full(n_emb, n, np.int32)
    inv[pos] = np.arange(n, dtype=np.int32)
    return inv


def _embed_gather(a, inv):
    """Gather-based embedding: append one zero column and index by the
    inverse map (gaps hit the sentinel column)."""
    az = jnp.concatenate([a, jnp.zeros(a.shape[:-1] + (1,), a.dtype)],
                         axis=-1)
    return az[..., inv]


def dia_matvec(x, diag, offsets, wdia, pos=None):
    """``J @ x`` for a batch in DIA form: x [C, n] → [C, n] (pure XLA).

    Shift-multiply-accumulate over the K static diagonals; the circular
    roll is exact because out-of-range lanes carry structural zeros in
    ``wdia`` (see module docstring). ``pos`` embeds/extracts around the
    shifts when the weights live in declaration-order coordinates.
    """
    if pos is not None:
        n_emb = wdia.shape[1]
        y = _embed(x * diag[None], pos, n_emb)
        xe = _embed(x, pos, n_emb)
    else:
        y = x * diag[None]
        xe = x
    for k, o in enumerate(offsets):
        y = y + wdia[k][None] * jnp.roll(xe, -o, axis=-1)
    return y[..., pos] if pos is not None else y


def _lp(x, h, g):
    """½·Σ x·(h+g) — the pure-quadratic log-potential up to the constant
    (lp = c + ½·x·(h + g) with g = h − Jx)."""
    return 0.5 * jnp.sum(x * (h[None] + g), axis=-1)


def _jnp_dia_leapfrog(x, p, diag, offsets, wdia, h, inv_mass, eps,
                      n_steps: int):
    """Reference/fallback (CPU meshes): same position-Verlet composition
    as ``ops.leapfrog.ell_quad_leapfrog`` with the DIA matvec. Returns
    ``(x1, p1, lp0, lp1)`` — endpoint log-potentials (sans constant)
    instead of gradients, matching the Pallas kernel's in-kernel
    reduction."""

    def matvec(x):
        return dia_matvec(x, diag, offsets, wdia)

    g0 = h[None] - matvec(x)
    lp0 = _lp(x, h, g0)
    if n_steps == 0:
        return x, p, lp0, lp0
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
    return x, p1, lp0, _lp(x, h, g1)


def _dia_leapfrog_kernel(eps_ref, x_ref, p_ref, diag_ref, wd_ref, h_ref,
                         im_ref, xo_ref, po_ref, lp0_ref, lp1_ref, *,
                         n_steps: int, offsets: tuple):
    """Whole-trajectory position-Verlet on a banded target, VMEM-resident.

    x/p blocks [BC, n_pad]; diag/h/im [1, n_pad]; wd [K, n_pad]. Each
    matvec is K+1 VPU multiply-accumulates + K lane-rolls — no MXU, no
    gathers. The endpoint log-potentials reduce IN-KERNEL to [BC, 128]
    broadcasts (lane 0 is the value), so HBM sees two [BC, n_pad]
    stores per proposal, not four."""
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[:]
    p = p_ref[:]
    diag = diag_ref[:]
    h = h_ref[:]
    im = im_ref[:]
    eps = eps_ref[0]

    bc, n_pad = x.shape

    def matvec(x):
        y = x * diag
        for k, o in enumerate(offsets):
            # pltpu.roll wants a non-negative shift; roll left by o ≡
            # roll right by n_pad − o (static)
            y = y + wd_ref[k, :][None, :] * pltpu.roll(
                x, (-o) % n_pad, axis=1)
        return y

    def lp(x, g):
        v = 0.5 * jnp.sum(x * (h + g), axis=1)
        return jnp.broadcast_to(v[:, None], (bc, 128))

    g0 = h - matvec(x)
    lp0_ref[:] = lp(x, g0)
    m = p + 0.5 * eps * g0

    def body(_, carry):
        x, m = carry
        x = x + eps * im * m
        g = h - matvec(x)
        m = m + eps * g
        return (x, m)

    x, m = jax.lax.fori_loop(0, n_steps - 1, body, (x, m))
    x = x + eps * im * m
    g1 = h - matvec(x)
    xo_ref[:] = x
    po_ref[:] = m + 0.5 * eps * g1
    lp1_ref[:] = lp(x, g1)


@functools.partial(jax.jit,
                   static_argnames=("offsets", "n_steps", "block_chains"))
def _pallas_dia_leapfrog(x, p, diag, wdia, h, inv_mass, eps,
                         offsets: tuple, n_steps: int,
                         block_chains: int = 0):
    # block size: [16, 16k]-class blocks fill the 16 MB VMEM budget with
    # double-buffering + loop temporaries (measured); _auto_bc halves the
    # block beyond 16k lanes, and widths past DIA_MAX_EMB don't fit at all
    # (callers gate on it)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, n = x.shape
    K = len(offsets)
    n_pad = _round_up(max(n, 1), _LANE)
    c_pad = _round_up(max(C, 1), 8)
    bc = min(block_chains or _auto_bc(n_pad), c_pad)
    c_pad = _round_up(c_pad, bc)

    xp_ = jnp.zeros((c_pad, n_pad), x.dtype).at[:C, :n].set(x)
    pp_ = jnp.zeros((c_pad, n_pad), p.dtype).at[:C, :n].set(p)
    dg_ = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(diag)
    wd_ = jnp.zeros((max(K, 1), n_pad), jnp.float32).at[:K, :n].set(wdia)
    hp_ = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(h)
    imp = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(inv_mass)
    eps_arr = jnp.asarray([eps], jnp.float32)

    grid = (c_pad // bc,)
    kernel = functools.partial(_dia_leapfrog_kernel, n_steps=n_steps,
                               offsets=offsets)
    row = lambda: pl.BlockSpec((1, n_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    blk = lambda: pl.BlockSpec((bc, n_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    lpb = lambda: pl.BlockSpec((bc, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((c_pad, n_pad), jnp.float32)
    lpo = jax.ShapeDtypeStruct((c_pad, 128), jnp.float32)
    xo, po, lp0, lp1 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk(), blk(), row(),
            pl.BlockSpec((max(K, 1), n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            row(), row(),
        ],
        out_specs=[blk(), blk(), lpb(), lpb()],
        out_shape=[out, out, lpo, lpo],
        cost_estimate=pl.CostEstimate(
            # (K+1) MACs per element per matvec, n_steps+1 matvecs
            flops=2 * (K + 1) * c_pad * n_pad * (n_steps + 1),
            bytes_accessed=4 * (4 * c_pad * n_pad + (K + 3) * n_pad),
            transcendentals=0,
        ),
    )(eps_arr, xp_, pp_, dg_, wd_, hp_, imp)
    return xo[:C, :n], po[:C, :n], lp0[:C, 0], lp1[:C, 0]


def dia_quad_leapfrog(x, p, diag, offsets, wdia, h, inv_mass, eps,
                      n_steps: int, pos=None, shard=None):
    """Batched leapfrog on a BANDED quadratic target.

    Returns ``(x1, p1, lp0, lp1)`` — endpoint positions/momenta plus the
    endpoint log-potentials WITHOUT the constant (lp = ½·x·(h+g); add
    ``quad_c`` outside; it cancels in the MH ratio anyway). Unlike
    ``ell_quad_leapfrog``'s gradient outputs, the lp reduction happens
    in-kernel, halving the kernel's HBM store traffic.

    Pallas whole-trajectory kernel on TPU (state resident in VMEM for
    all n_steps — the traffic win the ELL path cannot express in-kernel);
    jnp fallback elsewhere. ``pos`` (declaration-order embedding) is
    applied ONCE around the whole trajectory: the integrator runs in the
    embedded space, where evidence lanes are inert (diag = h = im = 0 →
    zero gradient and zero drift) and contribute nothing to lp, so the
    per-proposal embedding cost is one scatter + two gathers, not one
    per step. ``shard`` dispatches one kernel instance per device via
    ``shard_map`` (chains never communicate inside a proposal),
    mirroring ``quad_leapfrog``.
    """
    if pos is not None:
        n_emb = wdia.shape[1]
        x = _embed(x, pos, n_emb)
        p = _embed(p, pos, n_emb)
        diag = _embed(diag, pos, n_emb)
        h = _embed(h, pos, n_emb)
        inv_mass = _embed(inv_mass, pos, n_emb)
    if n_steps == 0:
        g0 = h[None] - dia_matvec(x, diag, offsets, wdia)
        lp0 = _lp(x, h, g0)
        out = (x, p, lp0, lp0)
    elif jax.default_backend() != "tpu":
        out = _jnp_dia_leapfrog(x, p, diag, offsets, wdia, h, inv_mass,
                                eps, n_steps)
    else:
        wdia_a = jnp.asarray(wdia)
        if shard is not None:
            from lhvi_tpu.parallel.mesh import shard_map_chains

            fn = shard_map_chains(
                lambda x_, p_, dg_, wd_, h_, im_, eps_:
                _pallas_dia_leapfrog(x_, p_, dg_, wd_, h_, im_, eps_,
                                     offsets, n_steps),
                shard, n_sharded_args=2,
            )
            out = fn(x, p, diag, wdia_a, h, inv_mass, eps)
        else:
            out = _pallas_dia_leapfrog(x, p, diag, wdia_a, h, inv_mass,
                                       eps, offsets, n_steps)
    if pos is not None:
        # lp is embedding-invariant (gap lanes are zero); only the state
        # arrays gather back to latent coordinates
        out = (out[0][..., pos], out[1][..., pos], out[2], out[3])
    return out


def _dia_proposal_kernel(seed_ref, eps_ref, x_ref, diag_ref, wd_ref,
                         h_ref, im_ref, std_ref, xo_ref, lacc_ref, *,
                         n_steps: int, offsets: tuple):
    """One complete HMC proposal in-kernel: momentum generation (hardware
    PRNG + Box–Muller), whole-trajectory position-Verlet, endpoint
    energies, log-accept — HBM sees ONE [BC, n_pad] read (x) and one
    write (x1) per proposal.

    Motivation (measured, docs/PERF.md round 5): at 128×128-grid scale
    `jax.random.normal` for the [1024, 16k] momenta costs 3.4 ms/sample
    — 70% of the whole sampling step — while the integration itself is
    ~0.1 ms. Threefry is compute-bound on the VPU; the TPU's native PRNG
    generates the same bits budget at memory speed. Momenta are drawn
    per (grid-instance, seed) — deterministic for a fixed seed, but a
    DIFFERENT stream than the jax.random fallback (same posterior, not
    bitwise-comparable runs)."""
    from jax.experimental.pallas import tpu as pltpu

    import jax.lax as lax

    x = x_ref[:]
    diag = diag_ref[:]
    h = h_ref[:]
    im = im_ref[:]
    std = std_ref[:]
    eps = eps_ref[0]
    bc, n_pad = x.shape

    pltpu.prng_seed(seed_ref[0] + pl_program_id())
    half = n_pad // 2  # caller pads n_pad to a multiple of 2·128

    def uniform01(shape):
        # uint32 → (0, 1]: mantissa-fill trick gives [1, 2), shift to
        # (0, 1] so log() is always finite
        bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
        mant = (bits >> 9) | jnp.uint32(0x3F800000)
        return 2.0 - pltpu.bitcast(mant, jnp.float32)

    # PAIRED Box–Muller: one (r, θ) draw yields two exact independent
    # normals (r·cosθ, r·sinθ) — halves the log/sqrt/trig budget, which
    # dominates the kernel at small n_steps
    u1 = uniform01((bc, half))
    u2 = uniform01((bc, half))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    t = (2.0 * np.float32(np.pi)) * u2
    z = jnp.concatenate([r * jnp.cos(t), r * jnp.sin(t)], axis=1)
    p0 = std * z

    def matvec(x):
        y = x * diag
        for k, o in enumerate(offsets):
            y = y + wd_ref[k, :][None, :] * pltpu.roll(
                x, (-o) % n_pad, axis=1)
        return y

    def lpv(x, g):
        return 0.5 * jnp.sum(x * (h + g), axis=1)

    def kev(p):
        return 0.5 * jnp.sum(im * p * p, axis=1)

    g0 = h - matvec(x)
    lp0 = lpv(x, g0)
    ke0 = kev(p0)
    m = p0 + 0.5 * eps * g0

    def body(_, carry):
        x, m = carry
        x = x + eps * im * m
        g = h - matvec(x)
        m = m + eps * g
        return (x, m)

    x, m = lax.fori_loop(0, n_steps - 1, body, (x, m))
    x = x + eps * im * m
    g1 = h - matvec(x)
    p1 = m + 0.5 * eps * g1
    la = jnp.minimum(0.0, (lpv(x, g1) - lp0) + (ke0 - kev(p1)))
    xo_ref[:] = x
    lacc_ref[:] = jnp.broadcast_to(la[:, None], (bc, 128))


def pl_program_id():
    from jax.experimental import pallas as pl

    return pl.program_id(0)


@functools.partial(jax.jit,
                   static_argnames=("offsets", "n_steps", "block_chains"))
def _pallas_dia_proposal(x, diag, wdia, h, inv_mass, std, eps, seed,
                         offsets: tuple, n_steps: int,
                         block_chains: int = 0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C, n = x.shape
    K = len(offsets)
    # 2·LANE so the paired Box–Muller halves stay lane-aligned
    n_pad = _round_up(max(n, 1), 2 * _LANE)
    c_pad = _round_up(max(C, 1), 8)
    bc = min(block_chains or _auto_bc(n_pad), c_pad)
    c_pad = _round_up(c_pad, bc)

    xp_ = jnp.zeros((c_pad, n_pad), x.dtype).at[:C, :n].set(x)
    dg_ = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(diag)
    wd_ = jnp.zeros((max(K, 1), n_pad), jnp.float32).at[:K, :n].set(wdia)
    hp_ = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(h)
    imp = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(inv_mass)
    sd_ = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(std)
    eps_arr = jnp.asarray([eps], jnp.float32)
    seed_arr = jnp.asarray([seed], jnp.int32)

    grid = (c_pad // bc,)
    kernel = functools.partial(_dia_proposal_kernel, n_steps=n_steps,
                               offsets=offsets)
    row = lambda: pl.BlockSpec((1, n_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
    blk = lambda: pl.BlockSpec((bc, n_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
    xo, lacc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk(), row(),
            pl.BlockSpec((max(K, 1), n_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            row(), row(), row(),
        ],
        out_specs=[blk(),
                   pl.BlockSpec((bc, 128), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((c_pad, n_pad), jnp.float32),
                   jax.ShapeDtypeStruct((c_pad, 128), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * (K + 1) * c_pad * n_pad * (n_steps + 1),
            bytes_accessed=4 * (2 * c_pad * n_pad + (K + 4) * n_pad),
            transcendentals=3 * c_pad * n_pad,  # log, cos, sqrt
        ),
    )(seed_arr, eps_arr, xp_, dg_, wd_, hp_, imp, sd_)
    return xo[:C, :n], lacc[:C, 0]


def dia_hmc_proposal(k_mom, xc, diag, offsets, wdia, h, inv_mass, eps,
                     n_steps: int, pos=None, inv=None, shard=None):
    """One full HMC proposal on a banded target: sample momenta,
    integrate the whole trajectory, return ``(x1 [C, n], log_acc [C])``.

    This is the fused fast path the sampler uses: everything between the
    RNG draw and the accept test runs in EMBEDDED coordinates, so the
    per-proposal embedding cost is ONE gather of x in and one gather of
    x1 out — momenta are sampled directly in embedded space (their gap
    lanes get std 0 via the zero inv_mass lanes), the kinetic energies
    reduce over embedded arrays (gap lanes contribute 0), and the
    log-potentials come back from the kernel's in-kernel reduction. The
    quad constant cancels in the ratio. All embeds are gathers via
    ``inv`` (``pos_to_inv``) — a TPU scatter on [C, 13k] rows costs ~10×
    a gather and was half the measured fixed overhead of the previous
    scatter-based formulation (docs/PERF.md round 5).
    """
    if pos is not None:
        x = _embed_gather(xc, inv)
        diag = _embed_gather(diag, inv)
        h = _embed_gather(h, inv)
        im = _embed_gather(inv_mass, inv)
    else:
        x, im = xc, inv_mass
    # gap lanes: im = 0 → std = 0 → momentum 0 → lane inert end-to-end
    std = jnp.where(im > 0, jnp.sqrt(1.0 / jnp.maximum(im, 1e-12)), 0.0)
    if n_steps == 0 or jax.default_backend() != "tpu":
        # fallback integrates with jax.random momenta (different stream
        # than the in-kernel PRNG; same posterior)
        p0 = std[None, :] * jax.random.normal(k_mom, x.shape)
        x1, p1, lp0, lp1 = dia_quad_leapfrog(
            x, p0, diag, offsets, wdia, h, im, eps, n_steps)
        ke = lambda p: 0.5 * jnp.sum(im[None, :] * p * p, axis=-1)
        log_acc = jnp.minimum(0.0, (lp1 - lp0) + (ke(p0) - ke(p1)))
    else:
        wdia_a = jnp.asarray(wdia)
        # scalar seed from the step key — one tiny threefry draw instead
        # of 16M of them
        seed = jax.random.randint(k_mom, (), 0, jnp.iinfo(jnp.int32).max,
                                  dtype=jnp.int32)
        if shard is not None:
            from lhvi_tpu.parallel.mesh import chain_axes, shard_map_chains

            axes = chain_axes(shard)
            mesh_shape = shard.mesh.shape

            def per_shard(x_, dg_, wd_, h_, im_, std_, eps_, seed_):
                # distinct PRNG stream per device (the kernel already
                # offsets by grid instance; offset by mesh position too)
                off = jnp.zeros((), jnp.int32)
                for a in axes:
                    off = off * mesh_shape[a] + jax.lax.axis_index(a)
                return _pallas_dia_proposal(
                    x_, dg_, wd_, h_, im_, std_, eps_,
                    seed_ + off * jnp.int32(1000003), offsets, n_steps)

            def no_axis(x_, dg_, wd_, h_, im_, std_, eps_, seed_):
                # uneven-split fallback runs outside shard_map (no
                # axis_index available — single stream is correct there)
                return _pallas_dia_proposal(
                    x_, dg_, wd_, h_, im_, std_, eps_, seed_,
                    offsets, n_steps)

            fn = shard_map_chains(per_shard, shard, n_sharded_args=1,
                                  fallback=no_axis)
            x1, log_acc = fn(x, diag, wdia_a, h, im, std, eps, seed)
        else:
            x1, log_acc = _pallas_dia_proposal(
                x, diag, wdia_a, h, im, std, eps, seed, offsets, n_steps)
    log_acc = jnp.where(jnp.isfinite(log_acc), log_acc, -jnp.inf)
    if pos is not None:
        x1 = x1[..., pos]
    return x1, log_acc
