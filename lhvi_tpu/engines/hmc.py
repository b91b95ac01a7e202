"""HMC-within-Gibbs sampler for hybrid MRFs.

New capability mandated by BASELINE.json's north-star (the reference has no
sampler of this family): continuous latents move by Hamiltonian Monte Carlo
(leapfrog + Metropolis correction, dual-averaging step-size adaptation,
diagonal mass-matrix adaptation); discrete latents move by chromatic
parallel Gibbs using the compiler's precomputed conflict coloring
(``CompiledFG.color_of``) — all colors' conditionals are evaluated as one
batched pass per color, so a sweep costs ``n_colors`` fused bucket
evaluations regardless of variable count.

Everything is one ``lax.scan`` under ``jit``; chains are a leading axis
(vmapped), ready to be sharded over a mesh ``chains`` axis by
``lhvi_tpu.parallel``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from lhvi_tpu.fg.compile import CompiledFG, expand_params
from lhvi_tpu.ops.select import select_last

Array = jax.Array
_NEG_BIG = -1e30


@struct.dataclass
class HMCConfig:
    n_leapfrog: int = struct.field(pytree_node=False, default=8)
    init_step_size: float = struct.field(pytree_node=False, default=0.1)
    target_accept: float = struct.field(pytree_node=False, default=0.8)
    gibbs_sweeps: int = struct.field(pytree_node=False, default=1)
    gibbs_max_colors: int = struct.field(pytree_node=False, default=0)
    adapt_mass: bool = struct.field(pytree_node=False, default=True)
    jitter: float = struct.field(pytree_node=False, default=1.0)
    # opt-in Pallas fused log-potential/leapfrog for non-quad targets
    # (ops/logpot.py; at parity with the XLA path at measured scales)
    fused_logpot: bool = struct.field(pytree_node=False, default=False)
    # unroll factor for the per-color planned-Gibbs scan: sweeps over
    # many small color classes (e.g. 288 at pod scale) are loop-latency
    # bound, not FLOP bound — unrolling trades program size for fewer
    # sequential while-loop iterations
    gibbs_unroll: int = struct.field(pytree_node=False, default=1)
    # chain-axis NamedSharding, stamped by run_hmc(shard=...); routes the
    # Pallas quad leapfrog through shard_map (one kernel per device)
    shard: object = struct.field(pytree_node=False, default=None)


class HMCState(NamedTuple):
    xc: Array  # [C, n_cont]
    xd: Array  # [C, n_disc]
    log_eps: Array  # dual-averaging state (scalars)
    log_eps_bar: Array
    h_bar: Array
    t: Array
    welford_mean: Array  # [n_cont]
    welford_m2: Array
    welford_n: Array
    inv_mass: Array  # [n_cont] diagonal


def _leapfrog(logp, xc, p, eps, inv_mass, n_steps):
    """Standard leapfrog integrator; logp is log π(xc) for fixed xd."""
    grad = jax.grad(logp)

    def body(_, carry):
        x, m = carry
        m = m + 0.5 * eps * grad(x)
        x = x + eps * inv_mass * m
        m = m + 0.5 * eps * grad(x)
        return (x, m)

    return jax.lax.fori_loop(0, n_steps, body, (xc, p))


def gibbs_sweep(fg: CompiledFG, key: Array, xc: Array, xd: Array,
                max_colors: int = 0) -> Array:
    """Chromatic-Gibbs sweep over the discrete latents of one chain.

    ``max_colors > 0`` processes only that many color classes per sweep,
    starting at a random rotation — a random-scan Gibbs kernel that caps
    the per-iteration cost on graphs whose conflict graph needs many
    colors (dense MLNs can need O(n) of them) while every variable is
    still updated with its exact full conditional when its color comes up.
    """
    if fg.n_disc == 0:
        return xd

    def color_step(xd, inp):
        k, c = inp
        logits = fg.disc_logits(xc, xd)  # [n_disc, V]
        new = jax.random.categorical(k, logits, axis=-1).astype(jnp.int32)
        xd = jnp.where(fg.color_of == c, new, xd)
        return xd, None

    n = fg.n_colors
    if 0 < max_colors < n:
        k_rot, key = jax.random.split(key)
        off = jax.random.randint(k_rot, (), 0, n)
        n = max_colors
    else:
        off = jnp.zeros((), jnp.int32)
    colors = (jnp.arange(n, dtype=jnp.int32) + off) % fg.n_colors
    keys = jax.random.split(key, n)
    xd, _ = jax.lax.scan(color_step, xd, (keys, colors))
    return xd


def state_values(fg: CompiledFG, xd: Array) -> Array:
    """Map a discrete index state [n_disc] to domain VALUES [n_disc]
    (one-hot multiply-add over the per-var value table; V is tiny)."""
    if fg.n_disc == 0:
        return jnp.zeros((0,))
    out = jnp.zeros(xd.shape)
    for v in range(fg.max_v):
        out = out + jnp.where(xd == v, fg.disc_vals[..., v], 0.0)
    return out


def _color_class_logits(fg: CompiledFG, grp, tabs, xc, xd, xv):
    """Full-conditional logits ``[M, V]`` for one color class of a
    ``GibbsColorPlan`` group; ``tabs`` are the group's tables sliced at
    one color (leading [nc] axis removed); ``xv`` is the maintained
    value state ``state_values(fg, xd)``.

    Value lookups are all in value space via compile-time tables
    (``disc_cval``/``sub_vals``) + the maintained value state: a runtime
    ``take_along_axis`` over the [R, ad, K] value tables materializes a
    128-lane-padded copy of the candidate index tensor (measured: ~5 GB
    and ~6 ms PER color step at pod scale, and an OOM at 256 chains).
    """
    V = fg.max_v
    M = grp.n_vars
    logits = jnp.zeros((M, V))
    cand = jnp.arange(V, dtype=jnp.int32)
    for b, t in zip(fg.buckets, tabs):
        if t is None:
            continue
        R, ad = t["disc_idx"].shape
        xcs = jnp.where(
            t["cont_mask"] > 0,
            xc[t["cont_idx"]] if xc.shape[0] else jnp.zeros_like(t["cont_const"]),
            t["cont_const"],
        )  # [R, ac]
        lat = t["disc_mask"] > 0
        # values-as-indices fast path (tables dropped at plan build)
        cval = (t["disc_const"].astype(jnp.float32)
                if t["disc_cval"] is None else t["disc_cval"])
        if xd.shape[0]:
            xdi = jnp.where(lat, xd[t["disc_idx"]], t["disc_const"])
            # xv=None: all latent values ARE their indices (plan flag) —
            # no value state exists, derive from the index gather
            xdv = (jnp.where(lat, xdi.astype(jnp.float32), cval)
                   if xv is None
                   else jnp.where(lat, xv[t["disc_idx"]], cval))
        else:
            xdi = t["disc_const"]
            xdv = cval
        sub = t["sub"][:, None, :]
        xdi_p = jnp.where(
            sub, cand[None, :, None],
            jnp.broadcast_to(xdi[:, None, :], (R, V, ad)),
        )  # [R, V, ad] — all slots of the target var move jointly
        sub_vals = (cand.astype(jnp.float32)[None, :]
                    if t["sub_vals"] is None else t["sub_vals"])
        xdv_p = jnp.where(
            sub, sub_vals[:, :, None],
            jnp.broadcast_to(xdv[:, None, :], (R, V, ad)),
        )
        lp = b.kernel(
            expand_params(t["params"], 1), xcs[:, None, :], xdi_p, xdv_p
        )  # [R, V]
        contrib = jnp.nan_to_num(lp, neginf=_NEG_BIG) * t["w"][:, None]
        # scatter-free per-var reduction: vidx [M, D] indexes this color's
        # rows (R = appended zero row)
        contrib = jnp.concatenate([contrib, jnp.zeros((1, V))], axis=0)
        logits = logits + jnp.sum(contrib[t["vidx"]], axis=1)
    return logits


def gibbs_sweep_planned(fg: CompiledFG, key: Array, xc: Array,
                        xd: Array, beta=1.0, unroll: int = 1) -> Array:
    """One FULL exact chromatic sweep via the compile-time color plan.

    Each scan step evaluates only the factor rows adjacent to that color's
    variables (pre-gathered tables), so a full sweep costs O(Σ_v deg(v))
    kernel rows — vs O(n_colors · n_factors) for the all-rows path. Colors
    of similar cost share a scan (uniform padding); updating a subset of a
    color class at a time is still valid parallel Gibbs (subsets of
    independent sets are independent).
    """
    if fg.n_disc == 0:
        return xd
    # unroll < 1 would reach lax.scan's unroll argument and fail with an
    # obscure scan error far from the config — clamp here (single choke
    # point for every caller: HMC, NUTS, SMC rejuvenation)
    unroll = max(1, int(unroll))
    V = fg.max_v
    # value state is only carried when some latent domain's values differ
    # from its indices; the common MLN case carries indices alone (plan
    # flag values_are_indices — no second scatter per color step)
    vai = fg.color_plan.values_are_indices
    xv = None if vai else state_values(fg, xd)
    for gi, grp in enumerate(fg.color_plan.groups):
        gkey = jax.random.fold_in(key, gi)
        keys = jax.random.split(gkey, grp.n_colors)

        def step(carry, s, grp=grp):
            xd, xv = carry
            logits = _color_class_logits(fg, grp, s["tabs"], xc, xd, xv)
            valid = (
                jnp.arange(V, dtype=jnp.int32)[None, :] < s["sizes"][:, None]
            )
            logits = jnp.where(valid, beta * logits, _NEG_BIG)
            new = jax.random.categorical(s["key"], logits, axis=-1).astype(
                jnp.int32
            )
            # padded var slots carry id n_disc -> dropped by the scatter
            xd = xd.at[s["vars"]].set(new, mode="drop")
            if xv is not None:
                # the sampled indices' domain values, via the class value
                # table (one-hot multiply-add — V is tiny and static)
                nv = jnp.zeros(new.shape)
                for v in range(V):
                    nv = nv + jnp.where(new == v, s["vals"][:, v], 0.0)
                xv = xv.at[s["vars"]].set(nv, mode="drop")
            return (xd, xv), None

        xs = {
            "key": keys,
            "vars": grp.vars_,
            "sizes": grp.sizes,
            "vals": None if vai else grp.vals_,
            "tabs": grp.bucket_tabs,
        }
        (xd, xv), _ = jax.lax.scan(step, (xd, xv), xs,
                                   unroll=min(unroll, grp.n_colors))
    return xd


def planned_logits(fg: CompiledFG, xc: Array, xd: Array) -> Array:
    """Assemble ``disc_logits``-shaped ``[n_disc, V]`` logits from the
    color plan at a FIXED state (no sequential updates) — the exact-identity
    hook used by tests to prove the plan matches ``CompiledFG.disc_logits``."""
    V = fg.max_v
    out = jnp.zeros((fg.n_disc + 1, V))
    xv = (None if fg.color_plan.values_are_indices
          else state_values(fg, xd))
    for grp in fg.color_plan.groups:
        for j in range(grp.n_colors):
            tabs = tuple(
                None if t is None else jax.tree_util.tree_map(
                    lambda a: a[j], t
                )
                for t in grp.bucket_tabs
            )
            lg = _color_class_logits(fg, grp, tabs, xc, xd, xv)
            out = out.at[grp.vars_[j]].set(lg, mode="drop")
    out = out[: fg.n_disc]
    valid = (
        jnp.arange(V, dtype=jnp.int32)[None, :] < fg.disc_sizes[:, None]
    )
    return jnp.where(valid, out, _NEG_BIG)


class _StreamDiag(NamedTuple):
    """Per-chain streaming accumulators for convergence diagnostics in
    ``collect="moments"`` mode (SURVEY.md §6 metrics plan: R̂/ESS must be
    available exactly where runs are too big to materialize samples).

    Carries two per-chain Welford pairs (first/second half of the draw
    window — the two "split" chains of split-R̂) and a lag-1 cross-product
    for an AR(1) ESS proxy. All [C, n_cont]. Full-window moments are
    derived at finalize by Chan-merging the two halves, and each step
    updates ONE half's pair (``lax.cond`` on the scalar draw index) — the
    streamed-diag HBM traffic per draw is 5 [C, n] round-trips, not the
    17 of the naive 8-accumulator formulation (measured 36% of headline
    HMC throughput at 65k chains; docs/PERF.md round 4)."""

    h1_mean: Array
    h1_m2: Array
    h2_mean: Array
    h2_m2: Array
    cross: Array
    prev: Array


def _stream_diag_init(C: int, n: int) -> _StreamDiag:
    z = jnp.zeros((C, n))
    return _StreamDiag(z, z, z, z, z, z)


def _stream_diag_update(sd: _StreamDiag, t, xc: Array,
                        half: int) -> _StreamDiag:
    """Fold draw ``t`` (0-based) of every chain into the accumulators."""
    tf = t.astype(xc.dtype)

    def welford(mean, m2, cnt_new):
        delta = xc - mean
        mean2 = mean + delta / jnp.maximum(cnt_new, 1.0)
        return mean2, m2 + delta * (xc - mean2)

    def upd1(_):
        m, s = welford(sd.h1_mean, sd.h1_m2, tf + 1.0)
        return m, s, sd.h2_mean, sd.h2_m2

    def upd2(_):
        m, s = welford(sd.h2_mean, sd.h2_m2, tf + 1.0 - half)
        return sd.h1_mean, sd.h1_m2, m, s

    def noop(_):  # odd-S tail draw: belongs to neither split half
        return sd.h1_mean, sd.h1_m2, sd.h2_mean, sd.h2_m2

    h1_mean, h1_m2, h2_mean, h2_m2 = jax.lax.cond(
        tf < half, upd1,
        lambda o: jax.lax.cond(tf < 2.0 * half, upd2, noop, o),
        None,
    )
    cross = sd.cross + jnp.where(tf > 0, xc * sd.prev, 0.0)
    return _StreamDiag(h1_mean, h1_m2, h2_mean, h2_m2, cross, xc)


def _stream_diag_finalize(sd: _StreamDiag, n_samples: int) -> dict:
    """{'rhat': [n], 'ess_proxy': [n]} from the streamed accumulators.

    ``rhat`` is EXACT split-R̂ (identical to ``utils.diagnostics.split_rhat``
    on the materialized [S, C, n] samples — the per-half Welford pairs are
    the same chain means/variances). ``ess_proxy`` is the AR(1)
    approximation S·C·(1−ρ̂₁)/(1+ρ̂₁) from the pooled lag-1 autocorrelation —
    a cheap streamed stand-in for the Geyer estimator (it ignores
    higher-lag structure; use ``utils.diagnostics.ess`` on materialized
    samples when exactness matters). The per-chain full-window moments it
    needs are Chan-merged from the two half pairs (equal counts), not
    carried separately."""
    C, n = sd.h1_mean.shape
    half = n_samples // 2
    if half < 2:
        nanv = jnp.full((n,), jnp.nan)
        return {"rhat": nanv, "ess_proxy": nanv}
    chain_mean = jnp.concatenate([sd.h1_mean, sd.h2_mean], axis=0)
    chain_var = jnp.concatenate([sd.h1_m2, sd.h2_m2], axis=0) / (half - 1)
    B = half * jnp.var(chain_mean, axis=0, ddof=1)
    W = jnp.mean(chain_var, axis=0)
    var_hat = (half - 1) / half * W + B / half
    rhat = jnp.sqrt(var_hat / jnp.maximum(W, 1e-12))
    S = n_samples
    # Chan merge of the equal-count halves → per-chain moments over the
    # 2·half window (the odd tail draw, if any, is excluded here but
    # included in `cross` — an O(1/S) wobble well inside proxy accuracy)
    f_mean = 0.5 * (sd.h1_mean + sd.h2_mean)
    f_m2 = sd.h1_m2 + sd.h2_m2 + 0.5 * half * (sd.h1_mean - sd.h2_mean) ** 2
    var_c = f_m2 / max(2 * half - 1, 1)
    rho1 = (sd.cross / max(S - 1, 1) - f_mean * f_mean) / jnp.maximum(
        var_c, 1e-12
    )
    rho1 = jnp.clip(jnp.mean(rho1, axis=0), 0.0, 0.999)
    ess = S * C * (1.0 - rho1) / (1.0 + rho1)
    return {"rhat": rhat, "ess_proxy": ess}


def _hmc_step_batched(fg: CompiledFG, cfg: HMCConfig, key, xc, xd, eps,
                      inv_mass):
    """One HMC proposal for ALL chains at once.

    On purely-quadratic continuous targets this routes through the fused
    Pallas leapfrog (one MXU matmul per step, state resident in VMEM);
    otherwise all chains run one LOCKSTEP batched leapfrog driven by
    ``∇ log_prob_cont_batched`` — one fused gather/kernel program per
    bucket for the whole batch, and the purely-discrete buckets (constant
    in xc at the chain's fixed xd, e.g. the pod-scale MLN cliques) drop
    out of the Hamiltonian exactly (they cancel in the MH ratio and have
    zero xc-gradient).
    """
    if not fg.cont_pure_quad:
        from lhvi_tpu.ops.logpot import logpot_leapfrog

        C = xc.shape[0]
        k_mom, k_acc = jax.random.split(key)
        std = jnp.sqrt(1.0 / jnp.maximum(inv_mass, 1e-12))
        p0 = std[None, :] * jax.random.normal(k_mom, xc.shape)
        # fused-by-XLA batched leapfrog by default; cfg.fused_logpot
        # opts into the Pallas fused log-potential kernel (ops/logpot.py)
        # — either way the trajectory energies come back with the endpoint
        x1, p1, lp0, lp1 = logpot_leapfrog(
            fg, xc, p0, xd, inv_mass, eps, cfg.n_leapfrog,
            plan="auto" if cfg.fused_logpot else None,
        )
        ke = lambda p: 0.5 * jnp.sum(inv_mass[None, :] * p * p, axis=-1)
        h0 = -lp0 + ke(p0)
        h1 = -lp1 + ke(p1)
        log_acc = jnp.minimum(0.0, h0 - h1)
        log_acc = jnp.where(jnp.isfinite(log_acc), log_acc, -jnp.inf)
        accept = jnp.log(jax.random.uniform(k_acc, (C,))) < log_acc
        xc = jnp.where(accept[:, None], x1, xc)
        return xc, jnp.exp(log_acc)

    from lhvi_tpu.ops.leapfrog import ell_quad_leapfrog, quad_leapfrog

    C = xc.shape[0]
    k_mom, k_acc = jax.random.split(key)
    std = jnp.sqrt(1.0 / jnp.maximum(inv_mass, 1e-12))
    p0 = std[None, :] * jax.random.normal(k_mom, xc.shape)
    ke = lambda p: 0.5 * jnp.sum(inv_mass[None, :] * p * p, axis=-1)
    if fg.quad_sparse:
        # ELL fused path (n_cont beyond the dense cap): pure-XLA batched
        # leapfrog on the gather·multiply·sum matvec — GSPMD partitions
        # it natively on a sharded chain axis (no shard_map needed). The
        # endpoint gradients come back free: lp = c + ½·x·(h + g), so
        # the accept step costs no extra matvecs.
        x1, p1, g0, g1 = ell_quad_leapfrog(
            xc, p0, fg.quad_diag, fg.quad_ell_col, fg.quad_ell_w,
            fg.quad_h, inv_mass, eps, cfg.n_leapfrog,
        )
        hq = fg.quad_h[None, :]
        lp0 = fg.quad_c + 0.5 * jnp.sum(xc * (hq + g0), axis=-1)
        lp1 = fg.quad_c + 0.5 * jnp.sum(x1 * (hq + g1), axis=-1)
        h0 = -lp0 + ke(p0)
        h1 = -lp1 + ke(p1)
    else:
        x1, p1 = quad_leapfrog(
            xc, p0, fg.quad_J, fg.quad_h, inv_mass, eps, cfg.n_leapfrog,
            shard=cfg.shard,
        )
        h0 = -fg.quad_log_prob_batched(xc) + ke(p0)
        h1 = -fg.quad_log_prob_batched(x1) + ke(p1)
    log_acc = jnp.minimum(0.0, h0 - h1)
    log_acc = jnp.where(jnp.isfinite(log_acc), log_acc, -jnp.inf)
    accept = jnp.log(jax.random.uniform(k_acc, (C,))) < log_acc
    xc = jnp.where(accept[:, None], x1, xc)
    return xc, jnp.exp(log_acc)


def sweep_all(fg: CompiledFG, cfg: HMCConfig, key, xc, xd):
    """cfg.gibbs_sweeps chromatic sweeps over all chains.

    Uses the compile-time per-color plan (full exact sweeps at
    O(Σ deg) cost) when available; ``gibbs_max_colors > 0`` keeps the
    legacy rotated all-rows path (random-scan with capped per-iteration
    cost — mostly obsolete now that full planned sweeps are cheaper than
    one rotated legacy step).
    """
    planned = fg.color_plan is not None and cfg.gibbs_max_colors == 0
    for _ in range(cfg.gibbs_sweeps):
        keys = jax.random.split(key, xc.shape[0] + 1)
        key = keys[0]
        if planned:
            xd = jax.vmap(
                lambda k, a, b: gibbs_sweep_planned(
                    fg, k, a, b, unroll=cfg.gibbs_unroll)
            )(keys[1:], xc, xd)
        else:
            xd = jax.vmap(
                lambda k, a, b: gibbs_sweep(fg, k, a, b, cfg.gibbs_max_colors)
            )(keys[1:], xc, xd)
    return xd


def hmc_transition(fg: CompiledFG, cfg: HMCConfig, state: HMCState, key,
                   adapt: bool):
    """One full HMC-within-Gibbs transition for all chains; the unit the
    run/warmup scans and the checkpointed driver are built from."""
    k_g, k_h = jax.random.split(key)
    xd = sweep_all(fg, cfg, k_g, state.xc, state.xd)
    eps = jnp.exp(state.log_eps)
    xc, acc = _hmc_step_batched(fg, cfg, k_h, state.xc, xd, eps,
                                state.inv_mass)
    state = state._replace(xc=xc, xd=xd)
    if adapt:
        state = _da_update(state, jnp.mean(acc), cfg)
        state = _welford_update(state, xc)
    return state, acc


def init_hmc_state(fg: CompiledFG, key, cfg: HMCConfig, n_chains: int,
                   shard=None) -> HMCState:
    """Fresh batched sampler state (pre-warmup)."""
    xc, xd = fg.init_state_batched(key, n_chains, cfg.jitter)
    if shard is not None:
        xc = jax.lax.with_sharding_constraint(xc, shard)
        xd = jax.lax.with_sharding_constraint(xd, shard)
    return HMCState(
        xc=xc, xd=xd,
        log_eps=jnp.log(jnp.asarray(cfg.init_step_size)),
        log_eps_bar=jnp.log(jnp.asarray(cfg.init_step_size)),
        h_bar=jnp.zeros(()), t=jnp.zeros(()),
        welford_mean=jnp.zeros(fg.n_cont),
        welford_m2=jnp.zeros(fg.n_cont),
        welford_n=jnp.zeros(()),
        inv_mass=jnp.ones(fg.n_cont),
    )


def _mass_refresh(fg: CompiledFG, cfg, state: HMCState) -> HMCState:
    if not cfg.adapt_mass or fg.n_cont == 0:
        return state
    var = state.welford_m2 / jnp.maximum(state.welford_n - 1.0, 1.0)
    inv_mass = jnp.where(state.welford_n > 10.0, jnp.maximum(var, 1e-6), 1.0)
    return state._replace(inv_mass=inv_mass)


def run_warmup(fg: CompiledFG, cfg, state: HMCState, k_warm, n_warmup: int,
               transition):
    """Two-phase warmup (dual-averaging; mass refresh between phases).
    ``transition(state, key, adapt) -> (state, acc)`` — HMC or NUTS.
    """
    if n_warmup <= 0:
        return state

    def warm_step(state, key):
        state, acc = transition(state, key, True)
        return state, jnp.mean(acc)

    half = max(n_warmup // 2, 1)
    state, _ = jax.lax.scan(warm_step, state, jax.random.split(k_warm, half))
    state = _mass_refresh(fg, cfg, state)
    state = state._replace(
        h_bar=jnp.zeros(()), t=jnp.zeros(()),
        welford_mean=jnp.zeros(fg.n_cont),
        welford_m2=jnp.zeros(fg.n_cont), welford_n=jnp.zeros(()),
    )
    state, _ = jax.lax.scan(
        warm_step, state,
        jax.random.split(jax.random.fold_in(k_warm, 1), n_warmup - half),
    )
    state = _mass_refresh(fg, cfg, state)
    return state._replace(log_eps=state.log_eps_bar)


def _da_update(state: HMCState, accept_mean, cfg: HMCConfig):
    """Nesterov dual averaging on log step size (Hoffman–Gelman 2014)."""
    gamma, t0, kappa = 0.05, 10.0, 0.75
    mu = jnp.log(10.0 * cfg.init_step_size)
    t = state.t + 1.0
    h_bar = (1.0 - 1.0 / (t + t0)) * state.h_bar + (
        cfg.target_accept - accept_mean
    ) / (t + t0)
    log_eps = mu - jnp.sqrt(t) / gamma * h_bar
    w = t ** (-kappa)
    log_eps_bar = w * log_eps + (1.0 - w) * state.log_eps_bar
    return state._replace(
        log_eps=log_eps, log_eps_bar=log_eps_bar, h_bar=h_bar, t=t
    )


def _welford_update(state: HMCState, xc):
    """Chan et al. batched Welford: fold all C chain states in at once (the
    estimand is the cross-chain posterior variance, not the chain-mean's)."""
    C = xc.shape[0]
    n_new = state.welford_n + C
    batch_mean = jnp.mean(xc, axis=0)
    batch_m2 = jnp.sum((xc - batch_mean) ** 2, axis=0)
    delta = batch_mean - state.welford_mean
    mean = state.welford_mean + delta * (C / n_new)
    m2 = state.welford_m2 + batch_m2 + delta**2 * (state.welford_n * C / n_new)
    return state._replace(welford_mean=mean, welford_m2=m2, welford_n=n_new)


@partial(jax.jit, static_argnames=("n_chains", "n_warmup", "n_samples",
                                   "thin", "collect", "shard",
                                   "stream_diag"))
def run_hmc(
    fg: CompiledFG,
    key: Array,
    cfg: HMCConfig = HMCConfig(),
    n_chains: int = 8,
    n_warmup: int = 500,
    n_samples: int = 1000,
    thin: int = 1,
    collect: str = "samples",
    shard=None,
    stream_diag: bool = True,
):
    """Run the sampler.

    collect="samples": returns (samples_xc [S,C,n_cont], samples_xd
    [S,C,n_disc], diag). collect="moments": streams sufficient statistics
    on-device instead of materializing the sample array (the production
    mode for large runs — avoids S·C·n HBM traffic and host transfer);
    returns (moments dict, None, diag).

    shard: optional ``NamedSharding`` for the chains axis (e.g. from
    ``lhvi_tpu.parallel.chain_sharding``) — the whole scan then runs with
    chain state distributed over the mesh; reductions (mean accept,
    Welford, streamed moments) become cross-device collectives inserted
    by XLA.

    stream_diag (moments mode): carry the streamed split-R̂/ESS
    accumulators (default — production runs want convergence evidence).
    Set False for pure-throughput measurement: the accumulators cost
    ~5 [C, n] HBM round-trips per draw, a measured 36% of headline HMC
    throughput at 65k chains on small models (docs/PERF.md round 4).
    """
    k_init, k_warm, k_samp = jax.random.split(key, 3)
    if shard is not None:
        if cfg.fused_logpot:
            # a pallas_call does not SPMD-partition: keeping the fused
            # non-quad kernel on a sharded chain axis would gather the
            # full [C, n] state onto one device every transition
            cfg = cfg.replace(fused_logpot=False)
        # the quad leapfrog kernel, by contrast, dispatches per-shard via
        # shard_map (chains never communicate inside a transition)
        cfg = cfg.replace(shard=shard)
    state = init_hmc_state(fg, k_init, cfg, n_chains, shard)
    trans = lambda s, k, adapt: hmc_transition(fg, cfg, s, k, adapt)
    state = run_warmup(fg, cfg, state, k_warm, n_warmup, trans)

    def sample_step(state: HMCState, key):
        # thin streams INSIDE the scan step: only every thin-th state is
        # emitted, so the retained array is [n_samples, C, n] — never the
        # un-thinned [n_samples*thin, C, n]
        def inner(t, carry):
            state, _ = carry
            state, acc = trans(state, jax.random.fold_in(key, t), False)
            return state, jnp.mean(acc)

        state, acc = jax.lax.fori_loop(0, thin, inner, (state, 0.0))
        return state, (state.xc, state.xd, acc)

    if collect == "moments":
        half = n_samples // 2

        def moment_step(carry, inp):
            key, t = inp
            state, s1, s2, cnt, sd = carry
            state, (xc, xd, acc) = sample_step(state, key)
            s1 = s1 + jnp.sum(xc, axis=0)
            s2 = s2 + jnp.sum(xc * xc, axis=0)
            if fg.n_disc:
                oh = jax.nn.one_hot(xd, fg.max_v, dtype=jnp.float32)
                cnt = cnt + jnp.sum(oh, axis=0)
            if stream_diag:
                sd = _stream_diag_update(sd, t, xc, half)
            return (state, s1, s2, cnt, sd), acc

        z1 = jnp.zeros(fg.n_cont)
        z2 = jnp.zeros(fg.n_cont)
        zc = jnp.zeros((max(fg.n_disc, 1), fg.max_v))
        sd0 = (_stream_diag_init(n_chains, fg.n_cont) if stream_diag
               else ())
        (state, s1, s2, cnt, sd), accs = jax.lax.scan(
            moment_step, (state, z1, z2, zc, sd0),
            (jax.random.split(k_samp, n_samples),
             jnp.arange(n_samples, dtype=jnp.int32)),
        )
        n_obs = n_samples * n_chains
        mean = s1 / n_obs
        var = jnp.maximum(s2 / n_obs - mean**2, 0.0)
        moments = {
            "mean": mean,
            "var": var,
            "disc_probs": cnt / n_obs,
            "n_obs": n_obs,
        }
        diag = {
            "accept_rate": jnp.mean(accs),
            "step_size": jnp.exp(state.log_eps),
            "inv_mass": state.inv_mass,
            **(_stream_diag_finalize(sd, n_samples) if stream_diag else {}),
        }
        return moments, None, diag

    state, (s_xc, s_xd, accs) = jax.lax.scan(
        sample_step, state, jax.random.split(k_samp, n_samples)
    )
    diag = {
        "accept_rate": jnp.mean(accs),
        "step_size": jnp.exp(state.log_eps),
        "inv_mass": state.inv_mass,
    }
    return s_xc, s_xd, diag


class HMCResult:
    """Query wrapper mapping RVs to marginal statistics (reference
    ``belief/map`` query parity, SURVEY.md §2 L3)."""

    def __init__(self, fg: CompiledFG, s_xc, s_xd, diag):
        import numpy as np

        self.fg = fg
        s_xc, s_xd = np.asarray(s_xc), np.asarray(s_xd)
        n_draws = s_xc.shape[0] * s_xc.shape[1]
        self.xc = s_xc.reshape(n_draws, fg.n_cont)  # [S*C, n]
        self.xd = s_xd.reshape(n_draws, fg.n_disc)
        self.diag = {k: np.asarray(v) for k, v in diag.items()}

    def _loc(self, rv, want):
        kind, i = self.fg.meta.loc(rv)
        if kind == "obs":
            raise ValueError(f"{rv} is observed (evidence); it has no posterior")
        if kind != want:
            raise ValueError(f"{rv} is {'continuous' if kind=='c' else 'discrete'}")
        return i

    def mean(self, rv) -> float:
        return float(self.xc[:, self._loc(rv, "c")].mean())

    def var(self, rv) -> float:
        return float(self.xc[:, self._loc(rv, "c")].var())

    def disc_marginal(self, rv):
        import numpy as np

        i = self._loc(rv, "d")
        size = self.fg.meta.disc_size(rv)
        counts = np.bincount(self.xd[:, i], minlength=size)[:size]
        return counts / counts.sum()

    def map(self, rv):
        kind, _ = self.fg.meta.loc(rv)
        if kind == "c":
            return float(self.xc[:, self._loc(rv, "c")].mean())
        probs = self.disc_marginal(rv)
        return self.fg.meta.disc_values(rv)[int(probs.argmax())]


class HMCMoments:
    """Query wrapper over streamed sufficient statistics (collect="moments")."""

    def __init__(self, fg: CompiledFG, moments, diag):
        import numpy as np

        self.fg = fg
        self.moments = {k: np.asarray(v) for k, v in moments.items()}
        self.diag = {k: np.asarray(v) for k, v in diag.items()}

    def _loc(self, rv, want):
        kind, i = self.fg.meta.loc(rv)
        if kind == "obs":
            raise ValueError(f"{rv} is observed (evidence); it has no posterior")
        if kind != want:
            raise ValueError(f"{rv} is {'continuous' if kind == 'c' else 'discrete'}")
        return i

    def mean(self, rv) -> float:
        return float(self.moments["mean"][self._loc(rv, "c")])

    def var(self, rv) -> float:
        return float(self.moments["var"][self._loc(rv, "c")])

    def disc_marginal(self, rv):
        i = self._loc(rv, "d")
        return self.moments["disc_probs"][i, : self.fg.meta.disc_size(rv)]

    def map(self, rv):
        kind, _ = self.fg.meta.loc(rv)
        if kind == "c":
            return self.mean(rv)
        p = self.disc_marginal(rv)
        return self.fg.meta.disc_values(rv)[int(p.argmax())]


def sample(fg: CompiledFG, key, **kw):
    """Convenience wrapper: run and wrap results for RV-level queries."""
    cfg = kw.pop("cfg", HMCConfig())
    if kw.get("collect") == "moments":
        moments, _, diag = run_hmc(fg, key, cfg, **kw)
        return HMCMoments(fg, moments, diag)
    s_xc, s_xd, diag = run_hmc(fg, key, cfg, **kw)
    return HMCResult(fg, s_xc, s_xd, diag)
