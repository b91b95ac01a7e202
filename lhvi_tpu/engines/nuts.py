"""No-U-Turn Sampler (iterative, multinomial) for hybrid MRFs.

BASELINE.json north-star backend ("NUTS/HMC"). Fully ``jit``/``vmap``
compatible: the recursive tree doubling is replaced by the iterative
formulation — a trajectory is extended one leapfrog leaf at a time inside
``lax.while_loop``; the U-turn checks of the recursive scheme are
reproduced with a checkpoint stack of the left boundaries of completed
power-of-two subtrees (store leaf n at slot popcount(n); when finishing odd
leaf r, check it against boundaries r+1−2^l for l = 1..ctz(r+1)).
Proposals are multinomial (streaming logsumexp weights); divergences and
U-turns terminate a doubling; discrete latents move by the same chromatic
Gibbs sweeps as ``engines.hmc``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from lhvi_tpu.fg.compile import CompiledFG
from lhvi_tpu.engines import hmc as _hmc

Array = jax.Array
_DIVERGENCE = 1000.0


@struct.dataclass
class NUTSConfig:
    max_depth: int = struct.field(pytree_node=False, default=8)
    init_step_size: float = struct.field(pytree_node=False, default=0.1)
    target_accept: float = struct.field(pytree_node=False, default=0.8)
    gibbs_sweeps: int = struct.field(pytree_node=False, default=1)
    adapt_mass: bool = struct.field(pytree_node=False, default=True)
    jitter: float = struct.field(pytree_node=False, default=1.0)


def _popcount(n):
    return jax.lax.population_count(n.astype(jnp.uint32)).astype(jnp.int32)


def _ctz(n):
    """Count trailing zeros (n > 0)."""
    u = n.astype(jnp.uint32)
    return _popcount((u & (~u + 1)) - 1)


def _uturn(dq, p_l, p_r, inv_mass):
    return (jnp.dot(dq, inv_mass * p_l) < 0.0) | (
        jnp.dot(dq, inv_mass * p_r) < 0.0
    )


def _nuts_step(logp, key, q0, eps, inv_mass, max_depth: int):
    """One NUTS transition for a single chain. Returns (q1, accept_stat,
    depth, diverged)."""
    n = q0.shape[0]
    grad = jax.grad(logp)
    std = jnp.sqrt(1.0 / jnp.maximum(inv_mass, 1e-12))

    k_mom, k_loop = jax.random.split(key)
    p0 = std * jax.random.normal(k_mom, (n,))

    def hamiltonian(q, p):
        return -logp(q) + 0.5 * jnp.sum(inv_mass * p * p)

    h0 = hamiltonian(q0, p0)

    def leapfrog(q, p, direction):
        e = direction * eps
        p = p + 0.5 * e * grad(q)
        q = q + e * inv_mass * p
        p = p + 0.5 * e * grad(q)
        return q, p

    # trajectory state
    class S(NamedTuple):
        key: Array
        q_l: Array
        p_l: Array
        q_r: Array
        p_r: Array
        q_prop: Array
        log_w: Array  # multinomial total weight of trajectory
        sum_acc: Array  # Σ min(1, exp(h0−h)) for accept-stat
        n_leaf: Array
        depth: Array
        turning: Array
        diverged: Array
        q_ck: Array  # [max_depth+1, n] checkpoint positions
        p_ck: Array

    s0 = S(
        key=k_loop,
        q_l=q0, p_l=p0, q_r=q0, p_r=p0,
        q_prop=q0,
        log_w=jnp.zeros(()),
        sum_acc=jnp.zeros(()),
        n_leaf=jnp.ones((), jnp.int32),
        depth=jnp.zeros((), jnp.int32),
        turning=jnp.zeros((), bool),
        diverged=jnp.zeros((), bool),
        q_ck=jnp.zeros((max_depth + 1, n)),
        p_ck=jnp.zeros((max_depth + 1, n)),
    )

    def doubling_cond(s: S):
        return (
            (s.depth < max_depth) & (~s.turning) & (~s.diverged)
        )

    def doubling_body(s: S):
        key, k_dir, k_merge, k_leaf = jax.random.split(s.key, 4)
        direction = jnp.where(
            jax.random.bernoulli(k_dir, 0.5), 1.0, -1.0
        )
        n_steps = 1 << s.depth  # subtree size = 2^depth

        # start from the chosen end
        q_start = jnp.where(direction > 0, s.q_r, s.q_l)
        p_start = jnp.where(direction > 0, s.p_r, s.p_l)

        class T(NamedTuple):
            key: Array
            q: Array
            p: Array
            q_prop: Array
            log_w: Array
            sum_acc: Array
            i: Array
            turning: Array
            diverged: Array
            q_ck: Array
            p_ck: Array

        def leaf_cond(t: T):
            return (t.i < n_steps) & (~t.turning) & (~t.diverged)

        def leaf_body(t: T):
            key, k_sel = jax.random.split(t.key)
            q, p = leapfrog(t.q, t.p, direction)
            h = hamiltonian(q, p)
            dh = h - h0
            diverged = ~jnp.isfinite(dh) | (dh > _DIVERGENCE)
            lw = -dh
            sum_acc = t.sum_acc + jnp.minimum(1.0, jnp.exp(-dh))

            # streaming multinomial proposal within the subtree
            log_w = jnp.logaddexp(t.log_w, lw)
            take = jnp.log(jax.random.uniform(k_sel, ())) < (lw - log_w)
            q_prop = jnp.where(take & ~diverged, q, t.q_prop)

            # checkpoint bookkeeping (indices within this subtree)
            i = t.i
            is_even = (i % 2) == 0
            slot = _popcount(i)
            q_ck = jnp.where(
                is_even,
                t.q_ck.at[slot].set(q),
                t.q_ck,
            )
            p_ck = jnp.where(is_even, t.p_ck.at[slot].set(p), t.p_ck)

            # U-turn checks for odd leaves against stored boundaries
            def check_turn(turning):
                n_checks = _ctz(i + 1)

                def body(l, turn):
                    b = i + 1 - (1 << (l + 1))
                    sl = _popcount(b)
                    dq = (q - q_ck[sl]) * direction
                    return turn | _uturn(dq, p_ck[sl] * direction,
                                         p * direction, inv_mass)

                return jax.lax.fori_loop(0, n_checks, body, turning)

            turning = jnp.where(is_even, t.turning, check_turn(t.turning))
            return T(
                key=key, q=q, p=p, q_prop=q_prop, log_w=log_w,
                sum_acc=sum_acc, i=i + 1, turning=turning,
                diverged=t.diverged | diverged, q_ck=q_ck, p_ck=p_ck,
            )

        t0 = T(
            key=k_leaf, q=q_start, p=p_start, q_prop=q_start,
            log_w=jnp.full((), -jnp.inf),
            sum_acc=jnp.zeros(()), i=jnp.zeros((), jnp.int32),
            turning=jnp.zeros((), bool), diverged=jnp.zeros((), bool),
            q_ck=jnp.zeros_like(s.q_ck), p_ck=jnp.zeros_like(s.p_ck),
        )
        t = jax.lax.while_loop(leaf_cond, leaf_body, t0)

        bad = t.turning | t.diverged

        # merge subtree into trajectory (biased progressive sampling)
        log_w_tot = jnp.logaddexp(s.log_w, t.log_w)
        take_new = (
            jnp.log(jax.random.uniform(k_merge, ())) < (t.log_w - s.log_w)
        ) & ~bad
        q_prop = jnp.where(take_new, t.q_prop, s.q_prop)

        q_l = jnp.where(bad | (direction > 0), s.q_l, t.q)
        p_l = jnp.where(bad | (direction > 0), s.p_l, t.p)
        q_r = jnp.where(bad | (direction < 0), s.q_r, t.q)
        p_r = jnp.where(bad | (direction < 0), s.p_r, t.p)

        # global U-turn across the merged trajectory
        turn_glob = _uturn(q_r - q_l, p_l, p_r, inv_mass)

        return S(
            key=key,
            q_l=q_l, p_l=p_l, q_r=q_r, p_r=p_r,
            q_prop=q_prop,
            log_w=jnp.where(bad, s.log_w, log_w_tot),
            sum_acc=s.sum_acc + t.sum_acc,
            n_leaf=s.n_leaf + t.i,
            depth=s.depth + 1,
            turning=t.turning | turn_glob,
            diverged=s.diverged | t.diverged,
            q_ck=s.q_ck, p_ck=s.p_ck,
        )

    # first leaf: the initial point itself carries weight exp(0)
    s = jax.lax.while_loop(doubling_cond, doubling_body, s0)
    accept_stat = s.sum_acc / jnp.maximum(s.n_leaf - 1, 1).astype(jnp.float32)
    return s.q_prop, accept_stat, s.depth, s.diverged


@partial(jax.jit, static_argnames=("n_chains", "n_warmup", "n_samples"))
def run_nuts(
    fg: CompiledFG,
    key: Array,
    cfg: NUTSConfig = NUTSConfig(),
    n_chains: int = 8,
    n_warmup: int = 500,
    n_samples: int = 1000,
):
    """NUTS-within-Gibbs over the compiled graph; mirrors ``hmc.run_hmc``."""
    k_init, k_warm, k_samp = jax.random.split(key, 3)
    xc, xd = fg.init_state_batched(k_init, n_chains, cfg.jitter)

    state = _hmc.HMCState(
        xc=xc, xd=xd,
        log_eps=jnp.log(jnp.asarray(cfg.init_step_size)),
        log_eps_bar=jnp.log(jnp.asarray(cfg.init_step_size)),
        h_bar=jnp.zeros(()), t=jnp.zeros(()),
        welford_mean=jnp.zeros(fg.n_cont),
        welford_m2=jnp.zeros(fg.n_cont),
        welford_n=jnp.zeros(()),
        inv_mass=jnp.ones(fg.n_cont),
    )

    hcfg = _hmc.HMCConfig(
        init_step_size=cfg.init_step_size,
        target_accept=cfg.target_accept,
        gibbs_sweeps=cfg.gibbs_sweeps,
        adapt_mass=cfg.adapt_mass,
    )

    def sweep_all(key, xc, xd):
        if fg.n_disc == 0:
            return xd
        keys = jax.random.split(key, xc.shape[0])
        return jax.vmap(lambda k, a, b: _hmc.gibbs_sweep(fg, k, a, b))(
            keys, xc, xd
        )

    def transition(state: _hmc.HMCState, key, adapt: bool):
        k_g, k_n = jax.random.split(key)
        xd = sweep_all(k_g, state.xc, state.xd)
        eps = jnp.exp(state.log_eps)
        keys = jax.random.split(k_n, state.xc.shape[0])

        def one(k, q, d):
            logp = lambda x: fg.log_prob(x, d)
            return _nuts_step(logp, k, q, eps, state.inv_mass, cfg.max_depth)

        xc, acc, depth, div = jax.vmap(one)(keys, state.xc, xd)
        state = state._replace(xc=xc, xd=xd)
        if adapt:
            state = _hmc._da_update(state, jnp.mean(acc), hcfg)
            state = _hmc._welford_update(state, xc)
        return state, (acc, depth, div)

    def warm_step(state, key):
        state, (acc, depth, div) = transition(state, key, True)
        return state, jnp.mean(acc)

    if n_warmup > 0:
        half = max(n_warmup // 2, 1)
        state, _ = jax.lax.scan(warm_step, state,
                                jax.random.split(k_warm, half))
        if cfg.adapt_mass and fg.n_cont:
            var = state.welford_m2 / jnp.maximum(state.welford_n - 1.0, 1.0)
            state = state._replace(
                inv_mass=jnp.where(state.welford_n > 10.0,
                                   jnp.maximum(var, 1e-6), 1.0),
                h_bar=jnp.zeros(()), t=jnp.zeros(()),
                welford_mean=jnp.zeros(fg.n_cont),
                welford_m2=jnp.zeros(fg.n_cont),
                welford_n=jnp.zeros(()),
            )
        state, _ = jax.lax.scan(
            warm_step, state,
            jax.random.split(jax.random.fold_in(k_warm, 1), n_warmup - half),
        )
        if cfg.adapt_mass and fg.n_cont:
            var = state.welford_m2 / jnp.maximum(state.welford_n - 1.0, 1.0)
            state = state._replace(
                inv_mass=jnp.where(state.welford_n > 10.0,
                                   jnp.maximum(var, 1e-6), 1.0)
            )
        state = state._replace(log_eps=state.log_eps_bar)

    def sample_step(state, key):
        state, (acc, depth, div) = transition(state, key, False)
        return state, (state.xc, state.xd, jnp.mean(acc),
                       jnp.mean(depth.astype(jnp.float32)),
                       jnp.mean(div.astype(jnp.float32)))

    state, (s_xc, s_xd, accs, depths, divs) = jax.lax.scan(
        sample_step, state, jax.random.split(k_samp, n_samples)
    )
    diag = {
        "accept_rate": jnp.mean(accs),
        "mean_depth": jnp.mean(depths),
        "divergence_rate": jnp.mean(divs),
        "step_size": jnp.exp(state.log_eps),
        "inv_mass": state.inv_mass,
    }
    return s_xc, s_xd, diag


def sample(fg: CompiledFG, key, **kw) -> "_hmc.HMCResult":
    cfg = kw.pop("cfg", NUTSConfig())
    s_xc, s_xd, diag = run_nuts(fg, key, cfg, **kw)
    return _hmc.HMCResult(fg, s_xc, s_xd, diag)
