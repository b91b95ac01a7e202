"""Sampler diagnostics: split-R̂ and effective sample size.

SURVEY.md §6 metrics plan (the reference has none — print + matplotlib
only): structured convergence statistics computed on-device from the
``[S, C, n]`` sample arrays the engines emit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def split_rhat(samples: Array) -> Array:
    """Split-R̂ (Gelman et al.) per dimension.

    samples: [S, C, n] (draws, chains, dims) → [n]. Values near 1 indicate
    convergence; > 1.01 is suspicious.
    """
    S, C, n = samples.shape
    half = S // 2
    x = jnp.concatenate(
        [samples[:half], samples[half : 2 * half]], axis=1
    )  # [half, 2C, n]
    m = x.shape[1]
    chain_mean = jnp.mean(x, axis=0)  # [2C, n]
    chain_var = jnp.var(x, axis=0, ddof=1)  # [2C, n]
    grand = jnp.mean(chain_mean, axis=0)
    B = half * jnp.var(chain_mean, axis=0, ddof=1)
    W = jnp.mean(chain_var, axis=0)
    var_hat = (half - 1) / half * W + B / half
    return jnp.sqrt(var_hat / jnp.maximum(W, 1e-12))


def ess(samples: Array, max_lag: int = 200) -> Array:
    """Effective sample size per dimension via Geyer initial-positive-pair
    autocorrelation truncation (batched FFT-free form).

    samples: [S, C, n] → [n].
    """
    S, C, n = samples.shape
    max_lag = min(max_lag, S - 1)
    x = samples - jnp.mean(samples, axis=0, keepdims=True)
    var = jnp.mean(jnp.var(samples, axis=0, ddof=1), axis=0)  # [n]

    t_idx = jnp.arange(S)[:, None, None]

    def rho(lag):
        shifted = jnp.roll(x, -lag, axis=0)
        mask = (t_idx < S - lag).astype(x.dtype)
        prod = x * shifted * mask
        return jnp.sum(prod, axis=(0, 1)) / (
            (S - lag) * C * jnp.maximum(var, 1e-12)
        )

    lags = jnp.arange(1, max_lag + 1)
    rhos = jax.vmap(rho)(lags)  # [max_lag, n]
    # Geyer: sum consecutive pairs while positive
    pairs = rhos[0::2][: max_lag // 2] + rhos[1::2][: max_lag // 2]
    pos = jnp.cumprod(pairs > 0, axis=0).astype(jnp.float32)
    tau = 1.0 + 2.0 * (
        rhos[0] * 0.0 + jnp.sum(pairs * pos, axis=0)
    )  # ≥ 1 after clip
    tau = jnp.maximum(tau, 1.0)
    return S * C / tau


def summarize(samples: Array) -> dict:
    """{'rhat': [n], 'ess': [n], 'mean': [n], 'sd': [n]} for [S,C,n]."""
    return {
        "rhat": split_rhat(samples),
        "ess": ess(samples),
        "mean": jnp.mean(samples, axis=(0, 1)),
        "sd": jnp.std(samples, axis=(0, 1)),
    }
