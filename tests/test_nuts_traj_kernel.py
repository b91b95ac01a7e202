"""Pallas NUTS trajectory kernel: interpret-mode correctness.

Runs the fused kernel through the Pallas TPU interpreter on the CPU test
mesh and checks that repeated transitions sample the exact Gaussian
N(J⁻¹h, J⁻¹) — the same invariance contract as the XLA lockstep NUTS
(``engines.nuts``), which `test_nuts_map.py` covers.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from lhvi_tpu.ops import nuts_traj as nt


def test_traj_kernel_samples_exact_gaussian():
    n, C, T = 4, 256, 50
    rng = np.random.default_rng(1)
    A = rng.normal(size=(n, n))
    J = (A @ A.T + n * np.eye(n)).astype(np.float32)
    h = rng.normal(size=n).astype(np.float32)
    Sigma = np.linalg.inv(J)
    mu = Sigma @ h
    im = np.ones(n, np.float32)

    q = jnp.asarray(rng.normal(size=(C, n)).astype(np.float32))
    key = jax.random.PRNGKey(0)
    qs = []
    with pltpu.force_tpu_interpret_mode():
        for t in range(T):
            key, k = jax.random.split(key)
            k_mom, k_seed = jax.random.split(k)
            p0 = jax.random.normal(k_mom, (C, n))
            seed = jax.random.randint(k_seed, (), 0, 2**31 - 1,
                                      dtype=jnp.int32)
            q, acc, depth, div = nt._pallas_nuts_traj(
                q, p0, jnp.asarray(J), jnp.asarray(h), jnp.asarray(im),
                jnp.float32(0.25), seed, 6,
            )
            if t >= 20:
                qs.append(np.asarray(q))
    X = np.concatenate(qs, 0)
    assert np.abs(X.mean(0) - mu).max() < 0.05, (X.mean(0), mu)
    sd = np.sqrt(np.diag(Sigma))
    assert np.abs(X.std(0) - sd).max() / sd.min() < 0.12, (X.std(0), sd)
    assert not np.asarray(div).any()
    a = np.asarray(acc)
    assert ((a >= 0) & (a <= 1)).all() and a.mean() > 0.5
    d = np.asarray(depth)
    assert (d >= 1).all() and (d <= 6).all()


def test_traj_kernel_padding_and_blocks():
    # C not a block multiple + n far from 128: padding must be harmless
    n, C = 3, 21
    rng = np.random.default_rng(2)
    J = np.eye(n, dtype=np.float32) * 2.0
    h = np.zeros(n, np.float32)
    im = np.ones(n, np.float32)
    q0 = jnp.asarray(rng.normal(size=(C, n)).astype(np.float32))
    p0 = jnp.asarray(rng.normal(size=(C, n)).astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        qp, acc, depth, div = nt._pallas_nuts_traj(
            q0, p0, jnp.asarray(J), jnp.asarray(h), jnp.asarray(im),
            jnp.float32(0.3), jnp.int32(7), 4,
        )
    assert qp.shape == (C, n)
    assert np.isfinite(np.asarray(qp)).all()
    assert acc.shape == (C,) and depth.shape == (C,) and div.shape == (C,)
