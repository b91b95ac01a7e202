"""Diagnostics, checkpointing, and metrics-logging tests."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from lhvi_tpu.utils.diagnostics import split_rhat, ess, summarize
from lhvi_tpu.utils.metrics import MetricsLogger


def test_rhat_iid_near_one():
    x = jax.random.normal(jax.random.PRNGKey(0), (500, 8, 3))
    r = np.asarray(split_rhat(x))
    assert np.all(r < 1.02), r


def test_rhat_detects_nonconvergence():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (500, 8, 1))
    # shift half the chains: between-chain variance blows up R-hat
    x = x.at[:, :4].add(5.0)
    r = np.asarray(split_rhat(x))
    assert r[0] > 1.5, r


def test_ess_iid_vs_correlated():
    key = jax.random.PRNGKey(2)
    iid = jax.random.normal(key, (1000, 4, 1))
    e_iid = float(ess(iid)[0])
    assert e_iid > 2000, e_iid  # 4000 nominal, estimator noise allowed

    # AR(1) with rho=0.95 -> tau ~ (1+rho)/(1-rho) = 39
    rho = 0.95
    eps = np.asarray(jax.random.normal(key, (1000, 4, 1)))
    ar = np.zeros_like(eps)
    for t in range(1, 1000):
        ar[t] = rho * ar[t - 1] + np.sqrt(1 - rho**2) * eps[t]
    e_ar = float(ess(jnp.asarray(ar), max_lag=400)[0])
    assert e_ar < 500, e_ar


def test_checkpoint_roundtrip(tmp_path):
    from lhvi_tpu.utils.checkpoint import CheckpointManager

    state = {
        "xc": jnp.arange(12.0).reshape(3, 4),
        "step_size": jnp.asarray(0.25),
        "nested": {"k": jnp.ones(5, jnp.int32)},
    }
    mgr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    mgr.save(0, state, wait=True)
    mgr.save(5, jax.tree_util.tree_map(lambda x: x + 1, state), wait=True)
    assert mgr.latest_step() == 5
    out = mgr.restore(template=state)
    assert np.allclose(np.asarray(out["xc"]), np.asarray(state["xc"]) + 1)
    out0 = mgr.restore(step=0, template=state)
    assert np.allclose(np.asarray(out0["xc"]), np.asarray(state["xc"]))
    mgr.close()


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    with MetricsLogger(p) as log:
        log.log("elbo", step=1, value=jnp.asarray(-12.5))
        log.log("ess", values=np.array([1.0, 2.0]))
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["event"] == "elbo" and abs(lines[0]["value"] + 12.5) < 1e-6
    assert lines[1]["values"] == [1.0, 2.0]
