"""Randomized compiler fuzz: IR log_prob vs factor-by-factor oracle.

Generates random hybrid factor graphs (mixed potential types, arities
1-3, random evidence, non-0-based discrete value sets) and checks that
``compile_graph``'s bucketed/padded IR reproduces the direct
factor-by-factor joint at random states — the broad-coverage complement
to the hand-built identities in ``test_compile.py``. Also cross-checks
``log_prob_batched`` (the lockstep sampler hot path) against per-row
``log_prob`` on every fuzzed graph.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lhvi_tpu import Domain, RV, F, Graph, compile_graph
from lhvi_tpu.potentials import (
    GaussianPotential,
    LinearGaussianPotential,
    QuadraticPotential,
    TablePotential,
    XYPotential,
    MLNPotential,
)


def _rand_graph(rng):
    n_disc = int(rng.integers(0, 4))
    n_cont = int(rng.integers(0 if n_disc else 1, 4))
    rvs = []
    for i in range(n_disc):
        size = int(rng.integers(2, 5))
        # non-0-based value sets exercise value_index / disc_vals baking
        base = int(rng.integers(-2, 3))
        if rng.integers(0, 2):
            vals = list(range(base, base + size))
        else:
            # non-integer, non-uniformly-spaced values exercise the
            # value-space Gibbs tables (disc_cval / sub_vals / vals_)
            vals = [round(base + s, 3)
                    for s in np.cumsum(rng.uniform(0.3, 1.5, size))]
        rvs.append(RV(Domain(vals), name=f"d{i}"))
    for i in range(n_cont):
        rvs.append(RV(Domain([-8, 8], continuous=True), name=f"x{i}"))
    disc = rvs[:n_disc]
    cont = rvs[n_disc:]

    factors = []
    # keep the model proper: a weak Gaussian prior on every continuous RV
    for x in cont:
        factors.append(F(GaussianPotential([0.0], [[4.0]]), [x]))
    for d in disc:
        t = rng.uniform(0.2, 1.0, size=len(d.domain.values))
        factors.append(F(TablePotential(list(t / t.sum())), [d]))

    n_extra = int(rng.integers(1, 6))
    for _ in range(n_extra):
        kind = rng.integers(0, 5)
        if kind == 0 and len(cont) >= 2:  # pairwise continuous
            a, b = rng.choice(len(cont), 2, replace=False)
            pot = (LinearGaussianPotential(float(rng.normal()), 1.0)
                   if rng.integers(0, 2)
                   else XYPotential(float(rng.normal()), 1.5))
            factors.append(F(pot, [cont[a], cont[b]]))
        elif kind == 1 and cont:  # quadratic, arity 1-2
            ar = int(rng.integers(1, min(2, len(cont)) + 1))
            idx = rng.choice(len(cont), ar, replace=False)
            A = rng.normal(size=(ar, ar))
            A = -(A @ A.T + np.eye(ar))  # concave
            factors.append(
                F(QuadraticPotential(A, rng.normal(size=ar),
                                     float(rng.normal())),
                  [cont[j] for j in idx])
            )
        elif kind == 2 and disc and cont:  # mixed MLN formula
            d = disc[int(rng.integers(0, len(disc)))]
            x = cont[int(rng.integers(0, len(cont)))]
            c0, c1 = float(rng.normal()), float(rng.normal())
            factors.append(
                F(MLNPotential(
                    lambda a, c0=c0, c1=c1: -((a[1] - (c0 * a[0] + c1)) ** 2),
                    w=float(rng.uniform(0.2, 1.0)),
                    formula_name=f"mix{len(factors)}"),
                  [d, x])
            )
        elif kind == 3 and len(disc) >= 2:  # pairwise discrete table
            a, b = rng.choice(len(disc), 2, replace=False)
            sa = len(disc[a].domain.values)
            sb = len(disc[b].domain.values)
            t = rng.uniform(0.2, 1.0, size=(sa, sb))
            factors.append(F(TablePotential(t), [disc[a], disc[b]]))
        elif kind == 4 and disc and len(cont) >= 2:  # arity-3 hybrid
            d = disc[int(rng.integers(0, len(disc)))]
            a, b = rng.choice(len(cont), 2, replace=False)
            w0 = float(rng.normal())
            factors.append(
                F(MLNPotential(
                    lambda a3, w0=w0: -((a3[1] - a3[2] - w0 * a3[0]) ** 2),
                    w=float(rng.uniform(0.2, 0.8)),
                    formula_name=f"tri{len(factors)}"),
                  [d, cont[a], cont[b]])
            )

    # random evidence on ~25% of RVs (keep at least one latent)
    latents = list(rvs)
    rng.shuffle(latents)
    for rv in latents[: max(0, int(0.25 * len(latents)))]:
        if len(latents) - sum(r.value is not None for r in rvs) <= 1:
            break
        if rv.domain.continuous:
            rv.value = float(rng.normal())
        else:
            rv.value = rv.domain.values[
                int(rng.integers(0, len(rv.domain.values)))
            ]
    return Graph(rvs, factors)


def _manual_log_prob(g, assign):
    total = 0.0
    for f in g.factors:
        pattern = tuple(rv.domain.continuous for rv in f.nb)
        args = []
        for rv in f.nb:
            v = assign.get(id(rv), rv.value)
            if rv.domain.continuous:
                args.append(float(v))
            else:
                args.append((rv.domain.value_index(v), float(v)))
        total += f.potential.log_value(args, pattern)
    return total


@pytest.mark.parametrize("seed", range(12))
def test_fuzzed_graph_log_prob_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    g = _rand_graph(rng)
    fg = compile_graph(g)
    lat_c = [rv for rv in g.rvs if rv.domain.continuous and rv.value is None]
    lat_d = [rv for rv in g.rvs
             if not rv.domain.continuous and rv.value is None]
    assert fg.n_cont == len(lat_c) and fg.n_disc == len(lat_d)

    states = []
    for _ in range(3):
        assign = {}
        xc = np.zeros(fg.n_cont, np.float32)
        xd = np.zeros(fg.n_disc, np.int32)
        for rv in lat_c:
            _, i = fg.meta.loc(rv)
            xc[i] = assign[id(rv)] = float(rng.normal())
        for rv in lat_d:
            _, i = fg.meta.loc(rv)
            vi = int(rng.integers(0, len(rv.domain.values)))
            xd[i] = vi
            assign[id(rv)] = rv.domain.values[vi]
        states.append((xc, xd, assign))

    for xc, xd, assign in states:
        got = float(fg.log_prob(jnp.asarray(xc), jnp.asarray(xd)))
        want = _manual_log_prob(g, assign)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # batched path == per-row path (the sampler hot-path identity)
    XC = jnp.asarray(np.stack([s[0] for s in states]))
    XD = jnp.asarray(np.stack([s[1] for s in states]))
    got_b = np.asarray(fg.log_prob_batched(XC, XD))
    want_b = np.asarray(jax.vmap(fg.log_prob)(XC, XD))
    np.testing.assert_allclose(got_b, want_b, rtol=1e-4, atol=1e-4)

    # gradient of the continuous part is finite at all fuzzed states
    if fg.n_cont:
        gv = jax.grad(lambda x: fg.log_prob(x, jnp.asarray(states[0][1])))(
            jnp.asarray(states[0][0])
        )
        assert np.isfinite(np.asarray(gv)).all()

    # Gibbs full conditionals: disc_logits rows match joint differences
    if fg.n_disc:
        xc, xd, assign = states[0]
        lg = np.asarray(fg.disc_logits(jnp.asarray(xc), jnp.asarray(xd)))
        for rv in lat_d[:2]:
            _, i = fg.meta.loc(rv)
            size = len(rv.domain.values)
            joint = np.array([
                _manual_log_prob(
                    g, {**assign, id(rv): rv.domain.values[vi]}
                )
                for vi in range(size)
            ])
            np.testing.assert_allclose(
                lg[i, :size] - lg[i, 0], joint - joint[0],
                rtol=1e-3, atol=1e-3,
            )

    # per-color sweep tables reproduce disc_logits at every fuzzed state
    # (the value-space plan: disc_cval / sub_vals / maintained value state)
    if fg.n_disc and fg.color_plan is not None:
        from lhvi_tpu.engines import hmc as _hmc

        sizes = np.asarray(fg.disc_sizes)
        for xc, xd, _ in states:
            want = np.asarray(fg.disc_logits(jnp.asarray(xc),
                                             jnp.asarray(xd)))
            got = np.asarray(_hmc.planned_logits(fg, jnp.asarray(xc),
                                                 jnp.asarray(xd)))
            valid = np.arange(want.shape[1])[None, :] < sizes[:, None]
            np.testing.assert_allclose(got[valid], want[valid],
                                       rtol=1e-4, atol=1e-3)
