"""Randomized relational-grounding fuzz.

Random sorts, predicates, templates, substitution constraints, and
evidence; the test independently enumerates the expected ground factors
and RV keys and checks ``RelationalGraph.ground()`` produces exactly
them (counts, keys, neighborhoods, evidence slots), then compiles the
ground graph and evaluates a finite log-prob — covering the host-side
combinatorial layer the array-IR fuzz cannot reach.
"""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lhvi_tpu import Domain, compile_graph
from lhvi_tpu.potentials import MLNPotential, TablePotential
from lhvi_tpu.relational.graph import RelationalGraph


@pytest.mark.parametrize("seed", range(8))
def test_grounding_matches_independent_enumeration(seed):
    rng = np.random.default_rng(7000 + seed)
    rg = RelationalGraph()
    n_sorts = int(rng.integers(1, 3))
    sort_consts = {}
    sorts = []
    for s in range(n_sorts):
        consts = [f"s{s}c{i}" for i in range(int(rng.integers(2, 5)))]
        sort_consts[f"S{s}"] = consts
        sorts.append(f"S{s}")

    bool_dom = Domain([0, 1])
    cont_dom = Domain([-5, 5], continuous=True)
    preds = []
    for p in range(int(rng.integers(2, 4))):
        arity = int(rng.integers(1, 3))
        dom = bool_dom if rng.integers(0, 2) else cont_dom
        preds.append(rg.predicate(f"P{p}", dom, arity=arity))

    lv_of = {}  # per (pred, slot): which sort the templates use
    templates = []
    for t in range(int(rng.integers(1, 4))):
        n_atoms = int(rng.integers(1, 3))
        atoms, var_names = [], []
        for a in range(n_atoms):
            pred = preds[int(rng.integers(0, len(preds)))]
            args = []
            for sl in range(pred.arity):
                sort = lv_of.setdefault(
                    (pred.name, sl),
                    sorts[int(rng.integers(0, len(sorts)))],
                )
                # reuse a var name per (template, sort) sometimes to get
                # shared logical vars across atoms
                vn = f"t{t}_{sort}" if rng.integers(0, 2) else \
                    f"t{t}_{sort}_{a}{sl}"
                if vn not in rg.lvs:
                    rg.lv(vn, sort_consts[sort])
                args.append(vn)
                var_names.append((vn, sort))
            atoms.append(pred(*args))
        # constraint: forbid all-equal constants on some templates
        use_con = bool(rng.integers(0, 2)) and len(set(
            v for v, _ in var_names)) > 1
        con = (
            (lambda sub: len(set(sub.values())) > 1) if use_con else None
        )
        if all(not a.pred.domain.continuous for a in atoms):
            shape = tuple(2 for _ in atoms)
            pot = TablePotential(rng.uniform(0.2, 1.0, size=shape))
        else:
            pot = MLNPotential(
                lambda xs: -sum((x - 0.5) ** 2 for x in xs) / 8.0,
                w=0.7, formula_name=f"f{t}",
            )
        templates.append((atoms, con, dict(var_names)))
        rg.param_factor(pot, atoms, constraint=con)

    # random evidence on a few ground atoms of pred 0
    p0 = preds[0]
    ev_sorts = [lv_of.get((p0.name, sl)) for sl in range(p0.arity)]
    if all(s is not None for s in ev_sorts):
        combos = list(itertools.product(
            *[sort_consts[s] for s in ev_sorts]))
        rng.shuffle(combos)
        for consts in combos[: len(combos) // 3]:
            v = (int(rng.integers(0, 2))
                 if not p0.domain.continuous else float(rng.normal()))
            rg.observe(p0, consts, v)

    g, index = rg.ground()

    # --- independent enumeration -------------------------------------
    want_factors = []
    want_rvs = set()
    for atoms, con, var_sort in templates:
        lv_names = []
        for atom in atoms:
            for a in atom.args:
                if a not in lv_names:
                    lv_names.append(a)
        doms = [sort_consts[var_sort[v]] for v in lv_names]
        for combo in itertools.product(*doms) if lv_names else [()]:
            sub = dict(zip(lv_names, combo))
            if con is not None and not con(sub):
                continue
            nbkeys = tuple(
                (atom.pred.name, tuple(sub[a] for a in atom.args))
                for atom in atoms
            )
            want_factors.append(nbkeys)
            want_rvs.update(nbkeys)

    assert len(g.factors) == len(want_factors)
    assert set(index.keys()) == want_rvs
    got_factors = sorted(
        tuple(
            next(k for k, rv2 in index.items() if rv2 is rv)
            for rv in f.nb
        )
        for f in g.factors
    )
    assert got_factors == sorted(want_factors)

    for key, v in rg.evidence.items():
        if key in index:
            assert index[key].value == v

    fg = compile_graph(g)
    xc = jnp.zeros((fg.n_cont,), jnp.float32)
    xd = jnp.zeros((fg.n_disc,), jnp.int32)
    assert np.isfinite(float(fg.log_prob(xc, xd)))
