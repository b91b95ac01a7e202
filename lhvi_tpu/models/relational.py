"""Relational model zoo: friends-smokers (hybrid MLN) and kin
(BASELINE configs 3 and 5; reference experiment-script parity)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from lhvi_tpu.fg.graph import Domain
from lhvi_tpu.potentials import GaussianPotential, MLNPotential, limp
from lhvi_tpu.relational.graph import RelationalGraph


def friends_smokers(
    n_people: int = 10,
    hybrid: bool = True,
    evidence: Dict = None,
    w_smokes_cancer: float = 1.2,
    w_friends: float = 1.1,
):
    """Hybrid friends-smokers MLN.

    Predicates: smokes(P), cancer(P) boolean; friends(P,Q) boolean for
    P≠Q; and, in the hybrid variant, stress(P) continuous with a Gaussian
    prior and a soft link stress→smokes.

    Rules:
      w1: smokes(X) ⇒ cancer(X)
      w2: friends(X,Y) ⇒ (smokes(X) ⇔ smokes(Y))
      w3 (hybrid): high stress(X) ⇒ smokes(X)

    With no evidence every person is exchangeable, so color refinement
    compresses the model to O(1) orbits regardless of n_people.
    """
    rg = RelationalGraph()
    people = [f"p{i}" for i in range(n_people)]
    rg.lv("X", people)
    rg.lv("Y", people)

    boolean = Domain([0, 1])
    smokes = rg.predicate("smokes", boolean, lvs=["X"])
    cancer = rg.predicate("cancer", boolean, lvs=["X"])
    friends = rg.predicate("friends", boolean, arity=2)

    rg.param_factor(
        MLNPotential(lambda a: limp(a[0], a[1]), w=w_smokes_cancer,
                     formula_name="smokes_implies_cancer"),
        [smokes("X"), cancer("X")],
    )
    rg.param_factor(
        MLNPotential(
            lambda a: limp(a[0], a[1] * a[2] + (1.0 - a[1]) * (1.0 - a[2])),
            w=w_friends,
            formula_name="friends_same_smoking",
        ),
        [friends("X", "Y"), smokes("X"), smokes("Y")],
        constraint=lambda s: s["X"] != s["Y"],
    )
    if hybrid:
        stress = rg.predicate("stress", Domain([-5, 5], continuous=True),
                              lvs=["X"])
        rg.param_factor(
            GaussianPotential([0.0], [[1.0]]), [stress("X")]
        )
        rg.param_factor(
            MLNPotential(
                lambda a: a[1] / (1.0 + jnp.exp(-2.0 * a[0])),
                w=1.0,
                formula_name="stress_drives_smoking",
            ),
            [stress("X"), smokes("X")],
        )
    if evidence:
        rg.observe_many(evidence)
    return rg
