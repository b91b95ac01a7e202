from lhvi_tpu.relational.graph import RelationalGraph, Predicate, Atom, ParamF

__all__ = ["RelationalGraph", "Predicate", "Atom", "ParamF"]
