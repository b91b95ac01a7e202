from lhvi_tpu.relational.graph import RelationalGraph, Predicate, Atom, ParamF

__all__ = ["RelationalGraph", "Predicate", "Atom", "ParamF"]
from lhvi_tpu.relational.data import load_evidence, parse_evidence_line

__all__ += ["load_evidence", "parse_evidence_line"]
from lhvi_tpu.relational.fast import fast_compile

__all__ += ["fast_compile"]
