from lhvi_tpu.fg.graph import Domain, RV, F, Graph
from lhvi_tpu.fg.compile import compile_graph, CompiledFG, FactorBucket

__all__ = ["Domain", "RV", "F", "Graph", "compile_graph", "CompiledFG", "FactorBucket"]
