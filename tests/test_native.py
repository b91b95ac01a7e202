"""Native color-refinement core: partition-identical to the Python path."""

import numpy as np
import pytest

from lhvi_tpu.lift.color import color_refine
from lhvi_tpu.native import load_fastlift
from lhvi_tpu.models.relational import friends_smokers
from tests.test_lift import star_graph

needs_native = pytest.mark.skipif(
    load_fastlift() is None, reason="no C++ toolchain / native lib"
)


def partition(colors, keys):
    groups = {}
    for k in keys:
        groups.setdefault(colors[k], []).append(k)
    return sorted(tuple(sorted(v)) for v in groups.values())


@needs_native
def test_native_matches_python_star():
    g, center, leaves = star_graph(6)
    leaves[0].value = 2.0  # break one leaf's symmetry
    rv_keys = [id(rv) for rv in g.rvs]
    f_keys = [id(f) for f in g.factors]
    rvc_p, fc_p = color_refine(g, backend="python")
    rvc_n, fc_n = color_refine(g, backend="native")
    assert partition(rvc_p, rv_keys) == partition(rvc_n, rv_keys)
    assert partition(fc_p, f_keys) == partition(fc_n, f_keys)
    leaves[0].value = None


@needs_native
def test_native_matches_python_relational():
    rg = friends_smokers(n_people=7, hybrid=True)
    rg.observe("smokes", ("p0",), 1)
    rg.observe("cancer", ("p3",), 0)
    g, _ = rg.ground()
    rv_keys = [id(rv) for rv in g.rvs]
    f_keys = [id(f) for f in g.factors]
    rvc_p, fc_p = color_refine(g, backend="python")
    rvc_n, fc_n = color_refine(g, backend="native")
    assert partition(rvc_p, rv_keys) == partition(rvc_n, rv_keys)
    assert partition(fc_p, f_keys) == partition(fc_n, f_keys)


@needs_native
def test_native_large_graph_fast():
    import time

    rg = friends_smokers(n_people=100, hybrid=True)
    g, _ = rg.ground()
    t0 = time.time()
    rvc, fc = color_refine(g, backend="native")
    dt = time.time() - t0
    assert len(set(rvc.values())) == 4
    assert dt < 2.0, f"native refinement too slow: {dt:.2f}s"
