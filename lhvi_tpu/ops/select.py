"""Minor-axis value selection without TPU's pathological gather lowering.

``take_along_axis`` over a small trailing value axis — the idiom behind
every discrete slot-value lookup in this framework — lowers on TPU to a
gather path measured at ~1 ms PER 65k-row factor column (e.g. 90 ms for
one [65536, 88, 1, 3] lookup on this chip), independent of how tiny the
value axis is. :func:`select_last` replaces it with an unrolled
compare-select over the value axis: V fused VPU ops, no materialized
broadcast of the value table, exact same result.
"""

from __future__ import annotations

import jax.numpy as jnp


def select_last(vals, idx, max_unroll: int = 32):
    """``take_along_axis(vals, idx[..., None], -1)[..., 0]`` after NumPy
    broadcasting of ``vals[..., v]`` against ``idx`` — via an unrolled
    compare-select when the value axis is small (``V <= max_unroll``).

    ``vals``: [..., V] value tables (leading dims broadcastable against
    ``idx`` — pass them UNbroadcast, e.g. ``table[None]`` for a batch).
    ``idx``: integer indices in ``[0, V)``; out-of-range yields 0 (the
    callers' padding rows carry zero weight).
    """
    V = vals.shape[-1]
    if V > max_unroll:
        shape = jnp.broadcast_shapes(vals.shape[:-1], idx.shape)
        vals = jnp.broadcast_to(vals, shape + (V,))
        idx = jnp.broadcast_to(idx, shape)
        return jnp.take_along_axis(vals, idx[..., None], axis=-1)[..., 0]
    out = jnp.where(idx == 0, vals[..., 0], 0.0)
    for v in range(1, V):
        out = out + jnp.where(idx == v, vals[..., v], 0.0)
    return out
