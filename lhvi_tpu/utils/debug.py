"""Debugging aids (SURVEY.md §6 "race detection / sanitizers" row).

The reference is single-threaded with no sanitizers; here runs are
replayable by construction (all randomness flows through explicit
``jax.random`` keys) and numerical faults can be trapped at the op level.
"""

from __future__ import annotations

import contextlib

import jax


def enable_nan_checks(enable: bool = True) -> None:
    """Trap NaN production inside jitted code (re-runs the offending op
    un-jitted and raises with its location). Heavy — debugging only."""
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def nan_checks():
    """Context-managed version of :func:`enable_nan_checks`."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
