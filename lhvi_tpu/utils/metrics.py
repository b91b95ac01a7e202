"""Structured metrics logging (SURVEY.md §6: JSONL + optional profiler).

The reference logs with ``print``; here every engine/experiment can emit
typed records (ELBO, acceptance rate, ESS, R̂, throughput) to a JSONL file
and/or stdout, and wrap hot sections in ``jax.profiler`` traces for
Perfetto.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Dict, Optional


class MetricsLogger:
    def __init__(self, path: Optional[str] = None, echo: bool = False):
        self.path = path
        self.echo = echo
        self._fh = None
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        self.t0 = time.time()

    def log(self, event: str, **fields: Any) -> Dict[str, Any]:
        rec = {"t": round(time.time() - self.t0, 4), "event": event}
        for k, v in fields.items():
            if hasattr(v, "item") and getattr(v, "size", 2) == 1:
                v = v.item()
            elif hasattr(v, "tolist"):
                v = v.tolist()
            rec[k] = v
        line = json.dumps(rec)
        if self._fh:
            self._fh.write(line + "\n")
        if self.echo:
            print(line)
        return rec

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace around a block; no-op when log_dir is None."""
    import jax

    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
