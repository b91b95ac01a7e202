from lhvi_tpu.utils.oracle import ExactPosterior
from lhvi_tpu.utils.diagnostics import split_rhat, ess, summarize
from lhvi_tpu.utils.metrics import MetricsLogger, profile_trace
from lhvi_tpu.utils.debug import enable_nan_checks, nan_checks

__all__ = [
    "ExactPosterior",
    "split_rhat",
    "ess",
    "summarize",
    "MetricsLogger",
    "profile_trace",
    "enable_nan_checks",
    "nan_checks",
]
