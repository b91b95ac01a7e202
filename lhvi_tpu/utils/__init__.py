from lhvi_tpu.utils.oracle import ExactPosterior

__all__ = ["ExactPosterior"]
