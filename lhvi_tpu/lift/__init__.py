from lhvi_tpu.lift.color import color_refine, compile_lifted, lifting_report

__all__ = ["color_refine", "compile_lifted", "lifting_report"]
