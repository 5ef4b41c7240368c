from spmm_tpu.utils.timing import measure, Timing

__all__ = ["measure", "Timing"]
