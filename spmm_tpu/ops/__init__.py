from spmm_tpu.ops.spmm import spmm, spmv, spmm_xla, spmv_xla
from spmm_tpu.ops.spgemm import spgemm, spgemm_coo_padded, spgemm_expand_bound
from spmm_tpu.ops.roofline import spmm_roofline, spmv_roofline, spgemm_roofline, ChipSpec

__all__ = [
    "spmm",
    "spmv",
    "spmm_xla",
    "spmv_xla",
    "spgemm",
    "spgemm_coo_padded",
    "spgemm_expand_bound",
    "spmm_roofline",
    "spmv_roofline",
    "spgemm_roofline",
    "ChipSpec",
]
