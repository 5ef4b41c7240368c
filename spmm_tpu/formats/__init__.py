from spmm_tpu.formats.containers import COO, CSR, BlockedCSR, to_coo, to_csr
from spmm_tpu.formats.bsr import BSR, csr_to_bsr
from spmm_tpu.formats.ell import ELL, ell_pack, ell_pack_device
from spmm_tpu.formats.mtx import read_mtx, write_mtx
from spmm_tpu.formats.synthetic import rmat_matrix, webgraph_like, banded_random

__all__ = [
    "COO",
    "CSR",
    "BSR",
    "ELL",
    "BlockedCSR",
    "to_coo",
    "to_csr",
    "csr_to_bsr",
    "ell_pack",
    "ell_pack_device",
    "read_mtx",
    "write_mtx",
    "rmat_matrix",
    "webgraph_like",
    "banded_random",
]
