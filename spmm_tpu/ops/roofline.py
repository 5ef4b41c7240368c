"""Speed-of-light models for every kernel (HBM bytes / MXU MACs).

Per the build mandate (SURVEY.md §6, BASELINE.json: "every kernel profiled
against speed-of-light HBM/MXU bounds"), each op gets an analytic lower bound
on runtime from (a) unavoidable HBM traffic at peak bandwidth and (b) FLOPs at
peak compute.  Sparse kernels at web-graph densities are bandwidth-bound, so
the HBM term dominates; the achieved/SoL ratio is the headline efficiency.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    name: str
    hbm_gbps: float  # HBM bandwidth, GB/s
    flops_f32: float  # peak fp32 FLOP/s (MXU)
    flops_bf16: float  # peak bf16 FLOP/s (MXU)
    vmem_bytes: int


# TPU v5e (v5 lite): 16 GB HBM @ ~819 GB/s, ~197 TFLOP/s bf16 (~98 fp32),
# ~16 MB VMEM per core
TPU_V5E = ChipSpec("tpu-v5e", hbm_gbps=819.0, flops_f32=98.3e12, flops_bf16=196.6e12,
                   vmem_bytes=16 * 1024 * 1024)
# generic host CPU fallback for CI (numbers only used for ratios)
CPU_GENERIC = ChipSpec("cpu", hbm_gbps=20.0, flops_f32=1e11, flops_bf16=1e11,
                       vmem_bytes=32 * 1024 * 1024)


def detect_chip() -> ChipSpec:
    import jax

    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "") or ""
    if "v5 lite" in kind or "v5e" in kind:
        return TPU_V5E
    if d.platform == "tpu":
        return TPU_V5E  # closest model we have specs for
    return CPU_GENERIC


@dataclasses.dataclass(frozen=True)
class Roofline:
    flops: float
    hbm_bytes: float
    chip: ChipSpec

    @property
    def t_bandwidth_s(self) -> float:
        return self.hbm_bytes / (self.chip.hbm_gbps * 1e9)

    @property
    def t_compute_s(self) -> float:
        return self.flops / self.chip.flops_f32

    @property
    def t_sol_s(self) -> float:
        return max(self.t_bandwidth_s, self.t_compute_s)

    def efficiency(self, measured_s: float) -> float:
        return self.t_sol_s / max(measured_s, 1e-12)


def spmm_roofline(nnz: int, m: int, n: int, k: int, *, bytes_val=4, bytes_idx=4,
                  b_reuse: float = 1.0, chip: ChipSpec | None = None) -> Roofline:
    """A(m×n, nnz) @ B(n×k).  ``b_reuse``: average times each touched B row is
    re-read from HBM (1.0 = perfect panel caching; nnz/distinct-cols = none)."""
    chip = chip or detect_chip()
    flops = 2.0 * nnz * k
    distinct = min(nnz, n)
    bytes_ = (
        nnz * (bytes_val + bytes_idx)  # A
        + distinct * k * bytes_val * b_reuse  # B panels
        + m * k * bytes_val  # Y
    )
    return Roofline(flops=flops, hbm_bytes=bytes_, chip=chip)


def spmv_roofline(nnz: int, m: int, n: int, **kw) -> Roofline:
    return spmm_roofline(nnz, m, n, 1, **kw)


@dataclasses.dataclass(frozen=True)
class MeasuredRates:
    """Measured TPU primitive rates (benchmarks/primitives.py, v5e) — the
    second, ALGORITHM-AWARE bound.  The analytic Roofline assumes peak-HBM
    streaming, but v5e charges random gathers per ROW (~width-independent)
    and scatters per element; kernels built on those primitives cannot beat
    the primitive rates however well they stream.  ``attainable`` bounds
    below count each kernel's irreducible primitive invocations at these
    rates — the honest denominator for gather-bound sparse ops.

    ONE calibration source: ``benchmarks/primitives.py --json`` writes the
    driver-captured rates to ``spmm_tpu/primitive_rates.json``;
    :meth:`load` prefers that file so the attainable bounds, README table,
    and bench.py all quote the same measurement (a bound derived from the
    chip's own best primitive rates cannot be exceeded, so
    ``att_frac <= 1`` by construction).  The class defaults are the v5e
    measurements as of the last capture and only serve as fallback."""

    row_gather_rows_s: float = 1.1e8  # aligned 2-D row gather, any width
    scatter_elems_s: float = 1.1e8  # segment_sum / .at[] set
    scalar_gather_s: float = 1.35e8  # x[idx]
    sort_batched_s: float = 8e9  # minor-axis lax.sort, width 32-512
    sort_global_s: float = 3e8  # 1-D lax.sort
    elementwise_gbs: float = 600e9  # fused VPU passes, bytes/s

    @staticmethod
    def calibration_path() -> str:
        import os

        return os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "primitive_rates.json",
        )

    @classmethod
    def load(cls) -> "MeasuredRates":
        import json
        import os

        p = cls.calibration_path()
        if not os.path.exists(p):
            return cls()
        try:
            with open(p) as f:
                raw = json.load(f)
        except Exception:
            return cls()
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: float(v) for k, v in raw.items() if k in fields})


V5E_RATES = MeasuredRates.load()


def spmm_attainable(nnz_padded_rows: int, m: int, k: int,
                    rates: MeasuredRates = V5E_RATES) -> float:
    """Attainable seconds for gather-formulated SpMM: one B-row gather per
    (padded) nonzero + streaming the (m, k) output."""
    return nnz_padded_rows / rates.row_gather_rows_s + (
        2.0 * m * k * 4
    ) / rates.elementwise_gbs


def spmv_attainable(nnz_padded: int, rates: MeasuredRates = V5E_RATES) -> float:
    """Attainable seconds for gather-formulated SpMV: one scalar x-gather
    per (padded) nonzero."""
    return nnz_padded / rates.scalar_gather_s


def spgemm_attainable(npa: int, slots: int, nnz_b: int, nnz_a: int | None = None,
                      rates: MeasuredRates = V5E_RATES) -> float:
    """Attainable seconds for slab-ESC SpGEMM: every irreducible primitive
    invocation of the algorithm class, each at its measured best rate:

    - one segment-table row gather per pa (the expansion must be gathered);
    - one B-row-geometry row gather per A nonzero (each nonzero must learn
      its B row's segment count/offset — a random per-nonzero access);
    - one nnz(B)-element scatter building the aligned segment table, and one
      nnz(A)-element scatter materializing the pa step function (ESC's
      linearization of partials into a flat pa space);
    - one batched minor-axis sort over the padded slots plus the
      merge-compaction sort (2 x slots).

    Deliberately EXCLUDES the elementwise mask/iota/run-detection passes
    (the calibrated elementwise rate is shape-sensitive) — the bound stays
    a true lower envelope.  r1's version counted only the first gather, one
    scatter and the sorts; the omitted terms made ``att_frac`` understate
    the kernel by ~1.5x."""
    if nnz_a is None:
        nnz_a = nnz_b  # the A x A reference workload
    return (
        npa / rates.row_gather_rows_s
        + nnz_a / rates.row_gather_rows_s
        + 2.0 * slots / rates.sort_batched_s
        + (nnz_b + nnz_a) / rates.scatter_elems_s
    )


def spgemm_roofline(expand: int, nnz_a: int, nnz_b: int, nnz_out: int, *,
                    bytes_val=4, bytes_idx=4, chip: ChipSpec | None = None) -> Roofline:
    """ESC SpGEMM: ``expand`` partial products (= FLOPs/2).

    Problem-intrinsic HBM bound (algorithm-independent): read A and B once,
    materialize + re-read the expanded (col, val) stream once each way (any
    ESC formulation moves at least the 8 B/slot expansion through HBM twice —
    slab rows exceed VMEM in aggregate), write C once.  Deliberately does NOT
    model the sort algorithm's own passes — the kernel must earn them."""
    chip = chip or detect_chip()
    flops = 2.0 * expand
    slot_bytes = bytes_idx + bytes_val
    bytes_ = (
        nnz_a * (bytes_val + bytes_idx)
        + nnz_b * (bytes_val + bytes_idx)
        + expand * slot_bytes * 2
        + nnz_out * (bytes_val + 2 * bytes_idx)
    )
    return Roofline(flops=flops, hbm_bytes=bytes_, chip=chip)
