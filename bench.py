#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline: end-to-end preprocessing time on a web-Google-sized synthetic graph
(916,428^2, ~5.1M nnz) — the only number the reference publishes
(result.txt: 218.704 ms on the authors' machine; 379.5 ms rebuilt from source
in THIS container, see BASELINE.md).  vs_baseline = baseline_ms / our_ms
(>1 means faster than the reference on the same machine).

Extras report kernel throughput on the real device: SpMM (k=128), SpMV,
SpGEMM A×A — each against its speed-of-light roofline (spmm_tpu.ops.roofline).

Usage: python bench.py [--quick] [--no-kernels] [--measure-reference]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# local-reproduction baseline (same container, reference rebuilt from source
# with its makefile and run on an equal-size synthetic; BASELINE.md)
REFERENCE_PREPROCESS_MS = 379.5
WEBGOOGLE_N = 916_428
WEBGOOGLE_NNZ = 5_105_039


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_preprocess(A, cfg, iters=3):
    from spmm_tpu.preprocess import preprocess

    times = []
    P = None
    for _ in range(iters):
        t0 = time.perf_counter()
        P = preprocess(A, cfg)
        times.append((time.perf_counter() - t0) * 1e3)
    return min(times), P


def bench_kernels(A, P, k, chip):
    import jax
    import jax.numpy as jnp

    from spmm_tpu.ops import spmm_xla, spmv_xla, spmm_roofline, spmv_roofline
    from spmm_tpu.ops.blocked import blocked_spmm_xla
    from spmm_tpu.utils.timing import measure

    extras = {}
    m, n = A.shape
    Ad = A.pad(128).device()
    B = jnp.asarray(np.random.default_rng(0).standard_normal((n, k)).astype(np.float32))
    x = jnp.asarray(np.random.default_rng(1).standard_normal(n).astype(np.float32))

    f_spmm = jax.jit(spmm_xla)
    t = measure(f_spmm, Ad, B, name="spmm_csr_xla", warmup=1, iters=5)
    log(t)
    rl = spmm_roofline(A.nnz, m, n, k, chip=chip)
    extras["spmm_k128_ms"] = round(t.median_ms, 3)
    extras["spmm_k128_gflops"] = round(2.0 * A.nnz * k / (t.median_ms * 1e-3) / 1e9, 1)
    extras["spmm_k128_sol_frac"] = round(rl.efficiency(t.median_ms * 1e-3), 3)

    f_spmv = jax.jit(spmv_xla)
    t = measure(f_spmv, Ad, x, name="spmv_csr_xla", warmup=1, iters=5)
    log(t)
    rlv = spmv_roofline(A.nnz, m, n, chip=chip)
    extras["spmv_ms"] = round(t.median_ms, 3)
    extras["spmv_gnnz_per_s"] = round(A.nnz / (t.median_ms * 1e-3) / 1e9, 3)
    extras["spmv_sol_frac"] = round(rlv.efficiency(t.median_ms * 1e-3), 3)

    if P is not None:
        Pd = P.device()
        f_blk = jax.jit(blocked_spmm_xla)
        t = measure(f_blk, Pd, B, name="spmm_blocked_xla", warmup=1, iters=5)
        log(t)
        extras["spmm_blocked_k128_ms"] = round(t.median_ms, 3)
        extras["spmm_blocked_k128_gflops"] = round(
            2.0 * A.nnz * k / (t.median_ms * 1e-3) / 1e9, 1
        )
    return extras


def bench_spgemm(A, chip):
    from spmm_tpu.ops import spgemm, spgemm_expand_bound, spgemm_roofline

    extras = {}
    expand = spgemm_expand_bound(A, A)
    log(f"spgemm expansion: {expand/1e6:.1f} M partial products")
    # warm the compile on the first chunk sizes, then time end-to-end
    t0 = time.perf_counter()
    C = spgemm(A, A, max_expand_per_chunk=32 * 1024 * 1024)
    warm_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    C = spgemm(A, A, max_expand_per_chunk=32 * 1024 * 1024)
    hot_s = time.perf_counter() - t0
    rl = spgemm_roofline(expand, A.nnz, A.nnz, C.nnz, chip=chip)
    log(f"spgemm A@A: {hot_s*1e3:.0f} ms hot ({warm_s:.1f}s cold), out nnz {C.nnz/1e6:.1f}M")
    extras["spgemm_ms"] = round(hot_s * 1e3, 1)
    extras["spgemm_gflops"] = round(2.0 * expand / hot_s / 1e9, 1)
    extras["spgemm_mnnz_out_per_s"] = round(C.nnz / hot_s / 1e6, 1)
    extras["spgemm_sol_frac"] = round(rl.efficiency(hot_s), 3)
    extras["spgemm_out_nnz"] = int(C.nnz)
    return extras


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small matrix, fast run")
    ap.add_argument("--no-kernels", action="store_true")
    ap.add_argument("--no-spgemm", action="store_true")
    ap.add_argument("--measure-reference", action="store_true",
                    help="also run the reference binary on the same matrix")
    args = ap.parse_args()

    from spmm_tpu.config import Config
    from spmm_tpu.formats.synthetic import webgraph_like
    from spmm_tpu.ops.roofline import detect_chip

    if args.quick:
        n, nnz = 50_000, 300_000
    else:
        n, nnz = WEBGOOGLE_N, WEBGOOGLE_NNZ

    t0 = time.perf_counter()
    A = webgraph_like(n, nnz, seed=0)
    log(f"synthetic web graph: {A.shape} nnz={A.nnz} ({time.perf_counter()-t0:.1f}s)")

    cfg = Config()
    pre_ms, P = bench_preprocess(A, cfg)
    mnnz_s = A.nnz / (pre_ms * 1e-3) / 1e6
    log(f"preprocess: {pre_ms:.1f} ms ({mnnz_s:.1f} M nnz/s); "
        f"reference repro: {REFERENCE_PREPROCESS_MS} ms")

    extras = {
        "nnz": int(A.nnz),
        "n": int(n),
        "preprocess_mnnz_per_s": round(mnnz_s, 2),
        "regions": P.nregions,
        "v8_groups": P.ngroups,
    }

    baseline_ms = REFERENCE_PREPROCESS_MS if not args.quick else float("nan")
    if args.measure_reference:
        ref_ms = run_reference_binary(A)
        if ref_ms is not None:
            baseline_ms = ref_ms
            extras["reference_measured_ms"] = round(ref_ms, 1)

    import jax

    chip = detect_chip()
    extras["device"] = getattr(jax.devices()[0], "device_kind", jax.devices()[0].platform)

    if not args.no_kernels:
        try:
            extras.update(bench_kernels(A, P, k=128, chip=chip))
        except Exception as e:  # keep the headline alive on kernel failure
            log("kernel bench failed:", repr(e))
            extras["kernel_error"] = repr(e)[:200]
    if not args.no_spgemm:
        try:
            extras.update(bench_spgemm(A, chip))
        except Exception as e:
            log("spgemm bench failed:", repr(e))
            extras["spgemm_error"] = repr(e)[:200]

    result = {
        "metric": "preprocess_ms_webgoogle_synthetic",
        "value": round(pre_ms, 1),
        "unit": "ms",
        "vs_baseline": round(baseline_ms / pre_ms, 3) if baseline_ms == baseline_ms else None,
        **extras,
    }
    print(json.dumps(result))


def run_reference_binary(A):
    """Optionally run the reference's prebuilt serial binary on the same
    matrix for a live same-machine baseline (reads matrix.txt + mat/mtx/...;
    reference README.md:11-24)."""
    import os
    import shutil
    import subprocess

    ref_bin = "/root/reference/PreProcessing/serial"
    if not os.path.exists(ref_bin):
        return None
    from spmm_tpu.formats.containers import to_coo
    from spmm_tpu.formats.mtx import write_mtx

    work = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_tmp")
    matdir = os.path.join(work, "mat", "mtx", "bench")
    os.makedirs(matdir, exist_ok=True)
    write_mtx(os.path.join(matdir, "bench.mtx"), to_coo(A), pattern=True)
    with open(os.path.join(work, "matrix.txt"), "w") as f:
        f.write("bench\n")
    try:
        subprocess.run([ref_bin], cwd=work, check=True, capture_output=True, timeout=600)
        with open(os.path.join(work, "result.txt")) as f:
            line = f.read().split()
        ms = float(line[1].replace("ms", ""))
        return ms
    except Exception as e:
        log("reference run failed:", repr(e))
        return None
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
