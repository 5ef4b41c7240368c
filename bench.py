#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline: end-to-end preprocessing time on a web-Google-sized synthetic graph
(916,428^2, ~5.1M nnz) — the only number the reference publishes
(result.txt: 218.704 ms on the authors' machine; 494.6 ms rebuilt from source
in THIS container on the same calibrated synthetic, see BASELINE.md).
vs_baseline = baseline_ms / our_ms (>1 means faster than the reference on the
same machine).

Extras report kernel throughput on the real device: SpGEMM A×A (flagship),
SpMM (k=128/k=32), SpMV — each against its speed-of-light roofline AND the
measured-primitive attainable bound (spmm_tpu.ops.roofline).

Budget discipline: the driver runs this under an external `timeout` on a
machine with a COLD compile cache (fresh VM per round), where each remote
compile costs 5-100 s.  Every section is therefore gated on an internal
deadline (BENCH_BUDGET_S, default 780 s), ordered headline-first, and a
SIGTERM/SIGALRM handler prints whatever has been measured so far — the JSON
line is emitted in EVERY exit path.

Usage: python bench.py [--quick] [--full] [--no-kernels] [--no-spgemm]
                       [--no-suite] [--no-scaling] [--matrix PATH]
                       [--measure-reference]
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import threading
import time

import numpy as np

# local-reproduction baseline (same container, reference rebuilt from source
# with its makefile and run on the SAME calibrated synthetic matrix this
# harness benches — min of 5 runs, re-measured 2026-08-17; BASELINE.md)
REFERENCE_PREPROCESS_MS = 494.6
WEBGOOGLE_N = 916_428
WEBGOOGLE_NNZ = 5_105_039

# ---------------------------------------------------------------- deadline
T0 = time.monotonic()
# 720 s: the round-2 driver run was externally killed at ~900 s (its tail
# shows ~830 s of completed sections before rc=124), so 720+45 leaves margin
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "720"))

RESULT: dict = {
    "metric": "preprocess_ms_webgoogle_synthetic",
    "value": None,
    "unit": "ms",
    "vs_baseline": None,
}
_emitted = False
_emit_lock = threading.Lock()


def time_left() -> float:
    return BUDGET_S - (time.monotonic() - T0)


def emit():
    """Print the JSON line exactly once, whatever state we reached.
    Called from main, signal handlers (which run ON the main thread), and
    the watchdog thread.  Three deliberate choices:

    - serialization AND the print stay inside the critical section, and
      ``_emitted`` flips only AFTER the print: an exiting caller (watchdog /
      signal handler running os._exit right after a no-op emit) can only
      see ``_emitted`` once the line is fully on stdout;
    - the lock acquire is TIMED: a signal handler interrupting the main
      thread mid-emit would self-deadlock on an untimed lock (handlers run
      on the holder's own thread) — after 10 s we proceed without the lock,
      preferring a possible duplicate line over no line;
    - a minimal headline line is pre-built so even if every full-dict
      serialization attempt loses the race against a mutating main thread,
      something valid prints."""
    global _emitted
    acquired = _emit_lock.acquire(timeout=10.0)
    try:
        if _emitted:
            return
        RESULT["bench_wall_s"] = round(time.monotonic() - T0, 1)
        line = json.dumps({"metric": RESULT["metric"], "value": RESULT["value"],
                           "unit": RESULT["unit"], "vs_baseline": RESULT["vs_baseline"]})
        for _ in range(3):  # main thread may mutate RESULT concurrently
            try:
                # default=str: a non-JSON value (numpy scalar etc.) must not
                # take down the one guaranteed output line
                line = json.dumps(dict(RESULT), default=str)
                break
            except Exception:
                continue
        print(line, flush=True)
        _emitted = True
    finally:
        if acquired:
            _emit_lock.release()


def _on_signal(signum, frame):
    RESULT["interrupted"] = signal.Signals(signum).name
    emit()
    os._exit(0)


signal.signal(signal.SIGTERM, _on_signal)
signal.signal(signal.SIGALRM, _on_signal)
# hard backstop 45 s past the soft budget: even a hung device call cannot
# prevent the JSON line (the alarm fires in this process, not the device)
signal.alarm(int(BUDGET_S) + 45)


def _watchdog():
    """Signal handlers only run between Python bytecodes — a SIGTERM/SIGALRM
    delivered while the main thread is blocked inside a C-level device RPC
    (remote compile / D2H fence on the axon tunnel, routinely 30-100 s cold)
    is DEFERRED until that call returns, which is exactly how round 2's
    driver run died with rc=124 and no JSON line (BENCH_r02.json).  A daemon
    THREAD is immune: at the soft budget it prints whatever has been
    measured (every section writes through to RESULT the moment a number
    exists) and hard-exits 0."""
    while True:
        left = time_left()
        if left <= 0:
            RESULT["interrupted"] = "WATCHDOG_BUDGET"
            emit()
            os._exit(0)
        time.sleep(min(left, 5.0))


threading.Thread(target=_watchdog, daemon=True, name="bench-watchdog").start()


def gate(section: str, need_s: float) -> bool:
    """True if there's budget to start `section` (estimated cost need_s)."""
    if time_left() >= need_s:
        return True
    log(f"SKIP {section}: {time_left():.0f}s left < {need_s:.0f}s needed")
    RESULT.setdefault("skipped", []).append(section)
    return False


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------- sections
def bench_preprocess(A, cfg, iters=9):  # min-of-9: the 1-CPU host is noisy
    from spmm_tpu.preprocess import preprocess

    times = []
    P = None
    for _ in range(iters):
        t0 = time.perf_counter()
        P = preprocess(A, cfg)
        times.append((time.perf_counter() - t0) * 1e3)
    return min(times), P


def bench_kernels(A, P, k, chip, full=False):
    """Kernel timings via device-side loops (the axon tunnel makes per-call
    host timing meaningless: ~50 ms dispatch+fence floor, and
    block_until_ready does not actually block — see utils/timing.py).
    Ordered by value; each measurement is deadline-gated (cold-cache remote
    compiles cost 5-100 s each)."""
    import jax
    import jax.numpy as jnp

    from spmm_tpu.formats.ell import ell_pack
    from spmm_tpu.ops import spmm_xla, spmv_xla, spmm_roofline, spmv_roofline
    from spmm_tpu.ops.ell_spmm import ell_spmm, ell_spmv
    from spmm_tpu.ops.roofline import spmm_attainable, spmv_attainable
    from spmm_tpu.utils.timing import measure_device_loop, measure_host

    extras = RESULT  # write-through: a signal-time emit sees partial sections
    m, n = A.shape
    B0 = jnp.asarray(np.random.default_rng(0).standard_normal((m, k)).astype(np.float32))
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(m).astype(np.float32))

    def norm(y):
        return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-9)

    flops = 2.0 * A.nnz * k
    rl = spmm_roofline(A.nnz, m, n, k, chip=chip)
    rlv = spmv_roofline(A.nnz, m, n, chip=chip)

    def record(prefix, t, fl=flops, sol=rl):
        log(t)
        extras[f"{prefix}_ms"] = round(t.median_ms, 3)
        if fl:
            extras[f"{prefix}_gflops"] = round(fl / (t.median_ms * 1e-3) / 1e9, 1)
        if sol:
            extras[f"{prefix}_sol_frac"] = round(sol.efficiency(t.median_ms * 1e-3), 3)

    # --- the production ELL slabs (BASELINE configs 2-3) -------------------
    E = ell_pack(A).device()
    extras["ell_padding_factor"] = round(E.padded_nnz / max(A.nnz, 1), 3)
    if gate("spmm_ell_k128", 90):
        t = measure_device_loop(
            lambda c, E: norm(ell_spmm(E, c)), B0, (E,), name="spmm_ell_k128", iters=8
        )
        record("spmm_ell_k128", t)
        # size-matched gather rate: the kernel gathers rows of the (n, k)
        # B panel — 470 MB at web-Google k=128, where the per-row charge is
        # ~2-3x the 16 MB-table rate (VERDICT r4 weak #1)
        extras["spmm_ell_k128_att_frac"] = round(
            spmm_attainable(E.padded_nnz, m, k, table_bytes=n * k * 4)
            / (t.median_ms * 1e-3), 3
        )
    if gate("spmv_ell", 60):
        t = measure_device_loop(
            lambda c, E: norm(ell_spmv(E, c)), x0, (E,), name="spmv_ell", iters=8
        )
        record("spmv_ell", t, fl=2.0 * A.nnz, sol=rlv)
        extras["spmv_ell_att_frac"] = round(
            spmv_attainable(E.padded_nnz) / (t.median_ms * 1e-3), 3
        )
    # --- BSR MXU kernel (BASELINE config 4) — cheap compiles (~5 s), runs
    # before the expensive narrow-k/dispatcher compiles so a cold-cache
    # budget squeeze still records the MXU path ------------------------------
    if gate("bsr", 60):
        try:
            from spmm_tpu.formats.bsr import csr_to_bsr
            from spmm_tpu.formats.synthetic import banded_random
            from spmm_tpu.ops.pallas_bsr import bsr_spmm_pallas, bsr_spmv

            nb = 65536
            Ab = banded_random(nb, 512, 0.25, seed=3)
            Bs = csr_to_bsr(Ab, (8, 128)).device()
            Bd = jnp.asarray(
                np.random.default_rng(2)
                .standard_normal((((nb + 127) // 128) * 128, 128))
                .astype(np.float32)
            )
            t = measure_device_loop(
                lambda c, Bs: norm(bsr_spmm_pallas(Bs, c)), Bd, (Bs,),
                name="bsr_spmm_k128", iters=8
            )
            fl = 2.0 * Bs.nblocks * 8 * 128 * 128
            extras["bsr_spmm_k128_ms"] = round(t.median_ms, 3)
            extras["bsr_spmm_k128_gflops"] = round(fl / (t.median_ms * 1e-3) / 1e9, 1)
            extras["bsr_nblocks"] = int(Bs.nblocks)
            log(t)

            xb = Bd[:, 0]
            t = measure_device_loop(
                lambda c, Bs: norm(bsr_spmv(Bs, c)), xb, (Bs,), name="bsr_spmv", iters=8
            )
            flv = 2.0 * Bs.nblocks * 8 * 128
            extras["bsr_spmv_ms"] = round(t.median_ms, 3)
            extras["bsr_spmv_gflops"] = round(flv / (t.median_ms * 1e-3) / 1e9, 1)
            log(t)
        except Exception as e:
            log("bsr bench failed:", repr(e))
            extras["bsr_error"] = repr(e)[:200]

    # tall-skinny k=32 (BASELINE config 3 benches k=32 and k=128)
    if gate("spmm_ell_k32", 60):
        B32 = B0[:, :32]
        t = measure_device_loop(
            lambda c, E: norm(ell_spmm(E, c)), B32, (E,), name="spmm_ell_k32", iters=8
        )
        # no sol_frac here: the streaming roofline charges bytes, but the
        # kernel's cost is per-ROW gathers (width-blind — k=32 ~= k=128,
        # DESIGN §3), so the attainable bound is the honest denominator
        record("spmm_ell_k32", t, fl=2.0 * A.nnz * 32, sol=None)
        extras["spmm_ell_k32_att_frac"] = round(
            spmm_attainable(E.padded_nnz, m, 32, table_bytes=n * 32 * 4)
            / (t.median_ms * 1e-3), 3
        )

    # --- user-facing dispatchers on a raw CSR (auto-pack to ELL once) ------
    # spmv_csr/spmm_csr_k128 report the steady state after the dispatcher's
    # memoized pack (ops/spmm.py:_ell_of); the one-time pack cost is
    # spmv_csr_pack_ms
    from spmm_tpu.ops.spmm import _ell_of

    tp = measure_host(lambda: ell_pack(A), name="ell_pack", iters=3)
    extras["spmv_csr_pack_ms"] = round(tp.min_ms, 1)
    Ed = _ell_of(A)  # the dispatcher's own cached pack
    if gate("spmv_csr", 60):
        t = measure_device_loop(
            lambda c, Ed: norm(ell_spmv(Ed, c)), x0, (Ed,), name="spmv_csr", iters=8
        )
        record("spmv_csr", t, fl=2.0 * A.nnz, sol=rlv)
        extras["spmv_csr_gnnz_per_s"] = round(A.nnz / (t.median_ms * 1e-3) / 1e9, 3)
    # spmm_csr_k128 is the dispatcher running the SAME cached ELL pack
    # through the SAME kernel as spmm_ell_k128 (48.6 vs 48.7 ms every
    # capture) — its ~60 s of warm-cache program load was what squeezed the
    # matrix suite out of the budget, so it's diagnostic-only now
    if full and gate("spmm_csr_k128", 60):
        t = measure_device_loop(
            lambda c, Ed: norm(ell_spmm(Ed, c)), B0, (Ed,), name="spmm_csr_k128", iters=8
        )
        record("spmm_csr_k128", t)

    # --- preprocessed BlockedCSR (v8 slabs) ---------------------------------
    if P is not None and gate("spmm_blocked_k128", 80):
        from spmm_tpu.ops.blocked import blocked_slab_view, blocked_spmm_slab

        Pd = P.device()
        view = blocked_slab_view(Pd)  # pack-once / multiply-many (v8 slabs)
        t = measure_device_loop(
            lambda c, Pd, v: norm(blocked_spmm_slab(Pd, c, v)),
            B0,
            (Pd, view),
            name="spmm_blocked_k128",
            iters=8,
        )
        record("spmm_blocked_k128", t)

    # --- raw-CSR scatter path (diagnostic; --full only: 2 extra compiles) ---
    if full and gate("raw_csr", 120):
        Ad = A.pad(128).device()
        t = measure_device_loop(
            lambda c, Ad: norm(spmm_xla(Ad, c)), B0, (Ad,), name="spmm_csr_raw_k128", iters=8
        )
        record("spmm_csr_raw_k128", t)
        t = measure_device_loop(
            lambda c, Ad: norm(spmv_xla(Ad, c)), x0, (Ad,), name="spmv_csr_raw", iters=8
        )
        record("spmv_csr_raw", t, fl=2.0 * A.nnz, sol=rlv)
    return extras


def bench_spgemm(A, chip, start_scaling=None):
    """Slab-kernel SpGEMM timing: full multiply (plan + stream + numeric),
    device-resident, fenced by a tiny D2H read per phase output."""
    import time as _time

    from spmm_tpu.ops import spgemm_expand_bound, spgemm_roofline
    from spmm_tpu.ops.slab_spgemm import spgemm_slab_device

    extras = RESULT  # write-through: a signal-time emit sees partial sections
    expand = spgemm_expand_bound(A, A)
    log(f"spgemm expansion: {expand/1e6:.1f} M partial products")
    Ad = A.device()  # matrix resident on device, as in steady-state use

    def run():
        # fused path: sizing (native host pass) + ONE device dispatch
        outs, tails, _ = spgemm_slab_device(A, A, A_dev=Ad, B_dev=Ad)
        np.asarray(outs[-1][3][:1])  # one program: one fence
        return outs

    # STRICTLY SEQUENTIAL device use.  Overlapping the cold run with the
    # plan build on two threads was measured to DEADLOCK the axon tunnel:
    # two in-flight executions stall until a ~600 s relay timeout releases
    # both (repro 2026-08-19: cold run 601 s threaded vs 245 ms serialized,
    # with a fully warm compile cache).  Sequential cold-cache compiles are
    # slower than overlapped ones, but every metric below is written through
    # to RESULT the moment it exists, so a SIGALRM mid-section still reports
    # whatever was measured.
    from spmm_tpu.ops.slab_spgemm import spgemm_plan

    plan = None
    outs = run()  # warm/compile
    times = []
    for _ in range(5):
        t0 = _time.perf_counter()
        outs = run()
        times.append((_time.perf_counter() - t0) * 1e3)
    ms = min(times)
    if start_scaling is not None:
        # the CPU-mesh scaling subprocess steals ~50 ms/run from the cold
        # timing's host sizing pass on this 1-CPU host — launch it only
        # after the cold loop (the sections below are device-bound)
        start_scaling()
    out_nnz = int(sum(int(np.asarray(o[3]).sum()) for o in outs))
    rl = spgemm_roofline(expand, A.nnz, A.nnz, out_nnz, chip=chip)
    log(f"spgemm_slab: {ms:.1f} ms, out_nnz={out_nnz}")
    extras["spgemm_ms"] = round(ms, 1)
    extras["spgemm_gflops"] = round(2.0 * expand / (ms * 1e-3) / 1e9, 2)
    extras["spgemm_mnnz_out_per_s"] = round(out_nnz / (ms * 1e-3) / 1e6, 1)
    extras["spgemm_sol_frac"] = round(rl.efficiency(ms * 1e-3), 3)
    # measured-primitive attainable bound for the slab-ESC algorithm class —
    # the COMPLETE irreducible set (3 scatters, size-matched gather tables,
    # irreducible stream, dispatch+fence), VERDICT r4 weak #2
    from spmm_tpu.ops.roofline import V5E_RATES, spgemm_attainable
    from spmm_tpu.ops.slab_spgemm import (
        DEFAULT_CLASSES, DEFAULT_SEG_W, DEFAULT_SLOT_BUDGET, _chunk_schedule,
        _nseg_pad, _pick_b2_ws, _round_up, _sizing,
    )

    W = DEFAULT_SEG_W
    cl = tuple(sorted({_round_up(c, W) for c in DEFAULT_CLASSES}))
    npa, _, _, counts_s = _sizing(A, A, W, cl)
    # the real chunk mix: sort terms charged at each chunk's WIDTH-matched
    # rate (the slab widths sort at 5-8 G elem/s, not the best-width 18 G)
    sched_s, _ = _chunk_schedule(cl, counts_s, DEFAULT_SLOT_BUDGET)
    chunk_slots = tuple((L, R_pad * L) for (L, R_pad, _s, _c) in sched_s)
    lenB = np.asarray(A.indptr, np.int64)
    lenB = lenB[1:] - lenB[:-1]
    nsegB_pad = _nseg_pad(int(((lenB + W - 1) // W).sum()))
    ws = _pick_b2_ws(W, True, np.dtype(np.asarray(A.data).dtype), nsegB_pad)
    extras["spgemm_att_frac"] = round(
        spgemm_attainable(
            npa, npa * W, A.nnz,
            nrow_b=A.shape[0],
            b2_table_bytes=nsegB_pad * ws * 4,
            geom_table_bytes=A.shape[0] * 8,
            out_nnz=out_nnz,
            chunk_slots=chunk_slots,
        )
        / (ms * 1e-3), 3
    )
    extras["spgemm_out_nnz"] = out_nnz

    # two-phase (symbolic/numeric) steady state: build the plan once, then
    # re-execute only the numeric chunks — the reference's whole premise is
    # preprocess-once / multiply-many (SURVEY.md §0), and this is the SpGEMM
    # analog (cuSPARSE-style reuse: same structure, repeated products)
    if gate("spgemm_warm_run", 200):  # 2 extra cold-cache compiles
        try:
            # plan build (compiles _plan_aligned_device on a cold cache),
            # then steady-state rebuild time; min of 2 — the tunnel's D2H
            # fence occasionally stalls for seconds
            pts = []
            for _ in range(2):
                t0 = _time.perf_counter()
                plan = spgemm_plan(A, A, A_dev=Ad, B_dev=Ad)
                np.asarray(plan.rows_sorted[:1])
                pts.append((_time.perf_counter() - t0) * 1e3)
            extras["spgemm_plan_ms"] = round(min(pts), 1)

            def run_warm():
                outs, _, _ = spgemm_slab_device(A, A, plan=plan)
                np.asarray(outs[-1][3][:1])
                return outs

            outs_w = run_warm()  # compiles _fused_numeric_aligned
            wnnz = int(sum(int(np.asarray(o[3]).sum()) for o in outs_w))
            assert wnnz == out_nnz, (wnnz, out_nnz)
            times = []
            for _ in range(5):
                t0 = _time.perf_counter()
                run_warm()
                times.append((_time.perf_counter() - t0) * 1e3)
            wms = min(times)
            log(f"spgemm_warm (plan reuse): {wms:.1f} ms")
            extras["spgemm_warm_ms"] = round(wms, 1)
            extras["spgemm_warm_mnnz_out_per_s"] = round(out_nnz / (wms * 1e-3) / 1e6, 1)
            # aligned-numeric attainable: sorts + irreducible stream +
            # dispatch/fence (the denominator r4 lacked, VERDICT weak #3)
            from spmm_tpu.ops.roofline import spgemm_warm_attainable

            extras["spgemm_warm_att_frac"] = round(
                spgemm_warm_attainable(npa * W, out_nnz, chunk_slots=chunk_slots)
                / (wms * 1e-3), 3
            )

            # chained execution: N products, ONE fence — the per-product
            # device-time floor with the tunnel's dispatch+fence amortized
            # (VERDICT r4 item #4; DESIGN §2 named the per-product fence as
            # the remaining ~14 ms of the warm path)
            from spmm_tpu.ops.slab_spgemm import spgemm_chain_device

            NCHAIN = 8
            outs_c = spgemm_chain_device(plan, 2)  # warm the chain path
            np.asarray(outs_c[-1][3][:1])
            times = []
            for _ in range(3):
                t0 = _time.perf_counter()
                outs_c = spgemm_chain_device(plan, NCHAIN)
                np.asarray(outs_c[-1][3][:1])  # one fence for all N
                times.append((_time.perf_counter() - t0) * 1e3)
            cms = min(times) / NCHAIN
            log(f"spgemm_chain ({NCHAIN} products, one fence): {cms:.1f} ms/product")
            extras["spgemm_chain_ms"] = round(cms, 1)
            extras["spgemm_chain_att_frac"] = round(
                spgemm_warm_attainable(npa * W, out_nnz, dispatches=1.0 / NCHAIN,
                                       chunk_slots=chunk_slots)
                / (cms * 1e-3), 3
            )
        except Exception as e:  # keep the cold extras on warm-path failure
            log("spgemm warm bench failed:", repr(e))
            extras["spgemm_warm_error"] = repr(e)[:200]

    # projected N=8 scaling-efficiency cap: SPMD SpGEMM (config 5) has no
    # inter-shard communication, so efficiency = mean/max per-shard expansion
    # (the uniform schedule waits for the heaviest shard).  The preprocessing
    # reorder + uniform row split is what controls this balance.
    try:
        from spmm_tpu.parallel.partition import partition_rows
        from spmm_tpu.parallel.spgemm_spmd import _per_shard_sizing

        S8 = partition_rows(A, 8)
        _, counts8, _, _ = _per_shard_sizing(S8, A, W, cl)
        # per-shard padded expansion = sum over classes of count * class size
        exp8 = (counts8[:, : len(cl)] * np.asarray(cl)[None, :]).sum(axis=1)
        extras["spgemm_shard_balance_8"] = round(float(exp8.mean() / exp8.max()), 3)
    except Exception as e:
        log("shard balance failed:", repr(e))
    return extras


def bench_scaling_start(*, quick: bool = False):
    """Launch the 1/2/4/8-virtual-device SPMD SpGEMM scaling run (VERDICT r1
    #9) as a CPU-only subprocess RIGHT AFTER the headline: its minutes of
    XLA CPU compile overlap the device sections (this process mostly waits
    on remote RPCs), and the TPU stays owned by this process."""
    import subprocess

    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "benchmarks", "scaling_cpu.py")
    sub_budget = max(45.0, min(500.0, time_left() - 90.0))
    cmd = [sys.executable, script, "--budget", str(sub_budget)]
    if quick:
        cmd += ["--n", "12000", "--nnz", "72000", "--iters", "1"]
    env = {k: v for k, v in os.environ.items() if k != "JAX_PLATFORMS"}
    root = os.path.dirname(os.path.abspath(__file__))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        env=env, cwd=root,
    )


def bench_scaling_collect(proc):
    try:
        out_s, _ = proc.communicate(timeout=max(20.0, time_left() - 20.0))
    except Exception:
        proc.kill()
        proc.communicate()
        raise
    if proc.returncode != 0:
        raise RuntimeError(f"scaling_cpu exited {proc.returncode}")
    line = [l for l in out_s.strip().splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    log("scaling:", out)
    return out


def bench_dist_big(chip):
    """Streamed distributed SpGEMM (BASELINE config 5 composition,
    spgemm_dist_big) on the real chip: a 1-device mesh, forced multi-piece
    streaming.  The full >=100M-nnz 8-shard execution with exact scipy
    parity runs on the CPU mesh (benchmarks/dist_big_cpu.py: 104.5M nnz ->
    963.2M out, r5); this section proves the same code path on TPU and
    reports its streaming throughput at a budget-sized scale."""
    import time as _time

    import jax
    from jax.sharding import Mesh

    from spmm_tpu.formats.synthetic import webgraph_like
    from spmm_tpu.parallel.spgemm_spmd import spgemm_dist_big

    extras = RESULT
    G = webgraph_like(1_000_000, 8_000_000, seed=5)
    mesh = Mesh(np.array(jax.devices()[:1]), ("rows",))
    t0 = _time.perf_counter()
    C = spgemm_dist_big(G, G, mesh, pieces=4)
    ms = (_time.perf_counter() - t0) * 1e3
    extras["spgemm_dist_big_ms"] = round(ms, 1)
    extras["spgemm_dist_big_nnz_out"] = int(C.nnz)
    extras["spgemm_dist_big_mnnz_out_per_s"] = round(C.nnz / (ms * 1e-3) / 1e6, 1)
    extras["spgemm_dist_big_pieces"] = 4
    log(f"spgemm_dist_big (1M rows / {G.nnz/1e6:.1f}M nnz, 4 pieces): "
        f"{ms:.0f} ms -> {C.nnz/1e6:.1f}M out")
    return extras


# the reference's evaluation suite (README.md:12-18) as synthetic analogs
# (SuiteSparse is unreachable without egress; shapes/nnz match the originals)
SUITE = {
    "web-Stanford": (281_903, 2_312_497),
    "web-Google": (916_428, 5_105_039),
    "sx-askubuntu": (159_316, 964_437),
}


def bench_suite(cfg):
    """BASELINE.json configs 1-2: preprocessing + SpGEMM A x A across the
    reference's matrix suite (web-Google's own numbers come from the main
    sections; here the other two)."""
    from spmm_tpu.formats.synthetic import webgraph_like
    from spmm_tpu.ops.slab_spgemm import spgemm_slab_device

    extras = RESULT  # write-through: a signal-time emit sees partial sections
    for name, (n, nnz) in SUITE.items():
        if name == "web-Google":
            continue
        if not gate(f"suite:{name}", 55):
            break
        A = webgraph_like(n, nnz, seed=1)
        pre_ms, _ = bench_preprocess(A, cfg, iters=3)
        extras[f"{name}_preprocess_ms"] = round(pre_ms, 1)
        Ad = A.device()
        import time as _t

        def run():
            outs, _, _ = spgemm_slab_device(A, A, A_dev=Ad, B_dev=Ad)
            np.asarray(outs[-1][3][:1])
            return outs

        run()
        ts = []
        for _ in range(2):
            t0 = _t.perf_counter()
            run()
            ts.append((_t.perf_counter() - t0) * 1e3)
        extras[f"{name}_spgemm_ms"] = round(min(ts), 1)
        log(f"suite {name}: preprocess {pre_ms:.1f} ms, spgemm {min(ts):.1f} ms")
    return extras


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small matrix, fast run")
    ap.add_argument("--full", action="store_true",
                    help="include diagnostic raw-CSR scatter-path measurements")
    ap.add_argument("--no-kernels", action="store_true")
    ap.add_argument("--no-spgemm", action="store_true")
    ap.add_argument("--no-suite", action="store_true")
    ap.add_argument("--no-scaling", action="store_true")
    ap.add_argument("--matrix", default=None, metavar="PATH",
                    help="bench a real .mtx (pattern-ingested, reference "
                    "contract) instead of the synthetic web graph")
    ap.add_argument("--measure-reference", action="store_true",
                    help="also run the reference binary on the same matrix")
    args = ap.parse_args()

    # persistent compile cache: remote (axon) compiles cost 5-100 s each and
    # dominate bench wall time; cached reruns skip them entirely (the driver
    # runs on a fresh VM = cold cache, hence the deadline gates above)
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_spmm_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from spmm_tpu.config import Config
    from spmm_tpu.formats.synthetic import webgraph_like
    from spmm_tpu.ops.roofline import detect_chip

    if args.quick:
        n, nnz = 50_000, 300_000
    else:
        n, nnz = WEBGOOGLE_N, WEBGOOGLE_NNZ

    t0 = time.perf_counter()
    if args.matrix:
        # real matrix: the reference ingest contract (values forced to 1.0,
        # SURVEY.md §2.1) — when a SuiteSparse .mtx is available it drops in
        # here and every number below is on the real workload
        from spmm_tpu.formats.mtx import read_mtx
        from spmm_tpu.formats.containers import to_csr

        A = to_csr(read_mtx(args.matrix))
        n, nnz = A.shape[0], A.nnz
        log(f"matrix {args.matrix}: {A.shape} nnz={A.nnz} "
            f"({time.perf_counter()-t0:.1f}s)")
    else:
        A = webgraph_like(n, nnz, seed=0)
        log(f"synthetic web graph: {A.shape} nnz={A.nnz} ({time.perf_counter()-t0:.1f}s)")

    cfg = Config()
    pre_ms, P = bench_preprocess(A, cfg)
    mnnz_s = A.nnz / (pre_ms * 1e-3) / 1e6
    log(f"preprocess: {pre_ms:.1f} ms ({mnnz_s:.1f} M nnz/s); "
        f"reference repro: {REFERENCE_PREPROCESS_MS} ms")

    baseline_ms = REFERENCE_PREPROCESS_MS if not args.quick else float("nan")
    if args.measure_reference:
        ref_ms = run_reference_binary(A)
        if ref_ms is not None:
            baseline_ms = ref_ms
            RESULT["reference_measured_ms"] = round(ref_ms, 1)

    # headline secured: from here on, every exit path prints a valid line
    RESULT["value"] = round(pre_ms, 1)
    RESULT["vs_baseline"] = (
        round(baseline_ms / pre_ms, 3) if baseline_ms == baseline_ms else None
    )
    RESULT.update(
        nnz=int(A.nnz),
        n=int(n),
        preprocess_mnnz_per_s=round(mnnz_s, 2),
        regions=P.nregions,
        v8_groups=P.ngroups,
    )

    chip = detect_chip()
    RESULT["device"] = getattr(jax.devices()[0], "device_kind", jax.devices()[0].platform)

    scaling_state: dict = {"proc": None}

    def start_scaling():
        if scaling_state["proc"] is not None or args.no_scaling:
            return
        if not gate("scaling", 90):
            return
        try:
            scaling_state["proc"] = bench_scaling_start(quick=args.quick)
        except Exception as e:
            log("scaling launch failed:", repr(e))
            RESULT["scaling_error"] = repr(e)[:200]

    if not args.no_spgemm and gate("spgemm", 150):
        try:
            RESULT.update(bench_spgemm(A, chip, start_scaling=start_scaling))
        except Exception as e:
            log("spgemm bench failed:", repr(e))
            RESULT["spgemm_error"] = repr(e)[:200]
    start_scaling()  # if the spgemm section was skipped or died early
    if not args.no_kernels and gate("kernels", 120):
        try:
            RESULT.update(bench_kernels(A, P, k=128, chip=chip, full=args.full))
        except Exception as e:  # keep the headline alive on kernel failure
            log("kernel bench failed:", repr(e))
            RESULT["kernel_error"] = repr(e)[:200]
    def collect_scaling(*, only_if_done: bool = False):
        proc = scaling_state["proc"]
        if proc is None or scaling_state.get("collected"):
            return
        if only_if_done and proc.poll() is None:
            return
        try:
            RESULT.update(bench_scaling_collect(proc))
        except Exception as e:
            log("scaling bench failed:", repr(e))
            RESULT["scaling_error"] = repr(e)[:200]
        scaling_state["collected"] = True

    # harvest a finished scaling subprocess BEFORE the suite: if a suite
    # compile overruns into the watchdog, the curve is already in RESULT
    collect_scaling(only_if_done=True)
    if not args.no_suite and not args.quick and gate("suite", 110):
        try:
            RESULT.update(bench_suite(cfg))
        except Exception as e:
            log("suite bench failed:", repr(e))
            RESULT["suite_error"] = repr(e)[:200]
    if not args.no_spgemm and not args.quick and gate("dist_big", 120):
        try:
            RESULT.update(bench_dist_big(chip))
        except Exception as e:
            log("dist_big bench failed:", repr(e))
            RESULT["dist_big_error"] = repr(e)[:200]
    collect_scaling()

    emit()


def run_reference_binary(A):
    """Optionally run the reference's prebuilt serial binary on the same
    matrix for a live same-machine baseline (reads matrix.txt + mat/mtx/...;
    reference README.md:11-24)."""
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
    try:
        main()
    except SystemExit:
        raise
    except BaseException as e:  # the JSON line is emitted in EVERY exit path
        RESULT["error"] = repr(e)[:300]
        emit()
        raise
    finally:
        emit()
