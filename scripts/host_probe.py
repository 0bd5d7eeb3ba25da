"""Host-capacity probes for the scaling campaign.

The sandbox VM throttles sustained load in multi-minute phases (see
BENCH.md): identical runs vary ~2x wall-clock. Any N-vs-4N efficiency
measured during (or straddling) such a phase is a property of the HOST,
not the engine. These probes make host state observable so the campaign
can (a) stamp every Spark run with the host speed around it and discard
poisoned pairs, and (b) measure the box's intrinsic parallel capacity —
if P pure-compute processes don't scale at 0.8, no Spark job can.

Probes (all subprocess-isolated, BLAS pinned to 1 thread):

* ``calib``   — single-thread fixed-work numpy probe; returns a speed
                score (higher = faster host phase). ~2s.
* ``cpuscale``— P parallel processes each doing fixed CACHE-RESIDENT
                compute (tiny matmuls — negligible DRAM traffic);
                reports aggregate throughput at each P. Scaling loss
                here is raw CPU contention / hypervisor capping.
* ``membw``   — STREAM-style triad (a = b + s*c) over arrays far larger
                than LLC; reports aggregate GB/s at each P. A flat
                aggregate from P=1 to P=8 means one memory controller
                saturates — the single-box resource separate cluster
                nodes would NOT share, and the honest ceiling for any
                shuffle/scan-heavy workload on this host.

Usage: python scripts/host_probe.py [calib|cpuscale|membw|all]
Each prints one JSON line.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

os.environ.setdefault("OMP_NUM_THREADS", "1")
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("MKL_NUM_THREADS", "1")

import numpy as np  # noqa: E402


def calib_score(seconds_budget: float = 1.5) -> float:
    """Fixed-work-per-iteration single-thread score (iterations/sec of a
    128x128 matmul chain — cache-resident, so it tracks CPU speed, not
    DRAM)."""
    rng = np.random.default_rng(0)
    a = rng.random((128, 128))
    b = rng.random((128, 128))
    # warmup
    for _ in range(50):
        a @ b
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds_budget:
        for _ in range(20):
            (a @ b).sum()
        n += 20
    return round(n / (time.perf_counter() - t0), 1)


def _steal_jiffies() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def _cpu_worker(iters: int, barrier, out, idx: int) -> None:
    if os.environ.get("PROBE_PIN", "1") != "0":
        try:
            os.sched_setaffinity(0, {idx})
        except OSError:
            pass
    rng = np.random.default_rng(idx)
    a = rng.random((128, 128))
    b = rng.random((128, 128))
    for _ in range(50):
        a @ b  # warmup
    barrier.wait()  # exclude spawn/import skew: all start together
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(iters):
        s += (a @ b)[0, 0]
    out[idx] = time.perf_counter() - t0


def cpu_scaling(levels: tuple[int, ...] = (1, 2, 8), iters: int = 8000) -> dict:
    """Aggregate fixed-work throughput at each process count. Makespan =
    max worker time measured from a start barrier, so process spawn cost
    is excluded; steal% is sampled across the work window."""
    res = {}
    for p in levels:
        with mp.Manager() as m:
            out = m.dict()
            barrier = m.Barrier(p)
            procs = [
                mp.Process(target=_cpu_worker, args=(iters, barrier, out, i))
                for i in range(p)
            ]
            st0, tot0 = _steal_jiffies()
            for pr in procs:
                pr.start()
            for pr in procs:
                pr.join()
            st1, tot1 = _steal_jiffies()
            times = [out[i] for i in range(p)]
        makespan = max(times)
        res[str(p)] = {
            "makespan_sec": round(makespan, 3),
            "worker_sec_min": round(min(times), 3),
            "aggregate_work_per_sec": round(p * iters / makespan, 1),
            "steal_pct": round(100.0 * (st1 - st0) / max(1, tot1 - tot0), 2),
        }
    base = res[str(levels[0])]["aggregate_work_per_sec"] / levels[0]
    for p in levels:
        per = res[str(p)]["aggregate_work_per_sec"] / p
        res[str(p)]["efficiency_vs_p1"] = round(per / base, 3)
    return res


def _bw_worker(n: int, reps: int, barrier, out, idx: int) -> None:
    b = np.full(n, 1.0)
    c = np.full(n, 2.0)
    a = np.empty(n)
    np.multiply(c, 3.0, out=a)
    a += b  # warmup / fault pages
    barrier.wait()
    # triad moves 3 arrays * 8 bytes per element per rep
    t0 = time.perf_counter()
    for _ in range(reps):
        np.multiply(c, 3.0, out=a)
        a += b
    dt = time.perf_counter() - t0
    out[idx] = (3 * 8 * n * reps) / dt / 1e9


def mem_bandwidth(levels: tuple[int, ...] = (1, 2, 4, 8),
                  mb_per_proc: int = 512, reps: int = 20) -> dict:
    """STREAM-triad aggregate GB/s at each process count (arrays >> LLC)."""
    n = mb_per_proc * 1024 * 1024 // (3 * 8)
    res = {}
    for p in levels:
        with mp.Manager() as m:
            out = m.dict()
            barrier = m.Barrier(p)
            procs = [
                mp.Process(target=_bw_worker, args=(n, reps, barrier, out, i))
                for i in range(p)
            ]
            for pr in procs:
                pr.start()
            for pr in procs:
                pr.join()
            vals = [out[i] for i in range(p)]
        res[str(p)] = {
            "aggregate_gb_s": round(sum(vals), 2),
            "per_proc_gb_s": round(sum(vals) / p, 2),
        }
    return res


def main() -> None:
    what = sys.argv[1] if len(sys.argv) > 1 else "calib"
    if what == "calib":
        print(json.dumps({"calib": calib_score()}))
    elif what == "cpuscale":
        print(json.dumps({"cpuscale": cpu_scaling()}))
    elif what == "membw":
        print(json.dumps({"membw": mem_bandwidth()}))
    elif what == "membw8":
        # quick single-level sample for gating: aggregate GB/s at 8 procs
        print(json.dumps({"membw8": mem_bandwidth(levels=(8,), reps=10)}))
    elif what == "all":
        print(json.dumps({
            "calib": calib_score(),
            "cpuscale": cpu_scaling(),
            "membw": mem_bandwidth(),
        }))
    else:
        raise SystemExit(f"unknown probe {what!r}")


if __name__ == "__main__":
    main()
