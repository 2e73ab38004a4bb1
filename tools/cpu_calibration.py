"""Same-day hardware scaling ceiling (the honest denominator).

The north rule's two-cluster-size criterion is evidenced on this sandbox by
running the pipeline at local[N] vs local[4N] (BASELINE.md protocol). That
measurement divides by 4 — which silently assumes the MACHINE can scale 4x.
This VM cannot always: it is a shared-tenant box whose effective per-core
throughput under load varies run to run (measured 0.6-1.1x day to day at
1->4 processes, ±23% single-core variance within minutes).

This probe measures what ANY 4x-parallelism job can achieve right now:
single-threaded NumPy kernels (BLAS threading pinned to 1) in 1 vs 4
independent processes, aggregate reps/sec, efficiency = (tp4/tp1)/4.
bench_scaling.py runs it before and after the Spark measurement and records
the ceiling in BENCH_SCALING.json so the pipeline's raw efficiency can be
read against the hardware's same-day ceiling instead of an assumed 1.0.

Usage: python tools/cpu_calibration.py [--pairs 1,4 2,8] [--secs 6]
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time


def _work(q, secs: float) -> None:
    os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    import numpy as np

    x = np.random.default_rng(0).standard_normal(2_000_000)
    t0 = time.time()
    reps = 0
    while time.time() - t0 < secs:
        y = np.log1p(np.abs(x)) * 1.0001 + np.sqrt(np.abs(x))
        x = y - y.mean()
        reps += 1
    q.put(reps)


def throughput(nprocs: int, secs: float = 6.0) -> float:
    """Aggregate reps/sec of ``nprocs`` independent single-threaded
    kernels (spawned processes — no GIL, no shared state)."""
    q: mp.Queue = mp.Queue()
    ps = [mp.Process(target=_work, args=(q, secs)) for _ in range(nprocs)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    return sum(q.get() for _ in ps) / secs


def measure(pairs=((1, 4),), secs: float = 6.0, trials: int = 2) -> dict:
    """{'1->4': {'eff': .., 'tp_lo': .., 'tp_hi': ..}, ...} — per pair the
    efficiency implied by the BEST throughput at each level over
    ``trials`` (the ceiling is the machine's best case; transient
    neighbor load only ever lowers each side's throughput).

    Selecting the best whole TRIAL by max efficiency — the pre-round-5
    aggregation — is wrong on a bursty box: a trial whose lo-side probe
    landed in a neighbor stall has inflated efficiency, so max-eff
    selection PREFERS corrupted trials (observed: eff 2.8-3.2 when a
    6-second stall crushed tp_lo to a third of its clean value).
    Maxing each side independently discards stalls on both sides; a
    ceiling above 1.0 is still physically impossible (turbo headroom at
    1 proc can push slightly past parity, never past ~1.1), so the
    result is capped at 1.0 and the uncapped value kept for audit."""
    out = {}
    for lo, hi in pairs:
        tps_lo, tps_hi = [], []
        for _ in range(trials):
            tps_lo.append(throughput(lo, secs))
            tps_hi.append(throughput(hi, secs))
        t_lo, t_hi = max(tps_lo), max(tps_hi)
        eff = (t_hi / t_lo) / (hi / lo)
        out[f"{lo}->{hi}"] = {
            "eff": round(min(eff, 1.0), 3), "eff_uncapped": round(eff, 3),
            "tp_lo": round(t_lo, 1), "tp_hi": round(t_hi, 1),
            "tp_lo_trials": [round(t, 1) for t in tps_lo],
            "tp_hi_trials": [round(t, 1) for t in tps_hi]}
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pairs", nargs="*", default=["1,4"],
                    help="proc-count pairs, e.g. 1,4 2,8")
    ap.add_argument("--secs", type=float, default=6.0)
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args()
    pairs = [tuple(map(int, p.split(","))) for p in args.pairs]
    print(json.dumps(measure(pairs, args.secs, args.trials)))
    return 0


if __name__ == "__main__":
    main()
