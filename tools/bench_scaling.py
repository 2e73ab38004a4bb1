"""Two-cluster-size scaling evidence (BASELINE.md measurement protocol).

The north rule requires throughput at N and 4N executors with scaling
efficiency >= 0.8. No real cluster exists in this sandbox, so this runs the
SAME end-to-end pipeline (bags -> WMH -> bands -> candidate passes -> cc ->
clusters) on the SAME pre-generated corpus at two local parallelism levels
(local[N] and local[4N], N from --cores) in separate JVMs, and reports
throughput at both plus efficiency = (tp@4N / tpN) / 4 on stdout and in
BENCH_SCALING.json.

The machine itself throttles above ~8 busy cores (all-core frequency /
memory-bandwidth ceiling ~0.70-0.71 per the calibration table in
BASELINE.md), so the evidence pair is --cores 1,4 where the hardware ceiling
is ~1.0 and the measurement isolates the pipeline's own scaling. Run on an
otherwise idle machine: concurrent load corrupts both sides.

Per-run weather validity (added after the round-6 attempt-4 failure, where
a host stall hit 2 of 3 local[4] runs mid-flight and the median landed on a
stalled run): every measurement run is BRACKETED by cpu_calibration probes,
and a run counts as valid only if both bracketing probes pass the same
floors the bench watcher uses (window eff >= 0.55 AND tp_lo >= 35 reps/s).
Validity is decided purely from the weather probes, never from the run's
own timing — discarding runs for being slow would be cherry-picking;
discarding runs taken inside an independently-measured stall is the
established discarded-reading convention applied per-run instead of
per-attempt. Medians are computed over valid runs only; invalidated runs
are replaced by bounded extra rounds (--max-extra); if either level ends
with < 2 valid runs the reading is marked insufficient and is NOT
installed as BENCH_SCALING.json (side file in /tmp instead). All raw runs
+ their bracketing probe readings stay in the JSON for audit. Residual
risk: a stall fully contained between two clean probes slips through —
but probe brackets are now per-run (~2-7 min apart), not per-attempt
(~53 min apart), which is what made attempt 4 unadjudicable in-band.

Usage: python tools/bench_scaling.py --rows 480000 --runs 3 --cores 1,4 --no-pin
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def gen_corpus(rows: int, seed: int) -> str:
    """Distributed generation once (multi-file parquet so both runs read
    identical, splittable input)."""
    path = f"/tmp/apollo_scale_corpus/images_n{rows}_s{seed}"
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from apollo_spark import synth
    from apollo_spark.session import get_spark
    spark = get_spark("scale-corpus-gen", cores=32)
    spark.sparkContext.setLogLevel("ERROR")
    synth.images_df(spark, rows, seed).write.mode("overwrite").parquet(path)
    spark.stop()
    return path


def run_once(images: str, cores: int, seed: int, pin: bool = True) -> dict:
    """Run the pipeline at local[cores]. With pin=True the entire process
    tree (JVM task threads + GC/shuffle service threads + Python workers)
    is pinned to exactly ``cores`` CPUs via taskset — an honest stand-in
    for an N-core executor. Unpinned local[N] understates N's cost: the
    JVM's service threads and the Python workers overflow onto the
    machine's idle cores and inflate small-N throughput."""
    out_dir = tempfile.mkdtemp(prefix=f"apollo-scale-c{cores}-")
    try:
        env = dict(os.environ)
        env.pop("SPARK_GRAFT_CPUS", None)
        cmd = [sys.executable, "-m", "apollo_spark.pipeline",
               "--images", images, "--out", out_dir,
               "--cores", str(cores), "--seed", str(seed)]
        if pin and shutil.which("taskset"):
            cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
        proc = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO, env=env,
            timeout=3600)
        if proc.returncode != 0:
            raise RuntimeError(f"pipeline failed at cores={cores}:\n"
                               f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")
        return json.loads(proc.stdout.strip().splitlines()[-1])
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=60000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--cores", default="8,32")
    ap.add_argument("--no-pin", action="store_true")
    ap.add_argument("--warmup", type=int, default=1,
                    help="discarded warm-up runs per level (page cache, "
                         "JIT, CPU frequency state)")
    ap.add_argument("--max-extra", type=int, default=2,
                    help="replacement rounds per level for runs that were "
                         "invalidated by their bracketing weather probes")
    ap.add_argument("--probe-floor", type=float, default=0.55,
                    help="min bracketing-probe window eff for a run to "
                         "count as valid. 0.55 (the bench watcher's floor) "
                         "only rejects catastrophic stalls; gate-quality "
                         "scaling retakes should pass 0.75, because a "
                         "0.6-ceiling window caps raw 1->4 efficiency near "
                         "0.6 and a 'valid' run taken there reads "
                         "systematically low rather than noisy")
    args = ap.parse_args()
    lo, hi = (int(c) for c in args.cores.split(","))
    key = f"{lo}->{hi}"

    images = gen_corpus(args.rows, args.seed)
    print(f"corpus: {images} ({args.rows} rows)", file=sys.stderr)

    # same-day hardware ceiling probes: this VM is a shared-tenant box
    # whose achievable 1->4 scaling varies (measured 0.03-1.1). One probe
    # runs between EVERY measurement run so each run is bracketed; the
    # first/last double as hw_ceiling_before/after for ceiling-relative
    # efficiency.
    from cpu_calibration import measure as hw_measure

    def probe() -> dict:
        p = hw_measure(pairs=((lo, hi),))[key]
        print(f"probe: eff {p['eff']} tp_lo {p['tp_lo']}", file=sys.stderr)
        return p

    def probe_ok(p: dict) -> bool:
        # window floor per --probe-floor; tp_lo >= 35 guards the
        # stall-crushed-lo spurious-1.0 artifact
        return p["eff"] >= args.probe_floor and p["tp_lo"] >= 35

    results: dict[int, list[dict]] = {lo: [], hi: []}
    for w in range(args.warmup):  # one warm-up per level (page cache, JIT)
        for cores in (lo, hi):
            res = run_once(images, cores, args.seed, pin=not args.no_pin)
            print(f"warmup {w + 1}/{args.warmup} cores={cores}: "
                  f"{res['wall_sec']}s (discarded)", file=sys.stderr)

    hw_before = probe()
    last_probe = hw_before

    def do_run(cores: int, tag: str) -> None:
        nonlocal last_probe
        before = last_probe
        res = run_once(images, cores, args.seed, pin=not args.no_pin)
        after = probe()
        last_probe = after
        res["probe_before"] = {"eff": before["eff"], "tp_lo": before["tp_lo"]}
        res["probe_after"] = {"eff": after["eff"], "tp_lo": after["tp_lo"]}
        res["valid"] = probe_ok(before) and probe_ok(after)
        results[cores].append(res)
        print(f"{tag} cores={cores}: {res['wall_sec']}s "
              f"{res['images_per_sec']} img/s "
              f"[{'VALID' if res['valid'] else 'INVALID weather'}]",
              file=sys.stderr)

    # INTERLEAVED measurement runs: machine-state drift (neighbor load,
    # frequency caps) hits both levels equally instead of biasing the
    # level that happened to run in the bad phase
    for r in range(args.runs):
        for cores in (lo, hi):
            do_run(cores, f"run {r + 1}/{args.runs}")
    # bounded replacement rounds for weather-invalidated runs
    # deficiency target is max(args.runs, 2): sufficiency below requires
    # >= 2 valid runs per level, so with --runs 1 the extra-round
    # mechanism must still be able to reach it (ADVICE r6). Replacement
    # rounds run BOTH levels even when only one is deficient, preserving
    # the interleaving invariant (drift hits both levels equally); only
    # the valid runs feed the medians either way (ADVICE r6).
    target = max(args.runs, 2)
    for x in range(args.max_extra):
        deficient = [c for c in (lo, hi)
                     if sum(1 for v in results[c] if v["valid"]) < target]
        if not deficient:
            break
        for cores in (lo, hi):
            do_run(cores, f"extra {x + 1}/{args.max_extra}")
    hw_after = last_probe

    valid = {c: [v for v in results[c] if v["valid"]] for c in (lo, hi)}
    sufficient = all(len(valid[c]) >= 2 for c in (lo, hi))
    use = valid if sufficient else results  # raw fallback, marked below
    tp = {c: statistics.median(x["images_per_sec"] for x in use[c])
          for c in (lo, hi)}
    wall = {c: statistics.median(x["wall_sec"] for x in use[c])
            for c in (lo, hi)}
    eff = (tp[hi] / tp[lo]) / (hi / lo)
    hw_eff = max(hw_before["eff"], hw_after["eff"])
    report = {
        "rows": args.rows, "scheduled_runs": args.runs,
        "median_over_runs": {f"local{c}": len(use[c]) for c in (lo, hi)},
        f"throughput_local{lo}_img_per_sec": tp[lo],
        f"throughput_local{hi}_img_per_sec": tp[hi],
        f"wall_local{lo}_sec": wall[lo], f"wall_local{hi}_sec": wall[hi],
        "scaling_factor": round(tp[hi] / tp[lo], 3),
        "scaling_efficiency": round(eff, 3),
        "hw_ceiling_before": hw_before,
        "hw_ceiling_after": hw_after,
        "efficiency_vs_hw_ceiling": round(eff / hw_eff, 3),
        "passes_north_rule": sufficient and (eff >= 0.8
                                             or eff / hw_eff >= 0.8),
        "valid_runs": {f"local{c}": len(valid[c]) for c in (lo, hi)},
        "sufficient_valid_runs": sufficient,
        "probe_floor": args.probe_floor,
        "all_runs": {f"local{c}": [
            {"wall_sec": x["wall_sec"],
             "images_per_sec": x["images_per_sec"],
             "probe_before": x["probe_before"],
             "probe_after": x["probe_after"], "valid": x["valid"]}
            for x in results[c]] for c in (lo, hi)},
        f"timings_local{lo}": (valid[lo] or results[lo])[-1]["timings"],
        f"timings_local{hi}": (valid[hi] or results[hi])[-1]["timings"],
    }
    print(json.dumps(report))
    # only a weather-sufficient reading may replace the canonical in-repo
    # JSON; an insufficient one goes to /tmp for the discarded-reading log
    if sufficient:
        out = os.path.join(REPO, "BENCH_SCALING.json")
    else:
        out = "/tmp/BENCH_SCALING_insufficient.json"
        print(f"insufficient valid runs -> {out}", file=sys.stderr)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    # nonzero exit on insufficiency (ADVICE r6): a watcher keying on the
    # exit code can no longer mistake a pre-existing sufficient JSON for
    # this attempt's result
    return 0 if sufficient else 3


if __name__ == "__main__":
    sys.exit(main())
