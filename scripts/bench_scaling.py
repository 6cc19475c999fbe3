#!/usr/bin/env python
"""Two-parallelism scaling evidence (north_rule: throughput scaling
efficiency >= 0.8 between N and 4N executors; sandbox stand-in = pinned
local[N] vs local[4N] on the same input).

Orchestrator mode (default): materializes the pages parquet once, then for
each parallelism level launches a COLD JVM subprocess (worker mode) that
runs 1 warm-up + timed executions of the extraction pipeline.  Each leg is
CPU-PINNED with ``taskset -c 0..cpus-1`` when available: without pinning
the JVM's helper threads (GC, shuffle IO, Arrow sockets) borrow idle host
cores, which makes the small leg faster than a true N-core cluster and
understates T_N — pinning is both the honest stand-in for an N-executor
cluster and what the contract's "two cluster sizes" means.

Honest reporting: the HEADLINE efficiency comes from the unconditional
median over EVERY timed sample of the single session (no window
selection); the trailing-window median (which filters the host's
post-idle throttle decay) is reported alongside as the steady-state view,
never as the headline.

Worker mode: --worker --cpus N --pages PATH --runs K -> one JSON line.
The timed job is scan -> salted dedup repartition -> mapInArrow extract ->
count-only agg (the thinnest action that still executes the full
production extraction); docs count and Python parse CPU come from the
untimed warm-up run which uses the full production agg.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import shutil
import statistics
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def worker(cpus: int, pages_path: str, runs: int) -> None:
    from pyspark.sql import functions as F

    from crystal_html5_spark.sparkjob.extract_job import run_extract
    from crystal_html5_spark.sparkjob.session import get_spark

    import os

    extra = {}
    if os.path.isdir("/dev/shm"):
        # Same rationale as bench.py: the VM's virtio disk has bursty
        # write throttling; the shuffle is RAM-sized.  Real clusters use
        # executor-local NVMe.
        extra["spark.local.dir"] = f"/dev/shm/spark-scale-{cpus}"
    spark = get_spark(f"scale-{cpus}", master=f"local[{cpus}]",
                      shuffle_partitions=cpus, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)

    # Untimed warm-up with the full production agg: warms JVM + Python
    # workers AND yields docs count / parse CPU without burdening the
    # timed runs with the wide agg.
    row = run_extract(spark, pages, num_partitions=4 * cpus).agg(
        F.count("*").alias("n"), F.sum("parse_ms").alias("pms"),
    ).collect()[0]
    n = row["n"]
    parse_cpu_sec = row["pms"] / 1000.0

    def one() -> float:
        t0 = time.perf_counter()
        # 4 tasks per core: stragglers from per-partition byte variance
        # get load-balanced by the scheduler instead of idling cores.
        # Count-only action: the extraction (and its Arrow transfer back
        # to the JVM) runs in full; only the final agg is thinned.
        run_extract(spark, pages, num_partitions=4 * cpus).agg(
            F.count("*")
        ).collect()
        return time.perf_counter() - t0

    times: list[float] = []
    loads: list[float] = []
    # Take `runs` samples, extending (bounded) while the tail still shows
    # the host's post-idle throttle decay.  ALL samples are reported and
    # the orchestrator's headline uses the unconditional median; the
    # trailing window is a disclosed secondary view only.
    max_runs = runs + 3
    while True:
        times.append(one())
        loads.append(float(open("/proc/loadavg").read().split()[0]))
        if len(times) >= runs:
            window = times[-runs:]
            if (max(window) <= 1.35 * min(window)
                    and statistics.median(window) <= 1.4 * min(times)):
                break
            if len(times) >= max_runs:
                break
    window = times[-runs:]
    med_all = statistics.median(times)
    print(json.dumps({
        "cpus": cpus,
        "median_all_sec": med_all,          # unconditional — headline
        "median_window_sec": statistics.median(window),
        "min_sec": min(times),
        "times": times, "window": window, "docs": n,
        "docs_per_sec": n / med_all,
        "parse_cpu_sec": parse_cpu_sec,
        "loadavg_per_run": loads,
    }))
    spark.stop()


def orchestrate(n_pages: int, runs: int, n_level: int = 8) -> None:
    from crystal_html5_spark.sparkjob.pages import pages_parquet
    from crystal_html5_spark.sparkjob.session import get_spark

    spark = get_spark("scale-prep", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    pages_path = pages_parquet(spark, n_pages)
    spark.stop()

    import os

    taskset = shutil.which("taskset")
    host_cpus = os.cpu_count() or 0
    levels = (n_level, 4 * n_level)
    results = {}
    pinned: dict[int, bool] = {}
    for cpus in levels:
        # Quiet-wait (bench.py policy): don't launch a timed leg while
        # the host is still busy with something else.
        waited = 0.0
        while waited < 180:
            load1 = float(open("/proc/loadavg").read().split()[0])
            if load1 < 2.0:
                break
            time.sleep(10)
            waited += 10
        cmd = [sys.executable, __file__, "--worker", "--cpus", str(cpus),
               "--pages", pages_path, "--runs", str(runs)]
        # Pin only when the host genuinely has that many CPUs: Linux
        # silently drops affinity-mask bits beyond the online CPU count,
        # so `taskset -c 0-31` on a 16-core host would "succeed" while
        # the artifact claimed a pinned 4N leg that never existed.
        pinned[cpus] = bool(taskset) and host_cpus >= cpus
        if pinned[cpus]:
            cmd = [taskset, "-c", f"0-{cpus - 1}"] + cmd
        out = subprocess.run(
            cmd, capture_output=True, text=True, check=True, cwd=str(REPO),
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
        results[cpus]["pinned"] = pinned[cpus]
        print(line)

    lo, hi = levels
    ratio = hi / lo

    def eff(key: str) -> float:
        return (results[lo][key] / results[hi][key]) / ratio

    eff_all = eff("median_all_sec")
    eff_window = eff("median_window_sec")
    eff_min = eff("min_sec")
    t_lo = results[lo]["median_all_sec"]
    t_hi = results[hi]["median_all_sec"]
    if all(pinned.values()):
        pin_note = f"each leg CPU-pinned via `taskset -c 0-{{cpus-1}}`"
    elif not taskset:
        pin_note = "taskset unavailable — legs UNPINNED"
    else:
        pin_note = (
            f"host has only {host_cpus} CPUs — legs pinned where "
            f"possible: " + ", ".join(
                f"local[{c}] {'pinned' if p else 'UNPINNED'}"
                for c, p in pinned.items())
        )
    md = f"""# BENCH — N vs 4N scaling (sandbox stand-in: local[{lo}] vs local[{hi}], {pin_note})

Input: {n_pages} deterministic synthetic pages (seed 42), same parquet for
both levels.  Job: scan -> latest-capture dedup -> salted host repartition
-> mapInArrow (tokenize + tree construction + inner_text/main_text) ->
count-only agg.  Cold JVM per level, CPU-pinned so the small leg cannot
borrow idle host cores; 1 untimed warm-up (full production agg: yields
docs + parse CPU) + {runs}+ timed runs.

**Headline numbers are the unconditional median over every timed sample
of this single session — no window or session selection.**  The
trailing-window median (throttle-decay filtered) is disclosed alongside.

| parallelism | median sec (all samples) | window median | min | docs/sec |
| --- | --- | --- | --- | --- |
| local[{lo}]  (N)  | {t_lo:.2f} | {results[lo]['median_window_sec']:.2f} | {results[lo]['min_sec']:.2f} | {results[lo]['docs_per_sec']:.0f} |
| local[{hi}] (4N) | {t_hi:.2f} | {results[hi]['median_window_sec']:.2f} | {results[hi]['min_sec']:.2f} | {results[hi]['docs_per_sec']:.0f} |

Scaling efficiency `(T_N / T_4N) / {ratio:.0f}` = **{eff_all:.2f}**
(unconditional median — the headline), {eff_window:.2f} (window median),
{eff_min:.2f} (min-of-runs).  Target >= 0.8 per BASELINE.json.

Python parse CPU (sum of per-doc parse_ms, from the untimed warm-up):
{results[lo]['parse_cpu_sec']:.1f}s at N cores vs
{results[hi]['parse_cpu_sec']:.1f}s at 4N — the same documents cost more
CPU when all cores are busy, i.e. part of the efficiency gap is hardware
contention, not Spark overhead (raw multiprocessing control in this
file's history: 0.785 efficiency with no Spark at all).

Raw: {json.dumps(results)}
"""
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    baseline = bench_dir / "BASELINE.md"
    # Preserve the hand-maintained history sections (round-over-round,
    # plan probes) across re-runs: everything from the first "## " section
    # following the raw line survives the rewrite.
    tail = ""
    if baseline.exists():
        old = baseline.read_text()
        idx = old.find("\n## ")
        if idx != -1:
            tail = old[idx:]
    baseline.write_text(md + tail)
    print(f"efficiency_all={eff_all:.3f} window={eff_window:.3f} "
          f"min={eff_min:.3f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--pages", type=str, default="")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--n-pages", type=int, default=60000)
    ap.add_argument("--n-level", type=int, default=8)
    args = ap.parse_args()
    if args.worker:
        worker(args.cpus, args.pages, args.runs)
    else:
        orchestrate(args.n_pages, args.runs, args.n_level)
