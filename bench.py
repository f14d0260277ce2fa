#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling-efficiency evidence).

Default mode — driver contract:
    python bench.py
runs every implemented query from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32) and prints ONE JSON line::

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1,
     "throughput_turns_per_sec": N, ...}

Execution is forced with a ``noop``-format write (full plan runs on
executors, nothing funnels to the driver), mirroring the reference's
flusher_blackhole benchmark sink
(core/plugin/flusher/blackhole/FlusherBlackHole.cpp:23,
test/benchmark/.../performance_file_to_blackhole_loongcollectorspl/case.feature:1-13).

Scaling mode — BASELINE.json north-rule evidence:
    python bench.py --scaling [--replicate 100]
runs the IDENTICAL flagship parse→enrich→route→aggregate job over the
same (replicated) input at local[8] then local[32] cores — the
sandbox stand-in for N vs 4N executors — and prints throughput at
both plus scaling efficiency = (T8/T32)/4.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _force(df) -> int:
    """Execute the full plan executor-side; return row count cheaply.

    noop write materializes every row (no driver collect); the count
    reuses the cached plan only for reporting, not timing.
    """
    df.write.format("noop").mode("overwrite").save()
    return -1


def run_queries(sf_dir: str, cores: int) -> dict:
    from ilogtail_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark("bench", cores=cores)
    qs = entry.queries()
    timings: dict[str, float] = {}
    # warm the JVM + parquet footers once so q01 isn't charged for JIT
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).count()
    first_pass: dict[str, float] = {}
    # shared host with ~4x tail noise (BASELINE.md): every query runs
    # twice and the MIN is reported — uniformly, so no per-query
    # sampling asymmetry biases round-over-round comparisons. Both
    # passes are recorded ("queries" = best, "queries_first" = pass 1).
    for name, fn in qs.items():
        t0 = time.perf_counter()
        _force(fn(spark, sf_dir))
        e1 = time.perf_counter() - t0
        t1 = time.perf_counter()
        _force(fn(spark, sf_dir))
        e2 = time.perf_counter() - t1
        first_pass[name] = round(e1, 4)
        timings[name] = round(min(e1, e2), 4)
    return timings, first_pass


def flagship_throughput(spark, sf_dir: str, replicate: int) -> tuple[float, int]:
    """End-to-end parse→enrich→route→aggregate wall time + turn count."""
    from ilogtail_spark.plans.pipeline import (
        sink_aggregates,
        tool_histogram,
        transcript_pipeline,
    )
    from ilogtail_spark.sources.transcripts import derive_transcripts

    n_turns = derive_transcripts(spark, sf_dir, replicate=replicate).count()
    t0 = time.perf_counter()
    routed = transcript_pipeline(spark, sf_dir, replicate=replicate).persist()
    try:
        _force(routed)
        _force(sink_aggregates(routed))
        _force(tool_histogram(routed))
    finally:
        routed.unpersist()
    return time.perf_counter() - t0, n_turns


def scaling_mode(sf_dir: str, replicate: int, n_low: int, runs: int) -> None:
    """N vs 4N cores on the identical job/input. Reports the MEDIAN of
    ``runs`` measured passes per core count: this sandbox is a shared
    host with 4× run-to-run tail variance, and a single pass measures
    the neighbours as much as the job."""
    import statistics

    from pyspark.sql import SparkSession

    from ilogtail_spark.session import get_spark

    results = {}
    for cores in (n_low, 4 * n_low):
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        spark = get_spark(f"bench-scaling-{cores}", cores=cores)
        # warm-up (JIT + codegen), then measured passes
        flagship_throughput(spark, sf_dir, replicate=max(1, replicate // 10))
        secs, n = [], 0
        for _ in range(max(1, runs)):
            s, n = flagship_throughput(spark, sf_dir, replicate=replicate)
            secs.append(s)
        med = statistics.median(secs)
        results[cores] = {
            "sec_median": round(med, 2),
            "sec_all": [round(s, 2) for s in secs],
            "turns": n,
            "turns_per_sec": round(n / med, 1),
        }
        spark.stop()
    speedup = results[4 * n_low]["turns_per_sec"] / results[n_low]["turns_per_sec"]
    eff = speedup / 4.0
    print(json.dumps({
        "mode": "scaling", "replicate": replicate, "sf_dir": sf_dir,
        f"local{n_low}": results[n_low],
        f"local{4 * n_low}": results[4 * n_low],
        "speedup_N_to_4N": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "rule": "throughput scaling efficiency >=0.8 from N to 4N cores",
        "pass": eff >= 0.8,
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--replicate", type=int, default=100)
    ap.add_argument("--n-low", type=int, default=4,
                    help="N for the N-vs-4N pair (default 4 -> local[4] vs local[16])")
    ap.add_argument("--runs", type=int, default=3,
                    help="measured passes per core count; median reported")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    if args.scaling:
        scaling_mode(sf_dir, args.replicate, args.n_low, args.runs)
        return

    from ilogtail_spark.session import get_spark

    timings, first_pass = run_queries(sf_dir, cores)
    spark = get_spark("bench", cores=cores)
    pipe_sec, n_turns = flagship_throughput(spark, sf_dir, replicate=1)
    timings["flagship_pipeline"] = round(pipe_sec, 4)
    total = round(sum(timings.values()), 4)
    result = {
        "metric": "end-to-end parse→enrich→route→aggregate + operator suite wall time (min-of-2 per query)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_first_pass": first_pass,
        "sf": sf,
        "cores": cores,
        "flagship_turns": n_turns,
        "throughput_turns_per_sec": round(n_turns / pipe_sec, 1),
    }
    # sf0.1 bench also reports sustained throughput at 20M turns —
    # the replicate=1 run is overhead-dominated at 100k rows
    if abs(sf - 0.1) < 1e-9:
        try:
            big_sec, big_n = flagship_throughput(spark, sf_dir, replicate=200)
            result["throughput_turns_per_sec_at_20M"] = round(big_n / big_sec, 1)
            result["flagship_20M_sec"] = round(big_sec, 2)
        except Exception:
            pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
