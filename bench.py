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
    for name, fn in qs.items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        _force(df)
        timings[name] = round(time.perf_counter() - t0, 4)
    return timings


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
    routed = transcript_pipeline(spark, sf_dir, replicate=replicate)
    _force(routed)
    _force(sink_aggregates(routed))
    _force(tool_histogram(routed))
    return time.perf_counter() - t0, n_turns


def scaling_mode(sf_dir: str, replicate: int) -> None:
    from pyspark.sql import SparkSession

    from ilogtail_spark.session import get_spark

    results = {}
    for cores in (8, 32):
        active = SparkSession.getActiveSession()
        if active is not None:
            active.stop()
        spark = get_spark(f"bench-scaling-{cores}", cores=cores)
        # warm-up run (JIT + shuffle service), then measured run
        flagship_throughput(spark, sf_dir, replicate=max(1, replicate // 10))
        secs, n = flagship_throughput(spark, sf_dir, replicate=replicate)
        results[cores] = {"sec": round(secs, 2), "turns": n,
                          "turns_per_sec": round(n / secs, 1)}
        spark.stop()
    speedup = results[32]["turns_per_sec"] / results[8]["turns_per_sec"]
    eff = speedup / 4.0
    print(json.dumps({
        "mode": "scaling", "replicate": replicate, "sf_dir": sf_dir,
        "local8": results[8], "local32": results[32],
        "speedup_8_to_32": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
        "rule": "throughput scaling efficiency >=0.8 from N to 4N cores",
        "pass": eff >= 0.8,
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--replicate", type=int, default=100)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    if args.scaling:
        scaling_mode(sf_dir, args.replicate)
        return

    from ilogtail_spark.session import get_spark

    timings = run_queries(sf_dir, cores)
    spark = get_spark("bench", cores=cores)
    pipe_sec, n_turns = flagship_throughput(spark, sf_dir, replicate=1)
    timings["flagship_pipeline"] = round(pipe_sec, 4)
    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "end-to-end parse→enrich→route→aggregate + operator suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cores": cores,
        "flagship_turns": n_turns,
        "throughput_turns_per_sec": round(n_turns / pipe_sec, 1),
    }))


if __name__ == "__main__":
    main()
