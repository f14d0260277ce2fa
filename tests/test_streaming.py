"""Streaming variant: same operators under foreachBatch; result must
equal the batch pipeline (exactly-once into an idempotent sink)."""

from pyspark.sql import functions as F

from ilogtail_spark.plans.pipeline import transcript_pipeline
from ilogtail_spark.sources.transcripts import derive_transcripts
from ilogtail_spark.streaming.job import (
    build_streaming_query,
    streaming_transcripts,
    windowed_stream_agg,
)


def test_streaming_matches_batch(spark, sf_dir, tmp_path):
    src_dir = str(tmp_path / "stream_src")
    derive_transcripts(spark, sf_dir).repartition(6).write.parquet(src_dir)

    collected = []

    def sink(df, epoch_id):
        collected.extend(
            df.select("__sink__", "conv_id", "turn_idx", "text").collect()
        )

    stream = streaming_transcripts(spark, src_dir, max_files_per_trigger=2)
    q = build_streaming_query(
        stream, spark, sink, checkpoint_dir=str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)

    batch = transcript_pipeline(spark, sf_dir)
    got = {(r["__sink__"], r["conv_id"], r["turn_idx"], r["text"]) for r in collected}
    exp = {
        (r["__sink__"], r["conv_id"], r["turn_idx"], r["text"])
        for r in batch.select("__sink__", "conv_id", "turn_idx", "text").collect()
    }
    assert got == exp
    assert len(collected) == batch.count()


def test_windowed_stream_agg(spark, sf_dir, tmp_path):
    src_dir = str(tmp_path / "agg_src")
    derive_transcripts(spark, sf_dir).write.parquet(src_dir)
    stream = streaming_transcripts(spark, src_dir)
    agg = windowed_stream_agg(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("wagg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["bucket"].isoformat(), r["tool"]): r["n_events"]
        for r in spark.sql("SELECT * FROM wagg").collect()
    }
    exp = {
        (r["bucket"].isoformat(), r["tool"]): r["n_events"]
        for r in derive_transcripts(spark, sf_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("bucket"), "tool")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    }
    assert got == exp


def test_stateful_rate_limit_across_microbatches(spark, sf_dir, tmp_path):
    """The consumed-token state must persist across micro-batches:
    with 6 input files at 2 per trigger (3 micro-batches), each role
    keeps at most `limit` rows over the WHOLE stream."""
    from ilogtail_spark.streaming.job import stateful_rate_limit

    src_dir = str(tmp_path / "rl_src")
    derive_transcripts(spark, sf_dir).repartition(6).write.parquet(src_dir)

    limit = 40
    stream = streaming_transcripts(spark, src_dir, max_files_per_trigger=2)
    limited = stateful_rate_limit(stream, ["role"], limit_per_key=limit)
    q = (
        limited.writeStream.format("memory")
        .queryName("rl_out")
        .option("checkpointLocation", str(tmp_path / "rl_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["role"]: r["n"]
        for r in spark.sql("select role, count(*) n from rl_out group by role").collect()
    }
    totals = {
        r["role"]: r["n"]
        for r in derive_transcripts(spark, sf_dir)
        .groupBy("role")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == {role: min(limit, n) for role, n in totals.items()}


def test_late_data_policy_explicit_filter(spark, tmp_path):
    """§2.10 late-data policy. Spark's watermark only *bounds state*
    — an entirely-late window is already final and MAY still be
    emitted (observed: it is). The reference's strict drop
    (processor_timestamp_filter_native) therefore maps to an explicit
    event-time filter ahead of the windowed agg; this pins both
    behaviors so a Spark upgrade changing either gets noticed."""
    import glob
    import os
    import time as _t

    from ilogtail_spark.operators.filters import filter_timestamp

    src = str(tmp_path / "wm_src")
    os.makedirs(src)
    schema = (
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts_s string"
    )
    fresh = spark.createDataFrame(
        [("c1", 0, "user", "x", "bash", "2024-01-10 10:00:00"),
         ("c1", 1, "user", "x", "bash", "2024-01-10 11:30:00")], schema,
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    late = spark.createDataFrame(
        [("c2", 0, "user", "x", "bash", "2024-01-01 00:00:00")], schema,
    ).withColumn("ts", F.col("ts_s").cast("timestamp")).drop("ts_s")
    fresh.coalesce(1).write.mode("append").parquet(src)
    late.coalesce(1).write.mode("append").parquet(src)
    parts = glob.glob(os.path.join(src, "part-*"))
    now = _t.time()
    fresh_part = max(parts, key=os.path.getsize)  # fresh file has 2 rows
    for p in parts:
        os.utime(p, (now - 120, now - 120) if p == fresh_part else (now, now))

    stream = streaming_transcripts(spark, src, max_files_per_trigger=1)
    filtered = filter_timestamp(stream, begin="2024-01-05 00:00:00")
    # 0s delay: append mode only emits windows ENDING below the
    # watermark; any positive delay would leave the 10:00 window
    # unfinalized (wm = max event 11:30 - delay < window end 11:00)
    agg = windowed_stream_agg(filtered, watermark="0 seconds", window="1 hour")
    q = (
        agg.writeStream.format("memory").queryName("wm_out")
        .option("checkpointLocation", str(tmp_path / "wm_ck"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    buckets = {str(r["bucket"]) for r in spark.sql("select bucket from wm_out").collect()}
    assert not any(b.startswith("2024-01-01") for b in buckets), buckets
    assert any(b.startswith("2024-01-10") for b in buckets), buckets
    # watermark advanced past batch 0 (state-cleanup evidence)
    wm = q.recentProgress[-1]["eventTime"].get("watermark", "")
    assert wm.startswith("2024-01-10")


def test_stateful_multiline_merge_across_microbatches(spark, tmp_path):
    """The open merge group must persist across micro-batches: a
    group started in batch 1 keeps absorbing continuation lines in
    batch 2 and flushes when the next Start arrives."""
    import os
    import time

    from ilogtail_spark.streaming.job import stateful_multiline_merge

    src_dir = str(tmp_path / "ml_src")
    schema = "conv_id string, turn_idx int, text string"
    batch1 = [("c1", 0, "junk"), ("c1", 1, "START a"), ("c1", 2, "cont b")]
    batch2 = [("c1", 3, "cont c"), ("c1", 4, "START d"), ("c1", 5, "cont e")]
    spark.createDataFrame(batch1, schema).coalesce(1).write.mode("append").parquet(src_dir)
    time.sleep(1.1)  # distinct mod times → deterministic file order
    spark.createDataFrame(batch2, schema).coalesce(1).write.mode("append").parquet(src_dir)
    # make the second file strictly newer for the source's ordering
    parts = sorted(
        (os.path.getmtime(os.path.join(src_dir, f)), f)
        for f in os.listdir(src_dir)
        if f.endswith(".parquet")
    )
    assert len(parts) == 2

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(src_dir)
    )
    merged = stateful_multiline_merge(
        stream, source="text", order_col="turn_idx", key_cols=["conv_id"],
        start_pattern=r"^START",
    )
    q = (
        merged.writeStream.format("memory")
        .queryName("ml_out")
        .option("checkpointLocation", str(tmp_path / "ml_ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["turn_idx"], r["text"])
        for r in spark.sql("select * from ml_out").collect()
    }
    # 'START a' absorbed cont b (batch 1) AND cont c (batch 2) —
    # state crossed the micro-batch boundary — and flushed at START d;
    # 'START d' + 'cont e' stays open (no timeout configured), like
    # the reference's unflushed tail; the pre-start junk line is a
    # SINGLE_LINE unmatched event.
    assert got == {(0, "junk"), (1, "START a\ncont b\ncont c")}


def test_session_stream_agg_matches_batch_sessions(spark, tmp_path):
    """Native session_window sessions equal the batch lag+prefix-sum
    sessionize on gap-unambiguous data (no gap equals the boundary
    exactly), with state merged across events."""
    import datetime as dt

    from ilogtail_spark.operators.agg import sessionize
    from ilogtail_spark.streaming.job import session_stream_agg

    base = dt.datetime(2024, 1, 1)
    rows = []
    for conv, offs in {
        "c1": [0, 60, 120, 4000, 4060],       # two sessions
        "c2": [0, 30, 7200],                  # two sessions
    }.items():
        rows += [(conv, base + dt.timedelta(seconds=o)) for o in offs]
    src_dir = str(tmp_path / "sess_src")
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp")
    df.coalesce(1).write.parquet(src_dir)

    stream = (
        spark.readStream.schema("conv_id string, ts timestamp")
        .parquet(src_dir)
    )
    agg = session_stream_agg(stream, ["conv_id"], gap="30 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("sess_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["conv_id"], r["session_start"].isoformat()): r["n_events"]
        for r in spark.sql("SELECT * FROM sess_agg").collect()
    }
    exp = {
        (r["conv_id"], r["session_start"].isoformat()): r["n_events"]
        for r in sessionize(df, ["conv_id"], gap_seconds=1800).collect()
    }
    assert got == exp
    assert len(got) == 4


def test_yaml_config_streaming_matches_batch(spark, sf_dir, tmp_path):
    """A YAML collection config runs UNCHANGED as a streaming job
    (foreachBatch) and emits exactly the batch chain's rows."""
    from ilogtail_spark.plans.pipeline import pipeline_from_yaml
    from ilogtail_spark.streaming.job import (
        build_streaming_query_from_config,
        streaming_transcripts,
    )

    yaml_text = r"""
enable: true
processors:
  - Type: processor_regex
    SourceKey: text
    Regex: 'tool=(\w+) status=(\d+) '
    Keys: [tool_call, status]
  - Type: processor_filter_regex
    Include:
      status: '5\d\d'
"""
    src_dir = str(tmp_path / "yaml_stream_src")
    derive_transcripts(spark, sf_dir).repartition(4).write.parquet(src_dir)

    collected = []

    def sink(df, epoch_id):
        collected.extend(
            df.select("conv_id", "turn_idx", "tool_call", "status").collect()
        )

    stream = streaming_transcripts(spark, src_dir, max_files_per_trigger=2)
    q = build_streaming_query_from_config(
        stream, yaml_text, sink, checkpoint_dir=str(tmp_path / "yaml_ckpt")
    ).start()
    q.awaitTermination(120)

    transform, _ = pipeline_from_yaml(yaml_text)
    exp = {
        (r["conv_id"], r["turn_idx"], r["tool_call"], r["status"])
        for r in transform(derive_transcripts(spark, sf_dir))
        .select("conv_id", "turn_idx", "tool_call", "status")
        .collect()
    }
    got = {
        (r["conv_id"], r["turn_idx"], r["tool_call"], r["status"])
        for r in collected
    }
    assert got == exp and len(collected) == len(exp)


def test_streaming_exact_dedup_across_microbatches(spark, tmp_path):
    """Planted duplicate texts land in DIFFERENT source files (hence
    different microbatches with maxFilesPerTrigger=1); the state store
    must still drop them — one survivor per distinct text."""
    import datetime

    from ilogtail_spark.streaming.job import streaming_exact_dedup

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    for f in range(3):
        for i in range(10):
            # texts repeat across files: t0..t9 in every file
            rows.append((f"c{f}", i, "user", f"t{i}", "search",
                         t0 + datetime.timedelta(seconds=f * 60 + i)))
    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    src = str(tmp_path / "dedup_src")
    df = spark.createDataFrame(rows, schema)
    # one file per source batch
    for f in range(3):
        df.filter(F.col("conv_id") == f"c{f}").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_exact_dedup(stream, key_cols=("text",), watermark="1 hour")
    collected = []
    q = (
        out.writeStream.foreachBatch(
            lambda batch, _eid: collected.extend(
                batch.select("conv_id", "text").collect()
            )
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_dedup"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    texts = [r["text"] for r in collected]
    assert sorted(texts) == sorted({f"t{i}" for i in range(10)})
    # exactly one survivor per text, all from ONE file's batch (file
    # PROCESSING order is mtime-based with arbitrary tie-break, so
    # don't pin WHICH file won — only that later duplicates dropped)
    assert len({r["conv_id"] for r in collected}) == 1
