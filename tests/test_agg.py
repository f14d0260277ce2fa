from pyspark.sql import functions as F

from ilogtail_spark.operators.agg import (
    content_value_group,
    salted_agg,
    shard_partition,
    window_histogram,
)


def _skewed(spark):
    # one hot key holding 60% of rows — the shardhash scenario
    rows = [("hot", i, float(i)) for i in range(60)] + [
        (f"k{i}", i, float(i)) for i in range(40)
    ]
    return spark.createDataFrame(rows, "key string, v int, d double")


def test_salted_agg_matches_plain_groupby(spark):
    df = _skewed(spark)
    plain = {
        (r["key"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in df.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("d").alias("s"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["key"]): (r["n"], r["s"], r["mn"], r["mx"])
        for r in salted_agg(
            df,
            ["key"],
            {"n": ("count", "*"), "s": ("sum", "d"), "mn": ("min", "v"), "mx": ("max", "v")},
            salt_n=8,
        ).collect()
    }
    assert plain == salted


def test_salted_agg_spreads_hot_key(spark):
    df = _skewed(spark)
    partial = (
        df.withColumn(
            "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8))
        )
        .groupBy("key", "_salt")
        .count()
    )
    hot_parts = partial.filter(F.col("key") == "hot").count()
    assert hot_parts > 1  # hot key split across salt buckets


def test_shard_partition(spark):
    df = _skewed(spark)
    out = shard_partition(df, ["key"], num_shards=4)
    assert out.rdd.getNumPartitions() == 4
    assert "__shardhash__" in out.columns
    # same key always lands in the same shard
    shards = out.select("key", F.spark_partition_id().alias("p")).distinct()
    per_key = shards.groupBy("key").count().filter(F.col("count") > 1)
    assert per_key.count() == 0


def test_content_value_group(spark):
    df = _skewed(spark)
    out = {r["key"]: r["n_events"] for r in content_value_group(df, ["key"]).collect()}
    assert out["hot"] == 60 and out["k0"] == 1


def test_window_histogram(spark):
    df = spark.createDataFrame(
        [("2024-01-01 10:05:00", "bash"), ("2024-01-01 10:55:00", "bash"), ("2024-01-01 11:05:00", "read")],
        "t string, tool string",
    ).withColumn("ts", F.col("t").cast("timestamp"))
    out = {
        (r["bucket"].isoformat(), r["tool"]): r["n_events"]
        for r in window_histogram(df, keys=["tool"]).collect()
    }
    assert out[("2024-01-01T10:00:00", "bash")] == 2
    assert out[("2024-01-01T11:00:00", "read")] == 1


def test_metadata_group_caps(spark):
    """aggregator_metadata_group: packs bounded by max_events and
    (to within one event) max_bytes."""
    from pyspark.sql import functions as F

    from ilogtail_spark.operators.agg import metadata_group

    rows = [("h1", i, "x" * 100) for i in range(25)] + [("h2", i, "y" * 100) for i in range(3)]
    df = spark.createDataFrame(rows, "host string, seq int, payload string")
    out = metadata_group(
        df, ["host"], max_events=10, max_bytes=100_000, order_col="seq"
    )
    sizes = {
        (r["host"], r["__pack_id__"]): r["n"]
        for r in out.groupBy("host", "__pack_id__").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    h1 = sorted(v for (h, _), v in sizes.items() if h == "h1")
    assert h1 == [5, 10, 10]  # 25 events → 10+10+5
    assert sorted(v for (h, _), v in sizes.items() if h == "h2") == [3]

    # bytes cap: 100-byte payloads, max 350 bytes → packs of <=4 events
    out2 = metadata_group(
        df.filter("host='h1'"), ["host"], max_events=1000, max_bytes=350,
        size_col="payload", order_col="seq",
    )
    counts = [
        r["n"] for r in out2.groupBy("__pack_id__").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert max(counts) <= 4


def test_metadata_group_registry(spark):
    from ilogtail_spark.operators.registry import OPERATORS

    df = spark.createDataFrame([("a", 1), ("a", 2), ("b", 3)], "k string, v int")
    fn = OPERATORS["aggregator_metadata_group"](
        GroupMetadataKeys=["k"], GroupMaxEventLength=1, order_col="v"
    )
    out = fn(df)
    assert out.select("__pack_id__").distinct().count() == 3


def test_sessionize_gap_semantics(spark):
    from ilogtail_spark.operators.agg import sessionize

    rows = [
        ("c1", "2024-01-01 10:00:00"),
        ("c1", "2024-01-01 10:10:00"),   # 10 min gap -> same session
        ("c1", "2024-01-01 11:00:00"),   # 50 min gap -> new session
        ("c2", "2024-01-01 10:05:00"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, ts_s string").withColumn(
        "ts", F.to_timestamp("ts_s")
    )
    out = sessionize(df, ["conv_id"], gap_seconds=1800).orderBy(
        "conv_id", "session_idx"
    ).collect()
    assert [(r["conv_id"], r["session_idx"], r["n_events"]) for r in out] == [
        ("c1", 0, 2), ("c1", 1, 1), ("c2", 0, 1)
    ]
    assert out[0]["session_end"].isoformat() == "2024-01-01T10:10:00"


def test_metadata_group_oversized_event_keeps_event_cap(spark):
    """Review regression: one oversized event must not let a later
    pack absorb more than max_events rows (greatest() chunking did;
    the SUM formulation keeps the event bound exact)."""
    from ilogtail_spark.operators.agg import metadata_group

    rows = [("h", 0, "x" * 1000)] + [("h", i, "y") for i in range(1, 30)]
    df = spark.createDataFrame(rows, "host string, seq int, payload string")
    out = metadata_group(
        df, ["host"], max_events=2, max_bytes=100, size_col="payload",
        order_col="seq",
    )
    counts = [
        r["n"]
        for r in out.groupBy("__pack_id__").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert max(counts) <= 2
