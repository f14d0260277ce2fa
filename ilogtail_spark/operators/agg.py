"""Aggregations — grouping, sharding, skew-defusing salted two-phase agg.

Reference analogues (SURVEY.md §2.6):
  * aggregator_content_value_group — groupBy field values
    (aggregator_content_value_group.go:34-44,203);
  * aggregator_shardhash — xxhash sharding with salted buckets for
    hot keys (aggregator_shardhash.go:67-87,157-189);
  * per-sink counters — PluginMetrics.cpp:27-122.

Scale notes: plain ``groupBy(conv_id)`` on a table where ONE
conversation holds ~30% of rows sends ~30% of the data to a single
reducer — the straggler that kills a 1000-executor job. The salted
two-phase agg bounds any single reducer's share at hot_share/salt_n.
Spark's AQE auto-splits skewed JOIN partitions but NOT skewed
groupBy hot keys, so this helper is genuinely custom work (SURVEY §4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shard_partition(
    df: DataFrame,
    keys: Sequence[str],
    num_shards: int = 32,
    salt_n: int = 1,
    shard_col: str | None = "__shardhash__",
) -> DataFrame:
    """aggregator_shardhash (aggregator_shardhash.go:157-189):
    xxhash(key-join) % shard_count routing, with optional salt for hot
    keys. Emits the bucket id as ``shard_col`` (the reference writes
    the bucket md5 as a ``__shardhash__`` tag) and repartitions on it.
    """
    h = F.xxhash64(*[F.col(k) for k in keys])
    if salt_n > 1:
        h = F.xxhash64(h, (F.monotonically_increasing_id() % salt_n))
    bucket = F.pmod(h, F.lit(num_shards))
    out = df.withColumn("_bucket", bucket)
    out = out.repartition(num_shards, F.col("_bucket"))
    if shard_col:
        out = out.withColumn(shard_col, F.md5(F.col("_bucket").cast("string")))
    return out.drop("_bucket")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_n: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation for hot-key groupBy skew.

    aggs: out_name -> (agg_fn, col) where agg_fn ∈ {count, sum, min,
    max}. Phase 1 groups by (keys…, salt) — map-side partial
    aggregation already shrinks each partition, and the shuffle
    spreads a hot key over ``salt_n`` reducers. Phase 2 re-groups by
    the true keys over at most |distinct keys| × salt_n rows (tiny).

    The result is EXACTLY groupBy(keys).agg(...) — associative
    re-aggregation: count→sum, sum→sum, min→min, max→max. avg is
    expressible as sum+count at the call site.

    salt_source: deterministic salt column expression source; default
    uses a cheap per-row hash of all columns' first key + a row id —
    we use pmod(xxhash64(rand-free monotonically_increasing_id), n)
    for determinism within a run (salt values never surface in the
    result, only the spread matters).
    """
    if not aggs:
        raise ValueError("aggs must be non-empty")
    salt: Column
    if salt_source is not None:
        salt = F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt_n))
    else:
        salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_n))

    phase1_exprs = []
    phase2_exprs = []
    for out_name, (fn, col) in aggs.items():
        tmp = f"_p1_{out_name}"
        if fn == "count":
            phase1_exprs.append(F.count(F.lit(1)).alias(tmp))
            phase2_exprs.append(F.sum(tmp).alias(out_name))
        elif fn == "count_nonnull":
            phase1_exprs.append(F.count(F.col(col)).alias(tmp))
            phase2_exprs.append(F.sum(tmp).alias(out_name))
        elif fn == "sum":
            phase1_exprs.append(F.sum(F.col(col)).alias(tmp))
            phase2_exprs.append(F.sum(tmp).alias(out_name))
        elif fn == "min":
            phase1_exprs.append(F.min(F.col(col)).alias(tmp))
            phase2_exprs.append(F.min(tmp).alias(out_name))
        elif fn == "max":
            phase1_exprs.append(F.max(F.col(col)).alias(tmp))
            phase2_exprs.append(F.max(tmp).alias(out_name))
        else:
            raise ValueError(f"non-associative agg {fn}; decompose it first")

    partial = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*phase1_exprs)
    return partial.groupBy(*keys).agg(*phase2_exprs)


def content_value_group(
    df: DataFrame, keys: Sequence[str], aggs: list[Column] | None = None
) -> DataFrame:
    """aggregator_content_value_group: one group per distinct combo of
    GroupKeys. Default output = per-group event counts."""
    return df.groupBy(*keys).agg(*(aggs or [F.count(F.lit(1)).alias("n_events")]))


def window_histogram(
    df: DataFrame,
    ts_col: str = "ts",
    granularity: str = "hour",
    keys: Sequence[str] = (),
    count_alias: str = "n_events",
) -> DataFrame:
    """Per-key event histogram over time buckets — the per-sink
    "per-tool event histograms over ts windows" aggregate. date_trunc
    keeps the bucket a plain timestamp (oracle-friendly), equivalent
    to window(ts, '1 hour').start."""
    bucket = F.date_trunc(granularity, F.col(ts_col)).alias("bucket")
    return df.groupBy(bucket, *keys).agg(F.count(F.lit(1)).alias(count_alias))


def metadata_group(
    df: DataFrame,
    keys: Sequence[str],
    max_events: int = 1024,
    max_bytes: int = 3 * 1024 * 1024,
    size_col: str | None = None,
    order_col: str | None = None,
    pack_col: str = "__pack_id__",
) -> DataFrame:
    """aggregator_metadata_group
    (aggregator_metadata_group.go:28-36,62-110): group events by
    metadata keys; a group flushes a pack whenever it holds
    maxEventsLength events or maxEventsByteLength bytes.

    Batch rendering: every row gets a ``__pack_id__`` =
    md5(keys)-chunk, where chunk = event_chunk + byte_chunk (their
    SUM, both monotone over the row order): within one pack the byte
    part is constant so the event part alone advances every
    ``max_events`` rows — the event bound holds EXACTLY — and the
    event part is constant over any byte overrun, so a pack spans at
    most ``max_bytes`` plus one event of running bytes. (A
    ``greatest()`` combination instead lets one oversized event race
    the byte counter ahead and absorb unbounded rows into the pack it
    lands on.) Byte chunking uses a global running sum rather than
    reset-on-flush. One window over (keys) — metadata keys are coarse
    (host/source tags), so no hot-key salting is needed here; the
    per-pack payload is what the caps bound.
    """
    from pyspark.sql import Window

    if order_col is None:
        # monotonically_increasing_id() is nondeterministic across runs
        # and task retries — pack assignment would be unstable
        raise ValueError(
            "metadata_group: order_col is required (pack chunking must "
            "be deterministic across retries)"
        )
    w = Window.partitionBy(*keys).orderBy(F.col(order_col))
    rn = F.row_number().over(w)
    chunk = F.floor((rn - 1) / F.lit(max_events))
    if size_col is not None:
        cum_before = F.coalesce(
            F.sum(F.octet_length(F.col(size_col))).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
        chunk = chunk + F.floor(cum_before / F.lit(max_bytes))
    return df.withColumn(
        pack_col,
        F.concat_ws(
            "-",
            F.md5(F.concat_ws("\x1f", *[F.col(k) for k in keys])),
            chunk.cast("string"),
        ),
    )


def sessionize(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based session windows (the timeout-session analogue of
    Spark's F.session_window, in the lag+prefix-sum closed form both
    engines can mirror): a new session opens when the gap to the
    previous event of the same keys exceeds ``gap_seconds``. Output:
    one row per session with start/end/n_events.

    One shuffle on the keys; the prefix sums stream O(1)-memory.
    Same hot-key caveat as any per-key ordering.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(ts_col)
    prev = F.lag(F.col(ts_col)).over(w)
    new_sess = (
        prev.isNull()
        | (F.unix_micros(F.col(ts_col).cast("timestamp"))
           - F.unix_micros(prev.cast("timestamp"))
           > gap_seconds * 1_000_000)
    )
    sess = df.withColumn("_sess", F.sum(new_sess.cast("int")).over(w))
    return (
        sess.groupBy(*keys, "_sess")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .withColumn("session_idx", (F.col("_sess") - 1).cast("int"))
        .drop("_sess")
    )


def hypertable_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    keys: Sequence[str] = (),
    value_col: str | None = None,
    granularities: Sequence[str] = ("minute", "hour", "day"),
) -> DataFrame:
    """Hypertable-style continuous aggregate: multi-granularity
    rollups where each COARSER level re-aggregates the previous
    level's partials instead of re-reading raw rows — the
    count→sum / sum→sum associativity that makes a day rollup over
    100 TB read minute partials (×~10⁴ smaller), exactly how
    timeseries stores maintain hierarchical continuous aggregates.

    Output: one row per (granularity, bucket, keys…) with n_events
    and sum_<value_col>; the finest level shuffles raw data once,
    every other level shuffles only partials.
    """
    aggs_first = [F.count(F.lit(1)).alias("n_events")]
    aggs_next = [F.sum("n_events").alias("n_events")]
    if value_col:
        aggs_first.append(F.sum(F.col(value_col)).alias(f"sum_{value_col}"))
        aggs_next.append(F.sum(f"sum_{value_col}").alias(f"sum_{value_col}"))

    levels = []
    cur = df.groupBy(
        F.date_trunc(granularities[0], F.col(ts_col)).alias("bucket"), *keys
    ).agg(*aggs_first)
    # materialize each level: union branches do NOT share subplans, so
    # without this the day level would silently re-aggregate raw rows
    # three times — the opposite of the hierarchical-partials contract
    # (in a deployed continuous aggregate each level is its own table)
    cur = cur.localCheckpoint(eager=True)
    levels.append(cur.withColumn("granularity", F.lit(granularities[0])))
    for g in granularities[1:]:
        cur = cur.groupBy(
            F.date_trunc(g, F.col("bucket")).alias("bucket"), *keys
        ).agg(*aggs_next).localCheckpoint(eager=True)
        levels.append(cur.withColumn("granularity", F.lit(g)))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def pack_id(df: DataFrame, pack_col: str = "__pack_id__") -> DataFrame:
    """aggregator_base __pack_id__ (aggregator_base.go:93-139):
    prefix+sequence lineage id ≈ (partition id, per-partition seq)."""
    return df.withColumn(
        pack_col,
        F.concat_ws(
            "-",
            F.spark_partition_id().cast("string"),
            F.monotonically_increasing_id().cast("string"),
        ),
    )


def context_pack_id(
    df: DataFrame,
    group_cols: Sequence[str] = ("conv_id",),
    order_col: str = "turn_idx",
    max_events: int = 1024,
    pack_col: str = "__pack_id__",
) -> DataFrame:
    """aggregator_context pack lineage in the reference's wire shape
    (aggregator_base.go:93-145 via util.NewLogTagForPackID,
    pkg/util/util.go:371-384): each source's logs pack into groups of
    ``max_events`` arrival-ordered events and every log carries
    ``__pack_id__ = <PREFIX>-<SEQ>`` — PREFIX an uppercase-hex hash of
    the source identity (the reference uses fnv64a(config+ip+now); we
    hash the group key deterministically so retries re-derive the same
    id) and SEQ the per-source 1-based pack sequence in UPPERCASE HEX.
    This is exactly the shape test/engine/verify/log_context.go:87-127
    validates (split on '-', ParseInt(seq, 16), seq starts at 1).
    One window per source stream — same partitioning context_order
    already imposes, so the two compose without an extra shuffle."""
    w = Window.partitionBy(*group_cols).orderBy(F.col(order_col))
    seq = F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(max_events)) + 1
    prefix = F.upper(
        F.substring(F.md5(F.concat_ws("\x1f", *[F.col(c) for c in group_cols])), 1, 16)
    )
    return df.withColumn(
        pack_col, F.concat_ws("-", prefix, F.hex(seq.cast("long")))
    )


def context_order(
    df: DataFrame, group_cols: Sequence[str] = ("conv_id",), order_col: str = "turn_idx"
) -> DataFrame:
    """aggregator_context (aggregator_context.go:38-57,286): preserve
    per-source order — repartition by source, sort within partitions
    on the order key. This is the stable (conv_id, turn_idx) ordering
    the north star's per-turn text equality is checked under."""
    return df.repartition(*[F.col(c) for c in group_cols]).sortWithinPartitions(
        *group_cols, order_col
    )


from ilogtail_spark.operators.registry import register  # noqa: E402


@register("aggregator_shardhash")
def _shard_factory(**cfg):
    return lambda df: shard_partition(
        df,
        keys=cfg.get("SourceKeys", cfg.get("keys")),
        num_shards=cfg.get("ShardCount", cfg.get("num_shards", 32)),
        salt_n=cfg.get("salt_n", 1),
    )


@register("aggregator_content_value_group")
def _cvg_factory(**cfg):
    return lambda df: content_value_group(df, keys=cfg.get("GroupKeys", cfg.get("keys")))


@register("aggregator_metadata_group")
def _mdg_factory(**cfg):
    keys = cfg.get("GroupMetadataKeys", cfg.get("keys"))
    return lambda df: metadata_group(
        df,
        keys,
        max_events=int(cfg.get("GroupMaxEventLength", cfg.get("max_events", 1024))),
        max_bytes=int(
            cfg.get("GroupMaxByteLength", cfg.get("max_bytes", 3 * 1024 * 1024))
        ),
        size_col=cfg.get("size_col"),
        # the Go plugin has no order concept (packs form in arrival
        # order); deterministic chunking needs SOME total order, so
        # default to turn_idx like aggregator_context — a frame without
        # it fails analysis with the column named, and a config can
        # always override with order_col
        order_col=cfg.get("order_col", "turn_idx"),
    )


@register("aggregator_base")
@register("aggregator_default")
def _pack_factory(**cfg):
    return lambda df: pack_id(df)


@register("aggregator_context")
def _ctx_factory(**cfg):
    return lambda df: context_order(
        df,
        group_cols=cfg.get("group_cols", ("conv_id",)),
        order_col=cfg.get("order_col", "turn_idx"),
    )
