"""E2E verification DSL — the reference's third test tier.

The reference drives Gherkin scenarios (test/e2e/test_cases/*/
case.feature) whose Then-steps dispatch to verifier functions
(test/engine/steps.go:102-111 → test/engine/verify/*.go).  Each
function here mirrors ONE verifier's semantics over a DataFrame of
logs instead of a gRPC subscriber's LogGroup stream:

  ==========================  =================================
  log_count_at_least          count.go LogCountAtLeast
  log_fields_match            log_field.go:32  LogField
  log_field_kv                log_field.go:81  LogFieldKV
  log_tag_kv                  log_tag.go       TagKV
  log_context_valid           log_context.go   LogContext
  log_order_valid             log_order.go:31  LogOrder
  ==========================  =================================

Representation: one row per log; ``contents`` is a
``map<string,string>`` (the protocol.Log Contents KV list — SLS
contents are last-wins keyed), ``tags`` the LogGroup-level LogTags
map, ``__pack_id__`` the aggregator lineage tag.

Every verifier is a SINGLE Spark aggregate job (flags folded into
violation counts — no driver-side row loops, so the same check runs
unchanged over a 100 TB sink table) and raises ``AssertionError``
with the reference's error-message shape on the first failure class.
Go's ``regexp.MatchString`` is an UNANCHORED search, exactly
``rlike``'s contract; the feature files' patterns stay inside the
Go↔Java common dialect (no lookbehind), per the repo invariant.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _violations(df: DataFrame, flags: Mapping[str, Column]) -> dict[str, int]:
    """Fold named violation flags into counts in ONE aggregate job."""
    row = df.agg(
        *[
            F.count(F.when(c, F.lit(1))).alias(name)
            for name, c in flags.items()
        ]
    ).first()
    return row.asDict()


def log_count_at_least(df: DataFrame, expect: int) -> int:
    """count.go LogCountAtLeast (steps.go:102,
    'there is at least {n} logs')."""
    got = df.count()
    assert got >= expect, f"log count not match, expect at least {expect}, got {got}"
    return got


def log_fields_match(
    df: DataFrame, fields: Sequence[str], contents_col: str = "contents"
) -> None:
    """log_field.go:32 LogField (steps.go:111, 'the log fields match as
    below' + YAML list): EVERY log must carry EVERY listed key."""
    bad = _violations(
        df,
        {
            field: ~F.map_contains_key(F.col(contents_col), F.lit(field))
            for field in fields
        },
    )
    for field, n in bad.items():
        assert n == 0, f"want contains field {field}, but not found ({n} logs)"


def _kv_check(df: DataFrame, kv: Mapping[str, str], col: str) -> None:
    # log_field.go:120-131: the key must be PRESENT and its value must
    # match (unanchored search); a missing key is itself a failure.
    flags = {}
    for k, pattern in kv.items():
        v = F.element_at(F.col(col), F.lit(k))
        flags[k] = v.isNull() | ~v.rlike(pattern)
    bad = _violations(df, flags)
    for k, n in bad.items():
        assert n == 0, f"want contains KV {k}:{kv[k]}, but not found/matched ({n} logs)"


def log_field_kv(
    df: DataFrame, kv: Mapping[str, str], contents_col: str = "contents"
) -> None:
    """log_field.go:81 LogFieldKV (steps.go:104, 'the log fields match
    kv' + YAML map of key → Go regex)."""
    _kv_check(df, kv, contents_col)


def log_tag_kv(
    df: DataFrame, kv: Mapping[str, str], tags_col: str = "tags"
) -> None:
    """log_tag.go TagKV (steps.go:105, 'the log tags match kv') —
    same contract over the LogGroup-level tag map."""
    _kv_check(df, kv, tags_col)


def log_context_valid(
    df: DataFrame,
    order_col: str,
    pack_col: str = "__pack_id__",
    contents_col: str = "contents",
) -> None:
    """log_context.go LogContext (steps.go:110, 'the context of log is
    valid'): split ``__pack_id__`` as ``<prefix>-<hex seq>``; per
    prefix the pack sequence must run 1,2,3,… in arrival order, the
    per-log ``no`` content must run 1,2,3,… ACROSS packs of the same
    prefix (log_context.go:111-136 carries logSeq over pack
    boundaries), and the ``content`` value must be constant for the
    prefix.  ``order_col`` is the arrival order the Go verifier gets
    implicitly from the subscriber stream."""
    prefix = F.substring_index(F.col(pack_col), "-", 1)
    seq_hex = F.substring_index(F.col(pack_col), "-", -1)
    seq = F.conv(seq_hex, 16, 10).cast("long")
    x = df.select(
        prefix.alias("_prefix"),
        seq.alias("_seq"),
        F.element_at(F.col(contents_col), F.lit("no")).cast("long").alias("_no"),
        F.element_at(F.col(contents_col), F.lit("content")).alias("_content"),
        F.col(order_col).alias("_ord"),
        F.col(pack_col).alias("_pack"),
    )
    w = Window.partitionBy("_prefix").orderBy("_ord")
    # pack index in ARRIVAL order (the Go verifier walks the stream
    # carrying expected seq): running count of pack-id changes — packs
    # arriving out of order (seq 2 before 1) or re-appearing after an
    # interleave now fail, as log_context.go:111-136 would
    new_pack = F.when(
        F.lag("_pack").over(w).isNull()
        | (F.lag("_pack").over(w) != F.col("_pack")),
        1,
    ).otherwise(0)
    x = x.withColumn("_rn", F.row_number().over(w)).withColumn(
        "_dr", F.sum(new_pack).over(w)
    ).withColumn("_c0", F.first("_content").over(w))
    # a malformed pack id (no '-', non-hex seq) nulls _seq → flagged
    bad = _violations(
        x,
        {
            "pack_id_shape": F.col("_seq").isNull()
            | ~F.col("_pack").contains("-"),
            "pack_seq": F.col("_dr") != F.col("_seq"),
            "log_seq": F.col("_no").isNull() | (F.col("_no") != F.col("_rn")),
            "content_constant": ~F.col("_content").eqNullSafe(F.col("_c0")),
        },
    )
    assert bad["pack_id_shape"] == 0, f"pack id not valid ({bad['pack_id_shape']} logs)"
    assert bad["pack_seq"] == 0, (
        f"pack sequence broken for some prefix ({bad['pack_seq']} logs)"
    )
    assert bad["log_seq"] == 0, f"log sequence 'no' broken ({bad['log_seq']} logs)"
    assert bad["content_constant"] == 0, (
        f"content differs within a prefix ({bad['content_constant']} logs)"
    )
    # log_context.go:63-68: an empty stream is itself a failure
    assert x.limit(1).count() == 1, "no log group"


def log_order_valid(
    df: DataFrame,
    order_col: str,
    group_cols: Sequence[str] = ("__pack_id__",),
    time_col: str = "time",
    contents_col: str = "contents",
    no_key: str = "logNo",
) -> None:
    """log_order.go:31 LogOrder, exact: walking each group in arrival
    order, a row is CHECKED iff its timestamp strictly increases from
    the immediately previous row (go:66-74); a checked row with a
    parseable ``logNo`` must advance the last-tracked number by exactly
    1, where the tracked number updates ONLY at the group's first row
    (go:62-64, parse failure contributes 0 there) and at checked rows
    whose logNo parsed (skipped rows leave it untouched, go:80-91)."""
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    no = F.element_at(F.col(contents_col), F.lit(no_key)).cast("long")
    x = df.select(
        F.col(time_col).alias("_t"), no.alias("_no"), *group_cols, order_col
    )
    x = x.withColumn("_rn", F.row_number().over(w))
    checked = (F.col("_rn") > 1) & (F.col("_t") > F.lag("_t").over(w))
    x = x.withColumn("_checked", checked)
    tracked = F.when(
        F.col("_rn") == 1, F.coalesce(F.col("_no"), F.lit(0))
    ).when(F.col("_checked") & F.col("_no").isNotNull(), F.col("_no"))
    x = x.withColumn(
        "_base",
        F.last(tracked, ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    bad = _violations(
        x,
        {
            "order": F.col("_checked")
            & F.col("_no").isNotNull()
            & (F.col("_no") != F.col("_base") + 1)
        },
    )
    assert bad["order"] == 0, (
        f"log order is not correct ({bad['order']} out-of-order steps)"
    )


def kafka_partitions_at_least(
    df: DataFrame, n: int, contents_col: str = "contents"
) -> None:
    """kafka_partition.go PartitionsAtLeast ('the kafka partitions at
    least {n}'): the subscriber saw >= n distinct partitions."""
    p = F.element_at(F.col(contents_col), F.lit("partition"))
    # a missing 'partition' key is NULL — it must not count as a
    # distinct partition (the check would pass spuriously)
    got = df.select(p.alias("_p")).filter(F.col("_p").isNotNull()) \
        .distinct().count()
    assert got >= n, f"want at least {n} kafka partitions, got {got}"


def kafka_partitions_consistent_by_field(
    df: DataFrame, field: str, contents_col: str = "contents"
) -> None:
    """kafka_partition.go ConsistentByField ('the kafka partitions
    consistent by field {f}'): every distinct field value lands on
    exactly ONE partition — the hash partitioner's contract."""
    c = F.col(contents_col)
    row = (
        df.groupBy(F.element_at(c, F.lit(field)).alias("_f"))
        .agg(F.countDistinct(F.element_at(c, F.lit("partition"))).alias("_n"))
        .agg(F.max("_n"))
        .first()
    )
    assert (row[0] or 0) <= 1, (
        f"field {field} spread across {row[0]} partitions"
    )


def log_labels_match(
    df: DataFrame, labels: Sequence[str], contents_col: str = "contents"
) -> None:
    """log_label.go:32 LogLabel (steps.go, 'the log labels match as
    below' + YAML list): for every log carrying ``__labels__``, the
    ``|``-joined label string must have EXACTLY len(labels) parts,
    every part shaped ``key#$#value``, and every expected key present.
    One aggregate job, same as the other verifiers."""
    lbl = F.element_at(F.col(contents_col), F.lit("__labels__"))
    parts = F.split(lbl, r"\|")
    keys = F.transform(parts, lambda p: F.substring_index(p, "#$#", 1))
    has = lbl.isNotNull()
    flags = {
        "label_count": has & (F.size(parts) != len(labels)),
        "label_shape": has
        & F.exists(parts, lambda p: ~p.contains("#$#")),
    }
    for name in labels:
        flags[f"key_{name}"] = has & ~F.array_contains(keys, name)
    bad = _violations(df, flags)
    assert bad["label_count"] == 0, (
        f"want label num {len(labels)}, bug got different "
        f"({bad['label_count']} logs)"
    )
    assert bad["label_shape"] == 0, (
        f"want metric pattern key#$#value ({bad['label_shape']} logs)"
    )
    for name in labels:
        assert bad[f"key_{name}"] == 0, (
            f"want metric label keys: {list(labels)}, but not found: {name}"
        )
