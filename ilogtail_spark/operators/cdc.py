"""CDC row-event replay — the `service_canal` input's semantics.

The reference's canal plugin tails a MySQL binlog and emits one log
per row event (plugins/input/canal/input_canal.go:345-420): meta
fields ``_host_ _db_ _table_ _event_ _id_ _gtid_`` (plus optional
binlog position meta), the row's column values as fields, and — for
updates — the previous image as ``_old_<col>`` fields
(input_canal.go:215,391-406).  ``_event_`` is ``row_insert`` /
``row_update`` / ``row_delete`` (go:349).

The transport is out of scope per the north star (sources are
tables), but the SEMANTICS map to a real Spark operator: replaying an
ordered insert/update/delete stream into the table's final state — an
ordered MERGE/upsert.

Scale shape: ONE aggregation with ``max_by`` — partial aggregation
combines map-side, so each executor reduces its slice of the stream
to one candidate per key before the single shuffle.  Skewed keys are
bounded by the combine: a key's events collapse to one row per input
partition regardless of volume.  (A ``row_number`` window would
shuffle EVERY event and sort with no combine.)  The struct-typed
buffer makes Spark pick SortAggregate — a partition-local key sort,
not a stream-wide one; acceptable, and plan-guarded in
tests/test_cdc.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELETE = "row_delete"

# input_canal.go:210-213 — fields that stay unpacked under PackValues
CANAL_META_FIELDS = [
    "_db_", "_event_", "_gtid_", "_host_", "_id_",
    "_table_", "_filename_", "_offset_", "_event_time_",
    "_event_log_postion_", "_event_size_", "_event_server_id_",
]


def canal_pack_values(
    df: DataFrame,
    keep: Sequence[str] | None = None,
    meta_cols: Sequence[str] | None = None,
) -> DataFrame:
    """``PackValues: true`` (input_canal.go:217-261 addData): meta
    fields pass through unchanged, every ``_old_*`` field marshals
    into ONE ``old_data`` JSON object (prefix kept), every remaining
    field into ``data`` — both with SORTED keys (Go json.Marshal map
    order) and the empty map as ``""`` (not ``{}``, go:248-251).
    ``keep`` carries non-canal columns (ids) through unpacked.
    All codegen ``to_json``; null fields are omitted like Go's absent
    map keys."""
    meta_set = list(meta_cols or CANAL_META_FIELDS)
    keep = list(keep or [])
    meta = [c for c in df.columns if c in meta_set]
    rest = [c for c in df.columns if c not in meta and c not in keep]
    old = sorted(c for c in rest if c.startswith("_old_"))
    new = sorted(c for c in rest if not c.startswith("_old_"))

    def marshal(cols: list[str]):
        if not cols:
            return F.lit("")
        j = F.to_json(F.struct(*[F.col(c).alias(c) for c in cols]))
        all_null = cols and F.lit(True)
        for c in cols:
            all_null = all_null & F.col(c).isNull()
        return F.when(all_null, F.lit("")).otherwise(j)

    return df.select(
        *keep,
        *meta,
        marshal(old).alias("old_data"),
        marshal(new).alias("data"),
    )


def cdc_replay(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    event_col: str = "_event_",
    delete_value: str = DELETE,
    value_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Replay a canal-shaped row-event stream into final table state:
    for every key, the LAST event (by ``order_col`` — binlog position
    / GTID order, which MUST be unique per key for the replay to be
    deterministic) wins; a key whose last event is a delete is absent
    from the output.

    Output: key columns + ``value_cols`` (default: every other column
    except the order/meta) + ``final_event`` + ``last_<order_col>``.
    """
    keys = list(key_cols)
    if value_cols is None:
        skip = set(keys) | {order_col, event_col}
        value_cols = [c for c in df.columns if c not in skip]
    packed = F.struct(
        F.col(event_col).alias("final_event"),
        F.col(order_col).alias(f"last_{order_col}"),
        *[F.col(c) for c in value_cols],
    )
    last = df.groupBy(*keys).agg(
        F.max_by(packed, F.col(order_col)).alias("_last")
    )
    return last.filter(F.col("_last.final_event") != delete_value).select(
        *keys, F.col("_last.*")
    )
