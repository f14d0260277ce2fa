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
