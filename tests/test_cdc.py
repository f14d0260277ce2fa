"""cdc_replay — service_canal row-event semantics
(input_canal.go:345-420) replayed into final table state."""

from pyspark.sql import functions as F

from ilogtail_spark.operators.cdc import cdc_replay


def _stream(spark):
    rows = [
        # key a: insert → update → update (survives with last image)
        ("a", 1, "row_insert", "v1", None),
        ("a", 2, "row_update", "v2", "v1"),
        ("a", 3, "row_update", "v3", "v2"),
        # key b: insert → delete (absent)
        ("b", 1, "row_insert", "x1", None),
        ("b", 2, "row_delete", "x1", None),
        # key c: insert → delete → re-insert (survives: binlog replays
        # forward, a later insert revives the key)
        ("c", 1, "row_insert", "y1", None),
        ("c", 2, "row_delete", "y1", None),
        ("c", 3, "row_insert", "y2", None),
        # key d: lone delete (absent — idempotent replay of a delete
        # for a key created before the stream window)
        ("d", 9, "row_delete", "z", None),
    ]
    return spark.createDataFrame(
        rows, "k string, pos int, _event_ string, val string, _old_val string"
    )


def test_cdc_replay_final_state(spark):
    out = cdc_replay(_stream(spark), ["k"], "pos").orderBy("k").collect()
    assert [(r["k"], r["final_event"], r["last_pos"], r["val"]) for r in out] == [
        ("a", "row_update", 3, "v3"),
        ("c", "row_insert", 3, "y2"),
    ]
    # the update's previous image rides along untouched
    assert out[0]["_old_val"] == "v2"


def test_cdc_replay_plan_is_single_partial_agg(spark):
    """Scale shape: ONE exchange (the groupBy) fed by a map-side
    partial_max_by — every executor reduces its slice to one candidate
    per key BEFORE the shuffle, so a hot key's events never funnel.
    No Window (a row_number formulation would shuffle every event and
    sort without combining).  The struct-typed max_by buffer compiles
    to SortAggregate (partition-local key sort), which is fine — the
    combine is what matters at scale."""
    plan = (
        cdc_replay(_stream(spark), ["k"], "pos")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") <= 1, plan
    assert "Window" not in plan, plan
    assert "partial_max_by" in plan, plan


def test_cdc_replay_default_value_cols(spark):
    out = cdc_replay(_stream(spark).drop("_old_val"), ["k"], "pos")
    assert set(out.columns) == {"k", "final_event", "last_pos", "val"}


def test_canal_pack_values(spark):
    """input_canal.go:217-261 PackValues: meta unchanged, _old_* into
    old_data, rest into data — sorted keys, empty map as ''."""
    from ilogtail_spark.operators.cdc import canal_pack_values

    df = spark.createDataFrame(
        [
            ("a", 1, "agent", "row_update", "u1", "t", "old-t"),
            ("b", 2, "agent", "row_insert", "u2", "s", None),
        ],
        "conv_id string, turn_idx int, _db_ string, _event_ string, "
        "role string, text string, _old_text string",
    )
    out = {r["conv_id"]: r for r in
           canal_pack_values(df, keep=["conv_id", "turn_idx"]).collect()}
    assert out["a"]["old_data"] == '{"_old_text":"old-t"}'
    assert out["a"]["data"] == '{"role":"u1","text":"t"}'  # sorted keys
    assert out["b"]["old_data"] == ""  # empty map marshals to '' not '{}'
    assert out["b"]["_db_"] == "agent" and out["b"]["_event_"] == "row_insert"
    assert out["b"]["turn_idx"] == 2
