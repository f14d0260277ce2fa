"""Golden tests for anchor / gotime / encrypt / log_to_metric /
multiline merge registration / inline dict_map — reference-style
inline-rows → transform → exact expected output
(mirrors plugins/processor/*_test.go fixtures)."""

from pyspark.sql import functions as F

from ilogtail_spark.operators import OPERATORS
from ilogtail_spark.operators.transform import (
    anchor,
    decrypt_fields,
    encrypt_fields,
    go_layout_to_spark,
    gotime,
    log_to_metric,
)


def test_anchor_between(spark):
    df = spark.createDataFrame(
        [("a", "x status=200 latency_ms=3 end"), ("b", "no anchors here")],
        ["id", "text"],
    )
    out = anchor(df, "text", "status=", " latency_ms", "st").orderBy("id").collect()
    assert out[0]["st"] == "200"
    assert out[1]["st"] is None


def test_anchor_expand_json(spark):
    df = spark.createDataFrame([("a", 'pre{"k":"v"}post')], ["id", "text"])
    out = anchor(df, "text", "pre", "post", "j", expand_json=True).collect()
    assert out[0]["j"] == {"k": "v"}


def test_go_layout_translation():
    assert go_layout_to_spark("2006-01-02 15:04:05") == "yyyy-MM-dd HH:mm:ss"
    assert go_layout_to_spark("2006/01/02 15") == "yyyy/MM/dd HH"


def test_gotime_reformat(spark):
    df = spark.createDataFrame([("a", "2024-05-06 07:08:09")], ["id", "t"])
    out = gotime(df, "t", "2006-01-02 15:04:05", "d", "2006/01/02 15").collect()
    assert out[0]["d"] == "2024/05/06 07"


def test_encrypt_roundtrip(spark):
    df = spark.createDataFrame([("a", "secret payload")], ["id", "text"])
    enc = encrypt_fields(df, ["text"], secret="0123456789abcdef")
    row = enc.collect()[0]
    assert row["text"] != "secret payload" and row["text"].isupper()  # hex
    dec = decrypt_fields(enc, ["text"], secret="0123456789abcdef").collect()[0]
    assert dec["text"] == "secret payload"


def test_log_to_metric_pivot(spark):
    df = spark.createDataFrame(
        [("c1", 200, 15, "2024-01-01 00:00:00")],
        ["conv_id", "status", "latency_ms", "ts"],
    )
    out = log_to_metric(df, ["conv_id"], ["status", "latency_ms"], "ts")
    rows = {r["__name__"]: r["__value__"] for r in out.collect()}
    assert rows == {"status": 200.0, "latency_ms": 15.0}


def test_registry_has_new_ops():
    for name in (
        "processor_anchor",
        "processor_gotime",
        "processor_encrypt",
        "processor_log_to_sls_metric",
        "processor_dict_map",
        "processor_grok",
        "processor_split_multiline_log_string_native",
        "aggregator_shardhash",
        "aggregator_logstore_router",
        "aggregator_context",
    ):
        assert name in OPERATORS, name


def test_inline_dictmap_factory(spark):
    df = spark.createDataFrame([("a", "user"), ("b", "robot")], ["id", "role"])
    fn = OPERATORS["processor_dict_map"](
        MapDict={"user": "human"}, SourceKey="role", DestKey="role_class"
    )
    out = {r["id"]: r["role_class"] for r in fn(df).collect()}
    assert out == {"a": "human", "b": "Unknown"}


def test_multiline_merge_factory(spark):
    df = spark.createDataFrame(
        [("c1", 0, "START a"), ("c1", 1, "cont b"), ("c1", 2, "START c")],
        ["conv_id", "turn_idx", "text"],
    )
    fn = OPERATORS["processor_split_multiline_log_string_native"](
        SplitRegex=r"^START", order_col="turn_idx", group_cols=["conv_id"]
    )
    rows = {r["turn_idx"]: r["text"] for r in fn(df).collect()}
    assert rows == {0: "START a\ncont b", 2: "START c"}


def test_grok_factory(spark):
    df = spark.createDataFrame([("a", "code=42")], ["id", "text"])
    fn = OPERATORS["processor_grok"](
        Match=["code=%{INT:code:int}"], SourceKey="text"
    )
    assert fn(df).collect()[0]["code"] == 42
