"""Sink converter goldens (pkg/protocol/converter).

The influx expectations replay the reference's own
influxdb_metric_test.go:38-66 rows; the single/flatten layouts mirror
custom_single_log.go / converter_single_log_flatten.go map marshaling
(sorted keys, tag conversion table, source/topic tags).
"""

from pyspark.sql import functions as F

from ilogtail_spark.sinks.serialize import (
    serialize_influx,
    serialize_jsonline,
    serialize_single,
)


def test_influx_reference_rows(spark):
    # (name, labels, value, time_nano, field) -> expected line, per
    # influxdb_metric_test.go "metric:field" cases
    df = spark.createDataFrame(
        [
            ("metric:field", "", 1.0, None, "field"),
            ("metric:field", "aa#$#bb", 1.0, None, "field"),
            ("metric:field", "", 1.0, 1667615389000000000, "field"),
            ("cpu", "host#$#a b,c", 0.5, 10, ""),
        ],
        "__name__ string, __labels__ string, __value__ double, "
        "__time_nano__ long, __field__ string",
    )
    out = serialize_influx(df, field_col="__field__")
    lines = [r["__line__"] for r in out.collect()]
    assert lines[0] == "metric field=1"
    assert lines[1] == "metric,aa=bb field=1"
    assert lines[2] == "metric field=1 1667615389000000000"
    # default field name + tag value escaping (space and comma)
    assert lines[3] == "cpu,host=a\\ b\\,c value=0.5 10"


def test_single_and_flatten_layout(spark):
    df = spark.createDataFrame(
        [("u1", "say \"hi\"", "2024-01-01 00:00:05", "/var/log/a.log")],
        "role string, text string, ts string, __path__ string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = serialize_single(
        df, ["role", "text", "__path__"], time_col="ts",
        tags={"env": "prod"}, source="10.0.0.1", topic="top",
    )
    line = out.collect()[0]["__line__"]
    # envelope keys sorted contents<tags<time; __path__ moved to the
    # log.file.path tag (converter.go tagConversionMap); json escaping
    assert line == (
        '{"contents":{"role":"u1","text":"say \\"hi\\""},'
        '"tags":{"env":"prod","host.ip":"10.0.0.1",'
        '"log.file.path":"/var/log/a.log","log.topic":"top"},'
        '"time":1704067205}'
    )
    fl = serialize_jsonline(
        df, ["role", "text", "__path__"], time_col="ts",
        tags={"env": "prod"}, source="10.0.0.1", topic="top",
    ).collect()[0]["__line__"]
    assert fl == (
        '{"env":"prod","host.ip":"10.0.0.1","log.file.path":"/var/log/a.log",'
        '"log.topic":"top","role":"u1","text":"say \\"hi\\"",'
        '"time":1704067205}'
    )
    only = serialize_jsonline(
        df, ["role"], time_col="ts", only_contents=True,
    ).collect()[0]["__line__"]
    assert only == '{"role":"u1","time":1704067205}'


def test_registry_protocols(spark):
    from ilogtail_spark.operators.registry import OPERATORS

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00")], "k string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    fac = OPERATORS["flusher_stdout_serializer"]
    assert (
        fac(Protocol="jsonline", ContentCols=["k"])(df)
        .collect()[0]["__line__"]
        .startswith('{"host.ip"')
    )
    assert fac(Protocol="custom_single", ContentCols=["k"])(df).collect()[0][
        "__line__"
    ].startswith('{"contents":{"k":"a"}')


def test_otlp_logs_encoding(spark):
    from ilogtail_spark.sinks.serialize import serialize_otlp_logs

    df = spark.createDataFrame(
        [("hello", "WARN", "bash", "2024-01-01 00:00:01")],
        "content string, level string, tool string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    line = serialize_otlp_logs(
        df, ["content", "level", "tool"], source="1.2.3.4", topic="t",
    ).collect()[0]["__line__"]
    # otlp.go:43-103 layout: resource attrs source/topic; contents
    # minus content/level + tags as record attrs; body/severity pulled
    assert line == (
        '{"resource":{"attributes":['
        '{"key":"source","value":{"stringValue":"1.2.3.4"}},'
        '{"key":"topic","value":{"stringValue":"t"}}]},'
        '"scopeLogs":[{"logRecords":[{"timeUnixNano":"1704067201000000000",'
        '"severityText":"WARN","body":{"stringValue":"hello"},'
        '"attributes":[{"key":"host.ip","value":{"stringValue":"1.2.3.4"}},'
        '{"key":"log.topic","value":{"stringValue":"t"}},'
        '{"key":"tool","value":{"stringValue":"bash"}}]}]}]}'
    )


def test_influx_null_value_defaults_to_zero(spark):
    """value2Float semantics (influxdb_metric.go:60-66): an absent /
    unparseable value serializes as 0 — a NULL must not null-propagate
    through concat and silently drop the whole line."""
    from ilogtail_spark.sinks.serialize import serialize_influx

    df = spark.createDataFrame(
        [("m1", "", None, "123"), (None, "", 2.0, "")],
        "__name__ string, __labels__ string, __value__ double, __time_nano__ string",
    )
    lines = [r["__line__"] for r in serialize_influx(df).collect()]
    assert lines[0] == "m1 value=0 123"
    assert lines[1] == " value=2"
