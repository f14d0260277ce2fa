"""Regression tests for the round-3 review findings (parse-chain
semantics vs the Go plugins)."""

from pyspark.sql import functions as F

from ilogtail_spark.operators.parse import (
    PARSE_OK_KEY,
    ParserOptions,
    parse_json_expanded,
    parse_regex,
)


def test_stash_keeps_raw_on_failure(spark):
    # SourceKey also in Keys: a FAILED parse keeps the raw value in
    # the source field (Go shouldKeepSource with
    # KeepSourceIfParseError=true), not NULL
    df = spark.createDataFrame([("garbage",), ("hit=7",)], "content string")
    out = parse_regex(df, r"hit=(\d+)", ["content"], source="content")
    got = {r[PARSE_OK_KEY]: r["content"] for r in out.collect()}
    assert got[False] == "garbage"
    assert got[True] == "7"


def test_json_merge_with_null_attrs(spark):
    # an earlier stage left attrs NULL for this row — the parsed keys
    # must still land (map_entries(NULL) must not poison the merge)
    df = spark.createDataFrame(
        [('{"a":"1"}', None)],
        "content string, attrs map<string,string>",
    )
    out = parse_json_expanded(df, source="content", ignore_first_connector=True)
    row = out.collect()[0]
    assert row[PARSE_OK_KEY] is True
    assert dict(row["attrs"]) == {"a": "1"}


def test_accelerate_full_match_is_absolute(spark):
    # '(?m)' + trailing '$' must not accept a prefix-only match of the
    # multi-line block (C++ regex_match is whole-buffer)
    from ilogtail_spark.plans.pipeline import build_pipeline

    t = build_pipeline([{
        "type": "processor_regex_accelerate",
        "SourceKey": "content",
        "Regex": r"# Time: (\S+)$",
        "Keys": ["t"],
    }])
    df = spark.createDataFrame(
        [("# Time: 2024-01-01\nSELECT garbage",)], "content string"
    )
    row = t(df).collect()[0]
    assert row[PARSE_OK_KEY] is False and row["t"] is None


def test_go_json_keep_source_default_true(spark):
    # processor_json.go init: KeepSource defaults TRUE
    from ilogtail_spark.plans.pipeline import build_pipeline

    t = build_pipeline([{"type": "processor_json", "SourceKey": "content",
                         "ExpandDepth": 0, "IgnoreFirstConnector": True}])
    row = t(spark.createDataFrame([('{"a":"1"}',)], "content string")).collect()[0]
    assert row["content"] == '{"a":"1"}'
    assert dict(row["attrs"]) == {"a": "1"}


def test_json_string_payload_stays_scalar(spark):
    # a STRING value whose text is JSON must NOT expand (jsonparser
    # dataType check) — the JVM from_json probe could not tell
    df = spark.createDataFrame(
        [('{"payload": "{\\"user\\":\\"bob\\"}", "real": {"user": "eve"}}',)],
        "content string",
    )
    out = parse_json_expanded(df, source="content", ignore_first_connector=True)
    attrs = dict(out.collect()[0]["attrs"])
    assert attrs["payload"] == '{"user":"bob"}'
    assert attrs["real_user"] == "eve"


def test_json_unlimited_depth_and_null_render(spark):
    df = spark.createDataFrame(
        [('{"a":{"b":{"c":{"d":"1"}}}, "n": null, "x": 1.50}',)],
        "content string",
    )
    out = parse_json_expanded(df, source="content", ignore_first_connector=True)
    attrs = dict(out.collect()[0]["attrs"])
    assert attrs == {"a_b_c_d": "1", "n": "null", "x": "1.50"}  # raw number text


def test_json_depth_cap_raw_fragment(spark):
    df = spark.createDataFrame([('{"a":{"b":{"c":"1"}}}',)], "content string")
    out = parse_json_expanded(
        df, source="content", depth=2, ignore_first_connector=True
    )
    assert dict(out.collect()[0]["attrs"]) == {"a_b": '{"c":"1"}'}


def test_filter_key_regex_attrs_via_registry(spark):
    from ilogtail_spark.plans.pipeline import build_pipeline

    t = build_pipeline([
        {"type": "processor_json", "SourceKey": "content",
         "ExpandDepth": 0, "IgnoreFirstConnector": True},
        {"type": "processor_filter_key_regex", "Include": ["^user"]},
    ])
    df = spark.createDataFrame(
        [('{"user_id":"7"}',), ('{"other":"x"}',)], "content string"
    )
    assert [dict(r["attrs"]) for r in t(df).collect()] == [{"user_id": "7"}]


def test_split_log_regex_null_passthrough(spark):
    from ilogtail_spark.operators.split import split_log_regex

    df = spark.createDataFrame(
        [("a", "x\ny"), ("b", None)], "id string, content string"
    )
    out = split_log_regex(df, "content", r"y", preserve_others=True)
    rows = {(r["id"], r["content"]) for r in out.collect()}
    assert rows == {("a", "x"), ("a", "y"), ("b", None)}
