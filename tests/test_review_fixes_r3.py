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


def test_json_go_unittest_fixture(spark):
    """Replay processor_json_test.go:34-68,203-220 (TestSourceKey /
    TestExpandArray) through the registry: Prefix+UseSourceKeyAsPrefix
    key building, unlimited depth, raw array fragments vs ExpandArray
    k[i] element keys (empty arrays vanish when expanded)."""
    from ilogtail_spark.plans.pipeline import build_pipeline

    jv = ('{"k1":{"k2":{"k3":{"k4":{"k51":"51","k52":"52"},"k41":"41"}}},'
          '"k6":[{"x":"a"},{"x":"b"}],"k7":[]}')
    df = spark.createDataFrame([(jv,)], "s_key string")

    def run(**extra):
        t = build_pipeline([{
            "type": "processor_json", "SourceKey": "s_key",
            "ExpandDepth": 0, "ExpandConnector": "-", "Prefix": "j",
            "UseSourceKeyAsPrefix": True, **extra,
        }])
        return dict(t(df).collect()[0]["attrs"])

    assert run() == {
        "js_key-k1-k2-k3-k4-k51": "51",
        "js_key-k1-k2-k3-k4-k52": "52",
        "js_key-k1-k2-k3-k41": "41",
        "js_key-k6": '[{"x":"a"},{"x":"b"}]',
        "js_key-k7": "[]",
    }
    assert run(ExpandArray=True) == {
        "js_key-k1-k2-k3-k4-k51": "51",
        "js_key-k1-k2-k3-k4-k52": "52",
        "js_key-k1-k2-k3-k41": "41",
        "js_key-k6[0]-x": "a",
        "js_key-k6[1]-x": "b",
    }


def test_grok_keep_source_defaults(spark):
    """processor_grok.go:47-48 init: KeepSource true,
    IgnoreParseFailure true — source survives success AND failure by
    default through the registry."""
    from ilogtail_spark.plans.pipeline import build_pipeline

    t = build_pipeline([{"type": "processor_grok", "SourceKey": "content",
                         "Match": ["%{IP:ip}"]}])
    df = spark.createDataFrame([("1.2.3.4",), ("nope",)], "content string")
    got = {r["content"]: r["ip"] for r in t(df).collect()}
    assert got == {"1.2.3.4": "1.2.3.4", "nope": None}
