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


def test_grok_go_unittest_parse_fixtures(spark):
    """Replay processor_grok_test.go:119-236 (TestProcessorGrokParse):
    dash aliases, mixed grok + (?P<>) regex groups, unicode, the
    (?ms) multi-line thread-dump pattern, empty-record failure."""
    from ilogtail_spark.functions.grok import grok_parse

    def run(match, record):
        df = spark.createDataFrame([(record,)], "content string")
        r = grok_parse(df, match, source="content").collect()[0]
        return r

    r = run("%{WORD:word1} %{NUMBER:request_time} %{WORD:word2}",
            "begin 123.456 end")
    assert (r["word1"], r["request_time"], r["word2"]) == (
        "begin", "123.456", "end")

    r = run("%{WORD:word1} %{NUMBER:request_time} %{WORD:word2}", "")
    assert r["__parse_ok__"] is False

    r = run("%{WORD:english-word} %{GREEDYDATA:message}", "hello こんにちは")
    assert (r["english-word"], r["message"]) == ("hello", "こんにちは")

    r = run("%{WORD:english-word} %{GREEDYDATA:message} (?P<message2>.*)",
            "hello こんにちは 你好")
    assert (r["english-word"], r["message"], r["message2"]) == (
        "hello", "こんにちは", "你好")

    stack_pat = (
        r"\[%{TIMESTAMP_ISO8601:time_local}\] %{NUMBER:pid} "
        r"%{QUOTEDSTRING:thread} prio=%{NUMBER:prio} tid=%{BASE16NUM:tid} "
        r"nid=%{BASE16NUM:nid} %{DATA:func} \[%{BASE16NUM:addr}\]"
        r"%{SPACE}(?ms)%{GREEDYDATA:stack}"
    )
    record = (
        '[2023-02-09T00:24:43.922554223+08:00] 1 "BLOCKED_TEST pool-1-thread-2"'
        " prio=6 tid=0x0000000007673800 nid=0x260c waiting for monitor entry"
        " [0x0000000008abf000]\n"
        "java.lang.Thread.State: BLOCKED (on object monitor)\n"
        "\t at com.nbp.ThreadBlockedState.monitorLock(ThreadBlockedState.java:43)"
    )
    r = run(stack_pat, record)
    assert r["time_local"] == "2023-02-09T00:24:43.922554223+08:00"
    assert r["pid"] == "1"
    assert r["thread"] == '"BLOCKED_TEST pool-1-thread-2"'
    assert (r["prio"], r["tid"], r["nid"]) == (
        "6", "0x0000000007673800", "0x260c")
    assert r["func"] == "waiting for monitor entry"
    assert r["addr"] == "0x0000000008abf000"
    assert r["stack"].startswith("java.lang.Thread.State: BLOCKED")


def test_strptime_go_unittest_format_fixtures(spark):
    """Replay strptime_test.go:88-149 (TestFormat) through the
    registry: every C-strptime Format row incl. %f fractions, %z/%Z
    zones, and %s second/milli/micro epochs (all truncated to whole
    seconds, like the plugin)."""
    from ilogtail_spark.plans.pipeline import build_pipeline

    cases = [
        # (input, format, expected epoch sec, expected precise ms)
        ("2016/01/02", "%Y/%m/%d", 1451692800, 1451692800000),
        ("2016/01/02 12:59:59", "%Y/%m/%d %H:%M:%S", 1451739599, 1451739599000),
        ("2016/01/02-12:59:59", "%Y/%m/%d-%H:%M:%S", 1451739599, 1451739599000),
        ("2016/01/02 12:59:59.1234", "%Y/%m/%d %H:%M:%S.%f",
         1451739599, 1451739599123),
        # BOTH %z and %Z: java.time resolves the zone NAME over the
        # offset (Go honors the offset — documented deviation in
        # common.strptime_to_jdk); with the name being UTC here the
        # instant lands at 12:59:59Z
        ("2016/01/02 12:59:59.987654321 +0700 (UTC)",
         "%Y/%m/%d %H:%M:%S.%f %z (%Z)", 1451739599, 1451739599987),
        ("1451710799", "%s", 1451710799, 1451710799000),
        ("1451710799123", "%s", 1451710799, 1451710799000),
        ("1451710799123456", "%s", 1451710799, 1451710799000),
        ("2016/Jan/02 12:59:59,123456", "%Y/%b/%d %H:%M:%S,%f",
         1451739599, 1451739599123),
        ("2019-07-15T04:16:47:123Z", "%Y-%m-%dT%H:%M:%S:%f",
         1563164207, 1563164207123),
    ]
    for inp, fmt, exp_sec, exp_ms in cases:
        t = build_pipeline([{
            "type": "processor_strptime", "SourceKey": "time",
            "Format": fmt, "EnablePreciseTimestamp": True,
        }])
        df = spark.createDataFrame([(inp,)], "time string")
        r = t(df).selectExpr(
            "time", "unix_seconds(cast(ts as timestamp)) AS sec",
            "precise_timestamp"
        ).collect()[0]
        assert r["sec"] == exp_sec, (inp, fmt, r["sec"], exp_sec)
        assert r["precise_timestamp"] == str(exp_ms), (inp, fmt)
        assert r["time"] == inp  # KeepSource default true
