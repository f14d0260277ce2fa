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


def test_desensitize_go_unittest_fixtures(spark):
    """Replay processor_desensitize_test.go:29-230: Match full vs
    regex, const vs md5-of-each-match, unicode begin/content."""
    from ilogtail_spark.plans.pipeline import build_pipeline

    def run(record, **cfg):
        base = {"type": "processor_desensitize", "SourceKey": "content",
                "Method": "const", "Match": "regex", "ReplaceString": "***",
                "RegexBegin": "'password':'", "RegexContent": "[^']+"}
        t = build_pipeline([{**base, **cfg}])
        df = spark.createDataFrame([(record,)], "content string")
        return t(df).collect()[0]["content"]

    rec = ("[{'account':'1812213231432969','password':'04a23f38'}, "
           "{'account':'1812213685634','password':'123a'}]")
    # Match=full: whole-value mask / whole-value md5
    assert run(rec, Match="full") == "***"
    assert run(rec, Match="full", Method="md5") == (
        "700085e3968c3efb83b54ba47dd1367d")
    # Match=regex: each region, const
    rec3 = (rec[:-1] + ", {'account':'1812213685634',"
            "'password':'666777888ccc']")
    assert run(rec3) == (
        "[{'account':'1812213231432969','password':'***'}, "
        "{'account':'1812213685634','password':'***'}, "
        "{'account':'1812213685634','password':'***']")
    # Match=regex: md5 OF EACH MATCH
    assert run(rec, Method="md5") == (
        "[{'account':'1812213231432969',"
        "'password':'9c525f463ba1c89d6badcd78b2b7bd79'}, "
        "{'account':'1812213685634',"
        "'password':'1552c03e78d38d5005d4ce7b8018addf'}]")
    # unicode: no-match passthrough; multi-occurrence replace
    cn = "中文电话号码有用中文电话号码有用"
    assert run(cn, RegexBegin="码", RegexContent="XXX") == cn
    assert run(cn, RegexBegin="号", RegexContent="码") == (
        "中文电话号***有用中文电话号***有用")


def test_gotime_go_unittest_fixtures(spark):
    """Replay processor_gotime_test.go:34-177: Source/DestLocation
    whole-hour offsets, KeepSource=false drop, and the fixed epoch
    SourceFormats seconds/milliseconds/microseconds/nanoseconds
    (nanos keep their digits through the string graft)."""
    from ilogtail_spark.plans.pipeline import build_pipeline

    base = {"type": "processor_gotime", "SourceKey": "s_key",
            "SourceFormat": "2006-01-02 15:04:05", "SourceLocation": 8,
            "DestKey": "d_key", "DestFormat": "2006/01/02 15:04:05",
            "DestLocation": 9, "KeepSource": True}

    def run(value, **cfg):
        t = build_pipeline([{**base, **cfg}])
        df = spark.createDataFrame([(value,)], "s_key string")
        return t(df).collect()[0]

    # +8 source wall time re-rendered at +9 (TestSetTime's instant)
    r = run("2019-07-05 19:28:01")
    assert r["d_key"] == "2019/07/05 20:28:01"
    assert r["s_key"] == "2019-07-05 19:28:01"
    # KeepSource=false drops the source field (go test: only d_key left)
    r = run("2019-07-05 19:28:01", KeepSource=False)
    assert "s_key" not in r.asDict()
    # fixed epoch patterns (offsets ignored on the source side)
    assert run("1645595256", SourceFormat="seconds")["d_key"] == \
        "2022/02/23 14:47:36"
    assert run("1645595256807", SourceFormat="milliseconds",
               DestFormat="2006/01/02 15:04:05.000")["d_key"] == \
        "2022/02/23 14:47:36.807"
    assert run("1645595256807000", SourceFormat="microseconds",
               DestFormat="2006/01/02 15:04:05.000000")["d_key"] == \
        "2022/02/23 14:47:36.807000"
    assert run("1645595256807000123", SourceFormat="nanoseconds",
               DestFormat="2006/01/02 15:04:05.000000000")["d_key"] == \
        "2022/02/23 14:47:36.807000123"


def test_string_replace_go_unittest_fixtures(spark):
    """Replay processor_string_replace_test.go:71-240: regex
    replace-all with $n groups and lookbehind, const replace-all,
    and strconv.Unquote escape decoding (\\x22 / \\u554a, quote
    stripping, invalid-escape whole-value fallback)."""
    from ilogtail_spark.plans.pipeline import build_pipeline

    def run(value, **cfg):
        t = build_pipeline([{"type": "processor_string_replace",
                             "SourceKey": "content", **cfg}])
        df = spark.createDataFrame([(value,)], "content string")
        return t(df).collect()[0]["content"]

    # regex: strip ANSI color escapes + N/A
    rec = (r"2022-09-16 09:03:31.013 \u001b[32mINFO \u001b[0;39m "
           r"\u001b[34m[TID: N/A]\u001b[0;39m [\u001b[35mThread-30\u001b[0;39m] "
           r"\u001b[36mc.s.govern.polygonsync.job.BlockTask\u001b[0;39m "
           ": 区块采集------结束------\r")
    assert run(rec, Method="regex",
               Match=r"\\u\w+\[\d{1,3};*\d{1,3}m|N/A") == (
        "2022-09-16 09:03:31.013 INFO  [TID: ] [Thread-30] "
        "c.s.govern.polygonsync.job.BlockTask : 区块采集------结束------\r")
    # regex with $1 group ref
    assert run("10.10.239.16", Method="regex",
               Match=r"(\d.*\.)\d+", ReplaceString="$1*/24") == "10.10.239.*/24"
    # regex replace-ALL occurrences
    assert run("10.10.239.16 10.10.238.10 ", Method="regex",
               Match=r".\d ", ReplaceString="0/24 ") == (
        "10.10.239.0/24 10.10.238.0/24 ")
    # lookbehind phone-mask pattern: no match -> unchanged
    attr = '{"requestParams":"{\\"userId\\":\\"666666\\"}"}'
    assert run(attr, Method="regex",
               Match=(r"(?<!(\d|\w))(13[0-9]|15[0-35-9])(\d{4})(\d{4})"
                      r"(?!(\d|\w))"),
               ReplaceString="$2****$4") == attr
    # const replace-all
    assert run("hello,how old are you? nice to meet you", Method="const",
               Match="how old are you?") == "hello, nice to meet you"
    # unquote
    assert run(r"{\x22UID\x22:\x2212345678\x22,\x22page_num\x22:1}",
               Method="unquote") == '{"UID":"12345678","page_num":1}'
    assert run('aaa"\\u554a', Method="unquote") == 'aaa"啊'
    assert run('"message"', Method="unquote") == "message"


def test_appender_go_unittest_fixtures(spark, monkeypatch):
    """Replay processor_appender_test.go:41-61,63-80: {{$env}} /
    {{__host__}} / {{__ip__}} templates, literal fallthrough for
    unresolvable cloud flags, SortLabels pair filtering + ordering,
    and cloud-flag resolution via the platformmeta mock."""
    import socket

    from ilogtail_spark.plans.pipeline import build_pipeline
    from ilogtail_spark.operators.transform import MOCK_CLOUD_META

    monkeypatch.setenv("my", "xxx")
    host = socket.gethostname()
    try:
        ip = socket.gethostbyname(socket.gethostname())
    except OSError:
        ip = "127.0.0.1"

    value = "|host#$#{{__host__}}|ip#$#{{__ip__}}|env:{{$my}}|switch#$#{{__cloud_image_id__}}"
    t = build_pipeline([{"type": "processor_appender", "Key": "a",
                         "Value": value}])
    df = spark.createDataFrame([("seed",)], "a string")
    got = t(df).collect()[0]["a"]
    assert got == (
        f"seed|host#$#{host}|ip#$#{ip}|env:xxx|switch#$#__cloud_image_id__")

    # SortLabels: only k#$#v pairs survive, sorted by label
    t2 = build_pipeline([{"type": "processor_appender", "Key": "a",
                          "Value": value, "SortLabels": True}])
    got2 = t2(spark.createDataFrame([("",)], "a string")).collect()[0]["a"]
    assert got2 == (
        f"host#$#{host}|ip#$#{ip}|switch#$#__cloud_image_id__")

    # Platform set -> cloud flags resolve via the platformmeta mock
    t3 = build_pipeline([{"type": "processor_appender", "Key": "a",
                          "Platform": "mock",
                          "Value": "|img#$#{{__cloud_image_id__}}"}])
    got3 = t3(spark.createDataFrame([("x",)], "a string")).collect()[0]["a"]
    assert got3 == "x|img#$#" + MOCK_CLOUD_META["__cloud_image_id__"]


def test_packjson_keep_source_false(spark):
    """processor_packjson_test.go:45-69: pack into DestKey; KeepSource
    false drops the packed sources."""
    from ilogtail_spark.plans.pipeline import build_pipeline

    df = spark.createDataFrame([("1", "2")], "a string, b string")
    t = build_pipeline([{"type": "processor_packjson",
                         "SourceKeys": ["a", "b"], "DestKey": "d_key"}])
    r = t(df).collect()[0]
    assert r["d_key"] == '{"a":"1","b":"2"}' and r["a"] == "1"
    t2 = build_pipeline([{"type": "processor_packjson",
                          "SourceKeys": ["a", "b"], "DestKey": "d_key",
                          "KeepSource": False}])
    r2 = t2(df).collect()[0].asDict()
    assert r2 == {"d_key": '{"a":"1","b":"2"}'}


def test_unquote_strictness_and_surrogates(spark):
    """Second-review fixes: lone \\u surrogates map to U+FFFD (Go
    behavior; a raw surrogate would crash Arrow), malformed escapes
    keep the WHOLE value unchanged (strconv error fallback)."""
    from ilogtail_spark.operators.transform import _go_unquote_one

    assert _go_unquote_one("msg=\\ud83d\\ude00") == "msg=��"
    for bad in ("end\\x2", "a\\x+5b", "oct\\7", "big\\777", "q\\'x"):
        assert _go_unquote_one(bad) == bad
    # and through the full Spark path (Arrow boundary survives)
    from ilogtail_spark.plans.pipeline import build_pipeline

    t = build_pipeline([{"type": "processor_string_replace",
                         "SourceKey": "content", "Method": "unquote"}])
    df = spark.createDataFrame([("msg=\\ud83d",)], "content string")
    assert t(df).collect()[0]["content"] == "msg=�"


def test_appender_sort_labels_no_pairs_keeps_value(spark):
    """log_helper keyValue.Len()>0 guard: SortLabels with no k#$#v
    pairs leaves the concatenated value intact."""
    from ilogtail_spark.operators.transform import appender

    df = spark.createDataFrame([("x",)], "a string")
    out = appender(df, {"a": "greeting"}, sort_labels=True)
    assert out.collect()[0]["a"] == "xgreeting"


def test_string_replace_requires_match(spark):
    import pytest as _pytest

    from ilogtail_spark.plans.pipeline import build_pipeline

    with _pytest.raises(ValueError):
        build_pipeline([{"type": "processor_string_replace",
                         "SourceKey": "content", "Method": "regex"}])


def test_desensitize_default_match_is_full(spark):
    """processor_desensitize.go init: Match defaults 'full' — a config
    omitting Match masks the WHOLE value."""
    from ilogtail_spark.plans.pipeline import build_pipeline

    t = build_pipeline([{"type": "processor_desensitize",
                         "SourceKey": "content", "ReplaceString": "***",
                         "RegexBegin": "pw=", "RegexContent": r"\w+"}])
    df = spark.createDataFrame([("secret pw=abc",)], "content string")
    assert t(df).collect()[0]["content"] == "***"


def test_strptime_epoch_first_ten_chars(spark):
    """strptime.go %s takes value[0:10]: an 11- or 12-digit epoch
    parses by its first ten digits, not as whole-value seconds."""
    from ilogtail_spark.plans.pipeline import build_pipeline

    t = build_pipeline([{"type": "processor_strptime", "SourceKey": "time",
                         "Format": "%s"}])
    df = spark.createDataFrame([("999999999999",)], "time string")
    r = t(df).selectExpr("unix_seconds(cast(ts as timestamp)) s").collect()[0]
    assert r["s"] == 9999999999


def test_strptime_trailing_offset_not_honored(spark):
    """The trailing-designator tolerance absorbs only a literal 'Z';
    a non-Z trailing offset is a parse FAILURE (null), never a
    silently shifted instant."""
    from ilogtail_spark.plans.pipeline import build_pipeline

    t = build_pipeline([{"type": "processor_strptime", "SourceKey": "time",
                         "Format": "%Y-%m-%dT%H:%M:%S"}])
    df = spark.createDataFrame(
        [("2019-07-15T04:16:47+07:00",), ("2019-07-15T04:16:47Z",)],
        "time string")
    rows = {r["time"]: r["ts"] for r in t(df).collect()}
    assert rows["2019-07-15T04:16:47+07:00"] is None
    assert rows["2019-07-15T04:16:47Z"] is not None
