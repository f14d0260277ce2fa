"""influx line-protocol decode (operators/influx.py) vs the
reference's own decoder_test.go fixtures, replayed verbatim."""

import pytest
from pyspark.sql import functions as F

from ilogtail_spark.operators.influx import influx_decode

# pkg/protocol/decoder/influxdb/decoder_test.go:28-53 textFormat
TEXT_FORMAT = """
# integer value
cpu value=1i

# float value
cpu_load value=1

cpu_load value=1.0

cpu_load value=1.2

# boolean value
error fatal=true

# string value
event msg="logged out"

# multiple values
cpu load=10,alert=true,reason="value above maximum threshold"

cpu,host=server01,region=uswest value=1 1434055562000000000
cpu,host=server02,region=uswest value=3 1434055562000010000
temperature,machine=unit42,type=assembly internal=32,external=100 1434055562000000035
temperature,machine=unit143,type=assembly internal=22,external=130 1434055562005000035
cpu,host=server\\ 01,region=uswest value=1,msg="all systems nominal"
cpu,host=server\\ 01,region=us\\,west value_int=1i
"""

# decoder_test.go:66-69 txtWithDotNames
DOT_NAMES = """
cpu.load,host=server01,region=uswest value=1 1434055562000000000
cpu.load,host.dd=server02,region=uswest tt="xx",value=3 1434055562000010000
"""


def _lines_df(spark, text):
    return spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(text.split("\n"))],
        "i long, content string",
    )


def test_text_format_15_logs(spark):
    """decoder_test.go:171-172: textFormat decodes to exactly 15 logs
    without FieldsExtend (string fields skipped, comments/blanks
    dropped, unsigned none)."""
    out = influx_decode(_lines_df(spark, TEXT_FORMAT), "content")
    rows = out.collect()
    assert len(rows) == 15
    by_name = {}
    for r in rows:
        by_name.setdefault(r["__name__"], []).append(r)
    # int field: value stripped of the i suffix
    assert by_name["cpu"][0]["__value__"] == "1"
    # float formatting is Go 'g': 1, 1, 1.2 for value=1 / 1.0 / 1.2
    assert [r["__value__"] for r in by_name["cpu_load"]] == ["1", "1", "1.2"]
    # bool → 1/0, field key != value → name:field
    assert by_name["error:fatal"][0]["__value__"] == "1"
    assert by_name["cpu:alert"][0]["__value__"] == "1"
    # escaped space in a tag value survives; escaped comma too
    esc = [r for r in rows if "server 01" in r["__labels__"]]
    assert esc and any("us,west" in r["__labels__"] for r in rows)
    # labels sorted by key
    tagd = [r for r in by_name["cpu"] if r["__labels__"]]
    assert all(r["__labels__"].split("|")[0].startswith("host#$#")
               for r in tagd)
    # stamped lines keep their 19-digit ns verbatim
    assert any(r["__time_nano__"] == "1434055562000000000" for r in rows)


def test_fields_extend_dot_names(spark):
    """decoder_test.go:72-118 (enableFieldsExtend=true): string fields
    ADMITTED with __type__/__field__; exact expected contents."""
    out = influx_decode(
        _lines_df(spark, DOT_NAMES), "content", fields_extend=True
    )
    got = sorted(
        (
            r["__name__"], r["__value__"], r["__labels__"],
            r["__time_nano__"], r["__type__"], r["__field__"],
        )
        for r in out.collect()
    )
    assert got == sorted([
        ("cpu.load", "1", "host#$#server01|region#$#uswest",
         "1434055562000000000", "float", "value"),
        ("cpu.load:tt", "xx", "host.dd#$#server02|region#$#uswest",
         "1434055562000010000", "string", "tt"),
        ("cpu.load", "3", "host.dd#$#server02|region#$#uswest",
         "1434055562000010000", "float", "value"),
    ])


def test_unsigned_dropped_db_tag_and_now(spark):
    df = _lines_df(spark, "m,a=b u=5u,f=2\nm value=7")
    out = influx_decode(
        df, "content", fields_extend=True, db="mydb",
        default_now_ns=1700000000000000000,
    ).collect()
    names = [r["__name__"] for r in out]
    assert "m:u" not in names and "m:f" in names  # unsigned dropped
    assert all(r["__tag__:db"] == "mydb" for r in out)
    assert all(r["__time_nano__"] == "1700000000000000000" for r in out)


def test_short_timestamps_scale(spark):
    """log_helper.go:273-283: ms (13-digit) and s (10-digit) stamps
    scale to 19 digits."""
    df = _lines_df(
        spark,
        "m value=1 1434055562000\nm value=1 1434055562",
    )
    out = influx_decode(df, "content").collect()
    assert sorted(r["__time_nano__"] for r in out) == [
        "1434055562000000000", "1434055562000000000"
    ]


def test_quoted_value_keeps_separators(spark):
    df = _lines_df(spark, 'm,t=x msg="a, b=c d",value=1')
    out = {r["__field__"]: r for r in influx_decode(
        df, "content", fields_extend=True).collect()}
    assert out["msg"]["__value__"] == "a, b=c d"
    assert out["msg"]["__type__"] == "string"
    assert out["value"]["__value__"] == "1"


def test_roundtrip_with_serializer(spark):
    """decode ∘ encode: serialize_influx over decoded rows reproduces
    the canonical line (tags sorted, field named from __field__)."""
    from ilogtail_spark.sinks.serialize import serialize_influx

    df = _lines_df(
        spark, "cpu,host=h1,region=r1 value=2.5 1434055562000000000"
    )
    dec = influx_decode(df, "content", fields_extend=True)
    enc = serialize_influx(dec, field_col="__field__").collect()
    assert enc[0]["__line__"] == (
        "cpu,host=h1,region=r1 value=2.5 1434055562000000000"
    )


def test_registry_factory(spark):
    from ilogtail_spark.operators import OPERATORS

    fn = OPERATORS["service_http_server"](
        Format="influxdb", FieldsExtend=True, Db="mydb",
        DefaultNowNs=1700000000000000000, Address=":18089",
    )
    df = spark.createDataFrame([("weather,city=hz value=32",)],
                               "content string")
    r = fn(df).collect()[0]
    assert r["__name__"] == "weather" and r["__value__"] == "32"
    assert r["__labels__"] == "city#$#hz" and r["__type__"] == "float"
    assert r["__tag__:db"] == "mydb"
    with pytest.raises(ValueError, match="unsupported Format"):
        OPERATORS["service_http_server"](Format="pyroscope")


def test_mysql_format_38_logs(spark):
    """decoder_test.go:181-183: the 40-field mysql scrape minus its 2
    string fields = 38 logs without FieldsExtend."""
    text = (
        "cpu,host=server01,region=uswest value=1 1434055562000000000\n"
        "mysql,host=Vm-Req-170328120400894271-tianchi113855.tc,server=rm-bp1eomqfte2vj91tkjo.mysql.rds.aliyuncs.com:3306 "
        "bytes_sent=19815071437i,com_assign_to_keycache=0i,com_alter_event=0i,com_alter_function=0i,com_alter_server=0i,"
        "com_alter_table=0i,aborted_clients=7738i,binlog_cache_use=136756i,binlog_stmt_cache_use=136759i,"
        "com_alter_procedure=0i,binlog_stmt_cache_disk_use=0i,bytes_received=6811387420i,com_alter_db_upgrade=0i,"
        "com_alter_instance=0i,aborted_connects=7139i,binlog_cache_disk_use=0i,com_admin_commands=3478164i,"
        "com_alter_db=0i,com_alter_tablespace=0i,com_alter_user=0i 1595818360000000000\n"
        "mysql,host=Vm-Req-170328120400894271-tianchi113855.tc,server=rm-bp1eomqfte2vj91tkjo.mysql.rds.aliyuncs.com:3306 "
        "innodb_buffer_pool_read_ahead_rnd=0i,innodb_data_pending_fsyncs=0i,innodb_buffer_pool_bytes_dirty=4325376i,"
        "innodb_buffer_pool_pages_flushed=21810i,innodb_buffer_pool_pages_total=40960i,"
        "innodb_buffer_pool_read_ahead_evicted=0i,innodb_buffer_pool_reads=757i,"
        'innodb_buffer_pool_load_status="Buffer pool(s) load completed at 200702 21:33:49",'
        "innodb_buffer_pool_pages_data=846i,innodb_buffer_pool_read_ahead=0i,innodb_buffer_pool_write_requests=36830857i,"
        "innodb_data_fsyncs=344588i,"
        'innodb_buffer_pool_dump_status="Dumping of buffer pool not started",'
        "innodb_buffer_pool_pages_dirty=264i,innodb_buffer_pool_pages_misc=3i,"
        "innodb_buffer_pool_read_requests=45390218i,innodb_buffer_pool_wait_free=0i,"
        "innodb_buffer_pool_bytes_data=13860864i,innodb_buffer_pool_pages_free=40111i 1595406780000000000"
    )
    out = influx_decode(_lines_df(spark, text), "content")
    assert out.count() == 38
    # with FieldsExtend the 2 string fields come back
    out2 = influx_decode(_lines_df(spark, text), "content",
                         fields_extend=True)
    assert out2.count() == 40


def test_plan_is_single_codegen_pass(spark):
    """Zero Python, zero shuffle: no BatchEvalPython/ArrowEval, no
    Exchange in the decode plan."""
    df = spark.createDataFrame([("m value=1",)], "content string")
    plan = (
        influx_decode(df, "content")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "ArrowEval" not in plan


# --------------------------------------------------------------------------
# statsd decode (operators/statsd.py)
# --------------------------------------------------------------------------

def test_statsd_decode(spark):
    """decoder.go:44-64 semantics over dogstatsd lines: one metric log
    per valid line; tags sorted k#$#v; @rate ignored; blank / no-colon
    / bad-value / unknown-type / set lines skipped."""
    from ilogtail_spark.operators.statsd import statsd_decode

    lines = [
        "page.views:1|c",
        "fuel.level:0.5|g",
        "song.length:240|h|@0.5",
        "users.uniques:1234|s",               # set: skipped (docstring)
        "req.time:12.5|ms|#env:prod,region:us",
        "tagged:3|c|@0.1|#b:2,a:1,bare",
        "",                                    # blank
        "nocolon",                             # no ':'
        ":5|c",                                # empty name
        "bad.value:xx|c",                      # non-numeric
        "weird:1|q",                           # unknown type
    ]
    df = spark.createDataFrame([(ln,) for ln in lines], "content string")
    out = {r["__name__"]: r for r in statsd_decode(
        df, "content", default_now_ns=1700000000000000000).collect()}
    assert sorted(out) == [
        "fuel.level", "page.views", "req.time", "song.length", "tagged",
    ]
    assert out["page.views"]["__value__"] == "1"
    assert out["fuel.level"]["__value__"] == "0.5"
    assert out["song.length"]["__value__"] == "240"  # @rate ignored
    assert out["req.time"]["__labels__"] == "env#$#prod|region#$#us"
    # tags sorted by key; bare tag gets the empty value
    assert out["tagged"]["__labels__"] == "a#$#1|b#$#2|bare#$#"
    assert out["page.views"]["__labels__"] == ""
    assert all(r["__time_nano__"] == "1700000000000000000"
               for r in out.values())


def test_statsd_registry(spark):
    from ilogtail_spark.operators import OPERATORS

    fn = OPERATORS["service_http_server"](Format="statsd",
                                          DefaultNowNs=1)
    df = spark.createDataFrame([("cpu:2|g",)], "content string")
    r = fn(df).collect()[0]
    assert r["__name__"] == "cpu" and r["__value__"] == "2"


def test_http_server_other_formats(spark):
    """Format raw/sls/prometheus route to the existing decoders."""
    from ilogtail_spark.operators import OPERATORS
    from ilogtail_spark.operators.pb import LOG_GROUP, encode_message

    raw = OPERATORS["service_http_server"](Format="raw")
    df = spark.createDataFrame([("hello",)], "body string")
    assert raw(df.withColumnRenamed("body", "content")).collect()[0][
        "content"] == "hello"

    pb = encode_message(
        {"logs": [{"time": 1, "contents": [{"key": "k", "value": "v"}]}]},
        LOG_GROUP,
    )
    sls = OPERATORS["service_http_server"](Format="sls")
    out = sls(spark.createDataFrame([(bytearray(pb),)],
                                    "content binary")).collect()
    assert out[0]["contents"] == {"k": "v"}

    prom = OPERATORS["service_http_server"](Format="prometheus")
    out = prom(spark.createDataFrame(
        [('cpu{host="h1"} 42 1700000000000',)], "content string")).collect()
    assert out[0]["__name__"] == "cpu"

    import pytest as _pytest
    with _pytest.raises(ValueError, match="pyroscope"):
        OPERATORS["service_http_server"](Format="pyroscope")


def test_review_r5_edge_hardening(spark):
    """Round-5 code-review findings: a field token without '=' (or a
    trailing comma) drops the FIELD, not the job; malformed timestamps
    (20 digits, signs, garbage) drop the LINE instead of silently
    truncating; statsd tag values keep everything after the FIRST
    colon."""
    from ilogtail_spark.operators.statsd import statsd_decode

    # no-'=' token among fields: bad field dropped, good field kept
    df = _lines_df(spark, "m foo\nm value=1,=x\nm bad,value=2")
    out = influx_decode(df, "content").collect()
    assert sorted(r["__value__"] for r in out) == ["1", "2"]
    # malformed timestamps: line dropped (not truncated/mangled)
    df = _lines_df(
        spark,
        "m value=1 17000000000000000000\n"   # 20 digits
        "m value=2 -1500000000\n"            # negative
        "m value=3 abc\n"                    # garbage
        "m value=4 1434055562",              # valid 10-digit
    )
    out = influx_decode(df, "content").collect()
    assert [r["__value__"] for r in out] == ["4"]
    # statsd tag value with colons survives intact
    df = spark.createDataFrame(
        [("req:1|c|#url:http://host/x,ip:::1",)], "content string")
    r = statsd_decode(df, "content").collect()[0]
    assert r["__labels__"] == "ip#$#::1|url#$#http://host/x"
