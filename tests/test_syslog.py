"""Replay of plugins/input/syslog/parser_test.go fixtures through
operators/syslog.py (year pinned via default_year — the Go tests use
nowTime.Year(); times resolve in the pinned-UTC session)."""

import datetime

from pyspark.sql import functions as F

from ilogtail_spark.operators.syslog import syslog_parse

YEAR = 2026


def _ns(mon, day, h, m, s, year=YEAR):
    dt = datetime.datetime(year, mon, day, h, m, s, tzinfo=datetime.timezone.utc)
    return str(int(dt.timestamp()) * 1_000_000_000)


def _parse(spark, lines, **kw):
    df = spark.createDataFrame([(i, l) for i, l in enumerate(lines)],
                               "i long, line string")
    rows = syslog_parse(df, "line", default_year=YEAR, **kw).orderBy("i").collect()
    return rows


def test_rfc3164_fixtures(spark):
    """parser_test.go:29-126 — all six RFC3164 cases."""
    cases = [
        ("<60>Oct 09 14:36:47 hostname program: message",
         ("hostname", "program", 60, 7, 4, "message", _ns(10, 9, 14, 36, 47))),
        ("<34>Aug  2 09:49:23 hostname program: message",
         ("hostname", "program", 34, 4, 2, "message", _ns(8, 2, 9, 49, 23))),
        ("<86>Jul 31 13:14:22 rs1e13316 su: pam_unix(su:session): session closed for user nobody",
         ("rs1e13316", "su", 86, 10, 6,
          "pam_unix(su:session): session closed for user nobody",
          _ns(7, 31, 13, 14, 22))),
        ("<13>Aug  1 14:32:44 ecs-test-yyh root: dfjksdfjkdlsfjsklf",
         ("ecs-test-yyh", "root", 13, 1, 5, "dfjksdfjkdlsfjsklf",
          _ns(8, 1, 14, 32, 44))),
        ("<85>Aug  1 14:31:58 ecs-test-yyh polkitd[457]: Registered Authentication Agent for unix-process:22755:258653719 (system bus name :1.10269 [/usr/bin/pkttyagent --notify-fd 5 --fallback], object path /org/freedesktop/PolicyKit1/AuthenticationAgent, locale en_US.UTF-8)",
         ("ecs-test-yyh", "polkitd", 85, 10, 5,
          "Registered Authentication Agent for unix-process:22755:258653719 (system bus name :1.10269 [/usr/bin/pkttyagent --notify-fd 5 --fallback], object path /org/freedesktop/PolicyKit1/AuthenticationAgent, locale en_US.UTF-8)",
          _ns(8, 1, 14, 31, 58))),
        ("<13>Aug 17 03:42:11 ecs-test-yyh LOGSTASH[-]: hello, a syslog from logstash",
         ("ecs-test-yyh", "LOGSTASH", 13, 1, 5, "hello, a syslog from logstash",
          _ns(8, 17, 3, 42, 11))),
    ]
    rows = _parse(spark, [c[0] for c in cases], mode="rfc3164")
    for r, (_, exp) in zip(rows, cases):
        host, prog, pri, fac, sev, content, ns = exp
        assert (r["_hostname_"], r["_program_"]) == (host, prog)
        assert (r["_priority_"], r["_facility_"], r["_severity_"]) == (pri, fac, sev)
        assert r["_content_"] == content
        assert r["_unixtimestamp_"] == ns
        assert r["_structured_data_"] is None and r["_message_id_"] is None


def test_rfc3164_without_hostname(spark):
    """parser_test.go:129-176 — AddHostname unixgram case: no hostname
    token, first post-timestamp token is the tag."""
    rows = _parse(
        spark,
        ["<86>Apr 16 14:33:06 su: pam_unix(su:session): session opened for user root by (uid=0)"],
        mode="rfc3164", with_hostname=False,
    )
    r = rows[0]
    assert r["_program_"] == "su"
    assert (r["_priority_"], r["_facility_"], r["_severity_"]) == (86, 10, 6)
    assert r["_content_"] == "pam_unix(su:session): session opened for user root by (uid=0)"
    assert r["_hostname_"] == ""  # caller defaults (util.GetHostName())
    assert r["_unixtimestamp_"] == _ns(4, 16, 14, 33, 6)


def test_rfc5424_fixtures(spark):
    """parser_test.go:179-246 — both RFC5424 cases + the 3164-shaped
    failure line."""
    rows = _parse(
        spark,
        [
            "Jul 29 06:20:01 ecs-test-yyh systemd: Started Session 4530 of user root.",
            '<29>1 2016-02-21T04:32:57+00:00 web1 someservice 2341 2 [origin][meta sequence="14125553" service="someservice"] "GET /v1/ok HTTP/1.1" 200 145 "-" "hacheck 0.9.0" 24306 127.0.0.1:40124 575',
            "<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 - BOM'su root' failed for lonvick on /dev/pts/8",
        ],
        mode="rfc5424",
    )
    fail = rows[0]
    assert fail["_priority_"] == -1
    assert fail["_content_"].startswith("Jul 29 06:20:01")  # raw passthrough
    assert fail["_unixtimestamp_"] is None  # documented deviation (Go: now())

    r1 = rows[1]
    assert (r1["_hostname_"], r1["_program_"]) == ("web1", "someservice")
    assert (r1["_priority_"], r1["_facility_"], r1["_severity_"]) == (29, 3, 5)
    assert (r1["_process_id_"], r1["_message_id_"]) == ("2341", "2")
    # Go json.Marshal(map[string]map[string]string): sorted keys
    assert r1["_structured_data_"] == (
        '{"meta":{"sequence":"14125553","service":"someservice"},"origin":{}}'
    )
    assert r1["_content_"] == (
        '"GET /v1/ok HTTP/1.1" 200 145 "-" "hacheck 0.9.0" 24306 127.0.0.1:40124 575'
    )
    ts1 = datetime.datetime(2016, 2, 21, 4, 32, 57, tzinfo=datetime.timezone.utc)
    assert r1["_unixtimestamp_"] == str(int(ts1.timestamp()) * 1_000_000_000)

    r2 = rows[2]
    assert (r2["_hostname_"], r2["_program_"]) == ("mymachine.example.com", "su")
    assert (r2["_priority_"], r2["_facility_"], r2["_severity_"]) == (34, 4, 2)
    assert r2["_process_id_"] is None and r2["_message_id_"] == "ID47"
    assert r2["_structured_data_"] is None
    assert r2["_content_"] == "BOM'su root' failed for lonvick on /dev/pts/8"
    ts2 = datetime.datetime(2003, 10, 11, 22, 14, 15, 3000,
                            tzinfo=datetime.timezone.utc)
    assert r2["_unixtimestamp_"] == str(
        int(ts2.timestamp()) * 1_000_000_000 + 3_000_000
    )


def test_auto_parser(spark):
    """parser_test.go:249-341 — 3164 first, then 5424, else failure;
    ignore_parse_failure=False DROPS the line (syslog.go:403-409)."""
    lines = [
        "<34>Aug  2 09:49:23 hostname program: message",
        '<29>1 2016-02-21T04:32:57+00:00 web1 someservice 2341 2 [origin][meta sequence="14125553" service="someservice"] "GET /v1/ok HTTP/1.1" 200',
        "<341 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 - x",
    ]
    rows = _parse(spark, lines, mode="auto")
    assert rows[0]["_program_"] == "program" and rows[0]["_priority_"] == 34
    assert rows[1]["_program_"] == "someservice" and rows[1]["_priority_"] == 29
    assert rows[2]["_priority_"] == -1 and rows[2]["_content_"] == lines[2]

    kept = _parse(spark, lines, mode="auto", ignore_parse_failure=False)
    assert len(kept) == 2


def test_rfc5424_no_sd_no_msg_edges(spark):
    rows = _parse(
        spark,
        ["<29>1 2016-02-21T04:32:57+00:00 web1 app - - -",
         "<29>1 2016-02-21T04:32:57+00:00 - - - - - hi"],
        mode="rfc5424",
    )
    assert rows[0]["_content_"] == "" and rows[0]["_structured_data_"] is None
    assert rows[1]["_hostname_"] is None and rows[1]["_program_"] == ""
    assert rows[1]["_content_"] == "hi"


def test_nginx_status_parse(spark):
    """input_nginx.go:120-170 — the real stub_status page shape, plus
    a malformed page yielding NULLs."""
    from ilogtail_spark.operators.nginx import nginx_status_parse

    good = ("Active connections: 291 \n"
            "server accepts handled requests\n"
            " 16630948 16630948 31070465 \n"
            "Reading: 6 Writing: 179 Waiting: 106 \n")
    df = spark.createDataFrame([(1, good), (2, "oops")], "i long, page string")
    rows = {r["i"]: r for r in nginx_status_parse(df, "page").collect()}
    r = rows[1]
    assert (r["active"], r["accepts"], r["handled"], r["requests"]) == (
        "291", "16630948", "16630948", "31070465")
    assert (r["reading"], r["writing"], r["waiting"]) == ("6", "179", "106")
    assert all(rows[2][c] is None for c in
               ["active", "accepts", "handled", "requests",
                "reading", "writing", "waiting"])


def test_rfc3164_calendar_invalid_is_failure_not_crash(spark):
    """Regex-shaped but calendar-invalid fields (Feb 30, hour 99) must
    take the parse-failure row, not an ANSI DateTimeException."""
    rows = _parse(
        spark,
        ["<13>Feb 30 12:00:00 host prog: hello",
         "<13>Aug 02 99:00:00 host prog: hi",
         "<999>Aug 02 09:00:00 host prog: pri out of range"],
        mode="rfc3164",
    )
    for r in rows:
        assert r["_priority_"] == -1
        assert r["_unixtimestamp_"] is None
        assert r["_content_"].startswith("<")  # raw passthrough
