"""Syslog line parsing — RFC3164 / RFC5424 / auto.

Reference: ``plugins/input/syslog/parser.go`` (the rfc3164Parser /
rfc5424Parser / autoParser trio over the jeromer and influxdata
grammars) and the field emission in ``plugins/input/syslog/
syslog.go:395-441``. The TRANSPORT legs (UDP/TCP/unixgram listeners)
collapse to "read a table" per the north star; the PARSE semantics —
the part with query meaning — are lifted here as one codegen pass
(regexp_extract + string ops, no UDF, zero shuffle).

Output columns (syslog.go names):
  ``_program_ _priority_ _facility_ _severity_ _unixtimestamp_
  _hostname_ _content_ _structured_data_ _message_id_ _process_id_``

Documented deviations from the reference, all environment-driven:
  * parse failure sets ``_unixtimestamp_`` NULL (the reference stamps
    ``time.Now()`` — nondeterministic); content still carries the raw
    line when ``ignore_parse_failure`` (parser.go:101-107).
  * RFC3164 has no year: the reference assumes the CURRENT local
    year; ``default_year`` makes that explicit (pass the ingest
    year), and times resolve in the pinned-UTC session rather than
    ``time.Local``.
  * hostname fallbacks (``util.GetHostName()``) and ``_ip_``/
    ``_client_ip_`` are host-environment lookups, not parse results —
    hostname-less lines yield NULL for the caller to default.
  * RFC5424 structured data: the common subset (no escaped ``]``/
    ``"`` and no spaces inside param values — none of the reference's
    fixtures use them); rendered exactly like Go's
    ``json.Marshal(map[string]map[string]string)``: sorted keys at
    both levels, ``{}`` for a bare element (parser_test.go:198-205).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

# <PRI>Mon  d hh:mm:ss REST   (day may be space-padded: 'Aug  2')
_RFC3164_RE = (
    r"^<(\d{1,3})>("
    + "|".join(_MONTHS)
    + r")\s{1,2}(\d{1,2}) (\d{2}):(\d{2}):(\d{2}) (.*)$"
)
# tag[:pid]: content   (polkitd[457]: ..., LOGSTASH[-]: ..., su: ...)
_TAG_RE = r"^([^:\[\s]+)(?:\[[^\]]*\])?: ?"
# <PRI>1 TIMESTAMP HOSTNAME APP PROCID MSGID TAIL(SD + MSG)
_RFC5424_RE = r"^<(\d{1,3})>1 (\S+) (\S+) (\S+) (\S+) (\S+) (.*)$"
_SD_RE = r"^((?:\[[^\]]*\])+)"


def _nilable(tok: Column) -> Column:
    """RFC5424 '-' means absent."""
    return F.when(tok == "-", F.lit(None).cast("string")).otherwise(tok)


def _sd_json(sd: Column) -> Column:
    """Render RFC5424 structured data exactly like Go's json.Marshal
    of map[string]map[string]string: elements and params sorted by
    key, a bare element id as {}."""
    def elem_json(e: Column) -> Column:
        eid = F.regexp_extract(e, r"^(\S+)", 1)
        params = F.regexp_replace(e, r"^\S+ ?", "")
        kvs = F.array_sort(
            F.transform(
                F.split(params, " "),
                lambda t: F.concat(
                    F.lit('"'),
                    F.regexp_extract(t, r'^([^=]+)="', 1),
                    F.lit('":"'),
                    F.regexp_extract(t, r'^[^=]+="([^"]*)"$', 1),
                    F.lit('"'),
                ),
            )
        )
        body = F.when(params == "", F.lit("")).otherwise(
            F.array_join(kvs, ",")
        )
        return F.concat(F.lit('"'), eid, F.lit('":{'), body, F.lit("}"))

    elems = F.array_sort(
        F.transform(F.regexp_extract_all(sd, F.lit(r"\[([^\]]*)\]"), 1), elem_json)
    )
    return F.concat(F.lit("{"), F.array_join(elems, ","), F.lit("}"))


def syslog_parse(
    df: DataFrame,
    source_col: str = "line",
    mode: str = "auto",
    ignore_parse_failure: bool = True,
    with_hostname: bool = True,
    default_year: int = 2024,
) -> DataFrame:
    """Parse a syslog line column per the reference's parser trio.

    ``mode``: 'rfc3164' | 'rfc5424' | 'auto' (3164 first, then 5424 —
    parser.go:181-186). ``with_hostname=False`` is the reference's
    AddHostname unixgram case (syslog.go:54): the header carries no
    hostname token, so the first post-timestamp token is the TAG.
    """
    line = F.col(source_col)
    m3 = line.rlike(_RFC3164_RE)
    rest3 = F.regexp_extract(line, _RFC3164_RE, 7)
    host3 = (
        F.regexp_extract(rest3, r"^(\S+) ", 1)
        if with_hostname
        else F.lit("")
    )
    msg3 = (
        F.regexp_replace(rest3, r"^\S+ ", "") if with_hostname else rest3
    )
    prog3 = F.regexp_extract(msg3, _TAG_RE, 1)
    content3 = F.when(prog3 == "", msg3).otherwise(
        F.regexp_replace(msg3, _TAG_RE, "")
    )
    mon3 = F.regexp_extract(line, _RFC3164_RE, 2)
    month_num = F.array_position(
        F.array(*[F.lit(m) for m in _MONTHS]), mon3
    ).cast("int")
    ts3 = F.make_timestamp(
        F.lit(default_year),
        month_num,
        F.regexp_extract(line, _RFC3164_RE, 3).try_cast("int"),
        F.regexp_extract(line, _RFC3164_RE, 4).try_cast("int"),
        F.regexp_extract(line, _RFC3164_RE, 5).try_cast("int"),
        F.regexp_extract(line, _RFC3164_RE, 6).try_cast("int"),
    )
    pri3 = F.regexp_extract(line, _RFC3164_RE, 1).try_cast("int")
    # 3164 requires the post-header shape too: with hostname there
    # must be a host token AND a message after it
    ok3 = m3 & (pri3 <= 191) & ((F.lit(not with_hostname)) | (host3 != ""))

    m5 = line.rlike(_RFC5424_RE)
    pri5 = F.regexp_extract(line, _RFC5424_RE, 1).try_cast("int")
    ts5_raw = F.regexp_extract(line, _RFC5424_RE, 2)
    ts5 = F.try_to_timestamp(ts5_raw)
    ok5 = m5 & (pri5 <= 191) & ts5.isNotNull()
    host5 = _nilable(F.regexp_extract(line, _RFC5424_RE, 3))
    app5 = _nilable(F.regexp_extract(line, _RFC5424_RE, 4))
    proc5 = _nilable(F.regexp_extract(line, _RFC5424_RE, 5))
    msgid5 = _nilable(F.regexp_extract(line, _RFC5424_RE, 6))
    tail5 = F.regexp_extract(line, _RFC5424_RE, 7)
    sd_raw = F.regexp_extract(tail5, _SD_RE, 1)
    has_sd = (~tail5.startswith("-")) & (sd_raw != "")
    content5 = F.when(
        tail5.startswith("- "), F.substring(tail5, 3, 2_000_000)
    ).when(tail5 == "-", F.lit("")).otherwise(
        F.regexp_replace(tail5, _SD_RE + " ?", "")
    )
    sd5 = F.when(has_sd, _sd_json(sd_raw)).otherwise(F.lit(None).cast("string"))

    if mode == "rfc3164":
        use3, use5 = ok3, F.lit(False)
    elif mode == "rfc5424":
        use3, use5 = F.lit(False), ok5
    elif mode == "auto":
        use3, use5 = ok3, ~ok3 & ok5
    else:
        raise ValueError(f"syslog_parse: unknown mode {mode!r}")

    parsed = use3 | use5
    if not ignore_parse_failure:
        df = df.filter(parsed)  # reference drops the line with a warning

    pri = F.when(use3, pri3).when(use5, pri5).otherwise(F.lit(-1))
    ns = F.when(use3, F.unix_micros(ts3) * 1000).when(
        use5, F.unix_micros(ts5) * 1000
    )
    return df.withColumns(
        {
            "_program_": F.when(use3, prog3).when(
                use5, F.coalesce(app5, F.lit(""))
            ).otherwise(F.lit("")),
            "_priority_": pri,
            "_facility_": F.when(parsed, F.floor(pri / 8).cast("int")).otherwise(
                F.lit(-1)
            ),
            "_severity_": F.when(parsed, F.pmod(pri, F.lit(8))).otherwise(
                F.lit(-1)
            ),
            "_unixtimestamp_": ns.cast("long").cast("string"),
            "_hostname_": F.when(use3, host3).when(use5, host5),
            "_content_": F.when(use3, content3)
            .when(use5, content5)
            .otherwise(line),
            "_structured_data_": F.when(use5, sd5),
            "_message_id_": F.when(use5, msgid5),
            "_process_id_": F.when(use5, proc5),
        }
    )
