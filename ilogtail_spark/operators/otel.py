"""OTLP trace / metric decoding (SURVEY.md §2 extension processors).

``processor_otel_trace`` / ``processor_otel_metric``
(plugins/processor/otel/processor_otel_trace.go:31-155,
processor_otel_metric.go:31-151) decode OpenTelemetry payloads carried
in a log field and fan each span / metric datapoint out into flat SLS
rows.  The reference supports ``json`` (pdata JSON), ``protobuf`` and
``protojson`` wire forms; ALL THREE are implemented: the JSON
encodings — the public OTLP/JSON spec — decode with ``from_json`` +
explode, and ``Format=protobuf`` prepends one Arrow-batched
descriptor-walk (operators/pb.py) that lifts the wire bytes to their
protojson form, so both wire families share the identical downstream
plan.  (On a cluster with the spark-protobuf jar the UDF hop swaps
for ``from_protobuf`` unchanged.)

Span conversion mirrors
pkg/protocol/decoder/opentelemetry/otlp_trace_parser.go:112-216: one
output row per span carrying resource shortcuts (``host`` /
``service`` from the eponymous resource attributes, remaining resource
attributes as a sorted-key JSON object), scope name/version, ids,
short-string kind / statusCode, start / end / duration in
MICROseconds (integer division of the nanosecond fields), span
attributes as a typed sorted-key JSON object (Go ``json.Marshal`` of
``map[string]any`` sorts keys — we replicate that ordering), and
events ("logs") / links as JSON arrays with alphabetical keys.

Metric conversion mirrors otlp_metric_parser.go:48-298: resource
attributes become base labels; gauge / sum / histogram / summary /
exponentialHistogram datapoints fan out into
``(__name__, __labels__, __time_nano__, __value__)`` rows with the
reference's ``_sum/_count/_min/_max/_bucket/_exemplars`` suffix
scheme, cumulative ``le`` buckets, summary quantile labels, and
exponential-histogram ``(lo,hi]`` bucket field names
(pkg/protocol/otlp/metric_helper.go:31-36).  ``__labels__`` uses the
sorted ``k#$#v|...`` join of pkg/helper/log_helper.go:210-229.

Everything is codegen expressions (from_json, explode, transform /
filter / aggregate lambdas) — no UDF, no shuffle; decode parallelism
is the scan's.  Documented deviations: a span with
``endTimeUnixNano`` absent falls back to its start time (the
reference stamps wall-clock now — nondeterministic, untestable);
numeric JSON/label formatting matches Go's shortest form only for
values that Go prints without an exponent (integral values and plain
decimals — the practical label/bound domain).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.common import go_num
from ilogtail_spark.operators.registry import cfg_pop, register

# --------------------------------------------------------------------------
# OTLP JSON schemas (public opentelemetry-proto JSON encoding).  Numeric
# 64-bit fields are declared STRING — protojson encodes (u)int64 as JSON
# strings, pdata JSON as numbers; StringType accepts both token kinds and
# the plan casts explicitly (ANSI-safe try_cast).
# --------------------------------------------------------------------------

_ANYVAL = (
    "struct<stringValue:string,intValue:string,doubleValue:double,"
    "boolValue:boolean>"
)
_KVS = f"array<struct<key:string,value:{_ANYVAL}>>"

_SPAN = (
    "struct<traceId:string,spanId:string,parentSpanId:string,name:string,"
    "kind:string,startTimeUnixNano:string,endTimeUnixNano:string,"
    f"attributes:{_KVS},"
    f"events:array<struct<timeUnixNano:string,name:string,attributes:{_KVS}>>,"
    f"links:array<struct<traceId:string,spanId:string,attributes:{_KVS}>>,"
    "traceState:string,status:struct<code:string,message:string>>"
)
_SCOPE_SPANS = (
    f"array<struct<scope:struct<name:string,version:string>,spans:array<{_SPAN}>>>"
)
# top level accepts both a full TracesData {"resourceSpans": [...]} (json
# format) and a bare ResourceSpans object (the protojson form the
# reference feeds ConvertResourceSpans).
TRACE_SCHEMA = (
    f"struct<resourceSpans:array<struct<resource:struct<attributes:{_KVS}>,"
    f"scopeSpans:{_SCOPE_SPANS}>>,"
    f"resource:struct<attributes:{_KVS}>,scopeSpans:{_SCOPE_SPANS}>"
)

_EXEMPLAR = (
    "struct<timeUnixNano:string,asDouble:double,asInt:string,"
    f"traceId:string,spanId:string,filteredAttributes:{_KVS}>"
)
_NDP = (
    f"struct<attributes:{_KVS},timeUnixNano:string,asDouble:double,"
    f"asInt:string,exemplars:array<{_EXEMPLAR}>>"
)
_HDP = (
    f"struct<attributes:{_KVS},timeUnixNano:string,count:string,sum:double,"
    "min:double,max:double,bucketCounts:array<string>,"
    f"explicitBounds:array<double>,exemplars:array<{_EXEMPLAR}>>"
)
_SDP = (
    f"struct<attributes:{_KVS},timeUnixNano:string,count:string,sum:double,"
    "quantileValues:array<struct<quantile:double,value:double>>>"
)
_BUCKETS = "struct<offset:int,bucketCounts:array<string>>"
_EDP = (
    f"struct<attributes:{_KVS},timeUnixNano:string,count:string,sum:double,"
    f"min:double,max:double,zeroCount:string,scale:int,"
    f"positive:{_BUCKETS},negative:{_BUCKETS},exemplars:array<{_EXEMPLAR}>>"
)
_METRIC = (
    f"struct<name:string,gauge:struct<dataPoints:array<{_NDP}>>,"
    f"sum:struct<dataPoints:array<{_NDP}>,isMonotonic:boolean>,"
    f"histogram:struct<dataPoints:array<{_HDP}>>,"
    f"summary:struct<dataPoints:array<{_SDP}>>,"
    f"exponentialHistogram:struct<dataPoints:array<{_EDP}>>>"
)
_SCOPE_METRICS = (
    f"array<struct<scope:struct<name:string,version:string>,"
    f"metrics:array<{_METRIC}>>>"
)
METRIC_SCHEMA = (
    f"struct<resourceMetrics:array<struct<resource:struct<attributes:{_KVS}>,"
    f"scopeMetrics:{_SCOPE_METRICS}>>,"
    f"resource:struct<attributes:{_KVS}>,scopeMetrics:{_SCOPE_METRICS}>"
)


# --------------------------------------------------------------------------
# scalar helpers (all pure expressions)
# --------------------------------------------------------------------------

def _json_quote(c: Column) -> Column:
    """JSON string literal (quoted + escaped) of a string column —
    ``to_json`` only takes container types, so wrap in a 1-element
    array and strip the brackets."""
    arr = F.to_json(F.array(F.coalesce(c, F.lit(""))))
    return arr.substr(F.lit(2), F.length(arr) - F.lit(2))


_fmt_num = go_num  # shared Go shortest-number form (common.go_num)


def _any_json(v: Column) -> Column:
    """AnyValue -> typed JSON value text, per pdata ``AsRaw`` +
    ``json.Marshal``: strings quote, ints / doubles stay numbers,
    bools stay bools (otlp_trace_parser.go:195-200)."""
    return (
        F.when(v["stringValue"].isNotNull(), _json_quote(v["stringValue"]))
        .when(v["intValue"].isNotNull(), v["intValue"])
        .when(v["doubleValue"].isNotNull(), _fmt_num(v["doubleValue"]))
        .when(v["boolValue"].isNotNull() & v["boolValue"], F.lit("true"))
        .when(v["boolValue"].isNotNull(), F.lit("false"))
        .otherwise(F.lit('""'))
    )


def _any_str(v: Column) -> Column:
    """AnyValue -> plain string, per anyValueToString
    (otlp_metric_parser.go:26-46)."""
    return (
        F.when(v["stringValue"].isNotNull(), v["stringValue"])
        .when(v["intValue"].isNotNull(), v["intValue"])
        .when(v["doubleValue"].isNotNull(), _fmt_num(v["doubleValue"]))
        .when(v["boolValue"].isNotNull() & v["boolValue"], F.lit("true"))
        .when(v["boolValue"].isNotNull(), F.lit("false"))
        .otherwise(F.lit(""))
    )


def _kv_json_obj(entries: Column) -> Column:
    """``array<struct<key,value:AnyValue>>`` -> Go-marshal-shaped JSON
    object text: duplicate keys last-wins (Go map build), keys sorted
    (``json.Marshal`` of a map).  Null / absent arrays give ``{}``."""
    pairs = F.transform(
        entries,
        lambda e, i: F.struct(
            e["key"].alias("k"), i.alias("i"), _any_json(e["value"]).alias("v")
        ),
    )
    srt = F.array_sort(pairs)  # (key, input-index) ordering
    last = F.filter(  # keep the last run-member per key (Go map last-wins)
        srt,
        lambda x, i: F.coalesce(
            F.try_element_at(srt, i + F.lit(2))["k"] != x["k"], F.lit(True)
        ),
    )
    body = F.array_join(
        F.transform(
            last, lambda x: F.concat(_json_quote(x["k"]), F.lit(":"), x["v"])
        ),
        ",",
    )
    return F.coalesce(F.concat(F.lit("{"), body, F.lit("}")), F.lit("{}"))


def _kv_strs(entries: Column) -> Column:
    """``array<struct<key,value:AnyValue>>`` -> label entry structs
    (k, v strings); null arrays give the empty array."""
    empty = F.array().cast("array<struct<k:string,v:string>>")
    return F.coalesce(
        F.transform(
            entries,
            lambda e: F.struct(e["key"].alias("k"), _any_str(e["value"]).alias("v")),
        ),
        empty,
    )


def _labels_fmt(entries: Column) -> Column:
    """Label structs -> the SLS ``__labels__`` string: sort by name,
    join ``name#$#value`` with ``|`` (log_helper.go:210-229)."""
    return F.array_join(
        F.transform(
            F.array_sort(entries),
            lambda e: F.concat(e["k"], F.lit("#$#"), e["v"]),
        ),
        "|",
    )


def _idiv(ns: Column, d: int) -> Column:
    """Integer division of an epoch-nanos long (Go uint64 / d) via
    exact decimal arithmetic — a double round-trip loses precision
    above 2^53, and ``~1.7e18`` nanos is well past that."""
    return F.floor(ns.try_cast("long").cast("decimal(20,0)") / F.lit(d)).cast(
        "long"
    )


_KIND_MAP = {
    "1": "internal", "SPAN_KIND_INTERNAL": "internal",
    "2": "server", "SPAN_KIND_SERVER": "server",
    "3": "client", "SPAN_KIND_CLIENT": "client",
    "4": "producer", "SPAN_KIND_PRODUCER": "producer",
    "5": "consumer", "SPAN_KIND_CONSUMER": "consumer",
}
_STATUS_MAP = {
    "1": "OK", "STATUS_CODE_OK": "OK",
    "2": "ERROR", "STATUS_CODE_ERROR": "ERROR",
}


def _enum_map(c: Column, table: dict[str, str], default: str) -> Column:
    out = None
    for k, v in table.items():
        out = (out.when if out is not None else F.when)(c == k, v)
    return out.otherwise(default)


# --------------------------------------------------------------------------
# trace decode
# --------------------------------------------------------------------------

def otel_trace_parse(
    df: DataFrame,
    source_key: str = "otel",
    keep: list[str] | None = None,
    wire: str = "json",
) -> DataFrame:
    """processor_otel_trace, Format=json/protojson/protobuf
    (processor_otel_trace.go:68-115): decode the OTLP trace payload
    carried in ``source_key`` and emit one row per span with the
    otlp_trace_parser.go:132-216 field layout.  Invalid payloads (or a
    null source) yield no rows — the reference drops the log with a
    warning.  ``keep`` carries input columns through (the reference
    replaces the event wholesale; carrying ids keeps the output
    joinable, same convention as our other parsers).

    ``wire="protobuf"``: the binary column first converts to its
    protojson form (descriptor-driven varint walker, pb.py, Arrow
    batches) and the IDENTICAL from_json plan runs downstream — one
    decode semantics, two wire forms."""
    keep = keep or []
    if wire == "protobuf":
        from ilogtail_spark.operators.pb import otlp_pb_to_json_udf

        # materialize the UDF output in ITS OWN projection: the doc
        # expression is referenced by several downstream explodes, and
        # an inlined Python UDF would re-execute per reference (the
        # expression-reuse trap — this was a 7x slowdown)
        df = df.withColumn("_pj", otlp_pb_to_json_udf("trace")(F.col(source_key)))
        src = F.col("_pj")
    else:
        src = F.col(source_key)
    doc = F.from_json(src, TRACE_SCHEMA)
    rs_arr = F.coalesce(
        doc["resourceSpans"],
        F.when(
            doc["scopeSpans"].isNotNull(),
            F.array(
                F.struct(
                    doc["resource"].alias("resource"),
                    doc["scopeSpans"].alias("scopeSpans"),
                )
            ),
        ),
    )
    out = (
        df.select(*keep, F.explode(rs_arr).alias("_rs"))
        .select(
            *keep,
            F.coalesce(F.col("_rs")["resource"]["attributes"],
                       F.expr(f"cast(array() as {_KVS})")).alias("_rattrs"),
            F.explode(F.col("_rs")["scopeSpans"]).alias("_ss"),
        )
        .select(
            *keep,
            "_rattrs",
            F.coalesce(F.col("_ss")["scope"]["name"], F.lit("")).alias("_sname"),
            F.coalesce(F.col("_ss")["scope"]["version"], F.lit("")).alias("_sver"),
            F.explode(F.col("_ss")["spans"]).alias("_sp"),
        )
    )
    sp = F.col("_sp")
    res_attr = lambda name: F.coalesce(  # noqa: E731
        _any_str(
            F.try_element_at(
                F.filter(F.col("_rattrs"), lambda e: e["key"] == name), F.lit(1)
            )["value"]
        ),
        F.lit(""),
    )
    rest = F.filter(
        F.col("_rattrs"),
        lambda e: (e["key"] != "host.name") & (e["key"] != "service.name"),
    )
    start_ns = sp["startTimeUnixNano"].try_cast("long")
    # endTimeUnixNano == 0/absent: reference stamps wall-clock now
    # (otlp_trace_parser.go:133-135) — nondeterministic; we fall back
    # to the span start (documented deviation).
    end_ns = F.coalesce(
        F.nullif(sp["endTimeUnixNano"].try_cast("long"), F.lit(0)), start_ns
    )
    ev_sorted = F.transform(  # json.Marshal key order: attribute,name,time
        F.coalesce(sp["events"], F.expr("array()")),
        lambda e: F.struct(
            _kv_json_obj(e["attributes"]).alias("attribute"),
            F.coalesce(e["name"], F.lit("")).alias("name"),
            F.coalesce(e["timeUnixNano"].try_cast("long"), F.lit(0)).alias("time"),
        ),
    )
    lk_sorted = F.transform(  # key order: attribute, spanID, traceID
        F.coalesce(sp["links"], F.expr("array()")),
        lambda e: F.struct(
            _kv_json_obj(e["attributes"]).alias("attribute"),
            F.coalesce(e["spanId"], F.lit("")).alias("spanID"),
            F.coalesce(e["traceId"], F.lit("")).alias("traceID"),
        ),
    )

    # the ``attribute`` member is pre-built JSON text — to_json would
    # re-escape it, so assemble the array bodies manually
    def _events_json(structs: Column) -> Column:
        return F.concat(
            F.lit("["),
            F.array_join(
                F.transform(
                    structs,
                    lambda s: F.concat(
                        F.lit('{"attribute":'), s["attribute"],
                        F.lit(',"name":'), _json_quote(s["name"]),
                        F.lit(',"time":'), s["time"].cast("string"),
                        F.lit("}"),
                    ),
                ),
                ",",
            ),
            F.lit("]"),
        )

    def _links_json(structs: Column) -> Column:
        return F.concat(
            F.lit("["),
            F.array_join(
                F.transform(
                    structs,
                    lambda s: F.concat(
                        F.lit('{"attribute":'), s["attribute"],
                        F.lit(',"spanID":'), _json_quote(s["spanID"]),
                        F.lit(',"traceID":'), _json_quote(s["traceID"]),
                        F.lit("}"),
                    ),
                ),
                ",",
            ),
            F.lit("]"),
        )

    return out.select(
        *keep,
        res_attr("host.name").alias("host"),
        res_attr("service.name").alias("service"),
        _kv_json_obj(rest).alias("resource"),
        F.col("_sname").alias("otlp.name"),
        F.col("_sver").alias("otlp.version"),
        F.coalesce(sp["traceId"], F.lit("")).alias("traceID"),
        F.coalesce(sp["spanId"], F.lit("")).alias("spanID"),
        F.coalesce(sp["parentSpanId"], F.lit("")).alias("parentSpanID"),
        _enum_map(sp["kind"], _KIND_MAP, "").alias("kind"),
        F.coalesce(sp["name"], F.lit("")).alias("name"),
        _links_json(lk_sorted).alias("links"),
        _events_json(ev_sorted).alias("logs"),
        F.coalesce(sp["traceState"], F.lit("")).alias("traceState"),
        _idiv(start_ns, 1000).alias("start"),
        _idiv(end_ns, 1000).alias("end"),
        _idiv(end_ns - start_ns, 1000).alias("duration"),
        _kv_json_obj(sp["attributes"]).alias("attribute"),
        _enum_map(sp["status"]["code"], _STATUS_MAP, "UNSET").alias("statusCode"),
        F.coalesce(sp["status"]["message"], F.lit("")).alias("statusMessage"),
        _idiv(end_ns, 1000000000).alias("time"),
    )


# --------------------------------------------------------------------------
# metric decode
# --------------------------------------------------------------------------

_ROW_T = "struct<name:string,lbl:array<struct<k:string,v:string>>,t:bigint,v:double>"


def _row(name: Column, lbl: Column, t: Column, v: Column) -> Column:
    return F.struct(
        name.alias("name"), lbl.alias("lbl"),
        F.coalesce(t.try_cast("long"), F.lit(0)).alias("t"),
        F.coalesce(v.cast("double"), F.lit(0.0)).alias("v"),
    )


def _exemplar_rows(name: Column, base_lbl: Column, exemplars: Column) -> Column:
    """name_exemplars rows (otlp_metric_parser.go:247-266): labels grow
    traceId / spanId (when non-empty) + filteredAttributes."""
    return F.transform(
        F.coalesce(exemplars, F.expr(f"cast(array() as array<{_EXEMPLAR}>)")),
        lambda ex: _row(
            F.concat(name, F.lit("_exemplars")),
            F.concat(
                base_lbl,
                F.filter(
                    F.array(
                        F.struct(F.lit("traceId").alias("k"),
                                 F.coalesce(ex["traceId"], F.lit("")).alias("v")),
                        F.struct(F.lit("spanId").alias("k"),
                                 F.coalesce(ex["spanId"], F.lit("")).alias("v")),
                    ),
                    lambda s: s["v"] != "",
                ),
                _kv_strs(ex["filteredAttributes"]),
            ),
            ex["timeUnixNano"],
            F.coalesce(ex["asDouble"], ex["asInt"].try_cast("double"), F.lit(0.0)),
        ),
    )


def _nonzero_row(name: Column, suffix: str, lbl: Column, t: Column,
                 v: Column) -> Column:
    """CASE row for the sum/min/max != 0 guards (otlp_metric_parser.go:
    189-197) — null marker filtered out by the caller."""
    return F.when(
        v.isNotNull() & (v != 0),
        _row(F.concat(name, F.lit(suffix)), lbl, t, v),
    )


def _cum_buckets(name: Column, lbl: Column, t: Column, bounds: Column,
                 counts: Column) -> Column:
    """Cumulative explicit-bound buckets with ``le`` labels; bound
    count = min(len(bounds)+1, len(counts)), last bound ``+Inf``
    (otlp_metric_parser.go:205-225)."""
    n = F.least(F.size(bounds) + F.lit(1), F.size(counts))
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(F.expr("array()"))
    return F.transform(
        idx,
        lambda j: _row(
            F.concat(name, F.lit("_bucket")),
            F.concat(
                lbl,
                F.array(F.struct(
                    F.lit("le").alias("k"),
                    F.coalesce(
                        _fmt_num(F.try_element_at(bounds, j)), F.lit("+Inf")
                    ).alias("v"),
                )),
            ),
            t,
            F.aggregate(
                F.slice(counts, 1, j), F.lit(0.0),
                lambda acc, x: acc + F.coalesce(x.try_cast("double"), F.lit(0.0)),
            ),
        ),
    )


def _exp_buckets(name: Column, lbl: Column, t: Column, scale: Column,
                 buckets: Column, positive: bool) -> Column:
    """Exponential-histogram buckets: base = 2^(2^-scale), bucket i
    spans (base^(offset+i), base^(offset+i+1)] — field names per
    ComposeBucketFieldName (metric_helper.go:31-36), plus the
    positive.offset / negative.offset marker row
    (otlp_metric_parser.go:100-138)."""
    base = F.pow(F.lit(2.0), F.pow(F.lit(2.0), -scale.cast("double")))
    off = F.coalesce(buckets["offset"], F.lit(0)).cast("double")
    counts = F.coalesce(
        buckets["bucketCounts"], F.expr("cast(array() as array<string>)")
    )
    le = F.lit("le")
    mk_key = lambda lo, hi: (  # noqa: E731
        F.concat(F.lit("("), _fmt_num(lo), F.lit(","), _fmt_num(hi), F.lit("]"))
        if positive
        else F.concat(F.lit("["), _fmt_num(-hi), F.lit(","), _fmt_num(-lo),
                      F.lit(")"))
    )
    idx = F.when(F.size(counts) >= 1,
                 F.sequence(F.lit(1), F.size(counts))).otherwise(F.expr("array()"))
    bucket_rows = F.transform(
        idx,
        lambda j: _row(
            F.concat(name, F.lit("_bucket")),
            F.concat(lbl, F.array(F.struct(
                le.alias("k"),
                mk_key(F.pow(base, off + j.cast("double") - 1),
                       F.pow(base, off + j.cast("double"))).alias("v"),
            ))),
            t,
            F.try_element_at(counts, j).try_cast("double"),
        ),
    )
    marker = F.array(_row(
        F.concat(name, F.lit("_bucket")),
        F.concat(lbl, F.array(F.struct(
            le.alias("k"),
            F.lit("positive.offset" if positive else "negative.offset").alias("v"),
        ))),
        t,
        off,
    ))
    return F.concat(bucket_rows, marker)


def otel_metric_parse(
    df: DataFrame,
    source_key: str = "otel",
    keep: list[str] | None = None,
    wire: str = "json",
) -> DataFrame:
    """processor_otel_metric, Format=json/protojson/protobuf
    (processor_otel_metric.go:66-100 → ConvertOtlpMetrics,
    otlp_metric_parser.go:48-75): decode the OTLP metric payload in
    ``source_key`` into SLS metric rows
    ``(__name__, __labels__, __time_nano__, __value__)``.  Resource
    attributes seed the label set; each datapoint's attributes extend
    it; histogram buckets are cumulative with ``le`` labels; summary
    quantiles label ``quantile``; sums add
    ``otlp.metric.ismonotonic``; exponential histograms emit
    ``(lo,hi]`` / offset / zero.count bucket rows; every datapoint's
    exemplars emit ``<name>_exemplars`` rows.

    ``wire="protobuf"``: binary MetricsData converts to protojson via
    the pb.py descriptor walker first; downstream plan identical."""
    keep = keep or []
    if wire == "protobuf":
        from ilogtail_spark.operators.pb import otlp_pb_to_json_udf

        # own projection — see otel_trace_parse (expression-reuse trap)
        df = df.withColumn("_pj", otlp_pb_to_json_udf("metric")(F.col(source_key)))
        src = F.col("_pj")
    else:
        src = F.col(source_key)
    doc = F.from_json(src, METRIC_SCHEMA)
    rm_arr = F.coalesce(
        doc["resourceMetrics"],
        F.when(
            doc["scopeMetrics"].isNotNull(),
            F.array(F.struct(
                doc["resource"].alias("resource"),
                doc["scopeMetrics"].alias("scopeMetrics"),
            )),
        ),
    )
    # NOTE each explode lives in its own projection: Catalyst's alias
    # cleanup strips Alias nodes inside nested lambda structs when the
    # same select list carries a generator, which breaks every k/v
    # field name built by _kv_strs and friends.
    out = (
        df.select(*keep, F.explode(rm_arr).alias("_rm"))
        .select(
            *keep,
            "_rm",
            _kv_strs(F.col("_rm")["resource"]["attributes"]).alias("_rlbl"),
        )
        .select(*keep, "_rlbl", F.explode(F.col("_rm")["scopeMetrics"]).alias("_sm"))
        .select(*keep, "_rlbl", F.explode(F.col("_sm")["metrics"]).alias("_m"))
    )
    m = F.col("_m")
    name = F.coalesce(m["name"], F.lit(""))
    empty_rows = F.expr(f"cast(array() as array<{_ROW_T}>)")
    no_lbl = F.expr("cast(array() as array<struct<k:string,v:string>>)")

    # normalize the five datapoint shapes into one struct so the row
    # builders below compile ONCE (the naive per-type inline form
    # re-instantiated the label/row expressions ~25x and spent ~10 s in
    # codegen before the first row moved)
    null_of = lambda t: F.lit(None).cast(t)  # noqa: E731

    def _ndp(typ, dp, num=None, summ=None, smin=None, smax=None, cnt=None,
             bcounts=None, bounds=None, quants=None, zero=None, scale=None,
             pos=None, neg=None, ex=None, mono=None):
        return F.struct(
            F.lit(typ).alias("typ"),
            F.coalesce(dp["attributes"],
                       F.expr(f"cast(array() as {_KVS})")).alias("attrs"),
            dp["timeUnixNano"].alias("t"),
            (null_of("double") if num is None else num).alias("num"),
            (null_of("double") if summ is None else summ).alias("sum"),
            (null_of("double") if smin is None else smin).alias("min"),
            (null_of("double") if smax is None else smax).alias("max"),
            (null_of("string") if cnt is None else cnt).alias("cnt"),
            (null_of("array<string>") if bcounts is None else bcounts).alias(
                "bcounts"),
            (null_of("array<double>") if bounds is None else bounds).alias(
                "bounds"),
            (null_of("array<struct<quantile:double,value:double>>")
             if quants is None else quants).alias("quants"),
            (null_of("string") if zero is None else zero).alias("zero"),
            (null_of("int") if scale is None else scale).alias("scale"),
            (null_of(_BUCKETS) if pos is None else pos).alias("pos"),
            (null_of(_BUCKETS) if neg is None else neg).alias("neg"),
            (F.expr(f"cast(array() as array<{_EXEMPLAR}>)")
             if ex is None else F.coalesce(ex, F.expr(
                 f"cast(array() as array<{_EXEMPLAR}>)"))).alias("ex"),
            (null_of("boolean") if mono is None else mono).alias("mono"),
        )

    num_val = lambda dp: F.coalesce(  # noqa: E731  value2Float
        dp["asDouble"], dp["asInt"].try_cast("double"), F.lit(0.0)
    )
    dps_norm = (
        F.when(m["gauge"].isNotNull(), F.transform(
            m["gauge"]["dataPoints"],
            lambda dp: _ndp("g", dp, num=num_val(dp), ex=dp["exemplars"]),
        ))
        .when(m["sum"].isNotNull(), F.transform(
            m["sum"]["dataPoints"],
            lambda dp: _ndp("s", dp, num=num_val(dp), ex=dp["exemplars"],
                            mono=F.coalesce(m["sum"]["isMonotonic"],
                                            F.lit(False))),
        ))
        .when(m["histogram"].isNotNull(), F.transform(
            m["histogram"]["dataPoints"],
            lambda dp: _ndp("h", dp, summ=dp["sum"], smin=dp["min"],
                            smax=dp["max"], cnt=dp["count"],
                            bcounts=dp["bucketCounts"],
                            bounds=dp["explicitBounds"],
                            ex=dp["exemplars"]),
        ))
        .when(m["summary"].isNotNull(), F.transform(
            m["summary"]["dataPoints"],
            lambda dp: _ndp("y", dp, summ=dp["sum"], cnt=dp["count"],
                            quants=dp["quantileValues"]),
        ))
        .when(m["exponentialHistogram"].isNotNull(), F.transform(
            m["exponentialHistogram"]["dataPoints"],
            lambda dp: _ndp("e", dp, summ=dp["sum"], smin=dp["min"],
                            smax=dp["max"], cnt=dp["count"],
                            zero=dp["zeroCount"], scale=dp["scale"],
                            pos=dp["positive"], neg=dp["negative"],
                            ex=dp["exemplars"]),
        ))
    )
    out = (
        out.withColumn("_name", name)
        .withColumn("_dps", dps_norm)
        .select(*keep, "_rlbl", "_name", F.explode(F.col("_dps")).alias("_dp"))
    )
    dp = F.col("_dp")
    name = F.col("_name")
    # base label set for every row of this datapoint: resource attrs +
    # dp attrs (+ otlp.metric.ismonotonic for sums, which the
    # reference appends before exemplars too — sum2Logs:167-174);
    # materialized once, generator-free
    mono_part = F.when(
        dp["typ"] == "s",
        F.array(F.struct(
            F.lit("otlp.metric.ismonotonic").alias("k"),
            F.when(dp["mono"], "true").otherwise("false").alias("v"),
        )),
    ).otherwise(no_lbl)
    out = out.withColumn(
        "_lbl", F.concat(F.col("_rlbl"), _kv_strs(dp["attrs"]), mono_part)
    )
    lbl = F.col("_lbl")
    t = dp["t"]
    quantile_rows = F.transform(
        F.coalesce(dp["quants"], F.expr(
            "cast(array() as array<struct<quantile:double,value:double>>)")),
        lambda qv: _row(
            name,
            F.concat(lbl, F.array(F.struct(
                F.lit("quantile").alias("k"),
                F.coalesce(_fmt_num(qv["quantile"]), F.lit("0")).alias("v"),
            ))),
            t, qv["value"],
        ),
    )
    zero_row = F.array(_row(  # zero.count row (otlp_metric_parser.go:111-112)
        F.concat(name, F.lit("_bucket")),
        F.concat(lbl, F.array(F.struct(F.lit("le").alias("k"),
                                       F.lit("zero.count").alias("v")))),
        t, F.coalesce(dp["zero"].try_cast("double"), F.lit(0.0)),
    ))
    rows = F.concat(
        # gauge / sum value row
        F.when(dp["typ"].isin("g", "s"),
               F.array(_row(name, lbl, t, dp["num"]))).otherwise(empty_rows),
        # histogram / exp-histogram != 0 guards (parser:85-93,189-197)
        F.when(
            dp["typ"].isin("h", "e"),
            F.filter(
                F.array(
                    _nonzero_row(name, "_sum", lbl, t, dp["sum"]),
                    _nonzero_row(name, "_min", lbl, t, dp["min"]),
                    _nonzero_row(name, "_max", lbl, t, dp["max"]),
                ),
                lambda r: r.isNotNull(),
            ),
        ).otherwise(empty_rows),
        # summary emits _sum unconditionally (parser:147)
        F.when(dp["typ"] == "y",
               F.array(_row(F.concat(name, F.lit("_sum")), lbl, t,
                            dp["sum"]))).otherwise(empty_rows),
        # _count for histogram / summary / exp-histogram
        F.when(
            dp["typ"].isin("h", "y", "e"),
            F.array(_row(F.concat(name, F.lit("_count")), lbl, t,
                         dp["cnt"].try_cast("double"))),
        ).otherwise(empty_rows),
        F.when(
            dp["typ"] == "h",
            _cum_buckets(name, lbl, t,
                         F.coalesce(dp["bounds"],
                                    F.expr("cast(array() as array<double>)")),
                         F.coalesce(dp["bcounts"],
                                    F.expr("cast(array() as array<string>)"))),
        ).otherwise(empty_rows),
        F.when(dp["typ"] == "y", quantile_rows).otherwise(empty_rows),
        F.when(
            dp["typ"] == "e",
            F.concat(
                _exp_buckets(name, lbl, t, F.coalesce(dp["scale"], F.lit(0)),
                             dp["pos"], True),
                _exp_buckets(name, lbl, t, F.coalesce(dp["scale"], F.lit(0)),
                             dp["neg"], False),
                zero_row,
            ),
        ).otherwise(empty_rows),
        _exemplar_rows(name, lbl, dp["ex"]),
    )
    # materialize the row array generator-free (see NOTE above), then explode
    out = out.withColumn("_rows", rows).select(
        *keep, F.explode(F.col("_rows")).alias("_r")
    )
    r = F.col("_r")
    return out.select(
        *keep,
        r["name"].alias("__name__"),
        _labels_fmt(r["lbl"]).alias("__labels__"),
        r["t"].alias("__time_nano__"),
        r["v"].alias("__value__"),
    )


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

def _wire_of(fmt: str) -> str:
    """Map the reference's Format values (processor_otel_trace.go:50:
    json / protojson / protobuf) onto the two plan legs: both JSON
    encodings share the from_json plan; protobuf prepends the pb walk."""
    if fmt not in ("json", "protojson", "protobuf"):
        raise ValueError(f"processor_otel_*: unsupported Format '{fmt}'")
    return "protobuf" if fmt == "protobuf" else "json"


@register("processor_otel_trace")
def _otel_trace_factory(**cfg):
    src = cfg_pop(cfg, "SourceKey", "source_key", default="otel")
    wire = _wire_of(cfg_pop(cfg, "Format", "format", default="json"))
    keep = cfg_pop(cfg, "Keep", "keep", default=None)
    return lambda df: otel_trace_parse(df, source_key=src, keep=keep, wire=wire)


@register("processor_otel_metric")
def _otel_metric_factory(**cfg):
    src = cfg_pop(cfg, "SourceKey", "source_key", default="otel")
    wire = _wire_of(cfg_pop(cfg, "Format", "format", default="json"))
    keep = cfg_pop(cfg, "Keep", "keep", default=None)
    return lambda df: otel_metric_parse(df, source_key=src, keep=keep, wire=wire)
