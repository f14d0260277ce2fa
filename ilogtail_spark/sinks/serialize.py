"""Sink-side serialization converters (SURVEY.md §2.8 wire formats).

The reference's flusher layer converts events through named protocols
before writing (pkg/protocol/converter/converter.go:29-118):
``custom_single`` / ``custom_single_flatten`` (JSON objects),
``jsonline`` (flatten JSON, newline-joined at write), and
``influxdb`` (line protocol).  Here each converter is a pure codegen
expression producing one serialized string per row; the newline join /
byte batching is the file writer's concern (sinks/writer.py), exactly
as the reference splits converter vs flusher.

Layout parity:

* ``convertLogToMap`` (converter.go:230-283): content keys in the
  well-known tag table (``__path__`` → ``log.file.path``, …) move from
  contents to tags; the group source becomes the ``host.ip`` tag, a
  non-empty topic the ``log.topic`` tag.
* ``custom_single`` (custom_single_log.go:32-62): object with
  ``contents`` / ``tags`` / ``time`` — Go marshals maps with sorted
  keys, which is exactly that field order.
* ``custom_single_flatten`` (converter_single_log_flatten.go:25-59):
  contents + tags (unless OnlyContents) + ``time`` merged into one
  object, keys sorted.
* ``influxdb`` (influxdb_metric.go:32-86): one line per SLS metric row
  — measurement from ``__name__``, sorted tags from ``__labels__``,
  single float field, nanosecond timestamp; comma/equals/space
  escaping per the public line-protocol spec.  Numbers print in Go's
  shortest no-exponent form (the practical metric domain; documented
  limit of the cross-engine formatting helper).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.common import go_num
from ilogtail_spark.operators.registry import cfg_pop, register

# converter.go:81-95 tagConversionMap (K8sFlag=false branch)
TAG_CONVERSION = {
    "__path__": "log.file.path",
    "__hostname__": "host.name",
    "_node_ip_": "k8s.node.ip",
    "_node_name_": "k8s.node.name",
    "_namespace_": "k8s.namespace.name",
    "_pod_name_": "k8s.pod.name",
    "_pod_ip_": "k8s.pod.ip",
    "_pod_uid_": "k8s.pod.uid",
    "_container_name_": "container.name",
    "_container_ip_": "container.ip",
    "_image_name_": "container.image.name",
}


def _split_contents_tags(
    df: DataFrame,
    content_cols: list[str],
    tags: dict[str, str] | None,
    source: str | None,
    topic: str | None,
) -> tuple[list[tuple[str, Column]], list[tuple[str, Column]]]:
    """convertLogToMap: well-known content keys become tags; source →
    host.ip, topic → log.topic.  Returns (contents, tags) as
    (out-key, column) pairs."""
    contents: list[tuple[str, Column]] = []
    tag_pairs: list[tuple[str, Column]] = []
    for c in content_cols:
        key = c[len("__tag__:"):] if c.startswith("__tag__:") else c
        if key == "__user_defined_id__" and c.startswith("__tag__:"):
            continue
        if c == "__log_topic__":
            tag_pairs.append(("log.topic", F.col(f"`{c}`")))
        elif key in TAG_CONVERSION:
            tag_pairs.append((TAG_CONVERSION[key], F.col(f"`{c}`")))
        elif c.startswith("__tag__:"):
            tag_pairs.append((key, F.col(f"`{c}`")))
        else:
            contents.append((c, F.col(f"`{c}`")))
    for k, v in (tags or {}).items():
        tag_pairs.append((k, F.lit(v)))
    if source is not None:
        tag_pairs.append(("host.ip", F.lit(source)))
    if topic:
        tag_pairs.append(("log.topic", F.lit(topic)))
    return contents, tag_pairs


def _obj(pairs: list[tuple[str, Column]]) -> Column:
    """Sorted-key JSON object of string values (Go json.Marshal of
    map[string]string)."""
    merged: dict[str, Column] = {}
    for k, col in pairs:  # later wins, like the Go map build
        merged[k] = F.coalesce(col.cast("string"), F.lit(""))
    if not merged:
        return F.lit("{}")
    return F.to_json(F.struct(*[merged[k].alias(k) for k in sorted(merged)]))


def serialize_single(
    df: DataFrame,
    content_cols: list[str],
    time_col: str = "ts",
    tags: dict[str, str] | None = None,
    source: str | None = "",
    topic: str | None = None,
    flatten: bool = False,
    only_contents: bool = False,
    dest: str = "__line__",
) -> DataFrame:
    """``custom_single`` / ``custom_single_flatten`` JSON encoding
    (custom_single_log.go:32-86, converter_single_log_flatten.go:
    25-59): one JSON object per row in ``dest``.  ``time`` is epoch
    seconds (protocol.Log.Time)."""
    contents, tag_pairs = _split_contents_tags(df, content_cols, tags, source, topic)
    t = F.unix_seconds(F.col(time_col).cast("timestamp"))
    if flatten:
        pairs = contents + ([] if only_contents else tag_pairs)
        # Go merges contents then tags then time into ONE map (later
        # wins on key collisions) and marshals with sorted keys
        merged: dict[str, Column] = {}
        for k, col in pairs:
            merged[k] = F.coalesce(col.cast("string"), F.lit(""))
        merged["time"] = t  # stays numeric in the JSON
        line = F.to_json(
            F.struct(*[merged[k].alias(k) for k in sorted(merged)])
        )
    else:
        # Go marshals the 3-key map sorted: contents < tags < time —
        # but contents/tags are nested OBJECTS, so build the envelope
        # manually to avoid re-escaping the pre-built JSON text
        line = F.concat(
            F.lit('{"contents":'), _obj(contents),
            F.lit(',"tags":'), _obj(tag_pairs),
            F.lit(',"time":'), t.cast("string"),
            F.lit("}"),
        )
    return df.withColumn(dest, line)


def serialize_jsonline(df: DataFrame, *args, **kwargs) -> DataFrame:
    """``jsonline`` = flatten objects newline-joined at write
    (jsonline.go:15-40) — per-row the flatten encoding; the writer
    joins lines."""
    kwargs["flatten"] = True
    return serialize_single(df, *args, **kwargs)


def _esc(c: Column, chars: str) -> Column:
    """Influx line-protocol escaping: backslash before each of
    ``chars`` (public spec; measurement escapes ', ', tags/fields
    escape ',= ')."""
    rx = "([" + "".join("\\" + ch for ch in chars) + "])"
    return F.regexp_replace(c, rx, r"\\$1")


_fmt_float = go_num  # shared Go shortest-number form (common.go_num)


def serialize_influx(
    df: DataFrame,
    name_col: str = "__name__",
    labels_col: str = "__labels__",
    value_col: str = "__value__",
    time_col: str = "__time_nano__",
    field_col: str | None = None,
    dest: str = "__line__",
) -> DataFrame:
    """``influxdb`` line protocol over SLS metric rows
    (influxdb_metric.go:32-86): ``name,tag=v,... field=<float> <ns>``.
    ``__labels__`` is already the sorted ``k#$#v|...`` join, matching
    readSortedLabels; empty labels ⇒ no tag section.  Field naming per
    metricReader.readNames (converter_sls_metric.go:93-99): the
    ``__field__`` content (``field_col``) names the field and is
    trimmed from a ``name:field`` suffix; default/empty → ``value``.
    A null/empty timestamp omits the trailing nanosecond term (the
    reference's zero-time line)."""
    field = (
        F.coalesce(F.nullif(F.col(field_col), F.lit("")), F.lit("value"))
        if field_col
        else F.lit("value")
    )
    # NULL-tolerant per the Go converter: value2Float returns 0 on an
    # unparseable/absent value (influxdb_metric.go:60-66) and an absent
    # name serializes as the empty measurement — F.concat would
    # otherwise propagate a single NULL into dropping the whole line.
    name = F.coalesce(F.col(name_col), F.lit(""))
    measurement = F.when(
        (field != "value") & name.endswith(F.concat(F.lit(":"), field)),
        name.substr(F.lit(1), F.length(name) - F.length(field) - 1),
    ).otherwise(name)
    tags = F.array_join(
        F.transform(
            F.split(F.col(labels_col), r"\|"),
            lambda e: F.concat(
                _esc(F.substring_index(e, "#$#", 1), ",= "),
                F.lit("="),
                _esc(F.substring_index(e, "#$#", -1), ",= "),
            ),
        ),
        ",",
    )
    ts = F.col(time_col).cast("string")
    line = F.concat(
        _esc(measurement, ", "),
        F.when(F.coalesce(F.col(labels_col), F.lit("")) == "", F.lit(""))
        .otherwise(F.concat(F.lit(","), tags)),
        F.lit(" "),
        _esc(field, ",= "),
        F.lit("="),
        _fmt_float(F.coalesce(F.col(value_col).try_cast("double"), F.lit(0.0))),
        F.when(F.coalesce(ts, F.lit("")) == "", F.lit("")).otherwise(
            F.concat(F.lit(" "), ts)
        ),
    )
    return df.withColumn(dest, line)


def serialize_otlp_logs(
    df: DataFrame,
    content_cols: list[str],
    body_col: str = "content",
    level_col: str = "level",
    time_col: str = "ts",
    tags: dict[str, str] | None = None,
    source: str | None = "",
    topic: str | None = None,
    dest: str = "__line__",
) -> DataFrame:
    """``otlp_v1`` log encoding (otlp.go:43-103 →
    ConvertToOtlpResourseLogs): one OTLP/JSON ResourceLogs document per
    row with a single LogRecord — contents minus body/level become
    record attributes alongside the tags, ``content`` → body string,
    ``level`` → severityText, time → nanoseconds.  Deviations, both
    documented: attributes are key-sorted (the reference iterates Go
    maps — nondeterministic order with the same attribute SET) and
    observedTimeUnixNano is omitted (the reference stamps wall-clock
    now).  Group batching — many records per resourceLogs — is the
    writer's concern, like the newline join for jsonline."""
    contents, tag_pairs = _split_contents_tags(df, content_cols, tags, source, topic)
    res_attrs: list[tuple[str, Column]] = []
    if source:
        res_attrs.append(("source", F.lit(source)))
    if topic:
        res_attrs.append(("topic", F.lit(topic)))
    attr_pairs = [
        (k, c) for k, c in contents if k not in (body_col, level_col)
    ] + tag_pairs
    body = dict(contents).get(body_col)
    level = dict(contents).get(level_col)

    def attrs_arr(pairs):
        return F.array(*[
            F.struct(
                F.lit(k).alias("key"),
                F.struct(
                    F.coalesce(c.cast("string"), F.lit("")).alias("stringValue")
                ).alias("value"),
            )
            for k, c in sorted(pairs, key=lambda p: p[0])
        ])

    t_ns = F.unix_seconds(F.col(time_col).cast("timestamp")) * F.lit(1000000000)
    record_fields = [t_ns.cast("string").alias("timeUnixNano")]
    if level is not None:
        record_fields.append(
            F.coalesce(level.cast("string"), F.lit("")).alias("severityText")
        )
    if body is not None:
        record_fields.append(
            F.struct(
                F.coalesce(body.cast("string"), F.lit("")).alias("stringValue")
            ).alias("body")
        )
    record_fields.append(attrs_arr(attr_pairs).alias("attributes"))
    doc = F.struct(
        F.struct(attrs_arr(res_attrs).alias("attributes")).alias("resource"),
        F.array(
            F.struct(F.array(F.struct(*record_fields)).alias("logRecords"))
        ).alias("scopeLogs"),
    )
    return df.withColumn(dest, F.to_json(doc))


@register("flusher_stdout_serializer")
def _single_factory(**cfg):
    protocol = cfg_pop(cfg, "Protocol", "protocol", default="custom_single")
    content_cols = cfg_pop(cfg, "ContentCols", "content_cols")
    time_col = cfg_pop(cfg, "TimeCol", "time_col", default="ts")
    tags = cfg_pop(cfg, "Tags", "tags", default=None)
    only = cfg_pop(cfg, "OnlyContents", "only_contents", default=False)
    if protocol == "influxdb":
        return lambda df: serialize_influx(df)
    if protocol == "otlp_v1":
        return lambda df: serialize_otlp_logs(
            df, content_cols, time_col=time_col, tags=tags
        )
    flatten = protocol in ("custom_single_flatten", "jsonline")
    return lambda df: serialize_single(
        df, content_cols, time_col=time_col, tags=tags,
        flatten=flatten, only_contents=only,
    )
