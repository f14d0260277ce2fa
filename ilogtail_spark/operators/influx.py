"""InfluxDB line-protocol DECODE — service_http_server Format=influxdb.

Reference: ``plugins/input/httpserver`` routes request bodies through
``pkg/protocol/decoder/influxdb/decoder.go``; the v1 log pattern
(decoder.go:159-222 parsePointsToLogs) emits ONE log PER FIELD of
each point, shaped by helper.NewMetricLogStringVal
(pkg/helper/log_helper.go:270-289):

    __name__      measurement, or measurement:field when the field
                  key is not the default ``value`` (decoder.go:196-200)
    __time_nano__ 19-digit ns string (shorter stamps scale by 10^k,
                  log_helper.go:273-283)
    __labels__    tags sorted by key, ``k#$#v`` joined with ``|``
    __value__     float64 'g' / int decimal / bool 1|0 / raw string

``FieldsExtend`` adds ``__type__`` (float|int|bool|string) and
``__field__``, admits string-typed fields (skipped otherwise,
decoder.go:184-189), and stamps ``__tag__:db`` from the request's
``db`` query param (decoder.go:208-216).  Unsigned (``u``-suffixed)
fields fall through the decoder's type switch and are DROPPED
(decoder.go:171-175 yields uint64; parsePointsToLogs:169-192 has no
uint64 case).

The inverse of sinks/serialize.py::serialize_influx — decode∘encode
is pinned by tests.

Spark shape: one codegen pass — escape masking, quote-parity masking
(same sentinel idiom as operators/parse.py::quote_split), structural
splits, one explode per field. Zero Python, zero shuffle; parallelism
is the scan's.  Subset notes: the ``precision`` form param is not
modeled (callers pass ns, or s/ms/us stamps which the 10^k scaling
covers); lone backslashes pass through literally (the line-protocol
spec defines no backslash-escape).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.common import go_num
from ilogtail_spark.operators.registry import cfg_pop, register

# escape masks (applied BEFORE quote-parity so \" cannot break parity)
_E = {r"\,": "\x00\x11", r"\=": "\x00\x12", r"\ ": "\x00\x13",
      r"\"": "\x00\x14"}
# separator masks inside quoted regions
_Q = {",": "\x00\x15", "=": "\x00\x16", " ": "\x00\x17"}


def _unmask(c: Column) -> Column:
    for lit, mask in list(_Q.items()) + [
        (",", _E[r"\,"]), ("=", _E[r"\="]), (" ", _E[r"\ "]),
        ('"', _E[r"\""]),
    ]:
        c = F.replace(c, F.lit(mask), F.lit(lit))
    return c


def influx_decode(
    df: DataFrame,
    source_col: str = "content",
    keep: list[str] | None = None,
    fields_extend: bool = False,
    db: str = "",
    default_now_ns: int = 0,
) -> DataFrame:
    """One line-protocol line per input row → one output row per
    field, columns named exactly as the wire contents (module
    docstring).  Malformed lines (fewer than 2 / more than 3 space
    sections, empty measurement) and unparseable/skipped fields drop,
    mirroring the decoder's error-or-skip contract.  ``default_now_ns``
    stands in for the decoder's time.Now() on stamp-less lines — a
    deterministic injected clock, same convention as the mock inputs.
    """
    keep = list(keep or [])
    masked = F.col(source_col)
    for esc, m in _E.items():
        masked = F.replace(masked, F.lit(esc), F.lit(m))
    # quote parity: odd segments are inside double quotes
    segs = F.split(masked, '"', -1)
    masked = F.array_join(
        F.transform(
            segs,
            lambda s, i: F.when(
                i % 2 == 1,
                F.replace(
                    F.replace(
                        F.replace(s, F.lit(","), F.lit(_Q[","])),
                        F.lit("="), F.lit(_Q["="]),
                    ),
                    F.lit(" "), F.lit(_Q[" "]),
                ),
            ).otherwise(s),
        ),
        '"',
    )
    sec = F.split(masked, " ", -1)
    mt = F.split(F.element_at(sec, 1), ",", -1)
    measurement = _unmask(F.element_at(mt, 1))
    tag_structs = F.transform(
        F.slice(mt, 2, F.greatest(F.size(mt) - 1, F.lit(0))),
        lambda t: F.struct(
            _unmask(F.substring_index(t, "=", 1)).alias("key"),
            _unmask(F.substring_index(t, "=", -1)).alias("value"),
        ),
    )
    # MetricLabels.String(): ascending by key (log_helper.go) — the
    # struct sort's leading field IS the key
    labels = F.array_join(
        F.transform(
            F.array_sort(tag_structs),
            lambda s: F.concat(s["key"], F.lit("#$#"), s["value"]),
        ),
        "|",
    )
    ts_tok = F.when(F.size(sec) == 3, F.element_at(sec, 3))
    # 10^k scaling of shorter stamps == right-pad with zeros to 19
    time_nano = F.when(
        ts_tok.isNotNull() & (ts_tok != ""), F.rpad(ts_tok, 19, "0")
    ).otherwise(F.lit(str(default_now_ns).rjust(19, "0")))
    line_ok = (
        F.col(source_col).isNotNull()
        & F.size(sec).between(2, 3)
        & (measurement != "")
        # ParsePoints skips blank and '#'-comment lines
        & ~F.ltrim(F.col(source_col)).startswith("#")
        # ...and ERRORS on a malformed timestamp — a present stamp must
        # be 1-19 digits (longer would silently truncate under rpad;
        # signs/garbage would mangle); such lines DROP here
        & F.coalesce(ts_tok.rlike("^[0-9]{1,19}$"), F.lit(True))
    )
    base = df.select(
        *keep,
        measurement.alias("_m"),
        labels.alias("__labels__"),
        time_nano.alias("__time_nano__"),
        F.when(line_ok, F.split(F.element_at(sec, 2), ",", -1)).alias("_fs"),
    ).withColumn("_fld", F.explode("_fs"))
    # materialize the (key, masked value) pair in its OWN projection:
    # a column used by the next projection evaluates once, whereas the
    # split/replace subexpressions inlined under every CASE branch
    # would re-run ~10x per row (repo one-pass idiom, parse.py:190)
    base = base.withColumn(
        "_k", _unmask(F.substring_index(F.col("_fld"), "=", 1))
    ).withColumn(
        # try_element_at: a field token WITHOUT '=' splits to one
        # element, and ANSI element_at would fail the whole job
        # instead of dropping the field (NULL _vm -> NULL type below)
        "_vm", F.try_element_at(F.split(F.col("_fld"), "=", 2), F.lit(2))
    )
    k = F.col("_k")
    vm = F.col("_vm")
    is_str = vm.startswith('"') & vm.endswith('"') & (F.length(vm) >= 2)
    is_int = vm.rlike("^-?[0-9]+i$")
    is_uint = vm.rlike("^[0-9]+u$")
    is_bool = vm.rlike("^(t|T|true|True|TRUE|f|F|false|False|FALSE)$")
    fv = vm.try_cast("double")
    vtype = (
        F.when(is_str, "string")
        .when(is_int, "int")
        .when(is_bool, "bool")
        .when(is_uint, F.lit(None).cast("string"))  # dropped (docstring)
        .when(fv.isNotNull(), "float")
    )
    value = (
        F.when(is_str, _unmask(vm.substr(F.lit(2), F.length(vm) - 2)))
        .when(is_int, vm.substr(F.lit(1), F.length(vm) - 1))
        .when(is_bool, F.when(vm.rlike("^[tT]"), "1").otherwise("0"))
        .otherwise(go_num(fv))
    )
    out = (
        base.withColumn("__type__", vtype)
        .withColumn("__value__", value)
        .filter(
            F.col("__type__").isNotNull()
            & (F.col("_k") != "")
            & (F.lit(fields_extend) | (F.col("__type__") != "string"))
        )
        .withColumn(
            "__name__",
            F.when(F.col("_k") == "value", F.col("_m")).otherwise(
                F.concat(F.col("_m"), F.lit(":"), F.col("_k"))
            ),
        )
    )
    cols = [*keep, "__name__", "__time_nano__", "__labels__", "__value__"]
    if fields_extend:
        out = out.withColumn("__field__", F.col("_k"))
        cols += ["__type__", "__field__"]
        if db:
            out = out.withColumn("__tag__:db", F.lit(db))
            cols.append("__tag__:db")
    return out.select(*cols)


@register("service_http_server")
def _http_server_factory(**cfg):
    """plugins/input/httpserver/input_http_server.go: Format selects
    the body decoder. The table-land leg models the DECODE: the body
    column stands in for the request stream (the HTTP transport is
    out of scope per the north star); ``Db`` stands in for the
    request's ``db`` query param, ``DefaultNowNs`` for the decoder's
    clock on stamp-less lines. Formats sls/prometheus/otlp are
    reachable through their dedicated processors; only influxdb is
    wired here (the remaining e2e-exercised decoder)."""
    fmt = cfg_pop(cfg, "Format", "format")
    source = cfg_pop(cfg, "SourceKey", "source", default="content")
    keep = cfg_pop(cfg, "Keep", "keep", default=None)
    fields_extend = bool(cfg_pop(cfg, "FieldsExtend", default=False))
    db = cfg_pop(cfg, "Db", "db", default="")
    now_ns = int(cfg_pop(cfg, "DefaultNowNs", default=0))
    # Address/port config is transport-only — accepted and ignored
    cfg_pop(cfg, "Address", "address", default=None)
    if fmt == "statsd":
        from ilogtail_spark.operators.statsd import statsd_decode

        return lambda df: statsd_decode(
            df, source, keep=keep, default_now_ns=now_ns
        )
    if fmt == "influxdb":
        return lambda df: influx_decode(
            df, source, keep=keep, fields_extend=fields_extend, db=db,
            default_now_ns=now_ns,
        )
    # the remaining body decoders route to their existing operators
    if fmt == "raw":
        # decoder/raw: the body IS the content field, verbatim
        from pyspark.sql import functions as F

        return lambda df: df.withColumn("content", F.col(source))
    if fmt == "sls":
        from ilogtail_spark.operators.pb import sls_pb_decode

        return lambda df: sls_pb_decode(df, source, keep=keep)
    if fmt == "prometheus":
        from ilogtail_spark.operators.parse import parse_prom_metric

        return lambda df: parse_prom_metric(df, source)
    raise ValueError(
        f"service_http_server: unsupported Format '{fmt}' "
        "(influxdb/statsd/raw/sls/prometheus; otlp has the dedicated "
        "processor_otel_* pair; pyroscope profiling is out of scope)"
    )
