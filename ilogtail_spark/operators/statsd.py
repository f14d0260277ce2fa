"""statsd/dogstatsd line DECODE — service_http_server Format=statsd.

Reference: ``pkg/protocol/decoder/statsd/decoder.go:44-64`` — each
non-empty line parses as dogstatsd
(``name:value|type[|@rate][|#tag1:v1,tag2]``) and emits one
helper.NewMetricLog (log_helper.go:258-289):

    __name__      the metric name
    __time_nano__ decode-time clock (injected here for determinism,
                  same convention as influx_decode's default_now_ns)
    __labels__    tags sorted by key, ``k#$#v`` joined with ``|``
                  (a bare tag gets the empty value)
    __value__     float64 'g' format (common.go_num)

Skips (decoder.go:50-58 drops a line on any parse error): blank
lines, no ``:``, empty name, non-numeric value, unknown type. Type
``s`` (set) is ALSO skipped: the Go decoder asserts
``m.Value.(float64)`` and a dogstatsd set carries a string value —
that line can never produce a log. The ``@rate`` term is parsed and
ignored, as the reference ignores everything but name/value/tags.

One codegen pass, zero Python, zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.common import go_num

_TYPES = ("c", "g", "ms", "h", "d")  # 's' (set) excluded — docstring


def statsd_decode(
    df: DataFrame,
    source_col: str = "content",
    keep: list[str] | None = None,
    default_now_ns: int = 0,
) -> DataFrame:
    keep = list(keep or [])
    line = F.col(source_col)
    c1 = F.locate(":", line)
    name = F.substring(line, 1, c1 - 1)
    rest = F.substring(line, c1 + 1, F.length(line))
    parts = F.split(rest, r"\|")
    val = F.element_at(parts, 1).try_cast("double")
    mtype = F.when(F.size(parts) >= 2, F.element_at(parts, 2))
    ok = (
        line.isNotNull()
        & (c1 > 0)
        & (name != "")
        & val.isNotNull()
        & mtype.isin(*_TYPES)
    )
    # the #tags term sits at position 3 or 4 (after an optional @rate);
    # try_element_at: no-tags lines have an EMPTY filtered array, and
    # ANSI element_at throws on it
    tag_term = F.try_element_at(
        F.filter(parts, lambda p: p.startswith("#")), F.lit(1)
    )
    def tag_struct(t):
        # key:value splits on the FIRST colon (dogstatsd SplitN(":",2))
        # — substring_index(..., -1) would truncate values carrying
        # colons (URLs, IPv6); a bare tag gets the empty value
        c = F.locate(":", t)
        return F.struct(
            F.when(c > 0, F.substring(t, F.lit(1), c - 1))
            .otherwise(t).alias("key"),
            F.when(c > 0, F.substring(t, c + 1, F.length(t)))
            .otherwise(F.lit("")).alias("value"),
        )

    tag_structs = F.transform(
        F.split(F.substring(tag_term, 2, F.length(tag_term)), ","),
        tag_struct,
    )
    labels = F.when(tag_term.isNotNull(), F.array_join(
        F.transform(
            F.array_sort(tag_structs),
            lambda s: F.concat(s["key"], F.lit("#$#"), s["value"]),
        ),
        "|",
    )).otherwise(F.lit(""))
    return df.filter(ok).select(
        *keep,
        name.alias("__name__"),
        F.lit(str(default_now_ns).rjust(19, "0")).alias("__time_nano__"),
        labels.alias("__labels__"),
        go_num(val).alias("__value__"),
    )
