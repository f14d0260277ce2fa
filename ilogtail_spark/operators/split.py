"""Row splitters & multiline merge (SURVEY.md §2.2).

Splitting = explode (narrow, no shuffle). Multiline merge =
sessionization: mark group starts with the Start regex, running-sum
the marks into group ids within each source partition, then regroup.
One shuffle on (source, group) — unavoidable for cross-row regroup,
bounded by per-source data size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ilogtail_spark.operators.registry import cfg_pop, register


def _rx_literal(sep: str) -> str:
    """Quote a literal separator for Java regex (F.split treats its
    separator as a regex; the reference splitters take literals —
    split_char.go:34, ProcessorSplitLogStringNative.cpp:74)."""
    # \Q...\E quoting, split around any embedded \E terminators
    return r"\Q" + sep.replace(r"\E", r"\E\\E\Q") + r"\E"


def split_string(
    df: DataFrame,
    source: str = "text",
    sep: str = "\n",
    keep_source: bool = False,
    dest: str | None = None,
) -> DataFrame:
    """processor_split_string_native
    (ProcessorSplitLogStringNative.cpp:74-101) / Go splitters: one
    event per separator-delimited segment. ``sep`` is a LITERAL
    (regex-quoted before hitting F.split)."""
    out = df.withColumn(
        dest or source, F.explode(F.split(F.col(source), _rx_literal(sep), -1))
    )
    if not keep_source and dest and dest != source:
        out = out.drop(source)
    return out


def split_regex(
    df: DataFrame,
    source: str,
    start_pattern: str,
    order_col: str,
    group_cols: list[str],
    dest: str | None = None,
) -> DataFrame:
    """processor_split_log_regex (split_log_regex.go:27-140) /
    processor_split_multiline_log_string_native
    (ProcessorSplitMultilineLogStringNative.cpp:95-127): lines are
    regrouped so each output event starts at a line matching
    ``start_pattern``; continuation lines are appended with \\n.

    ``group_cols`` identifies the source stream (e.g. conv_id / file);
    ``order_col`` the line order within it. Lines before the first
    start-match form their own (unmatched) group — the reference's
    "single-line" treatment for orphans.
    """
    w = Window.partitionBy(*group_cols).orderBy(order_col)
    marked = df.withColumn(
        "_is_start", F.when(F.col(source).rlike(start_pattern), 1).otherwise(0)
    ).withColumn("_grp", F.sum("_is_start").over(w))
    # concat in deterministic order: sort collected (order, value) structs
    merged = (
        marked.groupBy(*group_cols, "_grp")
        .agg(
            F.min(order_col).alias(order_col),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(source).alias("v")))
                    ),
                    lambda s: s["v"],
                ),
                "\n",
            ).alias(dest or source),
        )
        .drop("_grp")
    )
    return merged


@register("processor_split_string_native")
@register("processor_split_log_string")
@register("processor_split_char")
@register("processor_split_string")
def _split_factory(**cfg):
    source = cfg_pop(cfg, "SourceKey", "source", default="text")
    sep = cfg_pop(cfg, "SplitSep", "sep", default="\n")
    return lambda df: split_string(df, source=source, sep=sep)


@register("processor_split_log_regex")
@register("processor_split_multiline_log_string_native")
@register("processor_merge_multiline_log_native")
def _split_regex_factory(**cfg):
    return lambda df: split_regex(
        df,
        source=cfg.get("SourceKey", cfg.get("source", "text")),
        start_pattern=cfg.get("SplitRegex", cfg.get("start_pattern")),
        order_col=cfg.get("order_col", "turn_idx"),
        group_cols=cfg.get("group_cols", ["conv_id"]),
        dest=cfg.get("dest"),
    )
