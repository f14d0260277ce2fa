"""Row splitters & multiline merge (SURVEY.md §2.2).

Splitting = explode (narrow, no shuffle). Multiline merge =
sessionization over (source-stream, line-order): regex marks compile
to window prefix-sums that assign each line a merge-group id, then
one groupBy concatenates. The reference's line-at-a-time state
machine (core/plugin/processor/inner/
ProcessorSplitMultilineLogStringNative.cpp:159-309) admits a closed
form for every pattern combo it actually supports — the reference
itself normalizes the combos (core/file_server/MultilineOptions.cpp:
125-155: Continue-only is ignored, Start+Continue+End drops
Continue), leaving exactly {S, S+C, S+E, C+E, E}.

Scale design: the prefix-sum windows stream O(1)-memory per
partition; the merge groupBy is capped at ``max_merge_lines`` rows
per aggregation key (the reference's own max-merged-log-size cap),
so no task ever materializes an unbounded conversation in one
collect_list — the round-1 OOM/straggler risk on the hot key.

Pattern-overlap corners: Start∧Continue and Continue∧End overlaps
reproduce the reference's check order exactly (out-state re-opens at
a Start mid-segment; an in-span Continue beats End), and Start∧End
overlap in S+E mode is exact too — the reference's 2-state machine
collapses to a closed form (last constant marker XOR flip parity, see
the S+E branch) because every line's transition is const/flip/
identity. All modes now match the reference on overlapping AND
disjoint patterns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ilogtail_spark.operators.registry import cfg_pop, register

DEFAULT_MAX_MERGE_LINES = 256


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


def split_char(
    df: DataFrame,
    source: str,
    sep: str,
    keys: list[str],
    quote: str | None = None,
    preserve_others: bool = False,
    keep_source: bool = False,
) -> DataFrame:
    """processor_split_char (split_char.go:34-184): split a field on a
    single-char separator into named columns; with ``quote``, a value
    enclosed in quotes may embed the separator (quote-aware lookahead
    split + unquote). ``preserve_others`` lands the remainder beyond
    the declared keys in ``_split_preserve_`` RAW (still quoted,
    separator-joined) — the reference's byte-remainder semantics."""
    from ilogtail_spark.operators.parse import quote_split, unquote_field

    src = F.col(source)
    n = len(keys)
    if quote:
        parts = quote_split(src, sep, quote, -1)
    else:
        import re as _re

        parts = F.split(src, _re.escape(sep), -1)
    out = df.withColumn("_parts", parts)
    npart = F.size(F.col("_parts"))
    for i, k in enumerate(keys):
        v = F.element_at(F.col("_parts"), i + 1)
        out = out.withColumn(k, unquote_field(v, quote) if quote else v)
    if preserve_others:
        out = out.withColumn(
            "_split_preserve_",
            F.when(
                npart > n,
                F.array_join(
                    F.slice(F.col("_parts"), n + 1, F.greatest(npart - n, F.lit(0))),
                    sep,
                ),
            ),
        )
    out = out.drop("_parts")
    if not keep_source and source not in keys:
        out = out.drop(source)
    return out


def split_multiline(
    df: DataFrame,
    source: str,
    order_col: str,
    group_cols: list[str],
    start_pattern: str | None = None,
    continue_pattern: str | None = None,
    end_pattern: str | None = None,
    unmatched: str = "single_line",  # single_line | discard | merge
    max_merge_lines: int = DEFAULT_MAX_MERGE_LINES,
    dest: str | None = None,
) -> DataFrame:
    """processor_split_multiline_log_string_native /
    processor_merge_multiline_log_native
    (ProcessorSplitMultilineLogStringNative.cpp:159-309,
    MultilineOptions.h:31-53).

    ``group_cols`` identifies the source stream (conv/file),
    ``order_col`` the line order within it. Pattern combos follow the
    reference's own normalization (MultilineOptions.cpp:125-155):
    Continue without Start/End is ignored (no multiline);
    Start+Continue+End ignores Continue.

    Mode semantics (reference state machine → closed form):
      * S      — event starts at a Start line; runs to the next Start.
      * S+C    — event = Start line + following Continue lines.
      * S+E    — event = first Start after previous End … next End
                 (inclusive); an unterminated span at EOF is unmatched.
      * C+E    — event = run of Continue lines + one terminator line,
                 matched iff the terminator matches End; a lone End
                 line is its own event.
      * E      — everything up to and including an End line.

    ``unmatched`` is the reference's UnmatchedContentTreatment:
    SINGLE_LINE emits each unmatched line as its own event, DISCARD
    drops them (.cpp:342-362). "merge" is a repo extension (legacy
    round-1 behavior): unmatched runs merge like matched groups.

    Groups larger than ``max_merge_lines`` are flushed in chunks —
    the reference's max-merged-log-size cap — so one hot stream can
    never funnel an unbounded array through a single task.
    """
    S, C, E = (
        start_pattern is not None,
        continue_pattern is not None,
        end_pattern is not None,
    )
    if C and S and E:
        C, continue_pattern = False, None  # MultilineOptions.cpp:140-155
    if C and not S and not E:
        C, continue_pattern = False, None  # MultilineOptions.cpp:125-139
    out_col = dest or source

    w = Window.partitionBy(*group_cols).orderBy(order_col)
    wfull = Window.partitionBy(*group_cols)
    src = F.col(source)

    # rlike(NULL) is NULL and would poison the prefix sums — NULL
    # source rows match nothing and always take the unmatched policy
    def mark(pattern):
        if pattern is None:
            return F.lit(False)
        return F.coalesce(src.rlike(pattern), F.lit(False))

    m = df.withColumn("_s", mark(start_pattern))
    m = m.withColumn("_c", mark(continue_pattern))
    m = m.withColumn("_e", mark(end_pattern))

    if S and not C and not E:
        m = m.withColumn("_gid", F.sum(F.col("_s").cast("int")).over(w))
        m = m.withColumn("_matched", F.col("_gid") > 0)
    elif S and C:
        # segments break at every non-continue line; within a segment
        # the group runs from the FIRST start-matching line to the
        # segment end (earlier lines are unmatched). This reproduces
        # the reference exactly even when a line matches both Start
        # and Continue after an unmatched run: out-state checks Start
        # only, so that line re-opens a group mid-segment.
        m = m.withColumn("_gid", F.sum((~F.col("_c")).cast("int")).over(w))
        wseg = Window.partitionBy(*group_cols, "_gid").orderBy(order_col).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        first_s = F.min(F.when(F.col("_s"), F.col(order_col))).over(wseg)
        m = m.withColumn(
            "_matched", first_s.isNotNull() & (F.col(order_col) >= first_s)
        )
    elif S and E:  # S+E
        # The reference runs a 2-state machine (out: Start opens a span
        # — the opening line is NOT checked against End; in: End closes
        # inclusively; EOF with an open span → unmatched,
        # ProcessorSplitMultilineLogStringNative.cpp:159-309). Each
        # line's transition is one of const-in (S-only), const-out
        # (E-only), flip (S∧E — the overlap case), or identity, and
        # 2-state DFA composition collapses: state before line i = the
        # last constant marker's state XOR the parity of flip lines
        # since it. That closed form makes the overlap EXACT (round-2's
        # one documented multiline deviation) with three streaming
        # windows on the same key — no sequential state needed.
        flip = F.col("_s") & F.col("_e")
        const_in = F.col("_s") & ~F.col("_e")
        const_out = F.col("_e") & ~F.col("_s")
        m = m.withColumn("_cf", F.sum(flip.cast("int")).over(w))
        marker = F.when(
            const_in | const_out,
            F.struct(const_in.alias("is_in"), F.col("_cf").alias("cf")),
        )
        m = m.withColumn(
            "_lc",
            F.last(marker, ignorenulls=True).over(
                w.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        flips_between = (
            F.col("_cf") - flip.cast("int") - F.coalesce(F.col("_lc.cf"), F.lit(0))
        )
        state_in = F.coalesce(F.col("_lc.is_in"), F.lit(False)) != (
            flips_between % 2 == 1
        )  # base XOR flip parity
        open_evt = ~state_in & F.col("_s")
        m = m.withColumn("_gid", F.sum(open_evt.cast("int")).over(w))
        m = m.withColumn("_inspan", state_in | open_evt)
        m = m.withColumn("_close", (state_in & F.col("_e")).cast("int"))
        wseg = Window.partitionBy(*group_cols, "_gid")
        m = m.withColumn(
            "_matched", F.col("_inspan") & (F.max(F.col("_close")).over(wseg) == 1)
        )
        m = m.drop("_cf", "_lc", "_inspan", "_close")
    elif E and not C:  # E only
        m = m.withColumn(
            "_gid", F.sum(F.col("_e").cast("int")).over(w) - F.col("_e").cast("int")
        )
        m = m.withColumn("_tot_e", F.sum(F.col("_e").cast("int")).over(wfull))
        m = m.withColumn("_matched", F.col("_gid") < F.col("_tot_e"))
        m = m.drop("_tot_e")
    elif C and E:
        prev_c = F.lag(F.col("_c"), 1, False).over(w)
        m = m.withColumn("_gid", F.sum((~prev_c).cast("int")).over(w))
        wseg = Window.partitionBy(*group_cols, "_gid").orderBy(order_col).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        # a line matching BOTH Continue and End acts as continuation
        # (in-span Continue is checked first, cpp:199-203), so only an
        # End that is NOT a Continue closes a segment
        m = m.withColumn("_matched", F.last(F.col("_e") & ~F.col("_c")).over(wseg))
    else:
        # no multiline config at all: passthrough
        return df

    if unmatched == "merge":
        m = m.withColumn("_matched", F.lit(True))
    # NULL source rows are never merged (they are not lines) — they
    # route to the unmatched policy so no row silently disappears
    m = m.withColumn("_matched", F.coalesce(F.col("_matched"), F.lit(False)) & src.isNotNull())
    m = m.drop("_s", "_c", "_e")

    matched = m.filter(F.col("_matched"))
    # bound the per-key merge: chunk index caps any one collect_list
    wg = Window.partitionBy(*group_cols, "_gid").orderBy(order_col)
    matched = matched.withColumn(
        "_sub", F.floor((F.row_number().over(wg) - 1) / F.lit(max_merge_lines))
    )
    merged = (
        matched.groupBy(*group_cols, "_gid", "_sub")
        .agg(
            F.min(order_col).alias(order_col),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col(order_col).alias("o"), src.alias("v"))
                        )
                    ),
                    lambda s: s["v"],
                ),
                "\n",
            ).alias(out_col),
        )
        .drop("_gid", "_sub")
    )
    if unmatched == "discard":
        return merged
    singles = m.filter(~F.col("_matched")).select(
        *group_cols, F.col(order_col), src.alias(out_col)
    )
    return merged.unionByName(singles)


def split_regex(
    df: DataFrame,
    source: str,
    start_pattern: str,
    order_col: str,
    group_cols: list[str],
    dest: str | None = None,
    unmatched: str = "single_line",
    max_merge_lines: int = DEFAULT_MAX_MERGE_LINES,
) -> DataFrame:
    """processor_split_log_regex (split_log_regex.go:27-140) —
    Start-only mode of :func:`split_multiline`: each output event
    starts at a line matching ``start_pattern``; continuation lines
    append with \\n; lines before the first start follow the
    ``unmatched`` policy."""
    return split_multiline(
        df,
        source,
        order_col,
        group_cols,
        start_pattern=start_pattern,
        unmatched=unmatched,
        max_merge_lines=max_merge_lines,
        dest=dest,
    )


def split_log_regex(
    df: DataFrame,
    source: str,
    split_regex: str,
    preserve_others: bool = True,
    dest: str | None = None,
) -> DataFrame:
    """processor_split_log_regex, EXACT Go semantics
    (split_log_regex.go:52-100): the source value is a block of
    ``\\n``-joined lines (the file reader hands over whole read
    blocks); a new log opens before every line that FULLY matches
    ``split_regex`` (fullMatch, :52-55), and every other line —
    including an unmatched head run, or everything when nothing
    matches — concatenates onto the current log. ``preserve_others``
    keeps the row's other columns on every output (the Go plugin
    clones the raw log's other contents).

    Narrow closed form — per-row array ops, zero shuffle: boundary
    positions = indices of fully-matching lines (plus 0), outputs =
    slices between consecutive boundaries. One corner documented:
    fullMatch asks whether Go's leftmost-first match spans the whole
    line; we anchor (``^(?:p)$``), which lets Java backtracking find a
    full-span match Go's first match would miss (e.g. ``a|ab`` on
    "ab") — shipped patterns end in ``.*`` where both agree.
    """
    anchored = f"^(?:{split_regex})$"
    # MATERIALIZE lines and bounds in their own projections: chunks
    # references bounds per element — inlined, the whole regex scan
    # would re-run O(lines²) times (the expression-blowup trap; this
    # exact shape measured 100x slower inlined)
    lines_c, bounds_c = "_slr_lines", "_slr_bounds"
    out = df.withColumn(lines_c, F.split(F.col(source), "\n", -1))
    lines = F.col(lines_c)
    # 0-based boundary positions: line 0 always opens a chunk; every
    # fully-matching line at i>0 opens a new one
    out = out.withColumn(
        bounds_c,
        F.filter(
            F.transform(
                lines,
                lambda l, i: F.when(
                    (i == 0) | F.coalesce(l.rlike(anchored), F.lit(False)), i
                ).otherwise(F.lit(-1)),
            ),
            lambda x: x >= 0,
        ),
    )
    bounds = F.col(bounds_c)
    chunks = F.transform(
        bounds,
        lambda b, j: F.array_join(
            F.slice(
                lines,
                b + 1,
                # try_element_at: the last chunk has no next boundary
                # (plain element_at throws under ANSI)
                F.coalesce(F.try_element_at(bounds, j + 2), F.size(lines)) - b,
            ),
            "\n",
        ),
    )
    # explode_outer: a NULL source row passes through (NULL dest)
    # instead of silently vanishing from the pipeline
    out = out.withColumn(dest or source, F.explode_outer(chunks))
    out = out.drop(lines_c, bounds_c)
    if not preserve_others:
        keep = {source, dest or source}
        out = out.select(*[c for c in out.columns if c in keep])
    if dest and dest != source:
        out = out.drop(source)
    return out


@register("processor_split_string_native")
@register("processor_split_log_string")
@register("processor_split_string")
def _split_factory(**cfg):
    source = cfg_pop(cfg, "SourceKey", "source", default="text")
    sep = cfg_pop(cfg, "SplitSep", "sep", default="\n")
    return lambda df: split_string(df, source=source, sep=sep)


@register("processor_split_char")
def _split_char_factory(**cfg):
    source = cfg_pop(cfg, "SourceKey", "source", default="text")
    sep = cfg_pop(cfg, "SplitSep", "sep", default=",")
    keys = cfg_pop(cfg, "SplitKeys", "keys")
    quote_flag = cfg_pop(cfg, "QuoteFlag", "quote_flag", default=False)
    quote = cfg_pop(cfg, "Quote", "quote", default=None)
    preserve = cfg_pop(cfg, "PreserveOthers", "preserve_others", default=False)
    keep = cfg_pop(cfg, "KeepSource", "keep_source", default=False)
    # QuoteFlag without an explicit Quote char means the default '"'
    effective_quote = quote if quote else ('"' if quote_flag else None)
    return lambda df: split_char(
        df, source, sep, keys,
        quote=effective_quote,
        preserve_others=preserve, keep_source=keep,
    )


@register("processor_split_log_regex")
def _split_log_regex_factory(**cfg):
    # split_log_regex.go:28-30: SplitKey / SplitRegex / PreserveOthers
    from ilogtail_spark.operators.parse import _go_regex_to_java

    source = cfg_pop(cfg, "SplitKey", "SourceKey", "source", default="content")
    pattern = _go_regex_to_java(cfg_pop(cfg, "SplitRegex", "split_regex"))
    preserve = bool(cfg_pop(cfg, "PreserveOthers", "preserve_others", default=False))
    dest = cfg_pop(cfg, "dest", default=None)
    return lambda df: split_log_regex(
        df, source, pattern, preserve_others=preserve, dest=dest
    )


def merge_by_flag(
    df: DataFrame,
    source: str = "content",
    order_col: str = "turn_idx",
    group_cols: list[str] | tuple[str, ...] = ("conv_id",),
    partial_col: str = "_partial",
) -> DataFrame:
    """processor_merge_multiline_log_native ``MergeType::BY_FLAG``
    (ProcessorMergeMultilineLogNative.cpp:113-159): a maximal run of
    PARTIAL rows plus the first following full row merge into ONE log
    — contents concatenated with NO line break (MergeEvents
    insertLineBreak=false, .cpp:176-201), the run's FIRST row's other
    fields survive, the partial flag is consumed (DelContent
    PartLogFlag); a dangling partial run at group end still merges.
    The producer of the flag is parse_container_log's ``_partial``
    (the containerd P tag).

    Closed form: a new segment opens exactly where the PREVIOUS row
    (in ``order_col`` order) is non-partial, so segment id = running
    count of those boundaries — one window + one groupBy, both keyed
    by the group, state bounded by group size (same scale shape as
    split_multiline)."""
    gcols = list(group_cols)
    w = Window.partitionBy(*gcols).orderBy(order_col)
    is_p = F.coalesce(F.col(partial_col).cast("boolean"), F.lit(False))
    new_seg = F.when(F.coalesce(F.lag(is_p).over(w), F.lit(False)), 0).otherwise(1)
    x = df.withColumn("_seg", F.sum(new_seg).over(w))
    others = [
        c for c in df.columns
        if c not in set(gcols) | {source, order_col, partial_col}
    ]
    merged = F.concat_ws(
        "",
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(order_col).alias("_o"),
                        F.col(source).alias("_c"),
                    )
                )
            ),
            lambda s: s["_c"],
        ),
    )
    return (
        x.groupBy(*gcols, "_seg")
        .agg(
            F.min(order_col).alias(order_col),
            merged.alias(source),
            *[F.min_by(F.col(c), F.col(order_col)).alias(c) for c in others],
        )
        .drop("_seg")
    )


@register("processor_split_multiline_log_string_native")
@register("processor_merge_multiline_log_native")
def _split_multiline_factory(**cfg):
    # MergeType flag (ProcessorMergeMultilineLogNative.cpp:61) selects
    # the partial-flag merge; the default BY_REGEX path falls through
    # to split_multiline
    if str(cfg.get("MergeType", "regex")).lower() == "flag":
        cfg.pop("MergeType")
        source = cfg_pop(cfg, "SourceKey", "source", default="content")
        order_col = cfg_pop(cfg, "order_col", default="turn_idx")
        group_cols = cfg_pop(cfg, "group_cols", default=["conv_id"])
        partial_col = cfg_pop(cfg, "partial_col", default="_partial")
        return lambda df: merge_by_flag(
            df, source, order_col, group_cols, partial_col
        )
    cfg.pop("MergeType", None)
    source = cfg_pop(cfg, "SourceKey", "SplitKey", "source", default="text")
    start = cfg_pop(cfg, "StartPattern", "SplitRegex", "start_pattern", default=None)
    cont = cfg_pop(cfg, "ContinuePattern", "continue_pattern", default=None)
    end = cfg_pop(cfg, "EndPattern", "end_pattern", default=None)
    unmatched = str(
        cfg_pop(
            cfg, "UnmatchedContentTreatment", "unmatched", default="single_line"
        )
    ).lower()
    order_col = cfg_pop(cfg, "order_col", default="turn_idx")
    group_cols = cfg_pop(cfg, "group_cols", default=["conv_id"])
    max_lines = int(
        cfg_pop(cfg, "MaxMergeLines", "max_merge_lines", default=DEFAULT_MAX_MERGE_LINES)
    )
    dest = cfg_pop(cfg, "dest", default=None)
    return lambda df: split_multiline(
        df,
        source,
        order_col,
        group_cols,
        start_pattern=start,
        continue_pattern=cont,
        end_pattern=end,
        unmatched=unmatched,
        max_merge_lines=max_lines,
        dest=dest,
    )
