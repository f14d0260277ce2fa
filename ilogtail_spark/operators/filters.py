"""Filters / predicates (SURVEY.md §2.5).

The reference evaluates a boolean expression tree per event
(core/plugin/processor/ProcessorFilterNative.h:28-121, enum
FilterOperator {NOT, AND, OR}); in Spark the tree IS the Catalyst
expression — filters compile to codegen'd predicates and push down
to the parquet/Iceberg scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from ilogtail_spark.operators.registry import cfg_pop, register


def filter_regex(
    df: DataFrame,
    include: dict[str, str] | None = None,
    exclude: dict[str, str] | None = None,
) -> DataFrame:
    """processor_filter_regex (Go, processor_filter_regex.go:77-111):
    Include — every (key, regex) must match; Exclude — any match
    drops the row. Matching is PARTIAL (Go ``MatchString``, not
    anchored). Missing key fails an Include and passes an Exclude;
    a key can resolve from the ``attrs`` KV bag like any SourceKey.
    """
    from ilogtail_spark.common import resolve_key

    cond = F.lit(True)
    for k, pat in (include or {}).items():
        if k in df.columns or "attrs" in df.columns:
            v = resolve_key(df, k)
            cond = cond & v.isNotNull() & v.rlike(pat)
        else:
            cond = F.lit(False)
    for k, pat in (exclude or {}).items():
        if k in df.columns or "attrs" in df.columns:
            v = resolve_key(df, k)
            cond = cond & ~(v.isNotNull() & v.rlike(pat))
    return df.filter(cond)


def filter_expression(df: DataFrame, expr: dict | str) -> Column | DataFrame:
    """processor_filter_regex_native expression-tree mode
    (ProcessorFilterNative.h:28-121): nested
    {"and": [...]} / {"or": [...]} / {"not": {...}} / {"key": k, "regex": r}
    dicts compile directly to a Catalyst predicate.
    """

    def build(node: dict) -> Column:
        if "and" in node:
            out = F.lit(True)
            for child in node["and"]:
                out = out & build(child)
            return out
        if "or" in node:
            out = F.lit(False)
            for child in node["or"]:
                out = out | build(child)
            return out
        if "not" in node:
            return ~build(node["not"])
        return F.col(node["key"]).isNotNull() & F.col(node["key"]).rlike(node["regex"])

    if isinstance(expr, str):
        return df.filter(expr)
    return df.filter(build(expr))


def filter_key_regex(
    df: DataFrame,
    include_keys: list[str] | None = None,
    exclude_keys: list[str] | None = None,
    attrs_col: str | None = None,
) -> DataFrame:
    """processor_filter_key_regex (processor_filter_key_regex.go:73-103):
    Include/Exclude entries are REGEXES over key NAMES (partial Go
    MatchString): every Include regex must match some present key;
    any present key matching an Exclude regex drops the row.
    Structured column names are static, so they match at PLAN time
    (presence = non-null); the dynamic map column checks its keys
    with F.exists — no per-row schema work.
    """
    import re as _re

    def present_any(pat: str) -> Column:
        cond = F.lit(False)
        for c in df.columns:
            if c != attrs_col and _re.search(pat, c):
                cond = cond | F.col(c).isNotNull()
        if attrs_col and attrs_col in df.columns:
            cond = cond | F.exists(
                F.map_keys(F.col(attrs_col)), lambda k: k.rlike(pat)
            )
        return cond

    cond = F.lit(True)
    for pat in include_keys or []:
        cond = cond & present_any(pat)
    for pat in exclude_keys or []:
        cond = cond & ~present_any(pat)
    return df.filter(cond)


def filter_timestamp(
    df: DataFrame,
    ts_col: str = "ts",
    begin: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """processor_timestamp_filter_native
    (ProcessorTimestampFilterNative.cpp:151-173) — drop events outside
    [begin, end]; the batch analogue of a watermark late-data policy.
    """
    cond = F.lit(True)
    if begin is not None:
        cond = cond & (F.col(ts_col) >= F.lit(begin).cast("timestamp"))
    if end is not None:
        cond = cond & (F.col(ts_col) <= F.lit(end).cast("timestamp"))
    return df.filter(cond)


def _fwc_leaf(field: str, op: str, value) -> Column:
    c = F.col(field)
    if op == "equals":
        return c == value
    if op == "regexp":
        return c.rlike(value)
    if op == "contains":
        return c.contains(value)
    if op == "startwith":
        return c.startswith(value)
    raise ValueError(op)


def _fwc_pred(w: dict) -> Column:
    """Case predicate: legacy leaf {"field","op","value"}, nested
    {"and": [...]}/{"or": [...]}, or the reference's ConditionCase
    shape {"logical_op": and|or, "op": relation, "fields": {f: v}}
    (processor_fields_with_condition.go:66-74: one RelationOperator
    applied to every FieldConditions pair, joined by LogicalOperator).
    """
    if "and" in w or "or" in w:
        key = "and" if "and" in w else "or"
        out = F.lit(key == "and")
        for child in w[key]:
            out = (out & _fwc_pred(child)) if key == "and" else (out | _fwc_pred(child))
        return out
    if "fields" in w:
        op = w.get("op", w.get("RelationOperator", "equals"))
        logical = w.get("logical_op", w.get("LogicalOperator", "and"))
        out = F.lit(logical == "and")
        for f, v in w["fields"].items():
            leaf = _fwc_leaf(f, op, v)
            out = (out & leaf) if logical == "and" else (out | leaf)
        return out
    return _fwc_leaf(w["field"], w.get("op", "equals"), w["value"])


def fields_with_condition(
    df: DataFrame,
    cases: list[dict],
    drop_if_not_match: bool = False,
) -> DataFrame:
    """processor_fields_with_condition
    (processor_fields_with_condition.go:43-74,296): switch-case — the
    first case whose predicate matches applies its actions.

    Each case: {"when": <predicate — see _fwc_pred>,
    "add": {k: v, ...}, "ignore_if_exist": bool,
    "drop_keys": [k, ...]}. One `_fwc_win` first-match index drives
    every action column — a single codegen pass, no UDF. drop_keys
    nulls the column on matching rows (the columnar rendering of the
    reference's per-row key removal).
    """
    win: Column = F.lit(-1)
    for i in range(len(cases) - 1, -1, -1):
        win = F.when(_fwc_pred(cases[i]["when"]), F.lit(i)).otherwise(win)
    df = df.withColumn("_fwc_win", win)

    add_keys = sorted({k for case in cases for k in case.get("add", {})})
    for k in add_keys:
        base: Column = F.col(k) if k in df.columns else F.lit(None).cast("string")
        expr = base
        for i, case in enumerate(cases):
            if k not in case.get("add", {}):
                continue
            cond = F.col("_fwc_win") == i
            if case.get("ignore_if_exist"):
                # per-ROW key existence, like the reference's event
                # model: a NULL cell means "key absent" and is filled
                cond = cond & base.isNull()
            expr = F.when(cond, F.lit(case["add"][k])).otherwise(expr)
        df = df.withColumn(k, expr)

    drop_keys = sorted({k for case in cases for k in case.get("drop_keys", [])})
    for k in drop_keys:
        if k not in df.columns:
            continue
        dropping = [i for i, c in enumerate(cases) if k in c.get("drop_keys", [])]
        df = df.withColumn(
            k,
            F.when(F.col("_fwc_win").isin(dropping), F.lit(None)).otherwise(F.col(k)),
        )
    if drop_if_not_match:
        df = df.filter(F.col("_fwc_win") >= 0)
    return df.drop("_fwc_win")


def group_info_filter(
    df: DataFrame,
    tags: dict | None = None,
    metas: dict | None = None,
    tag_prefix: str = "__tag__",
) -> DataFrame:
    """extension_group_info_filter (group_info_filter.go:29-42,78+):
    keep only groups whose tags/metas match every configured regex
    condition; ``Reverse`` inverts a condition. Tags live in
    ``__tag__<k>`` columns (tag_native), metas in plain columns.
    Conditions: {key: pattern} or {key: {"pattern": p, "reverse": b}}.
    """
    cond = F.lit(True)
    for source, prefix in ((tags, tag_prefix), (metas, "")):
        for k, c in (source or {}).items():
            pattern = c["pattern"] if isinstance(c, dict) else c
            reverse = c.get("reverse", False) if isinstance(c, dict) else False
            colname = f"{prefix}{k}"
            if colname in df.columns:
                m = F.col(colname).isNotNull() & F.col(colname).rlike(pattern)
            else:
                m = F.lit(False)
            cond = cond & (~m if reverse else m)
    return df.filter(cond)


def rate_limit(
    df: DataFrame,
    keys: list[str],
    limit_per_key: int,
    order_col: str = "ts",
    salt_n: int = 32,
) -> DataFrame:
    """processor_rate_limit (processor_rate_limit.go:26-33,100,
    token_bucket.go:33-118): token-bucket per distinct value-combo of
    ``keys``. Batch semantics: first ``limit_per_key`` events per key
    in ``order_col`` order survive.

    Two-phase de-skewed top-k: phase 1 ranks within (keys, salt) —
    salt = hash(order_col) % salt_n splits a hot key across salt_n
    uniform shuffle groups — and keeps ≤ limit rows per group; phase 2
    ranks the surviving ≤ limit×salt_n rows per key globally. Sound
    because the global first-``limit`` rows of a key are, within ANY
    salt group they land in, among that group's first ``limit`` rows —
    phase 1 retains a superset, phase 2 is exact. A plain single
    window funnels a hot key's entire volume (28% of all rows on the
    transcripts fixture) through ONE task; the salted pre-cap bounds
    every task to ~rows/salt_n for phase 1 and limit×salt_n for
    phase 2. With ties in ``order_col`` the surviving row set among
    tied rows is arbitrary (same as the single-window formulation).

    The salt hashes EVERY column, not just ``order_col``: a burst of
    events sharing one coarse timestamp (the canonical hot-key shape)
    must still spread across salt groups, and a deterministic
    expression keeps shuffle keys stable under task retries (fully
    identical duplicate rows still co-hash — interchangeable anyway).
    """
    if salt_n and salt_n > 1:
        from pyspark.sql.types import ArrayType, MapType, StructType

        def _has_map(dt) -> bool:
            if isinstance(dt, MapType):
                return True
            if isinstance(dt, ArrayType):
                return _has_map(dt.elementType)
            if isinstance(dt, StructType):
                return any(_has_map(f.dataType) for f in dt.fields)
            return False

        hashable = [
            f.name for f in df.schema.fields if not _has_map(f.dataType)
        ] or [order_col]
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in hashable]), F.lit(salt_n))
        w1 = Window.partitionBy(*keys, salt).orderBy(F.col(order_col).asc())
        df = (
            df.withColumn("_rl_pre", F.row_number().over(w1))
            .filter(F.col("_rl_pre") <= limit_per_key)
            .drop("_rl_pre")
        )
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("_rl_rn", F.row_number().over(w))
        .filter(F.col("_rl_rn") <= limit_per_key)
        .drop("_rl_rn")
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

@register("processor_filter_regex")
def _filter_regex_factory(**cfg):
    from ilogtail_spark.operators.parse import _go_regex_to_java

    inc = cfg_pop(cfg, "Include", "include", default=None)
    exc = cfg_pop(cfg, "Exclude", "exclude", default=None)
    inc = {k: _go_regex_to_java(v) for k, v in inc.items()} if inc else inc
    exc = {k: _go_regex_to_java(v) for k, v in exc.items()} if exc else exc
    return lambda df: filter_regex(df, include=inc, exclude=exc)


@register("processor_filter_regex_native")
def _filter_tree_factory(**cfg):
    expr = cfg_pop(cfg, "ConditionExp", "expr")
    return lambda df: filter_expression(df, expr)


@register("processor_filter_key_regex")
def _filter_key_factory(**cfg):
    # Go's Include/Exclude param names (processor_filter_key_regex.go:29-30)
    inc = cfg_pop(cfg, "Include", "IncludeKeys", "include_keys", default=None)
    exc = cfg_pop(cfg, "Exclude", "ExcludeKeys", "exclude_keys", default=None)
    attrs = cfg_pop(cfg, "attrs_col", default="attrs")
    return lambda df: filter_key_regex(
        df, include_keys=inc, exclude_keys=exc,
        attrs_col=attrs if attrs in df.columns else None,
    )


@register("processor_timestamp_filter_native")
def _filter_ts_factory(**cfg):
    return lambda df: filter_timestamp(
        df,
        ts_col=cfg.pop("ts_col", "ts"),
        begin=cfg.pop("begin", None),
        end=cfg.pop("end", None),
    )


@register("processor_fields_with_condition")
def _fwc_factory(**cfg):
    cases = cfg_pop(cfg, "Switch", "cases")
    drop = cfg_pop(cfg, "DropIfNotMatchCondition", "drop_if_not_match", default=False)
    return lambda df: fields_with_condition(df, cases, drop_if_not_match=drop)


@register("processor_rate_limit")
def _rl_factory(**cfg):
    keys = cfg_pop(cfg, "Fields", "keys")
    limit = cfg_pop(cfg, "Limit", "limit_per_key")
    return lambda df: rate_limit(df, keys, int(limit))


@register("extension_group_info_filter")
@register("group_info_filter")
def _gif_factory(**cfg):
    tags = cfg_pop(cfg, "Tags", "tags", default=None)
    metas = cfg_pop(cfg, "Metas", "metas", default=None)
    return lambda df: group_info_filter(df, tags=tags, metas=metas)
