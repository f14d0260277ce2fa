"""Prometheus metric relabeling (SURVEY.md §2 native processors).

processor_prom_relabel_metric_native
(core/plugin/processor/inner/ProcessorPromRelabelMetricNative.h:27-75,
docs/cn/plugins/processor/native/processor-prom-relabel-metric-native.md)
applies standard Prometheus ``relabel_config`` rules to metric events
and merges external labels with honor_labels / ``exported_<label>``
conflict handling. Metric events here are rows with a
``labels map<string,string>`` column (the shape
transform.log_to_metric produces once label keys are packed).

Everything is JVM map/regexp expressions — map_filter / map_concat /
map_from_entries over the labels map, rlike/regexp_replace for the
rules; no UDF, no shuffle. hashmod uses the md5-derived 60-bit hash
(cross-engine stable) of the joined source labels.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.operators.registry import cfg_pop, register


def _hash64(c: Column) -> Column:
    from ilogtail_spark.common import md5_hash64

    return md5_hash64(c)


def _safe_repl(repl: str, rx: str) -> str:
    """Prometheus replacement strings → Java regexp_replace-safe form:
    ``${n}`` normalizes to ``$n`` (both are valid Prometheus forms;
    Java only takes the latter for numbered groups), references to
    capture groups beyond the regex's group count become empty strings
    (Prometheus expands unset groups as empty; Java throws), and any
    remaining literal ``$`` / ``\\`` is escaped (Java throws on a
    dangling ``$`` or ``\\``)."""
    import re as _re

    ngroups = _re.compile(rx).groups
    out: list[str] = []
    i = 0
    while i < len(repl):
        ch = repl[i]
        if ch == "$":
            if repl[i : i + 2] == "$$":  # Go Expand: $$ = literal $
                out.append(r"\$")
                i += 2
                continue
            m = _re.match(r"\$(\d+)|\$\{(\d+)\}", repl[i:])
            if m:
                n = int(m.group(1) or m.group(2))
                if n <= ngroups:
                    out.append(f"${n}")
                i += m.end()
                continue
            out.append(r"\$")  # literal $ (no group ref follows)
        elif ch == "\\":
            out.append("\\\\")
        else:
            out.append(ch)
        i += 1
    return "".join(out)


def _set_label(labels: Column, key: str, value: Column) -> Column:
    return F.map_concat(
        F.map_filter(labels, lambda k, _v: k != key),
        F.create_map(F.lit(key), value),
    )


def prom_relabel(
    df: DataFrame,
    configs: list[dict],
    labels_col: str = "labels",
    separator: str = ";",
) -> DataFrame:
    """Apply an ordered list of Prometheus relabel_configs. Each:
    {"action": keep|drop|replace|hashmod|labelmap|labeldrop|labelkeep,
     "source_labels": [...], "regex": r, "replacement": repl,
     "target_label": t, "modulus": m}. Regexes are full-anchored as in
    Prometheus; ``replace`` leaves the target untouched when the
    regex does not match; absent source labels join as empty strings.
    """
    labels = F.col(labels_col)
    for cfg in configs:
        action = cfg.get("action", "replace")
        rx = cfg.get("regex", "(.*)")
        anchored = f"^(?:{rx})$"
        src = cfg.get("source_labels", [])
        val = F.concat_ws(
            separator,
            *[F.coalesce(F.element_at(labels, s), F.lit("")) for s in src],
        )
        if action == "keep":
            df = df.filter(val.rlike(anchored))
        elif action == "drop":
            df = df.filter(~val.rlike(anchored))
        elif action == "replace":
            tgt = cfg["target_label"]
            repl = _safe_repl(cfg.get("replacement", "$1"), rx)
            new = F.regexp_replace(val, anchored, repl)
            df = df.withColumn(
                labels_col,
                F.when(val.rlike(anchored), _set_label(labels, tgt, new)).otherwise(
                    labels
                ),
            )
        elif action == "hashmod":
            tgt = cfg["target_label"]
            mod = int(cfg["modulus"])
            df = df.withColumn(
                labels_col,
                _set_label(
                    labels, tgt, F.pmod(_hash64(val), F.lit(mod)).cast("string")
                ),
            )
        elif action == "labeldrop":
            df = df.withColumn(
                labels_col, F.map_filter(labels, lambda k, _v: ~k.rlike(anchored))
            )
        elif action == "labelkeep":
            df = df.withColumn(
                labels_col, F.map_filter(labels, lambda k, _v: k.rlike(anchored))
            )
        elif action == "labelmap":
            repl = _safe_repl(cfg.get("replacement", "$1"), rx)
            entries = F.map_entries(labels)
            renamed = F.transform(
                F.filter(entries, lambda e: e["key"].rlike(anchored)),
                lambda e: F.struct(
                    F.regexp_replace(e["key"], anchored, repl).alias("key"),
                    e["value"].alias("value"),
                ),
            )
            new_keys = F.transform(renamed, lambda e: e["key"])
            survivors = F.filter(
                entries, lambda e: ~F.array_contains(new_keys, e["key"])
            )
            # overwrite semantics on renamed-key collisions (two meta
            # labels mapping to one name): fold with last-wins instead
            # of map_from_entries, which throws on duplicates
            from ilogtail_spark.common import map_last_wins

            df = df.withColumn(
                labels_col, map_last_wins(F.concat(survivors, renamed))
            )
        else:
            raise ValueError(f"prom_relabel: unknown action {action!r}")
        labels = F.col(labels_col)
    return df


def merge_external_labels(
    df: DataFrame,
    external: dict[str, str],
    labels_col: str = "labels",
    honor_labels: bool = False,
) -> DataFrame:
    """Scrape-config external_labels merge: honor_labels=True keeps
    the event's own value on conflict; otherwise the event's value is
    renamed to ``exported_<label>`` and the external value wins (the
    reference's documented conflict handling)."""
    labels = F.col(labels_col)
    for k, v in external.items():
        has = F.map_contains_key(labels, k)
        if honor_labels:
            labels_new = F.when(has, labels).otherwise(
                F.map_concat(labels, F.create_map(F.lit(k), F.lit(v)))
            )
        else:
            exported = F.map_from_entries(
                F.transform(
                    F.map_entries(F.map_filter(labels, lambda kk, _v: kk == k)),
                    lambda e: F.struct(
                        F.concat(F.lit("exported_"), e["key"]).alias("key"),
                        e["value"].alias("value"),
                    ),
                )
            )
            base = F.map_filter(labels, lambda kk, _v: (kk != k) & (kk != f"exported_{k}"))
            labels_new = F.map_concat(base, exported, F.create_map(F.lit(k), F.lit(v)))
        df = df.withColumn(labels_col, labels_new)
        labels = F.col(labels_col)
    return df


@register("processor_prom_relabel_metric_native")
def _prom_relabel_factory(**cfg):
    configs = cfg_pop(cfg, "MetricRelabelConfigs", "configs", default=[])
    external = cfg_pop(cfg, "ExternalLabels", "external_labels", default=None)
    honor = cfg_pop(cfg, "HonorLabels", "honor_labels", default=False)
    labels_col = cfg_pop(cfg, "labels_col", default="labels")

    def run(df):
        if external:
            df = merge_external_labels(
                df, external, labels_col=labels_col, honor_labels=honor
            )
        return prom_relabel(df, configs, labels_col=labels_col)

    return run
