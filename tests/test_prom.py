"""Prometheus relabel goldens (standard relabel_config semantics,
ProcessorPromRelabelMetricNative + public Prometheus docs)."""

from pyspark.sql import functions as F

from ilogtail_spark.operators.prom import merge_external_labels, prom_relabel


def _mdf(spark, labels_rows):
    return spark.createDataFrame(
        [(i, m) for i, m in enumerate(labels_rows)],
        "id int, labels map<string,string>",
    )


def test_relabel_keep_drop(spark):
    df = _mdf(spark, [{"job": "api"}, {"job": "batch"}])
    kept = prom_relabel(df, [{"action": "keep", "source_labels": ["job"], "regex": "api"}])
    assert [r["labels"]["job"] for r in kept.collect()] == ["api"]
    dropped = prom_relabel(df, [{"action": "drop", "source_labels": ["job"], "regex": "api"}])
    assert [r["labels"]["job"] for r in dropped.collect()] == ["batch"]


def test_relabel_replace_multi_source_and_nomatch(spark):
    df = _mdf(spark, [{"a": "x", "b": "y"}, {"a": "q"}])
    out = prom_relabel(
        df,
        [{
            "action": "replace", "source_labels": ["a", "b"],
            "regex": "x;(.*)", "target_label": "t", "replacement": "got_$1",
        }],
    ).orderBy("id").collect()
    assert out[0]["labels"]["t"] == "got_y"
    assert "t" not in out[1]["labels"]  # no match -> target untouched


def test_relabel_labelmap_keep_drop(spark):
    df = _mdf(spark, [{"__meta_k8s_pod": "p1", "job": "api"}])
    out = prom_relabel(
        df,
        [{"action": "labelmap", "regex": "__meta_k8s_(.*)", "replacement": "k8s_$1"}],
    ).first()
    assert out["labels"]["k8s_pod"] == "p1" and out["labels"]["job"] == "api"
    out2 = prom_relabel(df, [{"action": "labeldrop", "regex": "__meta_.*"}]).first()
    assert dict(out2["labels"]) == {"job": "api"}
    out3 = prom_relabel(df, [{"action": "labelkeep", "regex": "job"}]).first()
    assert dict(out3["labels"]) == {"job": "api"}


def test_external_labels_conflict(spark):
    df = _mdf(spark, [{"role": "assistant"}])
    honored = merge_external_labels(df, {"role": "scraper"}, honor_labels=True).first()
    assert honored["labels"]["role"] == "assistant"
    exported = merge_external_labels(df, {"role": "scraper"}, honor_labels=False).first()
    assert exported["labels"]["role"] == "scraper"
    assert exported["labels"]["exported_role"] == "assistant"


def test_relabel_registry(spark):
    from ilogtail_spark.operators.registry import OPERATORS

    df = _mdf(spark, [{"job": "api"}])
    fn = OPERATORS["processor_prom_relabel_metric_native"](
        ExternalLabels={"cluster": "c1"},
        MetricRelabelConfigs=[
            {"action": "hashmod", "source_labels": ["job"], "target_label": "shard", "modulus": 4}
        ],
    )
    out = fn(df).first()
    assert out["labels"]["cluster"] == "c1"
    assert out["labels"]["shard"] in {"0", "1", "2", "3"}


def test_relabel_groupless_regex_default_replacement(spark):
    # Prometheus expands unset group refs to ''; must not throw
    df = _mdf(spark, [{"job": "up"}])
    out = prom_relabel(
        df, [{"action": "replace", "source_labels": ["job"], "regex": "up",
              "target_label": "t"}]
    ).first()
    assert out["labels"]["t"] == ""


def test_relabel_labelmap_collision_overwrites(spark):
    df = _mdf(spark, [{"meta_a_x": "1", "meta_b_x": "2", "job": "api"}])
    out = prom_relabel(
        df, [{"action": "labelmap", "regex": "meta_._(.*)", "replacement": "$1"}]
    ).first()
    labels = dict(out["labels"])
    assert labels["job"] == "api"
    assert labels["x"] in {"1", "2"}  # collision resolved by overwrite, no throw


def test_relabel_brace_group_refs_and_literal_dollar(spark):
    """ADVICE: ${1} (standard Prometheus form) must normalize to $1;
    a literal $ in the replacement must not throw in Java regex."""
    from ilogtail_spark.operators.prom import prom_relabel

    df = spark.createDataFrame(
        [(1, {"tool": "bash"})], "id int, labels map<string,string>"
    )
    out = prom_relabel(
        df,
        [
            {
                "action": "replace",
                "source_labels": ["tool"],
                "regex": "(ba.*)",
                "target_label": "grp",
                "replacement": "g_${1}",
            },
            {
                "action": "replace",
                "source_labels": ["tool"],
                "regex": "(.*)",
                "target_label": "cost",
                # $$ = literal $ (Go Expand); $5 / ${2} = unset groups -> ""
                "replacement": "$$5.00-${2}x$",
            },
        ],
    ).first()
    assert out["labels"]["grp"] == "g_bash"
    assert out["labels"]["cost"] == "$5.00-x$"
