"""Plan-shape assertions — the 100 TB posture checks.

These inspect `.explain` output rather than results: predicate
pushdown reaches the parquet scan, the flagship pre-aggregation path
is shuffle-free, enrichment is broadcast (never a shuffle join), and
the dissect parse path contains no java.util.regex expression.
"""

from pyspark.sql import functions as F

from ilogtail_spark.plans.pipeline import (
    enrich_stage,
    parse_stage,
    route_stage,
    transcript_pipeline,
)
from ilogtail_spark.sources.tables import load_table
from ilogtail_spark.sources.transcripts import derive_transcripts


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    plan = _plan(df.select("event_id"))
    assert "PushedFilters" in plan or "pushedFilters" in plan.lower()
    # column pruning: ts not read for this projection
    assert "ts" not in plan.split("ReadSchema")[-1].split("\n")[0]


def test_flagship_pre_agg_is_shuffle_free(spark, sf_dir):
    routed = transcript_pipeline(spark, sf_dir)
    plan = _plan(routed)
    # broadcast exchanges are fine; no shuffle (Exchange hashpartitioning /
    # rangepartitioning) may appear between scan and route
    for line in plan.split("\n"):
        if "Exchange" in line and "Broadcast" not in line:
            assert "REPARTITION" in line, f"unexpected shuffle: {line.strip()}"


def test_enrich_is_broadcast_join(spark, sf_dir):
    df = enrich_stage(parse_stage(derive_transcripts(spark, sf_dir)), spark)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_dissect_path_has_no_jvm_regex(spark, sf_dir):
    df = parse_stage(derive_transcripts(spark, sf_dir), engine="dissect")
    plan = _plan(df)
    for token in ("regexp_extract", "RLike", "rlike"):
        assert token not in plan, f"java.util.regex op {token} in dissect plan"


def test_dissect_plan_stays_small_under_filter_pushdown(spark, sf_dir):
    from ilogtail_spark.operators.parse import PARSE_OK_KEY

    df = parse_stage(derive_transcripts(spark, sf_dir)).filter(F.col(PARSE_OK_KEY))
    plan = _plan(df.groupBy("tool_call", "status").count())
    # regression guard: the naive rest-chaining formulation exploded to
    # a ~170 KB plan once filter pushdown substituted the chain
    assert len(plan) < 60_000, f"plan blew up to {len(plan)} chars"
