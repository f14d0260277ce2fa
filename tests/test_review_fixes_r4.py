"""Round-4 review-fix regression tests (ADVICE.md + VERDICT.md items)."""

from pyspark.sql import functions as F


def test_escaped_percent_z_is_not_a_zone_token(spark):
    """ADVICE r3: '%%z' is a LITERAL '%z', not a zone token — the
    had_zone detection must walk %-pairs (common.fmt_has_tokens), so
    the trailing-Z tolerance suffix still applies to such formats."""
    from ilogtail_spark.plans.pipeline import build_pipeline

    t = build_pipeline([{"type": "processor_strptime", "SourceKey": "time",
                         "Format": "%%z %Y-%m-%dT%H:%M:%S"}])
    df = spark.createDataFrame(
        [("%z 2019-07-15T04:16:47Z",), ("%z 2019-07-15T04:16:47",)],
        "time string")
    rows = {r["time"]: r["ts"] for r in t(df).collect()}
    # both parse (tolerance absorbs the trailing Z), same instant
    vals = set(rows.values())
    assert None not in vals and len(vals) == 1, rows


def test_fmt_has_tokens_pair_walk():
    from ilogtail_spark.common import fmt_has_tokens

    assert fmt_has_tokens("%Y-%m %z", {"z", "Z"})
    assert fmt_has_tokens("%Z", {"z", "Z"})
    assert not fmt_has_tokens("%%z", {"z", "Z"})           # escaped
    assert not fmt_has_tokens("100%%zoom %H", {"z", "Z"})  # escaped mid-string
    assert fmt_has_tokens("%%%z", {"z", "Z"})              # literal % THEN %z
