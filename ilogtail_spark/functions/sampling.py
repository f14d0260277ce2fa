"""Deterministic sampling for training-data curation.

Hash-based stratified sampling: membership is a pure function of the
row id and the stratum's rate — reproducible across runs, engines and
cluster sizes, no RNG state, no shuffle. This is the only sampling
form that survives 100 TB: a seeded ``df.sample`` resamples on task
retry and a per-stratum exact-quota draw needs a global sort per
stratum; the hash filter is a narrow expression the scan pipeline
absorbs."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ilogtail_spark.common import md5_hash64

RATE_DENOM = 10_000  # rates quantize to basis points


def sample_bucket(id_col: Column) -> Column:
    """The row's deterministic bucket in [0, RATE_DENOM): shared
    md5→60-bit primitive mod 10000 (mirrored in DuckDB as
    ('0x'||substr(md5(x),1,15))::BIGINT % 10000 — the hash is 60-bit
    positive, so % == pmod in both engines)."""
    return F.pmod(md5_hash64(id_col.cast("string")), F.lit(RATE_DENOM))


def rate_bp(
    rates: dict[str, float], stratum_col: str, default_rate: float = 0.0
) -> Column:
    """The stratum's sampling rate in basis points, as an inline CASE
    chain over the (small, literal) rate dict — no join at all."""
    bp = F.lit(int(round(default_rate * RATE_DENOM)))
    for stratum, rate in sorted(rates.items()):
        bp = F.when(
            F.col(stratum_col) == stratum, F.lit(int(round(rate * RATE_DENOM)))
        ).otherwise(bp)
    return bp


def keep_row(
    rates: dict[str, float],
    stratum_col: str,
    id_col: str,
    default_rate: float = 0.0,
) -> Column:
    """Boolean sampling-membership predicate (usable as a filter OR as
    a conditional-aggregation flag — the latter counts sampled and
    total rows in ONE scan)."""
    return sample_bucket(F.col(id_col)) < rate_bp(rates, stratum_col, default_rate)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    id_col: str,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff its hash bucket < its stratum's rate (in
    basis points). The whole operator is a filter fused into the scan
    stage."""
    return df.filter(keep_row(rates, stratum_col, id_col, default_rate))


def domain_cap(
    df: DataFrame,
    cap: int,
    domain_col: str = "source",
    id_col: str = "doc_id",
    salt_buckets: int = 16,
) -> DataFrame:
    """RefinedWeb/C4-style per-domain frequency cap: keep at most
    ``cap`` docs per domain, selected by the deterministic hash
    ``md5_hash64('cap:' || id)`` so the survivors are a uniform draw
    over the domain (no crawl-order bias), reproducible across
    engines and cluster sizes.

    100 TB shape: NOT ``row_number`` over ``partitionBy(domain)`` —
    a hot domain (the web has 10^8-page hosts) funnels its whole
    population through one task. Salted two-phase top-N instead:

    1. per (domain, salt) partial top-``cap`` via
       ``slice(array_sort(collect_list(struct(h,id))), 1, cap)`` —
       ObjectHashAggregate with map-side partial combine, per-group
       state bounded at ``cap`` structs;
    2. final top-``cap`` per domain over at most
       ``salt_buckets*cap`` survivors.

    Selection order is (h, id) ascending — ties (h collisions) break
    on the id, so the winner set is total-ordered and exact.
    Output: (domain, rank, id) with rank 1..cap.
    """
    h = md5_hash64(F.concat(F.lit("cap:"), F.col(id_col).cast("string")))
    salted = df.select(
        F.col(domain_col).alias("_dom"),
        F.struct(h.alias("h"), F.col(id_col).alias("id")).alias("_s"),
    ).withColumn("_salt", F.pmod(F.col("_s.h"), F.lit(salt_buckets)))
    part = salted.groupBy("_dom", "_salt").agg(
        F.slice(F.array_sort(F.collect_list("_s")), 1, cap).alias("_top")
    )
    winners = part.groupBy("_dom").agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("_top"))), 1, cap).alias("_win")
    )
    return winners.select(
        F.col("_dom").alias(domain_col), F.posexplode("_win")
    ).select(
        domain_col,
        (F.col("pos") + 1).alias("rank"),
        F.col("col.id").alias(id_col),
    )
