"""Training-data curation operators: decontamination, deterministic
stratified sampling, GPT-style sequence packing. Semantics goldens +
the plan-shape properties that make each scale-safe."""

from pyspark.sql import functions as F

from ilogtail_spark.functions.dedup import decontaminate
from ilogtail_spark.functions.packing import pack_sequences
from ilogtail_spark.functions.sampling import (
    RATE_DENOM,
    sample_bucket,
    stratified_sample,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- decontam

def test_decontaminate_flags_shared_grams(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),       # shares 'alpha beta gamma'
            (2, "zeta eta theta iota"),           # clean
            (3, "beta gamma delta epsilon"),      # shares 'beta gamma delta'
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, k=3).collect()}
    assert set(out) == {1, 3}
    # doc 1: grams {abg, bgd} -> both in benchmark
    assert out[1]["n_grams"] == 2 and out[1]["n_contaminated"] == 2
    assert out[1]["contamination"] == 1.0
    assert out[3]["n_contaminated"] == 2  # 'beta gamma delta', 'gamma delta epsilon'


def test_decontaminate_benchmark_rides_broadcast(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)],
        "doc_id long, text string",
    )
    bench = docs.limit(3)
    plan = _plan(decontaminate(docs, bench))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


# ---------------------------------------------------------------- sampling

def test_stratified_sample_deterministic_and_rated(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(
        df, {"en": 0.5}, stratum_col="lang", id_col="doc_id", default_rate=0.1
    )
    got = sorted(r["doc_id"] for r in out.collect())
    # deterministic: identical on re-run
    assert got == sorted(r["doc_id"] for r in out.collect())
    by_lang = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # 1000 docs per stratum; hash-uniform so counts land near rate
    assert abs(by_lang["en"] - 500) < 100
    assert abs(by_lang.get("de", 0) - 100) < 60


def test_stratified_sample_is_narrow(spark):
    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    plan = _plan(
        stratified_sample(df, {"en": 0.5}, stratum_col="lang", id_col="doc_id")
    )
    assert "Exchange" not in plan  # a pure filter: no shuffle, no join


def test_sample_bucket_range(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    b = df.select(sample_bucket(F.col("doc_id")).alias("b"))
    lo, hi = b.agg(F.min("b"), F.max("b")).first()
    assert 0 <= lo and hi < RATE_DENOM


# ---------------------------------------------------------------- packing

def test_pack_sequences_matches_single_stream_scan(spark):
    rows = [(i, "s", 10 + (i % 7)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, stream string, n_tok long")
    out = pack_sequences(
        df, budget=64, tokens_col="n_tok", stream_col="stream",
        order_col="doc_id", shard_span=16,
    ).orderBy("doc_id").collect()
    # reference: plain sequential scan
    cum = 0
    for r in sorted(rows):
        start, end = cum, cum + r[2]
        cum = end
        got = next(x for x in out if x["doc_id"] == r[0])
        assert got["seq_id"] == start // 64, (r, got)
        assert got["seq_offset"] == start % 64
        assert got["straddles"] == (r[2] > 0 and (end - 1) // 64 > start // 64)


def test_pack_sequences_negative_and_huge_order_keys(spark):
    """Shard assignment is exact integer FLOOR division: negative
    order keys must keep rising shard ids (truncation toward zero
    would collapse shards -x and +x into shard 0 and scramble
    concatenation order), and keys above 2^53 must not lose precision
    through a double divide."""
    rows = [(k, "s", 10) for k in (-33, -17, -1, 0, 1, 16, 33)]
    df = spark.createDataFrame(rows, "doc_id long, stream string, n_tok long")
    out = pack_sequences(
        df, budget=64, tokens_col="n_tok", stream_col="stream",
        order_col="doc_id", shard_span=16,
    ).orderBy("doc_id").collect()
    cum = 0
    for r, got in zip(sorted(rows), out):
        assert got["doc_id"] == r[0]
        assert got["seq_id"] == cum // 64 and got["seq_offset"] == cum % 64, got
        cum += r[2]
    # 2^53+1 and 2^53+17 are distinguishable only with exact division
    big = 2**53
    rows2 = [(big + 1, "s", 5), (big + 17, "s", 5)]
    df2 = spark.createDataFrame(rows2, "doc_id long, stream string, n_tok long")
    out2 = pack_sequences(
        df2, budget=64, tokens_col="n_tok", stream_col="stream",
        order_col="doc_id", shard_span=16,
    ).orderBy("doc_id").collect()
    assert [r["seq_offset"] for r in out2] == [0, 5]


def test_pack_sequences_no_stream_wide_window(spark):
    """The scale property: no Window partitioned by the stream key
    alone — prefix sums run within (stream, shard) and the only
    stream-wide window is over the tiny shard-totals aggregate."""
    df = spark.createDataFrame(
        [(i, "en", 5) for i in range(100)], "doc_id long, stream string, n_tok long"
    )
    plan = _plan(
        pack_sequences(
            df, budget=64, tokens_col="n_tok", stream_col="stream",
            order_col="doc_id", shard_span=16,
        )
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    for line in plan.split("\n"):
        if "Window" in line and "partitionBy" not in line:
            # window spec prints as [partition: stream, _shard] — the
            # corpus-side window must carry the shard key
            if "_shard" not in line and "_shard_tokens" not in line \
               and "_shard_offset" not in line and "windowspecdefinition" in line.lower():
                raise AssertionError(f"stream-wide window on corpus: {line}")


# ------------------------------------------------------------ q71 funnel

def test_curation_pipeline_stages_nonvacuous(spark, sf_dir):
    """Every stage of the q71 composite must remove/annotate rows on
    the fixture: planted exact copies dedup away, some docs are
    contaminated, the sample is a strict subset, and sequences pack
    more than one doc."""
    import __spark_entry__ as entrymod
    from ilogtail_spark.functions.dedup import decontaminate, exact_dedup
    from ilogtail_spark.functions.textstats import token_count

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    copies = docs.filter(
        (F.col("doc_id") % 23 == 0) & (F.col("lang") == "en")
    ).withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000))
    n_copies = copies.count()
    assert n_copies > 0
    base = (
        docs.unionByName(copies)
        .filter((F.col("lang") == "en") & (F.col("doc_id") % 101 != 0))
        .withColumn("n_tok", token_count(F.col("text")).cast("long"))
        .filter(F.col("n_tok") >= 20)
    )
    dup_groups = exact_dedup(base).filter(F.col("n_copies") > 1).count()
    assert dup_groups > 0  # the planted copies form real dup groups
    bench = docs.filter(F.col("doc_id") % 101 == 0)
    assert decontaminate(base, bench).count() > 0
    out = entrymod.queries()["q71_curation_pipeline"](spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in out) > len(out)  # packing packs


# --------------------------------------------------------------------------
# round 4: paragraph dedup / PII scrub / classifier score
# --------------------------------------------------------------------------

def test_paragraph_dedup_first_occurrence_wins(spark):
    from ilogtail_spark.functions.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [
            (1, "HEADER\nalpha beta\nFOOTER"),
            (2, "HEADER\ngamma delta\nFOOTER"),
            (3, "HEADER"),  # all boilerplate -> dropped entirely
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in paragraph_dedup(docs, "text", "doc_id").collect()}
    assert out[1]["text"] == "HEADER\nalpha beta\nFOOTER"
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (3, 0)
    assert out[2]["text"] == "gamma delta"  # header+footer already seen
    assert (out[2]["n_kept"], out[2]["n_dropped"]) == (1, 2)
    assert 3 not in out  # empty after dedup -> dropped


def test_paragraph_dedup_plan_no_nested_loop(spark):
    from ilogtail_spark.functions.dedup import paragraph_dedup

    docs = spark.createDataFrame([(1, "a\nb")], "doc_id long, text string")
    plan = (
        paragraph_dedup(docs, "text", "doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pii_scrub_rules_and_order(spark):
    from ilogtail_spark.functions.pii import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.co.uk call (415)-555-1212 "
                "ssn 999-11-2222 ip 255.255.0.19 done"),
            (2, "no pii here at all"),
            # the phone rule must not eat the SSN (ssn redacts first)
            (3, "123-45-6789 and 555-010-2222 x"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in pii_scrub(df, "text").collect()}
    r = out[1]
    assert (r["n_email"], r["n_ssn"], r["n_phone"], r["n_ipv4"]) == (1, 1, 1, 1)
    assert r["text_scrubbed"] == (
        "mail <EMAIL> call <PHONE> ssn <SSN> ip <IP> done"
    )
    assert out[2]["text_scrubbed"] == "no pii here at all"
    r3 = out[3]
    assert (r3["n_ssn"], r3["n_phone"]) == (1, 1)
    assert r3["text_scrubbed"] == "<SSN> and <PHONE> x"


def test_classifier_score_deterministic_and_bounded(spark):
    from ilogtail_spark.functions.textstats import classifier_score

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the quick brown fox"), (3, "zzz")],
        "doc_id long, text string",
    )
    out = df.select("doc_id", classifier_score(F.col("text")).alias("m")).collect()
    m = {r["doc_id"]: r["m"] for r in out}
    assert m[1] == m[2]  # deterministic
    assert all(-1.0 <= v <= 1.0 for v in m.values())


def test_domain_cap_matches_window_form_and_bounds(spark):
    """Salted two-phase top-N == plain row_number selection; every
    domain keeps at most cap docs; selection is (h, id) ascending."""
    from pyspark.sql import Window

    from ilogtail_spark.common import md5_hash64
    from ilogtail_spark.functions.sampling import domain_cap

    df = spark.createDataFrame(
        [(d, f"dom{d % 3}") for d in range(60)], "doc_id long, source string"
    )
    got = {
        (r["source"], r["rank"]): r["doc_id"]
        for r in domain_cap(df, cap=4, salt_buckets=4).collect()
    }
    h = md5_hash64(F.concat(F.lit("cap:"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    want = {
        (r["source"], r["rank"]): r["doc_id"]
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 4)
        .collect()
    }
    assert got == want
    assert len(got) == 12  # 3 domains x cap 4


def test_domain_cap_plan_has_no_window(spark):
    """The 100 TB posture: no Window operator (hot-domain funnel);
    two hash/object aggregates with a partial phase instead."""
    from ilogtail_spark.functions.sampling import domain_cap

    df = spark.createDataFrame(
        [(d, f"dom{d % 3}") for d in range(30)], "doc_id long, source string"
    )
    plan = domain_cap(df, cap=4)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial" in plan.lower()  # map-side combine present


def test_c4_line_filters_rules(spark):
    from ilogtail_spark.functions.textstats import c4_line_filters

    doc = "\n".join(
        [
            "this line is long enough to survive the filter.",  # keep
            "too short.",  # short
            "no terminal punctuation on this line here",  # no punct
            "lorem ipsum filler text that would otherwise pass.",  # lorem
            "a code leak { appears in this long line here.",  # brace
            "another perfectly fine surviving line right here!",  # keep
            'quoted line endings also count as terminal marks"',  # keep
        ]
    )
    df = spark.createDataFrame([(1, doc), (2, "tiny.")], "doc_id long, text string")
    out = c4_line_filters(df, "text", min_words=5, min_lines=3).collect()
    assert len(out) == 1  # doc 2 dropped: < 3 surviving lines
    r = out[0]
    assert (r["n_lines"], r["n_kept"]) == (7, 3)
    assert (r["n_no_punct"], r["n_short"]) == (1, 1)
    assert (r["n_lorem"], r["n_brace"]) == (1, 1)
    assert r["text_filtered"].split("\n")[1].startswith("another perfectly")


def test_gopher_quality_rules(spark):
    from ilogtail_spark.functions.textstats import gopher_quality

    long_good = " ".join(["the quick brown fox of that kind jumps"] * 8)
    bullets = "\n".join(["- short line here"] * 4)
    symbols = "the " * 60 + "# " * 20
    df = spark.createDataFrame(
        [(1, long_good), (2, "tiny doc."), (3, bullets), (4, symbols)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           gopher_quality(df, min_stopwords=2).collect()}
    assert out[1]["gopher_keep"]  # 64 words, stopwords the/of/that
    assert out[1]["n_stopwords"] == 3
    assert not out[2]["gopher_keep"]  # word_count < 50
    assert out[3]["bullet_frac"] == 1.0 and not out[3]["gopher_keep"]
    assert out[4]["symbol_ratio"] > 0.1 and not out[4]["gopher_keep"]
