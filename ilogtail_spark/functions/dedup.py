"""Deduplication for training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle → minhash → band →
bucket-join), SimHash, and n-gram Jaccard. All hashing is md5-derived
so every signature is bit-identical in DuckDB — the whole family is
oracle-checkable, not just row counts.

Scale design (100 TB): the LSH path is
  shingle (narrow) → signature (narrow) → explode bands (narrow,
  ×n_bands) → self-join on (band_idx, band_hash) (ONE shuffle keyed
  by band hash — uniformly distributed by construction) → exact
  verify on the candidate pairs only (second small join).
No all-pairs stage ever materializes; candidate volume scales with
true duplicate density, not n².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


from ilogtail_spark.common import spread  # noqa: F401  (canonical home)


def word_shingles(col: Column, k: int = 3) -> Column:
    """Lowercased word k-gram shingle set (distinct).

    Built with k shifted ``slice``s zipped together rather than
    ``sequence`` + per-gram ``element_at`` arithmetic — higher-order
    functions evaluate interpreted (outside codegen), so the zip
    formulation's single cheap lambda is ~8× faster measured at sf0.1.
    """
    words = F.split(F.lower(F.trim(col)), r"\s+")
    n = F.size(words)
    zipped = F.arrays_zip(
        *[F.slice(words, j + 1, F.greatest(n - F.lit(k - 1), F.lit(1))) for j in range(k)]
    )
    grams = F.transform(
        zipped, lambda x: F.concat_ws(" ", *[x[f"{j}"] for j in range(k)])
    )
    # degenerate short docs: single shingle of the whole text
    grams = F.when(n >= k, grams).otherwise(F.array(F.concat_ws(" ", words)))
    return F.array_distinct(grams)


def _md5_hash64(c: Column) -> Column:
    """Canonical cross-engine 60-bit hash (common.md5_hash64)."""
    from ilogtail_spark.common import md5_hash64

    return md5_hash64(c)


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature: h_i = min over shingles of
    md5_64(i || ':' || shingle). Array<long> of length num_hashes."""
    def hasher(prefix: str):
        # single-arg lambda: a 2-arg lambda would be (element, index)
        # to F.transform and the index Column would shadow the prefix
        return lambda s: _md5_hash64(F.concat(F.lit(prefix), s))

    return F.array(
        *[
            F.array_min(F.transform(shingles, hasher(f"{i}:")))
            for i in range(num_hashes)
        ]
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via md5 hash-groupBy: one row per distinct text with
    the canonical (min) id and copy count."""
    return (
        df.withColumn("text_hash", F.md5(F.col(text_col)))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Paragraph-level exact dedup with document reconstruction — the
    boilerplate-removal pass of web-corpus curation (RefinedWeb /
    Dolma style): split every document on ``sep``, keep each distinct
    paragraph ONLY at its first global occurrence (ordered by
    (id, position) — deterministic, retry-stable), reassemble the
    survivors in original order, and drop documents left empty.
    Repeated headers/footers/nav-chrome survive in exactly one
    document; unique prose is untouched.

    Output: ``(id, text, n_kept, n_dropped)`` with ``text`` the
    rebuilt document.

    Scale shape: posexplode (narrow) → one groupBy on the 60-bit
    paragraph hash (uniform shuffle key; partial agg combines
    map-side) → one hash-equi-join back on the same key (no
    re-partition: both sides already hash-partitioned by it) → one
    groupBy(id) rebuild whose per-group size is bounded by the
    document's own paragraph count.  Nothing is ever keyed by the
    paragraph STRING — an 8-byte key shuffles, strings stay columnar.
    """
    from ilogtail_spark.common import md5_hash64

    paras = df.select(
        F.col(id_col).alias("_id"),
        # \Q..\E: sep is a LITERAL in both directions — F.split takes a
        # regex but array_join rebuilds with the raw string, so an
        # unquoted metacharacter sep ('.', '||') would corrupt docs.
        # An embedded \E would end the quote early; re-open around it
        # exactly as java.util.regex.Pattern.quote does
        F.posexplode(
            F.split(
                F.col(text_col),
                "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E",
            )
        ).alias("_pos", "_para"),
    ).withColumn("_h", md5_hash64(F.col("_para")))
    winners = paras.groupBy("_h").agg(
        F.min(F.struct(F.col("_id"), F.col("_pos"))).alias("_w")
    )
    kept = paras.join(winners, "_h").withColumn(
        "_keep", (F.col("_id") == F.col("_w._id")) & (F.col("_pos") == F.col("_w._pos"))
    )
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_keep"), F.struct(F.col("_pos"), F.col("_para")))
                    )
                ),
                lambda s: s["_para"],
            ),
            sep,
        ).alias(text_col),
        F.count(F.when(F.col("_keep"), F.lit(1))).alias("n_kept"),
        F.count(F.when(~F.col("_keep"), F.lit(1))).alias("n_dropped"),
    )
    return rebuilt.filter(F.col("n_kept") > 0).select(
        F.col("_id").alias(id_col), text_col, "n_kept", "n_dropped"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 8,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs.

    Signature of ``num_hashes`` minhashes split into ``bands`` bands
    (rows = num_hashes // bands); docs colliding in ANY band become
    candidates; candidates are verified with EXACT shingle Jaccard.
    Output: (id_a, id_b, jaccard) with id_a < id_b, j >= threshold.
    """
    rows = num_hashes // bands
    sh = spread(df).select(
        F.col(id_col).alias("_id"), word_shingles(F.col(text_col)).alias("_sh")
    ).withColumn("_sig", minhash_signature(F.col("_sh"), num_hashes))

    band_cols = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.md5(
                F.concat_ws(
                    ",", *[F.col("_sig")[b * rows + r].cast("string") for r in range(rows)]
                )
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    banded = sh.withColumn("_band", F.explode(F.array(*band_cols))).select(
        "_id", "_sh", F.col("_band.band_idx").alias("band_idx"),
        F.col("_band.band_hash").alias("band_hash"),
    )

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sh").alias("sh_a"),
            F.col("b._sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return (
        cand.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", F.round(F.col("jaccard"), 6).alias("jaccard"))
    )


def dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    jaccard_threshold: float = 0.5,
    max_iter: int = 10,
    max_doc_freq: int | None = 100,
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the
    pair graph, so a training pipeline can keep one canonical doc per
    component (transitively: A~B, B~C ⇒ {A,B,C} even when A~C is
    below threshold).

    Edges come from :func:`ngram_jaccard_pairs` (exact, inverted-index
    candidates). Components via min-label propagation WITH pointer
    jumping: each round first takes the min over neighbors' labels,
    then replaces every label by its label's label (path halving), so
    convergence needs O(log diameter) rounds — ``max_iter``=10 covers
    components ~2^10 deep, not 10 deep. Only nodes that appear in an
    edge enter the loop (the pair graph sizes with duplicate density,
    not corpus size); each round is two joins on that small set with a
    localCheckpoint to cut lineage, stopping at fixpoint. Isolated
    docs never shuffle — they join the result with cluster_id = their
    own id. Output: (doc_id, cluster_id), cluster_id = min doc id in
    the component.
    """
    pairs = ngram_jaccard_pairs(
        df, text_col, id_col, threshold=jaccard_threshold, max_doc_freq=max_doc_freq
    ).select("id_a", "id_b")
    edges = pairs.union(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).toDF("src", "dst")
    # materialize the edge list ONCE — every iteration joins against
    # it, and without the checkpoint each round would re-run the whole
    # inverted-index self-join through lineage
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    )
    labels = labels.localCheckpoint(eager=True)
    prev_sum = None
    for _ in range(max_iter):
        nbr = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
            .withColumnRenamed("dst", "id")
        )
        new = labels.join(nbr, "id", "left").select(
            "id",
            F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
        )
        # pointer jumping: label <- label[label] (path halving)
        hop = new.select(
            F.col("id").alias("_hid"), F.col("label").alias("_hlabel")
        )
        new = (
            new.join(hop, new["label"] == hop["_hid"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("_hlabel", "label")
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        labels = new
        # labels are monotonically non-increasing, so Σlabel strictly
        # decreases until fixpoint — one tiny agg action instead of a
        # compare-join per round
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(labels.withColumnRenamed("id", "doc_id"), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("label", "doc_id").alias("cluster_id")
        )
    )


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """SimHash over word 3-gram shingles with md5-derived gram hashes:
    bit i of the signature is the sign of Σ_grams (±1 per gram's bit
    i). 60 bits so the signature stays in a signed BIGINT in every
    engine. Explode + one groupBy; bit-majority computed with 60
    conditional sums (all codegen'd)."""
    grams = spread(df).select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(F.col(text_col))).alias("_g"),
    ).withColumn("_h", _md5_hash64(F.col("_g")))
    sums = grams.groupBy("_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"_b{i}")
            for i in range(60)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(60):
        sig = sig + F.when(F.col(f"_b{i}") > 0, F.lit(2**i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sums.select(F.col("_id").alias("doc_id"), sig.alias("simhash"))


def _gram_index(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """(_id, _n, _gh) inverted gram index: doc id, distinct-shingle
    count, md5-hashed exploded grams. |set| rides through the explode
    so downstream aggregations never need a post-join with a sizes
    table; the 8-byte hash replaces the gram string as the shuffle/
    join key. Shared by ngram_jaccard_pairs and decontaminate — one
    gram-hash pipeline, one definition."""
    sh = df.select(
        F.col(id_col).alias("_id"), word_shingles(F.col(text_col), k).alias("_sh")
    )
    return sh.select(
        "_id", F.size("_sh").alias("_n"), F.explode("_sh").alias("_g")
    ).select("_id", "_n", _md5_hash64(F.col("_g")).alias("_gh"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.3,
    max_doc_freq: int | None = 100,
) -> DataFrame:
    """Candidate-by-shared-shingle exact n-gram Jaccard.

    Inverted-index self-join on the shingle *hash* (cheap 8-byte
    shuffle key instead of the gram string), then |A∩B| falls out of
    ``groupBy(id_a,id_b).count()`` — shingle sets are distinct, so the
    number of colliding grams IS the intersection size. Set sizes join
    in per side and ``J = inter / (|A|+|B|-inter)``; no shingle array
    ever crosses a shuffle and no array_intersect runs on candidates.

    ``max_doc_freq`` caps the join's quadratic hot-key blowup: a gram
    appearing in f documents yields f² join rows, so stop-word-like
    shingles are dropped from the inverted index when their document
    frequency exceeds the cap (one extra pre-aggregation on the same
    shuffle key). Trade-off: intersections through capped grams are
    not counted — jaccard is UNDERESTIMATED for pairs sharing hot
    grams and pairs sharing ONLY hot grams are missed (lower recall,
    never false positives). ``None`` disables the cap (exact, unsafe
    on skewed corpora). Set sizes ``_n`` are computed BEFORE capping,
    keeping the denominator exact.
    """
    inv = _gram_index(spread(df), id_col, text_col)
    if max_doc_freq is not None:
        # the OVER-cap grams are few (stop-word tail of the gram
        # distribution), so: aggregate doc frequencies (map-side
        # partial combine shrinks the shuffle to distinct grams),
        # keep only df > cap, broadcast that blacklist as a LEFT ANTI
        # join. The full inverted index never re-shuffles for the cap
        # and no hot gram ever funnels through a single task — a
        # plain count window or non-broadcast join would.
        hot = (
            inv.groupBy("_gh")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_doc_freq)
            .select("_gh")
        )
        inv = inv.join(F.broadcast(hot), "_gh", "left_anti")
    inter = (
        inv.alias("a")
        .join(inv.alias("b"), (F.col("a._gh") == F.col("b._gh")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._n").alias("_na"),
            F.col("b._n").alias("_nb"),
        )
        .agg(F.count(F.lit(1)).alias("_inter"))
    )
    jac = F.col("_inter") / (F.col("_na") + F.col("_nb") - F.col("_inter"))
    return (
        inter.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round(F.col("jaccard"), 6).alias("jaccard"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train/test decontamination: flag training documents that share
    any word ``k``-gram with a benchmark/eval document (the published
    n-gram-overlap decontamination procedure of the GPT-3 / LLaMA
    papers, applied corpus-side).

    Scale design (100 TB corpus, benchmark ≪ corpus — that asymmetry
    IS the operator): the benchmark's distinct gram hashes are a few
    MB and ride a BROADCAST inner join against the corpus's exploded
    gram stream, so the corpus never shuffles by gram; the only
    shuffle is the per-doc hit re-aggregation keyed by ``id_col``
    (high-cardinality, partial-combined map-side). Returns one row
    per CONTAMINATED doc: distinct-gram total, hit count, and the
    contamination ratio.
    """
    bench_g = (
        _gram_index(benchmark, id_col, text_col, k).select("_gh").distinct()
    )
    hits = (
        _gram_index(docs, id_col, text_col, k)
        .join(F.broadcast(bench_g), "_gh")
        .groupBy("_id", "_n")
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    return hits.select(
        F.col("_id").alias(id_col),
        F.col("_n").alias("n_grams"),
        F.col("_hits").alias("n_contaminated"),
        F.round(F.col("_hits") / F.col("_n"), 6).alias("contamination"),
    )


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_len: int = 8,
) -> DataFrame:
    """Duplicated-PASSAGE detection at span resolution ``span_len``
    (the deduplicate-training-data result of Lee et al. 2021,
    arXiv:2107.06499, discretized to token ``span_len``-grams instead
    of suffix arrays): a position is duplicated iff its span_len-gram
    occurs MORE THAN ONCE in the corpus (within- or cross-document);
    per document the duplicated positions' windows are UNION-merged
    into covered-token counts.

    Output: ``(id, n_tokens, dup_tokens, dup_frac)`` — exact integer
    counts and one exact-integer division, oracle-exact.

    100 TB shape: one inverted index keyed by the 8-byte gram HASH
    (uniform shuffle key, map-side-combined count), one equi-join
    back on the same key (no re-partition), then a per-document
    interval-union FOLD over the sorted position list (per-group
    state bounded by the document's own length). Nothing is ever
    pairwise — a boilerplate gram in millions of documents costs one
    row per occurrence, not per pair (contrast ngram_jaccard_pairs'
    candidate join, which needs the df cap).
    """
    L = span_len
    w = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # spread: parallelize the heaviest narrow stage (per-position gram
    # build) before any shuffle, like the module's other entry points
    toks = spread(df).select(
        F.col(id_col).alias("_id"), w.alias("_w"), F.size(w).alias("_n")
    )
    grams = toks.select(
        "_id",
        "_n",
        # guard: sequence(1, 0) would generate DESCENDING [1, 0] (and
        # slice start 0 throws) — short docs contribute no spans.
        # Only the gram STRING builds inside the (interpreted)
        # higher-order lambda; the md5 fold hashes AFTER posexplode as
        # a codegen'd top-level column (the word_shingles ~8x lesson)
        F.posexplode(
            F.when(
                F.col("_n") >= L,
                F.transform(
                    F.sequence(F.lit(1), F.col("_n") - L + 1),
                    lambda i: F.array_join(F.slice(F.col("_w"), i, L), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("_pos", "_g"),
    ).select("_id", "_n", "_pos", _md5_hash64(F.col("_g")).alias("_h"))
    dup = (
        grams.groupBy("_h")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") > 1)
        .select("_h")
    )
    marked = grams.join(dup, "_h").select("_id", "_n", "_pos")
    acc0 = F.struct(
        F.lit(0).cast("long").alias("cov"), F.lit(0).cast("long").alias("tot")
    )

    def step(acc: Column, p: Column) -> Column:
        # positions sorted ascending; window [p, p+L) adds the tokens
        # past the covered frontier
        add = F.greatest(p + L - F.greatest(p, acc["cov"]), F.lit(0))
        return F.struct(
            F.greatest(acc["cov"], p + L).alias("cov"),
            (acc["tot"] + add).alias("tot"),
        )

    per_doc = (
        marked.groupBy("_id", "_n")
        .agg(F.sort_array(F.collect_list("_pos")).alias("_ps"))
        .select(
            "_id",
            "_n",
            F.aggregate(F.col("_ps"), acc0, step)["tot"].alias("_dup"),
        )
    )
    return (
        toks.select("_id", "_n")
        .join(per_doc, ["_id", "_n"], "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("_n").alias("n_tokens"),
            F.coalesce(F.col("_dup"), F.lit(0).cast("long")).alias("dup_tokens"),
            F.round(
                F.coalesce(F.col("_dup"), F.lit(0).cast("long")).cast("double")
                / F.col("_n").cast("double"),
                6,
            ).alias("dup_frac"),
        )
    )
