"""Property: dissect is CONSERVATIVE w.r.t. the regex it compiles.

For any input string: dissect_ok ⇒ regex_ok with identical captures
(first-anchor carving that passes every char-class check is exactly
the leftmost regex match). The converse doesn't hold — regex may
recover via backtracking over repeated anchors (documented deviation,
parse.py::parse_dissect) — and on fixture-shaped data the two agree
exactly (tests/test_oracle_parity.py covers that direction).

Inputs are generated once at the driver (seeded RNG over an adversarial
alphabet of anchor fragments, quotes and digits) and evaluated in ONE Spark job —
per-example Spark jobs would take minutes.
"""

import random

from pyspark.sql import functions as F

from ilogtail_spark.operators.parse import (
    PARSE_OK_KEY,
    ParserOptions,
    parse_dissect,
    parse_regex,
)
from ilogtail_spark.sources.transcripts import GROK_FIELDS, GROK_PATTERN

FRAGMENTS = [
    "tool=", " status=", " latency_ms=", ' "', '" err=', "bash", "42",
    "GET", "/api/v1/x", "-", "E500", " ", '"', "tool=a", "status=",
    "xx yy", "", "\t", "latency_ms=7", "err=", "invoke ",
]


def _gen_strings(n: int, seed: int = 7) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        k = rng.randint(1, 12)
        out.append("".join(rng.choice(FRAGMENTS) for _ in range(k)))
    # plus exact valid lines and truncations of them
    valid = 'invoke tool=bash status=200 latency_ms=15 "GET /api/v1/x" err=-'
    out += [valid] + [valid[:i] for i in range(0, len(valid), 7)]
    return out


def test_dissect_conservative_vs_regex(spark):
    rows = [(i, s) for i, s in enumerate(_gen_strings(400))]
    df = spark.createDataFrame(rows, ["id", "text"])
    opts = ParserOptions(keep_source=True, keep_source_if_fail=True)

    a = parse_regex(df, GROK_PATTERN, GROK_FIELDS, options=opts).select(
        "id", F.col(PARSE_OK_KEY).alias("r_ok"),
        *[F.col(f).alias(f"r_{f}") for f in GROK_FIELDS],
    )
    b = parse_dissect(df, GROK_PATTERN, GROK_FIELDS, options=opts).select(
        "id", F.col(PARSE_OK_KEY).alias("d_ok"),
        *[F.col(f).alias(f"d_{f}") for f in GROK_FIELDS],
    )
    joined = a.join(b, "id").join(df, "id")
    # dissect_ok ⇒ regex_ok ∧ identical captures
    d_cat = F.concat_ws("|", *[F.col(f"d_{f}") for f in GROK_FIELDS])
    r_cat = F.concat_ws("|", *[F.col(f"r_{f}") for f in GROK_FIELDS])
    viol = joined.filter(F.col("d_ok") & ((~F.col("r_ok")) | (d_cat != r_cat)))
    bad = viol.select("text").limit(5).collect()
    assert not bad, [r["text"] for r in bad]
