"""Every queries() entry must match its DuckDB oracle at sf0.001 —
the same check the driver runs at sf0.01."""

import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402

from tests.parity import compare, duck_connect  # noqa: E402

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_parity(name, spark, sf_dir, duck):
    if name not in ORACLES:
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0  # rows-only check, like the driver
        return
    ok, msg = compare(QUERIES[name](spark, sf_dir), duck, ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_output_types_are_hashable(name, duck):
    """Structural guard (round-4 verdict item 1): no oracle may emit a
    DuckDB HUGEINT/UHUGEINT/DECIMAL output column.  The driver's hasher
    fetches via pandas/Arrow, which converts INT128/decimal to
    float64/object, so the value hash diverges from Spark even when the
    values are identical (the q70/q71 round-4 reds).  Window sum(BIGINT)
    and integer `//`/`%` on it are the usual culprits — CAST back."""
    rows = duck.execute(f"DESCRIBE {ORACLES[name]}").fetchall()
    bad = [
        (cname, ctype)
        for cname, ctype, *_ in rows
        if any(t in ctype.upper() for t in ("HUGEINT", "DECIMAL"))
    ]
    assert not bad, (
        f"{name}: oracle emits pandas-unhashable column types {bad}; "
        "CAST(... AS BIGINT/DOUBLE) in the oracle SQL"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
