from ilogtail_spark.operators.filters import (
    fields_with_condition,
    filter_expression,
    filter_key_regex,
    filter_regex,
    filter_timestamp,
    rate_limit,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "ERROR timeout", "a"),
            (2, "INFO ok", "b"),
            (3, "ERROR disk", None),
        ],
        "id int, msg string, extra string",
    )


def test_filter_regex_include_partial_match(spark):
    # Include is a PARTIAL match — Go MatchString, unanchored
    # (processor_filter_regex.go:77-96)
    out = filter_regex(_df(spark), include={"msg": r"ERROR.*"})
    assert sorted(r.id for r in out.collect()) == [1, 3]
    out = filter_regex(_df(spark), include={"msg": "ERROR"})  # substring hit
    assert sorted(r.id for r in out.collect()) == [1, 3]
    out = filter_regex(_df(spark), include={"msg": "^INFO"})  # explicit anchor
    assert [r.id for r in out.collect()] == [2]
    # missing key fails Include
    assert filter_regex(_df(spark), include={"nope": ".*"}).count() == 0


def test_filter_regex_exclude(spark):
    out = filter_regex(_df(spark), exclude={"msg": "timeout"})
    assert sorted(r.id for r in out.collect()) == [2, 3]


def test_filter_expression_tree(spark):
    # ProcessorFilterNative.h NOT/AND/OR tree
    expr = {"and": [{"key": "msg", "regex": "ERROR"}, {"not": {"key": "msg", "regex": "disk"}}]}
    out = filter_expression(_df(spark), expr)
    assert [r.id for r in out.collect()] == [1]


def test_filter_key_regex(spark):
    out = filter_key_regex(_df(spark), include_keys=["extra"])
    assert sorted(r.id for r in out.collect()) == [1, 2]
    out = filter_key_regex(_df(spark), exclude_keys=["extra"])
    assert [r.id for r in out.collect()] == [3]


def test_filter_timestamp(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-06-01 00:00:00")], "id int, t string"
    ).selectExpr("id", "cast(t as timestamp) as ts")
    out = filter_timestamp(df, begin="2024-03-01", end="2024-12-31")
    assert [r.id for r in out.collect()] == [2]


def test_fields_with_condition_first_match_wins(spark):
    df = spark.createDataFrame([(1, "ERROR x"), (2, "WARN y"), (3, "ok")], "id int, msg string")
    out = fields_with_condition(
        df,
        [
            {"when": {"field": "msg", "op": "startwith", "value": "ERROR"}, "add": {"sev": "high"}},
            {"when": {"field": "msg", "op": "contains", "value": "R"}, "add": {"sev": "mid"}},
        ],
    ).orderBy("id").collect()
    assert [r["sev"] for r in out] == ["high", "mid", None]


def test_fields_with_condition_drop_no_match(spark):
    df = spark.createDataFrame([(1, "ERROR"), (2, "fine")], "id int, msg string")
    out = fields_with_condition(
        df,
        [{"when": {"field": "msg", "op": "equals", "value": "ERROR"}, "add": {"sev": "high"}}],
        drop_if_not_match=True,
    )
    assert out.count() == 1


def test_rate_limit(spark):
    rows = [(f"k{i % 2}", j) for i in range(2) for j in range(10)]
    df = spark.createDataFrame(rows, "key string, ts int")
    out = rate_limit(df, ["key"], 3, order_col="ts")
    assert out.count() == 6
    kept = sorted((r.key, r.ts) for r in out.collect())
    assert kept == [("k0", 0), ("k0", 1), ("k0", 2), ("k1", 0), ("k1", 1), ("k1", 2)]


def test_rate_limit_deskewed_phase1(spark):
    """A hot key must not funnel through one window task: the phase-1
    pre-cap ranks within (key, salt) groups whose sizes stay near the
    mean, and the global phase sees <= limit*salt_n rows per key."""
    from pyspark.sql import functions as F

    rows = [("hot", i) for i in range(10_000)] + [
        (f"cold{i}", j) for i in range(20) for j in range(5)
    ]
    df = spark.createDataFrame(rows, "key string, ts int")
    out = rate_limit(df, ["key"], 3, order_col="ts", salt_n=32)
    kept = sorted((r.key, r.ts) for r in out.filter("key = 'hot'").collect())
    assert kept == [("hot", 0), ("hot", 1), ("hot", 2)]
    assert out.count() == 3 + 20 * 3

    # distribution: the hot key's phase-1 shuffle groups are balanced
    # (no group > 2x mean)
    salt = F.pmod(F.xxhash64(F.col("ts")), F.lit(32))
    sizes = [
        r["n"]
        for r in df.filter("key = 'hot'")
        .groupBy(salt.alias("s"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert len(sizes) == 32
    assert max(sizes) <= 2 * (sum(sizes) / len(sizes))


def test_fwc_compound_and_or(spark):
    """ConditionCase and/or sub-conditions
    (processor_fields_with_condition.go:66-74)."""
    from ilogtail_spark.operators.filters import fields_with_condition

    df = spark.createDataFrame(
        [("500", "E500"), ("500", "-"), ("404", "-"), ("200", "-")],
        "status string, err string",
    )
    out = fields_with_condition(
        df,
        [
            {
                "when": {
                    "logical_op": "and",
                    "op": "regexp",
                    "fields": {"status": "^5..$", "err": "^E"},
                },
                "add": {"sev": "server_error"},
            },
            {
                "when": {
                    "logical_op": "or",
                    "op": "startwith",
                    "fields": {"status": "4", "err": "E"},
                },
                "add": {"sev": "client_or_err"},
            },
        ],
    )
    got = {(r["status"], r["err"]): r["sev"] for r in out.collect()}
    assert got == {
        ("500", "E500"): "server_error",  # first match wins
        ("500", "-"): None,
        ("404", "-"): "client_or_err",
        ("200", "-"): None,
    }


def test_fwc_drop_keys_and_ignore_if_exist(spark):
    from ilogtail_spark.operators.filters import fields_with_condition

    df = spark.createDataFrame(
        [("a", "secret", "x"), ("b", "public", "y")],
        "id string, payload string, sev string",
    )
    out = fields_with_condition(
        df,
        [
            {
                "when": {"field": "payload", "op": "equals", "value": "secret"},
                "add": {"sev": "red"},
                "ignore_if_exist": True,  # sev pre-exists → keep it
                "drop_keys": ["payload"],
            }
        ],
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows["a"]["payload"] is None and rows["b"]["payload"] == "public"
    assert rows["a"]["sev"] == "x"  # IgnoreIfExist honored


def test_group_info_filter(spark):
    from ilogtail_spark.operators.filters import group_info_filter
    from ilogtail_spark.operators.transform import tag_native

    df = tag_native(
        spark.createDataFrame([(1,), (2,)], "id int"), {"env": "prod"}
    )
    kept = group_info_filter(df, tags={"env": "pro.*"})
    assert kept.count() == 2
    dropped = group_info_filter(df, tags={"env": {"pattern": "pro.*", "reverse": True}})
    assert dropped.count() == 0
    missing = group_info_filter(df, tags={"region": "us.*"})
    assert missing.count() == 0  # absent tag fails a positive condition
