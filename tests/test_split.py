from ilogtail_spark.operators.split import split_regex, split_string


def test_split_string_explode(spark):
    df = spark.createDataFrame([(1, "a\nb\nc")], "id int, text string")
    out = split_string(df, "text")
    assert [r["text"] for r in out.collect()] == ["a", "b", "c"]


def test_split_string_literal_metachar_sep(spark):
    # '|' and '.' must split as literals, not regexes (split_char.go:34)
    df = spark.createDataFrame([(1, "a|b|c"), (2, "x.y")], "id int, text string")
    out = split_string(df, "text", sep="|").filter("id = 1")
    assert [r["text"] for r in out.collect()] == ["a", "b", "c"]
    out2 = split_string(df, "text", sep=".").filter("id = 2")
    assert [r["text"] for r in out2.collect()] == ["x", "y"]


def test_split_regex_multiline_merge(spark):
    # multiline java-stacktrace style regroup
    # (ProcessorSplitMultilineLogStringNative.cpp:95-127)
    lines = [
        (1, 0, "2024-01-01 ERROR boom"),
        (1, 1, "  at Foo.bar"),
        (1, 2, "  at Baz.qux"),
        (1, 3, "2024-01-01 INFO fine"),
        (2, 0, "2024-01-01 WARN solo"),
    ]
    df = spark.createDataFrame(lines, "src int, line int, text string")
    out = split_regex(
        df, "text", r"^\d{4}-\d{2}-\d{2}", order_col="line", group_cols=["src"]
    ).orderBy("src", "line")
    rows = out.collect()
    assert rows[0]["text"] == "2024-01-01 ERROR boom\n  at Foo.bar\n  at Baz.qux"
    assert rows[1]["text"] == "2024-01-01 INFO fine"
    assert rows[2]["text"] == "2024-01-01 WARN solo"
