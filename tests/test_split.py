from pyspark.sql import functions as F

from ilogtail_spark.operators.split import split_multiline, split_regex, split_string


def _lines(spark, texts):
    return spark.createDataFrame(
        [("c1", i, t) for i, t in enumerate(texts)], "conv_id string, line int, text string"
    )


def _merged(df):
    return sorted((r["line"], r["text"]) for r in df.collect())


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


# --- multiline mode matrix (ProcessorSplitMultilineLogStringNative.cpp:159-309,
# combos per MultilineOptions.cpp:125-155) -------------------------------------

def test_multiline_start_only_orphans_single_line(spark):
    df = _lines(spark, ["junk1", "junk2", "START a", "cont", "START b"])
    out = split_multiline(
        df, "text", "line", ["conv_id"], start_pattern=r"^START"
    )
    assert _merged(out) == [
        (0, "junk1"), (1, "junk2"), (2, "START a\ncont"), (4, "START b")
    ]
    disc = split_multiline(
        df, "text", "line", ["conv_id"], start_pattern=r"^START", unmatched="discard"
    )
    assert _merged(disc) == [(2, "START a\ncont"), (4, "START b")]


def test_multiline_start_continue(spark):
    df = _lines(spark, ["START a", "cont1", "cont2", "junk", "START b", "junk2"])
    out = split_multiline(
        df, "text", "line", ["conv_id"],
        start_pattern=r"^START", continue_pattern=r"^cont",
    )
    assert _merged(out) == [
        (0, "START a\ncont1\ncont2"), (3, "junk"), (4, "START b"), (5, "junk2")
    ]


def test_multiline_start_end(spark):
    df = _lines(spark, ["x", "BEGIN", "mid", "END", "y", "BEGIN", "dangling"])
    out = split_multiline(
        df, "text", "line", ["conv_id"],
        start_pattern=r"^BEGIN", end_pattern=r"^END",
    )
    # unterminated span at EOF is unmatched (cpp:298-307)
    assert _merged(out) == [
        (0, "x"), (1, "BEGIN\nmid\nEND"), (4, "y"), (5, "BEGIN"), (6, "dangling")
    ]
    disc = split_multiline(
        df, "text", "line", ["conv_id"],
        start_pattern=r"^BEGIN", end_pattern=r"^END", unmatched="discard",
    )
    assert _merged(disc) == [(1, "BEGIN\nmid\nEND")]


def test_multiline_end_only(spark):
    df = _lines(spark, ["a", "b", "END", "c", "END", "tail"])
    out = split_multiline(df, "text", "line", ["conv_id"], end_pattern=r"^END")
    assert _merged(out) == [(0, "a\nb\nEND"), (3, "c\nEND"), (5, "tail")]


def test_multiline_continue_end(spark):
    df = _lines(spark, ["C1", "C2", "E", "x", "E2", "C3", "junk"])
    out = split_multiline(
        df, "text", "line", ["conv_id"],
        continue_pattern=r"^C", end_pattern=r"^E",
    )
    # lone End line is its own event (cpp:187-192); a continue-run with
    # a non-End terminator is unmatched including the terminator
    assert _merged(out) == [
        (0, "C1\nC2\nE"), (3, "x"), (4, "E2"), (5, "C3"), (6, "junk")
    ]


def test_multiline_combo_normalization(spark):
    # S+C+E drops Continue (MultilineOptions.cpp:140-155) ⇒ behaves as S+E
    df = _lines(spark, ["BEGIN", "c", "END", "junk"])
    out = split_multiline(
        df, "text", "line", ["conv_id"],
        start_pattern=r"^BEGIN", continue_pattern=r"^c", end_pattern=r"^END",
    )
    assert _merged(out) == [(0, "BEGIN\nc\nEND"), (3, "junk")]
    # Continue-only is ignored entirely ⇒ passthrough
    df2 = _lines(spark, ["c1", "c2"])
    out2 = split_multiline(df2, "text", "line", ["conv_id"], continue_pattern=r"^c")
    assert _merged(out2) == [(0, "c1"), (1, "c2")]


def test_multiline_merge_group_cap(spark):
    """A hot stream with one giant merge group must flush in bounded
    chunks — no single aggregation key sees more than max_merge_lines
    rows (the round-1 collect_list OOM risk)."""
    texts = ["START 0"] + [f"cont {i}" for i in range(1, 600)]
    df = _lines(spark, texts)
    out = split_multiline(
        df, "text", "line", ["conv_id"], start_pattern=r"^START",
        max_merge_lines=256,
    ).collect()
    sizes = sorted(len(r["text"].split("\n")) for r in out)
    assert sizes == [88, 256, 256]
    # round trip: all input lines survive in order
    joined = sorted(out, key=lambda r: r["line"])
    all_lines = [ln for r in joined for ln in r["text"].split("\n")]
    assert all_lines == texts


def test_split_char_quote_aware(spark):
    """split_char.go:34-184: quoted values embed the separator;
    doubled quotes collapse; remainder raw in _split_preserve_."""
    from ilogtail_spark.operators.split import split_char

    df = spark.createDataFrame(
        [(0, 'abc,"b,cd""",x,rest1,"r,2"')], "id int, line string"
    )
    out = split_char(
        df, "line", ",", ["a", "b", "c"], quote='"',
        preserve_others=True, keep_source=True,
    ).first()
    assert out["a"] == "abc"
    assert out["b"] == 'b,cd"'
    assert out["c"] == "x"
    assert out["_split_preserve_"] == 'rest1,"r,2"'


def test_split_char_factory_no_quote(spark):
    from ilogtail_spark.operators.registry import OPERATORS

    df = spark.createDataFrame([(0, "a|b|c")], "id int, line string")
    fn = OPERATORS["processor_split_char"](
        SourceKey="line", SplitSep="|", SplitKeys=["x", "y", "z"]
    )
    out = fn(df).first()
    assert (out["x"], out["y"], out["z"]) == ("a", "b", "c")


def test_multiline_null_rows_not_dropped(spark):
    """Review regression: NULL source rows must surface through the
    unmatched policy, not vanish (rlike(NULL) poisoning)."""
    df = _lines(spark, ["junk"])  # placeholder, rebuilt below
    df = spark.createDataFrame(
        [("c1", 0, None), ("c1", 1, "junk"), ("c1", 2, "START a"), ("c1", 3, "cont")],
        "conv_id string, line int, text string",
    )
    out = split_multiline(df, "text", "line", ["conv_id"], start_pattern=r"^START")
    assert _merged(out) == [(0, None), (1, "junk"), (2, "START a\ncont")]
    disc = split_multiline(
        df, "text", "line", ["conv_id"], start_pattern=r"^START", unmatched="discard"
    )
    assert _merged(disc) == [(2, "START a\ncont")]


def test_split_char_quoteflag_defaults_quote(spark):
    from ilogtail_spark.operators.registry import OPERATORS

    df = spark.createDataFrame([(0, 'a,"b,c",d')], "id int, line string")
    fn = OPERATORS["processor_split_char"](
        SourceKey="line", SplitSep=",", SplitKeys=["x", "y", "z"], QuoteFlag=True
    )
    out = fn(df).first()
    assert (out["x"], out["y"], out["z"]) == ("a", "b,c", "d")


def test_multiline_start_and_continue_overlap(spark):
    """A line matching BOTH Start and Continue after an unmatched run
    re-opens a group (out-state checks Start only, cpp:179-186);
    after a matched group it attaches as continuation (in-span
    Continue first, cpp:199-203)."""
    # start='^A', continue='^[AB]' — every A line matches both
    df = _lines(spark, ["x", "A1", "B1", "x2", "B2", "A2", "B3"])
    out = split_multiline(
        df, "text", "line", ["conv_id"],
        start_pattern=r"^A", continue_pattern=r"^[AB]",
    )
    assert _merged(out) == [
        (0, "x"), (1, "A1\nB1"), (3, "x2"), (4, "B2"), (5, "A2\nB3")
    ]


def test_multiline_continue_end_overlap(spark):
    """A Continue∧End line is a continuation, not a terminator —
    the run stays open and is unmatched at EOF (cpp:199-209 ordering
    + the EOF rule)."""
    # continue='^C', end='^(E|CE)' — 'CE' lines match both
    df = _lines(spark, ["C1", "CE", "E"]) .withColumn(
        "text", F.col("text")
    )
    out = split_multiline(
        df, "text", "line", ["conv_id"],
        continue_pattern=r"^C", end_pattern=r"^(E|CE)",
    )
    assert _merged(out) == [(0, "C1\nCE\nE")]
    # run ending at EOF on a Continue∧End line stays open → unmatched
    df2 = _lines(spark, ["C1", "CE"])
    out2 = split_multiline(
        df2, "text", "line", ["conv_id"],
        continue_pattern=r"^C", end_pattern=r"^(E|CE)",
    )
    assert _merged(out2) == [(0, "C1"), (1, "CE")]


def test_split_char_source_in_keys(spark):
    from ilogtail_spark.operators.split import split_char

    df = spark.createDataFrame([(0, "a|b")], "id int, text string")
    out = split_char(df, "text", "|", ["text", "y"]).first()
    assert out["text"] == "a" and out["y"] == "b"


def test_multiline_start_end_overlap_exact(spark):
    """A line matching BOTH Start and End (cpp:159-309): when out of a
    span it OPENS one (the opening line is never End-checked); when in
    a span it CLOSES it. Round 2's one documented multiline deviation,
    now exact via the DFA closed form."""
    # MARK matches both ^M patterns; lines: MARK opens, x content,
    # MARK closes; second MARK opens, unterminated at EOF -> unmatched
    df = _lines(spark, ["MARK", "x", "MARK", "MARK", "y"])
    out = split_multiline(
        df, "text", "line", ["conv_id"],
        start_pattern=r"^MARK", end_pattern=r"^MARK|^STOP",
    )
    assert _merged(out) == [(0, "MARK\nx\nMARK"), (3, "MARK"), (4, "y")]

    # mixed: END-only line while out is unmatched; S∧E line closes a
    # span opened by a plain START
    df2 = _lines(spark, ["END", "START", "a", "BOTH", "BOTH", "END"])
    out2 = split_multiline(
        df2, "text", "line", ["conv_id"],
        start_pattern=r"^START|^BOTH", end_pattern=r"^END|^BOTH",
    )
    assert _merged(out2) == [(0, "END"), (1, "START\na\nBOTH"), (4, "BOTH\nEND")]


def test_merge_by_flag_walk(spark):
    """ProcessorMergeMultilineLogNative BY_FLAG (.cpp:113-159): the
    P P F / P F / F walk — runs of partials merge with the following
    full row, NO line break, first row's fields survive, dangling
    partials still merge."""
    from ilogtail_spark.operators.split import merge_by_flag

    rows = [
        ("g", 1, "aa", True, "t1"),
        ("g", 2, "bb", True, "t2"),
        ("g", 3, "cc", False, "t3"),   # P P F -> aabbcc
        ("g", 4, "dd", True, "t4"),
        ("g", 5, "ee", False, "t5"),   # P F -> ddee
        ("g", 6, "ff", False, "t6"),   # solo F
        ("g", 7, "gg", True, "t7"),    # dangling P at group end
        ("h", 1, "xx", False, "u1"),   # other group untouched
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, content string, "
        "_partial boolean, _time_ string")
    out = {(r["conv_id"], r["turn_idx"]): r for r in merge_by_flag(
        df, "content", "turn_idx", ["conv_id"]).collect()}
    assert len(out) == 5
    assert out[("g", 1)]["content"] == "aabbcc"
    assert out[("g", 1)]["_time_"] == "t1"  # FIRST row survives
    assert out[("g", 4)]["content"] == "ddee"
    assert out[("g", 6)]["content"] == "ff"
    assert out[("g", 7)]["content"] == "gg"
    assert out[("h", 1)]["content"] == "xx"
    assert "_partial" not in out[("g", 1)].asDict()  # flag consumed


def test_cri_parse_then_merge_by_flag(spark):
    """The real pairing: containerd P-tagged lines through
    parse_container_log(cri) then MergeType=flag — split long lines
    reassemble without separators."""
    from ilogtail_spark.operators import OPERATORS
    from ilogtail_spark.operators.parse import parse_container_log

    T = "2024-01-05T23:28:06.818486411+08:00"
    df = spark.createDataFrame(
        [("c", 1, f"{T} stdout P hello "),
         ("c", 2, f"{T} stdout P wor"),
         ("c", 3, f"{T} stdout F ld"),
         ("c", 4, f"{T} stdout F next")],
        "conv_id string, turn_idx int, text string",
    )
    parsed = parse_container_log(df, fmt="cri").drop(
        "text", "__parse_ok__", "__raw_log__")
    fn = OPERATORS["processor_merge_multiline_log_native"](MergeType="flag")
    out = sorted(
        (r["turn_idx"], r["content"]) for r in fn(parsed).collect()
    )
    assert out == [(1, "hello world"), (4, "next")]
