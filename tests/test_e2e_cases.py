"""Replay the reference's e2e Gherkin scenarios verbatim.

The reference's third test tier (SURVEY.md §5) runs
test/e2e/test_cases/*/case.feature through docker-compose: a Given
step installs a collection config, a trigger container produces the
input, and Then-steps dispatch to the verify DSL
(test/engine/steps.go:102-111 → test/engine/verify/*.go).

Here the SAME feature files are parsed from the reference tree, their
embedded YAML configs load through ``pipeline_from_yaml`` unchanged,
the trigger container's documented output is synthesized as the input
DataFrame (run.sh / Dockerfile CMD are quoted per case below), and
the Then-steps dispatch through the steps.go regex table onto
``ilogtail_spark.plans.verify`` — LogCountAtLeast / LogField /
LogFieldKV / TagKV / LogContext / LogOrder.

Cases replayed (chosen as the ones whose inputs are fully determined
by the case directory, not an external service):

* input_mock_log (case.feature:1-31) — metric_mock ticks.
* aggregator_context (case.feature:1-35) — two file streams through
  processor_split_char + aggregator_context; pack-lineage check.
* input_container_stdio_multiline (case.feature:1-40) — stdout
  multiline merge + container tag regexes.
"""

import re

import pytest
import yaml
from pyspark.sql import functions as F

from ilogtail_spark.plans import verify
from ilogtail_spark.plans.pipeline import pipeline_from_yaml

CASES = "/root/reference/test/e2e/test_cases"


# --------------------------------------------------------------------------
# feature-file parsing + steps.go dispatch
# --------------------------------------------------------------------------

def parse_feature(path: str) -> list[tuple[str, str]]:
    """Minimal Gherkin walk: [(step_text, docstring)] in order.
    Docstrings are the triple-quoted blocks following a step."""
    import textwrap

    steps: list[tuple[str, str]] = []
    doc_lines: list[str] | None = None
    with open(path) as f:
        for raw in f:
            line = raw.rstrip("\n").rstrip()
            s = line.strip()
            if s == '"""':
                if doc_lines is None:
                    doc_lines = []
                else:
                    # YAML docstrings are indentation-sensitive: keep
                    # relative indent, drop the Gherkin block indent
                    steps[-1] = (
                        steps[-1][0],
                        textwrap.dedent("\n".join(doc_lines)),
                    )
                    doc_lines = None
                continue
            if doc_lines is not None:
                doc_lines.append(line)
                continue
            m = re.match(r"^(Given|When|Then|And)\s+(.*)$", s)
            if m:
                steps.append((m.group(2), ""))
    return steps


def scenario_config(steps) -> str:
    """The YAML collection config from the 'local config as below'
    Given step."""
    for text, doc in steps:
        if "local config as below" in text:
            return doc
    raise AssertionError("feature has no config step")


# the Then-step regex table, verbatim from test/engine/steps.go:102-111
THEN_STEPS = [
    (
        re.compile(r"^there is at least \{(\d+)\} logs$"),
        lambda df, m, doc: verify.log_count_at_least(df, int(m.group(1))),
    ),
    (
        re.compile(r"^the log fields match kv$"),
        lambda df, m, doc: verify.log_field_kv(df, yaml.safe_load(doc)),
    ),
    (
        re.compile(r"^the log tags match kv$"),
        lambda df, m, doc: verify.log_tag_kv(df, yaml.safe_load(doc)),
    ),
    (
        re.compile(r"^the log fields match as below$"),
        lambda df, m, doc: verify.log_fields_match(df, yaml.safe_load(doc)),
    ),
    (
        re.compile(r"^the context of log is valid$"),
        lambda df, m, doc: verify.log_context_valid(df, order_col="_ord"),
    ),
]


def run_then_steps(df, steps) -> int:
    ran = 0
    for text, doc in steps:
        for rx, fn in THEN_STEPS:
            m = rx.match(text)
            if m:
                fn(df, m, doc)
                ran += 1
                break
    return ran


def contents_map(*pairs):
    """map<string,string> literal column from (key, Column|str) pairs."""
    cols = []
    for k, v in pairs:
        cols.append(F.lit(k))
        cols.append(v if not isinstance(v, str) else F.lit(v))
    return F.create_map(*cols)


# --------------------------------------------------------------------------
# input_mock_log
# --------------------------------------------------------------------------

def test_case_input_mock_log(spark):
    """input_mock_log/case.feature: metric_mock with Tags {tag1,tag2}
    and Fields {content,time}; ≥15 logs; fields tag1/tag2/content/time
    present.  metric_mock's log pattern merges Tags INTO the contents
    (input_mock.go:57-67: AddData(r.Tags, fields), fields also carry
    Index) — one tick per IntervalMs; 20 ticks stands in for the 20 s
    the docker-compose case runs."""
    steps = parse_feature(f"{CASES}/input_mock_log/case.feature")
    cfg = yaml.safe_load(scenario_config(steps))
    mock = cfg["inputs"][0]
    assert mock["Type"] == "metric_mock"

    ticks = spark.range(1, 21).select(
        F.col("id").alias("_ord"),
        contents_map(
            ("Index", F.col("id").cast("string")),
            *[(k, str(v)) for k, v in mock["Fields"].items()],
            *[(k, str(v)) for k, v in mock["Tags"].items()],
        ).alias("contents"),
    )
    transform, flushers = pipeline_from_yaml(scenario_config(steps))
    out = transform(ticks)
    assert run_then_steps(out, steps) == 2


# --------------------------------------------------------------------------
# aggregator_context
# --------------------------------------------------------------------------

def test_case_aggregator_context(spark):
    """aggregator_context/case.feature: two trigger containers each
    write 100 lines '<i>|This is file file<n>' (run.sh:17-20) to their
    own file; the config splits on '|' into (no, content) and
    aggregator_context preserves per-source order; verify ≥200 logs
    and LogContext — per pack prefix the pack seq runs 1.. in hex and
    'no' runs 1.. across packs with constant content."""
    steps = parse_feature(f"{CASES}/aggregator_context/case.feature")
    config = scenario_config(steps)

    rows = [
        (f"/root/test/example_{n}.log", i, f"{i}|This is file file{n}")
        for n in (1, 2)
        for i in range(1, 101)
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, content string")
    transform, _ = pipeline_from_yaml(config)
    out = transform(df)

    # the flush tier the config's aggregator feeds (aggregator_base
    # MaxLogCount packs, pack id per util.go:371-384); arrival order =
    # the file line number the split preserved
    from ilogtail_spark.operators.agg import context_pack_id

    out = context_pack_id(out, ("conv_id",), "turn_idx", max_events=10)
    out = out.withColumn("_ord", F.col("turn_idx")).withColumn(
        "contents", contents_map(("no", F.col("no")), ("content", F.col("content")))
    )
    assert run_then_steps(out, steps) == 2


def test_case_aggregator_context_detects_breakage(spark):
    """The replay actually verifies: a shuffled 'no' sequence or a
    skipped pack seq must fail LogContext."""
    from ilogtail_spark.operators.agg import context_pack_id

    df = spark.createDataFrame(
        [("s", i, str(i if i != 5 else 99), "c") for i in range(1, 11)],
        "conv_id string, turn_idx int, no string, content string",
    )
    out = context_pack_id(df, ("conv_id",), "turn_idx", max_events=4)
    out = out.withColumn("_ord", F.col("turn_idx")).withColumn(
        "contents", contents_map(("no", F.col("no")), ("content", F.col("content")))
    )
    with pytest.raises(AssertionError, match="log sequence"):
        verify.log_context_valid(out, order_col="_ord")

    # pack seq hole: skip seq 2
    broken = context_pack_id(
        spark.createDataFrame(
            [("s", i, str(i), "c") for i in range(1, 9)],
            "conv_id string, turn_idx int, no string, content string",
        ),
        ("conv_id",),
        "turn_idx",
        max_events=4,
    ).withColumn(
        "__pack_id__",
        F.regexp_replace("__pack_id__", "-2$", "-3"),
    )
    broken = broken.withColumn("_ord", F.col("turn_idx")).withColumn(
        "contents", contents_map(("no", F.col("no")), ("content", F.col("content")))
    )
    with pytest.raises(AssertionError, match="pack sequence"):
        verify.log_context_valid(broken, order_col="_ord")


# --------------------------------------------------------------------------
# input_container_stdio_multiline
# --------------------------------------------------------------------------

def test_case_input_container_stdio_multiline(spark):
    """input_container_stdio_multiline/case.feature: the trigger
    container echoes 'today\\nhello' to stdout (Dockerfile CMD); the
    config's input carries Multiline.StartPattern 'today', so the two
    stdout lines merge into ONE log with content 'today\\nhello';
    container discovery stamps _image_name_/_container_name_/
    _container_ip_ group tags and the stdio reader adds _time_ and
    _source_ fields.  Tag/field values are synthesized exactly as the
    case's docker-compose environment names them."""
    steps = parse_feature(f"{CASES}/input_container_stdio_multiline/case.feature")
    cfg = yaml.safe_load(scenario_config(steps))
    inp = cfg["inputs"][0]
    assert inp["Type"] == "input_container_stdio"
    start = inp["Multiline"]["StartPattern"]

    # the stdio reader's per-line records (docker json-log shape)
    lines = spark.createDataFrame(
        [("c1", 1, "today", "2024-05-06T07:08:09.123456789Z", "stdout"),
         ("c1", 2, "hello", "2024-05-06T07:08:09.123456790Z", "stdout")],
        "conv_id string, turn_idx int, content string, _time_ string, _source_ string",
    )
    from ilogtail_spark.operators.split import split_multiline

    merged = split_multiline(
        lines.drop("_time_", "_source_"), "content", "turn_idx", ["conv_id"],
        start_pattern=start,
    )
    # the stdio reader stamps the FIRST line's time + stream on the
    # merged event (docker json-log record fields)
    out = merged.withColumn(
        "contents",
        contents_map(
            ("content", F.col("content")),
            ("_time_", "2024-05-06T07:08:09.123456789Z"),
            ("_source_", "stdout"),
        ),
    ).withColumn(
        "tags",
        contents_map(
            ("_image_name_", "input_container_stdio_multiline-container:latest"),
            ("_container_name_", "input_container_stdio_multiline-container-1"),
            ("_container_ip_", "172.18.0.2"),
        ),
    )
    # all three Then steps: count>=1, tags kv, fields kv (content must
    # be the MERGED '^today\nhello$' — an unmerged replay fails here)
    assert run_then_steps(out, steps) == 3


# --------------------------------------------------------------------------
# LogOrder (log_order.go) — semantics pinned directly
# --------------------------------------------------------------------------

def _order_df(spark, rows):
    return spark.createDataFrame(
        [("g", i, t, {"logNo": str(no)} if no is not None else {})
         for i, (t, no) in enumerate(rows)],
        "__pack_id__ string, _ord int, time int, contents map<string,string>",
    )


def test_log_order_valid_and_broken(spark):
    # strictly increasing time with logNo 1,2,3,4 — ok
    verify.log_order_valid(
        _order_df(spark, [(10, 1), (11, 2), (12, 3), (13, 4)]), "_ord"
    )
    # time tie: row is skipped entirely (go:66-74) — 3 then tie then 5
    # would FAIL (5 != 3+1 against the tracked number)…
    with pytest.raises(AssertionError, match="log order"):
        verify.log_order_valid(
            _order_df(spark, [(10, 3), (10, 9), (11, 5)]), "_ord"
        )
    # …but a tie whose successor resumes tracked+1 passes: 3, tie(9), 4
    verify.log_order_valid(
        _order_df(spark, [(10, 3), (10, 9), (11, 4)]), "_ord"
    )
    # missing logNo on a checked row is skipped (go:80-91)
    verify.log_order_valid(
        _order_df(spark, [(10, 1), (11, None), (12, 2)]), "_ord"
    )
    # a jump on increasing time fails
    with pytest.raises(AssertionError, match="log order"):
        verify.log_order_valid(
            _order_df(spark, [(10, 1), (11, 2), (12, 7)]), "_ord"
        )


def test_log_field_verifiers_negative(spark):
    df = spark.createDataFrame(
        [({"a": "x1"},), ({"b": "y"},)], "contents map<string,string>"
    )
    with pytest.raises(AssertionError, match="field a"):
        verify.log_fields_match(df, ["a"])
    with pytest.raises(AssertionError, match="KV a"):
        verify.log_field_kv(df, {"a": r"^x\d$"})  # second log lacks 'a'
    verify.log_field_kv(df.limit(1), {"a": r"^x\d$"})


def test_log_context_pack_seq_is_arrival_order(spark):
    """Packs arriving out of order (seq 2's rows before seq 1's) must
    fail pack_seq even though the seq SET is contiguous — the Go
    verifier walks arrival order (log_context.go:111-136)."""
    rows = [
        # arrival order: pack -2 first, then pack -1 (no runs 1..4 to
        # keep log_seq/content checks clean)
        ("P-2", 1, "1", "c"),
        ("P-2", 2, "2", "c"),
        ("P-1", 3, "3", "c"),
        ("P-1", 4, "4", "c"),
    ]
    df = spark.createDataFrame(
        rows, "__pack_id__ string, _ord int, no string, content string"
    ).withColumn(
        "contents", contents_map(("no", F.col("no")), ("content", F.col("content")))
    )
    with pytest.raises(AssertionError, match="pack sequence"):
        verify.log_context_valid(df, order_col="_ord")
