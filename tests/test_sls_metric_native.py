"""processor_log_to_sls_metric EXACT converter — replay of
plugins/processor/logtoslsmetric/processor_log_to_sls_metric_test.go
(TestProcessorSlsMetric_ProcessLogs + the isTimeNano/canParseToFloat64
helper tables). Any per-row violation drops the WHOLE input row; each
surviving row emits one metric per MetricValues entry with labels
sorted by key and joined ``k#$#v|…``.
"""

import pytest

from ilogtail_spark.operators.registry import OPERATORS
from ilogtail_spark.operators.transform import log_to_sls_metric_native


def _proc(**over):
    cfg = dict(
        MetricTimeKey="timeKey",
        MetricLabelKeys=["labelA", "labelB", "labelC"],
        MetricValues={"nameA": "valueA", "nameB": "valueB"},
        CustomMetricLabels={"labelD": "CustomD"},
    )
    cfg.update(over)
    return OPERATORS["processor_log_to_sls_metric"](**cfg)


SCHEMA = ("labelA string, labelB string, labelC string, nameA string, "
          "valueA string, nameB string, valueB string, timeKey string")


def test_first_golden_case(spark):
    """Test case 1 (test.go:40-144): rows 1-2 emit 2 metrics each,
    row 3 (labelA missing) drops; labels sort with the custom label."""
    rows = [
        ("1", "2", "3", "myname", "1.0", "myname", "1.0",
         "1658806869597190887"),
        ("11", "22", "33", "myname", "1.0", "myname", "1.0",
         "1658806869597190887"),
        (None, "BBB", "CCC", "myname", "1.0", "myname", "1.0",
         "1658806869597190887"),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = _proc()(df).collect()
    assert len(out) == 4
    assert {r["__labels__"] for r in out} == {
        "labelA#$#1|labelB#$#2|labelC#$#3|labelD#$#CustomD",
        "labelA#$#11|labelB#$#22|labelC#$#33|labelD#$#CustomD",
    }
    assert all(r["__name__"] == "myname" and r["__value__"] == "1.0"
               and r["__time_nano__"] == "1658806869597190887" for r in out)


def test_event_time_fallback(spark):
    """Test case 2 (test.go:145-203): no MetricTimeKey — __time_nano__
    is the event time sec*1e9+nsec (GetLogTimeNano)."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("1", "2", "3", "myname", "1.0", "2021-09-10 01:02:03.123456")],
        "labelA string, labelB string, labelC string, nameA string, "
        "valueA string, t string",
    ).withColumn("ts", F.col("t").cast("timestamp"))
    fn = OPERATORS["processor_log_to_sls_metric"](
        MetricLabelKeys=["labelA", "labelB", "labelC"],
        MetricValues={"nameA": "valueA"},
        CustomMetricLabels={"labelD": "CustomD"},
    )
    r = fn(df).first()
    import datetime

    sec = int(datetime.datetime(
        2021, 9, 10, 1, 2, 3, tzinfo=datetime.timezone.utc).timestamp())
    assert r["__time_nano__"] == str(sec * 10**9 + 123456000)


@pytest.mark.parametrize(
    "timekey,n_out",
    [
        ("1234567890", 2),                 # second -> padded
        ("1234567890000", 2),              # millisecond
        ("1234567890000000", 2),           # microsecond
        ("1234567890000000000", 2),        # nanosecond
        ("12345678900000000.0", 0),        # non-digit -> drop
        ("123456789000000000", 0),         # 18 digits -> drop
        (None, 0),                         # missing with MetricTimeKey set
    ],
)
def test_time_key_lengths(spark, timekey, n_out):
    df = spark.createDataFrame(
        [("1", "2", "3", "myname", "1.0", "myname", "1.0", timekey)], SCHEMA
    )
    out = _proc()(df).collect()
    assert len(out) == n_out
    if n_out:
        assert all(r["__time_nano__"] == timekey.ljust(19, "0") for r in out)


@pytest.mark.parametrize(
    "field,value",
    [
        ("valueA", "2a0"),   # metric value must parse float64
        ("valueA", " 1.0"),  # ParseFloat rejects surrounding whitespace
        ("nameA", "2a0"),    # metric name regex ^[a-zA-Z_:][a-zA-Z0-9_:]*$
        ("nameA", "-name"),
        ("labelB", "B|B"),   # label value must not contain the separator
        ("labelB", "B#$#B"),
    ],
)
def test_violations_drop_row(spark, field, value):
    base = {"labelA": "1", "labelB": "2", "labelC": "3", "nameA": "myname",
            "valueA": "1.0", "nameB": "myname", "valueB": "1.0",
            "timeKey": "1234567890"}
    base[field] = value
    df = spark.createDataFrame(
        [tuple(base[c.split(" ")[0]] for c in SCHEMA.split(", "))], SCHEMA
    )
    assert _proc()(df).count() == 0


@pytest.mark.parametrize(
    "labels,n_out",
    [
        ("a#$#1#$#|b#$#2", 0),     # 3-part pair -> drop (test.go:770)
        ("label1#$#1|b#$#2", 0),   # collides with configured key (816)
        ("-a#$#1|b#$#2", 0),       # key fails the label regex (862)
        ("junk", 0),               # separator-less pair: 1-element kv
        ("a#$#1|b#$#2", 1),        # valid merge, sorted into the output
    ],
)
def test_incoming_labels_field(spark, labels, n_out):
    df = spark.createDataFrame(
        [("1", "x", "myname", "1.5", "1234567890", labels)],
        "label1 string, label2 string, value1 string, metric1 string, "
        "timestamp string, __labels__ string",
    )
    fn = OPERATORS["processor_log_to_sls_metric"](
        MetricTimeKey="timestamp",
        MetricLabelKeys=["label1", "label2"],
        MetricValues={"value1": "metric1"},
        CustomMetricLabels={"label3": "hello"},
    )
    out = fn(df).collect()
    assert len(out) == n_out
    if n_out:
        assert out[0]["__labels__"] == (
            "a#$#1|b#$#2|label1#$#1|label2#$#x|label3#$#hello"
        )


def test_init_validation():
    import pyspark.sql  # noqa: F401 — init checks run without a df

    with pytest.raises(ValueError):  # TestInitError: bad label regex
        log_to_sls_metric_native(None, {"n": "v"},
                                 metric_label_keys=["bad-label"])
    with pytest.raises(ValueError):  # empty labels
        log_to_sls_metric_native(None, {"n": "v"})
    with pytest.raises(ValueError):  # empty MetricValues
        log_to_sls_metric_native(None, {}, metric_label_keys=["a"])
    with pytest.raises(ValueError):  # custom label value separator
        log_to_sls_metric_native(None, {"n": "v"},
                                 custom_metric_labels={"k": "a|b"})
    with pytest.raises(ValueError):  # repeated field
        log_to_sls_metric_native(None, {"a": "v"},
                                 metric_label_keys=["a"])
