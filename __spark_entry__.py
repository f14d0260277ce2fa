"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship parse→enrich→route→aggregate pipeline on
sf0.001. ``queries()`` — one entry per implemented operator
(SURVEY.md §2); ``oracle_sql()`` — DuckDB twins over the same parquet
views. Transcripts are derived deterministically from ``events`` in
BOTH engines (ilogtail_spark/sources/transcripts.py), so every
pipeline query is value-hash comparable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ilogtail_spark.operators.agg import salted_agg, window_histogram
from ilogtail_spark.operators.filters import rate_limit
from ilogtail_spark.operators.parse import (
    PARSE_OK_KEY,
    ParserOptions,
    parse_delimiter,
    parse_kv,
    parse_timestamp,
)
from ilogtail_spark.operators.transform import desensitize, md5_field
from ilogtail_spark.plans.pipeline import (
    enrich_stage,
    parse_stage,
    sink_aggregates,
    tool_histogram,
    transcript_pipeline,
)
from ilogtail_spark.sources.tables import load_table
from ilogtail_spark.sources.transcripts import (
    ROLE_LOOKUP_SQL,
    TOOL_LOOKUP_SQL,
    TRANSCRIPTS_CTE,
    derive_transcripts,
)

SF0001 = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# shared DuckDB oracle CTE fragments
# ---------------------------------------------------------------------------

_PAT = r'tool=(\w+) status=(\d+) latency_ms=(\d+) "(\w+) ([^"\s]+)" err=(\S+)'

PARSED_CTE = (
    TRANSCRIPTS_CTE
    + f""",
parsed AS (
  SELECT
    conv_id, turn_idx, role, text, tool, ts,
    regexp_matches(text, '{_PAT}') AS parse_ok,
    CASE WHEN regexp_matches(text, '{_PAT}') THEN regexp_extract(text, '{_PAT}', 1) END AS tool_call,
    CASE WHEN regexp_matches(text, '{_PAT}') THEN CAST(regexp_extract(text, '{_PAT}', 2) AS INTEGER) END AS status,
    CASE WHEN regexp_matches(text, '{_PAT}') THEN CAST(regexp_extract(text, '{_PAT}', 3) AS INTEGER) END AS latency_ms,
    CASE WHEN regexp_matches(text, '{_PAT}') THEN regexp_extract(text, '{_PAT}', 4) END AS method,
    CASE WHEN regexp_matches(text, '{_PAT}') THEN regexp_extract(text, '{_PAT}', 5) END AS url,
    CASE WHEN regexp_matches(text, '{_PAT}') THEN regexp_extract(text, '{_PAT}', 6) END AS err,
    CASE WHEN NOT regexp_matches(text, '{_PAT}') THEN text END AS raw_log
  FROM transcripts
)
"""
)

ENRICHED_CTE = (
    PARSED_CTE
    + f""",
enriched AS (
  SELECT p.*,
         COALESCE(role_lookup.role_class, 'Unknown') AS role_class,
         COALESCE(tool_lookup.tool_family, 'Unknown') AS tool_family
  FROM parsed p
  LEFT JOIN {ROLE_LOOKUP_SQL} ON p.role = role_lookup.role
  LEFT JOIN {TOOL_LOOKUP_SQL} ON p.tool = tool_lookup.tool
)
"""
)

# multicast routing (Router.cpp copy semantics): conditional sinks get a
# copy per match, sink_all is unconditional, default only when no
# conditional sink matched.
_C_ERR = "(parse_ok AND err <> '-')"
_C_TOOLS = "(role = 'tool' OR (parse_ok AND tool_call <> 'none'))"
_C_FAIL = "(NOT parse_ok)"
ROUTED_CTE = (
    ENRICHED_CTE
    + f""",
routed AS (
  SELECT e.*, 'sink_errors' AS sink FROM enriched e WHERE {_C_ERR}
  UNION ALL SELECT e.*, 'sink_tools' AS sink FROM enriched e WHERE {_C_TOOLS}
  UNION ALL SELECT e.*, 'sink_parse_fail' AS sink FROM enriched e WHERE {_C_FAIL}
  UNION ALL SELECT e.*, 'sink_all' AS sink FROM enriched e
  UNION ALL SELECT e.*, 'default' AS sink FROM enriched e
            WHERE NOT {_C_ERR} AND NOT {_C_TOOLS} AND NOT {_C_FAIL}
)
"""
)


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full pipeline on sf0.001 → per-sink aggregates."""
    routed = transcript_pipeline(spark, SF0001)
    return sink_aggregates(routed).orderBy("__sink__")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_transcripts(spark: SparkSession, sf: str) -> DataFrame:
    return derive_transcripts(spark, sf)


def _q_parse(spark: SparkSession, sf: str) -> DataFrame:
    df = parse_stage(derive_transcripts(spark, sf))
    return df.select(
        "conv_id",
        "turn_idx",
        F.col(PARSE_OK_KEY).alias("parse_ok"),
        "tool_call",
        "status",
        "latency_ms",
        "method",
        "url",
        "err",
        F.col("__raw_log__").alias("raw_log"),
    )


def _q_parse_fail_by_role(spark: SparkSession, sf: str) -> DataFrame:
    df = parse_stage(derive_transcripts(spark, sf))
    return df.groupBy("role").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(~F.col(PARSE_OK_KEY), 1).otherwise(0)).alias("n_fail"),
    )


def _q_enrich(spark: SparkSession, sf: str) -> DataFrame:
    df = enrich_stage(parse_stage(derive_transcripts(spark, sf)), spark)
    return df.select(
        "conv_id", "turn_idx", "role", "role_class", "tool", "tool_family"
    )


def _q_route_counts(spark: SparkSession, sf: str) -> DataFrame:
    routed = transcript_pipeline(spark, sf)
    return routed.groupBy(F.col("__sink__").alias("sink")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )


def _q_routed_errors(spark: SparkSession, sf: str) -> DataFrame:
    routed = transcript_pipeline(spark, sf)
    return routed.filter(F.col("__sink__") == "sink_errors").select(
        "conv_id", "turn_idx", "text", "status", "err"
    )


def _q_sink_aggregates(spark: SparkSession, sf: str) -> DataFrame:
    routed = transcript_pipeline(spark, sf)
    return sink_aggregates(routed).withColumnRenamed("__sink__", "sink")


def _q_tool_histogram(spark: SparkSession, sf: str) -> DataFrame:
    routed = transcript_pipeline(spark, sf)
    return tool_histogram(routed).withColumnRenamed("__sink__", "sink")


def _q_salted_agg(spark: SparkSession, sf: str) -> DataFrame:
    df = parse_stage(derive_transcripts(spark, sf))
    return salted_agg(
        df,
        ["conv_id"],
        {
            "n_turns": ("count", "*"),
            "n_parsed": ("count_nonnull", "tool_call"),
            "max_latency": ("max", "latency_ms"),
        },
        salt_n=16,
    )


def _q_topk_convs(spark: SparkSession, sf: str) -> DataFrame:
    df = derive_transcripts(spark, sf)
    counts = df.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n_turns"))
    return counts.orderBy(F.col("n_turns").desc(), F.col("conv_id")).limit(10)


def _q_spl_chain(spark: SparkSession, sf: str) -> DataFrame:
    # SPL: * | where role='assistant' and parse ok | extend lat_bucket | project ...
    df = parse_stage(derive_transcripts(spark, sf))
    return (
        df.filter((F.col("role") == "assistant") & F.col(PARSE_OK_KEY))
        .withColumn(
            "lat_bucket",
            F.when(F.col("latency_ms") < 100, "fast")
            .when(F.col("latency_ms") < 1000, "medium")
            .otherwise("slow"),
        )
        .select("conv_id", "turn_idx", "status", "latency_ms", "lat_bucket")
    )


def _q_json_parse(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    parsed = ev.withColumn(
        "k_val", F.get_json_object(F.col("props"), "$.k").cast("int")
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k_val").alias("sum_k"),
        F.max("k_val").alias("max_k"),
    )


def _q_kv_parse(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").withColumn(
        "kvline",
        F.concat(
            F.lit("user="),
            F.col("user_id").cast("string"),
            F.lit("&type="),
            F.col("event_type"),
            F.lit("&id="),
            F.col("event_id").cast("string"),
        ),
    )
    out = parse_kv(
        ev,
        source="kvline",
        pair_sep="&",
        kv_sep="=",
        expand=["user", "type", "id"],
        options=ParserOptions(keep_source=True),
    )
    return out.select(
        F.col("event_id"),
        F.col("user").cast("long").alias("kv_user"),
        F.col("type").alias("kv_type"),
        F.col("id").cast("long").alias("kv_id"),
    )


def _q_csv_parse(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").withColumn(
        "csvline",
        F.concat_ws(
            ",",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
            F.col("l_returnflag"),
            F.col("l_linestatus"),
        ),
    )
    out = parse_delimiter(
        li,
        ["c_orderkey", "c_linenumber", "c_returnflag", "c_linestatus"],
        source="csvline",
        sep=",",
        quote=None,
        options=ParserOptions(keep_source=True),
    )
    return out.select(
        F.col("c_orderkey").cast("long").alias("orderkey"),
        F.col("c_linenumber").cast("int").alias("linenumber"),
        F.col("c_returnflag").alias("returnflag"),
        F.col("c_linestatus").alias("linestatus"),
    )


def _q_strptime(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").withColumn(
        "ts_str", F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss")
    )
    out = parse_timestamp(ev, "ts_str", "yyyy-MM-dd HH:mm:ss", dest="parsed_ts")
    return out.select("event_id", "ts_str", "parsed_ts")


def _q_desensitize(spark: SparkSession, sf: str) -> DataFrame:
    df = derive_transcripts(spark, sf)
    out = desensitize(
        df,
        "text",
        method="const",
        replacement="***",
        regex_begin=r"latency_ms=",
        regex_content=r"\d+",
    )
    out = md5_field(out, "text", "text_md5")
    return out.select("conv_id", "turn_idx", F.col("text").alias("masked"), "text_md5")


def _q_rate_limit(spark: SparkSession, sf: str) -> DataFrame:
    df = derive_transcripts(spark, sf)
    return rate_limit(df, ["conv_id"], 3, order_col="turn_idx").select(
        "conv_id", "turn_idx", "role"
    )


def _q_hourly_histogram(spark: SparkSession, sf: str) -> DataFrame:
    df = derive_transcripts(spark, sf)
    return window_histogram(df, ts_col="ts", granularity="hour", keys=["tool"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_transcripts": _q_transcripts,
        "q02_parse_regex": _q_parse,
        "q03_parse_fail_by_role": _q_parse_fail_by_role,
        "q04_enrich_dictmap": _q_enrich,
        "q05_route_counts": _q_route_counts,
        "q06_routed_errors": _q_routed_errors,
        "q07_sink_aggregates": _q_sink_aggregates,
        "q08_tool_histogram": _q_tool_histogram,
        "q09_salted_agg": _q_salted_agg,
        "q10_topk_convs": _q_topk_convs,
        "q11_spl_chain": _q_spl_chain,
        "q12_json_parse": _q_json_parse,
        "q13_kv_parse": _q_kv_parse,
        "q14_csv_parse": _q_csv_parse,
        "q15_strptime": _q_strptime,
        "q16_desensitize": _q_desensitize,
        "q17_rate_limit": _q_rate_limit,
        "q18_hourly_histogram": _q_hourly_histogram,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB)
# ---------------------------------------------------------------------------

def oracle_sql() -> dict[str, str]:
    return {
        "q01_transcripts": TRANSCRIPTS_CTE
        + "SELECT conv_id, turn_idx, role, text, tool, ts FROM transcripts",
        "q02_parse_regex": PARSED_CTE
        + """SELECT conv_id, turn_idx, parse_ok, tool_call, status, latency_ms,
                    method, url, err, raw_log FROM parsed""",
        "q03_parse_fail_by_role": PARSED_CTE
        + """SELECT role, CAST(count(*) AS BIGINT) AS n_total,
                    CAST(sum(CASE WHEN NOT parse_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_fail
             FROM parsed GROUP BY role""",
        "q04_enrich_dictmap": ENRICHED_CTE
        + "SELECT conv_id, turn_idx, role, role_class, tool, tool_family FROM enriched",
        "q05_route_counts": ROUTED_CTE
        + "SELECT sink, CAST(count(*) AS BIGINT) AS n_rows FROM routed GROUP BY sink",
        "q06_routed_errors": ROUTED_CTE
        + """SELECT conv_id, turn_idx, text, status, err FROM routed
             WHERE sink = 'sink_errors'""",
        "q07_sink_aggregates": ROUTED_CTE
        + """SELECT sink, CAST(count(*) AS BIGINT) AS n_turns,
                    CAST(sum(CASE WHEN NOT parse_ok THEN 1 ELSE 0 END) AS BIGINT) AS n_parse_fail
             FROM routed GROUP BY sink""",
        "q08_tool_histogram": ROUTED_CTE
        + """SELECT date_trunc('hour', ts) AS bucket, sink, tool_call,
                    CAST(count(*) AS BIGINT) AS n_events
             FROM routed WHERE parse_ok GROUP BY 1, 2, 3""",
        "q09_salted_agg": PARSED_CTE
        + """SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
                    CAST(count(tool_call) AS BIGINT) AS n_parsed,
                    max(latency_ms) AS max_latency
             FROM parsed GROUP BY conv_id""",
        "q10_topk_convs": TRANSCRIPTS_CTE
        + """SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns FROM transcripts
             GROUP BY conv_id ORDER BY n_turns DESC, conv_id LIMIT 10""",
        "q11_spl_chain": PARSED_CTE
        + """SELECT conv_id, turn_idx, status, latency_ms,
                    CASE WHEN latency_ms < 100 THEN 'fast'
                         WHEN latency_ms < 1000 THEN 'medium'
                         ELSE 'slow' END AS lat_bucket
             FROM parsed WHERE role = 'assistant' AND parse_ok""",
        "q12_json_parse": """
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
                   CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
            FROM events GROUP BY event_type""",
        "q13_kv_parse": """
            SELECT event_id, user_id AS kv_user, event_type AS kv_type,
                   event_id AS kv_id
            FROM events""",
        "q14_csv_parse": """
            SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
                   l_returnflag AS returnflag, l_linestatus AS linestatus
            FROM lineitem""",
        "q15_strptime": """
            SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
                   date_trunc('second', ts) AS parsed_ts
            FROM events""",
        "q16_desensitize": TRANSCRIPTS_CTE
        + """SELECT conv_id, turn_idx,
                    regexp_replace(text, '(latency_ms=)\\d+', '\\1***', 'g') AS masked,
                    md5(regexp_replace(text, '(latency_ms=)\\d+', '\\1***', 'g')) AS text_md5
             FROM transcripts""",
        "q17_rate_limit": TRANSCRIPTS_CTE
        + """SELECT conv_id, turn_idx, role FROM (
               SELECT conv_id, turn_idx, role,
                      row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
               FROM transcripts) WHERE rn <= 3""",
        "q18_hourly_histogram": TRANSCRIPTS_CTE
        + """SELECT date_trunc('hour', ts) AS bucket, tool,
                    CAST(count(*) AS BIGINT) AS n_events
             FROM transcripts GROUP BY 1, 2""",
    }
