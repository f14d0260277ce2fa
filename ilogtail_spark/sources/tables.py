"""Parquet table readers for the driver-generated testdata.

On a production deployment these would be Iceberg catalog reads
(`spark.read.table`) with partition pruning on the table's hidden
partitioning; the sandbox image has no Iceberg jars, so we read the
parquet files directly — the DataFrame plans downstream are
identical either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}
