"""Table loaders.

Production target is Iceberg (`spark.read.table("web_pages")` with manifest
partition pruning); the sandbox has no Iceberg runtime jar, so every loader
falls back transparently to parquet with the identical schema. The rest of the
engine only sees DataFrames, so swapping the catalog in is a one-line change
here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
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
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (parquet fallback of the Iceberg catalog)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_web_pages(spark: SparkSession, path: str) -> DataFrame:
    """Read the web_pages corpus. Tries the Iceberg catalog first (production),
    falls back to parquet (sandbox)."""
    try:
        return spark.read.table(path)
    except Exception:
        return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for name in TESTDATA_TABLES:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(name)
