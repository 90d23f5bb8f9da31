"""Table loaders.

Production target is Iceberg (`spark.read.table("web_pages")` with manifest
partition pruning); the sandbox has no Iceberg runtime jar and no network, so
every loader falls back transparently to parquet with the identical schema.
The rest of the engine only sees DataFrames, so swapping the catalog in is a
config change, not a code change:

    spark-submit \\
      --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.13:1.6.1 \\
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions \\
      --conf spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.lake.type=hadoop \\
      --conf spark.sql.catalog.lake.warehouse=/path/warehouse \\
      main.py index --input lake.db.web_pages --output /path/index

With the catalog present, `load_web_pages("lake.db.web_pages")` resolves via
`read.table` and Iceberg's manifest min/max stats prune data files under the
same pushed filters the parquet fallback uses today.
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
