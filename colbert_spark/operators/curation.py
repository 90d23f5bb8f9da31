"""Corpus-curation operators: deterministic sampling for training-data
pipelines (the driver's beyond-reference mandate, SURVEY.md §2.9).

A 100-TB pipeline cannot use `rand()` sampling — reruns must pick the SAME
rows (lineage/reproducibility), and a coordinator-free criterion must work
per-row on any executor. Both operators therefore sample by a cryptographic
hash of the row key: uniform, deterministic, partition-independent, and
expressible identically in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from colbert_spark.sources.tables import load_table

SAMPLE_PER_GROUP = 20  # stratified: rows kept per group
SAMPLE_HEX_LT = "2"  # Bernoulli: keep md5(key) < '2…' ⇒ 1/8 of rows


def _key_hash(col: str):
    """Lowercase md5 hex of the row key — the sampling order/criterion."""
    return F.md5(F.col(col).cast("string").cast("binary"))


def sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample: the SAMPLE_PER_GROUP docs with the
    smallest md5(doc_id) per language. One shuffle (the per-group window);
    at 10^12 rows the window input is first cut by a cheap per-partition
    top-N (Spark's WindowGroupLimit pushdown does this automatically for
    rank < k filters), so no group ever materializes fully."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(_key_hash("doc_id").asc(), F.asc("doc_id"))
    return (
        docs.withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= SAMPLE_PER_GROUP)
        .select("lang", F.col("pick").cast("long").alias("pick"), "doc_id")
        .orderBy("lang", "pick")
    )


def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~1/8 Bernoulli sample: keep rows whose md5(doc_id) hex
    starts below SAMPLE_HEX_LT. Pure map-side filter — no shuffle at all,
    and the SAME rows survive on any cluster size or rerun."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return (
        docs.filter(_key_hash("doc_id") < SAMPLE_HEX_LT)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


QUERIES = {
    "sample_per_group": sample_per_group,
    "sample_bernoulli": sample_bernoulli,
}

ORACLES = {
    "sample_per_group": f"""
        WITH h AS (
          SELECT lang, doc_id, md5(doc_id::VARCHAR) AS hx FROM documents),
        ranked AS (
          SELECT lang, doc_id,
                 row_number() OVER (PARTITION BY lang ORDER BY hx, doc_id) AS pick
          FROM h)
        SELECT lang, pick::BIGINT AS pick, doc_id
        FROM ranked WHERE pick <= {SAMPLE_PER_GROUP}
        ORDER BY lang, pick
    """,
    "sample_bernoulli": f"""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE md5(doc_id::VARCHAR) < '{SAMPLE_HEX_LT}'
        ORDER BY doc_id
    """,
}
