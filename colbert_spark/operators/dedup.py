"""Deduplication operators over `documents` — the training-data-pipeline side
of the engine (exact hash dedup, MinHash signatures, n-gram Jaccard).

Hashing is md5 (hex string) in both engines so signatures are bit-identical
across Spark and DuckDB. Shingles are 3-gram word shingles built with
higher-order array functions (JVM-side in Spark, list_transform in DuckDB) —
no Python in the pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from colbert_spark.functions.tokenizer import duckdb_tokens_sql, tokens_col
from colbert_spark.sources.tables import load_table

N_HASHES = 16  # minhash permutations
_TOK = duckdb_tokens_sql("text")


def shingles_col(terms: Column, n: int = 3) -> Column:
    """3-gram word shingles as array<string> (empty if doc shorter than n)."""
    idx = F.sequence(F.lit(1), F.greatest(F.size(terms) - (n - 1), F.lit(0)))
    return F.when(F.size(terms) >= n, F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(terms, i + j) for j in range(n)]
        ),
    )).otherwise(F.array().cast("array<string>"))


def _duckdb_shingles(lst: str) -> str:
    return (
        f"CASE WHEN len({lst}) >= 3 THEN "
        f"list_transform(generate_series(1, greatest(len({lst}) - 2, 0)), "
        f"i -> {lst}[i] || ' ' || {lst}[i+1] || ' ' || {lst}[i+2]) "
        f"ELSE [] END"
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5-of-text groups with the kept representative (min id)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.col("text").cast("binary")).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("copies"))
        .orderBy("h")
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature matrix: 16 md5-permutation minima per doc.

    Scale path: shingle explode → (doc, j) partial-agg min — a single shuffle
    keyed by (doc_id, j), no skew (uniform key)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(shingles_col(tokens_col("text"))).alias("sh")
    ).distinct()
    js = spark.range(N_HASHES).select(F.col("id").cast("int").alias("j"))
    return (
        sh.crossJoin(F.broadcast(js))
        .select(
            "doc_id",
            "j",
            F.md5(F.concat_ws(":", F.col("j"), F.col("sh")).cast("binary")).alias("h"),
        )
        .groupBy("doc_id", "j")
        .agg(F.min("h").alias("mh"))
        .orderBy("doc_id", "j")
    )


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard for doc pairs (restricted to doc_id < 60 — the
    quadratic exact baseline; MinHash-LSH is the scale path)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    sh = docs.select(
        "doc_id", F.explode(shingles_col(tokens_col("text"))).alias("sh")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("a_id") == F.col("sa.doc_id"))
        .join(sb, F.col("b_id") == F.col("sb.doc_id"))
        .select(
            "a_id",
            "b_id",
            F.round(
                F.col("i") / (F.col("sa.sz") + F.col("sb.sz") - F.col("i")), 6
            ).alias("jaccard_r"),
        )
        .orderBy("a_id", "b_id")
    )


_SH = _duckdb_shingles(_TOK)

ORACLES = {
    "dedup_exact": """
        SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*)::BIGINT AS copies
        FROM documents GROUP BY md5(text) ORDER BY h
    """,
    "minhash_signatures": f"""
        WITH sh AS (
          SELECT DISTINCT doc_id, unnest({_SH}) AS sh FROM documents),
        sig AS (
          SELECT doc_id, j.j::INT AS j, min(md5(j.j || ':' || sh)) AS mh
          FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {N_HASHES - 1})) AS j) j
          GROUP BY doc_id, j.j)
        SELECT doc_id, j, mh FROM sig ORDER BY doc_id, j
    """,
    "ngram_jaccard_pairs": f"""
        WITH sh AS (
          SELECT DISTINCT doc_id, unnest({_SH}) AS sh
          FROM documents WHERE doc_id < 60),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT a_id, b_id,
               round(i / (sa.sz + sb.sz - i), 6) AS jaccard_r
        FROM inter
        JOIN sizes sa ON inter.a_id = sa.doc_id
        JOIN sizes sb ON inter.b_id = sb.doc_id
        ORDER BY a_id, b_id
    """,
}

QUERIES = {
    "dedup_exact": dedup_exact,
    "minhash_signatures": minhash_signatures,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
}
