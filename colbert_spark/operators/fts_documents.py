"""Full-text engine operators over the `documents` testdata table — the
driver-gated face of the BM25 engine (SURVEY.md §2.2 P2 tokenize, §2.4 A1/A2/A6
stats, §2.5 J5 score join, §2.6 T1 top-k).

Every query has a DuckDB oracle built from the SAME tokenizer grammar
(`DUCKDB_TOKEN_REGEX`) and the SAME BM25 formula, so the driver's value-hash
compare is an independent cross-engine rank-identity check. Scores are ranked
on round(score, 9) in BOTH engines (kills float-summation-order rank flips on
mathematically-tied scores) and output rounded to 4 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from colbert_spark.functions.tokenizer import duckdb_tokens_sql, tokens_col
from colbert_spark.oracle import B_DEFAULT, K1_DEFAULT
from colbert_spark.sources.tables import load_table

# the fixed "reference query set" for the documents corpus
DOC_QUERIES = [
    (0, "hash join table"),
    (1, "customer order line"),
    (2, "vector stream"),
    (3, "slow query filter"),
    (4, "the a data"),
    (5, "scan scan scan"),
    (6, "zzznotfound vector"),
    (7, "window"),
]
TOPK = 10


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens_col("text").alias("terms"))
        .withColumn("doclen", F.size("terms"))
    )


def fts_doclen(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).select("doc_id", F.col("doclen").cast("long").alias("doclen"))


def fts_collection_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _docs(spark, sf_dir).agg(
        F.count("*").alias("n_docs"),
        F.sum("doclen").cast("long").alias("total_tokens"),
        F.round(F.avg("doclen"), 6).alias("avgdl_r"),
    )


def fts_term_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    posts = (
        docs.select("doc_id", F.explode("terms").alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    return (
        posts.groupBy("term")
        .agg(F.count("*").alias("df"), F.sum("tf").alias("cf"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(30)
    )


def fts_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: BM25 top-10 for the fixed query set over `documents`."""
    docs = _docs(spark, sf_dir).cache()
    row = docs.agg(F.count("*").alias("n"), F.avg("doclen").alias("avgdl")).collect()[0]
    n_docs, avgdl = row["n"], row["avgdl"]
    posts = (
        docs.select("doc_id", "doclen", F.explode("terms").alias("term"))
        .groupBy("term", "doc_id", "doclen")
        .agg(F.count("*").alias("tf"))
    )
    tstats = posts.groupBy("term").agg(F.count("*").alias("df"))
    queries = spark.createDataFrame(DOC_QUERIES, "qid long, question string")
    qt = (
        queries.select("qid", F.explode(tokens_col("question")).alias("term"))
        .groupBy("qid", "term")
        .agg(F.count("*").alias("qtf"))
    )
    joined = posts.join(F.broadcast(qt.join(tstats, "term")), "term")
    idf = F.log(
        F.lit(1.0) + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    k1, b = K1_DEFAULT, B_DEFAULT
    tf = F.col("tf").cast("double")
    contrib = (
        F.col("qtf")
        * idf
        * tf
        * (k1 + 1.0)
        / (tf + k1 * (1.0 - b + b * F.col("doclen") / F.lit(float(avgdl))))
    )
    agg = (
        joined.withColumn("contrib", contrib)
        .groupBy("qid", "doc_id")
        .agg(F.sum("contrib").alias("score"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc(F.round(F.col("score"), 9)), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select("qid", "rank", "doc_id", F.round("score", 4).alias("score_r"))
    )


def _values_clause() -> str:
    return ", ".join(f"({qid}, '{q}')" for qid, q in DOC_QUERIES)


_TOK = duckdb_tokens_sql("text")
_QTOK = duckdb_tokens_sql("question")

ORACLES = {
    "fts_doclen": f"""
        SELECT doc_id, len({_TOK})::BIGINT AS doclen FROM documents
    """,
    "fts_collection_stats": f"""
        WITH dl AS (SELECT doc_id, len({_TOK}) AS doclen FROM documents)
        SELECT count(*)::BIGINT AS n_docs, sum(doclen)::BIGINT AS total_tokens,
               round(avg(doclen), 6) AS avgdl_r
        FROM dl
    """,
    "fts_term_df": f"""
        WITH tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
        tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id)
        SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
        FROM tf GROUP BY term ORDER BY df DESC, term ASC LIMIT 30
    """,
    "fts_bm25_topk": f"""
        WITH q(qid, question) AS (VALUES {_values_clause()}),
        tok AS (SELECT doc_id, unnest({_TOK}) AS term FROM documents),
        dl AS (SELECT doc_id, count(*) AS doclen FROM tok GROUP BY doc_id),
        stats AS (SELECT count(*) AS n, avg(doclen) AS avgdl FROM dl),
        tf AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY term, doc_id),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        qt AS (SELECT qid, unnest({_QTOK}) AS term FROM q),
        qtf AS (SELECT qid, term, count(*) AS qtf FROM qt GROUP BY qid, term),
        scored AS (
          SELECT qtf.qid::BIGINT AS qid, tf.doc_id,
                 sum(qtf.qtf * ln(1 + (stats.n - df.df + 0.5) / (df.df + 0.5))
                     * tf.tf * ({K1_DEFAULT} + 1.0)
                     / (tf.tf + {K1_DEFAULT} * (1.0 - {B_DEFAULT} + {B_DEFAULT} * dl.doclen / stats.avgdl))
                 ) AS score
          FROM qtf
          JOIN df USING (term)
          JOIN tf USING (term)
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN stats
          GROUP BY qtf.qid, tf.doc_id),
        ranked AS (
          SELECT qid, doc_id, score,
                 row_number() OVER (PARTITION BY qid ORDER BY round(score, 9) DESC, doc_id) AS rank
          FROM scored)
        SELECT qid, rank::BIGINT AS rank, doc_id, round(score, 4) AS score_r
        FROM ranked WHERE rank <= {TOPK}
    """,
}

QUERIES = {
    "fts_doclen": fts_doclen,
    "fts_collection_stats": fts_collection_stats,
    "fts_term_df": fts_term_df,
    "fts_bm25_topk": fts_bm25_topk,
}
