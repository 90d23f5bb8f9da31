"""Hybrid retrieval — the lexical engine composed with its dense sibling.

Two classical hybrid shapes, each with corpus-scan and segment-index paths
sharing one DuckDB oracle:

* `hybrid_rrf`: reciprocal-rank fusion of the BM25 and QL-Dirichlet
  rankings (the Elasticsearch RRF / TREC fusion baseline): score(d) =
  Σ_r 1/(RRF_K + rank_r(d)) over the rankings that retrieved d at depth
  RRF_DEPTH. Rank-based, so the two scorers need no score calibration —
  exactly why the engine keeps a second scorer priced from the same
  blocks.
* `hybrid_rerank`: BM25 shortlist → exact dense re-rank, the reference's
  own two-stage architecture (IVF shortlist, exact MaxSim re-rank —
  ``colbert/ranking/colbert_ranker.py:176-210``) in classical clothing:
  the lexical ranking prunes the corpus to RERANK_DEPTH docs per query,
  the embedding column re-orders them by float64 cosine to the query
  vector (query qid ↦ embeddings.vec_id = qid, the `knn_cosine_topk`
  convention).

Scale shape: both stages are existing single-pass primitives; the fusion /
re-rank joins touch only depth·|Q| rows (broadcast-small by construction),
and the embedding join is a semi-join-pruned lookup, never a corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from colbert_spark.operators.fts_documents import (
    DOC_QUERIES,
    LMD_MU,
    TOPK,
    _bm25_ctes,
    _fts_bm25_topk,
    _fts_lmd_scored,
    _map_index_docs,
    _positional_index_dir,
    _rank_topk,
)
from colbert_spark.operators.similarity import cosine_rerank
from colbert_spark.sources.tables import load_table

RRF_K = 60  # the standard fusion constant
RRF_DEPTH = 20  # per-ranking depth entering the fusion
RERANK_DEPTH = 30  # lexical shortlist size for the dense re-rank


def _rrf_fuse(bm25_ranked: DataFrame, lmd_ranked: DataFrame) -> DataFrame:
    """Full-outer fuse of two (qid, rank, doc_id) rankings into
    (qid, rank, doc_id, rrf_r): Σ 1/(RRF_K + rank); docs missing from one
    ranking contribute only the other's term. Rank-based, so the float sum
    has two terms and is engine-identical."""
    a = bm25_ranked.select("qid", "doc_id", F.col("rank").alias("r1"))
    b = lmd_ranked.select("qid", "doc_id", F.col("rank").alias("r2"))
    fused = a.join(b, ["qid", "doc_id"], "full_outer").select(
        "qid",
        "doc_id",
        (
            F.coalesce(1.0 / (F.lit(RRF_K) + F.col("r1")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("r2")), F.lit(0.0))
        ).alias("score"),
    )
    return _rank_topk(fused, TOPK).select(
        "qid", "rank", "doc_id", F.col("score_r").alias("rrf_r")
    )


def hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RRF by corpus scan: fuse the depth-RRF_DEPTH BM25 and QL-Dirichlet
    rankings. Exact-semantics oracle for `hybrid_rrf_index`."""
    bm = _fts_bm25_topk(spark, sf_dir, RRF_DEPTH)
    lm = _rank_topk(_fts_lmd_scored(spark, sf_dir), RRF_DEPTH)
    return _rrf_fuse(bm, lm)


def hybrid_rrf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`hybrid_rrf` answered from the segment index: both input rankings
    come from the SAME compressed blocks priced by two scorers (BM25 batch
    kernel, QL kernel), re-cut by the shared tie-break, then fused. Shares
    the corpus-scan oracle."""
    from colbert_spark.query.lm import lm_topk_segments
    from colbert_spark.query.wand import IndexSearcher

    idx = _positional_index_dir(spark, sf_dir)
    queries = spark.createDataFrame(DOC_QUERIES, "qid long, question string")
    bm_hits = IndexSearcher(spark, idx).search(queries, k=RRF_DEPTH + 5)
    bm = _rank_topk(
        _map_index_docs(
            spark, idx, bm_hits.select("qid", "doc_id", "score"), "qid", "score"
        ),
        RRF_DEPTH,
    )
    lm_hits = lm_topk_segments(spark, idx, queries, k=RRF_DEPTH + 5)
    lm = _rank_topk(
        _map_index_docs(
            spark, idx, lm_hits.select("qid", "doc_id", "score"), "qid", "score"
        ),
        RRF_DEPTH,
    )
    return _rrf_fuse(bm, lm)


def _dense_rerank(spark: SparkSession, sf_dir: str, shortlist: DataFrame) -> DataFrame:
    """Re-rank a (qid, doc_id) shortlist by float64 cosine between each
    doc's embedding (vec_id = doc_id) and the query's (vec_id = qid)."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "v", F.col("embedding").cast("array<double>")
    )
    qv = emb.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
    dv = emb.select(F.col("vec_id").alias("doc_id"), F.col("v").alias("dv"))
    joined = cosine_rerank(
        shortlist.select("qid", "doc_id")
        .join(dv, "doc_id")
        .join(F.broadcast(qv), "qid")
        .select("qid", "doc_id", "qv", "dv"),
        "qv", "dv", out="score",
    )
    return _rank_topk(joined, TOPK).select(
        "qid", "rank", "doc_id", F.col("score_r").alias("sim_r")
    )


def hybrid_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage hybrid by corpus scan: BM25 depth-RERANK_DEPTH shortlist,
    exact dense cosine re-rank, top-10. Exact-semantics oracle for
    `hybrid_rerank_index`."""
    short = _fts_bm25_topk(spark, sf_dir, RERANK_DEPTH)
    return _dense_rerank(spark, sf_dir, short)


def hybrid_rerank_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`hybrid_rerank` with the shortlist from the segment index — the
    reference's IVF-shortlist → exact-re-rank pipeline with the lexical
    index as stage one. Shares the corpus-scan oracle."""
    from colbert_spark.query.wand import IndexSearcher

    idx = _positional_index_dir(spark, sf_dir)
    queries = spark.createDataFrame(DOC_QUERIES, "qid long, question string")
    hits = IndexSearcher(spark, idx).search(queries, k=RERANK_DEPTH + 5)
    short = _rank_topk(
        _map_index_docs(
            spark, idx, hits.select("qid", "doc_id", "score"), "qid", "score"
        ),
        RERANK_DEPTH,
    )
    return _dense_rerank(spark, sf_dir, short)


_COSINE_SQL = """
    CASE WHEN sqrt(list_sum(list_transform(qv, x -> x*x))) > 0
          AND sqrt(list_sum(list_transform(dv, x -> x*x))) > 0
    THEN list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * dv[i]))
         / (sqrt(list_sum(list_transform(qv, x -> x*x)))
            * sqrt(list_sum(list_transform(dv, x -> x*x))))
    ELSE 0.0 END
"""

ORACLES = {
    "hybrid_rrf": f"""
        {_bm25_ctes()},
        bm AS (SELECT qid, doc_id, rank FROM ranked WHERE rank <= {RRF_DEPTH}),
        cstat AS (SELECT sum(doclen)::DOUBLE AS c FROM dl),
        cfs AS (SELECT term, sum(tf)::DOUBLE AS cf FROM tf GROUP BY term),
        qv AS (SELECT qtf.qid, qtf.term, qtf.qtf, cfs.cf
               FROM qtf JOIN cfs USING (term)),
        lagg AS (
          SELECT qv.qid::BIGINT AS qid, tf.doc_id,
                 sum(qv.qtf * ln(1 + tf.tf / ({LMD_MU} * qv.cf / cstat.c))) AS mlsum,
                 first(dl.doclen) AS doclen
          FROM qv
          JOIN tf USING (term)
          JOIN dl ON tf.doc_id = dl.doc_id
          CROSS JOIN cstat
          GROUP BY qv.qid, tf.doc_id),
        qn AS (SELECT qid, sum(qtf) AS nq FROM qv GROUP BY qid),
        lscored AS (
          SELECT lagg.qid, lagg.doc_id,
                 lagg.mlsum + qn.nq * ln({LMD_MU} / (lagg.doclen + {LMD_MU})) AS score
          FROM lagg JOIN qn ON lagg.qid = qn.qid),
        lranked AS (
          SELECT qid, doc_id,
                 row_number() OVER (PARTITION BY qid ORDER BY round(score, 9) DESC, doc_id) AS rank
          FROM lscored),
        lm AS (SELECT qid, doc_id, rank FROM lranked WHERE rank <= {RRF_DEPTH}),
        fused AS (
          SELECT coalesce(bm.qid, lm.qid) AS qid,
                 coalesce(bm.doc_id, lm.doc_id) AS doc_id,
                 coalesce(1.0 / ({RRF_K} + bm.rank), 0.0)
                 + coalesce(1.0 / ({RRF_K} + lm.rank), 0.0) AS score
          FROM bm FULL OUTER JOIN lm
            ON bm.qid = lm.qid AND bm.doc_id = lm.doc_id),
        franked AS (
          SELECT qid, doc_id, score,
                 row_number() OVER (PARTITION BY qid ORDER BY round(score, 9) DESC, doc_id) AS rank
          FROM fused)
        SELECT qid, rank::BIGINT AS rank, doc_id, round(score, 4) AS rrf_r
        FROM franked WHERE rank <= {TOPK}
    """,
    "hybrid_rerank": f"""
        {_bm25_ctes()},
        short AS (SELECT qid, doc_id FROM ranked WHERE rank <= {RERANK_DEPTH}),
        e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        sim AS (
          SELECT s.qid, s.doc_id,
                 (SELECT {_COSINE_SQL.replace("qv", "eq.v").replace("dv", "ed.v")}
                  FROM e eq, e ed
                  WHERE eq.vec_id = s.qid AND ed.vec_id = s.doc_id) AS score
          FROM short s),
        rranked AS (
          SELECT qid, doc_id, score,
                 row_number() OVER (PARTITION BY qid ORDER BY round(score, 9) DESC, doc_id) AS rank
          FROM sim WHERE score IS NOT NULL)
        SELECT qid, rank::BIGINT AS rank, doc_id, round(score, 4) AS sim_r
        FROM rranked WHERE rank <= {TOPK}
    """,
}

# index paths ≡ corpus scans, same oracles
ORACLES["hybrid_rrf_index"] = ORACLES["hybrid_rrf"]
ORACLES["hybrid_rerank_index"] = ORACLES["hybrid_rerank"]

QUERIES = {
    "hybrid_rrf": hybrid_rrf,
    "hybrid_rrf_index": hybrid_rrf_index,
    "hybrid_rerank": hybrid_rerank,
    "hybrid_rerank_index": hybrid_rerank_index,
}
