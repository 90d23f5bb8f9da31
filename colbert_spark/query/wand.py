"""Block-max top-k query kernel over compressed posting segments.

The classical analog of the reference's two-stage pruned retrieval
(``colbert/ranking/colbert_ranker.py:176-210``: IVF probe with nprobe ≪
partitions shortlists candidates cheaply, then exact MaxSim re-ranks): here
per-block max-score metadata lets the scorer skip postings blocks that cannot
beat the running top-k threshold, then exact BM25 re-scores the survivors.

Algorithm: **block-max MaxScore** (same family as block-max WAND; chosen
because MaxScore's essential/non-essential split vectorizes cleanly with
numpy, where WAND's pivot walk is per-doc sequential). Exactness argument:

  * seed θ = k-th best exact single-term score from the highest-impact term;
  * terms sorted by upper bound ub_t = qtf·max_block_score ascending; the
    largest prefix with Σ ub < θ is "non-essential" — a doc appearing ONLY in
    non-essential terms scores < θ and cannot enter the top-k;
  * a block B of an essential term t is skipped for candidate generation iff
    qtf·B.max + (Σ ub − ub_t) < θ — even a doc taking B's max plus every
    other term's full upper bound stays below θ;
  * surviving candidates are re-scored EXACTLY against all query terms
    (decoding only blocks whose [first_doc, last_doc] range contains a
    candidate — the skip-pointer use of the block metadata), accumulated in
    float64 in lexicographic term order — the same addition order as the
    pure-Python oracle, so scores are bit-identical, and ties break
    (−score, doc_id).

Distribution: the kernel runs per (qid, bucket) group — a bucket holds a
bounded doc range, so head terms are already split across buckets (the build's
salt) and every group fits one Arrow batch. Per-bucket top-k then a global
Window per qid: global top-k ⊆ union of per-bucket top-k.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from colbert_spark.index.codec import vb_decode
from colbert_spark.query.bm25 import query_terms_df

KERNEL_OUT_SCHEMA = "qid long, doc_id long, score double"


def _decode_block(row) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    docs = np.cumsum(vb_decode(row.doc_bytes))
    tfs = vb_decode(row.tf_bytes)
    dls = vb_decode(row.dl_bytes)
    return docs, tfs, dls


def _bm25(tfs: np.ndarray, dls: np.ndarray, idf: float, k1: float, b: float, avgdl: float):
    t = tfs.astype(np.float64)
    return idf * t * (k1 + 1.0) / (t + k1 * (1.0 - b + b * dls / avgdl))


_EMPTY = pd.DataFrame(
    {
        "qid": pd.Series([], dtype="int64"),
        "doc_id": pd.Series([], dtype="int64"),
        "score": pd.Series([], dtype="float64"),
    }
)


def make_kernel(k: int, k1: float, b: float, n_docs: int, avgdl: float):
    """Score one complete (qid, bucket) group frame → per-bucket top-k rows."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        qid = int(pdf["qid"].iat[0])
        # term_id order == lexicographic term order (dictionary is a dense
        # rank over term), so float accumulation order matches the oracle
        terms = sorted(pdf["term_id"].unique())
        # per-term metadata
        tinfo = {}
        for t in terms:
            tp = pdf[pdf["term_id"] == t].sort_values("first_doc")
            qtf = float(tp["qtf"].iloc[0])
            df_t = int(tp["df"].iloc[0])
            idf = float(np.log(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5)))
            ub = qtf * float(tp["max_score"].max())
            tinfo[t] = (tp, qtf, idf, ub)
        order = sorted(terms, key=lambda t: tinfo[t][3])  # ub ascending
        ubs = np.array([tinfo[t][3] for t in order])
        total_ub = float(ubs.sum())

        # --- seed: exact-score the highest-impact term fully
        seed_t = order[-1]
        tp, qtf, idf, _ = tinfo[seed_t]
        seed_scores = []
        for row in tp.itertuples():
            docs, tfs, dls = _decode_block(row)
            seed_scores.append(qtf * _bm25(tfs, dls, idf, k1, b, avgdl))
        seed = np.concatenate(seed_scores) if seed_scores else np.empty(0)
        theta = float(np.partition(seed, len(seed) - k)[len(seed) - k]) if len(seed) >= k else 0.0

        # --- essential terms: smallest suffix whose excluded prefix sums < θ
        prefix = np.concatenate([[0.0], np.cumsum(ubs)])
        j = int(np.searchsorted(prefix, theta, side="left"))  # prefix[j-1] < θ ≤ prefix[j]
        essential = order[max(j - 1, 0) :]

        # --- candidate generation with block-max skipping
        cand_parts = []
        blocks_cache: dict[tuple, tuple] = {}  # keyed by frame row index —
        # block_id alone is not unique across a bucket's sub-splits
        for t in essential:
            tp, qtf, idf, ub_t = tinfo[t]
            rest = total_ub - ub_t
            for row in tp.itertuples():
                if qtf * row.max_score + rest < theta:
                    continue  # block-max skip: cannot reach θ even maximally
                dec = _decode_block(row)
                blocks_cache[row.Index] = dec
                cand_parts.append(dec[0])
        if not cand_parts:
            return _EMPTY
        cands = np.unique(np.concatenate(cand_parts))

        # --- exact re-score of candidates, lexicographic term order (matches
        # the oracle's float64 accumulation order bit-for-bit)
        scores = np.zeros(len(cands), dtype=np.float64)
        for t in terms:
            tp, qtf, idf, _ = tinfo[t]
            for row in tp.itertuples():
                if row.first_doc > cands[-1] or row.last_doc < cands[0]:
                    continue
                lo = np.searchsorted(cands, row.first_doc, side="left")
                hi = np.searchsorted(cands, row.last_doc, side="right")
                if lo == hi:
                    continue  # no candidate inside this block's range
                dec = blocks_cache.get(row.Index)
                if dec is None:
                    dec = _decode_block(row)
                docs, tfs, dls = dec
                idx = np.searchsorted(cands, docs)
                valid = (idx < len(cands)) & (cands[np.minimum(idx, len(cands) - 1)] == docs)
                if valid.any():
                    contrib = qtf * _bm25(tfs[valid], dls[valid], idf, k1, b, avgdl)
                    scores[idx[valid]] += contrib

        top = min(k, len(cands))
        sel = np.lexsort((cands, -scores))[:top]
        return pd.DataFrame({"qid": qid, "doc_id": cands[sel], "score": scores[sel]})

    return kernel


def load_index(spark: SparkSession, index_dir: str):
    with open(os.path.join(index_dir, "stats.json")) as f:
        stats = json.load(f)
    segments = spark.read.parquet(os.path.join(index_dir, "segments"))
    term_dict = spark.read.parquet(os.path.join(index_dir, "term_dict"))
    return segments, term_dict, stats


def bm25_topk_segments(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 10,
) -> DataFrame:
    """→ (qid, rank, doc_id, score) from the compressed segment index."""
    segments, term_dict, stats = load_index(spark, index_dir)
    qt = query_terms_df(queries)
    # dictionary lookup: query term strings → term_ids via the vocab-sized
    # term_dict (isin pushdown prunes its scan); ids then push down into the
    # segments scan, pruning row groups by term_id min/max — a fixed-width
    # int predicate instead of string comparisons
    terms = [r["term"] for r in qt.select("term").distinct().collect()]
    if not terms:
        return spark.createDataFrame([], "qid long, rank int, doc_id long, score double")
    tid_rows = (
        term_dict.filter(F.col("term").isin(terms)).select("term", "term_id").collect()
    )
    if not tid_rows:
        return spark.createDataFrame([], "qid long, rank int, doc_id long, score double")
    tids = [r["term_id"] for r in tid_rows]
    qt_ids = qt.join(
        F.broadcast(
            spark.createDataFrame([(r["term"], r["term_id"]) for r in tid_rows],
                                  "term string, term_id long")
        ),
        "term",
    ).select("qid", "term_id", "qtf")
    hit = segments.filter(F.col("term_id").isin(tids)).join(F.broadcast(qt_ids), "term_id")
    kernel = make_kernel(k, stats["k1"], stats["b"], stats["N"], stats["avgdl"])

    def stream(batches):
        """One streaming pass per partition: the trailing (possibly
        incomplete) (qid, bucket) group of each Arrow batch carries into the
        next, so a group never splits and Python overhead is per-partition,
        not per-group (same pattern as the index-build encode kernel)."""
        tail: pd.DataFrame | None = None
        for pdf in batches:
            if tail is not None and len(tail):
                pdf = pd.concat([tail, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_q = pdf["qid"].iat[-1]
            last_b = pdf["bucket"].iat[-1]
            is_tail = (pdf["qid"] == last_q) & (pdf["bucket"] == last_b)
            tail = pdf[is_tail]
            body = pdf[~is_tail]
            if len(body):
                out = [
                    kernel(g)
                    for _, g in body.groupby(["qid", "bucket"], sort=False)
                ]
                yield pd.concat(out, ignore_index=True) if out else _EMPTY
        if tail is not None and len(tail):
            yield kernel(tail)

    shuffled = hit.repartition("qid", "bucket").sortWithinPartitions(
        "qid", "bucket", "term_id", "first_doc"
    )
    partial = shuffled.mapInPandas(stream, KERNEL_OUT_SCHEMA)
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", "doc_id", "score")
    )
