"""Round-2 done-conditions from VERDICT.md:

* warm searcher: repeated batches against a persisted index are rank-identical
  to the cold path and to the pure-Python oracle (the resident-server analog,
  reference ``colbert/training/dense_server_client.py:21-66``);
* manifest/tshard pruning: the cold-path segment scan actually READS a strict
  subset of the on-disk files for a narrow query (the nprobe-of-nlist analog,
  reference ``colbert/ranking/colbert_ranker.py:176-210``);
* ANN recall floor: the IVF path's measured recall@10 against exact kNN stays
  above a floor, and beats both hyperplane-LSH paths (reference
  ``faiss_indexers.py:173-174`` nprobe trade);
* streaming state stays bounded across two triggers: the append-mode
  watermarked rollup drops closed-window state instead of accumulating it.
"""

import glob
import math
import os

import pytest
from pyspark.sql import functions as F

from colbert_spark.index.build import build_index
from colbert_spark.oracle import OracleIndex
from colbert_spark.query.wand import IndexSearcher

K = 10


@pytest.fixture(scope="module")
def corpus_df(spark, tiny_corpus):
    return spark.createDataFrame(tiny_corpus).cache()


@pytest.fixture(scope="module")
def index_dir(spark, corpus_df, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_svc"))
    build_index(spark, corpus_df, d, bucket_size=127)
    return d


@pytest.fixture(scope="module")
def golden(tiny_corpus, tiny_queries):
    ordered = tiny_corpus.sort_values("url").reset_index(drop=True)
    oracle = OracleIndex.build(list(zip(range(len(ordered)), ordered["text"])))
    return {
        qid: oracle.topk(q, K)
        for qid, q in zip(tiny_queries["qid"], tiny_queries["question"])
    }


def _assert_rank_identical(rows, golden):
    by_qid = {}
    for r in rows:
        by_qid.setdefault(r["qid"], []).append(r)
    for qid, expected in golden.items():
        got = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        assert len(got) == len(expected), f"qid={qid}"
        for (exp_doc, exp_score), row in zip(expected, got):
            assert row["doc_id"] == exp_doc, f"qid={qid}"
            assert math.isclose(row["score"], exp_score, rel_tol=1e-9)


def test_warm_searcher_repeated_batches(spark, index_dir, tiny_queries, golden):
    """Two consecutive batches on a warmed searcher both match the oracle —
    the persisted bucket-partitioned segments serve every batch with zero
    index exchange, and warming changes no result."""
    searcher = IndexSearcher(spark, index_dir).warm()
    try:
        queries = spark.createDataFrame(tiny_queries)
        _assert_rank_identical(searcher.search(queries, k=K).collect(), golden)
        # second batch (subset, different qid mix) against the same warm state
        sub = spark.createDataFrame(tiny_queries.iloc[10:30])
        sub_golden = {q: golden[q] for q in tiny_queries["qid"].iloc[10:30]}
        _assert_rank_identical(searcher.search(sub, k=K).collect(), sub_golden)
    finally:
        searcher.close()


def test_dense_and_pruned_paths_agree(spark, index_dir, tiny_queries, golden):
    """The two kernel strategies — block-max MaxScore (small batches) and
    dense shared-scoring (large batches) — are BOTH rank- and score-identical
    to the oracle on the same 50-query batch. `dense_min` forces each path."""
    searcher = IndexSearcher(spark, index_dir)
    queries = spark.createDataFrame(tiny_queries)
    dense = searcher.search(queries, k=K, dense_min=1).collect()
    pruned = searcher.search(queries, k=K, dense_min=10**9).collect()
    _assert_rank_identical(dense, golden)
    _assert_rank_identical(pruned, golden)


def test_cold_scan_prunes_files(spark, index_dir):
    """The cold-path pruned scan reads a strict subset of segment files, and
    ONLY from tshard directories matching the queried terms."""
    searcher = IndexSearcher(spark, index_dir)
    tshards = searcher.stats["tshards"]
    all_files = glob.glob(
        os.path.join(index_dir, "segments", "bucket=*", "tshard=*", "*.parquet")
    )
    assert len(all_files) > tshards  # multi-bucket layout, else the test is vacuous
    # one mid-vocabulary term: a 1-term query must touch exactly 1 shard dir
    tid = int(searcher.stats["n_terms"]) // 2
    read_files = {
        r[0]
        for r in searcher.pruned_scan([tid])
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert read_files, "scan read nothing"
    assert len(read_files) < len(all_files)
    want_dir = f"tshard={tid % tshards}"
    assert all(want_dir in f for f in read_files), read_files
    # and the one-shard file count is ~1/tshards of the layout
    assert len(read_files) <= len(all_files) // tshards + 1


def test_ann_ivf_recall_floor(spark):
    """Measured recall@10 of the IVF path ≥ 0.3 on the sf0.001 embeddings
    (near-random synthetic vectors: top-1 cosine ≈ 0.33, so recall is
    data-bounded — 0.45 average at a ~24% scan fraction is a ~2× lift over
    random scanning; on clustered real embeddings the same nprobe/C dial
    behaves like the reference's faiss IVF), and IVF beats both hyperplane-LSH
    paths."""
    from colbert_spark.operators.similarity import ann_recall_eval

    row = (
        ann_recall_eval(spark, "/root/testdata/sf0.001")
        .agg(
            F.avg("recall_ivf_r").alias("ivf"),
            F.avg("recall_multi_r").alias("multi"),
            F.avg("recall_single_r").alias("single"),
        )
        .collect()[0]
    )
    assert row["ivf"] >= 0.3, row
    assert row["ivf"] > row["multi"] >= row["single"], row


def test_streaming_state_bounded_across_triggers(spark, tmp_path):
    """Append-mode watermarked rollup over two availableNow triggers (second
    one resumes from the first's checkpoint): the state store holds only
    OPEN windows after each run — closed-window state is emitted and dropped,
    never accumulated — and the two runs together emit exactly the closed
    windows of the full input."""
    import pandas as pd

    from colbert_spark.streaming.events_stream import EVENTS_SCHEMA

    src = "/root/testdata/sf0.001/events.parquet"
    events = pd.read_parquet(src).sort_values("ts").reset_index(drop=True)
    half = len(events) // 2
    in_dir = tmp_path / "in"
    in_dir.mkdir()
    events.iloc[:half].to_parquet(in_dir / "part1.parquet", index=False)

    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .parquet(str(in_dir))
            .withWatermark("ts", "1 hour")
        )
        agg = stream.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        ).agg(F.count("*").alias("n"))
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        state_rows = None
        for p in reversed(q.recentProgress):
            ops = p.get("stateOperators") or []
            if ops:
                state_rows = ops[0]["numRowsTotal"]
                break
        return state_rows

    n_types = events["event_type"].nunique()
    total_windows = events["ts"].dt.floor("h").nunique()
    assert total_windows > 20  # enough windows that an unbounded store would show

    state1 = run_once()
    # watermark = max(ts of half 1) − 1h ⇒ open windows ≤ 2 per event type
    assert state1 is not None and state1 <= 2 * n_types, state1

    events.iloc[half:].to_parquet(in_dir / "part2.parquet", index=False)
    state2 = run_once()
    assert state2 is not None and state2 <= 2 * n_types, state2

    # emitted = exactly the closed windows of the FULL input
    got = (
        spark.read.schema("w struct<start timestamp, end timestamp>, event_type string, n long")
        .parquet(out_dir)
        .select("w.end")
        .agg(F.count("*"), F.max("end"))
        .collect()[0]
    )
    wm = events["ts"].max() - pd.Timedelta(hours=1)
    closed = (
        events.assign(ws=events["ts"].dt.floor("h"))
        .groupby(["ws", "event_type"])
        .size()
        .reset_index()
    )
    closed = closed[closed["ws"] + pd.Timedelta(hours=1) <= wm]
    assert got[0] == len(closed), (got[0], len(closed))


def test_exclusion_matches_bruteforce(spark, index_dir, tiny_corpus, tiny_queries):
    """Boolean must_not (`exclude` column): results equal the plain search
    with every doc containing a negated term removed BEFORE the top-k cut —
    computed brute-force from a re-tokenization of the corpus. Covers warm
    and cold paths, a negation that is also a positive term, and an
    out-of-vocabulary negation (which must change nothing)."""
    import pandas as pd

    from colbert_spark.functions.tokenizer import py_tokenize
    from colbert_spark.oracle import OracleIndex

    ordered = tiny_corpus.sort_values("url").reset_index(drop=True)
    oracle = OracleIndex.build(list(zip(range(len(ordered)), ordered["text"])))
    doc_terms = {i: set(py_tokenize(t)) for i, t in enumerate(ordered["text"])}

    qs = tiny_queries.iloc[:8].copy()
    first_tokens = [py_tokenize(q)[0] for q in qs["question"]]
    # negate the first token of the NEXT query (usually present in corpus),
    # one self-negation, one OOV negation
    excludes = first_tokens[1:] + ["zzznotindexed"]
    excludes[3] = first_tokens[3]  # self-negation: every hit doc excluded
    qs["exclude"] = excludes

    def brute(question, exclude):
        banned = set(py_tokenize(exclude))
        full = oracle.topk(question, len(doc_terms))
        kept = [(d, s) for d, s in full if not (doc_terms[d] & banned)]
        return kept[:K]

    golden = {
        qid: brute(q, x)
        for qid, q, x in zip(qs["qid"], qs["question"], qs["exclude"])
    }
    searcher = IndexSearcher(spark, index_dir)
    try:
        for warm in (False, True):
            if warm:
                searcher.warm()
            rows = searcher.search(spark.createDataFrame(qs), k=K).collect()
            _assert_rank_identical(rows, golden)
    finally:
        searcher.close()

    # OOV-only negation ≡ plain search
    plain = searcher.search(spark.createDataFrame(qs.drop(columns=["exclude"])), k=K)
    oov = qs.copy()
    oov["exclude"] = "zzznotindexed"
    withx = searcher.search(spark.createDataFrame(oov), k=K)
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, withx.collect()))
    assert a == b


def test_matching_docs_warm_equals_cold_and_bruteforce(
    spark, index_dir, tiny_corpus, tiny_queries
):
    """`matching_docs` (the facet/aggregation primitive) returns the exact
    boolean-OR match set — equal to a brute-force re-tokenization — and the
    warm path returns byte-identical rows with zero index-data exchange."""
    from colbert_spark.functions.tokenizer import py_tokenize

    ordered = tiny_corpus.sort_values("url").reset_index(drop=True)
    doc_terms = {i: set(py_tokenize(t)) for i, t in enumerate(ordered["text"])}
    qs = tiny_queries.iloc[:6]
    want = set()
    for qid, q in zip(qs["qid"], qs["question"]):
        toks = set(py_tokenize(q))
        want |= {(qid, d) for d, ts in doc_terms.items() if ts & toks}

    searcher = IndexSearcher(spark, index_dir)
    try:
        cold = {(r["qid"], r["doc_id"]) for r in
                searcher.matching_docs(spark.createDataFrame(qs)).collect()}
        searcher.warm()
        warm_df = searcher.matching_docs(spark.createDataFrame(qs))
        warm = {(r["qid"], r["doc_id"]) for r in warm_df.collect()}
        assert cold == want
        assert warm == want
        # warm plan: no shuffle of index data (only the InMemoryTableScan)
        plan = warm_df._jdf.queryExecution().executedPlan().toString()
        assert "InMemoryTableScan" in plan
        assert "Exchange" not in plan.split("InMemoryTableScan")[0]
    finally:
        searcher.close()


def test_score_matches_consistent_with_search_and_match_set(
    spark, index_dir, tiny_queries
):
    """`score_matches` (the field-collapse substrate) must agree with both
    siblings: its (qid, doc) set equals `matching_docs` exactly, and
    re-cutting it per qid by (−score, doc_id) reproduces `search`'s top-k
    rank-for-rank and score-for-score."""
    qs = spark.createDataFrame(tiny_queries[:8])
    searcher = IndexSearcher(spark, index_dir)
    full = searcher.score_matches(qs).collect()
    mset = {(r["qid"], r["doc_id"]) for r in
            searcher.matching_docs(qs).collect()}
    assert {(r["qid"], r["doc_id"]) for r in full} == mset

    byq = {}
    for r in full:
        byq.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    want = {}
    for r in searcher.search(qs, k=K).collect():
        want.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    for qid, rows in want.items():
        cut = sorted(byq[qid], key=lambda t: (-t[1], t[0]))[:K]
        for (rank, doc, score), (cdoc, cscore) in zip(sorted(rows), cut):
            assert doc == cdoc and abs(score - cscore) < 1e-12, qid


def test_search_offset_is_exact_page_slice(spark, index_dir, tiny_queries):
    """`search(offset=o)` returns exactly ranks o+1..o+k of the one-shot
    depth-(o+k) ranking, renumbered — scores identical, on the cold and
    warm paths."""
    qs = spark.createDataFrame(tiny_queries[:10])
    searcher = IndexSearcher(spark, index_dir)
    try:
        deep = searcher.search(qs, k=20).collect()
        want = sorted(
            (r["qid"], r["rank"] - 10, r["doc_id"], r["score"])
            for r in deep
            if r["rank"] > 10
        )
        for warm in (False, True):
            if warm:
                searcher.warm()
            page = sorted(
                (r["qid"], r["rank"], r["doc_id"], r["score"])
                for r in searcher.search(qs, k=10, offset=10).collect()
            )
            assert page == want
    finally:
        searcher.close()


def test_dictionary_prefix_range_prunes_files(spark, index_dir):
    """The dictionary is laid out range-sorted by term (write_term_dict), so
    the autocomplete range predicate `term >= p AND term < p||'￿'`
    must read a strict subset of the dictionary's parquet files — the
    Lucene terms-index analog, unpruned-scan-shaped no more."""
    dict_files = glob.glob(os.path.join(index_dir, "term_dict", "*.parquet"))
    assert len(dict_files) > 2, "need a multi-file dictionary for this test"
    td = spark.read.parquet(os.path.join(index_dir, "term_dict"))
    # a narrow prefix: terms are term00000..term0NNNN plus body words
    read_files = {
        r[0]
        for r in td.filter(
            (F.col("term") >= "term0000") & (F.col("term") < "term0000￿")
        )
        .select(F.input_file_name())
        .distinct()
        .collect()
    }
    assert read_files, "range scan read nothing"
    assert len(read_files) < len(dict_files), (
        f"no pruning: {len(read_files)}/{len(dict_files)} files read"
    )


def test_complete_point_parity_and_hot_cache(spark, index_dir):
    """complete_point must return exactly the dictionary's (df DESC, term)
    top-k for the prefix; a repeated prefix must schedule no job; k-deepening
    within fetch_depth stays hot; an exhausted prefix serves any k hot."""
    s = IndexSearcher(spark, index_dir)
    try:
        td = spark.read.parquet(os.path.join(index_dir, "term_dict"))
        want = [
            (r["term"], int(r["df"]))
            for r in td.filter(F.col("term").startswith("term0001"))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(10)
            .collect()
        ]
        got = s.complete_point("term0001", k=10)
        assert got == want
        # hot path: no further Spark job for the same prefix (tracked via
        # the SparkContext job-group side effect — use the scheduler's job
        # counter through the status tracker)
        tracker = spark.sparkContext.statusTracker()
        before = len(tracker.getJobIdsForGroup() or [])
        got2 = s.complete_point("term0001", k=5)  # k deepening within depth
        assert got2 == want[:5]
        after = len(tracker.getJobIdsForGroup() or [])
        assert after == before, "cache-hot completion scheduled a Spark job"
        # exhausted prefix: fewer matches than fetch_depth → complete set
        few = s.complete_point("term00010", k=3)
        assert [t for t, _ in few] == sorted(
            t for t, _ in few
        ) or len(few) <= 3
        again = s.complete_point("term00010", k=50)
        assert set(t for t, _ in few) <= set(t for t, _ in again)
    finally:
        s.close()
