"""Positional segment index + index-backed exact-phrase retrieval.

Correctness bar: `phrase_match_segments` must agree EXACTLY (doc set and
per-doc occurrence count) with a pure-Python sliding-window oracle built
from the same tokenizer grammar — through the whole index lifecycle
(base build → append epoch → epoch-preserving compaction → full merge) —
and a positional index must answer BM25 queries rank-identically to a
non-positional one (positions are additive; the BM25 path drops the
column before the exchange).
"""

import math

import pandas as pd
import pytest

from colbert_spark.functions.tokenizer import py_tokenize
from colbert_spark.index.build import append_index, build_index
from colbert_spark.index.compact import compact_index
from colbert_spark.oracle import OracleIndex
from colbert_spark.query.phrase import (
    first_hit_segments,
    near_match_segments,
    phrase_match_segments,
)
from colbert_spark.query.wand import IndexSearcher

PHRASES = [
    (0, "term00000 term00001"),  # common bigram
    (1, "term00001 term00000 term00000"),  # trigram
    (2, "term00000 term00000"),  # repeated term: overlapping matches
    (3, "term00003"),  # single-term phrase: n_occ == tf
    (4, "zzznotindexed term00000"),  # OOV token ⇒ no matches
    (5, "!!! ..."),  # punctuation-only ⇒ no tokens ⇒ no matches
]


def _oracle_phrase(toks: list[list[str]], phrase: str) -> dict[int, int]:
    words = py_tokenize(phrase)
    if not words:
        return {}
    m = len(words)
    out = {}
    for d, tk in enumerate(toks):
        c = sum(1 for i in range(len(tk) - m + 1) if tk[i : i + m] == words)
        if c:
            out[d] = c
    return out


def _phrase_results(spark, index_dir, phrases=PHRASES, **kw):
    qdf = spark.createDataFrame(
        pd.DataFrame(phrases, columns=["phrase_id", "phrase"])
    )
    got: dict[int, dict[int, int]] = {}
    for r in phrase_match_segments(spark, index_dir, qdf, **kw).collect():
        got.setdefault(r["phrase_id"], {})[r["doc_id"]] = r["n_occ"]
    return got


@pytest.fixture(scope="module")
def pos_index(spark, tiny_corpus, tmp_path_factory):
    """Positional index over the first 600 docs (small buckets ⇒ several
    buckets and sub-splits), plus the doc_id→tokens mapping both for the
    base corpus and for the post-append corpus."""
    base = tiny_corpus.iloc[:600]
    d = str(tmp_path_factory.mktemp("idx_pos"))
    build_index(spark, spark.createDataFrame(base), d, bucket_size=131, positions=True)
    ordered = base.sort_values("url").reset_index(drop=True)
    toks = [py_tokenize(t) for t in ordered["text"]]
    return d, ordered, toks


def test_phrase_matches_oracle(spark, pos_index):
    d, _, toks = pos_index
    got = _phrase_results(spark, d)
    for pid, phrase in PHRASES:
        assert got.get(pid, {}) == _oracle_phrase(toks, phrase), (pid, phrase)
    # sanity: the common bigram actually matches something
    assert len(got.get(0, {})) > 10


def test_single_term_phrase_counts_equal_tf(spark, pos_index):
    d, _, toks = pos_index
    got = _phrase_results(spark, d, phrases=[(0, "term00003")])
    want = {i: tk.count("term00003") for i, tk in enumerate(toks) if "term00003" in tk}
    assert got.get(0, {}) == want


def test_phrase_survives_append_and_compaction(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_pos_life"))
    base = tiny_corpus.iloc[:400]
    extra = tiny_corpus.iloc[:650]  # 250 genuinely new docs
    build_index(spark, spark.createDataFrame(base), d, bucket_size=97, positions=True)
    append_index(spark, spark.createDataFrame(extra), d)
    old = base.sort_values("url").reset_index(drop=True)
    new = (
        extra[~extra["url"].isin(set(base["url"]))]
        .sort_values("url")
        .reset_index(drop=True)
    )
    ordered = pd.concat([old, new], ignore_index=True)
    toks = [py_tokenize(t) for t in ordered["text"]]
    want = {pid: _oracle_phrase(toks, p) for pid, p in PHRASES}

    assert {p: _phrase_results(spark, d).get(p, {}) for p, _ in PHRASES} == want
    compact_index(spark, d, preserve_epochs=True)
    assert {p: _phrase_results(spark, d).get(p, {}) for p, _ in PHRASES} == want
    compact_index(spark, d, preserve_epochs=False)
    assert {p: _phrase_results(spark, d).get(p, {}) for p, _ in PHRASES} == want


def test_time_travel_phrase_excludes_appended_epoch(
    spark, tiny_corpus, tmp_path_factory
):
    d = str(tmp_path_factory.mktemp("idx_pos_tt"))
    base = tiny_corpus.iloc[:400]
    build_index(spark, spark.createDataFrame(base), d, bucket_size=97, positions=True)
    live_before = _phrase_results(spark, d, phrases=[(0, "term00000 term00001")])
    append_index(spark, spark.createDataFrame(tiny_corpus.iloc[:650]), d)
    snap = _phrase_results(
        spark, d, phrases=[(0, "term00000 term00001")], as_of_epoch=0
    )
    live_after = _phrase_results(spark, d, phrases=[(0, "term00000 term00001")])
    assert snap == live_before
    assert len(live_after.get(0, {})) > len(snap.get(0, {}))


def test_bm25_rank_identical_on_positional_index(
    spark, pos_index, tiny_queries
):
    d, ordered, _ = pos_index
    oracle = OracleIndex.build(list(zip(range(len(ordered)), ordered["text"])))
    queries = spark.createDataFrame(tiny_queries[:15])
    rows = IndexSearcher(spark, d).search(queries, k=10).collect()
    byq: dict[int, list] = {}
    for r in rows:
        byq.setdefault(r["qid"], []).append(r)
    for qid, q in zip(tiny_queries["qid"][:15], tiny_queries["question"][:15]):
        got = sorted(byq.get(qid, []), key=lambda r: r["rank"])
        want = oracle.topk(q, 10)
        assert [r["doc_id"] for r in got] == [doc for doc, _ in want]
        for r, (_, s) in zip(got, want):
            assert math.isclose(r["score"], s, rel_tol=1e-9)


NEAR_PAIRS_T = [
    (0, "term00000", "term00005"),
    (1, "term00002", "term00007"),
    (2, "zzznotindexed", "term00000"),  # OOV side ⇒ no matches
]


def _oracle_near(toks, t1, t2, w):
    out = {}
    for d, tk in enumerate(toks):
        p1 = [i for i, t in enumerate(tk) if t == t1]
        p2 = [i for i, t in enumerate(tk) if t == t2]
        c = sum(1 for a in p1 if any(abs(a - b) <= w for b in p2))
        if c:
            out[d] = c
    return out


@pytest.mark.parametrize("window", [0, 1, 4])
def test_near_matches_oracle_at_each_window(spark, pos_index, window):
    d, _, toks = pos_index
    qdf = spark.createDataFrame(
        pd.DataFrame(NEAR_PAIRS_T, columns=["pair_id", "t1", "t2"])
    )
    got: dict[int, dict[int, int]] = {}
    for r in near_match_segments(spark, d, qdf, window=window).collect():
        got.setdefault(r["pair_id"], {})[r["doc_id"]] = r["n_anchor"]
    for pid, t1, t2 in NEAR_PAIRS_T:
        assert got.get(pid, {}) == _oracle_near(toks, t1, t2, window), (
            pid, t1, t2, window,
        )
    if window == 4:  # sanity: the common pair actually matches something
        assert len(got.get(0, {})) > 3


def test_warm_positional_searcher_identical_and_no_exchange(spark, pos_index):
    """A warmed PositionalSearcher must (a) return exactly the cold-path
    phrase results across repeated batches and (b) run each warm batch with
    ZERO index-data exchange (narrow filter over the persisted
    bucket-partitioned sort)."""
    import contextlib
    import io

    from colbert_spark.query.phrase import PositionalSearcher

    d, _, _ = pos_index
    cold = _phrase_results(spark, d)
    s = PositionalSearcher(spark, d).warm()
    qdf = spark.createDataFrame(
        pd.DataFrame(PHRASES, columns=["phrase_id", "phrase"])
    )
    try:
        for _ in range(2):
            got: dict[int, dict[int, int]] = {}
            for r in s.phrase(qdf).collect():
                got.setdefault(r["phrase_id"], {})[r["doc_id"]] = r["n_occ"]
            assert got == cold
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            s.phrase(qdf).explain("formatted")
        # the per-batch plan must be filter-over-cache; an Exchange may only
        # appear INSIDE the InMemoryRelation's cached-build description
        head = buf.getvalue().split("InMemoryRelation")[0]
        assert "InMemoryTableScan" in head and "Exchange" not in head
    finally:
        s.close()


def test_first_hit_matches_tokenizer(spark, pos_index):
    """first_hit_segments must return, for every candidate (query, doc)
    pair, the earliest 0-based occurrence of any query term per the same
    tokenizer — and no row when the doc contains none of the terms."""
    d, _, toks = pos_index
    queries = spark.createDataFrame(
        [(0, "term00000 term00007"), (1, "zzznotindexed")],
        "qid long, question string",
    )
    cand = spark.createDataFrame(
        [(0, dd) for dd in range(40)] + [(1, dd) for dd in range(10)],
        "qid long, doc_id long",
    )
    got = {
        (r["qid"], r["doc_id"]): r["first_pos"]
        for r in first_hit_segments(spark, d, queries, cand).collect()
    }
    want = {}
    for dd in range(40):
        pos = [
            i for i, t in enumerate(toks[dd]) if t in ("term00000", "term00007")
        ]
        if pos:
            want[(0, dd)] = min(pos)
    assert got == want
    assert want, "candidates should include real hits"


def test_phrase_requires_positional_index(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_nopos"))
    build_index(
        spark, spark.createDataFrame(tiny_corpus.iloc[:100]), d, bucket_size=97
    )
    qdf = spark.createDataFrame(pd.DataFrame(PHRASES[:1], columns=["phrase_id", "phrase"]))
    with pytest.raises(ValueError, match="positional"):
        phrase_match_segments(spark, d, qdf)


def test_phrase_point_parity_and_cache_hot_zero_jobs(spark, pos_index):
    """phrase_point (driver-resident positional point path) must agree
    exactly with the sliding-window oracle for every fixture phrase, and a
    cache-hot repeat must schedule zero lookup/fetch jobs."""
    import time

    from colbert_spark.query.phrase import PositionalSearcher

    d, _, toks = pos_index
    s = PositionalSearcher(spark, d).warm()
    try:
        for pid, phrase in PHRASES:
            pt = s.phrase_point(phrase)
            got = {int(r.doc_id): int(r.n_occ) for r in pt.itertuples()}
            assert got == _oracle_phrase(toks, phrase), (pid, phrase)
        lookups = s._point_lookup_jobs
        fetches = s._point_fetch_jobs
        t0 = time.perf_counter()
        for _, phrase in PHRASES:
            s.phrase_point(phrase)
        dt = time.perf_counter() - t0
        assert s._point_lookup_jobs == lookups
        assert s._point_fetch_jobs == fetches
        assert dt < 1.0, f"cache-hot phrase sweep took {dt:.2f}s"
    finally:
        s.close()


def test_near_point_parity(spark, pos_index):
    """near_point must agree with the distributed near() for each fixture
    pair at window=4, and with a brute-force position check."""
    from colbert_spark.query.phrase import PositionalSearcher

    d, _, toks = pos_index
    s = PositionalSearcher(spark, d).warm()
    try:
        pairs = [("term00000", "term00001"), ("term00003", "term00000"),
                 ("zzznotindexed", "term00000")]
        qdf = spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(pairs)],
            "pair_id long, t1 string, t2 string",
        )
        dist = {}
        for r in s.near(qdf, window=4).collect():
            dist.setdefault(r["pair_id"], {})[r["doc_id"]] = r["n_anchor"]
        for i, (a, b) in enumerate(pairs):
            pt = s.near_point(a, b, window=4)
            got = {int(r.doc_id): int(r.n_anchor) for r in pt.itertuples()}
            assert got == dist.get(i, {}), (a, b)
        # brute force on one pair: anchor = occurrence of t1 with a t2
        # within 4 tokens in the same doc
        want = {}
        for did, tk in enumerate(toks):
            p1 = [j for j, t in enumerate(tk) if t == "term00000"]
            p2 = [j for j, t in enumerate(tk) if t == "term00001"]
            n = sum(1 for x in p1 if any(abs(x - y) <= 4 for y in p2))
            if n:
                want[did] = n
        pt = s.near_point("term00000", "term00001", window=4)
        assert {int(r.doc_id): int(r.n_anchor) for r in pt.itertuples()} == want
    finally:
        s.close()


def test_within_point_parity(spark, pos_index):
    """within_point must agree with the distributed within() and with a
    brute-force minimal-window sweep over the corpus tokens."""
    from colbert_spark.query.phrase import PositionalSearcher

    d, _, toks = pos_index
    s = PositionalSearcher(spark, d).warm()
    try:
        groups = [
            "term00000 term00001 term00003",
            "term00000 term00002",
            "term00000 zzznotindexed term00001",
        ]
        qdf = spark.createDataFrame(
            [(i, g) for i, g in enumerate(groups)],
            "group_id long, terms string",
        )
        dist = {}
        for r in s.within(qdf, window=7).collect():
            dist.setdefault(r["group_id"], {})[r["doc_id"]] = r["min_span"]
        assert dist.get(0) or dist.get(1)  # fixture yields real matches
        for i, g in enumerate(groups):
            pt = s.within_point(g, window=7)
            got = {int(r.doc_id): int(r.min_span) for r in pt.itertuples()}
            assert got == dist.get(i, {}), g
        # brute force one group: true minimal span over combos
        want = {}
        terms = groups[0].split()
        for did, tk in enumerate(toks):
            occ = sorted(
                (p, terms.index(t)) for p, t in enumerate(tk) if t in terms
            )
            counts = [0] * 3
            missing, left, best = 3, 0, None
            for right in range(len(occ)):
                c = occ[right][1]
                if counts[c] == 0:
                    missing -= 1
                counts[c] += 1
                while missing == 0:
                    span = occ[right][0] - occ[left][0] + 1
                    if best is None or span < best:
                        best = span
                    cl = occ[left][1]
                    counts[cl] -= 1
                    if counts[cl] == 0:
                        missing += 1
                    left += 1
            if best is not None and best <= 7:
                want[did] = best
        pt = s.within_point(groups[0], window=7)
        assert {int(r.doc_id): int(r.min_span) for r in pt.itertuples()} == want
    finally:
        s.close()
