"""Index time-travel (`IndexSearcher(as_of_epoch=k)`): querying an appended
index as of an earlier epoch must return exactly what a searcher on the
pre-append index returned — same doc_ids, same scores (idf/avgdl from the
snapshot's stats, postings clipped to the snapshot's doc range). No data is
copied to make this work: epoch stats and dictionaries are immutable, and
append-epoch blocks hold only doc_ids >= the previously committed N, so
`first_doc < N_k` excises them exactly.
"""

import json
import math
import os

import pytest

from colbert_spark.index.build import append_index, build_index
from colbert_spark.query.wand import IndexSearcher

K = 10


@pytest.fixture(scope="module")
def epochs(spark, tiny_corpus, tmp_path_factory):
    n = len(tiny_corpus)
    a = tiny_corpus.iloc[: n * 3 // 5]
    b = tiny_corpus.iloc[n * 3 // 5 : n * 4 // 5]
    c = tiny_corpus.iloc[n * 4 // 5 :]
    root = tmp_path_factory.mktemp("idx_asof")
    full = str(root / "full")
    build_index(spark, spark.createDataFrame(a), full, bucket_size=127)
    append_index(spark, spark.createDataFrame(b), full)
    append_index(spark, spark.createDataFrame(c), full)
    base_only = str(root / "base")
    build_index(spark, spark.createDataFrame(a), base_only, bucket_size=127)
    return full, base_only, len(a), len(b), len(c)


def _rows(searcher, spark, tiny_queries):
    out = {}
    for r in searcher.search(spark.createDataFrame(tiny_queries), k=K).collect():
        out.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    return {q: sorted(v) for q, v in out.items()}


def test_snapshots_written_per_epoch(epochs):
    full, _, n_a, n_b, n_c = epochs
    stats = json.load(open(os.path.join(full, "stats.json")))
    assert stats["epochs"] == 3 and stats["N"] == n_a + n_b + n_c
    for k, n_k in ((0, n_a), (1, n_a + n_b), (2, n_a + n_b + n_c)):
        snap = json.load(open(os.path.join(full, "epoch_stats", f"e{k}.json")))
        assert snap["N"] == n_k, f"epoch {k}"


def test_asof_base_epoch_equals_preappend_index(spark, epochs, tiny_queries):
    """The strongest form: doc_ids AND scores bit-comparable to a fresh
    index built on the base slice alone (epoch-0 docs share url-rank ids)."""
    full, base_only, *_ = epochs
    got = _rows(IndexSearcher(spark, full, as_of_epoch=0), spark, tiny_queries)
    want = _rows(IndexSearcher(spark, base_only), spark, tiny_queries)
    assert got.keys() == want.keys()
    for qid in want:
        assert [(r, d) for r, d, _ in got[qid]] == [(r, d) for r, d, _ in want[qid]]
        for (_, _, sg), (_, _, sw) in zip(got[qid], want[qid]):
            assert math.isclose(sg, sw, rel_tol=1e-12), qid


def test_asof_latest_epoch_equals_live_view(spark, epochs, tiny_queries):
    full, *_ = epochs
    got = _rows(IndexSearcher(spark, full, as_of_epoch=2), spark, tiny_queries)
    live = _rows(IndexSearcher(spark, full), spark, tiny_queries)
    assert got == live


def test_asof_middle_epoch_doc_range(spark, epochs, tiny_queries):
    """No doc from the last append may surface in the as-of-1 view, and its
    stats are the epoch-1 commit's."""
    full, _, n_a, n_b, _ = epochs
    s = IndexSearcher(spark, full, as_of_epoch=1)
    assert s.stats["N"] == n_a + n_b
    rows = s.search(spark.createDataFrame(tiny_queries), k=K).collect()
    assert rows and all(r["doc_id"] < n_a + n_b for r in rows)
