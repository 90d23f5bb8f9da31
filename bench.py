"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Headline workload:
  * index_build       — full inverted-index build (tokenize → postings →
                        salted (term,bucket) shuffle → varbyte segments +
                        manifest) over a deterministic synthetic web_pages
                        corpus sized by sf (sf0.1 → 20k docs)
  * bm25_segments     — 100-query BM25 top-100 batch over the compressed
                        segment index (block-max MaxScore kernel)
  * bm25_dataframe    — flagship exact-path BM25 over the documents table
  * plus representative driver queries (TPC-H agg, minhash, knn, sessionize)

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def _require(n: int, what: str) -> None:
    """Explicit result check: workloads must run (and be verified) even
    under `python -O`, which strips bare asserts."""
    if n <= 0:
        raise RuntimeError(f"{what}: expected rows, got {n}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    n_corpus = max(2000, int(200_000 * sf))

    from colbert_spark.index.build import build_index
    from colbert_spark.operators.dedup import minhash_signatures
    from colbert_spark.operators.events import events_sessionize
    from colbert_spark.operators.fts_documents import fts_bm25_topk
    from colbert_spark.operators.relational import tpch_q1_pricing_summary
    from colbert_spark.operators.similarity import knn_cosine_topk
    from colbert_spark.query.wand import IndexSearcher, bm25_topk_segments
    from colbert_spark.session import get_spark
    from colbert_spark.sources.synth import synth_queries, write_web_pages

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)
    work = tempfile.mkdtemp(prefix="colbert_bench_")
    timings: dict[str, float] = {}
    extra: dict[str, float] = {}

    try:
        # corpus synthesis excluded from timings (input preparation)
        corpus_path = os.path.join(work, "web_pages")
        write_web_pages(spark, corpus_path, n_corpus, partitions=cpus)
        corpus = spark.read.parquet(corpus_path)

        # untimed warmup: page-cache the benchmark inputs so timings measure
        # the engine, not first-touch disk I/O on a shared host
        for t in ("documents", "lineitem", "events", "embeddings"):
            p = os.path.join(sf_dir, f"{t}.parquet")
            if os.path.exists(p):
                spark.read.parquet(p).count()
        corpus.count()

        # best of 2 into separate dirs (fresh build each rep — resume would
        # short-circuit a same-dir rerun): the host shows bursts of 2-4x
        # noisy-neighbor slowdown, and rep 1 additionally pays JVM codegen
        build_reps = []
        for i in range(2):
            t0 = time.perf_counter()
            build_index(
                spark, corpus, os.path.join(work, f"index{i}"),
                bucket_size=max(2 * n_corpus // cpus, 500),
            )
            build_reps.append(time.perf_counter() - t0)
        timings["index_build"] = min(build_reps)
        extra["index_docs_per_sec"] = round(n_corpus / timings["index_build"], 1)
        os.rename(os.path.join(work, "index0"), os.path.join(work, "index"))

        queries = spark.createDataFrame(synth_queries(100))
        t0 = time.perf_counter()
        n = bm25_topk_segments(spark, os.path.join(work, "index"), queries, k=100).count()
        timings["bm25_segments_100q"] = time.perf_counter() - t0
        extra["bm25_qps"] = round(100 / timings["bm25_segments_100q"], 2)
        _require(n, "bm25_segments_100q")

        # warm service path: index stays persisted across batches (the
        # resident-server analog); 1000q throughput must meet/beat 100q —
        # the batch kernel's cost is per-block-decode, not per-query
        searcher = IndexSearcher(spark, os.path.join(work, "index")).warm()
        q1k = spark.createDataFrame(synth_queries(1000))
        for name, qdf, nq in (
            ("bm25_warm_100q", queries, 100),
            ("bm25_warm_1000q", q1k, 1000),
        ):
            reps = []  # best of 2 — same host-noise defense as the build
            for _ in range(2):
                t0 = time.perf_counter()
                _require(searcher.search(qdf, k=100).count(), name)
                reps.append(time.perf_counter() - t0)
            timings[name] = min(reps)
            extra[f"{name.replace('bm25_warm', 'bm25_warm_qps')}"] = round(
                nq / timings[name], 2
            )

        # query-string language batch on the warm service: 100 Lucene-classic
        # strings mixing boolean MUST, fuzzy (~1) and wildcard/exclude — one
        # parse+expand (driver, LRU'd) + ONE compiled kernel plan per batch.
        # Rep 2 is the service steady state (expansion LRU hot).
        from colbert_spark.query.qstring import search_query_strings

        qstrings = []
        for i, q in enumerate(synth_queries(100)["question"]):
            ts = q.split()
            t0, t1 = ts[0], ts[1 % len(ts)]
            if i % 3 == 0:
                qstrings.append((i, f"{t0} +{t1}"))
            elif i % 3 == 1:
                qstrings.append((i, f"{t0}~1 {t1}"))
            else:
                # 7-char prefix (term000…) keeps expansions ≪ the 1024
                # maxClauseCount cap at every bench sf
                qstrings.append((i, f"{t0[:7]}* -{t1}"))
        qs_reps = []
        for _ in range(2):
            t0_ = time.perf_counter()
            _require(
                search_query_strings(searcher, qstrings, k=100).count(),
                "qstring_100q",
            )
            qs_reps.append(time.perf_counter() - t0_)
        timings["qstring_100q"] = min(qs_reps)
        extra["qstring_qps"] = round(100 / timings["qstring_100q"], 2)

        # single-query latency distribution on the warm service (BASELINE.md
        # protocol: median & p95 sec/query, BM25 top-100)
        lat = []
        single = synth_queries(20)
        for i in range(len(single)):
            one = spark.createDataFrame(single.iloc[i : i + 1])
            t0 = time.perf_counter()
            searcher.search(one, k=100).count()
            lat.append(time.perf_counter() - t0)
        lat.sort()
        extra["bm25_warm_latency_p50"] = round(lat[len(lat) // 2], 3)
        extra["bm25_warm_latency_p95"] = round(lat[int(len(lat) * 0.95)], 3)

        # point-serving path (search_point: driver-resident block LRU, no
        # per-query job once cache-hot — the resident point server analog).
        # Cold = first pass (block fetches run); hot = second pass.
        plat_cold, plat_hot = [], []
        for pass_lat in (plat_cold, plat_hot):
            for q in single["question"]:
                t0 = time.perf_counter()
                searcher.search_point(q, k=100)
                pass_lat.append(time.perf_counter() - t0)
            pass_lat.sort()
        extra["bm25_point_latency_p50_cold"] = round(
            plat_cold[len(plat_cold) // 2], 4
        )
        extra["bm25_point_latency_p50_hot"] = round(
            plat_hot[len(plat_hot) // 2], 4
        )
        extra["bm25_point_latency_p95_hot"] = round(
            plat_hot[int(len(plat_hot) * 0.95)], 4
        )
        searcher.close()

        # positional index (positions ride the same single build shuffle) +
        # phrase / NEAR-proximity batches answered from posting positions
        # on the WARM resident service (warm() untimed, like bm25_warm_*)
        from colbert_spark.query.phrase import PositionalSearcher

        pos_reps = []
        for i in range(2):  # best of 2 — same host-noise defense as the build
            t0 = time.perf_counter()
            build_index(
                spark, corpus, os.path.join(work, f"pindex{i}"),
                bucket_size=max(2 * n_corpus // cpus, 500), positions=True,
            )
            pos_reps.append(time.perf_counter() - t0)
        timings["index_build_positional"] = min(pos_reps)
        extra["positional_build_overhead"] = round(
            timings["index_build_positional"] / timings["index_build"], 2
        )
        pidx = os.path.join(work, "pindex0")
        qp = synth_queries(50)
        two_term = [q for q in qp["question"] if len(q.split()) >= 2][:50]
        phrases = spark.createDataFrame(
            [(i, " ".join(q.split()[:2])) for i, q in enumerate(two_term)],
            "phrase_id long, phrase string",
        )
        pairs = spark.createDataFrame(
            [(i, q.split()[0], q.split()[1]) for i, q in enumerate(two_term)],
            "pair_id long, t1 string, t2 string",
        )
        psearch = PositionalSearcher(spark, pidx).warm()
        for name, run in [
            ("phrase_batch", lambda: psearch.phrase(phrases).count()),
            ("near_batch", lambda: psearch.near(pairs, window=4).count()),
        ]:
            reps = []
            for _ in range(2):
                t0 = time.perf_counter()
                run()
                reps.append(time.perf_counter() - t0)
            timings[name] = min(reps)
        psearch.close()

        # sharded build + merge (index/merge.py, Lucene addIndexes) and
        # scatter-gather federation (sharded_bm25_topk). The two half-corpus
        # builds are INPUT PREP (untimed); timed work = the merge's one
        # decode→re-encode exchange, and the federated 100q batch.
        from pyspark.sql import functions as F

        from colbert_spark.index.merge import merge_indexes
        from colbert_spark.query.wand import sharded_bm25_topk

        shard_a, shard_b = os.path.join(work, "shard_a"), os.path.join(work, "shard_b")
        bs = max(2 * n_corpus // cpus, 500)
        build_index(spark, corpus.filter(F.crc32("url") % 2 == 0), shard_a, bucket_size=bs)
        build_index(spark, corpus.filter(F.crc32("url") % 2 == 1), shard_b, bucket_size=bs)
        merge_reps = []
        for i in range(2):
            t0 = time.perf_counter()
            st = merge_indexes(
                spark, [shard_a, shard_b], os.path.join(work, f"merged{i}"),
                bucket_size=bs,
            )
            merge_reps.append(time.perf_counter() - t0)
            # block-copy merge pads doc bases to bucket boundaries: N is the
            # id bound, live_docs the real count
            if st.get("live_docs", st["N"]) != n_corpus:
                raise RuntimeError(
                    f"index_merge: live_docs {st.get('live_docs')} != {n_corpus}"
                )
        timings["index_merge"] = min(merge_reps)
        extra["merge_docs_per_sec"] = round(n_corpus / timings["index_merge"], 1)

        sharded_reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            _require(
                sharded_bm25_topk(spark, [shard_a, shard_b], queries, k=100).count(),
                "bm25_sharded_100q",
            )
            sharded_reps.append(time.perf_counter() - t0)
        timings["bm25_sharded_100q"] = min(sharded_reps)

        # 4-shard federation over the SAME corpus: with the concurrent
        # scatter, doubling the shard count must NOT double the wall —
        # latency is max(shard), not Σ(shard). Quarter-corpus shards are
        # input prep (untimed).
        quads = [os.path.join(work, f"shard4_{i}") for i in range(4)]
        for i, d4 in enumerate(quads):
            build_index(
                spark, corpus.filter(F.crc32("url") % 4 == i), d4,
                bucket_size=bs,
            )
        sharded4_reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            _require(
                sharded_bm25_topk(spark, quads, queries, k=100).count(),
                "bm25_sharded4_100q",
            )
            sharded4_reps.append(time.perf_counter() - t0)
        timings["bm25_sharded4_100q"] = min(sharded4_reps)

        # point-serving federation: resident 2-shard service, 100 questions
        # one at a time. warm() (untimed, like bm25_warm_*) prefetches the
        # head-term blocks + global df, so the "cold" first pass pays only
        # tail-term fetches — target ≤ 5× the hot pass
        from colbert_spark.query.wand import ShardedSearcher

        svc = ShardedSearcher(spark, [shard_a, shard_b]).warm()
        qlist = list(synth_queries(100)["question"])
        t0 = time.perf_counter()
        for q in qlist:
            svc.search_point(q, k=10)
        extra["sharded_point_cold_100q_sec"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        for q in qlist:
            svc.search_point(q, k=10)
        timings["sharded_point_hot_100q"] = time.perf_counter() - t0
        svc.close()

        for name, fn in [
            ("bm25_dataframe", fts_bm25_topk),
            ("tpch_q1", tpch_q1_pricing_summary),
            ("minhash_signatures", minhash_signatures),
            ("knn_cosine_topk", knn_cosine_topk),
            ("events_sessionize", events_sessionize),
        ]:
            # best of 2: the first rep also pays Python/codegen warmup, and
            # the host shows ~2x noisy-neighbor variance between reps
            reps = []
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                reps.append(time.perf_counter() - t0)
            timings[name] = min(reps)

        total = sum(timings.values())
        out = {
            "metric": "index-build + BM25 top-k + pipeline ops wall time",
            "value": round(total, 3),
            "unit": "sec",
            "queries": {k: round(v, 3) for k, v in timings.items()},
            "sf": sf,
            "cpus": cpus,
            "corpus_docs": n_corpus,
            **extra,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
