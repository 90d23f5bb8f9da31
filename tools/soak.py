"""Large-corpus soak: build → deep-fsck → warm query/phrase → point sweep
→ compaction, one JSON line.

Round-4 protocol (VERDICT.md round-3 §next #5): one decade beyond the 1M
soak — positional build at a tuned bucket_size, `index_fsck --deep`
decoding every payload, warm 1000-query BM25 batch + 50-phrase batch, a
20-query `search_point` cold/hot sweep, then `compact_index` with a
post-compaction deep fsck and a rank/score-identity spot check across the
swap, and the block-count floor analysis (Σ_t min(df_t, n_buckets) — the
Zipf tail's lower bound on blocks, which per-doc write cost amortizes
against as the corpus grows into a fixed bucket count).

Usage: python tools/soak.py [n_docs] [bucket_size]   (defaults 1_000_000, 62_500)
Set SOAK_COMPACT=0 to skip the compaction leg (round-3 behavior).
Set SOAK_SHARDS=N to build N disjoint shard indexes and fuse them with the
block-copy merge instead of one monolithic build — the production shape
past ~5M docs on scratch/RAM-bounded hosts (per-shard walls and the merge
wall are reported separately).
Set SOAK_RESUME=1 to SKIP the build when a completed index (stats.json +
.soak_build.json timing sidecar) already exists — the post-build legs then
run in a FRESH process, which also resets the long-lived Python workers'
resident memory between the build and the decode-heavy fsck (at 10M docs
the 32 reused workers otherwise carry build-leg RSS into fsck and can trip
the host OOM killer). After every leg the partial result dict is dumped to
/tmp/soak_<n>_partial.json, so a crash loses at most one leg.
Corpus and index live under /tmp and are reused across runs if present
(delete /tmp/soak_<n>_corpus to regenerate).
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from colbert_spark.session import get_spark  # noqa: E402
from colbert_spark.sources.synth import synth_queries, write_web_pages  # noqa: E402
from colbert_spark.index.build import build_index  # noqa: E402
from colbert_spark.index.inspect import index_fsck, index_stats  # noqa: E402
from colbert_spark.query.wand import IndexSearcher  # noqa: E402
from colbert_spark.query.phrase import PositionalSearcher  # noqa: E402


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    bucket_size = int(sys.argv[2]) if len(sys.argv) > 2 else 62_500
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    corpus_dir = f"/tmp/soak_{n_docs}_corpus"
    index_dir = f"/tmp/soak_{n_docs}_idx"
    out: dict = {
        "n_docs": n_docs,
        "bucket_size": bucket_size,
        "cpus": cpus,
        "positions": True,
    }

    spark = get_spark("soak", cpus=cpus, shuffle_partitions=2 * cpus)
    sidecar = os.path.join(index_dir, ".soak_build.json")
    partial = f"/tmp/soak_{n_docs}_partial.json"

    def checkpoint() -> None:
        with open(partial, "w") as f:
            json.dump(out, f)

    resume = (
        os.environ.get("SOAK_RESUME") == "1"
        and os.path.exists(os.path.join(index_dir, "stats.json"))
        and os.path.exists(sidecar)
    )
    if resume:
        with open(sidecar) as f:
            out.update(json.load(f))
        with open(os.path.join(index_dir, "stats.json")) as f:
            stats = json.load(f)
        out["resumed"] = True
        return _post_build_legs(
            spark, out, stats, index_dir, n_docs, bucket_size, checkpoint
        )

    t0 = time.perf_counter()
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        # _SUCCESS gate: a killed prior run leaves a partial dir that must
        # regenerate, not be trusted
        shutil.rmtree(corpus_dir, ignore_errors=True)
        write_web_pages(spark, corpus_dir, n_docs, partitions=2 * cpus)
        out["gen_sec"] = round(time.perf_counter() - t0, 1)
    pages = spark.read.parquet(corpus_dir)

    shutil.rmtree(index_dir, ignore_errors=True)
    t0 = time.perf_counter()
    shards = int(os.environ.get("SOAK_SHARDS", "1"))
    if shards > 1:
        # SOAK_SHARDS=N: build N shard indexes over disjoint corpus slices,
        # then fuse with `merge_indexes` (block-copy fast path: compressed
        # payloads move verbatim). This IS the production shape at 10^7+
        # docs — one monolithic exchange at 10M needs ~2× this sandbox's
        # scratch disk AND RAM (two ENOSPC + two OOM kills on record), while
        # each half-build is a proven scale and the merge is I/O-bound.
        from colbert_spark.index.merge import merge_indexes

        ordinal = F.element_at(F.split("url", "/"), -1).cast("long")
        per = -(-n_docs // shards)
        shard_dirs, shard_secs = [], []
        for si in range(shards):
            d = f"{index_dir}_shard{si}"
            shutil.rmtree(d, ignore_errors=True)
            t1 = time.perf_counter()
            build_index(
                spark,
                pages.filter(
                    (ordinal >= si * per)
                    & (ordinal < min(n_docs, (si + 1) * per))
                ),
                d,
                bucket_size=bucket_size,
                positions=True,
            )
            shard_secs.append(round(time.perf_counter() - t1, 1))
            shard_dirs.append(d)
        t1 = time.perf_counter()
        merge_indexes(spark, shard_dirs, index_dir, bucket_size=bucket_size)
        out["merge_sec"] = round(time.perf_counter() - t1, 1)
        out["shards"] = shards
        out["shard_build_secs"] = shard_secs
        with open(os.path.join(index_dir, "stats.json")) as f:
            stats = json.load(f)
        for d in shard_dirs:  # scratch discipline for the compaction leg
            shutil.rmtree(d, ignore_errors=True)
    else:
        stats = build_index(
            spark, pages, index_dir, bucket_size=bucket_size, positions=True
        )
    out["build_sec"] = round(time.perf_counter() - t0, 1)
    out["docs_per_sec"] = round(n_docs / out["build_sec"], 1)
    out["n_terms"] = stats.get("n_terms")
    out["total_cf"] = stats.get("total_cf")
    out["build_phases"] = stats.get("phases")
    with open(sidecar, "w") as f:  # timings survive for SOAK_RESUME=1
        json.dump(out, f)
    checkpoint()
    if os.environ.get("SOAK_BUILD_ONLY") == "1":
        print(json.dumps(out))
        return
    _post_build_legs(
        spark, out, stats, index_dir, n_docs, bucket_size, checkpoint
    )


def _post_build_legs(
    spark, out, stats, index_dir, n_docs, bucket_size, checkpoint
) -> None:
    """fsck → layout stats → warm queries → point sweep → phrase batch →
    compaction (+identity) — every leg checkpoints `out` so a crash loses
    at most the running leg."""
    t0 = time.perf_counter()
    fsck = index_fsck(spark, index_dir, deep=True)
    out["fsck_sec"] = round(time.perf_counter() - t0, 1)
    out["fsck_ok"] = fsck["ok"]
    out["fsck_errors"] = fsck.get("errors", [])[:5]
    out["blocks_decoded"] = fsck.get("blocks_decoded")
    checkpoint()

    istats = index_stats(spark, index_dir)
    out["n_blocks"] = istats["blocks"]
    out["n_postings"] = istats["postings"]
    out["fill_ratio"] = istats["fill_ratio"]
    out["payload_bytes_per_posting"] = istats["bytes_per_posting"]
    out["col_bytes"] = istats["col_bytes"]

    # block-count floor: Σ_t min(df_t, n_buckets) — no per-(term,bucket)
    # layout can use fewer blocks, so fill efficiency = floor/actual
    n_buckets = -(-n_docs // bucket_size)
    tdict = spark.read.parquet(
        os.path.join(index_dir, stats.get("dict_dir", "term_dict"))
    )
    floor = int(
        tdict.agg(
            F.sum(F.least(F.col("df"), F.lit(n_buckets))).alias("f")
        ).collect()[0]["f"]
    )
    out["block_floor"] = floor
    if out["n_blocks"]:
        out["block_floor_ratio"] = round(out["n_blocks"] / floor, 3)

    seg_bytes = 0
    for root, _, files in os.walk(os.path.join(index_dir, "segments")):
        seg_bytes += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    out["segment_bytes"] = seg_bytes
    if out["n_postings"]:
        out["bytes_per_posting"] = round(seg_bytes / out["n_postings"], 2)
    checkpoint()

    # warm BM25: 1000-query batch throughput + single-query latency
    searcher = IndexSearcher(spark, index_dir)
    qs1000 = synth_queries(1000)
    qdf = spark.createDataFrame(qs1000)
    searcher.warm()
    searcher.search(spark.createDataFrame(qs1000.iloc[:4]), k=100).count()  # JIT/plan warmup
    t0 = time.perf_counter()
    searcher.search(qdf, k=100).count()
    out["warm_1000q_sec"] = round(time.perf_counter() - t0, 2)
    out["warm_qps_1000q"] = round(1000 / out["warm_1000q_sec"], 1)
    lat = []
    single = synth_queries(20)
    for i in range(len(single)):
        one = spark.createDataFrame(single.iloc[i : i + 1])
        t0 = time.perf_counter()
        searcher.search(one, k=100).count()
        lat.append(time.perf_counter() - t0)
    lat.sort()
    out["warm_latency_p50"] = round(lat[len(lat) // 2], 3)
    out["warm_latency_p95"] = round(lat[int(len(lat) * 0.95)], 3)
    checkpoint()

    # point sweep: driver-resident path, cold pass (block fetches) then hot
    plat_cold, plat_hot = [], []
    for pass_lat in (plat_cold, plat_hot):
        for q in single["question"]:
            t0 = time.perf_counter()
            searcher.search_point(q, k=100)
            pass_lat.append(time.perf_counter() - t0)
        pass_lat.sort()
    out["point_p50_cold"] = round(plat_cold[len(plat_cold) // 2], 4)
    out["point_p50_hot"] = round(plat_hot[len(plat_hot) // 2], 4)
    out["point_p95_hot"] = round(plat_hot[int(len(plat_hot) * 0.95)], 4)
    checkpoint()
    # pre-compaction answers for the identity check across the swap
    pre_compact = [searcher.search_point(q, k=20) for q in single["question"][:10]]
    searcher.close()

    # warm phrase batch (positional path)
    qp = synth_queries(50)
    two_term = [q for q in qp["question"] if len(q.split()) >= 2][:50]
    phrases = spark.createDataFrame(
        [(i, " ".join(q.split()[:2])) for i, q in enumerate(two_term)],
        "phrase_id long, phrase string",
    )
    psearch = PositionalSearcher(spark, index_dir).warm()
    t0 = time.perf_counter()
    n_hits = psearch.phrase(phrases).count()
    out["phrase_batch_sec"] = round(time.perf_counter() - t0, 2)
    out["phrase_hits"] = n_hits
    psearch.close()
    checkpoint()

    if os.environ.get("SOAK_COMPACT", "1") != "0":
        from colbert_spark.index.compact import compact_index

        t0 = time.perf_counter()
        cstats = compact_index(spark, index_dir)
        out["compact_sec"] = round(time.perf_counter() - t0, 1)
        out["compact_blocks_before"] = cstats.get("n_blocks_before")
        out["compact_blocks_after"] = cstats.get("n_blocks_after")
        checkpoint()

        t0 = time.perf_counter()
        fsck2 = index_fsck(spark, index_dir, deep=True)
        out["compact_fsck_sec"] = round(time.perf_counter() - t0, 1)
        out["compact_fsck_ok"] = fsck2["ok"]
        out["compact_fsck_errors"] = fsck2.get("errors", [])[:5]

        istats2 = index_stats(spark, index_dir)
        out["compact_fill_ratio"] = istats2["fill_ratio"]
        out["compact_bytes_per_posting"] = istats2["bytes_per_posting"]
        if floor:
            out["compact_block_floor_ratio"] = round(istats2["blocks"] / floor, 3)

        # identity across the swap: compaction rewrites every block but must
        # not change a single (doc_id, score) pair
        s2 = IndexSearcher(spark, index_dir)
        s2.warm()
        ident = True
        for q, pre in zip(single["question"][:10], pre_compact):
            post = s2.search_point(q, k=20)
            if len(pre) != len(post):
                ident = False
                break
            if len(pre) and not (
                (pre["doc_id"].values == post["doc_id"].values).all()
                and abs(pre["score"].values - post["score"].values).max()
                <= 1e-9 * max(1.0, abs(pre["score"].values).max())
            ):
                ident = False
                break
        out["compact_identity_ok"] = ident
        s2.close()
        checkpoint()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
