"""Warm-path QUERY scaling evidence at N vs 4N cores.

Complements `bench_scaling.py` (index-build scaling, the north-rule headline):
the build-and-query-once protocol there charges each 200-query batch its full
fixed cost (session plan + dictionary join + final window), which dominates at
small batches and hides kernel scaling. Here the index is built ONCE and
shared, and each parallelism level runs a fresh subprocess that warms the
resident searcher (`IndexSearcher.warm()`), burns one small warm-up batch,
then times one large batch — the reference's serving shape
(dense_server_client.py:74-111, client batch 1024).

Usage: python bench_scaling_query.py [--docs 100000] [--queries 1000]
       [--levels 1,4] [--reps 2]

Prints one JSON line; paste the result into BENCH/BASELINE.md by hand (this
script does NOT overwrite it).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

WORKER = r"""
import json, os, sys, time
cpus = int(sys.argv[1]); index_dir = sys.argv[2]; n_q = int(sys.argv[3])
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
from colbert_spark.query.wand import IndexSearcher
from colbert_spark.session import get_spark
from colbert_spark.sources.synth import synth_queries

spark = get_spark(f"qscaling_{cpus}", cpus=cpus, shuffle_partitions=cpus)
searcher = IndexSearcher(spark, index_dir).warm()
# warm-up batch: JIT/codegen + page-cache the segment frames
warmup = spark.createDataFrame(synth_queries(20))
searcher.search(warmup, k=100).count()
batch = spark.createDataFrame(synth_queries(n_q))
t0 = time.perf_counter()
n = searcher.search(batch, k=100).count()
t = time.perf_counter() - t0
assert n > 0
print("RESULT " + json.dumps({
    "cpus": cpus, "queries": n_q, "t_query": round(t, 3),
    "qps": round(n_q / t, 2), "rows": n,
}), flush=True)
"""

BUILDER = r"""
import os, sys
cpus = int(sys.argv[1]); n_docs = int(sys.argv[2]); work = sys.argv[3]
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
from colbert_spark.index.build import build_index
from colbert_spark.session import get_spark
from colbert_spark.sources.synth import write_web_pages

spark = get_spark("qscaling_build", cpus=cpus, shuffle_partitions=cpus)
corpus_path = os.path.join(work, "web_pages")
write_web_pages(spark, corpus_path, n_docs, partitions=cpus)
build_index(spark, spark.read.parquet(corpus_path),
            os.path.join(work, "index"),
            bucket_size=max(n_docs // 128, 500))
print("BUILD done", flush=True)
"""


def run(args_list, timeout=3600):
    out = subprocess.run(
        [sys.executable, "-c"] + args_list,
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
        timeout=timeout,
    )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--queries", type=int, default=1000)
    ap.add_argument("--levels", default="1,4")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    levels = tuple(int(c) for c in args.levels.split(","))

    work = tempfile.mkdtemp(prefix="qscaling_")
    try:
        b = run([BUILDER, "8", str(args.docs), work])
        if "BUILD done" not in b.stdout:
            print(b.stdout[-2000:], b.stderr[-4000:], file=sys.stderr)
            return 1
        index_dir = os.path.join(work, "index")

        runs: dict[int, list[dict]] = {c: [] for c in levels}
        for rep in range(args.reps):
            for c in levels:
                out = run([WORKER, str(c), index_dir, str(args.queries)])
                r = None
                for line in out.stdout.splitlines():
                    if line.startswith("RESULT "):
                        r = json.loads(line[len("RESULT "):])
                if r is None:
                    print(out.stdout[-2000:], out.stderr[-4000:], file=sys.stderr)
                    return 1
                runs[c].append(r)
                print(f"LEVEL rep={rep} " + json.dumps(r), flush=True)

        best = {c: max(rs, key=lambda r: r["qps"]) for c, rs in runs.items()}
        pairs = [(a, b) for a, b in zip(levels, levels[1:]) if b == 4 * a]
        eff = {
            f"{n}->{n4}": round((best[n4]["qps"] / best[n]["qps"]) / 4, 3)
            for n, n4 in pairs
        }
        print(json.dumps({
            "metric": "warm-path query scaling efficiency N->4N cores",
            "value": max(eff.values()) if eff else None,
            "unit": "ratio",
            "docs": args.docs,
            "queries": args.queries,
            "qps": {c: best[c]["qps"] for c in levels},
            "t_query": {c: best[c]["t_query"] for c in levels},
            "query_efficiency": eff,
            "reps": args.reps,
            "all_runs": runs,
        }))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
