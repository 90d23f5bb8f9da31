"""Index introspection + integrity check (the ops face of the segment tree).

`index_stats` aggregates the on-disk segment tree with plain DataFrame
aggregates — one distributed scan, no decode — into the numbers an operator
tunes by: blocks / postings / bytes per epoch, fragmentation (mean postings
per block vs BLOCK_SIZE — the quantity compaction restores), and per-column
compressed footprint.

`index_fsck` verifies the tree's invariants hold (cheap metadata checks plus
an optional full payload decode), catching the corruption modes a
log-structured index can actually develop: manifest/file drift after a
partial copy, truncated payload bytes, block metadata disagreeing with its
own payload. Used by `python -m colbert_spark stats|fsck`.

Reference parity: the reference ships index part files with no checker
(``colbert/indexing/encoder.py`` writes, nothing validates); at 10^12 docs a
resumable build WILL see partial trees, so a fast invariant check is part of
the engine's contract, not a luxury.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from colbert_spark.index.build import BLOCK_SIZE
from colbert_spark.query.wand import load_index


def index_stats(
    spark: SparkSession, index_dir: str, as_of_epoch: int | None = None
) -> dict:
    """One dict of tree-level statistics (all exact, one segment scan)."""
    segments, term_dict, stats = load_index(spark, index_dir, as_of_epoch)
    agg = segments.agg(
        F.count("*").alias("blocks"),
        F.sum("n").alias("postings"),
        F.countDistinct("term_id").alias("terms_with_postings"),
        F.countDistinct("bucket").alias("buckets"),
        F.sum(F.length("doc_bytes")).alias("doc_bytes"),
        F.sum(F.length("tf_bytes")).alias("tf_bytes"),
        F.sum(F.length("dl_bytes")).alias("dl_bytes"),
        *(
            [F.sum(F.length("pos_bytes")).alias("pos_bytes")]
            if "pos_bytes" in segments.columns
            else []
        ),
    ).collect()[0]
    n_dict = term_dict.count()
    postings = int(agg["postings"] or 0)
    blocks = int(agg["blocks"] or 0)
    payload = sum(
        int(agg[c] or 0)
        for c in ("doc_bytes", "tf_bytes", "dl_bytes")
    ) + (int(agg["pos_bytes"] or 0) if "pos_bytes" in segments.columns else 0)
    out = {
        "N": stats["N"],  # maxDoc: the id-space bound
        "live_docs": stats.get("live_docs", stats["N"]),  # numDocs
        "n_deleted": stats.get("n_deleted", 0),  # pending tombstones
        "epochs": stats.get("epochs", 1),
        "positions": bool(stats.get("positions", False)),
        "segver": stats.get("segver", 2),
        "terms_in_dict": n_dict,
        "terms_with_postings": int(agg["terms_with_postings"] or 0),
        "buckets": int(agg["buckets"] or 0),
        "blocks": blocks,
        "postings": postings,
        # 1.0 = perfectly packed; compaction drives this back toward 1
        "fill_ratio": round(postings / (blocks * BLOCK_SIZE), 4) if blocks else 0.0,
        "payload_bytes": payload,
        "bytes_per_posting": round(payload / postings, 3) if postings else 0.0,
        "col_bytes": {
            c: int(agg[c] or 0)
            for c in ("doc_bytes", "tf_bytes", "dl_bytes")
        },
    }
    if "pos_bytes" in segments.columns:
        out["col_bytes"]["pos_bytes"] = int(agg["pos_bytes"] or 0)
    return out


def index_fsck(
    spark: SparkSession,
    index_dir: str,
    deep: bool = False,
    as_of_epoch: int | None = None,
) -> dict:
    """Integrity check; returns {"ok": bool, "errors": [...], ...counts}.

    Metadata level (always): every block's (n, first_doc, last_doc) are
    self-consistent; docs stay inside their bucket's id range; every block's
    term_id exists in the dictionary; live doc ids stay below stats N.

    `deep=True` additionally DECODES every payload on the executors
    (mapInPandas over the same bucket partitioning as the query kernel) and
    re-checks n/first/last/monotonicity against the decoded stream — the
    check that actually catches truncated or bit-flipped payload bytes —
    and verifies the duplicate-(term, bucket, doc) invariant across blocks
    (count vs distinct per posting list; one partial-agg exchange)."""
    import pandas as pd

    segments, term_dict, stats = load_index(spark, index_dir, as_of_epoch)
    bucket_size = int(stats["bucket_size"])
    errors = []

    meta = segments.select(
        "bucket", "term_id", "block_id", "first_doc", "last_doc", "n"
    )
    bad_pred = (
        (F.col("n") <= 0)
        | (F.col("n") > BLOCK_SIZE)
        | (F.col("first_doc") > F.col("last_doc"))
        | (F.col("first_doc") < F.col("bucket") * bucket_size)
        | (F.col("last_doc") >= (F.col("bucket") + 1) * bucket_size)
        | (F.col("last_doc") >= stats["N"])
    )
    # one metadata scan yields both the total and the violation count
    mrow = meta.agg(
        F.count("*").alias("total"),
        F.sum(bad_pred.cast("long")).alias("bad"),
    ).collect()[0]
    blocks_checked = int(mrow["total"] or 0)
    bad_rows = int(mrow["bad"] or 0)
    if bad_rows:
        errors.append(f"{bad_rows} blocks with inconsistent metadata")

    orphan_terms = (
        meta.select("term_id").distinct()
        .join(term_dict.select("term_id"), "term_id", "left_anti")
        .count()
    )
    if orphan_terms:
        errors.append(f"{orphan_terms} block term_ids missing from the dictionary")


    decoded_blocks = 0
    duplicate_postings = 0
    if deep:
        prefixed = stats.get("segver", 2) >= 3
        has_pos = "pos_bytes" in segments.columns
        cols = ["first_doc", "last_doc", "n", "doc_bytes", "tf_bytes", "dl_bytes"]
        if has_pos:
            cols.append("pos_bytes")

        def check(batches):
            import numpy as np

            from colbert_spark.index.codec import decode_block

            n_ok, n_bad = 0, 0
            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    try:
                        docs = np.cumsum(decode_block(r.doc_bytes, prefixed))
                        tfs = decode_block(r.tf_bytes, prefixed)
                        dls = decode_block(r.dl_bytes, prefixed)
                        ok = (
                            len(docs) == r.n == len(tfs) == len(dls)
                            and docs[0] == r.first_doc
                            and docs[-1] == r.last_doc
                            and bool(np.all(np.diff(docs) > 0))
                            and bool(np.all(tfs > 0))
                            and bool(np.all(dls > 0))
                        )
                        if ok and has_pos:
                            deltas = decode_block(r.pos_bytes, prefixed)
                            ok = len(deltas) == int(tfs.sum())
                        n_ok += int(ok)
                        n_bad += int(not ok)
                    except Exception:
                        n_bad += 1
            # one summary row per PARTITION, after all its Arrow batches —
            # yielding inside the batch loop would re-emit the running
            # totals once per batch and over-count
            yield pd.DataFrame({"ok": [n_ok], "bad": [n_bad]})

        res = (
            segments.select(*cols)
            .mapInPandas(check, "ok long, bad long")
            .agg(F.sum("ok").alias("ok"), F.sum("bad").alias("bad"))
            .collect()[0]
        )
        decoded_blocks = int(res["ok"] or 0)
        if int(res["bad"] or 0):
            errors.append(f"{int(res['bad'])} blocks failed payload decode checks")

        # duplicate-(term_id, bucket, doc) invariant: blocks of one
        # (term_id, bucket) hold doc-SET-disjoint postings (build sub-splits
        # and append epochs partition the doc space; ranges may interleave,
        # sets may not). A crashed append retried under a different
        # partition count leaves the same posting in two files — the dense
        # kernel's fancy-index += then silently drops contributions and
        # MaxScore double-counts. Detect it by exploding decoded doc ids and
        # comparing count vs distinct per (term_id, bucket): one
        # postings-scale partial-agg exchange, deep mode's own price class.
        def explode_docs(batches):
            import numpy as np

            from colbert_spark.index.codec import decode_block

            for pdf in batches:
                if not len(pdf):
                    continue
                b_l, t_l, d_l = [], [], []
                for r in pdf.itertuples(index=False):
                    try:
                        docs = np.cumsum(decode_block(r.doc_bytes, prefixed))
                    except Exception:
                        continue  # payload damage already reported above
                    d_l.append(docs)
                    b_l.append(np.full(len(docs), r.bucket, dtype=np.int64))
                    t_l.append(np.full(len(docs), r.term_id, dtype=np.int64))
                if d_l:
                    yield pd.DataFrame(
                        {
                            "bucket": np.concatenate(b_l),
                            "term_id": np.concatenate(t_l),
                            "doc_id": np.concatenate(d_l),
                        }
                    )

        dup_row = (
            segments.select("bucket", "term_id", "doc_bytes")
            .mapInPandas(explode_docs, "bucket long, term_id long, doc_id long")
            .groupBy("bucket", "term_id")
            .agg(
                F.count("*").alias("n"),
                F.count_distinct("doc_id").alias("d"),
            )
            .agg(F.sum(F.col("n") - F.col("d")).alias("dups"))
            .collect()[0]
        )
        duplicate_postings = int(dup_row["dups"] or 0)
        if duplicate_postings:
            errors.append(
                f"{duplicate_postings} duplicated (term, bucket, doc) postings"
            )

    return {
        "ok": not errors,
        "errors": errors,
        "blocks_checked": blocks_checked,
        "blocks_decoded": decoded_blocks,
        "duplicate_postings": duplicate_postings if deep else None,
        "deep": deep,
    }
