"""Segment compaction — the maintenance pass that heals fragmentation.

Why it exists: the build's sub-split load balancing and every `append_index`
epoch leave a (term_id, bucket) posting list scattered across many short
block runs (doc-interleaved across one epoch's sub-splits, doc-range-
disjoint across epochs; readers must not assume cross-block order). Query
cost per term is ~O(#blocks touched): fragments mean more block rows
scanned, more per-block decode bookkeeping, and weaker block-max pruning
(each short block's max is computed over fewer postings, and more blocks
survive the θ test). Compaction decodes every posting once and re-encodes
full ≤BLOCK_SIZE blocks — the Spark-native analog of a log-structured
index's merge pass (the reference's static index parts never fragment
because they are rebuilt whole, `colbert/indexing/encoder.py:41-67`; an
engine with incremental appends needs the merge the reference never had).

Epoch semantics (time-travel, `IndexSearcher(as_of_epoch=k)`):

  * `preserve_epochs=True` (default): blocks are merged only WITHIN an
    epoch (epoch of a block = which [N_{k-1}, N_k) doc range holds its
    first_doc — appends only ever add doc_ids past the committed N, so no
    block spans an epoch boundary, before or after compaction). Each
    epoch's postings are re-encoded with that epoch's ORIGINAL encode-time
    avgdl, so stored block maxima keep exactly their old meaning and every
    epoch snapshot stays servable and rank-exact.
  * `preserve_epochs=False`: all epochs of a (term_id, bucket) merge into
    one run — maximal compaction, but doc-range clipping can no longer
    excise later epochs, so snapshots older than the latest are DELETED
    (the live view and the latest snapshot remain exact). Blocks are
    re-encoded at the index's `min_enc_avgdl`, which keeps the query
    kernel's max(1, avgdl/min_enc_avgdl) pruning inflation sound, and the
    payload format is upgraded to v3 (tagged varbyte/PForDelta) — full
    compaction doubles as the format-migration path for v2 indexes.

Commit protocol: the kernel writes a complete new segment tree under
`segments_c<gen>/` (task-local atomic renames, deterministic content ⇒
crash-rerun rewrites identical files), epoch snapshots are repointed, and
the single atomic `stats.json` replace flips the live `seg_dir` pointer
last — a crash anywhere earlier leaves the old tree live and intact. The
manifest is untouched: its per-bucket posting counts and term watermarks
remain true (compaction moves no postings across buckets); only its
n_blocks column describes the pre-compaction layout.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

from colbert_spark.index.build import (
    DEFAULT_TSHARDS,
    _encode_posting_blocks,
    _write_segment_files,
)
from colbert_spark.index.codec import decode_block

COMPACT_SUMMARY_SCHEMA = "bucket long, n_blocks long, n_postings long"


def _compact_partition(
    k1: float,
    b: float,
    tshards: int,
    seg_dir: str,
    boundaries: list[int],
    enc_avgdls: list[float],
    prefixed_in: bool,
    prefixed_out: bool,
    merge_epochs: bool,
    merged_avgdl: float,
):
    """mapInPandas kernel over (bucket, tshard)-keyed partitions of block
    rows: decode every block, regroup postings per (term, bucket[, epoch]),
    re-encode full blocks, write them task-locally into the NEW segment
    tree. Returns per-bucket summary rows (the job's only Spark output)."""
    bnd = np.asarray(boundaries, dtype=np.int64)

    def fn(batches):
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        has_pos = "pos_bytes" in pdf.columns
        # decode all payloads (maintenance path: per-block Python is fine —
        # the hot paths stay vectorized)
        docs_l, tfs_l, dls_l, pos_l = [], [], [], []
        for i, (db, tb, lb) in enumerate(
            zip(pdf["doc_bytes"], pdf["tf_bytes"], pdf["dl_bytes"])
        ):
            docs_l.append(np.cumsum(decode_block(db, prefixed_in)))
            tf_blk = decode_block(tb, prefixed_in)
            tfs_l.append(tf_blk)
            dls_l.append(decode_block(lb, prefixed_in))
            if has_pos:
                # positions: per-posting-reset deltas → absolute (the block's
                # tf column delimits each posting's occurrence run)
                deltas = decode_block(pdf["pos_bytes"].iat[i], prefixed_in)
                cs = np.cumsum(deltas)
                offs = np.zeros(len(tf_blk) + 1, dtype=np.int64)
                np.cumsum(tf_blk, out=offs[1:])
                starts = offs[:-1]
                base = cs[starts] - deltas[starts]
                pos_l.append(cs - np.repeat(base, tf_blk))
        ns = pdf["n"].to_numpy(np.int64)
        docs = np.concatenate(docs_l)
        tfs = np.concatenate(tfs_l)
        dls = np.concatenate(dls_l)
        if has_pos:
            abs_pos = np.concatenate(pos_l)
            occ0 = np.zeros(len(tfs) + 1, dtype=np.int64)
            np.cumsum(tfs, out=occ0[1:])  # posting → global occurrence start
        terms = np.repeat(pdf["term_id"].to_numpy(np.int64), ns)
        buckets = np.repeat(pdf["bucket"].to_numpy(np.int64), ns)
        if merge_epochs:
            epochs = np.zeros(len(docs), dtype=np.int64)
        else:
            # epoch of a block = first boundary N_k its docs fall below;
            # valid per POSTING too (blocks never span boundaries)
            epochs = np.searchsorted(bnd, docs, side="right")
        outs = []
        for e in np.unique(epochs):
            sel = np.flatnonzero(epochs == e)
            avgdl = merged_avgdl if merge_epochs else enc_avgdls[int(e)]
            td, bd, dd = terms[sel], buckets[sel], docs[sel]
            order = np.lexsort((dd, td, td % tshards, bd))
            sel = sel[order]
            pos_arg = None
            if has_pos:
                # gather this epoch's occurrences in the new posting order,
                # then re-delta with a reset at each posting start
                lens = tfs[sel]
                total = int(lens.sum())
                new_off = np.zeros(len(sel) + 1, dtype=np.int64)
                np.cumsum(lens, out=new_off[1:])
                gidx = (
                    np.repeat(occ0[sel], lens)
                    + np.arange(total, dtype=np.int64)
                    - np.repeat(new_off[:-1], lens)
                )
                ps = abs_pos[gidx]
                deltas = np.empty_like(ps)
                if total:
                    deltas[0] = ps[0]
                    np.subtract(ps[1:], ps[:-1], out=deltas[1:])
                    pstarts = new_off[:-1]
                    deltas[pstarts] = ps[pstarts]
                pos_arg = (deltas, new_off[:-1])
            out = _encode_posting_blocks(
                terms[sel], buckets[sel], docs[sel], tfs[sel], dls[sel],
                k1, b, avgdl, tshards, prefixed_out, pos=pos_arg,
            )
            _write_segment_files(out, seg_dir, epoch=int(e))
            outs.append(out)
        allb = pd.concat(outs, ignore_index=True)
        yield (
            allb.groupby("bucket")
            .agg(n_blocks=("term_id", "size"), n_postings=("n", "sum"))
            .reset_index()
            .astype({"bucket": "int64", "n_blocks": "int64", "n_postings": "int64"})
        )

    return fn


def compact_index(
    spark: SparkSession,
    index_dir: str,
    preserve_epochs: bool = True,
    remove_old: bool = True,
) -> dict:
    """Rewrite the index's segment tree with defragmented full blocks and
    atomically swap it live (see module docstring for epoch semantics and
    the commit protocol). Returns the updated stats dict, including
    `n_blocks_before`/`n_blocks_after`."""
    stats_path = os.path.join(index_dir, "stats.json")
    with open(stats_path) as f:
        stats = json.load(f)
    if stats.get("segver", 1) < 2:
        raise ValueError("compact_index requires a segver>=2 (idf-free) index")
    n_epochs = stats.get("epochs", 1)
    epoch_stats = []
    for k in range(n_epochs):
        with open(os.path.join(index_dir, "epoch_stats", f"e{k}.json")) as f:
            epoch_stats.append(json.load(f))
    boundaries = [es["N"] for es in epoch_stats]
    # epoch k (k≥1) was ENCODED with the avgdl committed by epoch k-1;
    # the base build encoded with its own commit avgdl
    enc_avgdls = [epoch_stats[0]["avgdl"]] + [
        epoch_stats[k - 1]["avgdl"] for k in range(1, n_epochs)
    ]
    merged_avgdl = stats.get("min_enc_avgdl", stats["avgdl"])

    cur_name = stats.get("seg_dir", "segments")
    gen = stats.get("compactions", 0) + 1
    new_name = f"segments_c{gen}"
    prefixed_in = stats.get("segver", 2) >= 3
    prefixed_out = prefixed_in if preserve_epochs else True

    cur_dir = os.path.join(index_dir, cur_name)
    new_dir = os.path.join(index_dir, new_name)
    # gen = committed compactions + 1, so an existing new_dir can only be a
    # crashed earlier attempt (possibly with a different partition count —
    # stale files would read as duplicates); wipe it before rebuilding
    shutil.rmtree(new_dir, ignore_errors=True)
    os.makedirs(new_dir, exist_ok=True)
    segments = spark.read.parquet(cur_dir)
    n_before = segments.count()
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    tshards = stats.get("tshards", DEFAULT_TSHARDS)
    summaries = segments.repartition(p, "bucket", "tshard").mapInPandas(
        _compact_partition(
            stats["k1"], stats["b"], tshards, new_dir,
            boundaries, enc_avgdls, prefixed_in, prefixed_out,
            merge_epochs=not preserve_epochs, merged_avgdl=merged_avgdl,
        ),
        schema=COMPACT_SUMMARY_SCHEMA,
    )
    totals = summaries.groupBy().sum("n_blocks", "n_postings").collect()[0]
    n_after = int(totals[0] or 0)

    # --- commit: repoint epoch snapshots, then the live pointer (atomic)
    stats["seg_dir"] = new_name
    stats["compactions"] = gen
    stats["n_blocks_before"] = n_before
    stats["n_blocks_after"] = n_after
    if not preserve_epochs:
        stats["segver"] = 3  # full merge re-encodes everything tagged
        for k in range(n_epochs - 1):
            old = os.path.join(index_dir, "epoch_stats", f"e{k}.json")
            if os.path.exists(old):
                os.remove(old)  # snapshots older than latest no longer exact
        keep = [n_epochs - 1]
    else:
        keep = list(range(n_epochs))
    for k in keep:
        es = epoch_stats[k]
        es["seg_dir"] = new_name
        es["compactions"] = gen
        if not preserve_epochs:
            es["segver"] = 3
        tmp = os.path.join(index_dir, "epoch_stats", f".e{k}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(es, f)
        os.replace(tmp, os.path.join(index_dir, "epoch_stats", f"e{k}.json"))
    tmp_stats = os.path.join(index_dir, ".stats.json.tmp")
    with open(tmp_stats, "w") as f:
        json.dump(stats, f)
    os.replace(tmp_stats, stats_path)
    if remove_old:
        shutil.rmtree(cur_dir, ignore_errors=True)
    return stats
