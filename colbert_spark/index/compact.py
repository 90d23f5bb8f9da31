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
    excise later epochs, so epoch history COLLAPSES: `epochs` resets to 1
    and `e0.json` becomes the merged baseline (== the live view), the one
    snapshot that is still exact. Blocks are re-encoded at the index's
    `min_enc_avgdl`, which keeps the query kernel's
    max(1, avgdl/min_enc_avgdl) pruning inflation sound, and the payload
    format is upgraded to v3 (tagged varbyte/PForDelta) — full compaction
    doubles as the format-migration path for v2 indexes.
  * `expunge_deletes=True` (implies the full merge): tombstoned docs'
    postings are physically dropped and the index becomes statistically
    a fresh build over the survivors — see `compact_index`'s docstring
    and index/delete.py for the maxDoc/numDocs contract.

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

COMPACT_SUMMARY_SCHEMA = (
    "bucket long, term_id long, n_blocks long, n_postings long, cf long"
)


def _reencode_rows(
    pdf: pd.DataFrame,
    bnd: np.ndarray,
    enc_avgdls: list[float],
    k1: float,
    b: float,
    tshards: int,
    prefixed_in: bool,
    prefixed_out: bool,
    merge_epochs: bool,
    merged_avgdl: float,
    tomb,
):
    """Decode a slab of block rows, regroup postings per (term, bucket
    [, epoch]), re-encode full blocks. The slab may hold any number of
    (bucket, term) groups but must hold each group's blocks WHOLE — the
    partition-at-once kernel satisfies this trivially, the streaming kernel
    by slicing at group boundaries. Returns (outs, cf) where `outs` is a
    list of (epoch, encoded block frame) and `cf` the per-(bucket, term)
    live Σtf partials the expunge path folds into the rewritten dictionary."""
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
    # expunge: tombstoned docs' postings simply never re-encode (the
    # forceMergeDeletes analog); selection happens here so every gather
    # below — including the occurrence-position one — keeps indexing
    # the ORIGINAL decoded arrays
    live = None if tomb is None else ~np.isin(docs, tomb)
    outs = []
    for e in np.unique(epochs):
        emask = epochs == e
        if live is not None:
            emask &= live
        sel = np.flatnonzero(emask)
        if not sel.size:
            continue
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
        outs.append((int(e), out))
    lsel = np.flatnonzero(live) if live is not None else slice(None)
    cf = (
        pd.DataFrame(
            {"bucket": buckets[lsel], "term_id": terms[lsel], "tf": tfs[lsel]}
        )
        .groupby(["bucket", "term_id"])
        .agg(cf=("tf", "sum"))
        .reset_index()
    )
    return outs, cf


def _summary_frame(allb: pd.DataFrame, cf: pd.DataFrame) -> pd.DataFrame:
    nb = (
        allb.groupby(["bucket", "term_id"])
        .agg(n_blocks=("n", "size"), n_postings=("n", "sum"))
        .reset_index()
    )
    return nb.merge(cf, on=["bucket", "term_id"]).astype(
        {
            "bucket": "int64",
            "term_id": "int64",
            "n_blocks": "int64",
            "n_postings": "int64",
            "cf": "int64",
        }
    )


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
    tomb=None,
):
    """mapInPandas kernel over (bucket, tshard)-keyed partitions of block
    rows: decode every block, regroup postings per (term, bucket[, epoch]),
    re-encode full blocks, write them task-locally into the NEW segment
    tree. Returns per-bucket summary rows (the job's only Spark output).

    Memory contract: the WHOLE partition's decoded postings are resident
    (one numpy lexsort instead of a JVM sort — the build kernel's
    trade-off). When a partition's decoded footprint exceeds the worker
    envelope, `compact_index` switches to `_compact_partition_streaming`,
    which bounds per-task memory by construction."""
    bnd = np.asarray(boundaries, dtype=np.int64)

    def fn(batches):
        pdfs = [p for p in batches if len(p)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        outs, cf = _reencode_rows(
            pdf, bnd, enc_avgdls, k1, b, tshards, prefixed_in,
            prefixed_out, merge_epochs, merged_avgdl, tomb,
        )
        if not outs:
            return
        for e, out in outs:
            _write_segment_files(out, seg_dir, epoch=e)
        allb = pd.concat([o for _, o in outs], ignore_index=True)
        yield _summary_frame(allb, cf)

    return fn


# streaming slab target: complete (bucket, term) groups accumulate to about
# this many postings before one _reencode_rows pass — large enough to keep
# the per-slab numpy/Python overhead negligible, small enough that the
# decode/gather transients (~0.3-0.5 KB/posting peak for positional
# payloads) keep a REUSED worker's RSS high-water mark under ~1 GB: with 32
# concurrent long-lived workers, per-worker watermarks ADD, and a 2M-posting
# slab's ~3 GB watermark × 32 + the JVM sort OOMed the 125 GiB host
# (measured 2026-08-21; a group larger than the target still processes
# whole — the ceiling is one term's postings in one bucket)
_STREAM_SLAB_POSTINGS = 500_000


def _compact_partition_streaming(
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
    tomb=None,
):
    """Streaming variant of `_compact_partition` for partitions whose
    decoded postings exceed the worker envelope (the measured 10M-soak OOM,
    SCALE.md §10M-doc compaction): requires the partition SORTED by
    (bucket, tshard, term_id, first_doc) — the caller adds a
    `sortWithinPartitions`, whose JVM external sort spills compressed block
    rows (~5-7 B/posting) instead of holding decoded tokens. The kernel then
    walks Arrow batches in order, accumulating (bucket, term) groups into
    ~`_STREAM_SLAB_POSTINGS` VALUE-weighted slabs (weight = postings +
    occurrences: positional decode/gather transients scale with Σtf, ~16×
    the posting count on Zipf-head groups at the 10M soak; sorting by
    first_doc also lands each group's epochs contiguously, doc ranges being
    epoch-disjoint), re-encodes slab by slab, and appends the encoded blocks
    to ONE incrementally-written parquet file per (bucket, tshard) cell
    (atomic tmp→rename on cell close; deterministic content, so
    crash-retries rewrite identical files). A group larger than the budget
    sub-chunks at block-row boundaries — each sub-chunk becomes its own
    doc-range block run, legal under the reader's sub-split merge contract
    (blocks of one (term, bucket) are never assumed doc-contiguous; every
    doc stays in exactly one block) at a fill cost of ≤1 short block per
    sub-chunk. Per-task memory is O(slab + one Arrow batch), independent of
    partition size AND of any single term's posting volume."""
    bnd = np.asarray(boundaries, dtype=np.int64)

    def fn(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        from colbert_spark.index.build import _seg_file_schema

        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0

        writer_state = {"w": None, "tmp": None, "final": None}
        summaries: list[pd.DataFrame] = []

        def close_cell():
            if writer_state["w"] is not None:
                writer_state["w"].close()
                os.replace(writer_state["tmp"], writer_state["final"])
                writer_state["w"] = None

        def open_cell(bkt: int, tsh: int, with_pos: bool):
            close_cell()
            d = os.path.join(seg_dir, f"bucket={bkt}", f"tshard={tsh}")
            os.makedirs(d, exist_ok=True)
            writer_state["tmp"] = os.path.join(
                d, f".p{pid:06d}.e0.{os.getpid()}.tmp"
            )
            writer_state["final"] = os.path.join(d, f"p{pid:06d}.e0.parquet")
            writer_state["w"] = pq.ParquetWriter(
                writer_state["tmp"], _seg_file_schema(with_pos)
            )

        cell = None  # current (bucket, tshard)

        def process_slab(slab: pd.DataFrame):
            """Re-encode one slab of complete groups (single cell)."""
            nonlocal cell
            outs, cf = _reencode_rows(
                slab, bnd, enc_avgdls, k1, b, tshards, prefixed_in,
                prefixed_out, merge_epochs, merged_avgdl, tomb,
            )
            if not outs:
                return
            allb = pd.concat([o for _, o in outs], ignore_index=True)
            # one file per cell regardless of epoch: the reader derives a
            # block's epoch from its doc range, never from the filename
            # (filename epoch tags only matter to append's orphan scrub,
            # which targets epochs ≥ the committed count — e0 is safe)
            with_pos = "pos_bytes" in allb.columns
            key = (int(slab["bucket"].iat[0]), int(slab["tshard"].iat[0]))
            if key != cell:
                open_cell(key[0], key[1], with_pos)
                cell = key
            tbl = pa.Table.from_pandas(
                allb.sort_values(["term_id", "first_doc"], kind="stable")
                .drop(columns=["bucket", "tshard", "tf_sum"]),
                preserve_index=False,
            ).cast(_seg_file_schema(with_pos))
            writer_state["w"].write_table(tbl)
            summaries.append(_summary_frame(allb, cf))

        pend: pd.DataFrame | None = None
        slab_parts: list[pd.DataFrame] = []
        slab_n = 0

        def part_weight(part: pd.DataFrame) -> int:
            """Slab budget unit = decoded VALUES, not posting rows: a
            positional Zipf-head slab carries ~Σtf occurrences (measured
            ~16× the posting count on the 10M soak), and the decode/gather
            transients scale with occurrences. pos payload bytes ≈ 1 per
            occurrence, so the byte length is the cheap estimator."""
            w = int(part["n"].sum())
            if "pos_bytes" in part.columns:
                w += int(sum(len(b) for b in part["pos_bytes"]))
            return w

        def flush_slabs():
            nonlocal slab_parts, slab_n
            if slab_parts:
                process_slab(pd.concat(slab_parts, ignore_index=True))
                slab_parts, slab_n = [], 0

        for pdf in batches:
            if not len(pdf):
                continue
            cur = (
                pd.concat([pend, pdf], ignore_index=True)
                if pend is not None
                else pdf
            )
            bk = cur["bucket"].to_numpy(np.int64)
            ts = cur["tshard"].to_numpy(np.int64)
            tm = cur["term_id"].to_numpy(np.int64)
            change = (
                (bk[:-1] != bk[1:]) | (ts[:-1] != ts[1:]) | (tm[:-1] != tm[1:])
            )
            starts = np.concatenate(
                [[0], np.flatnonzero(change) + 1]
            )
            # everything before the LAST group is complete; the last group
            # may continue into the next batch
            cut = int(starts[-1])
            complete, pend = cur.iloc[:cut], cur.iloc[cut:]
            if not len(complete):
                continue
            # slab by cell: groups of different cells never share a slab;
            # WITHIN a cell, append group-by-group so one fat Arrow batch
            # cannot blow the slab budget (a single GROUP may still exceed
            # it — one term's postings in one bucket is the irreducible
            # re-encode unit — but that is the designed ceiling)
            cbk = complete["bucket"].to_numpy(np.int64)
            cts = complete["tshard"].to_numpy(np.int64)
            cell_change = np.concatenate(
                [[0], np.flatnonzero(
                    (cbk[:-1] != cbk[1:]) | (cts[:-1] != cts[1:])
                ) + 1, [len(complete)]]
            )
            for s, e in zip(cell_change[:-1], cell_change[1:]):
                s, e = int(s), int(e)
                if slab_parts and (
                    int(complete["bucket"].iat[s]),
                    int(complete["tshard"].iat[s]),
                ) != (
                    int(slab_parts[0]["bucket"].iat[0]),
                    int(slab_parts[0]["tshard"].iat[0]),
                ):
                    flush_slabs()
                gstarts = starts[(starts >= s) & (starts < e)]
                gbounds = np.append(gstarts, e)
                for gs, ge in zip(gbounds[:-1], gbounds[1:]):
                    grp = complete.iloc[int(gs):int(ge)]
                    w = part_weight(grp)
                    if w > _STREAM_SLAB_POSTINGS and len(grp) > 1:
                        # a HEAD-TERM group can alone dwarf the slab budget
                        # (bucket_size postings × Σtf occurrences — ~18M
                        # units measured at the 10M soak ⇒ ~2 GB of decode/
                        # gather transients). Sub-chunk it at BLOCK-ROW
                        # boundaries: each sub-chunk re-encodes into its own
                        # doc-range block run, which the reader already
                        # merges by first_doc (the build's sub-split
                        # contract — blocks of one (term, bucket) are never
                        # assumed doc-contiguous), and every doc still lives
                        # in exactly one block (fsck invariant). Cost: at
                        # most one short block per sub-chunk of fill.
                        rows_per = max(
                            1, int(len(grp) * _STREAM_SLAB_POSTINGS / w)
                        )
                        for c0 in range(0, len(grp), rows_per):
                            sub = grp.iloc[c0:c0 + rows_per]
                            slab_parts.append(sub)
                            slab_n += part_weight(sub)
                            if slab_n >= _STREAM_SLAB_POSTINGS:
                                flush_slabs()
                        continue
                    slab_parts.append(grp)
                    slab_n += w
                    if slab_n >= _STREAM_SLAB_POSTINGS:
                        flush_slabs()
        if pend is not None and len(pend):
            if slab_parts and (
                int(pend["bucket"].iat[0]),
                int(pend["tshard"].iat[0]),
            ) != (
                int(slab_parts[0]["bucket"].iat[0]),
                int(slab_parts[0]["tshard"].iat[0]),
            ):
                flush_slabs()
            w = part_weight(pend)
            if w > _STREAM_SLAB_POSTINGS and len(pend) > 1:
                rows_per = max(1, int(len(pend) * _STREAM_SLAB_POSTINGS / w))
                for c0 in range(0, len(pend), rows_per):
                    slab_parts.append(pend.iloc[c0:c0 + rows_per])
                    flush_slabs()
            else:
                slab_parts.append(pend)
        flush_slabs()
        close_cell()
        if summaries:
            yield pd.concat(summaries, ignore_index=True)

    return fn


# auto-streaming threshold: estimated per-task DECODED bytes above which
# compact_index switches to the sorted streaming kernel (decoded token
# expansion ≈ 24 B/posting + 24 B/occurrence for positional indexes)
_STREAM_AUTO_BYTES = 512 << 20


def compact_index(
    spark: SparkSession,
    index_dir: str,
    preserve_epochs: bool = True,
    remove_old: bool = True,
    expunge_deletes: bool = False,
    streaming: bool | None = None,
) -> dict:
    """Rewrite the index's segment tree with defragmented full blocks and
    atomically swap it live (see module docstring for epoch semantics and
    the commit protocol). Returns the updated stats dict, including
    `n_blocks_before`/`n_blocks_after`.

    `expunge_deletes=True` (the Lucene forceMergeDeletes analog) physically
    drops every tombstoned doc's postings during the merge and makes the
    index statistically equivalent to a FRESH BUILD over the surviving
    docs: blocks re-encode at the recomputed avgdl, the dictionary rewrites
    with recomputed df/cf (df=0 terms drop; term_ids stay stable), the docs
    sink drops deleted rows, `live_docs` (numDocs) takes over scoring while
    `N` remains the id-space bound (maxDoc — doc_ids are never renumbered,
    renumbering would re-bucket every posting). Implies full epoch merge:
    statistics changed, so historical snapshots can no longer be exact and
    time-travel resets to the post-expunge baseline."""
    stats_path = os.path.join(index_dir, "stats.json")
    with open(stats_path) as f:
        stats = json.load(f)
    if stats.get("segver", 1) < 2:
        raise ValueError("compact_index requires a segver>=2 (idf-free) index")
    tomb = None
    live_stats = None
    if expunge_deletes:
        from pyspark.sql import functions as F

        from colbert_spark.index.delete import load_tombstones

        preserve_epochs = False
        tomb = load_tombstones(spark, index_dir, stats)
        docs_name = stats.get("docs_dir", "docs")
        docs_df = spark.read.parquet(os.path.join(index_dir, docs_name))
        if tomb is not None:
            tomb_df = spark.read.parquet(
                os.path.join(index_dir, stats["tomb_dir"])
            )
            docs_df = docs_df.join(F.broadcast(tomb_df), "doc_id", "left_anti")
        fnames = sorted(stats.get("fields") or {})
        row = docs_df.agg(
            F.count("*").alias("n"),
            F.sum("doclen").alias("cf"),
            *[F.sum(f"len_{fn}").alias(f"cf_{fn}") for fn in fnames],
        ).collect()[0]
        n_live, total_cf_live = int(row["n"]), int(row["cf"] or 0)
        if fnames:
            # fielded index: per-field statistics re-price off the live docs
            # sink (len_<f> columns), exactly like the global avgdl below
            stats["fields"] = {
                fn: {
                    "total_cf": int(row[f"cf_{fn}"] or 0),
                    "avgdl": (int(row[f"cf_{fn}"] or 0) / n_live if n_live else 0.0),
                }
                for fn in fnames
            }
        # exact int/int division — a fresh build over the survivors computes
        # the identical double, so scores match bit-for-bit
        avgdl_live = total_cf_live / n_live if n_live else 1.0
        live_stats = (n_live, total_cf_live, avgdl_live, docs_df, docs_name)
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
    if live_stats is not None:
        merged_avgdl = live_stats[2]  # re-encode at the post-expunge avgdl

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
    if streaming is None:
        # estimated decoded footprint per task: postings expand to ~24 B
        # each (doc/tf/dl int64) plus ~24 B per occurrence for positions.
        # Above the envelope, the in-memory kernel's concat-then-lexsort is
        # the measured OOM at soak scale (SCALE.md §10M-doc compaction) —
        # stream instead: the JVM sort spills COMPRESSED rows, the kernel
        # holds one slab.
        occ = int(stats.get("total_cf", 0))
        n_post_est = n_before * 96  # blocks ≈ n/96 avg fill; conservative
        est = (n_post_est * 24 + (occ * 24 if stats.get("positions") else 0))
        streaming = est / max(p, 1) > _STREAM_AUTO_BYTES
    kernel_factory = (
        _compact_partition_streaming if streaming else _compact_partition
    )
    shuffled = segments.repartition(p, "bucket", "tshard")
    if streaming:
        # the streaming kernel's group-walk contract: cells contiguous,
        # groups contiguous, epochs contiguous within a group (doc ranges
        # are epoch-disjoint, so first_doc order lands them so)
        shuffled = shuffled.sortWithinPartitions(
            "bucket", "tshard", "term_id", "first_doc"
        )
    summaries = shuffled.mapInPandas(
        kernel_factory(
            stats["k1"], stats["b"], tshards, new_dir,
            boundaries, enc_avgdls, prefixed_in, prefixed_out,
            merge_epochs=not preserve_epochs, merged_avgdl=merged_avgdl,
            tomb=tomb,
        ),
        schema=COMPACT_SUMMARY_SCHEMA,
    ).persist()
    totals = summaries.groupBy().sum("n_blocks", "n_postings").collect()[0]
    n_after = int(totals[0] or 0)

    if live_stats is not None:
        from pyspark.sql import functions as F

        n_live, total_cf_live, avgdl_live, docs_df, docs_name = live_stats
        # rewrite the dictionary with the recomputed live df/cf: terms whose
        # every posting was deleted emit no summary row and drop out; the
        # term_id space is untouched (n_terms stays — it is the id bound
        # append_index allocates from, exactly like N for doc_ids)
        ts = summaries.groupBy("term_id").agg(
            F.sum("n_postings").alias("df"), F.sum("cf").alias("cf")
        )
        old_dict = spark.read.parquet(
            os.path.join(index_dir, stats.get("dict_dir", "term_dict"))
        ).drop("df", "cf")
        new_dict_name = f"term_dict_x{gen}"
        from colbert_spark.index.build import write_term_dict, write_term_dict_rev

        write_term_dict(
            old_dict.join(ts, "term_id"),
            os.path.join(index_dir, new_dict_name),
        )
        if stats.get("reverse_dict"):
            write_term_dict_rev(
                spark.read.parquet(os.path.join(index_dir, new_dict_name)),
                os.path.join(index_dir, new_dict_name),
            )
        new_docs_name = f"docs_x{gen}"
        docs_df.write.mode("overwrite").parquet(
            os.path.join(index_dir, new_docs_name)
        )
        stats["dict_dir"] = new_dict_name
        stats["docs_dir"] = new_docs_name
        stats["live_docs"] = n_live
        stats["total_cf"] = total_cf_live
        stats["avgdl"] = avgdl_live
        stats["min_enc_avgdl"] = avgdl_live
        stats["n_deleted"] = 0
        expunged_tomb = stats.pop("tomb_dir", None)
        stats["expunges"] = stats.get("expunges", 0) + 1
    summaries.unpersist()

    # --- commit: repoint epoch snapshots, then the live pointer (atomic)
    stats["seg_dir"] = new_name
    stats["compactions"] = gen
    stats["n_blocks_before"] = n_before
    stats["n_blocks_after"] = n_after
    if not preserve_epochs:
        # a full merge collapses epoch history: epochs reset to 1 and
        # e0.json becomes the merged baseline (== the live view) — the one
        # snapshot that is still exact. This also keeps future compactions'
        # boundary reads (range(epochs)) consistent with the files on disk.
        stats["segver"] = 3  # full merge re-encodes everything tagged
        for k in range(n_epochs):
            old = os.path.join(index_dir, "epoch_stats", f"e{k}.json")
            if os.path.exists(old):
                os.remove(old)
        stats["epochs"] = 1
        es0 = dict(stats)
        tmp = os.path.join(index_dir, "epoch_stats", ".e0.json.tmp")
        with open(tmp, "w") as f:
            json.dump(es0, f)
        os.replace(tmp, os.path.join(index_dir, "epoch_stats", "e0.json"))
    else:
        for k in range(n_epochs):
            es = epoch_stats[k]
            es["seg_dir"] = new_name
            es["compactions"] = gen
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
    if expunge_deletes and expunged_tomb:
        shutil.rmtree(os.path.join(index_dir, expunged_tomb), ignore_errors=True)
    return stats
