"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, decode/feature-extract as Arrow-batched Pandas UDFs.

The container has no image/audio codecs, so the decode step is STUBBED: a
deterministic fake "frame sample" (fixed-stride windows of the payload) stands
in for real frame extraction, behind the same mapInPandas plumbing a real
decoder would use (schema, partitioning, batch shape are the real thing —
swap `_decode_frames` for a PIL/ffmpeg call in production). Real decoding is
gated behind `decode_real()`, which raises NotImplementedError here.

The synthetic payload is `encode(text)` from the `documents` table so both
engines (Spark / DuckDB oracle) derive bit-identical bytes with no external
data. The reference's analog is its opaque-tensor index parts — typed binary
blobs with sidecar metadata (`colbert/indexing/encoder.py:119,141-148`).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from colbert_spark.sources.tables import load_table

MEDIA_TYPES = ("image/png", "audio/wav", "video/mp4")
FRAME_W = 16  # chars per sampled frame window
FRAME_STRIDE = 32
MAX_FRAMES = 4

FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary"


def decode_real(payload: bytes, media_type: str):
    """Real decode hook — intentionally unimplemented in this container.

    In production: PIL.Image.open for image/*, soundfile/librosa for audio/*,
    pyav frame iteration for video/*. The Spark-side plumbing (mapInPandas
    batches of (doc_id, payload) → frame rows) is identical either way.
    """
    raise NotImplementedError(
        f"no codec for {media_type} in this environment; use the deterministic stub"
    )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, media binary, media_type, n_bytes): the opaque
    multimodal column with typed metadata. Payload bytes = UTF-8 of text
    (deterministic fake; schema/partitioning are what matter)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("media"),
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
        ).alias("media_type"),
    )


def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata extraction over the opaque binary column — byte length,
    magic-bytes signature (hex of the first 4 bytes), content checksum. Pure
    JVM expressions: a single scan, no shuffle, survives any scale."""
    docs = load_table(spark, sf_dir, "documents")
    media = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % len(MEDIA_TYPES) + 1).cast("int"),
        ).alias("media_type"),
        F.length(media).cast("long").alias("n_bytes"),
        F.lower(F.hex(F.encode(F.substring("text", 1, 4), "UTF-8"))).alias("magic_hex"),
        F.md5(media).alias("checksum"),
    ).orderBy("doc_id")


def _frame_rows(it):
    """mapInPandas kernel: payload → fixed-stride frame windows (the decode
    stub). Fully vectorized — window slicing and the utf-8 encode are pandas
    str ops; digests/lengths happen JVM-side AFTER the kernel (a real codec
    would emit raw frame buffers exactly like this)."""
    for pdf in it:
        out = []
        text = pdf["text"].fillna("")
        ln = text.str.len()
        for fi in range(MAX_FRAMES):
            off = fi * FRAME_STRIDE
            mask = ln > off
            if not mask.any():
                continue
            w = text[mask].str.slice(off, off + FRAME_W)
            out.append(
                pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"][mask],
                        "frame_idx": fi,
                        "frame": w.str.encode("utf-8"),
                    }
                )
            )
        if out:
            yield pd.concat(out, ignore_index=True)


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over multimodal payloads via mapInPandas — the real
    plumbing (Arrow batches in, frame-buffer rows out; no shuffle until the
    sort) with the decode step stubbed deterministically. Frame length and
    checksum are JVM expressions over the emitted binary column."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    frames = docs.mapInPandas(_frame_rows, FRAME_SCHEMA)
    return frames.select(
        "doc_id",
        "frame_idx",
        F.length("frame").cast("long").alias("frame_bytes"),
        F.md5("frame").alias("frame_md5"),
    ).orderBy("doc_id", "frame_idx")


_TYPE_CASE = (
    "CASE (doc_id % 3) "
    + " ".join(f"WHEN {i} THEN '{t}'" for i, t in enumerate(MEDIA_TYPES))
    + " END"
)

_FRAME_OFFS = ", ".join(str(i * FRAME_STRIDE) for i in range(MAX_FRAMES))

ORACLES = {
    "media_metadata": f"""
        SELECT doc_id,
               {_TYPE_CASE} AS media_type,
               octet_length(encode(text))::BIGINT AS n_bytes,
               lower(hex(encode(substring(text, 1, 4)))) AS magic_hex,
               md5(text) AS checksum
        FROM documents ORDER BY doc_id
    """,
    "media_frame_sample": f"""
        WITH offs AS (SELECT unnest([{_FRAME_OFFS}]) AS off),
        frames AS (
          SELECT d.doc_id, (off / {FRAME_STRIDE})::INT AS frame_idx,
                 substring(d.text, off + 1, {FRAME_W}) AS w
          FROM documents d CROSS JOIN offs
          WHERE len(coalesce(d.text, '')) > off)
        SELECT doc_id, frame_idx,
               octet_length(encode(w))::BIGINT AS frame_bytes,
               md5(w) AS frame_md5
        FROM frames ORDER BY doc_id, frame_idx
    """,
}

QUERIES = {
    "media_metadata": media_metadata,
    "media_frame_sample": media_frame_sample,
}
