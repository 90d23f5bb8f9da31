"""Structured Streaming path: the batch `events_hourly_agg` semantics run
incrementally (`readStream` file source → watermarked tumbling window →
memory sink), proving the engine's operators compose under streaming
execution. The reference has no streaming (its server loop,
``colbert/training/dense_server_client.py:51-66``, is request/response) —
this is the Spark-native extension a continuously-crawled web corpus needs:
the same hourly rollup keeps running as new WARC drops land in the table.

The file source replays the parquet table as a bounded stream
(`Trigger.AvailableNow` — process everything available, then stop), which is
exactly how a backfill over historic crawl data runs on a real cluster; for
an unbounded feed the same query keeps running with the 1-hour watermark
bounding state.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def streaming_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental tumbling-window rollup, run to completion over the bounded
    stream and returned as a batch DataFrame (bit-compatible with the batch
    `events_hourly_agg` / its SQL oracle).

    Watermark bounds state for the unbounded case; complete output mode
    against the memory sink gives the full final table for the bounded one.
    """
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")  # file source wants a dir
        .parquet(sf_dir)
        .withWatermark("ts", "1 hour")
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    sink = f"stream_hourly_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).orderBy("hour_start", "event_type")


def streaming_hourly_closed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbounded-safe variant: watermarked tumbling window in APPEND mode to
    a durable parquet sink (+ checkpoint dir) — the configuration that holds
    on a real continuous feed. In append mode a window row is emitted exactly
    once, when the watermark (max event time − 1h) passes the window end, and
    its state is then dropped; the driver holds nothing (the complete-mode
    `streaming_hourly_agg` is the bounded-backfill demo — its memory sink
    pins the whole result on the driver and its watermark is a no-op).

    Over the bounded replay the emitted set is exactly the CLOSED windows:
    window_end ≤ max(ts) − 1h (the final no-data microbatch advances the
    watermark once all files are processed); the oracle encodes the same
    predicate. Results are read back from the parquet sink — durable,
    resumable via the checkpoint, and schema-stable even when empty.
    """
    import tempfile

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withWatermark("ts", "1 hour")
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    work = tempfile.mkdtemp(prefix="stream_closed_")
    out_dir = f"{work}/out"
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", f"{work}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.read.schema(
        "hour_start string, event_type string, n long, total_value double"
    ).parquet(out_dir)
    return out.orderBy("hour_start", "event_type")


def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact-dedup RESOLUTION over a document feed: groupBy
    content-hash (md5 of text — the `dedup_exact` fingerprint) keeping the
    min-id canonical and a copy count, run to completion over the bounded
    replay (bit-compatible with the batch SQL oracle). This is the
    training-pipeline shape where documents arrive continuously and the
    dedup table must stay current without re-reading the corpus.

    State contract: one row per DISTINCT hash — the same cardinality any
    batch dedup must hold, sharded across executors by the groupBy. The
    bounded demo uses complete-mode/memory (deterministic: min/count are
    order-insensitive); an unbounded deployment emits first-seen rows with
    `dropDuplicates(["content_hash"])` + a watermark on arrival time so
    state ages out, and the canonical-min answer then comes from the
    downstream table (exactly the `index_stream.py` committed-url
    anti-join pattern)."""
    docs_schema = (
        "doc_id long, text string, lang string, source string, n_chars long"
    )
    stream = (
        spark.readStream.schema(docs_schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    agg = stream.groupBy(
        F.md5(F.col("text").cast("binary")).alias("content_hash")
    ).agg(
        F.min("doc_id").alias("canonical_doc"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    sink = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink).orderBy("content_hash")


ORACLES = {
    "streaming_dedup": """
        SELECT md5(text) AS content_hash,
               min(doc_id)::BIGINT AS canonical_doc,
               count(*)::BIGINT AS n_copies
        FROM documents GROUP BY 1 ORDER BY content_hash
    """,
    "streaming_hourly_closed": """
        WITH mx AS (SELECT max(ts) AS m FROM events)
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
               event_type, count(*)::BIGINT AS n,
               round(sum(value), 2) AS total_value
        FROM events, mx
        GROUP BY date_trunc('hour', ts), event_type, mx.m
        HAVING date_trunc('hour', ts) + INTERVAL 1 HOUR <= mx.m - INTERVAL 1 HOUR
        ORDER BY hour_start, event_type
    """,
    "streaming_hourly_agg": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
               event_type, count(*)::BIGINT AS n,
               round(sum(value), 2) AS total_value
        FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type
    """,
}

QUERIES = {
    "streaming_hourly_agg": streaming_hourly_agg,
    "streaming_hourly_closed": streaming_hourly_closed,
    "streaming_dedup": streaming_dedup,
}
