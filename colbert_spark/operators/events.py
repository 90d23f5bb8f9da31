"""Event-stream operators over `events` (batch semantics here; the streaming
module runs the same aggregations incrementally over Structured Streaming).

Timestamps are rendered as strings in both engines — Spark session TZ is
pinned UTC and DuckDB is UTC-naive, so formatted strings are the stable
comparison currency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from colbert_spark.sources.tables import load_table

SESSION_GAP_MIN = 30


def events_hourly_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window counts + value sums per event type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "hour_start"
            ),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("hour_start", "event_type")
    )


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): per-user session count,
    event count, and mean session length — lag + conditional-sum windows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "is_new",
        (
            F.col("prev_ts").isNull()
            | (
                F.unix_micros(F.col("ts").cast("timestamp"))
                - F.unix_micros(F.col("prev_ts").cast("timestamp"))
                > SESSION_GAP_MIN * 60 * 1_000_000
            )
        ).cast("int"),
    )
    return (
        gapped.groupBy("user_id")
        .agg(
            F.sum("is_new").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .withColumn(
            "events_per_session_r",
            F.round(F.col("n_events") / F.col("n_sessions"), 6),
        )
        .orderBy("user_id")
    )


def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user counts by event type (fixed column set)."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .na.fill(0)
        .select(
            "user_id",
            *[F.col(t).cast("long").alias(f"n_{t}") for t in types],
        )
        .orderBy("user_id")
    )


def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON source surface (SURVEY §2.1 S2, the reference's load_json /
    JSONL loaders): parse the `props` JSON column with an explicit schema
    (from_json — JVM-side Jackson, no UDF) and aggregate the extracted field."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn("k", F.from_json("props", "k INT")["k"])
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("long").alias("min_k"),
            F.max("k").cast("long").alias("max_k"),
        )
        .orderBy("event_type")
    )


def events_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-sum window (SURVEY §2.4 A3, the reference's doclens →
    offsets accumulate): per-user running total of `value` in event-time
    order, first 5 users' (user_id < 5) first 20 events for a bounded contract surface."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 5)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("running_r", F.round(F.sum("value").over(w), 6))
        .withColumn("seq", F.row_number().over(wn))
        .filter(F.col("seq") <= 20)
        .select("user_id", F.col("seq").cast("long").alias("seq"), "event_id", "running_r")
        .orderBy("user_id", "seq")
    )


ORACLES = {
    "events_props_json": """
        SELECT event_type,
               count(json_extract(props, '$.k'))::BIGINT AS n_with_k,
               sum(json_extract(props, '$.k')::INT)::BIGINT AS sum_k,
               min(json_extract(props, '$.k')::INT)::BIGINT AS min_k,
               max(json_extract(props, '$.k')::INT)::BIGINT AS max_k
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "events_running_total": """
        WITH seqd AS (
          SELECT user_id, event_id, value,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq,
                 round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_r
          FROM events WHERE user_id < 5)
        SELECT user_id, seq::BIGINT AS seq, event_id, running_r
        FROM seqd WHERE seq <= 20 ORDER BY user_id, seq
    """,
    "events_hourly_agg": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
               event_type, count(*)::BIGINT AS n, round(sum(value), 2) AS total_value
        FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type
    """,
    "events_sessionize": f"""
        WITH gapped AS (
          SELECT user_id, event_id, ts,
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
          FROM events),
        flagged AS (
          SELECT user_id,
                 CASE WHEN prev_ts IS NULL
                        OR epoch_us(ts) - epoch_us(prev_ts) > {SESSION_GAP_MIN * 60 * 1_000_000}
                      THEN 1 ELSE 0 END AS is_new
          FROM gapped)
        SELECT user_id, sum(is_new)::BIGINT AS n_sessions,
               count(*)::BIGINT AS n_events,
               round(count(*) / sum(is_new)::DOUBLE, 6) AS events_per_session_r
        FROM flagged GROUP BY user_id ORDER BY user_id
    """,
    "events_type_pivot": """
        SELECT user_id,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS n_click,
               sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS n_error,
               sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS n_purchase,
               sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS n_signup,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS n_view
        FROM events GROUP BY user_id ORDER BY user_id
    """,
}

QUERIES = {
    "events_hourly_agg": events_hourly_agg,
    "events_sessionize": events_sessionize,
    "events_type_pivot": events_type_pivot,
    "events_props_json": events_props_json,
    "events_running_total": events_running_total,
}
