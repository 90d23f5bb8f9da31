from colbert_spark.streaming.events_stream import (  # noqa: F401
    ORACLES,
    QUERIES,
    streaming_hourly_agg,
)
