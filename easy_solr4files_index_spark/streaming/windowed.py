"""Watermarked tumbling-window aggregation over an event stream.

The training-data-pipeline streaming shape the brief calls out
("watermarks + windowed aggs for late data"): per-(window, event_type)
counts and value sums over an unbounded event source, with late rows
older than the watermark dropped and finalized windows emitted exactly
once (append mode).

Spark-first by construction: ``F.window`` + ``withWatermark`` IS the
built-in streaming windowed aggregate — the state store holds one row
per open (window, event_type), partitioned by group key across
executors, and the SAME plan runs unchanged on a bounded batch (where
``withWatermark`` is a no-op), which is exactly what the DuckDB oracle
replays (epoch-aligned hour buckets == ``time_bucket``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

EVENTS_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                 "event_type string, value double, props string")


def windowed_event_agg(events: DataFrame, window: str = "1 hour",
                       watermark: str = "2 hours") -> DataFrame:
    """(win_start, event_type, n_events, sum_value) — tumbling-window
    counts/sums. Works on both a streaming and a batch ``events``
    DataFrame (same logical plan; watermark only gates state eviction
    and late-row dropping when the source is unbounded)."""
    return (events
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 4).alias("sum_value"))
            .select(F.col("w.start").alias("win_start"), "event_type",
                    "n_events", "sum_value"))


def windowed_event_agg_sql(window_hours: int = 1) -> str:
    """DuckDB twin of the batch run (epoch-aligned tumbling buckets)."""
    return f"""
SELECT time_bucket(INTERVAL {window_hours} HOUR, ts) AS win_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 4) AS sum_value
FROM events
GROUP BY 1, 2
"""


def stream_windowed_agg(spark: SparkSession, source_dir: str, sink_dir: str,
                        checkpoint_dir: str, window: str = "1 hour",
                        watermark: str = "2 hours") -> None:
    """Run the windowed aggregate over the parquet file stream in
    ``source_dir``, appending FINALIZED windows (watermark passed) to
    ``sink_dir``. Append mode means each window row is emitted exactly
    once, after no in-order row can still join it — the exactly-once
    contract downstream sinks want; rows later than the watermark are
    dropped by the state store, never double-counted."""
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(source_dir)
    q = (windowed_event_agg(stream, window=window, watermark=watermark)
         .writeStream.outputMode("append")
         .option("checkpointLocation", checkpoint_dir)
         .trigger(availableNow=True)
         .start(sink_dir))
    q.awaitTermination()
