"""Structured Streaming ingest: events stream -> zone assignment ->
watermarked windowed aggregates.

The reference is batch-only (SURVEY.md §2.10) — its "incremental"
mode is manual day-partition INSERT OVERWRITE. This module is the
engine's streaming upgrade of that pattern: the same zone-assignment
expression (operators/zones.assign_zone — pure codegen argmin, no
window functions, so it is streaming-legal) applied to a file stream,
rolled up per event-time window with a watermark for late data.

Scale notes: stateful aggregation keys are (window, zone_id) — tiny
state (|zones| x windows-in-watermark); the watermark bounds state
size, and `maxFilesPerTrigger` paces ingestion on a backlog. Use
``trigger(availableNow=True)`` for catch-up-then-stop batch-ish runs
(that is also what the tests do).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import zones


def read_events_stream(
    spark: SparkSession,
    input_dir: str,
    schema_from: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source stream over a directory of events parquet files.
    ``schema_from``: a static parquet path used only to fix the schema
    (streaming sources require one up front)."""
    schema = spark.read.parquet(schema_from).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def zone_window_counts(
    events: DataFrame,
    towers: DataFrame,
    ts_col: str = "ts",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per (event-time window, zone) counts with late-data watermark.

    ``events`` may be streaming or batch (the plan is identical —
    handy for oracle-checking the streaming query against its batch
    twin on the same files).
    """
    zoned = zones.assign_zone(events, towers).withColumn(
        # parquet TIMESTAMP_NTZ -> TIMESTAMP: watermarks require the
        # instant type; session tz is pinned to UTC (session.py) so
        # the cast is a no-op re-tag.
        ts_col,
        F.col(ts_col).cast("timestamp"),
    )
    return (
        zoned.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            F.col("zone_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "zone_id",
            "n_events",
        )
    )


def run_available_now(
    result: DataFrame, query_name: str, checkpoint_dir: str
) -> None:
    """Drain everything currently available into an in-memory table
    named ``query_name``, then stop (exactly-once via checkpoint)."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
