"""Structured Streaming ingestion: incremental extraction of newly-landed
page files, plus watermarked event-time rollups.

The reference has no streaming (SURVEY.md §2.10 — strictly one-shot
batch); its closest analog is re-invoking the pipeline per uploaded file
(/root/reference/streamlit_app.py:174-211). This module is that capability
done Spark-native: a file-source stream over the pages directory runs the
SAME extraction operator (operators/extract.extract_text works unchanged
under readStream — mapInPandas is streaming-compatible), checkpointed so
each file is processed exactly once across restarts — the streaming twin
of the batch pipeline's lineage/anti-join resume.

Trigger availableNow drains everything pending then stops: the
batch-incremental mode a 100 TB ingest actually runs (periodic catch-up
jobs), and the only mode testable without a long-lived cluster.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ..fixtures.pages import PAGES_SCHEMA
from ..operators.extract import extract_text


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """pages files landing in input_dir → extracted parquet, exactly-once.

    Returns the started query; caller awaits termination (availableNow
    stops by itself when the backlog is drained)."""
    reader = (spark.readStream.schema(PAGES_SCHEMA)
              .format("parquet"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    pages = reader.load(input_dir)
    extracted = extract_text(pages)  # no repartition: keep stream narrow
    return (
        extracted.writeStream
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_event_rollup(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> tuple[StreamingQuery, str]:
    """Watermarked tumbling-window rollup over an events file stream —
    update output mode, so the watermark actually evicts window state and
    drops late rows (complete mode would retain all state forever and
    ignore the watermark for dropping) — the streaming form of
    relational.events_hourly_rollup.

    Results land in an in-memory sink table; returns (query, table_name)."""
    events = (
        spark.readStream
        .schema("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")
        .format("parquet").load(input_dir)
    )
    agg = (
        events
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.expr("CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)")
             .alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n_events", "sum_value")
    )
    name = "stream_event_rollup"
    q = (
        agg.writeStream
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    return q, name


def run_incremental(spark: SparkSession, input_dir: str, output_dir: str,
                    checkpoint_dir: str) -> int:
    """Drain the current backlog once (catch-up job shape); returns the
    number of rows now present in the output."""
    q = stream_extract(spark, input_dir, output_dir, checkpoint_dir)
    q.awaitTermination()
    try:
        return spark.read.parquet(output_dir).count()
    except Exception:
        return 0
