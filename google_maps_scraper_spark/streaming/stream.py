"""Structured Streaming variants.

The reference is a continuous pull loop (postgres/provider.go:174-243 polls
forever with backoff; results stream through channel-fed writers).  The BFS
crawl itself is a driver-coordinated fixpoint — batch rounds are the right
Spark shape for it (SURVEY.md §7) — but the *ingestion* side maps cleanly to
Structured Streaming: newly landed page snapshots are extracted exactly-once
with checkpointed source offsets, the streaming analog of the reference's
resumable DB frontier.

  * ``stream_extract_places`` — ``readStream`` over a growing parquet pages
    directory → place extraction (same dispatch parse core) → ``writeStream``
    parquet sink with checkpoint.  ``Trigger.AvailableNow`` drains what is
    present and stops (test/batch-catchup mode); omit for continuous.
  * ``stream_windowed_events`` — watermarked sliding-window aggregation over
    an event stream (late-data handling the reference lacks entirely; the
    engine-side analog of per-host fetch-rate accounting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import PAGES_SCHEMA

__all__ = ["stream_extract_places", "stream_windowed_events"]


def stream_extract_places(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    now_micros: int = 1786838400000000,
):
    """Continuously extract place entries from pages landing in
    ``pages_dir``.  Exactly-once per file via the streaming checkpoint —
    kill and restart resumes at the recorded offsets (the streaming
    equivalent of the batch engine's round manifests)."""
    from ..operators.extractors import entry_extract_udf

    pages = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(pages_dir)
    )
    entries = (
        pages.filter(F.col("url").contains("/maps/place/"))
        .withColumn(
            "e",
            entry_extract_udf(
                "html", F.lit(""), "url", F.lit(now_micros).cast("long")
            ),
        )
        .filter(F.col("e.error").isNull() & F.col("e.valid"))
        .select(
            "url",
            F.col("e.title").alias("title"),
            F.col("e.category").alias("category"),
            F.col("e.latitude").alias("latitude"),
            F.col("e.longitude").alias("longitude"),
            F.col("e.review_count").alias("review_count"),
            F.col("e.canonical_json").alias("canonical_json"),
        )
    )
    writer = (
        entries.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_events(
    spark: SparkSession,
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "30 minutes",
):
    """Watermarked windowed counts/sums per event_type over a stream.

    ``events`` must be a streaming DataFrame with ``ts/event_type/value``.
    Late rows beyond the watermark are dropped (state is bounded — the
    requirement for unbounded 100 TB streams)."""
    # watermarks need TIMESTAMP (tz-aware); parquet NTZ columns are cast
    events = events.withColumn("ts", F.col("ts").cast("timestamp"))
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", window, slide or window).alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type", "n_events", "total_value",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
