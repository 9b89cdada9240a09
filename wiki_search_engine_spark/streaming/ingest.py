"""Structured Streaming surface: incremental corpus ingest + windowed aggs.

The reference's only incremental component is the crawler loop feeding a
Redis queue with heartbeats (Crawler/crawler.py:417-493) — an ad-hoc
stream of new pages. The Spark-native equivalent:

- ``stream_corpus``: a file-source stream of corpus rows (new parquet
  files appear as the crawler lands pages);
- ``ingest_corpus_incremental``: foreachBatch tokenize -> append token
  deltas partitioned by term bucket; the batch index build then folds
  deltas in (base + delta compaction), giving an incrementally updatable
  index with exactly-once file-source semantics (checkpointed);
- ``events_windowed_counts``: watermarked tumbling-window aggregation for
  late-arriving event data — the standard streaming agg the engine exposes
  for telemetry/event tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.build import _tokenize_with_bucket

CORPUS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def stream_corpus(spark: SparkSession, input_dir: str) -> DataFrame:
    return (
        spark.readStream.format("parquet")
        .schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .load(input_dir)
    )


def ingest_corpus_incremental(
    corpus_stream: DataFrame,
    delta_dir: str,
    checkpoint_dir: str,
    stem: bool = True,
    n_buckets: int = 64,
):
    """Start a stream writing (docid, term, tf, doc_len, bucket) token
    deltas; returns the StreamingQuery. Exactly-once via the file-source
    checkpoint; deltas are idempotently folded by the batch build."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.tokenize import with_docid

        tokens = (
            with_docid(batch_df, "url")
            .select("docid", "text")
            .mapInPandas(
                _tokenize_with_bucket(stem, n_buckets),
                schema=(
                    "docid long, term string, tf int, doc_len int, "
                    "bucket int"
                ),
            )
        )
        tokens.write.mode("append").partitionBy("bucket").parquet(delta_dir)

    return (
        corpus_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def events_windowed_counts(
    events: DataFrame,
    window: str = "1 minute",
    slide: str | None = None,
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts per event_type.

    Works on both a streaming and a batch DataFrame (same plan), so the
    batch form doubles as the correctness oracle for the streaming form.
    """
    w = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(w.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
