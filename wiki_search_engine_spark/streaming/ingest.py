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
    """Start a stream writing (docid, term, tf, doc_len, bucket, batch)
    token deltas; returns the StreamingQuery. Exactly-once: each batch
    writes ONLY its own ``batch=<id>`` partition directories with
    dynamic overwrite, so foreachBatch's at-least-once re-run of an
    uncommitted batch REPLACES its own rows instead of appending
    duplicates (a bare append would double-count df/tf for every
    re-delivered batch)."""

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
            .withColumn("batch", F.lit(int(batch_id)))
        )
        (
            tokens.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch", "bucket")
            .parquet(delta_dir)
        )

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


def maintain_index_incremental(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    work_dir: str,
    stem: bool = True,
    available_now: bool = True,
):
    """Streaming index MAINTENANCE — the crawler-to-index loop closed:
    each micro-batch of landed pages (new urls and re-crawls alike)
    builds its own delta index and folds it into ``index_dir`` with the
    incremental merge (delta wins per url, untouched posting groups pass
    through; plans/merge.py), then the merged index replaces
    ``index_dir`` atomically via directory rename. Exactly-once comes
    from the file-source checkpoint: a crashed batch re-runs, and both
    the delta build and the merge are idempotent overwrites of
    batch-scoped directories.

    The reference's equivalent is "re-run the whole Indexer spark job
    and rewrite every CSV" (Indexer/merge_index_files.py) — here a crawl
    batch costs one delta build over just its pages plus a merge that
    re-encodes only collided (term, docid-range) groups.

    On object storage the rename becomes a pointer flip (e.g. an
    Iceberg snapshot commit or a manifest of the current index path);
    the local form keeps the same swap discipline. Returns the
    StreamingQuery (availableNow by default: drain what exists, stop).

    Serving note: SearchEngine.load caches nothing but stats/meta, so a
    search head re-instantiated after a swap serves the new index; a
    long-lived engine object keeps serving the renamed-away snapshot
    it opened (POSIX) until reloaded.
    """
    import os
    import shutil

    from ..engine import SearchEngine
    from ..plans.merge import merge_indexes

    def recover_swap() -> None:
        """Roll back a crash between the two swap renames: index_dir
        missing means the live index is parked at old_b*. Restoring it
        is always correct — the checkpoint re-runs the interrupted
        batch, which rebuilds the delta and re-merges. Runs BEFORE
        anything reads index_dir (a crashed previous session must not
        fail at stream setup)."""
        if os.path.isdir(index_dir):
            return
        parked = [
            e for e in os.listdir(work_dir) if e.startswith("old_b")
        ] if os.path.isdir(work_dir) else []
        if len(parked) != 1:
            raise RuntimeError(
                f"{index_dir} missing and no unique parked index "
                f"in {work_dir} ({parked}) — manual recovery needed"
            )
        os.rename(os.path.join(work_dir, parked[0]), index_dir)

    recover_swap()
    stream = stream_corpus(spark, input_dir)
    meta_engine = SearchEngine.load(spark, index_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        recover_swap()
        # a crash AFTER the swap but before cleanup leaves a stale
        # old_b* next to a healthy index_dir — garbage now (would both
        # ENOTEMPTY the rename below and confuse the next recovery)
        if os.path.isdir(work_dir):
            for e in os.listdir(work_dir):
                if e.startswith("old_b"):
                    shutil.rmtree(
                        os.path.join(work_dir, e), ignore_errors=True
                    )
        delta_dir = f"{work_dir}/delta_b{batch_id}"
        merged_dir = f"{work_dir}/merged_b{batch_id}"
        shutil.rmtree(delta_dir, ignore_errors=True)
        shutil.rmtree(merged_dir, ignore_errors=True)
        SearchEngine.build(
            spark, batch_df, delta_dir, stem=stem,
            n_buckets=meta_engine.n_buckets,
            salt_bits=meta_engine.salt_bits,
            bucket_groups=1,
            analyzer=meta_engine.analyzer,
        )
        merge_indexes(spark, index_dir, delta_dir, merged_dir)
        old = f"{work_dir}/old_b{batch_id}"
        os.rename(index_dir, old)
        os.rename(merged_dir, index_dir)
        shutil.rmtree(old, ignore_errors=True)
        shutil.rmtree(delta_dir, ignore_errors=True)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
