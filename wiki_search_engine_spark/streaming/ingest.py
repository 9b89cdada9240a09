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


def events_sessionized(
    events: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session windows per event_type: consecutive events closer than
    ``gap`` merge into one session (``F.session_window`` — the native
    Structured Streaming sessionization; state merges windows that an
    arriving event bridges). Works on both a streaming and a batch
    DataFrame with the same plan, so the batch form is the oracle for
    the streaming form — the same dual-form contract as
    events_windowed_counts. Output session_end is LAST EVENT + gap
    (Spark's definition; the DuckDB oracle replays it with a
    lag/cumsum session id). At scale the aggregation is per
    (event_type, session) with map-side partial merge; no global
    ordering is ever required."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.session_window("ts", gap).alias("win"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
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


# entries a complete index snapshot may contain (enrollment move list)
INDEX_ENTRIES = (
    "meta.json", "manifest.json", "postings", "docs", "doc_stats",
    "stats", "term_stats", "positions", "spell", "synonyms.json",
)


def read_index_pointer(index_dir: str) -> str:
    import os

    with open(os.path.join(index_dir, "current")) as f:
        return f.read().strip()


def write_index_pointer(index_dir: str, name: str) -> None:
    """THE commit: write current.tmp, fsync, atomically rename over
    ``current``, then fsync the DIRECTORY. Readers
    (engine.resolve_index_dir) see either the old or the new pointer
    value, never an absent/partial one; both named snapshots exist
    across the flip. The directory fsync makes the rename itself
    crash-DURABLE before any later step (old-snapshot deletion) can
    reach disk — without it, a power loss could persist the cleanup but
    not the flip, leaving ``current`` naming a deleted snapshot."""
    import os

    pointer = os.path.join(index_dir, "current")
    tmp = pointer + ".tmp"
    with open(tmp, "w") as f:
        f.write(name)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, pointer)
    dfd = os.open(index_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def append_snapshot_log(
    index_dir: str, name: str, batch_id: int | None = None
) -> None:
    """Record a committed snapshot in ``snapshots.log`` (one JSON line
    per commit, fsynced append) — the local analogue of an Iceberg
    snapshot/metadata log. Written AFTER the pointer flip, so every
    logged snapshot was really current once; a crash between flip and
    log-append leaves ``current`` naming an unlogged snapshot, which
    readers handle by always unioning the pointer target in
    (list_snapshots)."""
    import json
    import os
    import time

    with open(os.path.join(index_dir, "snapshots.log"), "a") as f:
        f.write(
            json.dumps(
                {"name": name, "batch_id": batch_id, "ts": time.time()}
            )
            + "\n"
        )
        f.flush()
        os.fsync(f.fileno())


def read_snapshot_log(index_dir: str) -> list[dict]:
    """Commit-ordered snapshot records; a torn final line (crash mid
    append) is skipped, not an error."""
    import json
    import os

    path = os.path.join(index_dir, "snapshots.log")
    if not os.path.exists(path):
        return []
    out = []
    with open(path) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except ValueError:
                continue  # torn tail from a crash mid-append
            if isinstance(rec, dict) and "name" in rec:
                out.append(rec)
    return out


def list_snapshots(index_dir: str) -> list[str]:
    """Names of the snapshots a reader may load, oldest first: the
    logged commits still on disk, plus whatever ``current`` points at
    (which may be missing from the log after a flip-then-crash)."""
    import os

    seen: dict[str, None] = {}
    for rec in read_snapshot_log(index_dir):
        name = rec["name"]
        if os.path.isdir(os.path.join(index_dir, name)):
            seen.pop(name, None)  # keep-last commit order on re-commits
            seen[name] = None
    cur = read_index_pointer(index_dir)
    if cur not in seen and os.path.isdir(os.path.join(index_dir, cur)):
        seen[cur] = None
    return list(seen)


def expire_snapshots(index_dir: str, keep_last: int = 1) -> list[str]:
    """Retention GC — the local analogue of Iceberg's expire_snapshots:
    keep the newest ``keep_last`` committed snapshots plus whatever
    ``current`` points at; remove the rest, stale temporaries
    (``*.building``, ``current.tmp``), and any ``v_*`` directory that is
    neither logged nor current (a pre-commit crash leftover). The log is
    then compacted to the surviving records via tmp + atomic rename.
    Returns the removed snapshot names.

    Crash-safe in either interleaving: directories are removed BEFORE
    the log rewrite, and list_snapshots filters records by on-disk
    existence, so a crash between the two steps just leaves dangling
    records that the next expire drops; a crash after the rewrite but
    before a directory unlink leaves an unlogged directory that the
    next expire removes as unreferenced. Single-writer, like the
    maintenance loop that calls it."""
    import os
    import shutil

    snaps = list_snapshots(index_dir)  # oldest first
    cur = read_index_pointer(index_dir)
    keep = set(snaps[-max(int(keep_last), 1):]) | {cur}
    removed = []
    for e in os.listdir(index_dir):
        p = os.path.join(index_dir, e)
        if e == "current.tmp":
            os.remove(p)
        elif e.endswith(".building") and os.path.isdir(p):
            shutil.rmtree(p, ignore_errors=True)
        elif e.startswith("v_") and os.path.isdir(p) and e not in keep:
            shutil.rmtree(p, ignore_errors=True)
            removed.append(e)
    if removed:
        import json

        path = os.path.join(index_dir, "snapshots.log")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            for rec in read_snapshot_log(index_dir):
                if rec["name"] in keep and os.path.isdir(
                    os.path.join(index_dir, rec["name"])
                ):
                    f.write(json.dumps(rec) + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, path)
        dfd = os.open(index_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    return removed


def enroll_index_root(index_dir: str) -> None:
    """One-time in-place migration of a plain index directory into the
    pointer-root layout (entries move into ``v_init``, pointer written).
    Idempotent — every step can resume after a crash: entry moves are
    individually atomic renames, the known-entry loop just continues,
    and the final pointer write is the atomic commit. Unlike steady
    state, enrollment is not concurrent-reader-safe; it happens once at
    upgrade time."""
    import os

    if os.path.isfile(os.path.join(index_dir, "current")):
        return
    snap = os.path.join(index_dir, "v_init")
    building = snap + ".building"
    # refuse to "enroll" something that is not an index at all (a typo'd
    # path would otherwise become an empty-but-valid-looking pointer
    # root whose engine load fails much later with a confusing error);
    # a resumed enrollment has meta.json already inside v_init/building
    if not any(
        os.path.exists(os.path.join(d, "meta.json"))
        for d in (index_dir, snap, building)
    ):
        raise FileNotFoundError(
            f"{index_dir} is not an index (no meta.json at the root or "
            "in a partially-enrolled snapshot) — build it first"
        )
    if not os.path.isdir(snap):
        os.makedirs(building, exist_ok=True)
        for e in INDEX_ENTRIES:
            src = os.path.join(index_dir, e)
            if os.path.exists(src):
                os.rename(src, os.path.join(building, e))
        os.rename(building, snap)
    write_index_pointer(index_dir, "v_init")
    append_snapshot_log(index_dir, "v_init")


def cleanup_index_root(index_dir: str, keep: str) -> None:
    """Drop every snapshot except ``keep`` plus stale temporaries —
    crash leftovers (an unreferenced v_* or *.building from a
    pre-commit crash, a current.tmp from a mid-commit crash) and
    superseded snapshots. Callers pass the name ``current`` points at,
    so the pointer never dangles."""
    import os
    import shutil

    for e in os.listdir(index_dir):
        p = os.path.join(index_dir, e)
        if e == "current.tmp":
            os.remove(p)
        elif e.startswith("v_") and e != keep:
            shutil.rmtree(p, ignore_errors=True)


def maintain_index_incremental(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    work_dir: str,
    stem: bool = True,
    available_now: bool = True,
    retain_snapshots: int = 1,
):
    """Streaming index MAINTENANCE — the crawler-to-index loop closed:
    each micro-batch of landed pages (new urls and re-crawls alike)
    builds its own delta index and folds it into the live index with
    the incremental merge (delta wins per url, untouched posting groups
    pass through; plans/merge.py). Exactly-once comes from the
    file-source checkpoint: a crashed batch re-runs, and the delta
    build, the merge (delta-wins is idempotent), and the commit are all
    safe to repeat.

    COMMIT SCHEME — pointer file, not directory swap: ``index_dir`` is
    a SNAPSHOT ROOT holding versioned snapshot directories ``v_*`` and
    a ``current`` pointer file naming the live one
    (engine.resolve_index_dir follows it; SearchEngine.load on the root
    serves whatever the pointer names). Each micro-batch:

      1. builds the batch's delta index under ``work_dir``;
      2. merges <root>/<current> + delta into <root>/v_<id>.building;
      3. renames it to <root>/v_<id> — a complete snapshot appears;
      4. writes current.tmp and atomically renames it over ``current``
         — THE commit (on object storage this file is the Iceberg-style
         manifest pointer; the rename is the table commit);
      5. appends the commit to ``snapshots.log`` (the snapshot history,
         Iceberg metadata-log analogue) and expires snapshots beyond
         ``retain_snapshots`` plus stale temporaries.

    TIME TRAVEL: with ``retain_snapshots`` > 1, older committed
    snapshots stay on disk and loadable —
    ``SearchEngine.load(spark, root, snapshot="v_00000002")`` serves
    the index as of that commit (a reader pinning a historical version
    while the stream keeps folding), and ``list_snapshots`` /
    ``read_snapshot_log`` enumerate what is travelable. The default of
    1 keeps the old keep-only-current behavior (minimum disk: each
    snapshot is a full index, so retention costs retain × index size —
    at 100 TB keep this small and rely on object-store versioning for
    deep history).

    Readers never see a missing index: the pointer always names a
    complete snapshot and both old and new snapshots exist across the
    flip — there is no instant at which ``index_dir`` is unservable
    (the previous directory-rename scheme had one, recovered by a
    parked-dir dance; a crash-injection pytest now kills between every
    step pair and loads the engine at each point). A plain legacy index
    directory is ENROLLED on stream start: its entries move into
    ``v_init`` and the pointer is written — a one-time idempotent
    migration that resumes if interrupted (enrollment, unlike steady
    state, is not concurrent-reader-safe; it happens once at upgrade).

    The reference's equivalent is "re-run the whole Indexer spark job
    and rewrite every CSV" (Indexer/merge_index_files.py) — here a
    crawl batch costs one delta build over just its pages plus a merge
    that re-encodes only collided (term, docid-range) groups. Returns
    the StreamingQuery (availableNow by default: drain, stop).

    Serving note: a search head re-instantiated after a flip serves the
    new snapshot; a long-lived engine object pins the snapshot it
    resolved (POSIX) until reloaded.
    """
    import os
    import shutil

    from ..engine import SearchEngine
    from ..plans.merge import merge_indexes

    enroll_index_root(index_dir)
    stream = stream_corpus(spark, input_dir)
    meta_engine = SearchEngine.load(spark, index_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        cur_name = read_index_pointer(index_dir)
        expire_snapshots(index_dir, keep_last=retain_snapshots)
        delta_dir = f"{work_dir}/delta_b{batch_id}"
        shutil.rmtree(delta_dir, ignore_errors=True)
        # the delta must match the live snapshot's sidecar config:
        # merge folds positions only when BOTH inputs carry them (a
        # mixed pair refuses), so a positions-enabled root keeps
        # phrase search working across folds
        has_positions = os.path.isdir(
            os.path.join(index_dir, cur_name, "positions")
        )
        SearchEngine.build(
            spark, batch_df, delta_dir, stem=stem,
            n_buckets=meta_engine.n_buckets,
            salt_bits=meta_engine.salt_bits,
            bucket_groups=1,
            analyzer=meta_engine.analyzer,
            positions=has_positions,
        )
        new_name = f"v_{batch_id:08d}"
        while os.path.exists(os.path.join(index_dir, new_name)):
            # the name is taken: either a checkpoint re-run of a batch
            # whose commit already landed (it is ``current``), or — with
            # retain_snapshots > 1 — a RETAINED older snapshot after a
            # checkpoint reset restarted batch ids from 0. Either way
            # the re-merge is idempotent (delta wins twice == once) but
            # os.rename cannot land on an existing directory, so take a
            # fresh name. (Unreferenced leftovers can't pin names: the
            # batch-start expire removed anything unlogged+non-current.)
            new_name += "r"
        building = os.path.join(index_dir, new_name + ".building")
        shutil.rmtree(building, ignore_errors=True)
        merge_indexes(
            spark, os.path.join(index_dir, cur_name), delta_dir, building
        )
        # the spell layout is derived from the lexicon, so a root that
        # had one gets a FRESH one per fold (new vocab correctable),
        # built into the snapshot BEFORE the pointer flip so readers
        # always see a complete snapshot
        if os.path.isdir(os.path.join(index_dir, cur_name, "spell")):
            import json as _json

            from ..operators.fuzzy import spellindex_write

            with open(
                os.path.join(
                    index_dir, cur_name, "spell", "_spell_meta.json"
                )
            ) as f:
                max_dist = int(_json.load(f)["max_dist"])
            spellindex_write(
                spark.read.parquet(os.path.join(building, "term_stats")),
                os.path.join(building, "spell"),
                max_dist=max_dist,
            )
        os.rename(building, os.path.join(index_dir, new_name))
        write_index_pointer(index_dir, new_name)
        append_snapshot_log(index_dir, new_name, batch_id=batch_id)
        expire_snapshots(index_dir, keep_last=retain_snapshots)
        shutil.rmtree(delta_dir, ignore_errors=True)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
