"""Custom stateful streaming operator: crawl-worker liveness monitor.

The reference's crawler workers publish heartbeats to Redis
(``crawler:heartbeat:<id>`` with pages/urls/errors counters,
Crawler/crawler.py:454-493) and a monitor loop sums worker stats and
flags silent workers (crawler.py:625-642). The Structured-Streaming-native
form is an ``applyInPandasWithState`` operator: per-worker GroupState
carrying running totals + last-seen event time, with an event-time
timeout that emits a ``dead`` row when the watermark passes
``last_ts + timeout`` — the standard custom-stateful pattern the engine
exposes for session/liveness tracking over telemetry streams.

Heartbeat schema: (worker_id string, ts timestamp, pages int).
Output: (worker_id, last_ts, n_beats, total_pages, status alive|dead).

Works identically on a batch DataFrame via ``worker_totals_batch`` (the
pytest oracle for the streaming totals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("worker_id", StringType()),
        StructField("last_ts", TimestampType()),
        StructField("n_beats", LongType()),
        StructField("total_pages", LongType()),
        StructField("status", StringType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("n_beats", LongType()),
        StructField("total_pages", LongType()),
        StructField("timeout_ms", IntegerType()),
    ]
)


def _make_monitor(session_tz: str):
    """Kernel factory closing over the session timezone: Arrow hands the
    kernel tz-NAIVE timestamps in the SESSION timezone, so epoch math
    must localize first — treating them as UTC offsets every timeout by
    the zone offset (and a west-of-UTC zone makes setTimeoutTimestamp
    fall below the watermark, killing the stream)."""

    def _monitor(key, pdfs, state: GroupState):
        import pandas as pd

        def to_session_naive(epoch_us: int):
            return (
                pd.Timestamp(epoch_us, unit="us", tz="UTC")
                .tz_convert(session_tz)
                .tz_localize(None)
                .to_pydatetime()
            )

        (worker_id,) = key
        if state.hasTimedOut:
            last_us, n_beats, total, _t = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "worker_id": [worker_id],
                    "last_ts": [to_session_naive(last_us)],
                    "n_beats": [n_beats],
                    "total_pages": [total],
                    "status": ["dead"],
                }
            )
            return

        last_us, n_beats, total = 0, 0, 0
        timeout_ms = 0
        if state.exists:
            last_us, n_beats, total, timeout_ms = state.get
        for pdf in pdfs:
            ts = pdf["ts"]
            if ts.dt.tz is None:
                ts = ts.dt.tz_localize(session_tz)
            ts_us = ts.astype("int64") // 1000  # ns -> us (true epoch)
            last_us = max(last_us, int(ts_us.max()))
            n_beats += len(pdf)
            total += int(pdf["pages"].sum())
            timeout_ms = int(pdf["timeout_ms"].iloc[0])
        state.update((last_us, n_beats, total, timeout_ms))
        # dead once the WATERMARK (not wall clock) passes last_ts +
        # timeout. Clamp ABOVE the current watermark: late heartbeats
        # are not dropped by this operator family, and a timeout set in
        # the past raises and kills the whole stream.
        state.setTimeoutTimestamp(
            max(
                last_us // 1000 + timeout_ms,
                state.getCurrentWatermarkMs() + 1,
            )
        )
        yield pd.DataFrame(
            {
                "worker_id": [worker_id],
                "last_ts": [to_session_naive(last_us)],
                "n_beats": [n_beats],
                "total_pages": [total],
                "status": ["alive"],
            }
        )

    return _monitor


def worker_liveness(
    heartbeats: DataFrame,
    timeout: str = "2 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming per-worker liveness/totals (see module docstring).

    ``heartbeats`` must be a streaming DataFrame with
    (worker_id, ts, pages)."""
    n, unit = timeout.split()
    timeout_ms = int(n) * {
        "second": 1000, "seconds": 1000,
        "minute": 60_000, "minutes": 60_000,
    }[unit]
    session_tz = (
        heartbeats.sparkSession.conf.get(
            "spark.sql.session.timeZone", "UTC"
        )
        or "UTC"
    )
    return (
        heartbeats.withWatermark("ts", watermark)
        .withColumn("timeout_ms", F.lit(timeout_ms))
        .groupBy("worker_id")
        .applyInPandasWithState(
            _make_monitor(session_tz),
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def worker_totals_batch(heartbeats: DataFrame) -> DataFrame:
    """Batch oracle for the streaming totals (status is 'alive' for every
    worker present; timeouts are a streaming-only behavior)."""
    return heartbeats.groupBy("worker_id").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").alias("n_beats"),
        F.sum("pages").cast("long").alias("total_pages"),
    )
