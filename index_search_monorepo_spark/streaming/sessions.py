"""Streaming sessionization — the incremental counterparts of
operators/temporal.sessionize/session_stats.

Reference: no counterpart in hathitrust/index_search_monorepo (its
monitoring surface is batch log rollups, `apps/monitoring/`); built per
the brief's streaming bullet ("watermarks + windowed aggs for late
data; applyInPandasWithState for custom stateful operators").

Two operators, two Spark-native mechanisms:

 - `streaming_session_stats`: Spark's OWN session_window aggregation —
   event-time session merging with watermark-driven late-data handling
   and state eviction. Gap semantics MATCH the batch rule exactly:
   session_window merges an event at exactly last_ts + gap (windows
   close inclusively) — the same strictly-greater-splits contract as
   temporal.sessionize; pinned on both sides of the boundary by the
   tests, plus end-to-end parity on real microsecond events.
 - `streaming_sessionize`: per-EVENT session ordinals (the batch
   operator's row-level contract) as a custom stateful operator
   (applyInPandasWithState). State per user is three BIGINTs
   (last_ts_us, session_ord, n_in_session) — constant-size per active
   user no matter the history length, partitioned across executors by
   the state store. Events are processed in (ts, event_id) order WITHIN
   each micro-batch; cross-batch ordering is the source's duty (the
   parity tests feed batches in ts order — the file-source landing
   pattern of this repo's incremental mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

SESSIONIZED_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampNTZType()),
        StructField("event_type", StringType()),
        StructField("session_ord", LongType()),
        StructField("session_event_ord", LongType()),
    ]
)

_SESSION_STATE = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("session_ord", LongType()),
        StructField("n_in_session", LongType()),
    ]
)


def streaming_session_stats(
    stream: DataFrame,
    gap: str = "15 minutes",
    watermark: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user, session_start, session_end, n_events) via the built-in
    session_window: event-time sessions that MERGE out-of-order arrivals
    inside the watermark and evict state once the watermark passes a
    session's close — the mechanism a 100 TB clickstream needs (keyed
    state holds only OPEN sessions, not history). Works on batch frames
    too (the parity test runs it both ways)."""
    # watermarks require TIMESTAMP: pin the parquet NTZ wall clock to a
    # UTC instant (the repo's epoch convention — temporal._us)
    evt = (
        stream.withColumn("_evt", F.to_utc_timestamp(F.col(ts_col), "UTC"))
        if isinstance(stream.schema[ts_col].dataType, TimestampNTZType)
        else stream.withColumn("_evt", F.col(ts_col))
    )
    return (
        evt.withWatermark("_evt", watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col("_evt"), gap).alias("w"),
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            user_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def streaming_sessionize(
    stream: DataFrame, gap_seconds: int
) -> DataFrame:
    """Per-event session ordinals over a stream of (user_id, event_id,
    ts, event_type) rows — emits every input row + (session_ord,
    session_event_ord) in the same micro-batch (append mode; nothing is
    held back, so availableNow drains terminate immediately). Matches
    temporal.sessionize exactly (strictly-greater gap rule, (ts,
    event_id) order) for in-order batch arrival — pinned by
    tests/test_streaming.py."""
    if gap_seconds < 0:
        raise ValueError(f"gap_seconds must be >= 0, got {gap_seconds}")
    gap_us = int(gap_seconds) * 1_000_000

    import pandas as pd

    def annotate(key, pdfs, state):
        if state.hasTimedOut:  # pragma: no cover - NoTimeout configured
            state.remove()
            return
        user_id = key[0]
        if state.exists:
            last_ts_us, session_ord, n_in = state.get
        else:
            last_ts_us, session_ord, n_in = None, 0, 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        rows = rows.sort_values(["ts", "event_id"], kind="mergesort")
        out_ord, out_ev_ord = [], []
        for ts, _eid in zip(rows["ts"], rows["event_id"]):
            ts_us = int(pd.Timestamp(ts).value) // 1_000
            if last_ts_us is None or ts_us - last_ts_us > gap_us:
                session_ord += 1
                n_in = 1
            else:
                n_in += 1
            last_ts_us = ts_us
            out_ord.append(session_ord)
            out_ev_ord.append(n_in)
        state.update((last_ts_us, session_ord, n_in))
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "event_id": rows["event_id"].values,
                "ts": rows["ts"].values,
                "event_type": rows["event_type"].values,
                "session_ord": out_ord,
                "session_event_ord": out_ev_ord,
            }
        )

    return stream.select(
        "user_id", "event_id", "ts", "event_type"
    ).groupBy("user_id").applyInPandasWithState(
        annotate,
        outputStructType=SESSIONIZED_SCHEMA,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf="NoTimeout",
    )
