"""R2 — error sink instead of a dead-letter queue.

The reference rejects a failing document to a RabbitMQ DLQ with an error
envelope (queue_manager.py:68-125; envelope ht_utils.py:59-90:
{service_name, error_message, ht_id, timestamp}); a bad document never fails
the job. Here: rows whose txt spans carry the invalid-UTF-8 simulation marker
(the columnar stand-in for the strict-decode raise, text_processor.py:39-41)
are split off into an `errors` DataFrame with the same envelope columns, and
only clean rows continue down the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from index_search_monorepo_spark.sources.synthetic import INVALID_UTF8_MARKER

SERVICE_NAME = "document_generator"


def _is_poisoned(spans_col: str) -> "F.Column":
    return F.exists(
        F.col(spans_col),
        lambda s: (s["kind"] == F.lit("txt"))
        & s["text"].contains(F.lit(INVALID_UTF8_MARKER)),
    )


def split_errors(
    df: DataFrame, spans_col: str = "spans", now: "F.Column | None" = None
) -> tuple[DataFrame, DataFrame]:
    """Returns (clean, errors). errors carries the reference's error-envelope
    shape (F15): service_name, error_message, ht_id, timestamp — the
    timestamp formatted per ht_utils.py:59-90 (F8). `now` injects a fixed
    timestamp column for deterministic envelopes (driver oracle gate,
    replayable DLQ fixtures); default is wall-clock `current_timestamp()`."""
    poisoned = _is_poisoned(spans_col)
    clean = df.filter(~poisoned)
    errors = df.filter(poisoned).select(
        F.lit(SERVICE_NAME).alias("service_name"),
        F.lit("File encoding incompatible with UTF-8").alias("error_message"),
        F.col("doc_id").alias("ht_id"),
        F.date_format(
            F.current_timestamp() if now is None else now,
            "yyyy-MM-dd HH:mm:ss",
        ).alias("timestamp"),
    )
    return clean, errors
