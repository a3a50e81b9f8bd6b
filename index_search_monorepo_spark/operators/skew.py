"""O13 — explicit skew handling (north rule: salted repartitioning for
oversized many-page volumes).

The reference has none (one doc = one queue message regardless of page count;
SURVEY.md §4 O13); AQE's skew-join splitting cannot split a single fat row of
UDF work, so we place rows deliberately:

 - `salted_repartition` spreads docs uniformly by xxhash64(doc_id, salt_round)
   so co-occurring fat rows do not pile into one partition, and sizes the
   partition count by total span weight rather than row count.
 - the heavy path for 2000-page volumes lives in
   extraction.with_ocr_skew_aware (explode → distribute → reassemble).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_repartition(
    df: DataFrame,
    weight_col: str = "spans",
    target_weight_per_partition: int = 50_000,
    min_partitions: int = 8,
    max_partitions: int = 100_000,
    salt: int = 0,
    skip_if_scan_parallel: bool = False,
) -> DataFrame:
    """Repartition by a salted hash of doc_id with the partition count derived
    from total weight (sum of size(weight_col)), so partitions carry roughly
    equal numbers of *pages*, not documents. The weight scan reads only the
    array offsets (nested-schema pruning: size() never materializes
    spans.text).

    With skip_if_scan_parallel=True the shuffle is elided when the source
    already provides at least spark.sql.shuffle.partitions splits: shuffling
    the full spans payload (every page of text through disk + serialization)
    costs ~25% of extraction wall time at 32 cores, and buys nothing when
    the scan is already balanced (many-file corpus). The shuffle is for
    few-file / skewed-file inputs, not a toll every run pays."""
    spark = df.sparkSession
    if skip_if_scan_parallel:
        try:
            target = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except (TypeError, ValueError):
            target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() >= target:
            return df
    total_weight = df.select(
        F.sum(F.size(F.col(weight_col))).alias("w")
    ).collect()[0]["w"] or 0
    n_parts = max(
        min_partitions, min(max_partitions, int(total_weight / max(target_weight_per_partition, 1)) + 1)
    )
    key = F.xxhash64(F.col("doc_id"), F.lit(salt))
    return df.repartition(n_parts, key)
