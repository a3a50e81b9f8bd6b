"""O13 — explicit skew handling (north rule: salted repartitioning for
oversized many-page volumes).

The reference has none (one doc = one queue message regardless of page count;
SURVEY.md §4 O13); AQE's skew-join splitting cannot split a single fat row of
UDF work, so we place rows deliberately:

 - `salted_repartition` spreads docs uniformly by xxhash64(doc_id, salt_round)
   so co-occurring fat rows do not pile into one partition; the partition
   count comes from scan file metadata (or an explicit parameter) — never
   from a driver-side pre-scan job.
 - the heavy path for 2000-page volumes lives in
   extraction.with_ocr_skew_aware (explode → distribute → reassemble).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Parquet bytes per shuffle partition. Post-decompression row width is
# typically 2-4x the on-disk bytes, so 64 MB on disk keeps a partition of
# span text comfortably inside an executor-core's working memory.
TARGET_BYTES_PER_PARTITION = 64 << 20
_STAT_SAMPLE_FILES = 64


def _estimated_input_bytes(df: DataFrame) -> int | None:
    """Total input size from file METADATA only (no job, no scan). For
    many-file inputs, stats a sample of files and extrapolates — py4j
    round-trips per file are the only cost, so the sample is capped."""
    files = df.inputFiles()
    if not files:
        return None
    sc = df.sparkSession.sparkContext
    jvm = sc._jvm
    hconf = sc._jsc.hadoopConfiguration()
    sample = files[:_STAT_SAMPLE_FILES]
    total = 0
    for f in sample:
        p = jvm.org.apache.hadoop.fs.Path(f)
        fs = p.getFileSystem(hconf)
        total += fs.getFileStatus(p).getLen()
    return int(total * len(files) / len(sample))


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition a few-split source before compute-heavy
    narrow work (pandas UDFs, hash chains). A dimension table written as
    one parquet file scans as ONE split, so everything downstream of it
    runs on one core regardless of cluster size — a serial stage that caps
    N->4N scaling (Amdahl) long before data volume matters. Partition count
    = spark.sql.shuffle.partitions, i.e. sized to the cluster."""
    spark = df.sparkSession
    try:
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)


def salted_repartition(
    df: DataFrame,
    num_partitions: int | None = None,
    target_bytes_per_partition: int = TARGET_BYTES_PER_PARTITION,
    min_partitions: int = 8,
    max_partitions: int = 100_000,
    salt: int = 0,
    skip_if_scan_parallel: bool = False,
) -> DataFrame:
    """Repartition by a salted hash of doc_id so co-occurring fat rows spread
    uniformly across partitions.

    Partition count, in priority order: the explicit `num_partitions`
    parameter; else input file bytes / target_bytes_per_partition (file
    METADATA only — the previous design ran a sum(size(spans)) pre-pass,
    i.e. a full extra scan before the real job; at 100 TB that is a
    100 TB-wide job spent on a partition count); else
    spark.sql.shuffle.partitions.

    With skip_if_scan_parallel=True the shuffle is elided when the source
    already provides at least spark.sql.shuffle.partitions splits: shuffling
    the full spans payload (every page of text through disk + serialization)
    costs ~25% of extraction wall time at 32 cores, and buys nothing when
    the scan is already balanced (many-file corpus). The shuffle is for
    few-file / skewed-file inputs, not a toll every run pays."""
    spark = df.sparkSession
    try:
        default_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        default_parts = spark.sparkContext.defaultParallelism
    if skip_if_scan_parallel:
        if df.rdd.getNumPartitions() >= default_parts:
            return df
    if num_partitions is not None:
        n_parts = num_partitions
    else:
        total_bytes = _estimated_input_bytes(df)
        if total_bytes is None:
            n_parts = default_parts
        else:
            n_parts = int(total_bytes / max(target_bytes_per_partition, 1)) + 1
    n_parts = max(min_partitions, min(max_partitions, n_parts))
    key = F.xxhash64(F.col("doc_id"), F.lit(salt))
    return df.repartition(n_parts, key)
