"""Bucketed-table co-location for repeated doc-keyed joins (SURVEY.md §4
O12: "partitioning IS sharding"; reference topology: 11 Solr shards,
config_search.py:19-20).

The extraction pipeline's doc-cardinality metadata joins (catalog items,
METS fields — plans/pipeline.py `doc_meta_join`) grow WITH the corpus: at
the reference's ~17M fat catalog records the dim side is far past any
broadcast threshold, so every job either shuffles both sides on doc_id or
reads tables that were CO-LOCATED at write time. This module is the
write-time half: persist fact and dims bucketed on the join key with the
same bucket count, and every subsequent equi-join on that key plans with
ZERO Exchange — the scan itself reports the hash distribution
(`test_bucketing.py` pins the Exchange-free plan).

When to bucket (100 TB guidance):
 - the table is joined on the same key by MANY jobs (catalog enrichment
   re-runs, incremental indexing) — bucketing pays the shuffle once at
   write time and amortizes it across every reader;
 - one-shot joins should NOT bucket — a single shuffle is cheaper than a
   bucketed rewrite of both sides.
Bucket count: match the target parallelism of the heaviest reader (buckets
are the unit of scan parallelism for bucketed reads; too few buckets caps
the join's task count). Spark's native parquet bucketing (saveAsTable) is
the sandbox stand-in for Iceberg's `bucket(N, doc_id)` partition transform
— same co-location contract, engine-native metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a managed parquet table bucketed (and optionally
    sorted) on the join key. Sorting within buckets additionally lets
    sort-merge joins skip their Sort nodes."""
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def cocluster_tables(
    spark: SparkSession,
    frames: dict[str, DataFrame],
    bucket_cols: list[str],
    n_buckets: int,
    database: str | None = None,
) -> dict[str, DataFrame]:
    """Write every frame bucketed on the SAME key/count (co-location needs
    identical bucketing specs on both join sides) and return the table
    handles. `database` optionally namespaces the tables (create it with a
    LOCATION first to control where the files land)."""
    out: dict[str, DataFrame] = {}
    for name, df in frames.items():
        full = f"{database}.{name}" if database else name
        write_bucketed(df, full, bucket_cols, n_buckets)
        out[name] = spark.table(full)
    return out
