"""Streaming index maintenance — the queue-driven incremental indexing
loop the reference runs against Solr (document_retriever_service
consumes doc messages and posts index updates; Solr owns segment
writing and merging, config_search.py:19-20). Owning the index
(operators/postings.py) means owning the update path too; this module
is that path, in the LSM/Lucene shape every production indexer uses:

  * each micro-batch appends ONE bounded segment (build_postings over
    just the batch) plus ONE tombstone set (the batch's doc ids) —
    never a read-modify-write of the whole index, so per-batch cost is
    O(batch), not O(index): the property that keeps a 100 TB index
    ingesting.
  * re-indexed documents are updates-by-tombstone (Lucene's model:
    update = delete + add). A doc's CURRENT version is its newest
    batch; older segments' entries for it are dead at read time.
  * readers resolve merge-on-read (`current_index`): segments union +
    a doc-grain (doc_id, newest-batch) join keeps only live entries —
    exact last-write-wins at any interleaving. A scheduled
    `compact_index` materializes that view through
    postings.merge_postings and resets the read amplification, exactly
    a Lucene background merge.

Exactly-once: the streaming checkpoint owns offsets; each batch writes
only under its own `batch_id=N` directories with mode=overwrite, so a
replay after a crash converges (incremental.incremental_extraction's
idempotency pattern). A partially-written batch directory is never
visible to readers before its own replay rewrites it, because batch
N+1 only starts after batch N commits.

In-batch duplicate doc_ids are the caller's contract (a document is
one row); cross-batch duplicates are the update case handled here.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from index_search_monorepo_spark.operators.postings import (
    DEFAULT_SEGMENT_SIZE,
    build_postings,
    merge_postings,
)

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
    ]
)


def read_docs_stream(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """(doc_id, text) parquet landing-directory stream — the queue
    analog (S6): files arrive, offsets live in the checkpoint."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def incremental_index_update(
    spark: SparkSession,
    input_dir: str,
    index_dir: str,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    max_files_per_trigger: int = 8,
    await_termination: bool = True,
    poll_interval: str | None = None,
) -> StreamingQuery:
    """Drain (availableNow) or poll (processingTime) the landing dir;
    per batch, append `segments/batch_id=N` (the batch's postings) and
    `tombstones/batch_id=N` (the batch's doc ids). O(batch) work per
    batch; readers use current_index / compact_index."""
    out = Path(index_dir)
    stream = read_docs_stream(spark, input_dir, max_files_per_trigger)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        seg = build_postings(batch_df, segment_size=segment_size)
        seg.write.mode("overwrite").parquet(
            str(out / "segments" / f"batch_id={batch_id}")
        )
        batch_df.select("doc_id").distinct().write.mode(
            "overwrite"
        ).parquet(str(out / "tombstones" / f"batch_id={batch_id}"))

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", str(out / "_stream_checkpoint")
    )
    if poll_interval is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=poll_interval)
    q = writer.start()
    if await_termination and poll_interval is None:
        q.awaitTermination()
    return q


def current_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """Merge-on-read view: (term, seg_id, postings) with exact
    last-write-wins semantics. A doc's live version is its newest
    tombstone batch; entries written by older batches are dropped.
    The doc-grain join carries slim (doc_id, batch) rows; only the
    touched index entries explode — this is the read-amplification
    cost compaction exists to reset."""
    out = Path(index_dir)
    segs = spark.read.parquet(str(out / "segments"))
    tombs = spark.read.parquet(str(out / "tombstones"))
    cur = tombs.groupBy("doc_id").agg(
        F.max("batch_id").alias("_cur_batch")
    )
    entries = segs.select(
        "term",
        "seg_id",
        F.col("batch_id").alias("_b"),
        F.explode("postings").alias("_p"),
    ).select(
        "term",
        "seg_id",
        "_b",
        F.col("_p.doc_id").alias("doc_id"),
        F.col("_p.tf").alias("tf"),
    )
    live = (
        entries.join(cur, "doc_id")
        .filter(F.col("_b") == F.col("_cur_batch"))
        .select("term", "seg_id", F.struct("doc_id", "tf").alias("_e"))
    )
    return live.groupBy("term", "seg_id").agg(
        F.array_sort(F.collect_list("_e")).alias("postings")
    )


def compact_index(
    spark: SparkSession,
    index_dir: str,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
) -> str:
    """Materialize the merge-on-read view into `compacted/` (via
    merge_postings so segment assembly goes through the same tested
    path) and return its location. Callers may then clear consumed
    segment/tombstone batches on their own retention schedule — the
    Lucene background-merge split of duties."""
    out = Path(index_dir)
    view = current_index(spark, index_dir)
    merged = merge_postings(view, segment_size=segment_size)
    dst = str(out / "compacted")
    merged.write.mode("overwrite").parquet(dst)
    return dst
