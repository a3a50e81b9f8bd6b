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

import json
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
    _write_index_meta(out, segment_size)
    stream = read_docs_stream(spark, input_dir, max_files_per_trigger)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        # persist: the postings build and the tombstone distinct are two
        # consumers of the same micro-batch — uncached, each re-reads
        # the source files (guide §5; r6)
        batch_df.persist()
        try:
            seg = build_postings(batch_df, segment_size=segment_size)
            seg.write.mode("overwrite").parquet(
                str(out / "segments" / f"batch_id={batch_id}")
            )
            batch_df.select("doc_id").distinct().write.mode(
                "overwrite"
            ).parquet(str(out / "tombstones" / f"batch_id={batch_id}"))
        finally:
            batch_df.unpersist()

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


def _write_index_meta(out: Path, segment_size: int) -> None:
    """The index records its own segment geometry (as Lucene segments
    carry their metadata): readers must group updated docs by the SAME
    doc_id DIV width rule the segments were built with. One width per
    index — a mismatch raises rather than silently mis-bucketing."""
    meta_p = out / "_index_meta.json"
    if meta_p.exists():
        old = json.loads(meta_p.read_text())
        if old["segment_size"] != segment_size:
            raise ValueError(
                f"index at {out} was built with segment_size="
                f"{old['segment_size']}, got {segment_size}"
            )
        return
    out.mkdir(parents=True, exist_ok=True)
    meta_p.write_text(json.dumps({"segment_size": segment_size}))


def _read_index_meta(out: Path) -> int:
    meta_p = out / "_index_meta.json"
    if not meta_p.exists():
        raise FileNotFoundError(
            f"no _index_meta.json under {out}; build the index with"
            " incremental_index_update"
        )
    return int(json.loads(meta_p.read_text())["segment_size"])


def current_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """Merge-on-read view: (term, seg_id, postings) with exact
    last-write-wins semantics. A doc's live version is its newest
    tombstone batch; entries written by older batches are dropped.

    Plan shape (the read-amplification cost compaction exists to
    reset, kept proportional to UPDATES, not index size): only docs
    tombstoned by MORE than one batch can have dead entries, so the
    tombstone rollup keeps just those, groups them by the segment rule
    recorded in the index meta, and ships one (seg_id, doc->newest
    batch map) row per touched segment; the segments themselves pass
    through a higher-order filter — postings arrays are never exploded
    to doc-grain rows (the pre-r5 version exploded the WHOLE index per
    read). The final (term, seg_id) regroup canonicalizes cross-batch
    rows of the same segment; it shuffles bounded array rows only."""
    out = Path(index_dir)
    segment_size = _read_index_meta(out)
    segs = spark.read.parquet(str(out / "segments"))
    tombs = spark.read.parquet(str(out / "tombstones"))
    upd = (
        tombs.groupBy("doc_id")
        .agg(F.max("batch_id").alias("_cur"), F.count("*").alias("_n"))
        .filter(F.col("_n") > 1)
    )
    dseg = (
        upd.select(
            F.expr(f"doc_id DIV {segment_size}").cast("long").alias("seg_id"),
            F.struct(
                F.col("doc_id").cast("long").alias("k"),
                F.col("_cur").cast("long").alias("v"),
            ).alias("_kv"),
        )
        .groupBy("seg_id")
        .agg(F.map_from_entries(F.collect_list("_kv")).alias("_cur_map"))
    )
    live = (
        # no broadcast hint: AQE broadcasts the (usually tiny) dead-map
        # side but can fall back to shuffle when a compaction backlog
        # makes the update set large (same policy as apply_deletes)
        segs.join(dseg, "seg_id", "left")
        .withColumn(
            "postings",
            F.when(F.col("_cur_map").isNull(), F.col("postings")).otherwise(
                F.filter(
                    F.col("postings"),
                    lambda p: F.coalesce(
                        F.try_element_at(F.col("_cur_map"), p["doc_id"])
                        == F.col("batch_id").cast("long"),
                        F.lit(True),
                    ),
                )
            ),
        )
        .filter(F.size("postings") > 0)
    )
    return live.groupBy("term", "seg_id").agg(
        F.array_sort(F.flatten(F.collect_list("postings"))).alias("postings")
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
