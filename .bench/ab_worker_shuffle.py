"""Interleaved A/B: worker shuffle partitions cores(2) vs byte-rule(~17)
at the 12k bench corpus, local[2]. One session; shuffle.partitions is a
runtime conf read at planning, so rebuild the plan per run."""
import sys, time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
import bench  # noqa: E402
from index_search_monorepo_spark.session import get_spark  # noqa: E402
from index_search_monorepo_spark.plans.pipeline import (  # noqa: E402
    extract_documents, load_corpus,
)

corpus = bench.ensure_corpus()
total = bench._corpus_bytes(corpus)
byte_parts = max(2, (total * 3) // (128 << 20))
split = max(4 << 20, total // (bench.TASK_WAVES * 2))
spark = get_spark(
    app_name="ab_worker_shuffle", master="local[2]", shuffle_partitions=2,
    extra_conf={
        "spark.sql.files.maxPartitionBytes": str(split),
        "spark.sql.files.openCostInBytes": str(1 << 20),
    },
)
tables = load_corpus(spark, str(corpus))


def build():
    docs, _ = extract_documents(spark, tables, doc_meta_join="shuffle_hash")
    return docs


def timed(parts):
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    df = build()
    t0 = time.time()
    bench._materialize(df)
    return time.time() - t0


# warmup both plan shapes
timed(2), timed(byte_parts)
res = {2: [], byte_parts: []}
for _ in range(4):
    for p in (2, byte_parts):
        res[p].append(timed(p))
for p, ts in res.items():
    print(f"parts={p}: best={min(ts):.2f}s all={[round(t,2) for t in ts]}")
spark.stop()
