"""SparkSession factory with scale-aware defaults.

Defaults are chosen for the 100 TB design point but parameterized so tests run
on local[N]:
 - AQE on (runtime re-plan, skew-join splitting for relational stages)
 - Arrow on, with a small maxRecordsPerBatch because extraction rows are fat
   (multi-MB OCR strings; SURVEY.md §4 physical notes)
 - shuffle partitions sized to cores locally; on a real cluster this is set per
   job from input size / target partition bytes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "index_search_monorepo_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_max_records_per_batch: int = 1024,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # the reference's Solr field names are case-sensitive dict keys
        # (e.g. both 'Vtitle' and 'vtitle' exist, ht_indexer_config.py:29-90)
        .config("spark.sql.caseSensitive", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(arrow_max_records_per_batch),
        )
        # fat string rows: keep broadcast threshold default (10 MB) for
        # dims. Fat-row parquet scans should ALSO cap the vectorized
        # reader's batch (spark.sql.parquet.columnarReaderBatchSize — its
        # on-heap column vectors are invisible to the memory manager);
        # that is per-corpus, so callers set it via extra_conf (bench
        # workers use 16, matching the synthetic corpora's row groups).
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        # keep stdout/stderr free of \r-progress frames: bench.py's artifact
        # protocol is line-oriented JSON and the driver captures raw output
        .config("spark.ui.showConsoleProgress", "false")
        # local-mode perf: the driver JVM is the executor. Throughput-first
        # GC (Parallel) beats G1's low-pause goal for batch string churn at
        # high thread counts; overridable for experiments.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get(
                "SPARK_DRIVER_EXTRA_JAVA_OPTS",
                "-Djava.net.preferIPv6Addresses=false -XX:+UseParallelGC",
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
