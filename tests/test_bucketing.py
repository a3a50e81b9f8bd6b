"""Bucketed co-location (operators/bucketing.py): joins on the bucket key
must plan WITHOUT any Exchange — the write-time shuffle amortizes across
every subsequent reader (the at-scale alternative to broadcasting the
doc-cardinality metadata dims, plans/pipeline.py doc_meta_join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from index_search_monorepo_spark.operators.bucketing import cocluster_tables


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    loc = tmp_path_factory.mktemp("warehouse")
    spark.sql(f"CREATE DATABASE IF NOT EXISTS buckdb LOCATION '{loc}'")
    fact = spark.range(0, 10_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).alias("payload"),
    )
    dim = spark.range(0, 10_000, 2).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("m"), F.col("id")).alias("meta"),
    )
    tables = cocluster_tables(
        spark,
        {"fact_docs": fact, "dim_meta": dim},
        bucket_cols=["doc_id"],
        n_buckets=8,
        database="buckdb",
    )
    yield tables
    spark.sql("DROP DATABASE IF EXISTS buckdb CASCADE")


def _final_plan(df) -> str:
    df.collect()
    return (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )


class _no_broadcast:
    """Simulate the at-scale regime bucketing exists for: a dim too big to
    broadcast (with auto-broadcast on, the planner broadcasts the tiny
    test dim and rightly ignores the bucketing)."""

    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)


def test_bucketed_join_has_no_exchange(spark, bucketed):
    with _no_broadcast(spark):
        joined = bucketed["fact_docs"].join(bucketed["dim_meta"], "doc_id")
        plan = _final_plan(joined)
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 5_000


def test_bucketed_aggregate_has_no_exchange(spark, bucketed):
    # a groupBy on the bucket key also reuses the bucketing distribution
    agg = bucketed["fact_docs"].groupBy("doc_id").agg(F.sum("payload"))
    plan = _final_plan(agg)
    assert "Exchange" not in plan, plan


def test_unbucketed_baseline_does_exchange(spark, bucketed):
    # sanity: the same join against a NON-bucketed side must shuffle —
    # proving the no-Exchange plan above came from bucketing
    plain = spark.range(0, 10_000, 2).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("meta")
    )
    with _no_broadcast(spark):
        plan = _final_plan(bucketed["fact_docs"].join(plain, "doc_id"))
    assert "Exchange" in plan, plan
