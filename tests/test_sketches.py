"""HyperLogLog sketch: register exactness vs the Python mirror, DuckDB
oracle parity, mergeability, estimate accuracy vs true distincts, and
the map-side-combine plan shape (keys never shuffle)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import sketches as SK

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


class TestRegisters:
    def test_matches_python_mirror(self, spark):
        vals = [f"k{i}" for i in range(500)]
        df = spark.createDataFrame([(v,) for v in vals], "k string")
        got = {
            r["bucket"]: r["r"]
            for r in SK.hll_sketch(df, "k", p=6).collect()
        }
        assert got == SK.hll_sketch_py(vals, p=6)

    def test_duckdb_oracle_parity(self, spark):
        docs = _docs(spark)
        got = sorted(
            map(tuple, SK.hll_sketch(docs, "doc_id", p=6).collect())
        )
        cte = SK.hll_oracle_sql("documents", "doc_id", p=6)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT doc_id FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')"
        )
        want = sorted(
            con.execute(
                f"WITH {cte.lstrip()} SELECT bucket, r FROM hll_out"
            ).fetchall()
        )
        assert got == want

    def test_duplicates_do_not_move_registers(self, spark):
        a = spark.createDataFrame(
            [(f"k{i}",) for i in range(100)], "k string"
        )
        b = spark.createDataFrame(
            [(f"k{i % 100}",) for i in range(1000)], "k string"
        )
        ra = sorted(map(tuple, SK.hll_sketch(a, "k", p=5).collect()))
        rb = sorted(map(tuple, SK.hll_sketch(b, "k", p=5).collect()))
        assert ra == rb

    def test_p_bounds(self, spark):
        df = spark.createDataFrame([("x",)], "k string")
        with pytest.raises(ValueError):
            SK.hll_sketch(df, "k", p=1)


class TestMergeAndEstimate:
    def test_merge_equals_sketch_of_union(self, spark):
        a = spark.createDataFrame(
            [(f"a{i}",) for i in range(300)], "k string"
        )
        b = spark.createDataFrame(
            [(f"b{i}",) for i in range(300)], "k string"
        )
        merged = sorted(
            map(
                tuple,
                SK.hll_merge(
                    SK.hll_sketch(a, "k", p=6), SK.hll_sketch(b, "k", p=6)
                ).collect(),
            )
        )
        whole = sorted(
            map(
                tuple,
                SK.hll_sketch(a.unionByName(b), "k", p=6).collect(),
            )
        )
        assert merged == whole

    def test_estimate_accuracy(self, spark):
        # standard error ~ 1.04/sqrt(m); at p=10, m=1024 -> ~3.3%.
        # allow 4 sigma on a single draw
        n = 20000
        df = spark.createDataFrame(
            [(f"key-{i}",) for i in range(n)], "k string"
        )
        est = SK.hll_estimate(SK.hll_sketch(df, "k", p=10), p=10)
        assert abs(est - n) / n < 4 * 1.04 / (2**10) ** 0.5

    def test_estimate_small_range_linear_counting(self):
        # tiny cardinality -> linear-counting branch, near-exact
        regs = SK.hll_sketch_py([f"v{i}" for i in range(30)], p=10)
        est = SK._estimate_py(regs, p=10)
        assert abs(est - 30) < 3

    def test_map_side_combine_keys_never_shuffle(self, spark):
        docs = _docs(spark)
        plan = (
            SK.hll_sketch(docs, "text", p=12)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # partial aggregate below the exchange; the raw key column must
        # not survive into the shuffle
        assert "HashAggregate" in plan
        for line in plan.splitlines():
            if "Exchange" in line and "text" in line:
                raise AssertionError(f"raw keys shuffled: {line}")
