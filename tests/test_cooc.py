"""Skip-gram co-occurrence + integer PMI surrogate: hand-exact counts
and scores, deterministic top-pair selection, DuckDB oracle parity on
real text, and the slim-pairs plan shape."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import cooc as CO

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


class TestCounts:
    def test_hand_exact_window2(self, spark):
        df = spark.createDataFrame([(1, "x y x z")], "doc_id long, text string")
        got = {
            (r["a"], r["b"]): r["c_ab"]
            for r in CO.cooccurrence_counts(df, window=2).collect()
        }
        assert got == {
            ("x", "y"): 1,
            ("x", "x"): 1,
            ("y", "x"): 1,
            ("y", "z"): 1,
            ("x", "z"): 1,
        }

    def test_hand_exact_window1_is_bigrams(self, spark):
        df = spark.createDataFrame(
            [(1, "a b a b a")], "doc_id long, text string"
        )
        got = {
            (r["a"], r["b"]): r["c_ab"]
            for r in CO.cooccurrence_counts(df, window=1).collect()
        }
        assert got == {("a", "b"): 2, ("b", "a"): 2}

    def test_pmi_bits_hand_exact(self, spark):
        # N=4, c_x=2, c_y=1, c_z=1; pair (x,y) c_ab=1:
        # bitlen(1)+bitlen(4)-bitlen(2)-bitlen(1) = 1+3-2-1 = 1
        df = spark.createDataFrame([(1, "x y x z")], "doc_id long, text string")
        got = {
            (r["a"], r["b"]): r["pmi_bits"]
            for r in CO.pmi_pair_scores(df, window=1).collect()
        }
        assert got[("x", "y")] == 1
        assert got[("y", "x")] == 1
        assert got[("x", "z")] == 1

    def test_window_validation(self, spark):
        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError):
            CO.cooccurrence_counts(df, window=0)


class TestTopPair:
    def test_tie_break_total_order(self, spark):
        # every pair unique -> equal c_ab; unigram counts differ so
        # pmi differs; force a tie with symmetric text
        df = spark.createDataFrame(
            [(1, "p q"), (2, "q p")], "doc_id long, text string"
        )
        scores = CO.pmi_pair_scores(df, window=1)
        top = {
            r["doc_id"]: (r["cooc_top_a"], r["cooc_top_b"], r["cooc_n_pairs"])
            for r in CO.top_pmi_pair(df, scores, window=1).collect()
        }
        # both docs: single pair each
        assert top[1] == ("p", "q", 1)
        assert top[2] == ("q", "p", 1)

    def test_short_docs_absent(self, spark):
        df = spark.createDataFrame(
            [(1, "solo"), (2, "two tokens")], "doc_id long, text string"
        )
        scores = CO.pmi_pair_scores(df, window=2)
        got = CO.top_pmi_pair(df, scores, window=2).collect()
        assert [r["doc_id"] for r in got] == [2]


class TestOracleParity:
    def test_doc_grain_duckdb_parity(self, spark):
        docs = _docs(spark)
        scores = CO.pmi_pair_scores(docs, window=2)
        got = sorted(
            map(
                tuple,
                CO.top_pmi_pair(docs, scores, window=2).collect(),
            )
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT doc_id, text FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')"
        )
        cte = CO.cooc_oracle_sql("documents", "text", window=2)
        want = sorted(
            con.execute(
                f"WITH {cte.lstrip()} SELECT doc_id, cooc_n_pairs,"
                f" cooc_top_a, cooc_top_b, cooc_top_pmi FROM cooc_doc"
            ).fetchall()
        )
        assert got == want


class TestPlanShape:
    def test_pair_counts_single_slim_shuffle(self, spark):
        plan = (
            CO.cooccurrence_counts(_docs(spark), window=2)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # map-side combine below the exchange; text never shuffles
        assert "HashAggregate" in plan
        n_ex = plan.count("Exchange")
        assert n_ex == 1, f"expected 1 exchange, got {n_ex}"
        for line in plan.splitlines():
            if "Exchange" in line:
                assert "text" not in line, f"text shuffled: {line}"
