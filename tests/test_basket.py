"""Market-basket association rules: hand-exact metrics, DuckDB parity on
real lineitem baskets, degenerate-basket guard, plan shape."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import basket as BK

SF_DIR = "/root/testdata/sf0.001"
LI = f"{SF_DIR}/lineitem.parquet"


def _toy(spark):
    rows = [
        (1, "bread"), (1, "butter"), (1, "milk"),
        (2, "bread"), (2, "butter"),
        (3, "bread"), (3, "milk"),
        (4, "beer"), (4, "beer"),        # duplicate item collapses
        (5, "bread"),
    ]
    return spark.createDataFrame(rows, "bsk long, itm string")


def _li(spark):
    return spark.read.parquet(LI).select("l_orderkey", "l_partkey")


class TestBasket:
    def test_hand_exact_pairs(self, spark):
        got = {
            (r["item_a"], r["item_b"]): r["c_ab"]
            for r in BK.basket_pair_counts(_toy(spark), "bsk", "itm")
            .collect()
        }
        assert got == {
            ("bread", "butter"): 2,
            ("bread", "milk"): 2,
            ("butter", "milk"): 1,
        }

    def test_hand_exact_rules(self, spark):
        got = {
            (r["antecedent"], r["consequent"]): (
                r["c_pair"], r["c_ante"], r["support_pmille"],
                r["confidence_pmille"], r["lift_pmille"],
            )
            for r in BK.association_rules(
                _toy(spark), "bsk", "itm", min_pair_count=2
            ).collect()
        }
        # n_baskets = 5; bread in 4, butter in 2, milk in 2
        assert got[("bread", "butter")] == (2, 4, 400, 500, 1250)
        assert got[("butter", "bread")] == (2, 2, 400, 1000, 1250)
        assert got[("milk", "bread")] == (2, 2, 400, 1000, 1250)
        assert ("butter", "milk") not in got        # pruned below min
        assert len(got) == 4

    def test_guard_raises(self, spark):
        with pytest.raises(Exception, match="max_basket_items"):
            BK.basket_pair_counts(
                _toy(spark), "bsk", "itm", max_basket_items=2
            ).collect()

    def test_duckdb_parity_real_lineitem(self, spark):
        got = {
            (r["antecedent"], r["consequent"]): (
                r["c_pair"], r["c_ante"], r["support_pmille"],
                r["confidence_pmille"], r["lift_pmille"],
            )
            for r in BK.association_rules(
                _li(spark), "l_orderkey", "l_partkey", min_pair_count=2
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{LI}')"
        )
        cte = BK.basket_oracle_sql(
            "lineitem", "l_orderkey", "l_partkey", min_pair_count=2
        )
        want = {
            (a, c): tuple(rest)
            for a, c, *rest in con.execute(
                f"WITH {cte.lstrip()} SELECT antecedent, consequent,"
                " c_pair, c_ante, support_pmille, confidence_pmille,"
                " lift_pmille FROM rules_tbl"
            ).fetchall()
        }
        assert got == want
        assert len(got) > 10                         # real repeat pairs
        assert any(v[4] > 1000 for v in got.values())  # lift > 1 exists

    def test_no_cartesian(self, spark):
        plan = (
            BK.association_rules(_li(spark), "l_orderkey", "l_partkey")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
