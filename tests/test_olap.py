"""Pivot and CUBE surfaces: hand-exact wide/grouping-set semantics and
DuckDB parity via the independent conditional-agg / GROUPING()
formulations."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import olap as OL

SF_DIR = "/root/testdata/sf0.001"
EV = f"{SF_DIR}/events.parquet"
TYPES = ["view", "click", "purchase", "signup", "error"]


def _events(spark):
    return spark.read.parquet(EV)


class TestPivot:
    def test_hand_exact_and_missing_cells(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (1, "a"), (1, "b"), (2, "b")], "k long, v string"
        )
        got = {
            r["k"]: (r["p_a"], r["p_b"], r["p_c"])
            for r in OL.pivot_counts(df, "k", "v", ["a", "b", "c"])
            .collect()
        }
        assert got == {1: (2, 1, 0), 2: (0, 1, 0)}
        with pytest.raises(ValueError):
            OL.pivot_counts(df, "k", "v", [])

    def test_duckdb_parity_real_events(self, spark):
        dow = F.dayofweek("ts").cast("long")
        got = {
            r["pivot_key"]: tuple(r[f"p_{t}"] for t in TYPES)
            for r in OL.pivot_counts(
                _events(spark).withColumn("dow", dow),
                "dow", "event_type", TYPES,
            )
            .withColumnRenamed("dow", "pivot_key")
            .collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{EV}')"
        )
        cte = OL.pivot_oracle_sql(
            "events", "CAST(dayofweek(ts) + 1 AS BIGINT)",
            "event_type", TYPES,
        )
        cols = ", ".join(f"p_{t}" for t in TYPES)
        want = {
            row[0]: tuple(row[1:])
            for row in con.execute(
                f"WITH {cte.lstrip()} SELECT pivot_key, {cols}"
                " FROM pivot_tbl"
            ).fetchall()
        }
        assert got == want and len(got) == 7
        # row sums reconcile with plain counts
        plain = dict(
            _events(spark).groupBy(dow.alias("d")).count().collect()
        )
        for k, cells in got.items():
            assert sum(cells) == plain[k]


class TestCube:
    def test_hand_exact_null_vs_subtotal(self, spark):
        # a REAL NULL key and the rollup row are distinguishable only
        # through grouping_id — the classic cube trap, pinned
        df = spark.createDataFrame(
            [("x", None), ("x", "m"), ("y", "m")], "a string, b string"
        )
        got = {
            (r["a"], r["b"], r["grouping_id"]): r["cnt"]
            for r in OL.cube_counts(df, "a", "b").collect()
        }
        assert got[("x", None, 0)] == 1      # the real NULL cell
        assert got[("x", None, 1)] == 2      # x subtotal over b
        assert got[(None, None, 3)] == 3     # grand total
        assert got[(None, "m", 2)] == 2
        assert len(got) == 8  # 3 base cells + 2 + 2 margins + grand

    def test_duckdb_parity_real_events(self, spark):
        ev = _events(spark).withColumn(
            "halfmonth", (F.dayofmonth("ts") <= 15).cast("string")
        )
        got = {
            (r["event_type"], r["halfmonth"], r["grouping_id"]): r["cnt"]
            for r in OL.cube_counts(ev, "event_type", "halfmonth")
            .collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{EV}')"
        )
        cte = OL.cube_oracle_sql(
            "(SELECT *, CAST(day(ts) <= 15 AS VARCHAR) AS halfmonth"
            " FROM events)",
            "event_type", "halfmonth",
        )
        want = {
            (a, b, g): c
            for a, b, g, c in con.execute(
                f"WITH {cte.lstrip()} SELECT ca, cb, grouping_id, cnt"
                " FROM cube_tbl"
            ).fetchall()
        }
        assert got == want
        assert got[(None, None, 3)] == 1000
        assert len(got) == 5 * 2 + 5 + 2 + 1  # cells + 2 margins + total
