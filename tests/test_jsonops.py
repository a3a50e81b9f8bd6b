"""Semi-structured JSON tier: extraction/classification parity with
DuckDB, validity contract agreement, drift reporting, plan pins."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from index_search_monorepo_spark.functions import jsonops as J

CASES = [
    (0, '{"a": 1, "b": "x", "c": 2.5, "d": true, "e": null,'
        ' "f": {"g": 1}, "h": [1,2], "s": "1"}'),
    (1, 'not json'),
    (2, '5'),
    (3, '{"a": -3, "b": "yy"}'),
    (4, '[1,2]'),
    (5, '{"a": 1e5, "extra": false}'),
    (6, '{"a": "str", "b": "z"}'),          # a drifts to string here
    (7, '  {"a": 7}  '),                    # surrounding whitespace
]


def _df(spark):
    return spark.createDataFrame(CASES, "rid long, j string")


def _duck():
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, '{s.replace(chr(39), chr(39) * 2)}')" for i, s in CASES
    )
    con.execute(
        f"CREATE VIEW src AS SELECT * FROM (VALUES {vals}) t(rid, j)"
    )
    return con


class TestValidity:
    def test_spark_duckdb_agree(self, spark):
        got = {
            r["rid"]: r["v"]
            for r in _df(spark)
            .select("rid", J.json_valid_expr("j").alias("v"))
            .collect()
        }
        con = _duck()
        want = dict(
            con.execute("SELECT rid, json_valid(j) FROM src").fetchall()
        )
        assert got == want
        assert got[1] is False and got[0] is True and got[2] is True

    def test_stats(self, spark):
        r = J.json_validity_stats(_df(spark), "j").collect()[0]
        assert (r["n_rows"], r["n_valid"], r["n_invalid"]) == (8, 7, 1)


class TestFields:
    def test_typed_extraction(self, spark):
        out = {
            r["rid"]: (r["fa"], r["fb"], r["fc"], r["fd"], r["ff"])
            for r in J.with_json_fields(
                _df(spark),
                "j",
                [
                    ("fa", "$.a", "long"),
                    ("fb", "$.b", "string"),
                    ("fc", "$.c", "double"),
                    ("fd", "$.d", "boolean"),
                    ("ff", "$.f.g", "long"),
                ],
            ).collect()
        }
        assert out[0] == (1, "x", 2.5, True, 1)
        assert out[3] == (-3, "yy", None, None, None)
        assert out[1] == (None, None, None, None, None)   # malformed
        assert out[6][0] is None                          # "str" try_cast
        assert out[7] == (7, None, None, None, None)

    def test_pure_projection_plan(self, spark):
        plan = (
            J.with_json_fields(
                _df(spark), "j", [("fa", "$.a", "long")]
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "EvalPython" not in plan


class TestProfile:
    def test_duckdb_parity(self, spark):
        got = {
            r["key"]: tuple(r[c] for c in
                            ["n_present"] + [f"n_{c}" for c in J.JSON_CLASSES])
            for r in J.json_key_profile(_df(spark), "j").collect()
        }
        con = _duck()
        cols = "n_present, " + ", ".join(f"n_{c}" for c in J.JSON_CLASSES)
        cte = J.json_profile_oracle_sql("src", "j")
        want = {
            row[0]: tuple(row[1:])
            for row in con.execute(
                f"WITH {cte.lstrip()} SELECT key, {cols} FROM jp_tbl"
            ).fetchall()
        }
        assert got == want
        # classes really exercised: a is int 3x, decimal 1x, string 1x
        assert got["a"][0] == 5
        assert got["e"] == (1, 1, 0, 0, 0, 0, 0, 0)
        assert got["f"][5] == 1 and got["h"][6] == 1
        # the quoted-number approximation is shared by both engines
        assert got["s"][2] == 1  # "1" classes as integer

    def test_validity_oracle(self, spark):
        got = J.json_validity_stats(_df(spark), "j").collect()[0]
        con = _duck()
        cte = J.json_profile_oracle_sql("src", "j")
        want = con.execute(
            f"WITH {cte.lstrip()} SELECT n_rows, n_valid, n_invalid"
            " FROM jv_tbl"
        ).fetchall()[0]
        assert (got["n_rows"], got["n_valid"], got["n_invalid"]) == want

    def test_one_exchange(self, spark):
        plan = (
            J.json_key_profile(_df(spark), "j")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        n_ex = plan.count("Exchange hashpartitioning")
        assert n_ex == 1, f"expected 1 exchange, got {n_ex}:\n{plan}"


class TestDrift:
    def test_statuses(self, spark):
        prof = J.json_key_profile(_df(spark), "j")
        rep = {
            r["key"]: r["status"]
            for r in J.json_drift_report(
                prof,
                {"a": "integer", "b": "string", "c": "decimal",
                 "d": "boolean", "e": "null", "f": "object",
                 "h": "array", "s": "string", "gone": "string"},
            ).collect()
        }
        assert rep["a"] == "ok"           # majority int (3 of 5)
        assert rep["b"] == "ok"
        assert rep["gone"] == "missing"
        assert rep["extra"] == "unexpected"
        assert rep["s"] == "type_drift"   # "1" classes integer != string
