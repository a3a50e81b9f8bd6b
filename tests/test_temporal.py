"""Temporal operators: gap sessionization and the union-tag as-of join —
hand-exact semantics, DuckDB parity on real events, plan pins (one
exchange each; no range join anywhere)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import temporal as TMP

SF_DIR = "/root/testdata/sf0.001"
EV = f"{SF_DIR}/events.parquet"


def _ts(s: str):
    return dt.datetime.fromisoformat(s)


def _toy_events(spark):
    rows = [
        # user 1: two sessions split by a 31-min gap (gap=1800 s)
        (10, _ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        (11, _ts("2024-01-01 10:10:00"), 1, "click", 1.0),
        (12, _ts("2024-01-01 10:41:00"), 1, "purchase", 5.0),
        # user 2: single event
        (20, _ts("2024-01-01 09:00:00"), 2, "view", 1.0),
        # user 3: exact-gap boundary (1800 s is NOT a new session)
        (30, _ts("2024-01-01 08:00:00"), 3, "view", 1.0),
        (31, _ts("2024-01-01 08:30:00"), 3, "click", 1.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )


def _events(spark):
    return spark.read.parquet(EV).select(
        "event_id", "ts", "user_id", "event_type"
    )


class TestSessionize:
    def test_hand_exact(self, spark):
        got = {
            r["event_id"]: (r["session_ord"], r["session_event_ord"])
            for r in TMP.sessionize(_toy_events(spark), 1800).collect()
        }
        assert got == {
            10: (1, 1),
            11: (1, 2),
            12: (2, 1),  # 31 min > 30 min gap -> new session
            20: (1, 1),
            30: (1, 1),
            31: (1, 2),  # exactly 1800 s is NOT a new session
        }

    def test_session_stats(self, spark):
        got = {
            (r["user_id"], r["session_ord"]): (
                r["n_events"],
                r["duration_us"],
            )
            for r in TMP.session_stats(_toy_events(spark), 1800).collect()
        }
        assert got == {
            (1, 1): (2, 600_000_000),
            (1, 2): (1, 0),
            (2, 1): (1, 0),
            (3, 1): (2, 1_800_000_000),
        }

    def test_negative_gap_raises(self, spark):
        with pytest.raises(ValueError):
            TMP.sessionize(_toy_events(spark), -1)

    def test_duckdb_parity(self, spark):
        got = sorted(
            (r["event_id"], r["session_ord"], r["session_event_ord"])
            for r in TMP.sessionize(_events(spark), 900).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT event_id, ts, user_id, "
            f"event_type FROM read_parquet('{EV}')"
        )
        cte = TMP.sessionize_oracle_sql("events", 900)
        want = sorted(
            con.execute(
                f"WITH {cte.lstrip()} SELECT event_id, session_ord, "
                "session_event_ord FROM sess_tbl"
            ).fetchall()
        )
        assert got == want
        assert max(r[1] for r in got) > 1  # real gaps exist at 15 min

    def test_one_exchange(self, spark):
        plan = (
            TMP.sessionize(_events(spark), 900)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        n_ex = plan.count("Exchange hashpartitioning")
        assert n_ex == 1, f"expected 1 exchange, got {n_ex}:\n{plan}"


class TestAsofJoin:
    def _toy_lr(self, spark):
        ev = _toy_events(spark)
        left = ev.filter(F.col("event_type") == "purchase")
        right = ev.filter(F.col("event_type") == "click")
        return left, right

    def test_hand_exact(self, spark):
        left, right = self._toy_lr(spark)
        got = {
            r["event_id"]: (r["event_id_asof"], r["ts_asof"])
            for r in TMP.asof_join(
                left,
                right,
                ["user_id"],
                "ts",
                right_cols=["event_id"],
                tie_col="event_id",
            ).collect()
        }
        # purchase 12 (user 1, 10:41) matches click 11 (10:10)
        us_1010 = int(
            _ts("2024-01-01 10:10:00")
            .replace(tzinfo=dt.timezone.utc)
            .timestamp()
            * 1_000_000
        )
        assert got == {12: (11, us_1010)}

    def test_exact_ts_and_ties(self, spark):
        rows_l = [(100, _ts("2024-01-01 10:00:00"), 1)]
        rows_r = [
            (50, _ts("2024-01-01 10:00:00"), 1),  # equal ts
            (51, _ts("2024-01-01 10:00:00"), 1),  # equal ts tie
            (40, _ts("2024-01-01 09:00:00"), 1),
        ]
        sch = "event_id long, ts timestamp, user_id long"
        left = spark.createDataFrame(rows_l, sch)
        right = spark.createDataFrame(rows_r, sch)
        inc = TMP.asof_join(
            left, right, ["user_id"], "ts",
            right_cols=["event_id"], tie_col="event_id",
        ).collect()[0]
        assert inc["event_id_asof"] == 51  # max tie at the matched ts
        strict = TMP.asof_join(
            left, right, ["user_id"], "ts",
            right_cols=["event_id"], tie_col="event_id",
            allow_exact=False,
        ).collect()[0]
        assert strict["event_id_asof"] == 40  # equal ts excluded

    def test_unmatched_is_null(self, spark):
        left, right = self._toy_lr(spark)
        out = TMP.asof_join(
            left,
            right.filter(F.col("user_id") != 1),
            ["user_id"],
            "ts",
            right_cols=["event_id"],
            tie_col="event_id",
        ).collect()
        assert [(r["event_id_asof"], r["ts_asof"]) for r in out] == [
            (None, None)
        ]

    def test_duckdb_parity(self, spark):
        ev = _events(spark)
        left = ev.filter(F.col("event_type") == "purchase")
        right = ev.filter(F.col("event_type") == "click")
        got = sorted(
            (r["event_id"], r["event_id_asof"], r["ts_asof"])
            for r in TMP.asof_join(
                left, right, ["user_id"], "ts",
                right_cols=["event_id"], tie_col="event_id",
            ).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT event_id, ts, user_id, "
            f"event_type FROM read_parquet('{EV}')"
        )
        cte = TMP.asof_oracle_sql(
            "(SELECT * FROM events WHERE event_type = 'purchase')",
            "(SELECT * FROM events WHERE event_type = 'click')",
            "user_id",
        )
        want = sorted(
            con.execute(
                f"WITH {cte.lstrip()} SELECT event_id, tie_asof, ts_asof "
                "FROM asof_tbl"
            ).fetchall()
        )
        assert got == want
        assert any(r[1] is not None for r in got)

    def test_empty_keys_raise(self, spark):
        left, right = self._toy_lr(spark)
        with pytest.raises(ValueError):
            TMP.asof_join(left, right, [], "ts", right_cols=["event_id"])
        with pytest.raises(ValueError):
            TMP.asof_join(
                left, right, ["user_id"], "ts", right_cols=["ts"]
            )

    def test_one_exchange_no_range_join(self, spark):
        ev = _events(spark)
        left = ev.filter(F.col("event_type") == "purchase")
        right = ev.filter(F.col("event_type") == "click")
        plan = (
            TMP.asof_join(
                left, right, ["user_id"], "ts",
                right_cols=["event_id"], tie_col="event_id",
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan
        n_ex = plan.count("Exchange hashpartitioning")
        assert n_ex == 1, f"expected 1 exchange, got {n_ex}:\n{plan}"


def _scd_toy(spark):
    rows = [
        # user 5: A A B A -> versions A, B, A (repeat collapses,
        # re-appearance re-opens)
        (50, _ts("2024-01-01 10:00:00"), 5, "A", 1.0),
        (51, _ts("2024-01-01 10:05:00"), 5, "A", 1.0),
        (52, _ts("2024-01-01 10:10:00"), 5, "B", 1.0),
        (53, _ts("2024-01-01 10:20:00"), 5, "A", 1.0),
        # user 6: NULL NULL x NULL -> null-safe change detection
        (60, _ts("2024-01-01 09:00:00"), 6, None, 1.0),
        (61, _ts("2024-01-01 09:01:00"), 6, None, 1.0),
        (62, _ts("2024-01-01 09:02:00"), 6, "x", 1.0),
        (63, _ts("2024-01-01 09:03:00"), 6, None, 1.0),
        # user 7: single row
        (70, _ts("2024-01-01 08:00:00"), 7, "solo", 1.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )


def _us_py(s: str) -> int:
    return int(
        _ts(s).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )


class TestScd2:
    def test_hand_exact(self, spark):
        got = {
            (r["user_id"], r["version"]): (
                r["event_type"], r["valid_from_us"], r["valid_to_us"],
                r["is_current"],
            )
            for r in TMP.scd2_build(_scd_toy(spark), ["event_type"]).collect()
        }
        t = _us_py
        assert got == {
            (5, 1): ("A", t("2024-01-01 10:00:00"), t("2024-01-01 10:10:00"), False),
            (5, 2): ("B", t("2024-01-01 10:10:00"), t("2024-01-01 10:20:00"), False),
            (5, 3): ("A", t("2024-01-01 10:20:00"), None, True),
            (6, 1): (None, t("2024-01-01 09:00:00"), t("2024-01-01 09:02:00"), False),
            (6, 2): ("x", t("2024-01-01 09:02:00"), t("2024-01-01 09:03:00"), False),
            (6, 3): (None, t("2024-01-01 09:03:00"), None, True),
            (7, 1): ("solo", t("2024-01-01 08:00:00"), None, True),
        }

    def test_duckdb_parity_real_events(self, spark):
        got = {
            (r["user_id"], r["version"]): (
                r["event_type"], r["valid_from_us"], r["valid_to_us"]
            )
            for r in TMP.scd2_build(_events(spark), ["event_type"]).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{EV}')"
        )
        cte = TMP.scd2_oracle_sql("events", ["event_type"])
        want = {
            (u, v): (a, f, to)
            for u, v, a, f, to in con.execute(
                f"WITH {cte.lstrip()} SELECT user_id, version, event_type,"
                " valid_from_us, valid_to_us FROM scd_tbl"
            ).fetchall()
        }
        assert got == want
        assert max(v for _, v in got) > 2  # real attribute churn exists

    def test_lookup_point_in_time(self, spark):
        dim = TMP.scd2_build(_scd_toy(spark), ["event_type"])
        facts = spark.createDataFrame(
            [
                (1, _ts("2024-01-01 10:05:30"), 5),   # inside version 1
                (2, _ts("2024-01-01 10:10:00"), 5),   # boundary -> version 2
                (3, _ts("2024-01-01 11:00:00"), 5),   # open current version
                (4, _ts("2024-01-01 07:59:00"), 7),   # before first -> null
                (5, _ts("2024-01-01 12:00:00"), 99),  # unknown key -> null
            ],
            "fact_id long, ts timestamp, user_id long",
        )
        got = {
            r["fact_id"]: r["event_type"]
            for r in TMP.scd2_lookup(facts, dim).collect()
        }
        assert got == {1: "A", 2: "B", 3: "A", 4: None, 5: None}

    def test_one_exchange(self, spark):
        plan = (
            TMP.scd2_build(_events(spark), ["event_type"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        n_ex = plan.count("Exchange hashpartitioning")
        assert n_ex == 1, f"expected 1 exchange, got {n_ex}:\n{plan}"

    def test_requires_attrs(self, spark):
        with pytest.raises(ValueError):
            TMP.scd2_build(_scd_toy(spark), [])


class TestRolling:
    def test_hand_exact_inclusive_boundary(self, spark):
        got = {
            r["event_id"]: (r["roll_cnt"], r["roll_sum_e4"])
            for r in TMP.with_rolling_stats(
                _toy_events(spark), 600
            ).collect()
        }
        # user 1: 10:00(1.0) 10:10(1.0) 10:41(5.0); 600 s window
        assert got[10] == (1, 10000)
        assert got[11] == (2, 20000)   # exactly 600 s earlier IS included
        assert got[12] == (1, 50000)
        assert got[20] == (1, 10000)
        # user 3: 08:00, 08:30 -> 1800 s apart, outside 600 s
        assert got[31] == (1, 10000)

    def test_duckdb_parity_real_events(self, spark):
        ev = spark.read.parquet(EV).select(
            "event_id", "ts", "user_id", "value"
        )
        got = {
            r["event_id"]: (r["roll_cnt"], r["roll_sum_e4"])
            for r in TMP.with_rolling_stats(ev, 3600).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{EV}')"
        )
        cte = TMP.rolling_oracle_sql("events", 3600)
        want = {
            e: (c, s)
            for e, c, s in con.execute(
                f"WITH {cte.lstrip()} SELECT event_id, roll_cnt,"
                " roll_sum_e4 FROM roll_tbl"
            ).fetchall()
        }
        assert got == want
        assert max(c for c, _ in got.values()) > 1  # windows overlap for real

    def test_one_exchange(self, spark):
        ev = spark.read.parquet(EV).select("event_id", "ts", "user_id", "value")
        plan = (
            TMP.with_rolling_stats(ev, 3600)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        n_ex = plan.count("Exchange hashpartitioning")
        assert n_ex == 1, f"expected 1 exchange, got {n_ex}:\n{plan}"

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            TMP.with_rolling_stats(_toy_events(spark), -1)


class TestAnomaly:
    def test_hand_exact(self, spark):
        rows = [
            (1, _ts("2024-01-01 10:00:00"), 1, "view", 10.0),
            (2, _ts("2024-01-01 10:01:00"), 1, "view", 10.0),
            (3, _ts("2024-01-01 10:02:00"), 1, "view", 10.0),
            (4, _ts("2024-01-01 10:03:00"), 1, "view", 10.0),
            # constant baseline (variance 0) -> ANY deviation flags
            (5, _ts("2024-01-01 10:04:00"), 1, "view", 10.5),
            # same value as baseline -> never flags
            (6, _ts("2024-01-01 10:05:00"), 1, "view", 10.0),
            # user 2: too few priors -> never flags even at huge spike
            (7, _ts("2024-01-01 10:00:00"), 2, "view", 1.0),
            (8, _ts("2024-01-01 10:01:00"), 2, "view", 100.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        got = {
            r["event_id"]: (r["an_n_prior"], r["an_is_anomaly"])
            for r in TMP.with_anomaly_flags(df, 3600, k=3).collect()
        }
        assert got[1] == (0, False)
        assert got[4] == (3, False)      # matches constant baseline
        assert got[5][1] is True         # 10.5 vs constant 10s
        assert got[8] == (1, False)      # below min_prior
        # event 6: baseline now includes the 10.5 spike; 10.0 is within
        # 3 sigma of {10,10,10,10,10.5}
        assert got[6][1] is False

    def test_duckdb_parity_real_events(self, spark):
        ev = spark.read.parquet(EV).select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        got = {
            r["event_id"]: (r["an_n_prior"], r["an_is_anomaly"])
            for r in TMP.with_anomaly_flags(ev, 604800, k=1).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{EV}')"
        )
        cte = TMP.anomaly_oracle_sql("events", 604800, k=1)
        want = {
            e: (n, bool(a))
            for e, n, a in con.execute(
                f"WITH {cte.lstrip()} SELECT event_id, an_n_prior,"
                " an_is_anomaly FROM anom_tbl"
            ).fetchall()
        }
        assert got == want
        assert any(a for _, a in got.values())       # real flags fire
        assert not all(a for _, a in got.values())

    def test_one_exchange(self, spark):
        ev = spark.read.parquet(EV).select(
            "event_id", "ts", "user_id", "value"
        )
        plan = (
            TMP.with_anomaly_flags(ev, 3600)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        n_ex = plan.count("Exchange hashpartitioning")
        assert n_ex == 1, f"expected 1 exchange, got {n_ex}:\n{plan}"

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            TMP.with_anomaly_flags(_toy_events(spark), 0)
        with pytest.raises(ValueError):
            TMP.with_anomaly_flags(_toy_events(spark), 3600, k=0)
