"""Funnel conversion, cohort retention, and time-grid resample/ffill —
hand-exact semantics, DuckDB parity on real events, plan pins."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import funnel as FN
from index_search_monorepo_spark.operators import temporal as TMP

SF_DIR = "/root/testdata/sf0.001"
EV = f"{SF_DIR}/events.parquet"
STEPS = ["view", "click", "purchase"]


def _ts(s: str):
    return dt.datetime.fromisoformat(s)


def _us_py(s: str) -> int:
    return int(
        _ts(s).replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000
    )


def _toy(spark):
    rows = [
        # user 1: full conversion with a decoy second view
        (10, _ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        (11, _ts("2024-01-01 10:05:00"), 1, "view", 1.0),
        (12, _ts("2024-01-01 10:10:00"), 1, "click", 1.0),
        (13, _ts("2024-01-01 10:20:00"), 1, "purchase", 5.0),
        # user 2: purchase BEFORE the view chain starts -> depth 2 only
        (20, _ts("2024-01-01 09:00:00"), 2, "purchase", 5.0),
        (21, _ts("2024-01-01 09:10:00"), 2, "view", 1.0),
        (22, _ts("2024-01-01 09:20:00"), 2, "click", 1.0),
        # user 3: same-ts tie — click shares the view's timestamp but has
        # a HIGHER event_id, so sequence order lets it count
        (30, _ts("2024-01-01 08:00:00"), 3, "view", 1.0),
        (31, _ts("2024-01-01 08:00:00"), 3, "click", 1.0),
        # user 4: same-ts tie the other way — click's event_id sorts
        # BEFORE the view, so the chain stalls at depth 1
        (41, _ts("2024-01-01 07:00:00"), 4, "view", 1.0),
        (40, _ts("2024-01-01 07:00:00"), 4, "click", 1.0),
        # user 5: never enters
        (50, _ts("2024-01-01 06:00:00"), 5, "error", 1.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )


def _events(spark):
    return spark.read.parquet(EV).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


class TestFunnel:
    def test_hand_exact(self, spark):
        got = {
            r["user_id"]: (
                r["fn_depth"], r["fn_ts1_us"], r["fn_ts2_us"], r["fn_ts3_us"]
            )
            for r in FN.funnel_steps(_toy(spark), STEPS).collect()
        }
        t = _us_py
        assert got == {
            1: (3, t("2024-01-01 10:00:00"), t("2024-01-01 10:10:00"),
                t("2024-01-01 10:20:00")),
            2: (2, t("2024-01-01 09:10:00"), t("2024-01-01 09:20:00"), -1),
            3: (2, t("2024-01-01 08:00:00"), t("2024-01-01 08:00:00"), -1),
            4: (1, t("2024-01-01 07:00:00"), -1, -1),
            5: (0, -1, -1, -1),
        }

    def test_window_closes_funnel(self, spark):
        # user 1: view 10:00 -> purchase 10:20 is outside a 900 s window
        got = {
            r["user_id"]: r["fn_depth"]
            for r in FN.funnel_steps(
                _toy(spark), STEPS, within_seconds=900
            ).collect()
        }
        assert got[1] == 2          # click at +600 s in, purchase at +1200 out
        assert got[2] == 2          # chain spans 600 s, inside
        assert got[3] == 2

    def test_duckdb_parity_real_events(self, spark):
        for within in (None, 14_400):
            got = {
                r["user_id"]: (
                    r["fn_depth"], r["fn_ts1_us"], r["fn_ts2_us"],
                    r["fn_ts3_us"],
                )
                for r in FN.funnel_steps(
                    _events(spark), STEPS, within_seconds=within
                ).collect()
            }
            con = duckdb.connect()
            con.execute(
                f"CREATE VIEW events AS SELECT * FROM read_parquet('{EV}')"
            )
            cte = FN.funnel_oracle_sql("events", STEPS, within_seconds=within)
            want = {
                u: (d, t1, t2, t3)
                for u, d, t1, t2, t3 in con.execute(
                    f"WITH {cte.lstrip()} SELECT funnel_key, fn_depth,"
                    " fn_ts1_us, fn_ts2_us, fn_ts3_us FROM funnel_tbl"
                ).fetchall()
            }
            assert got == want
            if within is not None:
                # the tight window forces stalls — real depth variety
                assert len({d for d, *_ in got.values()}) >= 2

    def test_report(self, spark):
        f = FN.funnel_steps(_toy(spark), STEPS)
        got = {
            r["step"]: (r["n_reached"], r["share_of_entered_pmille"])
            for r in FN.funnel_report(f, 3).collect()
        }
        assert got == {1: (4, 1000), 2: (3, 750), 3: (1, 250)}

    def test_one_exchange(self, spark):
        plan = (
            FN.funnel_steps(_events(spark), STEPS)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        n_ex = plan.count("Exchange hashpartitioning")
        assert n_ex == 1, f"expected 1 exchange, got {n_ex}:\n{plan}"

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            FN.funnel_steps(_toy(spark), [])
        with pytest.raises(ValueError):
            FN.funnel_steps(_toy(spark), STEPS, within_seconds=-1)


class TestRetention:
    def test_hand_exact(self, spark):
        rows = [
            # user 1: weeks 0, 1, 3 of its cohort
            (1, _ts("2024-01-01 10:00:00"), 1, "view", 1.0),
            (2, _ts("2024-01-08 10:00:00"), 1, "view", 1.0),
            (3, _ts("2024-01-24 10:00:00"), 1, "view", 1.0),
            # user 2: one week only
            (4, _ts("2024-02-01 10:00:00"), 2, "view", 1.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        got = {
            r["user_id"]: (r["rt_mask"], r["rt_n_active"])
            for r in FN.cohort_retention(df).collect()
        }
        assert got == {1: (0b1011, 3), 2: (0b1, 1)}

    def test_saturation(self, spark):
        rows = [
            (1, _ts("2024-01-01 10:00:00"), 1, "view", 1.0),
            (2, _ts("2026-01-01 10:00:00"), 1, "view", 1.0),  # offset 104
            (3, _ts("2027-01-01 10:00:00"), 1, "view", 1.0),  # offset 156
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        r = FN.cohort_retention(df, max_offset=4).collect()[0]
        # both far offsets collapse onto the cap bit; true count stays 3
        assert r["rt_mask"] == 0b10001
        assert r["rt_n_active"] == 3

    def test_duckdb_parity_real_events(self, spark):
        got = {
            r["user_id"]: (
                r["rt_cohort_period"], r["rt_mask"], r["rt_n_active"]
            )
            for r in FN.cohort_retention(_events(spark)).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{EV}')"
        )
        cte = FN.retention_oracle_sql("events")
        want = {
            u: (c, m, n)
            for u, c, m, n in con.execute(
                f"WITH {cte.lstrip()} SELECT rt_key, rt_cohort_period,"
                " rt_mask, rt_n_active FROM retention_tbl"
            ).fetchall()
        }
        assert got == want
        assert max(n for _, _, n in got.values()) > 1

    def test_matrix_consistency(self, spark):
        ret = FN.cohort_retention(_events(spark))
        mat = {
            (r["rt_cohort_period"], r["offset"]): r["n_users"]
            for r in FN.retention_matrix(ret).collect()
        }
        # offset-0 row of each cohort counts every cohort member
        cohorts = {
            r["rt_cohort_period"]: r["n"]
            for r in ret.groupBy("rt_cohort_period")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        for c, n in cohorts.items():
            assert mat[(c, 0)] == n
        # total activity cells == sum of per-user distinct periods
        # (no saturation at this horizon)
        n_active_sum = ret.agg(F.sum("rt_n_active")).collect()[0][0]
        assert sum(mat.values()) == n_active_sum

    def test_one_exchange(self, spark):
        plan = (
            FN.cohort_retention(_events(spark))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        n_ex = plan.count("Exchange hashpartitioning")
        assert n_ex == 1, f"expected 1 exchange, got {n_ex}:\n{plan}"

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            FN.cohort_retention(_toy(spark), period_seconds=0)
        with pytest.raises(ValueError):
            FN.cohort_retention(_toy(spark), max_offset=63)


class TestResample:
    def test_hand_exact(self, spark):
        rows = [
            # key a: obs in slots 0 and 3 of its range -> 2 gap slots
            (1, _ts("2024-01-01 00:10:00"), 1, "a", 1.5),
            (2, _ts("2024-01-01 00:20:00"), 1, "a", 2.5),   # same slot, later
            (3, _ts("2024-01-01 03:30:00"), 1, "a", 9.0),
            # key b: single obs -> single-slot grid
            (4, _ts("2024-01-01 05:00:00"), 1, "b", 4.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        got = {
            (r["event_type"], r["slot"]): (r["value_e4"], r["is_gap"])
            for r in TMP.resample_ffill(df, 3600).collect()
        }
        base = _us_py("2024-01-01 00:00:00") // 3_600_000_000
        assert got == {
            ("a", base): (25000, False),      # last obs in slot wins
            ("a", base + 1): (25000, True),
            ("a", base + 2): (25000, True),
            ("a", base + 3): (90000, False),
            ("b", base + 5): (40000, False),
        }

    def test_duckdb_parity_real_events(self, spark):
        got = {
            (r["event_type"], r["slot"]): (
                r["slot_start_us"], r["value_e4"], r["is_gap"]
            )
            for r in TMP.resample_ffill(_events(spark), 3600).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{EV}')"
        )
        cte = TMP.resample_oracle_sql("events", 3600)
        want = {
            (k, s): (ss, v, g)
            for k, s, ss, v, g in con.execute(
                f"WITH {cte.lstrip()} SELECT rs_key, slot, slot_start_us,"
                " value_e4, is_gap FROM resample_tbl"
            ).fetchall()
        }
        assert got == want
        assert any(g for _, g in [(k, v[2]) for k, v in got.items()])

    def test_grid_guard_raises(self, spark):
        df = _toy(spark)
        with pytest.raises(Exception, match="max_slots_per_key"):
            TMP.resample_ffill(df, 1, key_col="event_type",
                               max_slots_per_key=10).collect()

    def test_plan_no_nlj(self, spark):
        plan = (
            TMP.resample_ffill(_events(spark), 3600)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan
        n_ex = plan.count("Exchange hashpartitioning")
        assert n_ex <= 5, f"too many exchanges ({n_ex}):\n{plan}"

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            TMP.resample_ffill(_toy(spark), 0)


class TestTransitions:
    def test_hand_exact(self, spark):
        got = {
            (r["from_type"], r["to_type"]): r["n_transitions"]
            for r in FN.transition_counts(_toy(spark)).collect()
        }
        # user 1: view->view->click->purchase; user 2: purchase->view->
        # click; user 3: view->click (tie ts, event_id order); user 4:
        # click(40)->view(41) at equal ts; user 5: single event
        assert got == {
            ("view", "view"): 1,
            ("view", "click"): 3,
            ("click", "purchase"): 1,
            ("purchase", "view"): 1,
            ("click", "view"): 1,
        }

    def test_duckdb_parity_real_events(self, spark):
        got = {
            (r["from_type"], r["to_type"]): r["n_transitions"]
            for r in FN.transition_counts(_events(spark)).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{EV}')"
        )
        cte = FN.transitions_oracle_sql("events")
        want = {
            (a, b): n
            for a, b, n in con.execute(
                f"WITH {cte.lstrip()} SELECT from_type, to_type,"
                " n_transitions FROM trans_tbl"
            ).fetchall()
        }
        assert got == want
        assert len(got) == 25  # full 5x5 matrix at this density
        # conservation: transitions = events - one per user
        n_events = _events(spark).count()
        n_users = _events(spark).select("user_id").distinct().count()
        assert sum(got.values()) == n_events - n_users

    def test_one_exchange_then_rollup(self, spark):
        plan = (
            FN.transition_counts(_events(spark))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        n_ex = plan.count("Exchange hashpartitioning")
        assert n_ex == 2, f"user window + pair rollup, got {n_ex}:\n{plan}"


_RFM_NOW = _us_py("2024-02-01 00:00:00")


class TestRfm:
    def test_hand_exact(self, spark):
        got = {
            r["user_id"]: (
                r["recency_us"], r["frequency"], r["monetary_e4"],
                r["r_q"], r["f_q"], r["m_q"], r["rfm_segment"],
            )
            for r in FN.rfm_scores(
                _toy(spark), _RFM_NOW, n_tiles=2
            ).collect()
        }
        # users by last ts: 1 (10:20) > 2 (09:20) > 3 (08:00) > 4 (07:00)
        # > 5 (06:00); by frequency: 1 (4) > 2 (3) > 3=4 (2) > 5 (1);
        # by monetary_e4: 1 (80000) > 2 (70000) > 3=4 (20000) > 5 (10000)
        assert got[1] == (
            _RFM_NOW - _us_py("2024-01-01 10:20:00"), 4, 80000, 1, 1, 1, 111
        )
        assert got[2][3:] == (1, 1, 1, 111)   # ntile(2) over 5: first 3 -> 1
        assert got[3][3:] == (1, 1, 1, 111)
        assert got[4][3:] == (2, 2, 2, 222)
        assert got[5][3:] == (2, 2, 2, 222)

    def test_duckdb_parity_real_events(self, spark):
        got = {
            r["user_id"]: (
                r["recency_us"], r["frequency"], r["monetary_e4"],
                r["r_q"], r["f_q"], r["m_q"], r["rfm_segment"],
            )
            for r in FN.rfm_scores(_events(spark), _RFM_NOW).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{EV}')"
        )
        cte = FN.rfm_oracle_sql("events", _RFM_NOW)
        want = {
            row[0]: tuple(row[1:])
            for row in con.execute(
                f"WITH {cte.lstrip()} SELECT rfm_key, recency_us,"
                " frequency, monetary_e4, r_q, f_q, m_q, rfm_segment"
                " FROM rfm_tbl"
            ).fetchall()
        }
        assert got == want
        segs = {v[6] for v in got.values()}
        assert len(segs) >= 3                 # real segment variety

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            FN.rfm_scores(_toy(spark), _RFM_NOW, n_tiles=1)

    @pytest.mark.parametrize("n_tiles", [2, 3, 5, 7])
    def test_ranged_equals_global_ntile(self, spark, n_tiles):
        """r6: the scale-safe ranged strategy (range-repartitioned
        parallel sorts + literal chunk offsets) must reproduce the exact
        global ntile bit-for-bit — including the uneven-tile remainder
        rule (first n%t tiles get the extra row) and n_users < n_tiles."""
        ev = _events(spark)
        a = {
            r["user_id"]: tuple(r)
            for r in FN.rfm_scores(
                ev, _RFM_NOW, n_tiles=n_tiles, strategy="ranged"
            ).collect()
        }
        b = {
            r["user_id"]: tuple(r)
            for r in FN.rfm_scores(
                ev, _RFM_NOW, n_tiles=n_tiles, strategy="global"
            ).collect()
        }
        assert a == b

    def test_ranged_fewer_users_than_tiles(self, spark):
        a = {
            r["user_id"]: tuple(r)
            for r in FN.rfm_scores(
                _toy(spark), _RFM_NOW, n_tiles=9, strategy="ranged"
            ).collect()
        }
        b = {
            r["user_id"]: tuple(r)
            for r in FN.rfm_scores(
                _toy(spark), _RFM_NOW, n_tiles=9, strategy="global"
            ).collect()
        }
        assert a == b

    def test_ranged_plan_has_no_global_sort_window(self, spark):
        """VERDICT r05 wrong #1 done-criterion: no Window.orderBy without
        partitionBy anywhere in the default rfm plan — every Window node
        must carry a partition spec (the _pid chunk key)."""
        plan = (
            FN.rfm_scores(_events(spark), _RFM_NOW)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        import re

        for m in re.finditer(r"Window \[[^\]]*\]", plan):
            # executed-plan Window nodes print as
            # Window [funcs], [partition spec], [order spec] — a global
            # window has no partition-spec bracket between funcs + order
            pass
        # robust check: every windowspecdefinition in the plan text has a
        # non-empty partition clause, i.e. no "windowspecdefinition(" that
        # starts directly with a sort order. Executed plans print window
        # operators as: Window [fn windowspecdefinition(part..., order...)]
        assert "Window [" in plan  # the chunk windows exist
        for line in plan.splitlines():
            if "Window [" not in line:
                continue
            spec = line.split("windowspecdefinition(")
            for frag in spec[1:]:
                # partition columns precede the first ASC/DESC sort token;
                # a global window starts its spec with the sort order
                head = frag.split(",")[0]
                assert "ASC" not in head and "DESC" not in head, line
