"""Crawl-frontier scheduling (operators/frontier.py): politeness
invariants + the DuckDB bit-equality of the whole schedule."""

from __future__ import annotations

import duckdb

from index_search_monorepo_spark.operators import frontier as FR

URLS = [
    # (host, url, prio): a.com is hot (3 urls), b.com has a priority
    # inversion (low-prio url sorts lexicographically first)
    ("a.com", "https://a.com/1", 5),
    ("a.com", "https://a.com/2", 9),
    ("a.com", "https://a.com/3", 9),
    ("b.com", "https://b.com/aaa", 1),
    ("b.com", "https://b.com/zzz", 7),
    ("c.net", "https://c.net/only", 3),
]


def _spark_sched(spark, n_fetchers=4):
    df = spark.createDataFrame(
        URLS, "host string, url string, prio long"
    )
    out = FR.frontier_schedule(
        df, n_fetchers=n_fetchers, priority_col="prio"
    )
    return {
        r["url"]: (r["host"], r["fetcher"], r["wave"], r["queue_pos"])
        for r in out.collect()
    }


def _duck_sched(n_fetchers=4):
    vals = ", ".join(f"('{h}', '{u}', {p})" for h, u, p in URLS)
    q = (
        f"WITH urls(host, url, prio) AS (VALUES {vals})\n"
        + FR.oracle_frontier_sql(
            "urls", n_fetchers=n_fetchers, priority_sql="prio"
        )
    )
    con = duckdb.connect()
    return {
        u: (h, f, w, qp) for h, u, f, w, qp in con.sql(q).fetchall()
    }


class TestFrontier:
    def test_politeness_one_url_per_host_per_wave(self, spark):
        got = _spark_sched(spark)
        by_host_wave = {}
        for url, (host, _f, wave, _q) in got.items():
            key = (host, wave)
            assert key not in by_host_wave, "two urls in one host-wave"
            by_host_wave[key] = url
        # a.com's 3 urls occupy waves 1..3
        assert {got[f"https://a.com/{i}"][2] for i in (1, 2, 3)} == {
            1, 2, 3,
        }

    def test_priority_orders_within_host(self, spark):
        got = _spark_sched(spark)
        # prio 9 beats 5; tie on 9 -> url lexicographic
        assert got["https://a.com/2"][2] == 1
        assert got["https://a.com/3"][2] == 2
        assert got["https://a.com/1"][2] == 3
        # b.com: prio 7 first despite 'zzz' sorting last
        assert got["https://b.com/zzz"][2] == 1
        assert got["https://b.com/aaa"][2] == 2

    def test_host_sticks_to_one_fetcher(self, spark):
        got = _spark_sched(spark)
        per_host = {}
        for _url, (host, fetcher, _w, _q) in got.items():
            per_host.setdefault(host, set()).add(fetcher)
        assert all(len(s) == 1 for s in per_host.values())

    def test_duckdb_schedule_bit_equal(self, spark):
        assert _spark_sched(spark) == _duck_sched()

    def test_crawl_delay_spacing(self, spark):
        df = spark.createDataFrame(
            [(h, u, p, 2 if h == "a.com" else 5) for h, u, p in URLS],
            "host string, url string, prio long, delay long",
        )
        out = FR.frontier_schedule(
            df, n_fetchers=4, priority_col="prio", delay_col="delay"
        )
        got = {r["url"]: (r["wave"], r["not_before_sec"]) for r in out.collect()}
        # not_before = (wave-1) * host delay: a.com's 3 urls at 0/2/4s,
        # b.com's 2 at 0/5s, singleton at 0
        assert all(nb == (w - 1) * (2 if "a.com" in u else 5)
                   for u, (w, nb) in got.items())
        assert sorted(nb for u, (_w, nb) in got.items() if "a.com" in u) == [0, 2, 4]

    def test_queue_pos_total_order_within_fetcher_wave(self, spark):
        got = _spark_sched(spark, n_fetchers=1)
        # one fetcher: each wave's queue positions are 1..k dense
        waves = {}
        for _u, (_h, _f, w, q) in got.items():
            waves.setdefault(w, []).append(q)
        for w, qs in waves.items():
            assert sorted(qs) == list(range(1, len(qs) + 1))
