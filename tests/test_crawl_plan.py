"""End-to-end crawl-frontier refresh plan (plans/crawl.py): the full
loop — canonicalize, dedup, fetched anti-join, blocklist, robots,
priority, schedule — plus attrition accounting and the politeness
invariant on the composed output."""

from __future__ import annotations

from pyspark.sql import functions as F

from index_search_monorepo_spark.plans.crawl import refresh_frontier

ROBOTS = (
    "User-agent: *\n"
    "Disallow: /private/\n"
    "Crawl-delay: 3\n"
)

# Discovered feed: messy spellings, duplicates after canonicalization,
# a blocked domain, a robots-denied path, an already-fetched URL.
DISCOVERED = [
    "HTTP://A.com:80/x",          # dup of the next after canon
    "http://a.com/x",
    "http://a.com/y/../z?utm_source=t",   # canon -> http://a.com/z
    "http://a.com/private/p",     # robots-denied
    "http://b.com/fetched",       # in the fetched set
    "http://b.com/new1",
    "http://b.com/new2",
    "https://spam.bad.com/q",     # blocked domain
]


def _run(spark, **kw):
    disc = spark.createDataFrame([(u,) for u in DISCOVERED], "url string")
    fetched = spark.createDataFrame(
        [("http://b.com/fetched",)], "canon_url string"
    )
    robots = spark.createDataFrame(
        [("a.com", ROBOTS)], "host string, robots_body string"
    )
    prio = spark.createDataFrame(
        [("a.com", 9), ("b.com", 1)], "host string, priority long"
    )
    return refresh_frontier(
        disc,
        fetched=fetched,
        robots=robots,
        host_priority=prio,
        blocked_domains=["bad.com"],
        n_fetchers=4,
        default_delay=1,
        **kw,
    )


class TestCrawlPlan:
    def test_schedule_contents(self, spark):
        sched, _ = _run(spark)
        rows = {r["url"]: r for r in sched.collect()}
        # survivors: a.com/x, a.com/z, b.com/new1, b.com/new2
        assert set(rows) == {
            "http://a.com/x",
            "http://a.com/z",
            "http://b.com/new1",
            "http://b.com/new2",
        }
        # politeness: one URL per host per wave, delay from robots (a.com
        # 3 s) or default (b.com 1 s)
        for r in rows.values():
            host = r["host"]
            delay = 3 if host == "a.com" else 1
            assert r["not_before_sec"] == (r["wave"] - 1) * delay
        a_waves = sorted(r["wave"] for r in rows.values() if r["host"] == "a.com")
        assert a_waves == [1, 2]

    def test_attrition_report(self, spark):
        sched, rep = _run(spark, report=True)
        by_stage = {r["stage"]: r for r in rep.collect()}
        assert by_stage["discovered"]["urls_out"] == 8
        assert by_stage["deduped"]["urls_out"] == 7      # a.com/x collapses
        assert by_stage["unfetched"]["urls_out"] == 6    # b.com/fetched out
        assert by_stage["unblocked"]["urls_out"] == 5    # spam.bad.com out
        assert by_stage["admitted"]["urls_out"] == 4     # /private/p denied
        assert sched.count() == 4

    def test_no_robots_no_priority(self, spark):
        disc = spark.createDataFrame(
            [("http://c.com/1",), ("http://c.com/2",)], "url string"
        )
        sched, _ = refresh_frontier(disc, n_fetchers=2, default_delay=5)
        rows = sorted(sched.collect(), key=lambda r: r["wave"])
        assert [r["not_before_sec"] for r in rows] == [0, 5]
        assert all(r["matched_pattern"] is None for r in rows)

    def test_slim_shuffles_only(self, spark):
        # payload columns on the discovered frame must not survive into
        # the shuffled schedule (slim-rows-only discipline)
        disc = spark.createDataFrame(
            [("http://c.com/1", "X" * 1000)], "url string, page_html string"
        )
        sched, _ = refresh_frontier(disc, n_fetchers=2)
        assert "page_html" not in sched.columns
