"""robots.txt (RFC 9309) + sitemap crawl-tier sources
(operators/robots.py, sources/sitemap.py).

The parser corner cases are the product here: group selection
specificity, longest-match with allow-tie-wins, `$`/`*` patterns, and
the over-strict-namespace sitemap bug. Spark-side tests pin the
broadcast admission join and the error-envelope rows.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import robots as R
from index_search_monorepo_spark.sources import sitemap as SM

BODY = """\
# global rules
User-agent: *
Disallow: /private/
Allow: /private/ok
Disallow: /*.pdf$
Disallow: /tmp
Allow: /tmp/keep*html
Crawl-delay: 2

User-agent: graftbot
Disallow: /bot-only/
"""


class TestRobotsParse:
    def test_groups_and_keys(self):
        groups = R.parse_robots_groups(BODY)
        assert len(groups) == 2
        assert groups[0]["agents"] == ["*"]
        assert groups[0]["crawl_delay"] == 2
        assert groups[1]["agents"] == ["graftbot"]
        assert groups[1]["rules"] == [(False, "/bot-only/")]

    def test_consecutive_agent_lines_share_a_group(self):
        g = R.parse_robots_groups(
            "User-agent: a\nUser-agent: b\nDisallow: /x\n"
        )
        assert len(g) == 1 and g[0]["agents"] == ["a", "b"]

    def test_rules_before_any_agent_are_ignored(self):
        g = R.parse_robots_groups("Disallow: /x\nUser-agent: *\nAllow: /\n")
        assert g[0]["rules"] == [(True, "/")]

    def test_empty_disallow_is_noop(self):
        g = R.parse_robots_groups("User-agent: *\nDisallow:\n")
        assert g[0]["rules"] == []

    def test_comments_case_and_bom(self):
        g = R.parse_robots_groups(
            "﻿USER-AGENT: Bot # trailing\nDISALLOW: /a # c\n"
        )
        assert g[0]["agents"] == ["bot"]
        assert g[0]["rules"] == [(False, "/a")]


class TestGroupSelection:
    def test_specific_beats_star_and_star_does_not_merge(self):
        groups = R.parse_robots_groups(BODY)
        g = R.select_group(groups, "graftbot/1.0")
        assert g["rules"] == [(False, "/bot-only/")]
        # the * group's /private/ rule must NOT leak into graftbot
        assert R.robots_decision(BODY, "/private/doc", "graftbot/1.0")[0]

    def test_longest_token_wins(self):
        body = (
            "User-agent: bot\nDisallow: /a\n\n"
            "User-agent: botx\nDisallow: /b\n"
        )
        g = R.select_group(R.parse_robots_groups(body), "botxtra")
        assert g["rules"] == [(False, "/b")]

    def test_no_group_means_allowed(self):
        assert R.robots_decision(
            "User-agent: other\nDisallow: /\n", "/x", "mybot"
        ) == (True, None, None)

    def test_same_token_groups_combine(self):
        # RFC 9309 §2.2.1: "matching groups' rules MUST be combined" —
        # a second `user-agent: bot` group later in the file contributes
        # its rules (and its crawl-delay when the first had none)
        body = (
            "User-agent: bot\nDisallow: /a\n\n"
            "User-agent: other\nDisallow: /o\n\n"
            "User-agent: bot\nDisallow: /b\nCrawl-delay: 7\n"
        )
        g = R.select_group(R.parse_robots_groups(body), "bot/2.0")
        assert g["rules"] == [(False, "/a"), (False, "/b")]
        assert g["crawl_delay"] == 7
        assert not R.robots_decision(body, "/b/x", "bot/2.0")[0]
        # star groups combine with each other the same way
        star_body = (
            "User-agent: *\nDisallow: /a\n\n"
            "User-agent: *\nDisallow: /b\n"
        )
        sg = R.select_group(R.parse_robots_groups(star_body), "anybot")
        assert sg["rules"] == [(False, "/a"), (False, "/b")]
        # but * still never merges into a specific match
        assert R.robots_decision(body + "User-agent: *\nDisallow: /\n",
                                 "/zz", "bot/2.0")[0]


class TestMatching:
    @pytest.mark.parametrize(
        "path,allowed,pattern",
        [
            ("/public/page", True, None),
            ("/private/doc", False, "/private/"),
            ("/private/okay", True, "/private/ok"),  # longest match
            ("/file.pdf", False, "/*.pdf$"),
            ("/file.pdfx", True, None),  # $ anchor
            ("/tmp/keep1.html", True, "/tmp/keep*html"),
            ("/tmp/other", False, "/tmp"),
        ],
    )
    def test_star_group_decisions(self, path, allowed, pattern):
        got_allowed, got_pattern, delay = R.robots_decision(
            BODY, path, "zcrawler"
        )
        assert (got_allowed, got_pattern) == (allowed, pattern)
        assert delay == 2

    def test_allow_wins_equal_length_tie(self):
        rules = [(False, "/dir/a"), (True, "/dir/b")]
        # different paths, same pattern lengths: each matches its own
        assert R.match_rules(rules, "/dir/a")[0] is False
        body = "User-agent: *\nDisallow: /same\nAllow: /sam*\n"
        # '/same' (5) vs '/sam*' (5): equal length -> allow wins
        assert R.robots_decision(body, "/same", "x")[0] is True


class TestRobotsSpark:
    def test_admission_join_broadcasts_and_decides(self, spark):
        hosts = spark.createDataFrame(
            [("a.com", BODY), ("b.com", "User-agent: *\nDisallow: /\n")],
            "host string, robots_body string",
        )
        rules = R.host_rules(hosts, agent="zcrawler")
        urls = spark.createDataFrame(
            [
                ("a.com", "/private/doc"),
                ("a.com", "/public/x"),
                ("b.com", "/anything"),
                ("c.com", "/no-robots-host"),
            ],
            "host string, path string",
        )
        out = R.with_robots_allowed(urls, rules)
        got = {
            (r["host"], r["path"]): (r["allowed"], r["matched_pattern"])
            for r in out.collect()
        }
        assert got[("a.com", "/private/doc")] == (0, "/private/")
        assert got[("a.com", "/public/x")] == (1, None)
        assert got[("b.com", "/anything")] == (0, "/")
        # no robots.txt for the host -> allowed (404 semantics)
        assert got[("c.com", "/no-robots-host")] == (1, None)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_crawl_delay_rides_the_host_join(self, spark):
        hosts = spark.createDataFrame(
            [("a.com", BODY)], "host string, robots_body string"
        )
        rules = R.host_rules(hosts, agent="zcrawler")
        assert rules.collect()[0]["crawl_delay"] == 2


SITEMAP = """\
<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://ex.com/a</loc><lastmod>2026-01-02</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>https://ex.com/b</loc></url>
  <url><priority>0.9</priority></url>
</urlset>
"""

SITEMAP_INDEX = """\
<sitemapindex>
  <sitemap><loc>https://ex.com/s1.xml</loc>
           <lastmod>2026-02-03</lastmod></sitemap>
  <sitemap><loc>https://ex.com/s2.xml</loc></sitemap>
</sitemapindex>
"""


class TestSitemapParse:
    def test_urlset_with_namespace(self):
        p = SM.parse_sitemap(SITEMAP)
        assert p["kind"] == "urlset" and p["error"] is None
        # the loc-less third <url> is skipped per spec
        assert p["entries"] == [
            ("https://ex.com/a", "2026-01-02", "daily", 800),
            ("https://ex.com/b", None, None, None),
        ]

    def test_index_without_namespace(self):
        p = SM.parse_sitemap(SITEMAP_INDEX)
        assert p["kind"] == "sitemapindex"
        assert p["entries"] == [
            ("https://ex.com/s1.xml", "2026-02-03", None, None),
            ("https://ex.com/s2.xml", None, None, None),
        ]

    def test_priority_is_integer_exact(self):
        assert SM._priority_milli("0.5") == 500
        assert SM._priority_milli("1.0") == 1000
        assert SM._priority_milli("0.123") == 123
        assert SM._priority_milli("junk") is None

    def test_malformed_and_wrong_root(self):
        assert "ParseError" in SM.parse_sitemap("<urlset><url>")["error"]
        assert "unexpected root" in SM.parse_sitemap("<html/>")["error"]


class TestSitemapSpark:
    def test_entries_and_error_envelope(self, spark):
        df = spark.createDataFrame(
            [
                ("ex.com", SITEMAP),
                ("idx.com", SITEMAP_INDEX),
                ("bad.com", "<urlset><url>"),
            ],
            "host string, sitemap_xml string",
        )
        out = SM.sitemap_entries(df)
        rows = out.collect()
        by_host: dict = {}
        for r in rows:
            by_host.setdefault(r["host"], []).append(r)
        assert [
            (r["loc"], r["entry_ord"], r["priority_milli"])
            for r in sorted(by_host["ex.com"], key=lambda r: r["entry_ord"])
        ] == [("https://ex.com/a", 0, 800), ("https://ex.com/b", 1, None)]
        assert len(by_host["idx.com"]) == 2
        assert by_host["idx.com"][0]["kind"] == "sitemapindex"
        err = by_host["bad.com"]
        assert len(err) == 1 and err[0]["loc"] is None
        assert "ParseError" in err[0]["error"]
        # errors are rows, never failures: total row count is stable
        assert out.count() == 5

    def test_no_shuffle_in_plan(self, spark):
        df = spark.createDataFrame(
            [("ex.com", SITEMAP)], "host string, sitemap_xml string"
        )
        plan = (
            SM.sitemap_entries(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
