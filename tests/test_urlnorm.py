"""URL canonicalization (operators/urlnorm.py): planted RFC cases, the
Spark-vs-Python-mirror equivalence, idempotence, and the plan shape
(pure codegen, no Python stages)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import urlnorm as UN

# (input, expected canonical) — each pins one rule family
CASES = [
    # scheme+host lowercase, default port, dot segments, unreserved
    # decode, tracking drop, query sort, fragment strip
    (
        "HTTP://WWW.Ex.COM:80/a/./b/../c%7ad/?b=2&a=1&utm_source=x#frag",
        "http://www.ex.com/a/czd/?a=1&b=2",
    ),
    # %41 decodes (unreserved 'A'), %2f does NOT (reserved '/'), hex
    # uppercased; valueless param kept; gclid dropped
    ("https://Ex.COM:443/%41%2f/p?x&gclid=1", "https://ex.com/A%2F/p?x"),
    # leading '..' ignored at root; decoded %2e is NOT a dot segment
    ("https://ex.com/../a%2e/", "https://ex.com/a./"),
    # userinfo preserved, trailing host root-dot stripped, non-default
    # port kept, fragment stripped
    ("http://u:p@Ex.COM.:8080/p#f", "http://u:p@ex.com:8080/p"),
    # empty path -> '/'
    ("https://ex.com", "https://ex.com/"),
    ("https://ex.com?a=1", "https://ex.com/?a=1"),
    # trailing '.'/'..' keep a slash (RFC remove_dot_segments)
    ("https://ex.com/a/b/..", "https://ex.com/a/"),
    ("https://ex.com/a/.", "https://ex.com/a/"),
    # duplicate slashes are real empty segments, preserved / poppable
    ("https://ex.com/a//../b", "https://ex.com/a/b"),
    # empty params dropped; '&&' collapses
    ("https://ex.com/p?&&a=1&", "https://ex.com/p?a=1"),
    # all params dropped -> no '?'
    ("https://ex.com/p?utm_source=a&utm_medium=b", "https://ex.com/p"),
    # invalid escape passes through, valid one uppercases
    ("https://ex.com/a%zz%3fb", "https://ex.com/a%zz%3Fb"),
    # non-hierarchical input passes through trimmed
    ("  mailto:x@y.com  ", "mailto:x@y.com"),
    # http on 443 is NOT default
    ("http://ex.com:443/", "http://ex.com:443/"),
]


def _spark_canon(spark, urls: list[str]) -> list[str]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = UN.with_canonical_url(df).select("url", "canon_url").collect()
    by_in = {r["url"]: r["canon_url"] for r in out}
    return [by_in[u] for u in urls]


class TestCanonicalUrl:
    def test_planted_cases_spark(self, spark):
        got = _spark_canon(spark, [u for u, _ in CASES])
        for (u, want), g in zip(CASES, got):
            assert g == want, f"{u!r}: got {g!r}, want {want!r}"

    def test_planted_cases_python_mirror(self):
        for u, want in CASES:
            assert UN.canonical_url_py(u) == want, u

    def test_idempotent(self, spark):
        canon = [UN.canonical_url_py(u) for u, _ in CASES]
        again = _spark_canon(spark, canon)
        assert again == canon

    def test_spark_matches_python_on_fuzz(self, spark):
        # deterministic structured fuzz: every combination of the parts
        schemes = ["http", "HTTPS"]
        hosts = ["A.b.C", "ex.com.", "10.0.0.5:8080", "u@Ex.com:80"]
        paths = ["", "/x/../y%2E/z", "/%61//%2f/..", "/."]
        queries = ["", "?b=%41&a=2&utm_x=1", "?&fbclid=9&z"]
        urls = [
            f"{s}://{h}{p}{q}#frag"
            for s in schemes
            for h in hosts
            for p in paths
            for q in queries
        ]
        got = _spark_canon(spark, urls)
        want = [UN.canonical_url_py(u) for u in urls]
        assert got == want

    def test_pure_codegen_plan(self, spark):
        df = spark.createDataFrame([("https://ex.com/a/../b?x=1",)], "url string")
        plan = UN.with_canonical_url(df)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        assert "Exchange" not in plan

    def test_no_sort_keeps_order(self, spark):
        df = spark.createDataFrame(
            [("https://ex.com/p?b=2&a=1",)], "url string"
        )
        r = (
            UN.with_canonical_url(df, sort_query=False)
            .select("canon_url")
            .collect()[0][0]
        )
        assert r == "https://ex.com/p?b=2&a=1"
