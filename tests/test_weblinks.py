"""DOM metadata + outlink operators (operators/weblinks.py): struct
column, link-graph explode (single UDF evaluation, lesson #8), and the
frontier domain rollup with blocklist flags."""

from __future__ import annotations

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import weblinks as WL

HTML_A = (
    '<html lang="en"><head><title>Page A</title>'
    '<meta name="description" content="da">'
    '<link rel="canonical" href="/ca"></head><body>'
    '<a href="/l1">one</a><a href="http://other.ex2.com/x">two</a>'
    "</body></html>"
)
HTML_B = '<html><body><a href="/only">b</a></body></html>'


def _df(spark):
    return spark.createDataFrame(
        [
            ("http://a.example.com/p", HTML_A),
            ("http://b.example.org/q", HTML_B),
            ("http://c.example.net/r", ""),
        ],
        ["doc_id", "html"],
    )


class TestMetadata:
    def test_struct_columns(self, spark):
        out = {
            r["doc_id"]: r
            for r in WL.with_html_metadata(_df(spark))
            .select("doc_id", "html_meta.*")
            .collect()
        }
        a = out["http://a.example.com/p"]
        assert a["title"] == "Page A"
        assert a["lang"] == "en"
        assert a["description"] == "da"
        assert a["canonical"] == "http://a.example.com/ca"
        assert a["n_links"] == 2
        assert a["first_href"] == "http://a.example.com/l1"
        b = out["http://b.example.org/q"]
        assert b["title"] is None and b["n_links"] == 1
        c = out["http://c.example.net/r"]
        assert c["n_links"] == 0 and c["first_href"] is None


class TestOutlinks:
    def test_rows_and_resolution(self, spark):
        rows = sorted(
            (r["doc_id"], r["href"], r["anchor"])
            for r in WL.outlinks(_df(spark)).collect()
        )
        assert rows == [
            ("http://a.example.com/p", "http://a.example.com/l1", "one"),
            ("http://a.example.com/p", "http://other.ex2.com/x", "two"),
            ("http://b.example.org/q", "http://b.example.org/only", "b"),
        ]

    def test_single_udf_evaluation(self, spark):
        """lesson #8: the explode of the UDF-derived links array must not
        duplicate the ArrowEvalPython stage."""
        plan = WL.outlinks(_df(spark))._jdf.queryExecution().executedPlan().toString()
        assert plan.count("ArrowEvalPython") == 1, plan

    def test_domain_rollup(self, spark):
        links = WL.outlinks(_df(spark))
        out = {
            r["registered_domain"]: (r["n_links"], r["n_docs"], r["any_blocked"])
            for r in WL.outlink_domains(links, blocked=["ex2.com"]).collect()
        }
        assert out["example.com"] == (1, 1, 0)
        assert out["ex2.com"] == (1, 1, 1)
        assert out["example.org"] == (1, 1, 0)
