"""KWIC snippets + SymSpell fuzzy suggestion (search/suggest.py)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from index_search_monorepo_spark.search.suggest import (
    deletion_neighborhood,
    fuzzy_suggestions,
    kwic_oracle_sql,
    suggestion_oracle_sql,
    term_dictionary,
    with_snippet,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


class TestKwic:
    ROWS = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank"),
        (1, "alpha beta gamma"),  # no term -> NULL
        (2, "fox at the very start of this line with plenty of trailing text"),
        (3, "padded padded padded padded padded dog tail tail tail tail tail"),
        (4, "DOG uppercase match via lowering with more words after it here"),
        (5, "dogfox adjacency: both at same region, earliest position wins"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(self.ROWS, "doc_id long, text string")

    def test_windows_and_edges(self, spark):
        out = {
            r["doc_id"]: r["snippet"]
            for r in with_snippet(
                self._df(spark), ["fox", "dog"], radius=10
            ).collect()
        }
        # interior match: 10 chars either side of "fox" (pos 17, len 3)
        assert out[0] == "ick brown fox jumps ove"
        assert out[1] is None
        # clamp at string start
        assert out[2] == self.ROWS[2][1][: 3 + 10]
        # case-insensitive match, original casing preserved in the window
        assert out[4].startswith("DOG")
        # earliest position wins over term order: "dogfox" matches dog at 1
        assert out[5].startswith("dogfox")

    def test_tie_breaks_on_term_order(self, spark):
        df = spark.createDataFrame([(0, "abc")], "doc_id long, text string")
        # both terms match at position 1; "ab" is first in the list -> len 2
        got = with_snippet(df, ["ab", "abc"], radius=0).collect()[0]["snippet"]
        assert got == "ab"

    def test_matches_duckdb_mirror(self, spark):
        got = (
            with_snippet(self._df(spark), ["fox", "dog"], radius=10)
            .orderBy("doc_id")
            .select("snippet")
            .collect()
        )
        con = duckdb.connect()
        con.register("t", pd.DataFrame(self.ROWS, columns=["doc_id", "text"]))
        expr = kwic_oracle_sql("text", ["fox", "dog"], radius=10)
        want = con.execute(
            f"SELECT {expr} FROM t ORDER BY doc_id"
        ).fetchall()
        assert [r["snippet"] for r in got] == [w[0] for w in want]

    def test_plan_pure_codegen(self, spark):
        plan = _plan(with_snippet(self._df(spark), ["fox", "dog"]))
        assert "Exchange" not in plan
        assert "EvalPython" not in plan and "PythonUDF" not in plan

    def test_requires_terms(self, spark):
        with pytest.raises(ValueError):
            with_snippet(self._df(spark), [])


class TestSymSpell:
    DOCS = [
        (0, "spark line table row row"),
        (1, "slow row spark spark line"),
        (2, "sort spark row merge"),
    ]

    def _dict(self, spark):
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        return term_dictionary(df)

    def test_term_dictionary_counts(self, spark):
        got = {r["term"]: r["freq"] for r in self._dict(spark).collect()}
        assert got == {
            "spark": 4,
            "line": 2,
            "table": 1,
            "row": 4,
            "slow": 1,
            "sort": 1,
            "merge": 1,
        }

    def test_matches_brute_force(self, spark):
        vocab = {r["term"]: r["freq"] for r in self._dict(spark).collect()}
        queries = ["sprk", "sow", "roww", "line", "zzz", "mergee"]
        got = {
            (r["qterm"], r["rank"]): (r["term"], r["freq"])
            for r in fuzzy_suggestions(
                self._dict(spark), queries, max_edit=1, topk=3
            ).collect()
        }
        want = {}
        for q in queries:
            cands = sorted(
                [(t, f) for t, f in vocab.items() if _lev(q, t) <= 1],
                key=lambda tf: (-tf[1], tf[0]),
            )
            for rk, (t, f) in enumerate(cands[:3], 1):
                want[(q, rk)] = (t, f)
        assert got == want

    def test_ranking_freq_then_term(self, spark):
        # "sow": row(4) beats slow(1); sort is at distance 2 and excluded
        got = [
            (r["term"], r["freq"], r["rank"])
            for r in fuzzy_suggestions(self._dict(spark), ["sow"], topk=5)
            .orderBy("rank")
            .collect()
        ]
        assert got == [("row", 4, 1), ("slow", 1, 2)]

    def test_depth1_full_recall_at_distance_1(self, spark):
        """Every vocabulary pair at distance <= 1 shares a depth-1 delete
        variant — the SymSpell recall guarantee the join relies on."""
        terms = ["a", "b", "ab", "ba", "abc", "abd", "xabc", "bc", "ac"]
        df = spark.createDataFrame([(t,) for t in terms], "term string")
        nb = deletion_neighborhood(df, "term", depth=1)
        variants: dict[str, set] = {}
        for r in nb.collect():
            variants.setdefault(r["term"], set()).add(r["variant"])
        for i, a in enumerate(terms):
            for b in terms[i + 1 :]:
                if _lev(a, b) <= 1:
                    assert variants[a] & variants[b], (a, b)

    def test_max_edit_2_via_depth_2(self, spark):
        got = {
            r["term"]
            for r in fuzzy_suggestions(
                self._dict(spark), ["sot"], max_edit=2, topk=10
            ).collect()
        }
        vocab = {r["term"] for r in self._dict(spark).collect()}
        want = {t for t in vocab if _lev("sot", t) <= 2}
        assert got == want and "sort" in got

    def test_oracle_sql_mirror(self, spark):
        con = duckdb.connect()
        con.register(
            "documents", pd.DataFrame(self.DOCS, columns=["doc_id", "text"])
        )
        for q, rank in [("sow", 1), ("sow", 2), ("sprk", 1), ("zzz", 1)]:
            want = con.execute(
                f"SELECT {suggestion_oracle_sql(q, rank)}"
            ).fetchone()[0]
            rows = {
                r["rank"]: f"{r['term']}:{r['freq']}"
                for r in fuzzy_suggestions(
                    self._dict(spark), [q], topk=rank
                ).collect()
            }
            assert rows.get(rank) == want, (q, rank)

    def test_plan_query_side_broadcast_no_text_shuffle(self, spark):
        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        sugg = fuzzy_suggestions(term_dictionary(df), ["sprk"], topk=1)
        plan = _plan(sugg)
        # the variant join must broadcast the literal query side; nothing
        # in the path is Python or a cartesian product
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan and "EvalPython" not in plan
        # document text enters exactly one node: the wordcount's explode
        # projection feeding the partial aggregate (vocabulary grain from
        # there on)
        assert plan.count("text#") <= plan.count("Scan") + 2

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            fuzzy_suggestions(self._dict(spark), [], topk=1)
        with pytest.raises(ValueError):
            fuzzy_suggestions(self._dict(spark), ["x"], max_edit=0)
        with pytest.raises(ValueError):
            deletion_neighborhood(
                self._dict(spark).select("term"), "term", depth=0
            )
