"""C4 heuristic cleaning rules: line-keep semantics, page flags, verdict,
and byte-for-byte DuckDB oracle parity (the contract-gate guarantee)."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import c4rules as C4

DOCS = [
    # kept: 2 good sentences; dropped: short line, javascript line
    (0, "This is a good sentence.\nok\nUse javascript here today.\n"
        "Another fine long sentence!"),
    # lorem ipsum page flag (the lorem line itself is a valid line)
    (1, "Lorem ipsum dolor sit amet.\nSecond decent sentence here.\n"
        "Third proper sentence follows."),
    # brace page flag; quote-terminated line kept
    (2, 'He said "fine by me."\nvar x = { a: 1 }\n'
        "One more complete sentence.\nAnd a fourth one lands."),
    # bad word page flag
    (3, "A perfectly normal sentence.\nThe badword appears right here.\n"
        "Closing sentence number three."),
    # too few sentences after filtering
    (4, "no punctuation at all\nstill none"),
]
BAD = ("badword",)


def _frame(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


class TestC4Rules:
    def _run(self, spark):
        return {
            r["doc_id"]: r
            for r in C4.with_c4_rules(
                _frame(spark), bad_words=BAD
            ).collect()
        }

    def test_line_filter(self, spark):
        out = self._run(spark)
        assert out[0]["c4_text"] == (
            "This is a good sentence.\nAnother fine long sentence!"
        )
        assert out[0]["c4_n_lines_kept"] == 2
        assert out[0]["c4_n_lines_dropped"] == 2
        # quote counts as terminal punctuation
        assert 'He said "fine by me."' in out[2]["c4_text"]

    def test_flags_and_verdict(self, spark):
        out = self._run(spark)
        assert not out[0]["c4_has_lorem"] and out[1]["c4_has_lorem"]
        assert out[2]["c4_has_brace"] and not out[1]["c4_has_brace"]
        assert out[3]["c4_has_bad_word"] and not out[0]["c4_has_bad_word"]
        # verdicts: 1,2,3 flagged; 4 lacks sentences; 0 has only 2
        # sentence marks -> fails min_sentences=3
        assert {d: out[d]["c4_keep"] for d in out} == {
            0: False, 1: False, 2: False, 3: False, 4: False,
        }
        relaxed = {
            r["doc_id"]: r["c4_keep"]
            for r in C4.with_c4_rules(
                _frame(spark), bad_words=BAD, min_sentences=2
            ).collect()
        }
        assert relaxed[0] is True

    def test_keep_passthrough_and_collision_guard(self, spark):
        import pytest

        df = _frame(spark).withColumn("extra", F.col("doc_id") * 2)
        out = C4.with_c4_rules(df, keep=("extra",))
        assert out.select("extra").count() == len(DOCS)
        with pytest.raises(ValueError):
            C4.with_c4_rules(df.withColumnRenamed("extra", "c4_text"),
                             keep=("c4_text",))

    def test_zero_shuffle_plan(self, spark):
        plan = (
            C4.with_c4_rules(_frame(spark), bad_words=BAD)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, plan
        assert "EvalPython" not in plan, plan

    def test_duckdb_parity(self, spark):
        srows = {
            r["doc_id"]: (
                r["c4_text"],
                r["c4_n_lines_kept"],
                r["c4_n_sentences"],
                r["c4_has_brace"],
                r["c4_has_lorem"],
                r["c4_has_bad_word"],
                r["c4_keep"],
            )
            for r in self._run(spark).values()
        }
        frags = C4.oracle_c4_sql("text", bad_words=BAD)
        con = duckdb.connect()
        vals = ", ".join(
            "(%d, '%s')" % (i, t.replace("'", "''").replace("\n", "' || chr(10) || '"))
            for i, t in DOCS
        )
        sql = f"""
        WITH t(doc_id, text) AS (VALUES {vals}),
        k AS (SELECT doc_id, text, {frags['kept_lines']} AS kept FROM t),
        c AS (SELECT *,
              coalesce(list_aggregate(kept, 'string_agg', chr(10)), '')
                AS c4_text FROM k)
        SELECT doc_id, c4_text, len(kept),
               len(regexp_extract_all(c4_text, '[.!?]')),
               {frags['has_brace']}, {frags['has_lorem']},
               {frags['has_bad_word']},
               len(regexp_extract_all(c4_text, '[.!?]')) >= 3
                 AND NOT {frags['has_brace']} AND NOT {frags['has_lorem']}
                 AND NOT {frags['has_bad_word']}
        FROM c
        """
        orows = {r[0]: tuple(r[1:]) for r in con.execute(sql).fetchall()}
        assert srows == orows


GOPHER_DOCS = [
    # normal prose with enough stopwords; padded to pass the 50-word gate
    (0, "the quick brown fox jumps over and over to reach the lazy dog "
        "that waited with patience of a saint and would not have moved "
        + "word " * 40 + "end of the story that we have told with care."),
    # bullet-heavy with ellipsis endings and symbols
    (1, "- item one...\n- item two…\n- item # three\nshort"),
    # no alphabetic words
    (2, "123 456 789 000 111"),
    (3, ""),
]


class TestGopherRules:
    def _run(self, spark):
        df = spark.createDataFrame(GOPHER_DOCS, ["doc_id", "text"])
        return {
            r["doc_id"]: r for r in C4.with_gopher_rules(df).collect()
        }

    def test_counts_and_verdict(self, spark):
        out = self._run(spark)
        assert out[0]["g_keep"] is True
        assert out[0]["g_stop_hits"] >= 2
        # doc 1: 3 of 4 non-empty lines are bullets (750 pm), 2 end in
        # ellipsis (500 pm > 300), one '#' and one '...' and one '…'
        assert out[1]["g_bullet_line_pmille"] == 750
        assert out[1]["g_ellipsis_line_pmille"] == 500
        assert out[1]["g_symbol_pmille"] > 100
        assert out[1]["g_keep"] is False
        # doc 2: zero alpha words
        assert out[2]["g_alpha_word_pmille"] == 0
        assert out[2]["g_keep"] is False
        # empty doc: all-zero, not NULL, keep False
        assert out[3]["g_n_words"] == 0
        assert out[3]["g_mean_word_len_e2"] == 0
        assert out[3]["g_keep"] is False

    def test_zero_shuffle_plan(self, spark):
        df = spark.createDataFrame(GOPHER_DOCS, ["doc_id", "text"])
        plan = (
            C4.with_gopher_rules(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, plan
        assert "EvalPython" not in plan, plan

    def test_duckdb_parity(self, spark):
        srows = {
            r["doc_id"]: tuple(r[c] for c in C4._G_PRODUCED)
            for r in self._run(spark).values()
        }
        frags = C4.oracle_gopher_sql("text")
        con = duckdb.connect()
        vals = ", ".join(
            "(%d, '%s')"
            % (i, t.replace("'", "''").replace("\n", "' || chr(10) || '"))
            for i, t in GOPHER_DOCS
        )
        cols = ", ".join(
            f"{frags[c]} AS {c}" for c in C4._G_PRODUCED if c != "g_keep"
        )
        sql = f"""
        WITH t(doc_id, text) AS (VALUES {vals}),
        g AS (SELECT doc_id, {cols} FROM t)
        SELECT doc_id, g_n_words, g_mean_word_len_e2, g_symbol_pmille,
               g_alpha_word_pmille, g_bullet_line_pmille,
               g_ellipsis_line_pmille, g_stop_hits,
               g_n_words BETWEEN 50 AND 100000
                 AND g_mean_word_len_e2 BETWEEN 300 AND 1000
                 AND g_symbol_pmille <= 100
                 AND g_alpha_word_pmille >= 800
                 AND g_bullet_line_pmille <= 900
                 AND g_ellipsis_line_pmille <= 300
                 AND g_stop_hits >= 2 AS g_keep
        FROM g
        """
        orows = {r[0]: tuple(r[1:]) for r in con.execute(sql).fetchall()}
        assert srows == orows


class TestMembershipNormalization:
    def test_capitalized_punctuated_glued_stopwords_count(self, spark):
        """Review finding: 'The', 'the,' and newline-glued stopwords
        missed the membership test; membership normalizes, counts stay
        raw."""
        df = spark.createDataFrame(
            [(0, "The cat sat.\nOf course, that is it — and so be it,")],
            ["doc_id", "text"],
        )
        out = C4.with_gopher_rules(df).collect()[0]
        # the(cap), of(cap+newline-adjacent), that, and, be => >= 5
        assert out["g_stop_hits"] >= 5, out["g_stop_hits"]

    def test_bad_word_after_newline_detected(self, spark):
        df = spark.createDataFrame(
            [(0, "clean start\nBadword, lands here.")], ["doc_id", "text"]
        )
        out = C4.with_c4_rules(df, bad_words=("badword",)).collect()[0]
        assert out["c4_has_bad_word"] is True

    def test_membership_parity(self, spark):
        import duckdb as dd

        text = "The cat.\nof COURSE, that...\nBadword! and\tso be it"
        df = spark.createDataFrame([(0, text)], ["doc_id", "text"])
        srow = C4.with_gopher_rules(df).collect()[0]
        con = dd.connect()
        frags = C4.oracle_gopher_sql("text")
        lit = text.replace("'", "''").replace("\n", "' || chr(10) || '").replace("\t", "' || chr(9) || '")
        o = con.execute(
            f"SELECT {frags['g_stop_hits']} FROM (SELECT '{lit}' AS text)"
        ).fetchone()[0]
        assert srow["g_stop_hits"] == o
