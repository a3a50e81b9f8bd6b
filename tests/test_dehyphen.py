"""OCR dehyphenation (functions/dehyphen.py): hand-pinned repair
battery, single-pass chain semantics, the pure-codegen plan pin
(no Exchange, no Python stage), None safety, the collision guard, and
Spark-vs-DuckDB parity through the module's own oracle CTE chain."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from index_search_monorepo_spark.functions import dehyphen as DH

# (input, expected_text, expected_n_joined, expected_n_kept) — every
# expected value is hand-derived from the two rules, never from the
# implementation.
PINNED = [
    ("", "", 0, 0),
    ("no hyphens here", "no hyphens here", 0, 0),
    # R1: lowercase continuation -> join
    ("exam-\nple", "example", 1, 0),
    ("re- \n  do", "redo", 1, 0),
    ("exam-\t\nple", "example", 1, 0),
    # R2: uppercase continuation -> keep hyphen, drop break
    ("Smith-\nJones", "Smith-Jones", 0, 1),
    # digits and dangling hyphens are untouched
    ("4-\n2", "4-\n2", 0, 0),
    ("dangling-\n", "dangling-\n", 0, 0),
    ("A-\nb stays: uppercase BEFORE the hyphen", None, 0, 0),
    # hyphen not at a line break is untouched
    ("twenty-one", "twenty-one", 0, 0),
    # single-pass chain: the consumed continuation letter cannot anchor
    # the next match (documented semantics, identical in Java and RE2)
    ("a-\nb-\nc", "ab-\nc", 1, 0),
    # both rules in one document
    (
        "mixed exam-\nple then Smith-\nJones end",
        "mixed example then Smith-Jones end",
        1,
        1,
    ),
    # non-ASCII letters are untouched (a repair stage must never corrupt
    # what it cannot classify)
    ("café-\nétude", "café-\nétude", 0, 0),
]


def _expected_text(raw, exp):
    # None expected-text means "unchanged"
    return raw if exp is None else exp


def test_pinned_battery(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, *_rest) in enumerate(PINNED)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in DH.with_dehyphenation(df).collect()}
    for i, (raw, exp, nj, nk) in enumerate(PINNED):
        r = rows[i]
        assert r["dh_text"] == _expected_text(raw, exp), raw
        assert (r["dh_n_joined"], r["dh_n_kept"]) == (nj, nk), raw


def test_none_safe(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = DH.with_dehyphenation(df).collect()[0]
    assert r["dh_text"] is None


def test_pure_codegen_plan(spark):
    """Zero shuffles, zero Python stages: the operator must stay inside
    whole-stage codegen projections."""
    df = spark.createDataFrame([(1, "exam-\nple")], "doc_id long, text string")
    plan = (
        DH.with_dehyphenation(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_collision_guard(spark):
    df = spark.createDataFrame(
        [(1, "x", "y")], "doc_id long, text string, dh_text string"
    )
    with pytest.raises(ValueError, match="dh_text"):
        DH.with_dehyphenation(df)


def test_duckdb_parity(spark):
    """Spark columns vs the module's own oracle CTE chain, value for
    value over the battery plus a messy multi-site document."""
    extra = "long bro-\nken li- \n ne then Four-\nScore and 7-\n8 more-\n"
    data = [(i, raw) for i, (raw, *_r) in enumerate(PINNED)] + [
        (len(PINNED), extra)
    ]
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["dh_n_joined"], r["dh_n_kept"], r["dh_text"])
        for r in DH.with_dehyphenation(df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join("(?, ?)" for _ in data)
        + ") AS t(doc_id, text)",
        [v for row in data for v in row],
    )
    oracle = con.execute(
        f"WITH {DH.dehyphen_oracle_sql()}\n"
        "SELECT doc_id, dh_n_joined, dh_n_kept, dh_text FROM dh_out"
    ).fetchall()
    assert len(oracle) == len(data)
    for doc_id, nj, nk, text in oracle:
        assert got[doc_id] == (nj, nk, text), doc_id


def test_applies_over_real_corpus_text(spark):
    """The operator must run over the real documents table without
    error and never INCREASE text length."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = (
        DH.with_dehyphenation(docs.select("doc_id", "text"))
        .select(
            F.sum(
                (F.length("dh_text") > F.length("text")).cast("int")
            ).alias("grew"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    assert out["n"] > 0 and out["grew"] == 0
