"""Aho-Corasick multi-pattern matching (operators/multipattern.py):
classic-textbook hand battery, overlap semantics, a brute-force
position-scan mirror on random strings, the single-ArrowEvalPython
plan pin (incl. under a result-column filter), validation, and DuckDB
parity through the module's independent oracle formulation."""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import multipattern as MP

CLASSIC = ("he", "she", "his", "hers")


def _brute(text, patterns):
    hits = []
    for pi, p in enumerate(patterns):
        for i in range(len(text) - len(p) + 1):
            if text[i : i + len(p)] == p:
                hits.append((i + len(p) - 1, pi))
    return sorted(hits)


def test_classic_textbook_case():
    auto = MP.build_automaton(CLASSIC)
    # "ushers": she ends at 3, he ends at 3, hers ends at 5
    got = sorted(MP.ac_find_all("ushers", auto))
    assert got == _brute("ushers", CLASSIC)
    assert len(got) == 3


def test_overlaps_within_one_pattern():
    auto = MP.build_automaton(("aa",))
    assert len(MP.ac_find_all("aaa", auto)) == 2
    assert len(MP.ac_find_all("aaaa", auto)) == 3


def test_brute_force_mirror_random():
    rng = random.Random(11)
    pats = ("ab", "ba", "aab", "abab", "bb")
    auto = MP.build_automaton(pats)
    for _ in range(60):
        t = "".join(rng.choice("ab") for _ in range(rng.randint(0, 40)))
        assert sorted(MP.ac_find_all(t, auto)) == _brute(t, pats), t


def test_validation():
    with pytest.raises(ValueError):
        MP.build_automaton(())
    with pytest.raises(ValueError):
        MP.build_automaton(("a", ""))
    with pytest.raises(ValueError):
        MP.build_automaton(("x", "x"))


def test_spark_columns(spark):
    df = spark.createDataFrame(
        [
            (0, "ushers and his hers"),
            (1, "clean text"),
            (2, None),
            (3, "shehe"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in MP.with_pattern_matches(df, CLASSIC).collect()
    }
    # doc 0: ushers -> 3 (he, she, hers) + " his " -> his(1) + " hers"
    # -> he, hers (2 more... hand-check via brute force instead)
    for i, t in [(0, "ushers and his hers"), (3, "shehe")]:
        hits = _brute(t, CLASSIC)
        seen = {p for _e, p in hits}
        assert rows[i]["mp_n_matches"] == len(hits)
        assert rows[i]["mp_n_patterns"] == len(seen)
        assert rows[i]["mp_first_pattern"] == min(CLASSIC[p] for p in seen)
        assert rows[i]["mp_hit"] == 1
    assert rows[1]["mp_n_matches"] == 0 and rows[1]["mp_hit"] == 0
    assert rows[1]["mp_first_pattern"] == ""
    assert rows[2]["mp_n_matches"] == 0 and rows[2]["mp_hit"] == 0


def test_single_arrow_stage_under_filter(spark):
    """Filtering on a derived column must not duplicate the kernel
    (CLAUDE.md lesson #9: the UDF is nondeterministic-pinned)."""
    df = spark.createDataFrame([(1, "ushers")], "doc_id long, text string")
    plan = (
        MP.with_pattern_matches(df, CLASSIC)
        .filter(F.col("mp_hit") == 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "Exchange" not in plan, plan


def test_collision_guard(spark):
    df = spark.createDataFrame(
        [(1, "x", 1)], "doc_id long, text string, mp_hit long"
    )
    with pytest.raises(ValueError, match="mp_hit"):
        MP.with_pattern_matches(df, CLASSIC)


def test_duckdb_parity_real_docs(spark):
    pats = ("the", "he", "ing", "qu'x")  # incl. a quote for escaping
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(60)
    )
    got = {
        r["doc_id"]: (
            r["mp_n_matches"],
            r["mp_n_patterns"],
            r["mp_first_pattern"],
            r["mp_hit"],
        )
        for r in MP.with_pattern_matches(docs, pats).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT doc_id, text FROM "
        "'/root/testdata/sf0.001/documents.parquet'"
    )
    oracle = con.execute(
        f"WITH {MP.pattern_matches_oracle_sql(pats)}\n"
        "SELECT doc_id, mp_n_matches, mp_n_patterns, mp_first_pattern,"
        " mp_hit FROM mp_out"
    ).fetchall()
    ora = {r[0]: tuple(r[1:]) for r in oracle}
    common = set(got) & set(ora)
    assert len(common) >= 30
    for k in common:
        assert got[k] == ora[k], k
