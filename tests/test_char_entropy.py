"""Character-entropy quality signal (textstats.with_char_entropy):
hand-exact surrogate arithmetic, the log2 sanity envelope, the
pure-codegen plan pin, None/empty safety, collision guard, and
Spark-vs-DuckDB parity through the module's independent unnest+groupby
oracle formulation."""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import textstats as TS

# (text, n, distinct, bits_e3) — hand-derived:
#   "aab":  n=3 counts {a:2, b:1}; bitlen(3)=2
#           sur = 2*(2-2) + 1*(2-1) = 1 -> 1000*1 DIV 3 = 333
#   "abcd": n=4 each 1; bitlen(4)=3, bitlen(1)=1
#           sur = 4*(3-1) = 8 -> 2000   (true H = 2.000 bits)
#   "aaaa": sur = 4*(3-3) = 0 -> 0      (true H = 0)
PINNED = [
    ("", 0, 0, 0),
    ("a", 1, 1, 0),
    ("aab", 3, 2, 333),
    ("abcd", 4, 4, 2000),
    ("aaaa", 4, 1, 0),
    # n=8 {a:2,b:2,' ':2,'\n':2}; bitlen(8)=4, bitlen(2)=2
    # sur = 4 * 2*(4-2) = 16 -> 1000*16 DIV 8 = 2000
    ("a b\na b\n", 8, 4, 2000),
]


def test_pinned_battery(spark):
    df = spark.createDataFrame(
        [(i, t) for i, (t, *_r) in enumerate(PINNED)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in TS.with_char_entropy(df).collect()}
    for i, (t, n, d, e3) in enumerate(PINNED):
        r = rows[i]
        assert (
            r["ent_n_chars"],
            r["ent_distinct"],
            r["ent_bits_e3"],
        ) == (n, d, e3), t


def test_low_flag(spark):
    df = spark.createDataFrame(
        [
            (0, "a" * 50),          # 0 bits over >= 20 chars -> low
            (1, "ab"),              # short -> exempt
            (2, "the quick brown fox jumps over the lazy dog XYZ"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["ent_low"]
        for r in TS.with_char_entropy(df).collect()
    }
    assert got == {0: 1, 1: 0, 2: 0}


def test_surrogate_tracks_log2(spark):
    """The bitlen surrogate must stay within 2 bits of true Shannon
    entropy on mixed real-ish text."""
    texts = [
        "The quick brown fox jumps over the lazy dog.",
        "abab " * 40,
        "Lorem ipsum dolor sit amet, consectetur adipiscing elit.",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in TS.with_char_entropy(df).collect()}
    for i, t in enumerate(texts):
        from collections import Counter

        c = Counter(t)
        n = len(t)
        h = -sum(v / n * math.log2(v / n) for v in c.values())
        sur = rows[i]["ent_bits_e3"] / 1000.0
        assert abs(sur - h) <= 2.0, (t[:20], sur, h)


def test_none_and_empty_safe(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in TS.with_char_entropy(df).collect()}
    # regexp_extract_all(NULL) -> NULL array; size() -> -1? guard: both
    # must land on non-positive n with bits 0 and low 0
    assert rows[2]["ent_n_chars"] == 0 and rows[2]["ent_bits_e3"] == 0
    assert rows[2]["ent_low"] == 0


def test_pure_codegen_plan(spark):
    df = spark.createDataFrame([(1, "abcabc")], "doc_id long, text string")
    plan = (
        TS.with_char_entropy(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_collision_guard(spark):
    df = spark.createDataFrame(
        [(1, "x", 2)], "doc_id long, text string, ent_n_chars long"
    )
    with pytest.raises(ValueError, match="ent_n_chars"):
        TS.with_char_entropy(df)


def test_duckdb_parity_real_docs(spark):
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(80)
    )
    got = {
        r["doc_id"]: (
            r["ent_n_chars"],
            r["ent_distinct"],
            r["ent_bits_e3"],
            r["ent_low"],
        )
        for r in TS.with_char_entropy(docs).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT doc_id, text FROM "
        "'/root/testdata/sf0.001/documents.parquet' "
        "ORDER BY doc_id LIMIT 80"
    )
    oracle = con.execute(
        f"WITH {TS.char_entropy_oracle_sql()}\n"
        "SELECT doc_id, ent_n_chars, ent_distinct, ent_bits_e3, ent_low"
        " FROM ent_out"
    ).fetchall()
    # limit(80) in Spark is arbitrary-80; compare on the intersection
    ora = {r[0]: tuple(r[1:]) for r in oracle}
    common = set(got) & set(ora)
    assert len(common) >= 40
    for k in common:
        assert got[k] == ora[k], k


def test_duckdb_parity_non_ascii(spark):
    """Codepoint grain must agree on non-ASCII (BMP) text."""
    data = [(1, "héllo wörld héllo"), (2, "€€€ abc €€€"), (3, "日本語テキスト")]
    df = spark.createDataFrame(data, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["ent_n_chars"], r["ent_distinct"], r["ent_bits_e3"])
        for r in TS.with_char_entropy(df).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join("(?, ?)" for _ in data)
        + ") AS t(doc_id, text)",
        [v for row in data for v in row],
    )
    oracle = con.execute(
        f"WITH {TS.char_entropy_oracle_sql()}\n"
        "SELECT doc_id, ent_n_chars, ent_distinct, ent_bits_e3 FROM ent_out"
    ).fetchall()
    assert {r[0]: tuple(r[1:]) for r in oracle} == got
