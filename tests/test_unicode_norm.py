"""NFC normalization (functions/unicode_norm.py): the Python-vs-DuckDB
parity battery (unicodedata vs utf8proc), the derived-column semantics,
the single-ArrowEvalPython plan pin, and the collision guard."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from index_search_monorepo_spark.functions import unicode_norm as UN

# Each case pins one normalization family. All strings are also run
# through DuckDB's nfc_normalize to pin cross-engine parity (the
# contract gate hashes the normalized bytes on both sides).
CASES = [
    "café",  # combining acute -> precomposed U+00E9
    "café́",  # double combining mark (only first composes)
    "Å",  # A + combining ring -> U+00C5
    "각",  # Hangul jamo L+V+T -> precomposed syllable
    "가",  # Hangul jamo L+V -> precomposed syllable
    "café",  # already NFC: unchanged
    "ﬁ",  # fi ligature: NFC-invariant (NFKC would expand)
    "Å",  # ANGSTROM SIGN: canonical singleton -> U+00C5
    "q̣̇",  # mark reordering under canonical ordering
    "ascii only",  # pure ASCII: unchanged
    "",  # empty
    "à̖b",  # marks of different combining classes
]


def test_python_duckdb_parity():
    con = duckdb.connect()
    for s in CASES:
        py = unicodedata.normalize("NFC", s)
        db = con.execute("SELECT nfc_normalize(?)", [s]).fetchone()[0]
        assert py == db, f"engine mismatch for {s!r}: {py!r} vs {db!r}"


def test_with_nfc_columns(spark):
    rows = [(i, s) for i, s in enumerate(CASES)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in UN.with_nfc(df).collect()
    }
    for i, s in enumerate(CASES):
        exp = unicodedata.normalize("NFC", s)
        r = out[i]
        assert r["nfc_text"] == exp
        assert r["nfc_changed"] == (1 if exp != s else 0)
        assert r["nfc_chars"] == len(exp)


def test_none_safe(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    r = UN.with_nfc(df).collect()[0]
    assert r["nfc_text"] is None and r["nfc_changed"] is None


def test_single_arrow_stage(spark):
    """The three derived columns must share ONE normalization pass
    (CLAUDE.md lesson #1: withColumn Project boundary keeps the UDF
    from being inlined into each consumer)."""
    df = spark.createDataFrame([(1, "café")], "doc_id long, text string")
    plan = (
        UN.with_nfc(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") == 1, plan


def test_collision_guard(spark):
    df = spark.createDataFrame(
        [(1, "x", "y")], "doc_id long, text string, nfc_text string"
    )
    with pytest.raises(ValueError, match="nfc_text"):
        UN.with_nfc(df)


def test_oracle_fragments_parity(spark):
    """The SQL fragments the contract entry uses must agree with the
    Spark columns value-for-value over the battery."""
    frags = UN.nfc_oracle_fragments("text")
    con = duckdb.connect()
    for s in CASES:
        row = con.execute(
            f"SELECT {frags['nfc_text']} AS t, {frags['nfc_changed']} AS c,"
            f" {frags['nfc_chars']} AS n FROM (SELECT ? AS text)",
            [s],
        ).fetchone()
        exp = unicodedata.normalize("NFC", s)
        assert row == (exp, int(exp != s), len(exp))
