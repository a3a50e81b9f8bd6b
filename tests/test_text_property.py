"""Property-based bit-exactness: the column-expression text semantics vs
CPython itself (xml.sax.saxutils) and the transliterated reference oracle,
over hypothesis-generated adversarial strings. One Spark round-trip per
test (all examples batched into a single DataFrame) keeps this fast."""

from __future__ import annotations

from xml.sax.saxutils import quoteattr as py_quoteattr

from hypothesis import given, settings, strategies as st

from index_search_monorepo_spark.functions.text import (
    quoteattr_expr,
    string_preparation_expr,
    xmlesc_expr,
)
from index_search_monorepo_spark.oracle.reference_oracle import (
    oracle_string_preparation,
)

# adversarial alphabet: XML specials, both quote kinds, CR/LF/TAB, unicode
# whitespace, multibyte, combining marks
_ALPHABET = st.sampled_from(
    list("abc &<>\"'\r\n\t\xa0 \u3000\xe9\xdf\xf1\u092a\u0301") + ["\U0001F600"]
)
_TEXT = st.text(alphabet=_ALPHABET, min_size=0, max_size=40)


def _run_expr(spark, values, expr_fn):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "i long, s string"
    )
    rows = df.select("i", expr_fn(F.col("s")).alias("out")).collect()
    return [r["out"] for r in sorted(rows, key=lambda r: r["i"])]


def _examples() -> list[str]:
    # deterministic corpus of adversarial strings via hypothesis' generator
    acc: list[str] = []

    @settings(max_examples=200, deadline=None, derandomize=True)
    @given(_TEXT)
    def gen(s):
        acc.append(s)

    gen()
    # pinned edge cases
    acc += [
        "", '"', "'", "\"'", "'\"", "&", "a\rb\nc", "  x  ", "\t", "&amp;",
        '<a href="x">\'</a>', "\r\n\r\n", " \xa0 mixed 　 ", "पृष्ठ", "año",
    ]
    return acc


def test_quoteattr_matches_cpython(spark):
    vals = _examples()
    got = _run_expr(spark, vals, quoteattr_expr)
    want = [py_quoteattr(v) for v in vals]
    bad = [(v, g, w) for v, g, w in zip(vals, got, want) if g != w]
    assert not bad, bad[:5]


def test_string_preparation_matches_oracle(spark):
    vals = _examples()
    got = _run_expr(spark, vals, string_preparation_expr)
    want = [oracle_string_preparation(v) for v in vals]
    bad = [(v, g, w) for v, g, w in zip(vals, got, want) if g != w]
    assert not bad, bad[:5]


def test_xmlesc_matches_reference(spark):
    table = str.maketrans(
        {"<": "&lt;", ">": "&gt;", "&": "&amp;", "'": "&apos;", '"': "&quot;"}
    )
    vals = _examples()
    got = _run_expr(spark, vals, xmlesc_expr)
    want = [v.translate(table) for v in vals]
    assert got == want
