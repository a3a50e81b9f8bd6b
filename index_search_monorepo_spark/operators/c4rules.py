"""C4-style heuristic cleaning rules (Raffel et al. 2020, §2.2).

The classic pre-training text filter chain, Spark-first: line-level keep
rules (a line survives when it ends in terminal punctuation, has at least
`min_words` words, and does not mention 'javascript') and page-level
flags (too few sentences after line filtering, a '{' anywhere — code, not
prose — a 'lorem ipsum' marker, any token on a caller-supplied bad-word
list). Everything is pure per-row codegen regex/array expressions in the
Java-regex/RE2 common subset so the DuckDB oracle reproduces every byte
(the pii.py / urlfilter.py parity discipline) — zero joins, zero
shuffles; the whole stage rides the scan at any corpus size.

No counterpart in /root/reference (closed library corpus); part of the
training-data curation set the build brief makes first-class.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from index_search_monorepo_spark.operators.textstats import (
    _check_keep,
    tokens_expr,
)

TERMINAL_PUNCT_RE = '[.!?"]$'
SENTENCE_MARK_RE = "[.!?]"

_PRODUCED = (
    "c4_text",
    "c4_n_lines_kept",
    "c4_n_lines_dropped",
    "c4_n_sentences",
    "c4_has_brace",
    "c4_has_lorem",
    "c4_has_bad_word",
    "c4_keep",
)


def line_keep_expr(line: Column, min_words: int = 3) -> Column:
    """C4 line rule: terminal punctuation, >= min_words words, no
    'javascript'. Each sub-predicate reads the lambda variable once —
    no repeated non-cheap subexpression (CLAUDE.md lesson 1)."""
    words = F.size(F.filter(F.split(line, " "), lambda w: w != F.lit("")))
    return (
        F.rtrim(line).rlike(TERMINAL_PUNCT_RE)
        & (words >= F.lit(int(min_words)))
        & ~F.lower(line).contains("javascript")
    )


def with_c4_rules(
    df: DataFrame,
    text_col: str = "text",
    bad_words: tuple[str, ...] = (),
    min_words: int = 3,
    min_sentences: int = 3,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Add the C4 cleaning columns:

      c4_text            line-filtered text (kept lines joined by \\n)
      c4_n_lines_kept / c4_n_lines_dropped
      c4_n_sentences     terminal marks ([.!?]) in c4_text
      c4_has_brace       '{' anywhere in the ORIGINAL text
      c4_has_lorem       'lorem ipsum' (case-insensitive) in the original
      c4_has_bad_word    any lowercased token on `bad_words`
      c4_keep            the page verdict: enough sentences and no flags

    `_parts`/`_kept` are bound behind Project boundaries (each referenced
    twice; HOFs are interpreted — no CSE)."""
    _check_keep(keep, _PRODUCED)
    t = F.col(text_col)
    bad = (
        F.arrays_overlap(
            F.transform(tokens_expr(t), lambda w: F.lower(w)),
            F.array(*[F.lit(b.lower()) for b in bad_words]),
        )
        if bad_words
        else F.lit(False)
    )
    bound = (
        df.withColumn("_parts", F.split(t, "\n"))
        .withColumn(
            "_kept",
            F.filter(
                F.col("_parts"), lambda l: line_keep_expr(l, min_words)
            ),
        )
        .withColumn("_c4_text", F.concat_ws("\n", F.col("_kept")))
    )
    n_sent = F.size(
        F.regexp_extract_all(F.col("_c4_text"), F.lit(SENTENCE_MARK_RE), 0)
    ).cast("long")
    flags = {
        "c4_has_brace": t.contains("{"),
        "c4_has_lorem": F.lower(t).contains("lorem ipsum"),
        "c4_has_bad_word": bad,
    }
    out = bound.select(
        "doc_id",
        *keep,
        F.col("_c4_text").alias("c4_text"),
        F.size("_kept").cast("long").alias("c4_n_lines_kept"),
        (F.size("_parts") - F.size("_kept"))
        .cast("long")
        .alias("c4_n_lines_dropped"),
        n_sent.alias("c4_n_sentences"),
        *[c.alias(n) for n, c in flags.items()],
    )
    return out.withColumn(
        "c4_keep",
        (F.col("c4_n_sentences") >= F.lit(int(min_sentences)))
        & ~F.col("c4_has_brace")
        & ~F.col("c4_has_lorem")
        & ~F.col("c4_has_bad_word"),
    )


def oracle_c4_sql(
    text_sql: str,
    bad_words: tuple[str, ...] = (),
    min_words: int = 3,
) -> dict:
    """DuckDB fragments mirroring the Spark expressions byte-for-byte.
    Returns {'kept_lines','has_brace','has_lorem','has_bad_word'};
    callers bind kept_lines in a CTE and derive c4_text/n_sentences as
      coalesce(list_aggregate(kept, 'string_agg', chr(10)), '')
      len(regexp_extract_all(c4_text, '[.!?]'))."""
    kept = (
        f"list_filter(string_split({text_sql}, chr(10)), "
        f"l -> regexp_matches(rtrim(l), '[.!?\"]$') "
        f"AND len(list_filter(string_split(l, ' '), w -> w != ''))"
        f" >= {int(min_words)} "
        f"AND NOT contains(lower(l), 'javascript'))"
    )
    if bad_words:
        lits = ", ".join("'" + b.lower() + "'" for b in bad_words)
        bad = (
            f"len(list_filter(list_filter(string_split({text_sql}, ' '),"
            f" w -> w != ''), "
            f"w -> list_contains([{lits}], lower(w)))) > 0"
        )
    else:
        bad = "FALSE"
    return {
        "kept_lines": kept,
        "has_brace": f"contains({text_sql}, '{{')",
        "has_lorem": f"contains(lower({text_sql}), 'lorem ipsum')",
        "has_bad_word": bad,
    }
