"""OCR line-break dehyphenation: rejoin words split across print lines.

Scanned-book OCR — the reference's corpus; its document generator
concatenates per-page OCR text verbatim into the indexed full-text
field (document_generator/.../full_text_document_generator.py), so
end-of-line hyphenations survive into every downstream consumer —
splits words at print line breaks: ``exam-\\nple``. Every exact-match
operator after that point (tokens, shingles, index terms, dedup keys)
then sees two garbage fragments instead of one word. The classic
repair, one deterministic pass per rule:

  R1 join:  lowercase letter, ``-``, optional trailing blanks, line
            break, optional leading blanks, lowercase letter
            -> drop hyphen AND break      (``exam-\\nple`` -> ``example``)
  R2 keep:  same shape but the continuation starts UPPERCASE -> a
            probable true compound (``Smith-\\nJones``): keep the
            hyphen, drop only the break   (-> ``Smith-Jones``)

Anything else (digits, dangling hyphen at end-of-text, non-ASCII
letters) is left untouched — a repair stage must never corrupt what it
cannot classify.

Semantics are SINGLE-PASS per rule: Java regex ``replaceAll`` and RE2
global replace share non-overlapping left-to-right scan semantics, so
``a-\\nb-\\nc`` joins once per pass (the consumed continuation letter
cannot also anchor the next match). That makes the operator
bit-identical across Spark and DuckDB, which is the contract; chained
single-letter fragments are vanishingly rare in real OCR.

Plan shape (the 100 TB contract): two regexp_replace + two
regexp_extract_all projections — pure whole-stage codegen, zero
shuffles, zero Python. The intermediate (post-R1) string is referenced
twice (kept-count + second replace), so it is bound behind a withColumn
Project boundary per CLAUDE.md lesson #1.

Reference: no counterpart in hathitrust/index_search_monorepo (the
reference indexes the hyphenated text as-is); built per the brief's
text-analysis / training-data-pipeline category.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared Java-regex / RE2 subset: character classes + \t\n escapes only,
# no lookaround, no backreferences in the PATTERN (only in replacements,
# spelled per-engine: $1 in Java, \1 in RE2).
JOIN_RE = r"([a-z])-[ \t]*\n[ \t]*([a-z])"
KEEP_RE = r"([a-z])-[ \t]*\n[ \t]*([A-Z])"


def _n_matches(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0))).cast(
        "long"
    )


def with_dehyphenation(
    df: DataFrame, text_col: str = "text", prefix: str = "dh_"
) -> DataFrame:
    """Adds ``{prefix}text`` (repaired string), ``{prefix}n_joined``
    (BIGINT R1 joins applied) and ``{prefix}n_kept`` (BIGINT R2
    compound breaks repaired hyphen-preserving). Pure projection: no
    shuffle, no Python stage."""
    taken = {f"{prefix}text", f"{prefix}n_joined", f"{prefix}n_kept"}
    clash = taken.intersection(df.columns)
    if clash:
        raise ValueError(
            f"with_dehyphenation would overwrite input column(s)"
            f" {sorted(clash)}; rename them first"
        )
    src = F.col(text_col)
    bound = f"_{prefix}t1"
    out = (
        df.withColumn(f"{prefix}n_joined", _n_matches(src, JOIN_RE))
        # bind the post-R1 string ONCE (lesson #1: it is referenced by
        # both the kept-count and the second replace)
        .withColumn(bound, F.regexp_replace(src, JOIN_RE, "$1$2"))
        .withColumn(f"{prefix}n_kept", _n_matches(F.col(bound), KEEP_RE))
        .withColumn(
            f"{prefix}text",
            F.regexp_replace(F.col(bound), KEEP_RE, "$1-$2"),
        )
        .drop(bound)
    )
    return out


def dehyphen_oracle_sql(
    source_cte: str = "documents",
    text_sql: str = "text",
    prefix: str = "dh_",
) -> str:
    """DuckDB CTE chain replaying both rules from scratch (kept in this
    module so the two engines cannot drift); exposes ``{prefix}out``:
    (doc_id, {prefix}n_joined, {prefix}n_kept, {prefix}text). Standard
    single-quoted SQL literals keep backslashes verbatim, so the SAME
    pattern text reaches RE2 that reaches Java regex."""
    p = prefix
    return f"""
    {p}src AS (SELECT doc_id, {text_sql} AS {p}s FROM {source_cte}),
    {p}r1 AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all({p}s, '{JOIN_RE}')) AS BIGINT)
               AS {p}n_joined,
             regexp_replace({p}s, '{JOIN_RE}', '\\1\\2', 'g') AS {p}t1
      FROM {p}src
    ),
    {p}out AS (
      SELECT doc_id, {p}n_joined,
             CAST(len(regexp_extract_all({p}t1, '{KEEP_RE}')) AS BIGINT)
               AS {p}n_kept,
             regexp_replace({p}t1, '{KEEP_RE}', '\\1-\\2', 'g')
               AS {p}text
      FROM {p}r1
    )"""
