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

# explicit whitespace class (Java \s and RE2 \s disagree on \x0B) and the
# strip pattern for word-membership normalization
_WS_RE = "[ \\t\\n\\r\\f]+"
_EDGE_PUNCT_RE = "^[^a-z0-9]+|[^a-z0-9]+$"


def match_tokens_expr(text: Column) -> Column:
    """Lowercased whitespace-class-split tokens with leading/trailing
    non-alphanumerics stripped — the normalization for WORD-MEMBERSHIP
    tests (stopwords, bad words), where 'The', 'the,' and newline-glued
    tokens must still match. Distinct from `tokens_expr` (raw counting
    tokens): counts must stay raw, membership must normalize."""
    raw = F.filter(
        F.split(F.lower(text), _WS_RE), lambda x: x != F.lit("")
    )
    return F.transform(
        raw, lambda w: F.regexp_replace(w, _EDGE_PUNCT_RE, "")
    )


def match_tokens_sql(text_sql: str) -> str:
    """DuckDB mirror of match_tokens_expr ('g' flag: Java regexp_replace
    is replace-all, DuckDB defaults to first-match)."""
    return (
        f"list_transform(list_filter("
        f"string_split_regex(lower({text_sql}), '{_WS_RE}'),"
        f" x -> x <> ''), "
        f"w -> regexp_replace(w, '{_EDGE_PUNCT_RE}', '', 'g'))"
    )

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
            match_tokens_expr(t),
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
            f"len(list_filter({match_tokens_sql(text_sql)}, "
            f"w -> list_contains([{lits}], w))) > 0"
        )
    else:
        bad = "FALSE"
    return {
        "kept_lines": kept,
        "has_brace": f"contains({text_sql}, '{{')",
        "has_lorem": f"contains(lower({text_sql}), 'lorem ipsum')",
        "has_bad_word": bad,
    }


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, Appendix A) — the doc-level
# companion to the C4 line rules above. Same discipline: integer-exact
# per-mille arithmetic, pure codegen + bound HOFs, zero joins/shuffles,
# DuckDB byte-parity.
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

_G_PRODUCED = (
    "g_n_words",
    "g_mean_word_len_e2",
    "g_symbol_pmille",
    "g_alpha_word_pmille",
    "g_bullet_line_pmille",
    "g_ellipsis_line_pmille",
    "g_stop_hits",
    "g_keep",
)


def with_gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Add the Gopher document-quality columns:

      g_n_words              whitespace words
      g_mean_word_len_e2     mean word length x100 (integer DIV)
      g_symbol_pmille        ('#' + '...' + '…') per mille of words
      g_alpha_word_pmille    words containing an ASCII letter, per mille
      g_bullet_line_pmille   non-empty lines starting with -, *, •
      g_ellipsis_line_pmille non-empty lines ending with '...' or '…'
      g_stop_hits            how many of the 8 required stopwords appear
      g_keep                 the Gopher verdict: 50<=words<=100000,
                             3<=mean len<=10, symbols<=10%, >=80% alpha
                             words, <=90% bullet lines, <=30% ellipsis
                             lines, >=2 stopword hits

    `_gtoks`/`_glines` are bound once behind Project boundaries (HOFs are
    interpreted — no CSE; CLAUDE.md lesson 1)."""
    _check_keep(keep, _G_PRODUCED)
    t = F.col(text_col)
    bound = (
        df.withColumn("_gtoks", tokens_expr(t))
        .withColumn("_gmtoks", match_tokens_expr(t))
        .withColumn(
            "_glines",
            F.filter(
                F.transform(F.split(t, "\n"), lambda l: F.trim(l)),
                lambda l: F.length(l) > 0,
            ),
        )
    )
    toks, lines = F.col("_gtoks"), F.col("_glines")
    dots = (
        (F.length(t) - F.length(F.replace(t, F.lit("...")))) / F.lit(3)
    ).cast("long")
    counted = bound.withColumns(
        {
            "g_n_words": F.size(toks).cast("long"),
            "_gsumlen": F.aggregate(
                toks, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
            ),
            "_gsym": (
                (F.length(t) - F.length(F.replace(t, F.lit("#"))))
                + dots
                + (F.length(t) - F.length(F.replace(t, F.lit("…"))))
            ).cast("long"),
            "_galpha": F.size(
                F.filter(toks, lambda w: w.rlike("[A-Za-z]"))
            ).cast("long"),
            "_gnl": F.size(lines).cast("long"),
            "_gbullet": F.size(
                F.filter(
                    lines,
                    lambda l: l.like("-%") | l.like("*%") | l.like("•%"),
                )
            ).cast("long"),
            "_gellip": F.size(
                F.filter(
                    lines,
                    lambda l: l.like("%...") | l.like("%…"),
                )
            ).cast("long"),
            # membership over NORMALIZED tokens: 'The', 'the,' and
            # newline-glued stopwords still count (review finding)
            "g_stop_hits": F.size(
                F.filter(
                    F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
                    lambda w: F.array_contains(F.col("_gmtoks"), w),
                )
            ).cast("long"),
        }
    )

    def pm(num: str, den: str) -> F.Column:
        return F.expr(
            f"CAST(CASE WHEN {den} = 0 THEN 0"
            f" ELSE 1000 * {num} DIV {den} END AS BIGINT)"
        )

    mean_e2 = F.expr(
        "CAST(CASE WHEN g_n_words = 0 THEN 0"
        " ELSE 100 * _gsumlen DIV g_n_words END AS BIGINT)"
    )
    out = counted.select(
        "doc_id",
        *keep,
        "g_n_words",
        mean_e2.alias("g_mean_word_len_e2"),
        pm("_gsym", "g_n_words").alias("g_symbol_pmille"),
        pm("_galpha", "g_n_words").alias("g_alpha_word_pmille"),
        pm("_gbullet", "_gnl").alias("g_bullet_line_pmille"),
        pm("_gellip", "_gnl").alias("g_ellipsis_line_pmille"),
        "g_stop_hits",
    )
    return out.withColumn(
        "g_keep",
        F.col("g_n_words").between(50, 100_000)
        & F.col("g_mean_word_len_e2").between(300, 1000)
        & (F.col("g_symbol_pmille") <= 100)
        & (F.col("g_alpha_word_pmille") >= 800)
        & (F.col("g_bullet_line_pmille") <= 900)
        & (F.col("g_ellipsis_line_pmille") <= 300)
        & (F.col("g_stop_hits") >= 2),
    )


def oracle_gopher_sql(text_sql: str) -> dict:
    """DuckDB fragments mirroring with_gopher_rules byte-for-byte.
    Returns column SQL for every g_* column except g_keep (derive it from
    the others in the caller's outer SELECT to avoid recomputation)."""
    toks = f"list_filter(string_split({text_sql}, ' '), x -> x <> '')"
    lines = (
        f"list_filter(list_transform(string_split({text_sql}, chr(10)),"
        f" l -> trim(l)), l -> len(l) > 0)"
    )
    nw = f"len({toks})"
    sym = (
        f"(len({text_sql}) - len(replace({text_sql}, '#', '')))"
        f" + (len({text_sql}) - len(replace({text_sql}, '...', ''))) // 3"
        f" + (len({text_sql}) - len(replace({text_sql}, '…', '')))"
    )
    nl = f"len({lines})"
    stop_list = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)

    def pm(num: str, den: str) -> str:
        return (
            f"CAST(CASE WHEN {den} = 0 THEN 0"
            f" ELSE 1000 * ({num}) // ({den}) END AS BIGINT)"
        )

    return {
        "g_n_words": f"CAST({nw} AS BIGINT)",
        "g_mean_word_len_e2": (
            f"CAST(CASE WHEN {nw} = 0 THEN 0 ELSE 100 *"
            f" coalesce(list_sum(list_transform({toks}, x -> len(x))), 0)"
            f" // {nw} END AS BIGINT)"
        ),
        "g_symbol_pmille": pm(sym, nw),
        "g_alpha_word_pmille": pm(
            f"len(list_filter({toks}, w -> regexp_matches(w, '[A-Za-z]')))",
            nw,
        ),
        "g_bullet_line_pmille": pm(
            f"len(list_filter({lines}, l -> l LIKE '-%' OR l LIKE '*%'"
            f" OR l LIKE '•%'))",
            nl,
        ),
        "g_ellipsis_line_pmille": pm(
            f"len(list_filter({lines}, l -> l LIKE '%...'"
            f" OR l LIKE '%…'))",
            nl,
        ),
        "g_stop_hits": (
            f"CAST(len(list_filter([{stop_list}],"
            f" w -> list_contains({match_tokens_sql(text_sql)}, w)))"
            f" AS BIGINT)"
        ),
    }
