"""Search-result snippets (KWIC highlighting) and SymSpell-style fuzzy
term suggestion ("did you mean") over the documents table.

The reference delegates both features to Solr (the production schema
enables highlighting/suggest handlers server-side; the repo's query
builders in `libs/ht_search/src/ht_search/ht_query.py:66-136` only shape
`q`/`qf`/`fq` and leave result decoration to Solr). Here both are
re-expressed as Spark column plans:

KWIC snippet (`with_snippet`)
    For an ordered list of query terms, find the EARLIEST substring
    occurrence over `lower(text)` (ties broken by term order) and emit a
    fixed-radius character window around it, clamped at the string start.
    Pure whole-stage-codegen expressions — `locate`/`least`/`when`/
    `substr`, no UDF, no shuffle. Each `locate` scans the text once
    (that IS the algorithm); intermediates are bound behind Project
    boundaries per CLAUDE.md lesson #1 so nothing is re-scanned.

SymSpell suggestion (`fuzzy_suggestions`)
    The scalable spell-correction shape (Garbe's SymSpell, public
    algorithm): both the dictionary terms and the query terms expand to
    their deletion neighborhoods (depth d); any true pair at edit
    distance <= d shares at least one variant (for every optimal edit
    script, deleting the touched positions from both sides yields a
    common string), so an equality join on the variant key has FULL
    RECALL for distance <= d, and the exact `levenshtein() <= max_edit`
    post-filter removes the over-generated tail (shared-variant pairs
    can be up to distance 2d apart). Candidate ranking is
    (frequency DESC, term ASC) — deterministic.

    Scale shape: the dictionary is vocabulary-grain (tiny vs corpus —
    the corpus contributes ONE map-side-combined wordcount shuffle and
    its text never travels again); the deletion explode multiplies the
    vocabulary by ~(term_length+1)^depth, still vocabulary-grain; the
    query side is a handful of literal rows and is broadcast, so the
    candidate join shuffles nothing. At a 10^7-term web vocabulary the
    variant table is ~10^8 slim rows — a routine hash join, vs the
    brute-force O(|vocab|) per-query edit-distance scan this replaces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# sentinel "no match" position; larger than any plausible document offset
_NO_MATCH = 2_147_483_647


# ---------------------------------------------------------------------------
# KWIC snippets
# ---------------------------------------------------------------------------


def with_snippet(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    out_col: str = "snippet",
    radius: int = 30,
) -> DataFrame:
    """Adds a keyword-in-context snippet column: a +/-`radius`-character
    window of `text_col` around the earliest (lowercased, substring)
    occurrence of any term in `terms`; ties at the same position resolve
    to the earlier term in the list; NULL when no term occurs.

    Window arithmetic matches `substr(text, greatest(1, pos-radius),
    pos+len+radius-greatest(1, pos-radius))` exactly — the DuckDB mirror
    is `kwic_oracle_sql`. Positions are 1-based on the raw string (ASCII
    lowering preserves offsets). Each intermediate is bound behind a
    Project boundary (lesson #1) so the k `locate` scans run once each.
    """
    if not terms:
        raise ValueError("with_snippet requires at least one term")
    low_col = f"_kwic_low_{out_col}"
    pos_cols = [f"_kwic_pos_{out_col}_{i}" for i in range(len(terms))]
    best_col = f"_kwic_best_{out_col}"

    out = df.withColumn(low_col, F.lower(F.col(text_col)))
    for pc, t in zip(pos_cols, terms):
        p = F.locate(t.lower(), F.col(low_col))
        out = out.withColumn(pc, F.when(p > 0, p).otherwise(F.lit(_NO_MATCH)))
    best = (
        F.least(*[F.col(pc) for pc in pos_cols])
        if len(pos_cols) > 1
        else F.col(pos_cols[0])
    )
    out = out.withColumn(best_col, best)

    # matched-term length: first term (list order) whose position == best
    tlen: Column = F.lit(0)
    for pc, t in reversed(list(zip(pos_cols, terms))):
        tlen = F.when(F.col(pc) == F.col(best_col), F.lit(len(t))).otherwise(tlen)
    start = F.greatest(F.lit(1), F.col(best_col) - F.lit(radius))
    length = F.col(best_col) + tlen + F.lit(radius) - start
    snippet = F.when(
        F.col(best_col) < F.lit(_NO_MATCH),
        F.col(text_col).substr(start, length),
    )
    return out.withColumn(out_col, snippet).drop(low_col, best_col, *pos_cols)


def kwic_oracle_sql(text_sql: str, terms: list[str], radius: int = 30) -> str:
    """DuckDB expression mirroring `with_snippet` byte-for-byte
    (strpos/least/CASE/substr are the same 1-based clamped semantics)."""
    safes = [
        f"(CASE WHEN strpos(lower({text_sql}), '{t.lower()}') > 0"
        f" THEN strpos(lower({text_sql}), '{t.lower()}')"
        f" ELSE {_NO_MATCH} END)"
        for t in terms
    ]
    best = f"least({', '.join(safes)})" if len(safes) > 1 else safes[0]
    tlen = "0"
    for safe, t in reversed(list(zip(safes, terms))):
        tlen = f"(CASE WHEN {safe} = {best} THEN {len(t)} ELSE {tlen} END)"
    start = f"greatest(1, {best} - {radius})"
    return (
        f"(CASE WHEN {best} < {_NO_MATCH} THEN"
        f" substr({text_sql}, {start}, {best} + {tlen} + {radius} - {start})"
        f" END)"
    )


# ---------------------------------------------------------------------------
# SymSpell fuzzy suggestion
# ---------------------------------------------------------------------------


def term_dictionary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(term, freq) over whitespace-split lowercased tokens — the same
    analyzer convention as the dismax scorer (`engine._field_tokens`).
    One map-side-combined shuffle at vocabulary grain; document text
    never travels (only exploded tokens enter the partial aggregate)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda t: t != F.lit("")
    )
    return (
        df.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def deletes_expr(term: Column) -> Column:
    """Array of the term itself plus every single-character-deletion
    variant (distinct). `sequence(1, length)` is guarded for the empty
    string — Spark's `sequence(1, 0)` DESCENDS ([1, 0]), it is not empty
    (the `sequence(0,-1)` trap documented in PLANS.md)."""
    one_deletes = F.transform(
        F.sequence(F.lit(1), F.length(term)),
        lambda i: F.concat(
            term.substr(F.lit(1), i - F.lit(1)),
            term.substr(i + F.lit(1), F.length(term)),
        ),
    )
    variants = F.concat(F.array(term), one_deletes)
    return F.array_distinct(
        F.when(F.length(term) >= 1, variants).otherwise(F.array(term))
    )


def deletion_neighborhood(
    df: DataFrame, col: str, depth: int, out_col: str = "variant"
) -> DataFrame:
    """(col, variant) pairs for the depth-d deletion neighborhood,
    distinct per origin. Depth-d is built by exploding depth-1 deletes d
    times — each expansion stays at the grain of the previous one times
    ~term_length, always vocabulary-grain."""
    if depth < 1:
        raise ValueError("depth must be >= 1")
    keep = [c for c in df.columns]
    out = df.select(*keep, F.explode(deletes_expr(F.col(col))).alias(out_col))
    for _ in range(depth - 1):
        out = out.select(
            *keep, F.explode(deletes_expr(F.col(out_col))).alias(out_col)
        )
    return out.distinct()


def fuzzy_suggestions(
    dictionary: DataFrame,
    query_terms: list[str],
    max_edit: int = 1,
    topk: int = 1,
) -> DataFrame:
    """Top-k dictionary suggestions per query term, ranked
    (freq DESC, term ASC), restricted to `levenshtein <= max_edit`.

    `dictionary` is a (term, freq) frame (see `term_dictionary`).
    Returns (qterm, term, freq, rank). Exact-match terms rank with
    distance 0 — a present term suggests itself first when its corpus
    frequency wins, which is the "did you mean" contract.

    Recall: depth-`max_edit` deletion neighborhoods on BOTH sides
    guarantee every true pair <= max_edit shares a variant (module
    docstring); the exact post-filter makes the candidate join's
    over-generation (up to 2*max_edit) harmless.
    """
    if max_edit < 1:
        raise ValueError("max_edit must be >= 1 (0 is an exact lookup)")
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    spark = dictionary.sparkSession
    dict_var = deletion_neighborhood(
        dictionary.select("term", "freq"), "term", max_edit
    )
    q = spark.createDataFrame([(t.lower(),) for t in query_terms], "qterm string")
    q_var = deletion_neighborhood(q, "qterm", max_edit)
    cand = (
        dict_var.join(F.broadcast(q_var), "variant")
        .select("qterm", "term", "freq")
        .distinct()
        .filter(F.levenshtein(F.col("qterm"), F.col("term")) <= max_edit)
    )
    w = Window.partitionBy("qterm").orderBy(F.desc("freq"), F.asc("term"))
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= topk)
        .select("qterm", "term", F.col("freq").cast("long").alias("freq"), "rank")
    )


def suggestion_oracle_sql(
    qterm: str, rank: int, max_edit: int = 1, table: str = "documents"
) -> str:
    """Scalar-subquery DuckDB mirror: brute-force `levenshtein` over the
    distinct vocabulary (the O(|vocab|) scan the deletion-neighborhood
    join replaces at scale), emitting the same 'term:freq' string the
    gate ride packs. NULL when fewer than `rank` candidates exist."""
    return (
        "(SELECT term || ':' || CAST(freq AS VARCHAR) FROM ("
        "  SELECT term, freq, row_number() OVER"
        "         (ORDER BY freq DESC, term) AS rnk FROM ("
        "    SELECT t AS term, count(*) AS freq FROM ("
        f"      SELECT unnest(string_split(lower(text), ' ')) AS t"
        f"      FROM {table}) WHERE t <> '' GROUP BY t)"
        f"  WHERE levenshtein(term, '{qterm.lower()}') <= {max_edit})"
        f" WHERE rnk = {rank})"
    )
