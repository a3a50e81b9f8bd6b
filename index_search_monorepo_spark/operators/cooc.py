"""Skip-gram co-occurrence counts and an integer PMI surrogate — the
word-association stage an embedding-training pipeline runs before
word2vec/GloVe (Mikolov et al. 2013 sample exactly these (center,
context) pairs; GloVe trains on exactly this count matrix), and the
collocation detector CCNet-style curation uses for phrase mining
(Church & Hanks 1990 PMI).

Plan shape (the 100 TB contract): pair generation is a PER-ROW nested
higher-order transform over the bound token array — no posexplode
self-join (which shuffles token-grain rows TWICE and is quadratic in
document length under skew), no Python. The only exchange is ONE
map-side-combined groupBy over slim (a, b) pairs — the wordcount shape;
document text never shuffles. The pair table is vocabulary²-bounded,
not corpus-bounded, and the unigram joins ride plain token equality
keys (cheap attributes, not derived exprs — CLAUDE.md lesson #10 does
not apply).

PMI surrogate: true PMI = log2(c_ab·N / (c_a·c_b)) is float and the
product c_ab·N overflows BIGINT at trillion-token scale. The repo's
bitlen convention (operators/lm.py: length(bin(x)), bit-identical in
Spark and DuckDB) gives the sum form

    pmi_bits = bitlen(c_ab) + bitlen(N) − bitlen(c_a) − bitlen(c_b)

— each term < 64 always, no products anywhere, within ±2 bits of
log2-PMI (each bitlen is floor(log2)+1, so both products' errors are
bounded by one bit each). Integer-exact, overflow-free at any corpus
size, and a monotone-enough ranking signal for top-pair selection —
the same trade with_lm_nll/with_classifier_score already made.

Window semantics: ORDERED pairs (a strictly precedes b, distance 1..w).
Symmetric counts are derivable (c_sym(a,b) = c(a,b) + c(b,a)); keeping
direction preserves bigram asymmetry ('new york' vs 'york new').

Reference: no counterpart in hathitrust/index_search_monorepo (Solr
owns its own term statistics); built per the brief's training-data-
pipeline category.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from index_search_monorepo_spark.operators.lm import (
    bitlen_expr,
    bitlen_sql,
    train_unigram_counts,
)
from index_search_monorepo_spark.operators.textstats import tokens_expr

DEFAULT_WINDOW = 2


def _check_window(window: int) -> None:
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")


def pair_structs_expr(toks: Column, window: int) -> Column:
    """array<struct<a,b>> of ordered skip-gram pairs within `window`.
    `toks` MUST be a bound attribute (CLAUDE.md lesson #1 — the array
    is referenced once per outer element inside interpreted HOFs, so an
    unbound tokenize expr would re-evaluate per token)."""
    _check_window(window)
    return F.flatten(
        F.transform(
            toks,
            lambda t, i: F.transform(
                # slice() is 1-based: the element after 0-based index i
                # starts at position i + 2
                F.slice(toks, i + F.lit(2), window),
                lambda u: F.struct(t.alias("a"), u.alias("b")),
            ),
        )
    )


def cooccurrence_counts(
    df: DataFrame,
    text_col: str = "text",
    window: int = DEFAULT_WINDOW,
) -> DataFrame:
    """(a, b, c_ab) — corpus-wide ordered pair counts. ONE map-side-
    combined shuffle over slim pairs; text never shuffles."""
    _check_window(window)
    bound = df.withColumn("_toks", tokens_expr(F.col(text_col)))
    return (
        bound.select(
            F.explode(pair_structs_expr(F.col("_toks"), window)).alias(
                "_p"
            )
        )
        .select("_p.a", "_p.b")
        .groupBy("a", "b")
        .agg(F.count("*").cast("long").alias("c_ab"))
    )


def pmi_pair_scores(
    df: DataFrame,
    text_col: str = "text",
    window: int = DEFAULT_WINDOW,
) -> DataFrame:
    """(a, b, c_ab, pmi_bits) — the co-occurrence matrix with the
    integer PMI surrogate. Unigram totals come from ONE wordcount pass
    (lm.train_unigram_counts, uncapped); N joins as a one-row broadcast."""
    uni = train_unigram_counts(df, text_col=text_col, top_k=None)
    tot = uni.agg(F.sum("cnt").cast("long").alias("_n"))
    pairs = cooccurrence_counts(df, text_col, window)
    j = (
        pairs.join(
            uni.select(
                F.col("token").alias("a"), F.col("cnt").alias("_ca")
            ),
            "a",
        )
        .join(
            uni.select(
                F.col("token").alias("b"), F.col("cnt").alias("_cb")
            ),
            "b",
        )
        .crossJoin(F.broadcast(tot))
    )
    pmi = (
        bitlen_expr(F.col("c_ab"))
        + bitlen_expr(F.col("_n"))
        - bitlen_expr(F.col("_ca"))
        - bitlen_expr(F.col("_cb"))
    )
    return j.select(
        "a", "b", "c_ab", pmi.cast("long").alias("pmi_bits")
    )


def top_pmi_pair(
    df: DataFrame,
    scores: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
    window: int = DEFAULT_WINDOW,
) -> DataFrame:
    """Per-document association evidence: (key, cooc_n_pairs,
    cooc_top_a, cooc_top_b, cooc_top_pmi) — the document's highest-
    scoring ordered pair under a TOTAL order (pmi_bits DESC, a ASC,
    b ASC — deterministic at any parallelism). Documents with < 2
    tokens yield no pairs and are absent; callers left-join. Shuffle
    traffic: exploded slim (key, a, b) rows into the scores join, then
    one window partition on the key."""
    _check_window(window)
    bound = df.select(
        F.col(key_col), tokens_expr(F.col(text_col)).alias("_toks")
    )
    doc_pairs = bound.select(
        key_col,
        F.explode(pair_structs_expr(F.col("_toks"), window)).alias("_p"),
    ).select(key_col, "_p.a", "_p.b")
    scored = doc_pairs.join(scores.select("a", "b", "pmi_bits"), ["a", "b"])
    w = Window.partitionBy(key_col).orderBy(
        F.desc("pmi_bits"), F.asc("a"), F.asc("b")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_np",
            F.count("*").over(Window.partitionBy(key_col)).cast("long"),
        )
        .filter(F.col("_rn") == 1)
        .select(
            F.col(key_col),
            F.col("_np").alias("cooc_n_pairs"),
            F.col("a").alias("cooc_top_a"),
            F.col("b").alias("cooc_top_b"),
            F.col("pmi_bits").cast("long").alias("cooc_top_pmi"),
        )
    )


def cooc_oracle_sql(
    source_cte: str = "documents",
    text_sql: str = "text",
    window: int = DEFAULT_WINDOW,
    prefix: str = "cooc_",
) -> str:
    """DuckDB CTE chain replaying pair counts, PMI surrogate, and the
    per-doc top pair from scratch (lockstep unnest+generate_subscripts
    positional stream, postings.py convention); exposes {prefix}doc:
    (doc_id, cooc_n_pairs, cooc_top_a, cooc_top_b, cooc_top_pmi)."""
    _check_window(window)
    toks = f"list_filter(string_split({text_sql}, ' '), x -> x <> '')"
    p = prefix
    return f"""
    {p}tok AS (
      SELECT doc_id, unnest(toks) AS tok,
             generate_subscripts(toks, 1) AS pos
      FROM (SELECT doc_id, {toks} AS toks FROM {source_cte})
    ),
    {p}pairs AS (
      SELECT x.doc_id, x.tok AS a, y.tok AS b
      FROM {p}tok x JOIN {p}tok y
        ON x.doc_id = y.doc_id
       AND y.pos - x.pos BETWEEN 1 AND {window}
    ),
    {p}cnt AS (
      SELECT a, b, CAST(count(*) AS BIGINT) AS c_ab
      FROM {p}pairs GROUP BY a, b
    ),
    {p}uni AS (
      SELECT tok, CAST(count(*) AS BIGINT) AS c FROM {p}tok GROUP BY tok
    ),
    {p}tot AS (
      SELECT CAST(sum(c) AS BIGINT) AS n FROM {p}uni
    ),
    {p}scores AS (
      SELECT c.a, c.b, c.c_ab,
             CAST({bitlen_sql('c.c_ab')} + {bitlen_sql('t.n')}
                  - {bitlen_sql('ua.c')} - {bitlen_sql('ub.c')}
               AS BIGINT) AS pmi_bits
      FROM {p}cnt c
      JOIN {p}uni ua ON ua.tok = c.a
      JOIN {p}uni ub ON ub.tok = c.b
      CROSS JOIN {p}tot t
    ),
    {p}ranked AS (
      SELECT dp.doc_id, dp.a, dp.b, s.pmi_bits,
             row_number() OVER (PARTITION BY dp.doc_id
                                ORDER BY s.pmi_bits DESC, dp.a, dp.b)
               AS rn,
             count(*) OVER (PARTITION BY dp.doc_id) AS np
      FROM {p}pairs dp JOIN {p}scores s ON s.a = dp.a AND s.b = dp.b
    ),
    {p}doc AS (
      SELECT doc_id, CAST(np AS BIGINT) AS cooc_n_pairs,
             a AS cooc_top_a, b AS cooc_top_b,
             CAST(pmi_bits AS BIGINT) AS cooc_top_pmi
      FROM {p}ranked WHERE rn = 1
    )"""
