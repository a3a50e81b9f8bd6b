"""Inverted-index construction: segmented posting lists + query-through-
the-index.

The reference delegates its inverted index to Solr (the repo FEEDS
documents into `core-x`/`core-y` shards — `libs/ht_search/src/ht_search/
config_search.py:19-20`); this module is the index-BUILD step itself,
re-expressed as the canonical large-scale Spark job so the engine owns
the whole path from OCR text to a queryable index artifact. Spark-first
shape:

 - `build_postings`: tokenize -> ONE groupBy (term, doc_id) for term
   frequencies (map-side combine collapses repeats before the exchange;
   only slim (term, doc_id) pairs shuffle, never text) -> ONE groupBy
   (term, segment) assembling doc-id-sorted posting segments. Posting
   lists are SEGMENTED (`segment_size` docs per row, segment = doc_id
   DIV a fixed modulus-free width): at web scale a stopword's posting
   list is millions of entries — an unbounded collect_list row is an
   OOM; fixed-width segments bound every row, parallelize long lists,
   and keep segments globally ordered by (term, seg_id) so a merge scan
   reads them in doc-id order (the same reason Lucene writes blocked
   postings).
 - `postings_stats`: per-term document frequency / collection frequency
   rolled up from segments (the idf inputs).
 - `conjunctive_query`: AND-of-terms through the index — explode the
   matching segments, count distinct terms per doc, keep docs hitting
   all query terms. The classic TAAT evaluation as a groupBy; only
   (doc_id, term) pairs move.

Everything is integer/exact and SQL-expressible, so the build AND a
query through it sit under the driver's value-hash oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from index_search_monorepo_spark.operators.textstats import tokens_expr

DEFAULT_SEGMENT_SIZE = 4096


def term_doc_freqs(
    df: DataFrame, text_col: str = "text", doc_col: str = "doc_id"
) -> DataFrame:
    """(term, doc_id, tf) — the map phase of index construction. The
    groupBy's partial aggregation collapses within-document repeats
    map-side; the exchange carries slim distinct (term, doc) pairs."""
    return (
        df.select(
            F.col(doc_col).alias("doc_id"),
            F.explode(tokens_expr(F.col(text_col))).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def build_postings(
    df: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    segment_size: int = DEFAULT_SEGMENT_SIZE,
) -> DataFrame:
    """(term, seg_id, postings) with postings = array<struct<doc_id,
    tf>> sorted by doc_id and seg_id = doc_id DIV segment_size — every
    output row is bounded by segment_size entries regardless of how
    common the term is."""
    if segment_size < 1:
        raise ValueError(f"segment_size must be >= 1, got {segment_size}")
    tdf = term_doc_freqs(df, text_col, doc_col)
    return (
        tdf.withColumn(
            "seg_id", F.expr(f"doc_id DIV {segment_size}").cast("long")
        )
        .groupBy("term", "seg_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "tf"))
            ).alias("postings")
        )
    )


def postings_stats(postings: DataFrame) -> DataFrame:
    """(term, df, cf) rolled up from posting segments: document
    frequency and collection frequency — the idf/ctf inputs a scorer
    needs. Segment rows are already term-partitioned; this is a slim
    re-aggregation."""
    return postings.select(
        "term",
        F.size("postings").cast("long").alias("_n"),
        F.aggregate(
            "postings",
            F.lit(0).cast("long"),
            lambda acc, p: acc + p["tf"],
        ).alias("_cf"),
    ).groupBy("term").agg(
        F.sum("_n").cast("long").alias("df"),
        F.sum("_cf").cast("long").alias("cf"),
    )


def conjunctive_query(
    postings: DataFrame, terms: list[str]
) -> DataFrame:
    """Documents containing ALL `terms`, answered THROUGH the index:
    (doc_id, total_tf). Matching segments explode to slim (doc, term,
    tf) rows; a doc qualifies when it hits every distinct query term.
    The postings side is term-filtered BEFORE any explode — with a
    term-partitioned index store this is a partition-pruned read of
    len(terms) slivers, never an index scan."""
    want = sorted(set(terms))
    if not want:
        raise ValueError("need at least one query term")
    hits = (
        postings.filter(F.col("term").isin(want))
        .select("term", F.explode("postings").alias("p"))
        .select("term", F.col("p.doc_id").alias("doc_id"),
                F.col("p.tf").alias("tf"))
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.countDistinct("term").alias("_nt"),
            F.sum("tf").cast("long").alias("total_tf"),
        )
        .filter(F.col("_nt") == len(want))
        .select("doc_id", "total_tf")
    )


def doc_length_stats(postings: DataFrame) -> DataFrame:
    """(doc_id, dl) forward stats rolled up from the index — dl = sum of
    tf over the doc's postings. A production deployment materializes
    this ONCE per index generation (it is a full index pass) and hands
    it to every query via bm25_via_postings(doc_stats=...)."""
    return (
        postings.select(F.explode("postings").alias("p"))
        .select(F.col("p.doc_id").alias("doc_id"),
                F.col("p.tf").alias("tf"))
        .groupBy("doc_id")
        .agg(F.sum("tf").cast("long").alias("dl"))
    )


def bm25_via_postings(
    postings: DataFrame,
    terms: list[str],
    doc_stats: DataFrame | None = None,
) -> DataFrame:
    """Ranked retrieval THROUGH the index: (doc_id, bm25_e6) for every
    document matching at least one query term, bit-identical to the
    scan-side scorer (search.engine.with_bm25_score_e6 — same integer-
    exact formula, same bitlen-idf surrogate; equality pinned by
    tests/test_postings.py). Everything the scorer needs comes from the
    index alone:

      dl (doc length)      = sum of tf over the doc's postings
      N, T (corpus stats)  = one-row rollup of the doc lengths
      df per term          = postings_stats
      tf per (doc, term)   = the matching posting entries

    Parity caveats (both pinned by the tests): the index sees whatever
    tokenization it was built with — match the scan scorer's lowercasing
    by indexing lower(text); and N counts docs with >= 1 token (an empty
    doc never reaches the index), so corpora containing zero-token docs
    score differently than a scan that counts them in N.

    Plan shape: the term-filtered postings explode to slim rows (a
    term-partitioned store prunes to len(terms) slivers); the doc-length
    side is the index's forward rollup. At query time a production
    deployment precomputes that rollup once per index generation — pass
    it via `doc_stats=` (the doc_length_stats shape) to skip the full
    index pass here."""
    from index_search_monorepo_spark.operators.lm import bitlen_expr

    want = sorted(set(terms))
    if not want:
        raise ValueError("need at least one query term")
    flat = postings.select(
        "term", F.explode("postings").alias("p")
    ).select(
        "term",
        F.col("p.doc_id").alias("doc_id"),
        F.col("p.tf").alias("tf"),
    )
    if doc_stats is None:
        doc_stats = doc_length_stats(postings)
    doc_stats = doc_stats.select(
        "doc_id", F.col("dl").cast("long").alias("_dl")
    )
    corpus = doc_stats.agg(
        F.count("*").cast("long").alias("_N"),
        F.sum("_dl").cast("long").alias("_T"),
    )
    dfs = (
        postings_stats(postings.filter(F.col("term").isin(want)))
        .select("term", "df")
    )
    hits = (
        flat.filter(F.col("term").isin(want))
        .join(F.broadcast(dfs), "term")
        .join(doc_stats, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "_avgdl_e3",
            F.greatest(
                F.expr("(1000 * _T) DIV _N"), F.lit(1).cast("long")
            ),
        )
    )
    idf_sur = bitlen_expr(F.expr("(2 * _N + 1) DIV (2 * df + 1)"))
    tfpart = F.expr(
        "(2200000000 * tf) DIV"
        " (1000 * tf + 300 + (900000 * _dl) DIV _avgdl_e3)"
    )
    return (
        hits.withColumn("_part", (idf_sur * tfpart).cast("long"))
        .groupBy("doc_id")
        .agg(F.sum("_part").cast("long").alias("bm25_e6"))
    )


def build_positional_postings(
    df: DataFrame,
    text_col: str = "text",
    doc_col: str = "doc_id",
    segment_size: int = DEFAULT_SEGMENT_SIZE,
) -> DataFrame:
    """(term, seg_id, postings) with postings = array<struct<doc_id, tf,
    positions: array<int>>> — the POSITIONAL index (Lucene's
    IndexOptions.DOCS_AND_FREQS_AND_POSITIONS): per-doc token offsets
    ride inside each posting entry so phrase queries resolve through the
    index without touching document text. Positions are 0-based token
    ordinals, sorted ascending; segments bound rows exactly as in
    build_postings. The exchange carries (term, doc, positions) — at web
    scale a stopword's positions are the big payload, which is why the
    reference's Solr (and Lucene) make positions per-field opt-in; use
    build_postings when no phrase/proximity queries are needed."""
    if segment_size < 1:
        raise ValueError(f"segment_size must be >= 1, got {segment_size}")
    tdf = (
        df.select(
            F.col(doc_col).alias("doc_id"),
            F.posexplode(tokens_expr(F.col(text_col))).alias(
                "pos", "term"
            ),
        )
        .groupBy("term", "doc_id")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.sort_array(F.collect_list(F.col("pos").cast("int"))).alias(
                "positions"
            ),
        )
    )
    return (
        tdf.withColumn(
            "seg_id", F.expr(f"doc_id DIV {segment_size}").cast("long")
        )
        .groupBy("term", "seg_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("doc_id", "tf", "positions"))
            ).alias("postings")
        )
    )


def phrase_query(
    postings: DataFrame, phrase_terms: list[str]
) -> DataFrame:
    """Exact-phrase evaluation THROUGH a positional index: (doc_id,
    n_phrase_hits) for documents containing the exact token sequence
    `phrase_terms` (the q_phrase / pf semantics the scan-side engine
    evaluates by substring — search/engine.py:106-125 — now answered
    from the index, Lucene PhraseQuery-style; scan-vs-index equality is
    pinned by tests/test_postings.py). The classic merge: each phrase
    slot i shifts its term's positions by -i; a phrase occurrence is a
    base position every slot agrees on (repeated terms are handled by
    counting distinct SLOTS, not distinct terms).

    Plan shape: postings are term-filtered BEFORE any explode (a
    term-partitioned store prunes to the phrase's slivers); only (slot,
    doc_id, position) rows shuffle into the two counting aggregates —
    bounded by the phrase terms' collection frequency, never corpus
    size."""
    if not phrase_terms:
        raise ValueError("need at least one phrase term")
    uniq = sorted(set(phrase_terms))
    spark = postings.sparkSession
    slots = spark.createDataFrame(
        [(i, t) for i, t in enumerate(phrase_terms)],
        "slot long, term string",
    )
    flat = (
        postings.filter(F.col("term").isin(uniq))
        .select("term", F.explode("postings").alias("p"))
        .select(
            "term",
            F.col("p.doc_id").alias("doc_id"),
            F.col("p.positions").alias("positions"),
        )
    )
    return (
        flat.join(F.broadcast(slots), "term")
        .select(
            "doc_id", "slot", F.explode("positions").alias("_pos")
        )
        .withColumn("adj", F.col("_pos").cast("long") - F.col("slot"))
        .filter(F.col("adj") >= 0)
        .groupBy("doc_id", "adj")
        .agg(F.countDistinct("slot").alias("_ns"))
        .filter(F.col("_ns") == len(phrase_terms))
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_phrase_hits"))
    )


def ordered_pair_proximity(
    postings: DataFrame,
    first: str,
    second: str,
    max_dist: int = 1,
) -> DataFrame:
    """Ordered within-k proximity THROUGH the positional index: (doc_id,
    n_pairs) counting occurrences of `second` at most `max_dist` tokens
    AFTER an occurrence of `first` (1 <= p2 - p1 <= max_dist; max_dist=1
    degenerates to the bigram phrase). The Solr pf2/ps shape — the
    reference's edismax requests phrase-proximity boosts from Solr
    (ht_query.py boost builders); this is the index-side evaluation.

    Scale shape: a naive formulation is an inequality (range) join on
    positions — Spark plans those as nested loops. Instead each `first`
    position explodes into its max_dist admissible successor slots and
    the match becomes an EQUALITY join on (doc_id, position): shuffle
    volume is max_dist x cf(first) + cf(second) slim rows (max_dist is a
    small constant; collection frequency of the two query terms, never
    corpus size), and the postings are term-filtered below the explode
    as in phrase_query."""
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    flat = (
        postings.filter(F.col("term").isin([first, second]))
        .select("term", F.explode("postings").alias("p"))
        .select(
            "term",
            F.col("p.doc_id").alias("doc_id"),
            F.col("p.positions").alias("positions"),
        )
    )
    lhs = (
        flat.filter(F.col("term") == first)
        .select("doc_id", F.explode("positions").alias("_p1"))
        .select(
            "doc_id",
            F.explode(
                F.array(*[F.col("_p1") + d for d in range(1, max_dist + 1)])
            ).alias("slot"),
        )
    )
    rhs = flat.filter(F.col("term") == second).select(
        "doc_id", F.explode("positions").alias("slot")
    )
    return (
        lhs.join(rhs, ["doc_id", "slot"])
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )


def proximity_oracle_sql(
    first: str, second: str, max_dist: int = 1
) -> str:
    """DuckDB CTE mirroring ordered_pair_proximity on top of
    positional_oracle_sql's ph_tok, via the INDEPENDENT inequality-join
    formulation (BETWEEN, not the slot explosion); exposes ph_near:
    (doc_id, n_pairs)."""
    if max_dist < 1:
        raise ValueError(f"max_dist must be >= 1, got {max_dist}")
    f = first.replace("'", "''")
    s = second.replace("'", "''")
    return f"""
    ph_near AS (
      SELECT a.doc_id, CAST(count(*) AS BIGINT) AS n_pairs
      FROM ph_tok a JOIN ph_tok b
        ON a.doc_id = b.doc_id
       AND b.pos BETWEEN a.pos + 1 AND a.pos + {max_dist}
      WHERE a.term = '{f}' AND b.term = '{s}'
      GROUP BY a.doc_id
    )"""


def positional_oracle_sql(
    source_cte: str = "documents", text_sql: str = "text"
) -> str:
    """DuckDB CTE mirroring the positional token stream (0-based
    ordinals via lockstep unnest + generate_subscripts); exposes
    ph_tok: (doc_id, term, pos)."""
    toks = f"list_filter(string_split({text_sql}, ' '), x -> x <> '')"
    return f"""
    ph_tok AS (
      SELECT doc_id, unnest(toks) AS term,
             generate_subscripts(toks, 1) - 1 AS pos
      FROM (SELECT doc_id, {toks} AS toks FROM {source_cte})
    )"""


def phrase_oracle_sql(phrase_terms: list[str]) -> str:
    """DuckDB CTE chain mirroring phrase_query on top of
    positional_oracle_sql's ph_tok; exposes ph_phrase: (doc_id,
    n_phrase_hits)."""
    if not phrase_terms:
        raise ValueError("need at least one phrase term")
    slot_rows = ", ".join(
        "(%d, '%s')" % (i, t.replace("'", "''"))
        for i, t in enumerate(phrase_terms)
    )
    return f"""
    ph_slots(slot, term) AS (VALUES {slot_rows}),
    ph_adj AS (
      SELECT k.doc_id, s.slot, k.pos - s.slot AS adj
      FROM ph_tok k JOIN ph_slots s USING (term)
      WHERE k.pos - s.slot >= 0
    ),
    ph_phrase AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_phrase_hits
      FROM (
        SELECT doc_id, adj FROM ph_adj
        GROUP BY doc_id, adj
        HAVING count(DISTINCT slot) = {len(phrase_terms)}
      ) GROUP BY doc_id
    )"""


def postings_oracle_sql(
    source_cte: str = "documents",
    text_sql: str = "text",
    segment_size: int = DEFAULT_SEGMENT_SIZE,
) -> str:
    """DuckDB CTE chain mirroring term_doc_freqs + segment assignment +
    per-term stats; exposes:

      pst_tdf   : (term, doc_id, tf, seg_id)
      pst_stats : (term, df, cf)
    """
    toks = f"list_filter(string_split({text_sql}, ' '), x -> x <> '')"
    return f"""
    pst_tok AS (
      SELECT doc_id, unnest({toks}) AS term FROM {source_cte}
    ),
    pst_tdf AS (
      SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
             CAST(doc_id // {segment_size} AS BIGINT) AS seg_id
      FROM pst_tok GROUP BY term, doc_id
    ),
    pst_stats AS (
      SELECT term, CAST(count(*) AS BIGINT) AS df,
             CAST(sum(tf) AS BIGINT) AS cf
      FROM pst_tdf GROUP BY term
    )"""


def bm25_postings_oracle_sql(terms: list[str]) -> str:
    """DuckDB CTE chain mirroring bm25_via_postings, built ON TOP of
    postings_oracle_sql's pst_tdf/pst_stats CTEs (append after them).
    Exposes pst_bm25: (doc_id, bm25_e6). Same integer-exact fixed-point
    spec as search/engine.bm25_e6_oracle_sql, fed from index-side stats
    instead of a corpus scan."""
    want = sorted(set(terms))
    if not want:
        raise ValueError("need at least one query term")
    in_list = ", ".join("'%s'" % t.replace("'", "''") for t in want)
    idf = "CAST(length(bin((2 * n + 1) // (2 * df + 1))) AS BIGINT)"
    den = (
        "(1000 * tf + 300 + (900000 * dl)"
        " // greatest((1000 * t) // n, 1))"
    )
    return f"""
    pst_dl AS (
      SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
      FROM pst_tdf GROUP BY doc_id
    ),
    pst_corpus AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS t
      FROM pst_dl
    ),
    pst_bm25 AS (
      SELECT h.doc_id,
             CAST(sum({idf} * ((2200000000 * tf) // {den})) AS BIGINT)
               AS bm25_e6
      FROM pst_tdf h
      JOIN pst_stats s USING (term)
      JOIN pst_dl USING (doc_id)
      CROSS JOIN pst_corpus
      WHERE h.term IN ({in_list})
      GROUP BY h.doc_id
    )"""


def apply_deletes(
    postings: DataFrame,
    deletes: DataFrame,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
    doc_col: str = "doc_id",
) -> DataFrame:
    """Tombstone application — the deletes half of a Lucene-style merge
    (docs are never updated in place; a delete set is held aside and
    applied when segments rewrite). Shape: the delete set rolls up to
    ONE array row per touched segment (seg_id = doc_id DIV width, the
    same global rule build_postings uses), left-joins the index at
    segment grain, and a higher-order filter drops dead entries —
    postings rows in untouched segments pass through untouched, and
    only (seg_id, delete-array) rows shuffle, never the index."""
    if segment_size < 1:
        raise ValueError(f"segment_size must be >= 1, got {segment_size}")
    dseg = (
        deletes.select(
            F.expr(f"{doc_col} DIV {segment_size}")
            .cast("long")
            .alias("seg_id"),
            F.col(doc_col).cast("long").alias("_d"),
        )
        .groupBy("seg_id")
        .agg(F.collect_set("_d").alias("_del"))
    )
    return (
        postings.join(dseg, "seg_id", "left")
        .withColumn(
            "postings",
            F.when(F.col("_del").isNull(), F.col("postings")).otherwise(
                F.filter(
                    F.col("postings"),
                    lambda p: ~F.array_contains(
                        F.col("_del"), p["doc_id"]
                    ),
                )
            ),
        )
        .drop("_del")
        .filter(F.size("postings") > 0)
    )


def merge_postings(
    *indexes: DataFrame,
    deletes: DataFrame | None = None,
    segment_size: int = DEFAULT_SEGMENT_SIZE,
) -> DataFrame:
    """Segment merge — the index-maintenance step Solr/Lucene run
    continuously (reference delegates it to Solr with the rest of index
    ownership, config_search.py:19-20; owning the index means owning
    the merge). Merging indexes built over DISJOINT doc sets is exact:
    seg_id is a GLOBAL doc-id rule, so same-(term, seg) rows from
    different inputs concatenate and re-sort into exactly the segments
    a from-scratch build over the union corpus would produce
    (test-pinned). ONE exchange on (term, seg_id) at bounded segment
    grain; document text is never touched — the whole point of merging
    vs re-indexing. Deletes (tombstones) apply first, per the Lucene
    model."""
    if not indexes:
        raise ValueError("need at least one index")
    u = indexes[0]
    for ix in indexes[1:]:
        u = u.unionByName(ix)
    if deletes is not None:
        u = apply_deletes(u, deletes, segment_size)
    return u.groupBy("term", "seg_id").agg(
        F.array_sort(F.flatten(F.collect_list("postings"))).alias(
            "postings"
        )
    )


# ---------------------------------------------------------------------------
# Posting-list compression: delta + LEB128 varint
#
# Lucene stores doc-id posting lists delta-encoded and byte-packed
# (org.apache.lucene.store.DataOutput#writeVInt); at 10^12 documents the
# raw 8-byte ids are ~8x the entropy of the gaps, and scan bandwidth —
# not CPU — is what a term-partitioned posting store pays for. This
# section is that storage layer in pure integer codegen: little-endian
# 7-bit groups with a continuation bit (standard LEB128), deltas from a
# strictly-increasing doc-id list. Encoder, decoder, and the byte-size
# law are all expression-level (zero Python, zero shuffle on top of the
# built index), and every formula has a DuckDB twin so encodings are
# byte-identical cross-engine.
#
# Supported value range: 0 <= v < 2^53 (8 varint groups). The Spark
# encoder divides by powers of two through float doubles — exact for
# any v < 2^53 because a power-of-two division only shifts the
# exponent (Column-API integer DIV takes literal shift amounts only);
# the DuckDB twin uses checked integer shifts, which cap at 1 << 62.
# Doc ids and gaps are far inside both bounds at any corpus size.
# ---------------------------------------------------------------------------

VARINT_MAX_GROUPS = 8
_VARINT_POWERS = [128**g for g in range(VARINT_MAX_GROUPS + 1)]


def _powers_lit():
    return F.array(*[F.lit(p) for p in _VARINT_POWERS])


def delta_encode_expr(ids):
    """array<long> strictly-increasing -> array<long> gaps (first value
    absolute). `ids` must be a bound attribute (CLAUDE.md lesson #1)."""
    # prev = first size(ids) elements of [0] ++ ids — sliced to the ids
    # length so zip_with never null-pads (the empty-list case)
    prev = F.slice(
        F.concat(F.array(F.lit(0).cast("long")), ids), 1, F.size(ids)
    )
    return F.zip_with(ids, prev, lambda a, b: (a - b).cast("long"))


def varint_encode_expr(vals):
    """array<long> (each 0 <= v < 2^53) -> array<int> LEB128 bytes
    (0..255). Byte g of value v is (v DIV 128^(g-1)) % 128, plus the
    continuation bit 128 iff higher groups remain (v DIV 128^g > 0) —
    no group-count intermediate, so the inner lambda reads only its own
    element and the literal powers table. Power-of-two float division
    + floor is exact below 2^53 (exponent shift only)."""
    powers = _powers_lit()

    def bytes_of(v):
        from index_search_monorepo_spark.operators.lm import bitlen_expr

        # n_groups = (bitlen(v) + 6) DIV 7, at least 1
        n_groups = F.floor((bitlen_expr(v) + F.lit(6)) / F.lit(7)).cast(
            "int"
        )
        return F.transform(
            F.sequence(F.lit(1), F.greatest(n_groups, F.lit(1))),
            lambda g: (
                F.floor(v / F.try_element_at(powers, g)).cast("long") % 128
                + F.when(
                    F.floor(v / F.try_element_at(powers, g + 1)).cast(
                        "long"
                    )
                    > 0,
                    F.lit(128),
                ).otherwise(F.lit(0))
            ).cast("int"),
        )

    return F.flatten(F.transform(vals, bytes_of))


def varint_decode_expr(bytes_col):
    """array<int> LEB128 bytes -> array<long> values (the encoder's
    inverse; sequential fold with a struct accumulator)."""
    init = F.struct(
        F.array().cast("array<long>").alias("vals"),
        F.lit(0).cast("long").alias("cur"),
        F.lit(1).cast("long").alias("mult"),
    )

    def step(acc, b):
        bl = b.cast("long")
        more = bl >= 128
        return F.when(
            more,
            F.struct(
                acc["vals"].alias("vals"),
                (acc["cur"] + (bl - 128) * acc["mult"]).alias("cur"),
                (acc["mult"] * 128).alias("mult"),
            ),
        ).otherwise(
            F.struct(
                F.concat(
                    acc["vals"],
                    F.array(acc["cur"] + bl * acc["mult"]),
                ).alias("vals"),
                F.lit(0).cast("long").alias("cur"),
                F.lit(1).cast("long").alias("mult"),
            )
        )

    return F.aggregate(bytes_col, init, step, lambda acc: acc["vals"])


def delta_decode_expr(gaps):
    """array<long> gaps -> array<long> running-sum ids (delta_encode
    inverse)."""
    init = F.struct(
        F.array().cast("array<long>").alias("vals"),
        F.lit(0).cast("long").alias("prev"),
    )

    def step(acc, d):
        nxt = acc["prev"] + d
        return F.struct(
            F.concat(acc["vals"], F.array(nxt)).alias("vals"),
            nxt.alias("prev"),
        )

    return F.aggregate(gaps, init, step, lambda acc: acc["vals"])


def compress_postings(index_df: DataFrame, prefix: str = "enc_") -> DataFrame:
    """Adds per-(term, seg_id) row: {prefix}bytes (array<int> LEB128
    bytes of the delta-encoded doc-id list), {prefix}n_bytes, and
    {prefix}raw_bytes (8 per id — the uncompressed BIGINT cost). Pure
    projection on top of the built index; the id array is bound once
    behind a Project boundary (lesson #1: it feeds both the deltas and
    the raw-size column)."""
    ids_col = f"_{prefix}ids"
    out = index_df.withColumn(
        ids_col,
        F.transform(F.col("postings"), lambda p: p["doc_id"].cast("long")),
    )
    ids = F.col(ids_col)
    out = out.withColumn(f"{prefix}bytes",
                         varint_encode_expr(delta_encode_expr(ids)))
    return (
        out.withColumn(
            f"{prefix}n_bytes", F.size(F.col(f"{prefix}bytes")).cast("long")
        )
        .withColumn(f"{prefix}raw_bytes", (F.size(ids) * 8).cast("long"))
        .drop(ids_col)
    )


def varint_size_sql(d_sql: str) -> str:
    """DuckDB: LEB128 byte count of one non-negative BIGINT —
    (bitlen(d) + 6) // 7 (bitlen(0) = 1, so 0 costs 1 byte)."""
    return (
        f"CAST((length(bin(CAST({d_sql} AS BIGINT))) + 6) // 7 AS BIGINT)"
    )


def varint_byte_sql(d_sql: str, g_sql: str) -> str:
    """DuckDB: byte g (1-based) of the LEB128 encoding of d — the same
    formula as varint_encode_expr, with 128^g spelled as a shift (7g
    stays < 63, inside DuckDB's checked-shift range)."""
    return (
        f"CAST(({d_sql} // (1::BIGINT << (7 * ({g_sql} - 1)))) % 128"
        f" + CASE WHEN {d_sql} // (1::BIGINT << (7 * ({g_sql}))) > 0"
        f" THEN 128 ELSE 0 END AS BIGINT)"
    )


def tfidf_keywords(
    postings: DataFrame,
    k: int = 3,
    doc_stats: DataFrame | None = None,
) -> DataFrame:
    """Per-document top-k keyword extraction THROUGH the index:
    score = tf * bitlen((2N+1) DIV (2df+1)) — the same integer idf
    surrogate as bm25_via_postings, without length normalization
    (keywords rank terms WITHIN one document, where dl is a constant
    factor). Ties break term-ascending so the selection is deterministic
    and oracle-replayable. Returns (doc_id, kw_terms — the top-k comma
    string in rank order, kw_top, kw_top_score).

    Plan shape: flat (term, doc, tf) rows join the term-grain df stats
    on term — a SHUFFLE join by design (the vocabulary of a 100 TB
    corpus is itself large; never broadcast it — contrast
    bm25_via_postings, whose df side is pre-filtered to the query's
    terms), then one window partitioned by doc_id over postings-
    cardinality rows. Document text is never touched. Pass the
    precomputed forward rollup via doc_stats to skip the N pass."""
    from pyspark.sql import Window

    from index_search_monorepo_spark.operators.lm import bitlen_expr

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    flat = postings.select("term", F.explode("postings").alias("p")).select(
        "term", F.col("p.doc_id").alias("doc_id"), F.col("p.tf").alias("tf")
    )
    if doc_stats is None:
        doc_stats = doc_length_stats(postings)
    corpus = doc_stats.agg(F.count("*").cast("long").alias("_N"))
    dfs = postings_stats(postings).select("term", "df")
    scored = (
        flat.join(dfs, "term")
        .crossJoin(F.broadcast(corpus))
        .withColumn(
            "_score",
            (
                F.col("tf")
                * bitlen_expr(F.expr("(2 * _N + 1) DIV (2 * df + 1)"))
            ).cast("long"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("_score").desc(), F.col("term").asc()
    )
    top = scored.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return top.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_rn", "term"))),
                lambda s: s["term"],
            ),
            ",",
        ).alias("kw_terms"),
        F.min(F.struct("_rn", "term"))["term"].alias("kw_top"),
        F.max("_score").cast("long").alias("kw_top_score"),
    )


def tfidf_keywords_oracle_sql(k: int = 3) -> str:
    """DuckDB CTE chain mirroring tfidf_keywords; append AFTER
    postings_oracle_sql + bm25_postings_oracle_sql (needs pst_tdf,
    pst_stats, pst_corpus). Exposes pst_kw: (doc_id, kw_terms, kw_top,
    kw_top_score)."""
    idf = "CAST(length(bin((2 * n + 1) // (2 * df + 1))) AS BIGINT)"
    return f"""
    pst_kwsc AS (
      SELECT t.doc_id, t.term, CAST(t.tf * {idf} AS BIGINT) AS sc
      FROM pst_tdf t JOIN pst_stats s USING (term) CROSS JOIN pst_corpus
    ),
    pst_kwr AS (
      SELECT doc_id, term, sc,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY sc DESC, term ASC) AS rn
      FROM pst_kwsc
    ),
    pst_kw AS (
      SELECT doc_id AS kw_id,
             string_agg(term, ',' ORDER BY rn) AS kw_terms,
             first(term ORDER BY rn) AS kw_top,
             CAST(max(sc) AS BIGINT) AS kw_top_score
      FROM pst_kwr WHERE rn <= {k} GROUP BY doc_id
    )"""
