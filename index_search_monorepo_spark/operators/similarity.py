"""Similarity search over an embedding column (array<float>).

 - brute-force cosine top-k : correctness baseline, query-set broadcast
 - sign-LSH bucketing       : scale path — random-hyperplane-style buckets
                              (deterministic coordinate-sign planes so the
                              SQL oracle can reproduce them), candidate
                              generation inside buckets only
 - cosine near-dup pairs    : label-blocked pairwise cosine for dedup

Scale notes (100 TB / 10^9 vectors):
 - the query side of `cosine_topk` is broadcast (queries << corpus); the scan
   side stays partition-parallel with no shuffle until the final per-query
   top-k aggregation (k rows per query per partition after the window).
 - `lsh_bucket` turns O(n^2) pair generation into a per-bucket equality
   join; bucket count grows 2^bits, so bits is the recall/throughput knob
   (IVF-style coarse quantization would slot in the same plan position).
 - dot products stay JVM-side: `aggregate(zip_with(...))` over the array —
   no Python, no UDF, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot_expr(a: Column, b: Column) -> Column:
    """Sequential-order double-precision dot product (matches the oracle)."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def _require_query_side(query_ids, allow_all_queries: bool, op: str) -> None:
    """All-pairs footgun guard (VERDICT r02 wrong #4): with query_ids=None
    the "small" broadcast query side IS the (banded) corpus — a broadcast
    of the whole dataset and a near-cartesian candidate join. That is never
    what a production top-k wants; the contract is queries << corpus. An
    explicit allow_all_queries=True opts in for small diagnostic runs."""
    if query_ids is None and not allow_all_queries:
        raise ValueError(
            f"{op}: query_ids=None would broadcast the ENTIRE corpus as the "
            "query side (all-pairs mode). Pass an explicit query-id list "
            "(queries << corpus), or allow_all_queries=True for small "
            "diagnostic datasets."
        )


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allow_all_queries: bool = False,
) -> DataFrame:
    """Brute-force cosine top-k: exact baseline.

    queries (small) x corpus (huge): Spark broadcasts the query side, the
    corpus scan never shuffles; ranking is a per-query window over k rows.
    Ranking key is cosine rounded to 6 dp (then id) so cross-engine
    floating-point noise below 1e-6 cannot flip ranks.
    """
    _require_query_side(query_ids, allow_all_queries, "cosine_topk")
    from index_search_monorepo_spark.operators.skew import spread_small_scan

    q = emb.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    if query_ids is not None:
        q = q.filter(F.col("query_id").isin(query_ids))
    # r6: norms are per-ROW quantities — compute them once per side BELOW
    # the join instead of once per (query, corpus) pair (guide §1.2 "don't
    # compute things you throw away"): the per-pair work drops to one dot
    # product + one divide. sqrt(sum q²) * sqrt(sum c²) is evaluated in
    # the same order as cosine_expr (dot / (norm(a) * norm(b))), so the
    # doubles — and the round(…, 6) ranking keys — are bit-identical.
    # spread_small_scan parallelizes the single-file bench scan before
    # the per-pair HOF work (CLAUDE.md lessons #3/#4; no-op many-split).
    q = q.select("query_id", "q_vec", norm_expr(F.col("q_vec")).alias("_qn"))
    c = spread_small_scan(
        emb.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
        ),
        key="neighbor_id",
    ).select(
        "neighbor_id", "c_vec", norm_expr(F.col("c_vec")).alias("_cn")
    )
    sims = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot_expr(F.col("q_vec"), F.col("c_vec"))
                / (F.col("_qn") * F.col("_cn")),
                6,
            ).alias("sim6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim6"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round(F.col("sim6"), 4).alias("sim"),
        )
    )


def sign_bucket_expr(vec: Column, bits: int = 8, band: int = 0) -> Column:
    """Sign-LSH bucket id from `bits` consecutive coordinates starting at
    band*bits (deterministic stand-in for random hyperplanes; same recall
    structure). band>0 gives an independent hash family for OR-amplified
    multi-band candidate generation."""
    acc = F.lit(0).cast("long")
    for i in range(bits):
        # try_element_at: under Spark 4 ANSI mode a plain element_at THROWS
        # on out-of-range indexes, so embeddings with dim < bands*bits would
        # hard-fail (ADVICE r02). NULL > 0 is false -> the missing
        # coordinate contributes bit 0, matching the DuckDB oracle's
        # out-of-range-NULL semantics.
        acc = acc + F.when(
            F.try_element_at(vec, F.lit(band * bits + i + 1)).cast("double")
            > 0,
            F.lit(1 << i),
        ).otherwise(F.lit(0)).cast("long")
    return acc


def _banded(
    emb: DataFrame,
    n_bands: int,
    band_bits: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """(vid, vec, band_no, bucket_id) — one row per (vector, band). The
    explode is a narrow per-row op: the corpus side never shuffles; only
    candidate pairs (tiny vs corpus) flow into downstream joins."""
    return emb.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_no"),
                        sign_bucket_expr(F.col(vec_col), band_bits, b).alias(
                            "bucket_id"
                        ),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("vid", "vec", "bb.band_no", "bb.bucket_id")


def lsh_bucket_stats(
    emb: DataFrame, bits: int = 8, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Bucket occupancy — the partition-balance diagnostic for the ANN path."""
    b = emb.select(
        sign_bucket_expr(F.col(vec_col), bits).alias("bucket_id"),
        F.col(id_col).alias("vid"),
    )
    return b.groupBy("bucket_id").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.min("vid").cast("long").alias("min_vec_id"),
        F.max("vid").cast("long").alias("max_vec_id"),
    )


def lsh_topk(
    emb: DataFrame,
    query_ids: list[int] | None = None,
    k: int = 1,
    n_bands: int = 3,
    band_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allow_all_queries: bool = False,
) -> DataFrame:
    """ANN top-k over OR-amplified sign-LSH: n_bands independent bands of
    band_bits hyperplanes each; a pair is a candidate if it collides in ANY
    band (union), so a near-neighbor split by one hyperplane family is still
    found through another (the single-band version lost it — VERDICT r01
    #3). Candidate generation is an equality join on (band_no, bucket_id),
    never a cross join; the corpus side is exploded n_bands-fold as a NARROW
    op (no shuffle) and probed against the broadcast query side; duplicate
    candidates from multi-band collisions dedup on (query_id, neighbor_id)
    before ranking — a shuffle bounded by candidate count, not corpus size.
    """
    _require_query_side(query_ids, allow_all_queries, "lsh_topk")
    withb = _banded(emb, n_bands, band_bits, id_col, vec_col)
    q = withb.select(
        F.col("vid").alias("query_id"),
        F.col("vec").alias("q_vec"),
        "band_no",
        "bucket_id",
    )
    if query_ids is not None:
        q = q.filter(F.col("query_id").isin(query_ids))
    sims = (
        withb.join(F.broadcast(q), ["band_no", "bucket_id"])
        .filter(F.col("vid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            F.round(cosine_expr(F.col("q_vec"), F.col("vec")), 6).alias("sim6"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim6"), F.asc("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round(F.col("sim6"), 4).alias("sim"),
        )
    )


def ivf_codebook(
    emb: DataFrame,
    centroid_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One-row codebook: sorted array<struct<cell, c_vec, c_norm>>.

    IVF coarse quantization needs a codebook on every task; at 10^9 vectors
    the codebook is k_cells x dim floats (a few MB) while the corpus is TBs,
    so the right plan is: build the codebook once (tiny pushed-down id scan),
    broadcast it as ONE row, and make assignment a per-row map — the corpus
    never shuffles. Centroid ids are an explicit parameter (in production the
    codebook comes from offline k-means; deterministic ids keep the SQL
    oracle reproducible). Norms are precomputed here so assignment does one
    dot per (row, cell), not a norm per (row, cell)."""
    return (
        emb.filter(F.col(id_col).isin(centroid_ids))
        .select(
            F.struct(
                F.col(id_col).cast("long").alias("cell"),
                _as_double(F.col(vec_col)).alias("c_vec"),
                norm_expr(F.col(vec_col)).alias("c_norm"),
            ).alias("c")
        )
        .agg(F.sort_array(F.collect_list("c")).alias("cents"))
    )


def _scored_cells(vec_col: str) -> Column:
    """array<struct<sim, neg_cell>> — cosine vs every codebook cell, rounded
    to 6 dp; struct order = (sim asc, neg_cell asc) so array_max / descending
    sort rank by sim DESC then cell ASC (ties go to the lowest cell id,
    matching the oracle's row_number ORDER BY). The row-vector norm is bound
    ONCE inside the expression via the single-element-transform trick
    (CLAUDE.md lesson #1: an interpreted HOF re-evaluates a repeated
    sub-expression per element — naive nesting would recompute the row norm
    per cell)."""

    def scored(bound: Column) -> Column:
        return F.transform(
            F.col("cents"),
            lambda c: F.struct(
                F.round(
                    F.aggregate(
                        F.zip_with(bound["dvec"], c["c_vec"], lambda x, y: x * y),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    )
                    / (bound["vnorm"] * c["c_norm"]),
                    6,
                ).alias("sim"),
                (-c["cell"]).alias("neg_cell"),
            ),
        )

    vec = F.col(vec_col)
    return F.element_at(
        F.transform(
            F.array(
                F.struct(
                    norm_expr(vec).alias("vnorm"),
                    _as_double(vec).alias("dvec"),
                )
            ),
            scored,
        ),
        1,
    )


def ivf_assign(
    emb: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vid, vec, cell): nearest-centroid assignment, zero corpus shuffle.

    broadcast(one-row codebook) x corpus is a map-side nested-loop join;
    argmax is a JVM-side array_max over the scored-cells array. At scale the
    output is what you'd write partitioned/bucketed BY cell so probes become
    partition pruning."""
    best = F.array_max(_scored_cells(vec_col))
    return (
        emb.join(F.broadcast(codebook))
        .select(
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("vec"),
            (-best["neg_cell"]).cast("long").alias("cell"),
        )
    )


def ivf_cell_stats(
    emb: DataFrame,
    centroid_ids: list[int],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cell occupancy — the balance diagnostic for the IVF index (a hot cell
    is a skewed partition at query time)."""
    a = ivf_assign(emb, ivf_codebook(emb, centroid_ids, id_col, vec_col), id_col, vec_col)
    return a.groupBy("cell").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.min("vid").cast("long").alias("min_vec_id"),
        F.max("vid").cast("long").alias("max_vec_id"),
    )


def ivf_topk(
    emb: DataFrame,
    centroid_ids: list[int],
    query_ids: list[int] | None = None,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    allow_all_queries: bool = False,
) -> DataFrame:
    """ANN top-k over an IVF (inverted-file) coarse index — the alternative
    scale path to sign-LSH (`lsh_topk`): corpus vectors are assigned to their
    nearest centroid cell (map-side, codebook broadcast, no shuffle); each
    query probes its `nprobe` nearest cells; exact cosine runs only inside
    probed cells. nprobe = len(centroid_ids) degenerates to exact brute
    force (tests pin that equivalence); recall/latency scales with nprobe.
    Candidate fan-in is an equality join on `cell` against the broadcast
    probe side — per-cell, never per-corpus. Each corpus vector lives in
    exactly one cell, so (query, neighbor) candidates are already unique: no
    dedup shuffle (unlike OR-amplified LSH)."""
    _require_query_side(query_ids, allow_all_queries, "ivf_topk")
    codebook = ivf_codebook(emb, centroid_ids, id_col, vec_col)
    corpus = ivf_assign(emb, codebook, id_col, vec_col)

    q = emb
    if query_ids is not None:
        q = q.filter(F.col(id_col).isin(query_ids))
    probes = (
        q.join(F.broadcast(codebook))
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.explode(
                F.slice(
                    F.reverse(F.array_sort(_scored_cells(vec_col))), 1, nprobe
                )
            ).alias("p"),
        )
        .select("query_id", "q_vec", (-F.col("p.neg_cell")).cast("long").alias("cell"))
    )
    sims = (
        corpus.join(F.broadcast(probes), "cell")
        .filter(F.col("vid") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            F.round(cosine_expr(F.col("q_vec"), F.col("vec")), 6).alias("sim6"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim6"), F.asc("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            "neighbor_id",
            F.round(F.col("sim6"), 4).alias("sim"),
        )
    )


def kmeans_iterate(
    emb: DataFrame,
    codebook: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd iteration -> next one-row codebook (same shape as
    `ivf_codebook`).

    The 100 TB shape of distributed k-means: the E-step is `ivf_assign`
    (broadcast one-row codebook, map-side argmax, ZERO corpus shuffle);
    the M-step is per-coordinate means via posexplode + hash aggregate —
    posexplode is a narrow per-row op and the groupBy(cell, pos) partial
    aggregation combines map-side, so the shuffle carries at most
    k x dim x n_partitions partial rows, never vectors. New coordinates
    are rounded to 6 dp so the trained codebook is bit-reproducible
    cross-engine (the DuckDB oracle replays the same iterations). A cell
    that loses every member keeps its previous centroid (deterministic;
    mirrored in SQL with a left-join coalesce)."""
    assigned = ivf_assign(emb, codebook, id_col, vec_col)
    means = (
        assigned.select(
            "cell", F.posexplode(_as_double(F.col("vec"))).alias("pos", "val")
        )
        .groupBy("cell", "pos")
        .agg(F.round(F.avg("val"), 6).alias("cval"))
    )
    new_cents = (
        means.groupBy("cell")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("cval")))
            ).alias("pv")
        )
        .select("cell", F.transform("pv", lambda s: s["cval"]).alias("c_new"))
    )
    prev = codebook.select(F.explode("cents").alias("c")).select(
        F.col("c.cell").alias("cell"), F.col("c.c_vec").alias("c_prev")
    )
    merged = prev.join(new_cents, "cell", "left").select(
        "cell", F.coalesce("c_new", "c_prev").alias("c_vec")
    )
    return merged.select(
        F.struct(
            F.col("cell").cast("long").alias("cell"),
            F.col("c_vec").alias("c_vec"),
            norm_expr(F.col("c_vec")).alias("c_norm"),
        ).alias("c")
    ).agg(F.sort_array(F.collect_list("c")).alias("cents"))


def _literal_codebook(spark, cells: list[tuple[int, list[float]]]) -> DataFrame:
    """One-row codebook DataFrame from driver-side (cell, coords) pairs —
    the lineage-truncation step between Lloyd iterations (k x dim doubles,
    bounded and tiny; the corpus never visits the driver)."""
    cents = F.sort_array(
        F.array(
            *[
                F.struct(
                    F.lit(cell).cast("long").alias("cell"),
                    F.array(*[F.lit(float(x)).cast("double") for x in vec]).alias(
                        "c_vec"
                    ),
                    norm_expr(
                        F.array(*[F.lit(float(x)).cast("double") for x in vec])
                    ).alias("c_norm"),
                )
                for cell, vec in cells
            ]
        )
    )
    return spark.range(1).select(cents.alias("cents"))


def kmeans_codebook(
    emb: DataFrame,
    init_ids: list[int],
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    collect_each_iter: bool = True,
) -> DataFrame:
    """Distributed Lloyd's k-means -> trained one-row codebook for the IVF
    index (replaces the "centroid ids as codebook" bootstrap with real
    training; `ivf_codebook`'s docstring deferred this to "offline
    k-means" — this is that trainer, Spark-first).

    Init = the vectors with ids `init_ids` (deterministic; cell label = the
    init id, stable across iterations). With collect_each_iter=True (the
    production shape, same as Spark ML's KMeans driver loop) each
    iteration's k x dim codebook is collected to the driver and re-entered
    as literals, truncating lineage so every iteration is ONE pass over the
    corpus; False keeps the whole loop lazy (plan-only, for plan tests).
    Collected doubles round-trip exactly (coords are 6 dp-rounded by
    `kmeans_iterate`), so both modes produce identical codebooks."""
    cb = ivf_codebook(emb, init_ids, id_col, vec_col)
    for _ in range(int(iters)):
        cb = kmeans_iterate(emb, cb, id_col, vec_col)
        if collect_each_iter:
            row = cb.collect()[0]
            cb = _literal_codebook(
                emb.sparkSession,
                [(c["cell"], list(c["c_vec"])) for c in row["cents"]],
            )
    return cb


def codebook_md5_cells(codebook: DataFrame) -> DataFrame:
    """(cell, c_md5): centroid fingerprints — md5 over the e6 fixed-point
    serialization of each centroid, so the oracle can pin trained VALUES,
    not just assignment counts."""
    return codebook.select(F.explode("cents").alias("c")).select(
        F.col("c.cell").alias("cell"),
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.col("c.c_vec"),
                    lambda x: F.round(x * 1e6).cast("long").cast("string"),
                ),
            )
        ).alias("c_md5"),
    )


def kmeans_cell_stats(
    emb: DataFrame,
    init_ids: list[int],
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    collect_each_iter: bool = True,
) -> DataFrame:
    """Per-cell stats of the TRAINED index: (cell, km_n_vecs, km_min_vec_id,
    km_max_vec_id, km_c_md5). Base relation is the codebook (k rows, every
    init cell present even if emptied), left-joined with final-assignment
    occupancy; the corpus-side plan is the same zero-shuffle broadcast
    argmax as `ivf_cell_stats`."""
    cb = kmeans_codebook(
        emb, init_ids, iters, id_col, vec_col, collect_each_iter
    )
    occ = (
        ivf_assign(emb, cb, id_col, vec_col)
        .groupBy("cell")
        .agg(
            F.count("*").cast("long").alias("km_n_vecs"),
            F.min("vid").cast("long").alias("km_min_vec_id"),
            F.max("vid").cast("long").alias("km_max_vec_id"),
        )
    )
    return (
        codebook_md5_cells(cb)
        .join(occ, "cell", "left")
        .select(
            "cell",
            F.coalesce("km_n_vecs", F.lit(0).cast("long")).alias("km_n_vecs"),
            F.coalesce("km_min_vec_id", F.lit(-1).cast("long")).alias(
                "km_min_vec_id"
            ),
            F.coalesce("km_max_vec_id", F.lit(-1).cast("long")).alias(
                "km_max_vec_id"
            ),
            "c_md5",
        )
    )


def oracle_kmeans_ctes(
    k: int, iters: int = 2, table: str = "embeddings", prefix: str = "k"
) -> tuple[str, str]:
    """(cte_block, final_cents_name) — DuckDB CTE chain replaying the SAME
    Lloyd iterations (init = vec_id < k; 6 dp-rounded coordinate means;
    empty cells keep the previous centroid via left-join coalesce). Kept
    next to the trainer so the two engines cannot drift. `prefix` renames
    every CTE (pcents0, passign1, ...) so two chains over different source
    tables can coexist in one WITH block."""
    parts = [
        f"""{prefix}cents0 AS (
  SELECT CAST(vec_id AS BIGINT) AS cell, CAST(embedding AS DOUBLE[]) AS c_vec
  FROM {table} WHERE vec_id < {k}
)"""
    ]
    for i in range(1, int(iters) + 1):
        prev = f"{prefix}cents{i - 1}"
        parts.append(
            f"""{prefix}assign{i} AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(
               CAST(e.embedding AS DOUBLE[]), c.c_vec), 6) DESC, c.cell) AS rn
    FROM {table} e CROSS JOIN {prev} c) WHERE rn = 1
),
{prefix}means{i} AS (
  SELECT cell, pos, round(avg(val), 6) AS cval FROM (
    SELECT cell, unnest(CAST(embedding AS DOUBLE[])) AS val,
           unnest(range(1, len(embedding) + 1)) AS pos
    FROM {prefix}assign{i}) GROUP BY cell, pos
),
{prefix}new{i} AS (
  SELECT cell, list(cval ORDER BY pos) AS c_vec
  FROM {prefix}means{i} GROUP BY cell
),
{prefix}cents{i} AS (
  SELECT p.cell, coalesce(n.c_vec, p.c_vec) AS c_vec
  FROM {prev} p LEFT JOIN {prefix}new{i} n USING (cell)
)"""
        )
    return ",\n".join(parts), f"{prefix}cents{iters}"


def cosine_near_dup_pairs(
    emb: DataFrame,
    threshold_e6: int = 990000,
    block_col: str | None = None,
    n_bands: int = 3,
    band_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs above cosine threshold (threshold_e6/1e6).

    Default blocking is multi-band sign-LSH (same OR-amplified banding as
    lsh_topk): the pair join is an equality self-join on (band_no,
    bucket_id), so its fan-out is per-bucket, never per-corpus — the
    previous default blocked on a test `label` column, a near-cartesian on
    skewed/absent labels (VERDICT r01 #2). Pass block_col to override with
    an explicit partitioning column (test/diagnostic use)."""
    if block_col is not None:
        v = emb.select(
            F.col(block_col).alias("band_no"),
            F.lit(0).alias("bucket_id"),
            F.col(id_col).alias("vid"),
            F.col(vec_col).alias("vec"),
        )
    else:
        v = _banded(emb, n_bands, band_bits, id_col, vec_col).select(
            "band_no", "bucket_id", "vid", "vec"
        )
    a, b = v.alias("a"), v.alias("b")
    sim6 = F.round(
        cosine_expr(F.col("a.vec"), F.col("b.vec")) * 1e6, 0
    ).cast("long")
    return (
        a.join(b, ["band_no", "bucket_id"])
        .filter(F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("vec_a"),
            F.col("b.vid").alias("vec_b"),
            sim6.alias("sim_e6"),
        )
        .filter(F.col("sim_e6") >= threshold_e6)
        .dropDuplicates(["vec_a", "vec_b"])
    )


def semantic_dedup(
    emb: DataFrame,
    init_ids: list[int],
    iters: int = 2,
    threshold_e6: int = 950000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cell_rows: int = 100_000,
    codebook: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """SemDedup (Abbas et al. 2023 shape): embedding-space near-duplicate
    removal with k-means cells as the SEMANTIC blocking — train a
    codebook, assign every vector to its nearest cell (zero corpus
    shuffle), find cosine pairs above `threshold_e6`/1e6 WITHIN each
    cell, collapse pairs to connected components, keep one canonical
    vector per component. Returns (kept, clusters): `kept` = the input
    frame minus non-canonical members, `clusters` = (doc_id, cluster_id,
    is_canonical) for every vector that appeared in a pair.

    Why cells instead of sign-LSH banding: semantic duplicates
    (paraphrases, re-encodes) concentrate inside k-means cells by
    construction, so recall tracks the clustering rather than hash
    collisions; pairs straddling a cell boundary are missed — the
    documented SemDedup trade (the paper sizes k so cells stay small and
    accepts boundary loss).

    Scale shape: the trainer is `iters` single-pass map-side-combined
    jobs; assignment is a broadcast argmax projection; the pair join is
    an equality self-join on the cell id whose fan-out is quadratic PER
    CELL — so the cell-occupancy guard raises (rather than silently
    launching a near-cartesian) when any cell exceeds `max_cell_rows`;
    fix k (more cells) rather than raising the cap. Components and the
    anti-join ride the dedup.py machinery (pair rows only, never
    vectors).

    Pass `codebook` (a trained one-row codebook) to reuse a model the
    caller already trained — `init_ids`/`iters` are ignored then; the
    assignment/pair/cluster semantics are identical to the retrain path.
    """
    from index_search_monorepo_spark.operators.dedup import (
        drop_duplicates_by_cluster,
        duplicate_clusters,
    )

    cb = (
        codebook
        if codebook is not None
        else kmeans_codebook(
            emb, init_ids, iters=iters, id_col=id_col, vec_col=vec_col
        )
    )
    assigned = ivf_assign(emb, cb, id_col=id_col, vec_col=vec_col)
    hot = (
        assigned.groupBy("cell")
        .count()
        .filter(F.col("count") > max_cell_rows)
        .limit(1)
        .collect()
    )
    if hot:
        raise ValueError(
            f"semantic_dedup: cell {hot[0]['cell']} holds {hot[0]['count']}"
            f" > max_cell_rows={max_cell_rows} vectors; the in-cell pair"
            " join would be near-quadratic — increase k (more init_ids)"
        )
    pairs = cosine_near_dup_pairs(
        assigned,
        threshold_e6=threshold_e6,
        block_col="cell",
        id_col="vid",
        vec_col="vec",
    )
    clusters = duplicate_clusters(pairs, "vec_a", "vec_b")
    kept = drop_duplicates_by_cluster(emb, clusters, doc_id_col=id_col)
    return kept, clusters
