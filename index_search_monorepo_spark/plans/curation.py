"""The end-to-end training-data curation plan: one composition of the
operator library that takes a raw (doc_id, text[, url]) corpus to a
cleaned, deduplicated, decontaminated training set.

Stage layout is chosen by shuffle shape, not by concept:

  0. encoding fix        — optional: mojibake repair (UTF-8-as-cp1252
                           inversion) then Unicode NFC normalization,
                           replacing the text in place. MUST precede
                           every content-hash consumer (line strip,
                           passage/exact/near dedup, decontamination
                           shingles): "café" and "cafÃ©" — or its
                           decomposed spelling — must be ONE key, not
                           three. Two Arrow map stages, zero shuffles.
  A. single-scan rules   — URL blocklist flag, C4 line filter + page
                           flags, Gopher document-quality verdict. All
                           pure per-row expressions, so the THREE rule
                           families fuse into ONE narrow pass over the
                           scan with zero joins and zero shuffles (plan-
                           pinned in tests). At 100 TB this is the stage
                           that touches every byte — it must not shuffle.
  B. line-level strip    — CCNet frequent-line removal over stage-A
                           survivors (one distinct-line aggregation +
                           broadcast set; corpus text never shuffles).
  B2. passage excision   — optional: Lee et al. exact-substring dedup
                           (duplicate_passages -> excise_passages); only
                           (hash, position) pairs shuffle.
  C. exact dedup         — md5 content key, keep the smallest doc_id per
                           key (one shuffle on the uniform hash key).
  D. near-dup drop       — optional: MinHash/LSH candidate pairs ->
                           connected components -> keep one canonical
                           per cluster (operators/dedup.py C15 path).
  E. decontamination     — optional: drop docs sharing word-8-grams with
                           an evaluation set (broadcast benchmark side).
  F. sampling            — optional deterministic md5 per-mille sample
                           (engine-portable, salt-keyed).

Every stage consumes the previous stage's frame lazily; `report=True`
materializes per-stage survivor counts (one count job per stage, against
persisted intermediates via the cache-registry lifecycle) — the
per-partition lineage/metrics convention of the extraction pipeline
applied to curation attrition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import c4rules as C4
from index_search_monorepo_spark.operators import dedup as D
from index_search_monorepo_spark.operators import packing as PK
from index_search_monorepo_spark.operators import urlfilter as UF
from index_search_monorepo_spark.operators.dedup import (
    _persist,
    release_caches,
)


def rule_flags(
    docs: DataFrame,
    text_col: str = "text",
    url_col: str | None = None,
    blocked_domains: list[str] | None = None,
    bad_words: tuple[str, ...] = (),
    min_sentences: int = 3,
    enforce: tuple[str, ...] = ("url", "c4", "gopher"),
) -> DataFrame:
    """Stage A as a reusable surface: add `url_blocked` (false when no
    URL column / blocklist), `c4_keep`, `g_keep` and the combined
    `rule_keep` — one narrow pass, zero joins/shuffles.

    `enforce` picks which families gate `rule_keep` (all flags are still
    computed and returned): web-prose heuristics like C4/Gopher are
    corpus-dependent — an OCR book corpus legitimately fails the
    terminal-punctuation rule — so callers tune the verdict without
    losing the signals."""
    out = docs
    if url_col is not None and blocked_domains is not None:
        out = UF.with_url_features(
            out, url_col=url_col, blocked=list(blocked_domains)
        )
        blocked = F.col("url_blocked")
    else:
        out = out.withColumn("url_blocked", F.lit(False))
        blocked = F.col("url_blocked")
    carry = tuple(c for c in out.columns if c not in ("doc_id",))
    out = C4.with_c4_rules(
        out,
        text_col=text_col,
        bad_words=bad_words,
        min_sentences=min_sentences,
        keep=carry,
    )
    carry = tuple(c for c in out.columns if c not in ("doc_id",))
    out = C4.with_gopher_rules(out, text_col=text_col, keep=carry)
    verdict = F.lit(True)
    if "url" in enforce:
        verdict = verdict & ~blocked
    if "c4" in enforce:
        verdict = verdict & F.col("c4_keep")
    if "gopher" in enforce:
        verdict = verdict & F.col("g_keep")
    return out.withColumn("rule_keep", verdict)


def fix_encoding(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Stage 0 as a reusable surface: mojibake repair
    (functions/mojibake.py) then NFC normalization
    (functions/unicode_norm.py) over `text_col`, REPLACED IN PLACE, plus
    `enc_fixed` (BIGINT 0/1 — whether either step changed bytes; the
    corpus-health rate to monitor upstream encoders by). Repair must run
    first: normalization of mojibake would canonicalize the wrong
    grapheme sequence. Two Arrow-batched map stages, zero joins, zero
    shuffles — safe to fuse into the stage-A scan at any scale."""
    from index_search_monorepo_spark.functions import mojibake as MJ
    from index_search_monorepo_spark.functions import unicode_norm as UN

    out = MJ.with_mojibake(docs, text_col, prefix="_mj_")
    out = UN.with_nfc(out, "_mj_text", prefix="_nfc_")
    cols = [
        F.col("_nfc_text").alias(text_col) if c == text_col else F.col(c)
        for c in docs.columns
    ]
    fixed = (F.col("_nfc_text") != F.col(text_col)).cast("long")
    return out.select(*cols, fixed.alias("enc_fixed"))


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    url_col: str | None = None,
    blocked_domains: list[str] | None = None,
    bad_words: tuple[str, ...] = (),
    min_sentences: int = 3,
    enforce: tuple[str, ...] = ("url", "c4", "gopher"),
    encoding_fix: bool = False,
    strip_lines_min_docs: int | None = None,
    passage_k: int | None = None,
    exact_dedup: bool = True,
    near_dup: bool = False,
    eval_set: DataFrame | None = None,
    sample_pmille: int | None = None,
    report: bool = False,
    registry: list | None = None,
) -> tuple[DataFrame, DataFrame | None]:
    """Run the curation chain; returns (kept, attrition_report).

    `kept` preserves the input columns (plus `n_lines_dropped` when the
    line strip ran — the cleaned text replaces `text_col` in place).
    `encoding_fix=True` runs stage 0 (mojibake repair -> NFC, in place)
    before anything hashes content.
    The report frame (stage, docs_in, docs_out, docs_dropped) is None
    unless report=True; with report=True intermediates are persisted.
    Pass a `registry` list to keep them cached (call
    dedup.release_caches(registry) after consuming the outputs); with no
    registry they are released internally once the counts materialize —
    nothing stays cached behind the caller's back."""
    in_cols = list(docs.columns)
    stages: list[tuple[str, DataFrame]] = []
    # report=True persists every stage; without a caller registry the
    # persisted frames would leak in a long-lived session, so use an
    # internal one and release it after the counts are materialized
    own_registry = report and registry is None
    if own_registry:
        registry = []

    def note(name: str, frame: DataFrame) -> DataFrame:
        if report:
            frame = _persist(frame, registry)
        stages.append((name, frame))
        return frame

    cur = note("input", docs)

    if encoding_fix:
        # text replaced in place; the enc_fixed diagnostic is dropped
        # here (in_cols discipline) — library users wanting the rate
        # call fix_encoding directly
        cur = note(
            "encoding_fix", fix_encoding(cur, text_col).select(*in_cols)
        )

    flagged = rule_flags(
        cur,
        text_col=text_col,
        url_col=url_col,
        blocked_domains=blocked_domains,
        bad_words=bad_words,
        min_sentences=min_sentences,
        enforce=enforce,
    )
    cur = note("rules", flagged.filter(F.col("rule_keep")).select(*in_cols))

    if strip_lines_min_docs is not None:
        stripped = D.strip_frequent_lines(
            cur, text_col=text_col, min_docs=strip_lines_min_docs
        )
        cleaned = [
            F.col(f"{text_col}_cleaned").alias(text_col)
            if c == text_col
            else F.col(c)
            for c in in_cols
        ]
        cur = note(
            "line_strip", stripped.select(*cleaned, "n_lines_dropped")
        )

    if passage_k is not None:
        # passage-grain exact-substring dedup (Lee et al.): detect
        # cross-document duplicated word runs, excise ALL occurrences.
        # Replaces text_col in place (whitespace-normalized); runs before
        # exact dedup so excision can surface new exact duplicates.
        # The detection result (small per-doc extents) is EAGERLY
        # localCheckpoint'ed: (a) the operator's internal grams persist
        # can be released immediately instead of leaking past the call
        # (review finding), and (b) the excise join's right side no
        # longer re-runs the upstream rules/line-strip lineage — the
        # stage-A scan runs once for detection and once for the final
        # consumption, the minimum a global-detect/apply pass needs.
        preg: list = []
        passages = D.duplicate_passages(
            cur, text_col=text_col, k=passage_k, registry=preg
        ).localCheckpoint(eager=True)
        release_caches(preg)
        excised = D.excise_passages(cur, passages, text_col=text_col)
        cols = [
            F.col(f"{text_col}_excised").alias(text_col)
            if c == text_col
            else F.col(c)
            for c in cur.columns
        ]
        cur = note(
            "passage_excise", excised.select(*cols, "n_words_excised")
        )

    if exact_dedup:
        # window keep-first, NOT a groupBy+self-join: a self-join here
        # recomputes the whole rules/line-strip lineage once per side
        # (MEMORY.md plan-audit lesson) — the window is one shuffle on
        # the uniform hash key over a single upstream computation
        from pyspark.sql import Window

        w = Window.partitionBy("_ck").orderBy("doc_id")
        deduped = (
            cur.withColumn("_ck", D.content_key_expr(F.col(text_col)))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_ck", "_rn")
        )
        cur = note("exact_dedup", deduped)

    if near_dup:
        pairs = D.lsh_candidate_pairs(
            cur.select("doc_id", F.col(text_col).alias("text"))
        )
        clusters = D.duplicate_clusters(pairs)
        cur = note("near_dup", D.drop_duplicates_by_cluster(cur, clusters))

    if eval_set is not None:
        tainted = D.decontaminate(
            cur.select("doc_id", F.col(text_col).alias("text")),
            eval_set,
        ).filter(F.col("contaminated"))
        cur = note(
            "decontaminate",
            cur.join(tainted.select("doc_id"), "doc_id", "left_anti"),
        )

    if sample_pmille is not None:
        cur = note(
            "sample",
            cur.filter(
                PK.hash_sample_pmille(F.col("doc_id"), sample_pmille)
            ),
        )

    if not report:
        return cur, None

    spark = docs.sparkSession
    counts = [(name, frame.count()) for name, frame in stages]
    rows = []
    for (name, n_out), (_pname, n_in) in zip(counts[1:], counts[:-1]):
        rows.append((name, n_in, n_out, n_in - n_out))
    rep = spark.createDataFrame(
        rows, "stage string, docs_in long, docs_out long, docs_dropped long"
    )
    if own_registry:
        # counts are materialized; without a caller-owned registry the
        # persisted frames would accumulate across calls, so release them
        # all here (the returned frames stay valid — they recompute)
        release_caches(registry)
    return cur, rep
