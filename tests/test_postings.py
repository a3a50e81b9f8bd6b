"""Inverted-index build: hand-exact postings, segmentation bounds,
segment-rebuild round-trip, DuckDB stats parity, conjunctive query
through the index, and plan pins (text never shuffles; the query's term
filter sits below the explode)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import postings as PST

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


def _toy(spark):
    return spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (1, "banana cherry"),
            (5, "apple cherry cherry apple"),
            (9, ""),
        ],
        "doc_id long, text string",
    )


class TestBuild:
    def test_hand_exact_postings(self, spark):
        got = {
            (r["term"], r["seg_id"]): [
                (p["doc_id"], p["tf"]) for p in r["postings"]
            ]
            for r in PST.build_postings(
                _toy(spark), segment_size=4
            ).collect()
        }
        assert got == {
            ("apple", 0): [(0, 2)],
            ("apple", 1): [(5, 2)],
            ("banana", 0): [(0, 1), (1, 1)],
            ("cherry", 0): [(1, 1)],
            ("cherry", 1): [(5, 2)],
        }

    def test_segments_bound_row_size(self, spark):
        df = spark.createDataFrame(
            [(i, "common") for i in range(100)], "doc_id long, text string"
        )
        segs = PST.build_postings(df, segment_size=16).collect()
        assert all(len(r["postings"]) <= 16 for r in segs)
        assert sum(len(r["postings"]) for r in segs) == 100
        # segments tile the doc-id space in order
        ids = sorted(r["seg_id"] for r in segs)
        assert ids == list(range(0, (99 // 16) + 1))

    def test_rebuild_round_trip(self, spark):
        docs = _docs(spark)
        direct = sorted(
            map(tuple, PST.term_doc_freqs(docs).collect())
        )
        rebuilt = sorted(
            map(
                tuple,
                PST.build_postings(docs, segment_size=64)
                .select("term", F.explode("postings").alias("p"))
                .select("term", "p.doc_id", "p.tf")
                .collect(),
            )
        )
        assert direct == rebuilt

    def test_stats_duckdb_parity(self, spark):
        docs = _docs(spark)
        got = sorted(
            map(
                tuple,
                PST.postings_stats(
                    PST.build_postings(docs, segment_size=64)
                ).collect(),
            )
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT doc_id, text FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')"
        )
        cte = PST.postings_oracle_sql(segment_size=64)
        want = sorted(
            con.execute(
                f"WITH {cte.lstrip()} SELECT term, df, cf FROM pst_stats"
            ).fetchall()
        )
        assert got == want

    def test_text_never_shuffles(self, spark):
        plan = (
            PST.build_postings(_docs(spark))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for line in plan.splitlines():
            if "Exchange" in line and "text" in line:
                raise AssertionError(f"text column shuffled: {line}")


class TestQuery:
    def test_hand_exact_conjunction(self, spark):
        idx = PST.build_postings(_toy(spark), segment_size=4)
        got = {
            r["doc_id"]: r["total_tf"]
            for r in PST.conjunctive_query(
                idx, ["apple", "cherry"]
            ).collect()
        }
        assert got == {5: 4}  # only doc 5 has both; 2+2 occurrences
        one = {
            r["doc_id"]: r["total_tf"]
            for r in PST.conjunctive_query(idx, ["banana"]).collect()
        }
        assert one == {0: 1, 1: 1}

    def test_empty_terms_raises(self, spark):
        idx = PST.build_postings(_toy(spark))
        with pytest.raises(ValueError):
            PST.conjunctive_query(idx, [])

    def test_query_matches_scan_semantics(self, spark):
        docs = _docs(spark)
        idx = PST.build_postings(docs, segment_size=64)
        # pick two real terms from the corpus
        t1, t2 = [
            r["term"]
            for r in PST.postings_stats(idx)
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(2)
            .collect()
        ]
        via_index = {
            r["doc_id"]
            for r in PST.conjunctive_query(idx, [t1, t2]).collect()
        }
        from index_search_monorepo_spark.operators.textstats import (
            tokens_expr,
        )

        toks = tokens_expr(F.col("text"))
        via_scan = {
            r["doc_id"]
            for r in docs.filter(
                F.array_contains(toks, t1) & F.array_contains(toks, t2)
            ).collect()
        }
        assert via_index == via_scan
        assert via_index  # the two most common terms do co-occur

    def test_term_filter_below_explode(self, spark):
        idx = PST.build_postings(_docs(spark), segment_size=64)
        plan = (
            PST.conjunctive_query(idx, ["alpha", "beta"])
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        gen_at = plan.find("Generate explode(postings")
        filt_at = plan.find(" IN (alpha,beta)")
        assert gen_at != -1 and filt_at != -1
        # optimized plan prints top-down: the IN filter must sit BELOW
        # (= later in the string than) the postings explode — Catalyst in
        # fact pushes it under BOTH aggregates to the tokenize stage
        assert filt_at > gen_at


class TestBM25ViaPostings:
    """The through-the-index ranker must be bit-identical to the scan
    scorer when the index is built over the same tokens (lower(text) —
    the scan side lowercases; parity caveats in the docstring)."""

    TERMS = ["scan", "query"]

    def _lowered(self, spark):
        return _docs(spark).select(
            "doc_id", F.lower("text").alias("text")
        )

    def test_matches_scan_scorer(self, spark):
        from index_search_monorepo_spark.search.engine import (
            with_bm25_score_e6,
        )
        from index_search_monorepo_spark.operators.textstats import (
            tokens_expr,
        )

        docs = self._lowered(spark)
        idx = PST.build_postings(docs, segment_size=64)
        via_index = {
            r["doc_id"]: r["bm25_e6"]
            for r in PST.bm25_via_postings(idx, self.TERMS).collect()
        }
        toks = tokens_expr(F.col("text"))
        matches_any = F.arrays_overlap(
            toks, F.array(*[F.lit(t) for t in self.TERMS])
        )
        via_scan = {
            r["doc_id"]: r["bm25_e6"]
            for r in with_bm25_score_e6(docs, self.TERMS)
            .filter(matches_any)
            .select("doc_id", "bm25_e6")
            .collect()
        }
        assert via_index == via_scan
        assert via_index  # the two most common terms match something

    def test_precomputed_doc_stats_path(self, spark):
        idx = PST.build_postings(self._lowered(spark), segment_size=64)
        stats = PST.doc_length_stats(idx)
        fresh = sorted(
            map(tuple, PST.bm25_via_postings(idx, self.TERMS).collect())
        )
        reused = sorted(
            map(
                tuple,
                PST.bm25_via_postings(
                    idx, self.TERMS, doc_stats=stats
                ).collect(),
            )
        )
        assert fresh == reused

    def test_duckdb_parity(self, spark):
        idx = PST.build_postings(_docs(spark), segment_size=64)
        got = sorted(
            map(tuple, PST.bm25_via_postings(idx, self.TERMS).collect())
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT doc_id, text FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')"
        )
        cte = PST.postings_oracle_sql(segment_size=64)
        bm = PST.bm25_postings_oracle_sql(self.TERMS)
        want = sorted(
            con.execute(
                f"WITH {cte.lstrip()},{bm.lstrip()} "
                "SELECT doc_id, bm25_e6 FROM pst_bm25"
            ).fetchall()
        )
        assert got == want

    def test_empty_terms_raises(self, spark):
        idx = PST.build_postings(_toy(spark))
        with pytest.raises(ValueError):
            PST.bm25_via_postings(idx, [])
        with pytest.raises(ValueError):
            PST.bm25_postings_oracle_sql([])


class TestPositional:
    """Positional index + phrase queries through it."""

    def test_positional_round_trip(self, spark):
        got = {
            (r["term"], p["doc_id"]): (p["tf"], list(p["positions"]))
            for r in PST.build_positional_postings(
                _toy(spark), segment_size=4
            ).collect()
            for p in r["postings"]
        }
        assert got[("apple", 0)] == (2, [0, 2])
        assert got[("apple", 5)] == (2, [0, 3])
        assert got[("cherry", 5)] == (2, [1, 2])
        assert got[("banana", 1)] == (1, [0])

    def test_hand_exact_phrase(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "big cat big cat big"),   # "big cat" x2, overlap-safe
                (1, "cat big"),               # reversed: no hit
                (2, "big big big"),           # repeated-term phrase fodder
                (3, "big cat"),
            ],
            "doc_id long, text string",
        )
        idx = PST.build_positional_postings(docs, segment_size=4)
        got = {
            r["doc_id"]: r["n_phrase_hits"]
            for r in PST.phrase_query(idx, ["big", "cat"]).collect()
        }
        assert got == {0: 2, 3: 1}
        rep = {
            r["doc_id"]: r["n_phrase_hits"]
            for r in PST.phrase_query(idx, ["big", "big"]).collect()
        }
        assert rep == {2: 2}  # positions 0-1 and 1-2
        one = {
            r["doc_id"]: r["n_phrase_hits"]
            for r in PST.phrase_query(idx, ["cat"]).collect()
        }
        assert one == {0: 2, 1: 1, 3: 1}  # single term = tf

    def test_phrase_matches_scan_semantics(self, spark):
        docs = _docs(spark)
        idx = PST.build_positional_postings(docs, segment_size=64)
        via_index = {
            r["doc_id"]
            for r in PST.phrase_query(idx, ["part", "filter"]).collect()
        }
        # scan-side phrase semantics = the engine's substring-on-joined-
        # tokens test (search/engine.py:106-125), token-exact here
        from index_search_monorepo_spark.operators.textstats import (
            tokens_expr,
        )

        toks = tokens_expr(F.col("text"))
        joined = F.array_join(toks, " ")
        via_scan = {
            r["doc_id"]
            for r in docs.filter(
                F.concat(F.lit(" "), joined, F.lit(" ")).contains(
                    " part filter "
                )
            ).collect()
        }
        assert via_index == via_scan
        assert via_index  # the planted common bigram does occur

    def test_phrase_duckdb_parity(self, spark):
        idx = PST.build_positional_postings(_docs(spark), segment_size=64)
        got = sorted(
            map(
                tuple,
                PST.phrase_query(idx, ["part", "filter"]).collect(),
            )
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT doc_id, text FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')"
        )
        cte = PST.positional_oracle_sql()
        ph = PST.phrase_oracle_sql(["part", "filter"])
        want = sorted(
            con.execute(
                f"WITH {cte.lstrip()},{ph.lstrip()} "
                "SELECT doc_id, n_phrase_hits FROM ph_phrase"
            ).fetchall()
        )
        assert got == want

    def test_empty_phrase_raises(self, spark):
        idx = PST.build_positional_postings(_toy(spark))
        with pytest.raises(ValueError):
            PST.phrase_query(idx, [])
        with pytest.raises(ValueError):
            PST.phrase_oracle_sql([])

    def test_term_filter_below_explode(self, spark):
        idx = PST.build_positional_postings(_docs(spark), segment_size=64)
        plan = (
            PST.phrase_query(idx, ["part", "filter"])
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        gen_at = plan.find("Generate explode(postings")
        filt_at = plan.find(" IN (filter,part)")
        assert gen_at != -1 and filt_at != -1
        assert filt_at > gen_at  # pruned below the posting explode


class TestProximity:
    def test_hand_exact(self, spark):
        docs = spark.createDataFrame(
            [(0, "big cat big cat big"), (1, "cat big"), (2, "big end cat")],
            "doc_id long, text string",
        )
        idx = PST.build_positional_postings(docs, segment_size=4)

        def q(a, b, d):
            return {
                r["doc_id"]: r["n_pairs"]
                for r in PST.ordered_pair_proximity(idx, a, b, d).collect()
            }

        assert q("big", "cat", 1) == {0: 2}  # (0,1) (2,3); doc2 dist 2
        assert q("big", "cat", 2) == {0: 2, 2: 1}
        assert q("cat", "big", 1) == {0: 2, 1: 1}  # ordered: reversed hits
        assert q("big", "big", 2) == {0: 2}  # same-term pairs (0,2) (2,4)

    def test_duckdb_parity(self, spark):
        idx = PST.build_positional_postings(_docs(spark), segment_size=64)
        got = sorted(
            map(
                tuple,
                PST.ordered_pair_proximity(
                    idx, "part", "filter", 3
                ).collect(),
            )
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT doc_id, text FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')"
        )
        cte = PST.positional_oracle_sql()
        nr = PST.proximity_oracle_sql("part", "filter", 3)
        want = sorted(
            con.execute(
                f"WITH {cte.lstrip()},{nr.lstrip()} "
                "SELECT doc_id, n_pairs FROM ph_near"
            ).fetchall()
        )
        assert got == want and got

    def test_validation(self, spark):
        idx = PST.build_positional_postings(_toy(spark))
        with pytest.raises(ValueError):
            PST.ordered_pair_proximity(idx, "a", "b", 0)
        with pytest.raises(ValueError):
            PST.proximity_oracle_sql("a", "b", 0)

    def test_equality_join_plan(self, spark):
        idx = PST.build_positional_postings(_docs(spark), segment_size=64)
        plan = (
            PST.ordered_pair_proximity(idx, "part", "filter", 3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


class TestMerge:
    def _norm(self, idx):
        return sorted(
            (
                r["term"],
                r["seg_id"],
                tuple((p["doc_id"], p["tf"]) for p in r["postings"]),
            )
            for r in idx.collect()
        )

    def test_disjoint_merge_equals_rebuild(self, spark):
        docs = _docs(spark)
        a = PST.build_postings(
            docs.filter(F.col("doc_id") % 2 == 0), segment_size=64
        )
        b = PST.build_postings(
            docs.filter(F.col("doc_id") % 2 == 1), segment_size=64
        )
        merged = PST.merge_postings(a, b, segment_size=64)
        rebuilt = PST.build_postings(docs, segment_size=64)
        assert self._norm(merged) == self._norm(rebuilt)

    def test_interleaved_ranges_share_segments(self, spark):
        # doc 0 and 1 fall in the same segment but come from different
        # inputs — the merge must concatenate and re-sort within the row
        docs = _toy(spark)
        a = PST.build_postings(
            docs.filter(F.col("doc_id").isin(0, 5)), segment_size=4
        )
        b = PST.build_postings(
            docs.filter(F.col("doc_id").isin(1, 9)), segment_size=4
        )
        merged = PST.merge_postings(a, b, segment_size=4)
        rebuilt = PST.build_postings(docs, segment_size=4)
        assert self._norm(merged) == self._norm(rebuilt)

    def test_deletes_equal_rebuild_without_docs(self, spark):
        docs = _docs(spark)
        dels = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
        full = PST.build_postings(docs, segment_size=64)
        pruned = PST.apply_deletes(full, dels, segment_size=64)
        rebuilt = PST.build_postings(
            docs.filter(F.col("doc_id") % 7 != 0), segment_size=64
        )
        assert self._norm(pruned) == self._norm(rebuilt)

    def test_merge_with_deletes_and_stats(self, spark):
        docs = _toy(spark)
        a = PST.build_postings(
            docs.filter(F.col("doc_id") < 2), segment_size=4
        )
        b = PST.build_postings(
            docs.filter(F.col("doc_id") >= 2), segment_size=4
        )
        dels = spark.createDataFrame([(1,)], "doc_id long")
        merged = PST.merge_postings(a, b, deletes=dels, segment_size=4)
        rebuilt = PST.build_postings(
            docs.filter(F.col("doc_id") != 1), segment_size=4
        )
        assert self._norm(merged) == self._norm(rebuilt)
        got = sorted(
            map(tuple, PST.postings_stats(merged).collect())
        )
        want = sorted(
            map(tuple, PST.postings_stats(rebuilt).collect())
        )
        assert got == want

    def test_merge_single_exchange_segment_grain(self, spark):
        docs = _docs(spark)
        a = PST.build_postings(
            docs.filter(F.col("doc_id") % 2 == 0), segment_size=64
        )
        b = PST.build_postings(
            docs.filter(F.col("doc_id") % 2 == 1), segment_size=64
        )
        # count exchanges ABOVE the two input builds: materialize the
        # inputs' plans first, then diff is impractical — instead pin
        # that the merge adds exactly one exchange keyed on
        # (term, seg_id) and that text appears in no exchange
        plan = (
            PST.merge_postings(a, b, segment_size=64)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        merge_ex = [
            ln
            for ln in plan.splitlines()
            if "Exchange hashpartitioning" in ln
            and "term" in ln
            and "seg_id" in ln
        ]
        assert merge_ex, "merge exchange not keyed on (term, seg_id)"
        for line in plan.splitlines():
            if "Exchange" in line:
                assert "text" not in line, f"text shuffled: {line}"

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            PST.merge_postings()


class TestVarintCompression:
    """Delta + LEB128 posting compression: hand-pinned bytes, encoder/
    decoder round-trip (hypothesis), the byte-size law, real-index
    compression accounting, DuckDB byte parity, and the pure-projection
    plan pin."""

    def _enc(self, spark, ids):
        df = spark.createDataFrame([(ids,)], "ids array<long>")
        return df.select(
            PST.varint_encode_expr(
                PST.delta_encode_expr(F.col("ids"))
            ).alias("b")
        ).collect()[0]["b"]

    def test_hand_pinned_bytes(self, spark):
        # LEB128: 128 -> 0x80 0x01; 127 -> 0x7f; 0 -> 0x00
        assert self._enc(spark, [0]) == [0]
        assert self._enc(spark, [127]) == [127]
        assert self._enc(spark, [128]) == [128, 1]
        # deltas: [3, 5, 13] -> gaps [3, 2, 8]
        assert self._enc(spark, [3, 5, 13]) == [3, 2, 8]
        # 300 = 0b100101100 -> low 7 bits 0101100=44 (+128), high 10=2
        assert self._enc(spark, [300]) == [172, 2]

    def test_round_trip(self, spark):
        import random

        rng = random.Random(7)
        cases = [
            [],
            [0],
            [2**52, 2**52 + 1],
            sorted(rng.sample(range(10**6), 50)),
            sorted(rng.sample(range(2**40), 30)),
        ]
        df = spark.createDataFrame(
            [(i, ids) for i, ids in enumerate(cases)],
            "i long, ids array<long>",
        ).withColumn(
            "enc",
            PST.varint_encode_expr(PST.delta_encode_expr(F.col("ids"))),
        )
        got = {
            r["i"]: r["back"]
            for r in df.select(
                "i",
                PST.delta_decode_expr(
                    PST.varint_decode_expr(F.col("enc"))
                ).alias("back"),
            ).collect()
        }
        for i, ids in enumerate(cases):
            assert got[i] == ids, i

    def test_size_law_and_real_index(self, spark):
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        idx = PST.build_postings(docs, segment_size=64)
        comp = PST.compress_postings(idx)
        rows = comp.select(
            "term",
            "seg_id",
            "postings",
            "enc_bytes",
            "enc_n_bytes",
            "enc_raw_bytes",
            PST.delta_decode_expr(
                PST.varint_decode_expr(F.col("enc_bytes"))
            ).alias("back"),
        ).collect()
        assert rows
        import math

        total_enc = total_raw = 0
        for r in rows:
            ids = [p["doc_id"] for p in r["postings"]]
            assert r["back"] == ids, (r["term"], r["seg_id"])
            gaps = [ids[0]] + [b - a for a, b in zip(ids, ids[1:])]
            law = sum(
                max(1, (max(g, 1).bit_length() + 6) // 7) for g in gaps
            )
            assert r["enc_n_bytes"] == len(r["enc_bytes"]) == law
            assert r["enc_raw_bytes"] == 8 * len(ids)
            total_enc += r["enc_n_bytes"]
            total_raw += r["enc_raw_bytes"]
        # gaps within 64-wide segments fit 1-2 bytes: real compression
        assert total_enc * 3 < total_raw

    def test_duckdb_byte_parity(self, spark):
        import duckdb

        ids = [3, 5, 13, 300, 2**20, 2**20 + 129]
        got = self._enc(spark, ids)
        con = duckdb.connect()
        oracle = con.execute(
            f"""
            WITH ids AS (
              SELECT unnest(?) AS id,
                     generate_subscripts(?, 1) AS pos
            ),
            gaps AS (
              SELECT pos,
                     id - coalesce(lag(id) OVER (ORDER BY pos), 0) AS d
              FROM ids
            ),
            bytes AS (
              SELECT pos, g,
                     {PST.varint_byte_sql('d', 'g')} AS b
              FROM gaps,
                   unnest(generate_series(1,
                     (length(bin(CAST(d AS BIGINT))) + 6) // 7)) AS t(g)
            )
            SELECT list(b ORDER BY pos, g) AS enc,
                   (SELECT sum({PST.varint_size_sql('d')}) FROM gaps) AS n
            FROM bytes
            """,
            [ids, ids],
        ).fetchone()
        assert list(oracle[0]) == got
        assert oracle[1] == len(got)

    def test_pure_projection_plan(self, spark):
        df = spark.createDataFrame(
            [("t", 0, [{"doc_id": 1, "tf": 2}])],
            "term string, seg_id long,"
            " postings array<struct<doc_id: long, tf: long>>",
        )
        plan = (
            PST.compress_postings(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan, plan
        assert "EvalPython" not in plan, plan


def test_tfidf_keywords_hand_checked(spark):
    """Top-k keywords: rare terms outrank common ones by the bitlen idf;
    within a tie band, higher tf wins, then term-asc; k bounds output."""
    import pandas as pd

    from index_search_monorepo_spark.operators.postings import (
        build_postings,
        tfidf_keywords,
    )

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "text": [
                    "common rare common zebra",
                    "common common apple apple apple",
                    "common banana",
                    "common cherry cherry",
                ],
            }
        )
    )
    idx = build_postings(docs, segment_size=64)
    out = {r["doc_id"]: r for r in tfidf_keywords(idx, k=2).collect()}
    # N=4. df: common=4 -> idf bitlen((9)//(9))=bitlen(1)=1;
    # singletons df=1 -> bitlen(9//3=3)=2.
    # doc 0: rare(1*2)=2, zebra 2, common tf2 -> 2*1=2: three-way score
    # tie at 2 -> term asc: ['common','rare'] ... wait common tf=2 score 2,
    # rare 2, zebra 2 -> asc: common, rare.
    assert out[0]["kw_terms"] == "common,rare"
    # doc 1: apple tf3 df1 -> 6; common tf2 -> 2 -> ['apple','common']
    assert out[1]["kw_terms"] == "apple,common"
    assert out[1]["kw_top"] == "apple" and out[1]["kw_top_score"] == 6
    # doc 2: banana 2 > common 1
    assert out[2]["kw_terms"] == "banana,common"
    # doc 3: cherry tf2 -> 4 > common 1
    assert out[3]["kw_top"] == "cherry" and out[3]["kw_top_score"] == 4
