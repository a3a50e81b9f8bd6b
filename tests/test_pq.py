"""Product quantization: encode exactness vs an independent numpy
mirror, DuckDB oracle parity for the seed model, Lloyd training
reducing reconstruction error, ADC retrieval quality on planted
clusters, zero-shuffle encode plan, and validation."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import pq as PQ

SF_DIR = "/root/testdata/sf0.001"
DIM = 64
M = 4
DSUB = DIM // M
SEEDS = [3, 17, 101, 404]


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _mirror_codes(vecs: dict[int, list[float]], seeds: list[int]):
    """Independent per-subspace argmin (6 dp distances, lowest code on
    ties) — NOT a transliteration of the Spark expressions."""
    seed_mat = [
        np.round(np.array(vecs[s], dtype=np.float64), 6)
        for s in sorted(seeds)
    ]
    out = {}
    for vid, v in vecs.items():
        va = np.array(v, dtype=np.float64)
        codes = []
        for j in range(M):
            lo, hi = j * DSUB, (j + 1) * DSUB
            best = None
            for code, sv in enumerate(seed_mat):
                d2 = round(float(((va[lo:hi] - sv[lo:hi]) ** 2).sum()), 6)
                if best is None or d2 < best[0]:
                    best = (d2, code)
            codes.append(best[1])
        out[vid] = codes
    return out


class TestEncode:
    def test_matches_numpy_mirror(self, spark):
        emb = _emb(spark)
        model = PQ.pq_seed_books(emb, M, DIM, SEEDS)
        got = {
            r["vid"]: list(r["codes"])
            for r in PQ.pq_encode(emb, model, M, DIM).collect()
        }
        vecs = {
            r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()
        }
        want = _mirror_codes(vecs, SEEDS)
        assert got == want

    def test_duckdb_oracle_parity(self, spark):
        emb = _emb(spark)
        model = PQ.pq_seed_books(emb, M, DIM, SEEDS)
        got = sorted(
            (r["vid"], j, c)
            for r in PQ.pq_encode(emb, model, M, DIM).collect()
            for j, c in enumerate(r["codes"])
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT vec_id, embedding FROM "
            f"read_parquet('{SF_DIR}/embeddings.parquet')"
        )
        cte = PQ.pq_codes_oracle_ctes(M, DIM, SEEDS)
        want = sorted(
            map(
                tuple,
                con.execute(
                    f"WITH {cte.lstrip()} SELECT vid, sub, code"
                    f" FROM pq_codes"
                ).fetchall(),
            )
        )
        assert got == want

    def test_encode_zero_corpus_shuffle(self, spark):
        emb = _emb(spark)
        model = PQ.pq_seed_books(emb, M, DIM, SEEDS)
        plan = (
            PQ.pq_encode(emb, model, M, DIM)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastNestedLoopJoin" in plan
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                raise AssertionError(f"corpus shuffled: {line}")

    def test_validation(self, spark):
        emb = _emb(spark)
        with pytest.raises(ValueError):
            PQ.pq_seed_books(emb, 3, DIM, SEEDS)  # 64 % 3 != 0
        with pytest.raises(ValueError):
            PQ.pq_seed_books(emb, M, DIM, [])
        with pytest.raises(ValueError):
            PQ.pq_seed_books(emb, M, DIM, [3, 999999])


class TestTrainAndAdc:
    def test_training_reduces_reconstruction_error(self, spark):
        emb = _emb(spark)
        seed_model = PQ.pq_seed_books(emb, M, DIM, SEEDS)
        seed_codes = PQ.pq_encode(emb, seed_model, M, DIM)
        e0 = PQ.pq_reconstruction_error(
            seed_codes, emb, seed_model, M, DIM
        )
        trained = PQ.pq_train(emb, M, DIM, SEEDS, iters=2)
        tr_codes = PQ.pq_encode(emb, trained, M, DIM)
        e1 = PQ.pq_reconstruction_error(tr_codes, emb, trained, M, DIM)
        assert e1 <= e0 + 1e-9
        assert e1 < e0  # on real data Lloyd strictly improves

    def test_adc_finds_planted_neighbors(self, spark):
        # two tight clusters far apart: ADC top-1 of any member must be
        # a same-cluster member, never the other cluster
        rng = np.random.default_rng(7)
        a = rng.normal(0.0, 0.05, (6, DIM))
        b = rng.normal(10.0, 0.05, (6, DIM))
        rows = [
            (i, [float(x) for x in v])
            for i, v in enumerate(np.vstack([a, b]))
        ]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        model = PQ.pq_train(emb, M, DIM, [0, 6], iters=2)
        codes = PQ.pq_encode(emb, model, M, DIM)
        top = PQ.pq_adc_topk(
            codes, emb, model, query_ids=[1, 7], k=1, m=M, dim=DIM
        ).collect()
        for r in top:
            same = (r["qid"] < 6) == (r["vid"] < 6)
            assert same, f"cross-cluster neighbor: {r}"

    def test_adc_rank_total_order(self, spark):
        emb = _emb(spark)
        model = PQ.pq_seed_books(emb, M, DIM, SEEDS)
        codes = PQ.pq_encode(emb, model, M, DIM)
        top = PQ.pq_adc_topk(
            codes, emb, model, query_ids=[5], k=10, m=M, dim=DIM
        ).collect()
        assert [r["rank"] for r in sorted(top, key=lambda r: r["rank"])] \
            == list(range(1, 11))
        ds = [
            (r["adc_d2_e6"], r["vid"])
            for r in sorted(top, key=lambda r: r["rank"])
        ]
        assert ds == sorted(ds)
        assert all(r["vid"] != 5 for r in top)  # exclude_self
