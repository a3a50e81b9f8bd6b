"""HyperLogLog sketch: register exactness vs the Python mirror, DuckDB
oracle parity, mergeability, estimate accuracy vs true distincts, and
the map-side-combine plan shape (keys never shuffle)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import sketches as SK

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


class TestRegisters:
    def test_matches_python_mirror(self, spark):
        vals = [f"k{i}" for i in range(500)]
        df = spark.createDataFrame([(v,) for v in vals], "k string")
        got = {
            r["bucket"]: r["r"]
            for r in SK.hll_sketch(df, "k", p=6).collect()
        }
        assert got == SK.hll_sketch_py(vals, p=6)

    def test_duckdb_oracle_parity(self, spark):
        docs = _docs(spark)
        got = sorted(
            map(tuple, SK.hll_sketch(docs, "doc_id", p=6).collect())
        )
        cte = SK.hll_oracle_sql("documents", "doc_id", p=6)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT doc_id FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')"
        )
        want = sorted(
            con.execute(
                f"WITH {cte.lstrip()} SELECT bucket, r FROM hll_out"
            ).fetchall()
        )
        assert got == want

    def test_duplicates_do_not_move_registers(self, spark):
        a = spark.createDataFrame(
            [(f"k{i}",) for i in range(100)], "k string"
        )
        b = spark.createDataFrame(
            [(f"k{i % 100}",) for i in range(1000)], "k string"
        )
        ra = sorted(map(tuple, SK.hll_sketch(a, "k", p=5).collect()))
        rb = sorted(map(tuple, SK.hll_sketch(b, "k", p=5).collect()))
        assert ra == rb

    def test_p_bounds(self, spark):
        df = spark.createDataFrame([("x",)], "k string")
        with pytest.raises(ValueError):
            SK.hll_sketch(df, "k", p=1)


class TestMergeAndEstimate:
    def test_merge_equals_sketch_of_union(self, spark):
        a = spark.createDataFrame(
            [(f"a{i}",) for i in range(300)], "k string"
        )
        b = spark.createDataFrame(
            [(f"b{i}",) for i in range(300)], "k string"
        )
        merged = sorted(
            map(
                tuple,
                SK.hll_merge(
                    SK.hll_sketch(a, "k", p=6), SK.hll_sketch(b, "k", p=6)
                ).collect(),
            )
        )
        whole = sorted(
            map(
                tuple,
                SK.hll_sketch(a.unionByName(b), "k", p=6).collect(),
            )
        )
        assert merged == whole

    def test_estimate_accuracy(self, spark):
        # standard error ~ 1.04/sqrt(m); at p=10, m=1024 -> ~3.3%.
        # allow 4 sigma on a single draw
        n = 20000
        df = spark.createDataFrame(
            [(f"key-{i}",) for i in range(n)], "k string"
        )
        est = SK.hll_estimate(SK.hll_sketch(df, "k", p=10), p=10)
        assert abs(est - n) / n < 4 * 1.04 / (2**10) ** 0.5

    def test_estimate_small_range_linear_counting(self):
        # tiny cardinality -> linear-counting branch, near-exact
        regs = SK.hll_sketch_py([f"v{i}" for i in range(30)], p=10)
        est = SK._estimate_py(regs, p=10)
        assert abs(est - 30) < 3

    def test_map_side_combine_keys_never_shuffle(self, spark):
        docs = _docs(spark)
        plan = (
            SK.hll_sketch(docs, "text", p=12)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # partial aggregate below the exchange; the raw key column must
        # not survive into the shuffle
        assert "HashAggregate" in plan
        for line in plan.splitlines():
            if "Exchange" in line and "text" in line:
                raise AssertionError(f"raw keys shuffled: {line}")


class TestCountMin:
    def test_matches_python_mirror(self, spark):
        vals = [f"k{i % 60}" for i in range(400)]
        df = spark.createDataFrame([(v,) for v in vals], "k string")
        got = {
            (r["row"], r["col"]): r["c"]
            for r in SK.cms_sketch(df, "k", d=3, w=32).collect()
        }
        assert got == SK.cms_sketch_py(vals, d=3, w=32)

    def test_duckdb_oracle_parity(self, spark):
        docs = _docs(spark)
        got = sorted(
            map(tuple, SK.cms_sketch(docs, "doc_id", d=3, w=32).collect())
        )
        cte = SK.cms_oracle_sql("documents", "doc_id", d=3, w=32)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT doc_id FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')"
        )
        want = sorted(
            con.execute(
                f"WITH {cte.lstrip()} SELECT row, col, c FROM cms_out"
            ).fetchall()
        )
        assert got == want

    def test_merge_equals_sketch_of_union(self, spark):
        a = spark.createDataFrame(
            [(f"a{i % 20}",) for i in range(200)], "k string"
        )
        b = spark.createDataFrame(
            [(f"b{i % 20}",) for i in range(100)], "k string"
        )
        merged = sorted(
            map(
                tuple,
                SK.cms_merge(
                    SK.cms_sketch(a, "k", d=3, w=32),
                    SK.cms_sketch(b, "k", d=3, w=32),
                ).collect(),
            )
        )
        whole = sorted(
            map(
                tuple,
                SK.cms_sketch(a.unionByName(b), "k", d=3, w=32).collect(),
            )
        )
        assert merged == whole

    def test_point_query_overestimates_only(self, spark):
        # zipf-ish multiset; estimate >= true count for EVERY key, and
        # wide sketches are exact for the heavy hitters
        vals = []
        for i in range(50):
            vals.extend([f"k{i}"] * (1 + 200 // (i + 1)))
        df = spark.createDataFrame([(v,) for v in vals], "k string")
        sk = SK.cms_sketch(df, "k", d=4, w=64)
        keys = spark.createDataFrame(
            [(f"k{i}",) for i in range(50)], "k string"
        )
        est = {
            r["k"]: r["cms_est"]
            for r in SK.cms_query(sk, keys, "k", d=4, w=64).collect()
        }
        from collections import Counter

        true = Counter(vals)
        for k, t in true.items():
            assert est[k] >= t
        assert est["k0"] == true["k0"]  # heaviest key: no collision loss

    def test_query_matches_python_mirror(self, spark):
        vals = [f"k{i % 30}" for i in range(300)]
        df = spark.createDataFrame([(v,) for v in vals], "k string")
        regs = SK.cms_sketch_py(vals, d=3, w=16)
        sk = SK.cms_sketch(df, "k", d=3, w=16)
        keys = spark.createDataFrame(
            [("k3",), ("k7",), ("missing",)], "k string"
        )
        est = {
            r["k"]: r["cms_est"]
            for r in SK.cms_query(sk, keys, "k", d=3, w=16).collect()
        }
        for k in ("k3", "k7", "missing"):
            assert est[k] == SK.cms_query_py(regs, k, d=3, w=16)

    def test_point_oracle_fragment(self):
        vals = [f"k{i % 10}" for i in range(100)]
        regs = SK.cms_sketch_py(vals, d=3, w=16)
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE src AS SELECT unnest(["
            + ",".join(f"'{v}'" for v in vals)
            + "]) AS k"
        )
        cte = SK.cms_oracle_sql("src", "k", d=3, w=16)
        frag = SK.cms_point_oracle_sql("'k3'", d=3, w=16)
        (got,) = con.execute(
            f"WITH {cte.lstrip()} SELECT {frag}"
        ).fetchone()
        assert got == SK.cms_query_py(regs, "k3", d=3, w=16)

    def test_keys_never_shuffle(self, spark):
        docs = _docs(spark)
        plan = (
            SK.cms_sketch(docs, "text", d=4, w=64)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "HashAggregate" in plan
        for line in plan.splitlines():
            if "Exchange" in line and "text" in line:
                raise AssertionError(f"raw keys shuffled: {line}")


class TestBloom:
    M, K = 1 << 12, 3

    def _keys(self, spark):
        return spark.createDataFrame(
            [(f"k{i}",) for i in range(400)], "k string"
        )

    def test_matches_python_mirror(self, spark):
        got = {
            r["word"]: r["bits"]
            for r in SK.bloom_sketch(
                self._keys(spark), "k", self.M, self.K
            ).collect()
        }
        want = SK.bloom_sketch_py(
            [f"k{i}" for i in range(400)], self.M, self.K
        )
        assert got == want

    def test_duckdb_parity(self, spark):
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            "user_id"
        )
        got = sorted(
            map(
                tuple,
                SK.bloom_sketch(ev, "user_id", self.M, self.K).collect(),
            )
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW ev AS SELECT user_id FROM "
            f"read_parquet('{SF_DIR}/events.parquet')"
        )
        cte = SK.bloom_oracle_sql("user_id", "ev", self.M, self.K)
        want = sorted(
            con.execute(
                f"WITH {cte.lstrip()} SELECT word, bits FROM bloom_tbl"
            ).fetchall()
        )
        assert got == want

    def test_merge_is_sketch_of_union(self, spark):
        a = spark.createDataFrame([(f"a{i}",) for i in range(100)],
                                  "k string")
        b = spark.createDataFrame([(f"b{i}",) for i in range(100)],
                                  "k string")
        merged = sorted(
            map(
                tuple,
                SK.bloom_merge(
                    SK.bloom_sketch(a, "k", self.M, self.K),
                    SK.bloom_sketch(b, "k", self.M, self.K),
                ).collect(),
            )
        )
        union = sorted(
            map(
                tuple,
                SK.bloom_sketch(
                    a.unionByName(b), "k", self.M, self.K
                ).collect(),
            )
        )
        assert merged == union

    def test_no_false_negatives_and_bounded_fp(self, spark):
        keys = self._keys(spark)
        sk = SK.bloom_sketch(keys, "k", self.M, self.K)
        probe = spark.createDataFrame(
            [(f"k{i}",) for i in range(400)]
            + [(f"x{i}",) for i in range(400)],
            "k string",
        )
        rows = SK.bloom_might_contain(
            probe, sk, "k", self.M, self.K
        ).collect()
        members = [r for r in rows if r["k"].startswith("k")]
        others = [r for r in rows if r["k"].startswith("x")]
        assert all(r["bloom_hit"] for r in members)  # no false negatives
        fp = sum(1 for r in others if r["bloom_hit"])
        # (1 - e^(-kn/m))^k ~ 0.5% at n=400, m=4096, k=3; allow 10x slack
        assert fp <= 20, f"false-positive blowup: {fp}/400"
        # membership agrees with the Python mirror on every probe
        words = SK.bloom_sketch_py(
            [f"k{i}" for i in range(400)], self.M, self.K
        )
        for r in rows:
            assert r["bloom_hit"] == SK.bloom_contains_py(
                r["k"], words, self.M, self.K
            )

    def test_point_oracle_parity(self, spark):
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW src AS SELECT 'k' || CAST(range AS VARCHAR) AS k"
            " FROM range(400)"
        )
        cte = SK.bloom_oracle_sql("k", "src", self.M, self.K)
        point = SK.bloom_point_oracle_sql("p.k", self.M, self.K)
        got = dict(
            con.execute(
                f"WITH {cte.lstrip()}, probes AS ("
                "  SELECT 'k7' AS k UNION ALL SELECT 'nope')"
                f" SELECT p.k, {point} FROM probes p"
            ).fetchall()
        )
        words = SK.bloom_sketch_py(
            [f"k{i}" for i in range(400)], self.M, self.K
        )
        assert got["k7"] == 1
        assert got["nope"] == int(
            SK.bloom_contains_py("nope", words, self.M, self.K)
        )

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            SK.bloom_sketch(self._keys(spark), "k", m_bits=0)
        with pytest.raises(ValueError):
            SK.bloom_sketch(self._keys(spark), "k", k=0)
        with pytest.raises(ValueError):
            SK.bloom_merge()

    def test_keys_never_shuffle(self, spark):
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            "user_id"
        )
        plan = (
            SK.bloom_sketch(ev, "user_id", self.M, self.K)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for line in plan.splitlines():
            if "Exchange" in line and "user_id" in line:
                raise AssertionError(f"raw keys shuffled: {line}")

    def test_membership_is_projection(self, spark):
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            "event_id", "user_id"
        )
        sk = SK.bloom_sketch(
            ev.filter(F.col("user_id") % 2 == 0), "user_id",
            self.M, self.K,
        )
        plan = (
            SK.bloom_might_contain(ev, sk, "user_id", self.M, self.K)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the probe side must not shuffle: every Exchange in the plan
        # belongs to the sketch-build subtree (word-keyed or singleton)
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line and "word" not in line:
                raise AssertionError(f"probe side shuffled: {line}")
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


class TestHistogram:
    LO, HI, B = 0, 5_000_000, 64

    def _ev(self, spark):
        return spark.read.parquet(f"{SF_DIR}/events.parquet").select(
            "event_type",
            F.expr("CAST(round(value * 10000, 0) AS BIGINT)").alias(
                "value_e4"
            ),
        )

    def test_matches_python_mirror(self, spark):
        vals = [i * 977 % 4_999_999 for i in range(1000)] + [
            -5, 6_000_000  # clamp both ends
        ]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = {
            r["bucket"]: r["cnt"]
            for r in SK.hist_sketch(
                df, "v", self.LO, self.HI, self.B
            ).collect()
        }
        assert got == SK.hist_sketch_py(vals, self.LO, self.HI, self.B)

    def test_duckdb_parity_grouped(self, spark):
        got = sorted(
            map(
                tuple,
                SK.hist_sketch(
                    self._ev(spark), "value_e4", self.LO, self.HI,
                    self.B, group_cols=["event_type"],
                ).collect(),
            )
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW ev AS SELECT event_type, CAST(round(value *"
            f" 10000, 0) AS BIGINT) AS value_e4 FROM"
            f" read_parquet('{SF_DIR}/events.parquet')"
        )
        cte = SK.hist_oracle_sql(
            "value_e4", "ev", self.LO, self.HI, self.B,
            group_sql="event_type",
        )
        want = sorted(
            con.execute(
                f"WITH {cte.lstrip()} SELECT event_type, bucket, cnt"
                " FROM hist_tbl"
            ).fetchall()
        )
        assert got == want

    def test_merge_is_sketch_of_union(self, spark):
        a = spark.createDataFrame([(i * 7,) for i in range(500)], "v long")
        b = spark.createDataFrame(
            [(i * 13,) for i in range(500)], "v long"
        )
        merged = sorted(
            map(
                tuple,
                SK.hist_merge(
                    SK.hist_sketch(a, "v", self.LO, self.HI, self.B),
                    SK.hist_sketch(b, "v", self.LO, self.HI, self.B),
                ).collect(),
            )
        )
        union = sorted(
            map(
                tuple,
                SK.hist_sketch(
                    a.unionByName(b), "v", self.LO, self.HI, self.B
                ).collect(),
            )
        )
        assert merged == union

    def test_quantile_estimate(self, spark):
        ev = self._ev(spark)
        sk = SK.hist_sketch(
            ev, "value_e4", self.LO, self.HI, self.B,
            group_cols=["event_type"],
        )
        got = {
            r["event_type"]: (r["q_est"], r["n"])
            for r in SK.hist_quantile_est(
                sk, 500, self.LO, self.HI, self.B,
                group_cols=["event_type"],
            ).collect()
        }
        # mirror equality per group + one-bucket-width error vs exact
        width = (self.HI - self.LO) // self.B
        for et, (q_est, n) in got.items():
            rows = [
                r["value_e4"]
                for r in ev.filter(F.col("event_type") == et).collect()
            ]
            mirror = SK.hist_quantile_py(
                SK.hist_sketch_py(rows, self.LO, self.HI, self.B),
                500, self.LO, self.HI, self.B,
            )
            assert q_est == mirror and n == len(rows)
            exact = sorted(rows)[(len(rows) * 500 + 999) // 1000 - 1]
            assert q_est <= exact <= q_est + width

    def test_quantile_duckdb_parity(self, spark):
        sk = SK.hist_sketch(
            self._ev(spark), "value_e4", self.LO, self.HI, self.B,
            group_cols=["event_type"],
        )
        got = sorted(
            map(
                tuple,
                SK.hist_quantile_est(
                    sk, 950, self.LO, self.HI, self.B,
                    group_cols=["event_type"],
                ).collect(),
            )
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW ev AS SELECT event_type, CAST(round(value *"
            f" 10000, 0) AS BIGINT) AS value_e4 FROM"
            f" read_parquet('{SF_DIR}/events.parquet')"
        )
        cte = SK.hist_oracle_sql(
            "value_e4", "ev", self.LO, self.HI, self.B,
            group_sql="event_type",
        )
        q = SK.hist_quantile_oracle_sql(
            950, self.LO, self.HI, self.B, group_sql="event_type"
        )
        want = sorted(
            con.execute(
                f"WITH {cte.lstrip()},{q.lstrip()} "
                "SELECT event_type, q_est, n FROM hist_q"
            ).fetchall()
        )
        assert got == want

    def test_validation(self, spark):
        df = spark.createDataFrame([(1,)], "v long")
        with pytest.raises(ValueError):
            SK.hist_sketch(df, "v", 5, 5, 8)
        with pytest.raises(ValueError):
            SK.hist_sketch(df, "v", 0, 10, 0)
        with pytest.raises(ValueError):
            SK.hist_quantile_est(df, 0, 0, 10, 8)
        with pytest.raises(ValueError):
            SK.hist_merge()

    def test_values_never_shuffle(self, spark):
        plan = (
            SK.hist_sketch(
                self._ev(spark), "value_e4", self.LO, self.HI, self.B,
                group_cols=["event_type"],
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        for line in plan.splitlines():
            if "Exchange" in line and (
                "value_e4" in line or "_hv" in line
            ):
                raise AssertionError(f"raw values shuffled: {line}")


class TestKmv:
    def _k(self, spark, vals):
        return spark.createDataFrame([(v,) for v in vals], "k string")

    def test_matches_python_mirror_exact_bottom_k(self, spark):
        vals = [f"k{i}" for i in range(400)]
        got = [
            r["hv"]
            for r in SK.kmv_sketch(self._k(spark, vals), "k", k=32)
            .orderBy("hv")
            .collect()
        ]
        assert got == SK.kmv_sketch_py(vals, k=32)
        # exactness vs brute force over ALL hashes
        all_h = sorted(
            SK.kmv_sketch_py(vals, k=10**9)
        )
        assert got == all_h[:32]

    def test_duplicates_do_not_move_sketch(self, spark):
        a = [f"k{i}" for i in range(150)]
        b = [f"k{i % 150}" for i in range(1200)]
        ra = [
            r["hv"]
            for r in SK.kmv_sketch(self._k(spark, a), "k", k=24)
            .orderBy("hv").collect()
        ]
        rb = [
            r["hv"]
            for r in SK.kmv_sketch(self._k(spark, b), "k", k=24)
            .orderBy("hv").collect()
        ]
        assert ra == rb

    def test_duckdb_parity_sketch_summary_intersect(self, spark):
        docs = _docs(spark)
        sk_full = SK.kmv_sketch(docs, "doc_id", k=20, salt="kp")
        got_sk = [r["hv"] for r in sk_full.orderBy("hv").collect()]
        a = SK.kmv_sketch(
            docs.filter(F.col("doc_id") % 2 == 0), "doc_id", k=20,
            salt="kp",
        )
        b = SK.kmv_sketch(
            docs.filter(F.col("doc_id") % 3 == 0), "doc_id", k=20,
            salt="kp",
        )
        got_sum = SK.kmv_summary(sk_full).collect()[0]
        got_int = SK.kmv_intersect(a, b, k=20).collect()[0]

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT doc_id FROM "
            f"read_parquet('{SF_DIR}/documents.parquet')"
        )
        ctes = ",".join(
            [
                SK.kmv_oracle_sql(
                    "documents", "doc_id", k=20, salt="kp",
                    prefix="kf_",
                ).lstrip(),
                SK.kmv_oracle_sql(
                    "(SELECT doc_id FROM documents WHERE doc_id % 2 = 0)",
                    "doc_id", k=20, salt="kp", prefix="ka_",
                ).lstrip(),
                SK.kmv_oracle_sql(
                    "(SELECT doc_id FROM documents WHERE doc_id % 3 = 0)",
                    "doc_id", k=20, salt="kp", prefix="kb_",
                ).lstrip(),
                SK.kmv_summary_oracle_sql("kf_out", prefix="ks_").lstrip(),
                SK.kmv_intersect_oracle_sql(
                    "ka_out", "kb_out", k=20, prefix="ki_",
                ).lstrip(),
            ]
        )
        want_sk = [
            r[0]
            for r in con.execute(
                f"WITH {ctes} SELECT hv FROM kf_out ORDER BY hv"
            ).fetchall()
        ]
        want_sum = con.execute(
            f"WITH {ctes} SELECT kmv_n, kmv_kth, kmv_md5 FROM ks_out"
        ).fetchone()
        want_int = con.execute(
            f"WITH {ctes} SELECT theta, n_match FROM ki_out"
        ).fetchone()
        assert got_sk == want_sk
        assert (
            got_sum["kmv_n"], got_sum["kmv_kth"], got_sum["kmv_md5"]
        ) == want_sum
        assert (got_int["theta"], got_int["n_match"]) == want_int

    def test_merge_is_sketch_of_union(self, spark):
        a = [f"a{i}" for i in range(200)]
        b = [f"b{i}" for i in range(200)]
        merged = [
            r["hv"]
            for r in SK.kmv_merge(
                SK.kmv_sketch(self._k(spark, a), "k", k=24),
                SK.kmv_sketch(self._k(spark, b), "k", k=24),
                k=24,
            ).orderBy("hv").collect()
        ]
        union = [
            r["hv"]
            for r in SK.kmv_sketch(self._k(spark, a + b), "k", k=24)
            .orderBy("hv").collect()
        ]
        assert merged == union

    def test_estimate_accuracy_full_and_exact_small(self, spark):
        vals = [f"v{i}" for i in range(3000)]
        sk = SK.kmv_sketch_py(vals, k=256)
        est = SK.kmv_estimate_py(sk, k=256)
        # sigma ~ n/sqrt(k-2) ~ 188; allow 4 sigma
        assert abs(est - 3000) < 760
        small = SK.kmv_sketch_py(["x", "y", "z"], k=256)
        assert SK.kmv_estimate_py(small, k=256) == 3.0

    def test_intersection_evidence_and_estimate(self, spark):
        # A = 0..599, B = 400..999 -> |A ∩ B| = 200
        a_vals = [f"s{i}" for i in range(600)]
        b_vals = [f"s{i}" for i in range(400, 1000)]
        a = SK.kmv_sketch(self._k(spark, a_vals), "k", k=128)
        b = SK.kmv_sketch(self._k(spark, b_vals), "k", k=128)
        row = SK.kmv_intersect(a, b, k=128).collect()[0]
        est = SK.kmv_intersect_estimate_py(row["theta"], row["n_match"])
        assert 80 < est < 380  # truth 200, k=128 sampling error
        # non-full branch: both sketches retain everything ->
        # theta = 2^48 and the match count is EXACT
        sa = SK.kmv_sketch(self._k(spark, a_vals[:50]), "k", k=128)
        sb = SK.kmv_sketch(self._k(spark, a_vals[25:75]), "k", k=128)
        r2 = SK.kmv_intersect(sa, sb, k=128).collect()[0]
        assert r2["theta"] == SK.KMV_MAX_HASH
        assert r2["n_match"] == 25
        assert (
            SK.kmv_intersect_estimate_py(r2["theta"], r2["n_match"])
            == 25.0
        )

    def test_corpus_never_shuffles_below_pruner(self, spark):
        docs = _docs(spark)
        plan = (
            SK.kmv_sketch(docs, "text", k=64)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan
        assert "MapInPandas" in plan
        # the only exchange is over the pruned hv candidates — the raw
        # key column must never cross one, and no exchange may sit
        # below the pruner (scan -> project -> prune is narrow)
        pruner_seen = False
        for line in plan.splitlines():
            if "MapInPandas" in line:
                pruner_seen = True
            if "Exchange" in line:
                assert not pruner_seen or "hv" in line
                assert "text" not in line, f"raw keys shuffled: {line}"
        # executedPlan prints top-down: anything after MapInPandas is
        # BELOW it — there must be no Exchange there
        below = plan.split("MapInPandas", 1)[1]
        assert "Exchange" not in below

    def test_validation(self, spark):
        df = self._k(spark, ["x"])
        with pytest.raises(ValueError):
            SK.kmv_sketch(df, "k", k=0)
        with pytest.raises(ValueError):
            SK.kmv_merge(k=4)


class TestHeavyHitters:
    """Misra-Gries candidate pruning + two-pass exact heavy hitters:
    the superset guarantee across adversarial partition layouts, exact
    equality of the guaranteed set to brute force, bounded summary
    size, plan shape, and DuckDB parity of the oracle chain."""

    def _zipf(self, spark, parts):
        # deterministic zipf-ish multiset: key i repeated 600 // (i+1)
        # times -> key 0 has 600 of 1472 total (share 0.41)
        rows = [(i,) for i in range(12) for _ in range(600 // (i + 1))]
        return spark.createDataFrame(rows, "k long").repartition(parts)

    def _brute(self, rows, k):
        from collections import Counter

        c = Counter(v for (v,) in rows)
        n = sum(c.values())
        return {key: cnt for key, cnt in c.items() if cnt * (k + 1) > n}

    def test_superset_guarantee_across_layouts(self, spark):
        rows = [(i,) for i in range(12) for _ in range(600 // (i + 1))]
        heavy = set(self._brute(rows, 3))
        assert heavy  # the test must not be vacuous
        for parts in (1, 3, 7):
            df = spark.createDataFrame(rows, "k long").repartition(parts)
            cands = {
                r["key"] for r in SK.mg_candidates(df, "k", 3).collect()
            }
            assert heavy <= cands, (parts, heavy, cands)

    def test_summary_size_bounded(self, spark):
        df = self._zipf(spark, 5)
        n_parts = df.rdd.getNumPartitions()
        got = SK.mg_candidates(df, "k", 4).count()
        assert got <= 4 * n_parts

    def test_exact_equality_to_brute_force(self, spark):
        rows = [(i,) for i in range(12) for _ in range(600 // (i + 1))]
        expected = self._brute(rows, 3)
        for parts in (1, 4, 9):
            df = spark.createDataFrame(rows, "k long").repartition(parts)
            got = {
                r["key"]: r["cnt"]
                for r in SK.heavy_hitters_exact(df, "k", 3).collect()
                if r["guaranteed"]
            }
            assert got == expected, parts

    def test_nonguaranteed_counts_are_exact(self, spark):
        from collections import Counter

        rows = [(i,) for i in range(12) for _ in range(600 // (i + 1))]
        true = Counter(v for (v,) in rows)
        df = spark.createDataFrame(rows, "k long").repartition(4)
        for r in SK.heavy_hitters_exact(df, "k", 3).collect():
            assert r["cnt"] == true[r["key"]]

    def test_python_mirror_guarantee(self):
        vals = [i for i in range(12) for _ in range(600 // (i + 1))]
        summary = SK.mg_candidates_py(vals, 3)
        heavy = self._brute([(v,) for v in vals], 3)
        assert set(heavy) <= set(summary)
        assert len(summary) <= 3

    def test_null_keys_ignored(self, spark):
        df = spark.createDataFrame(
            [(1,), (1,), (1,), (None,), (2,)], "k long"
        )
        out = SK.heavy_hitters_exact(df, "k", 2).collect()
        keys = {r["key"] for r in out}
        assert None not in keys
        byk = {r["key"]: r for r in out}
        # N counts non-null rows only: 4; 3*(2+1)=9 > 4 -> guaranteed
        assert byk[1]["cnt"] == 3 and byk[1]["guaranteed"]

    def test_string_keys(self, spark):
        df = spark.createDataFrame(
            [("a",)] * 9 + [("b",)] * 2 + [("c",)], "k string"
        )
        got = {
            r["key"]: r["guaranteed"]
            for r in SK.heavy_hitters_exact(df, "k", 2).collect()
        }
        assert got["a"] is True  # 9*3 > 12

    def test_candidate_cap_raises(self, spark):
        df = self._zipf(spark, 5)
        with pytest.raises(ValueError, match="max_candidates"):
            SK.heavy_hitters_exact(df, "k", 8, max_candidates=1)

    def test_pass1_plan_no_exchange(self, spark):
        df = self._zipf(spark, 5)
        plan = (
            SK.mg_candidates(df, "k", 4)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # repartition() in the fixture is the only exchange; nothing
        # may sit ABOVE the summarizer (executedPlan prints top-down)
        above = plan.split("MapInPandas", 1)[0]
        assert "Exchange" not in above, plan

    def test_duckdb_parity(self, spark):
        import duckdb as ddb

        rows = [(i,) for i in range(12) for _ in range(600 // (i + 1))]
        df = spark.createDataFrame(rows, "k long").repartition(6)
        got = sorted(
            (r["key"], r["cnt"])
            for r in SK.heavy_hitters_exact(df, "k", 3).collect()
            if r["guaranteed"]
        )
        con = ddb.connect()
        con.execute(
            "CREATE TABLE src AS SELECT unnest(?) AS k",
            [[v for (v,) in rows]],
        )
        oracle = con.execute(
            f"WITH {SK.heavy_hitters_oracle_sql('src', 'k', 3)}\n"
            "SELECT key, cnt FROM hh_out ORDER BY key"
        ).fetchall()
        assert got == [tuple(r) for r in oracle]
