"""Record linkage: blocked fuzzy matching, sorted-neighborhood blocking,
entity clustering — hand-exact semantics, DuckDB parity on the real part
table, partition-invariance and plan pins."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import linkage as LK

SF_DIR = "/root/testdata/sf0.001"
PART = f"{SF_DIR}/part.parquet"


def _toy(spark):
    rows = [
        (1, "small ring", "blk1"),
        (2, "small rings", "blk1"),   # lev 1 vs id 1 -> sim 910
        (3, "small gear", "blk1"),    # lev 4 vs id 1 -> sim 600
        (4, "small ring", "blk2"),    # exact dup of 1 but OTHER block
        (5, "tiny bolt", "blk3"),     # lonely block
    ]
    return spark.createDataFrame(rows, "pid long, name string, blk string")


def _parts(spark):
    return spark.read.parquet(PART).select("p_partkey", "p_name")


class TestBlockedFuzzy:
    def test_hand_exact(self, spark):
        got = {
            (r["id_a"], r["id_b"]): (r["lev"], r["sim_pmille"])
            for r in LK.fuzzy_matches(
                _toy(spark), "pid", "name", ["blk"], min_sim_pmille=0
            ).collect()
        }
        assert got == {(1, 2): (1, 910), (1, 3): (4, 600), (2, 3): (5, 546)}
        high = LK.fuzzy_matches(
            _toy(spark), "pid", "name", ["blk"], min_sim_pmille=800
        ).collect()
        assert {(r["id_a"], r["id_b"]) for r in high} == {(1, 2)}

    def test_block_guard_raises(self, spark):
        with pytest.raises(ValueError, match="max_block_rows"):
            LK.blocked_candidate_pairs(
                _toy(spark), "pid", "name", ["blk"], max_block_rows=2
            )

    def test_duckdb_parity_real_parts(self, spark):
        df = _parts(spark).withColumn(
            "w1", F.split("p_name", " ").getItem(0)
        )
        got = {
            (r["id_a"], r["id_b"]): (r["lev"], r["sim_pmille"])
            for r in LK.fuzzy_matches(
                df, "p_partkey", "p_name", ["w1"], min_sim_pmille=700
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW part AS SELECT * FROM read_parquet('{PART}')"
        )
        cte = LK.fuzzy_matches_oracle_sql(
            "(SELECT *, split_part(p_name, ' ', 1) AS w1 FROM part)",
            "p_partkey", "p_name", ["w1"], min_sim_pmille=700,
        )
        want = {
            (a, b): (lv, s)
            for a, b, lv, s in con.execute(
                f"WITH {cte.lstrip()} SELECT id_a, id_b, lev, sim_pmille"
                " FROM match_tbl"
            ).fetchall()
        }
        assert got == want
        assert len(got) > 50  # the part names really do collide
        assert any(s < 1000 for _, s in got.values())  # non-exact matches

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            LK.blocked_candidate_pairs(_toy(spark), "pid", "name", [])


class TestSortedNeighborhood:
    def test_hand_exact(self, spark):
        # global order by (name, pid): 1,4 ("small ring"), 2, 3, 5
        got = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in LK.sorted_neighborhood_pairs(
                _toy(spark), "pid", "name", window=2, num_partitions=1
            ).collect()
        }
        assert got == {
            (3, 1): 1, (3, 4): 2,        # "small gear" -> both rings
            (1, 4): 1, (1, 2): 2,
            (4, 2): 1, (4, 5): 2,
            (2, 5): 1,
        }

    def test_partition_invariance(self, spark):
        df = _parts(spark)
        base = None
        for np_ in (1, 3, 8):
            got = {
                (r["id_a"], r["id_b"], r["dist"])
                for r in LK.sorted_neighborhood_pairs(
                    df, "p_partkey", "p_name", window=3,
                    num_partitions=np_,
                ).collect()
            }
            if base is None:
                base = got
            assert got == base, f"pair set drifted at num_partitions={np_}"

    def test_duckdb_parity_real_parts(self, spark):
        got = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in LK.sorted_neighborhood_pairs(
                _parts(spark), "p_partkey", "p_name", window=3,
                num_partitions=4,
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW part AS SELECT * FROM read_parquet('{PART}')"
        )
        cte = LK.snm_oracle_sql("part", "p_partkey", "p_name", window=3)
        want = {
            (a, b): d
            for a, b, d in con.execute(
                f"WITH {cte.lstrip()} SELECT id_a, id_b, dist FROM snm_tbl"
            ).fetchall()
        }
        assert got == want
        # cross-chunk pairs really exercised: 4 partitions over 200 parts
        assert len(got) == len(want) > 0

    def test_validation(self, spark):
        with pytest.raises(ValueError):
            LK.sorted_neighborhood_pairs(_toy(spark), "pid", "name", window=0)


class TestEntities:
    def test_clusters_and_oracle(self, spark):
        df = _parts(spark).withColumn(
            "w1", F.split("p_name", " ").getItem(0)
        )
        matches = LK.fuzzy_matches(
            df, "p_partkey", "p_name", ["w1"], min_sim_pmille=900
        )
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in LK.match_entities(matches).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW part AS SELECT * FROM read_parquet('{PART}')"
        )
        cte = LK.fuzzy_matches_oracle_sql(
            "(SELECT *, split_part(p_name, ' ', 1) AS w1 FROM part)",
            "p_partkey", "p_name", ["w1"], min_sim_pmille=900,
        )
        want = dict(
            con.execute(
                f"WITH RECURSIVE {cte.lstrip()},"
                f" {LK.entity_oracle_sql().lstrip()}"
                " SELECT doc_id, cluster_id FROM entity_tbl"
            ).fetchall()
        )
        assert got == want
        # real multi-member clusters exist (exact name dupes in part)
        from collections import Counter
        sizes = Counter(got.values())
        assert max(sizes.values()) >= 3

    def test_no_cartesian_plan(self, spark):
        df = _parts(spark).withColumn(
            "w1", F.split("p_name", " ").getItem(0)
        )
        plan = (
            LK.fuzzy_matches(df, "p_partkey", "p_name", ["w1"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "NestedLoop" not in plan


class TestSnmEdgeChunks:
    def test_more_chunks_than_rows(self, spark):
        # 5 rows into 8 range chunks: every chunk is sub-window (< w=2
        # rows), so ALL pairs must come out of the boundary pass — and
        # still exactly match the single-chunk result
        a = {
            tuple(r)
            for r in LK.sorted_neighborhood_pairs(
                _toy(spark), "pid", "name", window=2, num_partitions=1
            ).collect()
        }
        b = {
            tuple(r)
            for r in LK.sorted_neighborhood_pairs(
                _toy(spark), "pid", "name", window=2, num_partitions=8
            ).collect()
        }
        assert a == b and len(a) == 7
