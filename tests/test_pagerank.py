"""Integer-exact PageRank + inlink anchor aggregation
(operators/pagerank.py).

The exactness claim is the whole point: both operators must produce
bit-identical values in Spark and DuckDB regardless of partitioning, so
the tests run the SAME synthetic graph through both engines and compare
row-for-row, and re-run Spark under a different partition count to pin
order-independence."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators import pagerank as PR


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


def _spark_ranks(spark, rows, **kw):
    out = PR.pagerank_e9(_edges(spark, rows), **kw)
    return {r["node"]: r["rank_e9"] for r in out.collect()}


def _duck_ranks(rows, **kw):
    con = duckdb.connect()
    vals = ", ".join(f"('{s}', '{d}')" for s, d in rows)
    ctes, final = PR.oracle_pagerank_ctes("edges", **kw)
    q = (
        f"WITH edges(src, dst) AS (VALUES {vals}),\n{ctes}\n"
        f"SELECT node, rank_e9 FROM {final}"
    )
    return {n: r for n, r in con.sql(q).fetchall()}


# a small web: 'hub' is pointed at by everyone, 'dang' has no outlinks,
# 'b'->'hub' twice (multigraph), self-loop on 'c'
WEB = [
    ("a", "hub"),
    ("b", "hub"),
    ("b", "hub"),
    ("c", "hub"),
    ("c", "c"),
    ("hub", "dang"),
    ("a", "b"),
]


class TestPagerank:
    def test_mass_conserved_within_floor_loss(self, spark):
        ranks = _spark_ranks(spark, WEB, iters=3)
        total = sum(ranks.values())
        n = len(ranks)
        # floor losses only ever shrink mass; each iteration loses < 1
        # unit per node per div (teleport, damp, contrib, dangling)
        assert total <= PR.E9
        assert total >= PR.E9 - 4 * n * 3 - n
        assert set(ranks) == {"a", "b", "c", "hub", "dang"}
        assert all(v > 0 for v in ranks.values())

    def test_hub_outranks_leaves_and_dangling_gets_hub_mass(self, spark):
        ranks = _spark_ranks(spark, WEB, iters=3)
        # everyone points at hub; hub only points at dang
        assert ranks["hub"] > ranks["a"]
        assert ranks["hub"] > ranks["b"]
        # dang receives hub's whole (damped) mass, so it beats the leaves
        assert ranks["dang"] > ranks["a"]

    def test_partitioning_invariance(self, spark):
        e = _edges(spark, WEB)
        one = {
            r["node"]: r["rank_e9"]
            for r in PR.pagerank_e9(e.coalesce(1), iters=3).collect()
        }
        many = {
            r["node"]: r["rank_e9"]
            for r in PR.pagerank_e9(e.repartition(7), iters=3).collect()
        }
        assert one == many

    @pytest.mark.parametrize("iters", [1, 3])
    def test_duckdb_oracle_exact(self, spark, iters):
        assert _spark_ranks(spark, WEB, iters=iters) == _duck_ranks(
            WEB, iters=iters
        )

    def test_duckdb_oracle_exact_on_generated_graph(self, spark):
        # a denser deterministic graph: 40 nodes, f(i) edges, some dangling
        rows = []
        for i in range(40):
            if i % 7 == 3:
                continue  # dangling
            rows.append((f"n{i}", f"n{(i * 13 + 1) % 40}"))
            rows.append((f"n{i}", f"n{(i * 5 + 2) % 40}"))
            if i % 3 == 0:
                rows.append((f"n{i}", f"n{(i + 1) % 40}"))
        assert _spark_ranks(spark, rows, iters=3) == _duck_ranks(
            rows, iters=3
        )

    def test_damping_100_pure_flow(self, spark):
        # d=100: no teleport — a pure sink chain accumulates everything.
        # truncate_every=2 pins the lineage-truncation path at a depth
        # (8 iters) where the untruncated logical plan is 2^8 copies of
        # the base (measured 55 s of pure planning; ~4 s truncated).
        chain = [("a", "b"), ("b", "c")]
        ranks = _spark_ranks(
            spark, chain, iters=8, damping_pct=100, truncate_every=2
        )
        assert ranks == _duck_ranks(chain, iters=8, damping_pct=100)


LINKS = [
    # (src, dst, anchor): t1 gets 'click' twice + 'here' twice -> tie on
    # count, 'click' < 'here' lexicographically
    ("s1", "t1", "click"),
    ("s2", "t1", "click"),
    ("s1", "t1", "here"),
    ("s3", "t1", "here"),
    ("s1", "t2", "zzz"),
]


class TestInlinkAnchors:
    def test_counts_and_deterministic_tiebreak(self, spark):
        links = spark.createDataFrame(
            LINKS, "doc_id string, href string, anchor string"
        )
        out = {
            r["node"]: r for r in PR.inlink_anchors(links).collect()
        }
        assert out["t1"]["n_inlinks"] == 4
        assert out["t1"]["top_anchor"] == "click"  # tie -> lexicographic
        assert out["t2"]["n_inlinks"] == 1
        assert out["t2"]["top_anchor"] == "zzz"

    def test_duckdb_mirror(self, spark):
        links = spark.createDataFrame(
            LINKS, "doc_id string, href string, anchor string"
        )
        got = {
            (r["node"], r["n_inlinks"], r["n_source_anchor_pairs"],
             r["top_anchor"])
            for r in PR.inlink_anchors(links).collect()
        }
        vals = ", ".join(f"('{s}', '{d}', '{a}')" for s, d, a in LINKS)
        q = (
            f"WITH edges(src, dst, anchor) AS (VALUES {vals})\n"
            + PR.oracle_inlink_anchors_sql("edges")
        )
        con = duckdb.connect()  # keep alive: a temp conn can be GC'd
        want = set(con.sql(q).fetchall())
        assert got == want


def _duck_hits(rows, **kw):
    con = duckdb.connect()
    vals = ", ".join(f"('{s}', '{d}')" for s, d in rows)
    ctes, final = PR.oracle_hits_ctes("edges", **kw)
    q = (
        f"WITH edges(src, dst) AS (VALUES {vals}),\n{ctes}\n"
        f"SELECT node, hub_e6, auth_e6 FROM {final}"
    )
    return {n: (h, a) for n, h, a in con.sql(q).fetchall()}


def _spark_hits(spark, rows, **kw):
    out = PR.hits_e6(_edges(spark, rows), **kw)
    return {
        r["node"]: (r["hub_e6"], r["auth_e6"]) for r in out.collect()
    }


class TestHits:
    def test_hub_and_authority_separation(self, spark):
        # 'hub' links to every leaf; every leaf links to 'auth'
        rows = [("hub", f"l{i}") for i in range(4)] + [
            (f"l{i}", "auth") for i in range(4)
        ]
        got = _spark_hits(spark, rows, iters=3)
        # hub has the top hub score, auth the top authority score
        assert got["hub"][0] == max(v[0] for v in got.values())
        assert got["auth"][1] == max(v[1] for v in got.values())
        # and the roles don't bleed: hub receives no links, auth emits none
        assert got["hub"][1] == 0
        assert got["auth"][0] == 0

    @pytest.mark.parametrize("iters", [1, 3])
    def test_duckdb_oracle_exact(self, spark, iters):
        assert _spark_hits(spark, WEB, iters=iters) == _duck_hits(
            WEB, iters=iters
        )

    def test_duckdb_oracle_exact_on_generated_graph(self, spark):
        rows = []
        for i in range(40):
            if i % 7 == 3:
                continue
            rows.append((f"n{i}", f"n{(i * 13 + 1) % 40}"))
            rows.append((f"n{i}", f"n{(i * 5 + 2) % 40}"))
            if i % 3 == 0:
                rows.append((f"n{i}", f"n{(i + 1) % 40}"))
        assert _spark_hits(spark, rows, iters=2) == _duck_hits(
            rows, iters=2
        )

    def test_partitioning_invariance(self, spark):
        e = _edges(spark, WEB)
        one = {
            r["node"]: (r["hub_e6"], r["auth_e6"])
            for r in PR.hits_e6(e.coalesce(1), iters=2).collect()
        }
        many = {
            r["node"]: (r["hub_e6"], r["auth_e6"])
            for r in PR.hits_e6(
                e.repartition(7), iters=2, truncate_every=1
            ).collect()
        }
        assert one == many  # also pins truncation value-invariance

    def test_l1_mass_bounded(self, spark):
        got = _spark_hits(spark, WEB, iters=3)
        n = len(got)
        # the divide-first normalization's den is FLOORED (sum div 1e6),
        # so the post-div total lands in [1e6 - n, 2e6): sum < (den+1)*1e6
        # implies total <= sum/den < 1e6*(den+1)/den <= 2e6. HITS is
        # scale-free — the bound pins "bounded, never runaway", while the
        # oracle tests pin the exact values.
        assert sum(v[0] for v in got.values()) < 2 * PR.E6
        assert sum(v[1] for v in got.values()) < 2 * PR.E6
        assert sum(v[1] for v in got.values()) > PR.E6 // 2
        assert sum(v[0] for v in got.values()) > PR.E6 // 2
        assert n == 5


class TestTriangles:
    def test_k4_and_star(self, spark):
        k4 = [(a, b) for i, a in enumerate("wxyz") for b in "wxyz"[i + 1:]]
        t = PR.triangles(_edges(spark, k4)).collect()
        assert len(t) == 4                          # C(4,3)
        counts = {
            r["node"]: r["n_triangles"]
            for r in PR.node_triangle_counts(_edges(spark, k4)).collect()
        }
        assert counts == {c: 3 for c in "wxyz"}
        # star graph: hub with 5 leaves, zero triangles — and the
        # orientation points every edge AT the hub (leaves rank lower)
        star = [("hub", f"l{i}") for i in range(5)]
        assert PR.triangles(_edges(spark, star)).count() == 0
        o = PR.oriented_edges(_edges(spark, star)).collect()
        assert all(r["v"] == "hub" for r in o)      # bounded fan-out shape

    def test_parallel_edges_self_loops_direction(self, spark):
        rows = [("a", "b"), ("b", "a"), ("a", "b"), ("a", "a"),
                ("b", "c"), ("c", "a")]
        t = PR.triangles(_edges(spark, rows)).collect()
        assert len(t) == 1                          # one simple triangle
        counts = {
            r["node"]: r["n_triangles"]
            for r in PR.node_triangle_counts(_edges(spark, rows)).collect()
        }
        assert counts == {"a": 1, "b": 1, "c": 1}

    def test_duckdb_parity_planted(self, spark):
        # consecutive-triple plant: u->u+1 and (u%4 != 2) u->u+2 on a
        # 100-node ring — guaranteed triangles with per-node variety
        rows = []
        for d in range(311):
            u = d % 100
            if d % 11 != 5:
                rows.append((f"m{u:02d}", f"m{(u + 1) % 100:02d}"))
            if d % 4 != 2:
                rows.append((f"m{u:02d}", f"m{(u + 2) % 100:02d}"))
        got_t = {
            (r["ta"], r["tb"], r["tc"])
            for r in PR.triangles(_edges(spark, rows)).collect()
        }
        got_n = {
            r["node"]: r["n_triangles"]
            for r in PR.node_triangle_counts(_edges(spark, rows)).collect()
        }
        con = duckdb.connect()
        vals = ", ".join(f"('{s}', '{t}')" for s, t in rows)
        cte = PR.oracle_triangles_sql(f"(VALUES {vals}) t(src, dst)")
        want_t = set(
            con.execute(
                f"WITH {cte.lstrip()} SELECT ta, tb, tc FROM tri_tbl"
            ).fetchall()
        )
        want_n = dict(
            con.execute(
                f"WITH {cte.lstrip()} SELECT node, n_triangles FROM tri_node"
            ).fetchall()
        )
        assert got_t == want_t and len(got_t) > 50
        assert got_n == want_n
        assert len(set(got_n.values())) >= 2        # per-node variety

    def test_partition_independence(self, spark):
        rows = [(f"m{d % 60}", f"m{(d * 7 + 1) % 60}") for d in range(200)]
        a = {
            tuple(r)
            for r in PR.triangles(_edges(spark, rows)).collect()
        }
        b = {
            tuple(r)
            for r in PR.triangles(
                _edges(spark, rows).repartition(13)
            ).collect()
        }
        assert a == b

    def test_no_cartesian(self, spark):
        rows = [("a", "b"), ("b", "c"), ("c", "a")]
        plan = (
            PR.triangles(_edges(spark, rows))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
