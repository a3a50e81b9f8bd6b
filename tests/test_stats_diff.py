"""A8 category mapping (get_collection_statistics.py:19-72) and J9
positional diff (extracting_diference_solr_results.py:35-64) library
operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators.diff import (
    positional_diff,
    symmetric_id_diff,
)
from index_search_monorepo_spark.operators.stats import (
    GENERAL_CALLNO_MAP,
    callno_mapping_dim,
    category_rollup,
)


class TestCategoryRollup:
    def test_mapped_and_unmapped_letters(self, spark):
        facets = spark.createDataFrame(
            [
                ("QA76 compilers", 10),
                ("quantum physics", 5),
                ("Islands atlas", 7),  # 'I' has no general map entry
                ("zoology", 2),
            ],
            "value string, count long",
        )
        out = {r["first_letter"]: r for r in category_rollup(facets).collect()}
        # reference quirk: category is the text after the first '-',
        # LEADING SPACE preserved (get_category_name on 'Q - Science')
        assert out["Q"]["category"] == " Science"
        assert out["Q"]["n_values"] == 2
        assert out["Q"]["total_count"] == 15
        # unmapped letter falls through to the letter itself (:61-62)
        assert out["I"]["category"] == "I"
        assert out["Z"]["category"].endswith("Information Resources")

    def test_mapping_dim_matches_properties_constants(self, spark):
        dim = {r["first_letter"]: r["category"] for r in callno_mapping_dim(spark).collect()}
        assert len(dim) == len(GENERAL_CALLNO_MAP)
        assert dim["A"] == " General Works"


class TestDiff:
    def test_positional_diff_mismatch_and_short_side(self, spark):
        a = spark.createDataFrame(
            [(1, "x"), (2, "y"), (3, "z"), (4, "w")], "pos int, id string"
        )
        b = spark.createDataFrame(
            [(1, "x"), (2, "z"), (3, "y")], "pos int, id string"
        )
        out = {r["pos"]: (r["id_a"], r["id_b"]) for r in positional_diff(a, b).collect()}
        # same id at pos 1 -> not a mismatch; swapped at 2/3; 4 only in a
        # (the reference counts IndexError positions as mismatches, :51-53)
        assert 1 not in out
        assert out[2] == ("y", "z")
        assert out[3] == ("z", "y")
        assert out[4] == ("w", None)

    def test_symmetric_id_diff(self, spark):
        a = spark.createDataFrame([("x",), ("y",)], "id string")
        b = spark.createDataFrame([("y",), ("q",)], "id string")
        out = {(r["id"], r["side"]) for r in symmetric_id_diff(a, b).collect()}
        assert out == {("x", "a_only"), ("q", "b_only")}

    def test_engine_hits_compare(self, spark):
        from index_search_monorepo_spark.operators.diff import (
            engine_hits_compare,
        )

        # engine A has 3 hits for (q1, AND), 1 for (q2, OR); engine B has 2
        # for (q1, AND) and a (q3, None-op) group A never produced
        a = spark.createDataFrame(
            [("q1", "AND", 1), ("q1", "AND", 2), ("q1", "AND", 3),
             ("q2", "OR", 4)],
            "query_string string, operator string, doc int",
        )
        b = spark.createDataFrame(
            [("q1", "AND", 1), ("q1", "AND", 2), ("q3", "None", 9)],
            "query_string string, operator string, doc int",
        )
        out = {
            (r["query_string"], r["operator"]): (
                r["total_hits_solr6"],
                r["total_hits_solr8"],
            )
            for r in engine_hits_compare(
                a, b, suffixes=("_solr6", "_solr8")
            ).collect()
        }
        # missing side reports 0 (the reference's missing-file branch,
        # solr_engines_total_hits.py:73-80)
        assert out == {
            ("q1", "AND"): (3, 2),
            ("q2", "OR"): (1, 0),
            ("q3", "None"): (0, 1),
        }
