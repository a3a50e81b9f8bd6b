"""ISO 639 language report operator (reference:
app/data_operations/src/metadata_extractor/report_generation.py) — every
preserved quirk pinned against hand-built MARC records."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from index_search_monorepo_spark.operators.language_report import (
    language_report,
    oclc_number_expr,
    rights_code_expr,
)
from index_search_monorepo_spark.sources.marc_json import MARC_SCHEMA


def _rec(spark, fields):
    """One-record DataFrame in the columnar MARC shape."""
    rows = [
        {
            "leader": "00000cam a2200000 a 4500",
            "fields": [
                {
                    "tag": t,
                    "data": data,
                    "ind1": ind[0] if ind else None,
                    "ind2": ind[1] if ind else None,
                    "subfields": (
                        [{"code": c, "value": v} for c, v in subs]
                        if subs is not None
                        else None
                    ),
                }
                for (t, data, ind, subs) in fields
            ],
        }
    ]
    return spark.createDataFrame(rows, MARC_SCHEMA)


def _base_fields(rights="pd", code8="sla"):
    data008 = "x" * 35 + code8 + "xx"
    return [
        ("001", "ctl1", None, None),
        ("008", data008, None, None),
        ("245", None, ("0", "0"), [("a", "A title"), ("b", "and sub")]),
        ("974", None, (" ", " "), [("r", rights)]),
    ]


ISO = ("sla", "gem", "roa")


class TestRightsGate:
    def test_non_pd_record_dropped(self, spark):
        df = _rec(spark, _base_fields(rights="ic"))
        assert language_report(df, ISO).count() == 0

    def test_first_matching_r_wins_over_nonmatching(self, spark):
        # reference loops ALL $r values and returns the first one in
        # RIGHTS_CODES (:117-126) — a leading non-matching value is skipped
        fields = _base_fields()
        fields[-1] = (
            "974",
            None,
            (" ", " "),
            [("r", "und"), ("r", " PDUS "), ("r", "pd")],
        )
        df = _rec(spark, fields)
        row = language_report(df, ISO).collect()[0]
        assert row["rights_code"] == "pdus"


class TestSet1:
    def test_008_match(self, spark):
        row = language_report(_rec(spark, _base_fields()), ISO).collect()[0]
        assert row["matched_code"] == "sla"
        assert row["set_type"] == "iso639-5"
        assert row["record_id"] == "ctl1"
        assert row["title"] == "A title and sub"
        assert row["field_041"] == ""

    def test_short_008_no_match(self, spark):
        fields = _base_fields()
        fields[1] = ("008", "x" * 37, None, None)  # < 38 chars -> ''
        assert language_report(_rec(spark, fields), ISO).count() == 0

    def test_041a_iso6395_match_renders_field(self, spark):
        fields = _base_fields(code8="eng")  # 008 miss
        fields.append(
            ("041", None, ("1", " "), [("a", " GEM "), ("a", "eng")])
        )
        fields.append(("546", None, (" ", " "), [("a", "In German")]))
        row = language_report(_rec(spark, fields), ISO).collect()[0]
        assert row["matched_code"] == "gem"
        # raw rendered values, outer-stripped by unique_preserve_order
        # (report_generation.py:100 value.strip()), inner spacing kept
        assert row["field_041"] == "GEM  eng"
        # set 1 matched -> 546 included
        assert row["field_546"] == "In German"


class TestFullDefaultCodeTable:
    def test_family_code_outside_old_abridged_list_matches(self, spark):
        """The default ISO 639-5 table is the COMPLETE 115-code standard
        (reference loads the full TSV, report_generation.py:81-94). 'bnt'
        (Bantu) was absent from the r3 abridged 37-code default and must
        match via 008 with no explicit code list passed."""
        from index_search_monorepo_spark.operators.language_report import (
            DEFAULT_ISO6395_CODES,
        )

        assert len(DEFAULT_ISO6395_CODES) == 115
        assert "bnt" in DEFAULT_ISO6395_CODES and "trk" in DEFAULT_ISO6395_CODES
        row = language_report(
            _rec(spark, _base_fields(code8="bnt"))
        ).collect()[0]
        assert row["matched_code"] == "bnt"
        assert row["set_type"] == "iso639-5"
        # individual-language codes are still not family codes
        assert language_report(
            _rec(spark, _base_fields(code8="eng"))
        ).count() == 0


class TestSet2:
    def test_iso6393_field_takes_all_codes(self, spark):
        fields = _base_fields(code8="eng")
        fields.append(
            (
                "041",
                None,
                ("0", "7"),
                [("a", "deu"), ("a", "eng"), ("2", "iso639-3")],
            )
        )
        fields.append(("546", None, (" ", " "), [("a", "In German")]))
        row = language_report(_rec(spark, fields), ISO).collect()[0]
        # ALL field codes match under set 2, even non-ISO-639-5 ones
        assert row["matched_code"] == "deu; eng"
        assert row["set_type"] == "iso639-3"
        # set 1 did NOT match -> 546 excluded (:181-189)
        assert row["field_546"] == ""

    def test_ind2_seven_required(self, spark):
        fields = _base_fields(code8="eng")
        fields.append(
            ("041", None, ("0", " "), [("a", "deu"), ("2", "iso639-3")])
        )
        assert language_report(_rec(spark, fields), ISO).count() == 0

    def test_combined_order_and_dedup(self, spark):
        # 008 sla + 041 #1 iso5 gem + 041 #2 iso3 (gem, deu): loop order is
        # 008, then per field iso5-then-iso3; 'gem' dedups to first seen
        fields = _base_fields()
        fields.append(("041", None, (" ", " "), [("a", "gem")]))
        fields.append(
            ("041", None, (" ", "7"), [("a", "deu"), ("a", "gem"), ("2", "iso639-3")])
        )
        row = language_report(_rec(spark, fields), ISO).collect()[0]
        assert row["matched_code"] == "sla; gem; deu"
        assert row["set_type"] == "iso639-5; iso639-3"


class TestOclc:
    @pytest.mark.parametrize(
        "values,expect",
        [
            ([("a", "(OCoLC)ocm12345")], "12345"),
            ([("a", "(OCoLC)777")], "777"),
            # bare fallback needs >= 4 digits
            ([("a", "on1002")], "1002"),
            ([("a", "id 123")], ""),
            # first value without any match is skipped, not returned empty
            ([("a", "no digits"), ("z", "(OCoLC)88888")], "88888"),
            # $a values probed before $z within the field
            ([("z", "(OCoLC)99"), ("a", "(OCoLC)11")], "11"),
        ],
    )
    def test_extraction(self, spark, values, expect):
        df = _rec(spark, [("035", None, (" ", " "), values)])
        got = df.select(oclc_number_expr(F.col("fields")).alias("o")).collect()
        assert got[0]["o"] == expect

    def test_rights_expr_empty_without_974(self, spark):
        df = _rec(spark, [("001", "x", None, None)])
        got = df.select(rights_code_expr(F.col("fields")).alias("r")).collect()
        assert got[0]["r"] == ""


def test_report_is_python_free(spark):
    """The report is pure column expressions — no Python eval stage."""
    df = _rec(spark, _base_fields())
    plan = (
        language_report(df, ISO)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan and "PythonUDF" not in plan
