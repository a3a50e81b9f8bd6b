"""A2 `allfields` — golden tests.

The byte-for-byte golden comes from the reference's own test
(document_generator_test.py:29-32, 88-92) over its 783 KB fixture
data/fullrecord.xml (the Defoe / Robinson Crusoe record). We read the fixture
from the read-only reference checkout when present, else skip."""

from __future__ import annotations

import xml.sax.saxutils
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from index_search_monorepo_spark.functions.marc import (
    compute_allfields,
    extract_allfields,
)
from index_search_monorepo_spark.oracle.reference_oracle import oracle_allfields

REFERENCE_FIXTURE = Path(
    "/root/reference/app/ht_indexer/tests/document_generator_tests/data/fullrecord.xml"
)

# expected literal from document_generator_test.py:29-32
GOLDEN_TEXT = (
    "Defoe, Daniel, 1661?-1731. Rābinsan Krūso kā itihāsa. The adventures of "
    "Robinson Crusoe, translated [into Hindi] by Badrī Lāla, from a Bengali "
    "version ... Benares, 1860 455 p. incl. front., illus. plates. 20 cm. "
    "Title from Catalogue of Hindi books in the British museum. Badarīnātha, "
    "pandit, tr. Robinson Crusoe. UTL 9662 SPEC HUB PR 3403 .H5 39015078560292"
)


@pytest.mark.skipif(
    not REFERENCE_FIXTURE.is_file(), reason="reference fixture not present"
)
def test_golden_fullrecord():
    xml_str = REFERENCE_FIXTURE.read_text()
    expected = xml.sax.saxutils.quoteattr(GOLDEN_TEXT)
    got = compute_allfields(xml_str)
    assert got.strip() == expected.strip()


def test_tag_filtering_and_none_quirk():
    xml_str = (
        '<collection><record>'
        '<datafield tag="050"><subfield code="a">skipped</subfield></datafield>'
        '<datafield tag="245"><subfield code="a">Kept &amp; escaped</subfield>'
        '<subfield code="b"></subfield></datafield>'
        '<datafield tag="abc"><subfield code="a">non-numeric skipped</subfield></datafield>'
        '<datafield tag="500">bare text</datafield>'
        '<datafield tag="600"></datafield>'
        "</record></collection>"
    )
    got = compute_allfields(xml_str)
    # empty subfield text -> str(None) == 'None' (reference quirk,
    # full_text_document_generator.py:135)
    assert got == xml.sax.saxutils.quoteattr("Kept & escaped None bare text")
    assert got == oracle_allfields(xml_str)


def test_udf_matches_python(spark, tables):
    rows = tables["catalog"].select("id", "fullrecord").collect()
    df = tables["catalog"].select(
        "id", extract_allfields(F.col("fullrecord")).alias("allfields")
    )
    got = {r["id"]: r["allfields"] for r in df.collect()}
    for r in rows:
        assert got[r["id"]] == oracle_allfields(r["fullrecord"]), r["id"]
