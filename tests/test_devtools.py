"""Dev/analysis utility tail (operators/devtools.py) — the reference's
last three CLI scripts as library functions."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from index_search_monorepo_spark.operators.devtools import (
    batch_query_results,
    export_id_list,
    ids_from_solr_response,
    solr_schema_fields,
    write_schema_tsv,
)

SCHEMA_XML = """<?xml version="1.0"?>
<schema name="fulltext" version="1.6">
  <field name="id" type="string" indexed="true" stored="true"/>
  <field name="ocr" type="text" indexed="true" stored="false"
         multiValued="false"/>
  <field name="allfields" type="text" indexed="true" stored="false"/>
  <copyField source="title" dest="allfields"/>
  <copyField source="author" dest="nonexistent"/>
</schema>
"""


class TestSchemaFields:
    def test_fields_and_copyfield_annotation(self, spark, tmp_path):
        p = tmp_path / "schema.xml"
        p.write_text(SCHEMA_XML)
        rows = {
            r["name"]: r for r in solr_schema_fields(spark, str(p)).collect()
        }
        assert set(rows) == {"id", "ocr", "allfields"}
        assert rows["id"]["type"] == "string"
        assert rows["ocr"]["multiValued"] == "false"
        assert rows["id"]["schema_exists"] == "Exist"
        # copyField dest annotated with its source; unknown dest ignored
        assert rows["allfields"]["origen"] == "copyField by title"
        assert rows["id"]["origen"] == ""

    def test_tsv_round_trip(self, spark, tmp_path):
        p = tmp_path / "schema.xml"
        p.write_text(SCHEMA_XML)
        out = tmp_path / "fields_tsv"
        write_schema_tsv(solr_schema_fields(spark, str(p)), str(out))
        back = (
            spark.read.option("sep", "\t")
            .option("header", True)
            .csv(str(out))
        )
        assert back.count() == 3
        assert "origen" in back.columns


class TestIdExports:
    def test_ids_from_solr_response(self, spark, tmp_path):
        dump = {
            "responseHeader": {"status": 0},
            "response": {
                "numFound": 3,
                "docs": [
                    {"id": "a.1", "title": "x"},
                    {"id": "b.2"},
                    {"id": "c.3"},
                ],
            },
        }
        p = tmp_path / "resp.json"
        p.write_text(json.dumps(dump))
        got = sorted(
            r["id"] for r in ids_from_solr_response(spark, str(p)).collect()
        )
        assert got == ["a.1", "b.2", "c.3"]

    def test_export_id_list_flattens_and_caps(self, spark, tmp_path):
        results = spark.createDataFrame(
            [("r1", ["v.1", "v.2"]), ("r2", ["v.3"])],
            "id string, ht_id array<string>",
        )
        out = tmp_path / "ids"
        export_id_list(results, str(out), id_col="ht_id", limit=2)
        lines = sorted(
            r["value"] for r in spark.read.text(str(out)).collect()
        )
        assert len(lines) == 2 and set(lines) <= {"v.1", "v.2", "v.3"}


class TestBatchQueries:
    def test_one_frame_per_phrase_operator(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "natural history of plants"),
                (2, "history book"),
                (3, "natural selection"),
            ],
            "doc_id long, text string",
        )
        out = batch_query_results(
            docs, ["natural history"], operators=("AND", "OR", None)
        )
        assert set(out) == {
            ("natural history", "AND"),
            ("natural history", "OR"),
            ("natural history", None),
        }
        and_ids = {r["doc_id"] for r in out[("natural history", "AND")].collect()}
        or_ids = {r["doc_id"] for r in out[("natural history", "OR")].collect()}
        exact_ids = {r["doc_id"] for r in out[("natural history", None)].collect()}
        assert and_ids == {1}  # both terms required
        assert or_ids == {1, 2, 3}  # either term
        assert exact_ids == {1}  # adjacent phrase
