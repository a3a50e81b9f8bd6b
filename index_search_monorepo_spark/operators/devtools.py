"""Dev/analysis utilities from the reference's CLI tail, as library
functions (closes the last three "out of scope" items in COVERAGE.md —
only the sample-data downloader remains environment bootstrap):

 - `solr_schema_fields`  — libs/common_lib/src/ht_utils/
   convert_solr_schema2csv.py: flatten a Solr schema.xml's <field>
   attributes into a table, annotating copyField destinations with their
   source ("origen = copyField by X"), for TSV export.
 - `ids_from_solr_response` / `export_id_list` —
   app/solr_query/src/data_analysis/get_list_ids_fromSolr_results.py:
   extract document ids from a Solr response JSON dump, or flatten a
   result frame's multivalued ht_id column into a capped one-id-per-line
   export.
 - `batch_query_results` — app/solr_query/src/data_analysis/
   generate_query_results_in_batch.py: run a phrase list under each
   operator mode (AND / OR / exact-phrase None) over the search engine,
   one result frame per (phrase, operator).

Design notes: the schema parse is a driver-side stdlib-ET read of ONE
config file (not data-plane; a DataFrame comes out so the TSV sink and
joins compose); the id export and batch queries are pure DataFrame ops.
The reference builds `schema_fields_list = dict(schema_fields_dic
.values())`, which raises on modern Python — the intent (the field table
with copyField annotations) is implemented, the crash is not.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCHEMA_FIELD_COLS = [
    "name",
    "type",
    "indexed",
    "stored",
    "multiValued",
    "schema_exists",
    "origen",
]


def solr_schema_fields(spark: SparkSession, schema_xml_path: str) -> DataFrame:
    """Parse a Solr schema.xml into one row per <field>, with copyField
    destinations annotated (convert_solr_schema2csv.py semantics)."""
    root = ET.parse(Path(schema_xml_path)).getroot()
    fields: dict[str, dict] = {}
    for el in root.iter("field"):
        attrs = dict(el.attrib)
        fields[attrs["name"]] = {
            "name": attrs.get("name"),
            "type": attrs.get("type"),
            "indexed": attrs.get("indexed"),
            "stored": attrs.get("stored"),
            "multiValued": attrs.get("multiValued"),
            "schema_exists": "Exist",
            "origen": "",
        }
    for el in root.iter("copyField"):
        dest = el.attrib.get("dest")
        if dest in fields:
            fields[dest]["origen"] = f"copyField by {el.attrib.get('source')}"
    rows = [tuple(f[c] for c in SCHEMA_FIELD_COLS) for f in fields.values()]
    return spark.createDataFrame(
        rows, ", ".join(f"{c} string" for c in SCHEMA_FIELD_COLS)
    )


def write_schema_tsv(df: DataFrame, path: str) -> None:
    """The script's TSV sink (tab-separated, header)."""
    df.coalesce(1).write.mode("overwrite").option("sep", "\t").option(
        "header", True
    ).csv(path)


def ids_from_solr_response(spark: SparkSession, json_path: str) -> DataFrame:
    """get_first_item (get_list_ids_fromSolr_results.py:15-29): the `id` of
    every doc in a Solr response JSON dump, as one column. Distributed
    json read + explode — works on multi-GB dumps, unlike the script's
    json.load."""
    raw = spark.read.option("multiLine", True).json(json_path)
    return raw.select(
        F.explode(F.col("response.docs")).alias("doc")
    ).select(F.col("doc.id").alias("id"))


def export_id_list(
    results: DataFrame,
    path: str,
    id_col: str = "ht_id",
    limit: int = 1_000_000,
) -> None:
    """The main() export shape (:63-83): flatten the (possibly
    multivalued) id column, cap at `limit`, write one id per line."""
    from pyspark.sql.types import ArrayType

    col = F.col(id_col)
    df = results
    if isinstance(df.schema[id_col].dataType, ArrayType):
        df = df.select(F.explode(col).alias(id_col))
    df.select(F.col(id_col).cast("string").alias("value")).limit(
        limit
    ).coalesce(1).write.mode("overwrite").text(path)


def batch_query_results(
    docs: DataFrame,
    phrases: list[str],
    operators: tuple[str | None, ...] = ("AND", "OR", None),
    fl: list[str] | None = None,
    rows: int = 100,
) -> dict[tuple[str, str | None], DataFrame]:
    """generate_query_results_in_batch.py: one ranked result frame per
    (phrase, operator); operator None = exact-phrase (the reference's
    query-shaping convention, ht_query.py:113-136). The loop is driver-side
    CONFIG (a handful of phrases), never per-row work."""
    from index_search_monorepo_spark.search import SearchQuery

    from index_search_monorepo_spark.search.engine import search

    out: dict[tuple[str, str | None], DataFrame] = {}
    for phrase in phrases:
        for op in operators:
            q = SearchQuery(
                q=phrase,
                operator=op,
                qf=[("text", 1.0)],
                pf=[],
                fl=fl or ["doc_id"],
                rows=rows,
            )
            out[(phrase, op)] = search(docs, q, id_col="doc_id")
    return out
