"""S2/A3/X — METS structMap ingest (SURVEY.md §2.1 S2, §2.4 A3).

The reference parses one METS XML per document with lxml
(mets_file_extractor.py:11-86): `structMap -> div TYPE='page'` carries
ORDER (page number), ORDERLABEL (pgnum), LABEL (comma-separated feature
tags), and child `fptr FILEID`s (TXT/HTML/IMG pointers); doc-level attributes
scanning-order / reading-order / cover-tag come from the structMap div
labels. Rebuilt as a distributed scan of METS files:

    spark.read.format("binaryFile") over *.mets.xml
      -> mapInPandas batch parse (stdlib ElementTree; no lxml in-container)
      -> mets_meta rows: (doc_id, page_features array<struct<offset,
         features, pgnum>>, scanning_order, reading_order, cover_tag)

consumed by operators.extraction.with_mets_fields (ht_page_feature /
ht_scanning_order / ht_reading_order / ht_cover_tag, §1.3 step 6).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from index_search_monorepo_spark.sources.zip_ingest import doc_id_from_zip_path

METS_NS = "http://www.loc.gov/METS/"

METS_META_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField(
            "page_features",
            ArrayType(
                StructType(
                    [
                        StructField("offset", IntegerType()),
                        StructField("features", StringType()),
                        StructField("pgnum", StringType()),
                    ]
                )
            ),
        ),
        StructField("scanning_order", StringType()),
        StructField("reading_order", StringType()),
        StructField("cover_tag", StringType()),
    ]
)


def parse_mets(xml_text: str) -> dict:
    """One METS document -> mets_meta fields. Mirrors
    mets_file_extractor.py:15-86 semantics: page divs in structMap order,
    LABEL feature CSVs kept verbatim per page, ORDERLABEL as pgnum (None if
    absent), and the volume-level scanning/reading order labels."""
    root = ET.fromstring(xml_text)
    pages = []
    scanning = reading = cover = None
    for div in root.iter(f"{{{METS_NS}}}div"):
        dtype = div.get("TYPE", "")
        if dtype == "volume":
            labels = [s.strip() for s in div.get("LABEL", "").split(",") if s.strip()]
            for lab in labels:
                if lab.startswith("scanning-order:"):
                    scanning = lab.split(":", 1)[1].strip()
                elif lab.startswith("reading-order:"):
                    reading = lab.split(":", 1)[1].strip()
                elif lab.startswith("cover-tag:"):
                    cover = lab.split(":", 1)[1].strip()
        elif dtype == "page":
            order = div.get("ORDER")
            pages.append(
                {
                    "offset": int(order) if order else len(pages) + 1,
                    "features": div.get("LABEL", ""),
                    "pgnum": div.get("ORDERLABEL") or None,
                }
            )
    return {
        "page_features": pages,
        "scanning_order": scanning or "left-to-right",
        "reading_order": reading or "left-to-right",
        "cover_tag": cover or "follows-reading-order",
    }


def distinct_features(pages: list[dict]) -> list[str]:
    """A3: split each page LABEL on ', ', flatten, distinct
    (mets_file_extractor.py:52-61)."""
    seen: list[str] = []
    for p in pages:
        for f in (p.get("features") or "").split(", "):
            if f and f not in seen:
                seen.append(f)
    return sorted(seen)


METS_RECORD_SCHEMA = StructType(METS_META_SCHEMA.fields[1:])  # minus doc_id


def mets_record_udf():
    """S2 in column form: one METS XML string -> parsed mets_meta struct
    (page_features, scanning_order, reading_order, cover_tag) through the
    SAME parse_mets the file source uses — lets the driver oracle gate the
    stdlib-ET structMap parse on planted documents the way allfields_xml
    gates the MARC fold. Unparseable XML — malformed markup OR well-formed
    XML with a non-numeric page ORDER (parse_mets raises ValueError) —
    yields a null-scanning_order record: errors are rows, never task
    failures. Arrow-batched, one stage, no shuffle.

    Marked nondeterministic for the same reason as
    marc_json.marc_json_record_udf (CLAUDE.md lesson #9): callers filter
    on the parsed struct, and predicate pushdown through the Project
    would otherwise run the parse twice per row."""
    from pyspark.sql.functions import pandas_udf

    def _one(xml: str) -> dict:
        try:
            parsed = parse_mets(xml or "")
        except (ET.ParseError, ValueError):
            return {
                "page_features": None,
                "scanning_order": None,
                "reading_order": None,
                "cover_tag": None,
            }
        return parsed

    @pandas_udf(METS_RECORD_SCHEMA)
    def parse(xmls: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [_one(x) for x in xmls],
            columns=METS_RECORD_SCHEMA.fieldNames(),
        )

    return parse.asNondeterministic()


def _mets_batches(
    namespace: str | None,
) -> "callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]":
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                doc_id = doc_id_from_zip_path(
                    path.removesuffix(".mets.xml") if path.endswith(".mets.xml")
                    else path,
                    namespace,
                )
                parsed = parse_mets(bytes(content).decode("utf-8"))
                rows.append({"doc_id": doc_id, **parsed})
            yield pd.DataFrame(rows, columns=METS_META_SCHEMA.fieldNames())

    return fn


def ingest_mets_files(
    spark: SparkSession,
    path_glob: str,
    namespace: str | None = None,
) -> DataFrame:
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.mets.xml")
        .load(path_glob)
        .select("path", "content")
    )
    return binary.mapInPandas(_mets_batches(namespace), schema=METS_META_SCHEMA)
