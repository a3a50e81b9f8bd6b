"""S1 — raw-zip volume ingest (SURVEY.md §2.1 S1).

The reference opens one `{pairtree_path}.zip` per document, keeps `*.txt`
members, drops `__MACOSX/*`, reads bytes per member, and sorts by member name
(full_text_document_generator.py:74-109). Here the whole corpus of zips is a
single distributed scan:

    spark.read.format("binaryFile").load(glob)
      -> mapInPandas (Arrow-batched, one Python call per batch of zips)
      -> (doc_id, spans array<struct<kind,text,media_ref,offset>>)

Member classification mirrors the METS fptr kinds (mets_file_extractor.py:
15-33): `*.txt` -> kind='txt' (bytes decoded), `*.html`/`*.htm` ->
kind='html', image suffixes -> kind='img' (empty text, media_ref only).
Page offset = the numeric stem of the member name when present (the
reference's `00000488.txt` convention), else the 1-based position in sorted
order — order always rides in data, never in row order.

Strict-decode semantics (text_processor.py:27-41: `.decode('utf-8')` raises
on bad bytes, which DLQ-rejects the document): a member that fails strict
UTF-8 decode poisons the row by injecting INVALID_UTF8_MARKER into the span
text, so `operators.errors.split_errors` routes the document to the error
sink instead of failing the job (R2).
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator
from pathlib import PurePosixPath

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from index_search_monorepo_spark.sources.synthetic import INVALID_UTF8_MARKER

IMG_SUFFIXES = {".jp2", ".tif", ".tiff", ".png", ".jpg", ".jpeg"}

INGEST_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("kind", StringType()),
                        StructField("text", StringType()),
                        StructField("media_ref", StringType()),
                        StructField("offset", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)

_NUM_STEM = re.compile(r"(\d+)")


def pairtree_sanitize(obj_id: str) -> str:
    """F6 (ht_document.py:34): '.'->',', ':'->'+', '/'->'='."""
    return obj_id.translate(str.maketrans({".": ",", ":": "+", "/": "="}))


def pairtree_path(obj_id: str) -> str:
    """2-char pairtree shard path of a sanitized object id
    (ht_document.py:63-74); golden: '39015051333915' ->
    '/39/01/50/51/33/39/15/39015051333915'."""
    s = pairtree_sanitize(obj_id)
    shards = [s[i : i + 2] for i in range(0, len(s), 2)]
    return "/" + "/".join(shards) + "/" + s


def doc_id_from_zip_path(path: str, namespace: str | None = None) -> str:
    """Zip file stem -> ht_id. The stem is the pairtree-sanitized object id
    (ht_document.py:34: '.'->',', ':'->'+', '/'->'='); reverse it and prepend
    the namespace (ht_id = namespace '.' object_id, mysql_data_extractor.py:
    26-38)."""
    stem = PurePosixPath(path.split("file:")[-1]).name
    if stem.endswith(".zip"):
        stem = stem[:-4]
    obj_id = stem.translate(str.maketrans({",": ".", "+": ":", "=": "/"}))
    return f"{namespace}.{obj_id}" if namespace else obj_id


def _member_kind(name: str) -> str | None:
    if name.startswith("__MACOSX/"):  # P1 exclusion
        return None
    suffix = PurePosixPath(name).suffix.lower()
    if suffix == ".txt":
        return "txt"
    if suffix in (".html", ".htm"):
        return "html"
    if suffix in IMG_SUFFIXES:
        return "img"
    return None


def _member_offset(name: str, ordinal: int) -> int:
    m = _NUM_STEM.search(PurePosixPath(name).stem)
    return int(m.group(1)) if m else ordinal


def _zip_to_spans(content: bytes) -> list[dict]:
    spans: list[dict] = []
    with zipfile.ZipFile(io.BytesIO(content)) as zf:
        members = sorted(n for n in zf.namelist() if _member_kind(n))
        for ordinal, name in enumerate(members, start=1):
            kind = _member_kind(name)
            text = ""
            if kind == "txt":
                raw = zf.read(name)
                try:
                    text = raw.decode("utf-8", errors="strict")
                except UnicodeDecodeError:
                    # columnar stand-in for the strict-decode raise: poison
                    # the row so split_errors() dead-letters the document
                    text = INVALID_UTF8_MARKER + raw.decode("utf-8", "replace")
            elif kind == "html":
                text = zf.read(name).decode("utf-8", errors="replace")
            spans.append(
                {
                    "kind": kind,
                    "text": text,
                    "media_ref": name,
                    "offset": _member_offset(name, ordinal),
                }
            )
    return spans


def _ingest_batches(
    namespace: str | None,
) -> "callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]":
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": [
                        doc_id_from_zip_path(p, namespace) for p in pdf["path"]
                    ],
                    "spans": [_zip_to_spans(c) for c in pdf["content"]],
                }
            )

    return fn


def ingest_zip_volumes(
    spark: SparkSession,
    path_glob: str,
    namespace: str | None = None,
    max_partition_bytes: str = "128m",
) -> DataFrame:
    """Distributed zip-corpus ingest: one output row per volume.

    binaryFile gives (path, length, content) with file-level parallelism;
    mapInPandas decodes whole Arrow batches of zips per Python call (never
    per-row Python). At 100 TB the unit of parallelism is the zip file, so
    executor memory bounds come from the largest volume, not the batch —
    pair with spark.sql.files.maxPartitionBytes and small Arrow batches for
    multi-GB skew volumes.
    """
    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zip")
        .load(path_glob)
        .select("path", "content")
    )
    return binary.mapInPandas(_ingest_batches(namespace), schema=INGEST_SCHEMA)
