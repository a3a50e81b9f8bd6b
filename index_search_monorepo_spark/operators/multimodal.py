"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as `binary` columns with a typed
metadata struct. The actual codec work (PIL/ffmpeg decode, resize, frame
sampling) is NOT available in this container, so the decode kernel is a
deterministic fake clearly marked as a stub — but everything Spark-side is
real and tested: schema, Arrow batch shape, `mapInPandas` iterator protocol,
partition-parallel execution, and the metadata contract the downstream
pipeline consumes.

At 100 TB the binary payloads dominate I/O: the plan reads them exactly once
(`mapInPandas` directly over the scan, no shuffle), and nested-column
pruning means metadata-only queries never deserialize the payload bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_IS_STUB = True  # flip when a real codec backend is wired in

MEDIA_META_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, media_format string"
)


def _fake_decode(payload: bytes) -> dict:
    """STUB decode kernel. Deterministic function of the payload bytes only.

    A real implementation would `PIL.Image.open(io.BytesIO(payload))` /
    `soundfile.read` here; the container has no codec libs, so we derive
    plausible metadata arithmetically. Replace body, keep signature.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "width": n % 640 + 16,
        "height": (n * 7) % 480 + 16,
        "media_format": ("png", "jpg", "wav")[n % 3],
    }


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [_fake_decode(p) for p in pdf["payload"]]
        out = pd.DataFrame(metas)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def with_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the text stand in
    for the media payload in the synthetic corpus)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def extract_media_metadata(df_with_payload: DataFrame) -> DataFrame:
    """binary payload -> typed metadata via Arrow-batched mapInPandas.
    One Python stage, no shuffle; batch size governed by
    spark.sql.execution.arrow.maxRecordsPerBatch (fat rows -> small batches).
    """
    return df_with_payload.mapInPandas(_decode_batches, MEDIA_META_SCHEMA)


def media_metadata(df: DataFrame, text_col: str = "text") -> DataFrame:
    return extract_media_metadata(with_binary_payload(df, text_col))
