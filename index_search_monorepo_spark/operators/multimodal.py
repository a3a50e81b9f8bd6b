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


# ---------------------------------------------------------------------------
# media transform kernels: resize / frame-sample / feature-extract.
# Same contract as the decode stub: the Spark-side plumbing (schemas, Arrow
# batch shape, iterator protocol, partition-parallel no-shuffle plans) is
# real and tested; the pixel/sample math is a deterministic fake behind
# DECODE_IS_STUB.
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = (
    "doc_id long, payload binary, out_width long, out_height long,"
    " resized binary"
)

FRAMES_SCHEMA = "doc_id long, frame_no long, frame_ts_ms long, frame binary"

EMBED_SCHEMA = "doc_id long, embedding array<float>"


def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """STUB resize kernel: deterministic byte transform standing in for
    `PIL.Image.resize`. Output length w*h bytes, derived by tiling the
    payload (replace body, keep signature)."""
    if not payload:
        return b"\x00" * (w * h)
    reps = (w * h) // len(payload) + 1
    return (payload * reps)[: w * h]


def resize_media(df_with_payload: DataFrame, width: int, height: int) -> DataFrame:
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": pdf["payload"].values,
                    "out_width": width,
                    "out_height": height,
                    "resized": [
                        _fake_resize(p, width, height) for p in pdf["payload"]
                    ],
                }
            )

    return df_with_payload.mapInPandas(fn, RESIZED_SCHEMA)


def sample_frames(
    df_with_payload: DataFrame, every_ms: int = 1000, max_frames: int = 8
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (a flatMap-shaped
    mapInPandas — output rows > input rows, still no shuffle). The STUB
    derives a deterministic frame count from payload length; a real kernel
    would seek the container stream at every_ms intervals."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = min(max_frames, len(payload) % max_frames + 1)
                for k in range(n_frames):
                    lo = (k * 97) % max(len(payload), 1)
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_no": k,
                            "frame_ts_ms": k * every_ms,
                            "frame": bytes(payload[lo : lo + 16]),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "frame_ts_ms", "frame"]
            )

    return df_with_payload.mapInPandas(fn, FRAMES_SCHEMA)


def extract_features(df_with_payload: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction: payload -> fixed-dim float embedding. STUB uses a
    byte-histogram projection (deterministic); a real kernel would run a
    vision/audio encoder per Arrow batch. Output feeds the similarity
    operators (cosine_topk / lsh_topk) unchanged."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for payload in pdf["payload"]:
                acc = [0.0] * dim
                for i, b in enumerate(payload[:4096]):
                    acc[i % dim] += b
                norm = sum(x * x for x in acc) ** 0.5 or 1.0
                embs.append([x / norm for x in acc])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "embedding": embs}
            )

    return df_with_payload.mapInPandas(fn, EMBED_SCHEMA)
