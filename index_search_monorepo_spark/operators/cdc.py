"""Content-defined chunking (FastCDC) for binary payload dedup.

Fixed-size chunking breaks under insertion: one added byte shifts every
downstream boundary, so two payloads sharing 99% of their bytes share
~0% of their chunks. Content-defined chunking cuts where a rolling hash
of the local byte window hits a mask, so boundaries are a function of
CONTENT — an edit perturbs only the chunks it touches and the remainder
realigns. That is the storage-side dedup primitive for the multimodal
columns (image/audio/video payloads that differ by a metadata header or
a re-mux share almost all their chunk hashes), complementing the
text-side exact/near dedup family (operators/dedup.py).

Algorithm: FastCDC (Xia et al., USENIX ATC'16, public) — gear rolling
hash `h = (h << 1 + GEAR[byte]) mod 2^64` with normalized chunking: a
STRICTER mask before the average-size point and a LOOSER one after, so
chunk sizes concentrate around the average instead of the geometric
tail of plain Rabin-style chunking. min/max bounds are hard limits.

Spark shape: the kernel is numpy-vectorized (the sequential gear
recurrence unrolls into a 64-term shift convolution — `h[i]` only sees
the last 64 bytes because `<< 1` drops bits past 63 — so the hash
array is 64 vectorized passes over the byte array, never a per-byte
Python loop), and the boundary walk is O(#chunks · log n) via
searchsorted over the precomputed candidate sets. Distribution is
mapInPandas straight over the payload scan — no shuffle; the chunk
table shuffles only (doc_id, offset, md5) rows for dedup stats, never
payload bytes. Reference: no counterpart (the reference treats media as
opaque spans); the technique is from the public FastCDC paper.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MASK64 = (1 << 64) - 1

# deterministic gear table (no RNG in this repo): md5-derived constants
GEAR = np.array(
    [
        int.from_bytes(
            hashlib.md5(bytes([i]) + b"fastcdc-gear").digest()[:8], "big"
        )
        for i in range(256)
    ],
    dtype=np.uint64,
)

CHUNK_SCHEMA = (
    "doc_id long, chunk_no long, offset long, length long, chunk_md5 string"
)


def _gear_hashes(data: np.ndarray) -> np.ndarray:
    """Rolling gear hash at every position: h[i] depends on bytes
    (i-63..i) only, so the sequential recurrence is a 64-term shift
    convolution — vectorized, no per-byte Python."""
    n = len(data)
    h = np.zeros(n, np.uint64)
    g = GEAR[data]
    for k in range(min(64, n)):
        # GEAR[b[i-k]] << k contributes to h[i]
        h[k:] += g[: n - k] << np.uint64(k)
    return h


def fastcdc_boundaries(
    payload: bytes,
    min_size: int = 256,
    avg_size: int = 1024,
    max_size: int = 4096,
) -> list[int]:
    """Cut points (exclusive ends) tiling the payload. Normalized
    chunking: mask_s (avg_bits + 2 bits) before the average point,
    mask_l (avg_bits - 2 bits) after; min/max are hard bounds."""
    if not (0 < min_size <= avg_size <= max_size):
        raise ValueError("need 0 < min_size <= avg_size <= max_size")
    n = len(payload)
    if n == 0:
        return []
    bits = avg_size.bit_length() - 1
    mask_s = np.uint64((1 << min(bits + 2, 63)) - 1)
    mask_l = np.uint64((1 << max(bits - 2, 1)) - 1)
    data = np.frombuffer(payload, np.uint8)
    h = _gear_hashes(data)
    strict = np.flatnonzero((h & mask_s) == 0)
    loose = np.flatnonzero((h & mask_l) == 0)
    cuts: list[int] = []
    start = 0
    while start < n:
        end = min(start + max_size, n)
        cut = end
        lo = start + min_size
        avg_point = min(start + avg_size, end)
        if lo < end:
            i = np.searchsorted(strict, lo)
            if i < len(strict) and strict[i] < avg_point:
                cut = int(strict[i]) + 1
            else:
                j = np.searchsorted(loose, avg_point)
                if j < len(loose) and loose[j] < end:
                    cut = int(loose[j]) + 1
        cuts.append(cut)
        start = cut
    return cuts


def fastcdc_chunks(
    payload: bytes,
    min_size: int = 256,
    avg_size: int = 1024,
    max_size: int = 4096,
) -> list[tuple[int, int, str]]:
    """(offset, length, md5) per chunk; chunks tile the payload."""
    out = []
    start = 0
    for cut in fastcdc_boundaries(payload, min_size, avg_size, max_size):
        out.append(
            (start, cut - start, hashlib.md5(payload[start:cut]).hexdigest())
        )
        start = cut
    return out


def with_cdc_chunks(
    df_with_payload: DataFrame,
    min_size: int = 256,
    avg_size: int = 1024,
    max_size: int = 4096,
) -> DataFrame:
    """(doc_id, payload) -> chunk table (doc_id, chunk_no, offset,
    length, chunk_md5). Scan -> mapInPandas, no shuffle; payload bytes
    never leave the partition that scanned them."""
    import pandas as pd

    def fn(batches: Iterator) -> Iterator:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                for k, (off, length, md5) in enumerate(
                    fastcdc_chunks(b, min_size, avg_size, max_size)
                ):
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "chunk_no": k,
                            "offset": off,
                            "length": length,
                            "chunk_md5": md5,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "chunk_no", "offset", "length", "chunk_md5",
                ],
            )

    return df_with_payload.mapInPandas(fn, CHUNK_SCHEMA)


def chunk_dedup_stats(chunks: DataFrame) -> DataFrame:
    """Storage-dedup accounting over a chunk table: one row per distinct
    chunk hash with its reference count, chunk length, and the bytes
    dedup saves (length × (refs − 1)). Only (md5, length) pairs shuffle
    — map-side combined, never payload bytes."""
    return (
        chunks.groupBy("chunk_md5")
        .agg(
            F.count(F.lit(1)).alias("n_refs"),
            F.max("length").alias("length"),
        )
        .withColumn(
            "bytes_saved", (F.col("n_refs") - F.lit(1)) * F.col("length")
        )
    )


def dedup_ratio(chunks: DataFrame) -> DataFrame:
    """One-row summary: logical bytes, unique bytes, dedup ratio in
    e4 fixed-point (integer-exact, DuckDB-mirrorable)."""
    stats = chunk_dedup_stats(chunks)
    return stats.agg(
        F.sum(F.col("n_refs") * F.col("length")).alias("logical_bytes"),
        F.sum("length").alias("unique_bytes"),
        (
            F.sum(F.col("n_refs") * F.col("length")) * F.lit(10_000)
            / F.sum("length")
        ).cast("long").alias("ratio_e4"),
    )
