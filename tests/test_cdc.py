"""Content-defined chunking (FastCDC): tiling/bound invariants, the
insertion-locality property that distinguishes CDC from fixed-size
chunking, and the Spark chunk-table + dedup-stats path."""

from __future__ import annotations

import hashlib

import numpy as np

from index_search_monorepo_spark.operators import cdc


def _pseudo_bytes(n: int, seed: bytes = b"cdc") -> bytes:
    out = bytearray()
    k = 0
    while len(out) < n:
        out += hashlib.md5(seed + k.to_bytes(4, "big")).digest()
        k += 1
    return bytes(out[:n])


class TestKernel:
    def test_chunks_tile_payload(self):
        payload = _pseudo_bytes(20_000)
        chunks = cdc.fastcdc_chunks(payload)
        assert chunks[0][0] == 0
        for (o1, l1, _), (o2, _, _) in zip(chunks, chunks[1:]):
            assert o1 + l1 == o2
        assert chunks[-1][0] + chunks[-1][1] == len(payload)
        # deterministic
        assert chunks == cdc.fastcdc_chunks(payload)

    def test_size_bounds(self):
        payload = _pseudo_bytes(50_000)
        chunks = cdc.fastcdc_chunks(
            payload, min_size=256, avg_size=1024, max_size=4096
        )
        for off, length, _ in chunks[:-1]:
            assert 256 <= length <= 4096, (off, length)
        assert 1 <= chunks[-1][1] <= 4096
        # normalized chunking concentrates sizes near the average
        mean = np.mean([length for _, length, _ in chunks])
        assert 512 <= mean <= 2048, mean

    def test_short_payloads(self):
        assert cdc.fastcdc_chunks(b"") == []
        chunks = cdc.fastcdc_chunks(b"abc")
        assert len(chunks) == 1 and chunks[0][1] == 3
        # exactly min_size: single chunk
        p = _pseudo_bytes(256)
        assert len(cdc.fastcdc_chunks(p)) == 1

    def test_hash_matches_sequential_recurrence(self):
        # the vectorized 64-shift convolution equals the textbook
        # h = (h << 1) + GEAR[b] recurrence
        data = np.frombuffer(_pseudo_bytes(300), np.uint8)
        vec = cdc._gear_hashes(data)
        h = 0
        for i, b in enumerate(data):
            h = ((h << 1) + int(cdc.GEAR[b])) & ((1 << 64) - 1)
            assert int(vec[i]) == h, i

    def test_insertion_locality_vs_fixed_size(self):
        # CDC's selling point: an insertion perturbs only local chunks,
        # while fixed-size chunking loses alignment everywhere after it
        a = _pseudo_bytes(40_000)
        b = a[:12_345] + b"INSERTED-BYTES" + a[12_345:]
        ch_a = {md5 for _, _, md5 in cdc.fastcdc_chunks(a)}
        ch_b = {md5 for _, _, md5 in cdc.fastcdc_chunks(b)}
        shared_cdc = len(ch_a & ch_b) / len(ch_a)
        assert shared_cdc > 0.8, shared_cdc

        def fixed(payload: bytes) -> set:
            return {
                hashlib.md5(payload[i:i + 1024]).hexdigest()
                for i in range(0, len(payload), 1024)
            }

        fa, fb = fixed(a), fixed(b)
        shared_fixed = len(fa & fb) / len(fa)
        # fixed-size keeps only the pre-insertion prefix aligned
        assert shared_fixed < 0.45, shared_fixed
        assert shared_cdc > shared_fixed + 0.35

    def test_mask_normalization_strict_then_loose(self):
        # boundaries found before the average point use the strict mask;
        # a payload whose strict candidates are removed still cuts via
        # the loose mask before max_size more often than plain max cuts
        payload = _pseudo_bytes(30_000, seed=b"other")
        cuts = cdc.fastcdc_boundaries(payload)
        lengths = np.diff([0] + cuts)
        assert (lengths[:-1] >= 256).all()
        assert (lengths <= 4096).all()
        # not everything degenerates to the max bound
        assert (lengths[:-1] < 4096).sum() > len(lengths) // 2


class TestSpark:
    def test_chunk_table_and_dedup_stats(self, spark):
        shared = _pseudo_bytes(8_000, seed=b"shared")
        a = _pseudo_bytes(4_000, seed=b"a") + shared
        b = _pseudo_bytes(4_000, seed=b"b") + shared
        df = spark.createDataFrame(
            [(1, bytearray(a)), (2, bytearray(b))], "doc_id long, payload binary"
        )
        chunks = cdc.with_cdc_chunks(df)
        rows = chunks.collect()
        # chunks tile each doc
        for doc_id, payload in ((1, a), (2, b)):
            mine = sorted(
                (r.offset, r.length) for r in rows if r.doc_id == doc_id
            )
            assert mine[0][0] == 0
            assert mine[-1][0] + mine[-1][1] == len(payload)
        # the shared suffix produces shared chunk hashes
        stats = cdc.chunk_dedup_stats(chunks)
        saved = stats.agg({"bytes_saved": "sum"}).collect()[0][0]
        assert saved > 4_000, saved
        ratio = cdc.dedup_ratio(chunks).collect()[0]
        assert ratio.logical_bytes == len(a) + len(b)
        assert ratio.unique_bytes < ratio.logical_bytes
        assert ratio.ratio_e4 > 10_000

    def test_kernel_matches_spark_path(self, spark):
        payload = _pseudo_bytes(10_000)
        df = spark.createDataFrame(
            [(7, bytearray(payload))], "doc_id long, payload binary"
        )
        got = sorted(
            (r.chunk_no, r.offset, r.length, r.chunk_md5)
            for r in cdc.with_cdc_chunks(df).collect()
        )
        want = [
            (k, off, length, md5)
            for k, (off, length, md5) in enumerate(cdc.fastcdc_chunks(payload))
        ]
        assert got == want
