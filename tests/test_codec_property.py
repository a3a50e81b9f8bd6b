"""Property-based round-trip invariants for the hand-rolled codecs
(operators/multimodal.py, operators/jpeg.py): random pixel grids and
index streams must survive encode -> decode exactly (or within the
documented rounding bound for lossy JPEG). No Spark session needed —
the kernels are plain functions; the Spark plumbing is tested in
test_multimodal.py."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from index_search_monorepo_spark.operators import jpeg as J
from index_search_monorepo_spark.operators import multimodal as MM

_DIMS = st.tuples(st.integers(1, 24), st.integers(1, 16))


def _grid(w: int, h: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


class TestPngProperty:
    @settings(max_examples=40, deadline=None)
    @given(dims=_DIMS, seed=st.integers(0, 2**31))
    def test_round_trip_exact(self, dims, seed):
        w, h = dims
        px = _grid(w, h, seed)
        got = MM._parse_png(MM.encode_png(px))
        assert got is not None
        gw, gh, grid = got
        assert (gw, gh) == (w, h)
        assert np.array_equal(grid, px)


class TestGifLzwProperty:
    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(1, 400),
        n_colors=st.sampled_from([2, 4, 8, 16]),
        seed=st.integers(0, 2**31),
    )
    def test_lzw_round_trip(self, n, n_colors, seed):
        """The decoder must invert a growing-table LZW encoder for any
        index stream — covers code-width growth and the KwKwK case far
        beyond the handwritten examples."""
        from tests.test_multimodal import TestGifDecode

        rng = np.random.default_rng(seed)
        indices = rng.integers(0, n_colors, size=n).tolist()
        min_code_size = max((n_colors - 1).bit_length(), 2)
        data = TestGifDecode._lzw_encode(indices, min_code_size)
        out = MM._gif_lzw_decode(data, min_code_size, n)
        assert out is not None
        assert list(out[:n]) == indices


class TestJpegProperty:
    @settings(max_examples=20, deadline=None)
    @given(dims=_DIMS, seed=st.integers(0, 2**31))
    def test_grayscale_quant1_within_rounding(self, dims, seed):
        w, h = dims
        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        got = J.decode_baseline(J.encode_baseline(px, quant=1))
        assert got is not None
        gw, gh, rgb = got
        assert (gw, gh) == (w, h)
        # flat quant=1: only forward/inverse-DCT float rounding remains
        assert int(np.abs(rgb[:, :, 0].astype(int) - px.astype(int)).max()) <= 1

    @settings(max_examples=15, deadline=None)
    @given(dims=_DIMS, seed=st.integers(0, 2**31))
    def test_decoder_never_crashes_on_truncation(self, dims, seed):
        """Any prefix of a valid stream must return None or a valid frame,
        never raise (errors are rows upstream, not job failures)."""
        w, h = dims
        payload = J.encode_baseline(_grid(w, h, seed), quant=2)
        for cut in (4, len(payload) // 3, len(payload) - 3):
            out = J.decode_baseline(payload[:cut])
            assert out is None or out[0] == w


class TestTiffProperty:
    @settings(max_examples=30, deadline=None)
    @given(dims=_DIMS, seed=st.integers(0, 2**31), bo=st.sampled_from(["<", ">"]))
    def test_round_trip_exact(self, dims, seed, bo):
        from tests.test_multimodal import TestTiffDecode

        w, h = dims
        px = _grid(w, h, seed)
        got = MM._parse_tiff(TestTiffDecode._tiff(px, bo=bo))
        assert got is not None
        gw, gh, grid = got
        assert (gw, gh) == (w, h)
        assert np.array_equal(grid, px)
