"""Hierarchical JPEG (T.81 Annex J): round-trip conformance, dispatch
routing, and the no-misdecode guards.

Conformance strategy (module docstring of jpeg_hierarchical.py): no
deployed external decoder implements Annex J (libjpeg never did), so the
checks are (a) encoder->decoder round-trip within the quantization error
bound, (b) the non-differential base frame cross-checked against the
independently-tested baseline decoder (shared syntax, disjoint decode
path), (c) byte-level syntax pins (DHP/EXP markers present, SOF5 frames),
and (d) the pyramid actually carries information: the differential level
must correct the upsampled base, not just repeat it.
"""

from __future__ import annotations

import numpy as np
import pytest

from index_search_monorepo_spark.operators import multimodal as MM
from index_search_monorepo_spark.operators.jpeg import decode_baseline
from index_search_monorepo_spark.operators.jpeg_hierarchical import (
    _expand,
    decode_hierarchical,
    encode_hierarchical,
)


def _gradient_rgb(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.dstack(
        [(7 * xx + 3 * yy) % 256, (255 - 5 * xx) % 256, (11 * yy + xx) % 256]
    ).astype(np.uint8)


def _smooth_gray(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return ((xx * 255) // max(w - 1, 1) // 2 + (yy * 255) // max(h - 1, 1) // 2).astype(
        np.uint8
    )


class TestExpandFilter:
    def test_doubling_formula(self):
        p = np.array([[0, 10, 255]], np.int32)
        out = _expand(p, True, False)
        # J.1.1.2: out[2i] = in[i]; out[2i+1] = (in[i]+in[i+1]+1)>>1;
        # last column edge-replicated
        assert out.tolist() == [[0, 5, 10, 133, 255, 255]]

    def test_vertical(self):
        p = np.array([[0], [100]], np.int32)
        out = _expand(p, False, True)
        assert out.ravel().tolist() == [0, 50, 100, 100]


class TestRoundTrip:
    def test_smooth_gray_two_levels(self):
        px = _smooth_gray(33, 47)  # odd dims: crop path after EXP
        payload = encode_hierarchical(px, quant=2, levels=2)
        out = decode_hierarchical(payload)
        assert out is not None
        w, h, rgb = out
        assert (w, h) == (47, 33)
        # gray replicated into 3 channels; differential level corrects the
        # base, so error is bounded by the level-1 quantization alone
        err = np.abs(rgb[:, :, 0].astype(int) - px.astype(int))
        assert err.max() <= 4

    def test_rgb_three_levels(self):
        px = _gradient_rgb(25, 38)
        payload = encode_hierarchical(px, quant=2, levels=3)
        out = decode_hierarchical(payload)
        assert out is not None
        w, h, rgb = out
        assert (w, h) == (38, 25)
        # YCbCr int round-trip + final-level quantization
        err = np.abs(rgb.astype(int) - px.astype(int))
        assert err.max() <= 10 and err.mean() < 3

    def test_differential_level_carries_information(self):
        """Decoding only through the base (simulate: decode the stream,
        then compare against a 2x nearest upsample of the base) must be
        WORSE than the full pyramid — i.e. the SOF5 frame is not a
        no-op."""
        px = _gradient_rgb(24, 24)
        payload = encode_hierarchical(px, quant=2, levels=2)
        out = decode_hierarchical(payload)
        assert out is not None
        full_err = np.abs(out[2].astype(int) - px.astype(int)).mean()
        base = px.reshape(12, 2, 12, 2, 3).mean(axis=(1, 3))
        naive = np.repeat(np.repeat(base, 2, 0), 2, 1)
        naive_err = np.abs(naive - px.astype(int)).mean()
        assert full_err < naive_err / 2

    def test_syntax_pins(self):
        payload = encode_hierarchical(_smooth_gray(16, 16), quant=2)
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"
        assert b"\xff\xde" in payload  # DHP
        assert b"\xff\xdf" in payload  # EXP
        assert b"\xff\xc5" in payload  # differential sequential frame
        assert b"\xff\xc0" in payload  # non-differential base frame


class TestNoMisdecode:
    def test_baseline_decoder_refuses_hierarchical(self):
        """decode_baseline would otherwise decode the half-resolution base
        SOF0 frame and return the WRONG image — the DHP marker must route
        it to the stub/None path."""
        payload = encode_hierarchical(_smooth_gray(20, 20), quant=2)
        assert decode_baseline(payload) is None

    def test_hierarchical_decoder_refuses_plain_baseline(self):
        from index_search_monorepo_spark.operators.jpeg import encode_baseline

        payload = encode_baseline(_smooth_gray(16, 16), quant=2)
        assert decode_hierarchical(payload) is None

    def test_truncated_stream_returns_none(self):
        payload = encode_hierarchical(_smooth_gray(20, 20), quant=2)
        assert decode_hierarchical(payload[: len(payload) // 2]) is None

    def test_not_a_jpeg(self):
        assert decode_hierarchical(b"plainly not a jpeg") is None


class TestDispatch:
    def test_decode_image_routes_hierarchical(self):
        px = _gradient_rgb(14, 23)
        payload = encode_hierarchical(px, quant=2, levels=2)
        out = MM.decode_image(payload)
        assert out is not None
        w, h, rgb, fmt = out
        assert (w, h, fmt) == (23, 14, "jpg")
        assert np.abs(rgb.astype(int) - px.astype(int)).max() <= 10

    def test_base_frame_cross_check_against_baseline_decoder(self):
        """The Annex-J base frame and a standalone baseline stream of the
        same downsampled image decode to the same pixels — the shared
        syntax, through two independent decode paths."""
        from index_search_monorepo_spark.operators.jpeg import encode_baseline

        px = _smooth_gray(32, 32)
        base = px.reshape(16, 2, 16, 2).mean(axis=(1, 3))
        seq = encode_baseline(np.round(base).astype(np.uint8), quant=2)
        seq_out = decode_baseline(seq)
        assert seq_out is not None
        # decode the hierarchical stream and downsample its output back:
        # both must be within quantization distance of the true base
        hier = encode_hierarchical(px, quant=2, levels=2)
        hout = decode_hierarchical(hier)
        assert hout is not None
        hbase = hout[2][:, :, 0].reshape(16, 2, 16, 2).mean(axis=(1, 3))
        assert np.abs(hbase - base).max() <= 5
        assert np.abs(seq_out[2][:, :, 0] - np.round(base)).max() <= 4
