"""Progressive JPEG (SOF2) decode — conformance via (a) round-trips
through encode_progressive's 10-scan successive-approximation script and
(b) bit-identity with the independently-tested BASELINE codec on the same
pixels: two different scan structures must converge to the same
coefficients, which catches asymmetric bugs a plain round-trip cannot."""

from __future__ import annotations

import numpy as np

from index_search_monorepo_spark.operators import jpeg as J
from index_search_monorepo_spark.operators import jpeg_progressive as JP
from index_search_monorepo_spark.operators import multimodal as MM


def _smooth(w, h):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (40 + 2 * xx + yy) % 180 + 30
    g = (60 + xx + 2 * yy) % 180 + 30
    b = (80 + 3 * xx) % 180 + 30
    return np.dstack([r, g, b]).astype(np.uint8)


class TestProgressiveDecode:
    def test_grayscale_round_trip(self):
        px = (np.arange(24 * 17).reshape(17, 24) * 11 % 256).astype(np.uint8)
        got = JP.decode_progressive(JP.encode_progressive(px, quant=1))
        assert got is not None
        w, h, rgb = got
        assert (w, h) == (24, 17)
        assert int(np.abs(rgb[:, :, 0].astype(int) - px.astype(int)).max()) <= 1

    def test_color_round_trip(self):
        im = _smooth(28, 20)
        got = JP.decode_progressive(JP.encode_progressive(im, quant=1))
        assert got is not None
        assert int(np.abs(got[2].astype(int) - im.astype(int)).max()) <= 2

    def test_bit_identical_to_baseline_codec(self):
        """The strongest check: at identical quant, the 10-scan
        progressive stream and the single-scan baseline stream must decode
        to IDENTICAL pixels — the coefficient content is the same, only
        its delivery order differs."""
        for seed in range(4):
            rng = np.random.default_rng(seed)
            im = rng.integers(0, 256, (25, 33, 3), dtype=np.uint8)
            p = JP.decode_progressive(JP.encode_progressive(im, quant=1))
            b = J.decode_baseline(J.encode_baseline(im, quant=1))
            assert p is not None and b is not None
            assert np.array_equal(p[2], b[2]), f"seed {seed}"

    def test_quantized_eob_run_heavy(self):
        """Coarse quant zeroes most AC bands -> long cross-block EOB runs
        in every band scan; error must match the baseline codec's."""
        im = _smooth(48, 40)
        for q in (4, 16, 40):
            p = JP.decode_progressive(JP.encode_progressive(im, quant=q))
            b = J.decode_baseline(J.encode_baseline(im, quant=q))
            assert p is not None
            assert np.array_equal(p[2], b[2]), f"quant {q}"

    def test_restart_intervals_every_scan(self):
        for ri in (1, 2, 7):
            im = _smooth(40, 24)
            payload = JP.encode_progressive(im, quant=1, restart_interval=ri)
            assert b"\xff\xd0" in payload
            got = JP.decode_progressive(payload)
            assert got is not None, f"ri={ri}"
            assert int(np.abs(got[2].astype(int) - im.astype(int)).max()) <= 2

    def test_partial_edge_blocks(self):
        # dims not multiples of 8: padded blocks decode, then crop
        im = _smooth(33, 25)
        got = JP.decode_progressive(JP.encode_progressive(im, quant=2))
        assert got is not None and (got[0], got[1]) == (33, 25)

    def test_truncated_and_arithmetic_refused(self):
        im = _smooth(16, 16)
        payload = bytearray(JP.encode_progressive(im, quant=1))
        assert JP.decode_progressive(bytes(payload[:-30])) is None
        idx = bytes(payload).find(b"\xff\xc2")
        payload[idx + 1] = 0xCA  # SOF10: arithmetic progressive
        assert JP.decode_progressive(bytes(payload)) is None

    def test_decode_image_dispatches_progressive(self):
        im = _smooth(16, 16)
        got = MM.decode_image(JP.encode_progressive(im, quant=1))
        assert got is not None and got[3] == "jpg"
        assert int(np.abs(got[2].astype(int) - im.astype(int)).max()) <= 2


class TestSingleComponentGeometry:
    def test_grayscale_with_sampling_factors_above_1x1(self):
        """T.81 A.2: a one-component scan is ALWAYS non-interleaved with
        ceil(w/8) x ceil(h/8) raster blocks — sampling factors on a
        grayscale frame must not reroute it through the MCU grid (r4
        review finding: 2x2 sampling on 16-multiple dims silently
        scrambled block placement)."""
        px = (np.arange(32 * 32).reshape(32, 32) * 13 % 256).astype(np.uint8)
        payload = bytearray(JP.encode_progressive(px, quant=1))
        idx = bytes(payload).find(b"\xff\xc2")
        # SOF2 layout: len(2) prec(1) h(2) w(2) nc(1) [cid hv tq]
        samp_byte = idx + 2 + 2 + 1 + 2 + 2 + 1 + 1
        assert payload[samp_byte] == 0x11
        payload[samp_byte] = 0x22  # declare 2x2 sampling, still 1 comp
        got = JP.decode_progressive(bytes(payload))
        assert got is not None
        # +-1 is DCT rounding (same as the unpatched gray round-trip);
        # the pre-fix MCU routing scrambled whole blocks (err ~ 200)
        assert int(np.abs(got[2][:, :, 0].astype(int) - px.astype(int)).max()) <= 1
