"""Arithmetic-coded JPEG (SOF9) — conformance via (a) QM-coder and
model-layer round-trip properties and (b) bit-identity with the
independently-tested BASELINE Huffman codec on the same pixels: two
entirely different entropy coders must converge to identical
coefficients, which catches model/coder bugs a plain round-trip cannot
(a self-consistent-but-wrong pair still round-trips; it does not match
a different coder)."""

from __future__ import annotations

import random

import numpy as np

from index_search_monorepo_spark.operators import jpeg as J
from index_search_monorepo_spark.operators import jpeg_arith as JA
from index_search_monorepo_spark.operators import multimodal as MM


def _smooth(w, h):
    yy, xx = np.mgrid[0:h, 0:w]
    r = (40 + 2 * xx + yy) % 180 + 30
    g = (60 + xx + 2 * yy) % 180 + 30
    b = (80 + 3 * xx) % 180 + 30
    return np.dstack([r, g, b]).astype(np.uint8)


class TestQeTable:
    def test_shape_and_ranges(self):
        assert len(JA.QE_TABLE) == 114  # 113 adaptive states + fixed bin
        for qe, nlps, nmps, sw in JA.QE_TABLE:
            assert 0 < qe <= 0x5B12
            assert 0 <= nlps <= 113 and 0 <= nmps <= 113
            assert sw in (0, 1)

    def test_switch_only_near_half(self):
        # MPS switching only makes sense when Qe ~ 0.5 (T.81 D.1.5)
        for qe, _nl, _nm, sw in JA.QE_TABLE:
            if sw:
                assert qe > 0x5000

    def test_fixed_bin_is_absorbing(self):
        qe, nlps, nmps, sw = JA.QE_TABLE[113]
        assert nlps == nmps == 113 and sw == 0


class TestQMCoder:
    def test_random_round_trips(self):
        random.seed(42)
        for _trial in range(60):
            n_ctx = random.randint(1, 8)
            seq = [
                (random.randrange(n_ctx), random.getrandbits(1))
                for _ in range(random.randint(1, 600))
            ]
            enc = JA._QMEncoder()
            st_e = bytearray(n_ctx)
            for ctx, bit in seq:
                enc.encode(st_e, ctx, bit)
            data = enc.flush()
            dec = JA._QMDecoder(data, 0)
            st_d = bytearray(n_ctx)
            for i, (ctx, bit) in enumerate(seq):
                assert dec.decode(st_d, ctx) == bit, f"bit {i}"
            assert st_e == st_d  # estimation state machines stay in step

    def test_pathological_runs_and_stuffing(self):
        # constant and near-constant streams drive Qe to the extremes and
        # exercise carry propagation + 0xFF00 byte stuffing
        pats = [
            [(0, 0)] * 4000,
            [(0, 1)] * 4000,
            [(0, i % 2) for i in range(4000)],
            [(0, 1 if i % 7 == 0 else 0) for i in range(4000)],
        ]
        stuffed = 0
        for p in pats:
            enc = JA._QMEncoder()
            st = bytearray(1)
            for ctx, bit in p:
                enc.encode(st, ctx, bit)
            data = enc.flush()
            stuffed += data.count(b"\xff\x00")
            dec = JA._QMDecoder(data, 0)
            st2 = bytearray(1)
            for ctx, bit in p:
                assert dec.decode(st2, ctx) == bit
        assert stuffed > 0  # the stuffing path really ran

    def test_zero_feed_past_marker(self):
        enc = JA._QMEncoder()
        st = bytearray(1)
        bits = [1, 0, 1, 1, 0] * 20
        for b in bits:
            enc.encode(st, 0, b)
        data = enc.flush() + b"\xff\xd9"
        dec = JA._QMDecoder(data, 0)
        st2 = bytearray(1)
        for b in bits:
            assert dec.decode(st2, 0) == b
        assert dec.at_marker or dec.pos <= len(data)


class TestModelLayer:
    def test_block_round_trip(self):
        random.seed(1)
        for _trial in range(15):
            blocks = []
            for _ in range(random.randint(1, 20)):
                zz = np.zeros(64, np.int32)
                for _ in range(random.randint(0, 12)):
                    zz[random.randint(1, 63)] = random.choice(
                        [1, -1, 2, -3, 5, -17, 100, -1000, 20000]
                    )
                zz[0] = random.choice([0, 1, -1, 7, -130, 2047, -2048])
                blocks.append(zz)
            enc = JA._QMEncoder()
            se = JA._ArithStats(1, {0: (0, 1)}, {0: 5})
            pred = 0
            for zz in blocks:
                JA._encode_dc_diff(enc, se, 0, 0, int(zz[0]) - pred)
                pred = int(zz[0])
                JA._encode_ac_block(enc, se, 0, zz)
            dec = JA._QMDecoder(enc.flush(), 0)
            sd = JA._ArithStats(1, {0: (0, 1)}, {0: 5})
            pred = 0
            for zz in blocks:
                out = np.zeros(64, np.int32)
                pred += JA._decode_dc_diff(dec, sd, 0, 0)
                out[0] = pred
                JA._decode_ac_block(dec, sd, 0, out)
                assert np.array_equal(out, zz)


class TestArithmeticDecode:
    def test_bit_identical_to_baseline_codec(self):
        """The strongest available check (no arithmetic-coded reference
        corpus ships in this container): at identical quant the QM-coded
        and Huffman-coded streams carry identical coefficients, so the
        decoded images must be IDENTICAL."""
        for seed in range(4):
            rng = np.random.default_rng(seed)
            im = rng.integers(0, 256, (25, 33, 3), dtype=np.uint8)
            a = JA.decode_arith(JA.encode_arith(im, quant=1))
            b = J.decode_baseline(J.encode_baseline(im, quant=1))
            assert a is not None and b is not None
            assert np.array_equal(a[2], b[2]), f"seed {seed}"

    def test_grayscale_and_gradient(self):
        px = (np.arange(24 * 17).reshape(17, 24) * 11 % 256).astype(np.uint8)
        a = JA.decode_arith(JA.encode_arith(px, quant=1))
        b = J.decode_baseline(J.encode_baseline(px, quant=1))
        assert a is not None and np.array_equal(a[2], b[2])
        # smooth gradient drives the DC small/large conditioning contexts
        g = np.tile(np.arange(64, dtype=np.uint8) * 4, (64, 1))
        a = JA.decode_arith(JA.encode_arith(g, quant=1))
        b = J.decode_baseline(J.encode_baseline(g, quant=1))
        assert np.array_equal(a[2], b[2])

    def test_subsampled_420(self):
        im = _smooth(41, 35)
        a = JA.decode_arith(JA.encode_arith(im, quant=3, subsampling="420"))
        b = J.decode_baseline(J.encode_baseline(im, quant=3, subsampling="420"))
        assert a is not None and np.array_equal(a[2], b[2])

    def test_coarse_quant_eob_heavy(self):
        im = _smooth(48, 40)
        for q in (4, 16, 40):
            a = JA.decode_arith(JA.encode_arith(im, quant=q))
            b = J.decode_baseline(J.encode_baseline(im, quant=q))
            assert a is not None and np.array_equal(a[2], b[2]), f"q={q}"

    def test_restart_intervals(self):
        for ri in (1, 2, 3, 7):
            im = _smooth(40, 24)
            payload = JA.encode_arith(im, quant=2, restart_interval=ri)
            assert b"\xff\xd0" in payload
            a = JA.decode_arith(payload)
            b = J.decode_baseline(
                J.encode_baseline(im, quant=2, restart_interval=ri)
            )
            assert a is not None and np.array_equal(a[2], b[2]), f"ri={ri}"

    def test_refusals(self):
        im = _smooth(16, 16)
        # Huffman baseline refused by the arithmetic decoder and vice versa
        assert JA.decode_arith(J.encode_baseline(im, quant=2)) is None
        assert J.decode_baseline(JA.encode_arith(im, quant=2)) is None
        # truncation, garbage, EOI-before-SOS
        payload = JA.encode_arith(im, quant=2)
        assert JA.decode_arith(payload[:50]) is None
        assert JA.decode_arith(b"\xff\xd8\xff\xd9") is None
        # a sequential scan script relabeled SOF10 is malformed for the
        # progressive decoder (its SOS declares Ss=0 Se=63, which a DC
        # scan forbids) — refused, never mis-decoded
        mut = bytearray(payload)
        idx = payload.find(b"\xff\xc9")
        mut[idx + 1] = 0xCA
        assert JA.decode_arith(bytes(mut)) is None

    def test_decode_image_dispatches_arithmetic(self):
        im = _smooth(16, 16)
        got = MM.decode_image(JA.encode_arith(im, quant=1))
        assert got is not None and got[3] == "jpg"
        assert int(np.abs(got[2].astype(int) - im.astype(int)).max()) <= 2


class TestProgressiveArithmetic:
    """SOF10 (T.81 Annex G.2): the QM coder driven by the progressive
    scan structure. Conformance = bit-identity with the independently
    tested BASELINE Huffman codec (identical coefficients delivered via
    a 10-scan successive-approximation script vs one sequential scan)
    AND with the Huffman progressive codec (same scan script, different
    entropy coder)."""

    def test_bit_identical_to_baseline_codec(self):
        for seed in range(4):
            rng = np.random.default_rng(seed)
            im = rng.integers(0, 256, (25, 33, 3), dtype=np.uint8)
            a = JA.decode_arith(JA.encode_arith_progressive(im, quant=1))
            b = J.decode_baseline(J.encode_baseline(im, quant=1))
            assert a is not None and b is not None
            assert np.array_equal(a[2], b[2]), f"seed {seed}"

    def test_bit_identical_to_huffman_progressive(self):
        from index_search_monorepo_spark.operators import (
            jpeg_progressive as JP,
        )

        im = _smooth(28, 20)
        a = JA.decode_arith(JA.encode_arith_progressive(im, quant=2))
        p = JP.decode_progressive(JP.encode_progressive(im, quant=2))
        assert a is not None and p is not None
        assert np.array_equal(a[2], p[2])

    def test_grayscale_round_trip(self):
        px = (np.arange(24 * 17).reshape(17, 24) * 11 % 256).astype(np.uint8)
        a = JA.decode_arith(JA.encode_arith_progressive(px, quant=1))
        b = J.decode_baseline(J.encode_baseline(px, quant=1))
        assert a is not None and np.array_equal(a[2], b[2])

    def test_coarse_quant_eob_heavy(self):
        # coarse quant zeroes most AC bands -> the EOB decision and the
        # all-zero refinement paths dominate
        im = _smooth(48, 40)
        for q in (4, 16, 40):
            a = JA.decode_arith(JA.encode_arith_progressive(im, quant=q))
            b = J.decode_baseline(J.encode_baseline(im, quant=q))
            assert a is not None and np.array_equal(a[2], b[2]), f"q={q}"

    def test_restart_intervals_every_scan(self):
        for ri in (1, 2, 7):
            im = _smooth(40, 24)
            payload = JA.encode_arith_progressive(
                im, quant=2, restart_interval=ri
            )
            assert b"\xff\xd0" in payload
            a = JA.decode_arith(payload)
            b = J.decode_baseline(
                J.encode_baseline(im, quant=2, restart_interval=ri)
            )
            assert a is not None and np.array_equal(a[2], b[2]), f"ri={ri}"

    def test_partial_edge_blocks(self):
        im = _smooth(33, 25)
        got = JA.decode_arith(JA.encode_arith_progressive(im, quant=2))
        assert got is not None and (got[0], got[1]) == (33, 25)

    def test_truncated_refused(self):
        im = _smooth(16, 16)
        payload = JA.encode_arith_progressive(im, quant=1)
        assert JA.decode_arith(payload[:60]) is None

    def test_decode_image_dispatches_sof10(self):
        im = _smooth(16, 16)
        got = MM.decode_image(JA.encode_arith_progressive(im, quant=1))
        assert got is not None and got[3] == "jpg"
        assert int(np.abs(got[2].astype(int) - im.astype(int)).max()) <= 2


class TestSingleComponentGeometry:
    def test_grayscale_with_sampling_factors_above_1x1(self):
        """T.81 A.2: a one-component scan is ALWAYS non-interleaved with
        ceil(w/8) x ceil(h/8) raster blocks — declared sampling factors
        on a grayscale SOF9 frame must not reroute it through the MCU
        grid (the same rule the progressive decoder pins)."""
        px = (np.arange(32 * 32).reshape(32, 32) * 13 % 256).astype(np.uint8)
        payload = bytearray(JA.encode_arith(px, quant=1))
        idx = bytes(payload).find(b"\xff\xc9")
        # component spec starts 10 bytes into the SOF9 segment payload:
        # marker(2) + len(2) + P(1) + Y(2) + X(2) + Nf(1) + Cid(1)
        assert payload[idx + 11] == 0x11
        payload[idx + 11] = 0x22  # declare 2x2 sampling
        ref = JA.decode_arith(JA.encode_arith(px, quant=1))
        got = JA.decode_arith(bytes(payload))
        assert got is not None
        assert np.array_equal(got[2], ref[2])
