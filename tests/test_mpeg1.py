"""MPEG-1 intra video (ISO/IEC 11172-2): round-trip conformance, VLC
alphabet pins, syntax pins, and the I-only sampling guards.

Conformance strategy (module docstring of mpeg1.py): no external MPEG
decoder exists in this container, so the checks are (a) encoder→decoder
round-trip within the quantization error bound, (b) the VLC alphabets
pinned prefix-free and spot-pinned against published Annex-B code
values, (c) byte-level syntax pins (start codes, 12-bit geometry, the
picture-rate enum), and (d) non-I pictures are skipped on the sampling
timeline, never misdecoded.
"""

from __future__ import annotations

import numpy as np
import pytest

from index_search_monorepo_spark.operators import mpeg1 as M
from index_search_monorepo_spark.operators.mpeg1 import (
    encode_mpeg1,
    mpeg1_sample_frames,
    parse_m1v,
)


def _gradient_rgb(h: int, w: int, phase: int = 0) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.dstack(
        [
            (7 * xx + 3 * yy + phase) % 256,
            (255 - 5 * xx + phase) % 256,
            (11 * yy + xx) % 256,
        ]
    ).astype(np.uint8)


def _smooth_gray_rgb(h: int, w: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    g = (
        (xx * 255) // max(w - 1, 1) // 2 + (yy * 255) // max(h - 1, 1) // 2
    ).astype(np.uint8)
    return np.repeat(g[:, :, None], 3, 2)


def _decode_first_frame(payload: bytes) -> np.ndarray:
    frames = mpeg1_sample_frames(payload, every_ms=1, max_frames=1)
    assert frames is not None
    from index_search_monorepo_spark.operators.multimodal import decode_image

    decoded = decode_image(frames[0][2])
    assert decoded is not None
    w, h, px, fmt = decoded
    assert fmt == "ppm"
    return px


class TestVlcAlphabets:
    def _assert_prefix_free(self, codes):
        cs = sorted(codes)
        for a, b in zip(cs, cs[1:]):
            assert not b.startswith(a), (a, b)

    def test_alphabets_prefix_free(self):
        # the coefficient alphabet must also exclude EOB/escape prefixes
        self._assert_prefix_free(
            list(M._AC_CODES) + ["10", "000001"]
        )
        self._assert_prefix_free(
            list(M._MBA_CODES) + [M.MBA_STUFFING, M.MBA_ESCAPE]
        )
        self._assert_prefix_free(list(M._DC_LUM_CODES))
        self._assert_prefix_free(list(M._DC_CHROM_CODES))

    def test_published_code_pins(self):
        # Annex B spot pins: B.1, B.5a/b, and the run/level table
        assert M._MBA_CODES["1"] == 1
        assert M._MBA_CODES["00000011000"] == 33
        assert M._DC_LUM_CODES["100"] == 0
        assert M._DC_CHROM_CODES["11111110"] == 8
        assert M._AC_CODES["11"] == (0, 1)
        assert M._AC_CODES["011"] == (1, 1)
        assert M._AC_CODES["0101"] == (2, 1)
        assert M._AC_CODES["000000000010000"] == (0, 40)
        assert M._AC_CODES["0000000000011011"] == (31, 1)

    def test_ac_alphabet_complete(self):
        # every (run, level) the table claims is unique
        assert len(set(M._AC_CODES.values())) == len(M._AC_CODES)


class TestSyntax:
    def test_stream_layout(self):
        payload = encode_mpeg1([_gradient_rgb(32, 48)], fps=25)
        assert payload[:4] == b"\x00\x00\x01\xb3"
        # 12-bit geometry straddling bytes: 48 = 0x030, 32 = 0x020
        assert payload[4] == 0x03  # width high 8
        assert payload[5] == 0x00 | 0x00  # width low 4 | height high 4
        assert payload[6] == 0x20  # height low 8
        assert b"\x00\x00\x01\xb8" in payload  # GOP
        assert b"\x00\x00\x01\x00" in payload  # picture
        assert b"\x00\x00\x01\x01" in payload  # first slice
        assert payload.endswith(b"\x00\x00\x01\xb7")  # sequence end

    def test_parse_m1v_meta(self):
        payload = encode_mpeg1(
            [_gradient_rgb(32, 48, p) for p in (0, 50, 100)], fps=25
        )
        meta = parse_m1v(payload)
        assert meta is not None
        assert (meta["width"], meta["height"]) == (48, 32)
        assert meta["media_format"] == "m1v"
        assert meta["timescale"] == 25
        assert meta["duration_ms"] == 120  # 3 frames at 25 fps
        assert meta["n_tracks"] == 1

    def test_parse_rejects_non_mpeg(self):
        assert parse_m1v(b"") is None
        assert parse_m1v(b"\x00\x00\x01\xb3") is None  # truncated
        assert parse_m1v(b"RIFF\x00\x00\x00\x00AVI ") is None
        assert parse_m1v(bytes(64)) is None

    def test_ntsc_rate_code(self):
        payload = encode_mpeg1([_gradient_rgb(16, 16)], fps=30)
        meta = parse_m1v(payload)
        assert meta["timescale"] == 30


class TestRoundTrip:
    def test_smooth_image_tight_bound(self):
        px = _smooth_gray_rgb(32, 48)
        out = _decode_first_frame(encode_mpeg1([px], qscale=2))
        assert out.shape == px.shape
        err = np.abs(out.astype(int) - px.astype(int)).mean()
        assert err < 4.0, err

    def test_gradient_rgb(self):
        px = _gradient_rgb(48, 64)
        out = _decode_first_frame(encode_mpeg1([px], qscale=4))
        err = np.abs(out.astype(int) - px.astype(int)).mean()
        assert err < 14.0, err

    def test_odd_dims_cropped(self):
        # 23x14: geometry not a macroblock multiple — encoder pads,
        # decoder crops back to the 12-bit header dims
        px = _gradient_rgb(23, 14)
        out = _decode_first_frame(encode_mpeg1([px]))
        assert out.shape == (23, 14, 3)

    def test_flat_image_exact_dc_path(self):
        # constant luma exercises DC prediction with all-zero AC
        px = np.full((32, 32, 3), 137, np.uint8)
        out = _decode_first_frame(encode_mpeg1([px], qscale=2))
        assert np.abs(out.astype(int) - 137).max() <= 2

    def test_escape_coded_levels(self):
        # high-contrast checkerboard at qscale 1 forces levels outside
        # the VLC alphabet -> escape path on both sides
        yy, xx = np.mgrid[0:16, 0:16]
        px = ((xx + yy) % 2 * 255).astype(np.uint8)
        px = np.repeat(px[:, :, None], 3, 2)
        out = _decode_first_frame(encode_mpeg1([px], qscale=1))
        err = np.abs(out.astype(int) - px.astype(int)).mean()
        assert err < 40.0, err  # extreme content; bound is sanity, not fidelity

    def test_multi_frame_timeline(self):
        frames = [_gradient_rgb(16, 32, p) for p in (0, 60, 120, 180)]
        payload = encode_mpeg1(frames, fps=25)
        out = mpeg1_sample_frames(payload, every_ms=1, max_frames=8)
        assert out is not None and len(out) == 4
        # 25 fps -> 40 ms per frame
        assert [ts for _, ts, _ in out] == [0, 40, 80, 120]
        # frames are distinct: phase shifts survive the codec
        from index_search_monorepo_spark.operators.multimodal import decode_image

        px0 = decode_image(out[0][2])[2]
        px1 = decode_image(out[1][2])[2]
        assert np.abs(px0.astype(int) - px1.astype(int)).mean() > 5

    def test_sampling_respects_every_ms(self):
        frames = [_gradient_rgb(16, 16, p) for p in range(10)]
        payload = encode_mpeg1(frames, fps=25)  # 40 ms apart
        out = mpeg1_sample_frames(payload, every_ms=100, max_frames=8)
        assert out is not None
        assert [ts for _, ts, _ in out] == [0, 120, 240, 360]

    def test_retained_pixel_cap(self):
        frames = [_gradient_rgb(64, 64, p) for p in range(4)]
        payload = encode_mpeg1(frames)
        out = mpeg1_sample_frames(
            payload, every_ms=1, max_frames=8, max_total_pixels=2 * 64 * 64
        )
        assert out is not None and len(out) == 2


def _picture_sizes(payload: bytes) -> list[int]:
    """Byte size of each picture (picture start code to the next
    picture/GOP/sequence-end start code)."""
    codes = M._find_start_codes(payload)
    pic_offs = [off for off, sc in codes if sc == M.PIC_START]
    bounds = [
        off for off, sc in codes
        if sc in (M.PIC_START, M.GOP_START, M.SEQ_END)
    ]
    sizes = []
    for p in pic_offs:
        nxt = min((b for b in bounds if b > p), default=len(payload))
        sizes.append(nxt - p)
    return sizes


def _decode_all(payload: bytes) -> list[np.ndarray]:
    out = mpeg1_sample_frames(payload, every_ms=1, max_frames=64)
    assert out is not None
    from index_search_monorepo_spark.operators.multimodal import decode_image

    return [decode_image(f)[2] for _, _, f in out]


class TestPPictures:
    def test_new_alphabets_prefix_free_and_pinned(self):
        cs = sorted(M._MV_CODES)
        for a, b in zip(cs, cs[1:]):
            assert not b.startswith(a), (a, b)
        cs = sorted(M._CBP_CODES)
        for a, b in zip(cs, cs[1:]):
            assert not b.startswith(a), (a, b)
        cs = sorted(M._P_MBTYPE_CODES)
        for a, b in zip(cs, cs[1:]):
            assert not b.startswith(a), (a, b)
        # Annex B.4 / B.3 / B.2b spot pins against published values
        assert M._MV_CODES["1"] == 0
        assert M._MV_CODES["010"] == 1 and M._MV_CODES["011"] == -1
        assert M._MV_CODES["00000011000"] == 16
        assert M._MV_CODES["00000011001"] == -16
        assert M._CBP_CODES["111"] == 60
        assert M._CBP_CODES["01011"] == 1
        assert M._CBP_CODES["000000010"] == 39
        assert len(set(M._CBP_CODES.values())) == 63  # all of 1..63
        assert set(M._CBP_CODES.values()) == set(range(1, 64))
        assert M._P_MBTYPE_CODES["1"] == (0, 1, 1, 0)
        assert M._P_MBTYPE_CODES["00011"] == (0, 0, 0, 1)

    def test_motion_reconstruction_roundtrip(self):
        # every (vector, predictor, f_code) in range survives
        # encode -> decode through the modular little/big arithmetic
        for f_code in (1, 2, 3):
            f = 1 << (f_code - 1)
            f_size = f_code - 1
            for pred0 in (-16 * f, -3, 0, 5, 16 * f - 1):
                for v in range(-16 * f, 16 * f, max(1, f * 3)):
                    bw = M._BitWriter()
                    M._encode_motion(bw, v, pred0, f, f_size)
                    bw.align()
                    bits = M._Bits(bytes(bw.out))
                    got = M._read_motion(bits, f, f_size, [0, pred0], 1)
                    assert got == v, (f_code, pred0, v, got)

    def test_static_scene_all_skip(self):
        px = _gradient_rgb(32, 48)
        payload = encode_mpeg1([px, px, px, px], qscale=2, intra_every=1000)
        sizes = _picture_sizes(payload)
        assert len(sizes) == 4
        # the FIRST P legitimately codes the I picture's quantization
        # error once (closed loop: residual vs the reconstruction, not
        # the source); from the second P on the scene is converged and
        # pictures are skip + the forced first/last-of-slice macroblocks
        assert sizes[1] < sizes[0] / 3, sizes
        assert sizes[2] < sizes[0] / 10, sizes
        assert sizes[3] <= sizes[2], sizes
        frames = _decode_all(payload)
        assert len(frames) == 4
        # every decoded frame stays within quantization noise of the
        # source (the first P even improves on the I reconstruction)
        for fr in frames:
            assert np.abs(fr.astype(int) - px.astype(int)).mean() < 12.0
        # the converged tail barely moves (skip + ±1-level oscillation
        # on a handful of forced-coded macroblocks)
        d = np.abs(frames[3].astype(int) - frames[2].astype(int))
        assert d.mean() < 0.5 and d.max() <= 8, (d.mean(), d.max())

    def test_pure_shift_carried_by_motion(self):
        # high-detail content: without MC the displaced residual is
        # expensive; with MC it is just requantization noise
        base = _gradient_rgb(48, 64)
        shifted = np.roll(base, (2, 3), axis=(0, 1))
        payload = encode_mpeg1(
            [base, shifted], qscale=2, intra_every=1000, motion_window=4
        )
        # MC, not residual coding, carries a translating scene: the same
        # frame pair with the search disabled must cost far more bits
        no_mc = encode_mpeg1(
            [base, shifted], qscale=2, intra_every=1000, motion_window=0,
            half_pel=False,
        )
        assert _picture_sizes(payload)[1] < _picture_sizes(no_mc)[1] * 0.6
        frames = _decode_all(payload)
        inner = (slice(8, 40), slice(8, 56))
        err = np.abs(
            frames[1][inner].astype(int) - shifted[inner].astype(int)
        ).mean()
        assert err < 12.0, err

    def test_half_pel_interpolation_path(self):
        g = _smooth_gray_rgb(32, 48).astype(np.int64)
        # frame2 = frame1 displaced by exactly half a pel horizontally
        avg = (g[:, :-1] + g[:, 1:] + 1) // 2
        f2 = np.concatenate([g[:, :1], avg], axis=1).astype(np.uint8)
        payload = encode_mpeg1(
            [g.astype(np.uint8), f2], qscale=2, intra_every=1000,
            motion_window=1, half_pel=True,
        )
        sizes = _picture_sizes(payload)
        assert sizes[1] < sizes[0] / 3, sizes
        frames = _decode_all(payload)
        inner = (slice(4, 28), slice(4, 44))
        err = np.abs(
            frames[1][inner].astype(int) - f2[inner].astype(int)
        ).mean()
        assert err < 4.0, err

    def test_residual_coding_on_local_change(self):
        base = _smooth_gray_rgb(32, 48)
        changed = base.copy()
        changed[8:20, 12:30] = np.clip(
            changed[8:20, 12:30].astype(int) + 70, 0, 255
        ).astype(np.uint8)
        payload = encode_mpeg1([base, changed], qscale=2, intra_every=1000)
        frames = _decode_all(payload)
        err = np.abs(
            frames[1].astype(int) - changed.astype(int)
        ).mean()
        assert err < 4.0, err

    def test_scene_cut_falls_back_to_intra(self):
        a = _smooth_gray_rgb(32, 48)
        b = _gradient_rgb(32, 48)  # unrelated content
        payload = encode_mpeg1([a, b], qscale=4, intra_every=1000)
        frames = _decode_all(payload)
        err = np.abs(frames[1].astype(int) - b.astype(int)).mean()
        assert err < 14.0, err

    def test_reference_chain_over_many_p(self):
        base = _smooth_gray_rgb(48, 48)
        frames_in = [
            np.roll(base, (t, t), axis=(0, 1)) for t in range(5)
        ]
        payload = encode_mpeg1(
            frames_in, qscale=2, intra_every=1000, motion_window=2
        )
        frames = _decode_all(payload)
        assert len(frames) == 5
        inner = (slice(10, 38), slice(10, 38))
        for t in (2, 4):  # accumulated drift stays bounded (closed loop)
            err = np.abs(
                frames[t][inner].astype(int)
                - frames_in[t][inner].astype(int)
            ).mean()
            assert err < 5.0, (t, err)

    def test_larger_f_code_vectors(self):
        # a 10-pel shift needs f_code 2 (20 half-pels, past the ±15
        # range of f_code 1) and keeps the 4:2:0 chroma displacement
        # integral so the tiles predict exactly. Flat 16-px tiles:
        # intra reconstructs them within the non-intra dead zone, so a
        # correct vector yields a near-skip P while the no-MC residual
        # straddles tile boundaries
        yy, xx = np.mgrid[0:48, 0:80]
        tile = ((yy // 16) * 5 + (xx // 16)) % 7
        palette = np.array(
            [[40, 40, 40], [200, 60, 60], [60, 200, 60], [60, 60, 200],
             [220, 220, 90], [90, 220, 220], [160, 90, 160]], np.uint8
        )
        base = palette[tile]
        shifted = np.roll(base, 10, axis=1)
        payload = encode_mpeg1(
            [base, shifted], qscale=4, intra_every=1000, motion_window=10
        )
        no_mc = encode_mpeg1(
            [base, shifted], qscale=4, intra_every=1000, motion_window=0,
            half_pel=False,
        )
        assert _picture_sizes(payload)[1] < _picture_sizes(no_mc)[1] * 0.4
        frames = _decode_all(payload)
        inner = (slice(8, 40), slice(16, 64))
        err = np.abs(
            frames[1][inner].astype(int) - shifted[inner].astype(int)
        ).mean()
        assert err < 6.0, err

    def test_sampling_timeline_includes_p(self):
        frames_in = [_smooth_gray_rgb(16, 16)] * 4
        payload = encode_mpeg1(frames_in, fps=25, intra_every=4)
        out = mpeg1_sample_frames(payload, every_ms=1, max_frames=8)
        assert out is not None
        assert [ts for _, ts, _ in out] == [0, 40, 80, 120]

    def test_intra_every_mixes_i_and_p(self):
        frames_in = [_smooth_gray_rgb(16, 32)] * 6
        payload = encode_mpeg1(frames_in, intra_every=3)
        codes = M._find_start_codes(payload)
        types = []
        for off, sc in codes:
            if sc == M.PIC_START:
                bits = M._Bits(payload, (off + 4) * 8)
                bits.read_bits(10)
                types.append(bits.read_bits(3))
        assert types == [1, 2, 2, 1, 2, 2]


def _picture_headers(payload: bytes) -> list[tuple[int, int]]:
    """(temporal_reference, picture_coding_type) per picture, in
    coding (stream) order."""
    out = []
    for off, sc in M._find_start_codes(payload):
        if sc == M.PIC_START:
            bits = M._Bits(payload, (off + 4) * 8)
            out.append((bits.read_bits(10), bits.read_bits(3)))
    return out


class TestBPictures:
    def test_b_alphabet_prefix_free_and_pinned(self):
        cs = sorted(M._B_MBTYPE_CODES)
        for a, b in zip(cs, cs[1:]):
            assert not b.startswith(a), (a, b)
        # Annex B.2c spot pins
        assert M._B_MBTYPE_CODES["10"] == (0, 1, 1, 0, 0)
        assert M._B_MBTYPE_CODES["11"] == (0, 1, 1, 1, 0)
        assert M._B_MBTYPE_CODES["0010"] == (0, 1, 0, 0, 0)
        assert M._B_MBTYPE_CODES["00011"] == (0, 0, 0, 0, 1)
        assert M._B_MBTYPE_CODES["000001"] == (1, 0, 0, 0, 1)

    def test_coding_order_vs_display_order(self):
        frames = [
            np.roll(_smooth_gray_rgb(32, 48), t, axis=1) for t in range(7)
        ]
        payload = encode_mpeg1(
            frames, fps=25, qscale=2, intra_every=1000, motion_window=2,
            b_frames=2,
        )
        # coding order: each reference precedes the Bs that display
        # before it; refs at display 0,3,6 (I P P), Bs between
        assert _picture_headers(payload) == [
            (0, 1), (3, 2), (1, 3), (2, 3), (6, 2), (4, 3), (5, 3),
        ]
        out = mpeg1_sample_frames(payload, every_ms=1, max_frames=16)
        assert out is not None
        # emitted in display order on the 25 fps timeline
        assert [ts for _, ts, _ in out] == [0, 40, 80, 120, 160, 200, 240]
        from index_search_monorepo_spark.operators.multimodal import (
            decode_image,
        )

        inner = (slice(8, 24), slice(8, 40))
        for k, (_, _, ppm) in enumerate(out):
            px = decode_image(ppm)[2]
            err = np.abs(
                px[inner].astype(int) - frames[k][inner].astype(int)
            ).mean()
            assert err < 5.0, (k, err)

    def test_interpolated_prediction_carries_a_fade(self):
        a = np.full((32, 48, 3), 60, np.uint8)
        c = np.full((32, 48, 3), 120, np.uint8)
        mid = np.full((32, 48, 3), 90, np.uint8)  # exact (a+c)/2
        payload = encode_mpeg1(
            [a, mid, c], fps=25, qscale=4, intra_every=1000, b_frames=1
        )
        assert [t for _, t in _picture_headers(payload)] == [1, 2, 3]
        sizes = _picture_sizes(payload)
        # interpolation carries the fade: the B costs no more than the
        # references (all three are near the structural floor here)
        assert sizes[2] <= sizes[1], sizes
        frames = _decode_all(payload)
        assert len(frames) == 3
        # 90 == (60+120)/2: forward-only prediction would decode ~60,
        # backward-only ~120 — landing on 90 pins the (f+b+1)>>1 path
        assert np.abs(frames[1].astype(int) - 90).max() <= 4

    def test_bidirectional_occlusion(self):
        # content visible only in the FUTURE reference: backward
        # prediction must carry the new region
        base = _smooth_gray_rgb(32, 48)
        future = base.copy()
        future[:, 32:] = _gradient_rgb(32, 48)[:, 32:]
        mid = base.copy()
        mid[:, 40:] = future[:, 40:]
        payload = encode_mpeg1(
            [base, mid, future], fps=25, qscale=2, intra_every=1000,
            b_frames=1,
        )
        frames = _decode_all(payload)
        err = np.abs(frames[1].astype(int) - mid.astype(int)).mean()
        assert err < 12.0, err

    def test_failed_b_loses_only_its_frame(self):
        a = _gradient_rgb(16, 32)
        payload = encode_mpeg1(
            [a, np.roll(a, 1, 1), np.roll(a, 2, 1)], fps=25, qscale=2,
            intra_every=1000, b_frames=1,
        )
        # coding order I0 P2 B1: truncate inside the B's first slice
        codes = M._find_start_codes(payload)
        pics = [off for off, sc in codes if sc == M.PIC_START]
        b_slice = next(
            off for off, sc in codes
            if off > pics[2] and M.SLICE_MIN <= sc <= M.SLICE_MAX
        )
        out = mpeg1_sample_frames(payload[:b_slice + 5], 1, 8)
        assert out is not None
        # both references survive at their display slots; the B is lost
        assert [ts for _, ts, _ in out] == [0, 80]
class TestDPictures:
    def test_d_round_trip_tiles_near_exact(self):
        # content constant within 16-px tiles survives DC-only coding
        yy, xx = np.mgrid[0:32, 0:48]
        tile = ((yy // 16) * 3 + (xx // 16)) % 5
        palette = np.array(
            [[40, 40, 40], [200, 60, 60], [60, 200, 60],
             [60, 60, 200], [220, 220, 90]], np.uint8
        )
        px = palette[tile]
        payload = M.encode_mpeg1_d([px, px])
        assert [t for _, t in _picture_headers(payload)] == [4, 4]
        frames = _decode_all(payload)
        assert len(frames) == 2
        for fr in frames:
            assert np.abs(fr.astype(int) - px.astype(int)).max() <= 4

    def test_d_decode_is_blockwise_flat(self):
        # arbitrary content: every 8x8 tile of a decoded D frame is a
        # single color (DC-only blocks), near the source tile's mean
        px = _gradient_rgb(16, 32)
        frames = _decode_all(M.encode_mpeg1_d([px]))
        fr = frames[0].astype(int)
        for by in range(0, 16, 8):
            for bx in range(0, 32, 8):
                t = fr[by:by + 8, bx:bx + 8]
                assert (t == t[0, 0]).all(), (by, bx)

    def test_d_meta_and_timeline(self):
        px = _smooth_gray_rgb(16, 16)
        payload = M.encode_mpeg1_d([px] * 3, fps=25)
        meta = parse_m1v(payload)
        assert meta["duration_ms"] == 120
        out = mpeg1_sample_frames(payload, every_ms=1, max_frames=8)
        assert [ts for _, ts, _ in out] == [0, 40, 80]


class TestNonIPictures:
    def _with_p_picture(self) -> bytes:
        """Splice a P-picture header (type 2, no slices) into an I-only
        stream between the two real I pictures."""
        frames = [_gradient_rgb(16, 16, p) for p in (0, 90)]
        payload = bytearray(encode_mpeg1(frames, fps=25))
        # second picture start: bump its temporal_reference to 2 and
        # insert a fake P at temporal_reference 1
        second = payload.index(b"\x00\x00\x01\x00", 8)
        second = payload.index(b"\x00\x00\x01\x00", second + 4)
        p_hdr = bytes((0, 0, 1, 0)) + bytes(
            ((1 >> 2) & 0xFF, ((1 & 3) << 6) | (2 << 3) | 7, 0xFF, 0xFF)
        )
        # temporal_ref 10 bits: value 1 -> byte0 0x00, byte1 high 2 bits
        # 01; picture type P=2 in next 3 bits; vbv_delay all-ones
        patched = bytearray(p_hdr)
        patched[4] = 0
        patched[5] = (1 << 6) | (2 << 3) | ((0xFFFF >> 13) & 0x7)
        return bytes(payload[:second]) + bytes(patched) + b"\xff\xfe" + bytes(
            payload[second:]
        )

    def test_p_pictures_skipped_not_misdecoded(self):
        payload = self._with_p_picture()
        out = mpeg1_sample_frames(payload, every_ms=1, max_frames=8)
        assert out is not None
        assert len(out) == 2  # the two real I pictures only

    def test_all_p_stream_returns_none(self):
        payload = bytearray(encode_mpeg1([_gradient_rgb(16, 16)]))
        # flip the single picture's type I->P (3 bits after the 10-bit
        # temporal reference)
        pic = payload.index(b"\x00\x00\x01\x00")
        payload[pic + 5] = (payload[pic + 5] & ~0x38) | (2 << 3)
        assert mpeg1_sample_frames(bytes(payload), 1, 8) is None


class TestDispatch:
    def test_video_metadata_routes_m1v(self):
        from index_search_monorepo_spark.operators.multimodal import (
            _video_meta_row,
        )

        payload = encode_mpeg1([_gradient_rgb(32, 48)])
        row = _video_meta_row(7, payload)
        assert row["media_format"] == "m1v"
        assert (row["width"], row["height"]) == (48, 32)

    def test_sample_frames_kernel_routes_m1v(self):
        from index_search_monorepo_spark.operators.multimodal import (
            _sample_frames_rows,
        )

        payload = encode_mpeg1([_gradient_rgb(16, 16, p) for p in (0, 80)])
        rows = _sample_frames_rows(3, payload, 1, 8, 64_000_000)
        assert len(rows) == 2
        assert all(r["frame"].startswith(b"P6") for r in rows)
