"""CCITT Group 4 (T.6 MMR) bitonal codec — round-trips over every coding
mode, structural validation of the hand-typed T.4 code tables, and the
TIFF compression-4 integration (the archival page-scan layout)."""

from __future__ import annotations

import numpy as np

from index_search_monorepo_spark.operators import ccitt as CC
from index_search_monorepo_spark.operators import multimodal as MM


def _prefix_free(codes):
    codes = sorted(codes, key=len)
    for i, a in enumerate(codes):
        for b in codes[i + 1 :]:
            assert not b.startswith(a), (a, b)


class TestTables:
    def test_alphabets_complete_and_prefix_free(self):
        """A mistyped code that breaks the prefix property (or a missing
        run length) is caught here; encoder and decoder share one table
        source, so these invariants are what the fixtures actually use."""
        assert sorted(CC._WHITE_TERM) == list(range(64))
        assert sorted(CC._BLACK_TERM) == list(range(64))
        assert sorted(CC._WHITE_MAKEUP) == list(range(64, 1729, 64))
        assert sorted(CC._BLACK_MAKEUP) == list(range(64, 1729, 64))
        assert sorted(CC._EXT_MAKEUP) == list(range(1792, 2561, 64))
        _prefix_free(
            list(CC._WHITE_TERM.values())
            + list(CC._WHITE_MAKEUP.values())
            + list(CC._EXT_MAKEUP.values())
        )
        _prefix_free(
            list(CC._BLACK_TERM.values())
            + list(CC._BLACK_MAKEUP.values())
            + list(CC._EXT_MAKEUP.values())
        )
        # 2D mode codes + the EOFB prefix must also be decodable together
        _prefix_free(list(CC._MODES) + ["000000000001"])


class TestRoundTrip:
    def test_structured_page_shapes(self):
        m = np.zeros((40, 64), np.uint8)
        m[5:8, 4:60] = 1   # horizontal rule
        m[12:30, 10:13] = 1  # vertical stroke
        m[20:23, 20:55] = 1
        enc = CC.encode_g4(m)
        assert len(enc) < m.size // 8  # actually compresses
        assert np.array_equal(CC.decode_g4(enc, 64, 40), m)

    def test_degenerate_and_alternating(self):
        for m in (
            np.zeros((10, 30), np.uint8),
            np.ones((10, 30), np.uint8),
            (np.indices((16, 16)).sum(axis=0) % 2).astype(np.uint8),
            np.tile(np.array([1, 1, 0, 0, 0, 0, 0, 1], np.uint8), (12, 25)),
        ):
            assert np.array_equal(
                CC.decode_g4(CC.encode_g4(m), m.shape[1], m.shape[0]), m
            )

    def test_random_masks_exercise_all_modes(self):
        rng = np.random.default_rng(7)
        for density in (0.02, 0.3, 0.7):
            m = (rng.random((25, 130)) < density).astype(np.uint8)
            got = CC.decode_g4(CC.encode_g4(m), 130, 25)
            assert got is not None and np.array_equal(got, m), density

    def test_long_runs_use_makeup_codes(self):
        # 3000-px white + black runs force extended makeup codes (>2560)
        m = np.zeros((3, 3000), np.uint8)
        m[1, :2900] = 1
        assert np.array_equal(CC.decode_g4(CC.encode_g4(m), 3000, 3), m)

    def test_malformed_is_none(self):
        # G4 has no row resync, so arbitrary bit soup can decode as V0
        # chains — "malformed" means an invalid code or running out of
        # bits, both of which must yield None, never raise
        assert CC.decode_g4(b"\x00\x00\x00", 40, 10) is None  # no such code
        assert CC.decode_g4(b"", 40, 10) is None  # instantly truncated
        # horizontal-mode prefix ('001') then EOF mid-run
        assert CC.decode_g4(b"\x20", 40, 10) is None
        assert CC.decode_g4(b"\xff", 9000, 9000) is None  # 81M px size guard


class TestTiffIntegration:
    def test_g4_tiff_round_trip(self):
        # a page-like bitonal image through the real TIFF layer
        px = np.full((30, 50), 255, np.uint8)
        px[4:7, 5:45] = 0
        px[10:25, 8:11] = 0
        payload = MM.encode_tiff(px, compression="g4")
        got = MM.decode_image(payload)
        assert got is not None and got[3] == "tiff"
        w, h, rgb = got[:3]
        assert (w, h) == (50, 30)
        assert np.array_equal(rgb[:, :, 0], px)

    def test_min_is_black_polarity(self):
        px = np.full((8, 16), 255, np.uint8)
        px[2:5, 3:12] = 0
        payload = bytearray(MM.encode_tiff(px, compression="g4"))
        # flip PhotometricInterpretation (entry 5, SHORT value) to 1
        phot_entry = 8 + 2 + 12 * 4
        assert payload[phot_entry] == 262 % 256
        payload[phot_entry + 8] = 1
        got = MM.decode_image(bytes(payload))
        assert got is not None
        assert np.array_equal(got[2][:, :, 0], 255 - px)

    def test_absent_bits_per_sample_is_valid_g4(self):
        """TIFF 6.0 default BitsPerSample IS 1: a bilevel G4 file that
        omits tag 258 must decode, not stub out (r4 review finding)."""
        import struct

        px = np.full((8, 16), 255, np.uint8)
        px[2:5, 3:12] = 0
        body = CC.encode_g4((px < 128).astype(np.uint8))
        entries = []

        def entry(tag, ftype, value):
            out = struct.pack("<HHI", tag, ftype, 1)
            return out + (
                struct.pack("<I", value)
                if ftype == 4
                else struct.pack("<HH", value, 0)
            )

        n = 6  # no BitsPerSample entry
        data_off = 8 + 2 + 12 * n + 4
        payload = (
            b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", n)
            + entry(256, 4, 16) + entry(257, 4, 8)
            + entry(259, 3, 4) + entry(262, 3, 0)
            + entry(273, 4, data_off) + entry(279, 4, len(body))
            + struct.pack("<I", 0) + body
        )
        got = MM.decode_image(payload)
        assert got is not None and got[3] == "tiff"
        assert np.array_equal(got[2][:, :, 0], px)
