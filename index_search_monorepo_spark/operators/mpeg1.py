"""MPEG-1 video (ISO/IEC 11172-2) full picture-type decode — from scratch.

Closes the "codec'd video frame decode" stub class with a real standard
codec: MPEG-1 elementary video streams (``.m1v``: sequence header
``00 00 01 B3`` → GOPs → pictures → slices → macroblocks → 8×8 DCT
blocks). The decoder reconstructs **all four picture types**: intra
I pictures; P pictures (forward prediction with half-pel
interpolation, §2.4.4.2 differential vector reconstruction,
skipped-macroblock copy, §2.4.4.3 non-intra coefficient
reconstruction); B pictures (bidirectional prediction against the
two straddling references with §2.4.4.5 interpolation and
repeat-previous skip semantics, decoded in coding order and emitted in
display order); and DC-only D pictures (§2.4.3.5, the standard's
cheap-preview mode). An undecodable reference poisons the chain until the
next I picture; an undecodable B loses only its own frame — nothing is
ever misdecoded. The reference pipeline treats media as opaque spans
(reference: full_text_document_generator.py builds media refs without
decoding); decode itself has no reference counterpart and follows the
public ISO/IEC 11172-2 spec.

Shares the 8×8 orthonormal IDCT basis and zig-zag order with the JPEG
module (both standards define the identical 2-D DCT-II).

Conformance strategy (mirrors jpeg_hierarchical.py, since no external
MPEG decoder exists in this container):
 (a) encoder→decoder round-trip within the quantization error bound —
     the minimal encoder here (all-intra or IPPP… with exhaustive
     motion search and a closed decoder-reconstruction loop) is the
     tests' partner;
 (b) the VLC alphabets are standard-mandated data (Annex B tables B.1,
     B.2a/b, B.3, B.4, B.5a/b and the run/level DCT table) — pinned
     prefix-free and spot-pinned against published code values in
     tests;
 (c) byte-level syntax pins: sequence/GOP/picture/slice start codes,
     12-bit geometry, the 4-bit picture-rate enum;
 (d) mismatch control (oddification of even reconstruction levels,
     §2.4.4.2) and the ±2048 clamp are applied exactly, so decoder
     output is the standard's reconstruction, not an approximation;
 (e) the pure-shift test pins that motion compensation, not residual
     coding, carries a translating scene (the P picture is a fraction
     of the I picture's bytes and still reconstructs it).
"""

from __future__ import annotations

import numpy as np

from index_search_monorepo_spark.operators.jpeg import _C, ZIGZAG, _extend

SEQ_START = 0xB3
GOP_START = 0xB8
PIC_START = 0x00
SEQ_END = 0xB7
SLICE_MIN, SLICE_MAX = 0x01, 0xAF

# §2.4.3.2 picture_rate: 4-bit enum -> frames per second (numerator,
# denominator) — NTSC rates are 1000/1001-scaled.
PICTURE_RATES = {
    1: (24000, 1001),
    2: (24, 1),
    3: (25, 1),
    4: (30000, 1001),
    5: (30, 1),
    6: (50, 1),
    7: (60000, 1001),
    8: (60, 1),
}

# §2.4.4.1 default intra quantizer matrix (raster order).
DEFAULT_INTRA_QUANT = np.array(
    [
        8, 16, 19, 22, 26, 27, 29, 34,
        16, 16, 22, 24, 27, 29, 34, 37,
        19, 22, 26, 27, 29, 34, 34, 38,
        22, 22, 26, 27, 29, 34, 37, 40,
        22, 26, 27, 29, 32, 35, 40, 48,
        26, 27, 29, 32, 35, 40, 48, 58,
        26, 27, 29, 34, 38, 46, 56, 69,
        27, 29, 35, 38, 46, 56, 69, 83,
    ],
    dtype=np.int64,
)

# Annex B.1 macroblock_address_increment (code string -> increment).
_MBA_CODES = {
    "1": 1, "011": 2, "010": 3, "0011": 4, "0010": 5,
    "00011": 6, "00010": 7, "0000111": 8, "0000110": 9,
    "00001011": 10, "00001010": 11, "00001001": 12, "00001000": 13,
    "00000111": 14, "00000110": 15,
    "0000010111": 16, "0000010110": 17, "0000010101": 18,
    "0000010100": 19, "0000010011": 20, "0000010010": 21,
    "00000100011": 22, "00000100010": 23, "00000100001": 24,
    "00000100000": 25, "00000011111": 26, "00000011110": 27,
    "00000011101": 28, "00000011100": 29, "00000011011": 30,
    "00000011010": 31, "00000011001": 32, "00000011000": 33,
}
MBA_STUFFING = "00000001111"
MBA_ESCAPE = "00000001000"

# Annex B.5a / B.5b: dct_dc_size VLCs.
_DC_LUM_CODES = {
    "100": 0, "00": 1, "01": 2, "101": 3, "110": 4,
    "1110": 5, "11110": 6, "111110": 7, "1111110": 8,
}
_DC_CHROM_CODES = {
    "00": 0, "01": 1, "10": 2, "110": 3, "1110": 4,
    "11110": 5, "111110": 6, "1111110": 7, "11111110": 8,
}

# DCT coefficient run/level VLC (Annex B.5c/d, the H.261-lineage table).
# Code string (WITHOUT the trailing sign bit) -> (run, zero-based level
# magnitude). ``10`` = EOB and ``000001`` = escape are handled in the
# decode loop, not here. ``11`` is (0,1) in the dct_coeff_next role —
# the only role intra blocks use (module docstring).
_AC_CODES = {
    "11": (0, 1),
    "011": (1, 1),
    "0100": (0, 2),
    "0101": (2, 1),
    "00101": (0, 3),
    "00111": (3, 1),
    "00110": (4, 1),
    "000110": (1, 2),
    "000111": (5, 1),
    "000101": (6, 1),
    "000100": (7, 1),
    "0000110": (0, 4),
    "0000100": (2, 2),
    "0000111": (8, 1),
    "0000101": (9, 1),
    "00100110": (0, 5),
    "00100001": (0, 6),
    "00100101": (1, 3),
    "00100100": (3, 2),
    "00100111": (10, 1),
    "00100011": (11, 1),
    "00100010": (12, 1),
    "00100000": (13, 1),
    "0000001010": (0, 7),
    "0000001100": (1, 4),
    "0000001011": (2, 3),
    "0000001111": (4, 2),
    "0000001001": (5, 2),
    "0000001110": (14, 1),
    "0000001101": (15, 1),
    "0000001000": (16, 1),
    "000000011101": (0, 8),
    "000000011000": (0, 9),
    "000000010011": (0, 10),
    "000000010000": (0, 11),
    "000000011011": (1, 5),
    "000000010100": (2, 4),
    "000000011100": (3, 3),
    "000000010010": (4, 3),
    "000000011110": (6, 2),
    "000000010101": (7, 2),
    "000000010001": (8, 2),
    "000000011111": (17, 1),
    "000000011010": (18, 1),
    "000000011001": (19, 1),
    "000000010111": (20, 1),
    "000000010110": (21, 1),
    "0000000011010": (0, 12),
    "0000000011001": (0, 13),
    "0000000011000": (0, 14),
    "0000000010111": (0, 15),
    "0000000010110": (1, 6),
    "0000000010101": (1, 7),
    "0000000010100": (2, 5),
    "0000000010011": (3, 4),
    "0000000010010": (5, 3),
    "0000000010001": (9, 2),
    "0000000010000": (10, 2),
    "0000000011111": (22, 1),
    "0000000011110": (23, 1),
    "0000000011101": (24, 1),
    "0000000011100": (25, 1),
    "0000000011011": (26, 1),
    "00000000011111": (0, 16),
    "00000000011110": (0, 17),
    "00000000011101": (0, 18),
    "00000000011100": (0, 19),
    "00000000011011": (0, 20),
    "00000000011010": (0, 21),
    "00000000011001": (0, 22),
    "00000000011000": (0, 23),
    "00000000010111": (0, 24),
    "00000000010110": (0, 25),
    "00000000010101": (0, 26),
    "00000000010100": (0, 27),
    "00000000010011": (0, 28),
    "00000000010010": (0, 29),
    "00000000010001": (0, 30),
    "00000000010000": (0, 31),
    "000000000011000": (0, 32),
    "000000000010111": (0, 33),
    "000000000010110": (0, 34),
    "000000000010101": (0, 35),
    "000000000010100": (0, 36),
    "000000000010011": (0, 37),
    "000000000010010": (0, 38),
    "000000000010001": (0, 39),
    "000000000010000": (0, 40),
    "000000000011111": (1, 8),
    "000000000011110": (1, 9),
    "000000000011101": (1, 10),
    "000000000011100": (1, 11),
    "000000000011011": (1, 12),
    "000000000011010": (1, 13),
    "000000000011001": (1, 14),
    "0000000000010011": (1, 15),
    "0000000000010010": (1, 16),
    "0000000000010001": (1, 17),
    "0000000000010000": (1, 18),
    "0000000000010100": (6, 3),
    "0000000000011010": (11, 2),
    "0000000000011001": (12, 2),
    "0000000000011000": (13, 2),
    "0000000000010111": (14, 2),
    "0000000000010110": (15, 2),
    "0000000000010101": (16, 2),
    "0000000000011111": (27, 1),
    "0000000000011110": (28, 1),
    "0000000000011101": (29, 1),
    "0000000000011100": (30, 1),
    "0000000000011011": (31, 1),
}


# Annex B.4 motion_horizontal/vertical_forward_code (H.261-lineage
# table, shared with B pictures' backward vectors). Signed: for each
# magnitude the +/- codes differ in the final bit.
_MV_CODES = {
    "1": 0,
    "010": 1, "011": -1,
    "0010": 2, "0011": -2,
    "00010": 3, "00011": -3,
    "0000110": 4, "0000111": -4,
    "00001010": 5, "00001011": -5,
    "00001000": 6, "00001001": -6,
    "00000110": 7, "00000111": -7,
    "0000010110": 8, "0000010111": -8,
    "0000010100": 9, "0000010101": -9,
    "0000010010": 10, "0000010011": -10,
    "00000100010": 11, "00000100011": -11,
    "00000100000": 12, "00000100001": -12,
    "00000011110": 13, "00000011111": -13,
    "00000011100": 14, "00000011101": -14,
    "00000011010": 15, "00000011011": -15,
    "00000011000": 16, "00000011001": -16,
}

# Annex B.3 coded_block_pattern (values 1..63; 0 cannot occur — a
# macroblock with macroblock_pattern set codes at least one block).
# Bit convention (§2.4.3.6): 32 = Y0 (top-left), 16 = Y1, 8 = Y2,
# 4 = Y3, 2 = Cb, 1 = Cr.
_CBP_CODES = {
    "111": 60,
    "1101": 4, "1100": 8, "1011": 16, "1010": 32,
    "10011": 12, "10010": 48, "10001": 20, "10000": 40,
    "01111": 28, "01110": 44, "01101": 52, "01100": 56,
    "01011": 1, "01010": 61, "01001": 2, "01000": 62,
    "001111": 24, "001110": 36, "001101": 3, "001100": 63,
    "0010111": 5, "0010110": 9, "0010101": 17, "0010100": 33,
    "0010011": 6, "0010010": 10, "0010001": 18, "0010000": 34,
    "00011111": 7, "00011110": 11, "00011101": 19, "00011100": 35,
    "00011011": 13, "00011010": 49, "00011001": 21, "00011000": 41,
    "00010111": 14, "00010110": 50, "00010101": 22, "00010100": 42,
    "00010011": 15, "00010010": 51, "00010001": 23, "00010000": 43,
    "00001111": 25, "00001110": 37, "00001101": 26, "00001100": 38,
    "00001011": 29, "00001010": 45, "00001001": 53, "00001000": 57,
    "00000111": 30, "00000110": 46, "00000101": 54, "00000100": 58,
    "000000111": 31, "000000110": 47, "000000101": 55,
    "000000100": 59,
    "000000011": 27, "000000010": 39,
}

# §2.4.4.3: the default non-intra quantizer matrix is flat 16.
DEFAULT_NON_INTRA_QUANT = np.full(64, 16, dtype=np.int64)


def _compile(codes: dict[str, object]) -> dict[tuple[int, int], object]:
    return {(len(c), int(c, 2)): v for c, v in codes.items()}


_MBA_DEC = _compile(_MBA_CODES)
_MBA_DEC[(len(MBA_STUFFING), int(MBA_STUFFING, 2))] = "stuff"
_MBA_DEC[(len(MBA_ESCAPE), int(MBA_ESCAPE, 2))] = "escape"
_DC_LUM_DEC = _compile(_DC_LUM_CODES)
_DC_CHROM_DEC = _compile(_DC_CHROM_CODES)
_AC_DEC = _compile(_AC_CODES)
_AC_DEC[(2, 0b10)] = "eob"
_AC_DEC[(6, 0b000001)] = "escape"
_MV_DEC = _compile(_MV_CODES)
_CBP_DEC = _compile(_CBP_CODES)

# §2.4.2.7 / Annex B.2b macroblock_type, P-picture alphabet.
# code -> (quant, motion_forward, coded_pattern, intra)
_P_MBTYPE_CODES = {
    "1": (0, 1, 1, 0),
    "01": (0, 0, 1, 0),
    "001": (0, 1, 0, 0),
    "00011": (0, 0, 0, 1),
    "00010": (1, 1, 1, 0),
    "00001": (1, 0, 1, 0),
    "000001": (1, 0, 0, 1),
}
_P_MBTYPE_DEC = _compile(_P_MBTYPE_CODES)

# Annex B.2c macroblock_type, B-picture alphabet.
# code -> (quant, motion_forward, motion_backward, coded_pattern, intra)
_B_MBTYPE_CODES = {
    "10": (0, 1, 1, 0, 0),
    "11": (0, 1, 1, 1, 0),
    "010": (0, 0, 1, 0, 0),
    "011": (0, 0, 1, 1, 0),
    "0010": (0, 1, 0, 0, 0),
    "0011": (0, 1, 0, 1, 0),
    "00011": (0, 0, 0, 0, 1),
    "00010": (1, 1, 1, 1, 0),
    "000011": (1, 1, 0, 1, 0),
    "000010": (1, 0, 1, 1, 0),
    "000001": (1, 0, 0, 0, 1),
}
_B_MBTYPE_DEC = _compile(_B_MBTYPE_CODES)

# encoder side: value -> (length, code-int); AC encode appends the sign
# bit itself
_MBA_ENC = {v: (len(c), int(c, 2)) for c, v in _MBA_CODES.items()}
_DC_LUM_ENC = {v: (len(c), int(c, 2)) for c, v in _DC_LUM_CODES.items()}
_DC_CHROM_ENC = {v: (len(c), int(c, 2)) for c, v in _DC_CHROM_CODES.items()}
_AC_ENC = {rl: (len(c), int(c, 2)) for c, rl in _AC_CODES.items()}
_MV_ENC = {v: (len(c), int(c, 2)) for c, v in _MV_CODES.items()}
_CBP_ENC = {v: (len(c), int(c, 2)) for c, v in _CBP_CODES.items()}
_P_MBTYPE_ENC = {v: (len(c), int(c, 2)) for c, v in _P_MBTYPE_CODES.items()}
_B_MBTYPE_ENC = {v: (len(c), int(c, 2)) for c, v in _B_MBTYPE_CODES.items()}


class _Bits:
    """MSB-first bit reader. MPEG-1 has no byte stuffing (the VLC
    alphabets are start-code-emulation-free by construction), so this is
    a plain cursor, unlike the JPEG reader's 0xFF00 unstuffer."""

    def __init__(self, data: bytes, bitpos: int = 0):
        self.data = data
        self.pos = bitpos  # absolute bit position

    def read_bit(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("truncated MPEG-1 stream")
        b = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def peek_bits(self, n: int) -> int:
        save = self.pos
        try:
            return self.read_bits(n)
        except ValueError:
            return -1
        finally:
            self.pos = save

    def byte_align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def at_start_code(self) -> bool:
        """True when the (aligned) next bits are 00 00 01 — the slice /
        macroblock loop terminator (§2.4.2.7 nextbits comparison)."""
        p = (self.pos + 7) & ~7
        byte = p >> 3
        return (
            byte + 3 <= len(self.data)
            and self.data[byte] == 0
            and self.data[byte + 1] == 0
            and self.data[byte + 2] == 1
        )


def _read_vlc(bits: _Bits, table: dict, max_len: int = 17):
    code, length = 0, 0
    while length < max_len:
        code = (code << 1) | bits.read_bit()
        length += 1
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid MPEG-1 VLC")


def _find_start_codes(payload: bytes) -> list[tuple[int, int]]:
    """All (byte_offset_of_00, code) start codes 00 00 01 xx."""
    out = []
    i = 0
    n = len(payload)
    while True:
        i = payload.find(b"\x00\x00\x01", i)
        if i < 0 or i + 3 >= n:
            return out
        out.append((i, payload[i + 3]))
        i += 3


def _parse_sequence_header(payload: bytes, off: int) -> dict:
    """off points at the 00 of 00 00 01 B3."""
    bits = _Bits(payload, (off + 4) * 8)
    width = bits.read_bits(12)
    height = bits.read_bits(12)
    aspect = bits.read_bits(4)
    rate_code = bits.read_bits(4)
    bit_rate = bits.read_bits(18)
    bits.read_bit()  # marker
    vbv = bits.read_bits(10)
    bits.read_bit()  # constrained_parameters_flag
    intra_q = DEFAULT_INTRA_QUANT
    if bits.read_bit():  # load_intra_quantizer_matrix (zig-zag order)
        zz = np.array([bits.read_bits(8) for _ in range(64)], np.int64)
        intra_q = np.zeros(64, np.int64)
        intra_q[ZIGZAG] = zz
    non_intra_q = DEFAULT_NON_INTRA_QUANT
    if bits.read_bit():  # load_non_intra_quantizer_matrix (zig-zag order)
        zz = np.array([bits.read_bits(8) for _ in range(64)], np.int64)
        non_intra_q = np.zeros(64, np.int64)
        non_intra_q[ZIGZAG] = zz
    if width == 0 or height == 0 or rate_code not in PICTURE_RATES:
        raise ValueError("bad sequence header")
    return {
        "width": width,
        "height": height,
        "aspect": aspect,
        "rate_code": rate_code,
        "bit_rate_400bps": bit_rate,
        "vbv_buffer_size": vbv,
        "intra_quant": intra_q,
        "non_intra_quant": non_intra_q,
    }


def _decode_intra_block(bits: _Bits, pred: int, qscale: int,
                        qmat_zz: np.ndarray, luma: bool) -> tuple[np.ndarray, int]:
    """One intra block: returns (64 zig-zag-order reconstructed
    coefficients, new DC predictor). §2.4.4.1 reconstruction with
    §2.4.4.2 mismatch control."""
    size = _read_vlc(bits, _DC_LUM_DEC if luma else _DC_CHROM_DEC, 9)
    diff = _extend(bits.read_bits(size), size) if size else 0
    dc = pred + diff * 8
    rec = np.zeros(64, np.int64)
    rec[0] = max(-2048, min(2047, dc))
    i = 0
    while True:
        v = _read_vlc(bits, _AC_DEC)
        if v == "eob":
            break
        if v == "escape":
            run = bits.read_bits(6)
            lev = bits.read_bits(8)
            if lev == 0b10000000:  # -256..-129 band
                lev = bits.read_bits(8) - 256
            elif lev == 0:  # 128..255 band
                lev = bits.read_bits(8)
            elif lev > 128:
                lev -= 256  # 8-bit two's complement
            if lev == 0:
                raise ValueError("escape level 0")
        else:
            run, mag = v
            lev = -mag if bits.read_bit() else mag
        i += run + 1
        if i > 63:
            raise ValueError("coefficient index past 63")
        val = (2 * lev * qscale * int(qmat_zz[i])) // 16
        if lev < 0:  # spec "/" truncates toward zero
            val = -((2 * -lev * qscale * int(qmat_zz[i])) // 16)
        if val and val % 2 == 0:  # oddification (mismatch control)
            val = val - 1 if val > 0 else val + 1
        rec[i] = max(-2048, min(2047, val))
    return rec, rec[0]


def _idct_block(zz_coefs: np.ndarray) -> np.ndarray:
    grid = np.zeros(64, np.float64)
    grid[ZIGZAG] = zz_coefs
    block = grid.reshape(8, 8)
    return _C.T @ block @ _C


def _decode_non_intra_block(bits: _Bits, qscale: int,
                            qmat_zz: np.ndarray) -> np.ndarray:
    """One non-intra (residual) block -> 64 zig-zag reconstructed
    coefficients. dct_coeff_first's '1s' = (run 0, level ±1) special
    case (Annex B.5c note), then §2.4.4.3 reconstruction
    ((2·level + sign)·qscale·Q)/16 truncating toward zero, with
    mismatch oddification and the ±2048 clamp."""
    rec = np.zeros(64, np.int64)
    i = -1
    first = True
    while True:
        if first and bits.peek_bits(1) == 1:
            bits.read_bit()
            run, lev = 0, (-1 if bits.read_bit() else 1)
        else:
            v = _read_vlc(bits, _AC_DEC)
            if v == "eob":
                if first:
                    raise ValueError("empty non-intra block")
                break
            if v == "escape":
                run = bits.read_bits(6)
                lev = bits.read_bits(8)
                if lev == 0b10000000:
                    lev = bits.read_bits(8) - 256
                elif lev == 0:
                    lev = bits.read_bits(8)
                elif lev > 128:
                    lev -= 256
                if lev == 0:
                    raise ValueError("escape level 0")
            else:
                run, mag = v
                lev = -mag if bits.read_bit() else mag
        first = False
        i += run + 1
        if i > 63:
            raise ValueError("coefficient index past 63")
        val = ((2 * abs(lev) + 1) * qscale * int(qmat_zz[i])) // 16
        if lev < 0:
            val = -val
        if val and val % 2 == 0:  # oddification (mismatch control)
            val = val - 1 if val > 0 else val + 1
        rec[i] = max(-2048, min(2047, val))
    return rec


def _decode_dc_block(bits: _Bits, pred: int, luma: bool) -> tuple:
    """One D-picture block: DC coefficient only — dct_dc_size +
    differential, no AC, no EOB (§2.4.3.5)."""
    size = _read_vlc(bits, _DC_LUM_DEC if luma else _DC_CHROM_DEC, 9)
    diff = _extend(bits.read_bits(size), size) if size else 0
    rec = np.zeros(64, np.int64)
    rec[0] = max(-2048, min(2047, pred + diff * 8))
    return rec, rec[0]


def _mc_predict(plane: np.ndarray, y0: int, x0: int, size: int,
                dy: int, dx: int) -> np.ndarray:
    """size×size forward prediction from an integer reference plane at
    (y0, x0) displaced by (dy, dx) in half-pel units. §2.4.4.4: half-pel
    values round to nearest (away from zero): (a+b+1)>>1, (a+b+c+d+2)>>2.
    Python's >> on negatives floors, matching the spec's int+half split."""
    iy, hy = dy >> 1, dy & 1
    ix, hx = dx >> 1, dx & 1
    ys, xs = y0 + iy, x0 + ix
    ph, pw = plane.shape
    if ys < 0 or xs < 0 or ys + size + hy > ph or xs + size + hx > pw:
        raise ValueError("motion vector outside reference picture")
    a = plane[ys:ys + size, xs:xs + size]
    if not hy and not hx:
        return a.copy()
    if hx and not hy:
        return (a + plane[ys:ys + size, xs + 1:xs + size + 1] + 1) >> 1
    if hy and not hx:
        return (a + plane[ys + 1:ys + size + 1, xs:xs + size] + 1) >> 1
    return (
        a
        + plane[ys:ys + size, xs + 1:xs + size + 1]
        + plane[ys + 1:ys + size + 1, xs:xs + size]
        + plane[ys + 1:ys + size + 1, xs + 1:xs + size + 1]
        + 2
    ) >> 2


def _read_motion(bits: _Bits, f: int, f_size: int, pred: list, axis: int) -> int:
    """Read one motion component (code + residual), reconstruct per
    §2.4.4.2's little/big modular arithmetic, update the predictor."""
    code = _read_vlc(bits, _MV_DEC, 11)
    if code == 0:
        little = 0
    else:
        r = bits.read_bits(f_size) if f_size else 0
        mag = (abs(code) - 1) * f + r + 1
        little = mag if code > 0 else -mag
    lo, hi = -16 * f, 16 * f - 1
    new = pred[axis] + little
    if little and not (lo <= new <= hi):
        big = little - 32 * f if little > 0 else little + 32 * f
        new = pred[axis] + big
    if not (lo <= new <= hi):
        raise ValueError("motion vector out of range")
    pred[axis] = new
    return new


def _trunc_half(v: int) -> int:
    """Spec '/' division by 2 truncating toward zero (chroma vectors)."""
    return v // 2 if v >= 0 else -((-v) // 2)


def _mb_prediction(
    refs: tuple, my: int, mx: int,
    use_f: bool, dyf: int, dxf: int,
    use_b: bool, dyb: int, dxb: int,
) -> tuple:
    """(16×16 luma, 8×8 Cb, 8×8 Cr) forward / backward / interpolated
    prediction for the macroblock at (my, mx). Interpolation rounds to
    nearest per §2.4.4.5: (fwd + bwd + 1) >> 1."""
    (fy, fcb, fcr), (by_, bcb, bcr) = refs
    parts = []
    if use_f:
        cdx, cdy = _trunc_half(dxf), _trunc_half(dyf)
        parts.append((
            _mc_predict(fy, my * 16, mx * 16, 16, dyf, dxf),
            _mc_predict(fcb, my * 8, mx * 8, 8, cdy, cdx),
            _mc_predict(fcr, my * 8, mx * 8, 8, cdy, cdx),
        ))
    if use_b:
        cdx, cdy = _trunc_half(dxb), _trunc_half(dyb)
        parts.append((
            _mc_predict(by_, my * 16, mx * 16, 16, dyb, dxb),
            _mc_predict(bcb, my * 8, mx * 8, 8, cdy, cdx),
            _mc_predict(bcr, my * 8, mx * 8, 8, cdy, cdx),
        ))
    if len(parts) == 2:
        return tuple(
            (a + b + 1) >> 1 for a, b in zip(parts[0], parts[1])
        )
    return parts[0]


def _decode_picture(payload: bytes, codes: list[tuple[int, int]],
                    k_pic: int, seq: dict,
                    fwd: tuple | None, bwd: tuple | None = None) -> tuple:
    """Decode the I, P, or B picture whose picture_start_code is
    codes[k_pic], consuming its slices up to the next non-slice start
    code. ``fwd`` is the past reference picture's (Y, Cb, Cr) integer
    planes at padded macroblock geometry (required for P and B);
    ``bwd`` is the future reference (required for B). Returns the
    reconstructed integer planes in the same shape."""
    off, _sc = codes[k_pic]
    hdr = _Bits(payload, (off + 4) * 8)
    hdr.read_bits(10)  # temporal_reference
    ptype = hdr.read_bits(3)
    hdr.read_bits(16)  # vbv_delay
    if ptype not in (1, 2, 3, 4):
        raise ValueError("unknown picture_coding_type")
    full_pel_f = full_pel_b = 0
    fwd_f, f_size = 1, 0
    bwd_f, b_size = 1, 0
    if ptype in (2, 3):
        if fwd is None:
            raise ValueError("predictive picture without a past reference")
        full_pel_f = hdr.read_bit()
        f_code = hdr.read_bits(3)
        if f_code == 0:
            raise ValueError("forward_f_code 0")
        f_size = f_code - 1
        fwd_f = 1 << f_size
    if ptype == 3:
        if bwd is None:
            raise ValueError("B picture without a future reference")
        full_pel_b = hdr.read_bit()
        b_code = hdr.read_bits(3)
        if b_code == 0:
            raise ValueError("backward_f_code 0")
        b_size = b_code - 1
        bwd_f = 1 << b_size
    w, h = seq["width"], seq["height"]
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    qmat_zz = seq["intra_quant"][ZIGZAG]
    nqmat_zz = seq["non_intra_quant"][ZIGZAG]
    refs = (fwd, bwd if bwd is not None else fwd)
    if ptype == 2:
        # skipped P macroblocks copy the reference in place
        y_plane = fwd[0].astype(np.float64)
        cb_plane = fwd[1].astype(np.float64)
        cr_plane = fwd[2].astype(np.float64)
    else:
        y_plane = np.zeros((mbh * 16, mbw * 16), np.float64)
        cb_plane = np.zeros((mbh * 8, mbw * 8), np.float64)
        cr_plane = np.zeros((mbh * 8, mbw * 8), np.float64)

    def write_pred(my: int, mx: int, pred: tuple) -> tuple:
        lum, cbp_, crp_ = pred
        y_plane[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = lum
        cb_plane[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = cbp_
        cr_plane[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = crp_
        return pred

    k = k_pic + 1
    n_slices = 0
    while k < len(codes) and SLICE_MIN <= codes[k][1] <= SLICE_MAX:
        off, sc = codes[k]
        bits = _Bits(payload, (off + 4) * 8)
        qscale = bits.read_bits(5)
        if qscale == 0:
            raise ValueError("quantizer_scale 0")
        while bits.read_bit():  # extra_bit_slice
            bits.read_bits(8)
        mb_addr = (sc - 1) * mbw - 1
        pred_y = pred_cb = pred_cr = 1024  # reset at slice start
        mvf_pred = [0, 0]  # forward (down, right), half-pel
        mvb_pred = [0, 0]  # backward (down, right), half-pel
        # previous macroblock's prediction mode+vectors (B skip repeats it)
        last_b = (True, 0, 0, False, 0, 0)
        while not bits.at_start_code():
            inc = 0
            while True:
                v = _read_vlc(bits, _MBA_DEC, 11)
                if v == "stuff":
                    continue
                if v == "escape":
                    inc += 33
                    continue
                inc += v
                break
            if inc != 1 and mb_addr >= 0:
                if ptype in (1, 4):
                    raise ValueError("skipped macroblock in I/D picture")
                if ptype == 2:
                    # §2.4.4.4 skipped P macroblocks: copy from the
                    # reference (already in the plane buffers), vector
                    # and predictors 0
                    mvf_pred[:] = [0, 0]
                else:
                    # §2.4.4.5 skipped B macroblocks: repeat the previous
                    # macroblock's prediction mode and vectors;
                    # predictors unchanged
                    for skipped in range(mb_addr + 1, mb_addr + inc):
                        smy, smx = divmod(skipped, mbw)
                        write_pred(
                            smy, smx, _mb_prediction(refs, smy, smx, *last_b)
                        )
                pred_y = pred_cb = pred_cr = 1024
            mb_addr += inc
            if mb_addr >= mbw * mbh:
                raise ValueError("macroblock address out of range")
            if ptype == 1:
                # macroblock_type, I-picture alphabet (B.2a)
                if bits.read_bit():  # '1' -> intra
                    pass
                elif bits.read_bit():  # '01' -> intra + new quantizer
                    qscale = bits.read_bits(5)
                    if qscale == 0:
                        raise ValueError("quantizer_scale 0")
                else:
                    raise ValueError("non-intra macroblock type in I picture")
                quant, mf, mb_, cbp_flag, intra = 0, 0, 0, 0, 1
            elif ptype == 4:
                # D picture (§2.4.3.5): the only macroblock_type is '1'
                if not bits.read_bit():
                    raise ValueError("bad macroblock_type in D picture")
                quant, mf, mb_, cbp_flag, intra = 0, 0, 0, 0, 1
            elif ptype == 2:
                quant, mf, cbp_flag, intra = _read_vlc(bits, _P_MBTYPE_DEC, 6)
                mb_ = 0
                if quant:
                    qscale = bits.read_bits(5)
                    if qscale == 0:
                        raise ValueError("quantizer_scale 0")
            else:
                quant, mf, mb_, cbp_flag, intra = _read_vlc(
                    bits, _B_MBTYPE_DEC, 6
                )
                if quant:
                    qscale = bits.read_bits(5)
                    if qscale == 0:
                        raise ValueError("quantizer_scale 0")
            my, mx = divmod(mb_addr, mbw)
            if intra:
                mvf_pred[:] = [0, 0]
                mvb_pred[:] = [0, 0]
                last_b = (True, 0, 0, False, 0, 0)

                def intra_block(pred: int, luma: bool) -> tuple:
                    if ptype == 4:  # DC coefficient only, no AC, no EOB
                        return _decode_dc_block(bits, pred, luma)
                    return _decode_intra_block(
                        bits, pred, qscale, qmat_zz, luma
                    )

                for blk in range(4):
                    zz, pred_y = intra_block(pred_y, True)
                    by = my * 16 + (blk // 2) * 8
                    bx = mx * 16 + (blk % 2) * 8
                    y_plane[by:by + 8, bx:bx + 8] = _idct_block(zz)
                zz, pred_cb = intra_block(pred_cb, False)
                cb_plane[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = (
                    _idct_block(zz)
                )
                zz, pred_cr = intra_block(pred_cr, False)
                cr_plane[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = (
                    _idct_block(zz)
                )
                if ptype == 4 and not bits.read_bit():
                    raise ValueError("end_of_macroblock expected")
                continue
            # non-intra: DC predictors reset (§2.4.3.7)
            pred_y = pred_cb = pred_cr = 1024
            if mf:
                dxf = _read_motion(bits, fwd_f, f_size, mvf_pred, 1)
                dyf = _read_motion(bits, fwd_f, f_size, mvf_pred, 0)
            elif ptype == 2:
                mvf_pred[:] = [0, 0]
                dxf = dyf = 0
            else:
                dxf, dyf = mvf_pred[1], mvf_pred[0]
            if mb_:
                dxb = _read_motion(bits, bwd_f, b_size, mvb_pred, 1)
                dyb = _read_motion(bits, bwd_f, b_size, mvb_pred, 0)
            else:
                dxb, dyb = mvb_pred[1], mvb_pred[0]
            if full_pel_f:
                dxf, dyf = dxf * 2, dyf * 2
            if full_pel_b:
                dxb, dyb = dxb * 2, dyb * 2
            use_f = bool(mf) or ptype == 2
            use_b = bool(mb_)
            last_b = (use_f, dyf, dxf, use_b, dyb, dxb)
            lum_pred, cb_pred, cr_pred = _mb_prediction(
                refs, my, mx, use_f, dyf, dxf, use_b, dyb, dxb
            )
            cbp = _read_vlc(bits, _CBP_DEC, 9) if cbp_flag else 0
            for blk in range(4):
                by = my * 16 + (blk // 2) * 8
                bx = mx * 16 + (blk % 2) * 8
                base = lum_pred[
                    (blk // 2) * 8:(blk // 2) * 8 + 8,
                    (blk % 2) * 8:(blk % 2) * 8 + 8,
                ].astype(np.float64)
                if cbp & (32 >> blk):
                    base = base + _idct_block(
                        _decode_non_intra_block(bits, qscale, nqmat_zz)
                    )
                y_plane[by:by + 8, bx:bx + 8] = base
            base = cb_pred.astype(np.float64)
            if cbp & 2:
                base = base + _idct_block(
                    _decode_non_intra_block(bits, qscale, nqmat_zz)
                )
            cb_plane[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = base
            base = cr_pred.astype(np.float64)
            if cbp & 1:
                base = base + _idct_block(
                    _decode_non_intra_block(bits, qscale, nqmat_zz)
                )
            cr_plane[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = base
        k += 1
        n_slices += 1
    if n_slices == 0:
        raise ValueError("picture with no slices")
    return (
        np.clip(np.round(y_plane), 0, 255).astype(np.int64),
        np.clip(np.round(cb_plane), 0, 255).astype(np.int64),
        np.clip(np.round(cr_plane), 0, 255).astype(np.int64),
    )


def _planes_to_rgb(seq: dict, planes: tuple) -> np.ndarray:
    w, h = seq["width"], seq["height"]
    y_plane, cb_plane, cr_plane = planes
    y = y_plane[:h, :w].astype(np.float64)
    cb = np.repeat(np.repeat(cb_plane, 2, 0), 2, 1)[:h, :w] - 128.0
    cr = np.repeat(np.repeat(cr_plane, 2, 0), 2, 1)[:h, :w] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.dstack([r, g, b])), 0, 255).astype(np.uint8)


def _scan(payload: bytes):
    """-> (seq dict, codes, pictures) where pictures is a list of
    (codes_index, display_ts_in_frames, picture_type)."""
    if len(payload) < 8 or payload[:4] != b"\x00\x00\x01\xb3":
        return None
    codes = _find_start_codes(payload)
    seq = _parse_sequence_header(payload, codes[0][0])
    pictures = []
    gop_base = 0  # display-order frame index of the current GOP's start
    gop_max = -1
    for k, (off, sc) in enumerate(codes):
        if sc == GOP_START:
            gop_base += gop_max + 1 if gop_max >= 0 else 0
            gop_max = -1
        elif sc == PIC_START:
            bits = _Bits(payload, (off + 4) * 8)
            temporal_ref = bits.read_bits(10)
            ptype = bits.read_bits(3)
            pictures.append((k, gop_base + temporal_ref, ptype))
            gop_max = max(gop_max, temporal_ref)
    return seq, codes, pictures


def parse_m1v(payload: bytes) -> dict | None:
    """Container-level metadata for an MPEG-1 elementary video stream,
    shaped like parse_mp4's dict (timescale = frame rate numerator,
    duration from the display-order picture count)."""
    try:
        scanned = _scan(payload)
    except ValueError:
        return None
    if scanned is None:
        return None
    seq, _codes, pictures = scanned
    num, den = PICTURE_RATES[seq["rate_code"]]
    n_frames = (max(ts for _, ts, _ in pictures) + 1) if pictures else 0
    return {
        "n_bytes": len(payload),
        "major_brand": "m1v",
        "timescale": num,
        "duration_ms": (n_frames * 1000 * den) // num if num else 0,
        "n_tracks": 1,
        "width": seq["width"],
        "height": seq["height"],
        "media_format": "m1v",
    }


def mpeg1_sample_frames(
    payload: bytes,
    every_ms: int,
    max_frames: int,
    max_total_pixels: int = 64_000_000,
) -> list[tuple[int, int, bytes]] | None:
    """REAL frame sampling for MPEG-1 video: walk pictures in CODING
    order (references must decode before the B pictures that straddle
    them), reorder to display order on emission, and emit the frame at
    or after each every_ms sample point as canonical PPM. P pictures
    motion-compensate against the previous reference; B pictures
    bidirectionally against the two surrounding references. Same
    retained-pixel cap semantics as gif/avi_sample_frames. None for
    non-MPEG-1 payloads or when no picture decodes. An undecodable
    reference poisons the chain until the next I picture; an
    undecodable B loses only its own frame. B pictures whose timestamp
    falls between sample points are never decoded at all (they are not
    references)."""
    from index_search_monorepo_spark.operators.multimodal import encode_ppm

    try:
        scanned = _scan(payload)
    except ValueError:
        return None
    if scanned is None:
        return None
    seq, codes, pictures = scanned
    num, den = PICTURE_RATES[seq["rate_code"]]
    out: list[tuple[int, int, bytes]] = []
    state = {"retained_px": 0, "next_sample": 0, "done": False}
    ref_old: tuple | None = None
    ref_new: tuple | None = None
    pending: tuple | None = None  # (ts_frames, planes) ref awaiting emission

    def emit(ts_frames: int, planes: tuple) -> None:
        if state["done"] or len(out) >= max_frames:
            state["done"] = True
            return
        ts_ms = (ts_frames * 1000 * den) // num
        if ts_ms < state["next_sample"]:
            return
        rgb = _planes_to_rgb(seq, planes)
        h, w = rgb.shape[:2]
        if state["retained_px"] + w * h > max_total_pixels:
            state["done"] = True
            return
        state["retained_px"] += w * h
        out.append((len(out), ts_ms, encode_ppm(rgb)))
        state["next_sample"] = ts_ms + every_ms
        if len(out) >= max_frames:
            state["done"] = True

    for k_pic, ts_frames, ptype in pictures:  # coding order
        if state["done"]:
            break
        if ptype == 4:
            # D pictures: standalone DC-only frames, never references
            # (and never mixed with P/B in a conformant sequence)
            try:
                planes = _decode_picture(payload, codes, k_pic, seq, None)
            except ValueError:
                continue
            if pending is not None:
                emit(*pending)
            pending = (ts_frames, planes)
        elif ptype in (1, 2):
            try:
                planes = _decode_picture(
                    payload, codes, k_pic, seq,
                    ref_new if ptype == 2 else None,
                )
            except ValueError:
                # a failed reference poisons the chain until the next I;
                # the pending (good) reference still gets its display slot
                if pending is not None:
                    emit(*pending)
                    pending = None
                ref_old = ref_new = None
                continue
            # the arriving reference closes the previous one's display
            # window (all B pictures between them have been seen)
            if pending is not None:
                emit(*pending)
            pending = (ts_frames, planes)
            ref_old, ref_new = ref_new, planes
        elif ptype == 3:
            if ref_old is None or ref_new is None:
                continue  # no straddling reference pair: skip, never guess
            ts_ms = (ts_frames * 1000 * den) // num
            if ts_ms < state["next_sample"]:
                continue  # not sampled and not a reference: skip decode
            try:
                planes = _decode_picture(
                    payload, codes, k_pic, seq, ref_old, ref_new
                )
            except ValueError:
                continue  # a failed B loses only its own frame
            emit(ts_frames, planes)
        # other ptype values (D pictures etc.): timeline only
    if pending is not None and not state["done"]:
        emit(*pending)
    return out if out else None


# ---------------------------------------------------------------------------
# minimal conformant encoder (tests' round-trip partner): all-intra,
# default quant matrix, one slice per macroblock row
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for k in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        while self.n:
            self.write(0, 1)  # zero-pad to byte boundary before start codes

    def start_code(self, sc: int) -> None:
        self.align()
        self.out += bytes((0, 0, 1, sc))


def _encode_ac(bw: _BitWriter, run: int, lev: int) -> None:
    mag = abs(lev)
    enc = _AC_ENC.get((run, mag))
    if enc is not None:
        length, code = enc
        bw.write(code, length)
        bw.write(1 if lev < 0 else 0, 1)
        return
    bw.write(0b000001, 6)  # escape
    bw.write(run, 6)
    if -127 <= lev <= 127:
        bw.write(lev & 0xFF, 8)
    elif 128 <= lev <= 255:
        bw.write(0, 8)
        bw.write(lev, 8)
    elif -255 <= lev <= -128:
        bw.write(0b10000000, 8)
        bw.write(lev + 256, 8)
    else:
        raise ValueError("level out of MPEG-1 range")


def _recon_coef(lev: int, qscale: int, q: int, intra: bool) -> int:
    """Decoder-side reconstruction of one quantized level (§2.4.4.1 /
    §2.4.4.3), shared by the encoder's closed loop."""
    mag = abs(lev)
    num = (2 * mag if intra else 2 * mag + 1) * qscale * q
    val = num // 16
    if lev < 0:
        val = -val
    if val and val % 2 == 0:
        val = val - 1 if val > 0 else val + 1
    return max(-2048, min(2047, val))


def _encode_intra_block(
    bw: _BitWriter, spatial: np.ndarray, pred: int, qscale: int,
    qmat_zz: np.ndarray, luma: bool,
) -> tuple[int, np.ndarray]:
    """Encode one intra block; returns (new DC predictor, the DECODER's
    reconstruction of the block) so the encoder reference chain is
    closed-loop — P pictures predict from what a decoder will actually
    reconstruct, not from the pristine source."""
    coefs = _C @ spatial.astype(np.float64) @ _C.T
    zz = coefs.reshape(64)[ZIGZAG]
    qdc = int(np.clip(np.round(zz[0] / 8.0), 0, 255))
    diff = qdc - pred // 8
    size = abs(diff).bit_length()
    length, code = (_DC_LUM_ENC if luma else _DC_CHROM_ENC)[size]
    bw.write(code, length)
    if size:
        bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    rec = np.zeros(64, np.int64)
    rec[0] = max(-2048, min(2047, qdc * 8))
    run = 0
    for i in range(1, 64):
        lev = int(np.clip(
            np.round(8.0 * zz[i] / (qscale * int(qmat_zz[i]))), -255, 255
        ))
        if lev == 0:
            run += 1
            continue
        _encode_ac(bw, run, lev)
        rec[i] = _recon_coef(lev, qscale, int(qmat_zz[i]), True)
        run = 0
    bw.write(0b10, 2)  # EOB
    return qdc * 8, _idct_block(rec)


def _quantize_non_intra(residual: np.ndarray, qscale: int,
                        qmat_zz: np.ndarray) -> np.ndarray:
    """Dead-zone quantization of a residual block -> 64 zig-zag levels
    (the inverse of §2.4.4.3's (2·lev+sign)·qscale·Q/16, truncating
    toward zero so near-zero noise quantizes to 0)."""
    coefs = _C @ residual.astype(np.float64) @ _C.T
    zz = coefs.reshape(64)[ZIGZAG]
    scaled = 16.0 * zz / (2.0 * qscale * qmat_zz.astype(np.float64))
    return np.clip(np.trunc(scaled), -255, 255).astype(np.int64)


def _encode_non_intra_block(bw: _BitWriter, levels: np.ndarray, qscale: int,
                            qmat_zz: np.ndarray) -> np.ndarray:
    """Write one coded non-intra block (dct_coeff_first special case for
    (0, ±1), then run/level codes, then EOB); returns the decoder's
    reconstruction of the residual."""
    rec = np.zeros(64, np.int64)
    run = 0
    first = True
    for i in range(64):
        lev = int(levels[i])
        if lev == 0:
            run += 1
            continue
        if first and run == 0 and abs(lev) == 1:
            bw.write(1, 1)  # dct_coeff_first '1'
            bw.write(1 if lev < 0 else 0, 1)
        else:
            _encode_ac(bw, run, lev)
        first = False
        rec[i] = _recon_coef(lev, qscale, int(qmat_zz[i]), False)
        run = 0
    bw.write(0b10, 2)  # EOB
    return _idct_block(rec)


def _write_mba(bw: _BitWriter, inc: int) -> None:
    while inc > 33:
        bw.write(int(MBA_ESCAPE, 2), len(MBA_ESCAPE))
        inc -= 33
    length, code = _MBA_ENC[inc]
    bw.write(code, length)


def _encode_motion(bw: _BitWriter, v: int, pred: int, f: int,
                   f_size: int) -> None:
    """Differential motion component: wrap v−pred into [−16f, 16f−1]
    (the decoder's little/big arithmetic inverts this), then
    motion_code VLC + f_size residual bits."""
    lo, hi = -16 * f, 16 * f - 1
    if not (lo <= v <= hi):
        raise ValueError("motion vector exceeds forward_f_code range")
    diff = v - pred
    if diff > hi:
        diff -= 32 * f
    elif diff < lo:
        diff += 32 * f
    if diff == 0:
        length, code = _MV_ENC[0]
        bw.write(code, length)
        return
    mag = abs(diff)
    m = (mag + f - 1) // f
    r = mag - (m - 1) * f - 1
    length, code = _MV_ENC[m if diff > 0 else -m]
    bw.write(code, length)
    if f_size:
        bw.write(r, f_size)


def _to_ycbcr(px: np.ndarray, mbh: int, mbw: int) -> tuple:
    px = np.asarray(px, np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, 2)
    f = px.astype(np.float64)
    y = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    cb = (f[:, :, 2] - y) / 1.772 + 128.0
    cr = (f[:, :, 0] - y) / 1.402 + 128.0
    y = _pad16(y, mbh * 16, mbw * 16)
    cb = _pad16(cb, mbh * 16, mbw * 16)[::2, ::2]
    cr = _pad16(cr, mbh * 16, mbw * 16)[::2, ::2]
    return y, cb, cr


def _clip_px(block: np.ndarray) -> np.ndarray:
    return np.clip(np.round(block), 0, 255).astype(np.int64)


def _encode_i_picture(bw: _BitWriter, t: int, planes: tuple, qscale: int,
                      qmat_zz: np.ndarray, mbw: int, mbh: int) -> tuple:
    y, cb, cr = planes
    ry = np.zeros_like(y, np.int64)
    rcb = np.zeros_like(cb, np.int64)
    rcr = np.zeros_like(cr, np.int64)
    bw.start_code(PIC_START)
    bw.write(t, 10)  # temporal_reference
    bw.write(1, 3)  # picture_coding_type: I
    bw.write(0xFFFF, 16)  # vbv_delay: variable
    bw.write(0, 1)  # extra_bit_picture
    for row in range(mbh):
        bw.start_code(row + 1)  # slice per MB row
        bw.write(qscale, 5)
        bw.write(0, 1)  # extra_bit_slice
        pred_y = pred_cb = pred_cr = 1024
        for col in range(mbw):
            _write_mba(bw, 1)
            bw.write(1, 1)  # macroblock_type: intra
            for blk in range(4):
                by = row * 16 + (blk // 2) * 8
                bx = col * 16 + (blk % 2) * 8
                pred_y, rec = _encode_intra_block(
                    bw, y[by:by + 8, bx:bx + 8], pred_y, qscale,
                    qmat_zz, True,
                )
                ry[by:by + 8, bx:bx + 8] = _clip_px(rec)
            pred_cb, rec = _encode_intra_block(
                bw, cb[row * 8:row * 8 + 8, col * 8:col * 8 + 8],
                pred_cb, qscale, qmat_zz, False,
            )
            rcb[row * 8:row * 8 + 8, col * 8:col * 8 + 8] = _clip_px(rec)
            pred_cr, rec = _encode_intra_block(
                bw, cr[row * 8:row * 8 + 8, col * 8:col * 8 + 8],
                pred_cr, qscale, qmat_zz, False,
            )
            rcr[row * 8:row * 8 + 8, col * 8:col * 8 + 8] = _clip_px(rec)
    return ry, rcb, rcr


def _motion_search(cur: np.ndarray, ref: np.ndarray, y0: int, x0: int,
                   window: int, half_pel: bool) -> tuple[int, int, int]:
    """Best forward vector (dy, dx) in half-pel units for the 16×16
    luma block at (y0, x0): exhaustive full-pel window, then ±1 half-pel
    refinement. Returns (dy, dx, sad)."""
    ph, pw = ref.shape
    best = (0, 0)
    zero = ref[y0:y0 + 16, x0:x0 + 16]
    best_sad = int(np.abs(cur - zero).sum())
    for fy in range(-window, window + 1):
        for fx in range(-window, window + 1):
            if fy == 0 and fx == 0:
                continue
            ys, xs = y0 + fy, x0 + fx
            if ys < 0 or xs < 0 or ys + 16 > ph or xs + 16 > pw:
                continue
            sad = int(np.abs(cur - ref[ys:ys + 16, xs:xs + 16]).sum())
            if sad < best_sad:
                best_sad, best = sad, (2 * fy, 2 * fx)
    if half_pel:
        cy, cx = best
        for ey in (-1, 0, 1):
            for ex in (-1, 0, 1):
                if ey == 0 and ex == 0:
                    continue
                try:
                    pred = _mc_predict(ref, y0, x0, 16, cy + ey, cx + ex)
                except ValueError:
                    continue
                sad = int(np.abs(cur - pred).sum())
                if sad < best_sad:
                    best_sad, best = sad, (cy + ey, cx + ex)
    return best[0], best[1], best_sad


def _encode_p_picture(
    bw: _BitWriter, t: int, planes: tuple, ref: tuple, qscale: int,
    qmat_zz: np.ndarray, nqmat_zz: np.ndarray, mbw: int, mbh: int,
    motion_window: int, half_pel: bool, f_code: int,
) -> tuple:
    y, cb, cr = planes
    ref_y, ref_cb, ref_cr = ref
    ry = ref_y.copy()
    rcb = ref_cb.copy()
    rcr = ref_cr.copy()
    f_size = f_code - 1
    fwd_f = 1 << f_size
    bw.start_code(PIC_START)
    bw.write(t, 10)  # temporal_reference
    bw.write(2, 3)  # picture_coding_type: P
    bw.write(0xFFFF, 16)  # vbv_delay: variable
    bw.write(0, 1)  # full_pel_forward_vector: half-pel units
    bw.write(f_code, 3)
    bw.write(0, 1)  # extra_bit_picture
    for row in range(mbh):
        bw.start_code(row + 1)
        bw.write(qscale, 5)
        bw.write(0, 1)  # extra_bit_slice
        pred_y = pred_cb = pred_cr = 1024
        mv_pred = [0, 0]  # (down, right)
        pending = 1  # address increment owed to the next coded MB
        for col in range(mbw):
            cur_y = y[row * 16:row * 16 + 16, col * 16:col * 16 + 16]
            dy, dx, sad = _motion_search(
                cur_y, ref_y, row * 16, col * 16, motion_window, half_pel,
            )
            # intra fallback when even the best prediction is worse than
            # the block's own activity (scene cut, occlusion)
            activity = int(np.abs(cur_y - cur_y.mean()).sum())
            if sad > max(activity, 16 * 16 * 4):
                _write_mba(bw, pending)
                pending = 1
                length, code = _P_MBTYPE_ENC[(0, 0, 0, 1)]
                bw.write(code, length)
                for blk in range(4):
                    by = row * 16 + (blk // 2) * 8
                    bx = col * 16 + (blk % 2) * 8
                    pred_y, rec = _encode_intra_block(
                        bw, y[by:by + 8, bx:bx + 8], pred_y, qscale,
                        qmat_zz, True,
                    )
                    ry[by:by + 8, bx:bx + 8] = _clip_px(rec)
                pred_cb, rec = _encode_intra_block(
                    bw, cb[row * 8:row * 8 + 8, col * 8:col * 8 + 8],
                    pred_cb, qscale, qmat_zz, False,
                )
                rcb[row * 8:row * 8 + 8, col * 8:col * 8 + 8] = _clip_px(rec)
                pred_cr, rec = _encode_intra_block(
                    bw, cr[row * 8:row * 8 + 8, col * 8:col * 8 + 8],
                    pred_cr, qscale, qmat_zz, False,
                )
                rcr[row * 8:row * 8 + 8, col * 8:col * 8 + 8] = _clip_px(rec)
                mv_pred[:] = [0, 0]
                continue
            pred_y = pred_cb = pred_cr = 1024  # non-intra MB resets DC
            lum_pred = _mc_predict(ref_y, row * 16, col * 16, 16, dy, dx)
            cdx, cdy = _trunc_half(dx), _trunc_half(dy)
            cb_pred = _mc_predict(ref_cb, row * 8, col * 8, 8, cdy, cdx)
            cr_pred = _mc_predict(ref_cr, row * 8, col * 8, 8, cdy, cdx)
            # quantize all six residual blocks up front to decide type
            lum_levels, cbp = [], 0
            for blk in range(4):
                sl = (
                    slice((blk // 2) * 8, (blk // 2) * 8 + 8),
                    slice((blk % 2) * 8, (blk % 2) * 8 + 8),
                )
                levels = _quantize_non_intra(
                    cur_y[sl] - lum_pred[sl], qscale, nqmat_zz
                )
                lum_levels.append(levels)
                if levels.any():
                    cbp |= 32 >> blk
            cb_cur = cb[row * 8:row * 8 + 8, col * 8:col * 8 + 8]
            cr_cur = cr[row * 8:row * 8 + 8, col * 8:col * 8 + 8]
            cb_levels = _quantize_non_intra(cb_cur - cb_pred, qscale, nqmat_zz)
            cr_levels = _quantize_non_intra(cr_cur - cr_pred, qscale, nqmat_zz)
            if cb_levels.any():
                cbp |= 2
            if cr_levels.any():
                cbp |= 1
            skippable = (
                cbp == 0 and dy == 0 and dx == 0
                and 0 < col < mbw - 1  # first/last MB of a slice is coded
            )
            if skippable:
                pending += 1
                mv_pred[:] = [0, 0]
                # reconstruction: reference copy, already in ry/rcb/rcr
                continue
            _write_mba(bw, pending)
            pending = 1
            mtype = (0, 1, 1, 0) if cbp else (0, 1, 0, 0)
            length, code = _P_MBTYPE_ENC[mtype]
            bw.write(code, length)
            _encode_motion(bw, dx, mv_pred[1], fwd_f, f_size)
            _encode_motion(bw, dy, mv_pred[0], fwd_f, f_size)
            mv_pred[:] = [dy, dx]
            if cbp:
                length, code = _CBP_ENC[cbp]
                bw.write(code, length)
            for blk in range(4):
                sl_abs = (
                    slice(row * 16 + (blk // 2) * 8,
                          row * 16 + (blk // 2) * 8 + 8),
                    slice(col * 16 + (blk % 2) * 8,
                          col * 16 + (blk % 2) * 8 + 8),
                )
                sl = (
                    slice((blk // 2) * 8, (blk // 2) * 8 + 8),
                    slice((blk % 2) * 8, (blk % 2) * 8 + 8),
                )
                base = lum_pred[sl].astype(np.float64)
                if cbp & (32 >> blk):
                    base = base + _encode_non_intra_block(
                        bw, lum_levels[blk], qscale, nqmat_zz
                    )
                ry[sl_abs] = _clip_px(base)
            csl = (slice(row * 8, row * 8 + 8), slice(col * 8, col * 8 + 8))
            base = cb_pred.astype(np.float64)
            if cbp & 2:
                base = base + _encode_non_intra_block(
                    bw, cb_levels, qscale, nqmat_zz
                )
            rcb[csl] = _clip_px(base)
            base = cr_pred.astype(np.float64)
            if cbp & 1:
                base = base + _encode_non_intra_block(
                    bw, cr_levels, qscale, nqmat_zz
                )
            rcr[csl] = _clip_px(base)
    return ry, rcb, rcr


def _encode_b_picture(
    bw: _BitWriter, t: int, planes: tuple, past: tuple, future: tuple,
    qscale: int, qmat_zz: np.ndarray, nqmat_zz: np.ndarray,
    mbw: int, mbh: int, motion_window: int, half_pel: bool, f_code: int,
) -> None:
    """One B picture: per macroblock, pick the cheapest of forward /
    backward / interpolated prediction by SAD (intra fallback on scene
    cuts), code the non-intra residual. B pictures are never references,
    so no reconstruction loop is needed."""
    y, cb, cr = planes
    f_size = f_code - 1
    f = 1 << f_size
    bw.start_code(PIC_START)
    bw.write(t, 10)  # temporal_reference (display index)
    bw.write(3, 3)  # picture_coding_type: B
    bw.write(0xFFFF, 16)  # vbv_delay: variable
    bw.write(0, 1)  # full_pel_forward_vector
    bw.write(f_code, 3)
    bw.write(0, 1)  # full_pel_backward_vector
    bw.write(f_code, 3)
    bw.write(0, 1)  # extra_bit_picture
    for row in range(mbh):
        bw.start_code(row + 1)
        bw.write(qscale, 5)
        bw.write(0, 1)  # extra_bit_slice
        pred_y = pred_cb = pred_cr = 1024
        mvf_pred = [0, 0]
        mvb_pred = [0, 0]
        for col in range(mbw):
            cur_y = y[row * 16:row * 16 + 16, col * 16:col * 16 + 16]
            dyf, dxf, sadf = _motion_search(
                cur_y, past[0], row * 16, col * 16, motion_window, half_pel
            )
            dyb, dxb, sadb = _motion_search(
                cur_y, future[0], row * 16, col * 16, motion_window,
                half_pel,
            )
            fwd_lum = _mc_predict(past[0], row * 16, col * 16, 16, dyf, dxf)
            bwd_lum = _mc_predict(
                future[0], row * 16, col * 16, 16, dyb, dxb
            )
            interp_lum = (fwd_lum + bwd_lum + 1) >> 1
            sadi = int(np.abs(cur_y - interp_lum).sum())
            best_sad = min(sadf, sadb, sadi)
            activity = int(np.abs(cur_y - cur_y.mean()).sum())
            if best_sad > max(activity, 16 * 16 * 4):
                _write_mba(bw, 1)
                length, code = _B_MBTYPE_ENC[(0, 0, 0, 0, 1)]
                bw.write(code, length)
                for blk in range(4):
                    by = row * 16 + (blk // 2) * 8
                    bx = col * 16 + (blk % 2) * 8
                    pred_y, _rec = _encode_intra_block(
                        bw, y[by:by + 8, bx:bx + 8], pred_y, qscale,
                        qmat_zz, True,
                    )
                pred_cb, _rec = _encode_intra_block(
                    bw, cb[row * 8:row * 8 + 8, col * 8:col * 8 + 8],
                    pred_cb, qscale, qmat_zz, False,
                )
                pred_cr, _rec = _encode_intra_block(
                    bw, cr[row * 8:row * 8 + 8, col * 8:col * 8 + 8],
                    pred_cr, qscale, qmat_zz, False,
                )
                mvf_pred[:] = [0, 0]
                mvb_pred[:] = [0, 0]
                continue
            pred_y = pred_cb = pred_cr = 1024  # non-intra MB resets DC
            if sadi <= min(sadf, sadb):
                use_f = use_b = True
            elif sadf <= sadb:
                use_f, use_b = True, False
            else:
                use_f, use_b = False, True
            refs = (past, future)
            lum_pred, cb_pred, cr_pred = _mb_prediction(
                refs, row, col, use_f, dyf, dxf, use_b, dyb, dxb
            )
            lum_levels, cbp = [], 0
            for blk in range(4):
                sl = (
                    slice((blk // 2) * 8, (blk // 2) * 8 + 8),
                    slice((blk % 2) * 8, (blk % 2) * 8 + 8),
                )
                levels = _quantize_non_intra(
                    cur_y[sl] - lum_pred[sl], qscale, nqmat_zz
                )
                lum_levels.append(levels)
                if levels.any():
                    cbp |= 32 >> blk
            cb_cur = cb[row * 8:row * 8 + 8, col * 8:col * 8 + 8]
            cr_cur = cr[row * 8:row * 8 + 8, col * 8:col * 8 + 8]
            cb_levels = _quantize_non_intra(cb_cur - cb_pred, qscale, nqmat_zz)
            cr_levels = _quantize_non_intra(cr_cur - cr_pred, qscale, nqmat_zz)
            if cb_levels.any():
                cbp |= 2
            if cr_levels.any():
                cbp |= 1
            _write_mba(bw, 1)
            mtype = (0, int(use_f), int(use_b), 1 if cbp else 0, 0)
            length, code = _B_MBTYPE_ENC[mtype]
            bw.write(code, length)
            if use_f:
                _encode_motion(bw, dxf, mvf_pred[1], f, f_size)
                _encode_motion(bw, dyf, mvf_pred[0], f, f_size)
                mvf_pred[:] = [dyf, dxf]
            if use_b:
                _encode_motion(bw, dxb, mvb_pred[1], f, f_size)
                _encode_motion(bw, dyb, mvb_pred[0], f, f_size)
                mvb_pred[:] = [dyb, dxb]
            if cbp:
                length, code = _CBP_ENC[cbp]
                bw.write(code, length)
            for blk in range(4):
                if cbp & (32 >> blk):
                    _encode_non_intra_block(
                        bw, lum_levels[blk], qscale, nqmat_zz
                    )
            if cbp & 2:
                _encode_non_intra_block(bw, cb_levels, qscale, nqmat_zz)
            if cbp & 1:
                _encode_non_intra_block(bw, cr_levels, qscale, nqmat_zz)


def encode_mpeg1(
    frames_px: list,
    fps: int = 25,
    qscale: int = 4,
    intra_every: int | None = None,
    motion_window: int = 0,
    half_pel: bool = True,
    b_frames: int = 0,
) -> bytes:
    """Minimal MPEG-1 elementary video writer: sequence header + one GOP
    + I pictures (and, when ``intra_every`` is set, motion-compensated
    P pictures between them; reference frame t is intra iff
    t % intra_every == 0). ``b_frames`` > 0 inserts that many
    bidirectionally-predicted B pictures between consecutive references
    (emitted in coding order — each reference precedes the B pictures
    that display before it; the final frame is always a reference).
    ``motion_window`` is the full-pel exhaustive-search radius;
    ``half_pel`` adds a ±1 half-pel refinement. One slice per macroblock
    row; the reference chain is closed-loop (P predicts from the
    decoder's reconstruction). Conformance partner of parse_m1v /
    mpeg1_sample_frames; geometry edge-replicated to 16-pel macroblock
    multiples like the JPEG encoder's _pad_edge."""
    rate_code = {24: 2, 25: 3, 30: 5, 50: 6, 60: 8}.get(fps, 3)
    h, w = frames_px[0].shape[:2]
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    qmat_zz = DEFAULT_INTRA_QUANT[ZIGZAG]
    nqmat_zz = DEFAULT_NON_INTRA_QUANT[ZIGZAG]
    # smallest f_code whose range ±(16f−1) half-pels covers the search
    max_d = 2 * motion_window + (1 if half_pel else 0)
    f_code = 1
    while 16 * (1 << (f_code - 1)) - 1 < max_d:
        f_code += 1
    bw = _BitWriter()
    bw.start_code(SEQ_START)
    bw.write(w, 12)
    bw.write(h, 12)
    bw.write(1, 4)  # pel_aspect_ratio: square
    bw.write(rate_code, 4)
    bw.write(0x3FFFF, 18)  # bit_rate: variable
    bw.write(1, 1)  # marker
    bw.write(0, 10)  # vbv_buffer_size
    bw.write(0, 1)  # constrained
    bw.write(0, 1)  # load_intra_quantizer_matrix: default
    bw.write(0, 1)  # load_non_intra
    bw.start_code(GOP_START)
    bw.write(0, 25)  # time_code
    bw.write(1, 1)  # closed_gop
    bw.write(0, 1)  # broken_link
    n = len(frames_px)
    ref_idx = list(range(0, n, b_frames + 1))
    if ref_idx[-1] != n - 1:
        ref_idx.append(n - 1)  # the last frame must be a reference
    past_rec: tuple | None = None
    prev_ref = None
    for r in ref_idx:
        planes = _to_ycbcr(frames_px[r], mbh, mbw)
        is_intra = (
            past_rec is None
            or intra_every is None
            or r % intra_every == 0
        )
        if is_intra:
            rec = _encode_i_picture(bw, r, planes, qscale, qmat_zz,
                                    mbw, mbh)
        else:
            rec = _encode_p_picture(
                bw, r, planes, past_rec, qscale, qmat_zz, nqmat_zz,
                mbw, mbh, motion_window, half_pel, f_code,
            )
        if prev_ref is not None:
            for t in range(prev_ref + 1, r):
                _encode_b_picture(
                    bw, t, _to_ycbcr(frames_px[t], mbh, mbw),
                    past_rec, rec, qscale, qmat_zz, nqmat_zz,
                    mbw, mbh, motion_window, half_pel, f_code,
                )
        past_rec = rec
        prev_ref = r
    bw.start_code(SEQ_END)
    return bytes(bw.out)


def encode_mpeg1_d(frames_px: list, fps: int = 25) -> bytes:
    """Minimal D-picture-only MPEG-1 writer (§2.4.3.5): every picture is
    type 4 — DC coefficients only, one slice per macroblock row, the
    mandatory '1' macroblock_type and end_of_macroblock bits. D
    sequences are the standard's cheap-preview mode; each 8×8 block
    reconstructs to its (quantized) mean. Conformance partner of the
    D branch in _decode_picture."""
    rate_code = {24: 2, 25: 3, 30: 5, 50: 6, 60: 8}.get(fps, 3)
    h, w = frames_px[0].shape[:2]
    mbw, mbh = (w + 15) // 16, (h + 15) // 16
    bw = _BitWriter()
    bw.start_code(SEQ_START)
    bw.write(w, 12)
    bw.write(h, 12)
    bw.write(1, 4)
    bw.write(rate_code, 4)
    bw.write(0x3FFFF, 18)
    bw.write(1, 1)
    bw.write(0, 10)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.start_code(GOP_START)
    bw.write(0, 25)
    bw.write(1, 1)
    bw.write(0, 1)

    def write_dc(spatial: np.ndarray, pred: int, luma: bool) -> int:
        qdc = int(np.clip(np.round(spatial.mean()), 0, 255))
        diff = qdc - pred // 8
        size = abs(diff).bit_length()
        length, code = (_DC_LUM_ENC if luma else _DC_CHROM_ENC)[size]
        bw.write(code, length)
        if size:
            bw.write(diff if diff > 0 else diff + (1 << size) - 1, size)
        return qdc * 8

    for t, px in enumerate(frames_px):
        y, cb, cr = _to_ycbcr(px, mbh, mbw)
        bw.start_code(PIC_START)
        bw.write(t, 10)
        bw.write(4, 3)  # picture_coding_type: D
        bw.write(0xFFFF, 16)
        bw.write(0, 1)  # extra_bit_picture
        for row in range(mbh):
            bw.start_code(row + 1)
            bw.write(1, 5)  # quantizer_scale (unused by DC-only blocks)
            bw.write(0, 1)
            pred_y = pred_cb = pred_cr = 1024
            for col in range(mbw):
                _write_mba(bw, 1)
                bw.write(1, 1)  # macroblock_type: the only D type
                for blk in range(4):
                    by = row * 16 + (blk // 2) * 8
                    bx = col * 16 + (blk % 2) * 8
                    pred_y = write_dc(y[by:by + 8, bx:bx + 8], pred_y, True)
                pred_cb = write_dc(
                    cb[row * 8:row * 8 + 8, col * 8:col * 8 + 8],
                    pred_cb, False,
                )
                pred_cr = write_dc(
                    cr[row * 8:row * 8 + 8, col * 8:col * 8 + 8],
                    pred_cr, False,
                )
                bw.write(1, 1)  # end_of_macroblock
    bw.start_code(SEQ_END)
    return bytes(bw.out)


def _pad16(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = p.shape
    pad = np.zeros((ph, pw))
    pad[:h, :w] = p
    if h < ph:
        pad[h:, :w] = p[h - 1:h, :]
    if w < pw:
        pad[:, w:] = pad[:, w - 1:w]
    return pad
