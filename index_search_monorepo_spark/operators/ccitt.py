"""CCITT Group 4 (ITU-T T.6, MMR) bitonal codec in stdlib + numpy.

Scanned-book archives store bitonal page masters as G4-compressed TIFF
(compression 4) — the single most common archival format for OCR'd page
images, so a page-scan multimodal pipeline needs the real decode, not a
stub. T.6 is pure 2D coding: every row is coded against the previous
(reference) row via pass / vertical(-3..3) / horizontal modes; horizontal
mode falls back to the T.4 modified-Huffman run-length alphabet (white
and black terminating codes 0..63 + makeup codes 64..2560).

`decode_g4(data, width, height)` -> (height, width) uint8 mask with 1 =
black, or None on malformed input; `encode_g4(mask)` is the conformance
round-trip partner (same role as jpeg.encode_baseline). The code tables
are typed in from the public standard; tests assert prefix-freeness and
alphabet completeness of every table (a mistyped code that breaks the
prefix property is caught; encoder and decoder share one table source so
the tables are also exactly what the TIFF fixtures carry).

TIFF integration lives in operators/multimodal.py (_parse_tiff,
compression 4, 1-bit samples, both photometric polarities).
"""

from __future__ import annotations

import numpy as np

# --- T.4 modified-Huffman run-length alphabets ------------------------------
# (run_length, code_string) — code strings are MSB-first bit literals.

_WHITE_TERM = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}

_WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100", 768: "011001101",
    832: "011010010", 896: "011010011", 960: "011010100",
    1024: "011010101", 1088: "011010110", 1152: "011010111",
    1216: "011011000", 1280: "011011001", 1344: "011011010",
    1408: "011011011", 1472: "010011000", 1536: "010011001",
    1600: "010011010", 1664: "011000", 1728: "010011011",
}

_BLACK_TERM = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
}

_BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# extended makeup codes (T.4 §2, shared by both colours)
_EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# T.6 2D mode codes
_MODES = {
    "1": "V0", "011": "VR1", "000011": "VR2", "0000011": "VR3",
    "010": "VL1", "000010": "VL2", "0000010": "VL3",
    "001": "H", "0001": "P",
}

_EOFB = "000000000001" * 2


def _decode_table(spec: dict[int, str]) -> dict[tuple[int, int], int]:
    return {(len(c), int(c, 2)): run for run, c in spec.items()}


_WHITE_DEC = _decode_table({**_WHITE_TERM, **_WHITE_MAKEUP, **_EXT_MAKEUP})
_BLACK_DEC = _decode_table({**_BLACK_TERM, **_BLACK_MAKEUP, **_EXT_MAKEUP})
_MODE_DEC = {(len(c), int(c, 2)): m for c, m in _MODES.items()}


class _Bits:
    """Plain MSB-first bit reader (no byte stuffing, unlike JPEG's)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self) -> int:
        byte = self.pos >> 3
        if byte >= len(self.data):
            raise ValueError("truncated G4 stream")
        bit = (self.data[byte] >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit


def _read_code(bits: _Bits, table: dict, max_len: int) -> object:
    code, length = 0, 0
    while length < max_len:
        code = (code << 1) | bits.read()
        length += 1
        v = table.get((length, code))
        if v is not None:
            return v
    raise ValueError("invalid G4 code")


def _read_run(bits: _Bits, white: bool) -> int:
    """One complete run: zero or more makeup codes then a terminating
    code (< 64)."""
    total = 0
    table = _WHITE_DEC if white else _BLACK_DEC
    while True:
        r = _read_code(bits, table, 14)
        total += r
        if r < 64:
            return total


def _transitions(row: np.ndarray) -> list[int]:
    """Positions where the colour changes (first element = start of the
    first black run), with two end-of-row sentinels."""
    w = row.shape[0]
    diff = np.nonzero(row[1:] != row[:-1])[0] + 1
    out = list(diff)
    if w and row[0] == 1:
        out.insert(0, 0)
    out += [w, w]
    return out


def decode_g4(data: bytes, width: int, height: int) -> np.ndarray | None:
    """T.6 MMR decode -> (height, width) uint8, 1 = black; None on any
    malformed structure (the errors-are-rows stub boundary)."""
    if width <= 0 or height <= 0 or width * height > 64_000_000:
        return None
    bits = _Bits(data)
    out = np.zeros((height, width), np.uint8)
    ref = [width, width]  # imaginary all-white reference line
    try:
        for y in range(height):
            row = out[y]
            a0 = 0
            color = 0  # 0 = white, 1 = black
            first = True
            i = 0  # monotone pointer into ref (a0 only moves right)
            while a0 < width:
                # b1: first ref transition > a0 (>= a0 for the imaginary
                # start) with the opposite colour to a0's run
                start = a0 if first else a0 + 1
                while i < len(ref) and ref[i] < start:
                    i += 1
                # transition parity: ref[even] starts black, ref[odd]
                # starts white; we need a transition TO !color
                j = i + 1 if (i & 1) != color else i
                b1 = ref[j] if j < len(ref) else width
                b2 = ref[j + 1] if j + 1 < len(ref) else width
                mode = _read_code(bits, _MODE_DEC, 7)
                if mode == "P":
                    if color:
                        row[a0:b2] = 1
                    a0 = b2
                    first = False
                    continue
                if mode == "H":
                    r1 = _read_run(bits, white=color == 0)
                    r2 = _read_run(bits, white=color == 1)
                    a1 = a0 + r1
                    a2 = a1 + r2
                    if a2 > width or a1 > width:
                        raise ValueError("H overrun")
                    if color:
                        row[a0:a1] = 1
                    else:
                        row[a1:a2] = 1
                    a0 = a2
                    first = False
                    continue
                delta = {"V0": 0, "VR1": 1, "VR2": 2, "VR3": 3,
                         "VL1": -1, "VL2": -2, "VL3": -3}[mode]
                a1 = b1 + delta
                if a1 < a0 or a1 > width:
                    raise ValueError("vertical out of range")
                if color:
                    row[a0:a1] = 1
                a0 = a1
                color ^= 1
                first = False
            ref = _transitions(row)
    except (ValueError, IndexError):
        return None
    return out


class _BitW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write_code(self, code: str) -> None:
        for ch in code:
            self.acc = (self.acc << 1) | (ch == "1")
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc << (8 - self.n))
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _write_run(bw: _BitW, run: int, white: bool) -> None:
    term = _WHITE_TERM if white else _BLACK_TERM
    makeup = {**(_WHITE_MAKEUP if white else _BLACK_MAKEUP), **_EXT_MAKEUP}
    while run >= 64:
        m = min(2560, (run // 64) * 64)
        bw.write_code(makeup[m])
        run -= m
    bw.write_code(term[run])


def encode_g4(mask: np.ndarray) -> bytes:
    """T.6 MMR encode of a (h, w) 0/1 mask — conformance round-trip
    partner of decode_g4; chooses vertical mode when |a1-b1| <= 3, else
    pass/horizontal, exactly per the standard's coding flow."""
    mask = (np.asarray(mask) != 0).astype(np.uint8)
    h, w = mask.shape
    bw = _BitW()
    ref = [w, w]
    for y in range(h):
        row = mask[y]
        cur = _transitions(row)
        a0 = 0
        color = 0
        first = True
        while a0 < w:
            start = a0 if first else a0 + 1
            # a1: next coding-line transition with parity == colour (the
            # end of the current run); a2: the transition right after it
            ja = next(
                (
                    k
                    for k in range(len(cur))
                    if cur[k] >= start and (k & 1) == color
                ),
                None,
            )
            a1 = cur[ja] if ja is not None else w
            # b1/b2 on the reference line, same parity rule
            jb = next(
                (
                    k
                    for k in range(len(ref))
                    if ref[k] >= start and (k & 1) == color
                ),
                None,
            )
            b1 = ref[jb] if jb is not None else w
            b2 = ref[jb + 1] if jb is not None and jb + 1 < len(ref) else w
            if b2 < a1:
                bw.write_code("0001")  # pass
                a0 = b2
                first = False
                continue
            if abs(a1 - b1) <= 3:
                bw.write_code(
                    {0: "1", 1: "011", 2: "000011", 3: "0000011",
                     -1: "010", -2: "000010", -3: "0000010"}[a1 - b1]
                )
                a0 = a1
                color ^= 1
                first = False
                continue
            # horizontal: two runs starting at a0
            a2 = min(
                cur[ja + 1] if ja is not None and ja + 1 < len(cur) else w, w
            )
            bw.write_code("001")
            _write_run(bw, a1 - a0, white=color == 0)
            _write_run(bw, a2 - a1, white=color == 1)
            a0 = a2
            first = False
        ref = cur
    bw.write_code(_EOFB)
    return bw.flush()
