"""Baseline JPEG (ITU-T T.81 / JFIF) decode in numpy + stdlib — no PIL.

Supports the format the reference corpus would actually contain (scanned
page images): baseline sequential DCT, 8-bit, grayscale or YCbCr with
4:4:4 / 4:2:2 / 4:2:0 sampling, optional restart intervals. Huffman
progressive (SOF2) streams are handled by the sibling module
operators/jpeg_progressive.py; arithmetic-coded and 12-bit streams
return None (the multimodal stub fallback) rather than mis-decoding.

Why hand-rolled: the container has no codec libraries, and the engine's
multimodal contract (operators/multimodal.py) wants REAL width/height/
pixels for as many payload formats as stdlib allows. A JPEG decoder is
Huffman tables + dequantization + IDCT + color transform — all exact,
deterministic math; the IDCT is one 8x8 orthonormal basis matrix applied
with two matmuls per block (vectorized across all blocks of a component).

`encode_baseline` exists for tests: a minimal conformant encoder
(forward DCT, Annex-K standard Huffman tables, flat quant table) whose
output round-trips through the decoder within rounding tolerance — and
through any external spec-compliant decoder, which is what makes the
round-trip a real conformance check rather than a mirror of decoder bugs.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# zig-zag scan order: index -> (row, col) flattened position
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)


def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis C: coefficients = C @ x @ C.T,
    spatial = C.T @ X @ C."""
    c = np.zeros((8, 8))
    for k in range(8):
        scale = math.sqrt(1 / 8) if k == 0 else math.sqrt(2 / 8)
        for i in range(8):
            c[k, i] = scale * math.cos((2 * i + 1) * k * math.pi / 16)
    return c


_C = _dct_basis()

# Annex K.3 standard Huffman table specs: (bits[1..16], huffval)
_STD_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_STD_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _build_decode_table(bits: list[int], huffval: list[int]) -> dict:
    """T.81 C.2: canonical code assignment -> {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], huffval: list[int]) -> dict:
    return {
        sym: (length, code)
        for (length, code), sym in _build_decode_table(bits, huffval).items()
    }


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    raises _Marker at RST/other markers."""

    class Marker(Exception):
        def __init__(self, marker: int):
            self.marker = marker

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated after 0xFF")
            b2 = self.data[self.pos]
            if b2 == 0x00:
                self.pos += 1
            else:
                self.pos += 1
                raise _BitReader.Marker(b2)
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.n = 0
        self.acc = 0


def _decode_huff(br: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map magnitude bits to signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_baseline(payload: bytes):  # noqa: C901 - marker machine
    """-> (width, height, rgb ndarray) or None if not baseline-decodable."""
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    try:
        while pos + 4 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9:  # EOI before SOS
                return None
            seglen = int.from_bytes(payload[pos + 2 : pos + 4], "big")
            seg = payload[pos + 4 : pos + 2 + seglen]
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0x0F
                    if pq != 0:
                        return None  # 16-bit tables: not baseline-8
                    qt[tq] = np.frombuffer(
                        seg[i + 1 : i + 65], np.uint8
                    ).astype(np.int32)
                    i += 65
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0x0F
                    bits = list(seg[i + 1 : i + 17])
                    n = sum(bits)
                    huffval = list(seg[i + 17 : i + 17 + n])
                    table = _build_decode_table(bits, huffval)
                    (dc_tables if tc == 0 else ac_tables)[th] = table
                    i += 17 + n
            elif marker == 0xC0:  # SOF0 baseline
                precision = seg[0]
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
                nc = seg[5]
                if precision != 8 or nc not in (1, 3):
                    return None
                comps = []
                for k in range(nc):
                    cid, hv, tq = seg[6 + 3 * k : 9 + 3 * k]
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                    )
                frame = {"w": w, "h": h, "comps": comps}
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # progressive / arithmetic / differential
            elif marker == 0xDE:
                # DHP: a hierarchical stream's FIRST frame is a plain SOF0
                # at reduced resolution — decoding it here would silently
                # return the low-res pyramid base instead of routing to
                # jpeg_hierarchical.decode_hierarchical
                return None
            elif marker == 0xDD:  # DRI
                restart_interval = int.from_bytes(seg[0:2], "big")
            elif marker == 0xDA:  # SOS — decode the scan
                if frame is None:
                    return None
                ns = seg[0]
                if ns != len(frame["comps"]):
                    # Non-interleaved baseline (per-component scans): this
                    # decoder handles only the single interleaved scan, and
                    # decoding just the first scan would mis-shape MCUs and
                    # return a Y-only image as grayscale. Contract is
                    # "return None rather than mis-decode" -> stub fallback.
                    return None
                scan = []
                for k in range(ns):
                    cs, tables = seg[1 + 2 * k], seg[2 + 2 * k]
                    comp = next(
                        c for c in frame["comps"] if c["id"] == cs
                    )
                    scan.append(
                        {**comp, "dc": tables >> 4, "ac": tables & 0x0F}
                    )
                return _decode_scan(
                    payload,
                    pos + 2 + seglen,
                    frame,
                    scan,
                    qt,
                    dc_tables,
                    ac_tables,
                    restart_interval,
                )
            pos += 2 + seglen
    except (ValueError, IndexError, StopIteration, KeyError,
            _BitReader.Marker):
        # malformed stream / unexpected marker -> stub fallback, never raise
        return None
    return None


def _decode_scan(
    payload, pos, frame, scan, qt, dc_tables, ac_tables, restart_interval
):
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    planes = {}
    coefs = {}
    for c in scan:
        pw, ph = mcus_x * c["h"] * 8, mcus_y * c["v"] * 8
        planes[c["id"]] = (pw, ph)
        coefs[c["id"]] = np.zeros(
            (mcus_y * c["v"], mcus_x * c["h"], 64), np.int32
        )

    br = _BitReader(payload, pos)
    pred = {c["id"]: 0 for c in scan}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # drop byte-boundary padding bits, consume the RSTn marker
                # bytes directly, reset DC predictors (T.81 F.2.1.3)
                br.align()
                if (
                    br.pos + 2 > len(br.data)
                    or br.data[br.pos] != 0xFF
                    or not 0xD0 <= br.data[br.pos + 1] <= 0xD7
                ):
                    raise ValueError("expected restart marker")
                br.pos += 2
                pred = {c["id"]: 0 for c in scan}
            for c in scan:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = np.zeros(64, np.int32)
                        t = _decode_huff(br, dc_tables[c["dc"]])
                        diff = _extend(br.read_bits(t), t)
                        pred[c["id"]] += diff
                        block[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, ac_tables[c["ac"]])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC overrun")
                            block[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coefs[c["id"]][
                            my * c["v"] + by, mx * c["h"] + bx
                        ] = block
            mcu_count += 1

    # dequantize + vectorized IDCT per component
    out_planes = {}
    for c in scan:
        q = qt[c["tq"]]
        cf = coefs[c["id"]].reshape(-1, 64) * q[None, :]
        grid = np.zeros((cf.shape[0], 64), np.float64)
        grid[:, ZIGZAG] = cf  # un-zigzag
        blocks = grid.reshape(-1, 8, 8)
        spatial = np.einsum("ki,nkl,lj->nij", _C, blocks, _C)
        spatial = np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)
        by, bxn = coefs[c["id"]].shape[:2]
        plane = (
            spatial.reshape(by, bxn, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bxn * 8)
        )
        # upsample to full MCU-grid resolution by replication
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes[c["id"]] = plane[: mcus_y * mcu_h, : mcus_x * mcu_w]

    ids = [c["id"] for c in scan]
    if len(ids) == 1:
        gray = out_planes[ids[0]][:h, :w]
        return w, h, np.ascontiguousarray(np.repeat(gray[:, :, None], 3, 2))
    y = out_planes[ids[0]][:h, :w].astype(np.float64)
    cb = out_planes[ids[1]][:h, :w].astype(np.float64) - 128.0
    cr = out_planes[ids[2]][:h, :w].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.clip(np.round(np.dstack([r, g, b])), 0, 255).astype(np.uint8)
    return w, h, rgb


# ---------------------------------------------------------------------------
# minimal conformant encoder (tests): baseline, 4:4:4 or grayscale,
# standard Annex-K Huffman tables, caller-supplied flat quant value
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
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1-bits per spec


def _encode_block(bw, block, dc_tab, ac_tab, pred):
    zz = block.reshape(64)[ZIGZAG]
    diff = int(zz[0]) - pred
    t = int(diff).bit_length() if diff != 0 else 0
    length, code = dc_tab[t]
    bw.write(code, length)
    if t:
        v = diff if diff > 0 else diff + (1 << t) - 1
        bw.write(v, t)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_tab[0xF0]
            bw.write(code, length)
            run -= 16
        s = abs(v).bit_length()
        length, code = ac_tab[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        length, code = ac_tab[0x00]
        bw.write(code, length)
    return int(zz[0])


def _pad_edge(p: np.ndarray, ph: int, pw: int) -> np.ndarray:
    h, w = p.shape
    pad = np.zeros((ph, pw))
    pad[:h, :w] = p
    pad[h:, :w] = p[h - 1 : h, :]  # edge-replicate padding
    pad[:, w:] = pad[:, w - 1 : w]
    return pad


def encode_baseline(
    px: np.ndarray,
    quant: int = 1,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline JPEG encoder: (H, W) grayscale or (H, W, 3) RGB as
    YCbCr 4:4:4 or 4:2:0; one flat quant table; standard Huffman tables;
    optional DRI/RSTn restart intervals (in MCUs)."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64) - 128.0]
        samp = [(1, 1)]
    else:
        rgb = px.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128
        cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128
        if subsampling == "420":
            eh, ew = (h + 1) & ~1, (w + 1) & ~1
            cbp = _pad_edge(cb, eh, ew)
            crp = _pad_edge(cr, eh, ew)
            cb = cbp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]

    hmax = max(sh for sh, _sv in samp)
    vmax = max(sv for _sh, sv in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        padded.append(_pad_edge(p, mcus_y * sv * 8, mcus_x * sh * 8))

    qtab = np.full(64, quant, np.int32)
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (one table; the zigzag order of a flat table is itself)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    out += bytes(qtab.astype(np.uint8))
    nc = 1 if gray else 3
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for k in range(nc):
        sh, sv = samp[k]
        sof += bytes([k + 1, (sh << 4) | sv, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC/AC lum (+ chrom)
    specs = [(0x00, _STD_DC_LUM), (0x10, _STD_AC_LUM)]
    if not gray:
        specs += [(0x01, _STD_DC_CHROM), (0x11, _STD_AC_CHROM)]
    for tid, (bits, huffval) in specs:
        body = bytes([tid]) + bytes(bits) + bytes(huffval)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([nc])
    for k in range(nc):
        sos += bytes([k + 1, 0x00 if k == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_lum = _build_encode_table(*_STD_DC_LUM)
    ac_lum = _build_encode_table(*_STD_AC_LUM)
    dc_chr = _build_encode_table(*_STD_DC_CHROM)
    ac_chr = _build_encode_table(*_STD_AC_CHROM)
    bw = _BitWriter()
    preds = [0] * nc
    mcu_count = 0
    rst_no = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst_no % 8])
                rst_no += 1
                preds = [0] * nc
            for ci in range(nc):
                sh, sv = samp[ci]
                for by in range(sv):
                    for bx in range(sh):
                        r0 = (my * sv + by) * 8
                        c0 = (mx * sh + bx) * 8
                        blk = padded[ci][r0 : r0 + 8, c0 : c0 + 8]
                        coef = _C @ blk @ _C.T
                        q = np.round(coef / quant).astype(np.int32)
                        dc_t, ac_t = (
                            (dc_lum, ac_lum) if ci == 0 else (dc_chr, ac_chr)
                        )
                        preds[ci] = _encode_block(bw, q, dc_t, ac_t, preds[ci])
            mcu_count += 1
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
