"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The engine treats image/audio/video as `binary` columns with a typed
metadata struct. Raster formats PPM P6, 24/32-bit BMP, TIFF (II/MM,
strip assembly; uncompressed, deflate, LZW, PackBits, CCITT G4 bitonal
via operators/ccitt.py, and single-strip JPEG-in-TIFF), PNG (8-bit
gray/RGB/RGBA incl. Adam7 — stdlib zlib inflate + numpy filter
reconstruction), GIF (87a/89a incl. animation — spec LZW decoder, palette
expansion, deinterlace, frame composition with transparency/disposal),
baseline JPEG (operators/jpeg.py: Huffman + dequant + vectorized IDCT +
YCbCr, 4:4:4/4:2:0, restart intervals), progressive JPEG
(operators/jpeg_progressive.py: full T.81 Annex-G spectral selection +
successive approximation) AND arithmetic-coded JPEG — sequential SOF9
and progressive SOF10 (operators/jpeg_arith.py: T.81 Annex-D QM coder +
Annex-F/G.2 statistical models) — are decoded FOR REAL, no PIL needed:
header parse, pixel grid, nearest-neighbor resize. Payloads that
genuinely need external libs (H.26x-family codec'd video) fall back to a
deterministic fake
clearly marked as a stub; MJPEG-AVI video frames decode for real through
the repo's own JPEG decoders (parse_avi/avi_sample_frames), and MPEG-1
elementary video I- AND P-pictures decode for real from scratch
(operators/mpeg1.py: ISO/IEC 11172-2 Annex-B VLC alphabets, intra
reconstruction with mismatch control, half-pel motion compensation with
differential vector reconstruction — frame sampling via
mpeg1_sample_frames; B pictures are timeline-skipped, never misdecoded). Everything Spark-side is real and tested either way:
schema, Arrow batch shape, `mapInPandas` iterator protocol,
partition-parallel execution, and the metadata contract the downstream
pipeline consumes.

At 100 TB the binary payloads dominate I/O: the plan reads them exactly once
(`mapInPandas` directly over the scan, no shuffle), and nested-column
pruning means metadata-only queries never deserialize the payload bytes.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# real numpy decode for these; everything else hits the stub fallback
REAL_FORMATS = frozenset({"ppm", "bmp", "tiff", "png", "gif", "jpg"})
DECODE_IS_STUB = True  # still true for H.26x-family codec'd video (no
# ffmpeg); every JPEG entropy coder and mode (Huffman baseline/
# progressive, QM sequential- and progressive-arithmetic, Annex-J
# hierarchical), MJPEG-AVI frames, and every MPEG-1 picture type
# (I/P/B/D) decode for real

MEDIA_META_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long, media_format string"
)


def _parse_ppm(payload: bytes) -> tuple[int, int, np.ndarray] | None:
    """Binary PPM (P6): 'P6' <w> <h> <maxval> then raw RGB rows.
    Header tokens are whitespace-separated with '#' comments."""
    if not payload.startswith(b"P6"):
        return None
    pos, tokens = 2, []
    while len(tokens) < 3 and pos < len(payload):
        c = payload[pos : pos + 1]
        if c == b"#":
            pos = payload.find(b"\n", pos)
            if pos < 0:
                return None
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(payload) and not payload[end : end + 1].isspace():
                end += 1
            tokens.append(payload[pos:end])
            pos = end
    if len(tokens) < 3:
        return None
    try:
        w, h, maxval = (int(t) for t in tokens)
    except ValueError:
        return None
    pos += 1  # the single whitespace byte after maxval
    if maxval > 255 or w <= 0 or h <= 0 or len(payload) < pos + w * h * 3:
        return None
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return w, h, px.reshape(h, w, 3)


def _parse_bmp(payload: bytes) -> tuple[int, int, np.ndarray] | None:
    """Uncompressed 24/32-bit BMP (BITMAPINFOHEADER), bottom-up rows with
    4-byte row padding."""
    if not payload.startswith(b"BM") or len(payload) < 54:
        return None
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if compression != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        return None
    nch = bpp // 8
    bottom_up, h = h > 0, abs(h)
    stride = (w * nch + 3) & ~3
    if len(payload) < off + stride * h:
        return None
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if bottom_up:
        rows = rows[::-1]
    # BGR(A) -> RGB
    return w, h, rows[:, :, 2::-1][:, :, :3]


def _tiff_lzw_decode(data: bytes, max_out: int) -> bytearray | None:
    """TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing, 8-bit
    symbols with fixed codes 256=ClearCode / 257=EOI, initial width 9,
    width grows at table sizes 511/1023/2047 (the decoder's 2^w - 1
    'early change' boundary; the one-ahead encoder bumps at 2^w), max 12 bits. Output capped at
    max_out (+ detection of oversize) so hostile streams stay bounded.
    Differs from the GIF variant (_gif_lzw_decode) in bit order, fixed
    symbol width, and the early-change growth points."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset() -> int:
        table.clear()
        table.extend(bytes([i]) for i in range(256))
        table.append(b"")  # clear
        table.append(b"")  # eoi
        return 9

    width = reset()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                width = reset()
                prev = None
                continue
            if code == EOI:
                return out
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                return None
            out.extend(entry)
            if len(out) > max_out:
                return None
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            # early change: width bumps one code EARLY (at len==2^w - 1)
            if len(table) >= (1 << width) - 1 and width < 12:
                width += 1
            prev = entry
    return out


def _packbits_decode(data: bytes, max_out: int) -> bytearray | None:
    """TIFF PackBits RLE (TIFF 6.0 §9 / Apple PackBits): n in 0..127 ->
    copy n+1 literal bytes; n in 129..255 (signed -1..-127) -> repeat the
    next byte 257-n times; n == 128 is a no-op. Output capped at
    max_out."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < max_out:
        n = data[i]
        i += 1
        if n == 128:
            continue
        if n < 128:
            chunk = data[i : i + n + 1]
            if len(chunk) < n + 1:
                return None
            out += chunk
            i += n + 1
        else:
            if i >= len(data):
                return None
            out += bytes([data[i]]) * (257 - n)
            i += 1
        if len(out) > max_out:
            return None
    return out


def _parse_tiff(payload: bytes) -> tuple[int, int, np.ndarray] | None:
    """REAL baseline TIFF decode (the format page-scanning pipelines emit):
    II/MM byte orders, IFD walk, strip assembly — 8-bit grayscale (both
    photometric polarities) and RGB(A); uncompressed, deflate (8 'Adobe
    deflate' / legacy 32946, per-strip zlib inflate), LZW (5, MSB-first
    early-change variant), or PackBits (32773) — every decompressor
    capped at the declared pixel size; horizontal-differencing
    predictor 2 supported. CCITT Group 4 bitonal (compression 4,
    operators/ccitt.py) and single-strip new-style JPEG-in-TIFF
    (compression 7, incl. JPEGTables) decode via their own branches;
    remaining codecs (G3, old-style JPEG) return None (stub
    fallback)."""
    if len(payload) < 8:
        return None
    if payload[:4] == b"II*\x00":
        bo = "little"
    elif payload[:4] == b"MM\x00*":
        bo = "big"
    else:
        return None

    def u(b: bytes) -> int:
        return int.from_bytes(b, bo)

    ifd = u(payload[4:8])
    if ifd + 2 > len(payload):
        return None
    n_entries = u(payload[ifd : ifd + 2])
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        e = ifd + 2 + 12 * k
        if e + 12 > len(payload):
            return None
        tag = u(payload[e : e + 2])
        ftype = u(payload[e + 2 : e + 4])
        count = u(payload[e + 4 : e + 8])
        size = {1: 1, 3: 2, 4: 4, 7: 1}.get(ftype)  # 7 = UNDEFINED (bytes)
        if size is None:
            continue  # rational/ascii tags are irrelevant here
        total = size * count
        if total <= 4:
            raw = payload[e + 8 : e + 8 + total]
        else:
            off = u(payload[e + 8 : e + 12])
            if off + total > len(payload):
                return None
            raw = payload[off : off + total]
        tags[tag] = [u(raw[i * size : (i + 1) * size]) for i in range(count)]

    def one(tag: int, default: int | None = None) -> int | None:
        v = tags.get(tag)
        return v[0] if v else default

    w = one(256)
    h = one(257)
    compression = one(259, 1)
    photometric = one(262, 1)
    offsets = tags.get(273)
    spp = one(277, 1)
    counts = tags.get(279)
    bits_tag = tags.get(258)  # TIFF default is 1 (bilevel); 8-bit paths
    bits = bits_tag if bits_tag is not None else [8]  # below assume 8
    predictor = one(317, 1)
    if (
        compression == 4
        and offsets
        and counts
        # spec default BitsPerSample IS 1, so an absent tag is valid G4
        and (bits_tag is None or list(bits_tag) == [1])
        and spp == 1
        and photometric in (0, 1)
    ):
        # CCITT Group 4 bitonal (the archival page-scan codec): single
        # strip, T.6 MMR decode to a black mask, then photometric map
        if len(offsets) != 1 or w is None or h is None:
            return None
        from index_search_monorepo_spark.operators.ccitt import decode_g4

        mask = decode_g4(payload[offsets[0] : offsets[0] + counts[0]], w, h)
        if mask is None:
            return None
        if photometric == 0:  # MinIsWhite: black pixels -> 0
            gray = np.where(mask == 1, 0, 255).astype(np.uint8)
        else:
            gray = np.where(mask == 1, 255, 0).astype(np.uint8)
        return w, h, np.ascontiguousarray(np.repeat(gray[:, :, None], 3, 2))
    if compression == 7 and offsets and counts:
        # New-style JPEG-in-TIFF (TTN2): the single strip/tile is a
        # complete JFIF bitstream; shared tables may ride in JPEGTables
        # (tag 347) as SOI..EOI whose segments belong before the strip's
        # SOS. Single-strip only — the common whole-page-scan layout.
        if len(offsets) != 1:
            return None
        strip = payload[offsets[0] : offsets[0] + counts[0]]
        if strip[:2] != b"\xff\xd8":
            return None
        jt = tags.get(347)
        if jt is not None:
            jtb = bytes(jt)  # stored as BYTE array values
            if jtb[:2] == b"\xff\xd8" and jtb[-2:] == b"\xff\xd9":
                strip = jtb[:-2] + strip[2:]  # tables ++ frame
        from index_search_monorepo_spark.operators.jpeg import decode_baseline
        from index_search_monorepo_spark.operators.jpeg_progressive import (
            decode_progressive,
        )

        from index_search_monorepo_spark.operators.jpeg_arith import (
            decode_arith,
        )

        parsed = decode_baseline(strip)
        if parsed is None:
            parsed = decode_progressive(strip)
        if parsed is None:
            parsed = decode_arith(strip)
        if parsed is None:
            return None
        jw, jh, px = parsed
        if (w is not None and jw != w) or (h is not None and jh != h):
            return None  # IFD dims disagree with the embedded stream
        return jw, jh, px
    if (
        w is None
        or h is None
        or offsets is None
        or compression not in (1, 5, 8, 32773, 32946)
        or any(b != 8 for b in bits)
        or photometric not in (0, 1, 2)
        or spp not in (1, 3, 4)
        or predictor not in (1, 2)
        or w <= 0
        or h <= 0
        or w * h > 64_000_000
    ):
        return None
    needed = w * h * spp
    if counts is None:
        counts = [needed]  # single strip
    data = bytearray()
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(payload):
            return None
        strip = payload[off : off + cnt]
        remaining = needed - len(data)
        if compression in (8, 32946):
            # inflate capped at the bytes still needed (+1 to detect
            # oversize) so a declared-small/zip-bomb payload cannot
            # balloon executor memory
            try:
                z = zlib.decompressobj()
                strip = z.decompress(strip, remaining + 1)
            except zlib.error:
                return None
        elif compression == 5:
            strip = _tiff_lzw_decode(strip, remaining)
            if strip is None:
                return None
        elif compression == 32773:
            strip = _packbits_decode(strip, remaining)
            if strip is None:
                return None
        if len(data) + len(strip) > needed:
            return None
        data += strip
    if len(data) < needed:
        return None
    px = np.frombuffer(bytes(data), np.uint8, needed).reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing: undo with a mod-256 cumsum
        px = np.cumsum(px, axis=1, dtype=np.uint8)
    if spp == 1:
        if photometric == 0:  # WhiteIsZero
            px = 255 - px
        px = np.repeat(px, 3, axis=2)
    return w, h, np.ascontiguousarray(px[:, :, :3])


def _tiff_lzw_encode(data: bytes) -> bytes:
    """TIFF-variant LZW compressor (round-trip partner of
    _tiff_lzw_decode): MSB-first packing, CLEAR/EOI, early-change width
    bumps. Because the decoder's table lags the encoder's by one entry,
    the encoder bumps at exact powers of two while the decoder bumps at
    2^w - 1 — the classic TIFF early-change off-by-one."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    def fresh() -> dict[bytes, int]:
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code, width = 258, 9
    emit(CLEAR, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code < 4093:
            table[wc] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(CLEAR, width)
            table, next_code, width = fresh(), 258, 9
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Naive literal-only PackBits writer (valid, uncompressive) —
    round-trip fixture for _packbits_decode; the repeat branch is covered
    by hand-built streams in tests."""
    out = bytearray()
    for i in range(0, len(data), 128):
        chunk = data[i : i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


_TIFF_ENCODERS = {
    "deflate": (8, zlib.compress),
    "lzw": (5, _tiff_lzw_encode),
    "packbits": (32773, _packbits_encode),
    "none": (1, bytes),
}


def encode_tiff(
    px: np.ndarray, predictor: int = 1, compression: str = "deflate"
) -> bytes:
    """Minimal little-endian single-strip TIFF encoder (8-bit gray or
    RGB; deflate / lzw / packbits / jpeg / none) — the round-trip partner
    of _parse_tiff's compressed paths, same role encode_baseline plays
    for jpeg.py. 'jpeg' wraps a complete baseline JFIF stream as the
    strip (new-style JPEG-in-TIFF, compression 7). Fixture-grade: writes
    BitsPerSample as a single SHORT (accepted by common readers and by
    _parse_tiff) rather than one per sample."""
    import struct

    h, w = px.shape[:2]
    spp = 1 if px.ndim == 2 else px.shape[2]
    stored = px.astype(np.uint8).reshape(h, w, spp)
    bits_val, phot, strip_spp = 8, (2 if spp >= 3 else 1), spp
    if compression == "g4":
        # bitonal archival layout: 1-bit samples, MinIsWhite, T.6 strip
        from index_search_monorepo_spark.operators.ccitt import encode_g4

        gray = stored.mean(axis=2) if spp > 1 else stored[:, :, 0]
        body = encode_g4((gray < 128).astype(np.uint8))
        comp_tag, bits_val, phot, strip_spp, predictor = 4, 1, 0, 1, 1
    elif compression == "jpeg":
        from index_search_monorepo_spark.operators.jpeg import encode_baseline

        comp_tag = 7
        body = encode_baseline(
            px.astype(np.uint8) if px.ndim == 2
            else stored.reshape(h, w, spp),
            quant=1,
        )
    else:
        if predictor == 2:  # horizontal differencing before compression
            diff = stored.astype(np.int16)
            diff[:, 1:] = (diff[:, 1:] - stored[:, :-1].astype(np.int16)) % 256
            stored = diff.astype(np.uint8)
        comp_tag, comp_fn = _TIFF_ENCODERS[compression]
        body = comp_fn(stored.tobytes())
    tags = [
        (256, 4, w), (257, 4, h), (258, 3, bits_val), (259, 3, comp_tag),
        (262, 3, phot), (273, 4, None), (277, 3, strip_spp),
        (279, 4, len(body)),
    ]
    if predictor != 1:
        tags.append((317, 3, predictor))
    data_off = 8 + 2 + 12 * len(tags) + 4
    out = b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", len(tags))
    for tag, ftype, value in tags:
        if value is None:
            value = data_off  # strip offset
        out += struct.pack("<HHI", tag, ftype, 1)
        out += struct.pack("<I", value) if ftype == 4 else struct.pack(
            "<HH", value, 0
        )
    out += struct.pack("<I", 0) + body
    return out


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter_row(
    f: int, row: np.ndarray, prev: np.ndarray, nch: int
) -> np.ndarray | None:
    """One scanline of PNG filter reconstruction (RFC 2083 §6). Filters
    none/up/sub vectorize (up = add prev row; sub = per-channel cumsum —
    out[p,c] = Σ raw[q<=p,c] mod 256); average/paeth need the in-row left
    neighbor, so they run byte-sequential (rows are short; the zlib
    inflate dominates anyway)."""
    stride = row.shape[0]
    if f == 0:
        return row.copy()
    if f == 2:  # up
        return ((row.astype(np.int16) + prev) % 256).astype(np.uint8)
    if f == 1:  # sub
        px = row.reshape(-1, nch).astype(np.int64)
        return (np.cumsum(px, axis=0) % 256).astype(np.uint8).reshape(stride)
    if f in (3, 4):  # average / paeth
        cur = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = int(cur[i - nch]) if i >= nch else 0
            b = int(prev[i])
            if f == 3:
                pred = (a + b) // 2
            else:
                c = int(prev[i - nch]) if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            cur[i] = (int(row[i]) + pred) % 256
        return cur.astype(np.uint8)
    return None  # undefined filter type


def _parse_png(payload: bytes) -> tuple[int, int, np.ndarray] | None:
    """REAL PNG decode — stdlib zlib inflate + numpy filter reconstruction
    (no PIL needed): 8-bit gray / RGB / RGBA / palette (PLTE), sequential
    or Adam7-interlaced. Sub-8-bit and 16-bit payloads return None (stub
    fallback) rather than mis-decoding."""
    import zlib

    if not payload.startswith(_PNG_SIG):
        return None
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(payload):
        clen = int.from_bytes(payload[pos : pos + 4], "big")
        ctype = payload[pos + 4 : pos + 8]
        if pos + 8 + clen > len(payload):
            return None
        data = payload[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + clen  # len + type + data + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, color_type, interlace = ihdr[8], ihdr[9], ihdr[12]
    if depth != 8 or interlace not in (0, 1) or color_type not in (0, 2, 3, 6):
        return None
    if color_type == 3 and (plte is None or len(plte) % 3):
        return None
    if w <= 0 or h <= 0 or w * h > 64_000_000:  # decompression-bomb guard
        return None
    nch = {0: 1, 2: 3, 3: 1, 6: 4}[color_type]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    def unfilter_block(bw: int, bh: int, rpos: int):
        """Reconstruct bh scanlines of bw pixels from raw[rpos:]; returns
        (grid, next_rpos) or None. Shared by the sequential image and each
        Adam7 pass (a pass's filters reference the PASS's previous row)."""
        bstride = bw * nch
        if len(raw) < rpos + bh * (bstride + 1):
            return None
        g = np.zeros((bh, bstride), dtype=np.uint8)
        prev = np.zeros(bstride, dtype=np.uint8)
        for y in range(bh):
            f = raw[rpos]
            row = np.frombuffer(raw, np.uint8, bstride, rpos + 1)
            rpos += bstride + 1
            cur = _png_unfilter_row(f, row, prev, nch)
            if cur is None:
                return None
            g[y] = cur
            prev = cur
        return g.reshape(bh, bw, nch), rpos

    if interlace == 0:
        out = unfilter_block(w, h, 0)
        if out is None:
            return None
        px = out[0]
    else:  # Adam7: seven sub-images, scattered on an 8x8 lattice
        px = np.zeros((h, w, nch), dtype=np.uint8)
        rpos = 0
        for x0, y0, dx, dy in (
            (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
            (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
        ):
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            out = unfilter_block(pw, ph, rpos)
            if out is None:
                return None
            block, rpos = out
            px[y0::dy, x0::dx] = block
    if color_type == 3:  # palette indices -> RGB via PLTE
        palette = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = px[:, :, 0]
        if idx.max(initial=0) >= palette.shape[0]:
            return None
        return w, h, np.ascontiguousarray(palette[idx])
    if nch == 1:
        px = np.repeat(px, 3, axis=2)
    return w, h, np.ascontiguousarray(px[:, :, :3])  # drop alpha


def encode_png(px: np.ndarray) -> bytes:
    """Canonical PNG re-encode of a decoded (H, W, 3) grid: filter-0
    scanlines, one zlib-compressed IDAT — stdlib only."""
    import struct
    import zlib

    h, w = px.shape[:2]
    raw = b"".join(
        b"\x00" + px[y].astype(np.uint8).tobytes() for y in range(h)
    )

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray | None:
    """GIF-variant LZW (GIF89a spec appendix F): LSB-first bit packing,
    variable code width starting at min_code_size+1 (max 12), CLEAR resets
    the table, EOI terminates. Returns the index stream or None on a
    malformed stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    table: list[bytes] = []

    def reset_table() -> int:
        table.clear()
        table.extend(bytes([i]) for i in range(clear))
        table.append(b"")  # clear
        table.append(b"")  # eoi
        return min_code_size + 1

    width = reset_table()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                width = reset_table()
                prev = None
                continue
            if code == eoi:
                return out
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                return None
            out.extend(entry)
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= n_pixels:
                return out
    return out if len(out) >= n_pixels else None


class _GifMalformed(Exception):
    """Raised by the _gif_open frame generator mid-stream; wrappers map it
    to a None return so malformed corpus bytes stay rows, never failures."""


def _gif_open(payload: bytes):
    """REAL GIF decode (GIF87a/89a), streaming: parse the logical screen
    eagerly and return (width, height, frame_gen) — or None for a non-GIF
    header. frame_gen yields (delay_ms, canvas) per composed frame, where
    canvas is the ONE live logical-screen buffer reused across frames:
    callers must .copy() any frame they retain. This keeps decode memory
    at a single canvas (≤64M px) no matter how many frames the payload
    declares — a tiny GIF claiming a huge screen plus hundreds of 1×1
    frames can no longer force per-frame canvas materialization.
    Composition handles left/top offsets, transparency masking, disposal
    none/keep/restore-background, and GCE frame delays; malformed or
    restore-previous-disposal streams raise _GifMalformed from the
    generator."""
    if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
        return None
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    bg_index = payload[11]
    if sw <= 0 or sh <= 0 or sw * sh > 64_000_000:
        return None
    pos0 = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = payload[pos0 : pos0 + 3 * n]
        pos0 += 3 * n
    bg_rgb = (0, 0, 0)
    if gct is not None and 3 * bg_index + 3 <= len(gct):
        bg_rgb = tuple(gct[3 * bg_index : 3 * bg_index + 3])

    def gen():
        canvas = np.empty((sh, sw, 3), np.uint8)
        canvas[:, :] = bg_rgb
        pos = pos0
        delay_ms = 0
        transparent: int | None = None
        disposal = 0
        while pos < len(payload):
            b0 = payload[pos]
            if b0 == 0x21:  # extension
                if pos + 2 > len(payload):
                    raise _GifMalformed
                label = payload[pos + 1]
                pos += 2
                if label == 0xF9 and pos < len(payload) and payload[pos] >= 4:
                    gce = payload[pos + 1 : pos + 5]
                    disposal = (gce[0] >> 2) & 0x07
                    delay_ms = int.from_bytes(gce[1:3], "little") * 10
                    transparent = gce[3] if gce[0] & 0x01 else None
                while pos < len(payload) and payload[pos] != 0:
                    pos += 1 + payload[pos]
                pos += 1
            elif b0 == 0x2C:  # image descriptor
                if pos + 10 > len(payload):
                    raise _GifMalformed
                left = int.from_bytes(payload[pos + 1 : pos + 3], "little")
                top = int.from_bytes(payload[pos + 3 : pos + 5], "little")
                w = int.from_bytes(payload[pos + 5 : pos + 7], "little")
                h = int.from_bytes(payload[pos + 7 : pos + 9], "little")
                iflags = payload[pos + 9]
                pos += 10
                pal = gct
                if iflags & 0x80:  # local color table
                    n = 2 << (iflags & 0x07)
                    pal = payload[pos : pos + 3 * n]
                    pos += 3 * n
                if (
                    pal is None
                    or w <= 0
                    or h <= 0
                    or left + w > sw
                    or top + h > sh
                ):
                    raise _GifMalformed
                if disposal == 3:
                    raise _GifMalformed  # restore-previous: not supported
                if pos >= len(payload):
                    raise _GifMalformed
                min_code_size = payload[pos]
                pos += 1
                if not 2 <= min_code_size <= 11:
                    raise _GifMalformed
                data = bytearray()
                while pos < len(payload) and payload[pos] != 0:
                    blen = payload[pos]
                    data += payload[pos + 1 : pos + 1 + blen]
                    pos += 1 + blen
                pos += 1  # block terminator
                idx = _gif_lzw_decode(bytes(data), min_code_size, w * h)
                if idx is None:
                    raise _GifMalformed
                indices = np.frombuffer(bytes(idx[: w * h]), np.uint8)
                palette = np.frombuffer(pal, np.uint8).reshape(-1, 3)
                if indices.max(initial=0) >= palette.shape[0]:
                    raise _GifMalformed
                grid = indices.reshape(h, w)
                if iflags & 0x40:  # interlaced: rows arrive in 4 passes
                    order = np.concatenate(
                        [
                            np.arange(0, h, 8),
                            np.arange(4, h, 8),
                            np.arange(2, h, 4),
                            np.arange(1, h, 2),
                        ]
                    )
                    deinterlaced = np.empty_like(grid)
                    deinterlaced[order] = grid
                    grid = deinterlaced
                region = canvas[top : top + h, left : left + w]
                px = palette[grid]
                if transparent is not None:
                    mask = grid != transparent
                    region[mask] = px[mask]
                else:
                    region[:, :] = px
                yield delay_ms, canvas
                if disposal == 2:  # restore rect to background after display
                    canvas[top : top + h, left : left + w] = bg_rgb
                delay_ms = 0
                transparent = None
                disposal = 0
            elif b0 == 0x3B:  # trailer
                return
            else:
                raise _GifMalformed

    return sw, sh, gen()


def _gif_frames(
    payload: bytes, max_frames: int
) -> tuple[int, int, list[tuple[int, np.ndarray]]] | None:
    """Materializing wrapper over _gif_open for callers that need retained
    frames (single-frame decode, small-N tests). Returns
    (width, height, [(delay_ms, rgb_canvas), ...]) — up to max_frames —
    or None for malformed / restore-previous-disposal payloads. Retains
    max_frames canvas copies: keep max_frames small; timeline sampling
    goes through gif_sample_frames, which never materializes the list."""
    opened = _gif_open(payload)
    if opened is None:
        return None
    sw, sh, frame_gen = opened
    frames: list[tuple[int, np.ndarray]] = []
    try:
        for delay_ms, canvas in frame_gen:
            frames.append((delay_ms, canvas.copy()))
            if len(frames) >= max_frames:
                break
    except _GifMalformed:
        return None
    return (sw, sh, frames) if frames else None


def _parse_gif(payload: bytes) -> tuple[int, int, np.ndarray] | None:
    out = _gif_frames(payload, 1)
    if out is None:
        return None
    sw, sh, frames = out
    return sw, sh, np.ascontiguousarray(frames[0][1])


def decode_image(payload: bytes) -> tuple[int, int, np.ndarray, str] | None:
    """REAL decode for PPM/BMP/TIFF/PNG/GIF/baseline-JPEG; None otherwise."""
    parsed = _parse_ppm(payload)
    if parsed is not None:
        return (*parsed, "ppm")
    parsed = _parse_bmp(payload)
    if parsed is not None:
        return (*parsed, "bmp")
    parsed = _parse_tiff(payload)
    if parsed is not None:
        return (*parsed, "tiff")
    parsed = _parse_png(payload)
    if parsed is not None:
        return (*parsed, "png")
    parsed = _parse_gif(payload)
    if parsed is not None:
        return (*parsed, "gif")
    if payload[:2] == b"\xff\xd8":
        from index_search_monorepo_spark.operators.jpeg import decode_baseline
        from index_search_monorepo_spark.operators.jpeg_progressive import (
            decode_progressive,
        )

        from index_search_monorepo_spark.operators.jpeg_arith import (
            decode_arith,
        )

        parsed = decode_baseline(payload)
        if parsed is None:
            # SOF2 Huffman progressive (spectral selection + successive
            # approximation)
            parsed = decode_progressive(payload)
        if parsed is None:
            # SOF9 sequential / SOF10 progressive arithmetic (QM coder,
            # T.81 Annex D + F + G.2)
            parsed = decode_arith(payload)
        if parsed is None:
            # Annex-J hierarchical (DHP + EXP + differential frames)
            from index_search_monorepo_spark.operators.jpeg_hierarchical import (
                decode_hierarchical,
            )

            parsed = decode_hierarchical(payload)
        if parsed is not None:
            return (*parsed, "jpg")
    return None


AUDIO_META_SCHEMA = (
    "doc_id long, n_bytes long, sample_rate long, channels long,"
    " bits_per_sample long, n_samples long, duration_ms long,"
    " media_format string"
)


def parse_wav(payload: bytes) -> dict | None:
    """REAL RIFF/WAVE header parse (PCM fmt chunk + data chunk size) —
    stdlib byte slicing only. Returns None for non-WAV payloads."""
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        csize = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        if cid == b"fmt " and pos + 8 + 16 <= len(payload):
            fmt = payload[pos + 8 : pos + 8 + 16]
        elif cid == b"data":
            data_size = csize
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        return None
    channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if channels == 0 or sample_rate == 0 or bits == 0:
        return None
    frame_bytes = channels * (bits // 8)
    n_samples = data_size // frame_bytes if frame_bytes else 0
    return {
        "n_bytes": len(payload),
        "sample_rate": sample_rate,
        "channels": channels,
        "bits_per_sample": bits,
        "n_samples": n_samples,
        "duration_ms": (n_samples * 1000) // sample_rate,
        "media_format": "wav",
    }


def _parse_f80(b: bytes) -> float:
    """80-bit IEEE 754 extended float (AIFF sample rate): 1 sign bit,
    15-bit exponent, explicit-integer-bit 64-bit mantissa."""
    if len(b) < 10:
        return 0.0
    sign = -1.0 if b[0] & 0x80 else 1.0
    exp = ((b[0] & 0x7F) << 8) | b[1]
    mant = int.from_bytes(b[2:10], "big")
    if exp == 0 and mant == 0:
        return 0.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def parse_aiff(payload: bytes) -> dict | None:
    """REAL AIFF header parse (big-endian IFF chunk walk, COMM chunk with
    its 80-bit-extended sample rate) — the big-endian sibling of
    `parse_wav`."""
    if len(payload) < 12 or payload[:4] != b"FORM" or payload[8:12] != b"AIFF":
        return None
    pos, comm = 12, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        csize = int.from_bytes(payload[pos + 4 : pos + 8], "big")
        if cid == b"COMM" and pos + 8 + 18 <= len(payload):
            comm = payload[pos + 8 : pos + 8 + 18]
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    if comm is None:
        return None
    channels = int.from_bytes(comm[0:2], "big")
    n_frames = int.from_bytes(comm[2:6], "big")
    bits = int.from_bytes(comm[6:8], "big")
    rate = int(round(_parse_f80(comm[8:18])))
    if channels == 0 or rate <= 0 or bits == 0:
        return None
    return {
        "n_bytes": len(payload),
        "sample_rate": rate,
        "channels": channels,
        "bits_per_sample": bits,
        "n_samples": n_frames,
        "duration_ms": (n_frames * 1000) // rate,
        "media_format": "aiff",
    }


def extract_audio_metadata(df_with_payload: DataFrame) -> DataFrame:
    """binary payload -> typed audio metadata (REAL for RIFF/WAVE and
    AIFF; other payloads yield a NULL-fielded row with media_format
    'unknown'). Same no-shuffle mapInPandas shape as the image kernel."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                meta = parse_wav(bytes(payload)) or parse_aiff(bytes(payload))
                if meta is None:
                    meta = {
                        "n_bytes": len(payload),
                        "sample_rate": None,
                        "channels": None,
                        "bits_per_sample": None,
                        "n_samples": None,
                        "duration_ms": None,
                        "media_format": "unknown",
                    }
                rows.append({"doc_id": doc_id, **meta})
            yield pd.DataFrame(rows)

    return df_with_payload.mapInPandas(fn, AUDIO_META_SCHEMA)


def decode_pcm(payload: bytes) -> tuple[int, np.ndarray] | None:
    """REAL PCM sample decode -> (sample_rate, samples) with samples an
    int32 ndarray of shape (n_frames, channels), or None if the payload
    is not an integer-PCM WAV/AIFF this decoder can express.

    WAV: RIFF little-endian, fmt code 1 (integer PCM), 8-bit (unsigned,
    rebased to signed) / 16 / 24 (sign-extended) / 32-bit. AIFF:
    big-endian SSND chunk (8-byte offset/blockSize header honored),
    8/16-bit signed, frame count capped by COMM. Float formats (WAV fmt
    code 3) return None — decode refuses rather than mis-scales."""
    if (
        len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WAVE"
    ):
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            csize = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            if cid == b"fmt " and pos + 8 + 16 <= len(payload):
                fmt = payload[pos + 8 : pos + 8 + 16]
            elif cid == b"data":
                data = payload[pos + 8 : pos + 8 + csize]
            pos += 8 + csize + (csize & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            return None
        code = int.from_bytes(fmt[0:2], "little")
        channels = int.from_bytes(fmt[2:4], "little")
        rate = int.from_bytes(fmt[4:8], "little")
        bits = int.from_bytes(fmt[14:16], "little")
        if code != 1 or not 1 <= channels <= 64 or rate == 0:
            return None
        if bits == 8:
            flat = np.frombuffer(data, np.uint8).astype(np.int32) - 128
        elif bits == 16:
            n2 = len(data) & ~1
            flat = np.frombuffer(data[:n2], "<i2").astype(np.int32)
        elif bits == 24:
            n3 = len(data) - len(data) % 3
            raw = np.frombuffer(data[:n3], np.uint8).reshape(-1, 3)
            flat = (
                raw[:, 0].astype(np.int32)
                | raw[:, 1].astype(np.int32) << 8
                | raw[:, 2].astype(np.int32) << 16
            )
            flat = (flat ^ 0x800000) - 0x800000  # sign-extend
        elif bits == 32:
            n4 = len(data) & ~3
            flat = np.frombuffer(data[:n4], "<i4").astype(np.int32)
        else:
            return None
        n_frames = len(flat) // channels
        return rate, flat[: n_frames * channels].reshape(n_frames, channels)
    if (
        len(payload) >= 12
        and payload[:4] == b"FORM"
        and payload[8:12] == b"AIFF"
    ):
        pos, comm, ssnd = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            csize = int.from_bytes(payload[pos + 4 : pos + 8], "big")
            if cid == b"COMM" and pos + 8 + 18 <= len(payload):
                comm = payload[pos + 8 : pos + 8 + 18]
            elif cid == b"SSND" and csize >= 8:
                body = payload[pos + 8 : pos + 8 + csize]
                off = int.from_bytes(body[0:4], "big")
                ssnd = body[8 + off :]
            pos += 8 + csize + (csize & 1)
        if comm is None or ssnd is None:
            return None
        channels = int.from_bytes(comm[0:2], "big")
        n_frames = int.from_bytes(comm[2:6], "big")
        bits = int.from_bytes(comm[6:8], "big")
        rate = int(round(_parse_f80(comm[8:18])))
        if not 1 <= channels <= 64 or rate <= 0:
            return None
        if bits == 8:
            flat = np.frombuffer(ssnd, np.int8).astype(np.int32)
        elif bits == 16:
            n2 = len(ssnd) & ~1
            flat = np.frombuffer(ssnd[:n2], ">i2").astype(np.int32)
        else:
            return None
        n_avail = len(flat) // channels
        n_frames = min(n_frames, n_avail)
        return rate, flat[: n_frames * channels].reshape(n_frames, channels)
    return None


def _pack_f80(rate: int) -> bytes:
    """Integer sample rate -> 80-bit IEEE extended (AIFF COMM field);
    inverse of _parse_f80 for positive integers."""
    if rate <= 0:
        return bytes(10)
    exp = rate.bit_length() - 1
    return struct.pack(">HQ", 16383 + exp, rate << (63 - exp))


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal PCM WAV writer (tests'/gate's round-trip partner):
    int16 samples, shape (n_frames, channels) or (n_frames,)."""
    s = np.asarray(samples, np.int16)
    if s.ndim == 1:
        s = s[:, None]
    ch = s.shape[1]
    data = s.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate,
                      sample_rate * ch * 2, ch * 2, 16)
    out = bytearray(b"RIFF")
    out += struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
    out += b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return bytes(out)


def encode_aiff(samples: np.ndarray, sample_rate: int) -> bytes:
    """Minimal 16-bit AIFF writer (big-endian sibling of encode_wav)."""
    s = np.asarray(samples, np.int16)
    if s.ndim == 1:
        s = s[:, None]
    ch = s.shape[1]
    data = s.astype(">i2").tobytes()
    comm = struct.pack(">HIH", ch, s.shape[0], 16) + _pack_f80(sample_rate)
    ssnd = struct.pack(">II", 0, 0) + data
    body = b"COMM" + struct.pack(">I", len(comm)) + comm
    body += b"SSND" + struct.pack(">I", len(ssnd)) + ssnd
    return b"FORM" + struct.pack(">I", 4 + len(body)) + b"AIFF" + body


_AUDIO_NULLS = {
    "sample_rate": None,
    "channels": None,
    "n_samples": None,
    "energy": None,
    "zero_crossings": None,
    "peak": None,
    "audio_format": "unknown",
}


def _audio_feature_cols(payload: bytes) -> dict:
    """Integer-exact PCM features (oracle-friendly, errors-are-rows):
    energy = sum of squared integer samples, zero_crossings = per-channel
    sign-boundary count (>= 0 vs < 0) summed across channels, peak = max
    |sample|. Non-PCM payloads yield the NULL row, never an exception."""
    pcm = decode_pcm(payload)
    if pcm is None:
        return dict(_AUDIO_NULLS)
    rate, samples = pcm
    s = samples.astype(np.int64)
    nonneg = s >= 0
    return {
        "sample_rate": rate,
        "channels": samples.shape[1],
        "n_samples": samples.shape[0],
        "energy": int((s * s).sum()),
        "zero_crossings": int((nonneg[1:] != nonneg[:-1]).sum()),
        "peak": int(np.abs(s).max()) if s.size else 0,
        "audio_format": "wav" if payload[:4] == b"RIFF" else "aiff",
    }


AUDIO_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, sample_rate long, channels long,"
    " n_samples long, energy long, zero_crossings long, peak long,"
    " audio_format string"
)


def extract_audio_features(df_with_payload: DataFrame) -> DataFrame:
    """binary payload -> REAL decoded-PCM features (no stub: WAV/AIFF
    integer PCM is fully decodable with stdlib + numpy). Same
    no-shuffle mapInPandas shape as the metadata kernels; non-audio
    payloads yield NULL features with audio_format 'unknown'."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                rows.append(
                    {"doc_id": doc_id, "n_bytes": len(b),
                     **_audio_feature_cols(b)}
                )
            yield pd.DataFrame(rows)

    return df_with_payload.mapInPandas(fn, AUDIO_FEATURES_SCHEMA)


MEDIA_FEATURES_SCHEMA = (
    "doc_id long, n_bytes long, width long, height long,"
    " media_format string, sample_rate long, channels long,"
    " n_samples long, energy long, zero_crossings long, peak long,"
    " audio_format string"
)


def extract_media_features(df_with_payload: DataFrame) -> DataFrame:
    """Image metadata AND audio PCM features in ONE Arrow pass — the
    100 TB shape: the payload bytes deserialize exactly once, no join,
    no second scan (a join of two kernels over the same payload frame
    would double-read the dominant I/O term). Image columns follow
    extract_media_metadata (real decode or labeled stub fallback);
    audio columns follow extract_audio_features."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                rows.append(
                    {"doc_id": doc_id, **_decode_one(b),
                     **_audio_feature_cols(b)}
                )
            yield pd.DataFrame(rows)

    return df_with_payload.mapInPandas(fn, MEDIA_FEATURES_SCHEMA)


VIDEO_META_SCHEMA = (
    "doc_id long, n_bytes long, major_brand string, timescale long,"
    " duration_ms long, n_tracks long, width long, height long,"
    " media_format string"
)


def _mp4_boxes(payload: bytes, start: int, end: int):
    """Iterate (type, body_start, body_end) over ISO-BMFF boxes in
    payload[start:end]; handles 64-bit largesize and size-0 (to-end)."""
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(payload[pos : pos + 4], "big")
        btype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(payload[pos + 8 : pos + 16], "big")
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield btype, body, pos + size
        pos += size


def parse_mp4(payload: bytes) -> dict | None:
    """REAL ISO-BMFF (MP4/MOV) container metadata: ftyp brand, mvhd
    timescale/duration, per-track tkhd dimensions — a pure box walk, the
    video analog of the WAV/AIFF chunk walk. FRAME decode still needs a
    codec (the one genuinely stubbed kernel); container metadata does not.
    """
    boxes = list(_mp4_boxes(payload, 0, len(payload)))
    if not boxes or boxes[0][0] != b"ftyp":
        return None
    brand = payload[boxes[0][1] : boxes[0][1] + 4].decode("ascii", "replace")
    timescale = duration = None
    n_tracks = 0
    width = height = 0
    for btype, b0, b1 in boxes:
        if btype != b"moov":
            continue
        for ityp, i0, i1 in _mp4_boxes(payload, b0, b1):
            if ityp == b"mvhd":
                ver = payload[i0]
                if ver == 1:
                    timescale = int.from_bytes(payload[i0 + 20 : i0 + 24], "big")
                    duration = int.from_bytes(payload[i0 + 24 : i0 + 32], "big")
                else:
                    timescale = int.from_bytes(payload[i0 + 12 : i0 + 16], "big")
                    duration = int.from_bytes(payload[i0 + 16 : i0 + 20], "big")
            elif ityp == b"trak":
                n_tracks += 1
                for ttyp, t0, t1 in _mp4_boxes(payload, i0, i1):
                    if ttyp == b"tkhd" and t1 - t0 >= 8:
                        # width/height: 16.16 fixed point, last 8 bytes
                        tw = int.from_bytes(payload[t1 - 8 : t1 - 4], "big") >> 16
                        th = int.from_bytes(payload[t1 - 4 : t1], "big") >> 16
                        width, height = max(width, tw), max(height, th)
    if timescale is None or not timescale:
        return None
    return {
        "n_bytes": len(payload),
        "major_brand": brand,
        "timescale": timescale,
        "duration_ms": (duration * 1000) // timescale,
        "n_tracks": n_tracks,
        "width": width,
        "height": height,
        "media_format": "mp4",
    }


def parse_avi(payload: bytes) -> tuple[dict, list[bytes]] | None:
    """REAL RIFF/AVI container parse: avih main header (frame period,
    frame count, dims) + the 'movi' LIST's video frame chunks
    (00dc/00db). Returns (metadata dict shaped like parse_mp4's, frames)
    or None for non-AVI payloads. For MJPEG streams each frame chunk is
    a complete JPEG this repo's own decoders can open — making video
    frame sampling REAL for the one video codec stdlib can express."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    usec_per_frame = total_frames = width = height = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal usec_per_frame, total_frames, width, height
        while pos + 8 <= end:
            cid = payload[pos : pos + 4]
            csize = int.from_bytes(payload[pos + 4 : pos + 8], "little")
            body0, body1 = pos + 8, min(pos + 8 + csize, end)
            if cid == b"LIST":
                walk(body0 + 4, body1)  # skip the list type fourcc
            elif cid == b"avih" and csize >= 40:
                usec_per_frame = int.from_bytes(
                    payload[body0 : body0 + 4], "little"
                )
                total_frames = int.from_bytes(
                    payload[body0 + 16 : body0 + 20], "little"
                )
                width = int.from_bytes(
                    payload[body0 + 32 : body0 + 36], "little"
                )
                height = int.from_bytes(
                    payload[body0 + 36 : body0 + 40], "little"
                )
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                frames.append(payload[body0:body1])
            pos = body0 + csize + (csize & 1)  # chunks are word-aligned

    walk(12, len(payload))
    if usec_per_frame is None:
        return None
    n = total_frames if total_frames else len(frames)
    duration_ms = (n * usec_per_frame) // 1000 if usec_per_frame else None
    meta = {
        "n_bytes": len(payload),
        "major_brand": "AVI ",
        "timescale": 1_000_000 // usec_per_frame if usec_per_frame else None,
        "duration_ms": duration_ms,
        "n_tracks": 1,
        "width": width,
        "height": height,
        "media_format": "avi",
    }
    return meta, frames


def avi_sample_frames(
    payload: bytes,
    every_ms: int,
    max_frames: int,
    max_total_pixels: int = 64_000_000,
) -> list[tuple[int, int, bytes]] | None:
    """REAL frame sampling for MJPEG-AVI: walk the container's frame
    chunks on the declared timeline and decode the JPEG at each every_ms
    sample point with this repo's own decoders (baseline / progressive /
    QM-arithmetic), re-encoded as canonical PPM. Same retained-pixel cap semantics as
    gif_sample_frames. Returns None for non-AVI payloads or when no
    frame decodes (caller's stub path)."""
    parsed = parse_avi(payload)
    if parsed is None:
        return None
    meta, frames = parsed
    if not frames:
        return None
    ts_scale = 1_000_000 // meta["timescale"] if meta["timescale"] else 0
    period_ms = max(ts_scale // 1000, 1)
    out: list[tuple[int, int, bytes]] = []
    retained_px = 0
    next_sample = 0
    for k, fr in enumerate(frames):
        if len(out) >= max_frames:
            break
        ts = k * period_ms
        if ts < next_sample:
            continue
        decoded = decode_image(bytes(fr))
        if decoded is None:
            continue  # undecodable frame: skip, don't abort the timeline
        w, h, px, _fmt = decoded
        if retained_px + w * h > max_total_pixels:
            break
        retained_px += w * h
        out.append((len(out), ts, encode_ppm(px)))
        next_sample = ts + every_ms
    return out if out else None


def encode_mjpeg_avi(frames_px: list, fps: int = 10) -> bytes:
    """Minimal MJPEG-AVI writer (tests' conformance partner of
    parse_avi/avi_sample_frames): RIFF('AVI ') with an avih main header
    and a movi LIST of 00dc JPEG chunks, each frame encoded with this
    repo's own baseline encoder."""
    import struct

    from index_search_monorepo_spark.operators.jpeg import encode_baseline

    jpegs = [encode_baseline(px, quant=1) for px in frames_px]
    h0, w0 = frames_px[0].shape[:2]
    usec = 1_000_000 // fps
    avih = struct.pack(
        "<10I", usec, 0, 0, 0, len(jpegs), 0, 1, 0, w0, h0
    )
    hdrl = b"avih" + struct.pack("<I", len(avih)) + avih
    hdrl = b"LIST" + struct.pack("<I", 4 + len(hdrl)) + b"hdrl" + hdrl
    movi = bytearray()
    for j in jpegs:
        movi += b"00dc" + struct.pack("<I", len(j)) + j
        if len(j) & 1:
            movi += b"\x00"  # word alignment
    movi = b"LIST" + struct.pack("<I", 4 + len(movi)) + b"movi" + bytes(movi)
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def extract_video_metadata(df_with_payload: DataFrame) -> DataFrame:
    """binary payload -> typed container metadata (REAL for ISO-BMFF and
    RIFF/AVI; other payloads yield a NULL-fielded 'unknown' row).
    No-shuffle mapInPandas, same shape as the image/audio kernels."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _video_meta_row(doc_id, bytes(payload))
                for doc_id, payload in zip(pdf["doc_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows)

    return df_with_payload.mapInPandas(fn, VIDEO_META_SCHEMA)


def _video_meta_row(doc_id, payload: bytes) -> dict:
    """Plain-Python kernel of extract_video_metadata (unit-testable
    without Spark): ISO-BMFF -> RIFF/AVI -> MPEG-1 elementary video."""
    meta = parse_mp4(payload)
    if meta is None:
        avi = parse_avi(payload)
        if avi is not None:
            meta = avi[0]
    if meta is None:
        from index_search_monorepo_spark.operators.mpeg1 import parse_m1v

        meta = parse_m1v(payload)
    if meta is None:
        meta = {
            "n_bytes": len(payload),
            "major_brand": None,
            "timescale": None,
            "duration_ms": None,
            "n_tracks": None,
            "width": None,
            "height": None,
            "media_format": "unknown",
        }
    return {"doc_id": doc_id, **meta}


def _fake_decode(payload: bytes) -> dict:
    """STUB fallback for compressed codecs. Deterministic function of the
    payload bytes only. A real implementation would
    `PIL.Image.open(io.BytesIO(payload))` / `soundfile.read` here; the
    container has no codec libs, so we derive plausible metadata
    arithmetically. Replace body, keep signature."""
    n = len(payload)
    return {
        "n_bytes": n,
        "width": n % 640 + 16,
        "height": (n * 7) % 480 + 16,
        "media_format": ("png", "jpg", "wav")[n % 3],
    }


def _decode_one(payload: bytes) -> dict:
    real = decode_image(payload)
    if real is not None:
        w, h, _px, fmt = real
        return {"n_bytes": len(payload), "width": w, "height": h, "media_format": fmt}
    return _fake_decode(payload)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        metas = [_decode_one(p) for p in pdf["payload"]]
        out = pd.DataFrame(metas)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def with_binary_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the text stand in
    for the media payload in the synthetic corpus)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def extract_media_metadata(df_with_payload: DataFrame) -> DataFrame:
    """binary payload -> typed metadata via Arrow-batched mapInPandas.
    One Python stage, no shuffle; batch size governed by
    spark.sql.execution.arrow.maxRecordsPerBatch (fat rows -> small batches).
    """
    return df_with_payload.mapInPandas(_decode_batches, MEDIA_META_SCHEMA)


def media_metadata(df: DataFrame, text_col: str = "text") -> DataFrame:
    return extract_media_metadata(with_binary_payload(df, text_col))


# ---------------------------------------------------------------------------
# media transform kernels: resize / frame-sample / feature-extract.
# Same contract as the decode stub: the Spark-side plumbing (schemas, Arrow
# batch shape, iterator protocol, partition-parallel no-shuffle plans) is
# real and tested; the pixel/sample math is a deterministic fake behind
# DECODE_IS_STUB.
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = (
    "doc_id long, payload binary, out_width long, out_height long,"
    " resized binary"
)

FRAMES_SCHEMA = "doc_id long, frame_no long, frame_ts_ms long, frame binary"

EMBED_SCHEMA = "doc_id long, embedding array<float>"


def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """STUB resize fallback for undecodable payloads: deterministic byte
    transform standing in for `PIL.Image.resize`. Output length w*h bytes,
    derived by tiling the payload (replace body, keep signature)."""
    if not payload:
        return b"\x00" * (w * h)
    reps = (w * h) // len(payload) + 1
    return (payload * reps)[: w * h]


def nearest_resize(px: np.ndarray, w: int, h: int) -> np.ndarray:
    """REAL nearest-neighbor resize on a decoded (H, W, 3) grid — index
    striding, no interpolation libs needed."""
    src_h, src_w = px.shape[:2]
    rows = (np.arange(h) * src_h) // h
    cols = (np.arange(w) * src_w) // w
    return px[rows][:, cols]


def encode_ppm(px: np.ndarray) -> bytes:
    """Canonical re-encode of a decoded grid as binary PPM (P6)."""
    h, w = px.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + px.astype(np.uint8).tobytes()


def _resize_one(payload: bytes, w: int, h: int) -> bytes:
    real = decode_image(payload)
    if real is not None:
        _w, _h, px, _fmt = real
        return encode_ppm(nearest_resize(px, w, h))
    return _fake_resize(payload, w, h)


def resize_media(df_with_payload: DataFrame, width: int, height: int) -> DataFrame:
    """Resize kernel over the scan (mapInPandas, no shuffle): REAL
    numpy nearest-neighbor for decodable formats (output re-encoded as
    PPM), stub fallback for compressed codecs."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "payload": pdf["payload"].values,
                    "out_width": width,
                    "out_height": height,
                    "resized": [
                        _resize_one(p, width, height) for p in pdf["payload"]
                    ],
                }
            )

    return df_with_payload.mapInPandas(fn, RESIZED_SCHEMA)


def gif_sample_frames(
    payload: bytes,
    every_ms: int,
    max_frames: int,
    max_total_pixels: int = 64_000_000,
) -> list[tuple[int, int, bytes]] | None:
    """REAL frame sampling for animated GIF: stream frames off the single
    live logical-screen canvas (_gif_open) and copy/encode ONLY at sample
    points — decode memory is one canvas regardless of declared frame
    count, and retained output is capped at max_total_pixels
    (screen_px × kept_frames, default 64M), so a hostile payload
    declaring a large screen plus hundreds of tiny frames cannot OOM an
    executor. NOTE the cap is a deliberate truncation: a LEGITIMATE
    large-screen animation may get fewer than max_frames samples
    (e.g. a 4096x4096 screen keeps at most 3 by default) — callers that
    want deeper sampling of big canvases must raise max_total_pixels
    explicitly, trading executor memory for frames. Walked frames are
    capped at 64 × max_frames (same decode bound as before). Untimed
    frames (delay 0) count as every_ms apart, so an untimed N-frame GIF
    yields min(N, max_frames) frames. Returns
    [(frame_no, ts_ms, ppm_bytes)] or None for non-GIF/malformed
    payloads (the caller's stub path)."""
    opened = _gif_open(payload)
    if opened is None:
        return None
    sw, sh, frame_gen = opened
    # sw*sh ≤ 64M is guaranteed by _gif_open; keep total retained pixels
    # bounded so the sampled-frame list stays small at max screen size.
    max_keep = min(max_frames, max(1, max_total_pixels // (sw * sh)))
    out: list[tuple[int, int, bytes]] = []
    ts = 0
    next_sample = 0
    walked = 0
    try:
        for delay, canvas in frame_gen:
            if ts >= next_sample and len(out) < max_keep:
                out.append((len(out), ts, encode_ppm(canvas)))
                next_sample = ts + every_ms
            ts += delay if delay > 0 else every_ms
            walked += 1
            if len(out) >= max_keep or walked >= 64 * max_frames:
                break
    except _GifMalformed:
        return None
    return out if out else None


def sample_frames(
    df_with_payload: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    max_total_pixels: int = 64_000_000,
) -> DataFrame:
    """Frame sampling: one output row per sampled frame (a flatMap-shaped
    mapInPandas — output rows > input rows, still no shuffle). REAL for
    animated GIF (frame composition + timeline sampling via
    gif_sample_frames) AND MJPEG-AVI (container walk + per-frame JPEG
    decode via avi_sample_frames); the STUB fallback derives a
    deterministic frame count from payload length for container formats
    whose frame decode needs a codec."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rows.extend(
                    _sample_frames_rows(
                        doc_id,
                        bytes(payload),
                        every_ms,
                        max_frames,
                        max_total_pixels,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "frame_ts_ms", "frame"]
            )

    return df_with_payload.mapInPandas(fn, FRAMES_SCHEMA)


def _sample_frames_rows(
    doc_id, payload: bytes, every_ms: int, max_frames: int,
    max_total_pixels: int,
) -> list[dict]:
    """Plain-Python kernel of sample_frames (unit-testable without
    Spark): animated GIF -> MJPEG-AVI -> MPEG-1 I-picture sampling, then
    the deterministic stub for codecs this container can't decode."""
    real = gif_sample_frames(payload, every_ms, max_frames, max_total_pixels)
    if real is None:
        real = avi_sample_frames(payload, every_ms, max_frames, max_total_pixels)
    if real is None:
        from index_search_monorepo_spark.operators.mpeg1 import (
            mpeg1_sample_frames,
        )

        real = mpeg1_sample_frames(
            payload, every_ms, max_frames, max_total_pixels
        )
    if real is not None:
        return [
            {
                "doc_id": doc_id,
                "frame_no": k,
                "frame_ts_ms": ts,
                "frame": frame,
            }
            for k, ts, frame in real
        ]
    rows = []
    n_frames = min(max_frames, len(payload) % max_frames + 1)
    for k in range(n_frames):
        lo = (k * 97) % max(len(payload), 1)
        rows.append(
            {
                "doc_id": doc_id,
                "frame_no": k,
                "frame_ts_ms": k * every_ms,
                "frame": bytes(payload[lo : lo + 16]),
            }
        )
    return rows


def image_feature_vector(px: np.ndarray, dim: int = 8) -> list[float]:
    """REAL image embedding from decoded pixels: channel means, global
    contrast, and a gray-intensity histogram, L2-normalized — a classic
    color-moment descriptor; deterministic, codec-free, and directly
    usable by the similarity operators."""
    f = px.astype(np.float64)
    feats = [
        float(f[:, :, 0].mean()) / 255.0,
        float(f[:, :, 1].mean()) / 255.0,
        float(f[:, :, 2].mean()) / 255.0,
        float(f.std()) / 128.0,
    ]
    gray = f.mean(axis=2)
    n_bins = max(dim - len(feats), 1)
    hist, _ = np.histogram(gray, bins=n_bins, range=(0.0, 255.0))
    total = float(hist.sum()) or 1.0
    feats += [float(c) / total for c in hist]
    feats = feats[:dim] + [0.0] * (dim - len(feats))
    norm = float(np.sqrt(sum(x * x for x in feats))) or 1.0
    return [x / norm for x in feats]


def extract_features(df_with_payload: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction: payload -> fixed-dim float embedding. REAL for
    decodable images (color-moment + intensity-histogram descriptor over
    the decoded pixel grid); the STUB fallback uses a byte-histogram
    projection for payloads a real deployment would hand to a vision/audio
    encoder. Output feeds the similarity operators
    (cosine_topk / lsh_topk) unchanged."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            embs = []
            for payload in pdf["payload"]:
                real = decode_image(bytes(payload))
                if real is not None:
                    embs.append(image_feature_vector(real[2], dim))
                    continue
                acc = [0.0] * dim
                for i, b in enumerate(payload[:4096]):
                    acc[i % dim] += b
                norm = sum(x * x for x in acc) ** 0.5 or 1.0
                embs.append([x / norm for x in acc])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"].values, "embedding": embs}
            )

    return df_with_payload.mapInPandas(fn, EMBED_SCHEMA)


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup (dHash): the standard near-duplicate signal
# for image corpora — identical and lightly-recompressed/noised images
# collapse to nearby 64-bit hashes, compared with a banded hamming join
# (the SimHash banding trick at image grain).
# ---------------------------------------------------------------------------

PHASH_SCHEMA = (
    "doc_id long, phash long, decodable boolean, degenerate boolean"
)


def image_dhash(payload: bytes) -> int | None:
    """64-bit difference hash of a decodable image; None otherwise.

    Integer-exact and library-free: decode (the module's real decoders),
    nearest-resize to 9x8, integer BT.601 luma (DIV 1000), then one bit
    per horizontal neighbor comparison — row-major bit order. Stable
    under uniform brightness shifts and nearest-resize artifacts, which
    is exactly what survives re-encoding pipelines."""
    real = decode_image(payload)
    if real is None:
        return None
    _w, _h, px, _fmt = real
    g = nearest_resize(px, 9, 8).astype(np.int64)
    luma = (g[..., 0] * 299 + g[..., 1] * 587 + g[..., 2] * 114) // 1000
    bits = (luma[:, 1:] > luma[:, :-1]).reshape(-1)
    h = 0
    for i, b in enumerate(bits):
        if b:
            h |= 1 << i
    # two's-complement into a signed 64-bit long (Spark LongType has no
    # unsigned variant); xor/bit_count/shiftrightunsigned are bitwise, so
    # hamming and banding are unaffected
    return h - (1 << 64) if h >= (1 << 63) else h


def with_image_phash(df_with_payload: DataFrame) -> DataFrame:
    """binary payload -> 64-bit dHash. Scan -> mapInPandas, no shuffle;
    undecodable payloads are (phash NULL, decodable false) rows.

    `degenerate` marks the standard dHash caveat: constant-luma images
    (blank scans, solid fills) hash to all-zero/all-one bits and would
    collide pairwise — `phash_near_dup_pairs` excludes them by default
    because a blank page matching every other blank page is fan-out, not
    signal."""
    import pandas as pd  # noqa: F811 - kernel-local, matches module style

    def fn(batches):
        for pdf in batches:
            hs = [
                image_dhash(bytes(p) if p is not None else b"")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "phash": pd.array(hs, dtype="Int64"),
                    "decodable": [h is not None for h in hs],
                    "degenerate": [h in (0, -1) for h in hs],
                }
            )

    return df_with_payload.mapInPandas(fn, PHASH_SCHEMA)


VFRAME_PHASH_SCHEMA = "doc_id long, vframe_phash long"


def _video_first_frame_phash(payload: bytes) -> int | None:
    """dHash of the first REAL sampled video frame (animated GIF,
    MJPEG-AVI, or MPEG-1 I-picture timeline); None when the payload has
    no decodable video timeline. Plain-Python kernel, unit-testable
    without Spark."""
    from index_search_monorepo_spark.operators.mpeg1 import (
        mpeg1_sample_frames,
    )

    for sampler in (gif_sample_frames, avi_sample_frames, mpeg1_sample_frames):
        frames = sampler(payload, 1, 1)
        if frames:
            return image_dhash(frames[0][2])
    return None


def with_video_first_frame_phash(df_with_payload: DataFrame) -> DataFrame:
    """binary payload -> dHash of the first sampled video frame (NULL for
    non-video payloads). Scan -> mapInPandas, no shuffle — the codec's
    full entropy-decode + reconstruction path runs per row, so planting a
    payload with a pinned expected hash puts the decoder itself under a
    driver gate."""
    import pandas as pd  # noqa: F811 - kernel-local, matches module style

    def fn(batches):
        for pdf in batches:
            hs = [
                _video_first_frame_phash(bytes(p) if p is not None else b"")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "vframe_phash": pd.array(hs, dtype="Int64"),
                }
            )

    return df_with_payload.mapInPandas(fn, VFRAME_PHASH_SCHEMA)


VTIMELINE_SCHEMA = "doc_id long, vframe_count long, vlast_phash long"


def _video_timeline_summary(
    payload: bytes, max_frames: int = 16
) -> tuple[int, int | None]:
    """(number of sampled frames, dHash of the LAST sampled frame) for a
    decodable video timeline; (0, None) otherwise. Unlike the
    first-frame kernel this walks the WHOLE reference chain — for an
    IPPP… MPEG-1 stream the count and last hash are only right if every
    motion-compensated P picture decoded (a failed P poisons the chain
    and drops frames). Plain-Python kernel, unit-testable without
    Spark."""
    from index_search_monorepo_spark.operators.mpeg1 import (
        mpeg1_sample_frames,
    )

    for sampler in (gif_sample_frames, avi_sample_frames, mpeg1_sample_frames):
        frames = sampler(payload, 1, max_frames)
        if frames:
            return len(frames), image_dhash(frames[-1][2])
    return 0, None


def with_video_timeline(df_with_payload: DataFrame) -> DataFrame:
    """binary payload -> (sampled frame count, last-frame dHash); zeros/
    NULL for non-video payloads. Scan -> mapInPandas, no shuffle — the
    full inter-frame decode chain (motion compensation included) runs
    per row, so a planted multi-P stream with pinned count + hash puts
    the P-picture decoder under a driver gate."""
    import pandas as pd  # noqa: F811 - kernel-local, matches module style

    def fn(batches):
        for pdf in batches:
            counts, hashes = [], []
            for p in pdf["payload"]:
                n, ph = _video_timeline_summary(
                    bytes(p) if p is not None else b""
                )
                counts.append(n)
                hashes.append(ph)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "vframe_count": pd.array(counts, dtype="Int64"),
                    "vlast_phash": pd.array(hashes, dtype="Int64"),
                }
            )

    return df_with_payload.mapInPandas(fn, VTIMELINE_SCHEMA)


def phash_near_dup_pairs(
    df_with_phash: DataFrame,
    max_hamming: int = 6,
    bands: int = 8,
    include_degenerate: bool = False,
    registry: list | None = None,
) -> DataFrame:
    """Near-duplicate image pairs: hamming(phash_a, phash_b) <= threshold.

    Banded equality join on byte-slices of the hash (two hashes within
    `bands - 1` bits of each other MUST agree on at least one band, so
    max_hamming <= bands - 1 has guaranteed recall) — never an all-pairs
    comparison; the corpus only shuffles (doc_id, band_no, band_val)
    triples. Same at-scale shape as dedup.simhash_near_dup_pairs."""
    if max_hamming > bands - 1:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the banding guarantee "
            f"(bands - 1 = {bands - 1}); raise `bands`"
        )
    width = 64 // bands
    src = df_with_phash.filter(F.col("phash").isNotNull())
    if not include_degenerate and "degenerate" in src.columns:
        src = src.filter(~F.col("degenerate"))
    banded = src.select(
        "doc_id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_no"),
                        F.shiftrightunsigned(
                            F.col("phash"), b * width
                        ).bitwiseAND(F.lit((1 << width) - 1)).alias("band_val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "phash", "b.band_no", "b.band_val")
    # persist the banded frame: BOTH self-join sides consume it, and
    # while AQE exchange reuse currently dedupes the upstream decode
    # kernel, that is a config-dependent optimization — without it every
    # image would decode twice through the pure-Python codecs (the
    # simhash_near_dup_pairs twin in dedup.py carries the same persist
    # for the same reason; registry = the cache-release lifecycle)
    from index_search_monorepo_spark.operators.dedup import _persist

    banded = _persist(banded, registry)
    a, b2 = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(
        F.col("a.phash").bitwiseXOR(F.col("b.phash"))
    ).cast("long")
    return (
        a.join(
            b2,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= F.lit(int(max_hamming)))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Audio fingerprint dedup: the PCM analogue of the image dHash — an
# energy-envelope difference hash so identical and lightly-requantized
# recordings collapse to nearby 64-bit hashes, paired with the same
# banded hamming join.
# ---------------------------------------------------------------------------

AUDIO_FP_SCHEMA = (
    "doc_id long, afp long, decodable boolean, degenerate boolean"
)


def audio_fingerprint(payload: bytes, windows: int = 65) -> int | None:
    """64-bit envelope hash of a decodable PCM payload; None otherwise.

    Integer-exact: mono-fold the channels (mean DIV), split the signal
    into `windows` equal spans, sum |sample| per span, then one bit per
    adjacent-window energy comparison (the dHash trick on the loudness
    envelope — time-local, so uniform gain changes and small requantize
    noise keep most bits). Two's-complement into a signed 64-bit long."""
    real = decode_pcm(payload)
    if real is None:
        return None
    _rate, samples = real
    n = samples.shape[0]
    if n == 0:
        return 0
    mono = np.abs(samples.astype(np.int64)).sum(axis=1) // samples.shape[1]
    idx = (np.arange(windows + 1) * n) // windows
    # per-window MEAN (sum DIV size), not sum: windows differ by one
    # sample when `windows` does not divide n, and a sum-based hash made
    # constant/DC clips hash to a length-dependent pattern instead of 0
    # (review finding: every constant clip of a common duration paired
    # with every other one, regardless of amplitude)
    energies = [
        int(mono[idx[i]: idx[i + 1]].sum()) // max(idx[i + 1] - idx[i], 1)
        for i in range(windows)
    ]
    h = 0
    for i in range(windows - 1):
        if energies[i + 1] > energies[i]:
            h |= 1 << i
    return h - (1 << 64) if h >= (1 << 63) else h


def with_audio_fingerprint(df_with_payload: DataFrame) -> DataFrame:
    """binary payload -> 64-bit envelope hash. Scan -> mapInPandas, no
    shuffle; non-PCM payloads are (afp NULL, decodable false) rows;
    silent/constant audio is flagged degenerate (all comparisons false)
    for the same fan-out reason as blank images."""
    import pandas as pd  # noqa: F811 - kernel-local, matches module style

    def fn(batches):
        for pdf in batches:
            hs = [
                audio_fingerprint(bytes(p) if p is not None else b"")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "afp": pd.array(hs, dtype="Int64"),
                    "decodable": [h is not None for h in hs],
                    "degenerate": [h in (0, -1) for h in hs],
                }
            )

    return df_with_payload.mapInPandas(fn, AUDIO_FP_SCHEMA)


def audio_near_dup_pairs(
    df_with_afp: DataFrame,
    max_hamming: int = 6,
    bands: int = 8,
    include_degenerate: bool = False,
    registry: list | None = None,
) -> DataFrame:
    """Near-duplicate audio pairs — the image banded-hamming joiner over
    the envelope hash (same guarantee: hamming <= bands-1 always found).

    Explicit select, not withColumnRenamed: a frame carrying BOTH phash
    and afp (image+audio joined on doc_id) would otherwise end up with
    two 'phash' columns and fail later with AMBIGUOUS_REFERENCE, and a
    missing afp column fails here with a clear error instead of a
    silent rename no-op (review finding)."""
    renamed = df_with_afp.select(
        "doc_id", F.col("afp").alias("phash"), "degenerate"
    )
    return phash_near_dup_pairs(
        renamed,
        max_hamming=max_hamming,
        bands=bands,
        include_degenerate=include_degenerate,
        registry=registry,
    )
