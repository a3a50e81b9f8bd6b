"""Byte-level intake: charset detection, decoding, content-type sniffing.

The reference ingests zip members as UTF-8 text and trusts the feed
(ht_utils fs reads, full_text_document_generator.py:101 file-presence
check is the only validation); a web-scale intake cannot — crawl payloads
arrive as raw bytes in undeclared encodings and mixed media types. This
module is stage -1 of the text-intake chain (before mojibake repair and
NFC normalization, which both assume already-decoded str):

    bytes --sniff_mime--> route (pdf/html/image/audio/text lanes)
          --detect_charset--> codec --decode_bytes--> str
          --mojibake.fix / unicode_norm.nfc--> clean text

Determinism contract: both kernels are pure byte-pattern rules (BOMs,
UTF-16 null-byte parity on an ASCII-heavy prefix, strict UTF-8 validity,
magic numbers) — no statistical models, no environment dependence — so a
planted payload's expected label is computable at registration time (the
multimodal planted-ground-truth convention). latin-1 is the terminal
fallback: it never fails to decode, so errors stay rows upstream, never
exceptions here.

Scale shape: Arrow-batched pandas UDFs over the bytes column (the
multimodal kernel convention) — one Python pass per batch, no shuffle,
no join; the decoded text column replaces the bytes column in place so
downstream stages never re-touch binary.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType, StructField, StructType

# detection sample window: BOM-less UTF-16 parity and printable ratios are
# judged on the first 4 KiB — O(1) per record regardless of payload size
SAMPLE = 4096


def detect_charset(b: bytes | None) -> str:
    """Deterministic charset label for a raw payload.

    Order is semantic: BOMs outrank parity outranks UTF-8 validity;
    'latin-1' is the never-fails fallback; 'ascii' is split from 'utf-8'
    because an all-ASCII payload is evidence of NOTHING about the
    producer's encoding (any ASCII superset agrees)."""
    if not b:
        return "empty"
    if b.startswith(b"\xff\xfe\x00\x00"):
        return "utf-32le"
    if b.startswith(b"\x00\x00\xfe\xff"):
        return "utf-32be"
    if b.startswith(b"\xef\xbb\xbf"):
        return "utf-8-sig"
    if b.startswith(b"\xff\xfe"):
        return "utf-16le"
    if b.startswith(b"\xfe\xff"):
        return "utf-16be"
    sample = b[:SAMPLE]
    # BOM-less UTF-32 of BMP-heavy text: three of every four bytes are NUL
    # on one side (checked before UTF-16 — a UTF-32 stream also satisfies
    # one UTF-16 parity)
    if len(sample) >= 8:
        quarter = max(len(sample) // 4, 1)
        hi3 = sum(sample[k::4].count(0) for k in (1, 2, 3))
        lo3 = sum(sample[k::4].count(0) for k in (0, 1, 2))
        if hi3 * 1000 >= 800 * 3 * quarter and sample[0::4].count(0) * 1000 <= 50 * quarter:
            return "utf-32le"
        if lo3 * 1000 >= 800 * 3 * quarter and sample[3::4].count(0) * 1000 <= 50 * quarter:
            return "utf-32be"
    half = max(len(sample) // 2, 1)
    even_nul = sample[0::2].count(0)
    odd_nul = sample[1::2].count(0)
    # BOM-less UTF-16 of ASCII-heavy text: every other byte is NUL on one
    # parity and almost never on the other
    if odd_nul * 1000 >= 700 * half and even_nul * 1000 <= 50 * half:
        return "utf-16le"
    if even_nul * 1000 >= 700 * half and odd_nul * 1000 <= 50 * half:
        return "utf-16be"
    try:
        b.decode("utf-8", "strict")
    except UnicodeDecodeError:
        return "latin-1"
    return "ascii" if max(b) < 0x80 else "utf-8"


_CODEC = {
    "empty": None,
    "ascii": "ascii",
    "utf-8": "utf-8",
    "utf-8-sig": "utf-8-sig",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
    "utf-32le": "utf-32-le",
    "utf-32be": "utf-32-be",
    "latin-1": "latin-1",
}


def decode_bytes(b: bytes | None, charset: str | None = None) -> str:
    """Decode with the detected (or given) charset. BOMs of the BOM-carrying
    labels are stripped by the codec choice; latin-1 never raises, so this
    function is total — garbage in, mojibake out (which stage 0's repair
    then handles), never an exception."""
    if not b:
        return ""
    cs = charset or detect_charset(b)
    codec = _CODEC.get(cs, "latin-1")
    if cs in ("utf-16le", "utf-16be") and b[:2] in (b"\xff\xfe", b"\xfe\xff"):
        b = b[2:]
    if cs in ("utf-32le", "utf-32be"):
        b = b[4:]
    return b.decode(codec or "ascii", "replace")


# magic table in match order (first hit wins); RIFF/FORM/ftyp need a
# second probe and are handled in code
_MAGIC = (
    (b"%PDF-", "application/pdf"),
    (b"PK\x03\x04", "application/zip"),
    (b"\x1f\x8b", "application/gzip"),
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"BM", "image/bmp"),
    (b"II*\x00", "image/tiff"),
    (b"MM\x00*", "image/tiff"),
    (b"\x00\x00\x01\xb3", "video/mpeg"),
)


def sniff_mime(b: bytes | None) -> str:
    """Magic-byte content-type sniff — the intake router for mixed crawl
    payloads. Whitespace/BOM-tolerant HTML/XML probes; P4/P5/P6 netpbm;
    RIFF(WAVE/AVI), FORM(AIFF), ISO-BMFF ftyp. Text fallback requires a
    successful charset detection AND a >=90% printable sample; everything
    else is application/octet-stream (route to the binary lanes, never
    crash a text stage with binary)."""
    if not b:
        return "inode/x-empty"
    for magic, mime in _MAGIC:
        if b.startswith(magic):
            return mime
    if len(b) >= 12:
        if b[:4] == b"RIFF":
            if b[8:12] == b"WAVE":
                return "audio/wav"
            if b[8:12] == b"AVI ":
                return "video/x-msvideo"
        if b[:4] == b"FORM" and b[8:12] in (b"AIFF", b"AIFC"):
            return "audio/aiff"
        if b[4:8] == b"ftyp":
            return "video/mp4"
    if b[:1] in (b"P",) and len(b) >= 3 and b[1:2] in (b"4", b"5", b"6") \
            and b[2:3] in (b" ", b"\t", b"\n", b"\r"):
        return "image/x-portable-pixmap"
    head = b[:SAMPLE]
    # decode the PROBE with the detected charset so UTF-16 HTML still sniffs
    cs = detect_charset(head)
    text_head = decode_bytes(head, cs).lstrip("﻿ \t\r\n").lower()
    if text_head.startswith("<!doctype html") or text_head.startswith("<html"):
        return "text/html"
    if text_head.startswith("<?xml"):
        return "application/xml"
    if cs != "latin-1":
        return "text/plain"
    printable = sum(1 for c in head if c == 9 or c == 10 or c == 13
                    or 32 <= c < 127 or c >= 0xA0)
    if printable * 1000 >= 900 * len(head):
        return "text/plain"
    return "application/octet-stream"


_INTAKE_SCHEMA = StructType(
    [
        StructField("mime", StringType()),
        StructField("charset", StringType()),
        StructField("text", StringType()),
    ]
)


def with_intake(
    df: DataFrame, bytes_col: str, out_col: str = "intake"
) -> DataFrame:
    """Adds ``{out_col}`` struct(mime, charset, text): sniff + detect +
    decode in ONE Arrow-batched pass over the bytes column. text is
    non-null only for the text/* and xml routes (binary lanes keep their
    payload untouched for the media kernels). Marked nondeterministic so
    a predicate on the struct cannot be pushed below the Project and
    re-run the kernel (CLAUDE.md lesson #9)."""

    @F.pandas_udf(_INTAKE_SCHEMA)
    def _kernel(col: pd.Series) -> pd.DataFrame:
        mimes, charsets, texts = [], [], []
        for raw in col:
            b = bytes(raw) if raw is not None else None
            mime = sniff_mime(b)
            cs = detect_charset(b)
            is_texty = mime in (
                "text/plain", "text/html", "application/xml"
            )
            mimes.append(mime)
            charsets.append(cs)
            texts.append(decode_bytes(b, cs) if is_texty else None)
        return pd.DataFrame({"mime": mimes, "charset": charsets, "text": texts})

    kernel = _kernel.asNondeterministic()
    return df.withColumn(out_col, kernel(F.col(bytes_col)))
