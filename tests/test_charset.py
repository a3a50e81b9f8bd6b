"""Byte-level intake: charset detection, decoding, content sniffing."""

import pandas as pd
import pytest

from index_search_monorepo_spark.functions import charset as CS


TEXT = "Déjà vu — naïve café №42"


@pytest.mark.parametrize(
    "payload,expect",
    [
        (b"", "empty"),
        (b"plain ascii only", "ascii"),
        (TEXT.encode("utf-8"), "utf-8"),
        (b"\xef\xbb\xbf" + TEXT.encode("utf-8"), "utf-8-sig"),
        (TEXT.encode("utf-16-le"), "utf-16le"),  # BOM-less, parity rule
        (TEXT.encode("utf-16-be"), "utf-16be"),
        (b"\xff\xfe" + TEXT.encode("utf-16-le"), "utf-16le"),  # BOM
        (b"\xfe\xff" + TEXT.encode("utf-16-be"), "utf-16be"),
        (TEXT.encode("utf-32-le"), "utf-32le"),  # utf-32 writes its BOM? no:
        (b"caf\xe9 latin bytes \xde\xad", "latin-1"),
    ],
)
def test_detect_charset(payload, expect):
    assert CS.detect_charset(payload) == expect


@pytest.mark.parametrize(
    "enc",
    ["utf-8", "utf-8-sig", "utf-16", "utf-16-le", "utf-16-be", "latin-1"],
)
def test_decode_round_trip(enc):
    src = TEXT if enc != "latin-1" else "café latin"
    assert CS.decode_bytes(src.encode(enc)) == src


def test_decode_is_total():
    assert CS.decode_bytes(None) == ""
    assert CS.decode_bytes(b"") == ""
    # arbitrary binary never raises
    assert isinstance(CS.decode_bytes(bytes(range(256))), str)


@pytest.mark.parametrize(
    "payload,mime",
    [
        (b"%PDF-1.7 ...", "application/pdf"),
        (b"PK\x03\x04rest", "application/zip"),
        (b"\x1f\x8bgz", "application/gzip"),
        (b"\x89PNG\r\n\x1a\nrest", "image/png"),
        (b"\xff\xd8\xff\xe0jfif", "image/jpeg"),
        (b"GIF89a;;;", "image/gif"),
        (b"II*\x00tiff", "image/tiff"),
        (b"P6 2 2 255 xxx", "image/x-portable-pixmap"),
        (b"RIFF\x24\x00\x00\x00WAVEfmt ", "audio/wav"),
        (b"RIFF\x24\x00\x00\x00AVI LIST", "video/x-msvideo"),
        (b"FORM\x00\x00\x00\x24AIFFCOMM", "audio/aiff"),
        (b"\x00\x00\x00\x18ftypisom", "video/mp4"),
        (b"\x00\x00\x01\xb3mpeg", "video/mpeg"),
        (b"  <!DOCTYPE html><html>", "text/html"),
        (b"<HTML><body>", "text/html"),
        (b"<?xml version='1.0'?>", "application/xml"),
        ("<html><p>page</p>".encode("utf-16-le"), "text/html"),  # UTF-16 HTML
        (b"just some words", "text/plain"),
        (bytes(range(256)) * 4, "application/octet-stream"),
        (b"", "inode/x-empty"),
    ],
)
def test_sniff_mime(payload, mime):
    assert CS.sniff_mime(payload) == mime


def test_with_intake_spark(spark):
    rows = [
        ("u8", TEXT.encode("utf-8")),
        ("u16", TEXT.encode("utf-16-le")),
        ("html", b"<!doctype html><p>hi</p>"),
        ("png", b"\x89PNG\r\n\x1a\nxxxx"),
        ("none", None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, payload binary")
    out = {
        r["doc_id"]: r["intake"]
        for r in CS.with_intake(df, "payload").collect()
    }
    assert out["u8"]["charset"] == "utf-8" and out["u8"]["text"] == TEXT
    assert out["u16"]["charset"] == "utf-16le" and out["u16"]["text"] == TEXT
    assert out["html"]["mime"] == "text/html"
    assert out["png"]["mime"] == "image/png" and out["png"]["text"] is None
    assert out["none"]["mime"] == "inode/x-empty"
