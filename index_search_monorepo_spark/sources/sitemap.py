"""Sitemap XML parsing (sitemaps.org protocol) — the crawl-frontier seed
feed of the web-extraction tier.

The reference's analogous surface is structured-XML field extraction
(mets_file_extractor.py:15-33, stdlib ElementTree per CLAUDE.md); a
sitemap is the web equivalent: a host-published XML list of fetchable
URLs with freshness hints. Two document kinds share the container
format:

 - `<urlset>`       : leaf sitemap — `<url>` entries with `loc`
   (required), optional `lastmod`, `changefreq`, `priority`.
 - `<sitemapindex>` : an index of child sitemaps — `<sitemap>` entries
   with `loc` + optional `lastmod`; the fetch loop (not this parser)
   recurses into them.

Parsing is stdlib ElementTree with LOCALNAME tag matching: real-world
sitemaps carry the spec namespace, no namespace, or a misspelled one,
and rejecting on xmlns is the classic over-strict bug. `priority` is
kept integer-exact as priority_milli (0.5 -> 500): the oracle convention
(CLAUDE.md: integer-exact arithmetic) — a float column would hash-drift
across engines. Malformed XML becomes an error ROW (error envelope
convention), never a job failure.

Scale shape: one sitemap document = one row in, entry rows out through a
mapInPandas generator — per-file independent work, no shuffle; the
50k-URL/50MB spec cap bounds per-row memory by construction.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator
from decimal import Decimal, InvalidOperation

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _child_text(el: ET.Element, name: str) -> str | None:
    for c in el:
        if _local(c.tag) == name:
            return (c.text or "").strip() or None
    return None


def _priority_milli(raw: str | None) -> int | None:
    """'0.5' -> 500, integer-exact (Decimal scaling, never float)."""
    if raw is None:
        return None
    try:
        return int(Decimal(raw) * 1000)
    except (InvalidOperation, ValueError):
        return None


def parse_sitemap(xml_text: str) -> dict:
    """{'kind': 'urlset'|'sitemapindex'|None, 'entries': [...],
    'error': str|None}; entries are (loc, lastmod, changefreq,
    priority_milli) tuples — index entries carry None for the last two.
    Entries missing the required <loc> are skipped (spec: loc is the one
    mandatory child)."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as exc:
        return {"kind": None, "entries": [], "error": f"ParseError: {exc}"}
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        return {
            "kind": None,
            "entries": [],
            "error": f"unexpected root element: {kind}",
        }
    want = "url" if kind == "urlset" else "sitemap"
    entries = []
    for el in root:
        if _local(el.tag) != want:
            continue
        loc = _child_text(el, "loc")
        if loc is None:
            continue
        if kind == "urlset":
            entries.append(
                (
                    loc,
                    _child_text(el, "lastmod"),
                    _child_text(el, "changefreq"),
                    _priority_milli(_child_text(el, "priority")),
                )
            )
        else:
            entries.append((loc, _child_text(el, "lastmod"), None, None))
    return {"kind": kind, "entries": entries, "error": None}


SITEMAP_ENTRY_SCHEMA = StructType(
    [
        StructField("host", StringType()),
        StructField("kind", StringType()),
        StructField("loc", StringType()),
        StructField("lastmod", StringType()),
        StructField("changefreq", StringType()),
        StructField("priority_milli", LongType()),
        StructField("entry_ord", LongType()),
        StructField("error", StringType()),
    ]
)


def sitemap_entries(
    sitemaps: DataFrame,
    host_col: str = "host",
    xml_col: str = "sitemap_xml",
) -> DataFrame:
    """(host, sitemap_xml) rows -> one row per sitemap ENTRY, plus one
    error-envelope row per malformed document (kind/loc NULL, error set).
    Order rides in `entry_ord` (document position), never row order."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, xml_text in zip(pdf[host_col], pdf[xml_col]):
                parsed = parse_sitemap(xml_text or "")
                if parsed["error"] is not None:
                    rows.append(
                        (host, None, None, None, None, None, None,
                         parsed["error"])
                    )
                    continue
                for i, (loc, lastmod, cf, prio) in enumerate(
                    parsed["entries"]
                ):
                    rows.append(
                        (host, parsed["kind"], loc, lastmod, cf, prio,
                         i, None)
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in SITEMAP_ENTRY_SCHEMA]
            )

    return sitemaps.select(
        F.col(host_col).alias(host_col), F.col(xml_col).alias(xml_col)
    ).mapInPandas(gen, SITEMAP_ENTRY_SCHEMA)
