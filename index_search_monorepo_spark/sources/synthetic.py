"""Deterministic synthetic corpus generator (FIXTURES.md §1–§4).

Emits the BASELINE.json input table
    documents_spans(doc_id string,
                    spans array<struct<kind,text,media_ref,offset>>)
plus the sidecar mets_meta, catalog, MySQL-shaped dimension tables, a poison
table, and a tracktable — all seeded (per-doc independent RNG so any subset is
reproducible), written as parquet with pyarrow.

Shapes mirror the reference fixtures:
 - spans per page: txt (+ optional html, img), page ORDER 1-based, FILEID-style
   media_ref (mets_test.xml structMap; mets_file_extractor.py:15-33)
 - txt text exercises string_preparation (text_processor.py:27-41): \\r, \\n,
   edge whitespace, & < > \" ', multibyte UTF-8, some pages empty-after-strip
 - html text: nav/footer boilerplate (high link density) around main content
 - catalog mirrors catalog.json keys consumed by catalog_metadata.py
 - dims mirror mysql_data_extractor.py:45-89 result shapes
"""

from __future__ import annotations

import json
import random
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
NAMESPACES = ["mdp", "uc2", "miun", "uiug", "chi"]
FEATURE_VOCAB = [
    "FRONT_COVER", "BACK_COVER", "TITLE", "TABLE_OF_CONTENTS", "CHAPTER_START",
    "FIRST_CONTENT_CHAPTER_START", "IMPLICIT_PAGE_NUMBER", "UNTYPICAL_PAGE",
    "IMAGE_ON_PAGE", "BLANK", "FOLDOUT", "PAGE_TURNBACK",
]
WORDS = (
    "the quick brown fox jumps over lazy dog historia natural de las aves "
    "chapter verse printed london benares translation & <section> \"quoted\" "
    "don't it's año pájaro über straße पृष्ठ पुस्तक volume index plate front "
    "r&d 3<4 5>2 'single' mixed\"both' edition").split(" ")
SPECIAL_PREFIXES = ["", "  ", "\t", "\r\n", " \xa0"]
SPECIAL_SUFFIXES = ["", "\n", " \r ", "  ", " "]
MEMBERS = [f"inst{i:03d}" for i in range(40)]
INVALID_UTF8_MARKER = "\x00INVALID_UTF8\x00"

SPAN_SCHEMA = pa.struct(
    [("kind", pa.string()), ("text", pa.string()),
     ("media_ref", pa.string()), ("offset", pa.int32())]
)


def _page_text(rng: random.Random) -> str:
    if rng.random() < 0.03:
        return rng.choice(["", "   ", "\n\r", " \t "])  # empty after strip
    n = rng.randint(5, 40)
    body = " ".join(rng.choice(WORDS) for _ in range(n))
    if rng.random() < 0.3:
        body = body.replace(" ", "\n", 1)
    if rng.random() < 0.2:
        body += "\rcarriage"
    return rng.choice(SPECIAL_PREFIXES) + body + rng.choice(SPECIAL_SUFFIXES)


def _html_text(rng: random.Random) -> str:
    nav = "".join(
        f'<a href="/x{i}">link {i}</a> ' for i in range(rng.randint(3, 8)))
    paras = "".join(
        "<p>" + " ".join(rng.choice(WORDS) for _ in range(rng.randint(15, 60)))
        + "</p>"
        for _ in range(rng.randint(1, 4))
    )
    footer = '<div><a href="/t">terms</a> <a href="/p">privacy</a> © 1860</div>'
    return (f"<html><body><div id=\"nav\">{nav}</div>"
            f"<div id=\"main\">{paras}</div>{footer}</body></html>")


def _doc_id(rng: random.Random, i: int) -> str:
    ns = NAMESPACES[i % len(NAMESPACES)]
    style = rng.random()
    if style < 0.15:
        return f"{ns}.ark:/13960/t{i:08d}x"
    if style < 0.3:
        return f"{ns}.afs{i:04d}.0001.001"
    return f"{ns}.{39015000000000 + i}"


def make_documents_spans(
    n_docs: int,
    min_pages: int = 5,
    max_pages: int = 500,
    skew_fraction: float = 0.02,
    skew_pages: int = 2000,
    seed: int = SEED,
    start: int = 0,
) -> tuple[pa.Table, pa.Table]:
    """Returns (documents_spans, mets_meta) for docs [start, start+n_docs).
    Per-doc RNG is seeded by (seed, absolute doc index), so chunked/parallel
    generation is bit-identical to a single sequential pass."""
    doc_ids, spans_col = [], []
    m_doc_ids, pf_col, scan_col, read_col, cover_col = [], [], [], [], []
    for i in range(start, start + n_docs):
        rng = random.Random(f"{seed}:doc:{i}")
        doc_id = _doc_id(rng, i)
        n_pages = (
            skew_pages
            if rng.random() < skew_fraction
            else rng.randint(min_pages, max_pages)
        )
        spans, feats = [], []
        for p in range(1, n_pages + 1):
            spans.append({"kind": "txt", "text": _page_text(rng),
                          "media_ref": f"TXT{p:08d}", "offset": p})
            if rng.random() < 0.7:
                spans.append({"kind": "html", "text": _html_text(rng),
                              "media_ref": f"HTML{p:08d}", "offset": p})
            if rng.random() < 0.6:
                spans.append({"kind": "img", "text": "",
                              "media_ref": f"IMG{p:08d}", "offset": p})
            labels = rng.sample(FEATURE_VOCAB, rng.randint(1, 3))
            feats.append({"offset": p, "features": ", ".join(labels),
                          "pgnum": str(p - 1) if rng.random() < 0.8 else None})
        doc_ids.append(doc_id)
        spans_col.append(spans)
        m_doc_ids.append(doc_id)
        pf_col.append(feats)
        scan_col.append(rng.choice(["left-to-right", "right-to-left"]))
        read_col.append(rng.choice(["left-to-right", "right-to-left"]))
        cover_col.append("follows-reading-order")
    docs = pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "spans": pa.array(spans_col, pa.list_(SPAN_SCHEMA)),
    })
    mets = pa.table({
        "doc_id": pa.array(m_doc_ids, pa.string()),
        "page_features": pa.array(pf_col, pa.list_(pa.struct(
            [("offset", pa.int32()), ("features", pa.string()),
             ("pgnum", pa.string())]))),
        "scanning_order": pa.array(scan_col, pa.string()),
        "reading_order": pa.array(read_col, pa.string()),
        "cover_tag": pa.array(cover_col, pa.string()),
    })
    return docs, mets


def make_poison_spans(n_docs: int, seed: int = SEED) -> pa.Table:
    """documents_spans_bad: docs whose txt pages carry the invalid-UTF-8
    simulation marker (FIXTURES.md §1) — must be routed to the error sink,
    mirroring the strict-decode raise (text_processor.py:39-41)."""
    doc_ids, spans_col = [], []
    for i in range(n_docs):
        rng = random.Random(f"{seed}:bad:{i}")
        doc_id = f"bad.{90000000 + i}"
        spans = []
        for p in range(1, rng.randint(2, 6) + 1):
            text = _page_text(rng)
            if p == 2:
                text = INVALID_UTF8_MARKER + text
            spans.append({"kind": "txt", "text": text,
                          "media_ref": f"TXT{p:08d}", "offset": p})
        doc_ids.append(doc_id)
        spans_col.append(spans)
    return pa.table({
        "doc_id": pa.array(doc_ids, pa.string()),
        "spans": pa.array(spans_col, pa.list_(SPAN_SCHEMA)),
    })


_MARC_TEXTS = [
    "Defoe, Daniel, 1661?-1731.", "The adventures & travels", "Benares, 1860",
    "455 p. incl. front., illus. plates. 20 cm.", 'Title from "Catalogue"',
    "don't strip <this>", "SPEC HUB PR 3403 .H5",
]


def _fullrecord_xml(rng: random.Random) -> str:
    """MARC21-slim-shaped XML: datafields with tags >99 and <=99, with and
    without subfields, text needing quoteattr (FIXTURES.md §2)."""
    parts = ['<collection xmlns="http://www.loc.gov/MARC21/slim"><record>',
             "<leader>01158nam a22003011 4500</leader>",
             '<controlfield tag="008">821118s1860 ii 000 0 hin d</controlfield>']
    for _ in range(rng.randint(2, 6)):
        tag = rng.choice(["010", "035", "050"])  # <=99: skipped by fold
        parts.append(
            f'<datafield tag="{tag}" ind1=" " ind2=" ">'
            f'<subfield code="a">skip-{rng.randint(0, 99)}</subfield></datafield>')
    for _ in range(rng.randint(3, 10)):
        tag = rng.choice(["100", "245", "260", "300", "500", "650", "974"])
        if rng.random() < 0.15:
            txt = rng.choice(_MARC_TEXTS).replace("&", "&amp;").replace("<", "&lt;")
            parts.append(f'<datafield tag="{tag}" ind1=" " ind2=" ">{txt}</datafield>')
        else:
            subs = "".join(
                f'<subfield code="{c}">'
                + rng.choice(_MARC_TEXTS).replace("&", "&amp;").replace("<", "&lt;")
                + "</subfield>"
                for c in "abc"[: rng.randint(1, 3)]
            )
            parts.append(f'<datafield tag="{tag}" ind1=" " ind2=" ">{subs}</datafield>')
    parts.append("</record></collection>")
    return "".join(parts)


def make_catalog(doc_ids: list[str], seed: int = SEED) -> pa.Table:
    """Catalog records, one record owning 1..4 items (FIXTURES.md §2).
    Exercises: ht_id_display[2] often empty; htsource shorter than ht_id
    (positional fallback); ht_json items lacking enum_pubdate; records with
    and without raw date/enumPublishDate (bothPublishDate path)."""
    rows: dict[str, list] = {k: [] for k in [
        "id", "ht_id", "ht_id_display", "ht_json", "htsource", "fullrecord",
        "author", "author2", "title", "title_display", "titleSort", "title_a",
        "title_ab", "title_top", "title_rest", "mainauthor", "author_top",
        "author_sortkey", "title_sortkey", "oclc", "sdrnum", "lccn", "isbn",
        "issn", "rptnum", "isn_related", "callnumber", "sudoc", "language",
        "language008_full", "format", "publisher", "series", "series2",
        "serialTitle", "serialTitle_a", "serialTitle_ab", "serialTitle_rest",
        "topicStr", "publishDate", "geographicStr", "countryOfPubStr",
        "genre", "era", "date", "enumPublishDate",
    ]}
    i = 0
    rec_no = 0
    while i < len(doc_ids):
        rng = random.Random(f"{seed}:cat:{rec_no}")
        k = min(rng.randint(1, 4), len(doc_ids) - i)
        items = doc_ids[i : i + k]
        i += k
        rec_no += 1
        rows["id"].append(f"{rec_no:09d}")
        rows["ht_id"].append(items)
        enum0 = rng.choice(["", "v.1", "no.3 1860", ""])  # often empty
        rows["ht_id_display"].append(
            [f"{it}|20220101|{enum0 if j == 0 else rng.choice(['', 'v.2'])}"
             f"|1860||{j}|Title {rec_no}" for j, it in enumerate(items)])
        ht_json = [
            {"htid": it,
             **({"enum_pubdate": "1860"} if rng.random() < 0.6 else {}),
             "ingest": "20220101",
             "rights": ["pd", "bib"],
             "heldby": rng.sample(MEMBERS, rng.randint(0, 2)),
             "enumcron": enum0}
            for it in items]
        rows["ht_json"].append(json.dumps(ht_json))
        n_src = len(items) if rng.random() < 0.7 else 1  # IndexError path
        rows["htsource"].append(
            [rng.choice(NAMESPACES) for _ in range(n_src)])
        rows["fullrecord"].append(_fullrecord_xml(rng))
        multi = lambda base: [f"{base} {rec_no}"] + (  # noqa: E731
            [f"{base} alt {rec_no}"] if rng.random() < 0.3 else [])
        for f in ["author", "author2", "title", "title_display", "titleSort",
                  "title_a", "title_ab", "title_top", "title_rest",
                  "mainauthor", "author_top", "author_sortkey",
                  "title_sortkey", "oclc", "sdrnum", "lccn", "isbn", "issn",
                  "rptnum", "isn_related", "callnumber", "sudoc", "language",
                  "language008_full", "format", "publisher", "series",
                  "series2", "serialTitle", "serialTitle_a", "serialTitle_ab",
                  "serialTitle_rest", "topicStr", "geographicStr",
                  "countryOfPubStr", "genre", "era"]:
            rows[f].append(multi(f) if rng.random() < 0.9 else None)
        rows["publishDate"].append(["1860"] if rng.random() < 0.85 else None)
        has_both = rng.random() < 0.4
        rows["date"].append("1860" if has_both else None)
        rows["enumPublishDate"].append("1860-v1" if has_both else None)
    arrays = {}
    for k, v in rows.items():
        if k in ("id", "ht_json", "fullrecord", "date", "enumPublishDate"):
            arrays[k] = pa.array(v, pa.string())
        else:
            arrays[k] = pa.array(v, pa.list_(pa.string()))
    return pa.table(arrays)


def make_dims(doc_ids: list[str], seed: int = SEED) -> dict[str, pa.Table]:
    """MySQL-shaped dimensions (FIXTURES.md §3): rights rows 0/1/2 per doc,
    holdings 0..5 members some with access_count=0, collections with
    num_items above/below the 1000 threshold, hf dates incl. '9999'."""
    rights = {"namespace": [], "id": [], "attr": []}
    hold = {"volume_id": [], "member_id": [], "access_count": []}
    coll_item = {"extern_item_id": [], "MColl_ID": []}
    colls = {"MColl_ID": [], "num_items": []}
    hf = {"bib_num": [], "bib_fmt": [], "rights_date_used": []}
    rng0 = random.Random(f"{seed}:colls")
    for cid in range(100, 160):
        colls["MColl_ID"].append(cid)
        colls["num_items"].append(
            rng0.choice([10, 500, 1000, 1001, 5000, 2_000_000]))
    large = {c for c, n in zip(colls["MColl_ID"], colls["num_items"]) if n > 1000}
    rights_codes = [25, 15, 18, 1, 21, 23, 19, 13, 11, 20, 7, 10, 24, 14, 17, 22, 12, 2, 3, 9]
    for i, d in enumerate(doc_ids):
        rng = random.Random(f"{seed}:dim:{i}")
        ns, _, obj = d.partition(".")
        n_rights = rng.choices([0, 1, 2], weights=[15, 75, 10])[0]
        for _ in range(n_rights):
            rights["namespace"].append(ns)
            rights["id"].append(obj)
            rights["attr"].append(rng.choice(rights_codes))
        for m in rng.sample(MEMBERS, rng.randint(0, 5)):
            hold["volume_id"].append(d)
            hold["member_id"].append(m)
            hold["access_count"].append(rng.choice([0, 0, 1, 2, 5]))
        for c in rng.sample(sorted(large) + [100, 101], rng.randint(0, 3)):
            coll_item["extern_item_id"].append(d)
            coll_item["MColl_ID"].append(c)
        hf["bib_num"].append(f"{(i % 50) + 1:09d}")
        hf["bib_fmt"].append(rng.choice(["SE", "BK", "SE"]))
        hf["rights_date_used"].append(rng.choice(["1860", "1901", "9999", "186"]))
    return {
        "rights_current": pa.table({
            "namespace": pa.array(rights["namespace"], pa.string()),
            "id": pa.array(rights["id"], pa.string()),
            "attr": pa.array(rights["attr"], pa.int32())}),
        "holdings_htitem_htmember": pa.table({
            "volume_id": pa.array(hold["volume_id"], pa.string()),
            "member_id": pa.array(hold["member_id"], pa.string()),
            "access_count": pa.array(hold["access_count"], pa.int32())}),
        "mb_coll_item": pa.table({
            "extern_item_id": pa.array(coll_item["extern_item_id"], pa.string()),
            "MColl_ID": pa.array(coll_item["MColl_ID"], pa.int32())}),
        "mb_collection": pa.table({
            "MColl_ID": pa.array(colls["MColl_ID"], pa.int32()),
            "num_items": pa.array(colls["num_items"], pa.int32())}),
        "hf": pa.table({
            "bib_num": pa.array(hf["bib_num"], pa.string()),
            "bib_fmt": pa.array(hf["bib_fmt"], pa.string()),
            "rights_date_used": pa.array(hf["rights_date_used"], pa.string())}),
    }


def _write_sharded(tbl: pa.Table, dest: Path, docs_per_shard: int = 64,
                   first_doc: int = 0) -> None:
    """Write a spans table as a directory of shard files with small row
    groups. A single-file single-row-group corpus serializes the whole scan
    into ONE Spark task (31 of 32 byte-range splits contain no row-group
    start) — measured as the dominant cost of the extraction job and a flat
    scaling curve. A real 100 TB corpus is thousands of files; the synthetic
    one must be scan-parallel too."""
    dest.mkdir(parents=True, exist_ok=True)
    n = tbl.num_rows
    shards = max(1, (n + docs_per_shard - 1) // docs_per_shard)
    for i in range(shards):
        chunk = tbl.slice(i * docs_per_shard, docs_per_shard)
        pq.write_table(
            chunk, dest / f"part-{first_doc + i * docs_per_shard:08d}.parquet",
            row_group_size=16,
        )


def _gen_chunk(args: tuple) -> int:
    """Worker: generate docs [start, start+n) and write their spans + mets
    shards. Deterministic per absolute doc index, so chunk boundaries do not
    change the corpus."""
    out_dir, start, n, seed, span_kwargs = args
    out = Path(out_dir)
    docs, mets = make_documents_spans(n, seed=seed, start=start, **span_kwargs)
    _write_sharded(docs, out / "documents_spans.parquet", first_doc=start)
    (out / "mets_meta.parquet").mkdir(parents=True, exist_ok=True)
    pq.write_table(
        mets, out / "mets_meta.parquet" / f"part-{start:08d}.parquet",
        row_group_size=256,
    )
    return n


def generate_corpus(
    out_dir: str | Path,
    n_docs: int = 200,
    n_poison: int = 5,
    seed: int = SEED,
    chunk_docs: int = 250,
    **span_kwargs,
) -> Path:
    """Write the full synthetic corpus to out_dir; deterministic per params
    (parallel generation is bit-identical to sequential — per-doc seeding)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    chunks = [
        (str(out), s, min(chunk_docs, n_docs - s), seed, span_kwargs)
        for s in range(0, n_docs, chunk_docs)
    ]
    if len(chunks) <= 1:
        for c in chunks:
            _gen_chunk(c)
    else:
        from concurrent.futures import ProcessPoolExecutor

        with ProcessPoolExecutor(max_workers=min(32, len(chunks))) as ex:
            list(ex.map(_gen_chunk, chunks))
    pq.write_table(make_poison_spans(n_poison, seed=seed),
                   out / "documents_spans_bad.parquet")
    # doc ids are derivable without page generation: the id draw is the
    # first use of each per-doc RNG
    doc_ids = [
        _doc_id(random.Random(f"{seed}:doc:{i}"), i) for i in range(n_docs)
    ]
    pq.write_table(make_catalog(doc_ids, seed=seed), out / "catalog.parquet")
    for name, tbl in make_dims(doc_ids, seed=seed).items():
        pq.write_table(tbl, out / f"{name}.parquet")
    return out
