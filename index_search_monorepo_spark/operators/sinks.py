"""Output sinks (SURVEY.md §2.1 S10/S11/S12 tail).

 - `post_json_batches` — S10: the reference indexer POSTs batches of ~100
   JSON documents to Solr's update handler and routes a failed batch to the
   DLQ instead of crashing (ht_indexer_api.py:39-47,
   document_indexer_service.py:45-80). Spark-first: a per-partition batched
   HTTP POST whose per-batch outcomes come back as ROWS (status DataFrame),
   never job failures — the repo's error-envelope convention.
 - `write_json` — S11: the local JSON sink
   (document_generator_service_local.py:51-60 writes one file per document;
   the distributed equivalent is JSON-lines parts, one object per row).
 - `write_xlsx` — S12: the collection-statistics Excel export
   (get_collection_statistics.py:151-178). No openpyxl in this container, so
   the workbook is written directly as SpreadsheetML on stdlib zipfile —
   XLSX is a zip of XML parts. Sheets are small driver-side rollups by
   construction (facet statistics), so the collect() here is bounded and
   deliberate.
"""

from __future__ import annotations

import re
import zipfile
from xml.sax.saxutils import escape

from pyspark.sql import DataFrame

# ---------------------------------------------------------------------------
# S10 — batched HTTP POST sink
# ---------------------------------------------------------------------------

_STATUS_SCHEMA = (
    "partition_id int, batch_no int, batch_id string, n_docs int,"
    " status int, error string"
)


def post_json_batches(
    docs: DataFrame,
    url: str,
    batch_size: int = 100,
    timeout: float = 30.0,
    cache_registry: list | None = None,
) -> DataFrame:
    """POST rows as JSON arrays of `batch_size` documents per request (the
    reference's 100-docs/POST operating constant, BASELINE.md). Returns a
    status DataFrame — (partition_id, batch_no, batch_id, n_docs, status,
    error) — one row per batch; a failed batch reports status=-1 with the
    error text (DLQ-equivalent: requeue decisions belong to the caller, the
    job never fails). Legitimate RDD/mapPartitions use: a sink boundary
    with imperative per-partition I/O.

    Delivery semantics: **at-least-once, materialized exactly once per
    call.** The POSTs run eagerly inside this function (the status RDD is
    persist(MEMORY_AND_DISK)'ed and counted before the DataFrame is
    built), so counting AND collecting the returned statuses — or any
    number of later actions — replays cached status rows, not the HTTP
    requests (ADVICE r02: the previous lazy form re-sent every partition's
    batches on every action). Task retries and speculative attempts can
    still re-send a partition's batches — that is inherent to
    side-effecting tasks — so each request carries a **deterministic
    idempotency key**: `batch_id` = md5 of the exact JSON body, sent as
    the `X-Batch-Id` header (a header, not a body field, so the body stays
    a plain Solr-compatible document array) and recorded in the status
    rows. A retried task re-serializes identical rows → identical
    batch_id, so the endpoint (or a log scraper) can detect and drop
    duplicate deliveries. Disable spark.speculation for jobs driving
    endpoints that ignore the key.

    Cache lifecycle: pass cache_registry=[] to collect the persisted
    status RDD and release it with `operators.dedup.release_caches` once
    the returned frame is materialized; with the default None the status
    rows stay cached for the session (tiny — one row per batch), which
    repeated sink calls in a long-lived session may want to avoid."""
    cols = docs.columns

    def run(it):
        import hashlib as _hashlib
        import json as _json
        import urllib.request

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else -1

        def flush(batch, bno):
            body = _json.dumps(batch).encode("utf-8")
            batch_id = _hashlib.md5(body).hexdigest()
            req = urllib.request.Request(
                url,
                data=body,
                headers={
                    "Content-Type": "application/json",
                    "X-Batch-Id": batch_id,
                },
            )
            try:
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    return (
                        pid, bno, batch_id, len(batch), int(resp.status), None
                    )
            except Exception as e:  # noqa: BLE001 - errors are rows
                return (pid, bno, batch_id, len(batch), -1, str(e)[:500])

        batch, bno = [], 0
        for row in it:
            batch.append(dict(zip(cols, row)))
            if len(batch) >= batch_size:
                yield flush(batch, bno)
                batch, bno = [], bno + 1
        if batch:
            yield flush(batch, bno)

    from pyspark import StorageLevel

    # persist + count fires the POSTs NOW, one task attempt per partition.
    # persist (not localCheckpoint): only the python-side is_cached flag
    # stops PySpark from PIPELINING createDataFrame's row-conversion into
    # the same Python stage as `run` — a pipelined composite re-executes
    # the POSTs on every downstream action even with a JVM checkpoint.
    # MEMORY_AND_DISK: status rows are tiny (one per batch); spill, never
    # recompute.
    status_rdd = docs.rdd.mapPartitions(run).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    status_rdd.count()
    if cache_registry is not None:
        cache_registry.append(status_rdd)
    return docs.sparkSession.createDataFrame(status_rdd, _STATUS_SCHEMA)


# ---------------------------------------------------------------------------
# S11 — local JSON sink
# ---------------------------------------------------------------------------


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed JSON-lines sink: one JSON object per row, partition-
    parallel parts (the scalable form of the reference's one-file-per-doc
    local publisher)."""
    df.write.mode(mode).json(path)


# ---------------------------------------------------------------------------
# S12 — XLSX sink (stdlib SpreadsheetML)
# ---------------------------------------------------------------------------

_SHEETNAME_BAD = re.compile(r"[\[\]:*?/\\]")


def _sheet_name(name: str) -> str:
    return _SHEETNAME_BAD.sub("_", name)[:31] or "Sheet"


def _col_letter(idx: int) -> str:
    """0-based column index -> A1-style letters."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return f'<c r="{ref}"/>'
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}" t="n"><v>{value!r}</v></c>'
    text = escape(str(value))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def _sheet_xml(columns: list[str], rows: list[tuple]) -> str:
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<worksheet xmlns="http://schemas.openxmlformats.org/'
        'spreadsheetml/2006/main"><sheetData>',
    ]
    header = "".join(
        _cell_xml(f"{_col_letter(i)}1", c) for i, c in enumerate(columns)
    )
    parts.append(f'<row r="1">{header}</row>')
    for r, row in enumerate(rows, start=2):
        cells = "".join(
            _cell_xml(f"{_col_letter(i)}{r}", v) for i, v in enumerate(row)
        )
        parts.append(f'<row r="{r}">{cells}</row>')
    parts.append("</sheetData></worksheet>")
    return "".join(parts)


def write_xlsx(
    sheets: dict[str, DataFrame], path: str, max_rows: int = 100_000
) -> None:
    """Write {sheet_name: DataFrame} as a minimal valid XLSX workbook
    (get_collection_statistics.py:151-178 writes one statistics table per
    sheet). Guard: refuses sheets above max_rows — this sink is for
    driver-sized rollups, not data-plane exports."""
    named = [(_sheet_name(n), df) for n, df in sheets.items()]
    collected = []
    for name, df in named:
        rows = df.limit(max_rows + 1).collect()
        if len(rows) > max_rows:
            raise ValueError(
                f"sheet '{name}' exceeds max_rows={max_rows}; the XLSX sink "
                "is for driver-sized statistics tables"
            )
        collected.append((name, df.columns, [tuple(r) for r in rows]))

    n = len(collected)
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        + "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(n)
        )
        + "</Types>"
    )
    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
        '2006/main" xmlns:r="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships"><sheets>'
        + "".join(
            f'<sheet name="{escape(name)}" sheetId="{i + 1}" '
            f'r:id="rId{i + 1}"/>'
            for i, (name, _c, _r) in enumerate(collected)
        )
        + "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
        '2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(n)
        )
        + "</Relationships>"
    )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, (_name, columns, rows) in enumerate(collected):
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml", _sheet_xml(columns, rows)
            )
