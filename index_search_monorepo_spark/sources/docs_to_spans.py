"""Derive the BASELINE.json interleaved spans table from a flat documents
table, deterministically, in pure column expressions.

The driver testdata ships ``documents(doc_id:int64, text, lang, source,
n_chars)``; the engine's input contract is
``(doc_id:string, spans:array<struct<kind,text,media_ref,offset>>)``
(BASELINE.json input_hint). This module re-shapes one into the other with a
fixed-width page chunking so the SAME table can be produced by the DuckDB
oracle (generate_series + substr) and compared span-for-span.

Before chunking, a deterministic "spike" injects the characters the
reference's string_preparation cares about (& < > \" ' \\n) into the plain
synthetic text — both engines apply the identical spike, so the bit-exact
quoteattr path (text_processor.py:27-41) is exercised by the driver gate,
not just by unit tests.

Pure expressions — whole-stage codegen, zero shuffle, scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PAGE_WIDTH = 80  # chars per synthetic page


def spike_text_expr(col: Column) -> Column:
    """Mirror of functions/sqlgen.py:spike_text_sql — keep in lockstep."""
    col = F.replace(col, F.lit("table"), F.lit("ta<ble"))
    col = F.replace(col, F.lit("fast"), F.lit("f&st"))
    col = F.replace(col, F.lit("row"), F.lit('"row\'s"'))
    col = F.replace(col, F.lit("scan"), F.lit("sc\nan"))
    return col


def spans_expr(text: Column, page_width: int = PAGE_WIDTH) -> Column:
    """text -> array<struct<kind,text,media_ref,offset>>: fixed-width pages,
    media_ref = 'TXT%08d' (METS FILEID shape, mets_file_extractor.py:15-33),
    offset = 1-based page ORDER."""
    n_pages = F.ceil(F.length(text) / F.lit(float(page_width))).cast("int")
    n_pages = F.greatest(n_pages, F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n_pages),
        lambda p: F.struct(
            F.lit("txt").alias("kind"),
            F.substring(text, (p - 1) * page_width + 1, page_width).alias("text"),
            F.concat(F.lit("TXT"), F.lpad(p.cast("string"), 8, "0")).alias(
                "media_ref"
            ),
            p.cast("int").alias("offset"),
        ),
    )


def documents_to_spans(
    docs: DataFrame,
    page_width: int = PAGE_WIDTH,
    spike: bool = True,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """documents -> (doc_id:string, spans) per the input contract."""
    text = F.col(text_col)
    if spike:
        text = spike_text_expr(text)
    return docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        spans_expr(text, page_width).alias("spans"),
    )


def spans_pages_sql(page_width: int = PAGE_WIDTH, spike: bool = True) -> str:
    """DuckDB oracle for the page decomposition: one row per (doc_id, page).

    Emits columns (doc_id VARCHAR, page_no BIGINT, page_text, media_ref)
    equivalent to exploding `documents_to_spans(...)`.
    """
    from index_search_monorepo_spark.functions.sqlgen import spike_text_sql

    text = spike_text_sql("d.text") if spike else "d.text"
    return f"""
      SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
             CAST(p AS BIGINT) AS page_no,
             substr(s.spiked, CAST((p-1)*{page_width}+1 AS INT), {page_width})
               AS page_text,
             'TXT' || lpad(CAST(p AS VARCHAR), 8, '0') AS media_ref
      FROM documents d,
           LATERAL (SELECT {text} AS spiked) s,
           unnest(generate_series(1,
             greatest(CAST(ceil(len(s.spiked) / {page_width}.0) AS BIGINT), 1)))
             AS t(p)
    """
