"""Unicode canonical normalization (NFC) as a curation stage.

Web-crawled and OCR'd text mixes precomposed and decomposed forms of the
same grapheme (e + U+0301 vs U+00E9, Hangul jamo vs precomposed
syllables): every downstream exact-match operator — exact dedup
(dedup.content_key_expr), line dedup, shingle hashing, the inverted
index's term keys — treats the two spellings as different bytes, so
normalization has to run BEFORE any content hashing. The reference
pipeline inherits this from Solr/Lucene's analysis chain
(config_search.py:19-20 delegates analysis to Solr; ICUNormalizer2 is
the standard first filter); here it is a first-class DataFrame stage.

Spark has no built-in Unicode-normalize expression, so the kernel is an
Arrow-batched pandas UDF over `unicodedata.normalize` (C-level table
lookup per string — no per-row Python in the sense CLAUDE.md bans: one
Python invocation per Arrow batch). The DuckDB oracle side is the
built-in `nfc_normalize` (utf8proc); both implement the same Unicode
canonical composition algorithm, and the contract gate value-hashes the
normalized strings byte-for-byte (tests/test_unicode_norm.py pins the
battery: combining marks, Hangul jamo, NFC-invariant compatibility
chars).

At 100 TB this is a pure map stage: zero shuffles, the UDF column is
bound once behind a Project boundary (CLAUDE.md lesson #1) so the
`changed`/`chars` derivations don't re-run the normalization.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["nfc_normalize_udf", "with_nfc", "nfc_oracle_fragments"]

_UDF_CACHE: list = []


def nfc_normalize_udf():
    """NFC-normalize pandas UDF (None-safe), built lazily because
    pandas_udf needs an active session to parse its return type
    (mets_ingest convention). Arrow-batched; the per-element work is
    CPython's C unicodedata composition."""
    if not _UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _nfc(s: pd.Series) -> pd.Series:
            return s.map(
                lambda x: unicodedata.normalize("NFC", x)
                if x is not None
                else None
            )

        _UDF_CACHE.append(_nfc)
    return _UDF_CACHE[0]


def with_nfc(
    df: DataFrame, text_col: str = "text", prefix: str = "nfc_"
) -> DataFrame:
    """Adds three columns derived from ONE normalization pass:

      {prefix}text    : the NFC form of `text_col`
      {prefix}changed : BIGINT 0/1 — whether normalization changed bytes
                        (the corpus-health metric: a high changed-rate
                        flags an OCR/encoding stage emitting decomposed
                        forms upstream)
      {prefix}chars   : BIGINT codepoint length of the normalized text

    The UDF output is referenced three times, which is exactly the
    double-evaluation trap of CLAUDE.md lessons #1/#8 — so it is bound
    once via withColumn (CollapseProject refuses to inline a non-cheap
    expression used more than once); the plan carries a single
    ArrowEvalPython stage (pinned by test_unicode_norm.py)."""
    taken = {f"{prefix}text", f"{prefix}changed", f"{prefix}chars"}
    clash = taken.intersection(df.columns)
    if clash:
        raise ValueError(
            f"with_nfc would overwrite input column(s) {sorted(clash)};"
            " rename them first"
        )
    out = df.withColumn(
        f"{prefix}text", nfc_normalize_udf()(F.col(text_col))
    )
    norm: Column = F.col(f"{prefix}text")
    return out.withColumn(
        f"{prefix}changed", (norm != F.col(text_col)).cast("long")
    ).withColumn(f"{prefix}chars", F.length(norm).cast("long"))


def nfc_oracle_fragments(src_sql: str, prefix: str = "nfc_") -> dict[str, str]:
    """DuckDB mirror of with_nfc's three columns over a trusted SQL
    expression (utf8proc nfc_normalize — same canonical composition as
    unicodedata; parity pinned by the test battery)."""
    norm = f"nfc_normalize({src_sql})"
    return {
        f"{prefix}text": norm,
        f"{prefix}changed": f"CAST({norm} <> ({src_sql}) AS BIGINT)",
        f"{prefix}chars": f"CAST(len({norm}) AS BIGINT)",
    }
