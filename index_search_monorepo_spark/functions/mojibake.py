"""Mojibake repair (ftfy-style UTF-8/cp1252 round-trip inversion).

The dominant encoding defect in web-crawled corpora is UTF-8 bytes
mis-decoded as Windows-1252/Latin-1 somewhere upstream ("cafÃ©" for
"café", "â‚¬" for "€"), sometimes twice ("ÃƒÂ©"). The reference treats
any non-UTF-8 input as a hard error and raises
(text_processor.py:33-40, "File encoding incompatible with UTF-8");
mis-decoded-but-valid-UTF-8 text sails through it byte-corrupted. A
training-data pipeline wants the recoverable class REPAIRED before any
content hashing — exact dedup, line dedup, shingles and the inverted
index's term keys all treat "café" and "cafÃ©" as different documents —
so this stage belongs with NFC normalization (functions/unicode_norm.py)
at the front of the curation plan.

The repair rule is deterministic (no scoring model, unlike full ftfy):
a string is repaired iff every char maps back to one byte under
"sloppy cp1252" (the cp1252 table, with the 5 undefined bytes
0x81/0x8D/0x8F/0x90/0x9D falling back to their Latin-1 C1 controls —
exactly what lenient decoders emit for them) AND those bytes decode as
STRICT UTF-8 to a different string. Applied up to `max_passes` times to
unwind double-encoding. ASCII is a fixed point; genuinely-Latin text
("naïve", "Åse") survives because its byte image is not valid UTF-8 —
the known residual false-positive space (rare short sequences like
"Ä«" whose byte image happens to be valid UTF-8) is the same bet ftfy
makes, and in crawled corpora those sequences are overwhelmingly real
mojibake.

Spark shape: one Arrow-batched pandas UDF returning a
struct<text,passes>, bound ONCE behind a Project boundary and marked
nondeterministic so neither CollapseProject nor predicate pushdown can
re-evaluate it (CLAUDE.md lessons #1/#9; plan pinned to a single
ArrowEvalPython stage by tests/test_mojibake.py). Zero shuffles — a
pure map stage at any scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["repair_text", "mojibake_udf", "with_mojibake"]

def _sloppy_cp1252_bytes(s: str) -> bytes | None:
    """Inverse of a sloppy-cp1252 (or latin-1) decode: each char back to
    one byte via the cp1252 table, Latin-1 fallback for the C1 range
    (cp1252's five undefined bytes 0x81/0x8D/0x8F/0x90/0x9D and the
    controls a plain latin-1 reading emits). Returns None when any char
    has no single-byte pre-image (the string cannot be a single-byte
    mis-decode at all)."""
    out = bytearray()
    for ch in s:
        cp = ord(ch)
        if cp < 0x80:
            out.append(cp)
            continue
        try:
            out += ch.encode("cp1252")
        except UnicodeEncodeError:
            if cp <= 0xFF:
                # Latin-1 fallback: the five cp1252 gaps plus the other
                # C1 controls a plain latin-1 mis-decode would emit —
                # accepting both inverts either upstream reading, and
                # the strict-UTF-8 gate below still decides.
                out.append(cp)
            else:
                return None
    return bytes(out)


def repair_text(s: str, max_passes: int = 2) -> tuple[str, int]:
    """Repair mojibake in `s`; returns (repaired, n_passes_applied).

    Each pass inverts one UTF-8-read-as-cp1252 round trip; `max_passes`
    bounds double-encoded text. A pass applies only when the sloppy
    byte image decodes as strict UTF-8 to a different string."""
    cur = s
    passes = 0
    while passes < max_passes:
        if cur.isascii():
            break
        b = _sloppy_cp1252_bytes(cur)
        if b is None:
            break
        try:
            dec = b.decode("utf-8")
        except UnicodeDecodeError:
            break
        if dec == cur:
            break
        cur = dec
        passes += 1
    return cur, passes


_UDF_CACHE: list = []


def mojibake_udf():
    """struct<text,passes> repair UDF (None-safe), built lazily because
    pandas_udf parses its return type against an active session
    (mets_ingest convention). Marked nondeterministic: the struct is
    consumed by two field projections, and predicate pushdown would
    otherwise be free to duplicate the evaluation (CLAUDE.md #9)."""
    if not _UDF_CACHE:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("struct<text: string, passes: long>")
        def _fix(s: pd.Series) -> pd.DataFrame:
            fixed = [
                repair_text(x) if x is not None else (None, None)
                for x in s
            ]
            return pd.DataFrame(fixed, columns=["text", "passes"])

        _UDF_CACHE.append(_fix.asNondeterministic())
    return _UDF_CACHE[0]


def with_mojibake(
    df: DataFrame, text_col: str = "text", prefix: str = "fix_"
) -> DataFrame:
    """Adds {prefix}text (repaired string), {prefix}passes (BIGINT
    repair passes applied, 0 = already clean/unrepairable) from ONE
    kernel evaluation. The struct is bound once via withColumn; the two
    field reads stay behind that Project boundary."""
    taken = {f"{prefix}text", f"{prefix}passes", f"_{prefix}struct"}
    clash = taken.intersection(df.columns)
    if clash:
        raise ValueError(
            f"with_mojibake would overwrite input column(s)"
            f" {sorted(clash)}; rename them first"
        )
    bound = f"_{prefix}struct"
    out = df.withColumn(bound, mojibake_udf()(F.col(text_col)))
    return (
        out.withColumn(f"{prefix}text", F.col(bound)["text"])
        .withColumn(f"{prefix}passes", F.col(bound)["passes"])
        .drop(bound)
    )
