"""DuckDB-SQL generators mirroring the engine's column expressions.

The driver's correctness gate runs each ``queries()`` entry side-by-side with
an ANSI-SQL oracle in DuckDB. The scalar semantics our engine guarantees
bit-exactly (reference `libs/common_lib/src/ht_utils/text_processor.py:27-41`
string_preparation, `:10-24` xmlesc) therefore need a *second* independent
implementation in DuckDB SQL. These generators emit that SQL from the same
spec the Spark expressions in `functions/text.py` implement, so any semantic
drift between the two shows up as a value-hash mismatch in CORRECTNESS_r{N}.

Only used for test oracles — never in the data plane.
"""

from __future__ import annotations

# Python str.strip() whitespace set, as an RE2 character class (DuckDB uses
# RE2). Mirrors functions/text.py:_PY_WS_CLASS (Java regex flavor).
_RE2_WS_CLASS = (
    "[\\t\\n\\x0B\\f\\r\\x1C-\\x1F \\x85\\xA0\\x{1680}\\x{2000}-\\x{200A}"
    "\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]"
)


def pystrip_sql(expr: str) -> str:
    """Python str.strip() parity in DuckDB SQL."""
    return (
        f"regexp_replace(regexp_replace({expr}, '^{_RE2_WS_CLASS}+', ''),"
        f" '{_RE2_WS_CLASS}+$', '')"
    )


def _xml_escape_sql(expr: str) -> str:
    return (
        f"replace(replace(replace({expr}, '&', '&amp;'),"
        f" '<', '&lt;'), '>', '&gt;')"
    )


def quoteattr_sql(expr: str) -> str:
    """CPython xml.sax.saxutils.quoteattr in DuckDB SQL (see
    functions/text.py:quoteattr_expr for the semantics spec)."""
    esc = _xml_escape_sql(expr)
    esc = (
        f"replace(replace(replace({esc}, chr(10), '&#10;'),"
        f" chr(13), '&#13;'), chr(9), '&#9;')"
    )
    # name the escaped expression once via a correlated scalar — DuckDB
    # evaluates it inline; keep it textual to stay ANSI-ish.
    return (
        f"CASE WHEN contains({esc}, '\"') AND contains({esc}, chr(39)) "
        f"THEN '\"' || replace({esc}, '\"', '&quot;') || '\"' "
        f"WHEN contains({esc}, '\"') THEN chr(39) || {esc} || chr(39) "
        f"ELSE '\"' || {esc} || '\"' END"
    )


def string_preparation_sql(expr: str) -> str:
    """F1 string_preparation (text_processor.py:27-41) in DuckDB SQL:
    \\r -> ' ', \\n -> ' ', strip, quoteattr."""
    s = f"replace(replace({expr}, chr(13), ' '), chr(10), ' ')"
    return quoteattr_sql(pystrip_sql(s))


def xmlesc_sql(expr: str) -> str:
    """F2 xmlesc (text_processor.py:10-24) in DuckDB SQL."""
    return (
        f"replace(replace({_xml_escape_sql(expr)},"
        f" chr(39), '&apos;'), '\"', '&quot;')"
    )


# Deterministic "spike" applied to the synthetic testdata text in BOTH
# engines before extraction, so the quoteattr / strip / newline paths are
# actually exercised (the driver corpus is plain [a-z ] text).
def spike_text_sql(expr: str) -> str:
    return (
        f"replace(replace(replace(replace({expr},"
        f" 'table', 'ta<ble'),"
        f" 'fast', 'f&st'),"
        f" 'row', '\"row' || chr(39) || 's\"'),"
        f" 'scan', 'sc' || chr(10) || 'an')"
    )
