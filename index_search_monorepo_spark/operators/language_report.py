"""ISO 639-3 / 639-5 language report over MARC records (reference:
app/data_operations/src/metadata_extractor/report_generation.py).

The reference streams a gzipped Zephir MARC-JSON export record-by-record,
keeps public-domain records (974$r in {pd, pdus}), matches language codes
from 008/35-37 and 041$a against an ISO 639-5 code list (plus 041 fields
explicitly tagged ISO 639-3 via ind2=7 + $2=iso639-3), and writes one TSV
row per matching record (report_generation.py:197-247 match_record,
:173-194 build_report_row).

Spark-first: the per-record generator loop becomes one filtered projection
of pure column expressions over the columnar MARC shape
(sources/marc_json.py MARC_SCHEMA); the ISO 639-5 code list (~100 entries)
is inlined as a literal array — at catalog scale this is the classic
tiny-dim-vs-huge-fact shape where a broadcast literal beats any join.
Zero Python, zero shuffle; scales linearly with the record count.

Faithfully preserved quirks (each pinned in tests/test_language_report.py):
 - rights = FIRST 974$r whose normalized value is pd/pdus (:117-126);
   records without one are dropped before any matching;
 - 008 language = bytes 35-37, only when the field is >= 38 chars
   (:128-140);
 - matched_code / set_type / field_041 are unique-preserving-first-seen
   joins ("; " / "; " / " | ", :155-171, :230-236);
 - per-041 loop order: the ISO 639-5 matches of a field are appended
   before its ISO 639-3 codes (:216-228);
 - field_546 is emitted only when set 1 (ISO 639-5) matched (:181-189);
 - OCLC number: per 035 value ($a before $z, field order), the
   '(OCoLC)ocm|ocn|on<digits>' form wins over the bare >=4-digit
   fallback within the same value (:143-152).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from index_search_monorepo_spark.operators.marc_extracts import (
    _fields_with_tag,
    _format_field,
    control_number_expr,
    subfield_values,
    title_expr,
)

RIGHTS_CODES = ("pd", "pdus")
ISO6393_SOURCE = "iso639-3"

# The complete ISO 639-5 (language-family) code list — all 115 codes of
# the public standard, matching what the reference loads from its TSV
# (load_iso6395_codes, report_generation.py:81-94). Callers may still pass
# their own list to override.
DEFAULT_ISO6395_CODES = (
    "aav", "afa", "alg", "alv", "apa", "aqa", "aql", "art", "ath", "auf",
    "aus", "awd", "azc", "bad", "bai", "bat", "ber", "bih", "bnt", "btk",
    "cai", "cau", "cba", "ccn", "ccs", "cdc", "cdd", "cel", "cmc", "cpe",
    "cpf", "cpp", "crp", "csu", "cus", "day", "dmn", "dra", "egx", "esx",
    "euq", "fiu", "fox", "gem", "gme", "gmq", "gmw", "grk", "hmx", "hok",
    "hyx", "iir", "ijo", "inc", "ine", "ira", "iro", "itc", "jpx", "kar",
    "kdo", "khi", "kro", "map", "mkh", "mno", "mun", "myn", "nah", "nai",
    "ngf", "nic", "nub", "omq", "omv", "oto", "paa", "phi", "plf", "poz",
    "pqe", "pqw", "pra", "qwe", "roa", "sai", "sal", "sdv", "sem", "sgn",
    "sio", "sit", "sla", "smi", "son", "sqj", "ssa", "syd", "tai", "tbq",
    "trk", "tup", "tut", "tuw", "urj", "wak", "wen", "xgn", "xnd", "ypk",
    "zhx", "zle", "zls", "zlw", "znd",
)


def _clean_nonempty(values: Column) -> Column:
    """unique_preserve_order core (report_generation.py:97-103): trim, drop
    empties. Spark's array_distinct keeps first-occurrence order, matching
    the reference's dict.setdefault idiom."""
    return F.filter(F.transform(values, lambda v: F.trim(v)), lambda v: v != "")


def unique_preserve_order_expr(values: Column) -> Column:
    return F.array_distinct(_clean_nonempty(values))


def rights_code_expr(fields: Column) -> Column:
    """extract_rights_code (:117-126): first normalized 974$r in
    RIGHTS_CODES, else ''."""
    normalized = F.transform(
        subfield_values(fields, "974", "r"), lambda v: F.lower(F.trim(v))
    )
    hit = F.try_element_at(
        F.filter(normalized, lambda v: v.isin(*RIGHTS_CODES)), F.lit(1)
    )
    return F.coalesce(hit, F.lit(""))


def code_008_expr(fields: Column) -> Column:
    """extract_008_language_code (:128-140): bytes 35-37 of the first 008
    control field, '' when absent or shorter than 38 chars."""
    data = F.try_element_at(
        F.transform(_fields_with_tag(fields, ("008",)), lambda f: f["data"]),
        F.lit(1),
    )
    return F.when(
        data.isNotNull() & (F.length(data) >= 38),
        F.lower(F.trim(F.substring(data, 36, 3))),
    ).otherwise(F.lit(""))


def _field_041_codes(f: Column) -> Column:
    """get_041_codes (:142-152): unique, ordered, lowercased 041$a values."""
    subs = F.coalesce(f["subfields"], F.array())
    return F.array_distinct(
        F.filter(
            F.transform(
                F.filter(subs, lambda s: s["code"] == F.lit("a")),
                lambda s: F.lower(F.trim(s["value"])),
            ),
            lambda v: v != "",
        )
    )


def _is_iso6393_field(f: Column) -> Column:
    """is_iso6393_field (:155-166): 041 ind2 = '7' and any $2 = iso639-3."""
    subs = F.coalesce(f["subfields"], F.array())
    return (F.coalesce(f["ind2"], F.lit(" ")) == "7") & F.exists(
        subs,
        lambda s: (s["code"] == F.lit("2"))
        & (F.lower(F.trim(s["value"])) == F.lit(ISO6393_SOURCE)),
    )


def oclc_number_expr(fields: Column) -> Column:
    """extract_oclc_number (:143-152 of the module; see docstring quirk):
    first 035 $a/$z value yielding either the (OCoLC) form or the bare
    numeric fallback — OCoLC tried first within each value."""
    values = F.flatten(
        F.transform(
            _fields_with_tag(fields, ("035",)),
            lambda f: F.concat(
                F.transform(
                    F.filter(
                        F.coalesce(f["subfields"], F.array()),
                        lambda s: s["code"] == F.lit("a"),
                    ),
                    lambda s: s["value"],
                ),
                F.transform(
                    F.filter(
                        F.coalesce(f["subfields"], F.array()),
                        lambda s: s["code"] == F.lit("z"),
                    ),
                    lambda s: s["value"],
                ),
            ),
        )
    )

    def per_value(v: Column) -> Column:
        cleaned = F.trim(v)
        oclc = F.regexp_extract(
            cleaned, r"(?i)\(OCoLC\)(?:oc[mn]|on)?(\d+)", 1
        )
        fallback = F.regexp_extract(
            cleaned, r"(?i)\b(?:oc[mn]|on)?(\d{4,})\b", 1
        )
        return F.when(cleaned == "", F.lit("")).otherwise(
            F.when(oclc != "", oclc).otherwise(fallback)
        )

    extracted = F.filter(F.transform(values, per_value), lambda x: x != "")
    return F.coalesce(F.try_element_at(extracted, F.lit(1)), F.lit(""))


def _matching(iso_codes: tuple[str, ...]):
    """Per-record match structure shared by the report columns: the 041
    fields of interest with their per-field ISO 639-5 matches and
    ISO 639-3 flag, plus the 008 match."""
    iso_arr = F.array(*[F.lit(c) for c in iso_codes])

    def build(fields: Column) -> dict[str, Column]:
        f041 = _fields_with_tag(fields, ("041",))
        per_field = F.transform(
            f041,
            lambda f: F.struct(
                _field_041_codes(f).alias("codes"),
                F.filter(
                    _field_041_codes(f),
                    lambda c: F.array_contains(iso_arr, c),
                ).alias("iso5"),
                (_is_iso6393_field(f) & (F.size(_field_041_codes(f)) > 0)).alias(
                    "is3"
                ),
                _format_field(f).alias("rendered"),
            ),
        )
        code8 = code_008_expr(fields)
        code8_hit = F.array_contains(iso_arr, code8)
        return {"per_field": per_field, "code8": code8, "code8_hit": code8_hit}

    return build


def language_report(
    df: DataFrame,
    iso6395_codes: tuple[str, ...] = DEFAULT_ISO6395_CODES,
    fields_col: str = "fields",
) -> DataFrame:
    """match_record + build_report_row (:173-247) as one filtered select.

    Output (OUTPUT_COLUMNS order, :27-36): record_id, title, oclc_number,
    matched_code, set_type, field_041, field_546, rights_code — one row per
    record whose rights are pd/pdus and that matched at least one code."""
    f = F.col(fields_col)
    build = _matching(iso6395_codes)

    # bind the per-field match structure once behind a Project boundary
    # (CLAUDE.md lesson #1: each report column references it)
    m = build(f)
    base = df.select(
        "*",
        m["per_field"].alias("_m041"),
        m["code8"].alias("_code8"),
        m["code8_hit"].alias("_code8_hit"),
        rights_code_expr(f).alias("_rights"),
    )

    pf = F.col("_m041")
    code8_hit = F.col("_code8_hit")

    # matched codes in reference loop order: 008 first, then per 041 field
    # its ISO 639-5 matches followed by (if flagged) all its codes
    matched_codes = unique_preserve_order_expr(
        F.concat(
            F.when(code8_hit, F.array(F.col("_code8"))).otherwise(F.array().cast("array<string>")),
            F.flatten(
                F.transform(
                    pf,
                    lambda x: F.concat(
                        x["iso5"],
                        F.when(x["is3"], x["codes"]).otherwise(F.array().cast("array<string>")),
                    ),
                )
            ),
        )
    )
    set_types = unique_preserve_order_expr(
        F.concat(
            F.when(code8_hit, F.array(F.lit("iso639-5"))).otherwise(F.array().cast("array<string>")),
            F.flatten(
                F.transform(
                    pf,
                    lambda x: F.concat(
                        F.when(F.size(x["iso5"]) > 0, F.array(F.lit("iso639-5")))
                        .otherwise(F.array().cast("array<string>")),
                        F.when(x["is3"], F.array(F.lit("iso639-3")))
                        .otherwise(F.array().cast("array<string>")),
                    ),
                )
            ),
        )
    )
    relevant_041 = unique_preserve_order_expr(
        F.transform(
            F.filter(pf, lambda x: (F.size(x["iso5"]) > 0) | x["is3"]),
            lambda x: x["rendered"],
        )
    )
    set1_matched = code8_hit | F.exists(pf, lambda x: F.size(x["iso5"]) > 0)
    field_546 = F.when(
        set1_matched,
        F.array_join(
            unique_preserve_order_expr(
                F.transform(_fields_with_tag(f, ("546",)), _format_field)
            ),
            " | ",
        ),
    ).otherwise(F.lit(""))

    return (
        base.filter(F.col("_rights").isin(*RIGHTS_CODES))
        .filter(F.size(matched_codes) > 0)
        .select(
            control_number_expr(f).alias("record_id"),
            title_expr(f).alias("title"),
            oclc_number_expr(f).alias("oclc_number"),
            F.array_join(matched_codes, "; ").alias("matched_code"),
            F.array_join(set_types, "; ").alias("set_type"),
            F.array_join(relevant_041, " | ").alias("field_041"),
            field_546.alias("field_546"),
            F.col("_rights").alias("rights_code"),
        )
    )
