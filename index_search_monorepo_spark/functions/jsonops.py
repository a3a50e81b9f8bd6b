"""Semi-structured (JSON) operators: typed field extraction, dynamic
key/type profiling, validity stats, and schema-drift reporting.

Reference: no counterpart in hathitrust/index_search_monorepo (its
payloads are XML/MARC, covered by functions/marc.py + sources/
mets_ingest.py); built per the brief's analytics-completeness category —
the VARIANT/semi-structured tier every warehouse engine ships
(Snowflake VARIANT, BigQuery JSON, Spark's own from_json family), plus
the schema-inference/drift profiling a long-lived event pipeline needs.

Cross-engine semantics (probed, test-pinned):
 - Spark `get_json_object` and DuckDB `json_extract_string` agree on the
   raw-extraction contract: strings UNQUOTED, numbers/booleans verbatim,
   nested objects/arrays re-serialized MINIFIED (identical bytes), JSON
   null -> SQL NULL, missing path -> SQL NULL.
 - Spark is lenient on malformed input (NULL everywhere); DuckDB's JSON
   functions THROW — every oracle fragment wraps in `json_valid` CASEs.
 - Validity here = Spark's `get_json_object(j, '$') IS NOT NULL`
   contract; for the planted gate payloads this agrees bit-for-bit with
   DuckDB `json_valid` (pinned). Exotic divergences (single quotes,
   trailing garbage both parsers treat differently) are out of contract.
 - Dynamic keys: Spark explodes `from_json(j, map<string,string>)`
   (values coerced to the same raw forms as get_json_object); DuckDB
   mirrors with `unnest(json_keys(j))` + a quoted dynamic path. Keys
   containing double quotes are out of contract (documented).

Type classes are inferred from the RAW value string with the same regex
on both engines — so a JSON string "1" classifies as integer on BOTH
sides (a documented profiling approximation: the raw form is identical,
the parity exact).

Scale shapes: field extraction is a pure per-row projection (JVM
expressions, zero shuffle, zero Python). Profiling explodes only the
KEY strings — document payloads never shuffle; the rollup is one
map-side-combined groupBy at key grain (vocabulary-sized). Drift
reporting joins the tiny expected-schema frame broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "json_valid_expr",
    "classify_raw_expr",
    "with_json_fields",
    "json_key_profile",
    "json_validity_stats",
    "json_drift_report",
    "classify_raw_sql",
    "json_profile_oracle_sql",
]

# raw-string type classes, identical regex both engines (RE2/Java-common)
_INT_RE = "^-?[0-9]+$"
_DEC_RE = "^-?[0-9]+(\\.[0-9]+)?([eE][+-]?[0-9]+)?$"

JSON_CLASSES = [
    "null", "integer", "decimal", "boolean", "object", "array", "string",
]


def json_valid_expr(col: str | Column) -> Column:
    """True when the JSON parses (Spark leniency contract — see module
    docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, "$").isNotNull()


def classify_raw_expr(raw: Column) -> Column:
    """Type class of a raw extracted value string: null / integer /
    decimal / boolean / object / array / string."""
    return (
        F.when(raw.isNull(), F.lit("null"))
        .when(raw.rlike(_INT_RE), F.lit("integer"))
        .when(raw.rlike(_DEC_RE), F.lit("decimal"))
        .when(raw.isin("true", "false"), F.lit("boolean"))
        .when(raw.startswith("{"), F.lit("object"))
        .when(raw.startswith("["), F.lit("array"))
        .otherwise(F.lit("string"))
    )


def classify_raw_sql(raw_sql: str) -> str:
    """DuckDB mirror of classify_raw_expr over a raw value expression."""
    return f"""CASE
      WHEN {raw_sql} IS NULL THEN 'null'
      WHEN regexp_matches({raw_sql}, '{_INT_RE}') THEN 'integer'
      WHEN regexp_matches({raw_sql}, '{_DEC_RE}') THEN 'decimal'
      WHEN {raw_sql} IN ('true', 'false') THEN 'boolean'
      WHEN starts_with({raw_sql}, '{{') THEN 'object'
      WHEN starts_with({raw_sql}, '[') THEN 'array'
      ELSE 'string' END"""


def with_json_fields(
    df: DataFrame,
    col: str,
    fields: list[tuple[str, str, str]],
) -> DataFrame:
    """df + one typed column per (out_name, json_path, sql_type):
    `get_json_object` + try-cast, so a missing path, malformed document,
    or unparsable value lands as NULL — never a job failure (errors-are-
    rows convention at field grain). Pure projection: zero shuffle,
    zero Python."""
    out = df
    for name, path, dtype in fields:
        raw = F.get_json_object(F.col(col), path)
        out = out.withColumn(
            name, raw if dtype == "string" else raw.try_cast(dtype)
        )
    return out


def json_key_profile(df: DataFrame, col: str) -> DataFrame:
    """Corpus-level schema inference: one row per top-level key with
    (key, n_present, n_null, n_integer, n_decimal, n_boolean, n_object,
    n_array, n_string). Invalid/non-object documents contribute nothing
    (count them via json_validity_stats). Only key strings + class
    labels shuffle — never the payloads."""
    m = F.from_json(F.col(col), "map<string,string>")
    kv = df.select(F.explode(m).alias("key", "_raw")).withColumn(
        "_cls", classify_raw_expr(F.col("_raw"))
    )
    aggs = [F.count("*").cast("long").alias("n_present")] + [
        F.sum((F.col("_cls") == c).cast("long"))
        .cast("long")
        .alias(f"n_{c}")
        for c in JSON_CLASSES
    ]
    return kv.groupBy("key").agg(*aggs)


def json_validity_stats(df: DataFrame, col: str) -> DataFrame:
    """One row: (n_rows, n_valid, n_invalid) under the validity
    contract."""
    v = json_valid_expr(col)
    return df.agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(v.cast("long")).cast("long").alias("n_valid"),
        F.sum((~v).cast("long")).cast("long").alias("n_invalid"),
    )


def json_drift_report(
    profile: DataFrame, expected: dict[str, str]
) -> DataFrame:
    """Schema drift against an expected {key: class} contract: one row
    per key seen or expected with (key, status, n_present,
    n_major_class) — status in ok / type_drift (majority class differs)
    / unexpected (seen, not in contract) / missing (contracted, never
    seen). The expected frame is literal-tiny and broadcast."""
    spark = profile.sparkSession
    exp = F.broadcast(
        spark.createDataFrame(
            list(expected.items()), "key string, exp_cls string"
        )
    )
    cls_cols = [f"n_{c}" for c in JSON_CLASSES]
    major = F.greatest(*[F.col(c) for c in cls_cols])
    # majority class name: first class (in JSON_CLASSES order) hitting
    # the max count — deterministic tie-break
    major_name = F.coalesce(
        *[
            F.when(F.col(f"n_{c}") == major, F.lit(c))
            for c in JSON_CLASSES
        ]
    )
    p = profile.withColumn("major_cls", major_name).withColumn(
        "n_major_class", major.cast("long")
    )
    j = p.join(exp, "key", "full_outer")
    status = (
        F.when(F.col("n_present").isNull(), F.lit("missing"))
        .when(F.col("exp_cls").isNull(), F.lit("unexpected"))
        .when(F.col("major_cls") != F.col("exp_cls"), F.lit("type_drift"))
        .otherwise(F.lit("ok"))
    )
    return j.select(
        "key",
        status.alias("status"),
        F.coalesce("n_present", F.lit(0)).cast("long").alias("n_present"),
        F.coalesce("n_major_class", F.lit(0))
        .cast("long")
        .alias("n_major_class"),
    )


def json_profile_oracle_sql(source_cte: str, col_sql: str) -> str:
    """DuckDB CTE chain mirroring json_key_profile + json_validity_stats;
    exposes jp_tbl (key grain) and jv_tbl (one row). Wraps every JSON
    call in json_valid CASEs (DuckDB throws on malformed input)."""
    j = col_sql
    raw = (
        f"""json_extract_string(j, '$."' || k || '"')"""
    )
    cls = classify_raw_sql("rawv")
    cls_sums = ",\n             ".join(
        f"CAST(sum(CASE WHEN cls = '{c}' THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_{c}"
        for c in JSON_CLASSES
    )
    return f"""
    jp_src AS (
      SELECT CASE WHEN json_valid({j}) THEN {j} END AS j
      FROM {source_cte}
    ),
    jp_kv AS (
      SELECT j, unnest(json_keys(j)) AS k
      FROM jp_src
      WHERE j IS NOT NULL AND json_type(j) = 'OBJECT'
    ),
    jp_cls AS (
      SELECT k, {cls} AS cls
      FROM (SELECT k, {raw} AS rawv FROM jp_kv)
    ),
    jp_tbl AS (
      SELECT k AS key, CAST(count(*) AS BIGINT) AS n_present,
             {cls_sums}
      FROM jp_cls GROUP BY k
    ),
    jv_tbl AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CASE WHEN json_valid({j}) THEN 1 ELSE 0 END)
               AS BIGINT) AS n_valid,
             CAST(sum(CASE WHEN json_valid({j}) THEN 0 ELSE 1 END)
               AS BIGINT) AS n_invalid
      FROM {source_cte}
    )"""
