"""A8 — collection-statistics rollups (reference:
app/solr_query/src/data_analysis/get_collection_statistics.py).

The reference pulls facet counts from Solr into pandas, derives the call
number's first letter, groups, and maps the letter to a subject category via
the single-letter entries of map_call_number.properties (:40-64), with two
quirks preserved here:

 - unmapped letters fall through to the letter itself
   (`general_callno_map.get(x.upper(), x)`, :61-62);
 - the mapped value is the text after the FIRST '-' of the properties value,
   leading space included (`get_category_name`, :19-28 — '.split('-')[1]' of
   'A - General Works' is ' General Works').

Spark-first: the in-memory dict becomes a broadcast-joined mapping dimension;
the pandas groupby becomes a groupBy over the fact side, which never
shuffles more than one aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Single-letter ("general") call-number map — spec constants from
# map_call_number.properties:4-445 (the len<2 keys), category text exactly as
# get_category_name would emit it.
GENERAL_CALLNO_MAP = {
    "A": "A - General Works",
    "B": "B - Philosophy, Psychology, Religion",
    "C": "C - Historical Sciences (Archaeology, Genealogy)",
    "D": "D - World History",
    "E": "E - History of the Americas (General)",
    "F": "F - History of the Americas (Local)",
    "G": "G - Geography, Anthropology, Recreation",
    "H": "H - Social Sciences",
    "J": "J - Political Science",
    "K": "K - Law",
    "L": "L - Education",
    "M": "M - Music",
    "N": "N - Fine Arts",
    "P": "P - Language & Literature",
    "Q": "Q - Science",
    "R": "R - Medicine",
    "S": "S - Agriculture",
    "T": "T - Technology",
    "U": "U - Military Science",
    "V": "V - Naval Science",
    "Z": "Z - Bibliography, Library Science, Information Resources",
}


def callno_mapping_dim(spark: SparkSession) -> DataFrame:
    """The letter -> category broadcast dimension, with get_category_name
    (:19-28) applied: text after the first '-', leading space preserved."""
    rows = [
        (letter, value.split("-", 1)[1] if "-" in value else value)
        for letter, value in GENERAL_CALLNO_MAP.items()
    ]
    return spark.createDataFrame(rows, "first_letter string, category string")


def category_rollup(
    facets: DataFrame,
    mapping: DataFrame | None = None,
    value_col: str = "value",
    count_col: str = "count",
) -> DataFrame:
    """map_callnoletters (:30-64): first letter of the facet value
    (uppercased, :61), group-sum the counts, broadcast-join the category
    map, fall through to the letter itself when unmapped.

    Output: (first_letter, n_values, total_count, category)."""
    if mapping is None:
        mapping = callno_mapping_dim(facets.sparkSession)
    grouped = (
        facets.select(
            F.upper(F.substring(F.col(value_col), 1, 1)).alias("first_letter"),
            F.col(count_col).cast("long").alias("_cnt"),
        )
        .groupBy("first_letter")
        .agg(
            F.count("*").cast("long").alias("n_values"),
            F.sum("_cnt").cast("long").alias("total_count"),
        )
    )
    return grouped.join(F.broadcast(mapping), "first_letter", "left").select(
        "first_letter",
        "n_values",
        "total_count",
        F.coalesce(F.col("category"), F.col("first_letter")).alias("category"),
    )
