"""J9 — A/B engine result comparison (reference:
app/solr_query/src/data_analysis/extracting_diference_solr_results.py).

Two comparison modes over two ranked result lists:

 - `symmetric_id_diff` (get_different_ids, :35-44): ids present in exactly
   one engine's results, regardless of position;
 - `positional_diff` (get_different_sorted_ids, :46-64): positions where the
   two lists disagree — either different ids at the same rank, or one list
   ended early (the reference's IndexError branch counts those positions as
   mismatches too).

The reference walks Python lists per query; here both are joins keyed on
(query-scoped) position/id, so a million query comparisons is one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetric_id_diff(
    a: DataFrame, b: DataFrame, id_col: str = "id"
) -> DataFrame:
    """Ids in exactly one side: (id, side) with side in {'a_only','b_only'}."""
    a_ids = a.select(F.col(id_col).alias("id")).distinct()
    b_ids = b.select(F.col(id_col).alias("id")).distinct()
    return (
        a_ids.join(b_ids, "id", "left_anti")
        .withColumn("side", F.lit("a_only"))
        .unionByName(
            b_ids.join(a_ids, "id", "left_anti").withColumn(
                "side", F.lit("b_only")
            )
        )
    )


def engine_hits_compare(
    a: DataFrame,
    b: DataFrame,
    query_cols: tuple[str, ...] = ("query_string", "operator"),
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """A/B engine hit-count comparison (reference:
    app/solr_query/src/data_analysis/solr_engines_total_hits.py:47-88):
    per (query_string, operator), the total result-row count of each
    engine's export, merged side by side. The reference counts each CSV's
    rows per query and records 0 for a query whose export file is missing;
    here each side is one groupBy count and the merge is a full-outer join
    with 0-fill, so a missing query on either side surfaces as 0 rather
    than dropping the row. One shuffle per side on the (small) query key —
    result cardinality is queries x operators, never corpus-sized."""
    keys = list(query_cols)
    ha = a.groupBy(*keys).agg(
        F.count("*").cast("long").alias(f"total_hits{suffixes[0]}")
    )
    hb = b.groupBy(*keys).agg(
        F.count("*").cast("long").alias(f"total_hits{suffixes[1]}")
    )
    merged = ha.join(hb, keys, "full_outer")
    return merged.select(
        *keys,
        F.coalesce(
            F.col(f"total_hits{suffixes[0]}"), F.lit(0).cast("long")
        ).alias(f"total_hits{suffixes[0]}"),
        F.coalesce(
            F.col(f"total_hits{suffixes[1]}"), F.lit(0).cast("long")
        ).alias(f"total_hits{suffixes[1]}"),
    )


def positional_diff(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "id",
    pos_col: str = "pos",
) -> DataFrame:
    """Positions where ranked lists disagree (get_different_sorted_ids,
    :46-64): full outer join on position; a mismatch is a position where the
    ids differ OR only one list reaches that position (the reference appends
    the index on IndexError). Output: (pos, id_a, id_b), id_* NULL on the
    short side."""
    aa = a.select(
        F.col(pos_col).cast("long").alias("pos"), F.col(id_col).alias("id_a")
    )
    bb = b.select(
        F.col(pos_col).cast("long").alias("pos"), F.col(id_col).alias("id_b")
    )
    joined = aa.join(bb, "pos", "full_outer")
    mismatch = ~(F.col("id_a").eqNullSafe(F.col("id_b")))
    return joined.filter(mismatch).select("pos", "id_a", "id_b")
