"""OLAP relational surfaces: pivot (long->wide) and CUBE grouping sets.

Reference: no direct counterpart (the reference's rollups are flat
GROUP BYs, e.g. `solr_query_monitoring.py`); these are the two
remaining core warehouse-SQL surfaces a user of ANY analytics engine
expects, demonstrated through Spark's native operators and value-gated
against DuckDB's independent formulations (conditional aggregation for
pivot; GROUP BY CUBE + GROUPING() for cube).

Determinism notes (the part that makes them oracle-gateable):
 - `pivot_counts` passes an EXPLICIT value list — Spark's two-pass
   value discovery would make the output schema data-dependent (and
   cost an extra scan); with the list the pivot is one pass, fixed
   schema, missing cells coalesced to 0.
 - `cube_counts` exposes Spark's grouping_id() directly; NULL group
   keys are distinguishable from subtotal rows ONLY through it (the
   classic cube trap — a real NULL in the data and a rollup row both
   print NULL). The oracle reconstructs the same id from DuckDB's
   GROUPING() bits.

Scale: both are single map-side-combinable aggregations (pivot is ONE
hash exchange on the row key with the pivoted columns as conditional
partial aggregates; cube expands each input row into 2^k grouping-set
rows BEFORE the partial aggregation — at k=2 a 4x map-side expansion
that collapses in the combiner, the standard engine implementation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "pivot_counts",
    "cube_counts",
    "pivot_oracle_sql",
    "cube_oracle_sql",
]


def pivot_counts(
    df: DataFrame,
    row_col: str,
    pivot_col: str,
    values: list[str],
) -> DataFrame:
    """(row_col, p_<v1> .. p_<vk>): count of rows per (row, pivot
    value), long-to-wide over the EXPLICIT value list, absent cells 0."""
    if not values:
        raise ValueError("pivot_counts requires an explicit value list")
    wide = (
        df.groupBy(row_col)
        .pivot(pivot_col, values)
        .agg(F.count(F.lit(1)))
    )
    return wide.select(
        row_col,
        *[
            F.coalesce(F.col(f"`{v}`"), F.lit(0))
            .cast("long")
            .alias(f"p_{v}")
            for v in values
        ],
    )


def cube_counts(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """CUBE(col_a, col_b) row counts with the grouping id: one row per
    grouping-set cell — (a, b, grouping_id, cnt); grouping_id bit 0 =
    col_b rolled up, bit 1 = col_a rolled up (Spark's grouping_id()
    order), so (3) is the grand total."""
    return (
        df.cube(col_a, col_b)
        .agg(
            F.grouping_id().cast("long").alias("grouping_id"),
            F.count(F.lit(1)).cast("long").alias("cnt"),
        )
        .select(col_a, col_b, "grouping_id", "cnt")
    )


def pivot_oracle_sql(
    source_cte: str,
    row_sql: str,
    pivot_sql: str,
    values: list[str],
) -> str:
    """DuckDB mirror of pivot_counts via conditional aggregation (the
    INDEPENDENT formulation — no PIVOT keyword); exposes pivot_tbl."""
    cols = ",\n             ".join(
        f"CAST(sum(CASE WHEN {pivot_sql} = '{v}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS p_{v}"
        for v in values
    )
    return f"""
    pivot_tbl AS (
      SELECT {row_sql} AS pivot_key,
             {cols}
      FROM {source_cte} GROUP BY {row_sql}
    )"""


def cube_oracle_sql(source_cte: str, a_sql: str, b_sql: str) -> str:
    """DuckDB mirror of cube_counts via GROUP BY CUBE + GROUPING();
    exposes cube_tbl (a, b, grouping_id, cnt) with Spark's bit order
    (bit 1 = a rolled up, bit 0 = b rolled up)."""
    return f"""
    cube_tbl AS (
      SELECT {a_sql} AS ca, {b_sql} AS cb,
             CAST(GROUPING({a_sql}) * 2 + GROUPING({b_sql}) AS BIGINT)
               AS grouping_id,
             CAST(count(*) AS BIGINT) AS cnt
      FROM {source_cte}
      GROUP BY CUBE ({a_sql}, {b_sql})
    )"""
