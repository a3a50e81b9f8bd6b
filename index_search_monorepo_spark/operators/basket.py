"""Market-basket analysis: frequent item pairs and association rules.

Reference: no counterpart in hathitrust/index_search_monorepo; built per
the brief's analytics-completeness category — the Agrawal-Srikant
association-rules family (support / confidence / lift) every warehouse
ships a recipe for, here in the k=2 form that covers the
"customers who X also Y" workload without the Apriori candidate
explosion.

Scale shapes:

 - Pair generation is a PER-BASKET nested HOF over the basket's sorted
   distinct item array — never a basket self-join (item-grain rows
   twice + quadratic under hot baskets; the cooc.py lesson). Work per
   basket is C(k, 2) with k = basket size, bounded by the data's basket
   cardinality; `max_basket_items` RAISES on degenerate baskets (one
   1e5-item basket is 5e9 pairs — a loud error beats a silent
   explosion).
 - One hash exchange builds baskets, one map-side-combined slim rollup
   counts (item_a, item_b) pairs — item payloads shuffle once.
 - Rules join pair counts to the two item supports (item-grain dims;
   AQE broadcasts them at gate scale, shuffle-joins at vocabulary
   scale) + the one-row basket total broadcast. All metrics are
   integer per-mille: support = c_ab·1000 DIV n, confidence =
   c_ab·1000 DIV c_a, lift = c_ab·n·1000 DIV (c_a·c_b) — exact BIGINT
   at gate scale (documented bound: c_ab·n·1000 < 2^63 needs
   n·c < 9e15; beyond that use the bitlen surrogate, the
   cooc.pmi_bits convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "basket_pair_counts",
    "item_supports",
    "association_rules",
    "basket_oracle_sql",
]


def basket_pair_counts(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_items: int = 10_000,
) -> DataFrame:
    """(item_a, item_b, c_ab): number of baskets containing BOTH items,
    item_a < item_b, duplicates within a basket collapsed."""
    items = F.array_sort(F.collect_set(F.col(item_col)))
    guarded = F.when(
        F.size(F.col("_items")) <= max_basket_items, F.col("_items")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("basket_pair_counts: basket with "),
                F.size(F.col("_items")).cast("string"),
                F.lit(f" items exceeds max_basket_items="
                      f"{max_basket_items}"),
            )
        )
    )
    pairs = F.flatten(
        F.transform(
            F.col("_g"),
            lambda a, i: F.transform(
                F.slice(
                    F.col("_g"), i + F.lit(2),
                    F.greatest(F.size(F.col("_g")) - i - 1, F.lit(0)),
                ),
                lambda b: F.struct(a.alias("item_a"), b.alias("item_b")),
            ),
        )
    )
    return (
        df.groupBy(basket_col)
        .agg(items.alias("_items"))
        .withColumn("_g", guarded)
        .select(F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.item_a").alias("item_a"),
            F.col("p.item_b").alias("item_b"),
        )
        .agg(F.count("*").cast("long").alias("c_ab"))
    )


def item_supports(
    df: DataFrame, basket_col: str, item_col: str
) -> DataFrame:
    """(item, c_item): number of distinct baskets containing the item."""
    return (
        df.select(basket_col, item_col)
        .distinct()
        .groupBy(F.col(item_col).alias("item"))
        .agg(F.count("*").cast("long").alias("c_item"))
    )


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    max_basket_items: int = 10_000,
) -> DataFrame:
    """Both-direction k=2 rules (antecedent -> consequent) with integer
    per-mille metrics: (antecedent, consequent, c_pair, c_ante,
    support_pmille, confidence_pmille, lift_pmille). Pairs below
    `min_pair_count` are pruned BEFORE the support joins (the Apriori
    support-threshold step — at scale this prune is what keeps the
    rule table bounded)."""
    pairs = basket_pair_counts(
        df, basket_col, item_col, max_basket_items
    ).filter(F.col("c_ab") >= min_pair_count)
    sup = item_supports(df, basket_col, item_col)
    n_b = df.select(basket_col).distinct().agg(
        F.count("*").cast("long").alias("_n")
    )
    both = pairs.select(
        F.col("item_a").alias("antecedent"),
        F.col("item_b").alias("consequent"),
        "c_ab",
    ).unionByName(
        pairs.select(
            F.col("item_b").alias("antecedent"),
            F.col("item_a").alias("consequent"),
            "c_ab",
        )
    )
    a_sup = sup.select(
        F.col("item").alias("antecedent"), F.col("c_item").alias("c_ante")
    )
    c_sup = sup.select(
        F.col("item").alias("consequent"), F.col("c_item").alias("c_cons")
    )

    def _div(num, den):
        return ((num - F.pmod(num, den)) / den).cast("long")

    return (
        both.join(a_sup, "antecedent")
        .join(c_sup, "consequent")
        .crossJoin(F.broadcast(n_b))
        .select(
            "antecedent",
            "consequent",
            F.col("c_ab").alias("c_pair"),
            "c_ante",
            _div(F.col("c_ab") * 1000, F.col("_n")).alias("support_pmille"),
            _div(F.col("c_ab") * 1000, F.col("c_ante")).alias(
                "confidence_pmille"
            ),
            _div(
                F.col("c_ab") * F.col("_n") * 1000,
                F.col("c_ante") * F.col("c_cons"),
            ).alias("lift_pmille"),
        )
    )


def basket_oracle_sql(
    source_cte: str,
    basket_sql: str,
    item_sql: str,
    min_pair_count: int = 2,
) -> str:
    """DuckDB CTE chain mirroring association_rules; exposes bk_pairs
    (item_a, item_b, c_ab) and rules_tbl (antecedent, consequent,
    c_pair, c_ante, support/confidence/lift pmille)."""
    return f"""
    bk_bi AS (
      SELECT DISTINCT {basket_sql} AS bsk, {item_sql} AS itm
      FROM {source_cte}
    ),
    bk_pairs AS (
      SELECT a.itm AS item_a, b.itm AS item_b,
             CAST(count(*) AS BIGINT) AS c_ab
      FROM bk_bi a JOIN bk_bi b
        ON b.bsk = a.bsk AND a.itm < b.itm
      GROUP BY a.itm, b.itm
      HAVING count(*) >= {min_pair_count}
    ),
    bk_sup AS (
      SELECT itm AS item, CAST(count(*) AS BIGINT) AS c_item
      FROM bk_bi GROUP BY itm
    ),
    bk_n AS (
      SELECT CAST(count(DISTINCT bsk) AS BIGINT) AS n FROM bk_bi
    ),
    bk_both AS (
      SELECT item_a AS antecedent, item_b AS consequent, c_ab
      FROM bk_pairs
      UNION ALL
      SELECT item_b, item_a, c_ab FROM bk_pairs
    ),
    rules_tbl AS (
      SELECT r.antecedent, r.consequent,
             r.c_ab AS c_pair, a.c_item AS c_ante,
             CAST(r.c_ab * 1000 // n.n AS BIGINT) AS support_pmille,
             CAST(r.c_ab * 1000 // a.c_item AS BIGINT)
               AS confidence_pmille,
             CAST(r.c_ab * n.n * 1000 // (a.c_item * c.c_item) AS BIGINT)
               AS lift_pmille
      FROM bk_both r
      JOIN bk_sup a ON a.item = r.antecedent
      JOIN bk_sup c ON c.item = r.consequent
      CROSS JOIN bk_n n
    )"""
