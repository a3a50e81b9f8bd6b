"""DOM metadata + outlink extraction over HTML documents — the web-graph
side of the extraction tier (north rule: "DOM heuristics").

The reference extracts structured fields from METS/MARC containers
(mets_file_extractor.py:15-33, catalog metadata fold); for web documents
the analogous structured surface is the DOM head (title/lang/description/
canonical) and the anchor graph. Both come out of ONE stdlib-parser pass
per document (functions/html.py `parse_html_metadata`), Arrow-batched:

 - `with_html_metadata`  : per-doc struct column (title, lang,
   description, canonical, n_links, first_href) — scan -> one
   ArrowEvalPython stage, zero shuffle.
 - `outlinks`            : (doc_id, href, anchor) one row per anchor —
   the URL-frontier / link-graph feed. The links array is UDF-derived,
   so the explode goes through `extraction.explode_noinline` (CLAUDE.md
   lesson #8: a naive explode of a UDF array runs the UDF twice).
 - `outlink_domains`     : outlinks joined with the urlfilter feature
   exprs (host, registered domain, blocklist flag) — pure codegen on top,
   still zero extra shuffles; aggregate by registered_domain for the
   crawl-frontier rollup (map-side-combined count).

Scale: all per-row; the only shuffle anywhere is the final optional
domain rollup, which combines map-side. Hrefs resolve against the row's
own base URI (stdlib urljoin), so no driver state."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from index_search_monorepo_spark.functions.html import parse_html_metadata
from index_search_monorepo_spark.operators.extraction import explode_noinline

HTML_METADATA_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField("lang", StringType()),
        StructField("description", StringType()),
        StructField("canonical", StringType()),
        StructField("n_links", LongType()),
        StructField("first_href", StringType()),
    ]
)

LINKS_SCHEMA = ArrayType(
    StructType(
        [
            StructField("href", StringType()),
            StructField("anchor", StringType()),
        ]
    )
)


def html_metadata_udf():
    """html, base_uri -> HTML_METADATA_SCHEMA struct. Nondeterministic so
    predicate pushdown can't re-run the parse below the Project (CLAUDE.md
    lesson #9)."""
    from pyspark.sql.functions import pandas_udf

    def _one(html: str, base: str) -> dict:
        m = parse_html_metadata(html or "", base or None)
        return {
            "title": m["title"],
            "lang": m["lang"],
            "description": m["description"],
            "canonical": m["canonical"],
            "n_links": len(m["links"]),
            "first_href": m["links"][0][0] if m["links"] else None,
        }

    @pandas_udf(HTML_METADATA_SCHEMA)
    def meta(htmls: pd.Series, bases: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [_one(h, b) for h, b in zip(htmls, bases)],
            columns=HTML_METADATA_SCHEMA.fieldNames(),
        )

    return meta.asNondeterministic()


def links_udf():
    """html, base_uri -> array<struct<href, anchor>> (resolved, http(s)
    only). Nondeterministic: the array feeds explode_noinline and must
    stay single-evaluation."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LINKS_SCHEMA)
    def links(htmls: pd.Series, bases: pd.Series) -> pd.Series:
        return pd.Series(
            [
                parse_html_metadata(h or "", b or None)["links"]
                for h, b in zip(htmls, bases)
            ]
        )

    return links.asNondeterministic()


def with_html_metadata(
    df: DataFrame,
    html_col: str = "html",
    base_col: str = "doc_id",
    out_col: str = "html_meta",
) -> DataFrame:
    """df + one struct column of DOM metadata (single Arrow stage)."""
    return df.withColumn(
        out_col, html_metadata_udf()(F.col(html_col), F.col(base_col))
    )


def outlinks(
    df: DataFrame,
    html_col: str = "html",
    base_col: str = "doc_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, href, anchor): one row per anchor — the link-graph feed."""
    arr = links_udf()(F.col(html_col), F.col(base_col))
    return (
        df.select(F.col(id_col).alias("doc_id"), arr.alias("_links"))
        .select("doc_id", explode_noinline("_links").alias("link"))
        .select(
            "doc_id",
            F.col("link.href").alias("href"),
            F.col("link.anchor").alias("anchor"),
        )
    )


def outlink_domains(
    links: DataFrame, blocked: list[str] | None = None
) -> DataFrame:
    """Crawl-frontier rollup: outlinks -> per-registered-domain counts with
    the urlfilter blocklist flag. Pure codegen feature exprs on the link
    rows; ONE map-side-combined aggregation."""
    from index_search_monorepo_spark.operators.urlfilter import (
        with_url_features,
    )

    feat = with_url_features(links, url_col="href", blocked=blocked or [])
    return (
        feat.groupBy("url_registered_domain")
        .agg(
            F.count("*").cast("long").alias("n_links"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.max(F.col("url_blocked").cast("long")).alias("any_blocked"),
        )
        .withColumnRenamed("url_registered_domain", "registered_domain")
    )
