"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over `index_search_monorepo_spark.contract`, which registers one
(PySpark query, DuckDB oracle SQL) pair per implemented operator family from
SURVEY.md §2 plus the training-data curation ops (dedup, similarity search,
text analysis, multimodal plumbing).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from index_search_monorepo_spark import contract as _contract  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship A1 extraction (ordered page concat with bit-exact
    string_preparation) over the interleaved spans table derived from
    /root/testdata/sf0.001/documents.parquet."""
    return _contract.entry(spark)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _contract.queries()


def oracle_sql() -> dict[str, str]:
    return _contract.oracle_sql()
