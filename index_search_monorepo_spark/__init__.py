"""index_search_monorepo_spark — a from-scratch, PySpark-native rebuild of the
extraction capabilities of hathitrust/index_search_monorepo.

Everything here is expressed Spark-first (DataFrame/Catalyst); the reference
(`/root/reference`) defines WHAT is computed, never HOW. See SURVEY.md for the
operator inventory and file:line citations.
"""

__version__ = "0.1.0"
