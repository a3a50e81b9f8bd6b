from index_search_monorepo_spark.search.query import (  # noqa: F401
    RIGHTS_PUBLIC_DOMAIN,
    SearchQuery,
    boost_phrase_fields,
    boost_query_fields,
    exact_phrase_query,
    facet_params,
    manage_string_query,
    query_filter_creator_rights,
    query_filter_creator_string,
)
from index_search_monorepo_spark.search.engine import (  # noqa: F401
    export_all,
    facet_counts,
    search,
    with_dismax_score,
)
