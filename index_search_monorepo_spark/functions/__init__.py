from index_search_monorepo_spark.functions.text import (  # noqa: F401
    PY_WHITESPACE,
    pystrip,
    quoteattr_expr,
    string_preparation_expr,
    xmlesc_expr,
    namespace_expr,
    object_id_expr,
    zero_pad_id_expr,
    strip_leading_zeros_expr,
)
