from reddit_can_bigdata_spark.functions.text import (  # noqa: F401
    clean_text_expr,
    portable_hash32,
    word_count_expr,
)
