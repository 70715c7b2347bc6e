from yelp_review_data_analysis_using_big_data_technologies_spark.operators.relational import (
    anti_join,
    dedup,
    drop_nulls,
    duplicate_rows,
    equi_join,
    rename_columns,
    semi_join,
    top_k,
)

__all__ = [
    "anti_join",
    "dedup",
    "drop_nulls",
    "duplicate_rows",
    "equi_join",
    "rename_columns",
    "semi_join",
    "top_k",
]
