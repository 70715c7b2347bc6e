from yelp_review_data_analysis_using_big_data_technologies_spark.operators.asof import asof_join
from yelp_review_data_analysis_using_big_data_technologies_spark.operators.fuzzy import fuzzy_pairs_sorted_neighborhood
from yelp_review_data_analysis_using_big_data_technologies_spark.operators.interpolate import interpolate_join
from yelp_review_data_analysis_using_big_data_technologies_spark.operators.range_join import range_join
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
    "asof_join",
    "fuzzy_pairs_sorted_neighborhood",
    "interpolate_join",
    "range_join",
    "dedup",
    "drop_nulls",
    "duplicate_rows",
    "equi_join",
    "rename_columns",
    "semi_join",
    "top_k",
]
