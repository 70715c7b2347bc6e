from yelp_review_data_analysis_using_big_data_technologies_spark.plans.master_table import (
    synthetic_master_table,
    yelp_master_table,
)

__all__ = ["synthetic_master_table", "yelp_master_table"]
