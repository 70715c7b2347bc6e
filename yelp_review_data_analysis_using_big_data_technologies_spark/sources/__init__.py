from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import (
    TABLES,
    load_table,
    load_tables,
    read_csv,
    read_json,
    read_parquet,
    register_views,
)
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.writers import (
    write_csv,
    write_parquet,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "read_csv",
    "read_json",
    "read_parquet",
    "register_views",
    "write_csv",
    "write_parquet",
]
