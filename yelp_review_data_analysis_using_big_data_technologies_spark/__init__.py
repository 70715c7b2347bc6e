"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference Yelp-review ETL pipeline
(karananpat10/Yelp-Review-Data-Analysis-Using-Big-Data-Technologies),
re-expressed Spark-first.

Layers (cf. SURVEY.md §0):
- ``sources``   — scans/sinks (reference etl.py:21-27, glue_job.py:88-92)
- ``functions`` — expression builders (CASE maps, date parts, text, vectors)
- ``operators`` — relational core + dedup/similarity/multimodal extensions
- ``plans``     — master-table pipeline + the dashboard analytics library
- ``streaming`` — Structured Streaming slice over event tables
"""

from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
