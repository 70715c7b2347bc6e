"""Explicit schemas for the Yelp-shaped inputs.

The reference relies on ``spark.read.json`` inference everywhere
(scripts/etl.py:21-23) — a full extra scan of 100 TB and
non-deterministic under dirty data.  We declare the schemas the
inference would produce (FIXTURES.md §A) so reads are single-pass and
stable.  Only the columns the reference actually keeps
(scripts/etl.py:51) plus the raw extras it renames are declared;
nested ``attributes``/``hours`` structs are intentionally absent
(they are dropped by the reference's projection — SURVEY.md §1).
"""

from __future__ import annotations

from pyspark.sql import types as T

BUSINESS_SCHEMA = T.StructType(
    [
        T.StructField("business_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("stars", T.DoubleType()),
        T.StructField("review_count", T.LongType()),
        T.StructField("city", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("categories", T.StringType()),
    ]
)

REVIEW_SCHEMA = T.StructType(
    [
        T.StructField("review_id", T.StringType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("business_id", T.StringType()),
        T.StructField("stars", T.DoubleType()),
        T.StructField("useful", T.LongType()),
        T.StructField("funny", T.LongType()),
        T.StructField("cool", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("date", T.StringType()),
    ]
)

USER_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("review_count", T.LongType()),
        T.StructField("fans", T.LongType()),
        T.StructField("useful", T.LongType()),
        T.StructField("funny", T.LongType()),
        T.StructField("cool", T.LongType()),
    ]
)

YELP_SCHEMAS: dict[str, T.StructType] = {
    "business": BUSINESS_SCHEMA,
    "review": REVIEW_SCHEMA,
    "user": USER_SCHEMA,
}
