"""Semantic-trap tests for the expression layer (SURVEY.md §2.8):
first-match-wins order, substring-not-token matching, NULL handling,
decode pass-through — the places a UDF→native translation can drift.
"""

from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.functions.casemap import (
    SUPER_CATEGORIES,
    US_STATE_NAMES,
    bucketize,
    decode_map,
    first_match_category,
    sentiment,
)


def _one_col(spark, values, dtype="string"):
    return spark.createDataFrame([(v,) for v in values], f"v {dtype}")


def _mapped(spark, values, expr):
    df = _one_col(spark, values).withColumn("out", expr)
    return [r.out for r in df.orderBy(F.monotonically_increasing_id()).collect()]


class TestFirstMatchCategory:
    def test_order_trap_first_match_wins(self, spark):
        # "Food, Fashion" matches both Restaurants(Food) and
        # Shopping(Fashion); insertion order says Restaurants
        # (reference scripts/etl.py:63-74 dict order).
        out = _mapped(spark, ["Food, Fashion"], first_match_category("v"))
        assert out == ["Restaurants"]

    def test_substring_not_token(self, spark):
        # "Seafood" contains "Food" as a substring → Restaurants,
        # matching the reference's `in` check (scripts/etl.py:80-82).
        out = _mapped(
            spark,
            ["Seafood", "Fast Food", "Food Trucks"],
            first_match_category("v"),
        )
        assert out == ["Restaurants"] * 3

    def test_null_and_no_match(self, spark):
        out = _mapped(spark, [None, "Lawyers"], first_match_category("v"))
        assert out == ["Other", "Other"]

    def test_each_category_reachable(self, spark):
        labels = list(SUPER_CATEGORIES)
        probes = [kws[0] for kws in SUPER_CATEGORIES.values()]
        assert _mapped(spark, probes, first_match_category("v")) == labels


class TestSentiment:
    def test_boundaries(self, spark):
        df = spark.createDataFrame(
            [(1.0,), (2.0,), (2.5,), (3.0,), (3.5,), (5.0,)], "v double"
        ).withColumn("out", sentiment("v"))
        out = [r.out for r in df.orderBy("v").collect()]
        # reference scripts/etl.py:96-101: <=2 negative, ==3 neutral
        assert out == ["negative", "negative", "positive", "neutral", "positive", "positive"]


class TestBucketize:
    def test_ordered_bands(self, spark):
        expr = bucketize("v", [(10.0, "low"), (20.0, "mid")], "high")
        df = spark.createDataFrame([(5.0,), (10.0,), (15.0,), (25.0,)], "v double")
        out = [r.out for r in df.withColumn("out", expr).orderBy("v").collect()]
        assert out == ["low", "low", "mid", "high"]


class TestDecodeMap:
    def test_decode_with_passthrough(self, spark):
        out = _mapped(spark, ["DE", "PA", "ZZ", None], decode_map("v", US_STATE_NAMES))
        # unmapped "ZZ" passes through; NULL stays NULL
        assert out == ["Delaware", "Pennsylvania", "ZZ", None]

    def test_unknown_quirk(self, spark):
        # scripts/glue_job.py:113 maps literal "Unknown" → Mississippi
        assert _mapped(spark, ["Unknown"], decode_map("v", US_STATE_NAMES)) == [
            "Mississippi"
        ]

    def test_custom_fallback(self, spark):
        out = _mapped(spark, ["x"], decode_map("v", {"a": "b"}, fallback=F.lit("?")))
        assert out == ["?"]
