"""End-to-end master-table replay on a miniature Yelp-shaped fixture
(FIXTURES.md §A): exercises renames → inner joins (orphan loss) →
dedup → na.drop → derived columns, the whole reference chain
(scripts/glue_job.py:20-115 + scripts/etl.py:96-109).
"""

import pytest

from yelp_review_data_analysis_using_big_data_technologies_spark.plans.master_table import (
    synthetic_master_table,
    yelp_master_table,
)

EXPECTED_COLS = {
    "business_id",
    "user_id",
    "name",
    "cool",
    "review_id",
    "funny",
    "stars",
    "useful",
    "city",
    "review_count",
    "fans",
    "b_name",
    "state",
    "super_category",
    "sentiment",
    "only_date",
}


@pytest.fixture(scope="module")
def yelp_fixture(spark):
    business = spark.createDataFrame(
        [
            ("b1", "Crab Shack", 4.0, 10, "Philadelphia", "PA", "Seafood"),
            ("b2", "Mall", 3.0, 5, "Tampa", "FL", "Food, Fashion"),
            ("b3", "Mystery", 2.0, 2, "Nowhere", "ZZ", None),
        ],
        "business_id string, name string, stars double, review_count long, "
        "city string, state string, categories string",
    )
    review = spark.createDataFrame(
        [
            ("r1", "u1", "b1", 5.0, 1, 2, 3, "great", "2021-01-03 10:00:00"),
            ("r1", "u1", "b1", 5.0, 1, 2, 3, "great", "2021-01-03 10:00:00"),  # dup
            ("r2", "u1", "b2", 3.0, 0, 0, 0, "ok", "2021-02-14 09:00:00"),
            ("r3", "u2", "b3", 1.0, 4, 0, 1, "bad", "2021-03-01 12:00:00"),
            ("r4", "ghost", "b1", 2.0, 0, 0, 0, "meh", "2021-04-01 08:00:00"),  # orphan user
            ("r5", "u2", "missing", 4.0, 0, 0, 0, "?", "2021-05-01 08:00:00"),  # orphan biz
            ("r6", "u3", "b1", None, 0, 0, 0, "null stars", "2021-06-01 08:00:00"),
        ],
        "review_id string, user_id string, business_id string, stars double, "
        "useful long, funny long, cool long, text string, date string",
    )
    user = spark.createDataFrame(
        [
            ("u1", "Ann", 10, 3, 7, 8, 9),
            ("u2", "Bob", 20, 1, 2, 3, 4),
            ("u3", "Cat", 1, 0, 0, 0, 0),
        ],
        "user_id string, name string, review_count long, fans long, "
        "useful long, funny long, cool long",
    )
    return business, review, user


def test_master_schema_and_rowcount(spark, yelp_fixture):
    out = yelp_master_table(*yelp_fixture)
    assert set(out.columns) == EXPECTED_COLS
    rows = {r.review_id: r for r in out.collect()}
    # r1 dup collapsed, r4/r5 orphans dropped by inner joins,
    # r6 dropped by na.drop (null stars), r3 dropped (null categories
    # → null after derive? no: null categories survives na.drop only
    # if dropped before derive — kept: categories null is a real col)
    assert set(rows) == {"r1", "r2"}


def test_master_derived_values(spark, yelp_fixture):
    out = yelp_master_table(*yelp_fixture)
    rows = {r.review_id: r for r in out.collect()}
    r1, r2 = rows["r1"], rows["r2"]
    # "Seafood" does NOT contain "Food" — Python `in` is case-sensitive
    # (reference scripts/etl.py:80-82), so it falls through to Other.
    assert r1.super_category == "Other"
    assert r2.super_category == "Restaurants"  # Food, Fashion order trap
    assert r1.sentiment == "positive" and r2.sentiment == "neutral"
    assert r1.state == "Pennsylvania" and r2.state == "Florida"
    assert str(r1.only_date) == "2021-01-03"
    # bare cool/funny/useful are the USER's lifetime totals (reference
    # columns_to_keep, scripts/etl.py:51); review's renamed r_* dropped
    assert (r1.cool, r1.funny, r1.useful) == (9, 8, 7)
    assert r1.fans == 3 and r1.review_count == 10  # user's columns


def test_synthetic_master_smoke(spark, smoke_dir):
    out = synthetic_master_table(spark, smoke_dir)
    assert out.count() == 6000
    assert "super_category" in out.columns and "region_name" in out.columns


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
