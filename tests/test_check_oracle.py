"""Regression pins for the local oracle gate (scripts/check_oracle.py).

Round-6 VERDICT finding #2: the gate's dtype-drift check inspected
``fetchall()`` Python values, where DuckDB hands HUGEINT back as
Python ``int`` and DECIMAL as ``Decimal`` — so the exact drift class
that failed ``doc_pack_bins`` on the driver (HUGEINT→float64 on the
pandas path the driver hashes) was invisible locally.  The r7 gate
compares coarse pandas-dtype kinds on the ``.df()`` path instead;
these tests pin that each drift class FAILS locally and that the
benign classes (NULL-induced float agreement, datetime
representation) still pass.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the `check` fixture (the loaded check_oracle gate module) is shared
# from conftest.py


@pytest.fixture()
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def _sql_q(sql):
    return lambda spark, sf_dir: spark.sql(sql)


def test_hugeint_windowed_sum_drift_fails(spark, check, duck):
    """The doc_pack_bins class: DuckDB sum(BIGINT) OVER () is HUGEINT
    → float64 on .df(), while Spark returns int64.  Values agree, so
    only the dtype view can catch it — and it must."""
    probs = check.compare(
        "hugeint_drift",
        spark,
        duck,
        "",
        _sql_q("SELECT CAST(10 AS BIGINT) AS s"),
        "SELECT sum(x) OVER () AS s FROM (SELECT CAST(10 AS BIGINT) AS x)",
    )
    assert probs and "dtype drift" in probs[0], probs


def test_decimal_vs_float_drift_fails(spark, check, duck):
    """The sql_priority_share class: Spark DECIMAL → object-dtype
    Decimal on toPandas, DuckDB DECIMAL → float64 on .df()."""
    probs = check.compare(
        "decimal_drift",
        spark,
        duck,
        "",
        _sql_q("SELECT CAST(1.50 AS DECIMAL(10,2)) AS pct"),
        "SELECT CAST(1.50 AS DECIMAL(10,2)) AS pct",
    )
    assert probs and "dtype drift" in probs[0], probs


def test_null_induced_float_agreement_passes(spark, check, duck):
    """NULL-bearing integral columns go float64 on BOTH engines'
    pandas paths — the in-window entries that rely on this must keep
    passing."""
    probs = check.compare(
        "null_float_ok",
        spark,
        duck,
        "",
        _sql_q(
            "SELECT v FROM VALUES (CAST(NULL AS BIGINT)), (CAST(5 AS BIGINT)) t(v)"
        ),
        "SELECT CAST(NULL AS BIGINT) AS v UNION ALL SELECT CAST(5 AS BIGINT)",
    )
    assert not probs, probs


def test_datetime_representation_not_flagged(spark, check, duck):
    """date/timestamp columns render as object-of-date on Spark's
    pandas path but datetime64 on DuckDB's — benign on the driver, so
    the gate must not flag it."""
    probs = check.compare(
        "datetime_ok",
        spark,
        duck,
        "",
        _sql_q("SELECT DATE '2020-01-01' AS d, CAST(1 AS BIGINT) AS n"),
        "SELECT DATE '2020-01-01' AS d, CAST(1 AS BIGINT) AS n",
    )
    assert not probs, probs


def test_string_date_vs_date_drift_fails(spark, check, duck):
    """r7 ADVICE hole: the old guard skipped any pair where EITHER
    kind was datetime, so a Spark STRING date vs a DuckDB DATE twin
    passed both the (masked) dtype check and the value compare
    (str(date) == '2020-01-01').  The narrowed guard must FAIL it —
    on the driver's pandas view these hash differently."""
    probs = check.compare(
        "string_date_drift",
        spark,
        duck,
        "",
        _sql_q("SELECT '2020-01-01' AS d, CAST(1 AS BIGINT) AS n"),
        "SELECT DATE '2020-01-01' AS d, CAST(1 AS BIGINT) AS n",
    )
    assert probs and "dtype drift" in probs[0], probs


def test_matching_doubles_pass(spark, check, duck):
    probs = check.compare(
        "double_ok",
        spark,
        duck,
        "",
        _sql_q("SELECT CAST(1.5 AS DOUBLE) AS v, CAST(2 AS BIGINT) AS n"),
        "SELECT CAST(1.5 AS DOUBLE) AS v, CAST(2 AS BIGINT) AS n",
    )
    assert not probs, probs


def test_signed_zero_drift_fails(spark, check, duck):
    """r9 signed-zero class: Python's == treats -0.0 == 0.0, so the
    naive compare passes a pair the driver's pandas hash distinguishes
    (hash_pandas_object(-0.0) != hash(0.0)).  _normalize now encodes
    the zero's sign bit; a Spark +0.0 vs DuckDB -0.0 must FAIL."""
    probs = check.compare(
        "signed_zero_drift",
        spark,
        duck,
        "",
        _sql_q("SELECT CAST(0.0 AS DOUBLE) AS v, CAST(1 AS BIGINT) AS n"),
        # string cast: a bare -0.0 literal is DECIMAL in DuckDB and
        # decimals have no signed zero, so it would arrive as +0.0
        "SELECT CAST('-0.0' AS DOUBLE) AS v, CAST(1 AS BIGINT) AS n",
    )
    assert probs and "value diff" in probs[0], probs


def test_agreeing_negative_zeros_pass(spark, check, duck):
    """Both engines emitting -0.0 (raw pass-through, no round()) is
    agreement — only a SIGN MISMATCH at zero may fail."""
    probs = check.compare(
        "signed_zero_ok",
        spark,
        duck,
        "",
        _sql_q("SELECT CAST('-0.0' AS DOUBLE) AS v, CAST(1 AS BIGINT) AS n"),
        "SELECT CAST('-0.0' AS DOUBLE) AS v, CAST(1 AS BIGINT) AS n",
    )
    assert not probs, probs
