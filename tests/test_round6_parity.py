"""_round6 ⇄ Spark F.round(col, 6) parity on adversarial doubles
(r11 ADVICE #1).

The driver-side greedy MMR arithmetic (llm/vectors.py::_round6) claims
bit-for-bit parity with Spark's Round expression, which on DoubleType
quantizes ``BigDecimal.valueOf(d)`` — i.e. the ``Double.toString``
decimal rendering — HALF_UP.  Python's ``repr`` emits the shortest
round-trip decimal; JDK 19+ (Ryū, JDK-4511638) guarantees
``Double.toString`` is shortest too, while older JDKs could emit a
longer (still round-trippable) rendering, which at an exact
``x.xxxxxx5`` half-way boundary could round differently.  This suite
empirically pins the parity on the JDK actually running under this
Spark: adversarial values at and around 6-dp half-way boundaries,
denormal-ish magnitudes, long-repr doubles, and sign symmetry.  A
failure here means driver-side greedy scores may diverge from the
Spark/DuckDB twins and the MMR pipeline must route through F.round.
"""

import struct

from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.llm.vectors import _round6


def _nextafter(x: float, direction: float) -> float:
    # math.nextafter exists on 3.9+; spelled out to keep the intent
    # obvious: the adjacent representable double toward `direction`.
    import math

    return math.nextafter(x, direction)


def _adversarial_doubles() -> list[float]:
    vals: list[float] = []
    # exact half-way boundaries k*1e-6 + 5e-7 (never exactly
    # representable in binary — the repr decides which side they
    # land on) and their float-neighbors one ulp either side
    for k in range(0, 50):
        b = (2 * k + 1) * 5e-7
        vals += [b, _nextafter(b, 0.0), _nextafter(b, 1.0)]
    # long-repr doubles whose 7th decimal digit is 5-ish
    vals += [
        0.1234565,
        0.12345650000000001,
        0.9999995,
        1.0000005,
        2.6755555,
        0.0000005,
        0.0000015,
        0.0000025,  # repr 2.5e-06: HALF_UP -> 3e-06
        7.4505805969238281e-09,  # 2^-27, long binary tail
        1e-7,
        4.9e-7,
        5.1e-7,
    ]
    # magnitudes spanning the cosine-score range and beyond
    for m in (1.0, 3.0, 17.0, 123456.0):
        vals += [m + 5e-7, m - 5e-7, m + 1.5e-6]
    # values built from raw bit patterns with maximal mantissa noise
    for bits in (0x3FF0000000000001, 0x3FEFFFFFFFFFFFFF, 0x3E80000000000001):
        vals.append(struct.unpack("<d", struct.pack("<Q", bits))[0])
    # sign symmetry: HALF_UP (away from zero) must mirror exactly
    vals += [-v for v in vals]
    vals.append(0.0)
    vals.append(-0.0)
    return vals


def test_round6_matches_spark_round_on_adversarial_doubles(spark):
    vals = _adversarial_doubles()
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, x double")
    got = {
        r["i"]: r["r"]
        for r in df.select("i", F.round("x", 6).alias("r")).collect()
    }
    mismatches = [
        (vals[i], _round6(vals[i]), got[i])
        for i in range(len(vals))
        if _round6(vals[i]) != got[i]
    ]
    assert mismatches == [], (
        "driver _round6 diverges from Spark F.round(_, 6) on this JDK "
        f"(first 5): {mismatches[:5]}"
    )


def test_round6_half_up_away_from_zero():
    # the quantize mode itself: HALF_UP is away-from-zero on both signs
    assert _round6(2.5e-06) == 3e-06
    assert _round6(-2.5e-06) == -3e-06
    assert _round6(0.0) == 0.0
