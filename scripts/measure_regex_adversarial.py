"""Measure: Java-regex backtracking blowup on adversarial runs, and
the ``PII_REQUIRED_LITERAL`` contains-guard that bounds it.

Java's backtracking engine (Spark's ``regexp_*``) is QUADRATIC in an
unbroken character-class run: for ``'a'*n`` the email pattern's
``[A-Za-z0-9._%+-]+`` consumes to the end from every start position
and fails ``@`` each time.  DuckDB's RE2 is linear, so the twins
diverge in PERFORMANCE (never correctness) on exactly the cells a
binary spill or base64 blob produces.

Measured on local[32] (this script, isolated sessions):

    unguarded  n=8k    0.35 s/cell      guarded  n=256k   <0.1 s
    unguarded  n=16k   1.6  s/cell      guarded  n=2M     <0.1 s
    unguarded  n=24k   2.6  s/cell   (guard = one memchr-class
    (→ 1 MB cell ≈ hours)             ``contains`` per pattern)

The fix (llm/quality.py::PII_REQUIRED_LITERAL): each pattern cannot
match without a literal (``@`` / ``.`` / ``-``) — a ``contains``
pre-filter skips the regex entirely, with identical semantics.  Cells
that carry the literal inside a pathological run remain quadratic on
the Spark side — a documented bound of the same class as the
quadratic-shingle oracle ceiling.

Usage::

    python scripts/measure_regex_adversarial.py [max_n]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yelp_review_data_analysis_using_big_data_technologies_spark.llm.quality import redact_pii
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark


def main() -> int:
    max_n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    spark = get_spark("measure_regex_adversarial")
    spark.createDataFrame([(1, "warm")], "a long, t string").count()
    sizes = [n for n in (8_000, 24_000, 256_000, 2_000_000) if n <= max_n]
    for n in sizes:
        df = spark.createDataFrame(
            [(1, "a" * n)], "doc_id long, text string"
        )
        t0 = time.perf_counter()
        redact_pii(df).select("n_redactions").write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        print(f"  guarded adversarial n={n}: {dt:.3f}s")
        if dt > 30:
            print("FAIL: guard did not bound the adversarial run")
            return 1
    print("\nguard holds: adversarial runs stay flat")
    return 0


if __name__ == "__main__":
    sys.exit(main())
