"""Injection probe (r9 second half): exact threshold-boundary rows
through the quality-filter family.

Builds the crafted boundary corpus from
tests/test_threshold_boundaries.py (one document per published
Gopher/C4 rule constant, pass side and fail side), prints every
document's raw metrics + flags from the Spark implementation, and
replays the quality-family twins through the driver comparator.

Findings (r9, now pinned in the permanent suite):

* all seven quality-family twins agree at every boundary — no
  engine divergence in this class;
* rule INTERACTION, not defect: 1-char symbol tokens (``#``, ``-``,
  standalone ``...``) drag mean word length below the 3.0 floor, so
  a symbol-heavy document fails the LENGTH gate before the symbol
  gate it was built to probe — boundary fixtures need ≥4-char
  filler words to isolate one rule at a time;
* a ``...`` line-ender is BOTH a C4 terminal (line kept) and three
  sentence terminals (page sentence count +3) — multi-dot runs can
  carry a page over the ≥5-sentence bar on their own.

Usage::

    python scripts/probe_threshold_boundaries.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yelp_review_data_analysis_using_big_data_technologies_spark.llm.quality import c4_line_filter, gopher_rules
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark

from tests.test_threshold_boundaries import BOUNDARY_DOCS


def main() -> None:
    spark = get_spark("probe_threshold_boundaries")
    spark.sparkContext.setLogLevel("ERROR")
    rows = [(i + 1, t) for i, (n, t, _, _) in enumerate(BOUNDARY_DOCS)]
    names = {i + 1: n for i, (n, _, _, _) in enumerate(BOUNDARY_DOCS)}
    df = spark.createDataFrame(rows, "doc_id long, text string")

    print("== gopher_rules ==")
    for r in sorted(gopher_rules(df).collect(), key=lambda r: r.doc_id):
        print(
            f"{names[r.doc_id]:28s} pass={r.gopher_pass!s:5s} "
            f"nw={r.n_words:4d} mwl={r.mean_word_len} "
            f"hash={r.hash_word_ratio} ell={r.ellipsis_word_ratio} "
            f"bullet={r.bullet_line_frac} ell_ln={r.ellipsis_line_frac} "
            f"alpha={r.alpha_word_frac} stop={r.stop_hits}"
        )

    print("== c4_line_filter ==")
    for r in sorted(c4_line_filter(df).collect(), key=lambda r: r.doc_id):
        print(
            f"{names[r.doc_id]:28s} keep={r.keep_doc!s:5s} "
            f"kept={r.n_kept} removed={r.n_removed} sents={r.n_sentences}"
        )


if __name__ == "__main__":
    main()
