"""Soundness tripwire for the PII ``contains`` pre-filter (r9).

``_redacted``/``_n_redactions`` skip the (quadratic-on-Java) regex on
cells lacking ``PII_REQUIRED_LITERAL[name]``.  That guard is only
sound if the literal is genuinely unmatchable-without for its
pattern: a future PII_PATTERNS entry wired to a wrong literal would
silently SKIP redactions on matching cells — a missed-PII failure
mode with no symptom.  These tests make an unsound guard fail loudly:

* every pattern must have a registered literal (KeyError otherwise);
* canonical PII examples must match AND contain the literal;
* property-based: no string lacking the literal may match (hypothesis
  fuzz over printable text, plus targeted near-miss corpora).
"""

from __future__ import annotations

import os
import re
import sys

from hypothesis import given, settings
from hypothesis import strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yelp_review_data_analysis_using_big_data_technologies_spark.llm.quality import (
    PII_PATTERNS,
    PII_REQUIRED_LITERAL,
)

CANONICAL = {
    "email": ["john.doe+x@mail.example.com", "a@b.co", "X_9%@sub.domain.org"],
    "ipv4": ["192.168.0.1", "8.8.8.8", "255.255.255.255"],
    "phone": ["555-867-5309", "123-456-7890"],
}

NEAR_MISSES = {
    # shapes one edit away from matching, minus the required literal
    "email": ["john doe at mail example com", "a" * 5000, "user(at)host,com"],
    "ipv4": ["192 168 0 1", "1234567890123", "8,8,8,8"],
    "phone": ["555 867 5309", "5558675309", "555.867.5309"],
}


def test_every_pattern_has_a_registered_literal():
    assert {n for n, _, _ in PII_PATTERNS} == set(PII_REQUIRED_LITERAL)


def test_canonical_matches_contain_the_literal():
    for name, pat, _ in PII_PATTERNS:
        lit = PII_REQUIRED_LITERAL[name]
        for s in CANONICAL[name]:
            m = re.search(pat, s)
            assert m, f"{name} pattern must match canonical {s!r}"
            assert lit in m.group(0), (
                f"{name}: match {m.group(0)!r} lacks required literal "
                f"{lit!r} — the contains-guard would skip real PII"
            )


def test_near_misses_without_literal_never_match():
    for name, pat, _ in PII_PATTERNS:
        lit = PII_REQUIRED_LITERAL[name]
        for s in NEAR_MISSES[name]:
            assert lit not in s  # corpus sanity
            assert re.search(pat, s) is None, (
                f"{name}: {s!r} matches without literal {lit!r} — "
                f"guard is UNSOUND (redaction silently skipped)"
            )


@settings(max_examples=300, deadline=None)
@given(st.text(st.characters(codec="ascii"), max_size=80))
def test_fuzz_no_match_possible_without_literal(s):
    for name, pat, _ in PII_PATTERNS:
        stripped = s.replace(PII_REQUIRED_LITERAL[name], "")
        assert re.search(pat, stripped) is None, (
            f"{name}: {stripped!r} matches with literal removed — "
            f"guard is UNSOUND"
        )
