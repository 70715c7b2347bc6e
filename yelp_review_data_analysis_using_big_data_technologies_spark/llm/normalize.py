"""Unicode text normalization (ingest-stage hygiene).

Byte-exact dedup keys (llm/dedup.py) treat canonically-equivalent
NFC/NFD encodings of the same text as DIFFERENT documents — correct
for a byte contract, wrong for a training corpus scraped from mixed
sources (macOS filenames and some CMSes emit NFD; almost everything
else emits NFC).  The fix at 100 TB is not to make every dedup key
normalization-aware (that would push a Python step into every hot
path); it is to normalize ONCE at ingest and let the whole
downstream pipeline stay byte-exact on normalized bytes.

Spark has no built-in Unicode normalizer, so this is the sanctioned
Arrow-batched slow path: a scalar ``pandas_udf`` over
``Series.str.normalize`` (columnar Arrow transfer, vectorized ICU-free
``unicodedata`` tables — verified byte-identical to DuckDB's
``nfc_normalize`` for the oracle twins).  Per-row cost is a single
table lookup pass; at ingest it amortizes to zero because the write
was already happening.

No reference analogue (the reference never leaves ASCII Yelp JSON);
this is part of the §2.12 training-data surface.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Unicode normalization forms pandas/unicodedata accept.
FORMS = ("NFC", "NFD", "NFKC", "NFKD")

_UDFS: dict[str, object] = {}


def _normalizer(form: str):
    """One cached Arrow-batched UDF per form (udf creation is not free)."""
    if form not in FORMS:
        raise ValueError(f"form must be one of {FORMS}, got {form!r}")
    if form not in _UDFS:

        @F.pandas_udf("string")
        def _norm(s: pd.Series) -> pd.Series:
            # Series.str.normalize propagates nulls; empty strings are
            # identity under every form.
            return s.str.normalize(form)

        _UDFS[form] = _norm
    return _UDFS[form]


def normalize_text_col(col: Column | str, form: str = "NFC") -> Column:
    """Column expression: ``col`` normalized to ``form``."""
    return _normalizer(form)(F.col(col) if isinstance(col, str) else col)


def normalize_text(
    df: DataFrame,
    col: str = "text",
    form: str = "NFC",
    out_col: str | None = None,
    flag_col: str | None = None,
) -> DataFrame:
    """Normalize ``df[col]`` to ``form`` (default NFC, the web's
    canonical form).

    ``out_col`` defaults to replacing ``col`` in place (the ingest
    contract: downstream sees only normalized bytes).  ``flag_col``,
    if given, adds a boolean marking rows the normalization actually
    changed — the audit column an ingest job writes so the (tiny)
    changed slice can be re-checked without re-scanning the corpus.
    """
    tmp = "__normalize_text_tmp"
    res = df.withColumn(tmp, normalize_text_col(col, form))
    if flag_col is not None:
        # flag against the PRE-normalization bytes (null text → False)
        res = res.withColumn(
            flag_col, F.coalesce(F.col(tmp) != F.col(col), F.lit(False))
        )
    return res.withColumn(out_col or col, F.col(tmp)).drop(tmp)
