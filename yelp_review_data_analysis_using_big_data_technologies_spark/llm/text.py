"""Text-analysis expression builders (SURVEY.md §2.12 "text analysis").

Generalizes the reference's only text-ish operator — the substring
category UDF (scripts/etl.py:76-88) — into the stats a training-data
pipeline actually computes: token counts, length/punctuation/stopword
profiles, a marker-word language-ID heuristic, quality banding, and
shingle fingerprints for near-dup detection.

Everything is a plain ``Column`` builder over built-in higher-order
functions — no Python UDFs, the whole surface stays inside Tungsten
whole-stage codegen and is ANSI-SQL-expressible for the DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.functions.columns import as_col as _col

#: Java's ASCII whitespace set spelled out.  The r8 control-char probe
#: found RE2's ``\s`` EXCLUDES \x0B (vertical tab) while Java's
#: includes it — so every whitespace class shared between the engines
#: uses this explicit set.  Byte-identical to the old Spark behavior
#: (Java ``\s`` ≡ this set without UNICODE_CHARACTER_CLASS), so no
#: clean-fixture hash moves; only the DuckDB twins change on VT/FF-
#: bearing text.
WS_CHARS = r" \t\n\x0B\f\r"
WS = rf"[{WS_CHARS}]+"

#: BPE-ish word/punctuation token pattern: runs of word chars OR runs of
#: non-word-non-space chars, the usual pre-tokenizer shape.
BPE_TOKEN = rf"\w+|[^\w{WS_CHARS}]+"

#: Tiny per-language marker-word sets for the n-gram/marker language-ID
#: heuristic.  Ordered: ties resolve to the FIRST language listed.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is"),
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "fr": ("le", "la", "et", "les", "des", "est"),
    "es": ("el", "los", "las", "es", "una", "para"),
}

#: English stopwords used by the quality profile's stopword ratio.
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "this", "that",
)



def tokens(text: Column | str) -> Column:
    """Whitespace tokens: ``split(text, '[ \\t\\n\\x0B\\f\\r]+')``."""
    return F.split(_col(text), WS)


def token_count(text: Column | str) -> Column:
    """Number of whitespace tokens."""
    return F.size(tokens(text))


def bpe_token_count(text: Column | str) -> Column:
    """Token count under the BPE-ish pre-tokenizer regex (word runs +
    punctuation runs) — the usual first-order estimate of LLM token
    cost, computed JVM-side via ``regexp_extract_all``."""
    return F.size(F.regexp_extract_all(_col(text), F.lit(BPE_TOKEN), 0))


def avg_token_length(text: Column | str) -> Column:
    """Mean characters per whitespace token."""
    t = tokens(text)
    return F.aggregate(
        t, F.lit(0.0), lambda acc, x: acc + F.length(x)
    ) / F.size(t)


def punct_ratio(text: Column | str) -> Column:
    """Share of characters that are neither word chars nor whitespace.
    Empty text scores 0.0 — the bare division would raise
    DIVIDE_BY_ZERO under Spark 4's default ANSI mode and abort the
    whole scoring job on the first empty document (SQL twins carry the
    same CASE guard)."""
    c = _col(text)
    return F.when(F.length(c) == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(c, rf"[\w{WS_CHARS}]", "")) / F.length(c)
    )


def stopword_ratio(
    text: Column | str, stopwords: Sequence[str] = STOPWORDS
) -> Column:
    """Share of whitespace tokens that are stopwords (duplicates count,
    so ``marker_hits``' filter+contains counting, not the deduping
    ``array_intersect``)."""
    return marker_hits(text, stopwords) / F.size(tokens(text))


def marker_hits(text: Column | str, markers: Sequence[str]) -> Column:
    """Count of tokens that appear in ``markers`` (duplicates count)."""
    m = F.array(*[F.lit(w) for w in markers])
    return F.size(F.filter(tokens(text), lambda x: F.array_contains(m, x)))


def lang_id(
    text: Column | str,
    markers: Mapping[str, Sequence[str]] = LANG_MARKERS,
    unknown: str = "und",
) -> Column:
    """Marker-word language-ID heuristic: score each candidate language
    by how many of its marker words occur, pick the max; ties resolve
    in mapping order; all-zero → ``unknown``.

    One pass over the token array per language — a few codegen'd
    higher-order expressions, no Python.  (On the synthetic fixture the
    shared word pool makes most docs ``unknown``; the operator is the
    deliverable, the corpus isn't natural language.)
    """
    scores = {lang: marker_hits(text, mk) for lang, mk in markers.items()}
    langs = list(scores)
    best = F.greatest(*scores.values()) if len(langs) > 1 else scores[langs[0]]
    expr = None
    for lang in langs:  # first language reaching the max wins
        cond = (scores[lang] == best) & (best > 0)
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    return expr.otherwise(F.lit(unknown))


def lang_id_sql(
    text_expr: str,
    markers: Mapping[str, Sequence[str]] = LANG_MARKERS,
    unknown: str = "und",
) -> str:
    """DuckDB twin of :func:`lang_id`, generated from the SAME marker
    dict so scores and tie-break order agree exactly."""
    tok = f"regexp_split_to_array({text_expr}, '[ \\t\\n\\x0B\\f\\r]+')"
    score = {}
    for lang, mk in markers.items():
        lit = "[" + ", ".join(f"'{w}'" for w in mk) + "]"
        score[lang] = f"len(list_filter({tok}, t -> list_contains({lit}, t)))"
    best = "greatest(" + ", ".join(score.values()) + ")"
    cases = " ".join(
        f"WHEN {score[lang]} = {best} AND {best} > 0 THEN '{lang}'"
        for lang in markers
    )
    return f"(CASE {cases} ELSE '{unknown}' END)"


def quality_score(text: Column | str) -> Column:
    """Composite quality heuristic in [0, 1]: rewards mid-range length,
    low punctuation density, and a sane mean token length.

    score = 0.4 * min(n_tokens / 64, 1)
          + 0.3 * (1 - min(punct_ratio * 5, 1))
          + 0.3 * (1 if 3 <= avg_token_len <= 10 else 0)
    """
    ntok = token_count(text).cast("double")
    p = punct_ratio(text)
    atl = avg_token_length(text)
    return (
        F.lit(0.4) * F.least(ntok / F.lit(64.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(p * F.lit(5.0), F.lit(1.0)))
        + F.lit(0.3)
        * F.when((atl >= 3.0) & (atl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
    )


def shingles_from_tokens(tok_col: Column | str, n: int = 3) -> Column:
    """Shingle array from an ALREADY-MATERIALIZED token-array column.
    Prefer :func:`with_shingles` on DataFrames: referencing a real
    column here means the tokenizer ran once per row, not once per
    shingle (see below)."""
    t = _col(tok_col)
    return F.when(F.size(t) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(t) - n),
            lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
        )
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word ``n``-gram shingles: overlapping windows of ``n`` tokens
    joined by a single space.  Docs shorter than ``n`` tokens yield an
    empty array.

    NOTE (hot paths): as a single inline expression the ``split``
    feeding the lambda is re-evaluated PER SHINGLE — codegen does not
    do common-subexpression elimination across a higher-order
    function boundary (measured 7.5× at sf0.1).  Use
    :func:`with_shingles` to stage tokens in their own projection
    when shingling a whole corpus; keep this form for oracle-SQL
    parity and one-off expressions."""
    return shingles_from_tokens(tokens(text), n)


def shingled(
    df,
    keep_cols: list[str],
    text_col: str = "text",
    n: int = 3,
    out: str = "__sh",
):
    """Corpus-scale shingle builder: project down to ``keep_cols`` +
    the token array in one projection, derive shingles from the bound
    column in a second.  With this minimal shape Catalyst leaves the
    two projections uncollapsed (the token array is referenced
    multiple times), so the tokenizer runs once per ROW — inlining it
    into the higher-order lambda re-evaluates it once per SHINGLE
    (codegen does no subexpression elimination across a lambda
    boundary; measured 7.5× at sf0.1).  Returns ``keep_cols`` + the
    ``out`` shingle-array column; carrying the full row width through
    defeats the non-collapse shape, so project first, join back later
    if you need more columns."""
    tok = f"__toks_{out}"
    staged = df.select(*keep_cols, tokens(text_col).alias(tok))
    return staged.select(
        *keep_cols, shingles_from_tokens(tok, n).alias(out)
    )


def fingerprint(text: Column | str, n: int = 3) -> Column:
    """Rolling-hash document fingerprint: the minimum md5 over the word
    ``n``-gram shingles (equivalently, a 1-hash MinHash signature).
    Documents sharing a fingerprint share at least one shingle — the
    cheapest near-dup bucket key."""
    return F.array_min(F.transform(shingles(text, n), F.md5))


def minhash_signature(
    text: Column | str, num_hashes: int = 6, n: int = 3
) -> Column:
    """MinHash signature: array of ``num_hashes`` values, the i-th
    being ``min(md5(i || ':' || shingle))`` over the doc's shingles.

    Salting md5 with the hash index gives ``num_hashes`` independent
    hash families while staying portable across engines (Spark and
    DuckDB md5 agree byte-for-byte; their native ``hash()`` functions
    do not).  P[sig_i matches] = Jaccard similarity, the classic
    MinHash estimator.
    """
    return minhash_signature_from(shingles(text, n), num_hashes)


def minhash_signature_from(shingle_col: Column, num_hashes: int = 6) -> Column:
    """Signature from an ALREADY-BUILT shingle array column.

    Use this when the shingle array is materialized in the plan (e.g.
    the LSH join builds it once and reuses it) — deriving the signature
    from the column avoids re-tokenizing the text once per hash family,
    which dominates the cost otherwise.  Duplicates in the input don't
    change a min, so distinct or raw shingle arrays give the same
    signature.
    """

    def salted_min(i: int) -> Column:
        # NOTE: the lambda must take exactly one parameter — pyspark
        # maps a second parameter to the array index, not a closure.
        return F.array_min(
            F.transform(
                shingle_col, lambda s: F.md5(F.concat_ws(":", F.lit(str(i)), s))
            )
        )

    return F.array(*[salted_min(i) for i in range(num_hashes)])
