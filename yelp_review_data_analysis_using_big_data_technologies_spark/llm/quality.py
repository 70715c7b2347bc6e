"""Content-hygiene operators: repetition profiling and PII redaction
(SURVEY.md §2.12 "training-data pipeline" tier).

Two filters every large-scale text pipeline runs before training:

- :func:`repetition_profile` — Gopher-style repetition metrics
  (Rae et al. 2021, "Scaling Language Models", §A1.1): documents
  dominated by one repeated token or by duplicated n-grams are
  low-quality boilerplate/spam.  Per doc:

  * ``n_tokens`` — whitespace token count;
  * ``top_token_frac`` — occurrences of the most frequent token /
    ``n_tokens`` (Gopher's "fraction of duplicate lines" family,
    token-granular because the synthetic corpus is single-line);
  * ``dup_ngram_frac`` — 1 − distinct/total ``shingle_n``-gram
    occurrences: the mass of repeated n-grams.

  Shape: one explode + two-level partial aggregation for the token
  mode (shuffle key = (doc, token) — no hot keys, partial aggs
  combine map-side), and a PURE PROJECTION for the n-gram ratio
  (``array_distinct`` over the in-row shingle array — zero shuffle).
  The tokenizer output is staged once (``staging.stage``) because two
  consumers branch from it; callers release after materializing.

- :func:`redact_pii` — masks emails / IPv4s / phone numbers with
  typed placeholder tokens and counts the redactions per row.  Pure
  codegen'd ``regexp_replace``/``regexp_count`` chain — stateless
  projection, distributes embarrassingly; patterns restricted to
  syntax shared by Java regex and RE2 so the DuckDB twin runs the
  exact same expressions.

Both carry generated SQL twins built from the same constants
(:func:`repetition_profile_sql`, :func:`redact_pii_sql`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .staging import stage
from .text import shingles_from_tokens, tokens

#: (name, pattern, replacement) — patterns use only Java∩RE2 syntax.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def repetition_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-doc repetition metrics: ``(id, n_tokens, top_token_frac,
    dup_ngram_frac)``.  See module docstring for the plan shape."""
    base = stage(df.select(F.col(id_col), tokens(text_col).alias("__t")))
    tok_stats = (
        base.select(id_col, F.explode("__t").alias("__tok"))
        .groupBy(id_col, "__tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(
            F.sum("__c").alias("n_tokens"),
            F.max("__c").alias("__top"),
        )
    )
    # Bind the shingle array in its own projection FIRST: higher-order
    # lambdas are excluded from subexpression elimination, so inlining
    # ``shingles_from_tokens`` under both size() calls materializes
    # every row's n-gram array twice (verified in the physical plan).
    gram_stats = base.select(
        id_col, shingles_from_tokens("__t", shingle_n).alias("__g")
    ).select(
        id_col,
        F.size("__g").alias("__gt"),
        F.size(F.array_distinct("__g")).alias("__gd"),
    )
    return (
        tok_stats.join(gram_stats, on=id_col)
        .select(
            id_col,
            "n_tokens",
            F.round(F.col("__top") / F.col("n_tokens"), 6).alias(
                "top_token_frac"
            ),
            F.when(F.col("__gt") <= 0, F.lit(0.0))
            .otherwise(F.round(1 - F.col("__gd") / F.col("__gt"), 6))
            .alias("dup_ngram_frac"),
        )
    )


def repetition_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    max_top_token_frac: float = 0.2,
    max_dup_ngram_frac: float = 0.3,
) -> DataFrame:
    """Documents passing the repetition thresholds (the Gopher-rule
    composition: profile → threshold → anti-join the FAILURES away).

    Anti-join of failures, not semi-join of passes: the profile only
    scores docs with tokens, so a semi-join would silently delete
    UNSCORED docs (NULL/empty text) that violate no repetition
    threshold.  A repetition filter's job is repetition; dropping
    empty docs belongs to an explicit length/not-null rule."""
    fail = (
        repetition_profile(df, id_col, text_col, shingle_n)
        .filter(
            (F.col("top_token_frac") > max_top_token_frac)
            | (F.col("dup_ngram_frac") > max_dup_ngram_frac)
        )
        .select(id_col)
    )
    return df.join(fail, on=id_col, how="left_anti")


def repetition_profile_sql(
    shingle_n: int = 3, table: str = "documents", where: str = "TRUE"
) -> str:
    """DuckDB twin of :func:`repetition_profile`."""
    toks = "regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+')"
    parts = ", ".join(f"{toks}[i+{j + 1}]" for j in range(shingle_n))
    grams = (
        f"CASE WHEN len({toks}) < {shingle_n} THEN [] "
        f"ELSE list_transform(range(len({toks}) - {shingle_n - 1}), "
        f"i -> concat_ws(' ', {parts})) END"
    )
    return f"""
WITH src AS (SELECT doc_id, text FROM {table} WHERE {where}),
tok AS (
  SELECT doc_id, unnest({toks}) AS t FROM src
), tok_stats AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, max(c) AS top
  FROM (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t)
  GROUP BY doc_id
), gram_stats AS (
  SELECT doc_id, len({grams}) AS gt,
         len(list_distinct({grams})) AS gd
  FROM src
)
SELECT doc_id, n_tokens,
       round(top * 1.0 / n_tokens, 6) AS top_token_frac,
       CASE WHEN gt <= 0 THEN 0.0
            ELSE round(1 - gd * 1.0 / gt, 6) END AS dup_ngram_frac
FROM tok_stats JOIN gram_stats USING (doc_id)
"""


def _redacted(text_col: Column | str) -> Column:
    out = F.col(text_col) if isinstance(text_col, str) else text_col
    for _name, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def _n_redactions(text_col: Column | str) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    out = F.lit(0)
    for _name, pat, _repl in PII_PATTERNS:
        out = out + F.regexp_count(c, F.lit(pat))
    return out


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "clean_text",
    count_col: str = "n_redactions",
) -> DataFrame:
    """Mask every :data:`PII_PATTERNS` match in ``text_col`` with its
    typed placeholder and count matches per row.  Counting runs on the
    ORIGINAL text, so overlapping pattern classes (an email whose
    domain embeds digits, say) count what the raw text contained, not
    the post-substitution string."""
    return df.withColumn(out_col, _redacted(text_col)).withColumn(
        count_col, _n_redactions(text_col)
    )


def redact_pii_sql(text_expr: str) -> tuple[str, str]:
    """DuckDB twin pair for :func:`redact_pii`: returns
    ``(clean_sql, count_sql)`` expression strings over ``text_expr``
    (DuckDB needs the 'g' flag for replace-all; counts via
    ``regexp_extract_all``)."""
    clean = text_expr
    count_terms = []
    for _name, pat, repl in PII_PATTERNS:
        escaped = pat.replace("'", "''")
        clean = f"regexp_replace({clean}, '{escaped}', '{repl}', 'g')"
        count_terms.append(f"len(regexp_extract_all({text_expr}, '{escaped}'))")
    return clean, " + ".join(count_terms)
