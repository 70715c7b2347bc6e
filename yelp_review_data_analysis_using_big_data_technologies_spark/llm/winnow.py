"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS local fingerprinting algorithm).

MinHash answers "are these documents similar overall?"; winnowing
answers "do they share a *contiguous run* of content, and where?" —
the primitive behind plagiarism detection, quote/boilerplate mining,
and positional near-dup evidence.  Guarantee: any shared token run of
at least ``w + k - 1`` tokens produces at least one shared
fingerprint, while no fingerprint is taken from a run shorter than
``k`` tokens.

Algorithm per document:

1. word ``k``-gram shingles with their 0-based positions;
2. portable hash per shingle (md5 hex — Spark and DuckDB agree
   byte-for-byte, unlike their native ``hash()``s);
3. sliding window of ``w`` consecutive shingle hashes; from each
   window select the MINIMUM hash, ties broken to the LEFTMOST
   position (the classic algorithm picks the rightmost; leftmost is
   the same guarantee and is what a single engine-portable
   ``min(hash || ':' || zero-padded pos)`` expression yields, so both
   engines share one tie rule by construction);
4. the fingerprint set is the DISTINCT (hash, position) selections.

Spark plan shape (the 100-TB story): tokenize/shingle/hash are pure
projections, the window min is a ``doc_id``-partitioned running
window (one hash shuffle, per-partition sort, w-row frame state), and
the distinct is a second shuffle on (doc, selection) — no
all-pairs stage anywhere.  Document length bounds per-key work, so
there is no skew beyond the corpus's own longest doc.

``winnow_pairs`` then turns fingerprints into near-dup candidate
pairs by an inverted-index self-join on the fingerprint hash — the
same bucket-join shape as banded MinHash LSH, with the same
df-cap defense (a fingerprint appearing in more than ``max_df`` docs
is boilerplate; it is dropped from pairing BEFORE the join so one
viral snippet cannot quadratically explode a bucket).

Oracle note: the DuckDB twins share the quadratic-shingle ceiling
documented for the ngram family (fine at oracle scale); the Spark
side stages tokens once per doc and stays linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .staging import spread, stage
from .text import shingled

#: zero-pad width for positions inside the min-selection encoding;
#: lexicographic order == numeric order only while positions fit, so
#: docs are bounded at 10^9 shingles (a ~4 GB single document — far
#: past any sane row size; the bound is documented, not checked).
_POS_PAD = 9


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Per-document winnowing fingerprint set →
    ``(id_col, fp_pos, fp)`` sorted by (id, position).

    * ``k`` — shingle width in tokens (no fingerprint from a run
      shorter than this);
    * ``w`` — window width in shingles (every shared run of
      ``w + k - 1`` tokens is caught).

    Short docs: with ``0 < m < w`` shingles there is one clamped
    window (the global min — winnowing degrades to the 1-hash
    MinHash :func:`~.text.fingerprint`); with no shingles (empty or
    NULL text, or fewer than ``k`` tokens) the doc is absent from the
    output.  NULL ids are not fingerprintable and are dropped — the
    same contract as pack_bins.
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1, got k={k} w={w}")
    sid = F.col(id_col)
    # shingled() keeps tokenize→shingle as two UNCOLLAPSED projections
    # (inlining the tokenizer into the shingle lambda re-runs it per
    # SHINGLE — the measured 7.5× trap); spread() lifts the CPU-heavy
    # md5/explode stage off a single input split on byte-tiny inputs
    # (no-op when the table already has cluster parallelism).
    sh = spread(
        shingled(df.where(sid.isNotNull()), [id_col], text_col, n=k)
    )
    staged = sh.select(
        sid,
        F.size("__sh").alias("__m"),
        F.posexplode("__sh").alias("__p", "__s"),
    )
    enc = F.concat(
        F.md5("__s"),
        F.lit(":"),
        F.lpad(F.col("__p").cast("string"), _POS_PAD, "0"),
    )
    frame = (
        Window.partitionBy(id_col)
        .orderBy("__p")
        .rowsBetween(Window.currentRow, w - 1)
    )
    return (
        staged.select(
            sid,
            F.col("__m"),
            F.col("__p"),
            F.min(enc).over(frame).alias("__sel"),
        )
        .where(F.col("__p") <= F.greatest(F.col("__m") - w, F.lit(0)))
        .select(sid, F.col("__sel"))
        .distinct()
        .select(
            sid,
            F.substring("__sel", 34, _POS_PAD).cast("int").alias("fp_pos"),
            F.substring("__sel", 1, 32).alias("fp"),
        )
        .orderBy(id_col, "fp_pos")
    )


def winnow_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 2,
    max_df: int = 64,
) -> DataFrame:
    """Candidate near-dup pairs from a :func:`winnow_fingerprints`
    output: documents sharing at least ``min_shared`` distinct
    fingerprint hashes → ``(id_a, id_b, n_shared)``.

    Inverted-index self-join on the hash (shuffle key = fp), with
    fingerprints present in more than ``max_df`` documents dropped
    before the join — the LSH ``max_bucket`` / ngram ``max_df``
    defense against boilerplate buckets going quadratic.
    """
    # stage(): the fingerprint pipeline (window + distinct) is
    # referenced THREE times below (both join sides + the df cut) —
    # without the persist it would re-execute per reference
    by_fp = stage(fps.select(F.col(id_col).alias("id"), "fp").distinct())
    rare = (
        by_fp.groupBy("fp")
        .agg(F.count("*").alias("__df"))
        .where(F.col("__df") <= max_df)
        .select("fp")
    )
    indexed = by_fp.join(rare, "fp")
    a, b = indexed.alias("a"), indexed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins
# ---------------------------------------------------------------------------

_TOK_SQL = r"regexp_split_to_array(text, '[ \t\n\x0B\f\r]+')"


def _shingle_sql(k: int) -> str:
    parts = ", ".join(f"tk[i+{j + 1}]" for j in range(k))
    return (
        f"CASE WHEN len(tk) < {k} THEN CAST([] AS VARCHAR[]) "
        f"ELSE list_transform(range(len(tk) - {k - 1}), "
        f"i -> concat_ws(' ', {parts})) END"
    )


def winnow_fingerprints_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> str:
    """DuckDB twin of :func:`winnow_fingerprints` — same md5 hashes,
    same ``hash:pos`` min-encoding, same clamped window frame."""
    return f"""
WITH tk AS (
  SELECT {id_col}, {_TOK_SQL} AS tk FROM {table}
  WHERE {id_col} IS NOT NULL
), sh AS (
  SELECT {id_col}, {_shingle_sql(k)} AS sh FROM tk
), pos AS (
  SELECT {id_col}, len(sh) AS m,
         unnest(range(len(sh))) AS p, unnest(sh) AS s
  FROM sh
), win AS (
  SELECT {id_col}, m, p,
         min(md5(s) || ':' || lpad(CAST(p AS VARCHAR), {_POS_PAD}, '0'))
           OVER (PARTITION BY {id_col} ORDER BY p
                 ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS sel
  FROM pos
)
SELECT DISTINCT {id_col},
       CAST(substring(sel, 34, {_POS_PAD}) AS INT) AS fp_pos,
       substring(sel, 1, 32) AS fp
FROM win WHERE p <= greatest(m - {w}, 0)
ORDER BY {id_col}, fp_pos
"""


def winnow_pairs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 64,
) -> str:
    """DuckDB twin of :func:`winnow_pairs` over
    :func:`winnow_fingerprints_sql` output."""
    return f"""
WITH fps AS ({winnow_fingerprints_sql(table, id_col, k, w)}),
by_fp AS (SELECT DISTINCT {id_col} AS id, fp FROM fps),
rare AS (
  SELECT fp FROM by_fp GROUP BY fp HAVING count(*) <= {max_df}
),
indexed AS (SELECT id, fp FROM by_fp JOIN rare USING (fp))
SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared
FROM indexed a JOIN indexed b ON a.fp = b.fp AND a.id < b.id
GROUP BY 1, 2 HAVING count(*) >= {min_shared}
ORDER BY id_a, id_b
"""
