"""Duplicated-passage span detection (the k-gram approximation of
exact-substring training-data dedup, Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better").

MinHash/SimHash ask "are these DOCUMENTS similar?"; winnowing asks
"do two documents share a run?".  This operator answers the substring
dedup question directly: WHERE inside each document does text occur
that also occurs elsewhere in the corpus (or again in the same
document)?  The suffix-array construction of the paper is inherently
sequential; the distributed k-gram relaxation is standard: a token
position is *duplicated* iff the ``k``-gram starting there occurs at
least ``min_count`` times corpus-wide, and maximal runs of duplicated
positions merge into spans.  Every exact repeat of length ≥ k tokens
is caught (its every k-window repeats); nothing shorter than k can
flag a position — so spans approximate the suffix-array answer at
k-token resolution, the same trade the paper's MinHash baseline makes.

Plan shape (the 100-TB story):

1. tokenize→shingle as two uncollapsed projections (``shingled()`` —
   the measured 7.5× staging rule) + ``posexplode`` → one row per
   token position, md5-hashed shingle (portable across engines);
2. occurrence counts by shingle hash: partial-agg groupBy (map-side
   combine) — NOT a count window, which would shuffle full rows and
   serialize each viral shingle's partition; the agg+join shape lets
   AQE split a skewed hash;
3. flagged positions join back on the hash (shuffle equi-join);
4. span merge is the classic gaps-and-islands: per-document window
   (lag + running sum), bounded by document length, one hash shuffle.

No all-pairs stage anywhere; within-doc state is O(doc length).

Occurrence semantics: ``min_count`` counts OCCURRENCES, not documents
— a passage pasted twice into one document is a duplicate span too,
matching the suffix-array semantics (the corpus repeats the bytes,
regardless of where).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .staging import spread, stage
from .text import shingled
from .winnow import _TOK_SQL, _shingle_sql


def dup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Merged duplicated-passage spans →
    ``(id_col, span_start, span_end, span_tokens, n_dup_shingles)``
    with token-index spans, ``span_end`` exclusive.

    Adjacent or overlapping duplicated k-grams merge into one span
    (gap rule: positions ``p`` and ``p'`` belong to one span iff
    ``p' - p <= k``, i.e. their windows overlap or touch — touching
    runs are contiguous duplicated text).  Documents with fewer than
    ``k`` tokens produce no shingles and are absent; NULL ids are not
    attributable and are dropped (the pack_bins/winnow contract).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 2:
        raise ValueError(
            f"min_count must be >= 2 (1 would flag every position), "
            f"got {min_count}"
        )
    sid = F.col(id_col)
    sh = spread(shingled(df.where(sid.isNotNull()), [id_col], text_col, n=k))
    # one row per token position; staged because both the occurrence
    # count and the join-back reference it (without the persist the
    # tokenizer pipeline executes twice)
    pos_sh = stage(
        sh.select(sid, F.posexplode("__sh").alias("__p", "__s")).select(
            sid, "__p", F.md5("__s").alias("__h")
        )
    )
    dup = (
        pos_sh.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__occ"))
        .where(F.col("__occ") >= min_count)
        .select("__h")
    )
    flagged = pos_sh.join(dup, "__h").select(sid, "__p")
    w_ord = Window.partitionBy(id_col).orderBy("__p")
    run = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = flagged.withColumn(
        "__brk",
        F.when(
            F.lag("__p").over(w_ord).isNull()
            | (F.col("__p") - F.lag("__p").over(w_ord) > k),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("__isl", F.sum("__brk").over(run))
    return (
        islands.groupBy(sid, F.col("__isl"))
        .agg(
            F.min("__p").alias("span_start"),
            (F.max("__p") + k).alias("span_end"),
            F.count(F.lit(1)).alias("n_dup_shingles"),
        )
        .select(
            sid,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
            "n_dup_shingles",
        )
        .orderBy(id_col, "span_start")
    )


def dup_spans_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    k: int = 5,
    min_count: int = 2,
) -> str:
    """DuckDB twin of :func:`dup_spans` — same md5 shingle hashes,
    same occurrence threshold, same gaps-and-islands merge.  Shares
    the ngram family's documented quadratic-shingle twin ceiling
    (DuckDB re-derives the token array per shingle; fine at oracle
    scale, the Spark side stays linear)."""
    return f"""
WITH tk AS (
  SELECT {id_col}, {_TOK_SQL} AS tk FROM {table}
  WHERE {id_col} IS NOT NULL
), sh AS (
  SELECT {id_col}, {_shingle_sql(k)} AS sh FROM tk
), pos AS (
  SELECT {id_col}, unnest(range(len(sh))) AS p, unnest(sh) AS s
  FROM sh
), hashed AS (
  SELECT {id_col}, p, md5(s) AS h FROM pos
), dup AS (
  SELECT h FROM hashed GROUP BY h HAVING count(*) >= {min_count}
), flagged AS (
  SELECT {id_col}, p FROM hashed JOIN dup USING (h)
), isl AS (
  SELECT {id_col}, p,
         CASE WHEN lag(p) OVER w IS NULL
                OR p - lag(p) OVER w > {k} THEN 1 ELSE 0 END AS brk
  FROM flagged
  WINDOW w AS (PARTITION BY {id_col} ORDER BY p)
), run AS (
  SELECT {id_col}, p,
         sum(brk) OVER (PARTITION BY {id_col} ORDER BY p) AS island
  FROM isl
)
SELECT {id_col},
       CAST(min(p) AS INT) AS span_start,
       CAST(max(p) + {k} AS INT) AS span_end,
       CAST(max(p) + {k} - min(p) AS INT) AS span_tokens,
       count(*) AS n_dup_shingles
FROM run GROUP BY {id_col}, island
ORDER BY {id_col}, span_start
"""
