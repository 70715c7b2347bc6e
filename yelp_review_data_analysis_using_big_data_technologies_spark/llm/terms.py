"""Corpus-level term statistics: TF-IDF keyword extraction and
fixed-stride token chunking (SURVEY.md §2.12 "text analysis").

Two document-preparation operators every training/retrieval pipeline
runs between cleaning and training:

- :func:`tf_idf_top_terms` — the classic two-aggregate TF-IDF:
  per-(doc, term) term frequency, per-term document frequency, score
  = tf · ln(N / df), top-k terms per document.  Expressed as explode
  → two hash aggregates → key join → per-doc window; the corpus size
  N enters the plan as a broadcast one-row aggregate, NOT a
  driver-side ``count()``, so the whole thing stays one lazy plan.
- :func:`token_chunks` — split each document's token stream into
  fixed-size overlapping windows (``chunk`` tokens every ``stride``)
  — the context-window packing step before tokenizer/embedding
  batching.  Start offsets come from ``sequence``, the windows from
  ``slice`` — all codegen'd array ops, one explode, no UDFs.

Scale notes: TF-IDF's shuffles key on ``term`` (df, vocabulary-
bounded) and ``doc_id`` (top-k window, corpus-partitioned) — both
well-distributed; the df relation is vocabulary-sized and the join
onto the tf relation broadcasts when small.  Chunking is a stateless
per-row explode: output rows ≈ n_tokens / stride per doc, no
shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.llm import text as ltx

_TOK_SQL = "regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+')"


def tf_idf_top_terms(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document: ``(doc_id, term, tf,
    score, rk)`` with ``score = tf * ln(n_docs / df)`` rounded to 6
    places and ties broken by term text."""
    toks = docs.select(id_col, F.explode(ltx.tokens(text_col)).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(df_, on="term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "score",
            F.round(
                F.col("tf") * F.log(F.col("__n") / F.col("df")), 6
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "tf", "score", "rk")
    )


def tf_idf_top_terms_sql(k: int = 3, table: str = "documents") -> str:
    """DuckDB twin of :func:`tf_idf_top_terms` — same formula, same
    tie-break."""
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_TOK_SQL}) AS term FROM {table}
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
), df AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), total AS (
  SELECT count(*) AS n FROM {table}
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * ln(total.n * 1.0 / df.df), 6) AS score
  FROM tf JOIN df USING (term) CROSS JOIN total
)
SELECT doc_id, term, tf, score, CAST(rk AS INTEGER) AS rk
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, term ASC
  ) AS rk FROM scored
) WHERE rk <= {k}
"""


def token_chunks(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Fixed-stride token windows per document: one output row per
    chunk with ``(doc_id, chunk_idx, n_chunk_tokens, chunk_hash)``.
    Chunk ``i`` covers tokens ``[i*stride, i*stride + chunk)``; the
    final chunk may be short; every token lands in ≥1 chunk.  The
    hash is ``md5`` of the space-joined window — a portable content
    key for chunk-level dedup downstream."""
    if not 0 < stride <= chunk:
        raise ValueError(
            f"stride must satisfy 0 < stride <= chunk, got stride={stride} "
            f"chunk={chunk} (stride > chunk would silently leave tokens "
            "covered by NO chunk, breaking the total-coverage contract)"
        )
    # NULL text → no chunks: without the filter Spark emits one row
    # per NULL doc hashing the EMPTY string (concat_ws over a null
    # array) while the SQL twin emits NULL hashes — and neither is a
    # chunk of anything.
    staged = docs.filter(F.col(text_col).isNotNull()).select(
        id_col, ltx.tokens(text_col).alias("__tk")
    )
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("__tk") - 1, F.lit(0)), F.lit(stride)
    )
    exploded = staged.select(
        id_col, "__tk", F.explode(starts).alias("__start")
    )
    win = F.slice(F.col("__tk"), F.col("__start") + 1, chunk)
    return exploded.select(
        id_col,
        (F.col("__start") / stride).cast("int").alias("chunk_idx"),
        F.size(win).alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", win)).alias("chunk_hash"),
    )


def token_chunks_sql(
    chunk: int = 64, stride: int = 48, table: str = "documents"
) -> str:
    """DuckDB twin of :func:`token_chunks` (list slices are 1-based
    and inclusive-end: ``tk[s+1 : s+chunk]`` == Spark
    ``slice(tk, s+1, chunk)``); same stride contract."""
    if not 0 < stride <= chunk:
        raise ValueError(
            f"stride must satisfy 0 < stride <= chunk, got stride={stride} "
            f"chunk={chunk}"
        )
    return f"""
WITH t AS (
  SELECT doc_id, {_TOK_SQL} AS tk FROM {table} WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(start // {stride} AS INTEGER) AS chunk_idx,
       CAST(len(tk[start+1 : start+{chunk}]) AS INTEGER) AS n_chunk_tokens,
       md5(array_to_string(tk[start+1 : start+{chunk}], ' ')) AS chunk_hash
FROM t, unnest(range(0, greatest(len(tk), 1), {stride})) AS u(start)
"""
