"""Vector similarity search over embedding columns (SURVEY.md §2.12).

Embeddings are ordinary ``array<float>`` columns; similarity is
computed with codegen'd higher-order functions (``zip_with`` +
``aggregate``) — no Python UDF in the scoring path, and DuckDB's
``list_cosine_similarity`` agrees to 6 decimals so everything here is
oracle-checkable.

Two retrieval strategies:

- :func:`top_k_bruteforce` — the exact baseline: broadcast the (small)
  query set against the corpus, score, window-rank per query.  Cost is
  ``|Q| × N`` — linear in the corpus, NOT an N×N all-pairs join; at
  1000 executors the corpus stays partition-parallel and each
  partition scores only the broadcast queries.
- :func:`top_k_ann_signlsh` — the scale path: random-hyperplane
  (sign) LSH buckets both sides; each query only scores its bucket.
  Planes are fixed literals (deterministic, engine-portable); recall
  is tunable via ``n_planes``.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Fixed random hyperplanes for sign-LSH, generated once from a seeded
#: RNG and frozen as literals so Spark, the SQL oracle, and re-runs all
#: see the same planes.  8 planes → 256 buckets.
N_PLANES = 8
EMBEDDING_DIM = 64


def _frozen_planes(n_planes: int = N_PLANES, dim: int = EMBEDDING_DIM) -> list[list[float]]:
    import numpy as np

    rng = np.random.default_rng(42)
    return [[round(float(x), 6) for x in rng.standard_normal(dim)] for _ in range(n_planes)]


PLANES: list[list[float]] = _frozen_planes()


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns via ``zip_with`` + ``aggregate``
    (sequential double accumulation — deterministic order, matching the
    oracle's list functions)."""
    return F.aggregate(
        F.zip_with(_col(a), _col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(_col(a), lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; cast inputs to ``array<double>`` FIRST so both
    engines accumulate at the same precision."""
    return dot(a, b) / (norm(a) * norm(b))


def lit_vector(values: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in values])


def top_k_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query vector.

    ``broadcast(queries) × corpus`` — each corpus partition scores the
    handful of broadcast queries (|Q|·N work, no shuffle of the corpus)
    — then one window rank partitioned by query.  Ties broken by
    ``id_col`` so the result is deterministic across engines.
    """
    corpus = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    q = queries.select(
        F.col(query_id_col), F.col(query_vec_col).cast("array<double>").alias("__q")
    )
    scored = corpus.crossJoin(F.broadcast(q)).withColumn(
        "__cos", cosine("__v", "__q")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("__cos"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            query_id_col,
            id_col,
            F.round("__cos", 6).alias("cos_sim"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


def sign_bucket(vec: Column | str, planes: list[list[float]] = PLANES) -> Column:
    """Sign-LSH bucket id: bit i is set iff ``vec · plane_i >= 0``.
    Nearby vectors agree on most signs → collide in the same bucket
    with probability 1 - θ/π per plane."""
    v = _col(vec)
    out = F.lit(0)
    for i, p in enumerate(planes):
        out = out + F.when(dot(v, lit_vector(p)) >= 0, F.lit(2**i)).otherwise(F.lit(0))
    return out


def sign_bucket_sql(vec_expr: str, planes: list[list[float]] = PLANES) -> str:
    """DuckDB twin of :func:`sign_bucket`, generated from the SAME
    frozen plane literals."""
    terms = []
    for i, p in enumerate(planes):
        lit = "[" + ", ".join(repr(x) for x in p) + "]"
        terms.append(
            f"CASE WHEN list_dot_product(CAST({vec_expr} AS DOUBLE[]), {lit}) >= 0 "
            f"THEN {2**i} ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


def top_k_ann_signlsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    planes: list[list[float]] = PLANES,
) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by sign-LSH, join
    ON THE BUCKET (equi-join, shuffle partitioned by bucket — the
    bucket key replaces the crossJoin), rank within bucket.

    Recall < 1 by design; the bruteforce variant is the exactness
    baseline and the unit tests measure recall against it.
    """
    corpus = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    ).withColumn("__bucket", sign_bucket("__v", planes))
    q = queries.select(
        F.col(query_id_col), F.col(query_vec_col).cast("array<double>").alias("__q")
    ).withColumn("__bucket", sign_bucket("__q", planes))
    scored = corpus.join(F.broadcast(q), on="__bucket").withColumn(
        "__cos", cosine("__v", "__q")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("__cos"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            query_id_col,
            id_col,
            F.round("__cos", 6).alias("cos_sim"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


def cosine_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.4,
    n_planes: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-LSH bucket both
    sides (coarser bucket than ANN retrieval — ``n_planes`` of the
    frozen planes — since near-dup detection wants recall at moderate
    similarity), equi-join ON THE BUCKET, verify with exact cosine.
    Returns ``(id_a, id_b, cos_sim)`` with ``id_a < id_b``.

    Same no-all-pairs guarantee as the MinHash text path: the shuffle
    key is the bucket, candidates only ever compare within-bucket.
    """
    planes = PLANES[:n_planes]
    a = embeddings.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).cast("array<double>").alias("__va"),
    ).withColumn("__bucket", sign_bucket("__va", planes))
    b = embeddings.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).cast("array<double>").alias("__vb"),
    ).withColumn("__bucket", sign_bucket("__vb", planes))
    return (
        a.join(b, on="__bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", F.round(cosine("__va", "__vb"), 6))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def cosine_near_dup_sql(
    threshold: float = 0.4, n_planes: int = 4, table: str = "embeddings"
) -> str:
    """DuckDB twin of :func:`cosine_near_dup_pairs` (same frozen
    planes, same bucket arithmetic)."""
    bucket = sign_bucket_sql("embedding", PLANES[:n_planes])
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, {bucket} AS bucket FROM {table}
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 6) >= {threshold}
"""


def seed_centroids(
    embeddings: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic IVF coarse quantizer: the ``n_cells`` corpus
    vectors with the smallest ids become the cell centroids
    (``cell_id`` densely numbered in id order).  A stand-in for a
    KMeans fit (:func:`train_centroids_kmeans`) that keeps the whole
    index reproducible and oracle-checkable; the downstream plan —
    broadcast centroids, cell equi-join — is identical either way."""
    seeds = embeddings.select(id_col, vec_col).orderBy(id_col).limit(n_cells)
    w = Window.orderBy(id_col)
    return seeds.select(
        (F.row_number().over(w) - 1).alias("cell_id"),
        F.col(vec_col).cast("array<double>").alias("__c"),
    )


def assign_cells(
    embeddings: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every corpus vector to its nearest centroid (max cosine,
    ties → smallest ``cell_id``).

    Plan shape at scale: centroids broadcast (K rows), corpus ×
    centroids is a map-side K-fan-out with NO shuffle, and the
    arg-max collapses back to one row per vector via a partial
    aggregate (map-side combine reduces K candidate rows to 1 before
    the single N-row shuffle) — not a window sort."""
    corpus = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("__v")
    )
    scored = corpus.crossJoin(F.broadcast(centroids)).withColumn(
        "__sim", cosine("__v", "__c")
    )
    best = scored.groupBy(id_col).agg(
        F.max(
            F.struct(
                F.col("__sim").alias("s"), (-F.col("cell_id")).alias("nc")
            )
        ).alias("__m"),
        F.first("__v").alias("__v"),
    )
    return best.select(
        id_col, "__v", (-F.col("__m.nc")).cast("int").alias("cell_id")
    )


def top_k_ann_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into
    ``n_cells`` inverted lists, probe only the ``n_probe`` cells
    nearest each query.

    Complements :func:`top_k_ann_signlsh`: LSH buckets are oblivious
    (no training, bucket count fixed by plane count); IVF adapts cells
    to the data distribution and gives a recall/cost dial (``n_probe``)
    without re-indexing.  Search cost is ``|Q| · n_probe · N/n_cells``
    versus bruteforce ``|Q| · N``."""
    cents = centroids if centroids is not None else seed_centroids(
        embeddings, n_cells, id_col, vec_col
    )
    assigned = assign_cells(embeddings, cents, id_col, vec_col)
    q = queries.select(
        F.col(query_id_col), F.col(query_vec_col).cast("array<double>").alias("__q")
    )
    qscored = q.crossJoin(F.broadcast(cents)).withColumn(
        "__sim", cosine("__q", "__c")
    )
    wprobe = Window.partitionBy(query_id_col).orderBy(
        F.desc("__sim"), F.asc("cell_id")
    )
    probes = (
        qscored.withColumn("__pr", F.row_number().over(wprobe))
        .filter(F.col("__pr") <= n_probe)
        .select(query_id_col, "__q", "cell_id")
    )
    scored = assigned.join(F.broadcast(probes), on="cell_id").withColumn(
        "__cos", cosine("__v", "__q")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("__cos"), F.asc(id_col))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            query_id_col,
            id_col,
            F.round("__cos", 6).alias("cos_sim"),
            F.col("rk").cast("int").alias("rk"),
        )
    )


def train_centroids_kmeans(
    embeddings: DataFrame,
    n_cells: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """Production coarse quantizer: fit KMeans (pyspark.ml — Lloyd
    iterations run distributed) and return centroids in the same
    ``(cell_id, __c)`` shape :func:`assign_cells` expects.  Not
    oracle-checkable (iterative); recall is unit-tested instead."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    spark = embeddings.sparkSession
    feats = embeddings.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(rows, "cell_id int, __c array<double>")


def normalize(vec: Column | str) -> Column:
    """L2-normalize an array column (zero vectors pass through as-is to
    avoid division by zero)."""
    v = _col(vec)
    n = norm(v)
    return F.when(n == 0, v).otherwise(F.transform(v, lambda x: x / n))


def centroid_distances(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label centroid + each vector's cosine to its own centroid —
    the IVF coarse-quantizer building block, computed distributedly:
    posexplode to (label, dim, value), partial-agg means per (label,
    dim), re-assemble with ``array_agg`` ordered by dim."""
    exploded = embeddings.select(
        F.col(id_col),
        F.col(label_col),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("__dim", "__x"),
    )
    cents = (
        exploded.groupBy(label_col, "__dim")
        .agg(F.avg("__x").alias("__m"))
        .groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("__dim", "__m"))).alias("__dm"))
        .select(
            label_col,
            F.transform("__dm", lambda s: s["__m"]).alias("__centroid"),
        )
    )
    return (
        embeddings.select(
            id_col, label_col, F.col(vec_col).cast("array<double>").alias("__v")
        )
        .join(F.broadcast(cents), on=label_col)
        .select(
            id_col,
            label_col,
            F.round(cosine("__v", "__centroid"), 6).alias("cos_to_centroid"),
        )
    )
