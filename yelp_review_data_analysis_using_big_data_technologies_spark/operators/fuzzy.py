"""Fuzzy (edit-distance) matching via the blocked sorted-neighborhood
method (Hernández & Stolfo, SIGMOD'95) — the entity-resolution
strategy that scales where a naive edit-distance join is N².

Candidates are pairs within ``window`` positions of each other in the
sort order of the match key WITHIN a blocking key: the window
partitions by block and sorts by key, so ``lead(key, i)`` for i in
1..window pairs each row with its next ``window`` neighbors —
candidate count is exactly ``N·window``, linear in N, and the shuffle
key is the block (ordinary hash partitioning, no global sort).
Verification is exact ``levenshtein ≤ k``, which Spark and DuckDB
implement with the same unrestricted-edit-distance DP, so the oracle
twin agrees exactly.

Two recall trades define the method, both deliberate:
- pairs in DIFFERENT blocks are never candidates (choose a block the
  expected duplicates agree on — a prefix, soundex, zip code);
- within a block, only pairs ≤ ``window`` apart in sort order are
  candidates (prefix typos move a record far away in the order).
The standard upgrade for both is multi-pass: re-run with different
block/sort keys and union the results — it composes from this same
operator.  ``block_col=None`` degrades to one global window (fine for
small dims; at scale always block).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fuzzy_pairs_sorted_neighborhood(
    df: DataFrame,
    id_col: str,
    key_col: str,
    window: int = 3,
    max_distance: int = 1,
    block_col: Column | str | None = None,
) -> DataFrame:
    """Pairs ``(id_a, id_b, distance)`` with edit distance ≤
    ``max_distance`` among rows within ``window`` positions in
    ``key_col``'s sort order inside each block (ties broken by id —
    deterministic for unique (key, id))."""
    if window < 1:
        raise ValueError("window must be >= 1")
    # NULLS FIRST explicitly on both sort keys: Spark's ASC default,
    # but the SQL twin must pin the same (DuckDB defaults NULLS LAST),
    # else a NULL id tie-breaking among duplicate keys lands on the
    # opposite side of the neighborhood per engine.
    order = [F.asc_nulls_first(key_col), F.asc_nulls_first(id_col)]
    if block_col is not None:
        blk = F.col(block_col) if isinstance(block_col, str) else block_col
        # project the block expression IN the same select that narrows
        # the frame — narrowing first would drop any OTHER column the
        # block expression references (e.g. block_col="zip" with
        # key_col="name", the docstring's own suggested use)
        base = df.select(F.col(id_col), F.col(key_col), blk.alias("__blk"))
        w = Window.partitionBy("__blk").orderBy(*order)
    else:
        base = df.select(F.col(id_col), F.col(key_col))
        w = Window.orderBy(*order)
    cols = [
        F.struct(
            F.lead(id_col, i).over(w).alias("nid"),
            F.lead(key_col, i).over(w).alias("nkey"),
        )
        for i in range(1, window + 1)
    ]
    paired = (
        base.withColumn("__nbrs", F.array(*cols))
        .select(id_col, key_col, F.explode("__nbrs").alias("__n"))
        .filter(F.col("__n.nid").isNotNull())
    )
    return (
        paired.withColumn(
            "distance", F.levenshtein(F.col(key_col), F.col("__n.nkey"))
        )
        .filter(F.col("distance") <= max_distance)
        .select(
            F.col(id_col).alias("id_a"),
            F.col("__n.nid").alias("id_b"),
            "distance",
        )
    )


def fuzzy_pairs_sql(
    table: str,
    id_col: str,
    key_col: str,
    window: int = 3,
    max_distance: int = 1,
    block_expr: str | None = None,
) -> str:
    """DuckDB twin: the same blocked lead() neighborhood and
    levenshtein verify (same input contract and the same pinned
    NULLS FIRST sort as the Spark side)."""
    if window < 1:
        raise ValueError("window must be >= 1")
    part = f"PARTITION BY {block_expr} " if block_expr else ""
    # distinct window names per branch: DuckDB rejects re-defining the
    # same WINDOW alias across UNION ALL branches of one query
    leads = " UNION ALL ".join(
        f"SELECT {id_col} AS id_a, {key_col} AS k_a, "
        f"lead({id_col}, {i}) OVER w{i} AS id_b, "
        f"lead({key_col}, {i}) OVER w{i} AS k_b "
        f"FROM {table} WINDOW w{i} AS ({part}ORDER BY "
        f"{key_col} NULLS FIRST, {id_col} NULLS FIRST)"
        for i in range(1, window + 1)
    )
    return (
        f"SELECT id_a, id_b, levenshtein(k_a, k_b) AS distance "
        f"FROM ({leads}) WHERE id_b IS NOT NULL "
        f"AND levenshtein(k_a, k_b) <= {max_distance}"
    )
