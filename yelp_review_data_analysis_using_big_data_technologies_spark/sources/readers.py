"""Scans (SURVEY.md §2.1, S1–S2, S6).

The reference reads JSON-lines with inference (scripts/etl.py:21-23)
and staged Parquet (scripts/etl.py:30-32).  Here every JSON read takes
an explicit schema, Parquet is the default interchange format (schema
from footer metadata, column pruning + predicate pushdown free via
Catalyst), and catalog registration is a temp view instead of a Glue
crawler (main.tf:28-38).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: Synthetic star-schema tables the driver generated (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_parquet(
    spark: SparkSession, path: str, merge_schema: bool = False
) -> DataFrame:
    """Columnar scan — pushdown + pruning handled by Catalyst (S2).

    ``merge_schema=True`` reconciles EVOLVED schemas across the files
    under ``path`` (a batch written before a column existed reads that
    column as NULL) — the long-lived-table ingestion contract.  Off by
    default: merging reads every footer instead of sampling one, a
    real cost at 100k-file scale, so callers opt in when a table is
    known to have mixed generations."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    mode: str = "PERMISSIVE",
    corrupt_col: str | None = None,
) -> DataFrame:
    """JSON-lines scan (S1).  Explicit schema strongly preferred: at
    100 TB, inference is a second full scan (reference does this at
    scripts/etl.py:21-23).

    Corrupt-record policy matters at ingest scale — one bad line in a
    billion must not kill the job, but silently nulling it loses data:
    - ``mode="PERMISSIVE"`` (default) + ``corrupt_col`` quarantines
      unparseable lines into that column for a later audit query;
    - ``mode="DROPMALFORMED"`` discards them;
    - ``mode="FAILFAST"`` aborts on the first bad line (CI/backfill
      validation runs).
    """
    reader = spark.read.option("mode", mode)
    if corrupt_col is not None:
        if schema is not None and corrupt_col not in schema.fieldNames():
            schema = T.StructType(
                [*schema.fields, T.StructField(corrupt_col, T.StringType())]
            )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    multi_line: bool = True,
) -> DataFrame:
    """CSV scan.  ``inferSchema`` deliberately not exposed — pass a schema.

    ``multi_line`` (default on) reassembles quoted fields carrying
    embedded newlines — without it every such field SPLITS THE ROW
    (the r8 quoting probe lost rows round-tripping nation names with
    ``\\n``).  The cost at scale: multiLine files are parsed per-FILE,
    not per-line-split, so a single giant CSV loses intra-file
    parallelism.  Pass ``multi_line=False`` only for corpora
    guaranteed newline-free, where per-split parallelism matters more
    than correctness on hostile strings."""
    reader = (
        spark.read.option("header", header).option("multiLine", multi_line)
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.csv(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — schema from the file footers like parquet; predicate
    pushdown and column pruning work the same way (ORC carries
    min/max/bloom indexes per stripe)."""
    return spark.read.orc(path)


def _normalize_ns_timestamps(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """Parquet TIMESTAMP(NANOS) has no Spark type; with
    ``spark.sql.legacy.parquet.nanosAsLong`` it lands as long nanos.
    Truncate to micros (matching DuckDB's python-side behavior) and
    restore TimestampType so window/date functions work."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    for c in cols:
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            # Integer division keeps the arithmetic in long: `/` would
            # promote ~1.8e18 nanos past double's 2^53 exact range and
            # drift the truncated micros by ±1us vs DuckDB.
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


#: Per-table fixups applied by load_table.
_TABLE_NORMALIZERS = {
    "events": lambda df: _normalize_ns_timestamps(df, ("ts",)),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table from a scale-factor directory.

    Self-heals under ANY session (the driver builds its own bare
    SparkSession): ``events.parquet`` carries TIMESTAMP(NANOS), which
    Spark rejects unless ``spark.sql.legacy.parquet.nanosAsLong`` is
    set — it is runtime-settable, so set it here rather than relying
    on our session factory having built the session.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    fix = _TABLE_NORMALIZERS.get(name)
    return fix(df) if fix else df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> None:
    """The engine's catalog layer (S6): replaces Glue crawler + Athena
    (reference main.tf:28-38) with session temp views so ``spark.sql``
    can serve the ad-hoc SQL role."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
