"""Probe: catalog name collisions (r8 idea-bank class).

The catalog layer (sources/catalog.py) registers external tables,
managed tables, and views into one case-insensitive namespace that is
ALSO shadowed by session temp views.  This probe walks every collision
pair and checks the layer either succeeds with sane semantics or fails
CLOSED before mutating anything.

Findings from the exploration run (both fixed, pinned in
tests/test_catalog_collisions.py):

- ``register_external_table`` onto a name held by a TEMP VIEW or a
  catalog VIEW used to die halfway — CREATE TABLE succeeded, then
  MSCK REPAIR resolved the view and threw EXPECT_TABLE_NOT_VIEW —
  leaving a half-registered table that unqualified reads could not
  even see (the temp view shadows it).  Now a ValueError fires before
  any DDL.
- Same-name-different-CASE is NOT two tables: the session catalog is
  case-insensitive (spark.sql.caseSensitive=false default), so the
  second registration follows-the-data onto the first.  Documented
  contract, not a defect — but silent, so pinned.

Usage::

    python scripts/probe_catalog_collisions.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark
from yelp_review_data_analysis_using_big_data_technologies_spark.sources import catalog as cat


def main() -> int:
    spark = get_spark("probe_catalog_collisions")
    spark.sparkContext.setLogLevel("ERROR")
    failures: list[str] = []

    def check(name: str, ok: bool, detail: str = "") -> None:
        print(f"  {name}: {'ok' if ok else 'FAIL'} {detail}", flush=True)
        if not ok:
            failures.append(f"[{name}] {detail}")

    d1, d2 = tempfile.mkdtemp(), tempfile.mkdtemp()
    spark.range(3).selectExpr("id", "'one' AS src").write.parquet(
        d1 + "/t", mode="overwrite"
    )
    spark.range(5).selectExpr("id", "'two' AS src").write.parquet(
        d2 + "/t", mode="overwrite"
    )

    # 1. case-fold: one logical table, last registration wins
    cat.register_external_table(spark, "ProbeCase", d1 + "/t")
    cat.register_external_table(spark, "probecase", d2 + "/t")
    n_a = spark.table("ProbeCase").count()
    n_b = spark.table("probecase").count()
    check(
        "case_fold_single_table",
        n_a == n_b == 5,
        f"counts {n_a}/{n_b} (want 5/5: second registration re-points)",
    )

    # 2. temp-view shadowing: fail closed, nothing registered
    spark.range(7).createOrReplaceTempView("probe_tv")
    try:
        cat.register_external_table(spark, "probe_tv", d1 + "/t")
        check("temp_view_fails_closed", False, "no error raised")
    except ValueError:
        still_view = spark.table("probe_tv").count() == 7
        not_registered = "probe_tv" not in cat.table_names(spark)
        check(
            "temp_view_fails_closed",
            still_view and not_registered,
            f"view intact={still_view} unregistered={not_registered}",
        )

    # 3. catalog-view collision: fail closed, view intact
    spark.sql("CREATE OR REPLACE VIEW probe_cv AS SELECT 42 AS x")
    try:
        cat.register_external_table(spark, "probe_cv", d1 + "/t")
        check("catalog_view_fails_closed", False, "no error raised")
    except ValueError:
        intact = [r.x for r in spark.table("probe_cv").collect()] == [42]
        check("catalog_view_fails_closed", intact, f"view intact={intact}")

    # 4. create_view onto a table name: Spark fails it cleanly
    try:
        cat.create_view(spark, "ProbeCase", "SELECT 1 AS x")
        check("view_over_table_rejected", False, "no error raised")
    except Exception as exc:  # noqa: BLE001 — AnalysisException
        check(
            "view_over_table_rejected",
            "EXPECT_VIEW_NOT_TABLE" in str(exc),
            type(exc).__name__,
        )

    # 5. alias tables over one location survive a sibling DROP
    cat.register_external_table(spark, "probe_alias_a", d1 + "/t")
    cat.register_external_table(spark, "probe_alias_b", d1 + "/t")
    spark.sql("DROP TABLE probe_alias_a")
    check(
        "alias_survives_sibling_drop",
        spark.table("probe_alias_b").count() == 3,
        "external DROP leaves files",
    )

    # 6. database isolation: same name, two databases
    cat.create_database(spark, "probe_dbx")
    cat.create_database(spark, "probe_dby")
    cat.register_external_table(spark, "same", d1 + "/t", database="probe_dbx")
    cat.register_external_table(spark, "same", d2 + "/t", database="probe_dby")
    check(
        "database_isolation",
        spark.table("probe_dbx.same").count() == 3
        and spark.table("probe_dby.same").count() == 5,
    )

    # 7. hostile identifiers rejected before registration
    for bad in ("a.b", "with space", "tick`name"):
        try:
            cat.register_external_table(spark, bad, d1 + "/t")
            check(f"hostile_ident_{bad!r}", False, "accepted")
        except Exception as exc:  # noqa: BLE001
            check(
                f"hostile_ident_{bad!r}",
                bad not in cat.table_names(spark),
                type(exc).__name__,
            )

    # 8. managed overwrite onto an external name replaces the catalog
    #    entry but NEVER touches the external files
    cat.save_managed_table(
        spark.range(2).selectExpr("id", "'m' AS src"), "probe_alias_b"
    )
    check(
        "managed_overwrite_leaves_external_files",
        spark.table("probe_alias_b").count() == 2
        and spark.read.parquet(d1 + "/t").count() == 3,
    )

    for t in ("ProbeCase", "probe_alias_b", "probe_cv"):
        for stmt in (f"DROP TABLE IF EXISTS {t}", f"DROP VIEW IF EXISTS {t}"):
            try:
                spark.sql(stmt)
            except Exception:  # noqa: BLE001 — wrong DROP kind for object
                pass
    spark.sql("DROP DATABASE IF EXISTS probe_dbx CASCADE")
    spark.sql("DROP DATABASE IF EXISTS probe_dby CASCADE")

    print()
    for f in failures:
        print(f)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
