"""Probe: duplicate dimension keys through the join-family twins.

Round-8 injection class (VERDICT r7 ask #2c).  Real warehouses grow
duplicate dimension rows (replayed CDC loads, bad upstream merges);
an equi-join must fan out identically in both engines, and any
HIDDEN uniqueness assumption — a dropDuplicates on one side of the
Spark plan that the SQL twin lacks, an argmax that silently relies
on one-row-per-key, a broadcast dict built last-write-wins — shows
up as a hash mismatch.  The fixture appends exact-duplicate rows for
a hash-chosen slice of nation/customer/part/supplier keys (same key,
DIFFERENT attribute values, so collapsing duplicates in only one
engine changes values, not just counts) and replays every
dimension-joining twin via the real gate comparator.

Usage::

    python scripts/probe_dup_dim_keys.py [entry ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

from _probe_common import SRC, TABLES, run_probe


#: table -> (pk column, attribute column mutated on the duplicate row,
#: modulus — every k-th key by hash gets one extra duplicate row)
DUPES = {
    "nation": ("n_nationkey", "n_name", 5),
    "customer": ("c_custkey", "c_mktsegment", 17),
    "part": ("p_partkey", "p_type", 19),
    "supplier": ("s_suppkey", "s_name", 7),
}

ENTRIES = [
    "master_table",
    "master_table_partitioned_roundtrip",
    "join_inner_chain",
    "join_variants_panel",
    "join_left_outer_zero_orders",
    "join_semi",
    "join_anti",
    "salted_join_segments",
    "set_ops_panel",
    "union_all_by_name",
    "intersect",
    "except_all",
    "dq_constraints_panel",
    "dashboard_tiles",
    "dashboard_metrics_panel",
    "dashboard_totals",
    "dashboard_yearly_trend",
    "dashboard_top_nations",
    "dashboard_most_popular_category",
    "sql_revenue_by_nation",
    "stream_static_enrich",
    "stream_joins_panel",
    "customer_fuzzy_matches",
    "flagship_category_distribution",
]


def build_fixture(out: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SRC, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        if t in DUPES:
            pk, attr, mod = DUPES[t]
            # duplicate row: same key, attribute value visibly mutated
            sel = (
                f"SELECT * FROM read_parquet('{p}') "
                "UNION ALL "
                f"SELECT * REPLACE (({attr} || '_DUP') AS {attr}) "
                f"FROM read_parquet('{p}') WHERE hash({pk}) % {mod} = 0"
            )
        else:
            sel = f"SELECT * FROM read_parquet('{p}')"
        con.execute(f"COPY ({sel}) TO '{out}/{t}.parquet' (FORMAT PARQUET)")
    n_dup = con.execute(
        f"SELECT count(*) - count(DISTINCT n_nationkey) "
        f"FROM read_parquet('{out}/nation.parquet')"
    ).fetchone()[0]
    assert n_dup > 0, "no duplicate dimension keys injected"
    print(f"fixture: nation has {n_dup} duplicated keys")
    con.close()


if __name__ == "__main__":
    import sys as _sys

    raise SystemExit(
        run_probe("dup_dim", build_fixture, ENTRIES, only=_sys.argv[1:])
    )
