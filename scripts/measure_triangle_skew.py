"""One-off measurement (r10): hub-skew wedge volume in triangle
counting — what degree-ordered orientation buys
(``operators/graph.py::triangle_counts``).

Fixture: a star of degree D whose hub id falls MID-RANGE (the worst
case for a naive id-ordered orientation: ~D/2 edges point into the
hub and ~D/2 out, so the hub alone generates ~D²/4 wedges), plus a
sprinkle of triangles so the count is non-trivial.  Degree-ordered
orientation points every hub edge INTO the hub (it out-ranks all its
degree-1 neighbors), so the hub's wedge volume is 0 and the only
wedges left are the planted triangles'.

Usage::

    python scripts/measure_triangle_skew.py [D]

Prints one JSON line with both orientations' wedge volumes and the
operator's wall + triangle total.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging
from yelp_review_data_analysis_using_big_data_technologies_spark.operators.graph import triangle_counts
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark


def main() -> None:
    d = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    spark = get_spark(
        "triangle_skew",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    hub = d // 2  # mid-range id: the id-orientation worst case
    leaves = [i for i in range(d + 1) if i != hub]
    star = [(min(hub, v), max(hub, v)) for v in leaves]
    # planted triangles among consecutive leaf ids (disjoint from hub)
    tris = [
        (10 * d + i, 10 * d + i + 1) for i in range(0, 300, 3)
    ] + [
        (10 * d + i + 1, 10 * d + i + 2) for i in range(0, 300, 3)
    ] + [
        (10 * d + i, 10 * d + i + 2) for i in range(0, 300, 3)
    ]
    edges = spark.createDataFrame(star + tris, "id_a long, id_b long")

    # wedge volumes under both orientations, computed from degrees
    canon = edges.select(
        F.least("id_a", "id_b").alias("a"), F.greatest("id_a", "id_b").alias("b")
    ).distinct()
    # id orientation: wedges at v = in_deg(v) * out_deg(v)
    in_deg = canon.groupBy(F.col("b").alias("v")).agg(F.count("*").alias("i"))
    out_deg = canon.groupBy(F.col("a").alias("v")).agg(F.count("*").alias("o"))
    wedges_id = (
        in_deg.join(out_deg, "v")
        .agg(F.sum(F.col("i") * F.col("o")))
        .collect()[0][0]
        or 0
    )
    # degree orientation: out-deg under (degree, id) order
    deg = (
        canon.select(F.col("a").alias("v"))
        .unionAll(canon.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    wd = canon.join(
        deg.withColumnsRenamed({"v": "a", "deg": "da"}), "a"
    ).join(deg.withColumnsRenamed({"v": "b", "deg": "db"}), "b")
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = wd.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
    )
    o_in = oriented.groupBy(F.col("dst").alias("v")).agg(
        F.count("*").alias("i")
    )
    o_out = oriented.groupBy(F.col("src").alias("v")).agg(
        F.count("*").alias("o")
    )
    wedges_deg = (
        o_in.join(o_out, "v").agg(F.sum(F.col("i") * F.col("o"))).collect()[0][0]
        or 0
    )

    t0 = time.time()
    out = triangle_counts(edges)
    n_tri = out.agg(F.sum("triangles")).collect()[0][0] // 3
    wall = round(time.time() - t0, 2)
    release_staging()
    print(
        json.dumps(
            {
                "metric": "triangle_skew",
                "hub_degree": d,
                "wedges_id_orientation": int(wedges_id),
                "wedges_degree_orientation": int(wedges_deg),
                "wedge_reduction": round(
                    1 - wedges_deg / max(wedges_id, 1), 4
                ),
                "triangles": int(n_tri),
                "operator_wall_s": wall,
            }
        )
    )


if __name__ == "__main__":
    main()
