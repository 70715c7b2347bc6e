"""Dump ``.explain("formatted")`` for named entries to files.

The r15 optimization round's evidence trail: for each query touched,
``plans/r15/<query>_before.txt`` and ``..._after.txt`` are the
formatted physical plans the judge checks plan claims against.

Usage::

    python scripts/plan_dump.py <suffix> <query> [query ...] [--sf DIR]

writes ``plans/r15/<query>_<suffix>.txt`` for each query (suffix is
``before`` or ``after``).  Streaming/sink entries execute when built;
they are planned here anyway because the explain is taken from the
RETURNED (post-run) frame — the plan file then covers the final
read-back/search stage, which is what the entry's timed noop sink
executes last.  The header notes this for such entries.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import (
    release_all_staging,
)
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark

import __spark_entry__ as entrymod


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    round_dir = "r16"
    if "--round" in args:
        i = args.index("--round")
        round_dir = args[i + 1]
        del args[i : i + 2]
    suffix, names = args[0], args[1:]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan-dump")
    queries = entrymod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} ({suffix}) @ {sf_dir}\n")
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
        release_all_staging()
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
