"""One-off probe: where do corpus_freeze_stats's shuffles live?

Walks the planned tree with the same cached-subtree-once semantics as
plan_report and prints, for each ShuffleExchange, the chain of plan
operators above it (depth-limited) so the heavy legs are attributable.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from yelp_review_data_analysis_using_big_data_technologies_spark.llm.staging import release_staging
from yelp_review_data_analysis_using_big_data_technologies_spark.session import get_spark
import __spark_entry__ as entrymod
from collections import Counter

spark = get_spark("probe")
name = sys.argv[1] if len(sys.argv) > 1 else "corpus_freeze_stats"
df = entrymod.queries()[name](spark, "/root/testdata/sf0.01")
root = df._jdf.queryExecution().executedPlan()

hist = Counter()
seen = set()
def walk(node, path):
    nm = node.getClass().getSimpleName()
    if nm == "AdaptiveSparkPlanExec":
        walk(node.initialPlan(), path); return
    if nm == "ReusedExchangeExec":
        return
    if nm == "InMemoryTableScanExec":
        rel = node.relation(); key = rel.hashCode()
        if key not in seen:
            seen.add(key)
            walk(rel.cachedPlan(), path + ["CACHE"])
        return
    if nm == "ShuffleExchangeExec":
        hist["/".join(path[-4:])] += 1
    kids = node.children()
    for i in range(kids.size()):
        walk(kids.apply(i), path + [nm.removesuffix("Exec")])

walk(root, [])
total = sum(hist.values())
print(f"{name}: total shuffles {total}")
for k, v in hist.most_common(40):
    print(f"{v:3d}  {k}")
release_staging()
