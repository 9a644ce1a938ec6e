"""Plan profile of the text-family sf10 heavyweights (VERDICT r11
§Next #5): tfidf_top_terms (18.9 s engine-only at sf10) and
dsir_importance_weights (19.3 s). Prints scan/exchange/aggregate
census from the FORMATTED plan so PLANS.md can record exactly where
the time goes: how many times the documents parquet is scanned, how
many exchanges the plan holds, and whether every hash aggregate has
its partial (map-side) half.

Usage: python tools/text_plan_profile.py [sf_dir] [query ...]
"""
import re
import sys

sys.path.insert(0, "/root/repo")

from ingest_spark.session import get_spark
from ingest_spark.queries import QUERIES

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
names = sys.argv[2:] or ["tfidf_top_terms", "dsir_importance_weights"]

spark = get_spark("text_plan_profile")

for name in names:
    df = QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    doc_scans = len(
        re.findall(r"Scan parquet .*documents", plan)
    ) or plan.count("documents.parquet")
    exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
    reused = len(re.findall(r"ReusedExchange", plan))
    partial_aggs = len(
        re.findall(r"HashAggregate.*partial", plan)
    ) + plan.count("partial_")
    final_aggs = len(re.findall(r"^\(\d+\) HashAggregate", plan, re.M))
    gens = len(re.findall(r"^\(\d+\) Generate", plan, re.M))
    print(f"== {name} ==")
    print(
        f"documents scans={doc_scans} exchanges={exchanges} "
        f"reused_exchanges={reused} hash_aggregates={final_aggs} "
        f"generates(explode)={gens}"
    )
    print(plan)
    print()
