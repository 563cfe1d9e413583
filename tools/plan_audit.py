"""Physical-plan audit: for each driver query, print the number of
Exchanges (shuffles), whether scans show PushedFilters/ReadSchema
pruning, WholeStageCodegen span count, and any row-at-a-time Python
UDFs (BatchEvalPython — forbidden; ArrowEvalPython is the sanctioned
vectorized path).

Usage: python tools/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def audit(name: str, df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    exchanges = len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan))
    rr = len(re.findall(r"Exchange RoundRobin", plan))
    wsc = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
    py_row = "BatchEvalPython" in plan
    arrow = "ArrowEvalPython" in plan or "MapInPandas" in plan or "FlatMapGroupsInPandas" in plan
    bj = len(re.findall(r"BroadcastHashJoin", plan))
    smj = len(re.findall(r"SortMergeJoin", plan))
    scans = len(re.findall(r"FileScan parquet", plan))
    return {
        "query": name,
        "shuffles": exchanges,
        "roundrobin": rr,
        "codegen_spans": wsc,
        "broadcast_joins": bj,
        "sortmerge_joins": smj,
        "scans": scans,
        "python_row_udf": py_row,
        "arrow_udf": arrow,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import __spark_entry__ as e
    from featurewiz_spark import get_spark

    spark = get_spark("plan_audit", cores=4)
    rows = []
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        try:
            rows.append(audit(name, fn(spark, sf_dir)))
        except Exception as ex:
            rows.append({"query": name, "error": str(ex)[:80]})
    hdr = ["query", "shuffles", "roundrobin", "codegen_spans",
           "broadcast_joins", "sortmerge_joins", "scans", "python_row_udf"]
    print("\t".join(hdr))
    for r in rows:
        print("\t".join(str(r.get(h, "?")) for h in hdr) +
              ("  ERROR: " + r["error"] if "error" in r else ""))
    spark.stop()


if __name__ == "__main__":
    main()
