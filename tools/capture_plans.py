"""Capture .explain('formatted') for headline queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag-dir> <before|after> [names...]
Writes plans/<tag>/<query>_<suffix>.txt for each query (default: the 18
bench headline queries).  Driver-side only — builds the DataFrame and
formats the plan; nothing executes.
"""

from __future__ import annotations

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "aggregation_q1", "multi_hop_chain", "expand_into_triangle",
    "agg_count_distinct", "optional_expand", "count_subquery", "top_k",
    "var_expand_fixed", "shortest_path_op", "qpp_fixed",
    "q3_shipping_priority", "q5_local_supplier_volume", "dedup_exact",
    "dedup_minhash_lsh", "text_quality", "knn_join",
    "events_tumbling_window", "events_session_window",
]


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r08"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from neo4j_spark.session import get_spark

    spark = get_spark("capture_plans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            stdout, sys.stdout = sys.stdout, buf
            try:
                df.explain("formatted")
            finally:
                sys.stdout = stdout
            text = buf.getvalue()
        except Exception as e:
            text = f"ERROR building/explaining {name}: {type(e).__name__}: {e}\n"
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_ex = text.count("Exchange")
        joins = {j: text.count(j) for j in
                 ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                  "BroadcastNestedLoopJoin", "CartesianProduct")}
        py = sum(text.count(p) for p in
                 ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                  "MapInArrow", "FlatMapGroupsInPandas"))
        joins_s = ", ".join(f"{k}:{v}" for k, v in joins.items() if v)
        print(f"{name}: Exchange={n_ex} {joins_s} PythonNodes={py}")
    spark.stop()


if __name__ == "__main__":
    main()
