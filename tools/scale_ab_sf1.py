"""Scale evidence for the r8/r9 structural rewrites (VERDICT r8 item 8):
run the structurally-changed queries at sf0.1 AND a synthetic sf1.0
(10x replica, tools/scale_probe_sf1.py's builder) with each rewrite ON
vs OFF, interleaved in one session, and write SCALE_r09.json.

The point is the DELTA GROWTH: rewrites that are wall-neutral at sf0.1
(overhead-bound sub-second queries) must show their advantage widening
at 10x the data, or the scale claim rests on plan shape alone.

Usage: python tools/scale_ab_sf1.py [reps]   (default 3)
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import functions as F

import __spark_entry__ as E
from neo4j_spark.session import get_spark
from neo4j_spark.cypher import translate as TR
from neo4j_spark.ml import dedup as MD

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1_synth"
REPL = 10

spark = get_spark("scale_ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS",
                                                      "32")))
spark.sparkContext.setLogLevel("ERROR")

KEYED = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": [],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def build():
    if os.path.exists(os.path.join(DST, "_OK")):
        return
    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)
    for t in DIMS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode(
            "overwrite").parquet(f"{DST}/{t}.parquet")
    for t, keys in KEYED.items():
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        stride = 10 ** 9
        rep = spark.range(REPL).select(F.col("id").alias("__rep"))
        out = df.crossJoin(rep)
        for k in keys:
            if dict(df.dtypes).get(k) in ("bigint", "int", "long"):
                out = out.withColumn(
                    k, F.col(k) + F.col("__rep") * F.lit(stride))
            else:
                out = out.withColumn(
                    k, F.concat(F.col(k), F.lit("#"),
                                F.col("__rep").cast("string")))
        if t == "lineitem":
            out = out.withColumn(
                "l_suppkey",
                F.col("l_suppkey") + F.col("__rep") * F.lit(stride))
            out = out.withColumn(
                "l_partkey",
                F.col("l_partkey") + F.col("__rep") * F.lit(stride))
        out.drop("__rep").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet")
    open(os.path.join(DST, "_OK"), "w").write("ok")


# ---- rewrite toggles -------------------------------------------------------

ORIG = {
    "opt": TR.Translator._preagg_optional_count,
    "trail": TR.Translator._preagg_trailing_count,
    "sub": TR.Translator._preagg_pattern_sub,
    "keyprop": TR.Translator._var_key_prop_only,
    "dedup": MD.distinct_count_by,
}


def _naive_distinct_count_by(df, group_cols, col, alias="n_distinct"):
    return df.groupBy(*group_cols).agg(
        F.count_distinct(F.col(col)).alias(alias))


def set_off(which: str, graph=None):
    if which == "preagg_counts":
        TR.Translator._preagg_optional_count = lambda s, d, m, n: None
        TR.Translator._preagg_trailing_count = lambda s, d, m, n: None
    elif which == "subquery_preagg":
        TR.Translator._preagg_pattern_sub = lambda s, c, p, w: None
    elif which == "keyprop_elision":
        TR.Translator._var_key_prop_only = lambda s, n, p: False
    elif which == "shard_pruning":
        # voids rels_for_types pruning AND the sharded-endpoint elision
        # guarantee in one switch (both key off _shard_pruning_ok)
        graph._shard_pruning_ok_orig = type(graph)._shard_pruning_ok
        type(graph)._shard_pruning_ok = lambda self, t: False
    elif which == "hash_proxy":
        MD.distinct_count_by = _naive_distinct_count_by


def set_on(which: str, graph=None):
    TR.Translator._preagg_optional_count = ORIG["opt"]
    TR.Translator._preagg_trailing_count = ORIG["trail"]
    TR.Translator._preagg_pattern_sub = ORIG["sub"]
    TR.Translator._var_key_prop_only = ORIG["keyprop"]
    MD.distinct_count_by = ORIG["dedup"]
    if graph is not None and hasattr(graph, "_shard_pruning_ok_orig"):
        type(graph)._shard_pruning_ok = graph._shard_pruning_ok_orig
        del graph._shard_pruning_ok_orig


# query -> the toggle that changes its plan
CASES = {
    "optional_expand": "preagg_counts",
    "multi_hop_chain": "preagg_counts",
    "count_subquery": "subquery_preagg",
    "rollup_pattern_comprehension": "subquery_preagg",
    "agg_count_distinct": "keyprop_elision",
    "expand_into_triangle": "shard_pruning",
    "q5_local_supplier_volume": "shard_pruning",
    "dedup_exact": "hash_proxy",
}
# no practical toggle (library rewrites replaced the old code path):
# run ON-only so the artifact still records their absolute scaling
ABS_ONLY = ["text_quality", "shortest_path_op", "dedup_minhash_lsh"]


def timed(fn, sf_dir):
    # the entry module memoizes translated plans per (app, sf_dir, name);
    # an A/B must re-translate so the OFF arm doesn't reuse the ON plan
    E._PLAN_CACHE.clear()
    spark.catalog.clearCache()
    t0 = time.time()
    fn(spark, sf_dir).count()
    return time.time() - t0


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    t0 = time.time()
    build()
    print(f"build: {round(time.time() - t0, 1)}s", flush=True)
    qs = E.queries()
    from neo4j_spark.sources.tpch import tpch_graph

    result = {"repl": REPL, "reps": reps, "queries": {}}
    for name, toggle in CASES.items():
        entry = {}
        for tag, sf_dir in (("sf0.1", SRC), ("sf1.0-synth", DST)):
            graph = tpch_graph(spark, sf_dir)
            # warm both arms (codegen, file listing)
            set_on(toggle, graph)
            timed(qs[name], sf_dir)
            set_off(toggle, graph)
            timed(qs[name], sf_dir)
            set_on(toggle, graph)
            best = {"on": 1e9, "off": 1e9}
            for i in range(reps):
                order = (("on", "off") if i % 2 == 0 else ("off", "on"))
                for arm in order:
                    (set_on if arm == "on" else set_off)(toggle, graph)
                    best[arm] = min(best[arm], timed(qs[name], sf_dir))
                set_on(toggle, graph)
            entry[tag] = {"on_sec": round(best["on"], 3),
                          "off_sec": round(best["off"], 3),
                          "speedup": round(best["off"] / best["on"], 2)}
        entry["toggle"] = toggle
        result["queries"][name] = entry
        print(json.dumps({name: entry}), flush=True)
    for name in ABS_ONLY:
        entry = {}
        for tag, sf_dir in (("sf0.1", SRC), ("sf1.0-synth", DST)):
            timed(qs[name], sf_dir)  # warm
            entry[tag] = {"on_sec": round(min(
                timed(qs[name], sf_dir) for _ in range(reps)), 3)}
        entry["toggle"] = None
        result["queries"][name] = entry
        print(json.dumps({name: entry}), flush=True)
    with open("SCALE_r09.json", "w") as f:
        json.dump(result, f, indent=1)
    print("wrote SCALE_r09.json")


if __name__ == "__main__":
    main()
