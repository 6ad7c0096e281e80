"""One-off sf1.0 scaling probe (round-8 task): replicate the sf0.1
tables 10x with key remapping into /tmp/sf1_synth, run the three
iterative operators (`shortest_path_op`, `sel_shortest_qpp_multi`,
`dedup_minhash_lsh`) at sf0.1 and the synthetic sf1.0, and print
wall-time + shuffle bytes for PERF.md.

The replica keeps dims (region, nation) fixed and shifts fact keys by
replica stride — graph fanout per node is unchanged, so frontier sizes
scale linearly like a real sf1.0 would.  documents are replicated with
distinct doc ids (dup GROUPS get 10x larger, which stresses the banded
join's candidate verification harder than a real sf1.0 — conservative).
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

SRC = "/root/testdata/sf0.1"
DST = "/tmp/sf1_synth"
REPL = 10

spark = get_spark("scale_probe", cpus=32)
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
        # stride larger than any key in the table
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
        # keep supplier links of lineitem within the replicated suppliers
        if t == "lineitem":
            out = out.withColumn(
                "l_suppkey", F.col("l_suppkey")
                + F.col("__rep") * F.lit(stride))
            out = out.withColumn(
                "l_partkey", F.col("l_partkey")
                + F.col("__rep") * F.lit(stride))
        if t == "orders":
            pass  # o_custkey already shifted via keys
        out.drop("__rep").write.mode("overwrite").parquet(
            f"{DST}/{t}.parquet")
    open(os.path.join(DST, "_OK"), "w").write("ok")


def shuffle_bytes():
    sc = spark.sparkContext
    st = sc.statusTracker()
    # sum over executors via the REST-less metric: use SparkContext's
    # internal listener is unavailable from PySpark; approximate with
    # the SQL metrics of the last query via the UI-less accumulators is
    # not exposed either — report wall time only, plus partition count.
    return None


def run(tag, sf_dir, names):
    qs = E.queries()
    out = {}
    for name in names:
        t0 = time.time()
        try:
            n = qs[name](spark, sf_dir).count()
            out[name] = {"sec": round(time.time() - t0, 2), "rows": n}
        except Exception as e:  # noqa
            out[name] = {"error": str(e).split("\n")[0][:200]}
    print(json.dumps({tag: out}), flush=True)
    return out


NAMES = ["shortest_path_op", "sel_shortest_qpp_multi", "dedup_minhash_lsh"]
t0 = time.time()
build()
print(f"build took {round(time.time() - t0, 1)}s", flush=True)
r01 = run("sf0.1", SRC, NAMES)
r10 = run("sf1.0-synth", DST, NAMES)
for n in NAMES:
    a, b = r01.get(n, {}).get("sec"), r10.get(n, {}).get("sec")
    if a and b:
        print(f"{n}: {a}s -> {b}s  ({round(b / a, 2)}x at 10x data)",
              flush=True)
