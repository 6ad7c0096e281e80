"""Measured REJECTION harness: noop-sink timing of the 32-permutation
min-hash aggregate under three permutation families (xxhash64 vs
xor-constant vs xorshift).  xxhash64 wins; see OPTIMIZATION_r08 "Not
yet optimized" 4b."""
import sys, time
sys.path.insert(0, ".")
from neo4j_spark.session import get_spark
from pyspark.sql import functions as F

spark = get_spark("prof_minhash4", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
from neo4j_spark.ml.dedup import exploded_shingles

docs = spark.read.parquet(f"{sf}/documents.parquet")
ex = exploded_shingles(docs, "doc_id", "text", 3)

def noop(df):
    df.write.format("noop").mode("overwrite").save()

def t(label, build):
    best = None
    for i in range(4):
        t0 = time.time(); noop(build()); el = time.time() - t0
        if i > 0: best = el if best is None else min(best, el)
    print(f"{label}: {best:.3f}s", flush=True)

def s64(x):
    x &= (1 << 64) - 1
    return x - (1 << 64) if x >= (1 << 63) else x

C = [s64(0x9E3779B97F4A7C15 * (2 * i + 3)) for i in range(32)]

def xs(col):  # xorshift mix (bijective, overflow-free)
    h1 = col.bitwiseXOR(F.shiftright(col, 33))
    h2 = h1.bitwiseXOR(F.shiftleft(h1, 25))
    return h2.bitwiseXOR(F.shiftright(h2, 27))

t("A 32x min(xxhash64(_s,i))  [current]",
  lambda: ex.groupBy("_id").agg(*[F.min(F.xxhash64("_s", F.lit(i))).alias(f"m{i}") for i in range(32)]))
t("B 32x min(_s xor c_i)  [machinery+xor]",
  lambda: ex.groupBy("_id").agg(*[F.min(F.col("_s").bitwiseXOR(F.lit(C[i]))).alias(f"m{i}") for i in range(32)]))
t("C 32x min(xorshift(_s xor c_i))",
  lambda: ex.groupBy("_id").agg(*[F.min(xs(F.col("_s").bitwiseXOR(F.lit(C[i])))).alias(f"m{i}") for i in range(32)]))
t("D 32x min(xxhash64(_s,i))  [current again]",
  lambda: ex.groupBy("_id").agg(*[F.min(F.xxhash64("_s", F.lit(i))).alias(f"m{i}") for i in range(32)]))
