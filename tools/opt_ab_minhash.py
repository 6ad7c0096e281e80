"""A/B harness for minhash_dedup_pairs variants at sf0.1 (bench method:
min of 5 timed .count() runs, clearCache between)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def timeit(spark, label, mk, runs=5):
    best = worst = None
    for _ in range(runs):
        spark.catalog.clearCache()
        t0 = time.time()
        mk().count()
        el = time.time() - t0
        best = el if best is None else min(best, el)
        worst = el if worst is None else max(worst, el)
    spark.catalog.clearCache()
    print(f"{label:32s} min {best:.3f}s  max {worst:.3f}s")
    return best


def variant_nopersist_ex(df, threshold=0.8, num_hashes=32, bands=8,
                         shingle_k=3):
    """minhash_dedup_pairs with the exploded-shingles frame NOT persisted:
    banded signatures and the verify sets each recompute the (cheap,
    codegen'd) shingle hashing from the scan."""
    from neo4j_spark.ml.dedup import (_banded_signatures, exploded_shingles,
                                      jaccard)

    id_col, text_col = "doc_id", "text"
    ex = exploded_shingles(df, id_col, text_col, shingle_k)
    banded = _banded_signatures(ex, num_hashes, bands).persist()
    a, b = banded.alias("a"), banded.alias("b")
    cands = (a.join(b, (F.col("a.band") == F.col("b.band"))
                    & (F.col("a.bh") == F.col("b.bh"))
                    & (F.col("a._id") < F.col("b._id")))
             .select(F.col("a._id").alias("id_a"),
                     F.col("b._id").alias("id_b"))
             .dropDuplicates()).persist()
    cand_ids = (cands.select(F.col("id_a").alias("_vid"))
                .union(cands.select("id_b")))
    sh = (ex.join(cand_ids, ex["_id"] == cand_ids["_vid"], "left_semi")
            .groupBy("_id").agg(F.collect_set("_s").alias("_sh"))
            .withColumnRenamed("_id", "_vid").persist())
    return (cands
            .join(sh.select(F.col("_vid").alias("id_a"),
                            F.col("_sh").alias("sh_a")), "id_a")
            .join(sh.select(F.col("_vid").alias("id_b"),
                            F.col("_sh").alias("sh_b")), "id_b")
            .withColumn("jaccard",
                        F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from neo4j_spark.ml.dedup import minhash_dedup_pairs
    from neo4j_spark.session import get_spark

    spark = get_spark("opt_ab", cpus=int(os.environ.get("SPARK_GRAFT_CPUS",
                                                        "32")))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # warm codegen
    minhash_dedup_pairs(docs, threshold=0.8).count()
    variant_nopersist_ex(docs).count()

    cur = timeit(spark, "current (ex persisted)",
                 lambda: minhash_dedup_pairs(docs, threshold=0.8)
                 .orderBy("id_a", "id_b"))
    nop = timeit(spark, "no ex persist",
                 lambda: variant_nopersist_ex(docs)
                 .orderBy("id_a", "id_b"))
    # equality check
    a = set(map(tuple, minhash_dedup_pairs(docs, threshold=0.8).collect()))
    b = set(map(tuple, variant_nopersist_ex(docs).collect()))
    print("results equal:", a == b, len(a))
    print(f"current {cur:.3f}  nopersist {nop:.3f}")


if __name__ == "__main__":
    main()
