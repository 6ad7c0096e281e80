"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one scan, JVM-side arithmetic
(zip_with/aggregate), TakeOrderedAndProject for the top-k.  Scale path:
random-hyperplane LSH bucketing so each query only scans its bucket
(the Spark analog of the reference's vector index,
``community/procedure/.../builtin/VectorIndexProcedures.java:144``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F, Window as W


def _dbl(a: Column) -> Column:
    """float32 embeddings -> double BEFORE multiplying, so scores agree with
    any double-precision reference implementation."""
    return F.transform(a, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(_dbl(a), _dbl(b), lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(_dbl(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))


def euclidean(a: Column, b: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.zip_with(_dbl(a), _dbl(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x))


def knn_bruteforce(df: DataFrame, query_vec: Sequence[float],
                   k: int = 10, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   metric: str = "cosine") -> DataFrame:
    """Exact top-k for one query vector: scan + orderBy + limit
    (Catalyst plans TakeOrderedAndProject — no full sort)."""
    q = F.lit([float(x) for x in query_vec])
    v = F.col(vec_col)
    score = cosine(v, q) if metric == "cosine" else -euclidean(v, q)
    return (df.select(F.col(id_col), F.round(score, 6).alias("score"))
              .orderBy(F.col("score").desc(), F.col(id_col))
              .limit(k))


def knn_join_bruteforce(queries: DataFrame, corpus: DataFrame, k: int = 10,
                        q_id: str = "vec_id", q_vec: str = "embedding",
                        c_id: str = "vec_id", c_vec: str = "embedding",
                        metric: str = "cosine") -> DataFrame:
    """Exact k-NN join (every query x corpus): crossJoin + per-query window
    top-k.  Quadratic — the correctness baseline the LSH path is graded
    against."""
    qd = queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("_qv"))
    cd = corpus.select(F.col(c_id).alias("neighbor_id"), F.col(c_vec).alias("_cv"))
    score = (cosine(F.col("_qv"), F.col("_cv")) if metric == "cosine"
             else -euclidean(F.col("_qv"), F.col("_cv")))
    scored = qd.crossJoin(cd).select(
        "query_id", "neighbor_id", F.round(score, 6).alias("score"))
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(),
                                          F.col("neighbor_id"))
    return (scored.withColumn("_rn", F.row_number().over(w))
                  .filter(F.col("_rn") <= k).drop("_rn"))


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> List[List[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_signature(vec: Column, planes: List[List[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(vec . plane_i)."""
    bits = [F.when(dot(vec, F.lit(p)) >= 0, F.lit(1)).otherwise(F.lit(0))
            for p in planes]
    sig = F.lit(0).cast("long")
    for i, b in enumerate(bits):
        sig = sig + (b.cast("long") * F.lit(1 << i))
    return sig


def knn_lsh(df: DataFrame, query_vec: Sequence[float], k: int = 10,
            id_col: str = "vec_id", vec_col: str = "embedding",
            n_planes: int = 8, dim: Optional[int] = None,
            probe_hamming: int = 1) -> DataFrame:
    """Approximate top-k: scan only buckets whose signature is within
    ``probe_hamming`` bits of the query signature (multi-probe).  At scale,
    write the corpus bucketed/partitioned by signature so a probe is a
    partition-pruned read instead of a full scan."""
    dim = dim or len(query_vec)
    planes = _hyperplanes(dim, n_planes)
    qsig_val = 0
    for i, p in enumerate(planes):
        if float(np.dot(np.array(query_vec), np.array(p))) >= 0:
            qsig_val |= 1 << i
    probe = [qsig_val]
    if probe_hamming >= 1:
        probe += [qsig_val ^ (1 << i) for i in range(n_planes)]
    bucketed = df.withColumn("_sig", lsh_signature(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("_sig").isin(probe))
    q = F.lit([float(x) for x in query_vec])
    return (cand.select(F.col(id_col),
                        F.round(cosine(F.col(vec_col), q), 6).alias("score"))
                .orderBy(F.col("score").desc(), F.col(id_col))
                .limit(k))
