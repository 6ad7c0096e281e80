"""Iterative path operators: VarExpand and shortest paths.

These are the operators that cannot be a single Catalyst plan because their
shape depends on the data (SURVEY §4.2): the reference implements them as
pipes (``pipes/VarLengthExpandPipe.scala:83``,
``pipes/ShortestPathPipe.scala:39`` wrapping the bidirectional BFS in
``community/graph-algo/.../ShortestPath.java:81``).  Here they are
driver-side loops over DataFrame joins:

- VarExpand: k-level unrolled self-joins, one union branch per depth in
  [min, max]; relationship-uniqueness enforced with an id-array check.
- shortestPath/allShortestPaths: frontier BFS with a visited-set anti-join
  per level and early stop once every reachable (start, end) pair is found.

At 100 TB scale each level is a shuffle join on node ids — the frontier
stays partitioned by the join key, and AQE handles the shrinking frontier.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import Column, DataFrame, functions as F, Window as W

from ..cypher import ast as A


def _rel_ids(col: Column) -> Column:
    return F.transform(col, lambda x: x.getField("_id"))


def var_expand(tr, df: DataFrame, prev_var: str, rp: A.RelPat, np: A.NodePat,
               rvar: str, nvar: str) -> DataFrame:
    """VarLengthExpand (LP:2057): ``-[r:T*min..max]->``.

    Returns df with ``rvar`` = array<rel-struct> and ``nvar`` bound."""
    min_len = rp.min_len if rp.min_len is not None else 1
    max_len = rp.max_len if rp.max_len is not None else tr.max_var_length
    dynamic_stop = rp.max_len is None

    scan = tr._rel_scan(rp, "__r")
    # per-step predicate from the rel pattern's inline props
    if rp.props is not None:
        cc = tr._compiler(scan)
        for k, v in rp.props.items:
            scan = scan.filter(F.col("__r").getField(k) == cc.compile(v))
    rel_type = scan.schema["__r"].dataType.simpleString()

    base = df.withColumn("__end", F.col(prev_var).getField("_id")) \
             .withColumn(rvar, F.array().cast(f"array<{rel_type}>"))
    levels: List[DataFrame] = []
    if min_len == 0:
        levels.append(base)
    frontier = base
    for k in range(1, max_len + 1):
        step = frontier.join(scan, F.col("__end") == F.col("__from"))
        step = step.filter(
            ~F.array_contains(_rel_ids(F.col(rvar)), F.col("__r").getField("_id")))
        step = (step.withColumn(rvar, F.array_append(F.col(rvar), F.col("__r")))
                    .withColumn("__end", F.col("__to"))
                    .drop("__from", "__to", "__r"))
        if dynamic_stop and k > min_len and step.isEmpty():
            break
        if k >= min_len:
            levels.append(step)
        frontier = step

    out = levels[0]
    for l in levels[1:]:
        out = out.unionByName(l)

    if nvar in df.columns:
        out = out.filter(F.col("__end") == F.col(nvar).getField("_id"))
    else:
        nscan = tr._node_scan(np, nvar)
        out = out.join(nscan, F.col("__end") == F.col(nvar).getField("_id"))
    return out.drop("__end")


def shortest_path(tr, df: Optional[DataFrame], part: A.PatternPart,
                  pending: List[A.Expr]) -> DataFrame:
    """FindShortestPaths (LP:2178): shortestPath / allShortestPaths.

    Frontier BFS over (start, node) with a visited anti-join; paths are
    recorded the first level a (start, end) pair connects."""
    els = part.elements
    assert len(els) == 3, "shortestPath expects a single relationship pattern"
    a_pat, rp, b_pat = els
    assert isinstance(rp, A.RelPat)
    all_shortest = part.selector == "allShortest"
    max_len = rp.max_len if rp.max_len is not None else tr.max_var_length
    min_len = rp.min_len if rp.min_len is not None else 1

    df, avar = tr._bind_first_node(df, a_pat, pending)
    df, bvar = tr._bind_first_node(df, b_pat, pending)

    scan = tr._rel_scan(rp, "__r")
    rel_core_t = "array<struct<_id:bigint,_src:bigint,_dst:bigint,_type:string>>"

    starts = df.select(F.col(avar).getField("_id").alias("__start")).dropDuplicates()
    targets = df.select(
        F.col(avar).getField("_id").alias("__start"),
        F.col(bvar).getField("_id").alias("__tgt")).dropDuplicates()

    frontier = starts.select(
        F.col("__start"), F.col("__start").alias("__node"),
        F.array().cast(rel_core_t).alias("__rels"),
        F.array(F.col("__start")).alias("__nodes"))
    visited = frontier.select("__start", "__node")
    found_parts: List[DataFrame] = []
    if min_len == 0:
        found_parts.append(
            frontier.join(targets, (frontier["__start"] == targets["__start"])
                          & (frontier["__node"] == targets["__tgt"]))
            .select(frontier["__start"], F.col("__tgt"), "__rels", "__nodes"))

    for k in range(1, max_len + 1):
        step = frontier.join(scan, F.col("__node") == F.col("__from"))
        core = F.struct(
            F.col("__r").getField("_id").alias("_id"),
            F.col("__r").getField("_src").alias("_src"),
            F.col("__r").getField("_dst").alias("_dst"),
            F.col("__r").getField("_type").alias("_type"))
        step = step.select(
            "__start", F.col("__to").alias("__node"),
            F.array_append(F.col("__rels"), core).alias("__rels"),
            F.array_append(F.col("__nodes"), F.col("__to")).alias("__nodes"))
        # prune: drop (start, node) already reached at a shorter depth
        step = step.join(visited, ["__start", "__node"], "left_anti")
        step = step.persist()
        if step.isEmpty():
            step.unpersist()
            break
        if k >= min_len:
            hit = step.join(
                targets,
                (step["__start"] == targets["__start"])
                & (step["__node"] == targets["__tgt"]))
            hit = hit.select(step["__start"], F.col("__tgt"), "__rels", "__nodes")
            found_parts.append(hit)
        visited = visited.unionByName(
            step.select("__start", "__node").dropDuplicates())
        frontier = step

    if not found_parts:
        matched = tr.spark.createDataFrame(
            [], f"__start long, __tgt long, __rels {rel_core_t}, "
                f"__nodes array<bigint>")
    else:
        matched = found_parts[0]
        for f in found_parts[1:]:
            matched = matched.unionByName(f)
    # keep only min-depth per (start, tgt); BFS order already guarantees the
    # first level a pair appears is minimal, but pairs can re-hit at deeper
    # levels through alternate nodes — filter with a min-join
    depths = matched.groupBy("__start", "__tgt").agg(
        F.min(F.size("__rels")).alias("__mind"))
    matched = matched.join(depths, ["__start", "__tgt"]).filter(
        F.size("__rels") == F.col("__mind")).drop("__mind")
    if not all_shortest:
        matched = matched.withColumn(
            "__rn", F.row_number().over(
                W.partitionBy("__start", "__tgt")
                .orderBy(F.col("__rels").cast("string")))
        ).filter(F.col("__rn") == 1).drop("__rn")

    out = df.join(
        matched,
        (F.col(avar).getField("_id") == F.col("__start"))
        & (F.col(bvar).getField("_id") == F.col("__tgt")))
    if part.path_var:
        pvar = part.path_var
        nodes_arr = F.transform(F.col("__nodes"), lambda x: F.struct(x.alias("_id")))
        out = out.withColumn(
            pvar, F.struct(nodes_arr.alias("nodes"), F.col("__rels").alias("rels")))
        tr.kinds[pvar] = "path"
    return out.drop("__start", "__tgt", "__rels", "__nodes")
