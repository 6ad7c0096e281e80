"""Count store (LP:2748/3466) fast path + Top1WithTies (LP:3923)."""

import pytest

from neo4j_spark.api import cypher


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _n(spark, g, q):
    return cypher(spark, q, g).collect()[0][0]


def test_count_store_node_label(spark, diamond_graph):
    assert _n(spark, diamond_graph, "MATCH (n:N) RETURN count(n) AS n") == 4


def test_count_store_all_nodes(spark, diamond_graph):
    assert _n(spark, diamond_graph, "MATCH (n) RETURN count(*) AS n") == 4


def test_count_store_rel_type(spark, diamond_graph):
    assert _n(spark, diamond_graph,
              "MATCH ()-[r:E]->() RETURN count(r) AS n") == 6


def test_count_store_undirected_not_fast_pathed(spark, diamond_graph):
    # 6 rels, one a self-loop: 5 match twice + 1 once = 11 (not 12) —
    # undirected counts must NOT be served from the count store
    assert _n(spark, diamond_graph,
              "MATCH ()-[r:E]-() RETURN count(*) AS n") == 11


def test_count_store_plan_is_local(spark, diamond_graph):
    df = cypher(spark, "MATCH (n:N) RETURN count(*) AS n", diamond_graph)
    plan = _plan(df)
    assert ("LocalRelation" in plan or "OneRowRelation" in plan
            or "LogicalRDD" in plan)
    assert "Aggregate" not in plan and "parquet" not in plan


def test_count_store_self_loop_not_fast_pathed(spark, diamond_graph):
    # (a)-->(a) constrains to self-loops; must not read the rel count
    assert _n(spark, diamond_graph,
              "MATCH (a)-[r:E]->(a) RETURN count(*) AS n") == 1


def test_count_store_where_not_fast_pathed(spark, diamond_graph):
    assert _n(spark, diamond_graph,
              "MATCH (n:N) WHERE n.name <> 'a' RETURN count(*) AS n") == 3


def test_count_store_unknown_label_zero(spark, diamond_graph):
    assert _n(spark, diamond_graph,
              "MATCH (n:Nope) RETURN count(*) AS n") == 0


def test_count_store_invalidated_by_write(spark, diamond_graph):
    g = diamond_graph.copy()
    before = _n(spark, g, "MATCH (n:N) RETURN count(*) AS n")
    cypher(spark, "CREATE (:N {name: 'z'})", g).collect()
    assert _n(spark, g, "MATCH (n:N) RETURN count(*) AS n") == before + 1
    # original snapshot unaffected
    assert _n(spark, diamond_graph, "MATCH (n:N) RETURN count(*) AS n") == before


def test_top1_with_ties_keeps_all_tying_rows(spark):
    from neo4j_spark.operators.topk import top1_with_ties

    df = spark.createDataFrame(
        [(1, 5), (2, 9), (3, 9), (4, 1)], "id long, v long")
    out = top1_with_ties(df, ["v"], ascending=[False])
    assert sorted(r.id for r in out.collect()) == [2, 3]


def test_top1_with_ties_asc_multi_key(spark):
    from neo4j_spark.operators.topk import top1_with_ties

    df = spark.createDataFrame(
        [(1, 1, "b"), (2, 1, "a"), (3, 1, "a"), (4, 2, "a")],
        "id long, v long, s string")
    out = top1_with_ties(df, ["v", "s"])
    assert sorted(r.id for r in out.collect()) == [2, 3]


def test_top1_with_ties_empty(spark):
    from neo4j_spark.operators.topk import top1_with_ties

    df = spark.createDataFrame([], "id long, v long")
    assert top1_with_ties(df, ["v"]).count() == 0
