"""Graph algorithms (graph-algo parity): connected components, PageRank,
SSSP as Pregel-style DataFrame loops."""

import pytest

from pyspark.sql import functions as F

from neo4j_spark.api import cypher
from neo4j_spark.operators.algorithms import (
    connected_components, pagerank, sssp)


@pytest.fixture(scope="module")
def two_comp(spark):
    # component A: 1-2-3 chain; component B: 10-11; isolated: 20
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 10, 11, 20]],
                                  "id long")
    rels = spark.createDataFrame(
        [(100, 1, 2, 1.0), (101, 2, 3, 4.0), (102, 10, 11, 1.0),
         (103, 1, 3, 10.0)],
        "id long, src long, dst long, w double")
    return nodes, rels


def test_connected_components(spark, two_comp):
    nodes, rels = two_comp
    comp = {r["id"]: r["comp"] for r in
            connected_components(nodes, rels).collect()}
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == 20


def test_pagerank_sums_to_one_and_ranks_sink_highest(spark, two_comp):
    nodes, rels = two_comp
    ranks = {r["id"]: r["rank"] for r in pagerank(nodes, rels, 15).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-6
    # node 3 has two in-edges — highest rank in component A
    assert ranks[3] > ranks[2] > ranks[1] * 0.99


def test_sssp_weighted_picks_cheaper_path(spark, two_comp):
    nodes, rels = two_comp
    src = spark.createDataFrame([(1,)], "id long")
    dist = {r["id"]: r["dist"] for r in sssp(rels, src, "w").collect()}
    # 1->2->3 costs 5.0, direct 1->3 costs 10.0
    assert dist[3] == 5.0
    assert dist[2] == 1.0
    assert 10 not in dist  # other component unreachable


def test_sssp_unweighted_hops(spark, two_comp):
    nodes, rels = two_comp
    src = spark.createDataFrame([(1,)], "id long")
    dist = {r["id"]: r["dist"] for r in sssp(rels, src).collect()}
    assert dist[3] == 1.0  # direct edge wins on hop count


def test_algo_procedures_via_cypher(spark, tpch_graph):
    out = cypher(spark,
                 "CALL algo.connectedComponents() YIELD node, comp "
                 "RETURN count(DISTINCT comp) AS n_components", tpch_graph)
    n_docs = 50   # sf0.001 documents
    got = out.collect()[0]["n_components"]
    # one big TPC-H component + isolated Document/Embedding singletons
    assert got > n_docs
    pr = cypher(spark,
                "CALL algo.pageRank(5, 0.85) YIELD node, rank "
                "RETURN count(*) AS n, round(sum(rank), 3) AS s", tpch_graph)
    r = pr.collect()[0]
    assert r["s"] == pytest.approx(1.0, abs=0.01)
