"""Graph algorithms (graph-algo parity): connected components, PageRank,
SSSP as Pregel-style DataFrame loops."""

import pytest

# conformance tranche: excluded from the default (core) run so the
# driver's verify window can finish; run with `pytest -m acceptance`
pytestmark = pytest.mark.acceptance


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


def test_triangle_count_literal_graph(spark):
    from neo4j_spark.operators.algorithms import triangle_count

    # K3 triangle {1,2,3} + a pendant edge 3-4 + a second triangle {3,4,5}
    rels = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5)], "src long, dst long")
    got = {r["id"]: r["triangles"] for r in triangle_count(rels).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_triangle_count_ignores_direction_and_duplicates(spark):
    from neo4j_spark.operators.algorithms import triangle_count

    # same triangle with mixed directions + a parallel edge + self-loop
    rels = spark.createDataFrame(
        [(1, 2), (3, 2), (1, 3), (2, 1), (1, 1)], "src long, dst long")
    got = {r["id"]: r["triangles"] for r in triangle_count(rels).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_degree_centrality(spark):
    from neo4j_spark.operators.algorithms import degree_centrality

    nodes = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    rels = spark.createDataFrame([(1, 2), (1, 3)], "src long, dst long")
    got = {r["id"]: (r["out_degree"], r["in_degree"], r["degree"])
           for r in degree_centrality(nodes, rels).collect()}
    assert got == {1: (2, 0, 2), 2: (0, 1, 1), 3: (0, 1, 1)}


class TestAllPairsShortest:
    """FloydWarshall.java parity as min-plus repeated squaring."""

    def test_unweighted_chain(self, spark):
        rels = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4)], "src long, dst long")
        from neo4j_spark.operators.algorithms import all_pairs_shortest

        got = {(r.src, r.dst): r.dist
               for r in all_pairs_shortest(rels).collect()}
        assert got[(1, 4)] == 3.0 and got[(1, 2)] == 1.0 \
            and got[(2, 4)] == 2.0 and (4, 1) not in got

    def test_weighted_picks_cheaper_long_route(self, spark):
        rels = spark.createDataFrame(
            [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 5.0)],
            "src long, dst long, w double")
        from neo4j_spark.operators.algorithms import all_pairs_shortest

        got = {(r.src, r.dst): r.dist
               for r in all_pairs_shortest(rels, "w").collect()}
        assert got[(1, 3)] == 2.0

    def test_undirected(self, spark):
        rels = spark.createDataFrame([(1, 2)], "src long, dst long")
        from neo4j_spark.operators.algorithms import all_pairs_shortest

        got = {(r.src, r.dst): r.dist
               for r in all_pairs_shortest(rels, directed=False).collect()}
        assert got[(2, 1)] == 1.0


class TestAStar:
    """AStar.java parity: heuristic pruning must not change the result."""

    def test_weighted_route(self, spark):
        from neo4j_spark.operators.algorithms import astar

        nodes = spark.createDataFrame(
            [(1, 0.0, 0.0), (2, 1.0, 0.0), (3, 2.0, 0.0), (4, 1.0, 5.0)],
            "id long, x double, y double")
        rels = spark.createDataFrame(
            [(1, 2, 1.0), (2, 3, 1.0), (1, 4, 1.0), (4, 3, 10.0)],
            "src long, dst long, w double")
        d = astar(rels, nodes, 1, 3, "w", "x", "y")
        assert d == 2.0

    def test_no_heuristic_is_dijkstra(self, spark):
        from neo4j_spark.operators.algorithms import astar

        nodes = spark.createDataFrame([(i,) for i in range(1, 4)], "id long")
        rels = spark.createDataFrame(
            [(1, 2, 2.5), (2, 3, 2.5), (1, 3, 9.0)],
            "src long, dst long, w double")
        assert astar(rels, nodes, 1, 3, "w") == 5.0

    def test_unreachable_is_none(self, spark):
        from neo4j_spark.operators.algorithms import astar

        nodes = spark.createDataFrame([(1,), (2,)], "id long")
        rels = spark.createDataFrame([(2, 1)], "src long, dst long")
        assert astar(rels, nodes, 1, 2) is None

    def test_procedure_call(self, spark, tpch_graph):
        from neo4j_spark.api import cypher

        df = cypher(spark,
                    "MATCH (c:Customer {custkey: 1})-[:FROM_NATION]->()"
                    "-[:IN_REGION]->(r:Region) "
                    "WITH id(c) AS cid, id(r) AS rid "
                    "CALL algo.astar(cid, rid) YIELD dist RETURN dist",
                    tpch_graph)
        assert [r.dist for r in df.collect()] == [2.0]


class TestKShortestPaths:
    """Dijkstra + PathInterestFactory.numberOfShortest(k) parity
    (TopFetchingWeightedPathIterator): k cheapest simple paths with
    branch-and-bound pruning on the k-th complete cost."""

    import pytest as _pytest

    @_pytest.fixture(scope="class")
    def wgraph(self, spark):
        from neo4j_spark.graph import PropertyGraph

        nodes = {"N": spark.createDataFrame(
            [(i, ["N"]) for i in range(1, 5)],
            "id long, labels array<string>")}
        rels = {"R": spark.createDataFrame(
            [(10, 1, 2, "R", 1.0), (11, 2, 4, "R", 1.0),
             (12, 1, 3, "R", 1.0), (13, 3, 4, "R", 2.0),
             (14, 1, 4, "R", 4.0)],
            "id long, src long, dst long, type string, w double")}
        return PropertyGraph(nodes, rels)

    def test_weighted_k2(self, spark, wgraph):
        from neo4j_spark.procedures.registry import run_procedure

        out = [(r.nodeIds, r.cost) for r in run_procedure(
            spark, wgraph, "algo.kshortestpaths", [1, 4, 2, "w"]).collect()]
        assert out == [([1, 2, 4], 2.0), ([1, 3, 4], 3.0)]

    def test_k_exceeds_path_count(self, spark, wgraph):
        from neo4j_spark.procedures.registry import run_procedure

        out = [(r.nodeIds, r.cost) for r in run_procedure(
            spark, wgraph, "algo.kshortestpaths", [1, 4, 9, "w"]).collect()]
        assert out == [([1, 2, 4], 2.0), ([1, 3, 4], 3.0), ([1, 4], 4.0)]

    def test_unweighted_hops(self, spark, wgraph):
        from neo4j_spark.procedures.registry import run_procedure

        out = [(r.nodeIds, r.cost) for r in run_procedure(
            spark, wgraph, "algo.kshortestpaths", [1, 4, 1]).collect()]
        assert out == [([1, 4], 1.0)]

    def test_source_equals_target(self, spark, wgraph):
        from neo4j_spark.procedures.registry import run_procedure

        out = [(r.nodeIds, r.cost) for r in run_procedure(
            spark, wgraph, "algo.kshortestpaths", [1, 1, 2, "w"]).collect()]
        assert out == [([1], 0.0)]


    def test_depth_exhaustion_raises(self, spark):
        # 19-hop cheapest path > default max_depth=15: must raise, not
        # silently return nothing
        from neo4j_spark.graph import PropertyGraph
        from neo4j_spark.procedures.registry import run_procedure
        import pytest

        nodes = {"N": spark.createDataFrame(
            [(i, ["N"]) for i in range(1, 21)],
            "id long, labels array<string>")}
        rels = {"R": spark.createDataFrame(
            [(100 + i, i, i + 1, "R", 0.1) for i in range(1, 20)],
            "id long, src long, dst long, type string, w double")}
        g = PropertyGraph(nodes, rels)
        with pytest.raises(ValueError, match="max_depth"):
            run_procedure(spark, g, "algo.kshortestpaths",
                          [1, 20, 1, "w"]).collect()
        # the procedure exposes maxDepth: 25 is enough
        out = [(len(r.relIds), round(r.cost, 3)) for r in run_procedure(
            spark, g, "algo.kshortestpaths",
            [1, 20, 1, "w", True, 25]).collect()]
        assert out == [(19, 1.9)]

    def test_depth_exhaustion_confirmed_no_raise(self, spark):
        # live zero-cost partials at max_depth, but the k-th best done
        # cost already ties the cheapest live partial: confirmed optimal
        from neo4j_spark.graph import PropertyGraph
        from neo4j_spark.procedures.registry import run_procedure

        nodes = {"N": spark.createDataFrame(
            [(i, ["N"]) for i in list(range(1, 31)) + [99]],
            "id long, labels array<string>")}
        edges = [(200, 1, 99, 0.0)] + [
            (100 + i, i, i + 1, 0.0) for i in range(1, 30)]
        rels = {"R": spark.createDataFrame(
            [(e, s, d, "R", w) for e, s, d, w in edges],
            "id long, src long, dst long, type string, w double")}
        g = PropertyGraph(nodes, rels)
        out = [(r.nodeIds, r.cost) for r in run_procedure(
            spark, g, "algo.kshortestpaths", [1, 99, 1, "w"]).collect()]
        assert out == [([1, 99], 0.0)]


def test_astar_geo_heuristic(spark):
    """GeoEstimateEvaluator parity: (lat, lon) chord-distance heuristic;
    the estimate is admissible for metric road weights, so the geo A*
    returns the same distance as plain Dijkstra on the same graph."""
    import math

    from neo4j_spark.graph import PropertyGraph
    from neo4j_spark.procedures.registry import run_procedure

    # three cities; direct edge is LONGER than the 2-hop route
    nodes = {"C": spark.createDataFrame(
        [(1, ["C"], 52.52, 13.40),    # Berlin
         (2, ["C"], 50.08, 14.44),    # Prague
         (3, ["C"], 48.21, 16.37)],   # Vienna
        "id long, labels array<string>, lat double, lon double")}
    rels = {"R": spark.createDataFrame(
        [(10, 1, 2, "R", 280_000.0), (11, 2, 3, "R", 250_000.0),
         (12, 1, 3, "R", 900_000.0)],
        "id long, src long, dst long, type string, meters double")}
    g = PropertyGraph(nodes, rels)
    [row] = run_procedure(
        spark, g, "algo.astar",
        [1, 3, "meters", "lat", "lon", True, True]).collect()
    assert math.isclose(row["dist"], 530_000.0)
