"""Composite (multi-graph) USE: a GraphCatalog routes USE clauses to
named constituent graphs — the engine-side analog of the reference's
query router executing a fragment against the selected graph
(``community/fabric/query-router``, logical plan ``RunQueryAt`` LP:3559).
"""

import pytest

from neo4j_spark.api import cypher
from neo4j_spark.graph import GraphCatalog, PropertyGraph


def rows(df):
    return [tuple(r) for r in df.collect()]


@pytest.fixture(scope="module")
def catalog(spark):
    def g(tag, base):
        nodes = {"Person": spark.createDataFrame(
            [(base + i, ["Person"], f"{tag}{i}", i) for i in range(3)],
            "id long, labels array<string>, name string, grp long")}
        rels = {"KNOWS": spark.createDataFrame(
            [(base + 100, base, base + 1, "KNOWS")],
            "id long, src long, dst long, type string")}
        return PropertyGraph(nodes, rels)

    return GraphCatalog({"alpha": g("a", 0), "beta": g("b", 10)},
                        default="alpha")


class TestGraphCatalog:
    def test_default_graph_without_use(self, spark, catalog):
        assert rows(cypher(
            spark, "MATCH (p:Person) RETURN count(*) AS c, min(p.name) AS m",
            catalog)) == [(3, "a0")]

    def test_head_use_selects_graph(self, spark, catalog):
        assert rows(cypher(
            spark,
            "USE beta MATCH (p:Person) RETURN p.name AS n ORDER BY n",
            catalog)) == [("b0",), ("b1",), ("b2",)]

    def test_use_graph_keyword_and_case(self, spark, catalog):
        assert rows(cypher(
            spark, "USE GRAPH Beta MATCH (p:Person) RETURN count(*) AS c",
            catalog)) == [(3,)]

    def test_union_branch_use(self, spark, catalog):
        got = rows(cypher(spark, """
            USE alpha MATCH (p:Person) RETURN p.name AS n
            UNION ALL
            USE beta MATCH (p:Person) RETURN p.name AS n
            """, catalog))
        assert sorted(got) == [(f"{t}{i}",) for t in "ab" for i in range(3)]

    def test_call_subquery_use_uncorrelated(self, spark, catalog):
        assert rows(cypher(spark, """
            MATCH (a:Person) WHERE a.name = 'a0'
            CALL { USE beta MATCH (b:Person) RETURN count(b) AS bc }
            RETURN a.name AS an, bc
            """, catalog)) == [("a0", 3)]

    def test_call_subquery_use_correlated(self, spark, catalog):
        # importing WITH first, USE second (the reference's permitted
        # subquery shape) — cross-graph correlation on a property
        got = rows(cypher(spark, """
            MATCH (a:Person)
            CALL {
              WITH a
              USE beta
              MATCH (b:Person) WHERE b.grp = a.grp
              RETURN b.name AS bn
            }
            RETURN a.name AS an, bn ORDER BY an
            """, catalog))
        assert got == [("a0", "b0"), ("a1", "b1"), ("a2", "b2")]

    def test_unknown_graph_raises(self, spark, catalog):
        with pytest.raises(Exception, match="not found in catalog"):
            cypher(spark, "USE nope MATCH (n) RETURN n", catalog).collect()

    def test_mid_stream_use_raises(self, spark, catalog):
        from neo4j_spark.cypher.translate import TranslateError

        with pytest.raises(TranslateError, match="first clause"):
            cypher(spark,
                   "MATCH (a:Person) WITH a USE beta MATCH (b:Person) "
                   "RETURN a, b", catalog).collect()

    def test_plain_dict_accepted(self, spark, catalog):
        graphs = dict(catalog.graphs)
        assert rows(cypher(
            spark, "USE beta MATCH (p:Person) RETURN count(*) AS c",
            graphs)) == [(3,)]

    def test_single_graph_back_compat(self, spark, catalog):
        # no catalog: USE is accepted and recorded, not resolved
        g = catalog.default_graph
        assert rows(cypher(
            spark, "USE anything.here MATCH (p:Person) RETURN count(*) AS c",
            g)) == [(3,)]


class TestDynamicGraphReference:
    """graph.byName / graph.byElementId (GraphByName.scala,
    GraphByElementId.scala): dynamic graph references with plan-time
    constant arguments."""

    def test_by_name_literal(self, spark, catalog):
        assert rows(cypher(
            spark,
            "USE graph.byName('beta') MATCH (p:Person) RETURN count(*) AS c",
            catalog)) == [(3,)]

    def test_by_name_parameter(self, spark, catalog):
        assert rows(cypher(
            spark,
            "USE graph.byName($g) MATCH (p:Person) RETURN p.name AS n "
            "ORDER BY n LIMIT 1",
            catalog, params={"g": "beta"})) == [("b0",)]

    def test_by_element_id(self, spark, catalog):
        assert rows(cypher(
            spark,
            "USE graph.byElementId('g:beta') MATCH (p:Person) "
            "RETURN count(*) AS c",
            catalog)) == [(3,)]

    def test_by_name_union_branch(self, spark, catalog):
        got = rows(cypher(spark, """
            USE graph.byName('alpha') MATCH (p:Person) RETURN p.name AS n
            UNION ALL
            USE graph.byName('beta') MATCH (p:Person) RETURN p.name AS n
            """, catalog))
        assert sorted(got) == [(f"{t}{i}",) for t in "ab" for i in range(3)]

    def test_by_name_non_constant_raises(self, spark, catalog):
        from neo4j_spark.cypher.translate import TranslateError

        with pytest.raises(TranslateError, match="literal or parameter"):
            cypher(spark,
                   "MATCH (p:Person) RETURN p.name AS n", catalog)
            cypher(spark,
                   "USE graph.byName(toString(1)) MATCH (p:Person) "
                   "RETURN count(*) AS c", catalog).collect()

    def test_unknown_name_raises(self, spark, catalog):
        with pytest.raises(KeyError, match="not found"):
            cypher(spark,
                   "USE graph.byName('gamma') MATCH (p:Person) "
                   "RETURN count(*) AS c", catalog)


class TestGraphFunctions:
    """graph.names() / graph.propertiesByName() (fabric graph functions)."""

    def test_graph_names(self, spark, catalog):
        got = rows(cypher(spark, "RETURN graph.names() AS n", catalog))
        assert got == [(["alpha", "beta"],)]

    def test_properties_by_name(self, spark, catalog):
        got = rows(cypher(
            spark, "RETURN graph.propertiesByName('alpha') AS p", catalog))
        assert got == [({},)]

    def test_properties_unknown_graph_raises(self, spark, catalog):
        with pytest.raises(KeyError, match="not found"):
            cypher(spark, "RETURN graph.propertiesByName('nope') AS p",
                   catalog)
