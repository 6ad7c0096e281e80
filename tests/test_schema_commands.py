"""Schema & admin commands (SURVEY §2.10: SchemaLogicalPlan /
ShowCommandLogicalPlan parity): CREATE/DROP/SHOW INDEX + CONSTRAINT with
validation-job semantics, SHOW PROCEDURES/FUNCTIONS/DATABASES."""

import pytest

from neo4j_spark.api import cypher
from neo4j_spark.schema import SchemaError


def test_create_show_drop_index(spark, tpch_graph):
    g = tpch_graph.copy()
    r = cypher(spark, "CREATE INDEX i1 FOR (n:Customer) ON (n.acctbal)",
               g).collect()
    assert r[0]["type"] == "RANGE" and r[0]["properties"] == ["acctbal"]
    cypher(spark, "CREATE INDEX r1 FOR ()-[r:CONTAINS]-() ON (r.quantity)",
           g).collect()
    shown = cypher(spark, "SHOW INDEXES", g).collect()
    assert {x["name"] for x in shown} == {"i1", "r1"}
    assert {x["entityType"] for x in shown} == {"NODE", "RELATIONSHIP"}
    cypher(spark, "DROP INDEX i1", g).collect()
    assert {x["name"] for x in cypher(spark, "SHOW INDEXES", g).collect()} \
        == {"r1"}


def test_fulltext_index_ddl_builds_inverted_index(spark, tpch_graph):
    g = tpch_graph.copy()
    cypher(spark, "CREATE FULLTEXT INDEX ftddl FOR (n:Part) "
           "ON EACH [n.name]", g).collect()
    n = cypher(spark, "CALL db.index.fulltext.queryNodes('ftddl', 'widget') "
               "YIELD node, score RETURN count(*) AS n", g).collect()
    assert n[0]["n"] > 0
    assert "ftddl" in g.fulltext_indexes


def test_unique_constraint_validates(spark, tpch_graph):
    g = tpch_graph.copy()
    ok = cypher(spark, "CREATE CONSTRAINT uq FOR (n:Customer) "
                "REQUIRE n.custkey IS UNIQUE", g).collect()
    assert ok[0]["type"] == "UNIQUE"
    with pytest.raises(SchemaError):
        cypher(spark, "CREATE CONSTRAINT bad FOR (n:Customer) "
               "REQUIRE n.mktsegment IS UNIQUE", g).collect()
    shown = cypher(spark, "SHOW CONSTRAINTS", g).collect()
    assert {x["name"] for x in shown} == {"uq"}  # rejected one not recorded


def test_show_catalogs(spark, tpch_graph):
    procs = {r["name"] for r in
             cypher(spark, "SHOW PROCEDURES", tpch_graph).collect()}
    assert "db.labels" in procs and "algo.pagerank" in procs
    fns = {r["name"] for r in
           cypher(spark, "SHOW FUNCTIONS", tpch_graph).collect()}
    assert {"abs", "collect", "toInteger", "valueType"} <= fns
    dbs = cypher(spark, "SHOW DATABASES", tpch_graph).collect()
    assert dbs[0]["currentStatus"] == "online"
