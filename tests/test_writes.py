"""Updating-clause tests (SURVEY §2.10): CREATE / MERGE / SET / REMOVE /
DELETE as staged DataFrame rewrites, mirroring the reference's pipe
semantics (CreatePipe/MergePipe/SetPipe/DeletePipe)."""

import pytest

from neo4j_spark.api import cypher
from neo4j_spark.graph import PropertyGraph


@pytest.fixture()
def g(spark, chain_graph):
    return chain_graph.copy()


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_create_nodes_from_unwind(spark, g):
    eff = cypher(spark, "UNWIND range(1, 5) AS x CREATE (:T {v: x})", g)
    r = eff.collect()[0]
    assert r["nodes_created"] == 5
    out = cypher(spark, "MATCH (t:T) RETURN count(*) AS n, sum(t.v) AS s", g)
    assert rows(out) == [(5, 15)]


def test_create_rel_between_new_nodes(spark, g):
    eff = cypher(
        spark, "CREATE (a:X {v: 1})-[:LINK {w: 2.5}]->(b:Y {v: 2})", g)
    r = eff.collect()[0]
    assert (r["nodes_created"], r["rels_created"]) == (2, 1)
    out = cypher(spark,
                 "MATCH (a:X)-[l:LINK]->(b:Y) RETURN a.v AS av, l.w AS w, "
                 "b.v AS bv", g)
    assert rows(out) == [(1, 2.5, 2)]


def test_create_rel_between_matched(spark, g):
    cypher(spark,
           "MATCH (a:A), (c:C) CREATE (a)-[:JUMP]->(c)", g).collect()
    out = cypher(spark, "MATCH (:A)-[:JUMP]->(x) RETURN x.x AS v", g)
    assert rows(out) == [(3,)]


def test_set_property_and_readback(spark, g):
    eff = cypher(spark, "MATCH (b:B) SET b.x = 20, b.fresh = true", g)
    assert eff.collect()[0]["props_set"] == 2
    out = cypher(spark, "MATCH (b:B) RETURN b.x AS x, b.fresh AS f", g)
    assert rows(out) == [(20, True)]


def test_set_sees_new_value_same_statement(spark, g):
    out = cypher(spark, "MATCH (a:A) SET a.x = 99 RETURN a.x AS x", g)
    assert rows(out) == [(99,)]


def test_set_add_label(spark, g):
    cypher(spark, "MATCH (a:A) SET a:Marked", g).collect()
    out = cypher(spark, "MATCH (m:Marked) RETURN m.x AS x", g)
    assert rows(out) == [(1,)]


def test_remove_property_and_label(spark, g):
    cypher(spark, "MATCH (a:A) SET a:Tmp", g).collect()
    cypher(spark, "MATCH (a:A) REMOVE a.x, a:Tmp", g).collect()
    out = cypher(spark, "MATCH (a:A) RETURN a.x AS x", g)
    assert rows(out) == [(None,)]
    assert rows(cypher(spark, "MATCH (t:Tmp) RETURN count(*) AS n", g)) == [(0,)]


def test_delete_rel(spark, g):
    eff = cypher(spark, "MATCH (:A)-[r:R]->(:B) DELETE r", g)
    assert eff.collect()[0]["rels_deleted"] == 1
    out = cypher(spark, "MATCH ()-[r:R]->() RETURN count(*) AS n", g)
    assert rows(out) == [(1,)]


def test_delete_connected_node_raises(spark, g):
    with pytest.raises(Exception, match="DETACH"):
        cypher(spark, "MATCH (b:B) DELETE b", g).collect()


def test_detach_delete_node(spark, g):
    eff = cypher(spark, "MATCH (b:B) DETACH DELETE b", g)
    r = eff.collect()[0]
    assert (r["nodes_deleted"], r["rels_deleted"]) == (1, 2)
    assert rows(cypher(spark, "MATCH (n) RETURN count(*) AS n", g)) == [(2,)]
    assert rows(cypher(spark, "MATCH ()-[r]->() RETURN count(*) AS n", g)) == [(0,)]


def test_merge_node_match_or_create(spark, g):
    # existing -> matched, no creation
    eff = cypher(spark, "MERGE (a:A {x: 1})", g)
    assert eff.collect()[0]["nodes_created"] == 0
    # missing -> created once even from multiple identical rows
    eff = cypher(spark,
                 "UNWIND [1, 1, 1] AS i MERGE (z:Z {name: 'only'})", g)
    assert eff.collect()[0]["nodes_created"] == 1
    assert rows(cypher(spark, "MATCH (z:Z) RETURN count(*) AS n", g)) == [(1,)]


def test_merge_on_create_on_match(spark, g):
    cypher(spark,
           "MERGE (z:Z {name: 'k'}) ON CREATE SET z.created = true "
           "ON MATCH SET z.seen = true", g).collect()
    out = cypher(spark, "MATCH (z:Z) RETURN z.created AS c, z.seen AS s", g)
    assert rows(out) == [(True, None)]
    cypher(spark,
           "MERGE (z:Z {name: 'k'}) ON CREATE SET z.created = true "
           "ON MATCH SET z.seen = true", g).collect()
    out = cypher(spark, "MATCH (z:Z) RETURN z.created AS c, z.seen AS s", g)
    assert rows(out) == [(True, True)]


def test_merge_rel(spark, g):
    # rel exists -> no creation
    eff = cypher(spark, "MATCH (a:A), (b:B) MERGE (a)-[r:R]->(b)", g)
    assert eff.collect()[0]["rels_created"] == 0
    # rel missing -> created
    eff = cypher(spark, "MATCH (a:A), (c:C) MERGE (a)-[r:R]->(c)", g)
    assert eff.collect()[0]["rels_created"] == 1
    out = cypher(spark, "MATCH (:A)-[r:R]->(:C) RETURN count(*) AS n", g)
    assert rows(out) == [(1,)]


def test_write_isolated_by_copy(spark, chain_graph):
    g1 = chain_graph.copy()
    cypher(spark, "CREATE (:Iso {v: 1})", g1).collect()
    g2 = chain_graph.copy()
    assert rows(cypher(spark, "MATCH (i:Iso) RETURN count(*) AS n", g2)) == [(0,)]


def test_set_replace_map_clears_other_props(spark, g):
    # SET n = {map} REPLACES all properties (SetPropertiesFromMap with
    # removeOtherProps=true) — and the bound struct sees it immediately
    out = cypher(spark,
                 "MATCH (n:A) SET n = {name: 'z'} "
                 "RETURN n.name AS nm, n.x AS x", g)
    assert rows(out) == [("z", None)]
    out = cypher(spark, "MATCH (n:A) RETURN n.name AS nm, n.x AS x", g)
    assert rows(out) == [("z", None)]


def test_effect_only_call_in_transactions(spark, g):
    # TransactionForeach (LP:4100): unit subquery runs per input row for
    # effects; outer rowstream passes through
    cypher(spark,
           "UNWIND [1, 2] AS x "
           "CALL { WITH x CREATE (:TX {v: x}) } IN TRANSACTIONS OF 1 ROWS",
           g).collect()
    out = cypher(spark, "MATCH (t:TX) RETURN count(*) AS n, sum(t.v) AS s", g)
    assert rows(out) == [(2, 3)]


def test_effect_only_call_subquery(spark, g):
    cypher(spark,
           "UNWIND [10, 20] AS v CALL { WITH v CREATE (:SQ {v: v}) } "
           "RETURN v", g).collect()
    out = cypher(spark, "MATCH (t:SQ) RETURN sum(t.v) AS s", g)
    assert rows(out) == [(30,)]


def test_merge_full_chain_creates_all(spark, g):
    out = cypher(spark,
                 "MERGE (x:MA {v: 1})-[:L1]->(y:MB {v: 2})-[:L2]->(z:MC "
                 "{v: 3}) RETURN x.v + y.v + z.v AS s", g)
    assert rows(out) == [(6,)]
    chk = cypher(spark,
                 "MATCH (:MA)-[:L1]->(:MB)-[:L2]->(:MC) RETURN count(*) AS c",
                 g)
    assert rows(chk) == [(1,)]


def test_merge_chain_idempotent(spark, g):
    cypher(spark, "MERGE (x:MD {v: 1})-[:L3]->(y:ME {v: 2})", g).collect()
    cypher(spark, "MERGE (x:MD {v: 1})-[:L3]->(y:ME {v: 2})", g).collect()
    chk = cypher(spark,
                 "MATCH (d:MD), (e:ME) OPTIONAL MATCH ()-[l:L3]->() "
                 "RETURN count(DISTINCT d) AS d, count(DISTINCT e) AS e, "
                 "count(DISTINCT l) AS l", g)
    assert rows(chk) == [(1, 1, 1)]


def test_merge_chain_matches_existing(spark, g):
    # chain already present (chain_graph A-R->B): MERGE must match, not
    # duplicate
    eff = cypher(spark,
                 "MERGE (a:A {x: 1})-[:R]->(b:B {x: 2}) "
                 "ON MATCH SET a.seen = true", g)
    eff.collect()
    chk = cypher(spark, "MATCH (a:A) RETURN count(*) AS c, a.seen AS s "
                 "ORDER BY s", g)
    assert rows(chk) == [(1, True)]


def test_merge_chain_one_bound_endpoint(spark, g):
    out = cypher(spark,
                 "MATCH (a:A) MERGE (a)-[:NEWR]->(n:NewN {v: 9}) "
                 "RETURN n.v AS v", g)
    assert rows(out) == [(9,)]
    chk = cypher(spark, "MATCH (:A)-[:NEWR]->(n:NewN) RETURN count(*) AS c",
                 g)
    assert rows(chk) == [(1,)]


def test_merge_chain_shares_created_per_key(spark, g):
    out = cypher(spark,
                 "UNWIND [1, 1, 2] AS k "
                 "MERGE (a:KA {k: k})-[:KL]->(b:KB {k: k}) "
                 "RETURN count(*) AS c", g)
    assert rows(out) == [(3,)]
    chk = cypher(spark, "MATCH (a:KA) RETURN count(*) AS c", g)
    assert rows(chk) == [(2,)]
