"""QPP/Trail (LP:3977), CALL {} subquery (LP:855 Apply), FOREACH (LP:2336),
and ORDER BY over pre-projection scope."""

import pytest

from neo4j_spark.api import cypher


def rows(df):
    return [tuple(r) for r in df.collect()]


def test_qpp_single_rep(spark, chain_graph):
    out = cypher(spark,
                 "MATCH ((a:A)-[r:R]->(b)){1,1} RETURN count(*) AS n",
                 chain_graph)
    assert rows(out) == [(1,)]


def test_qpp_range_union(spark, chain_graph):
    # A->B (1 rep) and A->B->C (2 reps)
    out = cypher(spark,
                 "MATCH (s:A) ((x)-[r:R]->(y)){1,2} (e) "
                 "RETURN size(r) AS hops, e.x AS ex ORDER BY hops",
                 chain_graph)
    assert rows(out) == [(1, 2), (2, 3)]


def test_qpp_zero_reps(spark, chain_graph):
    out = cypher(spark,
                 "MATCH (s:B) ((x)-[r:R]->(y)){0,1} (e) "
                 "RETURN size(r) AS hops, e.x AS ex ORDER BY hops",
                 chain_graph)
    assert rows(out) == [(0, 2), (1, 3)]


def test_qpp_group_variables(spark, chain_graph):
    out = cypher(spark,
                 "MATCH (s:A) ((x)-[r:R]->(y)){2,2} (e:C) "
                 "RETURN [q IN r | q.w] AS ws, size(x) AS nx",
                 chain_graph)
    assert rows(out) == [([1.0, 2.0], 2)]


def test_qpp_rel_uniqueness(spark, chain_graph):
    # undirected 2-hop trail cannot reuse the same relationship back
    out = cypher(spark,
                 "MATCH (s:A) ((x)-[r:R]-(y)){2,2} (e) "
                 "RETURN e.x AS ex", chain_graph)
    assert rows(out) == [(3,)]


def test_call_subquery_uncorrelated(spark, chain_graph):
    out = cypher(spark,
                 "MATCH (a:A) CALL { MATCH (n) RETURN count(*) AS total } "
                 "RETURN a.x AS x, total", chain_graph)
    assert rows(out) == [(1, 3)]


def test_call_subquery_correlated(spark, chain_graph):
    out = cypher(spark,
                 "MATCH (n) CALL { WITH n MATCH (n)-[:R]->(m) "
                 "RETURN count(*) AS deg } "
                 "RETURN n.x AS x, deg ORDER BY x", chain_graph)
    assert rows(out) == [(1, 1), (2, 1), (3, 0)]


def test_foreach_updates(spark, chain_graph):
    g = chain_graph.copy()
    cypher(spark,
           "MATCH (n) FOREACH (i IN [1, 2] | SET n.bumped = true)",
           g).collect()
    out = cypher(spark,
                 "MATCH (n) WHERE n.bumped = true RETURN count(*) AS n", g)
    assert rows(out) == [(3,)]


def test_foreach_standalone_create(spark, chain_graph):
    g = chain_graph.copy()
    cypher(spark, "FOREACH (x IN [10, 20] | CREATE (:Tmp {v: x}))", g)
    out = cypher(spark,
                 "MATCH (t:Tmp) RETURN t.v AS v ORDER BY v", g)
    assert rows(out) == [(10,), (20,)]


def test_order_by_preprojection_var(spark, chain_graph):
    out = cypher(spark,
                 "MATCH (n) RETURN n.x + 10 AS v ORDER BY n.x DESC",
                 chain_graph)
    assert rows(out) == [(13,), (12,), (11,)]


def test_nested_call_subqueries(spark, tpch_graph):
    from neo4j_spark.api import cypher

    out = cypher(spark,
                 "MATCH (r:Region) CALL { WITH r "
                 "MATCH (n:Nation)-[:IN_REGION]->(r) CALL { WITH n "
                 "MATCH (c:Customer)-[:FROM_NATION]->(n) "
                 "RETURN count(*) AS cc } "
                 "RETURN sum(cc) AS s } "
                 "RETURN r.name AS rn, s ORDER BY rn", tpch_graph)
    got = {r["rn"]: r["s"] for r in out.collect()}
    # cross-checked against DuckDB on the same parquet
    assert got == {"AFRICA": 33, "AMERICA": 33, "ASIA": 26,
                   "EUROPE": 24, "MIDDLE EAST": 34}


def test_optional_call_null_pads(spark, tpch_graph):
    from neo4j_spark.api import cypher

    # correlated, empty per-row: null-padded instead of dropped
    out = cypher(spark,
                 "MATCH (r:Region) OPTIONAL CALL { WITH r "
                 "MATCH (n:Nation {name: 'NOPE'})-[:IN_REGION]->(r) "
                 "RETURN n.name AS nn } "
                 "RETURN count(*) AS rows, count(nn) AS hits", tpch_graph)
    assert [tuple(r) for r in out.collect()] == [(5, 0)]
    # plain CALL on the same empty body drops every row
    out2 = cypher(spark,
                  "MATCH (r:Region) CALL { WITH r "
                  "MATCH (n:Nation {name: 'NOPE'})-[:IN_REGION]->(r) "
                  "RETURN n.name AS nn } "
                  "RETURN count(*) AS rows", tpch_graph)
    assert [tuple(r) for r in out2.collect()] == [(0,)]


class TestQppVarExpandCollapse:
    """TrailToVarExpandRewriter parity: a QPP over one unconstrained
    relationship runs as VarExpand's iterative loop, so unbounded
    quantifiers reach the full var-length depth cap instead of the
    Trail unroll bound."""

    def test_unbounded_plus_reaches_deep(self, spark):
        from neo4j_spark.graph import PropertyGraph
        from neo4j_spark.api import cypher

        n = 11
        nodes = {"C": spark.createDataFrame(
            [(i, ["C"], i) for i in range(n)],
            "id long, labels array<string>, v long")}
        rels = {"L": spark.createDataFrame(
            [(100 + i, i, i + 1, "L") for i in range(n - 1)],
            "id long, src long, dst long, type string")}
        g = PropertyGraph(nodes, rels)
        df = cypher(spark,
                    "MATCH (a:C {v: 0})-[:L]->+(b) RETURN max(b.v) AS m", g)
        assert [tuple(r) for r in df.collect()] == [(10,)]

    def test_named_rel_group_survives_collapse(self, spark, chain_graph):
        from neo4j_spark.api import cypher

        df = cypher(spark,
                    "MATCH (a:A) ((x)-[r:R]->(y)){1,2} (b:C) "
                    "RETURN size(r) AS nr", chain_graph)
        assert [tuple(x) for x in df.collect()] == [(2,)]


def test_call_union_label_merge_pruning(spark, chain_graph):
    # Regression: UNION branches binding the same var from different labels
    # must merge label knowledge as a union across branches — last-branch-wins
    # made var-length schema pruning drop paths starting from earlier
    # branches' labels (A here).
    out = cypher(spark,
                 "CALL { MATCH (n:A) RETURN n UNION MATCH (b:B) RETURN b AS n } "
                 "MATCH (n)-[*1..1]->(m) RETURN count(*) AS c", chain_graph)
    assert rows(out) == [(2,)]


def test_call_union_mixed_label_knowledge(spark, chain_graph):
    # one branch has labels, the other binds the var unlabeled: all label
    # knowledge must be discarded (pruning may not assume A-or-B)
    out = cypher(spark,
                 "CALL { MATCH (n:A) RETURN n UNION MATCH (b) RETURN b AS n } "
                 "MATCH (n)-[*1..1]->(m) RETURN count(*) AS c", chain_graph)
    assert rows(out) == [(2,)]


@pytest.fixture
def qpp_ext(spark):
    # var-length-inside-QPP is an opt-in engine extension
    # (neo4j_spark.cypher.extensions); default mode follows the reference
    # and raises — see test_qpp_nested_var_default_raises
    prev = spark.conf.get("neo4j_spark.cypher.extensions", "false")
    spark.conf.set("neo4j_spark.cypher.extensions", "true")
    yield
    spark.conf.set("neo4j_spark.cypher.extensions", prev)


def test_qpp_nested_var_length(spark, chain_graph, qpp_ext):
    # var-length rel inside the repeated unit (TrailPipe.scala:65 arbitrary
    # RHS): {1,2} reps of an inner 1..2-hop expansion, rel-unique across
    # the whole trail
    out = cypher(spark,
                 "MATCH (s:A)((a)-[*1..2]->(b)){1,2}(e) "
                 "RETURN count(*) AS n", chain_graph)
    assert rows(out) == [(3,)]


def test_qpp_nested_var_length_rel_uniqueness(spark, chain_graph, qpp_ext):
    # 2 reps of *1..2 over a 2-edge chain can only be (1 hop, 1 hop);
    # reusing an edge across reps must be rejected
    out = cypher(spark,
                 "MATCH (s:A)((a)-[*1..2]->(b)){2,2}(e) "
                 "RETURN count(*) AS n", chain_graph)
    assert rows(out) == [(1,)]


def test_qpp_nested_mixed_unit(spark, chain_graph, qpp_ext):
    # repeated unit mixing a var-length and a fixed rel
    out = cypher(spark,
                 "MATCH (s:A)((a)-[:R*1..2]->(b)-[:R]->(c)){1,1}(e) "
                 "RETURN e.x AS x", chain_graph)
    assert rows(out) == [(3,)]


def test_qpp_nested_var_default_raises(spark, chain_graph):
    # strict-conformance default: the reference rejects a var-length rel
    # inside a QPP unit (SemanticPatternCheck.scala,
    # QuantifiedPathPatternsSemanticAnalysisTest.scala:257)
    assert spark.conf.get("neo4j_spark.cypher.extensions",
                          "false") == "false"
    with pytest.raises(Exception,
                       match="cannot be part of a quantified path"):
        cypher(spark,
               "MATCH (s:A)((a)-[*1..2]->(b)){1,2}(e) "
               "RETURN count(*) AS n", chain_graph)


def test_call_scope_clause_forms(spark, chain_graph):
    # GQL variable-scope clause: CALL (n) imports n; CALL (*) the whole
    # scope; CALL () nothing (uncorrelated body)
    out = cypher(spark,
                 "MATCH (a:A) CALL (a) { MATCH (a)-[:R]->(b) "
                 "RETURN b.x AS bx } RETURN a.x AS ax, bx", chain_graph)
    assert rows(out) == [(1, 2)]
    out = cypher(spark,
                 "MATCH (a:A) CALL (*) { MATCH (a)-[:R]->(b) "
                 "RETURN b.x AS bx } RETURN bx", chain_graph)
    assert rows(out) == [(2,)]
    out = cypher(spark,
                 "MATCH (a:A) CALL () { MATCH (n) RETURN count(*) AS k } "
                 "RETURN a.x AS ax, k", chain_graph)
    assert rows(out) == [(1, 3)]


class TestPathBoundPatternComprehension:
    """[p = (a)-->(b) | proj] — path variable bound inside a pattern
    comprehension (RollUpApply with path construction)."""

    def test_length_and_nodes(self, spark, chain_graph):
        from neo4j_spark.api import cypher

        got = [tuple(r) for r in cypher(
            spark,
            "MATCH (a:A) RETURN [p = (a)-[:R]->(:B) | length(p)] AS l, "
            "[p = (a)-[:R]->(b:B) | [n IN nodes(p) | n.x]] AS ns",
            chain_graph).collect()]
        assert got == [([1], [[1, 2]])]

    def test_where_on_path(self, spark, chain_graph):
        from neo4j_spark.api import cypher

        got = [tuple(r) for r in cypher(
            spark,
            "MATCH (a:A) RETURN "
            "size([p = (a)-[:R*1..2]->() WHERE length(p) = 2 | 1]) AS n",
            chain_graph).collect()]
        assert got == [(1,)]
