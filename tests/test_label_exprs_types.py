"""GQL label expressions (:A&B, :!A, :%), negated rel types, IS :: type
predicates, ternary IN, and null-condition CASE.

Reference semantics: SubtractionNodeByLabelsScan (LogicalPlan.scala:4789),
TypePredicateExpressions.scala, AnyValue.ternaryEquals (AnyValue.java:62).
"""

import pytest

# conformance tranche: excluded from the default (core) run so the
# driver's verify window can finish; run with `pytest -m acceptance`
pytestmark = pytest.mark.acceptance


from neo4j_spark.api import cypher


def rows(df):
    return [tuple(r) for r in df.collect()]


class TestLabelExpressions:
    def test_conjunction_amp(self, spark, chain_graph):
        df = cypher(spark, "MATCH (n:A&A) RETURN count(*) AS c", chain_graph)
        assert rows(df) == [(1,)]

    def test_subtraction(self, spark, chain_graph):
        df = cypher(spark, "MATCH (n:!A) RETURN n.x AS x ORDER BY x",
                    chain_graph)
        assert rows(df) == [(2,), (3,)]

    def test_conj_with_negation(self, spark, tpch_graph):
        a = cypher(spark, "MATCH (n:Customer&!Supplier) RETURN count(*) AS c",
                   tpch_graph).collect()[0][0]
        b = cypher(spark, "MATCH (n:Customer) RETURN count(*) AS c",
                   tpch_graph).collect()[0][0]
        assert a == b  # no node carries both labels in the TPC-H mapping

    def test_wildcard(self, spark, chain_graph):
        df = cypher(spark, "MATCH (n:%) RETURN count(*) AS c", chain_graph)
        assert rows(df) == [(3,)]

    def test_neg_rel_type(self, spark, tpch_graph):
        df = cypher(spark,
                    "MATCH ()-[r:!IN_REGION&!CONTAINS&!SUPPLIED_BY]->() "
                    "RETURN DISTINCT type(r) AS t ORDER BY t", tpch_graph)
        assert rows(df) == [("FROM_NATION",), ("PLACED",)]

    def test_disjunction_still_works(self, spark, chain_graph):
        df = cypher(spark, "MATCH (n:A|B) RETURN count(*) AS c", chain_graph)
        assert rows(df) == [(2,)]


class TestIsTyped:
    def test_scalars(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN 1 IS :: INTEGER AS a, 1.5 IS :: FLOAT AS b, "
                    "'x' IS :: STRING AS c, true IS :: BOOLEAN AS d, "
                    "[1] IS :: LIST<INTEGER> AS e, 1 IS :: FLOAT AS f",
                    chain_graph)
        assert rows(df) == [(True, True, True, True, True, False)]

    def test_negated_and_null(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN 1.5 IS NOT :: INTEGER AS a, "
                    "null IS :: INTEGER AS b, "
                    "null IS NOT :: INTEGER AS c, "
                    "null IS :: INTEGER NOT NULL AS d", chain_graph)
        assert rows(df) == [(True, True, False, False)]

    def test_entities(self, spark, chain_graph):
        df = cypher(spark,
                    "MATCH (n:A)-[r]->() "
                    "RETURN n IS :: NODE AS a, r IS :: RELATIONSHIP AS b, "
                    "n IS :: RELATIONSHIP AS c", chain_graph)
        assert rows(df) == [(True, True, False)]


class TestTernaryIn:
    def test_null_semantics(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN null IN [1,2] AS a, 1 IN [1,null] AS b, "
                    "3 IN [1,null] AS c, null IN [] AS d, 5 IN [1,2] AS e",
                    chain_graph)
        assert rows(df) == [(None, True, None, False, False)]


class TestCaseNull:
    def test_null_condition_is_false(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN CASE WHEN null THEN 1 ELSE 2 END AS v",
                    chain_graph)
        assert rows(df) == [(2,)]


class TestProjectEndpoints:
    """ProjectEndpoints (LP:3407): re-matching a bound rel variable binds
    its endpoints instead of rescanning."""

    def test_directed_rebind(self, spark, chain_graph):
        df = cypher(spark,
                    "MATCH ()-[r:R]->() WITH r MATCH (a)-[r]->(b) "
                    "RETURN a.x AS ax, b.x AS bx ORDER BY ax", chain_graph)
        assert rows(df) == [(1, 2), (2, 3)]

    def test_undirected_rebind_both_orientations(self, spark, chain_graph):
        df = cypher(spark,
                    "MATCH ()-[r:R]->() WITH r MATCH (a)-[r]-(b) "
                    "RETURN count(*) AS c", chain_graph)
        assert rows(df) == [(4,)]

    def test_rebind_respects_prebound_start(self, spark, chain_graph):
        df = cypher(spark,
                    "MATCH (x:A)-[r:R]->() WITH x, r MATCH (x)-[r]->(b) "
                    "RETURN b.x AS bx", chain_graph)
        assert rows(df) == [(2,)]


class TestValueType:
    """valueType() returns GQL type descriptions (functions/ValueType.scala →
    CypherType.description): NOT NULL suffix for values, NULL for null."""

    def test_scalars(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN valueType(1) AS i, valueType('x') AS s, "
                    "valueType(1.5) AS f, valueType(null) AS n", chain_graph)
        assert rows(df) == [("INTEGER NOT NULL", "STRING NOT NULL",
                             "FLOAT NOT NULL", "NULL")]

    def test_lists(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN valueType([1, 2]) AS l, valueType([]) AS e",
                    chain_graph)
        assert rows(df) == [("LIST<INTEGER NOT NULL> NOT NULL",
                             "LIST<NOTHING> NOT NULL")]


class TestIsEmpty:
    def test_isempty(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN isEmpty([]) AS a, isEmpty([1]) AS b, "
                    "isEmpty('') AS c, isEmpty('x') AS d", chain_graph)
        assert rows(df) == [(True, False, True, False)]


class TestLabelExprInWhere:
    """Label expressions in predicate position (``WHERE n:A|B``) share the
    node-pattern grammar (front-end label expression semantics)."""

    def test_disjunction_where(self, spark, chain_graph):
        df = cypher(spark, "MATCH (n) WHERE n:A|C RETURN n.x AS x ORDER BY x",
                    chain_graph)
        assert rows(df) == [(1,), (3,)]

    def test_negation_where(self, spark, chain_graph):
        df = cypher(spark, "MATCH (n) WHERE n:!B RETURN n.x AS x ORDER BY x",
                    chain_graph)
        assert rows(df) == [(1,), (3,)]

    def test_wildcard_where(self, spark, chain_graph):
        df = cypher(spark, "MATCH (n) WHERE n:% RETURN count(*) AS c",
                    chain_graph)
        assert rows(df) == [(3,)]


class TestDynamicAccess:
    def test_dynamic_prop_key(self, spark, chain_graph):
        df = cypher(spark,
                    "WITH 'x' AS k MATCH (n:A) RETURN n[k] AS v", chain_graph)
        assert rows(df) == [(1,)]

    def test_isempty_map(self, spark, chain_graph):
        df = cypher(spark, "RETURN isEmpty({}) AS a, isEmpty({x: 1}) AS b",
                    chain_graph)
        assert rows(df) == [(True, False)]


class TestSkipLimitExprs:
    def test_limit_const_expr(self, spark, chain_graph):
        df = cypher(spark,
                    "MATCH (n) RETURN n.x AS x ORDER BY x LIMIT 1 + 1",
                    chain_graph)
        assert rows(df) == [(1,), (2,)]

    def test_skip_const_expr(self, spark, chain_graph):
        df = cypher(spark,
                    "MATCH (n) RETURN n.x AS x ORDER BY x SKIP 4 - 3 LIMIT 1",
                    chain_graph)
        assert rows(df) == [(2,)]


class TestQuantifiedRelShorthand:
    """GQL quantified-relationship sugar ``-[:R]->+`` desugars to a QPP
    (TrailToVarExpandRewriter's source shape)."""

    def test_plus(self, spark, chain_graph):
        df = cypher(spark,
                    "MATCH (a:A)-[:R]->+(b) RETURN b.x AS x ORDER BY x",
                    chain_graph)
        assert rows(df) == [(2,), (3,)]

    def test_star_includes_zero(self, spark, chain_graph):
        df = cypher(spark,
                    "MATCH (a:A)-[:R]->*(b) RETURN b.x AS x ORDER BY x",
                    chain_graph)
        assert rows(df) == [(1,), (2,), (3,)]

    def test_brace_range(self, spark, chain_graph):
        df = cypher(spark,
                    "MATCH (a:A)-[:R]->{2,2}(b) RETURN b.x AS x",
                    chain_graph)
        assert rows(df) == [(3,)]

    def test_path_length_through_qpp(self, spark, chain_graph):
        df = cypher(spark,
                    "MATCH p = (a:A)-[:R]->+(c:C) RETURN length(p) AS l",
                    chain_graph)
        assert rows(df) == [(2,)]

    def test_path_nodes_through_qpp(self, spark, chain_graph):
        df = cypher(spark,
                    "MATCH p = (a:A)-[:R]->+(c:C) "
                    "RETURN [n IN nodes(p) | n.x] AS xs", chain_graph)
        assert rows(df) == [([1, 2, 3],)]


class TestLabelAlgebra:
    """Full label-expression algebra (CypherParser.g4 labelExpression:
    ! > &/: > |, parens, %): complex trees keep a shard-pruning cover and
    filter exactly."""

    @pytest.fixture(scope="class")
    def multi_graph(self, spark):
        from neo4j_spark.graph import PropertyGraph

        sch = "id long, labels array<string>, name string"
        nodes = {
            "A": spark.createDataFrame(
                [(1, ["A"], "a"), (3, ["A", "C"], "ac")], sch),
            "B": spark.createDataFrame(
                [(2, ["B"], "b"), (4, ["B", "C"], "bc")], sch),
            "C": spark.createDataFrame([(6, ["C"], "c")], sch),
            "Z": spark.createDataFrame([(5, [], "none")], sch),
        }
        g = PropertyGraph(nodes, {})
        g.note_extra_label("C")
        return g

    @pytest.mark.parametrize("q,want", [
        ("MATCH (n:(A|B)&!C) RETURN n.name AS s ORDER BY s",
         [("a",), ("b",)]),
        ("MATCH (n:!(A|B)) RETURN n.name AS s ORDER BY s",
         [("c",), ("none",)]),
        ("MATCH (n:(A&C)|B) RETURN n.name AS s ORDER BY s",
         [("ac",), ("b",), ("bc",)]),
        ("MATCH (n) WHERE n:(A|B)&!C RETURN n.name AS s ORDER BY s",
         [("a",), ("b",)]),
        ("MATCH (n:(!A)&%) RETURN n.name AS s ORDER BY s",
         [("b",), ("bc",), ("c",)]),
    ])
    def test_algebra(self, spark, multi_graph, q, want):
        from neo4j_spark.api import cypher

        assert [tuple(r) for r in cypher(spark, q, multi_graph).collect()] \
            == want


class TestDynamicLabelsAndTypes:
    """$(expr) dynamic labels/types (Cypher25Parser.g4 dynamicLabelType):
    plan-time-constant expressions resolve to tokens; strings are single
    tokens, lists are conjunctions on nodes and disjunctions on rel
    patterns.  Non-constant arguments raise."""

    def test_match_dynamic_label_literal_and_param(self, spark, chain_graph):
        assert rows(cypher(spark, "MATCH (n:$('A')) RETURN count(*) AS c",
                           chain_graph)) == [(1,)]
        assert rows(cypher(spark, "MATCH (n:$($l)) RETURN count(*) AS c",
                           chain_graph, params={"l": "A"})) == [(1,)]

    def test_match_dynamic_rel_type(self, spark, chain_graph):
        n_all = rows(cypher(spark, "MATCH ()-[r]->() RETURN count(r) AS c",
                            chain_graph))[0][0]
        assert rows(cypher(spark,
                           "MATCH ()-[r:$('R')]->() RETURN count(r) AS c",
                           chain_graph))[0][0] <= n_all

    def test_create_dynamic_label_list_is_conjunction(self, spark,
                                                      chain_graph):
        g = chain_graph.copy()
        got = rows(cypher(spark,
                          "CREATE (n:$(['X', 'Y'])) RETURN labels(n) AS l",
                          g))
        assert got == [(["X", "Y"],)]

    def test_set_and_remove_dynamic_label(self, spark, chain_graph):
        g = chain_graph.copy()
        got = rows(cypher(spark,
                          "MATCH (n:A) SET n:$('Extra') "
                          "RETURN labels(n) AS l", g))
        assert got == [(["A", "Extra"],)]
        g2 = chain_graph.copy()
        got = rows(cypher(spark,
                          "MATCH (n:A) REMOVE n:$('A') "
                          "RETURN size(labels(n)) AS s", g2))
        assert got == [(0,)]

    def test_dynamic_rel_type_list_is_disjunction(self, spark, chain_graph):
        one = rows(cypher(spark,
                          "MATCH ()-[r:$('R')]->() RETURN count(r) AS c",
                          chain_graph))[0][0]
        both = rows(cypher(spark,
                           "MATCH ()-[r:$(['R', 'S'])]->() "
                           "RETURN count(r) AS c", chain_graph))[0][0]
        assert both >= one

    def test_non_constant_merge_raises(self, spark, chain_graph):
        # CREATE/SET admit row-dependent $(expr); MERGE stays strict
        # (matching on a row-dependent label is ambiguous)
        from neo4j_spark.cypher.translate import TranslateError

        with pytest.raises(TranslateError, match="plan-time constants"):
            cypher(spark, "MATCH (n:A) MERGE (m:$(n.x)) RETURN 1 AS o",
                   chain_graph.copy()).collect()

    def test_count_store_rejects_residual_tree(self, spark, chain_graph):
        # cover-with-tree patterns must take the full scan path: A&(B|%)
        # is NOT "all of A" unless the tree is actually applied
        a_and_any = rows(cypher(spark,
                                "MATCH (n:(A&(A|%))) RETURN count(*) AS c",
                                chain_graph))[0][0]
        a = rows(cypher(spark, "MATCH (n:A) RETURN count(*) AS c",
                        chain_graph))[0][0]
        assert a_and_any == a


class TestRowDependentDynamicLabels:
    """Row-dependent $(expr) labels in CREATE / SET / REMOVE: each row's
    label set is computed from its own values; rows route to the shard of
    their first label, secondary labels fall back to the extra-label scan."""

    def test_create_routes_rows_by_value(self, spark):
        from neo4j_spark.graph import PropertyGraph
        g = PropertyGraph({}, {})
        cypher(spark,
               "UNWIND [{k: 'Doc', v: 1}, {k: 'Img', v: 2}, "
               "{k: 'Doc', v: 3}] AS row "
               "CREATE (n:$(row.k) {v: row.v})", g).collect()
        assert rows(cypher(
            spark, "MATCH (d:Doc) RETURN d.v AS v ORDER BY v", g)) \
            == [(1,), (3,)]
        assert rows(cypher(
            spark, "MATCH (i:Img) RETURN count(*) AS c", g)) == [(1,)]

    def test_create_static_plus_dynamic_conjunction(self, spark):
        from neo4j_spark.graph import PropertyGraph
        g = PropertyGraph({}, {})
        cypher(spark,
               "UNWIND ['X', 'Y'] AS l CREATE (n:Base&$(l))", g).collect()
        assert rows(cypher(
            spark, "MATCH (b:Base) RETURN count(*) AS c", g)) == [(2,)]
        assert rows(cypher(
            spark, "MATCH (y:Y) RETURN count(*) AS c", g)) == [(1,)]

    def test_set_label_from_property(self, spark):
        from neo4j_spark.graph import PropertyGraph
        g = PropertyGraph({}, {})
        cypher(spark,
               "CREATE (:T {tag: 'Hot'}), (:T {tag: 'Cold'})", g).collect()
        cypher(spark, "MATCH (t:T) SET t:$(t.tag)", g).collect()
        assert rows(cypher(
            spark, "MATCH (h:Hot) RETURN h.tag AS t", g)) == [("Hot",)]
        assert rows(cypher(
            spark, "MATCH (c:Cold) RETURN count(*) AS c", g)) == [(1,)]

    def test_remove_label_from_property(self, spark):
        from neo4j_spark.graph import PropertyGraph
        g = PropertyGraph({}, {})
        cypher(spark, "CREATE (:U:Extra {tag: 'Extra'})", g).collect()
        got = rows(cypher(
            spark, "MATCH (u:U) REMOVE u:$(u.tag) RETURN labels(u) AS l",
            g))
        assert got == [(["U"],)]

    def test_match_stays_strict(self, spark, chain_graph):
        from neo4j_spark.cypher.translate import TranslateError

        with pytest.raises(TranslateError, match="plan-time constants"):
            cypher(spark, "MATCH (n:A) MATCH (m:$(n.x)) RETURN count(*) "
                   "AS c", chain_graph).collect()
