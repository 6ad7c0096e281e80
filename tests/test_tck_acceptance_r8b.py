"""TCK-style acceptance tranche 8b — behavior-ported from the reference's
acceptance corpus (spec-suite-tools acceptance/features/) with fresh
wording: IsEmptyFunctionAcceptance, NullIfFunctionAcceptance,
ValueTypeFunctionAcceptance, UnionDistinct.

Semantics under test:
- isEmpty: string/list/map only, null-in-null-out, type errors on
  graph entities (CypherFunctions.isEmpty);
- nullIf: CYPHER equality (ternary, cross-type) — Spark's same-type
  nullif would reject a runtime-tagged operand;
- valueType: GQL type descriptions (CypherType.description) with exact
  list element unions normalized per CypherTypeOrder.scala:22 —
  LIST<NOTHING> absorbed by sibling LIST types, a NULL member making
  the union nullable;
- UNION DISTINCT keyword and column-name agreement (Query.scala:760).
"""

import pytest

# conformance tranche: excluded from the default (core) run so the
# driver's verify window can finish; run with `pytest -m acceptance`
pytestmark = pytest.mark.acceptance


from neo4j_spark.api import cypher
from neo4j_spark.graph import PropertyGraph


@pytest.fixture()
def g(spark):
    return PropertyGraph({}, {})


def run(spark, g, q, **params):
    return cypher(spark, q, g, params=params or None)


def rows(df):
    return [tuple(r) for r in df.collect()]


class TestIsEmpty:
    def test_null_in_null_out(self, spark, g):
        assert rows(run(spark, g, "RETURN isEmpty(null) AS r")) == [(None,)]

    def test_lists(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN isEmpty([]) AS a, isEmpty([1, 2, 3]) AS b, "
                        "isEmpty([null]) AS c")) == [(True, False, False)]

    def test_maps(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN isEmpty({}) AS a, isEmpty({k: 1}) AS b, "
                        "isEmpty({k: null}) AS c")) == [(True, False, False)]

    def test_strings(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN isEmpty('') AS a, isEmpty('hello') AS b")) \
            == [(True, False)]

    @pytest.mark.parametrize("setup,q", [
        ("CREATE ()-[:REL]->()",
         "MATCH p = (a)--(b) RETURN isEmpty(p) AS r"),
        ("CREATE ()", "MATCH (a) RETURN isEmpty(a) AS r"),
        ("CREATE ()-[:REL]->()",
         "MATCH ()-[r]->() RETURN isEmpty(r) AS x"),
    ])
    def test_graph_entities_rejected(self, spark, g, setup, q):
        run(spark, g, setup).collect()
        with pytest.raises(Exception, match="isEmpty"):
            run(spark, g, q).collect()

    def test_property_and_dynamic_value(self, spark, g):
        run(spark, g, "CREATE (:L {prop: [1, 2, 3]})").collect()
        assert rows(run(spark, g,
                        "MATCH (n:L) RETURN isEmpty(n.prop) AS r")) \
            == [(False,)]
        assert rows(run(spark, g,
                        "WITH [1, [1,2,3]] AS xs WITH xs[1] AS v "
                        "RETURN isEmpty(v) AS r")) == [(False,)]


class TestNullIf:
    def test_matching_values_yield_null(self, spark, g):
        got = rows(run(spark, g, """
            UNWIND [[1, 1.0], ['abc', 'abc'], [false, false], [[1], [1]]]
                   AS m
            RETURN nullIf(m[0], m[1]) IS NULL AS r
        """))
        assert got == [(True,)] * 4

    def test_matching_maps_dates_points(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN nullIf({map: 1}, {map: 1}) IS NULL AS a, "
                        "nullIf(date('2020-01-02'), date('2020-01-02')) "
                        "IS NULL AS b, "
                        "nullIf(point({x: 3, y: 0}), point({x: 3, y: 0})) "
                        "IS NULL AS c")) == [(True, True, True)]

    def test_non_matching_tagged_values_return_first(self, spark, g):
        # the list is heterogeneous, so each element reaches nullIf as a
        # runtime-tagged value — cross-type equality must be CYPHER
        # equality, not a Spark type error
        got = rows(run(spark, g, """
            UNWIND [2, 1.0, 'abc', false, [1]] AS v
            RETURN nullIf(13, v) AS r
        """))
        assert got == [(13,)] * 5

    def test_nested_with_valuetype(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN nullIf('STRING NOT NULL', "
                        "valueType('string')) AS r")) == [(None,)]

    def test_null_params(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN nullIf(1, null) AS a, "
                        "nullIf(null, 'hello') IS NULL AS b, "
                        "nullIf(null, null) IS NULL AS c")) \
            == [(1, True, True)]

    def test_as_filter(self, spark, g):
        run(spark, g,
            "CREATE ({prop: 'Hello'}), ({prop: 'World'})").collect()
        assert rows(run(spark, g,
                        "MATCH (n) WHERE nullIf('Hello', n.prop) IS NULL "
                        "RETURN n.prop AS p")) == [("Hello",)]


class TestValueType:
    def test_simple_literals(self, spark, g):
        got = sorted(rows(run(spark, g, """
            UNWIND ['abc', true, 1, 2.0, {a: 1}] AS v
            RETURN valueType(v) AS t
        """)))
        assert got == [("BOOLEAN NOT NULL",), ("FLOAT NOT NULL",),
                       ("INTEGER NOT NULL",), ("MAP NOT NULL",),
                       ("STRING NOT NULL",)]

    def test_graph_types_including_path(self, spark, g):
        run(spark, g, "CREATE ()-[:R]->()").collect()
        assert rows(run(spark, g,
                        "MATCH p = (a)-[r]->(b) RETURN valueType(p) AS pt, "
                        "valueType(a) AS at, valueType(r) AS rt")) \
            == [("PATH NOT NULL", "NODE NOT NULL",
                 "RELATIONSHIP NOT NULL")]

    def test_list_element_unions(self, spark, g):
        # exact element types, normalized per CypherTypeOrder; the
        # reference's [2.0, 2] member is omitted — this engine widens
        # flat int/float mixes to FLOAT (documented divergence,
        # exprs._c_ListLit)
        got = sorted(rows(run(spark, g, """
            UNWIND [[1], ['3', true], [], [[1, 2]], [null], [1, null]] AS v
            RETURN valueType(v) AS t
        """)))
        assert got == [
            ("LIST<BOOLEAN NOT NULL | STRING NOT NULL> NOT NULL",),
            ("LIST<INTEGER NOT NULL> NOT NULL",),
            ("LIST<INTEGER> NOT NULL",),
            ("LIST<LIST<INTEGER NOT NULL> NOT NULL> NOT NULL",),
            ("LIST<NOTHING> NOT NULL",),
            ("LIST<NULL> NOT NULL",),
        ]

    def test_nested_union_with_nothing_absorption(self, spark, g):
        # LIST<NOTHING> (the []) is absorbed by the sibling LIST member
        [(t,)] = rows(run(spark, g,
                          "WITH [1, [], [2, [null]]] AS v "
                          "RETURN valueType(v) AS t"))
        assert t == ("LIST<INTEGER NOT NULL | LIST<INTEGER NOT NULL | "
                     "LIST<NULL> NOT NULL> NOT NULL> NOT NULL")

    def test_special_values(self, spark, g):
        got = sorted(rows(run(spark, g, """
            UNWIND [null, [], 0/0.0, -1/0.0, 1/0.0] AS v
            RETURN valueType(v) AS t
        """)))
        assert got == [("FLOAT NOT NULL",)] * 3 \
            + [("LIST<NOTHING> NOT NULL",), ("NULL",)]

    def test_subquery_expression_outputs(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN valueType(EXISTS { RETURN 1 }) AS a, "
                        "valueType(COLLECT { RETURN 1 }) AS b, "
                        "valueType(COUNT { RETURN 1 }) AS c")) \
            == [("BOOLEAN NOT NULL",
                 "LIST<INTEGER NOT NULL> NOT NULL",
                 "INTEGER NOT NULL")]

    def test_in_write_positions(self, spark, g):
        assert rows(run(spark, g,
                        "CREATE (n {prop: valueType({map: 1})}) "
                        "RETURN n.prop AS p")) == [("MAP NOT NULL",)]
        g2 = PropertyGraph({}, {})
        run(spark, g2, "CREATE (:A)").collect()
        assert rows(run(spark, g2,
                        "MATCH (n:A) "
                        "SET n.prop1 = valueType(point({x: 3, y: 0})) "
                        "RETURN n.prop1 AS p")) == [("POINT NOT NULL",)]


class TestUnionDistinct:
    @pytest.mark.parametrize("kw", ["UNION DISTINCT", "UNION"])
    def test_two_unique(self, spark, g, kw):
        assert sorted(rows(run(spark, g,
                               f"RETURN 1 AS x {kw} RETURN 2 AS x"))) \
            == [(1,), (2,)]

    @pytest.mark.parametrize("kw1,kw2", [
        ("UNION DISTINCT", "UNION DISTINCT"), ("UNION DISTINCT", "UNION"),
        ("UNION", "UNION DISTINCT"), ("UNION", "UNION")])
    def test_three_way_dedup(self, spark, g, kw1, kw2):
        assert sorted(rows(run(spark, g,
                               f"RETURN 2 AS x {kw1} RETURN 1 AS x {kw2} "
                               "RETURN 2 AS x"))) == [(1,), (2,)]

    def test_duplicates_within_one_branch(self, spark, g):
        assert sorted(rows(run(spark, g, """
            UNWIND [2, 1, 2, 3] AS x RETURN x
            UNION DISTINCT
            UNWIND [3, 4] AS x RETURN x
        """))) == [(1,), (2,), (3,), (4,)]

    def test_node_outputs(self, spark, g):
        run(spark, g, "CREATE (:A), (:B)").collect()
        got = sorted(rows(run(spark, g, """
            MATCH (a:A) RETURN labels(a)[0] AS l
            UNION DISTINCT
            MATCH (b:B) RETURN labels(b)[0] AS l
        """)))
        assert got == [("A",), ("B",)]

    @pytest.mark.parametrize("kw", ["UNION DISTINCT", "UNION"])
    def test_different_columns_rejected(self, spark, g, kw):
        with pytest.raises(Exception, match="same return column"):
            run(spark, g, f"RETURN 1 AS a {kw} RETURN 2 AS b").collect()

    @pytest.mark.parametrize("kw1,kw2", [
        ("UNION ALL", "UNION DISTINCT"), ("UNION ALL", "UNION"),
        ("UNION DISTINCT", "UNION ALL"), ("UNION", "UNION ALL")])
    def test_mixing_all_and_distinct_rejected(self, spark, g, kw1, kw2):
        with pytest.raises(Exception, match="(?i)mix"):
            run(spark, g,
                f"RETURN 1 AS a {kw1} RETURN 2 AS a {kw2} "
                "RETURN 3 AS a").collect()


class TestNodePatternPredicates:
    """NodePatternPredicatesAcceptance.feature: the pattern-internal
    WHERE may reference any element of the pattern (earlier, later,
    self) and OUTER projected variables — also inside pattern
    comprehensions, incl. in UNWIND position."""

    A3 = ("CREATE (:A {prop: 1})-[:R]->(:B), (:A {prop: 2})-[:R]->(:B), "
          "(:A {prop: 3})-[:R]->(:B)")

    def test_predicate_with_outer_variable(self, spark, g):
        run(spark, g, self.A3).collect()
        assert sorted(rows(run(spark, g,
                               "WITH 1 AS x "
                               "MATCH (a:A WHERE a.prop > x)-[r]-(b:B) "
                               "RETURN a.prop AS p"))) == [(2,), (3,)]

    def test_predicates_on_multiple_nodes(self, spark, g):
        run(spark, g,
            "CREATE (a:A {prop: 1}), (a)-[:R]->(:B {prop: 100}), "
            "(a)-[:R]->(:B {prop: 200}), "
            "(:A {prop: 2})-[:R]->(:B {prop: 300}), "
            "(:A {prop: 3})-[:R]->(:B {prop: 400})").collect()
        assert sorted(rows(run(spark, g,
                               "MATCH (a:A WHERE a.prop < 3)"
                               "-[r]-(b:B WHERE b.prop > 100) "
                               "RETURN a.prop AS ap, b.prop AS bp"))) \
            == [(1, 200), (2, 300)]

    def test_shortest_path_with_end_node_predicate(self, spark, g):
        run(spark, g,
            "CREATE (start:Start), "
            "(start)-[:R]->()-[:R]->(:End {prop: 1}), "
            "(start)-[:R]->()-[:R]->()-[:R]->(:End {prop: 2}), "
            "(start)-[:R]->()-[:R]->()-[:R]->()-[:R]->(:End {prop: 2}), "
            "(start)-[:R]->()-[:R]->()-[:R]->()-[:R]->(:End {prop: 3})"
            ).collect()
        got = sorted(rows(run(spark, g,
                              "MATCH p = shortestPath((s:Start)-[:R*]->"
                              "(end:End WHERE end.prop > 1)) "
                              "RETURN end.prop AS ep, length(p) AS len")))
        assert got == [(2, 3), (2, 4), (3, 4)]

    def test_reference_to_later_and_earlier_elements(self, spark, g):
        run(spark, g,
            "CREATE (a), (a)-[:R]->({prop: 100}), "
            "(a)-[:R]->({prop: 200})").collect()
        assert rows(run(spark, g,
                        "MATCH (a WHERE b.prop > 100)-[r]-(b) "
                        "RETURN b.prop AS p")) == [(200,)]
        g2 = PropertyGraph({}, {})
        run(spark, g2,
            "CREATE ({prop: 100})-[:R]->(b), "
            "({prop: 200})-[:R]->(b)").collect()
        assert rows(run(spark, g2,
                        "MATCH (a)-[r]-(b WHERE a.prop > 100) "
                        "RETURN a.prop AS p")) == [(200,)]

    def test_reference_to_self_and_other(self, spark, g):
        run(spark, g,
            "CREATE ({prop: 100})-[:R]->({prop: 100}), "
            "({prop: 200})-[:R]->({prop: 250})").collect()
        assert rows(run(spark, g,
                        "MATCH (a)-[r]-(b WHERE b.prop > a.prop) "
                        "RETURN b.prop AS p")) == [(250,)]

    def test_comprehension_with_outer_variable(self, spark, g):
        run(spark, g, self.A3).collect()
        [(got,)] = rows(run(spark, g,
                            "WITH 1 AS x "
                            "RETURN [(a:A WHERE a.prop > x)-[r]-(b:B) "
                            "| a.prop] AS result"))
        assert sorted(got) == [2, 3]

    def test_comprehension_in_unwind_position(self, spark, g):
        run(spark, g,
            "CREATE (a:A {prop: 1}), (a)-[:R]->(:B {prop: 100}), "
            "(a)-[:R]->(:B {prop: 200}), "
            "(:A {prop: 2})-[:R]->(:B {prop: 300}), "
            "(:A {prop: 3})-[:R]->(:B {prop: 400})").collect()
        got = sorted(rows(run(spark, g,
                              "UNWIND [(a:A WHERE a.prop < 3)-[r]->"
                              "(b:B WHERE b.prop > 100) "
                              "| [a.prop, b.prop]] AS result "
                              "RETURN result")))
        assert got == [([1, 200],), ([2, 300],)]

    def test_comprehension_cross_references(self, spark, g):
        run(spark, g,
            "CREATE (:A {prop: 1})-[:R]->(:B {prop: 100}), "
            "(:A {prop: 2})-[:R]->(:B {prop: 200})").collect()
        assert rows(run(spark, g,
                        "RETURN [(a:A WHERE b.prop > 100)-[r]-(b:B) "
                        "| [a.prop, b.prop]] AS result")) \
            == [([[2, 200]],)]

    def test_where_true_and_props_plus_where(self, spark, g):
        run(spark, g, "CREATE ({prop: 1})").collect()
        assert rows(run(spark, g,
                        "MATCH (n WHERE true) RETURN n.prop AS p")) \
            == [(1,)]
        g2 = PropertyGraph({}, {})
        run(spark, g2,
            "CREATE ({p: 1, q: 100}), ({p: 2, q: 200}), "
            "({p: 1, q: 300})").collect()
        assert rows(run(spark, g2,
                        "MATCH (n {p: 1} WHERE n.q > 100) "
                        "RETURN n.q AS q")) == [(300,)]


class TestRelationshipPatternPredicates:
    """RelationshipPatternPredicatesAcceptance.feature — the rel-pattern
    WHERE mirrors the node-pattern rules."""

    def test_predicate_with_outer_variable(self, spark, g):
        run(spark, g,
            "CREATE (:A)-[:R {prop: 1}]->(:B), (:A)-[:R {prop: 2}]->(:B), "
            "(:A)-[:R {prop: 3}]->(:B)").collect()
        assert sorted(rows(run(spark, g,
                               "WITH 1 AS x "
                               "MATCH (:A)-[r:R WHERE r.prop > x]-(b:B) "
                               "RETURN r.prop AS p"))) == [(2,), (3,)]

    def test_cross_element_references(self, spark, g):
        run(spark, g,
            "CREATE (:A {prop: 100})-[:R {prop: 1}]->(:B), "
            "(:A {prop: 200})-[:R {prop: 2}]->(:B)").collect()
        assert rows(run(spark, g,
                        "MATCH (a:A)-[r:R WHERE a.prop > 100]-() "
                        "RETURN r.prop AS p")) == [(2,)]
        g2 = PropertyGraph({}, {})
        run(spark, g2,
            "CREATE (:A)-[:R {prop: 1}]->(:B {prop: 100}), "
            "(:A)-[:R {prop: 2}]->(:B {prop: 200})").collect()
        assert rows(run(spark, g2,
                        "MATCH ()-[r:R WHERE b.prop > 100]-(b:B) "
                        "RETURN r.prop AS p")) == [(2,)]

    def test_self_vs_endpoint_reference(self, spark, g):
        run(spark, g,
            "CREATE (:A)-[:R {prop: 1}]->(:B {prop: 100}), "
            "(:A)-[:R {prop: 2}]->(:B {prop: 1})").collect()
        assert rows(run(spark, g,
                        "MATCH ()-[r:R WHERE r.prop > b.prop]-(b:B) "
                        "RETURN r.prop AS p")) == [(2,)]

    def test_comprehension_with_rel_predicate(self, spark, g):
        run(spark, g,
            "CREATE (:A)-[:R {prop: 1}]->(:B), (:A)-[:R {prop: 2}]->(:B), "
            "(:A)-[:R {prop: 3}]->(:B)").collect()
        [(got,)] = rows(run(spark, g,
                            "WITH 1 AS x "
                            "RETURN [(a:A)-[r:R WHERE r.prop > x]-(b:B) "
                            "| r.prop] AS result"))
        assert sorted(got) == [2, 3]

    def test_comprehension_cross_references(self, spark, g):
        run(spark, g,
            "CREATE (:A)-[:R {prop: 100}]->(:B {prop: 1}), "
            "(:A)-[:R {prop: 200}]->(:B {prop: 2})").collect()
        assert rows(run(spark, g,
                        "RETURN [(:A)-[r WHERE b.prop > 1]-(b:B) "
                        "| [b.prop, r.prop]] AS result")) \
            == [([[2, 200]],)]

    def test_projected_variable_and_true(self, spark, g):
        run(spark, g, "CREATE ()-[:R {prop: 1}]->()").collect()
        assert rows(run(spark, g,
                        "WITH true AS x MATCH ()-[r WHERE x]->() "
                        "RETURN r.prop AS p")) == [(1,)]
        assert rows(run(spark, g,
                        "MATCH ()-[r WHERE true]->() "
                        "RETURN r.prop AS p")) == [(1,)]

    def test_props_plus_where(self, spark, g):
        run(spark, g,
            "CREATE ()-[:R {p: 1, q: 100}]->(), ()-[:R {p: 2, q: 200}]->(), "
            "()-[:R {p: 1, q: 300}]->()").collect()
        assert rows(run(spark, g,
                        "MATCH ()-[r:R {p: 1} WHERE r.q > 100]->() "
                        "RETURN r.q AS q")) == [(300,)]


class TestInsertAcceptance:
    """InsertAcceptance.feature: INSERT is the GQL CREATE synonym, but
    with stricter variable rules — a standalone node pattern cannot
    re-use a bound variable ([21]), nor can any relationship variable
    ([23]); bound endpoints in a relationship insert are fine ([12])."""

    def test_insert_nodes_labels_properties(self, spark, g):
        assert rows(run(spark, g, "INSERT (n:A:B) RETURN labels(n) AS l")) \
            == [(["A", "B"],)]
        g2 = PropertyGraph({}, {})
        assert rows(run(spark, g2,
                        "INSERT (n {id: 12, name: 'foo'}) "
                        "RETURN n.id AS id, n.name AS name")) \
            == [(12, "foo")]

    def test_insert_null_property_not_stored(self, spark, g):
        assert rows(run(spark, g,
                        "INSERT (n {id: null}) RETURN n.id IS NULL AS x")) \
            == [(True,)]

    def test_insert_relationship_between_existing(self, spark, g):
        run(spark, g, "INSERT (:X) INSERT (:Y)").collect()
        run(spark, g, "MATCH (x:X), (y:Y) INSERT (x)-[:R]->(y)").collect()
        assert rows(run(spark, g,
                        "MATCH (:X)-[:R]->(:Y) RETURN count(*) AS c")) \
            == [(1,)]

    def test_insert_self_loop_and_multi_hop(self, spark, g):
        run(spark, g, "INSERT (root)-[:LINK]->(root)").collect()
        assert rows(run(spark, g,
                        "MATCH (n)-[:LINK]->(n) RETURN count(*) AS c")) \
            == [(1,)]
        g2 = PropertyGraph({}, {})
        run(spark, g2, "INSERT (:A)<-[:R1]-(:B)-[:R2]->(:C)").collect()
        assert rows(run(spark, g2,
                        "MATCH (a:A)<-[:R1]-(b:B)-[:R2]->(c:C) "
                        "RETURN count(*) AS c")) == [(1,)]

    def test_with_unwind_insert_bound_node(self, spark, g):
        run(spark, g, """
            INSERT (a)
            WITH a
            UNWIND [0] AS i
            INSERT (b)
            INSERT (a)<-[:T]-(b)
        """).collect()
        assert rows(run(spark, g,
                        "MATCH ()-[r:T]->() RETURN count(*) AS c")) == [(1,)]

    def test_merge_followed_by_inserts(self, spark, g):
        run(spark, g,
            "MERGE (t:T {id: 42}) INSERT (f:R) "
            "INSERT (t)-[:REL]->(f)").collect()
        assert rows(run(spark, g,
                        "MATCH (:T)-[:REL]->(:R) RETURN count(*) AS c")) \
            == [(1,)]

    def test_undirected_or_bidirected_rejected(self, spark, g):
        with pytest.raises(Exception):
            run(spark, g, "INSERT (a)-[:FOO]-(b)").collect()
        with pytest.raises(Exception):
            run(spark, g, "INSERT (a)<-[:FOO]->(b)").collect()

    def test_standalone_bound_node_rejected(self, spark, g):
        run(spark, g, "INSERT ()").collect()
        with pytest.raises(Exception, match="already"):
            run(spark, g, "MATCH (a) INSERT (a)").collect()
        with pytest.raises(Exception, match="already"):
            run(spark, g, "MATCH (a) MERGE (a)").collect()
        with pytest.raises(Exception, match="already"):
            run(spark, g, "CREATE (n), (n) RETURN 1 AS one").collect()

    def test_label_on_bound_node_rejected(self, spark, g):
        with pytest.raises(Exception, match="already"):
            run(spark, g,
                "INSERT (n:Foo)-[:T1]->(), (n:Bar)-[:T2]->()").collect()

    def test_bound_relationship_var_rejected(self, spark, g):
        with pytest.raises(Exception, match="already"):
            run(spark, g,
                "INSERT ()-[r:R]->() INSERT ()-[r:R]->()").collect()
        g2 = PropertyGraph({}, {})
        run(spark, g2, "CREATE ()-[:R]->()").collect()
        with pytest.raises(Exception, match="already"):
            run(spark, g2, "MATCH ()-[r]->() INSERT ()-[r:R]->()").collect()

    def test_undefined_variable_in_props_rejected(self, spark, g):
        with pytest.raises(Exception, match="not defined"):
            run(spark, g,
                "INSERT (b {name: missing}) RETURN b.name AS n").collect()

    def test_bound_endpoint_reuse_still_legal(self, spark, g):
        run(spark, g, "CREATE (n), (n)-[:R]->(m)").collect()
        assert rows(run(spark, g,
                        "MATCH ()-[r:R]->() RETURN count(*) AS c")) == [(1,)]


class TestProcedureCallComposition:
    """ProcedureAcceptance / BuiltInProcedureAcceptance: standalone CALL
    names results implicitly; an in-query CALL of a result-producing
    procedure requires YIELD; a VOID procedure mid-query runs for its
    side effects and passes the rowstream through."""

    def test_standalone_call_without_parens(self, spark, g):
        run(spark, g, "CREATE (:A) CREATE (:B) CREATE (:C)").collect()
        assert sorted(rows(run(spark, g, "CALL db.labels"))) \
            == [("A",), ("B",), ("C",)]

    def test_in_query_call_requires_yield(self, spark, g):
        run(spark, g, "CREATE (:Node) CREATE (:Node)").collect()
        with pytest.raises(Exception, match="YIELD"):
            run(spark, g, "MATCH (n:Node) CALL db.labels()").collect()

    def test_in_query_call_with_yield(self, spark, g):
        run(spark, g, "CREATE (:Node)").collect()
        assert rows(run(spark, g,
                        "MATCH (n:Node) CALL db.labels() YIELD label "
                        "RETURN label")) == [("Node",)]

    def test_void_call_mid_query_passes_rows_through(self, spark, g):
        run(spark, g, "CREATE (:Node) CREATE (:Node)").collect()
        got = rows(run(spark, g,
                       "MATCH (n:Node) CALL db.createLabel('Zed') "
                       "RETURN n IS NOT NULL AS x"))
        assert got == [(True,), (True,)]
        assert "Zed" in g.labels()
