"""TCK-style acceptance tranche 8: graph-pattern composition —
behavior-ported from the reference's acceptance corpus
(community/cypher/spec-suite-tools/src/test/resources/acceptance/features/
GraphPatternAcceptance.feature) with fresh wording.

Semantics under test:
- variable-rebinding rules (SemanticState.scala:358): a path variable
  can never rebind; a QPP group variable can appear in exactly one
  quantified sub-path pattern and nowhere else;
- relationship uniqueness counts OCCURRENCES
  (AddUniquenessPredicates.scala:66): re-using a rel variable within one
  MATCH makes the match empty, re-using a NODE variable is a plain
  implicit join (node homomorphism vs rel isomorphism);
- conjunction of path patterns in one graph pattern: implicit joins on
  shared singletons, Cartesian product without them, lateral joins
  across clauses.
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


def raises(spark, g, q, match=None):
    with pytest.raises(Exception, match=match) if match else \
            pytest.raises(Exception):
        run(spark, g, q).collect()


class TestVariableRebinding:
    def test_path_var_bound_twice_in_one_match(self, spark, g):
        raises(spark, g,
               "MATCH p = (a)-[b]->(c), p = (f)-[e]->(g) RETURN *",
               match="already declared")

    def test_path_var_bound_twice_across_matches(self, spark, g):
        raises(spark, g,
               "MATCH p = (a)-[b]->(c) MATCH p = (f)-[e]->(g) RETURN *",
               match="already declared")

    def test_subpath_var_repeated_in_pattern(self, spark, g):
        raises(spark, g,
               "MATCH (p = ()-[:R]->())+ (p = ()-[:S]->())+ RETURN p")

    def test_subpath_var_in_two_path_patterns(self, spark, g):
        raises(spark, g,
               "MATCH (a)(sp = ()-[h]->())+(j), (b)(sp = (x)-[y]->(z))* "
               "RETURN *")

    def test_subpath_var_twice_within_one_path_pattern(self, spark, g):
        raises(spark, g,
               "MATCH (sp = ()-[h]->())+(j)(sp = (q)-->())+, (x)-[y]->(z) "
               "RETURN *")

    def test_group_var_reused_as_singleton(self, spark, g):
        raises(spark, g,
               "MATCH ((a)-[b]->(c))*(d), (f)-[e]->(a) RETURN *",
               match="group variable|already declared")

    def test_group_var_in_two_qpps(self, spark, g):
        raises(spark, g,
               "MATCH ((a)-[b]->(c))*(d), (h)-[e]->() ((a)-[f]->(g)){2,} "
               "RETURN *",
               match="multiple quantified|already declared")

    def test_group_var_in_qpp_and_quantified_rel(self, spark, g):
        raises(spark, g,
               "MATCH ((a)-[b]->(c))*(d), (g)-[b]->+(f) RETURN *",
               match="multiple quantified|already declared")

    def test_group_var_in_qpp_and_var_length_rel(self, spark, g):
        raises(spark, g,
               "MATCH ((a)-[b]->(c))*(d), (g)-[b*]->(f) RETURN *")

    def test_group_var_joined_outside_qpp(self, spark, g):
        raises(spark, g,
               "MATCH ((a)-[r]->(b))+, (b)-[c]->(d) RETURN *",
               match="group variable|already declared")

    def test_min_one_node_per_top_level_path_pattern(self, spark, g):
        raises(spark, g,
               "MATCH ((f)-[i]->(g))+, ((k)-[m]->(n))* RETURN *")


class TestPatternConjunction:
    def test_t_pattern_implicit_join(self, spark, g):
        run(spark, g,
            "CREATE (:A)-[:R]->(b:B)-[:S]->(:C), "
            "(:D)-[:T]->(b)-[:U]->(:E)").collect()
        got = rows(run(spark, g, """
            MATCH (n0)-->(n1)-->(n2), (n1)-->(n3)
            RETURN labels(n0)[0] AS l0, labels(n1)[0] AS l1,
                   labels(n2)[0] AS l2, labels(n3)[0] AS l3
            ORDER BY l0, l2
        """))
        assert got == [("A", "B", "C", "E"), ("A", "B", "E", "C"),
                       ("D", "B", "C", "E"), ("D", "B", "E", "C")]

    def test_conjunction_without_join_is_cartesian(self, spark, g):
        run(spark, g,
            "CREATE (:A)-[:R]->(b:B)-[:S]->(:C), "
            "(:D)-[:T]->(b)-[:U]->(:E)").collect()
        got = rows(run(spark, g, """
            MATCH (n0)-->(n1:B), (n2:B)-->(n3)
            RETURN labels(n0)[0] AS l0, labels(n3)[0] AS l3
            ORDER BY l0, l3
        """))
        assert got == [("A", "C"), ("A", "E"), ("D", "C"), ("D", "E")]

    def test_singleton_node_var_implicit_join(self, spark, g):
        run(spark, g,
            "CREATE (:A)-[:R]->(:B)-[:S]->(:C)-[:T]->(d:D), "
            "(:E)-[:U]->(:F)<-[:V]-(d)").collect()
        got = rows(run(spark, g, """
            MATCH (a)-[q]-(b)-[f]-(c)-->(n), (x)-[r]->(z)<-[]-(n)
            RETURN labels(a)[0] AS la, labels(c)[0] AS lc,
                   labels(n)[0] AS ln, labels(x)[0] AS lx,
                   labels(z)[0] AS lz
        """))
        assert got == [("A", "C", "D", "E", "F")]

    def test_node_var_repeated_inside_qpp(self, spark, g):
        # within a QPP unit, a node var may appear twice (cycle check)
        run(spark, g,
            "CREATE (a:A)-[:R]->(:B)-[:R]->(:C)-[:R]->(d:D), "
            "(a)-[:R]->(d)").collect()
        got = rows(run(spark, g, """
            MATCH ((a)-[q]->(b)-[c]->(d)-[r]->(f)<--(a))+
            RETURN size(a) AS reps, labels(a[0])[0] AS la,
                   labels(f[0])[0] AS lf
        """))
        assert got == [(1, "A", "D")]

    def test_lateral_joins_across_clauses(self, spark, g):
        run(spark, g, "CREATE (a:A)-[:R]->(:B), (a)-[:S]->(:C)").collect()
        got = rows(run(spark, g, """
            MATCH (a)-[r]->(b), (c)-[s]->(d)
            MATCH (a)-[t]->(e), (c)-[u]->(f)
            RETURN labels(b)[0] AS lb, labels(d)[0] AS ld,
                   labels(e)[0] AS le, labels(f)[0] AS lf
            ORDER BY lb, le
        """))
        # r!=s and t!=u (per-MATCH rel uniqueness); cross-MATCH reuse OK
        assert got == [("B", "C", "B", "C"), ("B", "C", "C", "B"),
                       ("C", "B", "B", "C"), ("C", "B", "C", "B")]


class TestRelOccurrenceUniqueness:
    def test_rel_var_reused_within_match_is_empty(self, spark, g):
        # rel isomorphism counts occurrences: binding r in two positions
        # of ONE graph pattern can never satisfy uniqueness -> no rows
        run(spark, g,
            "CREATE (a:A)-[:R]->(b:B)-[:S]->(:C)-[:T]->(d:D), "
            "(d)-[:U]->(b)").collect()
        got = rows(run(spark, g, """
            MATCH (a)-[r]-(b)-[f]-(c)-->(n), (x)-[r]->(z)<-[]-(n)
            RETURN a
        """))
        assert got == []

    def test_rel_var_reused_inside_qpp_unit_is_empty(self, spark, g):
        run(spark, g, "CREATE (a:A)-[:R]->(b:B), (b)-[:C]->(a)").collect()
        got = rows(run(spark, g, """
            MATCH ((a)-[r]->(b)-[c]->(d)-[r]->(f)<--(a))+
            RETURN a
        """))
        assert got == []

    def test_rel_var_reuse_across_matches_is_a_join(self, spark, g):
        # uniqueness is per MATCH: re-binding r in a LATER clause is the
        # ordinary ProjectEndpoints implicit join
        run(spark, g, "CREATE (:A)-[:R {k: 7}]->(:B)").collect()
        got = rows(run(spark, g, """
            MATCH (a)-[r]->(b)
            MATCH (x)-[r]->(z)
            RETURN labels(x)[0] AS lx, r.k AS k, labels(z)[0] AS lz
        """))
        assert got == [("A", 7, "B")]

    def test_rel_var_reuse_across_matches_still_unique_locally(self,
                                                               spark, g):
        # in the second MATCH the re-used r must still differ from the
        # OTHER rels of that clause
        run(spark, g, "CREATE (:A)-[:R]->(b:B), (:C)-[:S]->(b)").collect()
        got = rows(run(spark, g, """
            MATCH (a:A)-[r]->(b)
            MATCH (x)-[r]->(z)<-[s]-(w)
            RETURN labels(w)[0] AS lw
        """))
        assert got == [("C",)]

    def test_same_rel_var_twice_in_one_path_pattern_is_empty(self,
                                                             spark, g):
        run(spark, g, "CREATE (a:A)-[:R]->(:B), (a)<-[:R2]-(:B)").collect()
        got = rows(run(spark, g,
                       "MATCH (a)-[r]->(b)<-[r]-(c) RETURN a"))
        assert got == []


class TestReturnAcceptance:
    """Behavior-ported from ReturnAcceptance.feature (spec-suite-tools
    acceptance corpus): LIMIT never suppresses side effects, null-safe
    container access, boolean coercion of lists, numeric promotion,
    range() direction, unaliased UNION items, UNION column order."""

    def test_limit_zero_keeps_side_effects(self, spark, g):
        got = rows(run(spark, g, "CREATE (n:N) RETURN n LIMIT 0"))
        assert got == []
        assert g.node_frames["N"].count() == 1

    def test_limit_in_projection_keeps_side_effects(self, spark, g):
        got = rows(run(spark, g,
                       "UNWIND range(1, 10) AS i CREATE (n:N) "
                       "RETURN i LIMIT 3"))
        assert sorted(got) == [(1,), (2,), (3,)]
        assert g.node_frames["N"].count() == 10

    @pytest.mark.parametrize("expr", [
        "[1, 2, 3][null]", "[1, 2, 3][null..5]", "[1, 2, 3][1..null]",
        "{key: 1337}[null]",
    ])
    def test_null_container_access(self, spark, g, expr):
        assert rows(run(spark, g, f"RETURN {expr} AS r")) == [(None,)]

    def test_nested_list_with_null(self, spark, g):
        [(r,)] = rows(run(spark, g, "RETURN [[1], [null], null] AS r"))
        assert r == [[1], [None], None]

    def test_map_with_null_value(self, spark, g):
        [(r,)] = rows(run(spark, g, "RETURN {foo: null} AS r"))
        assert r.asDict() == {"foo": None}

    def test_deep_null_map_round_trip(self, spark, g):
        [(r,)] = rows(run(spark, g,
                          "RETURN {a: null, b: {c: null, d: {e: null}, "
                          "f: [null, {g: null, h: [null], i: {j: null}}]}}"
                          " AS r"))
        d = r.asDict(recursive=True)
        assert d["a"] is None and d["b"]["c"] is None
        assert d["b"]["d"] == {"e": None}
        assert d["b"]["f"][0] is None
        assert d["b"]["f"][1] == {"g": None, "h": [None], "i": {"j": None}}

    def test_missing_property_dynamic_and_literal(self, spark, g):
        run(spark, g, "CREATE ()").collect()
        assert rows(run(spark, g,
                        "WITH 'prop' AS p MATCH (n) RETURN n[p] AS r")) \
            == [(None,)]
        assert rows(run(spark, g, "MATCH (n) RETURN n['prop'] AS r")) \
            == [(None,)]

    def test_boolean_coercion_of_lists(self, spark, g):
        # CoerceToPredicate: [] -> false, non-empty -> true, null -> null
        assert rows(run(spark, g, "RETURN true AND $list AS r",
                        list=[])) == [(False,)]
        assert rows(run(spark, g, "RETURN true AND $list AS r",
                        list=[1])) == [(True,)]
        assert rows(run(spark, g, "RETURN false OR $list AS r",
                        list=[])) == [(False,)]
        assert rows(run(spark, g, "RETURN NOT $list AS r",
                        list=[])) == [(True,)]

    def test_exponentiation_returns_float(self, spark, g):
        assert rows(run(spark, g,
                        "WITH 2 AS n, 3 AS e RETURN n ^ e AS r")) == [(8.0,)]

    def test_float_times_integer_division(self, spark, g):
        assert rows(run(spark, g,
                        "WITH 1.0 AS a, 1000 AS b "
                        "RETURN a * (b / 10) AS r")) == [(100.0,)]

    def test_range_wrong_direction_is_empty(self, spark, g):
        assert rows(run(spark, g, "RETURN range(2, 8, -1) AS r")) == [([],)]
        assert rows(run(spark, g, "RETURN range(8, 2, 1) AS r")) == [([],)]

    def test_unaliased_top_level_union(self, spark, g):
        assert rows(run(spark, g, "RETURN 5 UNION ALL RETURN 5")) \
            == [(5,), (5,)]

    def test_graph_projection_with_aggregation(self, spark, g):
        run(spark, g,
            "CREATE (a:Actor {name: 'Actor 1'}), "
            "(a)-[:REL]->(:Movie {title: 'Movie 1'}), "
            "(a)-[:REL]->(:Movie {title: 'Movie 2'})").collect()
        [(actor,)] = rows(run(spark, g, """
            MATCH (actor:Actor)-->(movie:Movie)
            WITH actor.name AS name, collect(movie{.title}) AS movies
            RETURN { name: name, movies: movies } AS actor
        """))
        d = actor.asDict(recursive=True)
        assert d["name"] == "Actor 1"
        assert sorted(m["title"] for m in d["movies"]) \
            == ["Movie 1", "Movie 2"]

    def test_union_with_different_return_order(self, spark, g):
        df = run(spark, g,
                 "WITH 1 AS y, 2 AS x RETURN y, x "
                 "UNION WITH 2 AS x, 1 AS y RETURN *")
        assert df.columns == ["y", "x"]
        assert rows(df) == [(1, 2)]


G5 = ("CREATE (a:A {name: 'A'}), (b:B {name: 'B'}), (c:C {name: 'C'}), "
      "(d:D {name: 'D'}), (x:X {name: 'X'}) "
      "CREATE (a)-[:REL]->(b), (b)-[:REL]->(c), (c)-[:REL]->(d), "
      "(a)-[:REL]->(x), (x)-[:REL]->(d)")
G4 = ("CREATE (a:A {name: 'A'}), (b:B {name: 'B'}), (c:C {name: 'C'}), "
      "(d:D {name: 'D'}) CREATE (a)-[:REL]->(b), (b)-[:REL]->(c), "
      "(c)-[:REL]->(d), (b)-[:REL]->(d)")


class TestShortestPathAcceptance:
    """Behavior-ported from ShortestPathAcceptance.feature: a WHERE
    predicate that depends on the path itself selects WHICH path is
    shortest — the engine must search among predicate-satisfying paths
    (the reference's FindShortestPaths withFallback), not filter the
    unconstrained winner.  Plus OPTIONAL MATCH interplay and null/limit
    edge cases."""

    def test_predicate_on_all_nodes_finds_longer_path(self, spark, g):
        run(spark, g, G5).collect()
        got = rows(run(spark, g, """
            MATCH p = shortestPath((src:A)-[*]->(dst:D))
            WHERE NONE(n in nodes(p) WHERE n:X)
            UNWIND [n IN nodes(p) | n.name] AS node
            RETURN node
        """))
        assert got == [("A",), ("B",), ("C",), ("D",)]

    def test_predicate_none_relationships(self, spark, g):
        run(spark, g,
            "CREATE (a:A {name: 'A'}), (b:B {name: 'B'}), "
            "(c:C {name: 'C'}), (d:D {name: 'D'}), (x:X {name: 'X'}) "
            "CREATE (a)-[:REL]->(b), (b)-[:REL]->(c), (c)-[:REL]->(d), "
            "(a)-[:X {blocked: true}]->(x), "
            "(x)-[:X {blocked: true}]->(d)").collect()
        got = rows(run(spark, g, """
            MATCH p = shortestPath((src:A)-[*]->(dst:D))
            WHERE NONE(r in relationships(p) WHERE r.blocked IS NOT NULL)
            UNWIND [n IN nodes(p) | n.name] AS node
            RETURN node
        """))
        assert got == [("A",), ("B",), ("C",), ("D",)]

    def test_predicate_none_relationships_boolean_prop(self, spark, g):
        run(spark, g,
            "CREATE (a:A {name: 'A'}), (b:B {name: 'B'}), "
            "(c:C {name: 'C'}), (d:D {name: 'D'}), (x:X {name: 'X'}) "
            "CREATE (a)-[:X {blocked: false}]->(b), "
            "(b)-[:X {blocked: false}]->(c), "
            "(c)-[:X {blocked: false}]->(d), "
            "(a)-[:X {blocked: true}]->(x), "
            "(x)-[:X {blocked: true}]->(d)").collect()
        got = rows(run(spark, g, """
            MATCH p = shortestPath((src:A)-[*]->(dst:D))
            WHERE NONE(r in relationships(p) WHERE r.blocked)
            UNWIND [n IN nodes(p) | n.name] AS node
            RETURN node
        """))
        assert got == [("A",), ("B",), ("C",), ("D",)]

    def test_full_path_predicate_length_parity(self, spark, g):
        # not per-element inlinable: needs the exhaustive fallback
        run(spark, g, G5).collect()
        got = rows(run(spark, g, """
            MATCH p = shortestPath((src:A)-[rs*]->(dst:D))
            WHERE length(p) % 2 = 1
            UNWIND [n IN nodes(p) | n.name] AS node
            RETURN node
        """))
        assert got == [("A",), ("B",), ("C",), ("D",)]

    def test_rel_list_predicate_same_type(self, spark, g):
        run(spark, g,
            "CREATE (a:A {name: 'A'}), (b:B {name: 'B'}), "
            "(c:C {name: 'C'}), (d:D {name: 'D'}), (x:X {name: 'X'}) "
            "CREATE (a)-[:REL]->(b), (b)-[:REL]->(c), (c)-[:REL]->(d), "
            "(a)-[:ALT1]->(x), (x)-[:ALT2]->(d)").collect()
        got = rows(run(spark, g, """
            MATCH p = shortestPath((src:A)-[rs*]->(dst:D))
            WHERE ALL(r in rs WHERE type(rs[0]) = type(r))
            UNWIND [n IN nodes(p) | n.name] AS node
            RETURN node
        """))
        assert got == [("A",), ("B",), ("C",), ("D",)]

    def test_context_preserved_with_prebound_endpoints(self, spark, g):
        run(spark, g, G5).collect()
        got = rows(run(spark, g, """
            MATCH (src:A), (dest:D)
            MATCH p = shortestPath((src)-[rs*]->(dest))
            WHERE ALL(r in rs WHERE type(rs[0]) = type(r))
              AND ALL(r in rs WHERE r.blocked IS NULL OR r.blocked <> true)
            RETURN [n IN nodes(p) | n.name] AS ns
        """))
        assert got == [(["A", "X", "D"],)]

    def test_unconstrained_predicate_keeps_fast_path(self, spark, g):
        # a WHERE only on endpoints does NOT trigger the fallback
        run(spark, g, G4).collect()
        got = rows(run(spark, g, """
            MATCH p = shortestPath((src:A)-[*]->(dst:D))
            WHERE src.name = 'A'
            UNWIND [n IN nodes(p) | n.name] AS node
            RETURN node
        """))
        assert got == [("A",), ("B",), ("D",)]

    def test_optional_match_unbound_shortest(self, spark, g):
        run(spark, g, G4).collect()
        got = rows(run(spark, g, """
            OPTIONAL MATCH p = shortestPath((src:A)-[*]->(dst:D))
            UNWIND [n IN nodes(p) | n.name] AS node
            RETURN node
        """))
        assert got == [("A",), ("B",), ("D",)]

    def test_optional_match_no_path_yields_null(self, spark, g):
        run(spark, g, "CREATE (:A), (:D)").collect()
        got = rows(run(spark, g, """
            MATCH (a:A), (d:D)
            OPTIONAL MATCH p = shortestPath((a)-[*]->(d))
            RETURN p IS NULL AS isnull
        """))
        assert got == [(True,)]

    def test_length_limit_prunes_all(self, spark, g):
        run(spark, g,
            "CREATE (a:A), (b:B), (c:C), (d:D) "
            "CREATE (a)-[:REL]->(b), (b)-[:REL]->(c), "
            "(c)-[:REL]->(d)").collect()
        got = rows(run(spark, g, """
            MATCH p = shortestPath((src:A)-[*..1]->(dst:D))
            RETURN length(p) AS l
        """))
        assert got == []

    def test_null_start_node_no_rows(self, spark, g):
        run(spark, g,
            "CREATE (a:A), (b:B), (c:C), (d:D) "
            "CREATE (a)-[:REL]->(b), (b)-[:REL]->(c), "
            "(c)-[:REL]->(d)").collect()
        got = rows(run(spark, g, """
            OPTIONAL MATCH (src:Y) WITH src
            MATCH p = shortestPath((src)-[*]->(dst:D))
            RETURN length(p) AS l
        """))
        assert got == []

    def test_all_shortest_with_killing_predicate_finds_longer(self,
                                                              spark, g):
        # the 2-hop winner dies on the predicate; the engine must return
        # the 3-hop paths that satisfy it
        run(spark, g,
            "CREATE (s:START), (e:END) "
            "CREATE (s)-[:R]->()-[:R]->(e), "
            "(s)-[:R {p:42}]->()-[:R {p:42}]->()-[:R {p:42}]->(e)"
            ).collect()
        got = rows(run(spark, g, """
            MATCH p = allShortestPaths((start:START)-[*]->(end:END))
            WHERE ALL(x in relationships(p) WHERE x.p IS NOT NULL)
            RETURN length(p) AS len
        """))
        assert got == [(3,)]

    def test_deep_bound_feeding_pattern_comprehension(self, spark, g):
        # a *0..100 search result consumed by a pattern comprehension:
        # regression pin for the driver-side plan blowup (the deep-search
        # result is checkpointed, so downstream self-joins reference a
        # materialized scan)
        run(spark, g,
            "CREATE (a:A {name: 'A'}), (b1:B {name: 'B'}), "
            "(b2:B {name: 'B'}), (c:C {name: 'C'}) "
            "CREATE (a)-[:REL]->(b1), (b1)-[:REL]->(b2), "
            "(b2)-[:REL]->(c)").collect()
        got = rows(run(spark, g, """
            MATCH path = allShortestPaths((a:A)-[:REL*0..100]-(c:C))
            WITH nodes(path) AS pathNodes
            WITH pathNodes[0] AS p, pathNodes[3] as c
            RETURN size([path=(c)-[:REL]-(:B)-[:REL]-(:B)-[:REL]-(p) | path])
                   AS size
        """))
        assert got == [(1,)]
