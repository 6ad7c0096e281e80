"""TCK-style acceptance scenarios (SURVEY §5): each test builds a tiny
literal graph with CREATE (the Gherkin "Given" step), runs one query, and
asserts the expected rows — mirroring the shape of the reference's
acceptance corpus (community/cypher/spec-suite-tools/src/test/resources/
acceptance/features/*.feature) without copying any scenario text.
"""

import pytest

# conformance tranche: excluded from the default (core) run so the
# driver's verify window can finish; run with `pytest -m acceptance`
pytestmark = pytest.mark.acceptance


from neo4j_spark.api import cypher
from neo4j_spark.graph import PropertyGraph


@pytest.fixture()
def g(spark):
    """Given an empty graph."""
    return PropertyGraph({}, {})


def run(spark, g, q, **params):
    return cypher(spark, q, g, params=params or None)


def rows(df):
    return [tuple(r) for r in df.collect()]


def rset(df):
    return set(rows(df))


class TestMatchAcceptance:
    def test_match_all_after_create(self, spark, g):
        run(spark, g, "CREATE (:A {name: 'a'}), (:B {name: 'b'})").collect()
        assert rset(run(spark, g, "MATCH (n) RETURN n.name AS name")) \
            == {("a",), ("b",)}

    def test_undirected_match_both_ways(self, spark, g):
        run(spark, g, "CREATE (:X {v: 1})-[:R]->(:X {v: 2})").collect()
        assert rset(run(spark, g,
                        "MATCH (a)-[:R]-(b) RETURN a.v AS a, b.v AS b")) \
            == {(1, 2), (2, 1)}

    def test_self_loop_matches_once_per_direction(self, spark, g):
        run(spark, g, "CREATE (a:S {v: 1})-[:R]->(a)").collect()
        assert rows(run(spark, g,
                        "MATCH (a)-[:R]-(b) RETURN count(*) AS c")) == [(1,)]

    def test_two_hop_no_rel_reuse(self, spark, g):
        run(spark, g, "CREATE (:N {v: 1})-[:R]->(:N {v: 2})").collect()
        # a-[r1]->b-[r2]->c with r1<>r2: the single rel cannot be reused
        assert rows(run(spark, g,
                        "MATCH (a)-[:R]-(b)-[:R]-(c) "
                        "RETURN count(*) AS c")) == [(0,)]

    def test_property_predicate_inline_and_where(self, spark, g):
        run(spark, g,
            "UNWIND [1, 2, 3] AS x CREATE (:P {v: x})").collect()
        a = rows(run(spark, g, "MATCH (p:P {v: 2}) RETURN p.v AS v"))
        b = rows(run(spark, g, "MATCH (p:P) WHERE p.v = 2 RETURN p.v AS v"))
        assert a == b == [(2,)]


class TestOptionalMatchAcceptance:
    def test_missing_match_binds_null(self, spark, g):
        run(spark, g, "CREATE (:L {v: 1})").collect()
        assert rows(run(spark, g,
                        "MATCH (l:L) OPTIONAL MATCH (l)-[:NOPE]->(m) "
                        "RETURN l.v AS v, m AS m")) == [(1, None)]

    def test_optional_then_aggregate(self, spark, g):
        run(spark, g,
            "CREATE (a:U {v: 1})-[:F]->(:U {v: 2}), (:U {v: 3})").collect()
        assert rset(run(spark, g,
                        "MATCH (u:U) OPTIONAL MATCH (u)-[:F]->(f) "
                        "RETURN u.v AS v, count(f) AS c")) \
            == {(1, 1), (2, 0), (3, 0)}


class TestAggregationAcceptance:
    def test_grouped_and_global(self, spark, g):
        run(spark, g,
            "UNWIND [{k: 'x', v: 1}, {k: 'x', v: 2}, {k: 'y', v: 3}] AS p "
            "CREATE (:E {k: p.k, v: p.v})").collect()
        assert rset(run(spark, g,
                        "MATCH (e:E) RETURN e.k AS k, sum(e.v) AS s")) \
            == {("x", 3), ("y", 3)}
        assert rows(run(spark, g,
                        "MATCH (e:E) RETURN count(*) AS c, avg(e.v) AS a")) \
            == [(3, 2.0)]

    def test_collect_distinct_sorted(self, spark, g):
        run(spark, g, "UNWIND [2, 1, 2] AS x CREATE (:C {v: x})").collect()
        out = rows(run(spark, g,
                       "MATCH (c:C) WITH DISTINCT c.v AS v ORDER BY v "
                       "RETURN collect(v) AS l"))
        assert out == [([1, 2],)]


class TestWithAcceptance:
    def test_with_filters_before_return(self, spark, g):
        run(spark, g, "UNWIND range(1, 10) AS x CREATE (:W {v: x})").collect()
        assert rows(run(spark, g,
                        "MATCH (w:W) WITH w.v AS v WHERE v > 8 "
                        "RETURN sum(v) AS s")) == [(19,)]

    def test_with_orderby_limit_pipeline(self, spark, g):
        run(spark, g, "UNWIND range(1, 5) AS x CREATE (:O {v: x})").collect()
        assert rows(run(spark, g,
                        "MATCH (o:O) WITH o.v AS v ORDER BY v DESC LIMIT 2 "
                        "RETURN collect(v) AS l")) == [([5, 4],)]


class TestUnwindUnionAcceptance:
    def test_unwind_of_collected(self, spark, g):
        assert rows(run(spark, g,
                        "UNWIND [1, 2, 3] AS x WITH collect(x) AS l "
                        "UNWIND l AS y RETURN sum(y) AS s")) == [(6,)]

    def test_union_distinct_vs_all(self, spark, g):
        q = ("RETURN 1 AS v UNION {} RETURN 1 AS v")
        assert rows(run(spark, g, q.format(""))) == [(1,)]
        assert rows(run(spark, g, q.format("ALL"))) == [(1,), (1,)]


class TestMergeDeleteAcceptance:
    def test_merge_is_idempotent(self, spark, g):
        run(spark, g, "MERGE (:M {k: 1})").collect()
        run(spark, g, "MERGE (:M {k: 1})").collect()
        assert rows(run(spark, g,
                        "MATCH (m:M) RETURN count(*) AS c")) == [(1,)]

    def test_merge_on_create_on_match(self, spark, g):
        run(spark, g,
            "MERGE (m:M2 {k: 1}) ON CREATE SET m.state = 'new'").collect()
        run(spark, g,
            "MERGE (m:M2 {k: 1}) ON MATCH SET m.state = 'seen'").collect()
        assert rows(run(spark, g,
                        "MATCH (m:M2) RETURN m.state AS s")) == [("seen",)]

    def test_delete_node_and_detach(self, spark, g):
        run(spark, g, "CREATE (:D {v: 1})-[:R]->(:D {v: 2})").collect()
        with pytest.raises(Exception):
            # plain DELETE on a connected node must raise
            run(spark, g,
                "MATCH (d:D {v: 1}) DELETE d").collect()
        run(spark, g, "MATCH (d:D {v: 1}) DETACH DELETE d").collect()
        assert rows(run(spark, g,
                        "MATCH (d:D) RETURN d.v AS v")) == [(2,)]


class TestNullSemanticsAcceptance:
    def test_null_propagation_through_operators(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN null = null AS a, null <> null AS b, "
                        "null + 1 AS c, NOT null AS d")) \
            == [(None, None, None, None)]

    def test_property_of_null_is_null(self, spark, g):
        run(spark, g, "CREATE (:Z {v: 1})").collect()
        assert rows(run(spark, g,
                        "MATCH (z:Z) OPTIONAL MATCH (z)-[:NO]->(m) "
                        "RETURN m.anything AS p")) == [(None,)]


class TestSkipLimitAcceptance:
    def test_skip_limit_combined(self, spark, g):
        run(spark, g, "UNWIND range(1, 9) AS x CREATE (:K {v: x})").collect()
        assert rows(run(spark, g,
                        "MATCH (k:K) RETURN k.v AS v ORDER BY v "
                        "SKIP 3 LIMIT 2")) == [(4,), (5,)]

    def test_skip_param_expr(self, spark, g):
        run(spark, g, "UNWIND range(1, 5) AS x CREATE (:K2 {v: x})").collect()
        assert rows(run(spark, g,
                        "MATCH (k:K2) RETURN k.v AS v ORDER BY v "
                        "SKIP $s LIMIT $l", s=1, l=2)) == [(2,), (3,)]


class TestTernaryAndEdgeAcceptance:
    """Scenarios for the round-1 semantics fixes: ternary list equality,
    UNWIND null, empty range(), sum of no values, time components, and
    UNION bodies in CALL {} (regression pins for exprs/translate fixes)."""

    def test_ternary_list_equality(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN [1, null] = [1, null] AS a, "
                        "[1, 2] = [1, 3] AS b, [1, 2] = [1, 2] AS c, "
                        "[1] = [1, 2] AS d, [1, null] <> [1, null] AS e")) \
            == [(None, False, True, False, None)]

    def test_unwind_null_and_empty(self, spark, g):
        assert rows(run(spark, g,
                        "UNWIND null AS x RETURN count(*) AS n")) == [(0,)]
        assert rows(run(spark, g,
                        "UNWIND [] AS x RETURN count(*) AS n")) == [(0,)]

    def test_empty_range_directions(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN range(1, 0) AS a, range(5, 1, -2) AS b")) \
            == [([], [5, 3, 1])]

    def test_sum_of_no_values_is_zero(self, spark, g):
        run(spark, g, "CREATE (:S0 {v: 1})").collect()
        assert rows(run(spark, g,
                        "MATCH (s:S0) WHERE s.v > 99 "
                        "RETURN sum(s.v) AS t")) == [(0,)]

    def test_time_components(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN localtime('10:30:05').second AS s, "
                        "time('10:30:05Z').hour AS h, "
                        "time({hour: 9, minute: 15}).minute AS m")) \
            == [(5, 10, 15)]

    def test_call_subquery_union(self, spark, g):
        run(spark, g,
            "UNWIND range(1, 3) AS x CREATE (:U9 {v: x})").collect()
        assert rows(run(spark, g,
                        "MATCH (u:U9) CALL { WITH u RETURN u.v AS o "
                        "UNION WITH u RETURN u.v * 10 AS o } "
                        "RETURN count(*) AS n, sum(o) AS s")) == [(6, 66)]

    def test_startnode_endnode_properties(self, spark, g):
        run(spark, g,
            "CREATE (:SN {k: 1})-[:SE]->(:EN {k: 2})").collect()
        assert rows(run(spark, g,
                        "MATCH (:SN)-[e:SE]->(:EN) "
                        "RETURN startNode(e).k AS s, endNode(e).k AS t")) \
            == [(1, 2)]


class TestOrderabilityAcceptance:
    """Cypher global orderability: null sorts last ASC / first DESC
    (AnyValues.java:69-72 — NO_VALUE is the greatest value)."""

    def test_orderby_null_last_asc(self, spark, g):
        assert rows(run(spark, g,
                        "UNWIND [2, null, 1] AS v RETURN v ORDER BY v ASC")) \
            == [(1,), (2,), (None,)]

    def test_orderby_null_first_desc(self, spark, g):
        assert rows(run(spark, g,
                        "UNWIND [2, null, 1] AS v RETURN v ORDER BY v DESC")) \
            == [(None,), (2,), (1,)]

    def test_orderby_aggregate_alias(self, spark, g):
        run(spark, g, "CREATE (:Q1 {g: 'a', v: 1}), (:Q1 {g: 'a', v: 2}), "
            "(:Q1 {g: 'b', v: 9})").collect()
        assert rows(run(spark, g,
                        "MATCH (q:Q1) RETURN q.g AS g, sum(q.v) AS s "
                        "ORDER BY s DESC")) == [("b", 9), ("a", 3)]


class TestValueSemanticsAcceptance:
    def test_list_index_out_of_bounds_is_null(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN [1, 2, 3][5] AS a, [1, 2, 3][-1] AS b")) \
            == [(None, 3)]

    def test_distinct_groups_nulls_once(self, spark, g):
        assert rows(run(spark, g,
                        "UNWIND [null, null, 1] AS x "
                        "RETURN DISTINCT x ORDER BY x")) == [(1,), (None,)]

    def test_count_property_skips_nulls(self, spark, g):
        run(spark, g, "CREATE (:C1 {v: 1}), (:C1)").collect()
        assert rows(run(spark, g,
                        "MATCH (c:C1) RETURN count(c.v) AS a, "
                        "count(*) AS b")) == [(1, 2)]

    def test_plus_overloading(self, spark, g):
        # CypherMath.java: + adds numbers, concatenates strings and lists,
        # appends/prepends scalars to lists; / on integers is integer div
        assert rows(run(spark, g,
                        "RETURN 1 + 1.5 AS a, 'a' + 1 AS b, [1, 2] + 3 AS c, "
                        "1 + [2] AS d, 3 / 2 AS e, 3.0 / 2 AS f, 5 % 3 AS g")) \
            == [(2.5, "a1", [1, 2, 3], [1, 2], 1, 1.5, 2)]

    def test_in_over_list_of_lists(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN [1, 2] IN [[1, 2], [3]] AS a")) == [(True,)]

    def test_functions_propagate_null(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN size(null) AS a, toUpper(null) AS b")) \
            == [(None, None)]


class TestPatternSemanticsAcceptance:
    def test_conjoined_labels_require_all(self, spark, g):
        run(spark, g, "CREATE (:A1:B1 {v: 1}), (:A1 {v: 2})").collect()
        assert rows(run(spark, g, "MATCH (n:A1:B1) RETURN n.v AS v")) \
            == [(1,)]

    def test_zero_length_var_expand_includes_start(self, spark, g):
        run(spark, g, "CREATE (:V1 {v: 1})-[:R]->(:V1 {v: 2})").collect()
        assert rows(run(spark, g,
                        "MATCH (a:V1 {v: 1})-[*0..1]->(b) "
                        "RETURN b.v AS v ORDER BY v")) == [(1,), (2,)]

    def test_rel_uniqueness_not_across_clauses(self, spark, g):
        # AddUniquenessPredicates applies within one MATCH pattern only
        run(spark, g, "CREATE (:M1 {v: 1})-[:R]->(:M1 {v: 2})").collect()
        assert rows(run(spark, g,
                        "MATCH (a)-[r1:R]->(b) MATCH (c)-[r2:R]->(d) "
                        "RETURN count(*) AS n")) == [(1,)]

    def test_merge_requires_full_property_map(self, spark, g):
        run(spark, g, "CREATE (:P1 {a: 1, b: 2}), (:P1 {a: 1})").collect()
        assert rows(run(spark, g,
                        "MERGE (n:P1 {a: 1, b: 2}) RETURN count(*) AS n")) \
            == [(1,)]

    def test_later_clause_sees_earlier_create(self, spark, g):
        # read-after-write inside one statement (the Eager guarantee)
        assert rows(run(spark, g,
                        "CREATE (a:Z1 {v: 1}) WITH a MATCH (z:Z1) "
                        "RETURN count(*) AS n")) == [(1,)]

    def test_with_distinct(self, spark, g):
        assert rows(run(spark, g,
                        "UNWIND [1, 1, 2] AS x WITH DISTINCT x "
                        "RETURN count(*) AS n")) == [(2,)]


class TestPathValueAcceptance:
    """PathValue contents (values/virtual/PathValue.java): nodes(p) includes
    the interior nodes of var-length segments, with properties resolved."""

    def test_path_nodes_carry_properties(self, spark, g):
        run(spark, g,
            "CREATE (:PA {v: 1})-[:R]->(:PA {v: 2})-[:R]->(:PA {v: 3})"
            ).collect()
        assert rows(run(spark, g,
                        "MATCH p = (a:PA {v: 1})-[:R*2..2]->(b) "
                        "RETURN [n IN nodes(p) | n.v] AS vs")) == [([1, 2, 3],)]

    def test_undirected_path_orients_interior(self, spark, g):
        run(spark, g, "CREATE (:PB {v: 1})-[:R]->(m:PB {v: 2}), "
            "(:PB {v: 3})-[:R]->(m)").collect()
        assert rows(run(spark, g,
                        "MATCH p = (a:PB {v: 1})-[:R*2..2]-(b) "
                        "RETURN [n IN nodes(p) | n.v] AS vs")) == [([1, 2, 3],)]

    def test_shortest_path_nodes_resolve(self, spark, g):
        run(spark, g,
            "CREATE (:PC {v: 1})-[:R]->(:PC {v: 2})-[:R]->(:PC {v: 3})"
            ).collect()
        assert rows(run(spark, g,
                        "MATCH p = shortestPath((a:PC {v: 1})-[:R*..4]->"
                        "(b:PC {v: 3})) "
                        "RETURN [n IN nodes(p) | n.v] AS vs")) == [([1, 2, 3],)]

    def test_create_anonymous_nodes_are_distinct(self, spark, g):
        # CREATE makes a NEW node per anonymous pattern — no coincidental
        # merging on equal properties (CreatePipe semantics)
        run(spark, g, "CREATE (:PD {v: 1})-[:R]->(:PD {v: 2}), "
            "(:PD {v: 3})-[:R]->(:PD {v: 2})").collect()
        assert rows(run(spark, g,
                        "MATCH (n:PD) RETURN count(*) AS c")) == [(4,)]
        assert rows(run(spark, g,
                        "MATCH (a:PD {v: 1})-[:R*2..2]-(b) "
                        "RETURN count(*) AS c")) == [(0,)]


class TestLambdaScopeAcceptance:
    def test_reduce_accumulator_types(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN reduce(s = '', x IN ['a', 'b'] | s + x) AS r, "
                        "reduce(s = 0, x IN [1, 2, 3] | s + x) AS n, "
                        "reduce(acc = [], x IN [1, 2] | acc + x) AS l, "
                        "reduce(s = 0.0, x IN [1, 2] | s + x) AS f")) \
            == [("ab", 6, [1, 2], 3.0)]

    def test_quantifiers_and_functions_over_null(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN any(x IN null WHERE x > 1) AS a, "
                        "properties(null) AS p, keys(null) AS k, "
                        "reduce(s = 0, x IN null | s + x) AS r")) \
            == [(None, None, None, None)]


class TestProjectionFormsAcceptance:
    def test_with_star_plus_items(self, spark, g):
        run(spark, g, "CREATE (:SP {v: 4})").collect()
        assert rows(run(spark, g,
                        "MATCH (s:SP) WITH *, s.v * 2 AS d "
                        "RETURN s.v AS v, d")) == [(4, 8)]

    def test_leading_optional_match_yields_null_row(self, spark, g):
        assert rows(run(spark, g,
                        "OPTIONAL MATCH (n:Nope) RETURN n AS x")) == [(None,)]


class TestTemporalSemanticsAcceptance:
    def test_day_of_week_is_iso(self, spark, g):
        # TemporalValue: Monday=1..Sunday=7 (ISO-8601)
        assert rows(run(spark, g,
                        "RETURN date('2024-03-15').dayOfWeek AS fri, "
                        "date('2024-03-17').dayOfWeek AS sun")) == [(5, 7)]

    def test_duration_between_times(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN duration.between(localtime('10:00:00'), "
                        "localtime('12:30:00')).minutes AS m")) == [(150,)]

    def test_duration_between_roundtrip(self, spark, g):
        # DurationValue.between invariant: a + between(a, b) = b, with
        # every component carrying the sign of b - a.  Covers time-of-day
        # remainders, the negative direction, and a named-zone DST gap
        # (calendar day across Europe/Paris spring-forward is 1 day even
        # though the instant gap is 23h).
        pairs = [
            ("datetime('2024-01-31T10:30:00')",
             "datetime('2024-03-01T09:00:00')"),
            ("datetime('2024-03-01T09:00:00')",
             "datetime('2024-01-31T10:30:00')"),
            ("localdatetime('2024-01-01T23:59:59')",
             "localdatetime('2024-01-02T00:00:01')"),
            ("datetime('2024-03-30T12:00:00[Europe/Paris]')",
             "datetime('2024-03-31T12:00:00[Europe/Paris]')"),
        ]
        for a, b in pairs:
            assert rows(run(
                spark, g,
                f"RETURN {a} + duration.between({a}, {b}) = {b} AS ok",
            )) == [(True,)], (a, b)
        assert rows(run(spark, g,
                        "RETURN duration.between(datetime('2024-03-01T09:00:00'), "
                        "datetime('2024-01-31T10:30:00')).months AS m")) == [(-1,)]

    def test_duration_aggregates(self, spark, g):
        # sum/avg over durations aggregate component-wise; avg carries
        # fractional months into days (DurationValue.approximate)
        assert rows(run(spark, g,
                        "UNWIND [duration('PT1H'), duration('PT3H')] AS d "
                        "RETURN avg(d).hours AS h")) == [(2,)]
        assert rows(run(spark, g,
                        "UNWIND [duration('P1M'), duration('P2M')] AS d "
                        "RETURN sum(d).months AS s, avg(d).months AS am, "
                        "avg(d).days AS ad")) == [(3, 1, 15)]


class TestRoundModesAcceptance:
    def test_round_ties_toward_positive_infinity(self, spark, g):
        # CypherFunctions.java:297 — round(x)/round(x, 0) is Math.round
        assert rows(run(spark, g,
                        "RETURN round(2.5) AS a, round(-2.5) AS b, "
                        "round(-1.5) AS c, round(-2.5, 0) AS d")) == \
            [(3.0, -2.0, -1.0, -2.0)]

    def test_round_explicit_modes(self, spark, g):
        # explicit mode switches to BigDecimal.setScale — away from zero
        # for HALF_UP even at precision 0
        assert rows(run(spark, g,
                        "RETURN round(-2.5, 0, 'HALF_UP') AS a, "
                        "round(2.435, 2, 'HALF_EVEN') AS b, "
                        "round(-2.3, 0, 'CEILING') AS c, "
                        "round(-2.35, 1, 'FLOOR') AS d, "
                        "round(-2.3, 0, 'UP') AS e, "
                        "round(2.7, 0, 'DOWN') AS f, "
                        "round(2.5, 0, 'HALF_DOWN') AS h")) == \
            [(-3.0, 2.44, -2.0, -2.4, -3.0, 2.0, 2.0)]

    def test_round_decimal_exactness(self, spark, g):
        # FLOOR at precision 1 must treat 2.3 as the decimal 2.3, not the
        # double 2.2999...: floor(2.3 * 10) is exactly 23
        assert rows(run(spark, g,
                        "RETURN round(2.3, 1, 'FLOOR') AS a")) == [(2.3,)]


class TestMapEqualityAcceptance:
    def test_map_equality_with_null_values_is_null(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN {a: 1, b: null} = {a: 1, b: null} AS r, "
                        "{a: 1, b: null} <> {a: 1, b: null} AS r2")) == \
            [(None, None)]

    def test_map_equality_definite_mismatch_decides(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN {a: 1, b: null} = {a: 2, b: null} AS r, "
                        "{a: 1} = {b: 1} AS r2, {a: 1} = {a: 'x'} AS r3, "
                        "{a: 1} = {a: 1} AS r4")) == \
            [(False, False, False, True)]


class TestQuantifierEmptyListAcceptance:
    def test_quantifiers_over_empty_list(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN all(x IN [] WHERE x) AS a, "
                        "any(x IN [] WHERE x) AS b, "
                        "none(x IN [] WHERE x) AS c, "
                        "single(x IN [] WHERE x) AS d")) == \
            [(True, False, True, False)]


class TestSetFromEntityAcceptance:
    def test_set_replace_from_entity(self, spark, g):
        run(spark, g, "CREATE (:SC {a: 1, b: 2}), (:TC {c: 9})").collect()
        run(spark, g, "MATCH (s:SC), (t:TC) SET t = s").collect()
        assert rows(run(spark, g,
                        "MATCH (t:TC) RETURN t.a AS a, t.b AS b, t.c AS c")) \
            == [(1, 2, None)]

    def test_set_merge_from_entity_keeps_existing(self, spark, g):
        run(spark, g, "CREATE (:SD {a: 1}), (:TD {c: 9})").collect()
        run(spark, g, "MATCH (s:SD), (t:TD) SET t += s").collect()
        assert rows(run(spark, g,
                        "MATCH (t:TD) RETURN t.a AS a, t.c AS c")) == [(1, 9)]

    def test_set_merge_from_param_map(self, spark, g):
        run(spark, g, "CREATE (:PE {v: 1})").collect()
        run(spark, g, "MATCH (p:PE) SET p += $m",
            m={"x": 7, "y": "z"}).collect()
        assert rows(run(spark, g,
                        "MATCH (p:PE) RETURN p.v AS v, p.x AS x, p.y AS y")) \
            == [(1, 7, "z")]


class TestMergeUndirectedAcceptance:
    def test_merge_undirected_matches_existing(self, spark, g):
        run(spark, g, "CREATE (:ME {v: 1})-[:R]->(:ME {v: 2})").collect()
        run(spark, g, "MATCH (a:ME {v: 1}), (b:ME {v: 2}) "
            "MERGE (a)-[:R]-(b)").collect()
        assert rows(run(spark, g,
                        "MATCH ()-[r:R]->() RETURN count(*) AS n")) == [(1,)]

    def test_merge_undirected_creates_left_to_right(self, spark, g):
        run(spark, g, "CREATE (:MF {v: 1}), (:MF {v: 2})").collect()
        run(spark, g, "MATCH (a:MF {v: 1}), (b:MF {v: 2}) "
            "MERGE (a)-[:R]-(b)").collect()
        assert rows(run(spark, g,
                        "MATCH (a)-[:R]->(b) "
                        "RETURN a.v AS av, b.v AS bv")) == [(1, 2)]


class TestParserSurfaceAcceptance:
    def test_comments_and_literals(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN /* block */ 0x10 AS h, 0o10 AS o, "
                        "1.5e-2 AS s // line comment")) == [(16, 8, 0.015)]

    def test_backticks_and_keyword_props(self, spark, g):
        run(spark, g,
            "CREATE (:`Weird Label` {`odd prop`: 5, count: 3})").collect()
        assert rows(run(spark, g,
                        "MATCH (n:`Weird Label`) "
                        "RETURN n.`odd prop` AS v, n.count AS c")) == [(5, 3)]

    def test_yield_star_and_where(self, spark, g):
        assert rows(run(spark, g,
                        "CALL dbms.components() YIELD * "
                        "RETURN count(*) AS n")) == [(1,)]
        assert rows(run(spark, g,
                        "CALL db.labels() YIELD label "
                        "WHERE label STARTS WITH 'Zz' "
                        "RETURN count(*) AS n")) == [(0,)]


class TestSubqueryPositionsAcceptance:
    def test_exists_inside_case(self, spark, g):
        run(spark, g, "CREATE (:CE {v: 1})-[:R]->(:CE {v: 2}), "
            "(:CE {v: 3})").collect()
        assert rset(run(spark, g,
                        "MATCH (n:CE) RETURN n.v AS v, "
                        "CASE WHEN EXISTS { (n)-[:R]->() } THEN 'y' "
                        "ELSE 'n' END AS f")) == {(1, "y"), (2, "n"), (3, "n")}

    def test_exists_inside_map_literal(self, spark, g):
        run(spark, g, "CREATE (:CM {v: 1})-[:R]->(:CM {v: 2})").collect()
        assert rset(run(spark, g,
                        "MATCH (n:CM) RETURN "
                        "{v: n.v, has: EXISTS { (n)-[:R]->() }}.has AS h")) \
            == {(True,), (False,)}

    def test_aggregate_in_order_by(self, spark, g):
        run(spark, g,
            "CREATE (:GA {g: 'a'}), (:GA {g: 'a'}), (:GA {g: 'b'})").collect()
        assert rows(run(spark, g,
                        "MATCH (n:GA) RETURN n.g AS g "
                        "ORDER BY count(n) DESC, g")) == [("a",), ("b",)]


class TestQppQuantifierAcceptance:
    def test_star_includes_zero_repetitions(self, spark, g):
        run(spark, g, "CREATE (:QA {v: 1})-[:R]->(:QA {v: 2})").collect()
        assert rows(run(spark, g,
                        "MATCH (a:QA {v: 1}) (()-[:R]->())* (x) "
                        "RETURN x.v AS v ORDER BY v")) == [(1,), (2,)]

    def test_question_is_zero_or_one(self, spark, g):
        run(spark, g,
            "CREATE (:QB {v: 1})-[:R]->(:QB {v: 2})-[:R]->(:QB {v: 3})"
            ).collect()
        assert rows(run(spark, g,
                        "MATCH (a:QB {v: 1}) (()-[:R]->())? (x) "
                        "RETURN x.v AS v ORDER BY v")) == [(1,), (2,)]

    def test_inline_where_in_qpp_nodes(self, spark, g):
        run(spark, g, "UNWIND range(1, 4) AS i "
            "CREATE (:QC {v: i})-[:R]->(:QD {v: i * 10})").collect()
        assert rows(run(spark, g,
                        "MATCH ((a:QC WHERE a.v < 3)-[:R]->"
                        "(b WHERE b.v > 10)){1,1} "
                        "RETURN count(*) AS n")) == [(1,)]


class TestFullQuerySubqueryAcceptance:
    def test_exists_with_union_body(self, spark, g):
        run(spark, g, "CREATE (:EU {v: 1})-[:R]->(:EU {v: 2})").collect()
        assert rows(run(spark, g,
                        "MATCH (a:EU) WHERE EXISTS { "
                        "MATCH (a)-[:R]->(x) RETURN x "
                        "UNION MATCH (a)<-[:R]-(y) RETURN y AS x } "
                        "RETURN count(*) AS n")) == [(2,)]

    def test_count_with_union_distinct_vs_all(self, spark, g):
        run(spark, g, "UNWIND [1, 2] AS i CREATE (:CU {v: i})").collect()
        assert rows(run(spark, g,
                        "RETURN COUNT { MATCH (c:CU) RETURN c.v AS v "
                        "UNION MATCH (c:CU) RETURN c.v AS v } AS d, "
                        "COUNT { MATCH (c:CU) RETURN c.v AS v "
                        "UNION ALL MATCH (c:CU) RETURN c.v AS v } AS a")) \
            == [(2, 4)]

    def test_exists_with_inner_with_pipeline(self, spark, g):
        run(spark, g, "UNWIND [5, 15] AS i CREATE (:EW {v: i})").collect()
        assert rows(run(spark, g,
                        "RETURN EXISTS { MATCH (e:EW) WITH e "
                        "WHERE e.v > 10 RETURN e } AS has")) == [(True,)]


class TestApplyPagingAcceptance:
    """ORDER BY/SKIP/LIMIT inside a correlated subquery page PER INPUT ROW
    (Apply semantics, LP:855), not globally."""

    def test_call_subquery_limit_per_row(self, spark, g):
        run(spark, g, "UNWIND range(1, 2) AS gp UNWIND range(1, 3) AS i "
            "CREATE (:AP {g: gp, v: gp * 10 + i})").collect()
        assert rset(run(spark, g,
                        "MATCH (o:AP) WITH DISTINCT o.g AS gp "
                        "CALL { WITH gp MATCH (x:AP {g: gp}) "
                        "RETURN x.v AS mx ORDER BY x.v DESC LIMIT 1 } "
                        "RETURN gp, mx")) == {(1, 13), (2, 23)}

    def test_collect_subquery_inner_limit(self, spark, g):
        run(spark, g, "UNWIND range(1, 4) AS i CREATE (:AC {v: i})").collect()
        assert rows(run(spark, g,
                        "RETURN COLLECT { MATCH (x:AC) RETURN x.v "
                        "ORDER BY x.v LIMIT 2 } AS l")) == [([1, 2],)]

    def test_collect_subquery_desc_string_order(self, spark, g):
        run(spark, g, "UNWIND ['a', 'c', 'b'] AS s "
            "CREATE (:AD {s: s})").collect()
        assert rows(run(spark, g,
                        "RETURN COLLECT { MATCH (x:AD) RETURN x.s "
                        "ORDER BY x.s DESC } AS l")) == [(["c", "b", "a"],)]


class TestPlannerHintsAcceptance:
    def test_using_hints_are_tolerated(self, spark, g):
        # Hint.scala surface: hints affect the reference's planner; here
        # Catalyst owns physical planning, so hints parse and drop
        run(spark, g, "UNWIND range(1, 5) AS i CREATE (:UH {v: i})").collect()
        assert rows(run(spark, g,
                        "MATCH (n:UH) USING INDEX n:UH(v) "
                        "WHERE n.v > 3 RETURN count(*) AS c")) == [(2,)]
        assert rows(run(spark, g,
                        "MATCH (n:UH) USING SCAN n:UH "
                        "RETURN count(*) AS c")) == [(5,)]


class TestWriteReadInteractionAcceptance:
    """Intra-statement write->read visibility (the Eager guarantee) and
    relationship property mutation."""

    def test_set_and_remove_rel_property(self, spark, g):
        run(spark, g, "CREATE (:W1)-[:R {w: 1}]->(:W1)").collect()
        run(spark, g, "MATCH ()-[r:R]->() SET r.w = 9").collect()
        assert rows(run(spark, g,
                        "MATCH ()-[r:R]->() RETURN r.w AS w")) == [(9,)]
        run(spark, g, "MATCH ()-[r:R]->() REMOVE r.w").collect()
        assert rows(run(spark, g,
                        "MATCH ()-[r:R]->() RETURN r.w AS w")) == [(None,)]

    def test_merge_nodes_then_create_rel_one_statement(self, spark, g):
        run(spark, g, "MERGE (a:W2 {v: 1}) MERGE (b:W2 {v: 2}) "
            "CREATE (a)-[:L]->(b)").collect()
        assert rows(run(spark, g,
                        "MATCH (a)-[:L]->(b) "
                        "RETURN a.v AS av, b.v AS bv")) == [(1, 2)]

    def test_delete_visible_to_later_match(self, spark, g):
        run(spark, g, "CREATE (:W3 {v: 1}), (:W3 {v: 2})").collect()
        assert rows(run(spark, g,
                        "MATCH (a:W3 {v: 1}) DELETE a WITH 1 AS one "
                        "MATCH (x:W3) RETURN count(*) AS n")) == [(1,)]

    def test_detach_delete_over_varlength_match(self, spark, g):
        run(spark, g,
            "CREATE (:W4 {v: 1})-[:R]->(:W4 {v: 2})-[:R]->(:W4 {v: 3})"
            ).collect()
        run(spark, g,
            "MATCH (a:W4 {v: 1})-[*1..2]->(b) DETACH DELETE b").collect()
        assert rows(run(spark, g,
                        "MATCH (n:W4) RETURN count(*) AS n")) == [(1,)]


class TestPathRelPropertiesAcceptance:
    def test_relationships_of_path_carry_properties(self, spark, g):
        run(spark, g, "CREATE (:PR {v: 1})-[:R {w: 7}]->(:PR {v: 2})"
            ).collect()
        assert rows(run(spark, g,
                        "MATCH p = (a:PR {v: 1})-[:R]->(b) "
                        "RETURN relationships(p)[0].w AS w")) == [(7,)]
        assert rows(run(spark, g,
                        "MATCH p = (a:PR {v: 1})-[:R*1..1]->(b) "
                        "RETURN [x IN relationships(p) | x.w] AS ws")) \
            == [([7],)]

    def test_single_node_path_has_empty_rels(self, spark, g):
        run(spark, g, "CREATE (:PS {v: 1})").collect()
        assert rows(run(spark, g,
                        "MATCH p = (n:PS) RETURN size(nodes(p)) AS nn, "
                        "[x IN relationships(p) | type(x)] AS ts")) \
            == [(1, [])]


class TestEndpointResolutionAcceptance:
    def test_startnode_of_path_relationship_has_properties(self, spark, g):
        run(spark, g, "CREATE (:EN {v: 1})-[:R]->(:EN {v: 2})").collect()
        assert rows(run(spark, g,
                        "MATCH p = (a:EN {v: 1})-[:R]->(b) "
                        "RETURN startNode(relationships(p)[0]).v AS s, "
                        "endNode(relationships(p)[0]).v AS e")) == [(1, 2)]

    def test_endpoint_of_unbound_rel_scan(self, spark, g):
        run(spark, g, "CREATE (:EO {v: 5})-[:R]->(:EO {v: 6})").collect()
        assert rows(run(spark, g,
                        "MATCH ()-[r:R]->() "
                        "RETURN startNode(r).v AS s, endNode(r).v AS e")) \
            == [(5, 6)]


class TestEdgeSemanticsAcceptance:
    """Round-4 long-tail: bare-null WHERE, zero-length paths, nested-null
    container equality, cross-clause path equality, negative indexing."""

    def test_where_bare_null_filters_all(self, spark, g):
        assert rows(run(spark, g,
            "UNWIND [1, 2] AS x WITH x WHERE null RETURN count(x) AS n")) \
            == [(0,)]
        assert rows(run(spark, g,
            "UNWIND [1, 2] AS x WITH x WHERE NOT null RETURN count(x) AS n")) \
            == [(0,)]

    def test_zero_length_path_values(self, spark, g):
        run(spark, g, "CREATE (:A {v: 1})-[:R]->(:B {v: 2})").collect()
        assert rows(run(spark, g,
            "MATCH p = (a:A)-[*0..1]->(x) "
            "RETURN length(p) AS l, size(nodes(p)) AS n ORDER BY l")) \
            == [(0, 1), (1, 2)]

    def test_list_equality_nested_nulls(self, spark, g):
        assert rows(run(spark, g,
            "RETURN [1, null] = [1, null] AS a, [1, null] = [2, null] AS b, "
            "[1, 2] = [1, 2, 3] AS c")) == [(None, False, False)]

    def test_rel_uniqueness_within_single_match(self, spark, g):
        # one relationship cannot bind two rel variables of the same MATCH
        run(spark, g, "CREATE (:A)-[:R]->(:B)").collect()
        assert rows(run(spark, g,
            "MATCH p1 = (a:A)-[:R]->(b), p2 = (a)-[:R]->(b) "
            "RETURN count(*) AS n")) == [(0,)]

    def test_path_equality_across_clauses(self, spark, g):
        run(spark, g, "CREATE (:A)-[:R]->(:B)").collect()
        assert rows(run(spark, g,
            "MATCH p1 = (a:A)-[:R]->(b) MATCH p2 = (a)-[:R]->(b) "
            "RETURN p1 = p2 AS eq")) == [(True,)]

    def test_optional_match_where_binds_null(self, spark, g):
        run(spark, g, "CREATE (:A {v: 1})-[:R]->(:B {v: 2})").collect()
        assert rows(run(spark, g,
            "MATCH (a:A) OPTIONAL MATCH (a)-[:R]->(b:B) WHERE b.v > 5 "
            "RETURN a.v AS av, b.v AS bv")) == [(1, None)]

    def test_negative_and_null_list_indexing(self, spark, g):
        assert rows(run(spark, g,
            "RETURN [1, 2, 3][-1] AS a, [1, 2, 3][-4] AS b, "
            "[1, 2, 3][null..2] AS s")) == [(3, None, None)]

    def test_distinct_over_null_containing_lists(self, spark, g):
        assert rows(run(spark, g,
            "UNWIND [[1, null], [1, null], [2]] AS l "
            "RETURN count(DISTINCT l) AS n")) == [(2,)]


class TestWhereOnlyCorrelationAcceptance:
    """EXISTS/COUNT subqueries whose only correlation is an outer variable
    referenced inside the inner WHERE (or a property map) — no shared
    pattern variable (SemiApply LP:3659 keeps the outer row in scope)."""

    def _seed(self, spark, g):
        run(spark, g, "CREATE (:P {v: 1}), (:P {v: 2}), (:P {v: 2})") \
            .collect()

    def test_exists_outer_var_only_in_inner_where(self, spark, g):
        self._seed(spark, g)
        assert rows(run(spark, g,
            "MATCH (p:P) WHERE EXISTS { MATCH (q:P) WHERE q.v > p.v } "
            "RETURN count(*) AS n")) == [(1,)]

    def test_exists_pattern_form_outer_in_where(self, spark, g):
        self._seed(spark, g)
        assert rows(run(spark, g,
            "MATCH (p:P) WHERE EXISTS { (q:P) WHERE q.v > p.v } "
            "RETURN count(*) AS n")) == [(1,)]

    def test_count_sub_outer_var_only_in_inner_where(self, spark, g):
        self._seed(spark, g)
        assert rows(run(spark, g,
            "MATCH (p:P) RETURN p.v AS v, "
            "COUNT { MATCH (q:P) WHERE q.v > p.v } AS c ORDER BY v")) \
            == [(1, 2), (2, 0), (2, 0)]

    def test_exists_outer_var_in_inner_props_map(self, spark, g):
        self._seed(spark, g)
        assert rows(run(spark, g,
            "MATCH (p:P) WHERE EXISTS { (q:P {v: p.v}) WHERE q <> p } "
            "RETURN count(*) AS n")) == [(2,)]

    def test_exists_outer_var_in_arithmetic(self, spark, g):
        self._seed(spark, g)
        assert rows(run(spark, g,
            "MATCH (p:P) WHERE p.v = 1 "
            "AND EXISTS { MATCH (q:P) WHERE q.v = p.v + 1 } "
            "RETURN count(*) AS n")) == [(1,)]


class TestPointAndConversionAcceptance:
    """Point accessors (PointValue.java get / CoordinateReferenceSystem
    srids), offset-datetime round-trip, toStringOrNull stringability."""

    def test_point_geographic_accessors(self, spark, g):
        assert rows(run(spark, g,
            "RETURN point({latitude: 1.5, longitude: 2.5}).latitude AS lat, "
            "point({latitude: 1.5, longitude: 2.5}).longitude AS lon, "
            "point({latitude: 1, longitude: 2, height: 3}).height AS h, "
            "point({x: 1, y: 2}).latitude AS no_lat")) \
            == [(1.5, 2.5, 3.0, None)]

    def test_point_srid_and_crs(self, spark, g):
        assert rows(run(spark, g,
            "RETURN point({x: 1, y: 2}).srid AS a, "
            "point({latitude: 1, longitude: 2}).srid AS b, "
            "point({x: 1, y: 2, z: 3}).srid AS c, "
            "point({latitude: 1, longitude: 2, height: 3}).srid AS d, "
            "point({x: 1, y: 2, z: 3}).crs AS c3")) \
            == [(7203, 4326, 9157, 4979, "cartesian-3d")]

    def test_offset_datetime_string_roundtrip(self, spark, g):
        assert rows(run(spark, g,
            "WITH datetime('2024-03-31T01:30:00+02:00') AS dt "
            "RETURN dt.offset AS o, dt.hour AS h, dt.epochMillis AS ms, "
            "toString(dt) AS s")) \
            == [("+02:00", 1, 1711841400000, "2024-03-31T01:30+02:00")]

    def test_to_string_or_null_stringability(self, spark, g):
        assert rows(run(spark, g,
            "RETURN toStringOrNull([1]) AS a, toStringOrNull({k: 1}) AS b, "
            "toStringOrNull(1.5) AS c, toStringOrNull(true) AS d")) \
            == [(None, None, "1.5", "true")]


class TestSecondaryLabelVisibility:
    """A node whose secondary label names an EXISTING shard must still be
    found by scans on that label (shard completeness regression)."""

    def test_multilabel_create_with_existing_shard(self, spark, g):
        run(spark, g, "CREATE (:Y {v: 1})").collect()
        run(spark, g, "CREATE (:X:Y {v: 2})").collect()
        assert rows(run(spark, g,
            "MATCH (n:Y) RETURN n.v AS v ORDER BY v")) == [(1,), (2,)]
        assert rows(run(spark, g,
            "MATCH (n:Y) RETURN count(*) AS c")) == [(2,)]

    def test_set_label_onto_existing_shard(self, spark, g):
        run(spark, g, "CREATE (:Y {v: 1}), (:Z {v: 2})").collect()
        run(spark, g, "MATCH (n:Z) SET n:Y").collect()
        assert rows(run(spark, g,
            "MATCH (n:Y) RETURN n.v AS v ORDER BY v")) == [(1,), (2,)]
