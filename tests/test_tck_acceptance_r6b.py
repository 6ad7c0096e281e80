"""TCK-style acceptance tranche 3 (round 6): quantified path patterns —
behavior-ported from the reference's acceptance corpus
(community/cypher/spec-suite-tools/src/test/resources/acceptance/features/
QuantifiedPathPatternAcceptance.feature) with fresh fixtures and wording.
Covers runtime group-variable semantics (list projection, empty groups for
{0,...} quantifiers, juxtaposition joins, multi-rel units), QPP-internal
predicates referencing outer singletons, path projection over QPPs, and
the compile-time guard rails (quantified single node, possibly-empty top
level, bound validation, nesting, group-variable reuse)."""

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


def one(spark, g, q, **params):
    [(v,)] = rows(run(spark, g, q, **params))
    return v


CHAIN3 = ("CREATE (:A {h: 1})-[:R {id: 1}]->(:B {h: 2})"
          "-[:R {id: 2}]->(:C {h: 3})")


class TestQppQuantifierFormsR6:
    def test_simple_qpp_over_mixed_components(self, spark, g):
        # "Simple quantified path pattern": 0/1/2/3-hop chains, {1,2}
        run(spark, g, """
            CREATE (),
                   ()-[:REL]->(),
                   ()-[:REL]->()-[:REL]->(),
                   ()-[:REL]->()-[:REL]->()-[:REL]->()
        """).collect()
        assert one(spark, g,
                   "MATCH () (()-->()){1, 2} RETURN count(*) AS count") == 9

    def test_exactly_two_braces_pair(self, spark, g):
        run(spark, g, CHAIN3).collect()
        got = rows(run(spark, g, """
            MATCH ((x)-[y]->(z)){2,2}
            RETURN [n IN x | n.h] AS xs, [r IN y | r.id] AS ys,
                   [n IN z | n.h] AS zs
        """))
        assert got == [([1, 2], [1, 2], [2, 3])]

    def test_exactly_two_single_brace(self, spark, g):
        run(spark, g, CHAIN3).collect()
        got = rows(run(spark, g, """
            MATCH ((x)-[y]->(z)){2}
            RETURN [n IN x | n.h] AS xs, [r IN y | r.id] AS ys
        """))
        assert got == [([1, 2], [1, 2])]

    def test_one_or_more_lower_only(self, spark, g):
        run(spark, g, CHAIN3).collect()
        got = sorted(rows(run(spark, g, """
            MATCH ((x)-[y]->(z)){1,}
            RETURN [n IN x | n.h] AS xs, [n IN z | n.h] AS zs
        """)))
        assert got == sorted([
            ([1], [2]), ([1, 2], [2, 3]), ([2], [3])])

    def test_kleene_plus_three_solutions(self, spark, g):
        run(spark, g, CHAIN3).collect()
        assert one(spark, g,
                   "MATCH ((x)-[y]->(z))+ RETURN count(*) AS n") == 3


class TestQppJuxtapositionR6:
    def test_unanchored_node_then_plus(self, spark, g):
        run(spark, g, CHAIN3).collect()
        got = sorted(rows(run(spark, g, """
            MATCH (x)((y)-[]->())+
            RETURN x.h AS xh, [n IN y | n.h] AS ys
        """)))
        assert got == sorted([(1, [1]), (1, [1, 2]), (2, [2])])

    def test_anchored_node_then_star_empty_group(self, spark, g):
        run(spark, g, CHAIN3).collect()
        got = sorted(rows(run(spark, g, """
            MATCH (x:A)((y)-[]->())*
            RETURN x.h AS xh, [n IN y | n.h] AS ys
        """)))
        assert got == sorted([(1, []), (1, [1]), (1, [1, 2])])

    def test_sandwich_star_six_rows(self, spark, g):
        run(spark, g, CHAIN3).collect()
        got = sorted(rows(run(spark, g, """
            MATCH (l)((m)-[]->(n))*(o)
            RETURN l.h AS lh, [q IN m | q.h] AS ms, o.h AS oh
        """)))
        assert got == sorted([
            (1, [], 1), (1, [1], 2), (1, [1, 2], 3),
            (2, [], 2), (2, [2], 3), (3, [], 3)])

    def test_sandwich_label_algebra_endpoints(self, spark, g):
        run(spark, g, "CREATE (:A:B {h: 1})-[:R]->(:A:C {h: 2})"
                      "-[:R]->(:D {h: 3})").collect()
        got = rows(run(spark, g, """
            MATCH (l:A&!C)((m)-[]->(n))+(o:D)
            RETURN l.h AS lh, [q IN m | q.h] AS ms,
                   [q IN n | q.h] AS ns, o.h AS oh
        """))
        assert got == [(1, [1, 2], [2, 3], 3)]

    def test_fixed_length_then_star(self, spark, g):
        run(spark, g, CHAIN3).collect()
        got = sorted(rows(run(spark, g, """
            MATCH (l)-->(m)((n)-[]->(o))*
            RETURN l.h AS lh, m.h AS mh, [q IN n | q.h] AS ns
        """)))
        assert got == sorted([(1, 2, []), (1, 2, [2]), (2, 3, [])])

    def test_two_juxtaposed_qpps(self, spark, g):
        run(spark, g, CHAIN3).collect()
        got = sorted(rows(run(spark, g, """
            MATCH ((f)-[i]->(g))+((k)-[m]->(n))*
            RETURN [q IN f | q.h] AS fs, [q IN k | q.h] AS ks
        """)))
        assert got == sorted([
            ([1], []), ([1], [2]), ([1, 2], []), ([2], [])])

    def test_quantified_rel_then_qpp(self, spark, g):
        # (p)-[e]->*(q)((f)-[i]->(g))* over a 2-hop chain: 10 rows
        run(spark, g, CHAIN3).collect()
        assert one(spark, g, """
            MATCH (p)-[e]->*(q)((f)-[i]->(g))*
            RETURN count(*) AS n
        """) == 10

    def test_empty_star_next_to_other_patterns_zero_rows(self, spark, g):
        # "{0,1} next to a +" on an empty graph: 0 rows, no error
        assert one(spark, g, """
            MATCH (()--())+ (()--()){0, 1} RETURN count(*) AS count
        """) == 0


class TestQppMultiRelUnitsR6:
    def test_unit_longer_than_one(self, spark, g):
        run(spark, g, """
            CREATE (a:A {h: 1}), (b:B {h: 2}), (c:C {h: 3}),
                   (b2:B {h: 4}), (a2:A {h: 5})
            CREATE (a)-[:R]->(b), (c)-[:S]->(b),
                   (c)-[:R]->(b2), (a2)-[:S]->(b2)
        """).collect()
        got = sorted(rows(run(spark, g, """
            MATCH ((x)-[r:R]->(y)<-[s:S]-(z)){1,2}
            RETURN [n IN x | n.h] AS xs, [n IN z | n.h] AS zs
        """)))
        assert got == sorted([
            ([1], [3]), ([1, 3], [3, 5]), ([3], [5])])

    def test_t_shape_two_pattern_parts(self, spark, g):
        run(spark, g, """
            CREATE (n1:N1)-[:F]->(x:N2)-[:F]->(y:N3)
            CREATE (x)-[:E]->(n4:N4)-[:E]->(n5:N5)
            CREATE (y)-[:F]->(:N6)
        """).collect()
        got = sorted(rows(run(spark, g, """
            MATCH (x)-[:F]->(y)-[:F]->(z), (y)((a)-[:E]->(b))+
            RETURN labels(x)[0] AS lx, labels(y)[0] AS ly,
                   labels(z)[0] AS lz, [n IN b | labels(n)[0]] AS bs
        """)))
        assert got == sorted([
            ("N1", "N2", "N3", ["N4"]),
            ("N1", "N2", "N3", ["N4", "N5"])])

    def test_multi_use_variable_inside_unit(self, spark, g):
        # ((a)-[e]->(b)-[f]->(a))+ : unit returns to its own start node
        run(spark, g, """
            CREATE (n:A {h: 1})-[:R]->(b:B {h: 2}), (b)-[:R]->(n),
                   (n)-[:R]->(c:C {h: 3})-[:R]->(:D {h: 4})
        """).collect()
        got = rows(run(spark, g, """
            MATCH ((a)-[e]->(b)-[f]->(a))+(p)-[g]->(r)-[q]->(s)
            RETURN [n IN a | n.h] AS as_, p.h AS ph, r.h AS rh, s.h AS sh
        """))
        assert got == [(([1]), 1, 3, 4)]

    def test_five_node_unit_three_iterations(self, spark, g):
        run(spark, g, """
            CREATE (:A)-[:R]->(:B)-[:S]->(:C)-[:T]->(:D)-[:U]->(:E)
                        -[:R]->(:B)-[:S]->(:C)-[:T]->(:D)-[:U]->(:E)
                        -[:R]->(:B)-[:S]->(:C)-[:T]->(:D)-[:U]->(:E)
        """).collect()
        assert one(spark, g, """
            MATCH ((a)-[f]->(b)-[g]->(c)-[h]->(d)-[i]->(e))+
            RETURN count(*) AS n
        """) == 15


class TestQppLabelExpressionsR6:
    def test_node_label_algebra_inside_qpp(self, spark, g):
        run(spark, g, "CREATE (:A {h: 1})-[:R]->(:A:B {h: 2})"
                      "-[:R]->(:A:C {h: 3})-[:R]->(:D {h: 4})").collect()
        got = sorted(rows(run(spark, g, """
            MATCH ((x:A&!C)-->(y))+
            RETURN [n IN x | n.h] AS xs, [n IN y | n.h] AS ys
        """)))
        assert got == sorted([
            ([1], [2]), ([1, 2], [2, 3]), ([2], [3])])

    def test_rel_type_disjunction_inside_qpp(self, spark, g):
        run(spark, g, "CREATE (:X {h: 0})<-[:Z]-(:A {h: 1})-[:R]->"
                      "(:B {h: 2})-[:S]->(:C {h: 3})").collect()
        got = sorted(one(spark, g, """
            MATCH (()-[x:R|S]->())+
            RETURN collect([r IN x | type(r)]) AS ts
        """))
        assert got == sorted([["R"], ["R", "S"], ["S"]])


class TestQppPredicatesR6:
    def test_local_node_where_inside_qpp(self, spark, g):
        run(spark, g, "CREATE (:A {h: 13})-[:R]->(:B {h: 14})"
                      "-[:R]->(:C {h: 3})").collect()
        got = sorted(rows(run(spark, g, """
            MATCH ((a WHERE a.h > 12)-[e]->(b))+
            RETURN [n IN a | n.h] AS as_, [n IN b | n.h] AS bs
        """)))
        assert got == sorted([
            ([13], [14]), ([14], [3]), ([13, 14], [14, 3])])

    def test_cross_element_comparison_with_min_two(self, spark, g):
        run(spark, g, "CREATE (:A {h: 15})-[:R]->(:A:B {h: 14})"
                      "-[:R]->(:B {h: 13})").collect()
        got = rows(run(spark, g, """
            MATCH ((a:A)-[e]->(b:B) WHERE a.h > b.h){2,}
            RETURN [n IN a | n.h] AS as_, [n IN b | n.h] AS bs
        """))
        assert got == [([15, 14], [14, 13])]

    def test_outer_singleton_from_earlier_match_in_qpp_where(self, spark, g):
        run(spark, g, """
            CREATE (:A {h: 11})-[:R]->(:B {h: 12})-[:R]->(:C {h: 13})
                   -[:R]->(:D {h: 14})
        """).collect()
        got = rows(run(spark, g, """
            MATCH (m)-->(n)
            MATCH (x)-->(y)((a)-[e]->(b) WHERE a.h > m.h)+(s)-->(u)
            RETURN m.h AS mh, x.h AS xh, [q IN a | q.h] AS as_,
                   s.h AS sh, u.h AS uh
        """))
        assert got == [(11, 11, [12], 13, 14)]

    def test_qpp_where_referencing_same_pattern_prefix(self, spark, g):
        # non-local singleton x, bound left of the QPP in the same pattern
        run(spark, g, """
            CREATE (:A {h: 11})-[:R]->(:B {h: 12})-[:R]->(:C {h: 13})
                   -[:R]->(:D {h: 10})
        """).collect()
        got = sorted(rows(run(spark, g, """
            MATCH (x)-->(y)((a)-[e]->(b) WHERE a.h > x.h)*(s)-->(u)
            RETURN x.h AS xh, [q IN a | q.h] AS as_, s.h AS sh, u.h AS uh
        """)))
        assert got == sorted([
            (11, [], 12, 13), (12, [], 13, 10), (11, [12], 13, 10)])

    def test_qpp_where_referencing_suffix_singleton(self, spark, g):
        # u is bound RIGHT of the QPP: predicate still applies per rep
        run(spark, g, """
            CREATE (:A {h: 11})-[:R]->(:B {h: 12})-[:R]->(:C {h: 13})
                   -[:R]->(:D {h: 10})
        """).collect()
        got = sorted(rows(run(spark, g, """
            MATCH (x)-->(y)((a)-[e]->(b) WHERE a.h > u.h)*(s)-->(u)
            RETURN x.h AS xh, [q IN a | q.h] AS as_, s.h AS sh, u.h AS uh
        """)))
        assert got == sorted([
            (11, [], 12, 13), (12, [], 13, 10), (11, [12], 13, 10)])

    def test_exists_subquery_inside_qpp_where(self, spark, g):
        run(spark, g, "CREATE (:X)<-[:Z]-(:A {h: 1})-[:R]->(:B {h: 2})"
                      "-[:S]->(:C {h: 3})").collect()
        got = rows(run(spark, g, """
            MATCH ((a)-[]-(b)-[]-(c) WHERE EXISTS { (a)-[]->(:X) })+
            RETURN [n IN a | n.h] AS as_, [n IN b | n.h] AS bs,
                   [n IN c | n.h] AS cs
        """))
        assert got == [([1], [2], [3])]

    def test_count_subquery_inside_qpp_where(self, spark, g):
        run(spark, g, "CREATE (:X)<-[:Z]-(:A {h: 1})-[:R]->(:B {h: 2})"
                      "-[:S]->(:C {h: 3})").collect()
        got = rows(run(spark, g, """
            MATCH ((a)-[]-(b)-[]-(c) WHERE COUNT { (a)-[]->(:X) } > 0)+
            RETURN [n IN a | n.h] AS as_
        """))
        assert got == [([1],)]

    def test_pattern_expression_inside_qpp_where(self, spark, g):
        run(spark, g, "CREATE (:X)<-[:Z]-(:A {h: 1})-[:R]->(:B {h: 2})"
                      "-[:S]->(:C {h: 3})").collect()
        got = rows(run(spark, g, """
            MATCH ((a)-[]-(b)-[]-(c) WHERE (a)-[]->(:X))+
            RETURN [n IN a | n.h] AS as_
        """))
        assert got == [([1],)]

    def test_equijoin_on_unconditional_singletons(self, spark, g):
        run(spark, g,
            "CREATE (n:A {h: 1})-[:R]->(b:B {h: 2}), (b)-[:R]->(n)"
            ).collect()
        got = sorted(rows(run(spark, g, """
            MATCH (a)-[e]->*(b)-[f]->(c) WHERE a = c
            RETURN a.h AS ah, b.h AS bh, c.h AS ch
        """)))
        assert got == sorted([(2, 1, 2), (1, 2, 1)])

    def test_equijoin_with_group_variable_always_false(self, spark, g):
        run(spark, g, CHAIN3).collect()
        assert one(spark, g, """
            MATCH (a)-[e]->*(b)-[f]->(c) WHERE a = e
            RETURN count(*) AS count
        """) == 0


class TestQppInSubqueriesR6:
    def test_qpp_inside_exists_clause(self, spark, g):
        run(spark, g, """
            CREATE (:A {p: 1})
            CREATE (:A {p: 2})-[:K]->(:B)
            CREATE (:A {p: 3})-[:K]->()-[:K]->(:B)
        """).collect()
        got = sorted(r[0] for r in rows(run(spark, g, """
            MATCH (a:A) WHERE EXISTS { (a) (()-[:K]->())+ (:B) }
            RETURN a.p AS result
        """)))
        assert got == [2, 3]

    def test_qpp_inside_optional_match(self, spark, g):
        run(spark, g, """
            CREATE (:A {h: 0})
            CREATE (:A {h: 9})-[:K]->(:B {p: 1})
            CREATE (:A {h: 8})-[:K]->({h: 5})-[:K]->(:B {p: 2})
        """).collect()
        got = sorted((r[0] if r[0] is not None else -1)
                     for r in rows(run(spark, g, """
            MATCH (a:A)
            OPTIONAL MATCH (a) (()-[:K]->())+ (b:B)
            RETURN b.p AS result
        """)))
        assert got == [-1, 1, 2]


class TestQppPathProjectionR6:
    def test_path_over_plus(self, spark, g):
        run(spark, g, "CREATE (:A {h: 1})-[:R]->(:A:B {h: 2})"
                      "-[:R]->(:C {h: 3})").collect()
        got = sorted(one(spark, g, """
            MATCH p = ((x:A)-[y]->(z))+
            RETURN collect([n IN nodes(p) | n.h]) AS ps
        """))
        assert got == sorted([[1, 2], [2, 3], [1, 2, 3]])

    def test_path_over_plus_anonymous_start(self, spark, g):
        run(spark, g, "CREATE (:A {h: 1})-[:R]->(:A:B {h: 2})"
                      "-[:R]->(:C {h: 3})").collect()
        got = sorted(one(spark, g, """
            MATCH p = ((:A)-[y]->(z))+
            RETURN collect([n IN nodes(p) | n.h]) AS ps
        """))
        assert got == sorted([[1, 2], [2, 3], [1, 2, 3]])

    def test_path_over_juxtaposed_qpps(self, spark, g):
        run(spark, g, "CREATE (:A {h: 1})-[:R]->(:B {h: 2})"
                      "-[:R]->(:C {h: 3})-[:R]->(:D {h: 4})").collect()
        got = sorted(one(spark, g, """
            MATCH p = ((n)-[r]->(m)-[q]->(o))+ ((b)-[r2]->(y))*
            RETURN collect([n2 IN nodes(p) | n2.h]) AS ps
        """))
        assert got == sorted([[1, 2, 3], [2, 3, 4], [1, 2, 3, 4]])

    def test_incoming_direction_path_node_order(self, spark, g):
        run(spark, g, """
            CREATE (:T {id: 1})-[:NEXT]->(:T {id: 2})-[:NEXT]->
                   (:T {id: 3})-[:NEXT]->(:T {id: 4})-[:NEXT]->(:T {id: 5})
        """).collect()
        assert one(spark, g, """
            MATCH p = (a:T {id: 5}) ((b)<-[r:NEXT]-(c)){4} (d)
            RETURN [x IN nodes(p) | x.id] AS ids
        """) == [5, 4, 3, 2, 1]

    def test_matching_zero_times_kleene_star(self, spark, g):
        run(spark, g, "CREATE ({prop: 42})").collect()
        assert one(spark, g, """
            MATCH (a) ((:UnknownLabel)-->())*
            RETURN a.prop AS p
        """) == 42


class TestQppSyntaxGuardsR6:
    @pytest.mark.parametrize("quant", ["{1}", "{0, 1}", "{1, 2}", "+", "*"])
    def test_quantified_single_node_rejected(self, spark, g, quant):
        with pytest.raises(Exception):
            run(spark, g,
                "MATCH (()) %s RETURN count(*) AS n" % quant).collect()

    @pytest.mark.parametrize("quant", ["{0, 1}", "{0, }", "*"])
    def test_possibly_empty_top_level_rejected(self, spark, g, quant):
        with pytest.raises(Exception):
            run(spark, g,
                "MATCH (()--())%s RETURN count(*) AS n" % quant).collect()

    def test_top_level_kleene_star_with_vars_rejected(self, spark, g):
        with pytest.raises(Exception):
            run(spark, g, "MATCH ((a)-->(b))* RETURN *").collect()

    @pytest.mark.parametrize("quant",
                             ["{3,2}", "{-1}", "{0}", "{0, 0}", "{, 0}"])
    def test_bad_bounds_rejected(self, spark, g, quant):
        with pytest.raises(Exception):
            run(spark, g,
                "MATCH ()((a)-->(b))%s RETURN *" % quant).collect()

    def test_nested_qpp_rejected(self, spark, g):
        with pytest.raises(Exception):
            run(spark, g,
                "MATCH (((a)-[b]->(c))*)+ RETURN *").collect()

    def test_group_variable_reuse_rejected_single_match(self, spark, g):
        with pytest.raises(Exception):
            run(spark, g,
                "MATCH ((a)-[b]->(c))+ (d)-[b]->(f) RETURN *").collect()

    def test_group_variable_reuse_rejected_across_matches(self, spark, g):
        with pytest.raises(Exception):
            run(spark, g, """
                MATCH ((a)-[b]->(c))+
                MATCH (d)-[b]->(f)
                RETURN *
            """).collect()

    def test_group_node_variable_reuse_rejected(self, spark, g):
        with pytest.raises(Exception):
            run(spark, g,
                "MATCH ((a)-[b]->(c))+ (d)-[e]->(a) RETURN *").collect()
