"""TCK-style acceptance tranche 6 (round 6): operator chaining, DELETE /
REMOVE snapshot visibility, FOREACH + MERGE interplay, GPM syntax mixing,
and miscellaneous regression scenarios — behavior-ported from the
reference's acceptance corpus (community/cypher/spec-suite-tools/src/test/
resources/acceptance/features/{OperatorChaining,DeleteAcceptance,
RemoveAcceptance,ForeachAcceptance,GpmSyntaxMixingAcceptance,
MiscAcceptance}.feature) with fresh fixtures and wording."""

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


class TestOperatorChainingR6:
    def test_integer_comparison_chains(self, spark, g):
        got = rows(run(spark, g, """
            RETURN 1 < 2 < 3 < 4 AS t1,
                   1 < 3 < 2 < 4 AS t2,
                   1 < 2 < 2 < 4 AS t3,
                   1 < 2 <= 2 < 4 AS t4
        """))
        assert got == [(True, False, False, True)]

    def test_float_comparison_chains(self, spark, g):
        got = rows(run(spark, g, """
            RETURN 1.0 < 2.1 < 3.2 < 4.6 AS t1,
                   1.0 < 3.2 < 2.1 < 4.6 AS t2,
                   1.0 < 2.1 < 2.1 < 4.6 AS t3,
                   1.0 < 2.1 <= 2.1 < 4.6 AS t4
        """))
        assert got == [(True, False, False, True)]

    def test_string_comparison_chains(self, spark, g):
        got = rows(run(spark, g, """
            RETURN 'a' < 'b' < 'c' < 'd' AS t1,
                   'a' < 'c' < 'b' < 'd' AS t2,
                   'a' < 'b' < 'b' < 'd' AS t3,
                   'a' < 'b' <= 'b' < 'd' AS t4
        """))
        assert got == [(True, False, False, True)]

    def test_mixed_direction_chain(self, spark, g):
        # a < b > c is (a < b) AND (b > c)
        got = rows(run(spark, g,
                       "RETURN 1 < 3 > 2 AS t1, 1 < 3 > 5 AS t2"))
        assert got == [(True, False)]

    def test_chain_with_null_is_null(self, spark, g):
        assert one(spark, g, "RETURN 1 < null < 3 AS t") is None

    def test_equality_chain(self, spark, g):
        # chaining applies to '=' too: a = b = c is (a = b) AND (b = c)
        got = rows(run(spark, g,
                       "RETURN 1 = 1 = true AS t1, 1 = 1 = 1 AS t2"))
        assert got == [(False, True)]


class TestDeleteVisibilityR6:
    def test_return_properties_of_deleted_node(self, spark, g):
        got = rows(run(spark, g, """
            CREATE (:L {prop1: 42, prop2: 1337})
            WITH 1 AS one
            MATCH (n:L)
            WITH n, properties(n) AS props
            DELETE n
            RETURN props
        """))
        assert len(got) == 1
        assert got[0][0].asDict() == {"prop1": 42, "prop2": 1337}

    def test_deleted_node_gone(self, spark, g):
        run(spark, g, "CREATE (:L {p: 1}), (:L {p: 2})").collect()
        run(spark, g, "MATCH (n:L {p: 1}) DELETE n").collect()
        assert one(spark, g, "MATCH (n:L) RETURN count(*) AS c") == 1

    def test_detach_delete_removes_rels(self, spark, g):
        run(spark, g, "CREATE (:A)-[:REL]->(:B)<-[:REL]-(:C)").collect()
        run(spark, g, "MATCH (b:B) DETACH DELETE b").collect()
        assert one(spark, g,
                   "MATCH ()-[r]->() RETURN count(*) AS c") == 0
        assert one(spark, g, "MATCH (n) RETURN count(*) AS c") == 2

    def test_nodetach_delete_on_isolated_node(self, spark, g):
        run(spark, g, "CREATE (:L)").collect()
        run(spark, g, "MATCH (n:L) NODETACH DELETE n").collect()
        assert one(spark, g, "MATCH (n) RETURN count(*) AS c") == 0

    def test_nodetach_delete_connected_raises(self, spark, g):
        run(spark, g, "CREATE (:L)-[:R]->(:G)").collect()
        with pytest.raises(Exception):
            run(spark, g, "MATCH (n:L) NODETACH DELETE n").collect()

    def test_plain_delete_connected_raises(self, spark, g):
        run(spark, g, "CREATE (:L)-[:R]->(:G)").collect()
        with pytest.raises(Exception):
            run(spark, g, "MATCH (n:L) DELETE n").collect()

    def test_delete_all_rows_snapshot(self, spark, g):
        # every row deletes against the SAME snapshot: no row-by-row
        # visibility (DeleteAcceptance)
        run(spark, g, "CREATE ()-[:REL]->()<-[:REL]-()").collect()
        run(spark, g, "MATCH (n)-->() DETACH DELETE n").collect()
        assert one(spark, g, "MATCH (n) RETURN count(*) AS c") == 1
        assert one(spark, g,
                   "MATCH ()-[r]->() RETURN count(*) AS c") == 0


class TestRemoveVisibilityR6:
    def test_remove_property_snapshot(self, spark, g):
        run(spark, g,
            "CREATE ({id: 0, v: 'a'}), ({id: 1, v: 'b'})").collect()
        run(spark, g, "MATCH (n) REMOVE n.v").collect()
        got = rows(run(spark, g,
                       "MATCH (n) RETURN n.v AS v"))
        assert got == [(None,), (None,)]

    def test_remove_label_snapshot(self, spark, g):
        run(spark, g, "CREATE (:A:B {p: 1}), (:A:B {p: 2})").collect()
        run(spark, g, "MATCH (n:A) REMOVE n:B").collect()
        assert one(spark, g, "MATCH (n:B) RETURN count(*) AS c") == 0
        assert one(spark, g, "MATCH (n:A) RETURN count(*) AS c") == 2


class TestForeachMergeR6:
    def test_add_labels_inside_foreach(self, spark, g):
        run(spark, g, "CREATE (), (), ()").collect()
        run(spark, g, """
            MATCH (n)
            FOREACH (i IN [1] | SET n:Marked)
        """).collect()
        assert one(spark, g,
                   "MATCH (n:Marked) RETURN count(*) AS c") == 3

    def test_merge_inside_foreach_with_matched_node(self, spark, g):
        run(spark, g, "CREATE (:Root {id: 1})").collect()
        run(spark, g, """
            MATCH (r:Root)
            FOREACH (i IN [1, 2, 3] |
              MERGE (r)-[:HAS]->(:Item {id: i}))
        """).collect()
        assert one(spark, g, """
            MATCH (:Root)-[:HAS]->(i:Item) RETURN count(*) AS c
        """) == 3
        # idempotent: same FOREACH again creates nothing new
        run(spark, g, """
            MATCH (r:Root)
            FOREACH (i IN [1, 2, 3] |
              MERGE (r)-[:HAS]->(:Item {id: i}))
        """).collect()
        assert one(spark, g,
                   "MATCH (i:Item) RETURN count(*) AS c") == 3

    def test_nested_foreach(self, spark, g):
        run(spark, g, "CREATE (:Root)").collect()
        run(spark, g, """
            MATCH (r:Root)
            FOREACH (x IN [1, 2] |
              FOREACH (y IN [1, 2] |
                CREATE (:Cell {x: x, y: y})))
        """).collect()
        assert one(spark, g,
                   "MATCH (c:Cell) RETURN count(*) AS c") == 4
        got = sorted(rows(run(spark, g,
                              "MATCH (c:Cell) RETURN c.x AS x, c.y AS y")))
        assert got == [(1, 1), (1, 2), (2, 1), (2, 2)]

    def test_merge_in_foreach_loop_counts(self, spark, g):
        run(spark, g, """
            FOREACH (v IN [1, 1, 2, 2, 3] | MERGE (:V {v: v}))
        """).collect()
        assert one(spark, g, "MATCH (n:V) RETURN count(*) AS c") == 3


class TestGpmSyntaxMixingR6:
    def test_colon_conjunction_with_vlr(self, spark, g):
        run(spark, g,
            "CREATE (:A:B {p: 1})-[:R]->(:A:B {p: 2})-[:R]->"
            "(:A:B {p: 3})").collect()
        got = sorted(r[0] for r in rows(run(spark, g, """
            MATCH (a:A:B)-[*1..2]->(b:A:B) RETURN b.p AS p
        """)))
        assert got == [2, 3, 3]

    def test_colon_conjunction_with_type_disjunction(self, spark, g):
        run(spark, g,
            "CREATE (:A:B {p: 1})-[:R]->({p: 2}), "
            "(:A:B {p: 3})-[:S]->({p: 4})").collect()
        got = sorted(r[0] for r in rows(run(spark, g, """
            MATCH (a:A:B)-[:R|S]->(b) RETURN b.p AS p
        """)))
        assert got == [2, 4]

    def test_qpp_with_colon_conjunction_inside(self, spark, g):
        run(spark, g, "CREATE (:A:B {p: 1})-[:R]->(:A:B {p: 2})"
                      "-[:R]->(:C {p: 3})").collect()
        got = sorted(rows(run(spark, g, """
            MATCH ((x:A:B)-[:R]->(y))+ RETURN size(x) AS n
        """)))
        assert got == [(1,), (1,), (2,)]

    def test_shortest_k_and_legacy_shortestpath_separate_clauses(
            self, spark, g):
        run(spark, g,
            "CREATE (a:A)-[:R]->(:B)-[:R]->(:C)-[:R]->(:D)-[:R]->(a)"
            ).collect()
        assert one(spark, g, """
            MATCH p = shortestPath((:A)-[*]-(:D))
            MATCH q = SHORTEST 1 (:A)-[*]-(:D)
            RETURN nodes(p) = nodes(q) AS result
        """) is True

    def test_is_and_colon_introducers_mixed_statements(self, spark, g):
        run(spark, g, "CREATE (:A {p: 1})").collect()
        run(spark, g, "MATCH (n:A) SET n IS B").collect()
        assert one(spark, g,
                   "MATCH (n IS B) RETURN count(*) AS c") == 1
        run(spark, g, "MATCH (n:A) REMOVE n IS B").collect()
        assert one(spark, g,
                   "MATCH (n:B) RETURN count(*) AS c") == 0

    def test_vlr_with_inline_predicate(self, spark, g):
        run(spark, g, "CREATE ({p: 1})-[:R {w: 1}]->({p: 2})"
                      "-[:R {w: 9}]->({p: 3})").collect()
        got = sorted(r[0] for r in rows(run(spark, g, """
            MATCH ()-[r:R WHERE r.w < 5]->(b) RETURN b.p AS p
        """)))
        assert got == [2]


class TestMiscRegressionsR6:
    def test_with_reused_variable_names_keep_order_key(self, spark, g):
        got = [r[0] for r in rows(run(spark, g, """
            UNWIND [1, 2, 3, 4, 5] AS a
            WITH a, a * 2 AS b
            WITH a
            WITH a, -a AS b
            RETURN a
            ORDER BY b
        """))]
        assert got == [5, 4, 3, 2, 1]

    def test_pattern_comprehension_indexed_by_count_sub(self, spark, g):
        # [()-[]-()|1][count{()}] with empty graph -> index past end ->
        # null (GitHub #13190 shape)
        assert one(spark, g,
                   "RETURN [()-[]-() | 1][count { () }] AS result") is None

    def test_pattern_comprehension_indexed_variant(self, spark, g):
        run(spark, g, "CREATE ()-[:B]->()").collect()
        assert one(spark, g,
                   "RETURN [()-[]-() | 2][count { () } - 2] AS result") == 2

    def test_all_rel_props_filter_on_path(self, spark, g):
        # MiscAcceptance #13165 shape (shrunk): var-length over two types
        # + all() over relationships(p) + rebind of last rel
        run(spark, g, """
            CREATE (c0:C {id: 'c0'}), (c1:C {id: 'c1'}), (c2:C {id: 'c2'}),
                   (c3:C {id: 'c3'})
            CREATE (c0)-[:BEN {id: 'b1', keep: true}]->(c1),
                   (c1)-[:BEN {id: 'b2', keep: true}]->(c2),
                   (c2)-[:BEN {id: 'b3', keep: false}]->(c3)
        """).collect()
        got = sorted(rows(run(spark, g, """
            MATCH p = ({id: 'c0'})-[:BEN*]->(n)
            WHERE all(r IN relationships(p) WHERE r.keep)
            WITH *, last(relationships(p)) AS edge
            OPTIONAL MATCH (pn)-[edge]->(n)
            RETURN pn.id AS pid, n.id AS nid, edge.id AS eid
        """)))
        assert got == sorted([("c0", "c1", "b1"), ("c1", "c2", "b2")])

    def test_union_all_with_call_merge_branch(self, spark, g):
        got = rows(run(spark, g, """
            CALL { MERGE () }
            RETURN null AS n0
            UNION ALL
            MATCH ()
            MATCH ()<-[:((!A&B)&(C|D))]-()
            RETURN null AS n0
        """))
        assert got == [(None,)]

    def test_union_all_with_call_merge_branch_existing_rels(self, spark,
                                                            g):
        run(spark, g, "CREATE ()-[:B]->(), ()-[:C]->()").collect()
        got = rows(run(spark, g, """
            CALL { MERGE () }
            RETURN null AS n0
            UNION ALL
            MATCH ()
            MATCH ()<-[:((!A&B)&(C|D))]-()
            RETURN null AS n0
        """))
        assert got == [(None,)]
