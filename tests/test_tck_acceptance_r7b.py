"""TCK-style acceptance tranche 7b: legacy MERGE shapes, uniqueness-
constraint enforcement, and index-coexistence scenarios — behavior-ported
from the reference's acceptance corpus (community/cypher/spec-suite-tools/
src/test/resources/acceptance/features/{MergeLegacyAcceptance,
ConstraintAcceptance,IndexAcceptance,ExplainAcceptance}.feature) with
fresh wording."""

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


def n_nodes(g):
    return sum(v.count() for v in g.node_frames.values())


def n_rels(g):
    return sum(v.count() for v in g.rel_frames.values())


class TestMergeLegacy:
    def test_single_bound_node(self, spark, g):
        run(spark, g, "CREATE (:A)").collect()
        got = rows(run(spark, g,
                       "MATCH (a:A) MERGE (a)-[r:TYPE]->() "
                       "RETURN count(r) AS c"))
        assert got == [(1,)]
        assert n_nodes(g) == 2 and n_rels(g) == 1

    def test_longer_pattern(self, spark, g):
        run(spark, g, "CREATE (:A)").collect()
        got = rows(run(spark, g,
                       "MATCH (a:A) MERGE (a)-[r:TYPE]->()<-[:TYPE]-() "
                       "RETURN count(r) AS c"))
        assert got == [(1,)]
        assert n_nodes(g) == 3 and n_rels(g) == 2

    def test_bound_node_mid_pattern(self, spark, g):
        run(spark, g, "CREATE (:B)").collect()
        got = rows(run(spark, g, """
            MATCH (b:B) MERGE (a)-[r1:TYPE]->(b)<-[r2:TYPE]-(c)
            RETURN type(r1) AS t1, type(r2) AS t2
        """))
        assert got == [("TYPE", "TYPE")]
        assert n_nodes(g) == 3 and n_rels(g) == 2

    def test_bound_mid_pattern_partial_match_creates_whole(self, spark, g):
        run(spark, g,
            "CREATE (a:A), (b:B) CREATE (a)-[:TYPE]->(b)").collect()
        got = rows(run(spark, g, """
            MATCH (b:B) MERGE (a:A)-[r1:TYPE]->(b)<-[r2:TYPE]-(c:C)
            RETURN type(r1) AS t1, type(r2) AS t2
        """))
        assert got == [("TYPE", "TYPE")]
        assert n_nodes(g) == 4 and n_rels(g) == 3

    def test_named_path_on_merge(self, spark, g):
        got = rows(run(spark, g, """
            MERGE (a:A) MERGE p = (a)-[:R]->()
            RETURN length(p) AS len
        """))
        assert got == [(1,)]
        assert n_nodes(g) == 2 and n_rels(g) == 1

    def test_unbound_pattern(self, spark, g):
        run(spark, g,
            "MERGE ({name: 'Andres'})-[:R]->({name: 'Emil'})").collect()
        assert n_nodes(g) == 2 and n_rels(g) == 1

    def test_rebinding_with_new_predicates_raises(self, spark, g):
        with pytest.raises(Exception):
            run(spark, g,
                "MERGE (a:Foo)-[r:KNOWS]->(a:Bar)").collect()

    def test_pattern_comprehension_in_merge_props(self, spark, g):
        got = rows(run(spark, g, """
            MERGE (n {k: ([ ()<-[r0]-() | 1 ] <= [1])})
            RETURN n.k AS prop
        """))
        assert got == [(True,)]
        assert n_nodes(g) == 1


class TestUniqueConstraintMerge:
    def _uniq(self, spark, g, label="Label", prop="prop"):
        run(spark, g,
            f"CREATE CONSTRAINT FOR (n:{label}) "
            f"REQUIRE n.{prop} IS UNIQUE").collect()

    def test_merge_matches_existing(self, spark, g):
        self._uniq(spark, g)
        run(spark, g, "CREATE (:Label {prop: 42})").collect()
        got = rows(run(spark, g,
                       "MERGE (a:Label {prop: 42}) RETURN a.prop AS p"))
        assert got == [(42,)]
        assert n_nodes(g) == 1

    def test_merge_creates_on_miss(self, spark, g):
        self._uniq(spark, g)
        run(spark, g, "CREATE (:Label {prop: 42})").collect()
        got = rows(run(spark, g,
                       "MERGE (a:Label {prop: 11}) RETURN a.prop AS p"))
        assert got == [(11,)]
        assert n_nodes(g) == 2

    def test_merge_match_and_miss(self, spark, g):
        self._uniq(spark, g)
        run(spark, g, "CREATE (:Label {prop: 42})").collect()
        got = rows(run(spark, g, """
            UNWIND [42, 11] AS x
            MERGE (a:Label {prop: x}) RETURN a.prop AS p
        """))
        assert sorted(got) == [(11,), (42,)]
        assert n_nodes(g) == 2

    def test_merge_on_match_update(self, spark, g):
        self._uniq(spark, g, "Person", "id")
        run(spark, g,
            "CREATE (:Person {id: 23, country: 'Sweden'})").collect()
        got = rows(run(spark, g, """
            MERGE (a:Person {id: 23})
            ON MATCH SET a.country = 'Norway'
            RETURN a.country AS c
        """))
        assert got == [("Norway",)]
        assert n_nodes(g) == 1

    def test_merge_update_existing_and_create_missing(self, spark, g):
        self._uniq(spark, g, "Person", "id")
        run(spark, g, "CREATE (:Person {id: 23})").collect()
        run(spark, g, """
            UNWIND [23, 24] AS x
            MERGE (a:Person {id: x}) ON CREATE SET a.fresh = true
        """).collect()
        got = rows(run(spark, g,
                       "MATCH (p:Person) RETURN p.id AS i, "
                       "p.fresh AS f ORDER BY i"))
        assert got == [(23, None), (24, True)]

    def test_create_violating_constraint_raises(self, spark, g):
        self._uniq(spark, g, "Person", "id")
        run(spark, g, "CREATE (:Person {id: 666})").collect()
        with pytest.raises(Exception, match="onstraint"):
            run(spark, g,
                "CREATE (a:A) MERGE (a)-[:KNOWS]->(b:Person {id: 666})"
                ).collect()

    def test_create_duplicate_in_one_statement_raises(self, spark, g):
        self._uniq(spark, g, "Person", "id")
        with pytest.raises(Exception, match="onstraint"):
            run(spark, g,
                "UNWIND [7, 7] AS x CREATE (:Person {id: x})").collect()

    def test_merge_multilabel_clashing_uniques_raises(self, spark, g):
        self._uniq(spark, g, "Person", "id")
        self._uniq(spark, g, "User", "id")
        run(spark, g,
            "CREATE (:Person {id: 23}), (:User {id: 23})").collect()
        with pytest.raises(Exception, match="onstraint"):
            run(spark, g, "MERGE (a:Person:User {id: 23})").collect()

    def test_merge_two_uniques_partial_match_raises(self, spark, g):
        self._uniq(spark, g, "Person", "id")
        self._uniq(spark, g, "Person", "email")
        run(spark, g, "CREATE (:Person {id: 23}), "
                      "(:Person {email: 'smth@example.com'})").collect()
        with pytest.raises(Exception, match="onstraint"):
            run(spark, g, "MERGE (a:Person {id: 23, "
                          "email: 'smth@example.com'})").collect()

    def test_merge_two_uniques_single_node_match(self, spark, g):
        self._uniq(spark, g, "Person", "id")
        self._uniq(spark, g, "Person", "email")
        run(spark, g, "CREATE (:Person {id: 23, "
                      "email: 'smth@example.com'})").collect()
        got = rows(run(spark, g, """
            MERGE (a:Person {id: 23, email: 'smth@example.com'})
            RETURN a.id AS i
        """))
        assert got == [(23,)]
        assert n_nodes(g) == 1

    def test_merge_two_uniques_create_when_none(self, spark, g):
        self._uniq(spark, g, "Person", "id")
        self._uniq(spark, g, "Person", "email")
        got = rows(run(spark, g, """
            MERGE (a:Person {id: 23, email: 'smth@example.com'})
            RETURN a.id AS i
        """))
        assert got == [(23,)]
        assert n_nodes(g) == 1

    def test_unrelated_nodes_same_property_no_clash(self, spark, g):
        self._uniq(spark, g, "Person", "id")
        run(spark, g, """
            CREATE (:Person {id: 666}), (:Dog {id: 666}),
                   ({id: 666})
        """).collect()
        assert n_nodes(g) == 3

    def test_multiple_labels_uniqueness(self, spark, g):
        self._uniq(spark, g, "L1", "p")
        run(spark, g, "CREATE (:L1:L2 {p: 1})").collect()
        # same key, same constrained label -> blocked
        with pytest.raises(Exception, match="onstraint"):
            run(spark, g, "CREATE (:L1:L3 {p: 1})").collect()

    def test_null_key_is_exempt(self, spark, g):
        self._uniq(spark, g, "Person", "id")
        run(spark, g,
            "UNWIND [1, 2] AS x CREATE (:Person {other: x})").collect()
        assert n_nodes(g) == 2

    def test_constraint_in_tx_batch_rolls_back(self, spark, g):
        # a constraint violation inside CALL IN TRANSACTIONS rolls back
        # ONLY the offending batch under ON ERROR CONTINUE
        self._uniq(spark, g, "P", "id")
        run(spark, g, """
            UNWIND [1, 2, 2, 3] AS x
            CALL { WITH x CREATE (:P {id: x}) }
            IN TRANSACTIONS OF 1 ROW ON ERROR CONTINUE
        """).collect()
        got = rows(run(spark, g,
                       "MATCH (p:P) RETURN p.id AS i ORDER BY i"))
        assert got == [(1,), (2,), (3,)]


class TestIndexCoexistence:
    """Queries stay correct when range indexes exist (the engine's
    'index' is parquet scan pruning — the catalog entry must not change
    results)."""

    def _idx(self, spark, g, label, prop):
        run(spark, g,
            f"CREATE INDEX FOR (n:{label}) ON (n.{prop})").collect()
        run(spark, g, "CALL db.awaitIndexes()").collect()

    def test_literal_left_of_inequality(self, spark, g):
        run(spark, g, "CREATE (:Product {unitsInStock: 8}) "
                      "CREATE (:Product {unitsInStock: 12})").collect()
        self._idx(spark, g, "Product", "unitsInStock")
        got = rows(run(spark, g, """
            MATCH (p:Product) WHERE 10 < p.unitsInStock
            RETURN p.unitsInStock AS u
        """))
        assert got == [(12,)]

    def test_literal_right_of_inequality(self, spark, g):
        run(spark, g, "CREATE (:Product {unitsInStock: 8}) "
                      "CREATE (:Product {unitsInStock: 12})").collect()
        self._idx(spark, g, "Product", "unitsInStock")
        got = rows(run(spark, g, """
            MATCH (p:Product) WHERE p.unitsInStock > 10
            RETURN p.unitsInStock AS u
        """))
        assert got == [(12,)]

    def test_merge_indexed_and_unindexed_props(self, spark, g):
        self._idx(spark, g, "Person", "name")
        run(spark, g,
            "MERGE (p:Person {name: 'Lasse', id: 42})").collect()
        assert n_nodes(g) == 1

    def test_merge_two_indexed_props(self, spark, g):
        self._idx(spark, g, "Person", "name")
        self._idx(spark, g, "Person", "id")
        run(spark, g,
            "MERGE (p:Person {name: 'Lasse', id: 42})").collect()
        assert n_nodes(g) == 1

    def test_merge_from_match_with_index(self, spark, g):
        run(spark, g, """
            CREATE (:Person {name: 'A', bornIn: 'New York'}),
                   (:Person {name: 'B', bornIn: 'Ohio'}),
                   (:Person {name: 'C', bornIn: 'New Jersey'}),
                   (:Person {name: 'D', bornIn: 'New York'}),
                   (:Person {name: 'E', bornIn: 'Ohio'}),
                   (:Person {name: 'F', bornIn: 'New Jersey'})
        """).collect()
        self._idx(spark, g, "City", "name")
        run(spark, g,
            "MATCH (p:Person) MERGE (c:City {name: p.bornIn})").collect()
        got = rows(run(spark, g,
                       "MATCH (c:City) RETURN count(*) AS n"))
        assert got == [(3,)]

    def test_merge_multilabel_with_index(self, spark, g):
        run(spark, g, "CREATE (:L:A {prop: 42})").collect()
        self._idx(spark, g, "L", "prop")
        got = rows(run(spark, g, """
            MERGE (t:L:B {prop: 42}) RETURN labels(t) AS ls
        """))
        assert sorted(got[0][0]) == ["B", "L"]
        # :L:A does not match :L:B -> a new node was created
        got2 = rows(run(spark, g, "MATCH (n:L) RETURN count(*) AS n"))
        assert got2 == [(2,)]

    def test_and_or_equality_with_indexes(self, spark, g):
        run(spark, g, """
            UNWIND range(1, 100) AS x
            CREATE (u:User {prop1: x, prop2: x})
        """).collect()
        self._idx(spark, g, "User", "prop1")
        self._idx(spark, g, "User", "prop2")
        got = rows(run(spark, g, """
            MATCH (c:User)
            WHERE ((c.prop1 = 1 AND c.prop2 = 1)
                   OR (c.prop1 = 11 AND c.prop2 = 11))
            RETURN c.prop1 AS p ORDER BY p
        """))
        assert got == [(1,), (11,)]

    def test_starts_with_null_prefix(self, spark, g):
        run(spark, g, "CREATE (:Person {name: 'Jack'})").collect()
        self._idx(spark, g, "Person", "name")
        got = rows(run(spark, g, """
            MATCH (p:Person) WHERE p.name STARTS WITH null
            RETURN p.name AS n
        """))
        assert got == []

    def test_index_seek_null_value(self, spark, g):
        run(spark, g, "CREATE (:Person {name: 'Jack'})").collect()
        self._idx(spark, g, "Person", "name")
        got = rows(run(spark, g, """
            MATCH (p:Person) WHERE p.name = null RETURN p.name AS n
        """))
        assert got == []


class TestExplainShapes:
    def test_explain_standalone_procedure(self, spark, g):
        df = run(spark, g, "EXPLAIN CALL db.labels()")
        assert df.columns == ["label"]
        assert df.collect() == []

    def test_explain_in_query_procedure(self, spark, g):
        df = run(spark, g,
                 "EXPLAIN CALL db.labels() YIELD label RETURN *")
        assert df.columns == ["label"]
        assert df.collect() == []

    def test_explain_query_with_columns(self, spark, g):
        run(spark, g, "CREATE (:A)-[:R]->(:B)").collect()
        df = run(spark, g, "EXPLAIN MATCH (a)-[r]->(b) RETURN a, r, b")
        assert df.columns == ["a", "r", "b"]
        assert df.collect() == []
