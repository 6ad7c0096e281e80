"""TCK-style acceptance tranche 8f — deeper behavior port of
ExistsExpressionAcceptance.feature (community/cypher/spec-suite-tools/
src/test/resources/acceptance/features/), the scenarios rounds 4-7 left
uncovered: inner ORDER BY/SKIP/LIMIT/DISTINCT (row-count semantics seen
through EXISTS), union and CALL bodies, EXISTS inlined in node/rel
patterns, EXISTS as a value (equality, function argument, SET, CREATE
props, join keys), scoping/shadowing edge cases, bound-relationship
reuse in inner patterns, and aggregation bodies that always emit a row.
Same persons-and-dogs fixture as the feature's Background."""

import pytest

# conformance tranche: excluded from the default (core) run so the
# driver's verify window can finish; run with `pytest -m acceptance`
pytestmark = pytest.mark.acceptance


from neo4j_spark.api import cypher
from neo4j_spark.graph import PropertyGraph


@pytest.fixture()
def g(spark):
    g = PropertyGraph({}, {})
    cypher(spark, """
        CREATE (:Person {name: 'Alice', id: 0, canAffordDog: false}),
          (:Person {name: 'Bosse', lastname: 'Bobson', id: 1,
                    canAffordDog: true})
            -[:HAS_DOG {since: 2016}]->(:Dog {name: 'Bosse'}),
          (fidoDog:Dog {name: 'Fido'})
            <-[:HAS_DOG {since: 2010}]-
          (:Person {name: 'Chris', id: 2, canAffordDog: false})
            -[:HAS_DOG {since: 2018}]->(ozzyDog:Dog {name: 'Ozzy'}),
          (fidoDog)-[:HAS_FRIEND]->(ozzyDog)
    """, g).collect()
    return g


def run(spark, g, q, **params):
    return cypher(spark, q, g, params=params or None)


def rows(df):
    return [tuple(r) for r in df.collect()]


def names(spark, g, q, **params):
    return sorted(r[0] for r in rows(run(spark, g, q, **params)))


def bools(spark, g, q):
    return sorted(r[0] for r in rows(run(spark, g, q)))


class TestExistsInnerTrailingClauses:
    """EXISTS sees the body's ROW COUNT after ORDER BY/SKIP/LIMIT/
    DISTINCT run — SKIP 1 means 'at least two matches', LIMIT 0 is
    always false, ORDER BY/DISTINCT don't change emptiness."""

    def test_where_with_order_by(self, spark, g):
        assert names(spark, g, """
            MATCH (n:Person)
            WHERE EXISTS { MATCH (n)-[:HAS_DOG]->(m)
                           RETURN m ORDER BY m.name }
            RETURN n.name AS name
        """) == ["Bosse", "Chris"]

    def test_return_with_order_by(self, spark, g):
        assert bools(spark, g, """
            MATCH (n:Person)
            RETURN EXISTS { MATCH (n)-[:HAS_DOG]->(m)
                            RETURN m ORDER BY m.name } AS hasDog
        """) == [False, True, True]

    def test_where_with_skip_means_at_least_two(self, spark, g):
        assert names(spark, g, """
            MATCH (n:Person)
            WHERE EXISTS { MATCH (n)-[:HAS_DOG]->(m) RETURN m SKIP 1 }
            RETURN n.name AS name
        """) == ["Chris"]

    def test_return_with_skip(self, spark, g):
        assert bools(spark, g, """
            MATCH (n:Person)
            RETURN EXISTS { MATCH (n)-[:HAS_DOG]->(m)
                            RETURN m SKIP 1 } AS hasDogs
        """) == [False, False, True]

    def test_where_with_limit_zero_is_false(self, spark, g):
        assert names(spark, g, """
            MATCH (n:Person)
            WHERE EXISTS { MATCH (n)-[:HAS_DOG]->(m) RETURN m LIMIT 0 }
            RETURN n.name AS name
        """) == []

    def test_return_with_limit_zero(self, spark, g):
        assert bools(spark, g, """
            MATCH (n:Person)
            RETURN EXISTS { MATCH (n)-[:HAS_DOG]->(m)
                            RETURN m LIMIT 0 } AS hasDog
        """) == [False, False, False]

    def test_where_with_order_skip_limit(self, spark, g):
        assert names(spark, g, """
            MATCH (n:Person)
            WHERE EXISTS { MATCH (n)-[:HAS_DOG]->(m)
                           RETURN m ORDER BY m.name SKIP 1 LIMIT 1 }
            RETURN n.name AS name
        """) == ["Chris"]

    def test_return_with_order_skip_limit(self, spark, g):
        assert bools(spark, g, """
            MATCH (n:Person)
            RETURN EXISTS { MATCH (n)-[:HAS_DOG]->(m)
                            RETURN m ORDER BY m.name SKIP 1 LIMIT 1
                          } AS hasDogs
        """) == [False, False, True]

    def test_where_with_distinct(self, spark, g):
        assert names(spark, g, """
            MATCH (n:Person)
            WHERE EXISTS { MATCH (n)-[:HAS_DOG]->(m) RETURN DISTINCT m }
            RETURN n.name AS name
        """) == ["Bosse", "Chris"]

    def test_return_with_distinct(self, spark, g):
        assert bools(spark, g, """
            MATCH (n:Person)
            RETURN EXISTS { MATCH (n)-[:HAS_DOG]->(m)
                            RETURN DISTINCT m } AS hasDog
        """) == [False, True, True]


class TestExistsInlinedInPatterns:
    def test_in_node_pattern_unnamed_inner(self, spark, g):
        assert names(spark, g, """
            MATCH (n:Person WHERE EXISTS { MATCH (n)-[]->(:Dog) })
            RETURN n.name AS name
        """) == ["Bosse", "Chris"]

    def test_in_node_pattern_named_inner(self, spark, g):
        assert names(spark, g, """
            MATCH (n:Person WHERE EXISTS { MATCH (n)-[]->(dog:Dog) })
            RETURN n.name AS name
        """) == ["Bosse", "Chris"]

    def test_nested_inlined_in_node_pattern(self, spark, g):
        # both the person and the dog named Bosse satisfy a.name match
        assert names(spark, g, """
            MATCH (a WHERE EXISTS {
                MATCH (n WHERE n.name = a.name)-[r:HAS_DOG]->() })
            RETURN a.name AS name
        """) == ["Bosse", "Bosse", "Chris"]

    def test_nested_inlined_xor_in_node_pattern(self, spark, g):
        # only the person with NO outgoing rel: false XOR true = true
        assert names(spark, g, """
            MATCH (n:Person)
            WHERE EXISTS {
              MATCH (n WHERE EXISTS { MATCH (n)-[r]->() } XOR true) }
            RETURN n.name AS name
        """) == ["Alice"]

    def test_exists_function_inlined_in_node_pattern(self, spark, g):
        assert names(spark, g, """
            MATCH (n:Person WHERE exists((n)-[]->(:Dog)))
            RETURN n.name AS name
        """) == ["Bosse", "Chris"]

    def test_in_rel_pattern_unnamed_inner(self, spark, g):
        assert names(spark, g, """
            MATCH (n:Person)-[r WHERE EXISTS {
                MATCH (n)-[]->(:Dog) }]->(m)
            RETURN n.name AS name
        """) == ["Bosse", "Chris", "Chris"]

    def test_in_rel_pattern_named_inner(self, spark, g):
        assert names(spark, g, """
            MATCH (n:Person)-[r WHERE EXISTS {
                MATCH (n)-[]->(dog:Dog) }]->(m)
            RETURN n.name AS name
        """) == ["Bosse", "Chris", "Chris"]

    def test_nested_inlined_in_rel_pattern(self, spark, g):
        assert names(spark, g, """
            MATCH (a)-[WHERE EXISTS {
                MATCH (n:Person)-[r WHERE n.name = a.name]->() }]->()
            RETURN a.name AS name
        """) == ["Bosse", "Chris", "Chris"]

    def test_nested_inlined_xor_in_rel_pattern(self, spark, g):
        # every rel source has an outgoing rel: true XOR true = false
        assert names(spark, g, """
            MATCH (n:Person)
            WHERE EXISTS {
              MATCH (n)-[WHERE EXISTS { MATCH (n)-[r]->() }
                         XOR true]->() }
            RETURN n.name AS name
        """) == []

    def test_exists_function_inlined_in_rel_pattern(self, spark, g):
        assert names(spark, g, """
            MATCH (n:Person)-[r WHERE exists((n)-[]->(:Dog))]->(m)
            RETURN n.name AS name
        """) == ["Bosse", "Chris", "Chris"]


class TestExistsUnionAndCallBodies:
    def test_union_body(self, spark, g):
        assert bools(spark, g, """
            MATCH (person:Person)
            WITH EXISTS {
              MATCH (person)-[:HAS_DOG]->(dog:Dog) RETURN dog AS pet
              UNION
              MATCH (person)-[:HAS_CAT]->(cat:Cat) RETURN cat AS pet
            } AS foo RETURN foo
        """) == [False, True, True]

    def test_union_body_no_returns(self, spark, g):
        assert bools(spark, g, """
            MATCH (person:Person)
            WITH EXISTS {
              MATCH (person)-[:HAS_DOG]->(dog:Dog)
              UNION
              MATCH (person)-[:HAS_CAT]->(cat:Cat)
            } AS foo RETURN foo
        """) == [False, True, True]

    def test_union_all_body(self, spark, g):
        assert bools(spark, g, """
            MATCH (person:Person)
            WITH EXISTS {
              MATCH (person)-[:HAS_DOG]->(dog:Dog) RETURN dog AS pet
              UNION ALL
              MATCH (person)-[:HAS_CAT]->(cat:Cat) RETURN cat AS pet
            } AS foo RETURN foo
        """) == [False, True, True]

    def test_union_of_bare_returns(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS { RETURN 1 AS a UNION RETURN 2 AS a }
            RETURN person.name AS name
        """) == ["Alice", "Bosse", "Chris"]

    def test_returning_case_body(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS { RETURN CASE WHEN true THEN 1 ELSE 2 END }
            RETURN person.name AS name
        """) == ["Alice", "Bosse", "Chris"]

    def test_call_subquery_body(self, spark, g):
        assert bools(spark, g, """
            MATCH (person:Person)
            WITH EXISTS {
              MATCH (person)-[:HAS_DOG]->(dog:Dog)
              CALL {
                WITH dog MATCH (dog2:Dog) RETURN dog2 AS d
                UNION
                WITH dog MATCH (dog3:Dog) RETURN dog3 AS d
              }
              RETURN d AS dogs
            } AS foo RETURN foo
        """) == [False, True, True]

    def test_function_use_in_body(self, spark, g):
        assert bools(spark, g, """
            MATCH (person:Person)
            WITH EXISTS {
              MATCH (person)-[:HAS_DOG]->(dog:Dog)
              WHERE reverse(dog.name) = "odiF"
              RETURN person
            } AS foo RETURN foo
        """) == [False, False, True]


class TestExistsAsValue:
    def test_deep_in_return_expression(self, spark, g):
        got = sorted(rows(run(spark, g, """
            MATCH (person:Person)
            RETURN person.name AS name,
                   false OR person.canAffordDog = EXISTS {
                     MATCH (person)-[:HAS_DOG]->(:Dog)
                   } AS reasonableLifeChoices
        """)))
        assert got == [("Alice", True), ("Bosse", True),
                       ("Chris", False)]

    def test_equality_check(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE person.canAffordDog = EXISTS {
              MATCH (person)-[:HAS_DOG]->(:Dog) }
            RETURN person.name AS name
        """) == ["Alice", "Bosse"]

    def test_not_exists_equality_check(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE person.canAffordDog = (NOT EXISTS {
              MATCH (person)-[:HAS_DOG]->(:Dog) })
            RETURN person.name AS name
        """) == ["Chris"]

    def test_as_function_parameter(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE toString(EXISTS {
              MATCH (person)-[:HAS_DOG]->(:Dog) }) = "true"
            RETURN person.name AS name
        """) == ["Bosse", "Chris"]

    def test_set_property_to_exists_value(self, spark, g):
        assert bools(spark, g, """
            MATCH (person:Person)
            SET person.hasDog = EXISTS {
              MATCH (person)-[:HAS_DOG]->(:Dog) }
            RETURN person.hasDog
        """) == [False, True, True]

    def test_set_two_properties_to_exists_values(self, spark, g):
        got = sorted(rows(run(spark, g, """
            MATCH (person:Person)
            SET person.hasDog = EXISTS {
                  MATCH (person)-[:HAS_DOG]->(:Dog) },
                person.hasCat = EXISTS {
                  MATCH (person)-[:HAS_CAT]->(:Cat) }
            RETURN person.hasDog AS hd, person.hasCat AS hc
        """)))
        assert got == [(False, False), (True, False), (True, False)]

    def test_exists_in_create_properties(self, spark, g):
        assert rows(run(spark, g, """
            CREATE (badger:Badger {isAlive: EXISTS {
              MATCH (person)-[:HAS_DOG]->(:Dog) }})
            RETURN badger.isAlive AS alive
        """)) == [(True,)]

    def test_exists_in_join_key(self, spark, g2):
        spark2, gg = g2
        got = sorted(rows(run(spark2, gg, """
            MATCH (a:A), (b:B)
            WHERE a.prop = EXISTS { (b)-->(:X) }
            RETURN a.prop AS p, b.name AS name
        """)))
        assert got == [(False, "zero"), (True, "one"), (True, "three")]


@pytest.fixture()
def g2(spark):
    g = PropertyGraph({}, {})
    cypher(spark, """
        CREATE (:A {prop: true}), (:A {prop: false}),
               (b0:B {name: 'zero'}),
               (b1:B {name: 'one'})-[:REL]->(:X),
               (b3:B {name: 'three'})-[:REL]->(:X)
        WITH b3 CREATE (b3)-[:REL]->(:X), (b3)-[:REL]->(:X)
    """, g).collect()
    return spark, g


class TestExistsScoping:
    def test_inner_variables_do_not_leak(self, spark, g):
        with pytest.raises(Exception, match="dog|[Uu]ndefined"):
            run(spark, g, """
                MATCH (person:Person)
                WHERE EXISTS {
                  MATCH (person)-[:HAS_DOG]->(dog:Dog)
                  WHERE person.name = dog.name }
                RETURN person.name, dog.name
            """).collect()

    def test_var_length_pattern_in_body(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS { MATCH (person)-[*]->(dog) }
            RETURN person.name AS name
        """) == ["Bosse", "Chris"]

    def test_exists_in_horizon_binds_earlier_var(self, spark, g):
        assert names(spark, g, """
            MATCH (adog:Dog {name: 'Ozzy'})
            WITH adog
            MATCH (person:Person)
            WHERE EXISTS { MATCH (person)-[:HAS_DOG]->(adog) }
            RETURN person.name AS name
        """) == ["Chris"]

    def test_variable_reuse_after_exists(self, spark, g):
        assert rows(run(spark, g, """
            MATCH (dog:Dog {name: 'Bosse'})
            OPTIONAL MATCH (person:Person)-[:HAS_DOG]->(dog)
            WHERE NOT EXISTS {
              MATCH (person)-[:HAS_DOG]->(d:Dog) WHERE NOT d = dog }
            WITH CASE WHEN person IS NULL THEN 1 ELSE 2 END AS person
            RETURN person
        """)) == [(2,)]

    def test_sibling_exists_vars_not_mixed(self, spark, g3):
        spark3, gg = g3
        assert rows(run(spark3, gg, """
            MATCH (n1:Node)-[rel1:REL1]->(n2:Node)-[rel2:REL2]->(n3)
            WHERE EXISTS { MATCH (temp1)-[:REL1]->(temp2) }
              AND EXISTS { MATCH (temp1)-[:REL2]->(temp2) }
            RETURN n3.prop AS p
        """)) == [(3,)]

    def test_shadowed_variable_via_with(self, spark, g3):
        spark3, gg = g3
        assert rows(run(spark3, gg, """
            MATCH (n1:Node)-[:REL1]->(n2:Node)-[:REL2]->(n3)
            WITH n1, n2, n1 AS n3
            WHERE NOT EXISTS {
              MATCH (n4:Node) WHERE (n4)-[:REL1]->(n3) }
            RETURN n3.prop AS p
        """)) == [(1,)]

    def test_inner_where_sees_outer_variable(self, spark, g3):
        spark3, gg = g3
        assert rows(run(spark3, gg, """
            MATCH (n1:Node)-[:REL1]->(n2:Node)-[:REL2]->(n3)
            WHERE EXISTS {
              MATCH (n4:Node)-[:REL2]->(n3) WHERE n3.prop = 3 }
            RETURN n3.prop AS p
        """)) == [(3,)]

    def test_inner_unwind_with_params(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS {
              UNWIND $dogNames AS name
              MATCH (person)-[:HAS_DOG]->(dog:Dog)
              WHERE dog.name = name
              RETURN name }
            RETURN person.name AS name
        """, dogNames=["Fido", "Bosse"]) == ["Bosse", "Chris"]


@pytest.fixture()
def g3(spark):
    g = PropertyGraph({}, {})
    cypher(spark, """
        CREATE (:Node {prop: 1})-[:REL1]->
               (n2:Node {prop: 2})-[:REL2]->(n3:Node {prop: 3})
    """, g).collect()
    return spark, g


class TestExistsBoundRelReuse:
    def test_recursive_inner_where_outer_node_vars(self, spark):
        g = PropertyGraph({}, {})
        cypher(spark, """
            CREATE (:Node)-[:REL1]->(:Node)-[:REL1]->
                   (n3:Node {prop: 3}),
                   (c1:Node)-[:REL2]->(n3),
                   (c2:Node)-[:REL3]->(n3), (c2)-[:REL3]->(c1)
        """, g).collect()
        assert rows(run(spark, g, """
            MATCH (n1:Node)-[:REL1]->(n2:Node)-[:REL1]->(n3)
            WHERE EXISTS {
              MATCH (c1:Node)
              WHERE (c1)-[:REL2]->(n3) AND EXISTS {
                MATCH (c2:Node)
                WHERE (c2)-[:REL3]->(n3) AND (c2)-[:REL3]->(c1) } }
            RETURN n3.prop AS p
        """)) == [(3,)]

    def test_recursive_inner_where_outer_rel_vars(self, spark):
        g = PropertyGraph({}, {})
        cypher(spark, """
            CREATE (:Node {prop: 1})-[:REL1]->
                   (n2:Node {prop: 2})-[:REL1]->(n3:Node {prop: 3}),
                   (c1:Node)<-[:REL2]-(n2),
                   (c1)<-[:REL3]-(n3)
        """, g).collect()
        assert rows(run(spark, g, """
            MATCH (n1:Node)-[rel1:REL1]->(n2:Node)-[rel2:REL1]->(n3)
            WHERE EXISTS {
              MATCH ()-[rel1]->()-[:REL2]->()
              WHERE EXISTS { MATCH ()-[rel2]->()-[:REL3]->() } }
            RETURN n3.prop AS p
        """)) == [(3,)]


class TestExistsAggregationBodies:
    def test_full_body_aggregation_gate(self, spark):
        g = PropertyGraph({}, {})
        cypher(spark, """
            CREATE (a:A {prop: 1})-[:R]->(b:B {prop: 1}),
                   (a)-[:R]->(:C {prop: 2}),
                   (a)-[:R]->(d:D {prop: 3}), (b)-[:R]->(d)
        """, g).collect()
        got = rows(run(spark, g, """
            MATCH (n) WHERE EXISTS {
              MATCH (n)-->(m)
              WITH n, count(*) AS numConnections
              WHERE numConnections = 3
              RETURN true }
            RETURN labels(n) AS l
        """))
        assert got == [(["A"],)]

    def test_full_body_aggregation_comparison(self, spark):
        g = PropertyGraph({}, {})
        cypher(spark, """
            CREATE (a:A {prop: 1})-[:R]->(b:B {prop: 1}),
                   (a)-[:R]->(:C {prop: 2}),
                   (a)-[:R]->(d:D {prop: 3}), (b)-[:R]->(d)
        """, g).collect()
        got = rows(run(spark, g, """
            MATCH (n) WHERE EXISTS {
              MATCH (n)-->(m)
              WITH n, count(*) >= 3 AS numConnections
              WHERE numConnections
              RETURN true }
            RETURN labels(n) AS l
        """))
        assert got == [(["A"],)]

    def test_aggregation_body_always_emits_row(self, spark, g):
        # RETURN count(...) emits one row even with zero matches, so the
        # EXISTS is true for EVERY node — including the three with no rels
        assert bools(spark, g, """
            MATCH (a)
            RETURN EXISTS { MATCH (a)--(b) RETURN count(b.name) } AS e
        """) == [True] * 6

    def test_leading_global_aggregation_then_match(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS {
              WITH count(*) AS c
              MATCH (person)-[:HAS_DOG]->(d:Dog)
              WHERE d.name = "Ozzy"
              RETURN person }
            RETURN person.name AS name
        """) == ["Chris"]

    def test_inner_aggregation_in_return_position(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS {
              WITH count(*) AS c
              MATCH (person)-[:HAS_DOG]->(d:Dog)
              RETURN count(*) + 1 }
            RETURN person.name AS name
        """) == ["Alice", "Bosse", "Chris"]


class TestExistsInnerPatternsMisc:
    def test_multiple_patterns_outer_match(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person), (dog:Dog)
            WHERE EXISTS {
              MATCH (person)-[:HAS_DOG]->(dog)
              WHERE NOT EXISTS {
                MATCH (dog) WHERE dog.name = 'Bosse' } }
            RETURN person.name AS name
        """) == ["Chris", "Chris"]

    def test_multiple_inner_patterns_empty_label(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS { MATCH (person), (car:Car) }
            RETURN person.name AS name
        """) == []

    def test_multiple_inner_patterns_with_where(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS {
              MATCH (person), (person)-[:HAS_DOG]->(dog:Dog)
              WHERE dog.name = "Bosse" }
            RETURN person.name AS name
        """) == ["Bosse"]

    def test_multiple_inner_patterns_uncorrelated(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS { MATCH (anything), (allOther) }
            RETURN person.name AS name
        """) == ["Alice", "Bosse", "Chris"]

    def test_rebound_outer_node_with_sibling_pattern(self, spark, g):
        assert names(spark, g, """
            MATCH (dog:Dog)
            WHERE EXISTS {
              MATCH (person)-[:HAS_DOG]->(dog:Dog),
                    (person)-[:HAS_DOG]->(dog2:Dog)
              WHERE dog.name <> dog2.name }
            RETURN dog.name AS name
        """) == ["Fido", "Ozzy"]

    def test_aliased_inner_return(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS {
              MATCH (person)-[:HAS_DOG]->(dog:Dog)
              RETURN dog.name AS dogName }
            RETURN person.name AS name
        """) == ["Bosse", "Chris"]

    def test_match_where_with_where_pipeline(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS {
              MATCH (person)-[:HAS_DOG]->(dog:Dog)
              WHERE person.name = 'Chris'
              WITH dog
              WHERE dog.name = 'Ozzy' }
            RETURN person.name AS name
        """) == ["Chris"]

    def test_full_body_without_return(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS {
              MATCH (person)-[:HAS_DOG]->(dog:Dog)
              WITH dog
              MATCH (dog {name: 'Ozzy'}) }
            RETURN person.name AS name
        """) == ["Chris"]

    def test_exists_of_empty_node_pattern(self, spark, g):
        assert rows(run(spark, g, """
            MATCH (x:Dog {name: 'Fido'})
            RETURN EXISTS { () } AS result
        """)) == [(True,)]

    def test_aggregation_in_horizon_of_tail(self, spark, g):
        assert names(spark, g, """
            MATCH (p:Person)-[:HAS_DOG]->(d:Dog)
            WITH p, collect(d.name) AS names
            WITH p.name AS walker
            WHERE EXISTS { MATCH (n) }
            RETURN walker AS name
        """) == ["Bosse", "Chris"]


class TestExistsUpdatingBodiesRejected:
    @pytest.mark.parametrize("body", [
        "CREATE (person)-[:HAS_DOG]->(:Dog)",
        'SET person.name = "Karen"',
        "MATCH (person)-[:HAS_DOG]->(dog:Dog) DETACH DELETE dog",
        'MATCH (person) MERGE (person)-[:HAS_DOG]->(:Dog {name: "P"})',
    ])
    def test_updating_body_is_syntax_error(self, spark, g, body):
        with pytest.raises(Exception):
            run(spark, g, f"""
                MATCH (person:Person)
                WHERE EXISTS {{ {body} }}
                RETURN person.name
            """).collect()
