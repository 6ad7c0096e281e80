"""TCK-style acceptance tranche 8i — behavior-ported from
SubqueryAcceptance.feature (community/cypher/spec-suite-tools/src/test/
resources/acceptance/features/): CALL {} sequencing and nesting, union
bodies with different column orders, import scoping rules (unimported ->
UndefinedVariable, imports removable by later WITH), aggregation over
imported variables, UNIT subqueries (no RETURN — cardinality-preserving,
side effects kept) in plain/nested/union/FINISH forms, side-effect
visibility after the subquery, and the return-item aliasing rule."""

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
    r = rows(run(spark, g, q, **params))
    assert len(r) == 1 and len(r[0]) == 1
    return r[0][0]


class TestCallSequencingAndNesting:
    def test_call_around_single_query(self, spark, g):
        assert rows(run(spark, g, "CALL { RETURN 1 AS x } RETURN x")) \
            == [(1,)]

    def test_post_processing_of_result(self, spark, g):
        assert one(spark, g, """
            CALL { UNWIND [1, 2, 3, 4] AS x RETURN x }
            WITH x WHERE x > 2 RETURN sum(x) AS sum
        """) == 7

    def test_executes_for_all_incoming_rows(self, spark, g):
        assert sorted(rows(run(spark, g, """
            UNWIND [1, 2, 3] AS i
            CALL { RETURN 'x' AS x } RETURN i, x
        """))) == [(1, "x"), (2, "x"), (3, "x")]

    def test_calls_in_sequence(self, spark, g):
        assert sorted(rows(run(spark, g, """
            CALL { UNWIND [1, 2, 3] AS x RETURN x }
            CALL { UNWIND ['a', 'b'] AS y RETURN y }
            RETURN x, y
        """))) == [(1, "a"), (1, "b"), (2, "a"), (2, "b"),
                   (3, "a"), (3, "b")]

    def test_simple_nested_subqueries(self, spark, g):
        assert rows(run(spark, g, """
            CALL { CALL { CALL { RETURN 1 AS x } RETURN x } RETURN x }
            RETURN x
        """)) == [(1,)]

    def test_nested_subqueries_accumulate_bindings(self, spark, g):
        run(spark, g, "CREATE (:A), (:B), (:C)").collect()
        got = rows(run(spark, g, """
            CALL {
              CALL {
                CALL { MATCH (a:A) RETURN a }
                MATCH (b:B) RETURN a, b
              }
              MATCH (c:C) RETURN a, b, c
            }
            RETURN labels(a)[0] AS la, labels(b)[0] AS lb,
                   labels(c)[0] AS lc
        """))
        assert got == [("A", "B", "C")]

    def test_union_body_different_column_orders(self, spark, g):
        assert sorted(rows(run(spark, g, """
            CALL { RETURN 1 AS x, 2 AS y UNION RETURN 3 AS y, 2 AS x }
            RETURN x, y
        """))) == [(1, 2), (2, 3)]

    def test_aggregating_top_and_bottom(self, spark, g):
        run(spark, g,
            "UNWIND range(1, 10) AS p CREATE ({prop: p})").collect()
        assert one(spark, g, """
            CALL {
              MATCH (x) WHERE x.prop > 0
              RETURN x ORDER BY x.prop LIMIT 3
              UNION
              MATCH (x) WHERE x.prop > 0
              RETURN x ORDER BY x.prop DESC LIMIT 3
            }
            RETURN sum(x.prop) AS sum
        """) == 33

    def test_same_name_different_scopes(self, spark, g):
        run(spark, g, "CREATE (), ()").collect()
        assert one(spark, g, """
            MATCH (x)
            CALL { MATCH (x) RETURN x AS y }
            RETURN count(*) AS count
        """) == 4

    def test_preceding_match_and_inner_aggregation(self, spark, g):
        run(spark, g, """
            CREATE (:Person {age: 20, name: 'Alice'}),
                   (:Person {age: 27, name: 'Bob'})
        """).collect()
        assert sorted(rows(run(spark, g, """
            MATCH (p:Person)
            CALL { UNWIND range(1, 5) AS i
                   RETURN count(i) AS numberOfClones }
            RETURN p.name AS name, numberOfClones
        """))) == [("Alice", 5), ("Bob", 5)]


class TestCallImportScoping:
    def test_importing_variables(self, spark, g):
        run(spark, g, """
            CREATE (:Person {name: 'Alice'}), (:Person {name: 'Bob'})
        """).collect()
        assert sorted(r[0] for r in rows(run(spark, g, """
            MATCH (p:Person)
            CALL { WITH p RETURN p.name AS innerName }
            RETURN innerName
        """))) == ["Alice", "Bob"]

    def test_unimported_variable_rejected(self, spark, g):
        run(spark, g, "CREATE (), ()").collect()
        with pytest.raises(Exception):
            run(spark, g, """
                MATCH (a), (b)
                CALL { WITH a RETURN b AS c }
                RETURN c
            """).collect()

    def test_import_removable_by_later_with(self, spark, g):
        run(spark, g, "CREATE ()").collect()
        with pytest.raises(Exception):
            run(spark, g, """
                MATCH (a)
                CALL { WITH a WITH 1 AS b RETURN a AS c }
                RETURN c
            """).collect()

    def test_aggregation_on_imported_variable(self, spark, g):
        assert sorted(rows(run(spark, g, """
            UNWIND [0, 1, 2] AS x
            CALL { WITH x RETURN max(x) AS xMax }
            RETURN x, xMax
        """))) == [(0, 0), (1, 1), (2, 2)]

    def test_correlated_top_bottom_union(self, spark, g):
        run(spark, g, """
            CREATE (:Config {threshold: 2})
            WITH *
            UNWIND range(1, 10) AS p
            CREATE (:Node {prop: p})
        """).collect()
        assert one(spark, g, """
            MATCH (c:Config)
            CALL {
              WITH c MATCH (x:Node) WHERE x.prop > c.threshold
              RETURN x ORDER BY x.prop LIMIT 3
              UNION
              WITH c MATCH (x:Node) WHERE x.prop > c.threshold
              RETURN x ORDER BY x.prop DESC LIMIT 3
            }
            RETURN sum(x.prop) AS sum
        """) == 39

    def test_grouped_aggregation_within_correlated_union(self, spark, g):
        run(spark, g, """
            CREATE (:Config {threshold: 2})
            WITH *
            UNWIND range(1, 10) AS p
            CREATE (:Node {prop: p, category: p % 2})
        """).collect()
        assert sorted(rows(run(spark, g, """
            MATCH (c:Config)
            CALL {
                WITH c MATCH (x:Node) WHERE x.prop > c.threshold
                WITH x.prop AS metric, x.category AS cat
                ORDER BY metric LIMIT 3
                RETURN cat, sum(metric) AS y
              UNION
                WITH c MATCH (x:Node) WHERE x.prop > c.threshold
                WITH x.prop AS metric, x.category AS cat
                ORDER BY metric DESC LIMIT 3
                RETURN cat, sum(metric) AS y
            }
            RETURN cat, sum(y) AS sum
        """))) == [(0, 22), (1, 17)]

    def test_sorting_in_subquery_pipeline(self, spark, g):
        assert rows(run(spark, g, """
            WITH 1 AS x
            CALL {
              WITH x
              WITH count(*) AS y
              WITH y AS z
              RETURN z ORDER BY z
            }
            RETURN z
        """)) == [(1,)]

    def test_unaliased_return_items_rejected(self, spark, g):
        for body in ["RETURN 5", "RETURN 5 UNION RETURN 5"]:
            with pytest.raises(Exception):
                run(spark, g,
                    f"CALL {{ {body} }} RETURN `5` AS five").collect()


class TestUnitSubqueries:
    """CALL {} with no RETURN: the outer cardinality is preserved, the
    body runs once per input row for its side effects."""

    @pytest.fixture()
    def g3(self, spark):
        g = PropertyGraph({}, {})
        cypher(spark, "CREATE (:Label), (:Label), (:Label)", g).collect()
        return g

    def nodecount(self, spark, g, label=""):
        return one(spark, g, f"MATCH (n{label}) RETURN count(*) AS c")

    def test_uncorrelated_unit(self, spark, g3):
        assert one(spark, g3, """
            MATCH (x) CALL { CREATE (:Label) } RETURN count(*) AS count
        """) == 3
        assert self.nodecount(spark, g3) == 6

    def test_uncorrelated_unit_with_finish(self, spark, g3):
        assert one(spark, g3, """
            MATCH (x) CALL { CREATE (:Label) FINISH }
            RETURN count(*) AS count
        """) == 3
        assert self.nodecount(spark, g3) == 6

    def test_correlated_unit_set(self, spark, g3):
        assert one(spark, g3, """
            MATCH (x) CALL { WITH x SET x.prop = 1 }
            RETURN count(*) AS count
        """) == 3
        assert one(spark, g3,
                   "MATCH (n {prop: 1}) RETURN count(*) AS c") == 3

    def test_correlated_unit_set_with_finish(self, spark, g3):
        assert one(spark, g3, """
            MATCH (x) CALL { WITH x SET x.prop = 1 FINISH }
            RETURN count(*) AS count
        """) == 3
        assert one(spark, g3,
                   "MATCH (n {prop: 1}) RETURN count(*) AS c") == 3

    def test_unit_with_shadowed_variable(self, spark, spark_g_props):
        spark2, gp = spark_g_props
        assert sorted(r[0] for r in rows(run(spark2, gp, """
            MATCH (n)
            CALL { WITH 1 AS n CREATE (x:Foo) SET x.prop = n }
            RETURN n.prop
        """))) == [1, 2, 3]
        assert one(spark2, gp,
                   "MATCH (f:Foo) RETURN count(*) AS c") == 3

    def test_correlated_union_unit(self, spark, g3):
        assert one(spark, g3, """
            MATCH (x)
            CALL { WITH x SET x.prop = 1 UNION CREATE (y:A) }
            RETURN count(*) AS count
        """) == 3
        assert one(spark, g3,
                   "MATCH (a:A) RETURN count(*) AS c") == 3
        assert one(spark, g3,
                   "MATCH (n {prop: 1}) RETURN count(*) AS c") == 3

    def test_unit_increasing_cardinality_inside(self, spark, g3):
        assert one(spark, g3, """
            MATCH (n)
            CALL { UNWIND [1, 2] AS i CREATE (x:Foo) }
            RETURN count(*) AS count
        """) == 3
        assert one(spark, g3,
                   "MATCH (f:Foo) RETURN count(*) AS c") == 6

    def test_unit_under_limit_zero_keeps_effects(self, spark, g3):
        assert rows(run(spark, g3, """
            MATCH (x) CALL { CREATE (:Label) } RETURN x LIMIT 0
        """)) == []
        assert self.nodecount(spark, g3) == 6

    def test_unit_under_finish_keeps_effects(self, spark, g3):
        assert rows(run(spark, g3, """
            MATCH (x) CALL { CREATE (:Label) } FINISH
        """)) == []
        assert self.nodecount(spark, g3) == 6

    def test_nested_unit(self, spark, g3):
        assert one(spark, g3, """
            MATCH (n) CALL { CALL { CREATE (x:Foo) } }
            RETURN count(*) AS count
        """) == 3
        assert one(spark, g3,
                   "MATCH (f:Foo) RETURN count(*) AS c") == 3

    def test_nested_unit_with_finish_all_levels(self, spark, g3):
        assert one(spark, g3, """
            MATCH (n)
            CALL { CALL { CREATE (x:Foo) FINISH } FINISH }
            RETURN count(*) AS count
        """) == 3
        assert one(spark, g3,
                   "MATCH (f:Foo) RETURN count(*) AS c") == 3

    def test_ending_unit_call(self, spark, g3):
        # no RETURN: result is the EmptyResult epilogue (the engine
        # surfaces effect counters there); the side effects must land
        run(spark, g3, "MATCH (n) CALL { CREATE (x:Foo) }").collect()
        assert one(spark, g3,
                   "MATCH (f:Foo) RETURN count(*) AS c") == 3

    def test_ending_union_unit_call(self, spark, g3):
        run(spark, g3,
            "MATCH (n) CALL { CREATE (x:Foo) UNION CREATE (x:Foo) }"
            ).collect()
        assert one(spark, g3,
                   "MATCH (f:Foo) RETURN count(*) AS c") == 6

    def test_side_effects_visible_after_subquery(self, spark, g3):
        assert sorted(r[0] for r in rows(run(spark, g3, """
            MATCH (x)
            CALL { WITH x SET x.prop = 1 }
            RETURN x.prop AS prop
        """))) == [1, 1, 1]

    def test_side_effects_visible_when_previously_read(self, spark):
        g = PropertyGraph({}, {})
        cypher(spark, """
            CREATE (:Label {prop: 1}), (:Label {prop: 1}),
                   (:Label {prop: 1})
        """, g).collect()
        assert sorted(rows(run(spark, g, """
            MATCH (x)
            WITH x, x.prop AS prop1
            CALL { WITH x SET x.prop = 2 }
            RETURN prop1, x.prop AS prop2
        """))) == [(1, 2), (1, 2), (1, 2)]


@pytest.fixture()
def spark_g_props(spark):
    g = PropertyGraph({}, {})
    cypher(spark, """
        CREATE (:Label {prop: 1}), (:Label {prop: 2}), (:Label {prop: 3})
    """, g).collect()
    return spark, g
