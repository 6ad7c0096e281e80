"""TCK-style acceptance tranche 7: CALL {} IN TRANSACTIONS execution
semantics — behavior-ported from the reference's acceptance corpus
(community/cypher/spec-suite-tools/src/test/resources/acceptance/features/
CypherTransactionsAcceptance.feature) with fresh wording.

Covers: per-input-row body execution (unit, correlated, uncorrelated),
batch slicing at every alignment, LIMIT after the CALL still runs all
side effects, sequential visibility (executions observe previous
executions' writes), post-CALL reads observing all writes (no stale
property caches), entity/path import and export through transactions,
and batch-size argument validation (constant expressions only, positive
integers only).
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


def n_nodes(g):
    return sum(v.count() for v in g.node_frames.values())


class TestUnitBodyExecution:
    def test_single_row_single_tx(self, spark, g):
        run(spark, g, "CALL { CREATE (:A) } IN TRANSACTIONS OF 1 ROW") \
            .collect()
        assert n_nodes(g) == 1

    def test_uncorrelated_runs_per_row(self, spark, g):
        run(spark, g, """
            UNWIND [1, 2, 3] AS i
            CALL { CREATE (:A) } IN TRANSACTIONS OF 1 ROW
        """).collect()
        assert n_nodes(g) == 3

    @pytest.mark.parametrize("batch", [2, 3, 10, 100])
    def test_batch_alignments(self, spark, g, batch):
        run(spark, g, f"""
            UNWIND range(1, 10) AS i
            CALL {{ CREATE (:A) }} IN TRANSACTIONS OF {batch} ROWS
        """).collect()
        assert n_nodes(g) == 10

    @pytest.mark.parametrize("batch", [1, 5])
    def test_limit_after_call_runs_all_side_effects(self, spark, g, batch):
        got = rows(run(spark, g, f"""
            UNWIND range(1, 10) AS i
            CALL {{ CREATE (:A) }} IN TRANSACTIONS OF {batch} ROWS
            RETURN i LIMIT 1
        """))
        assert got == [(1,)]
        assert n_nodes(g) == 10

    def test_correlated_multiple_writes(self, spark, g):
        run(spark, g, """
            UNWIND [1, 2, 3] AS i
            CALL { WITH i UNWIND range(1, i) AS j
                   CREATE (:A {i: i, j: j}) } IN TRANSACTIONS
        """).collect()
        assert n_nodes(g) == 6

    def test_preceding_match_does_not_observe_writes(self, spark, g):
        run(spark, g, "CREATE (:A)").collect()
        run(spark, g,
            "MATCH (n:A) CALL { CREATE (a:A) } IN TRANSACTIONS").collect()
        assert n_nodes(g) == 2


class TestSequentialVisibility:
    def test_match_create_observes_previous_executions(self, spark, g):
        # 1 seed node; exec k sees all earlier creations: +1, +2, +4
        run(spark, g, "CREATE (:A)").collect()
        run(spark, g, """
            UNWIND [1, 2, 3] AS i
            CALL { MATCH (n) CREATE (:B) } IN TRANSACTIONS
        """).collect()
        assert n_nodes(g) == 8

    def test_match_create_followed_by_match(self, spark, g):
        run(spark, g, "CREATE (:A)").collect()
        got = rows(run(spark, g, """
            UNWIND [1, 2, 3] AS i
            CALL { MATCH (n) CREATE (:B) } IN TRANSACTIONS
            MATCH (n) RETURN i, count(n) AS nc
        """))
        assert sorted(got) == [(1, 8), (2, 8), (3, 8)]

    def test_repeated_set_on_same_property(self, spark, g):
        run(spark, g, "CREATE (:A {i: 1})").collect()
        got = rows(run(spark, g, """
            UNWIND [1, 2, 3] AS i MATCH (n)
            CALL { MATCH (m) SET m.i = m.i * 10 }
            IN TRANSACTIONS OF 1 ROW
            RETURN i, n.i AS ni
        """))
        assert sorted(got) == [(1, 1000), (2, 1000), (3, 1000)]

    def test_sequential_list_append(self, spark, g):
        run(spark, g, "CREATE (:A {is: [0]})").collect()
        got = rows(run(spark, g, """
            MATCH (n) UNWIND [1, 2, 3] AS i WITH * ORDER BY i
            CALL { WITH n, i SET n.is = n.is + [i] }
            IN TRANSACTIONS OF 1 ROW
            RETURN n.is AS nis
        """))
        assert got == [([0, 1, 2, 3],)] * 3

    def test_ping_pong_two_entities(self, spark, g):
        run(spark, g,
            "CREATE (:A {prop: 1})-[:R]->(:B {prop: 1})").collect()
        got = rows(run(spark, g, """
            MATCH (n:A)--(m:B)
            WITH n, m, n.prop AS prop, m.prop AS mprop
            UNWIND range(1, 42) AS i
            CALL { WITH n, m SET n.prop = m.prop
                   SET m.prop = n.prop + 1 } IN TRANSACTIONS OF 1 ROW
            RETURN n.prop AS np LIMIT 1
        """))
        assert got == [(42,)]

    def test_within_uncorrelated_no_stale_cache(self, spark, g):
        run(spark, g, "CREATE (:A {prop: 1})").collect()
        got = rows(run(spark, g, """
            MATCH (n) WITH n, n.prop AS prop
            CALL { MATCH (m) SET m.prop = 42 } IN TRANSACTIONS OF 1 ROW
            RETURN n.prop AS np
        """))
        assert got == [(42,)]

    def test_between_uncorrelated_increments(self, spark, g):
        run(spark, g, "CREATE (:A {prop: 1})").collect()
        got = rows(run(spark, g, """
            MATCH (n) WITH n, n.prop AS prop
            UNWIND range(1, 41) AS i
            CALL { MATCH (m) SET m.prop = m.prop + 1 }
            IN TRANSACTIONS OF 1 ROW
            RETURN n.prop AS np LIMIT 1
        """))
        assert got == [(42,)]

    def test_conditional_write_observed_mid_stream(self, spark, g):
        # FOREACH writes a.prop only on the i=1 execution; b.prop copies
        # a.prop as of ITS execution — old for i=0, new afterwards
        run(spark, g, """
            CREATE (:A {prop: 'old'}), (:B {i: 0}), (:B {i: 1}),
                   (:B {i: 2})
        """).collect()
        got = rows(run(spark, g, """
            MATCH (a:A) WITH *, a.prop AS prop1
            MATCH (b:B) WITH *, b.i AS i ORDER BY i
            CALL { WITH a, b, i
                   FOREACH (x IN CASE i WHEN 1 THEN [1] ELSE [] END |
                            SET a.prop = 'new')
                   SET b.prop = a.prop } IN TRANSACTIONS OF 1 ROW
            RETURN i, prop1, b.prop AS bp, a.prop AS ap
        """))
        assert sorted(got) == [
            (0, "old", "old", "new"),
            (1, "old", "new", "new"),
            (2, "old", "new", "new"),
        ]

    def test_conditional_write_in_returning_body(self, spark, g):
        run(spark, g, "CREATE (:A {prop: 'old'})").collect()
        got = rows(run(spark, g, """
            MATCH (n) WITH n, n.prop AS prop
            UNWIND [0, 1, 2] AS i
            CALL { WITH n, i
                   FOREACH (x IN CASE i WHEN 1 THEN [1] ELSE [] END |
                            SET n.prop = 'new')
                   RETURN n.prop AS prop2 } IN TRANSACTIONS OF 1 ROW
            RETURN i, prop, prop2, n.prop AS np
        """))
        assert sorted(got) == [
            (0, "old", "old", "new"),
            (1, "old", "new", "new"),
            (2, "old", "new", "new"),
        ]


class TestEntityTransport:
    def test_importing_values(self, spark, g):
        run(spark, g, """
            UNWIND range(1, 5) AS i
            CALL { WITH i CREATE ({prop: i}) } IN TRANSACTIONS
        """).collect()
        assert n_nodes(g) == 5

    def test_returning_values(self, spark, g):
        run(spark, g,
            "UNWIND range(1, 5) AS i CREATE ({prop: i})").collect()
        got = rows(run(spark, g, """
            CALL { MATCH (n) RETURN n.prop AS prop } IN TRANSACTIONS
            RETURN prop
        """))
        assert sorted(got) == [(i,) for i in range(1, 6)]

    def test_importing_nodes(self, spark, g):
        run(spark, g,
            "UNWIND range(1, 5) AS i CREATE ({prop: i})").collect()
        got = rows(run(spark, g, """
            MATCH (n)
            CALL { WITH n SET n.prop = 10 * n.prop } IN TRANSACTIONS
            RETURN n.prop AS prop
        """))
        assert sorted(got) == [(10,), (20,), (30,), (40,), (50,)]

    def test_returning_nodes(self, spark, g):
        got = rows(run(spark, g, """
            UNWIND range(1, 5) AS i
            CALL { WITH i CREATE (n {prop: i}) RETURN n } IN TRANSACTIONS
            RETURN n.prop AS prop
        """))
        assert sorted(got) == [(i,) for i in range(1, 6)]
        assert n_nodes(g) == 5

    def test_importing_rels(self, spark, g):
        run(spark, g,
            "UNWIND range(1, 5) AS i CREATE ()-[:R {prop: i}]->()") \
            .collect()
        got = rows(run(spark, g, """
            MATCH ()-[r]->()
            CALL { WITH r SET r.prop = 10 * r.prop } IN TRANSACTIONS
            RETURN r.prop AS prop
        """))
        assert sorted(got) == [(10,), (20,), (30,), (40,), (50,)]

    def test_returning_rels(self, spark, g):
        got = rows(run(spark, g, """
            UNWIND range(1, 5) AS i
            CALL { WITH i CREATE ()-[r:R {prop: i}]->() RETURN r }
            IN TRANSACTIONS
            RETURN r.prop AS prop
        """))
        assert sorted(got) == [(i,) for i in range(1, 6)]
        assert n_nodes(g) == 10

    def test_empty_map_and_list_before_call(self, spark, g):
        got = rows(run(spark, g, """
            WITH {} AS emptyMap, [] AS emptyList
            CALL { WITH 42 AS theValue RETURN theValue } IN TRANSACTIONS
            RETURN theValue
        """))
        assert got == [(42,)]


class TestBatchSizeValidation:
    Q = """
        UNWIND range(0, 20) AS x
        CALL { CREATE (:A) } IN TRANSACTIONS OF $batchSize ROWS
        ON ERROR CONTINUE
    """

    def test_zero_param_raises(self, spark, g):
        with pytest.raises(Exception, match="positive"):
            run(spark, g, self.Q, batchSize=0).collect()

    def test_negative_param_raises(self, spark, g):
        with pytest.raises(Exception, match="positive"):
            run(spark, g, self.Q, batchSize=-1).collect()

    def test_float_param_raises(self, spark, g):
        with pytest.raises(Exception, match="integer"):
            run(spark, g, self.Q, batchSize=1.0).collect()

    def test_zero_validated_on_fast_path_too(self, spark, g):
        # no ON ERROR / REPORT: the single-shot plan must still validate
        with pytest.raises(Exception, match="positive"):
            run(spark, g, """
                UNWIND range(0, 20) AS x
                CALL { CREATE (:A) } IN TRANSACTIONS OF $batchSize ROWS
            """, batchSize=0).collect()

    def test_graph_touching_expression_raises(self, spark, g):
        with pytest.raises(Exception, match="constant"):
            run(spark, g, """
                UNWIND range(0, 10) AS x
                CALL { CREATE (:A) } IN TRANSACTIONS
                OF size([(a)-->(b) | b.prop]) ROWS
            """).collect()

    def test_unbound_variable_expression_raises(self, spark, g):
        with pytest.raises(Exception):
            run(spark, g, """
                UNWIND range(0, 10) AS x
                CALL { CREATE (:A) } IN TRANSACTIONS
                OF reduce(s = 0, y IN [p.age] | s + y) ROWS
            """).collect()

    def test_constant_reduce_allowed(self, spark, g):
        run(spark, g, """
            UNWIND range(1, 10) AS x
            CALL { CREATE (:A) } IN TRANSACTIONS
            OF reduce(s = 0, y IN [0, 2] | s + y) ROWS
            ON ERROR CONTINUE
        """).collect()
        assert n_nodes(g) == 10

    def test_long_max_batch_size_allowed(self, spark, g):
        run(spark, g, """
            UNWIND range(1, 10) AS x
            CALL { CREATE (:A) } IN TRANSACTIONS
            OF 9223372036854775807 ROWS ON ERROR CONTINUE
        """).collect()
        assert n_nodes(g) == 10

    def test_sequential_row_cap_raises(self, spark, g):
        spark.conf.set("neo4j_spark.call.maxSequentialRows", "5")
        try:
            with pytest.raises(Exception, match="maxSequentialRows"):
                run(spark, g, """
                    UNWIND range(1, 10) AS i
                    CALL { MATCH (m) CREATE (:B) } IN TRANSACTIONS
                """).collect()
        finally:
            spark.conf.unset("neo4j_spark.call.maxSequentialRows")
