"""CALL {} IN TRANSACTIONS with honored ON ERROR CONTINUE|BREAK|FAIL and
REPORT STATUS — behavior-ported from the reference's acceptance corpus
(community/cypher/spec-suite-tools/src/test/resources/acceptance/features/
CallInTransactionsErrorHandling.feature and
CallInTransactionsErrorHandlingWithReturn.feature) with fresh wording.

Semantics under test (TransactionApply LP:4039):
- batches of OF n ROWS slice the incoming rowstream in order;
- a runtime error in a batch rolls back that batch's writes;
- CONTINUE keeps executing later batches, BREAK stops submitting them,
  FAIL re-raises (prior batches stay committed in all modes);
- REPORT STATUS AS s attaches {started, committed, transactionId,
  errorMessage} per row: committed rows get a transactionId, failed-batch
  rows get committed=false + errorMessage, not-started rows (after BREAK)
  get started=false and a null transactionId;
- with a returning body, rows of failed/skipped batches pass through once
  each with null subquery columns.
"""

import pytest

from neo4j_spark.api import cypher
from neo4j_spark.graph import PropertyGraph


@pytest.fixture()
def g(spark):
    return PropertyGraph({}, {})


def run(spark, g, q, **params):
    return cypher(spark, q, g, params=params or None)


def rows(df):
    return [tuple(r) for r in df.collect()]


def nodes(g, label="N"):
    f = g.node_frames.get(label)
    return f.count() if f is not None else 0


class TestHappyPath:
    @pytest.mark.parametrize("mode", ["ON ERROR CONTINUE", "ON ERROR BREAK"])
    def test_create_default_batch_size(self, spark, g, mode):
        run(spark, g, f"""
            UNWIND range(1, 10) AS i
            CALL {{ WITH i UNWIND [1, 2] AS j CREATE (n:N {{i: i, j: j}}) }}
            IN TRANSACTIONS {mode}
        """).collect()
        assert nodes(g) == 20

    @pytest.mark.parametrize("batch", [1, 3, 5, 10, 77])
    @pytest.mark.parametrize("mode", ["ON ERROR CONTINUE", "ON ERROR BREAK"])
    def test_create_sized_batches(self, spark, g, batch, mode):
        run(spark, g, f"""
            UNWIND range(1, 10) AS i
            CALL {{ WITH i UNWIND [1, 2] AS j CREATE (n:N {{i: i, j: j}}) }}
            IN TRANSACTIONS OF {batch} ROWS {mode}
        """).collect()
        assert nodes(g) == 20

    @pytest.mark.parametrize("mode", ["ON ERROR CONTINUE", "ON ERROR BREAK"])
    def test_report_status_happy(self, spark, g, mode):
        got = rows(run(spark, g, f"""
            UNWIND range(0, 9) AS i
            CALL {{ WITH i UNWIND [1, 2] AS j CREATE (n:N {{i: i, j: j}}) }}
            IN TRANSACTIONS {mode} REPORT STATUS AS status
            RETURN i, status.started AS st, status.committed AS cm,
                   status.errorMessage AS em,
                   status.transactionId IS NOT NULL AS hasTx
        """))
        assert sorted(got) == [(i, True, True, None, True) for i in range(10)]
        assert nodes(g) == 20

    def test_batch_boundaries_by_transaction_id(self, spark, g):
        # rows sharing a batch share a transactionId; OF 3 ROWS over 10
        # rows yields 4 distinct transactions
        got = rows(run(spark, g, """
            UNWIND range(0, 9) AS i
            CALL { WITH i CREATE (n:N {i: i}) }
            IN TRANSACTIONS OF 3 ROWS ON ERROR CONTINUE
              REPORT STATUS AS status
            WITH status.transactionId AS tx, collect(i) AS batch
            RETURN size(batch) AS sz ORDER BY sz
        """))
        assert got == [(1,), (3,), (3,), (3,)]
        assert nodes(g) == 10


class TestRollback:
    # UNWIND [1,1,1,0,1,1]: row i=0 expands to j=1 (1/1) then j=0 (1/0 ->
    # division error), failing whichever batch holds it
    Q = """
        UNWIND [1, 1, 1, 0, 1, 1] AS i
        CALL { WITH i UNWIND [1, 0] AS j CREATE (n:N {p: 1/(i + j)}) }
        IN TRANSACTIONS OF %d ROWS ON ERROR %s
    """

    @pytest.mark.parametrize("batch,created", [
        (1, 6), (2, 4), (3, 6), (4, 0), (5, 0), (6, 0)])
    def test_break_rolls_back_and_stops(self, spark, g, batch, created):
        run(spark, g, self.Q % (batch, "BREAK")).collect()
        assert nodes(g) == created

    @pytest.mark.parametrize("batch,created", [
        (1, 10), (2, 8), (3, 6), (4, 4), (5, 2), (6, 0)])
    def test_continue_rolls_back_and_goes_on(self, spark, g, batch, created):
        run(spark, g, self.Q % (batch, "CONTINUE")).collect()
        assert nodes(g) == created

    def test_fail_reraises_but_keeps_prior_batches(self, spark, g):
        with pytest.raises(Exception, match="(?i)divi|zero"):
            run(spark, g, """
                UNWIND [1, 1, 0, 1] AS i
                CALL { WITH i CREATE (n:N {p: 1/i}) }
                IN TRANSACTIONS OF 2 ROWS ON ERROR FAIL
                  REPORT STATUS AS s
                RETURN i, s.committed AS cm
            """).collect()
        # batch [1,1] committed before batch [0,1] failed
        assert nodes(g) == 2


class TestReportStatusOnError:
    def test_break_statuses(self, spark, g):
        got = rows(run(spark, g, """
            UNWIND [1, 2, 3, 0, 4] AS i
            CALL { WITH i UNWIND [1, 0] AS j CREATE (n:N {p: 1/(i + j)}) }
            IN TRANSACTIONS OF 2 ROWS ON ERROR BREAK REPORT STATUS AS s
            RETURN i, s.transactionId IS NOT NULL AS hasTx,
                   s.started AS st, s.committed AS cm,
                   s.errorMessage IS NOT NULL AS hasErr
        """))
        assert sorted(got) == sorted([
            (1, True, True, True, False),
            (2, True, True, True, False),
            (3, True, True, False, True),
            (0, True, True, False, True),
            (4, False, False, False, False),
        ])
        assert nodes(g) == 4

    def test_continue_statuses(self, spark, g):
        got = rows(run(spark, g, """
            UNWIND [1, 2, 3, 0, 4] AS i
            CALL { WITH i UNWIND [1, 0] AS j CREATE (n:N {p: 1/(i + j)}) }
            IN TRANSACTIONS OF 2 ROWS ON ERROR CONTINUE REPORT STATUS AS s
            RETURN i, s.transactionId IS NOT NULL AS hasTx,
                   s.started AS st, s.committed AS cm,
                   s.errorMessage IS NOT NULL AS hasErr
        """))
        assert sorted(got) == sorted([
            (1, True, True, True, False),
            (2, True, True, True, False),
            (3, True, True, False, True),
            (0, True, True, False, True),
            (4, True, True, True, False),
        ])
        assert nodes(g) == 6


class TestWithReturnBody:
    @pytest.mark.parametrize("batch,n_created,is_,js", [
        (1, 6, [1, 1, 2, 2, 3, 3, 0, 4, 5], [1, 0, 1, 0, 1, 0]),
        (2, 4, [1, 1, 2, 2, 3, 0, 4, 5], [1, 0, 1, 0]),
        (3, 6, [1, 1, 2, 2, 3, 3, 0, 4, 5], [1, 0, 1, 0, 1, 0]),
        (4, 0, [1, 2, 3, 0, 4, 5], []),
        (6, 0, [1, 2, 3, 0, 4, 5], []),
    ])
    def test_break_passthrough_nulls(self, spark, g, batch, n_created,
                                     is_, js):
        [(gis, gjs)] = rows(run(spark, g, f"""
            UNWIND [1, 2, 3, 0, 4, 5] AS i
            CALL {{ WITH i UNWIND [1, 0] AS j
                    CREATE (n:N {{p: 1/(i + j)}}) RETURN j }}
            IN TRANSACTIONS OF {batch} ROWS ON ERROR BREAK
            RETURN collect(i) AS is_, collect(j) AS js
        """))
        assert sorted(gis) == sorted(is_)
        assert sorted(gjs) == sorted(js)
        assert nodes(g) == n_created

    @pytest.mark.parametrize("batch,n_created,is_,js", [
        (1, 10, [1, 1, 2, 2, 3, 3, 0, 4, 4, 5, 5],
         [1, 0, 1, 0, 1, 0, 1, 0, 1, 0]),
        (2, 8, [1, 1, 2, 2, 3, 0, 4, 4, 5, 5], [1, 0, 1, 0, 1, 0, 1, 0]),
        (3, 6, [1, 1, 2, 2, 3, 3, 0, 4, 5], [1, 0, 1, 0, 1, 0]),
        (4, 4, [1, 2, 3, 0, 4, 4, 5, 5], [1, 0, 1, 0]),
        (5, 2, [1, 2, 3, 0, 4, 5, 5], [1, 0]),
        (6, 0, [1, 2, 3, 0, 4, 5], []),
    ])
    def test_continue_passthrough_nulls(self, spark, g, batch, n_created,
                                        is_, js):
        [(gis, gjs)] = rows(run(spark, g, f"""
            UNWIND [1, 2, 3, 0, 4, 5] AS i
            CALL {{ WITH i UNWIND [1, 0] AS j
                    CREATE (n:N {{p: 1/(i + j)}}) RETURN j }}
            IN TRANSACTIONS OF {batch} ROWS ON ERROR CONTINUE
            RETURN collect(i) AS is_, collect(j) AS js
        """))
        assert sorted(gis) == sorted(is_)
        assert sorted(gjs) == sorted(js)
        assert nodes(g) == n_created

    def test_break_with_return_and_status(self, spark, g):
        got = rows(run(spark, g, """
            UNWIND [1, 2, 3, 0, 4] AS i
            CALL { WITH i UNWIND [1, 0] AS j
                   CREATE (n:N {p: 1/(i + j)}) RETURN j }
            IN TRANSACTIONS OF 2 ROWS ON ERROR BREAK REPORT STATUS AS s
            RETURN i, j, s.transactionId IS NOT NULL AS hasTx,
                   s.started AS st, s.committed AS cm,
                   s.errorMessage IS NOT NULL AS hasErr
        """))
        assert sorted(got, key=str) == sorted([
            (1, 1, True, True, True, False),
            (1, 0, True, True, True, False),
            (2, 1, True, True, True, False),
            (2, 0, True, True, True, False),
            (3, None, True, True, False, True),
            (0, None, True, True, False, True),
            (4, None, False, False, False, False),
        ], key=str)
        assert nodes(g) == 4

    def test_continue_with_return_and_status(self, spark, g):
        got = rows(run(spark, g, """
            UNWIND [1, 2, 3, 0, 4] AS i
            CALL { WITH i UNWIND [1, 0] AS j
                   CREATE (n:N {p: 1/(i + j)}) RETURN j }
            IN TRANSACTIONS OF 2 ROWS ON ERROR CONTINUE REPORT STATUS AS s
            RETURN i, j, s.started AS st, s.committed AS cm,
                   s.errorMessage IS NOT NULL AS hasErr
        """))
        assert sorted(got, key=str) == sorted([
            (1, 1, True, True, False),
            (1, 0, True, True, False),
            (2, 1, True, True, False),
            (2, 0, True, True, False),
            (3, None, True, False, True),
            (0, None, True, False, True),
            (4, 1, True, True, False),
            (4, 0, True, True, False),
        ], key=str)
        assert nodes(g) == 6


class TestPerRowSubquerySemantics:
    """The body executes once per INCOMING ROW — also for uncorrelated
    unit bodies and for updating bodies whose import tuples collide
    (CallSubqueryPipe; previously once-per-distinct-import)."""

    def test_uncorrelated_unit_body_runs_per_row(self, spark, g):
        run(spark, g,
            "UNWIND range(1, 3) AS i CALL { CREATE (:N) }").collect()
        assert nodes(g) == 3

    def test_duplicate_imports_still_write_per_row(self, spark, g):
        run(spark, g, """
            UNWIND [1, 1, 2] AS i
            CALL { WITH i CREATE (n:N {i: i}) }
        """).collect()
        assert nodes(g) == 3

    def test_returning_write_body_per_row(self, spark, g):
        got = rows(run(spark, g, """
            UNWIND [1, 1] AS i
            CALL { WITH i CREATE (n:N {i: i}) RETURN n.i AS ni }
            RETURN i, ni
        """))
        assert got == [(1, 1), (1, 1)]
        assert nodes(g) == 2

    def test_merge_in_tx_batches(self, spark, g):
        # MERGE on the same key across batches: first batch creates,
        # later batches match — sequential-transaction semantics
        run(spark, g, """
            UNWIND [1, 1, 2, 2, 3] AS k
            CALL { WITH k MERGE (n:N {k: k}) }
            IN TRANSACTIONS OF 2 ROWS ON ERROR CONTINUE
        """).collect()
        assert nodes(g) == 3


class TestEdges:
    def test_empty_input_report(self, spark, g):
        got = rows(run(spark, g, """
            UNWIND [] AS i
            CALL { WITH i CREATE (n:N {i: i}) }
            IN TRANSACTIONS ON ERROR CONTINUE REPORT STATUS AS s
            RETURN i, s.committed AS cm
        """))
        assert got == []
        assert nodes(g) == 0

    def test_effects_summary_counts_committed_only(self, spark, g):
        # update-only statement returns the effect counters; rolled-back
        # batches must not count
        [(created, *_rest)] = rows(run(spark, g, """
            UNWIND [1, 0, 2] AS i
            CALL { WITH i CREATE (n:N {p: 1/i}) }
            IN TRANSACTIONS OF 1 ROWS ON ERROR CONTINUE
        """))
        assert created == 2
        assert nodes(g) == 2

    def test_max_batches_guard(self, spark, g):
        spark.conf.set("neo4j_spark.tx.maxBatches", "3")
        try:
            with pytest.raises(Exception, match="maxBatches"):
                run(spark, g, """
                    UNWIND range(1, 10) AS i
                    CALL { WITH i CREATE (:N) }
                    IN TRANSACTIONS OF 1 ROWS ON ERROR CONTINUE
                """).collect()
        finally:
            spark.conf.unset("neo4j_spark.tx.maxBatches")

    def test_error_message_is_short(self, spark, g):
        [(em,)] = rows(run(spark, g, """
            UNWIND [0] AS i
            CALL { WITH i CREATE (n:N {p: 1/i}) }
            IN TRANSACTIONS OF 1 ROWS ON ERROR CONTINUE REPORT STATUS AS s
            RETURN s.errorMessage AS em
        """))
        assert em is not None and "\n" not in em and len(em) <= 500


class TestConcurrent:
    """IN [n] CONCURRENT TRANSACTIONS (CypherParser.g4:203).

    Concurrency is a permission, not a guarantee: any schedule of the
    batch transactions is legal.  The engine's rendering:

    - write-only body + ON ERROR FAIL (default) + no REPORT STATUS →
      one fused distributed Spark job (all batches commit together; on
      error nothing commits — the schedule where the failure wins the
      race before any sibling commit);
    - anything needing per-batch commit identity (CONTINUE/BREAK,
      REPORT STATUS) → the serial batch loop (concurrency 1 <= n).
    """

    def test_concurrent_create_fused(self, spark, g):
        run(spark, g, """
            UNWIND range(1, 20) AS i
            CALL { WITH i CREATE (n:N {v: i}) }
            IN 4 CONCURRENT TRANSACTIONS OF 3 ROWS
        """).collect()
        assert nodes(g) == 20

    def test_bare_concurrent(self, spark, g):
        run(spark, g, """
            UNWIND range(1, 6) AS i
            CALL { WITH i CREATE (:N) }
            IN CONCURRENT TRANSACTIONS OF 2 ROWS
        """).collect()
        assert nodes(g) == 6

    def test_concurrent_expression(self, spark, g):
        # grammar allows any constant expression before CONCURRENT
        run(spark, g, """
            UNWIND range(1, 4) AS i
            CALL { WITH i CREATE (:N) }
            IN 2 + 2 CONCURRENT TRANSACTIONS
        """).collect()
        assert nodes(g) == 4

    def test_concurrent_non_positive_rejected(self, spark, g):
        with pytest.raises(Exception, match="positive"):
            run(spark, g, """
                UNWIND [1] AS i
                CALL { WITH i CREATE (:N) }
                IN 0 CONCURRENT TRANSACTIONS
            """).collect()

    def test_concurrent_non_constant_rejected(self, spark, g):
        with pytest.raises(Exception, match="constant"):
            run(spark, g, """
                UNWIND [1] AS i
                CALL { WITH i CREATE (:N) }
                IN i CONCURRENT TRANSACTIONS
            """).collect()

    def test_concurrent_fail_commits_nothing_on_error(self, spark, g):
        # fused path: the legal schedule where the failing batch wins the
        # race — no sibling commit survives
        with pytest.raises(Exception):
            run(spark, g, """
                UNWIND [1, 2, 0, 3] AS i
                CALL { WITH i CREATE (n:N {p: 1/i}) }
                IN 2 CONCURRENT TRANSACTIONS OF 1 ROWS
            """).collect()
        assert nodes(g) == 0

    def test_concurrent_with_report_status_serial_loop(self, spark, g):
        # REPORT STATUS needs per-batch commit identity → the serial
        # schedule; per-batch rollback semantics are fully preserved
        got = rows(run(spark, g, """
            UNWIND [1, 0, 2] AS i
            CALL { WITH i CREATE (n:N {p: 1/i}) }
            IN 3 CONCURRENT TRANSACTIONS OF 1 ROWS
            ON ERROR CONTINUE REPORT STATUS AS s
            RETURN i, s.committed AS cm ORDER BY i
        """))
        assert got == [(0, False), (1, True), (2, True)]
        assert nodes(g) == 2

    def test_concurrent_reading_body_serial_loop(self, spark, g):
        # a body that reads the graph observes prior executions' writes —
        # must take the sequential path even under CONCURRENT
        got = rows(run(spark, g, """
            UNWIND range(1, 3) AS i
            CALL { WITH i MATCH (m:N) WITH count(m) AS before
                   CREATE (:N) RETURN before }
            IN 2 CONCURRENT TRANSACTIONS OF 1 ROWS
            RETURN before ORDER BY before
        """))
        assert got == [(0,), (1,), (2,)]
        assert nodes(g) == 3


class TestHappyPathWithReturn:
    """CallInTransactions.feature (the non-error sibling of the two
    error-handling files): batch alignment with RETURN bodies across
    batch sizes, FAIL/default equivalence, row order preserved."""

    @pytest.mark.parametrize("mode", ["", "ON ERROR FAIL"])
    def test_create_and_return_default_batches(self, spark, g, mode):
        got = rows(run(spark, g, f"""
            UNWIND range(1, 5) AS i
            CALL {{ WITH i UNWIND [1, 2] AS j
                    CREATE (n:N {{i: i, j: j}}) RETURN j }}
            IN TRANSACTIONS {mode}
            RETURN i, j ORDER BY i, j
        """))
        assert got == [(i, j) for i in range(1, 6) for j in (1, 2)]
        assert nodes(g) == 10

    @pytest.mark.parametrize("batch", [1, 3, 5, 10, 77])
    def test_create_and_return_sized_batches(self, spark, g, batch):
        got = rows(run(spark, g, f"""
            UNWIND range(0, 9) AS i
            CALL {{ WITH i UNWIND [1, 2] AS j
                    CREATE (n:N {{i: i, j: j}}) RETURN j }}
            IN TRANSACTIONS OF {batch} ROWS ON ERROR FAIL
            RETURN i, j ORDER BY i, j
        """))
        assert got == [(i, j) for i in range(10) for j in (1, 2)]
        assert nodes(g) == 20

    def test_nested_call_inside_tx_body(self, spark, g):
        got = rows(run(spark, g, """
            UNWIND range(1, 4) AS i
            CALL { WITH i
                   CALL { WITH i RETURN i * 10 AS ten }
                   CREATE (:N {v: ten})
                   RETURN ten }
            IN TRANSACTIONS OF 2 ROWS
            RETURN i, ten ORDER BY i
        """))
        assert got == [(1, 10), (2, 20), (3, 30), (4, 40)]
        assert nodes(g) == 4

    def test_status_interaction_with_unwind_inputs(self, spark, g):
        # REPORT STATUS rows align with the UNWIND inputs and all commit
        got = rows(run(spark, g, """
            UNWIND [10, 20, 30] AS v
            CALL { WITH v CREATE (:N {v: v}) }
            IN TRANSACTIONS OF 2 ROWS REPORT STATUS AS s
            RETURN v, s.committed AS cm, s.started AS st,
                   s.transactionId IS NOT NULL AS tx
            ORDER BY v
        """))
        assert got == [(10, True, True, True), (20, True, True, True),
                       (30, True, True, True)]
        # two batches: [10, 20] and [30] -> distinct transaction ids
        got = rows(run(spark, g, """
            UNWIND [1, 2, 3] AS v
            CALL { WITH v CREATE (:M {v: v}) }
            IN TRANSACTIONS OF 2 ROWS REPORT STATUS AS s
            RETURN count(DISTINCT s.transactionId) AS ntx
        """))
        assert got == [(2,)]
