"""TCK-style acceptance tranche 7c: GPM syntax-mixing rules —
behavior-ported from the reference's acceptance corpus
(community/cypher/spec-suite-tools/src/test/resources/acceptance/features/
GpmSyntaxMixingAcceptance.feature) with fresh wording.

The rule (Clause.scala:133-136 semanticCheck chain) is PER CLAUSE, with
label usages partitioned into read vs write contexts (MERGE counts as
both).  Conflicts: legacy ':' label conjunction vs GPM label syntax
(IS / | & ! % / parens) in the same partition; legacy var-length
relationships vs QPPs; legacy shortestPath()/allShortestPaths() vs GQL
path selectors; shortestPath over a QPP.  Subquery expressions and
CALL {} bodies fold into their enclosing clause; separate top-level
clauses never conflict.
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


def raises_mixing(spark, g, q):
    with pytest.raises(Exception,
                       match="(?i)mixing|not allowed|expected|cannot"):
        run(spark, g, q).collect()


class TestMixingAllowed:
    def test_colon_conjunction_with_gpm_in_separate_clauses(self, spark, g):
        assert rows(run(spark, g, """
            MATCH (m:A:B:C)-[]->()
            MATCH (n:(A&B)|C)-[]->(m)
            RETURN n
        """)) == []

    def test_vlr_and_qpp_in_separate_clauses(self, spark, g):
        assert rows(run(spark, g, """
            MATCH (n)-[r*]-(m)
            MATCH (n)-[]->+()
            RETURN n
        """)) == []

    def test_legacy_shortest_and_selector_in_separate_clauses(self,
                                                              spark, g):
        assert rows(run(spark, g, """
            MATCH p = shortestPath(()-[*1..5]-())
            MATCH q = SHORTEST 2 PATHS ()-[]-{1,5}()
            RETURN q
        """)) == []

    def test_colon_conjunction_with_case_disjunction_predicate(self,
                                                               spark, g):
        assert rows(run(spark, g, """
            MATCH (m:A:B:C)-[]->()
            RETURN CASE WHEN m:D|E THEN m.p ELSE null END AS q
        """)) == []

    def test_is_in_set_with_colon_conjunction_in_other_clauses(self,
                                                               spark, g):
        run(spark, g, "CREATE (:A:B:C)").collect()
        run(spark, g, """
            MATCH (m:A:B:C)
            SET m IS D
            REMOVE m:A:B:C
        """).collect()
        got = rows(run(spark, g, "MATCH (n) RETURN labels(n) AS ls"))
        assert got == [(["D"],)]

    def test_qpp_with_colon_conjunction_on_outer_node(self, spark, g):
        assert rows(run(spark, g,
                        "MATCH (m)-[]->+(n:S:R) RETURN m")) == []

    def test_read_gpm_write_legacy_ok(self, spark, g):
        run(spark, g, "CREATE (:A:B {p: 1})").collect()
        run(spark, g, "MATCH (n:A&B) SET n:B:C").collect()
        got = rows(run(spark, g, "MATCH (n) RETURN size(labels(n)) AS s"))
        assert got == [(3,)]

    def test_read_is_write_legacy_ok(self, spark, g):
        run(spark, g, "CREATE (:A)").collect()
        run(spark, g, "MATCH (n IS A) SET n:B:C").collect()

    def test_vlr_with_selector_ok(self, spark, g):
        assert rows(run(spark, g, """
            MATCH (:A)-[*1..5]->(n:B)
            MATCH ANY (n)-->(:B)-->(:C)
            RETURN n
        """)) == []

    def test_legacy_shortest_with_qpp_in_other_clause_ok(self, spark, g):
        assert rows(run(spark, g, """
            MATCH shortestPath((:A)-->(n:B))
            MATCH (n)-->+(:B)
            RETURN n
        """)) == []

    def test_call_subquery_unrelated_mixing_ok(self, spark, g):
        assert rows(run(spark, g, """
            CALL {
              MATCH (n:A:B)
              CREATE (n)-[IS R]->(m IS B)
              RETURN n
            }
            RETURN n
        """)) == []

    def test_anonymous_is_introducers_parse(self, spark, g):
        run(spark, g, "CREATE (IS A)").collect()
        run(spark, g, "CREATE ()-[IS R]->()").collect()
        got = rows(run(spark, g, "MATCH (IS A) RETURN count(*) AS c"))
        assert got == [(1,)]


class TestMixingRejected:
    def test_amp_and_colon_in_same_return(self, spark, g):
        raises_mixing(spark, g, "MATCH (n) RETURN n:A&B AS x, n:A:B AS y")

    def test_colon_conjunction_with_gpm_in_same_match(self, spark, g):
        raises_mixing(spark, g,
                      "MATCH (n:A:B)-->(m:(A&B)|C) RETURN n")

    def test_colon_or_colon_mix_single_expression(self, spark, g):
        raises_mixing(spark, g, "MATCH (n:A|B:C) RETURN n")

    def test_count_subquery_folds_inner_statements(self, spark, g):
        raises_mixing(spark, g, """
            RETURN COUNT { MATCH (n:A:B) MATCH (n)--(:A&!B) } AS c
        """)

    def test_exists_subquery_folds_inner_statements(self, spark, g):
        raises_mixing(spark, g, """
            RETURN EXISTS { MATCH (n:A:B) MATCH (n)-[IS R]-() } AS c
        """)

    def test_call_subquery_folds_inner_statements(self, spark, g):
        raises_mixing(spark, g, """
            CALL { MATCH (n:A:B) MATCH (m)-[IS R]-() RETURN n }
            RETURN n
        """)

    def test_call_subquery_write_partition_conflict(self, spark, g):
        raises_mixing(spark, g, """
            CALL { CREATE (n:A:B) CREATE (m:C&D) } RETURN 1 AS x
        """)

    def test_merge_counts_as_read_and_write(self, spark, g):
        raises_mixing(spark, g, """
            CALL { MERGE (n IS A&B) CREATE (m:C:D) } RETURN 1 AS x
        """)
        raises_mixing(spark, g, """
            CALL { MATCH (n:A&B) MERGE (m:B:C) } RETURN 1 AS x
        """)

    def test_vlr_and_qpp_in_same_clause(self, spark, g):
        raises_mixing(spark, g, "MATCH ()-[r:A*1..2]->()-->+() RETURN r")
        raises_mixing(spark, g,
                      "MATCH ()-[r:A*]->(n), ()-[:B]->+(:C) RETURN r")

    def test_vlr_nested_inside_qpp_is_engine_extension(self, spark, g):
        # the reference rejects any VLR/QPP cohabitation; this engine
        # offers nested VLR inside a QPP unit as an OPT-IN extension
        # (neo4j_spark.cypher.extensions, qpp_nested_var entry) —
        # default mode raises the reference's error, sibling mixing
        # still raises above
        with pytest.raises(Exception,
                           match="cannot be part of a quantified path"):
            run(spark, g,
                "MATCH (s)((a)-[*1..2]->(b)){2,2}(e) RETURN count(*) AS n")
        prev = spark.conf.get("neo4j_spark.cypher.extensions", "false")
        spark.conf.set("neo4j_spark.cypher.extensions", "true")
        try:
            assert rows(run(spark, g,
                            "MATCH (s)((a)-[*1..2]->(b)){2,2}(e) "
                            "RETURN count(*) AS n")) == [(0,)]
        finally:
            spark.conf.set("neo4j_spark.cypher.extensions", prev)

    def test_vlr_and_qpp_in_pattern_comprehensions(self, spark, g):
        raises_mixing(spark, g,
                      "RETURN [(n)-->+(m) | 1] AS a, [(n)-[*3]-(m) | 1] AS b")

    def test_count_subquery_vlr_qpp_conflict(self, spark, g):
        raises_mixing(spark, g, """
            RETURN COUNT {
              MATCH (n:A)--{,5}(:B)
              MATCH (n)-[*0..5]-(:C)
            } AS c
        """)

    def test_legacy_shortest_with_selector_same_scope(self, spark, g):
        raises_mixing(spark, g, """
            RETURN COUNT {
              MATCH p = shortestPath((n:A)-[:R*]-(m))
              MATCH q = SHORTEST 1 (n)-[:S]-+(:C)
            } AS c
        """)

    def test_shortestpath_over_qpp(self, spark, g):
        raises_mixing(spark, g,
                      "MATCH p = shortestPath((n)-[]->+({s: 1})) RETURN p")
        raises_mixing(spark, g,
                      "MATCH p = allShortestPaths(((:A)-[:R]->())+) "
                      "RETURN p")

    def test_selector_applied_to_shortestpath(self, spark, g):
        raises_mixing(spark, g,
                      "MATCH p = ANY SHORTEST shortestPath((:A)-[*..5]-(:B)) "
                      "RETURN p")
        raises_mixing(spark, g,
                      "MATCH p = SHORTEST 2 shortestPath((:A)-[*..5]-(:B)) "
                      "RETURN p")

    def test_colon_amp_same_dml_spec(self, spark, g):
        raises_mixing(spark, g, "CREATE (n:A:B&C)")
        raises_mixing(spark, g, "CREATE (:A:B)-[:R]->(:T&S)")
        raises_mixing(spark, g, "MERGE (n:A:B&C)")

    def test_is_colon_same_dml_spec(self, spark, g):
        raises_mixing(spark, g, "CREATE (IS A:B:C)")
        raises_mixing(spark, g, "CREATE (:A:B)-[:R]->(IS T:S)")
        raises_mixing(spark, g, "CREATE (:A:B)-[IS R]->(:T:S)")
        raises_mixing(spark, g, "MERGE (IS A:B:C)")

    def test_is_colon_same_set_remove(self, spark, g):
        raises_mixing(spark, g, "MATCH (n) SET n IS A:B:C")
        raises_mixing(spark, g, "MATCH (n) SET n:A:B:C, n IS A")
        raises_mixing(spark, g, "MATCH (n) REMOVE n IS A:B:C")
        raises_mixing(spark, g, "MATCH (n) REMOVE n:A:B:C, n IS A")

    def test_qpp_label_colon_conjunction_with_is_rel(self, spark, g):
        raises_mixing(spark, g,
                      "MATCH (m)-[IS Q]->+(n:S:R) RETURN m")
        raises_mixing(spark, g,
                      "MATCH (m)-->+(n IS S:R) RETURN m")
