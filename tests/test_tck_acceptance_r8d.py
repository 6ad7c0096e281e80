"""TCK-style acceptance tranche 8d — behavior-ported from
LabelExpressionAcceptance.feature (spec-suite-tools acceptance corpus)
with fresh wording.

Semantics under test: the full GQL label/type algebra (| & ! % parens)
in MATCH patterns, WHERE predicates, CASE/RETURN positions, and on
runtime-tagged (unknown-entity-type) values; '%' means "has at least
one real label" for nodes (the engine's internal no-label shard marker
does not count) and "any type" for relationships; rel-type algebra
includes always-empty forms (A&B, A&!A, !%) that must return no rows
rather than error.
"""

import pytest

# conformance tranche: excluded from the default (core) run so the
# driver's verify window can finish; run with `pytest -m acceptance`
pytestmark = pytest.mark.acceptance


from neo4j_spark.api import cypher
from neo4j_spark.graph import PropertyGraph

NODE_SETUP = "CREATE (), (:A), (:B), (:C), (:A:B), (:A:C), (:B:C), (:A:B:C)"
REL_SETUP = "CREATE ()-[:A]->(), ()-[:B]->(), ()-[:C]->()"


@pytest.fixture()
def g(spark):
    return PropertyGraph({}, {})


def run(spark, g, q, **params):
    return cypher(spark, q, g, params=params or None)


def node_sig(df):
    return " ".join(sorted(
        (":".join(sorted(r[0])) or "()") for r in df.collect()))


def rel_sig(df):
    return " ".join(sorted(r[0] for r in df.collect()))


NODE_CASES = [
    ("", "() A B C A:B A:C B:C A:B:C"),
    (":A", "A A:B A:C A:B:C"),
    (":A&B", "A:B A:B:C"),
    (":A|B", "A B A:B A:C B:C A:B:C"),
    (":!A", "() B C B:C"),
    (":!!A", "A A:B A:C A:B:C"),
    (":A&!A", ""),
    (":A|!A", "() A B C A:B A:C B:C A:B:C"),
    (":%", "A B C A:B A:C B:C A:B:C"),
    (":!%", "()"),
    (":%|!%", "() A B C A:B A:C B:C A:B:C"),
    (":%&!%", ""),
    (":A&%", "A A:B A:C A:B:C"),
    (":A|%", "A B C A:B A:C B:C A:B:C"),
    (":(A&B)&!(B&C)", "A:B"),
    (":!(A&%)&%", "B C B:C"),
]

REL_CASES = [
    ("", "A B C"),
    (":A", "A"),
    (":A|B", "A B"),
    (":!A", "B C"),
    (":!!A", "A"),
    (":A&!A", ""),
    (":A|!A", "A B C"),
    (":%", "A B C"),
    (":!%", ""),
    (":%|!%", "A B C"),
    (":%&!%", ""),
    (":A&%", "A"),
    (":A|%", "A B C"),
    (":!(A&%)&%", "B C"),
    (":A&B", ""),
]


class TestNodeLabelExpressions:
    @pytest.mark.parametrize("expr,want", NODE_CASES,
                             ids=[c[0] or "bare" for c in NODE_CASES])
    def test_in_match_pattern(self, spark, g, expr, want):
        run(spark, g, NODE_SETUP).collect()
        got = node_sig(run(spark, g,
                           f"MATCH (n{expr}) RETURN labels(n) AS l"))
        assert got == " ".join(sorted(want.split()))

    @pytest.mark.parametrize("expr,want", NODE_CASES[1:],
                             ids=[c[0] for c in NODE_CASES[1:]])
    def test_in_where_predicate(self, spark, g, expr, want):
        run(spark, g, NODE_SETUP).collect()
        got = node_sig(run(spark, g,
                           f"MATCH (n) WHERE n{expr} "
                           "RETURN labels(n) AS l"))
        assert got == " ".join(sorted(want.split()))


class TestRelTypeExpressions:
    @pytest.mark.parametrize("expr,want", REL_CASES,
                             ids=[c[0] or "bare" for c in REL_CASES])
    def test_in_match_pattern(self, spark, g, expr, want):
        run(spark, g, REL_SETUP).collect()
        got = rel_sig(run(spark, g,
                          f"MATCH ()-[r{expr}]->() RETURN type(r) AS t"))
        assert got == " ".join(sorted(want.split()))

    @pytest.mark.parametrize("expr,want", REL_CASES[1:],
                             ids=[c[0] for c in REL_CASES[1:]])
    def test_in_where_predicate(self, spark, g, expr, want):
        run(spark, g, REL_SETUP).collect()
        got = rel_sig(run(spark, g,
                          f"MATCH ()-[r]->() WHERE r{expr} "
                          "RETURN type(r) AS t"))
        assert got == " ".join(sorted(want.split()))

    def test_in_case_and_return_positions(self, spark, g):
        run(spark, g, REL_SETUP).collect()
        got = sorted(tuple(r) for r in run(spark, g, """
            MATCH ()-[r]->()
            RETURN type(r) AS t, r:A|B AS m,
                   CASE WHEN r:A THEN 1 ELSE 0 END AS c
        """).collect())
        assert got == [("A", True, 1), ("B", True, 0), ("C", False, 0)]


class TestUnknownEntityType:
    @pytest.mark.parametrize("expr,want", [
        ("%", 3), ("A", 1), ("B", 1), ("A|B", 2)])
    def test_label_expression_on_tagged_values(self, spark, g, expr, want):
        # UNWIND [node, rel, node] erases the static entity type — the
        # label predicate must branch on the runtime group
        run(spark, g, "CREATE (:A)-[:B]->(:C)").collect()
        got = run(spark, g, f"""
            MATCH (a)-[b]->(c)
            UNWIND [a, b, c] AS x
            WITH x WHERE x:{expr}
            RETURN count(*) AS result
        """).collect()
        assert got[0][0] == want


class TestLabelExpressionComposition:
    def test_repeating_label_conjunction_disjunction(self, spark, g):
        run(spark, g,
            "CREATE (:A {id: 'a'}), (:B {id: 'b'}), "
            "(:A:B {id: 'ab'})").collect()
        got = sorted(r[0] for r in run(
            spark, g, "MATCH (n:A&A) RETURN n.id AS i").collect())
        assert got == ["a", "ab"]
        got = sorted(r[0] for r in run(
            spark, g, "MATCH (n:A|A) RETURN n.id AS i").collect())
        assert got == ["a", "ab"]

    def test_precedence(self, spark, g):
        run(spark, g, NODE_SETUP).collect()
        # & binds tighter than |
        got = node_sig(run(spark, g,
                           "MATCH (n:A&B|C) RETURN labels(n) AS l"))
        assert got == " ".join(sorted(
            "C A:B A:C B:C A:B:C".split()))
        # parens override, negation applies to the group
        got = node_sig(run(spark, g,
                           "MATCH (n:A&(B|C)) RETURN labels(n) AS l"))
        assert got == " ".join(sorted("A:B A:C A:B:C".split()))
        got = node_sig(run(spark, g,
                           "MATCH (n:!(B|C)) RETURN labels(n) AS l"))
        assert got == " ".join(sorted("() A".split()))

    def test_in_pattern_comprehension_and_inner_rel(self, spark, g):
        run(spark, g,
            "CREATE (a:A)-[:T]->(:B:X), (a)-[:T]->(:C)").collect()
        [(got,)] = run(spark, g,
                       "MATCH (n:A) RETURN [p=(n)-->(:B|C) | 1] AS r"
                       ).collect()
        assert len(got) == 2
        [(got,)] = run(spark, g,
                       "MATCH (n:A) RETURN size([p=(n)-->(:B&X) | p]) AS r"
                       ).collect()
        assert got == 1

    def test_conjunction_in_create_and_merge(self, spark, g):
        run(spark, g, "CREATE (:A&B)").collect()
        assert node_sig(run(spark, g,
                            "MATCH (n:A:B) RETURN labels(n) AS l")) == "A:B"
        run(spark, g, "MERGE (m:B&C)").collect()
        assert node_sig(run(spark, g,
                            "MATCH (n:B&C) RETURN labels(n) AS l")) == "B:C"
