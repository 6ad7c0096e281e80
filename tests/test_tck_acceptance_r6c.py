"""TCK-style acceptance tranche 4 (round 6): GQL path selectors —
behavior-ported from the reference's acceptance corpus
(community/cypher/spec-suite-tools/src/test/resources/acceptance/features/
PathSelectorAcceptance.feature) with fresh fixtures and wording.  Covers
selector noise words (PATH/PATHS/GROUP/GROUPS), predicate timing relative
to the selector (element/pattern predicates before, graph-pattern WHERE
after), same-length tie counting, per-pair partitioning, selectors under
OPTIONAL MATCH / EXISTS / COUNT / COLLECT, selector composition rules
(CIP-60), selectors over fixed-length and legacy var-length patterns, and
bound-endpoint/relationship interactions."""

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


TWO_ROUTE = """
    CREATE (a:A), (b:B), (c:C), (d:D), (x:X),
      (a)-[:R]->(b)-[:R]->(c)-[:R]->(d),
      (a)-[:R]->(x)-[:R]->(d)
"""

# diamond lattice with two sources and one sink; X is the "poison" node
LATTICE = """
    CREATE (s1:S {n: 's1'}), (s2:S {n: 's2'}), (t1:T {n: 't1'}), (x:X),
      (s1)-[:R]->(s2)-[:R]->(c)-[:R]->(f)-[:R]->(t1),
      (s1)-[:R]->(b)-[:R]->(e)-[:R]->(g)-[:R]->(t1),
      (s2)-[:R]->(x)-[:R]->(f),
      (b)-[:R]->(x)-[:R]->(g)
"""


def _paths_by_len(spark, g, selector, filt=""):
    """Partition selector matches as {(first, last): {len: count}}."""
    out = rows(run(spark, g, """
        MATCH p = %s (:S) (()--(%s))+ (:T)
        WITH nodes(p) AS ns, size(relationships(p)) AS len
        RETURN head(ns).n AS first, last(ns).n AS last, len,
               count(*) AS cnt
    """ % (selector, filt)))
    res = {}
    for first, last, ln, cnt in out:
        res.setdefault((first, last), {})[ln] = cnt
    return res


class TestSelectorNoiseWordsR6:
    @pytest.mark.parametrize("sel", [
        "ANY SHORTEST", "ANY SHORTEST PATH", "ANY SHORTEST PATHS",
        "SHORTEST 1", "SHORTEST 1 PATH", "SHORTEST 1 PATHS",
        "ALL SHORTEST", "ALL SHORTEST PATH", "ALL SHORTEST PATHS",
        "SHORTEST GROUP", "SHORTEST GROUPS",
        "SHORTEST 1 GROUP", "SHORTEST 1 GROUPS"])
    def test_one_winner_selectors(self, spark, g, sel):
        run(spark, g, TWO_ROUTE).collect()
        got = one(spark, g, """
            MATCH p = %s (:A)-->+(:D)
            WITH nodes(p) AS n ORDER BY size(n)
            RETURN collect([m IN n | labels(m)[0]]) AS result
        """ % sel)
        assert got == [["A", "X", "D"]]

    @pytest.mark.parametrize("sel", [
        "SHORTEST 2", "SHORTEST 2 PATH", "SHORTEST 2 PATHS",
        "SHORTEST 3", "SHORTEST 3 PATH", "SHORTEST 3 PATHS",
        "SHORTEST 2 GROUP", "SHORTEST 2 GROUPS",
        "SHORTEST 3 GROUP", "SHORTEST 3 GROUPS"])
    def test_two_winner_selectors(self, spark, g, sel):
        run(spark, g, TWO_ROUTE).collect()
        got = one(spark, g, """
            MATCH p = %s (:A)-->+(:D)
            WITH nodes(p) AS n ORDER BY size(n)
            RETURN collect([m IN n | labels(m)[0]]) AS result
        """ % sel)
        assert got == [["A", "X", "D"], ["A", "B", "C", "D"]]

    @pytest.mark.parametrize("sel,expect", [
        ("ANY", 1), ("ANY PATH", 1), ("ANY PATHS", 1),
        ("ANY 1", 1), ("ANY 1 PATH", 1), ("ANY 1 PATHS", 1),
        ("ANY 2", 2), ("ANY 2 PATH", 2), ("ANY 2 PATHS", 2),
        ("ANY 3", 2), ("ANY 3 PATH", 2), ("ANY 3 PATHS", 2)])
    def test_any_counts(self, spark, g, sel, expect):
        run(spark, g, TWO_ROUTE).collect()
        assert one(spark, g, """
            MATCH %s (:A)-->+(:D) RETURN count(*) AS result
        """ % sel) == expect

    @pytest.mark.parametrize("sel", [
        "ANY SHORTEST", "SHORTEST 1", "SHORTEST 2", "ALL SHORTEST",
        "SHORTEST GROUP", "SHORTEST PATH GROUP", "SHORTEST PATHS GROUP",
        "SHORTEST 1 PATH GROUP", "SHORTEST 1 PATHS GROUPS",
        "ANY", "ANY 1", "ANY 2"])
    def test_pattern_internal_negated_label_filters_route(self, spark, g,
                                                          sel):
        # with (:!X) inside the QPP, only the long route survives,
        # and it survives BEFORE the selector picks winners
        run(spark, g, TWO_ROUTE).collect()
        got = one(spark, g, """
            MATCH p = %s (:A)(()-->(:!X))+(:D)
            WITH nodes(p) AS n ORDER BY size(n)
            RETURN collect([m IN n | labels(m)[0]]) AS result
        """ % sel)
        assert got == [["A", "B", "C", "D"]]


class TestSelectorPredicateTimingR6:
    FIXTURE = """
        CREATE (a:A), (b:B),
          (a)-[:R]->()-[:R]->()-[:R]->(b),
          (a)-[:R]->()-[:X]->(b)
    """

    @pytest.mark.parametrize("sel", [
        "ANY SHORTEST", "SHORTEST 1", "SHORTEST 2", "ALL SHORTEST",
        "SHORTEST GROUP", "SHORTEST 1 GROUP", "SHORTEST 2 GROUP",
        "ANY", "ANY 1", "ANY 2"])
    def test_element_predicate_before_selector(self, spark, g, sel):
        run(spark, g, self.FIXTURE).collect()
        assert one(spark, g, """
            MATCH p = %s (:A)-[r WHERE r:!X]->+(:B)
            RETURN count(*) AS result
        """ % sel) == 1

    @pytest.mark.parametrize("sel", [
        "ANY SHORTEST", "SHORTEST 1", "SHORTEST 2", "ALL SHORTEST",
        "SHORTEST GROUP", "SHORTEST 1 GROUP", "SHORTEST 2 GROUP",
        "ANY", "ANY 1", "ANY 2"])
    def test_path_pattern_predicate_before_selector(self, spark, g, sel):
        run(spark, g, self.FIXTURE).collect()
        assert one(spark, g, """
            MATCH %s ((:A)-[r]->+(:B) WHERE none(rel IN r WHERE rel:X))
            RETURN count(*) AS result
        """ % sel) == 1

    @pytest.mark.parametrize("sel,expect", [
        ("ANY SHORTEST", 0), ("SHORTEST 1", 0), ("SHORTEST 2", 1),
        ("ALL SHORTEST", 0), ("SHORTEST GROUP", 0),
        ("SHORTEST 1 GROUP", 0), ("SHORTEST 2 GROUP", 1)])
    def test_graph_pattern_where_after_selector(self, spark, g, sel,
                                                expect):
        run(spark, g, self.FIXTURE).collect()
        assert one(spark, g, """
            MATCH %s (:A)-[r]->+(:B) WHERE none(rel IN r WHERE rel:X)
            RETURN count(*) AS result
        """ % sel) == expect

    @pytest.mark.parametrize("sel,expect", [
        ("ANY SHORTEST", 0), ("SHORTEST 2", 1), ("ALL SHORTEST", 0),
        ("SHORTEST 2 GROUP", 1)])
    def test_parenthesised_whole_pattern_where_after_selector(
            self, spark, g, sel, expect):
        run(spark, g, self.FIXTURE).collect()
        assert one(spark, g, """
            MATCH %s ((:A)-[r]->+(:B)) WHERE none(rel IN r WHERE rel:X)
            RETURN count(*) AS result
        """ % sel) == expect


class TestSelectorTieCountingR6:
    def test_any_shortest_per_pair(self, spark, g):
        run(spark, g, LATTICE).collect()
        got = _paths_by_len(spark, g, "ANY SHORTEST")
        assert got == {("s1", "t1"): {4: 1}, ("s2", "t1"): {3: 1}}

    def test_shortest_six(self, spark, g):
        run(spark, g, LATTICE).collect()
        got = _paths_by_len(spark, g, "SHORTEST 6")
        assert got == {("s1", "t1"): {4: 6},
                       ("s2", "t1"): {3: 3, 5: 3}}

    def test_shortest_seven(self, spark, g):
        run(spark, g, LATTICE).collect()
        got = _paths_by_len(spark, g, "SHORTEST 7")
        assert got == {("s1", "t1"): {4: 6, 6: 1},
                       ("s2", "t1"): {3: 3, 5: 4}}

    def test_all_shortest_ties(self, spark, g):
        run(spark, g, LATTICE).collect()
        got = _paths_by_len(spark, g, "ALL SHORTEST")
        assert got == {("s1", "t1"): {4: 6}, ("s2", "t1"): {3: 3}}

    def test_shortest_group_is_all_ties(self, spark, g):
        run(spark, g, LATTICE).collect()
        for sel in ("SHORTEST GROUP", "SHORTEST 1 GROUP"):
            got = _paths_by_len(spark, g, sel)
            assert got == {("s1", "t1"): {4: 6}, ("s2", "t1"): {3: 3}}, sel

    def test_shortest_four_groups(self, spark, g):
        run(spark, g, LATTICE).collect()
        got = _paths_by_len(spark, g, "SHORTEST 4 GROUPS")
        assert got == {("s1", "t1"): {4: 6, 6: 4, 8: 6},
                       ("s2", "t1"): {3: 3, 5: 5, 7: 6, 9: 10}}

    def test_filtered_variants(self, spark, g):
        run(spark, g, LATTICE).collect()
        assert _paths_by_len(spark, g, "ALL SHORTEST", ":!X") == {
            ("s1", "t1"): {4: 2}, ("s2", "t1"): {3: 1}}
        assert _paths_by_len(spark, g, "SHORTEST 2 GROUPS", ":!X") == {
            ("s1", "t1"): {4: 2}, ("s2", "t1"): {3: 1, 5: 1}}
        assert _paths_by_len(spark, g, "SHORTEST 2", ":!X") == {
            ("s1", "t1"): {4: 2}, ("s2", "t1"): {3: 1, 5: 1}}

    @pytest.mark.parametrize("sel,s1,s2", [
        ("ANY", 1, 1), ("ANY 1", 1, 1), ("ANY 17", 16, 17)])
    def test_any_k_counts_on_lattice(self, spark, g, sel, s1, s2):
        run(spark, g, LATTICE).collect()
        out = rows(run(spark, g, """
            MATCH p = %s (:S) (()--())+ (:T)
            WITH nodes(p) AS ns
            RETURN head(ns).n AS first, count(*) AS cnt
        """ % sel))
        got = dict(out)
        assert got == {"s1": s1, "s2": s2}


class TestSelectorMultiplePairsR6:
    FIXTURE = """
        CREATE (n1:A {p: 1}), (n2:A {p: 2}), (n3 {p: 3}), (n4 {p: 4}),
               (n5 {p: 5}), (n6:B {p: 6}), (n7:B {p: 7}),
          (n1)-[:R]->(n4)-[:R]->(n5)-[:R]->(n6)-[:R]->(n7),
          (n2)-[:R]->(n3)-[:R]->(n4)-[:R]->(n6)
    """

    def _collect(self, spark, g, sel):
        return sorted(one(spark, g, """
            MATCH p = %s (:A)-->+(:B)
            WITH nodes(p) AS n
            ORDER BY head(n).p, size(n), last(n).p
            RETURN collect([m IN n | m.p]) AS result
        """ % sel))

    @pytest.mark.parametrize("sel", [
        "ANY SHORTEST", "SHORTEST 1", "ALL SHORTEST",
        "SHORTEST GROUP", "SHORTEST 1 GROUP"])
    def test_one_per_pair(self, spark, g, sel):
        run(spark, g, self.FIXTURE).collect()
        assert self._collect(spark, g, sel) == sorted([
            [1, 4, 6], [1, 4, 6, 7], [2, 3, 4, 6], [2, 3, 4, 6, 7]])

    @pytest.mark.parametrize("sel", [
        "SHORTEST 2", "SHORTEST 3", "SHORTEST 2 GROUPS",
        "SHORTEST 3 GROUPS"])
    def test_two_per_pair(self, spark, g, sel):
        run(spark, g, self.FIXTURE).collect()
        assert self._collect(spark, g, sel) == sorted([
            [1, 4, 6], [1, 4, 5, 6], [1, 4, 6, 7], [1, 4, 5, 6, 7],
            [2, 3, 4, 6], [2, 3, 4, 5, 6], [2, 3, 4, 6, 7],
            [2, 3, 4, 5, 6, 7]])


class TestSelectorOptionalMatchR6:
    FIXTURE = "CREATE (a:A)-[:R]->()-[:R]->(:B)<-[:R]-(a)"

    @pytest.mark.parametrize("sel,lens", [
        ("ANY SHORTEST", [1]), ("SHORTEST 1", [1]),
        ("SHORTEST 2", [1, 2]), ("SHORTEST 3", [1, 2]),
        ("ALL SHORTEST", [1]), ("SHORTEST GROUP", [1]),
        ("SHORTEST 2 GROUPS", [1, 2])])
    def test_optional_match_with_matches(self, spark, g, sel, lens):
        run(spark, g, self.FIXTURE).collect()
        got = sorted(r[0] for r in rows(run(spark, g, """
            MATCH (a:A), (b:B)
            OPTIONAL MATCH %s (a)-[r:R]->+(b)
            RETURN size(r) AS len
        """ % sel)))
        assert got == lens

    @pytest.mark.parametrize("sel", [
        "ANY SHORTEST", "SHORTEST 1", "ALL SHORTEST", "SHORTEST GROUP"])
    def test_optional_match_preserves_row_on_miss(self, spark, g, sel):
        run(spark, g, self.FIXTURE).collect()
        got = rows(run(spark, g, """
            MATCH (a:A), (b:B)
            OPTIONAL MATCH %s (a)-[r:T]->+(b)
            RETURN a.nope AS an, r AS r
        """ % sel))
        assert got == [(None, None)]


class TestSelectorConcatenatedQppR6:
    def test_two_qpps_shortest_k(self, spark, g):
        run(spark, g, """
            CREATE (n1:A {p: 1})-[:R]->(n2 {p: 2})-[:R]->(n4:B {p: 4})
                   -[:T]->(n5:B {p: 5}),
                   (n2)-[:R]->(n3 {p: 3})-[:T]->(n4)
        """).collect()
        for sel, expect in [
                ("ANY SHORTEST", [[1, 2, 4], [1, 2, 4, 5]]),
                ("SHORTEST 1", [[1, 2, 4], [1, 2, 4, 5]]),
                ("SHORTEST 2", [[1, 2, 4], [1, 2, 3, 4], [1, 2, 4, 5],
                                [1, 2, 3, 4, 5]]),
                ("ALL SHORTEST", [[1, 2, 4], [1, 2, 4, 5]]),
                ("SHORTEST 2 GROUPS", [[1, 2, 4], [1, 2, 3, 4],
                                       [1, 2, 4, 5], [1, 2, 3, 4, 5]])]:
            got = sorted(one(spark, g, """
                MATCH p = %s (:A)-[:R]->+()-[:T]->*(:B)
                WITH nodes(p) AS n ORDER BY size(n), last(n).p
                RETURN collect([m IN n | m.p]) AS result
            """ % sel))
            assert got == sorted(expect), sel

    def test_rigid_multi_node_unit_shortest_k(self, spark, g):
        run(spark, g, """
            CREATE (s:S)-[:R]->(:A)-[:R]->(:B)-[:R]->(:A)-[:R]->(t:B:T),
              (s)-[:R]->(:A)-[:R]->(:B)-[:R]->(:A)-[:R]->(:B)-[:R]->(:A)
                 -[:R]->(t),
              (s)-[:R]->(:A)-[:R]->(:B)-[:R]->(t)
        """).collect()
        for sel, sizes in [("ANY SHORTEST", [5]), ("SHORTEST 1", [5]),
                           ("SHORTEST 2", [5, 7]), ("ALL SHORTEST", [5]),
                           ("SHORTEST GROUP", [5]),
                           ("SHORTEST 2 GROUPS", [5, 7])]:
            got = sorted(r[0] for r in rows(run(spark, g, """
                MATCH p = %s (:S)(()-->(:A)-->(:B))+(:T)
                RETURN size(nodes(p)) AS n
            """ % sel)))
            assert got == sizes, sel

    def test_fixed_path_concatenated_with_qpp(self, spark, g):
        run(spark, g, """
            CREATE (n1:A {p: 1})-[:T]->(n2:B {p: 2})-[:S]->(n3:B {p: 3})
                   -[:R]->(n4 {p: 4}),
              (n2)-[:R]->(n5 {p: 5})-[:R]->(n3), (n4)-[:T]->(n3)
                   -[:T]->(n2)
        """).collect()
        for sel, expect in [
                ("ANY SHORTEST", [[1, 2], [1, 2, 5, 3, 4, 3]]),
                ("SHORTEST 1", [[1, 2], [1, 2, 5, 3, 4, 3]]),
                ("SHORTEST 2", [[1, 2], [1, 2, 5, 3, 2],
                                [1, 2, 5, 3, 4, 3]]),
                ("SHORTEST 3", [[1, 2], [1, 2, 5, 3, 2],
                                [1, 2, 5, 3, 4, 3],
                                [1, 2, 5, 3, 4, 3, 2]]),
                ("ALL SHORTEST", [[1, 2], [1, 2, 5, 3, 4, 3]]),
                ("SHORTEST GROUP", [[1, 2], [1, 2, 5, 3, 4, 3]]),
                ("SHORTEST 3 GROUPS", [[1, 2], [1, 2, 5, 3, 2],
                                       [1, 2, 5, 3, 4, 3],
                                       [1, 2, 5, 3, 4, 3, 2]])]:
            got = sorted(one(spark, g, """
                MATCH p = %s (:A)-[:!S]->*()-[:T]->(:B)
                WITH nodes(p) AS n ORDER BY size(n), last(n).p
                RETURN collect([m IN n | m.p]) AS result
            """ % sel))
            assert got == sorted(expect), sel

    @pytest.mark.parametrize("sel,expect", [
        ("ANY", 2), ("ANY 1", 2), ("ANY 2", 3), ("ANY 3", 4),
        ("ANY 4", 4)])
    def test_fixed_path_concatenated_with_qpp_any_k(self, spark, g, sel,
                                                    expect):
        run(spark, g, """
            CREATE (n1:A {p: 1})-[:T]->(n2:B {p: 2})-[:S]->(n3:B {p: 3})
                   -[:R]->(n4 {p: 4}),
              (n2)-[:R]->(n5 {p: 5})-[:R]->(n3), (n4)-[:T]->(n3)
                   -[:T]->(n2)
        """).collect()
        assert one(spark, g, """
            MATCH %s (:A)-[:!S]->*()-[:T]->(:B)
            RETURN count(*) AS result
        """ % sel) == expect


class TestSelectorCyclesAndBoundsR6:
    CYCLES = """
        CREATE (n1:A {p: 1})-[:R]->(n2:B {p: 2})-[:R]->(n3:A {p: 3})
               -[:R]->(n4:B {p: 4})-[:R]->(n1),
          (n4)-[:R]->(n5:A {p: 5})-[:R]->(n6:B {p: 6})-[:R]->(n1)
    """

    def test_shortest_simple_cycle(self, spark, g):
        run(spark, g, self.CYCLES).collect()
        for sel, expect in [
                ("ANY SHORTEST", [[1, 2, 3, 4, 1]]),
                ("SHORTEST 1", [[1, 2, 3, 4, 1]]),
                ("SHORTEST 2", [[1, 2, 3, 4, 1], [1, 2, 3, 4, 5, 6, 1]]),
                ("ALL SHORTEST", [[1, 2, 3, 4, 1]]),
                ("SHORTEST GROUP", [[1, 2, 3, 4, 1]]),
                ("SHORTEST 2 GROUPS", [[1, 2, 3, 4, 1],
                                       [1, 2, 3, 4, 5, 6, 1]])]:
            got = sorted(one(spark, g, """
                MATCH p = %s (n {p: 1})(()-->(:B)-->(:A))+(n)
                WITH nodes(p) AS n2 ORDER BY size(n2), last(n2).p
                RETURN collect([m IN n2 | m.p]) AS result
            """ % sel))
            assert got == sorted(expect), sel

    @pytest.mark.parametrize("sel,expect", [
        ("ANY", 1), ("ANY 1", 1), ("ANY 2", 2), ("ANY 3", 2)])
    def test_any_simple_cycle_counts(self, spark, g, sel, expect):
        run(spark, g, self.CYCLES).collect()
        assert one(spark, g, """
            MATCH p = %s (n {p: 1})(()-->(:B)-->(:A))+(n)
            RETURN count(*) AS result
        """ % sel) == expect

    LOWER = """
        CREATE (n1:A {p: 1})-[:R]->(n2 {p: 2})-[:R]->(n3:B {p: 3})
               -[:R]->(n4:B {p: 4})-[:R]->(n7:B {p: 7}),
          (n1)-[:R]->(n5 {p: 5})-[:R]->(n6 {p: 6})-[:R]->(n3)
    """

    def test_lower_bound_prunes_shortest(self, spark, g):
        run(spark, g, self.LOWER).collect()
        for sel, expect in [
                ("ANY SHORTEST", [[1, 5, 6, 3, 4], [1, 2, 3, 4, 7]]),
                ("SHORTEST 1", [[1, 5, 6, 3, 4], [1, 2, 3, 4, 7]]),
                ("SHORTEST 2", [[1, 5, 6, 3, 4], [1, 2, 3, 4, 7],
                                [1, 5, 6, 3, 4, 7]]),
                ("ALL SHORTEST", [[1, 5, 6, 3, 4], [1, 2, 3, 4, 7]]),
                ("SHORTEST 2 GROUPS", [[1, 5, 6, 3, 4], [1, 2, 3, 4, 7],
                                       [1, 5, 6, 3, 4, 7]])]:
            got = sorted(one(spark, g, """
                MATCH p = %s (:A)-->{4,}(:B)
                WITH nodes(p) AS n ORDER BY size(n), last(n).p
                RETURN collect([m IN n | m.p]) AS result
            """ % sel))
            assert got == sorted(expect), sel

    @pytest.mark.parametrize("sel,expect", [
        ("ANY", 2), ("ANY 1", 2), ("ANY 2", 3), ("ANY 3", 3)])
    def test_lower_bound_prunes_any(self, spark, g, sel, expect):
        run(spark, g, self.LOWER).collect()
        assert one(spark, g, """
            MATCH %s (:A)-->{4,}(:B)
            RETURN count(*) AS result
        """ % sel) == expect


class TestSelectorInSubqueryExprsR6:
    FIXTURE = """
        CREATE (n1:A {p: 1})-[:R]->(n2 {p: 2})-[:R]->(n3:B {p: 3}),
          (n1)-[:R]->(n4 {p: 4})-[:R]->(n5:B {p: 5}),
          (n4)-[:R]->(n2),
          (n1)-[:R]->(n6:B {p: 6})-[:R]->(n2)
    """

    @pytest.mark.parametrize("sel", [
        "ANY SHORTEST", "SHORTEST 1", "ALL SHORTEST", "SHORTEST GROUP",
        "ALL"])
    def test_exists_with_selector(self, spark, g, sel):
        run(spark, g, self.FIXTURE).collect()
        assert one(spark, g, """
            MATCH (m:A)
            RETURN EXISTS {
              MATCH p = %s (m)-[r]->+(n:B)
              RETURN 1 AS x
            } AS result
        """ % sel) is True

    @pytest.mark.parametrize("sel,expect", [
        ("ANY SHORTEST", 3), ("SHORTEST 1", 3), ("SHORTEST 2", 4),
        ("SHORTEST 3", 5), ("SHORTEST 4", 5), ("ALL SHORTEST", 3),
        ("SHORTEST GROUP", 3), ("SHORTEST 1 GROUP", 3),
        ("SHORTEST 2 GROUPS", 5), ("SHORTEST 3 GROUPS", 5), ("ALL", 5)])
    def test_count_with_selector(self, spark, g, sel, expect):
        run(spark, g, self.FIXTURE).collect()
        assert one(spark, g, """
            MATCH (m:A)
            RETURN COUNT {
              MATCH p = %s (m)-[r]->+(n:B)
              RETURN 1 AS x
            } AS result
        """ % sel) == expect

    @pytest.mark.parametrize("sel,expect", [
        ("ANY SHORTEST", ["16", "123", "145"]),
        ("SHORTEST 1", ["16", "123", "145"]),
        ("SHORTEST 3", ["16", "123", "145", "1423", "1623"]),
        ("ALL SHORTEST", ["16", "123", "145"]),
        ("SHORTEST 2 GROUPS", ["16", "123", "145", "1423", "1623"]),
        ("ALL", ["16", "123", "145", "1423", "1623"])])
    def test_collect_with_selector(self, spark, g, sel, expect):
        run(spark, g, self.FIXTURE).collect()
        got = one(spark, g, """
            MATCH (m:A)
            RETURN COLLECT {
              MATCH p = %s (m)-[r]->+(n:B)
              RETURN reduce(acc = '', q IN nodes(p) | acc + q.p) AS ns
              ORDER BY size(r), ns
            } AS result
        """ % sel)
        assert sorted(got) == sorted(expect)

    @pytest.mark.parametrize("sel,expect", [
        ("ANY", 3), ("ANY 1", 3), ("ANY 2", 4), ("ANY 3", 5),
        ("ANY 4", 5)])
    def test_count_with_any_k(self, spark, g, sel, expect):
        run(spark, g, self.FIXTURE).collect()
        assert one(spark, g, """
            MATCH (m:A)
            RETURN COUNT {
              MATCH %s (m)-[r]->+(n:B)
              RETURN n.p AS x
            } AS result
        """ % sel) == expect


class TestSelectorCompositionRulesR6:
    def test_multiple_non_selective_patterns_allowed(self, spark, g):
        run(spark, g, """
            CREATE (:A {p: 1})-[:R]->(b:B {p: 2})-[:R]->(:C {p: 3}),
              (:D {p: 4})-[:R]->(b)-[:R]->(:E {p: 5})
        """).collect()
        for sel1, sel2 in [("", ""), ("ALL ", ""), ("ALL ", "ALL ")]:
            got = rows(run(spark, g, """
                MATCH p = %s(n0:A)-->*(n1)-->*(n2:C),
                      q = %s(n1)-->(n3:E)
                RETURN [n IN nodes(p) | n.p] AS p1,
                       [n IN nodes(q) | n.p] AS p2
            """ % (sel1, sel2)))
            assert got == [([1, 2, 3], [2, 5])], (sel1, sel2)

    @pytest.mark.parametrize("sel1,sel2", [
        ("ANY SHORTEST ", ""), ("SHORTEST 1 ", ""), ("ALL SHORTEST ", ""),
        ("SHORTEST GROUP ", ""), ("ANY SHORTEST ", "ALL "),
        ("SHORTEST 1 ", "SHORTEST GROUP "),
        ("ALL SHORTEST ", "ANY SHORTEST ")])
    def test_selective_must_be_sole_pattern(self, spark, g, sel1, sel2):
        with pytest.raises(Exception):
            run(spark, g, """
                MATCH p = %s(n0:A)-->*(n1)-->*(n2:C), %s(n1)-->+(:E)
                RETURN *
            """ % (sel1, sel2)).collect()

    @pytest.mark.parametrize("sel", ["SHORTEST 0", "SHORTEST 0 GROUP"])
    def test_zero_paths_rejected(self, spark, g, sel):
        with pytest.raises(Exception):
            run(spark, g,
                "MATCH p = %s (:A)-->*(:C) RETURN *" % sel).collect()

    def test_selective_patterns_in_separate_matches(self, spark, g):
        run(spark, g, """
            CREATE (a:A)-[:R]->(x:X)-[:R]->(m:M)-[:R]->(c:C),
                   (x)-[:R]->(c),
                   (a)-[:R]->(y:Y)-[:R]->(n:N)-[:R]->(c),
                   (n)-[:R]->(m),
                   (b:B)-[:R]->(x),
                   (b)-[:R]->(y)
        """).collect()
        got = sorted(one(spark, g, """
            MATCH p = ANY SHORTEST (:A)-->+(x:X|Y)-->+(:C)
            MATCH q = ANY SHORTEST (:B)-->+(x)-->+(:C)
            WITH nodes(p) AS np, nodes(q) AS nq
            WITH reduce(acc = '', n IN np | acc + labels(n)[0]) AS Ps,
                 reduce(acc = '', n IN nq | acc + labels(n)[0]) AS Qs
            ORDER BY size(Ps), Ps, size(Qs), Qs
            RETURN collect([Ps, Qs]) AS result
        """))
        assert got == sorted([["AXC", "BXC"]])

    def test_legacy_and_gpm_shortest_mix(self, spark, g):
        run(spark, g,
            "CREATE (a:A)-[:R]->(:B)-[:R]->(:C)-[:R]->(:D)-[:R]->(a)"
            ).collect()
        assert one(spark, g, """
            MATCH p = shortestPath((:A)-[*]-(:D))
            MATCH q = SHORTEST 1 (:A)-[*]-(:D)
            RETURN nodes(p) = nodes(q) AS result
        """) is True


class TestSelectorFixedAndLegacyPatternsR6:
    @pytest.mark.parametrize("sel,expect", [
        ("ANY SHORTEST", [["a1", "b", 1], ["a2", "b", 1]]),
        ("SHORTEST 1", [["a1", "b", 1], ["a2", "b", 1]]),
        ("SHORTEST 2", [["a1", "b", 2], ["a2", "b", 1]]),
        ("ALL SHORTEST", [["a1", "b", 2], ["a2", "b", 1]]),
        ("SHORTEST GROUP", [["a1", "b", 2], ["a2", "b", 1]]),
        ("ANY", [["a1", "b", 1], ["a2", "b", 1]]),
        ("ANY 2", [["a1", "b", 2], ["a2", "b", 1]])])
    def test_fixed_length_pattern_with_selector(self, spark, g, sel,
                                                expect):
        run(spark, g, """
            CREATE (a1:A {p: 'a1'})-[:R]->(b:B {p: 'b'}),
                   (a1)-[:R]->(b), (:A {p: 'a2'})-[:R]->(b)
        """).collect()
        got = rows(run(spark, g, """
            MATCH %s (a:A)-->(b:B)
            WITH a.p AS ap, b.p AS bp, count(*) AS count
            ORDER BY ap, bp
            RETURN ap, bp, count
        """ % sel))
        assert [list(r) for r in got] == expect

    @pytest.mark.parametrize("sel", [
        "ANY SHORTEST", "SHORTEST 1", "SHORTEST 2", "ALL SHORTEST",
        "SHORTEST GROUP", "ANY", "ANY 2"])
    def test_node_only_pattern_with_selector(self, spark, g, sel):
        run(spark, g, "CREATE (:A {p: 'a1'}), (:A {p: 'a2'})").collect()
        got = rows(run(spark, g, """
            MATCH %s (a:A)
            WITH a.p AS ap, count(*) AS count ORDER BY ap
            RETURN ap, count
        """ % sel))
        assert [list(r) for r in got] == [["a1", 1], ["a2", 1]]

    @pytest.mark.parametrize("sel", [
        "ANY SHORTEST", "SHORTEST 2", "ALL SHORTEST", "SHORTEST GROUP",
        "ANY", "ANY 2"])
    def test_single_node_solution_kleene_star(self, spark, g, sel):
        run(spark, g,
            "CREATE (:A:B {p: 'a1'})-[:REL]->(:A {p: 'a2'})").collect()
        got = rows(run(spark, g, """
            MATCH %s (a:A)-->*(:B)
            WITH a.p AS ap, count(*) AS count ORDER BY ap
            RETURN ap, count
        """ % sel))
        assert [list(r) for r in got] == [["a1", 1]]

    @pytest.mark.parametrize("sel", [
        "ANY SHORTEST", "SHORTEST 2", "ALL SHORTEST", "SHORTEST GROUP",
        "ANY", "ANY 2"])
    def test_legacy_var_length_under_selector(self, spark, g, sel):
        run(spark, g, "CREATE ({p: 1})-[:R]->({p: 2})-[:T]->({p: 3})"
            ).collect()
        got = sorted(one(spark, g, """
            MATCH %s (p = ()-[*1]->())
            RETURN collect([n IN nodes(p) | n.p]) AS result
        """ % sel))
        assert got == sorted([[1, 2], [2, 3]])

    @pytest.mark.parametrize("sel", [
        "ANY SHORTEST", "SHORTEST 2", "ALL SHORTEST", "ANY 2"])
    def test_legacy_var_length_zero_one_undirected(self, spark, g, sel):
        run(spark, g, "CREATE (:A)-[:R]->(:B)-[:T]->(:B)").collect()
        got = one(spark, g, """
            MATCH %s (p = (a:A)-[*0..1]-(b:B))
            RETURN collect([n IN nodes(p) | labels(n)[0]]) AS result
        """ % sel)
        assert got == [["A", "B"]]


class TestSelectorBoundEntitiesR6:
    @pytest.mark.parametrize("sel", [
        "ANY SHORTEST", "SHORTEST 2", "ALL SHORTEST", "SHORTEST GROUP",
        "SHORTEST 2 GROUPS", "ANY 2"])
    def test_previously_bound_boundary_node(self, spark, g, sel):
        run(spark, g, "CREATE (:L {p: 1})-[:R]->({p: 2})-[:R]->({p: 3})"
            ).collect()
        got = sorted(one(spark, g, """
            MATCH (start)
            MATCH %s (p = (start:L)((a)-[r:R]->(b))+(end))
            RETURN collect([n IN nodes(p) | n.p]) AS result
        """ % sel))
        assert got == sorted([[1, 2], [1, 2, 3]])

    @pytest.mark.parametrize("sel", [
        "ANY SHORTEST", "SHORTEST 2", "ALL SHORTEST", "ANY 2"])
    def test_previously_bound_relationship(self, spark, g, sel):
        run(spark, g, "CREATE ({p: 1})-[:R]->({p: 2})-[:T]->({p: 3})"
            ).collect()
        got = one(spark, g, """
            MATCH ()-[r]->()
            MATCH %s (p = (start)-[r:R]->(a)((b)-[]->(c))+(end))
            RETURN collect([n IN nodes(p) | n.p]) AS result
        """ % sel)
        assert got == [[1, 2, 3]]

    @pytest.mark.parametrize("sel", [
        "ANY SHORTEST", "SHORTEST 2", "ALL SHORTEST", "ANY 2"])
    def test_same_variable_twice_in_unit(self, spark, g, sel):
        run(spark, g,
            "CREATE (a:A:B {p: 1})-[:R]->({p: 2})-[:S]->(a)").collect()
        got = one(spark, g, """
            MATCH %s (p = (start)((a:A)-[]->()-[]->(a:B))+(end))
            RETURN collect([n IN nodes(p) | n.p]) AS result
        """ % sel)
        assert got == [[1, 2, 1]]

    @pytest.mark.parametrize("sel", [
        "ANY SHORTEST", "SHORTEST 2", "ALL SHORTEST", "ANY 2"])
    def test_whole_path_prefilter_predicate(self, spark, g, sel):
        run(spark, g, "CREATE ({p: 1})-[:R]->({p: 2})-[:R]->({p: 3})"
                      "-[:R]->({p: 4})-[:R]->({p: 5})").collect()
        got = one(spark, g, """
            MATCH %s (p = ((start)((a)-[r:R]->(b))+(end))
                      WHERE length(p) > 3)
            RETURN collect([n IN nodes(p) | n.p]) AS result
        """ % sel)
        assert got == [[1, 2, 3, 4, 5]]


class TestSelectorPatternExprInQppR6:
    @pytest.mark.parametrize("pattern", [
        "(m)-->()-->(:N)",
        "CASE WHEN (m)-->() THEN EXISTS { (m)-->()-->(:N) } "
        "ELSE false END",
        "[p2 = (m)-->()-->(:N) | length(p2)] <> []",
        "COUNT { (m)-->()-->(:N) } = 1",
        "COUNT { (m)-->()-->(:N) } = 1 AND (m)-->()-->(:N)"])
    def test_pattern_expr_in_qpp_where(self, spark, g, pattern):
        run(spark, g, """
            CREATE (start:Start {p: 0})-[:R]->(:Wrong {p: 9})-[:R]->
                   (end:End {p: 3})
            CREATE (start)-[:R]->(r1:Right {p: 1})-[:R]->
                   (r2:Right {p: 2})-[:R]->(end)
            CREATE (r1)-[:R]->({p: 7})-[:R]->(:N)
            CREATE (r2)-[:R]->({p: 8})-[:R]->(:N)
            CREATE (end)-[:R]->({p: 6})-[:R]->(:N)
        """).collect()
        got = one(spark, g, """
            MATCH p = SHORTEST 1 (start:Start)
                      ((n)-[r]->(m) WHERE n <> m AND %s)+
                      (end:End)
            RETURN [q IN nodes(p) | q.p] AS result
        """ % pattern)
        assert got == [0, 1, 2, 3]

    def test_pattern_expr_picks_longer_shortest(self, spark, g):
        run(spark, g, """
            CREATE (u:User {p: 0}), (v:User {p: 9})
            CREATE (u)-[:R]->(b1 {p: 1})-[:R]->(b2 {p: 2})-[:R]->
                   (b3 {p: 3})-[:R]->(v)
            CREATE (b1)-[:R]->(:N), (b2)-[:R]->(:N), (b3)-[:R]->(:N),
                   (v)-[:R]->(:N)
            CREATE (u)-[:R]->(b4 {p: 4})-[:R]->(b5 {p: 5})-[:R]->(v)
            CREATE (b4)-[:R]->(:N), (b5)-[:R]->(:N)
            CREATE (u)-[:R]->(b6 {p: 6})-[:R]->(v)
        """).collect()
        assert one(spark, g, """
            MATCH p = ANY SHORTEST (u:User)
                      ((a)-[r]->(b) WHERE (b)-->(:N))+ (v:User)
            RETURN length(p) AS l
        """) == 3

    def test_pattern_expr_outside_qpp(self, spark, g):
        run(spark, g, """
            CREATE (u:User {p: 0}), (v {p: 8})-[:R]->(w:User {p: 9}),
                   (v)-[:R]->(:N)
            CREATE (u)-[:R]->(b1 {p: 1})-[:R]->(b2 {p: 2})-[:R]->
                   (b3 {p: 3})-[:R]->(v)
            CREATE (u)-[:R]->(b4 {p: 4})-[:R]->(b5 {p: 5})-[:R]->(v)
            CREATE (u)-[:R]->(b6 {p: 6})-[:R]->(w)
        """).collect()
        assert one(spark, g, """
            MATCH p = ANY SHORTEST ((u:User) ((a)-[r]->(b))+ (v)--(w:User)
                                    WHERE (v)-->(:N))
            RETURN length(p) AS l
        """) == 4
