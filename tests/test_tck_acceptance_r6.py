"""TCK-style acceptance tranche 2 (round 6): orderability, ternary
equality/comparison, NaN, concatenation, list comprehension, trim,
literal, and temporal scenarios — behavior-ported from the reference's
acceptance corpus (community/cypher/spec-suite-tools/src/test/resources/
acceptance/features/{OrderByAcceptance,TernaryEqualityAcceptance,
TernaryComparisonAcceptance,NaNAcceptance,ConcatenationAcceptance,
ListComprehensionAcceptance,TrimFunctionsAcceptance,LiteralAcceptance}
.feature) with fresh fixtures and wording.  These areas are where every
oracle-caught bug has lived (VERDICT r5 Next #4)."""

import math

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


class TestOrderByAcceptanceR6:
    def test_cross_type_ascending_full_order(self, spark, g):
        # OrderByAcceptance "Ordering is well defined across all types":
        # MAP < NODE < REL < LIST < PATH < STRING < BOOLEAN < NUMBER < null
        run(spark, g, "CREATE (:A {t: 'node'})-[:T {t: 'rel'}]->()") \
            .collect()
        out = run(spark, g, """
            MATCH p = (n:A)-[r]->()
            WITH [n, r, p, '', 1, 3.14, true, null, [], {}] AS types
            UNWIND types AS t
            WITH t ORDER BY t ASC
            RETURN collect(coalesce(valueType(t), 'NULL')) AS o
        """).collect()
        # the unwound [] reports its precise GQL type LIST<NOTHING>
        # (ValueTypeFunctionAcceptance.feature:45 — same UNWIND shape),
        # implemented in the round-7 batch-11 valueType work; this
        # expectation predated that and said LIST<ANY>
        assert out[0]["o"] == [
            "MAP NOT NULL", "NODE NOT NULL", "RELATIONSHIP NOT NULL",
            "LIST<NOTHING> NOT NULL", "PATH NOT NULL", "STRING NOT NULL",
            "BOOLEAN NOT NULL", "INTEGER NOT NULL", "FLOAT NOT NULL",
            "NULL"]

    def test_cross_type_descending_reverses(self, spark, g):
        run(spark, g, "CREATE (:A)-[:T]->()").collect()
        asc = run(spark, g, """
            MATCH p = (n:A)-[r]->()
            UNWIND [n, r, p, '', 1, 3.14, true, null, [], {}] AS t
            WITH t ORDER BY t ASC
            RETURN collect(coalesce(valueType(t), 'NULL')) AS o
        """).collect()[0]["o"]
        desc = run(spark, g, """
            MATCH p = (n:A)-[r]->()
            UNWIND [n, r, p, '', 1, 3.14, true, null, [], {}] AS t
            WITH t ORDER BY t DESC
            RETURN collect(coalesce(valueType(t), 'NULL')) AS o
        """).collect()[0]["o"]
        assert desc == list(reversed(asc))

    def test_list_ordering_ascending(self, spark, g):
        # OrderByAcceptance "Ordering for lists, ascending" shape:
        # element-wise with the global order, prefix-shorter-first
        got = run(spark, g, """
            UNWIND [[1], [1, 2], [1, 3, -1], [], [null, 1],
                    ['string', 1], [true, null], [[''], false],
                    [[0], 4], [[{}]], ['foo'], [true]] AS l
            WITH l ORDER BY l ASC
            RETURN collect(toString(l)) AS o
        """).collect()[0]["o"]
        assert got == [
            "[]", "[[{}]]", "[[], false]", "[[0], 4]", "[foo]",
            "[string, 1]", "[true]", "[true, null]", "[1]", "[1, 2]",
            "[1, 3, -1]", "[null, 1]"]

    def test_missing_property_sorts_null_last_asc(self, spark, g):
        run(spark, g,
            "CREATE (:M {v: 3}), (:M {v: 1}), (:M)").collect()
        got = [r["v"] for r in run(
            spark, g,
            "MATCH (m:M) RETURN m.v AS v ORDER BY m.v ASC").collect()]
        assert got == [1, 3, None]

    def test_order_by_nodes_nulls_last(self, spark, g):
        run(spark, g, "CREATE (:N {v: 1}), (:N {v: 2})").collect()
        got = [r["v"] for r in run(spark, g, """
            MATCH (n:N)
            OPTIONAL MATCH (n)-[:NOPE]->(m)
            RETURN n.v AS v ORDER BY m ASC, n.v ASC
        """).collect()]
        assert got == [1, 2]  # m is null for both: stable on n.v

    def test_order_by_maps_size_then_entries(self, spark, g):
        got = run(spark, g, """
            UNWIND [{b: 1}, {a: 1, b: 1}, {a: 1}, {}] AS m
            WITH m ORDER BY m ASC
            RETURN collect(toString(m)) AS o
        """).collect()[0]["o"]
        # map order: size first, then key-sorted entries
        assert got == ["{}", "{a: 1}", "{b: 1}", "{a: 1, b: 1}"]

    def test_order_by_expression_in_with_and_return(self, spark, g):
        run(spark, g,
            "UNWIND [3, 1, 2] AS x CREATE (:E {v: x})").collect()
        a = [r["w"] for r in run(spark, g, """
            MATCH (e:E) WITH e.v * -1 AS w ORDER BY e.v * -1 RETURN w
        """).collect()]
        b = [r["w"] for r in run(spark, g, """
            MATCH (e:E) RETURN e.v * -1 AS w ORDER BY w
        """).collect()]
        assert a == b == [-3, -2, -1]

    def test_order_by_aggregate_expression(self, spark, g):
        run(spark, g, "UNWIND [1, 1, 2, 3, 3, 3] AS x "
                      "CREATE (:C {v: x})").collect()
        got = rows(run(spark, g, """
            MATCH (c:C) RETURN c.v AS v, count(*) AS n
            ORDER BY count(*) DESC, v ASC
        """))
        assert got == [(3, 3), (1, 2), (2, 1)]

    def test_order_by_two_properties_with_limit(self, spark, g):
        run(spark, g, "CREATE (:T2 {x: 1, y: 'b'}), (:T2 {x: 1, y: 'a'}),"
                      " (:T2 {x: 2, y: 'a'})").collect()
        got = rows(run(spark, g, """
            MATCH (t:T2) RETURN t.x AS x, t.y AS y
            ORDER BY t.x ASC, t.y DESC LIMIT 2
        """))
        assert got == [(1, "b"), (1, "a")]


class TestTernaryEqualityAcceptanceR6:
    def test_list_with_null_element(self, spark, g):
        # [1,2,3] vs [1,null,3]: null element -> undefined
        assert rows(run(spark, g,
                        "RETURN [1, 2, 3] = [1, null, 3] AS eq, "
                        "[1, 2, 3] <> [1, null, 3] AS neq")) \
            == [(None, None)]

    def test_list_with_null_but_definite_diff(self, spark, g):
        # the definite 3 vs 4 mismatch decides FALSE despite the null
        assert rows(run(spark, g,
                        "RETURN [1, 2, 3] = [1, null, 4] AS eq, "
                        "[1, 2, 3] <> [1, null, 4] AS neq")) \
            == [(False, True)]

    def test_list_cross_type_element_is_false(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN [1, 2, 3] = [1, 'two', 3] AS eq")) \
            == [(False,)]

    def test_map_value_null_is_undefined(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN {k: 42} = {k: null} AS eq, "
                        "{k: 42} <> {k: null} AS neq")) == [(None, None)]

    def test_map_different_keys_is_false(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN {k1: 42} = {k2: null} AS eq, "
                        "{k1: 42} <> {k2: null} AS neq")) \
            == [(False, True)]

    def test_map_mixed_null_and_definite_diff(self, spark, g):
        # k3: 44 vs 'fortyfour' is a definite FALSE; the k2 null cannot
        # rescue it
        assert rows(run(spark, g,
                        "RETURN {k1: 42, k2: 43, k3: 44} = "
                        "{k1: 42, k2: null, k3: 'fortyfour'} AS eq")) \
            == [(False,)]

    def test_duration_normalized_equality(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN duration('P1Y') = duration('P12M') AS a, "
                        "duration('PT1H') = duration('PT60M') AS b, "
                        "duration('P1D') = duration('PT24H') AS c")) \
            == [(True, True, False)]  # days vs hours differ

    def test_nested_list_null_propagation(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN [[1, null]] = [[1, null]] AS eq")) \
            == [(None,)]


class TestTernaryComparisonAcceptanceR6:
    def test_chained_comparisons(self, spark, g):
        # OperatorChaining: a < b < c is (a < b) AND (b < c)
        assert rows(run(spark, g,
                        "RETURN 1 < 2 < 3 AS a, 1 < 2 > 3 AS b, "
                        "1 <= 1 <= 1 AS c")) == [(True, False, True)]

    def test_chained_with_null_operand(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN 1 < 2 > null AS a, "
                        "null < 2 < 3 AS b")) == [(None, None)]

    def test_incomparable_types_yield_null(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN 1 < 'a' AS a, true < 1 AS b, "
                        "'a' < [1] AS c")) == [(None, None, None)]

    def test_duration_comparison_undefined(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN duration('P1M') < duration('P30D') AS a")) \
            == [(None,)]

    def test_numeric_cross_kind_comparable(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN 1 < 1.5 AS a, 2.0 <= 2 AS b, "
                        "3 > 2.99 AS c")) == [(True, True, True)]


class TestNaNAcceptanceR6:
    def test_isnan_basics(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN isNaN(1) AS a, isNaN(1.0) AS b, "
                        "isNaN(0x0ad) AS c, isNaN(0o1) AS d, "
                        "isNaN(1.0f) AS e")) \
            == [(False, False, False, False, False)]

    def test_isnan_nan_inf_null(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN isNaN(0/0.0) AS a, isNaN(1/0.0) AS b, "
                        "isNaN(-1/0.0) AS c, isNaN(null) AS d")) \
            == [(True, False, False, None)]

    def test_isnan_non_number_raises(self, spark, g):
        with pytest.raises(Exception, match="isNaN"):
            run(spark, g, "RETURN isNaN('foo') AS x").collect()

    def test_isnan_chained_function(self, spark, g):
        assert one(spark, g, "RETURN isNaN(abs(0/0.0)) AS v") is True

    def test_not_of_nan_inequalities(self, spark, g):
        # NaN comparisons are FALSE, so NOT(...) is TRUE
        assert rows(run(spark, g,
                        "RETURN NOT(0.0 < (0.0/0.0)) AS a, "
                        "NOT(0.0 > (0.0/0.0)) AS b, "
                        "NOT(0.0 <= (0.0/0.0)) AS c, "
                        "NOT(0.0 >= (0.0/0.0)) AS d")) \
            == [(True, True, True, True)]

    def test_not_not_of_nan_inequality(self, spark, g):
        assert one(spark, g,
                   "RETURN NOT (NOT (0.0 < (0.0/0.0))) AS v") is False

    def test_not_of_nan_equality_both_sides(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN NOT (0.0 = (0.0/0.0)) AS a, "
                        "NOT ((0.0/0.0) = (0.0/0.0)) AS b, "
                        "NOT (0.0 <> (0.0/0.0)) AS c, "
                        "NOT ((0.0/0.0) <> (0.0/0.0)) AS d")) \
            == [(True, True, False, False)]

    def test_nan_in_variable_and_property(self, spark, g):
        assert one(spark, g,
                   "WITH (0.0/0.0) AS nan RETURN NOT (nan < 0.0) AS v") \
            is True
        run(spark, g, "CREATE (:NA {nan: (0.0/0.0)})").collect()
        assert one(spark, g,
                   "MATCH (n:NA) RETURN NOT (n.nan < 0.0) AS v") is True

    def test_nan_param_inequality(self, spark, g):
        assert one(spark, g,
                   "RETURN NOT(0.0 <= (0.0/$zero)) AS v", zero=0.0) is True


class TestConcatenationAcceptanceR6:
    def test_simple_string_and_list(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN 'a' || 'b' AS s, [1, 2] || [3] AS l")) \
            == [("ab", [1, 2, 3])]

    def test_concat_with_casting_expressions(self, spark, g):
        assert one(spark, g, "RETURN [1] || (2 + []) AS l") == [1, 2]
        assert one(spark, g,
                   "RETURN toString(1) || 'a' || toString(1.0) AS s") \
            == "1a1.0"

    def test_null_concatenation(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN null || null AS a, [1] || null AS b, "
                        "'a' || null AS c, null || 'x' AS d")) \
            == [(None, None, None, None)]

    def test_complex_mixing_plus_and_concat(self, spark, g):
        # + list-appends scalars; || only joins same-kind operands.
        # The heterogeneous result list comes back in the engine's
        # Cypher-text rendering (tagged values cannot round-trip as a
        # Spark struct column)
        assert one(spark, g,
                   "RETURN 1 + [] || [2] || [4] + 'a' + 'b' || [1] AS r") \
            == "[1, 2, 4, a, b, 1]"
        assert one(spark, g,
                   "RETURN 'a' + 'b' || 'c' + 'd' + 1 + 'e' + 1 || 'f' "
                   "AS r") == "abcd1e1f"
        assert one(spark, g,
                   "RETURN [12] || [11] || [10] || [9, 8] || ['7'] AS r") \
            == "[12, 11, 10, 9, 8, 7]"  # rendered heterogeneous list

    @pytest.mark.parametrize("q", [
        "RETURN 1 || [3]", "RETURN [3] || 2", "RETURN 'a' || 3",
        "RETURN 1 || 'a'", "RETURN [1] || 'a'", "RETURN 'a' || [2]",
        "RETURN date() || date()", "RETURN 1 || 2",
    ])
    def test_concat_never_coerces(self, spark, g, q):
        with pytest.raises(Exception):
            run(spark, g, q).collect()

    def test_concat_from_node_properties(self, spark, g):
        run(spark, g,
            "CREATE (:CP {s1: 'he', s2: 'llo', l1: [1], l2: [2]})") \
            .collect()
        assert rows(run(spark, g,
                        "MATCH (n:CP) RETURN n.s1 || n.s2 AS s, "
                        "n.l1 || n.l2 AS l")) == [("hello", [1, 2])]


class TestListComprehensionAcceptanceR6:
    def test_filter_and_map(self, spark, g):
        assert one(spark, g,
                   "RETURN [x IN range(1, 10) WHERE x % 2 = 0 | x * 10] "
                   "AS l") == [20, 40, 60, 80, 100]

    def test_filter_only_and_map_only(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN [x IN [1, 2, 3] WHERE x <> 2] AS a, "
                        "[x IN [1, 2, 3] | x + 1] AS b")) \
            == [([1, 3], [2, 3, 4])]

    def test_on_null_list_is_null(self, spark, g):
        assert one(spark, g, "RETURN [x IN null | x] AS l") is None

    def test_nested_comprehension(self, spark, g):
        assert one(spark, g,
                   "RETURN [x IN [[1, 2], [3, 4]] | [y IN x | y * 2]] "
                   "AS l") == [[2, 4], [6, 8]]

    def test_comprehension_over_node_collection(self, spark, g):
        run(spark, g, "UNWIND [1, 2, 3] AS v CREATE (:LC {v: v})") \
            .collect()
        assert sorted(one(spark, g,
                          "MATCH (n:LC) WITH collect(n) AS ns "
                          "RETURN [x IN ns WHERE x.v > 1 | x.v] AS l")) \
            == [2, 3]

    def test_shadowing_scope(self, spark, g):
        assert one(spark, g,
                   "WITH 10 AS x RETURN [x IN [1, 2] | x] AS l") == [1, 2]


class TestTrimFunctionsAcceptanceR6:
    def test_whitespace_defaults(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN trim('  a  ') AS t, ltrim('  a') AS l, "
                        "rtrim('a  ') AS r")) == [("a", "a", "a")]

    def test_trim_specifications(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN trim(BOTH 'x' FROM 'xxaxx') AS b, "
                        "trim(LEADING 'x' FROM 'xxax') AS l, "
                        "trim(TRAILING 'x' FROM 'xaxx') AS t, "
                        "trim(FROM '  a ') AS d")) \
            == [("a", "ax", "xa", "a")]

    def test_char_set_trims(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN ltrim('xyax', 'xy') AS l, "
                        "rtrim('xayx', 'xy') AS r, "
                        "btrim('yxaxy', 'xy') AS b")) \
            == [("ax", "xa", "a")]

    def test_null_handling(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN trim(null) AS a, ltrim(null, 'x') AS b, "
                        "rtrim('a', null) AS c, "
                        "trim(BOTH null FROM 'a') AS d")) \
            == [(None, None, None, None)]

    def test_trim_source_expressions(self, spark, g):
        run(spark, g, "CREATE (:TR {s: '  pad  '})").collect()
        assert one(spark, g, "MATCH (n:TR) RETURN trim(n.s) AS t") == "pad"
        assert one(spark, g,
                   "RETURN trim(BOTH 'x' FROM 'x' || 'ax') AS t") == "a"


class TestLiteralAcceptanceR6:
    def test_integer_radix_forms(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN 0x1F AS h, 0o17 AS o, 10 AS d, "
                        "-0x1 AS nh")) == [(31, 15, 10, -1)]

    def test_float_forms(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN 1e2 AS a, 1.5e-1 AS b, 1.0f AS c")) \
            == [(100.0, 0.15, 1.0)]

    def test_long_min_and_max_literals(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN 9223372036854775807 AS mx, "
                        "-9223372036854775808 AS mn")) \
            == [(9223372036854775807, -9223372036854775808)]

    def test_too_large_integer_literal_raises(self, spark, g):
        with pytest.raises(Exception, match="too large"):
            run(spark, g, "RETURN 9223372036854775808 AS v").collect()

    def test_string_escapes(self, spark, g):
        assert one(spark, g, r"RETURN 'a\'b' AS s") == "a'b"
        assert one(spark, g, 'RETURN "a\\"b" AS s') == 'a"b'

    def test_inf_nan_literals(self, spark, g):
        a, b = rows(run(spark, g, "RETURN Inf AS a, -Inf AS b"))[0]
        assert a == float("inf") and b == float("-inf")
        assert math.isnan(one(spark, g, "RETURN NaN AS v"))

    def test_boolean_case_insensitive(self, spark, g):
        assert rows(run(spark, g, "RETURN TRUE AS a, False AS b")) \
            == [(True, False)]


class TestTemporalAcceptanceR6:
    def test_date_accessors(self, spark, g):
        assert rows(run(spark, g, """
            WITH date('2024-02-29') AS d
            RETURN d.year AS y, d.month AS m, d.day AS dd,
                   d.dayOfWeek AS dw, d.quarter AS q, d.week AS w
        """)) == [(2024, 2, 29, 4, 1, 9)]  # Thursday, ISO week 9

    def test_date_plus_duration_month_clamp(self, spark, g):
        # adding months clamps to the last valid day
        assert str(one(spark, g,
                       "RETURN date('2024-01-31') + duration('P1M') "
                       "AS d")) == "2024-02-29"
        assert str(one(spark, g,
                       "RETURN date('2023-01-31') + duration('P1M') "
                       "AS d")) == "2023-02-28"

    def test_duration_between_components(self, spark, g):
        assert rows(run(spark, g, """
            WITH duration.between(date('2024-01-01'),
                                  date('2024-03-15')) AS d
            RETURN d.months AS m, d.days AS dd
        """)) == [(2, 14)]

    def test_datetime_truncate_week_crosses_year(self, spark, g):
        # 2021-01-01 is in ISO week 53 of 2020: week truncation lands on
        # Monday 2020-12-28
        assert str(one(spark, g,
                       "RETURN date.truncate('week', date('2021-01-01')) "
                       "AS d")) == "2020-12-28"

    def test_duration_arithmetic_and_negation(self, spark, g):
        assert one(spark, g,
                   "RETURN (duration('P1D') + duration('PT12H'))"
                   ".seconds AS s") is not None
        assert str(one(spark, g,
                       "RETURN date('2024-03-01') - duration('P1D') "
                       "AS d")) == "2024-02-29"

    def test_localdatetime_vs_datetime_epoch(self, spark, g):
        assert one(spark, g, """
            RETURN datetime('2024-01-01T00:00:00Z').epochSeconds AS e
        """) == 1704067200

    def test_temporal_ordering_groups(self, spark, g):
        # ZONED_DT < LOCAL_DT < DATE in the global order
        got = run(spark, g, """
            UNWIND [date('2020-01-01'),
                    localdatetime('2030-01-01T00:00'),
                    datetime('2010-01-01T00:00Z')] AS t
            WITH t ORDER BY t ASC
            RETURN collect(valueType(t)) AS o
        """).collect()[0]["o"]
        assert got == ["ZONED DATETIME NOT NULL",
                       "LOCAL DATETIME NOT NULL", "DATE NOT NULL"]


class TestCaseExpressionAcceptanceR6:
    def test_simple_case_null_subject_never_matches_null(self, spark, g):
        # CASE null WHEN null: simple CASE uses equality, null = null is
        # undefined -> ELSE
        assert one(spark, g, "RETURN CASE null WHEN null THEN true "
                             "ELSE false END AS r") is False
        assert one(spark, g, "RETURN CASE null WHEN null THEN true "
                             "END AS r") is None

    def test_searched_case_null_comparisons(self, spark, g):
        assert one(spark, g, "RETURN CASE WHEN null = null THEN true "
                             "ELSE false END AS r") is False
        assert one(spark, g, "RETURN CASE WHEN null IS NULL THEN true "
                             "ELSE false END AS r") is True

    def test_comma_separated_when_lists(self, spark, g):
        got = [r[0] for r in rows(run(spark, g, """
            UNWIND [1000, 1500, 2000, 2500, 3000, 3500] AS s
            RETURN CASE s WHEN 1000, 1500 THEN 'low'
                          WHEN 2000, 2500 THEN 'med'
                          WHEN 3000, 3500 THEN 'high' END AS r
        """))]
        assert got == ["low", "low", "med", "med", "high", "high"]

    def test_extended_simple_case_operators(self, spark, g):
        got = [r[0] for r in rows(run(spark, g, """
            UNWIND [null, 1000, 2000, 2500, 3500] AS s
            RETURN CASE s WHEN < 1500, IS NULL THEN 'low'
                          WHEN <= 2500 THEN 'med'
                          ELSE 'high' END AS r
        """))]
        assert got == ["low", "low", "med", "med", "high"]

    def test_extended_simple_case_predicates(self, spark, g):
        got = [r[0] for r in rows(run(spark, g, """
            UNWIND ['Alice', 'Erik', 'Cat', 'Bob'] AS nm
            RETURN CASE nm WHEN STARTS WITH 'A' THEN 7
                           WHEN ENDS WITH 'k' THEN 8
                           WHEN =~ 'C.*t' THEN 9
                           WHEN IS NOT NULL THEN 10
                           ELSE 13 END AS r
        """))]
        assert got == [7, 8, 9, 10]

    def test_case_in_where_and_with(self, spark, g):
        run(spark, g, "UNWIND [1, 2, 3] AS v CREATE (:CW {v: v})") \
            .collect()
        got = sorted(r[0] for r in rows(run(spark, g, """
            MATCH (n:CW)
            WHERE CASE WHEN n.v > 1 THEN true ELSE false END
            RETURN n.v AS v
        """)))
        assert got == [2, 3]


class TestMapProjectionAcceptanceR6:
    def test_custom_keys_and_missing_property(self, spark, g):
        run(spark, g, "CREATE (:MPX {prop1: 'hello', prop2: 'hi', "
                      "prop3: 'hej'})").collect()
        [(m,)] = rows(run(spark, g, """
            MATCH (n:MPX)
            RETURN n {customKey1: n.prop2, customKey2: n.prop3,
                      customKey3: n.notThere, .prop1} AS result
        """))
        assert m.asDict() == {"customKey1": "hi", "customKey2": "hej",
                              "customKey3": None, "prop1": "hello"}

    def test_relationship_map_projection(self, spark, g):
        run(spark, g, "CREATE (:A)-[:LIKES {prop1: 'hello', "
                      "prop2: 'hi'}]->(:B)").collect()
        [(m,)] = rows(run(spark, g, """
            MATCH ()-[r:LIKES]->()
            RETURN r {custom: r.prop2, .prop1} AS result
        """))
        assert m.asDict() == {"custom": "hi", "prop1": "hello"}

    def test_all_properties_star(self, spark, g):
        run(spark, g, "CREATE (:ST {a: 1, b: 'x'})").collect()
        [(m,)] = rows(run(spark, g,
                          "MATCH (n:ST) RETURN n {.*} AS result"))
        assert m.asDict() == {"a": 1, "b": "x"}


class TestNullIfIsEmptyValueTypeR6:
    def test_nullif_matrix(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN nullIf(1, 1) AS a, nullIf(1, 2) AS b, "
                        "nullIf(null, 2) AS c, nullIf(1, null) AS d, "
                        "nullIf('a', 'a') AS e")) \
            == [(None, 1, None, 1, None)]

    def test_nullif_nested_and_filter(self, spark, g):
        assert one(spark, g,
                   "RETURN coalesce(nullIf(1, 1), 9) AS r") == 9
        got = sorted(r[0] for r in rows(run(spark, g, """
            UNWIND ['keep', 'drop', 'keep'] AS v
            WITH v WHERE nullIf(v, 'drop') IS NOT NULL
            RETURN v
        """)))
        assert got == ["keep", "keep"]

    def test_isempty_matrix(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN isEmpty([]) AS a, isEmpty([null]) AS b, "
                        "isEmpty({}) AS c, isEmpty({k: null}) AS d, "
                        "isEmpty('') AS e, isEmpty(' ') AS f, "
                        "isEmpty(null) AS n")) \
            == [(True, False, True, False, True, False, None)]

    def test_isempty_rejects_entities(self, spark, g):
        run(spark, g, "CREATE (:IE)-[:R]->(:IE)").collect()
        with pytest.raises(Exception, match="isEmpty"):
            run(spark, g, "MATCH (n:IE) RETURN isEmpty(n) AS r").collect()
        with pytest.raises(Exception, match="isEmpty"):
            run(spark, g,
                "MATCH ()-[r:R]->() RETURN isEmpty(r) AS x").collect()
        with pytest.raises(Exception, match="isEmpty"):
            run(spark, g,
                "MATCH p = (:IE)-[:R]->() RETURN isEmpty(p) AS x") \
                .collect()

    def test_isempty_on_properties_map(self, spark, g):
        run(spark, g, "CREATE (:PR {a: 1}), (:PR2)").collect()
        assert one(spark, g,
                   "MATCH (n:PR) RETURN isEmpty(properties(n)) AS r") \
            is False
        assert one(spark, g,
                   "MATCH (n:PR2) RETURN isEmpty(properties(n)) AS r") \
            is True

    def test_valuetype_literals(self, spark, g):
        assert rows(run(spark, g, """
            RETURN valueType(1) AS a, valueType(1.0) AS b,
                   valueType('x') AS c, valueType(true) AS d,
                   valueType(null) AS e, valueType([1]) AS f,
                   valueType(date('2024-01-01')) AS g,
                   valueType(duration('P1D')) AS h,
                   valueType(point({x: 1, y: 2})) AS i
        """)) == [("INTEGER NOT NULL", "FLOAT NOT NULL",
                   "STRING NOT NULL", "BOOLEAN NOT NULL", "NULL",
                   "LIST<INTEGER NOT NULL> NOT NULL", "DATE NOT NULL",
                   "DURATION NOT NULL", "POINT NOT NULL")]


class TestOptionalMatchAcceptanceR6:
    def test_optional_match_keeps_row_on_miss(self, spark, g):
        run(spark, g, "CREATE (:OM {v: 1})-[:R]->(:OM {v: 2}), "
                      "(:OM {v: 3})").collect()
        got = sorted(rows(run(spark, g, """
            MATCH (a:OM) OPTIONAL MATCH (a)-[:R]->(b)
            RETURN a.v AS a, b.v AS b
        """)), key=lambda t: t[0])
        assert got == [(1, 2), (2, None), (3, None)]

    def test_optional_match_null_property_access(self, spark, g):
        run(spark, g, "CREATE (:ON {v: 1})").collect()
        assert rows(run(spark, g, """
            MATCH (a:ON) OPTIONAL MATCH (a)-[:R]->(b)
            RETURN b.missing AS m, labels(b) AS l, id(b) AS i
        """)) == [(None, None, None)]

    def test_optional_match_with_where(self, spark, g):
        run(spark, g, "CREATE (:OW {v: 1})-[:R]->(:OW {v: 2})").collect()
        got = sorted(rows(run(spark, g, """
            MATCH (a:OW) OPTIONAL MATCH (a)-[:R]->(b) WHERE b.v > 5
            RETURN a.v AS a, b.v AS b
        """)), key=lambda t: t[0])
        assert got == [(1, None), (2, None)]

    def test_optional_chain_propagates_null(self, spark, g):
        run(spark, g, "CREATE (:OC {v: 1})").collect()
        assert rows(run(spark, g, """
            MATCH (a:OC) OPTIONAL MATCH (a)-[:R]->(b)-[:R]->(c)
            RETURN a.v AS a, b.v AS b, c.v AS c
        """)) == [(1, None, None)]


class TestVarLengthAcceptanceR6:
    @pytest.fixture()
    def chain5(self, spark):
        nodes = {"V": spark.createDataFrame(
            [(i, ["V"], i) for i in range(1, 6)],
            "id long, labels array<string>, v long")}
        rels = {"R": spark.createDataFrame(
            [(10 + i, i, i + 1, "R") for i in range(1, 5)],
            "id long, src long, dst long, type string")}
        return PropertyGraph(nodes, rels)

    def test_exact_and_range_lengths(self, spark, chain5):
        n2 = one(spark, chain5,
                 "MATCH (a {v: 1})-[:R*2]->(b) RETURN b.v AS v")
        assert n2 == 3
        got = sorted(r[0] for r in rows(run(spark, chain5,
                     "MATCH (a {v: 1})-[:R*1..3]->(b) RETURN b.v AS v")))
        assert got == [2, 3, 4]

    def test_zero_length_includes_self(self, spark, chain5):
        got = sorted(r[0] for r in rows(run(spark, chain5,
                     "MATCH (a {v: 1})-[:R*0..1]->(b) RETURN b.v AS v")))
        assert got == [1, 2]

    def test_unbounded_from_min(self, spark, chain5):
        got = sorted(r[0] for r in rows(run(spark, chain5,
                     "MATCH (a {v: 1})-[:R*2..]->(b) RETURN b.v AS v")))
        assert got == [3, 4, 5]

    def test_var_length_rel_list_binding(self, spark, chain5):
        [(ln, ids)] = rows(run(spark, chain5, """
            MATCH (a {v: 1})-[rs:R*3]->(b)
            RETURN size(rs) AS n, [r IN rs | id(r)] AS ids
        """))
        assert ln == 3 and ids == [11, 12, 13]

    def test_var_length_undirected_no_rel_reuse(self, spark, chain5):
        # *2 undirected from node 2: 1-2 then 2-3 both ways, never the
        # same rel twice (so no bouncing back on one edge)
        got = sorted(r[0] for r in rows(run(spark, chain5,
                     "MATCH (a {v: 2})-[:R*2]-(b) RETURN b.v AS v")))
        assert got == [4]  # 2->3->4; 2->1 dead-ends; no 2->3->2/2->1->2


class TestSimilarityFunctionAcceptanceR6:
    def test_cosine_known_values_and_nulls(self, spark, g):
        # scores live in [0, 1]: Lucene normalization (1 + cos)/2
        # (VectorIndexProcedures.java:142)
        assert rows(run(spark, g, """
            RETURN vector.similarity.cosine([1.0, 0.0], [0.0, 1.0]) AS f,
                   vector.similarity.cosine([1, 0], [0, 1]) AS i,
                   vector.similarity.cosine([1.0, 0], [0, 1.0]) AS m,
                   vector.similarity.cosine(null, [0, 1.0]) AS ln,
                   vector.similarity.cosine([1.0, 0], null) AS rn
        """)) == [(0.5, 0.5, 0.5, None, None)]

    def test_cosine_identical_vectors_score_one(self, spark, g):
        assert one(spark, g,
                   "RETURN round(vector.similarity.cosine([1.0, 2.0], "
                   "[1.0, 2.0]), 6) AS s") == 1.0

    def test_euclidean_known_values_and_nulls(self, spark, g):
        assert rows(run(spark, g, """
            RETURN vector.similarity.euclidean([0.0, 2.0], [1.0, 2.0]) AS f,
                   vector.similarity.euclidean([2, 4], [3, 4]) AS i,
                   vector.similarity.euclidean([2.5, 1], [1.5, 1.0]) AS m,
                   vector.similarity.euclidean(null, [1.0]) AS ln
        """)) == [(0.5, 0.5, 0.5, None)]

    def test_cosine_nearest_neighbour_ranking(self, spark, g):
        run(spark, g, """
            CREATE (:VN {name: 'same', v: [1.0, 0.0]}),
                   (:VN {name: 'close', v: [1.0, 0.2]}),
                   (:VN {name: 'orth', v: [0.0, 1.0]})
        """).collect()
        got = [r[0] for r in rows(run(spark, g, """
            MATCH (n:VN)
            RETURN n.name AS nm
            ORDER BY vector.similarity.cosine(n.v, [1.0, 0.0]) DESC
        """))]
        assert got == ["same", "close", "orth"]


class TestBooleanExpressionAcceptanceR6:
    def test_null_or_exists(self, spark, g):
        run(spark, g, "CREATE (:A)").collect()
        assert rows(run(spark, g, """
            RETURN NULL OR false AS n1,
                   NULL OR EXISTS { (:XYZ) } AS n2,
                   NULL OR NOT EXISTS { (:A) } AS n3,
                   NULL OR true AS t1,
                   NULL OR EXISTS { (:A) } AS t2,
                   NULL OR NOT EXISTS { (:XYZ) } AS t3
        """)) == [(None, None, None, True, True, True)]

    def test_null_xor_always_null(self, spark, g):
        run(spark, g, "CREATE (:A)").collect()
        assert rows(run(spark, g, """
            RETURN NULL XOR false AS a, NULL XOR true AS b,
                   NULL XOR EXISTS { (:A) } AS c,
                   NULL XOR NOT EXISTS { (:A) } AS d
        """)) == [(None, None, None, None)]

    def test_in_predicates_combined(self, spark, g):
        got = sorted(r[0] for r in rows(run(spark, g, """
            UNWIND [1, 2, 3, 4, 5] AS x
            WITH x WHERE x IN [1, 2, 3] AND x IN [2, 3, 4]
            RETURN x
        """)))
        assert got == [2, 3]
        got = sorted(r[0] for r in rows(run(spark, g, """
            UNWIND [1, 2, 3, 4, 5] AS x
            WITH x WHERE x IN [1, 2] OR x IN [4, 5]
            RETURN x
        """)))
        assert got == [1, 2, 4, 5]


class TestSkipLimitAcceptanceR6:
    def test_negative_limit_raises(self, spark, g):
        with pytest.raises(Exception):
            run(spark, g, "RETURN 1 AS x LIMIT -1").collect()
        with pytest.raises(Exception):
            run(spark, g, "UNWIND [1, 2] AS x RETURN x "
                          "ORDER BY x LIMIT -1").collect()

    def test_float_skip_limit_raise(self, spark, g):
        with pytest.raises(Exception):
            run(spark, g, "RETURN 1 AS x LIMIT 1.5").collect()
        with pytest.raises(Exception):
            run(spark, g, "RETURN 1 AS x SKIP 1.5").collect()

    def test_graph_touching_limit_raises(self, spark, g):
        run(spark, g, "CREATE (:GL {v: 2})").collect()
        with pytest.raises(Exception):
            run(spark, g,
                "MATCH (n:GL) RETURN n.v AS v LIMIT n.v").collect()

    def test_skip_limit_expressions_of_params(self, spark, g):
        got = [r[0] for r in rows(run(spark, g,
                                      "UNWIND [1, 2, 3, 4] AS x "
                                      "RETURN x ORDER BY x "
                                      "SKIP $s LIMIT $l", s=1, l=2))]
        assert got == [2, 3]


class TestNormalizeFunctionAcceptanceR6:
    def test_normalize_forms(self, spark, g):
        # U+212B (angstrom sign) NFC-normalizes to U+00C5
        assert one(spark, g,
                   "RETURN normalize('Å') = 'Å' AS r") is True
        # NFD keeps the decomposed pair
        assert one(spark, g,
                   "RETURN normalize('Å', NFD) = 'Å' AS r") \
            is True
        assert one(spark, g,
                   "RETURN normalize('Å', NFC) = 'Å' AS r") \
            is True

    def test_is_normalized_predicate(self, spark, g):
        assert rows(run(spark, g,
                        "RETURN 'Å' IS NORMALIZED AS a, "
                        "'Å' IS NORMALIZED AS b, "
                        "'Å' IS NFD NORMALIZED AS c")) \
            == [(True, False, True)]

    def test_normalize_inside_exists_and_case(self, spark, g):
        assert one(spark, g,
                   "RETURN EXISTS { RETURN normalize('hello') AS n } "
                   "AS r") is True
        assert one(spark, g,
                   "RETURN CASE WHEN normalize('Å') = 'Å' "
                   "THEN 'y' ELSE 'n' END AS r") == "y"


class TestUnwindAcceptanceR6:
    def test_nested_unwind_preserves_order_per_row(self, spark, g):
        got = rows(run(spark, g, """
            UNWIND [[1, 2], [3]] AS outer
            UNWIND outer AS x
            RETURN x ORDER BY x
        """))
        assert got == [(1,), (2,), (3,)]

    def test_unwind_on_array_property(self, spark, g):
        run(spark, g, "CREATE (:UP {xs: [7, 8, 9]})").collect()
        got = sorted(r[0] for r in rows(run(spark, g,
                     "MATCH (n:UP) UNWIND n.xs AS x RETURN x")))
        assert got == [7, 8, 9]

    def test_unwind_null_and_empty_produce_no_rows(self, spark, g):
        assert rows(run(spark, g, "UNWIND null AS x RETURN x")) == []
        assert rows(run(spark, g, "UNWIND [] AS x RETURN x")) == []

    def test_unwind_nodes_from_collect(self, spark, g):
        run(spark, g, "UNWIND [1, 2] AS v CREATE (:UN {v: v})").collect()
        got = sorted(r[0] for r in rows(run(spark, g, """
            MATCH (n:UN) WITH collect(n) AS ns
            UNWIND ns AS m RETURN m.v AS v
        """)))
        assert got == [1, 2]


class TestPatternPredicatesAcceptanceR6:
    @pytest.fixture()
    def wg(self, spark):
        nodes = {"P": spark.createDataFrame(
            [(i, ["P"], i) for i in (1, 2, 3)],
            "id long, labels array<string>, v long")}
        rels = {"R": spark.createDataFrame(
            [(10, 1, 2, "R", 5.0), (11, 2, 3, "R", 1.0)],
            "id long, src long, dst long, type string, w double")}
        return PropertyGraph(nodes, rels)

    def test_node_pattern_where(self, spark, wg):
        got = sorted(r[0] for r in rows(run(spark, wg,
                     "MATCH (a WHERE a.v > 1) RETURN a.v AS v")))
        assert got == [2, 3]

    def test_relationship_pattern_where(self, spark, wg):
        assert rows(run(spark, wg,
                        "MATCH ()-[r:R WHERE r.w > 2]->() "
                        "RETURN r.w AS w")) == [(5.0,)]

    def test_rel_pattern_where_sees_no_endpoints_filtering(self, spark,
                                                           wg):
        # predicate inside the rel pattern constrains BEFORE projection
        assert rows(run(spark, wg,
                        "MATCH (a)-[r:R WHERE r.w < 2]->(b) "
                        "RETURN a.v AS a, b.v AS b")) == [(2, 3)]

    def test_quantified_relationship_shorthand(self, spark, wg):
        assert rows(run(spark, wg,
                        "MATCH (a)-->{2}(b) RETURN a.v AS a, b.v AS b")) \
            == [(1, 3)]

    def test_pattern_where_in_exists_subquery(self, spark, wg):
        got = sorted(r[0] for r in rows(run(spark, wg, """
            MATCH (a) WHERE EXISTS { (a)-[:R WHERE r.w IS NOT NULL]->() }
            RETURN a.v AS v
        """.replace("r.w", "rr.w").replace("[:R WHERE", "[rr:R WHERE"))))
        assert got == [1, 2]

    def test_count_and_collect_subqueries(self, spark, wg):
        assert one(spark, wg,
                   "MATCH (a) WHERE COUNT { (a)--() } > 1 "
                   "RETURN a.v AS v") == 2
        assert one(spark, wg,
                   "RETURN COLLECT { UNWIND [3, 1, 2] AS x "
                   "RETURN x ORDER BY x } AS xs") == [1, 2, 3]


class TestConcatRuntimeTypedR6:
    def test_tagged_string_concat_works(self, spark, g):
        assert one(spark, g,
                   "WITH ['a', 'b'][0] AS t RETURN t || 'x' AS s") == "ax"

    def test_tagged_number_concat_raises_at_runtime(self, spark, g):
        with pytest.raises(Exception, match="concatenation"):
            run(spark, g, "RETURN [1, 'a'][0] || 'x' AS s").collect()
