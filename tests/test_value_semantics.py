"""Cross-type comparison, null-bound slices, null-entity accessors,
strict toBoolean, and the temporal/duration field long tail.

Reference semantics: AnyValues.TERNARY_COMPARATOR (AnyValues.java:69),
ListSlice.scala, CypherFunctions.java toBoolean, TemporalValue.java
TemporalFields (:515-531), DurationFields.java.
"""

from neo4j_spark.api import cypher

import pytest

# conformance tranche: excluded from the default (core) run so the
# driver's verify window can finish; run with `pytest -m acceptance`
pytestmark = pytest.mark.acceptance


def rows(df):
    return [tuple(r) for r in df.collect()]


class TestCrossTypeComparison:
    def test_incomparable_lt_is_null(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN 1 < 'a' AS a, 'a' > 2 AS b, true < 1 AS c",
                    chain_graph)
        assert rows(df) == [(None, None, None)]

    def test_cross_class_equality_is_false(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN 1 = 'a' AS a, 1 <> 'a' AS b, true = 1 AS c",
                    chain_graph)
        assert rows(df) == [(False, True, False)]

    def test_cross_class_eq_null_propagates(self, spark, chain_graph):
        df = cypher(spark,
                    "OPTIONAL MATCH (n:Nope) RETURN n.x = 'a' AS a",
                    chain_graph)
        # unknown (null) side stays ternary-null even across classes
        assert rows(df) == [(None,)]

    def test_numeric_widths_compare(self, spark, chain_graph):
        df = cypher(spark, "RETURN 1 < 1.5 AS a, 2 >= 2.0 AS b", chain_graph)
        assert rows(df) == [(True, True)]


class TestSliceAndConversionNulls:
    def test_null_slice_bound(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN [1,2,3][null..2] AS a, [1,2,3][0..null] AS b",
                    chain_graph)
        assert rows(df) == [(None, None)]

    def test_toboolean_strict(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN toBoolean('no') AS a, toBoolean(' True ') AS b, "
                    "toBoolean('1') AS c, toBoolean('false') AS d",
                    chain_graph)
        assert rows(df) == [(None, True, None, False)]


class TestNullEntityAccessors:
    def test_keys_properties_of_null_entity(self, spark, chain_graph):
        df = cypher(spark,
                    "OPTIONAL MATCH (n:Nope) "
                    "RETURN keys(n) AS k, properties(n) AS p", chain_graph)
        assert rows(df) == [(None, None)]


class TestTemporalFieldLongTail:
    def test_week_year(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN date('2021-01-01').weekYear AS a, "
                    "date('2020-12-31').weekYear AS b, "
                    "date('2019-12-30').weekYear AS c", chain_graph)
        assert rows(df) == [(2020, 2020, 2020)]

    def test_day_of_quarter(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN date('2020-04-01').dayOfQuarter AS a, "
                    "date('2020-03-31').dayOfQuarter AS b", chain_graph)
        assert rows(df) == [(1, 91)]

    def test_subsecond_fields(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN localdatetime('2020-01-01T00:00:00.123456')"
                    ".millisecond AS ms, "
                    "localdatetime('2020-01-01T00:00:00.123456')"
                    ".microsecond AS us", chain_graph)
        assert rows(df) == [(123, 123456)]

    def test_duration_of_fields(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN duration({minutes: 90}).minutesOfHour AS a, "
                    "duration({months: 14}).monthsOfYear AS b, "
                    "duration({seconds: 125}).secondsOfMinute AS c, "
                    "duration({days: 10}).daysOfWeek AS d", chain_graph)
        assert rows(df) == [(30, 2, 5, 3)]


class TestExtendedCase:
    """Cypher 5 extended simple CASE: WHEN carries a predicate fragment
    applied to the operand (comparators, IS NULL, IN, STARTS WITH, and
    comma-separated alternatives)."""

    def test_comparator_when(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN CASE 5 WHEN > 3 THEN 'big' ELSE 'small' END AS r",
                    chain_graph)
        assert rows(df) == [("big",)]

    def test_is_null_when(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN CASE null WHEN IS NULL THEN 'n' ELSE 'o' END AS r",
                    chain_graph)
        assert rows(df) == [("n",)]

    def test_in_when_and_alternatives(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN CASE 2 WHEN IN [1, 2] THEN 'in' ELSE 'out' END "
                    "AS a, CASE 7 WHEN 1, 7 THEN 'hit' ELSE 'miss' END AS b",
                    chain_graph)
        assert rows(df) == [("in", "hit")]

    def test_classic_simple_case_null_operand(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN CASE null WHEN null THEN 'y' ELSE 'n' END AS r",
                    chain_graph)
        assert rows(df) == [("n",)]  # ternary =: null never matches

    def test_aggregate_inside_case(self, spark, chain_graph):
        df = cypher(spark,
                    "UNWIND [1, 2, 3] AS x RETURN "
                    "CASE WHEN count(*) > 2 THEN 'many' ELSE 'few' END AS r",
                    chain_graph)
        assert rows(df) == [("many",)]


class TestToStringTemporal:
    def test_duration_iso(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN toString(duration({days: 1, hours: 2})) AS a, "
                    "toString(duration({months: 14})) AS b, "
                    "toString(duration({seconds: 0})) AS c, "
                    "toString(duration({seconds: 1, nanoseconds: 500000000}))"
                    " AS d", chain_graph)
        assert rows(df) == [("P1DT2H", "P1Y2M", "PT0S", "PT1.5S")]

    def test_datetime_iso_t_separator(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN toString(datetime('2020-01-02T03:04:05Z')) AS a, "
                    "toString(datetime('2020-01-02T03:04:00Z')) AS b",
                    chain_graph)
        assert rows(df) == [("2020-01-02T03:04:05Z", "2020-01-02T03:04Z")]


class TestTemporalConstructors:
    def test_fromepoch(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN datetime.fromepoch(1, 500000000).epochMillis "
                    "AS m, datetime.fromepochmillis(1500).epochSeconds AS s",
                    chain_graph)
        assert rows(df) == [(1500, 1)]

    def test_week_quarter_ordinal_ctors(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN toString(date({year: 2020, week: 2, "
                    "dayOfWeek: 3})) AS w, "
                    "toString(date({year: 2020, quarter: 2, "
                    "dayOfQuarter: 1})) AS q, "
                    "toString(date({year: 2020, ordinalDay: 60})) AS o",
                    chain_graph)
        assert rows(df) == [("2020-01-08", "2020-04-01", "2020-02-29")]

    def test_date_selector_and_epoch_map(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN toString(date({date: "
                    "datetime('2020-03-04T05:06:07Z')})) AS d, "
                    "datetime({epochSeconds: 60}).minute AS m", chain_graph)
        assert rows(df) == [("2020-03-04", 1)]

    def test_time_tostring(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN toString(localtime('12:31:14')) AS a, "
                    "toString(localtime('12:31:14.5')) AS b", chain_graph)
        assert rows(df) == [("12:31:14", "12:31:14.500")]


class TestDurationArithmetic:
    def test_scale_with_carry(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN (duration('PT1H') * 2).hours AS a, "
                    "(duration('PT2H') / 2).minutes AS b, "
                    "(duration('P1D') * 0.5).hours AS c, "
                    "(-duration('PT1H')).hours AS d", chain_graph)
        assert rows(df) == [(2, 60, 12, -1)]

    def test_number_times_duration(self, spark, chain_graph):
        df = cypher(spark, "RETURN (3 * duration('PT10M')).minutes AS m",
                    chain_graph)
        assert rows(df) == [(30,)]

    def test_point_distance_null(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN point.distance(null, point({x: 0, y: 0})) AS d",
                    chain_graph)
        assert rows(df) == [(None,)]


class TestAggAndParamProps:
    def test_stdev_small_samples_zero(self, spark, chain_graph):
        df = cypher(spark,
                    "UNWIND [5] AS x RETURN stDev(x) AS s, stDevP(x) AS p",
                    chain_graph)
        assert rows(df) == [(0.0, 0.0)]

    def test_duration_not_comparable(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN duration('PT1H') < duration('PT2H') AS c",
                    chain_graph)
        assert rows(df) == [(None,)]

    def test_duration_aggregates(self, spark, chain_graph):
        df = cypher(spark,
                    "UNWIND [duration('PT1H'), duration('PT30M')] AS d "
                    "RETURN sum(d).minutes AS m, avg(d).minutes AS a",
                    chain_graph)
        assert rows(df) == [(90, 45)]

    def test_param_props_in_patterns(self, spark, chain_graph):
        g = chain_graph.copy()
        df = cypher(spark, "CREATE (n:PP $props) RETURN n.a AS a, n.b AS b",
                    g, params={"props": {"a": 1, "b": "x"}})
        assert rows(df) == [(1, "x")]
        df = cypher(spark, "MATCH (n:PP $m) RETURN count(*) AS c", g,
                    params={"m": {"a": 1}})
        assert rows(df) == [(1,)]
        df = cypher(spark, "MERGE (n:PP $props) RETURN n.a AS a", g,
                    params={"props": {"a": 1, "b": "x"}})
        assert rows(df) == [(1,)]


class TestHeterogeneousValues:
    """CIP orderability/equivalence over mixed-type values (AnyValues.java:69,
    ValueGroup.java:32): STRING < BOOLEAN < NUMBER < null, NaN after +Inf,
    ternary cross-class predicates."""

    def test_mixed_list_literal_and_index(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN toString([1, 'a', true][0]) AS a, "
                    "toString([1, 'a', true][1]) AS b, "
                    "toString([1, 'a', true][2]) AS c", chain_graph)
        assert rows(df) == [("1", "a", "true")]

    def test_global_order_asc(self, spark, chain_graph):
        df = cypher(spark,
                    "UNWIND [3, 1.5, 'b', 'a', true, false, null, 2] AS x "
                    "WITH x ORDER BY x "
                    "RETURN coalesce(toString(x), '<null>') AS s, "
                    "1 AS one", chain_graph)
        got = [r["s"] for r in df.collect()]
        assert got == ["a", "b", "false", "true", "1.5", "2", "3", "<null>"]

    def test_global_order_nan_after_infinity(self, spark, chain_graph):
        df = cypher(spark,
                    "UNWIND [0.0/0.0, 1.0/0.0, 1.0, 'z'] AS x "
                    "WITH x ORDER BY x RETURN toString(x) AS s", chain_graph)
        got = [r["s"] for r in df.collect()]
        assert got[0] == "z" and got[1] == "1.0"
        assert got[2] in ("Infinity", "inf") and got[3] in ("NaN", "nan")

    def test_cross_class_equality_is_false(self, spark, chain_graph):
        df = cypher(spark,
                    "UNWIND [1, 'a'] AS x RETURN x = true AS e ORDER BY x",
                    chain_graph)
        assert rows(df) == [(False,), (False,)]

    def test_cross_class_comparison_is_null(self, spark, chain_graph):
        df = cypher(spark,
                    "UNWIND [1, 'a'] AS x "
                    "RETURN x < 'zzz' AS c ORDER BY x", chain_graph)
        # 'a' < 'zzz' -> true; 1 < 'zzz' -> null (incomparable classes)
        assert rows(df) == [(True,), (None,)]

    def test_number_cross_width_equality(self, spark, chain_graph):
        df = cypher(spark,
                    "UNWIND [1, 'x'] AS v RETURN v = 1.0 AS e ORDER BY v",
                    chain_graph)
        assert rows(df) == [(False,), (True,)]

    def test_mixed_in_ternary(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN 2 IN [1, 'a', 2] AS hit, "
                    "'q' IN [1, 'a'] AS miss, "
                    "9 IN [1, 'a', null] AS unk, "
                    "null IN [1, 'a'] AS nl", chain_graph)
        assert rows(df) == [(True, False, None, None)]

    def test_mixed_is_null(self, spark, chain_graph):
        df = cypher(spark,
                    "UNWIND [1, null, 'a'] AS x "
                    "RETURN count(CASE WHEN x IS NULL THEN 1 END) AS n",
                    chain_graph)
        assert rows(df) == [(1,)]

    def test_mixed_temporal_orderability(self, spark, chain_graph):
        # ValueGroup order: temporals before STRING < BOOLEAN < NUMBER;
        # DATE group sorts internally by instant
        df = cypher(spark,
                    "UNWIND [date('2024-01-02'), 'zz', 5, "
                    "date('2020-06-06'), null] AS x WITH x ORDER BY x "
                    "RETURN coalesce(toString(x), '<null>') AS s",
                    chain_graph)
        assert [r["s"] for r in df.collect()] == \
            ["2020-06-06", "2024-01-02", "zz", "5", "<null>"]

    def test_mixed_temporal_predicates(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN [date('2024-01-02'), 'a'][0] = "
                    "date('2024-01-02') AS eq, "
                    "[date('2024-01-02'), 'a'][0] < date('2025-01-01') "
                    "AS lt, [date('2024-01-02'), 'a'][0] < 5 AS incmp",
                    chain_graph)
        assert rows(df) == [(True, True, None)]

    def test_mixed_aggregates_skip_nulls(self, spark, chain_graph):
        # collect/min/max skip Cypher nulls; min/max use the global
        # orderability comparator (MinMaxFunction.scala:50 uses
        # AnyValues.COMPARATOR), so min is the string, max the number
        df = cypher(spark,
                    "UNWIND [1, 'a', null, true] AS x "
                    "RETURN size(collect(x)) AS n, toString(min(x)) AS mn, "
                    "toString(max(x)) AS mx", chain_graph)
        assert rows(df) == [(3, "a", "1")]

    def test_mixed_case_branches(self, spark, chain_graph):
        # CASE branches across value classes produce tagged values
        df = cypher(spark,
                    "UNWIND [1, 2, 3] AS i RETURN toString("
                    "CASE WHEN i = 1 THEN 1 WHEN i = 2 THEN 'two' "
                    "ELSE true END) AS s ORDER BY i", chain_graph)
        assert [r["s"] for r in df.collect()] == ["1", "two", "true"]

    def test_mixed_is_typed(self, spark, chain_graph):
        # IS :: over tagged values checks the runtime rank; null conforms
        # to any nullable type (GQL), so each count includes the null row
        df = cypher(spark,
                    "UNWIND [1, 1.5, 'a', true, null] AS x "
                    "RETURN count(CASE WHEN x IS :: INTEGER THEN 1 END) "
                    "AS i, count(CASE WHEN x IS :: FLOAT THEN 1 END) AS f, "
                    "count(CASE WHEN x IS :: STRING NOT NULL THEN 1 END) "
                    "AS s, count(CASE WHEN x IS :: BOOLEAN THEN 1 END) AS b",
                    chain_graph)
        assert rows(df) == [(2, 2, 1, 2)]

    def test_mixed_duration_orderability(self, spark, chain_graph):
        # DURATION(12) sorts after instants, before STRING; within the
        # group by average length (DurationValue.COMPARATOR); duration
        # predicates stay null (isIncomparableType) while equality uses
        # normalized components
        df = cypher(spark,
                    "UNWIND [duration('PT2H'), 'a', duration('PT1H'), 5, "
                    "date('2024-01-01')] AS x WITH x ORDER BY x "
                    "RETURN toString(x) AS s", chain_graph)
        assert [r["s"] for r in df.collect()] == \
            ["2024-01-01", "PT1H", "PT2H", "a", "5"]
        df = cypher(spark,
                    "RETURN [duration('PT1H'), 1][0] = duration('PT60M') "
                    "AS eq, [duration('PT1H'), 1][0] < duration('PT2H') "
                    "AS cm", chain_graph)
        assert rows(df) == [(True, None)]

    def test_mixed_time_orderability(self, spark, chain_graph):
        # ZONED_TIME(10) < LOCAL_TIME(11) < DURATION(12) < STRING < NUMBER
        df = cypher(spark,
                    "UNWIND [localtime('10:30:05'), 'a', time('09:00:00Z'), "
                    "5, duration('PT1H'), localtime('08:00:00')] AS x "
                    "WITH x ORDER BY x RETURN toString(x) AS s", chain_graph)
        assert [r["s"] for r in df.collect()] == \
            ["09:00:00Z", "08:00:00", "10:30:05", "PT1H", "a", "5"]
        df = cypher(spark,
                    "RETURN valueType([time('10:30:05Z'), 1][0]) AS v, "
                    "[localtime('10:00:00'), 1][0] < localtime('11:00:00') "
                    "AS lt", chain_graph)
        assert rows(df) == [("ZONED TIME NOT NULL", True)]

    def test_extended_case_is_typed_on_mixed(self, spark, chain_graph):
        df = cypher(spark,
                    "UNWIND [1, 'a'] AS x RETURN CASE x "
                    "WHEN IS :: INTEGER THEN 'int' ELSE 'other' END AS s "
                    "ORDER BY x", chain_graph)
        assert rows(df) == [("other",), ("int",)]

    def test_is_normalized_predicate(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN 'abc' IS NORMALIZED AS a, "
                    "'abc' IS NFKD NORMALIZED AS b, "
                    "null IS NORMALIZED AS d, "
                    "CASE 'abc' WHEN IS NORMALIZED THEN 1 ELSE 0 END AS e",
                    chain_graph)
        assert rows(df) == [(True, True, None, 1)]


class TestContainerOrderability:
    """Round-3: container groups in the tagged encoding (anyvalue.py
    extended layout) — TCK-style global orderability over MAP(1) <
    LIST(4) < POINT(6) < temporals < STRING < BOOLEAN < NUMBER < null
    (AnyValues.java:69-72, ValueGroup.java:32)."""

    def test_container_groups_sort_before_scalars(self, spark, chain_graph):
        df = cypher(spark,
                    "UNWIND [[1, 2], 'a', {k: 1}, [1], 7, [1, 'x'], null, "
                    "true] AS x WITH x ORDER BY x "
                    "RETURN collect(coalesce(toString(x), '<null>')) AS s",
                    chain_graph)
        assert rows(df) == [((["{k: 1}", "[1]", "[1, x]", "[1, 2]", "a",
                               "true", "7", "<null>"],))]

    def test_list_order_is_elementwise_prefix_first(self, spark,
                                                    chain_graph):
        # CIP list order: [1] < [1, 'x'] < [1, 2] ('x' STRING(13) sorts
        # before 2 NUMBER(15)); prefix-shorter-first
        df = cypher(spark,
                    "UNWIND [[1, 2], [1], [1, 'x'], [2]] AS x "
                    "WITH x ORDER BY x LIMIT 3 "
                    "RETURN collect(toString(x)) AS s", chain_graph)
        assert rows(df) == [((["[1]", "[1, x]", "[1, 2]"],))]

    def test_map_order_size_then_entries(self, spark, chain_graph):
        # AnyValues map comparator: size first, then key-sorted entries
        df = cypher(spark,
                    "UNWIND [{b: 1}, {a: 1, b: 2}, {a: 9}, 'tail'] AS x "
                    "WITH x ORDER BY x "
                    "RETURN collect(toString(x)) AS s", chain_graph)
        assert rows(df) == [((["{a: 9}", "{b: 1}", "{a: 1, b: 2}",
                               "tail"],))]

    def test_point_orders_between_list_and_temporals(self, spark,
                                                     chain_graph):
        df = cypher(spark,
                    "UNWIND [point({x: 1.0, y: 2.0}), [9], 'a', "
                    "date('2024-01-01')] AS x WITH x ORDER BY x LIMIT 2 "
                    "RETURN collect(toString(x)) AS s", chain_graph)
        assert rows(df) == [((["[9]",
                               "point({crs: cartesian, coords: "
                               "[1.0, 2.0]})"],))]

    def test_nested_null_list_equality_is_ternary(self, spark,
                                                  chain_graph):
        # [1, null] = [1, null] -> null; [1, null] = [2, null] -> false
        # (AnyValue.ternaryEquals over ListValue)
        df = cypher(spark,
                    "WITH [[1, null], 'a'] AS l, [[2, null], 'b'] AS m "
                    "RETURN l[0] = l[0] AS same, l[0] = m[0] AS diff",
                    chain_graph)
        assert rows(df) == [(None, False)]

    def test_map_equality_ternary_on_values(self, spark, chain_graph):
        df = cypher(spark,
                    "WITH [{a: 1}, 'x'] AS l, [{a: 1}, 'y'] AS m, "
                    "[{a: 2}, 'z'] AS o, [{b: 1}, 'w'] AS p "
                    "RETURN l[0] = m[0] AS eq, l[0] = o[0] AS neq, "
                    "l[0] = p[0] AS diffkey", chain_graph)
        assert rows(df) == [(True, False, False)]

    def test_container_is_typed(self, spark, chain_graph):
        df = cypher(spark,
                    "WITH [[1], {k: 1}, point({x: 1.0, y: 1.0}), 's'] AS l "
                    "RETURN l[0] IS :: LIST AS a, l[1] IS :: MAP AS b, "
                    "l[2] IS :: POINT AS c, l[0] IS NOT :: MAP AS d",
                    chain_graph)
        assert rows(df) == [(True, True, True, True)]

    def test_deep_nesting_renders_and_orders(self, spark, chain_graph):
        # the former depth-2 cap is gone: the layout recurses to the
        # static schema's depth
        assert rows(cypher(
            spark, "RETURN toString([[[1], 'a'], 'b']) AS s",
            chain_graph)) == [("[[[1], a], b]",)]
        got = rows(cypher(
            spark,
            "UNWIND [[[2]], [[1]], 'z', [[1], 0]] AS v "
            "RETURN toString(v) AS s ORDER BY v", chain_graph))
        assert got == [("[[1]]",), ("[[1], 0]",), ("[[2]]",), ("z",)]

    def test_deep_nested_equality_and_in(self, spark, chain_graph):
        # e1: the null INSIDE [1, null] makes the comparison UNDEFINED
        # (SequenceValue.ternaryEqualsUsingRandomAccess — null element ->
        # UNDEFINED unless some element definitely differs)
        assert rows(cypher(
            spark,
            "RETURN [[1, null], 'a'] = [[1, null], 'a'] AS e1, "
            "[[1, 2], 'a'] = [[1, 3], 'a'] AS e2, "
            "[[1]] IN [[[1]], 'x'] AS i1, 'x' IN [[[1]], 'x'] AS i2",
            chain_graph)) == [(None, False, True, True)]

    def test_heterogeneous_list_value_type(self, spark, chain_graph):
        # round 8: exact element unions, rank-ordered per
        # CypherTypeOrder.scala:22 (was the coarse LIST<ANY>)
        assert rows(cypher(
            spark, "RETURN valueType([[1], 'a']) AS t", chain_graph)) \
            == [("LIST<STRING NOT NULL | LIST<INTEGER NOT NULL> NOT NULL>"
                 " NOT NULL",)]


class TestNamedTimeZones:
    """Round-3: IANA zone ids in datetime values (DateTimeValue keeps a
    ZoneId next to the instant — values/storable/DateTimeValue.java)."""

    def test_constructor_and_accessors(self, spark, chain_graph):
        df = cypher(spark,
                    "WITH datetime({year: 2024, month: 7, day: 1, "
                    "hour: 12, timezone: 'Europe/Paris'}) AS dt "
                    "RETURN dt.timezone AS tz, dt.hour AS h, "
                    "dt.offset AS off, dt.epochMillis AS ms", chain_graph)
        assert rows(df) == [("Europe/Paris", 12, "+02:00", 1719828000000)]

    def test_dst_offset_change(self, spark, chain_graph):
        # Paris switches +01:00 -> +02:00 at 2024-03-31 02:00 local
        df = cypher(spark,
                    "WITH datetime({year: 2024, month: 3, day: 31, "
                    "hour: 1, minute: 30, timezone: 'Europe/Paris'}) AS w, "
                    "datetime({year: 2024, month: 3, day: 31, hour: 3, "
                    "minute: 30, timezone: 'Europe/Paris'}) AS s "
                    "RETURN w.offset AS wo, s.offset AS so, "
                    "s.epochMillis - w.epochMillis AS gap", chain_graph)
        # 01:30+01:00 -> 00:30Z; 03:30+02:00 -> 01:30Z: one real hour
        assert rows(df) == [("+01:00", "+02:00", 3600000)]

    def test_string_form_and_tostring(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN toString(datetime("
                    "'2015-06-24T12:50:35[Europe/London]')) AS s",
                    chain_graph)
        assert rows(df) == [("2015-06-24T12:50:35+01:00[Europe/London]",)]

    def test_zoned_compares_by_instant(self, spark, chain_graph):
        df = cypher(spark,
                    "WITH datetime({year: 2024, month: 1, day: 1, "
                    "timezone: 'Europe/Paris'}) AS a, "
                    "datetime('2023-12-31T23:00:00Z') AS b "
                    "RETURN a = b AS eq, a > b AS gt, a >= b AS ge",
                    chain_graph)
        assert rows(df) == [(True, False, True)]

    def test_truncate_in_zone(self, spark, chain_graph):
        df = cypher(spark,
                    "WITH datetime({year: 2024, month: 7, day: 1, "
                    "hour: 12, timezone: 'Europe/Paris'}) AS dt "
                    "RETURN datetime.truncate('day', dt).epochMillis AS m, "
                    "datetime.truncate('day', dt).timezone AS tz",
                    chain_graph)
        # Paris midnight Jul 1 = Jun 30 22:00Z
        assert rows(df) == [(1719784800000, "Europe/Paris")]


class TestZonedDurationArithmetic:
    """Named-zone datetime ± duration (DurationValue.addTo): months/days
    shift the wall clock in the value's own zone (DST-aware); seconds and
    nanos add as exact instant arithmetic."""

    def test_calendar_day_across_spring_forward(self, spark, chain_graph):
        # Paris 2024-03-31 02:00 -> 03:00: +P1D keeps the wall hour
        df = cypher(spark,
                    "WITH datetime({year: 2024, month: 3, day: 30, hour: 12,"
                    " timezone: 'Europe/Paris'}) AS dt "
                    "RETURN toString(dt + duration('P1D')) AS s",
                    chain_graph)
        assert rows(df) == [("2024-03-31T12:00+02:00[Europe/Paris]",)]

    def test_exact_seconds_across_spring_forward(self, spark, chain_graph):
        # PT24H of SECONDS crosses the 23-hour day -> wall clock 13:00
        df = cypher(spark,
                    "WITH datetime({year: 2024, month: 3, day: 30, hour: 12,"
                    " timezone: 'Europe/Paris'}) AS dt "
                    "RETURN toString(dt + duration('PT24H')) AS s",
                    chain_graph)
        assert rows(df) == [("2024-03-31T13:00+02:00[Europe/Paris]",)]

    def test_subtract_and_month_clamp(self, spark, chain_graph):
        # Mar 30 - P1M clamps to Feb 29 (leap year), java.time semantics
        df = cypher(spark,
                    "WITH datetime({year: 2024, month: 3, day: 30, hour: 6, "
                    "timezone: 'America/New_York'}) AS dt "
                    "RETURN toString(dt - duration('P1M')) AS s",
                    chain_graph)
        assert rows(df) == [("2024-02-29T06:00-05:00[America/New_York]",)]

    def test_duration_plus_zoned_commutes(self, spark, chain_graph):
        df = cypher(spark,
                    "WITH datetime({year: 2024, month: 3, day: 30, hour: 12,"
                    " timezone: 'Europe/Paris'}) AS dt "
                    "RETURN toString(duration('P1D') + dt) AS s",
                    chain_graph)
        assert rows(df) == [("2024-03-31T12:00+02:00[Europe/Paris]",)]

    def test_duration_null_is_null(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN duration(null) IS NULL AS isn, "
                    "datetime({year: 2024, month: 1, day: 1, "
                    "timezone: 'Europe/Paris'}) + duration(null) AS v",
                    chain_graph)
        got = rows(df)
        assert got[0][0] is True and got[0][1] is None


class TestTCKEdgeSemantics:
    """Round-3 TCK-ish edge cases: zero-length-path equality, OPTIONAL
    MATCH WHERE with outer references and null rows."""

    import pytest as _pytest

    @_pytest.fixture(scope="class")
    def ab_graph(self, spark):
        from neo4j_spark.graph import PropertyGraph

        nodes = {
            "A": spark.createDataFrame(
                [(1, ["A"], 1)], "id long, labels array<string>, x long"),
            "B": spark.createDataFrame(
                [(2, ["B"], 2)], "id long, labels array<string>, x long")}
        rels = {"R": spark.createDataFrame(
            [(10, 1, 2, "R")], "id long, src long, dst long, type string")}
        return PropertyGraph(nodes, rels)

    def test_zero_length_path_equality(self, spark, ab_graph):
        assert rows(cypher(spark,
                    "MATCH p1 = (a:A), p2 = (a:A) RETURN p1 = p2 AS eq",
                    ab_graph)) == [(True,)]
        assert rows(cypher(spark,
                    "MATCH p1 = (a:A), p2 = (b:B) RETURN p1 = p2 AS eq",
                    ab_graph)) == [(False,)]
        assert rows(cypher(spark,
                    "MATCH p = (a:A) RETURN length(p) AS l, "
                    "size(nodes(p)) AS n", ab_graph)) == [(0, 1)]

    def test_optional_match_where_keeps_null_row(self, spark, ab_graph):
        assert rows(cypher(spark,
                    "MATCH (a:A) OPTIONAL MATCH (a)-[r:R]->(b) "
                    "WHERE b.x > 99 RETURN a.x AS ax, b.x AS bx",
                    ab_graph)) == [(1, None)]

    def test_optional_match_where_outer_reference(self, spark, ab_graph):
        # WHERE references ONLY outer vars: they correlate into the
        # optional side; a null outer property null-fails the predicate
        # and the row survives null-padded
        assert rows(cypher(spark,
                    "MATCH (a:A) OPTIONAL MATCH (b:B) "
                    "WHERE a.missing = b.x RETURN b.x AS bx",
                    ab_graph)) == [(None,)]
        assert rows(cypher(spark,
                    "MATCH (a:A) OPTIONAL MATCH (b:B) "
                    "WHERE a.x + 1 = b.x RETURN b.x AS bx",
                    ab_graph)) == [(2,)]
        got = rows(cypher(spark,
                   "MATCH (n:A|B) OPTIONAL MATCH (m:B) WHERE m.x > n.x "
                   "RETURN n.x AS nx, m.x AS mx ORDER BY nx", ab_graph))
        assert got == [(1, 2), (2, None)]


class TestZonedSelectorArguments:
    """Temporal selectors receiving ZONED datetime values: the calendar
    components come from the value's own zone (TemporalValue selectors)."""

    def test_date_selector_from_zoned(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN date({date: "
                    "datetime('2020-03-04T23:06:07+05:00')}) = "
                    "date('2020-03-04') AS ok", chain_graph)
        assert rows(df) == [(True,)]

    def test_localdatetime_selector_from_zoned(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN toString(localdatetime({datetime: "
                    "datetime('2020-03-04T05:06:07Z')})) AS s, "
                    "toString(localdatetime(datetime("
                    "'2020-03-04T05:06:07+02:00'))) AS t", chain_graph)
        assert rows(df) == [("2020-03-04T05:06:07", "2020-03-04T05:06:07")]


class TestTaggedContainerAccess:
    """Chained property/index access through the heterogeneous encoding
    (MapValue.get / ListValue index: miss and out-of-bounds yield null)."""

    def test_nested_mixed_map_chain(self, spark, chain_graph):
        df = cypher(spark,
                    "WITH {a: {b: [1, {c: 2}]}} AS m "
                    "RETURN m.a.b[1].c = 2 AS eq, "
                    "toString(m.a.b[1].c) AS s, "
                    "toString(m.a.b[0]) AS h", chain_graph)
        assert rows(df) == [(True, "2", "1")]

    def test_mixed_list_index_wrap_and_oob(self, spark, chain_graph):
        df = cypher(spark,
                    "WITH [[1], 'a'] AS l "
                    "RETURN toString(l[-1]) AS neg, toString(l[5]) AS oob, "
                    "toString(l[0][0]) AS nested", chain_graph)
        assert rows(df) == [("a", None, "1")]

    def test_missing_static_map_key_is_null(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN {a: 1}['a'] AS hit, {a: 1}['b'] AS miss",
                    chain_graph)
        assert rows(df) == [(1, None)]

    def test_dynamic_key_on_mixed_map(self, spark, chain_graph):
        df = cypher(spark,
                    "WITH {a: 1, b: 'x'} AS m RETURN m['b'] AS v",
                    chain_graph)
        assert rows(df) == [("x",)]


class TestListLiteralUnification:
    """A literal list whose elements differ only by null-widening or
    numeric widening is a homogeneous list (no tagged encoding) — so maps
    with null-valued fields group and aggregate normally."""

    def test_null_widened_maps_group_and_sum(self, spark, chain_graph):
        df = cypher(spark,
                    "UNWIND [{k: null, v: 1}, {k: null, v: 2}, "
                    "{k: 'a', v: 3}] AS m "
                    "RETURN m.k AS k, sum(m.v) AS s ORDER BY k",
                    chain_graph)
        assert rows(df) == [("a", 3), (None, 3)]

    def test_int_float_list_widen(self, spark, chain_graph):
        df = cypher(spark, "RETURN [1, 2.5][0] AS a, [1, 2.5][1] AS b",
                    chain_graph)
        assert rows(df) == [(1.0, 2.5)]

    def test_nested_array_null_widen(self, spark, chain_graph):
        df = cypher(spark,
                    "WITH [[1, null], [2, 3]] AS l RETURN l[0][1] AS a, "
                    "l[1][0] AS b", chain_graph)
        assert rows(df) == [(None, 2)]


class TestTernaryContainerEquality:
    """Recursive ternary equality through nested lists/maps and IN
    (AnyValue.ternaryEquals, AnyValue.java:62): a null INSIDE a container
    makes the comparison undefined unless some element definitely differs.
    Plain Spark array/struct == would treat null elements as equal."""

    def test_list_with_null_eq_is_null(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN [1, null] = [1, null] AS a, "
                    "[1, 2] = [1, null] AS b, "
                    "[1, null] = [2, null] AS c", chain_graph)
        assert rows(df) == [(None, None, False)]

    def test_nested_list_null_eq_recurses(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN [[1, null]] = [[1, null]] AS a, "
                    "[1, [2, null]] = [1, [2, null]] AS b, "
                    "[[1, 2]] = [[1, 2]] AS c", chain_graph)
        assert rows(df) == [(None, None, True)]

    def test_map_null_value_eq_is_null(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN {a: 1, b: null} = {a: 1, b: null} AS a, "
                    "{a: [1, null]} = {a: [1, null]} AS b, "
                    "{a: 1} = {a: 1} AS c", chain_graph)
        assert rows(df) == [(None, None, True)]

    def test_in_with_null_inside_candidate(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN [1, null] IN [[1, null]] AS a, "
                    "[1, null] IN [[1, 2]] AS b, "
                    "[1, null] IN [[2, 3]] AS c, "
                    "[1, 2] IN [[1, 2], [3]] AS d", chain_graph)
        assert rows(df) == [(None, None, False, True)]

    def test_in_scalar_rules_unchanged(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN 1 IN [1, null] AS a, 3 IN [1, null] AS b, "
                    "null IN [] AS c, null IN [1] AS d", chain_graph)
        assert rows(df) == [(True, None, False, None)]


class TestTemporalArithmeticStrictness:
    """CypherMath.java add/subtract: temporals combine only with
    durations — temporal+number and temporal-temporal are type errors
    (use duration.between); a null operand still propagates null."""

    def test_temporal_plus_number_raises(self, spark, chain_graph):
        import pytest
        from neo4j_spark.cypher.exprs import CypherTypeError
        with pytest.raises(CypherTypeError):
            cypher(spark, "RETURN date('2020-01-01') + 1 AS d", chain_graph)

    def test_temporal_minus_temporal_raises(self, spark, chain_graph):
        import pytest
        from neo4j_spark.cypher.exprs import CypherTypeError
        with pytest.raises(CypherTypeError):
            cypher(spark,
                   "RETURN date('2020-01-02') - date('2020-01-01') AS d",
                   chain_graph)

    def test_temporal_null_operand_propagates(self, spark, chain_graph):
        df = cypher(spark,
                    "RETURN date('2020-01-01') + null AS a, "
                    "date('2020-01-01') - null AS b", chain_graph)
        assert rows(df) == [(None, None)]

    def test_duration_truncations_zoned_operands(self, spark, chain_graph):
        # duration.inDays/inMonths/inSeconds unwrap named-zone structs to
        # their instant, same as duration.between
        df = cypher(spark,
                    "RETURN duration.inDays(date('2020-01-01'), "
                    "datetime('2020-03-01T00:00:00Z')).days AS d, "
                    "duration.inSeconds(datetime('2020-01-01T00:00:00Z'), "
                    "datetime({year: 2020, month: 1, day: 1, hour: 2, "
                    "timezone: 'Z'})).seconds AS s", chain_graph)
        assert rows(df) == [(60, 7200)]

    def test_log_zero_is_neg_infinity(self, spark, chain_graph):
        # Math.log semantics: 0 -> -Inf, negative -> NaN (Spark's log
        # returns NULL for both)
        import math
        df = cypher(spark,
                    "RETURN log(0) AS a, log10(0) AS b, log(-1) AS c, "
                    "log(null) AS d", chain_graph)
        [(a, b, c, d)] = rows(df)
        assert a == float("-inf") and b == float("-inf")
        assert math.isnan(c) and d is None
