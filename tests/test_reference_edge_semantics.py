"""Edge semantics verified against the reference source (round-4 probe
sweep): CypherMath.java arithmetic, CypherFunctions.java coercions and
argument checks, Value.java NaN equality/comparability, DurationValue
/DateValue parse forms, and IterableExpressions quantifier ternary logic."""

import math

import pytest

# conformance tranche: excluded from the default (core) run so the
# driver's verify window can finish; run with `pytest -m acceptance`
pytestmark = pytest.mark.acceptance


from neo4j_spark.api import cypher


def rows(df):
    return [tuple(r) for r in df.collect()]


def one(spark, g, q):
    [(v,)] = rows(cypher(spark, q, g))
    return v


class TestArithmeticEdges:
    """CypherMath.java add/divide/modulo + ValueMath overflow."""

    def test_integer_division_exact_above_2_53(self, spark, chain_graph):
        # double-roundtrip division would round this to ...330
        assert one(spark, chain_graph,
                   "RETURN 9007199254740993 / 3 AS v") == 3002399751580331

    def test_int_division_truncates_toward_zero(self, spark, chain_graph):
        assert rows(cypher(spark, "RETURN -3 / 2 AS a, 3 / 2 AS b",
                           chain_graph)) == [(-1, 1)]

    def test_float_mod_by_zero_is_nan(self, spark, chain_graph):
        assert math.isnan(one(spark, chain_graph, "RETURN 1.0 % 0.0 AS v"))

    def test_int_div_and_mod_by_zero_raise(self, spark, chain_graph):
        with pytest.raises(Exception, match="(?i)zero"):
            cypher(spark, "RETURN 1 / 0 AS v", chain_graph).collect()
        with pytest.raises(Exception, match="(?i)zero"):
            cypher(spark, "RETURN 1 % 0 AS v", chain_graph).collect()

    def test_long_overflow_raises(self, spark, chain_graph):
        with pytest.raises(Exception, match="(?i)overflow"):
            cypher(spark, "RETURN 9223372036854775807 + 1 AS v",
                   chain_graph).collect()

    def test_cot_zero_is_infinity(self, spark, chain_graph):
        assert one(spark, chain_graph, "RETURN cot(0) AS v") == float("inf")

    def test_inf_nan_keyword_literals(self, spark, chain_graph):
        [(a, b, c)] = rows(cypher(
            spark, "RETURN Inf AS a, -Infinity AS b, NaN AS c", chain_graph))
        assert a == float("inf") and b == float("-inf") and math.isnan(c)


class TestListPlusPrecedence:
    """CypherMath.add: ListValue append/prepend precede string concat."""

    def test_list_plus_string_appends(self, spark, chain_graph):
        # heterogeneous result renders as its Cypher text form
        assert one(spark, chain_graph,
                   "RETURN [1] + 'a' AS v") == "[1, a]"

    def test_string_plus_list_prepends(self, spark, chain_graph):
        assert one(spark, chain_graph,
                   "RETURN 'a' + [1] AS v") == "[a, 1]"

    def test_homogeneous_append_stays_typed(self, spark, chain_graph):
        assert rows(cypher(
            spark, "RETURN ([1] + 2)[1] AS a, (1 + [2, 3])[0] AS b",
            chain_graph)) == [(2, 1)]

    def test_numeric_widening_append(self, spark, chain_graph):
        assert one(spark, chain_graph,
                   "RETURN [1] + 2.5 AS v") == [1.0, 2.5]


class TestNaNSemantics:
    """Value.java:151 hasNaNOperand -> Equality.FALSE; ternary compare
    with a NaN operand is UNDEFINED (Value.java:170)."""

    def test_nan_never_equals(self, spark, chain_graph):
        assert rows(cypher(
            spark,
            "RETURN 0.0/0.0 = 0.0/0.0 AS a, 0.0/0.0 <> 0.0/0.0 AS b, "
            "0.0/0.0 = 1.0 AS c", chain_graph)) == [(False, True, False)]

    def test_nan_comparison_is_false_in_return(self, spark, chain_graph):
        # NaNAcceptance.feature: NOT(0.0 < (0.0/0.0)) = true, so the
        # comparison itself is FALSE (not undefined/null)
        assert rows(cypher(
            spark, "RETURN (0.0/0.0) < 1.0 AS a, (0.0/0.0) >= 1.0 AS b, "
            "NOT (0.0 < (0.0/0.0)) AS c, NOT (NOT (0.0 < (0.0/0.0))) AS d",
            chain_graph)) == [(False, False, True, False)]

    def test_nan_filter_drops_rows_and_pushes_down(self, spark, tpch_graph):
        # WHERE compiles the pushable conjunct form: the comparison atom
        # must reach PushedFilters (null-is-false context)
        df = cypher(spark,
                    "MATCH (c:Customer) WHERE c.acctbal >= 1000 "
                    "RETURN count(*) AS n", tpch_graph)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "GreaterThanOrEqual(c_acctbal,1000" in plan.replace(" ", "")


class TestCoercionEdges:
    def test_tointeger_string_forms(self, spark, chain_graph):
        assert rows(cypher(
            spark,
            "RETURN toInteger('42') AS a, toInteger('42.7') AS b, "
            "toInteger('foo') AS c, toInteger(true) AS d, "
            "toInteger(-3.9) AS e", chain_graph)) == [(42, 42, None, 1, -3)]

    def test_tointeger_too_large_raises_ornull_nulls(self, spark,
                                                     chain_graph):
        with pytest.raises(Exception, match="(?i)too large"):
            cypher(spark, "RETURN toInteger('1e20') AS v",
                   chain_graph).collect()
        assert one(spark, chain_graph,
                   "RETURN toIntegerOrNull('1e20') AS v") is None

    def test_tointeger_nan_is_zero(self, spark, chain_graph):
        # Java (long) NaN == 0 (NumberValue.longValue)
        assert one(spark, chain_graph,
                   "RETURN toInteger(0.0/0.0) AS v") == 0

    def test_list_conversions_elementwise_ornull(self, spark, chain_graph):
        assert rows(cypher(
            spark,
            "RETURN toIntegerList(['1', 'x', 2.9]) AS a, "
            "toBooleanList(['true', 'x', false]) AS b, "
            "toStringList([1, 2.5, 'a', null]) AS c", chain_graph)) == \
            [(
                [1, None, 2],
                [True, None, False],
                ["1", "2.5", "a", None],
            )]


class TestArgumentChecks:
    def test_range_zero_step_raises(self, spark, chain_graph):
        with pytest.raises(Exception, match="(?i)zero"):
            cypher(spark, "RETURN range(0, 2, 0) AS v",
                   chain_graph).collect()

    def test_substring_negative_raises(self, spark, chain_graph):
        with pytest.raises(Exception, match="(?i)negative"):
            cypher(spark, "RETURN substring('hello', -1) AS v",
                   chain_graph).collect()

    def test_left_negative_raises(self, spark, chain_graph):
        with pytest.raises(Exception, match="(?i)negative"):
            cypher(spark, "RETURN left('hello', -1) AS v",
                   chain_graph).collect()

    def test_non_integer_list_index_raises(self, spark, chain_graph):
        from neo4j_spark.cypher.exprs import CypherTypeError
        with pytest.raises(CypherTypeError):
            cypher(spark, "RETURN [1, 2, 3][1.5] AS v", chain_graph)

    def test_where_non_boolean_raises(self, spark, chain_graph):
        from neo4j_spark.cypher.translate import TranslateError
        with pytest.raises(TranslateError):
            cypher(spark, "WITH 1 AS x WHERE 1 RETURN x", chain_graph)


class TestStringPredicateEdges:
    def test_non_text_operand_is_null(self, spark, chain_graph):
        assert rows(cypher(
            spark,
            "RETURN 'abc' STARTS WITH 1 AS a, 'abc' CONTAINS true AS b, "
            "1 ENDS WITH 'a' AS c, 'abc' STARTS WITH '' AS d",
            chain_graph)) == [(None, None, None, True)]

    def test_split_null_separator_in_list(self, spark, chain_graph):
        assert rows(cypher(
            spark,
            "RETURN split('a,b', [',', null]) AS a, "
            "split('a,b;c', [',', ';']) AS b", chain_graph)) == \
            [(None, ["a", "b", "c"])]


class TestQuantifierTernary:
    def test_single_with_undefined_element(self, spark, chain_graph):
        assert rows(cypher(
            spark,
            "RETURN single(x IN [1, null] WHERE x > 0) AS a, "
            "single(x IN [1, 2, null] WHERE x > 0) AS b, "
            "single(x IN [1, 2, 3] WHERE x = 2) AS c, "
            "single(x IN [] WHERE x > 0) AS d",
            chain_graph)) == [(None, False, True, False)]


class TestUnwindScalar:
    def test_unwind_scalar_yields_one_row(self, spark, chain_graph):
        assert rows(cypher(spark, "UNWIND 5 AS x RETURN x", chain_graph)) \
            == [(5,)]

    def test_unwind_null_yields_no_rows(self, spark, chain_graph):
        assert rows(cypher(
            spark, "UNWIND null AS x RETURN x", chain_graph)) == []


class TestTemporalParseForms:
    """DateValue.parse PATTERN: week / quarter / ordinal forms;
    DurationValue.parse sign and fraction handling."""

    def test_iso_week_quarter_ordinal_dates(self, spark, chain_graph):
        import datetime
        assert rows(cypher(
            spark,
            "RETURN date('2020-W03-2') AS w, date('2020-Q2-01') AS q, "
            "date('2020-123') AS o, date('2020-02') AS ym",
            chain_graph)) == [(datetime.date(2020, 1, 14),
                               datetime.date(2020, 4, 1),
                               datetime.date(2020, 5, 2),
                               datetime.date(2020, 2, 1))]

    def test_duration_negative_and_fractional(self, spark, chain_graph):
        assert rows(cypher(
            spark,
            "RETURN duration('-PT1H').seconds AS a, "
            "duration('P1.5D').hours AS b, "
            "duration('-P1DT30M') = duration({days: -1, minutes: -30}) "
            "AS c", chain_graph)) == [(-3600, 12, True)]

    def test_duration_date_based_form(self, spark, chain_graph):
        assert rows(cypher(
            spark,
            "WITH duration('P0001-02-03T04:05:06') AS d "
            "RETURN d.months AS m, d.days AS dd, d.seconds AS s",
            chain_graph)) == [(14, 3, 14706)]

    def test_duration_garbage_raises(self, spark, chain_graph):
        with pytest.raises(Exception, match="(?i)duration"):
            cypher(spark, "RETURN duration('bogus') AS v",
                   chain_graph).collect()


class TestMiscRendering:
    def test_tostring_point(self, spark, chain_graph):
        assert one(spark, chain_graph,
                   "RETURN toString(point({x: 1, y: 2})) AS v") == \
            "point({x: 1.0, y: 2.0, crs: 'cartesian'})"

    def test_keys_keeps_null_valued_map_keys(self, spark, chain_graph):
        assert rows(cypher(
            spark, "RETURN keys({a: 1, b: null}) AS v", chain_graph)) == \
            [(["a", "b"],)]

    def test_minmax_over_mixed_types_render(self, spark, chain_graph):
        # aggregate over heterogeneous values: orderability picks the
        # winner; the result renders as its text form at ProduceResult
        assert rows(cypher(
            spark,
            "UNWIND [1, 'a'] AS x RETURN min(x) AS lo, max(x) AS hi",
            chain_graph)) == [("a", "1")]


class TestTemporalComposition:
    def test_localdatetime_date_time_composition(self, spark, chain_graph):
        assert one(spark, chain_graph,
                   "RETURN toString(localdatetime({date: date('2020-01-02'),"
                   " time: localtime('03:04:05')})) AS v") == \
            "2020-01-02T03:04:05"

    def test_datetime_date_selector_with_fields(self, spark, chain_graph):
        assert one(spark, chain_graph,
                   "RETURN datetime({date: date('2020-01-02'), hour: 5})"
                   ".hour AS v") == 5


class TestPointCrs:
    def test_distance_across_crs_is_null(self, spark, chain_graph):
        assert one(spark, chain_graph,
                   "RETURN point.distance(point({x: 1, y: 2}), "
                   "point({latitude: 52.0, longitude: 4.0})) AS v") is None


class TestWriteEdges:
    def test_merge_null_key_raises(self, spark, chain_graph):
        with pytest.raises(Exception, match="(?i)null property"):
            cypher(spark, "MERGE (n:A {x: null}) RETURN n.x AS v",
                   chain_graph).collect()

    def test_time_selector_and_truncate(self, spark, chain_graph):
        assert rows(cypher(
            spark,
            "RETURN toString(localtime({time: localtime('01:02:03')})) "
            "AS a, toString(localtime.truncate('minute', "
            "localtime('01:02:03'))) AS b",
            chain_graph)) == [("01:02:03", "01:02:00")]


class TestCoercionClassErrors:
    def test_toboolean_float_raises_ornull_nulls(self, spark, chain_graph):
        from neo4j_spark.cypher.exprs import CypherTypeError
        with pytest.raises(CypherTypeError):
            cypher(spark, "RETURN toBoolean(1.5) AS v", chain_graph)
        assert one(spark, chain_graph,
                   "RETURN toBooleanOrNull(1.5) AS v") is None

    def test_tofloat_boolean_raises_ornull_nulls(self, spark, chain_graph):
        from neo4j_spark.cypher.exprs import CypherTypeError
        with pytest.raises(CypherTypeError):
            cypher(spark, "RETURN toFloat(true) AS v", chain_graph)
        assert one(spark, chain_graph,
                   "RETURN toFloatOrNull(true) AS v") is None


class TestRound4AdviceFixes:
    """Round-4 advisor findings: exact long parses/compares, empty-source
    replace, date component range validation, plan-cache write detection."""

    def test_tointeger_string_exact_above_2_53(self, spark, chain_graph):
        # stringToLongValue tries Long.parseLong first — no double round
        assert rows(cypher(
            spark,
            "RETURN toInteger('9007199254740993') AS a, "
            "toInteger('9223372036854775807') AS b, "
            "toInteger('-9223372036854775808') AS c",
            chain_graph)) == [(9007199254740993, 9223372036854775807,
                               -9223372036854775808)]

    def test_replace_empty_source_empty_search(self, spark, chain_graph):
        # Java "".replace("", "X") is "X", not "XX"
        assert rows(cypher(
            spark,
            "RETURN replace('', '', 'X') AS a, "
            "replace('abc', '', 'X') AS b",
            chain_graph)) == [("X", "XaXbXcX")]

    @pytest.mark.parametrize("bad", [
        "date('2020-W60-1')",   # week > 53
        "date('2021-W53-1')",   # 2021 has 52 ISO weeks
        "date('2020-999')",     # ordinal day > year length
        "date('2020-Q1-99')",   # day beyond quarter
    ])
    def test_date_parse_component_ranges_raise(self, spark, chain_graph,
                                               bad):
        # DateValue.parse raises rather than rolling into later periods
        with pytest.raises(Exception, match="Invalid value"):
            cypher(spark, f"RETURN {bad} AS v", chain_graph).collect()

    def test_date_parse_week53_valid_year(self, spark, chain_graph):
        import datetime
        assert one(spark, chain_graph,
                   "RETURN date('2015-W53-1') AS v") \
            == datetime.date(2015, 12, 28)

    def test_tagged_long_equality_exact(self, spark, chain_graph):
        # NumberValues.numbersEqual: longs above 2^53 compare exactly
        # even inside a heterogeneous (tagged) list
        assert rows(cypher(
            spark,
            "RETURN 9007199254740993 IN [9007199254740992, 'a'] AS a, "
            "9007199254740993 IN [9007199254740993, 'a'] AS b",
            chain_graph)) == [(False, True)]

    def test_tagged_long_comparison_exact(self, spark, chain_graph):
        assert rows(cypher(
            spark,
            "WITH [9007199254740993, 'a'] AS l "
            "RETURN l[0] > 9007199254740992 AS a, "
            "l[0] <= 9007199254740992 AS b",
            chain_graph)) == [(True, False)]


def test_tagged_mixed_long_double_exact(spark, chain_graph):
    # NumberValues.compareDoubleAgainstLong: mixed long/double compares
    # exactly above 2^53 (the double payload alone collapses 2^53+1
    # onto 2^53)
    assert rows(cypher(
        spark,
        "WITH [9007199254740993, 'a'] AS l "
        "RETURN l[0] > 9007199254740992.0 AS a, "
        "l[0] = 9007199254740992.0 AS b, "
        "l[0] < 9007199254740994.0 AS c",
        chain_graph)) == [(True, False, True)]


def test_tagged_mixed_double_overflows_long(spark, chain_graph):
    # a double past Long.MAX compares false (not null) against any long
    assert rows(cypher(
        spark,
        "WITH [9223372036854775807, 'a'] AS l "
        "RETURN l[0] = 9223372036854775808.0 AS a, "
        "l[0] < 9223372036854775808.0 AS b, "
        "l[0] > -9223372036854775809.0 AS c",
        chain_graph)) == [(False, True, True)]


def test_tagged_mixed_long_min_exact(spark, chain_graph):
    # -2^63 is exactly representable as a double: equality holds
    assert rows(cypher(
        spark,
        "WITH [-9223372036854775808, 'a'] AS l "
        "RETURN l[0] = -9223372036854775808.0 AS a, "
        "l[0] < -9200000000000000000.0 AS b",
        chain_graph)) == [(True, True)]


def test_sum_of_void_is_long_zero(spark, chain_graph):
    # SumFunction starts from Values.ZERO_INT: sum(null) is the long 0
    [(s, a)] = rows(cypher(spark, "RETURN sum(null) AS s, avg(null) AS a",
                           chain_graph))
    assert s == 0 and not isinstance(s, float) and a is None


@pytest.mark.parametrize("bad", [
    "date({year: 2020, week: 60})",
    "date({year: 2021, week: 53})",
    "date({year: 2020, ordinalDay: 999})",
    "date({year: 2020, quarter: 1, dayOfQuarter: 99})",
])
def test_date_map_component_ranges_raise(spark, chain_graph, bad):
    # the map constructor validates like DateValue's checked fields,
    # mirroring the string-parse validation
    with pytest.raises(Exception, match="Invalid value"):
        cypher(spark, f"RETURN {bad} AS v", chain_graph).collect()


class TestSizeArgumentClasses:
    """CypherFunctions.size accepts String or List only."""

    def test_size_of_map_raises(self, spark, chain_graph):
        from neo4j_spark.cypher.exprs import CypherTypeError
        with pytest.raises(CypherTypeError, match="size"):
            cypher(spark, "RETURN size({a: 1}) AS s", chain_graph)

    def test_size_dispatches_on_tagged_class(self, spark, chain_graph):
        assert rows(cypher(
            spark, "UNWIND [[1, 2], 'abc'] AS x RETURN size(x) AS s",
            chain_graph)) == [(2,), (3,)]
        with pytest.raises(Exception, match="String or List"):
            cypher(spark, "UNWIND [[1], 5] AS x RETURN size(x) AS s",
                   chain_graph).collect()

    def test_size_of_map_type_raises(self, spark, chain_graph):
        # a MapType-typed value (parameter map) raises like struct maps
        from neo4j_spark.api import cypher as cy

        with pytest.raises(Exception, match="String or List, got a Map"):
            cy(spark, "RETURN size($m) AS s", chain_graph,
               params={"m": {"a": 1}}).collect()

    def test_size_error_names_argument_class(self, spark, chain_graph):
        with pytest.raises(Exception, match="got a Duration"):
            cypher(spark, "RETURN size(duration('P1D')) AS s",
                   chain_graph).collect()
        with pytest.raises(Exception, match="got a Point"):
            cypher(spark, "RETURN size(point({x: 1, y: 2})) AS s",
                   chain_graph).collect()
        with pytest.raises(Exception, match="got a Node"):
            cypher(spark, "MATCH (n) RETURN size(n) AS s",
                   chain_graph).collect()

    def test_size_null_is_null(self, spark, chain_graph):
        assert rows(cypher(spark, "RETURN size(null) AS s",
                           chain_graph)) == [(None,)]
