"""Exploratory probe: run a battery of edge-case Cypher expressions and
print actual results (or error class) so divergences from the reference
semantics (CypherMath.java / CypherFunctions.java / AnyValues.java) can be
adjudicated in bulk.  Expected values annotated from the reference source.

Usage: python tools/probe_semantics.py [section-prefix ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from neo4j_spark.session import get_spark  # noqa: E402


# (name, cypher RETURN-expr query, expected-description)
PROBES = [
    # --- arithmetic (CypherMath.java) ---
    ("div_int", "RETURN 3 / 2 AS v", "1 (long)"),
    ("div_int_neg", "RETURN -3 / 2 AS v", "-1 (trunc toward zero)"),
    ("div_int_zero", "RETURN 1 / 0 AS v", "ERROR / by zero"),
    ("div_float_zero", "RETURN 1.0 / 0 AS v", "Infinity"),
    ("div_zero_zero", "RETURN 0.0 / 0.0 AS v", "NaN"),
    ("mod_int", "RETURN 3 % 2 AS v", "1"),
    ("mod_neg", "RETURN -3 % 2 AS v", "-1 (sign of dividend)"),
    ("mod_neg2", "RETURN 3 % -2 AS v", "1"),
    ("mod_float", "RETURN -3.5 % 2 AS v", "-1.5"),
    ("mod_int_zero", "RETURN 1 % 0 AS v", "ERROR % by zero"),
    ("mod_float_zero", "RETURN 1.0 % 0.0 AS v", "NaN"),
    ("pow", "RETURN 2 ^ 3 AS v", "8.0 (always double)"),
    ("pow_neg", "RETURN 2 ^ -1 AS v", "0.5"),
    ("pow_zero", "RETURN 0 ^ 0 AS v", "1.0"),
    ("overflow_add", "RETURN 9223372036854775807 + 1 AS v",
     "ERROR integer overflow (Math.addExact)"),
    ("overflow_sub", "RETURN -9223372036854775807 - 2 AS v",
     "ERROR integer overflow"),
    ("overflow_mul", "RETURN 9223372036854775807 * 2 AS v",
     "ERROR integer overflow"),
    ("unary_minus_min", "RETURN -(-9223372036854775807 - 1) AS v",
     "ERROR integer overflow (negate MIN_VALUE)"),
    ("int_div_large", "RETURN 9007199254740993 / 3 AS v",
     "3002399751580331 (exact long division, no double rounding)"),
    ("mul_large_exact", "RETURN 3037000499 * 3037000499 AS v",
     "9223372030926249001 (fits, no overflow error)"),
    # --- round (CypherFunctions.java:253-303) ---
    ("round_half", "RETURN round(2.5) AS v", "3.0"),
    ("round_half_neg", "RETURN round(-2.5) AS v", "-2.0 (Math.round ties +inf)"),
    ("round_prec", "RETURN round(2.345, 2) AS v", "2.35 (HALF_UP decimal)"),
    ("round_mode", "RETURN round(2.5, 0, 'HALF_DOWN') AS v", "2.0"),
    ("round_nan", "RETURN round(0.0/0.0) AS v", "NaN passes through"),
    # --- coercions ---
    ("toint_str", "RETURN toInteger('42') AS v", "42"),
    ("toint_strf", "RETURN toInteger('42.7') AS v", "42 (BigDecimal truncate)"),
    ("toint_garbage", "RETURN toInteger('foo') AS v", "null"),
    ("toint_toolarge", "RETURN toInteger('1e20') AS v",
     "ERROR integer too large (stringToLongValue)"),
    ("tointornull_toolarge", "RETURN toIntegerOrNull('1e20') AS v", "null"),
    ("toint_bool", "RETURN toInteger(true) AS v", "1"),
    ("toint_float", "RETURN toInteger(3.9) AS v", "3"),
    ("toint_floatneg", "RETURN toInteger(-3.9) AS v", "-3"),
    ("tofloat_garbage", "RETURN toFloat('abc') AS v", "null"),
    ("tobool_str", "RETURN toBoolean('TRUE') AS v", "true (case-insens)"),
    ("tobool_strx", "RETURN toBoolean('yes') AS v", "null"),
    ("tobool_int", "RETURN toBoolean(1) AS v", "true (nonzero)"),
    ("tobool_int0", "RETURN toBoolean(0) AS v", "false"),
    ("tostr_float", "RETURN toString(1.0) AS v", "'1.0'"),
    ("tostr_bool", "RETURN toString(true) AS v", "'true'"),
    # --- strings ---
    ("substr_past", "RETURN substring('hello', 10) AS v", "''"),
    ("substr_neg", "RETURN substring('hello', -1) AS v", "ERROR negative start"),
    ("left_over", "RETURN left('hello', 99) AS v", "'hello'"),
    ("split_empty_sep", "RETURN split('abc', '') AS v", "['a','b','c'] or ERROR?"),
    ("split_empty_src", "RETURN split('', ',') AS v", "['']"),
    ("plus_str_num", "RETURN 'a' + 1 AS v", "'a1'"),
    ("plus_num_str", "RETURN 1 + 'a' AS v", "'1a'"),
    ("plus_str_float", "RETURN 'a' + 1.5 AS v", "'a1.5'"),
    ("plus_str_bool", "RETURN 'a' + true AS v", "ERROR? (no bool+string)"),
    ("plus_list_el", "RETURN [1] + 2 AS v", "[1,2]"),
    ("plus_el_list", "RETURN 1 + [2] AS v", "[1,2]"),
    ("plus_lists", "RETURN [1] + [2, 3] AS v", "[1,2,3]"),
    ("plus_list_str", "RETURN [1] + 'a' AS v", "[1,'a'] (hetero append)"),
    # --- comparisons / ternary ---
    ("cmp_cross", "RETURN 1 < 'a' AS v", "null (TERNARY_COMPARATOR)"),
    ("cmp_lists", "RETURN [1, 2] < [1, 3] AS v", "true"),
    ("cmp_list_len", "RETURN [1] < [1, 0] AS v", "true (prefix shorter)"),
    ("cmp_bool", "RETURN false < true AS v", "true"),
    ("chained_cmp", "RETURN 1 < 2 < 3 AS v", "true (chained = conjunction)"),
    ("chained_cmp_f", "RETURN 1 < 2 > 5 AS v", "false"),
    ("cmp_nan", "RETURN 0.0/0.0 = 0.0/0.0 AS v", "false (NaN != NaN)"),
    ("cmp_nan_lt", "RETURN (0.0/0.0) < 1.0 AS v", "false (pred: NaN incomparable)"),
    # --- lists / containers ---
    ("idx_oob", "RETURN [1,2,3][5] AS v", "null"),
    ("idx_negoob", "RETURN [1,2,3][-5] AS v", "null"),
    ("idx_neg", "RETURN [1,2,3][-1] AS v", "3"),
    ("idx_float", "RETURN [1,2,3][1.5] AS v", "ERROR non-integer index"),
    ("idx_str_on_list", "RETURN [1,2,3]['a'] AS v", "ERROR"),
    ("slice_oob", "RETURN [1,2,3][1..10] AS v", "[2,3]"),
    ("slice_negs", "RETURN [1,2,3][-2..] AS v", "[2,3]"),
    ("slice_empty", "RETURN [1,2,3][2..1] AS v", "[]"),
    ("range_down", "RETURN range(2, 0) AS v", "[]"),
    ("range_zero_step", "RETURN range(0, 2, 0) AS v", "ERROR step 0"),
    ("range_neg", "RETURN range(4, 0, -2) AS v", "[4,2,0]"),
    ("map_missing", "RETURN {a: 1}['b'] AS v", "null"),
    ("map_dyn_null", "RETURN {a: 1}[null] AS v", "null"),
    ("head_empty", "RETURN head([]) AS v", "null"),
    ("last_empty", "RETURN last([]) AS v", "null"),
    ("tail_empty", "RETURN tail([]) AS v", "[]"),
    ("size_null", "RETURN size(null) AS v", "null"),
    # --- aggregates over no rows / singletons ---
    ("agg_sum_empty", "UNWIND [] AS x RETURN sum(x) AS v", "0"),
    ("agg_avg_empty", "UNWIND [] AS x RETURN avg(x) AS v", "null"),
    ("agg_collect_empty", "UNWIND [] AS x RETURN collect(x) AS v", "[]"),
    ("agg_stdev_single", "UNWIND [5.0] AS x RETURN stDev(x) AS v", "0.0"),
    ("agg_stdevp_single", "UNWIND [5.0] AS x RETURN stDevP(x) AS v", "0.0"),
    ("agg_min_mixed", "UNWIND [1, 'a'] AS x RETURN min(x) AS v",
     "'a' (strings before numbers in agg order? check AnyValues)"),
    ("agg_max_mixed", "UNWIND [1, 'a'] AS x RETURN max(x) AS v", "1?"),
    ("agg_sum_dur",
     "UNWIND [duration('PT1H'), duration('PT30M')] AS d "
     "RETURN sum(d).seconds AS v", "5400 (duration sum)"),
    ("agg_avg_dur",
     "UNWIND [duration('PT1H'), duration('PT2H')] AS d "
     "RETURN avg(d).seconds AS v", "5400 (duration avg)"),
    ("agg_percentile_interp",
     "UNWIND [1.0, 2.0, 3.0, 4.0] AS x "
     "RETURN percentileCont(x, 0.25) AS v", "1.75"),
    # --- null / unwind plumbing ---
    ("unwind_null", "UNWIND null AS x RETURN count(*) AS v", "0 rows -> count 0"),
    ("unwind_scalar", "UNWIND 5 AS x RETURN x AS v", "5 (single row)"),
    ("where_nonbool", "WITH 1 AS x WHERE 1 RETURN x AS v",
     "ERROR non-boolean predicate"),
    # --- regex ---
    ("regex_null", "RETURN 'a' =~ null AS v", "null"),
    ("regex_partial", "RETURN 'abc' =~ 'b' AS v", "false (full match)"),
    # --- temporal parse edges ---
    ("date_week", "RETURN date('2020-W03-2') AS v", "2020-01-14 (ISO week date)"),
    ("date_quarter", "RETURN date('2020-Q2-01') AS v", "2020-04-01"),
    ("date_ordinal", "RETURN date('2020-123') AS v", "2020-05-02 (ordinal day)"),
    ("datetime_week_trunc",
     "RETURN toString(date.truncate('week', date('2020-01-15'))) AS v",
     "'2020-01-13' (Monday)"),
    ("dur_string_neg", "RETURN duration('-PT1H').seconds AS v", "-3600"),
    # --- misc functions ---
    ("sign_zero", "RETURN sign(0) AS v", "0 (long? check)"),
    ("sign_negf", "RETURN sign(-2.5) AS v", "-1"),
    ("abs_int", "RETURN abs(-5) AS v", "5 (stays long)"),
    ("nullif_eq", "RETURN nullIf(1, 1) AS v", "null"),
    ("coalesce_all_null", "RETURN coalesce(null, null) AS v", "null"),
    ("e_fn", "RETURN e() AS v", "2.718..."),
    ("cot_zero", "RETURN cot(0) AS v", "Infinity"),
    ("haversin", "RETURN haversin(0) AS v", "0.0"),
    ("atan2_fn", "RETURN atan2(1, 1) AS v", "0.785..."),
    ("char_str_index", "RETURN 'abc'[0] AS v", "ERROR (no string subscript)"),
]


def main():
    prefixes = sys.argv[1:] or None
    spark = get_spark("probe", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    from neo4j_spark.api import cypher
    from neo4j_spark.graph import PropertyGraph

    g = PropertyGraph(
        {"A": spark.createDataFrame(
            [(1, ["A"], 1)], "id long, labels array<string>, x long")},
        {"R": spark.createDataFrame(
            [], "id long, src long, dst long, type string")})

    for name, q, expected in PROBES:
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        try:
            rows = cypher(spark, q, g).collect()
            got = [tuple(r) for r in rows]
        except Exception as e:
            got = f"ERROR {type(e).__name__}: {str(e).splitlines()[0][:110]}"
        print(f"{name:24s} | want: {expected:55s} | got: {got}")


if __name__ == "__main__":
    main()
