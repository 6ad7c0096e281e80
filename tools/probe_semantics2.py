"""Probe battery 2: literals, temporal accessors/zones, quantifiers,
conversions, string-predicate edges.  Same harness as probe_semantics.py."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from neo4j_spark.session import get_spark  # noqa: E402


PROBES = [
    # --- literals ---
    ("lit_hex", "RETURN 0x1F AS v", "31"),
    ("lit_octal", "RETURN 0o17 AS v", "15"),
    ("lit_exp", "RETURN 1e3 AS v", "1000.0 (double)"),
    ("lit_exp_neg", "RETURN 1e-3 AS v", "0.001"),
    ("lit_float_dot", "RETURN .5 AS v", "0.5"),
    ("lit_unary_plus", "RETURN +5 AS v", "5"),
    ("lit_esc_quote", "RETURN 'a\\'b' AS v", "a'b"),
    ("lit_esc_unicode", "RETURN '\\u00e9' AS v", "é"),
    ("lit_inf_kw", "RETURN Inf AS v, -Inf AS w", "Infinity, -Infinity"),
    ("lit_nan_kw", "RETURN NaN AS v", "NaN"),
    # --- string predicate edges ---
    ("startswith_empty", "RETURN 'abc' STARTS WITH '' AS v", "true"),
    ("startswith_null", "RETURN 'abc' STARTS WITH null AS v", "null"),
    ("startswith_nonstr", "RETURN 'abc' STARTS WITH 1 AS v", "null"),
    ("contains_nonstr", "RETURN 'abc' CONTAINS true AS v", "null"),
    ("num_starts_with", "RETURN 1 STARTS WITH 'a' AS v", "null"),
    # --- split with list of delimiters ---
    ("split_list", "RETURN split('a,b;c', [',', ';']) AS v",
     "['a','b','c']"),
    ("split_null_in_list", "RETURN split('a,b', [',', null]) AS v", "null"),
    ("split_empty_str", "RETURN split('', 'x') AS v", "[''] (len-0 input)"),
    # --- quantifiers with nulls (ternary) ---
    ("all_with_null", "RETURN all(x IN [1, null, 2] WHERE x > 0) AS v",
     "null (undefined element)"),
    ("all_with_false", "RETURN all(x IN [1, null, -2] WHERE x > 0) AS v",
     "false (definite violation wins)"),
    ("any_with_null", "RETURN any(x IN [null, 2] WHERE x > 0) AS v",
     "true (definite hit wins)"),
    ("any_all_null", "RETURN any(x IN [null] WHERE x > 0) AS v", "null"),
    ("none_quant", "RETURN none(x IN [1, 2] WHERE x > 2) AS v", "true"),
    ("none_with_null", "RETURN none(x IN [1, null] WHERE x > 0) AS v",
     "false (1 > 0 definite)"),
    ("single_quant", "RETURN single(x IN [1, 2, 3] WHERE x = 2) AS v",
     "true"),
    ("single_with_null",
     "RETURN single(x IN [1, null] WHERE x > 0) AS v", "null"),
    ("all_empty", "RETURN all(x IN [] WHERE x > 0) AS v", "true"),
    ("any_empty", "RETURN any(x IN [] WHERE x > 0) AS v", "false"),
    # --- conversions (list variants) ---
    ("tostringlist", "RETURN toStringList([1, 2.5, 'a', null]) AS v",
     "['1','2.5','a',null]"),
    ("tointegerlist", "RETURN toIntegerList(['1', 'x', 2.9]) AS v",
     "[1,null,2]"),
    ("tobooleanlist", "RETURN toBooleanList(['true', 'x', false]) AS v",
     "[true,null,false]"),
    ("tofloatlist", "RETURN toFloatList(['1.5', 'x']) AS v", "[1.5,null]"),
    ("tostring_list_err", "RETURN toString([1]) AS v",
     "ERROR? (toString rejects lists in the reference)"),
    # --- temporal accessors ---
    ("date_week_acc",
     "RETURN date('2020-01-14').week AS w, date('2020-01-14').weekYear AS wy,"
     " date('2020-01-14').dayOfWeek AS dw", "3, 2020, 2"),
    ("date_quarter_acc",
     "RETURN date('2020-05-02').quarter AS q, "
     "date('2020-05-02').dayOfQuarter AS dq, "
     "date('2020-05-02').ordinalDay AS od", "2, 32, 123"),
    ("weekyear_boundary",
     "RETURN date('2019-12-30').weekYear AS wy, date('2019-12-30').week AS w",
     "2020, 1 (ISO week-year rollover)"),
    ("datetime_epoch_s",
     "RETURN datetime('1970-01-02T00:00:00Z').epochSeconds AS v", "86400"),
    ("time_offset_acc",
     "RETURN time('12:00:00+01:00').offset AS o", "'+01:00'"),
    ("datetime_bracket_zone",
     "RETURN datetime('2020-06-01T12:00:00+02:00[Europe/Paris]').timezone "
     "AS tz", "'Europe/Paris'"),
    ("datetime_named_zone_acc",
     "RETURN datetime({year: 2020, month: 6, day: 1, hour: 12, "
     "timezone: 'Europe/Paris'}).offset AS o", "'+02:00' (DST)"),
    ("dur_acc_days",
     "RETURN duration('P1Y2M3DT4H5M6S').days AS d, "
     "duration('P1Y2M3DT4H5M6S').months AS m, "
     "duration('P1Y2M3DT4H5M6S').hours AS h", "3, 14, 4"),
    ("dur_acc_minutes",
     "RETURN duration('PT90M').minutes AS m, "
     "duration('PT90M').minutesOfHour AS mh", "90, 30"),
    # --- misc ---
    ("atan2_order", "RETURN atan2(1, 0) AS v", "1.5708 (pi/2; y first)"),
    ("keys_map_null", "RETURN keys({a: 1, b: null}) AS v",
     "['a','b'] or ['a']? (map literal keeps null?)"),
    ("reverse_string", "RETURN reverse('abc') AS v", "'cba'"),
    ("tostring_point",
     "RETURN toString(point({x: 1, y: 2})) AS v",
     "'point({x: 1.0, y: 2.0, crs: ...})'"),
    ("id_type", "MATCH (a:A) RETURN id(a) AS v", "long id"),
    ("percentile_disc_exact",
     "UNWIND [1.0, 2.0, 3.0, 4.0] AS x "
     "RETURN percentileDisc(x, 0.5) AS v", "2.0"),
    ("collect_null_skip",
     "UNWIND [1, null, 2] AS x RETURN collect(x) AS v", "[1,2]"),
    ("count_null_skip",
     "UNWIND [1, null, 2] AS x RETURN count(x) AS c, count(*) AS s",
     "2, 3"),
    ("distinct_nan",
     "UNWIND [0.0/0.0, 0.0/0.0] AS x RETURN count(DISTINCT x) AS v",
     "1 (NaN groups as one for DISTINCT)"),
    ("order_by_null_asc",
     "UNWIND [3, null, 1] AS x RETURN x ORDER BY x", "1,3,null (null last)"),
    ("order_by_null_desc",
     "UNWIND [3, null, 1] AS x RETURN x ORDER BY x DESC",
     "null,3,1 (null first)"),
]


def main():
    prefixes = sys.argv[1:] or None
    spark = get_spark("probe2", cpus=8)
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
