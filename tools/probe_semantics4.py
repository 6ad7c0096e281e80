"""Probe battery 4: map projections, temporal composition/clocks, WGS84
points, label predicate expressions, shortestPath with path predicates,
case-folding, CASE edges."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from neo4j_spark.session import get_spark  # noqa: E402


PROBES = [
    ("map_proj_star", "MATCH (n:A) RETURN n{.*} AS v",
     "{x: 1} (all properties)"),
    ("map_proj_mixed", "MATCH (n:A) RETURN n{.x, y: 2, sum: n.x + 1} AS v",
     "{x:1, y:2, sum:2}"),
    ("map_proj_missing", "MATCH (n:A) RETURN n{.nope} AS v",
     "{nope: null}"),
    ("label_expr_return", "MATCH (n:A) RETURN n:A AS a, n:B AS b",
     "true, false"),
    ("label_expr_where", "MATCH (n) WHERE n:A RETURN count(*) AS v", "1"),
    ("temporal_compose",
     "RETURN toString(localdatetime({date: date('2020-01-02'), "
     "time: localtime('03:04:05')})) AS v", "'2020-01-02T03:04:05'"),
    ("datetime_from_epoch_map",
     "RETURN datetime({epochSeconds: 86400}).epochSeconds AS v", "86400"),
    ("datetime_from_other",
     "RETURN date({date: datetime('2020-06-01T12:00:00Z')}) = "
     "date('2020-06-01') AS v", "true"),
    ("temporal_clocks",
     "RETURN date.statement() = date() AS a, "
     "date.transaction() IS NOT NULL AS b", "true, true"),
    ("point_latlon",
     "RETURN point({latitude: 52.0, longitude: 4.0}).srid AS srid, "
     "round(point({latitude: 52.0, longitude: 4.0}).latitude) AS lat",
     "4326, 52.0"),
    ("point_distance_wgs",
     "RETURN round(point.distance(point({latitude: 52.0, longitude: 4.0}),"
     " point({latitude: 52.0, longitude: 5.0})) / 1000) AS km",
     "~68 km"),
    ("point_crs_mismatch",
     "RETURN point.distance(point({x: 1, y: 2}), "
     "point({latitude: 52.0, longitude: 4.0})) AS v",
     "null (different CRS)"),
    ("upper_sharp_s", "RETURN toUpper('straße') AS v",
     "'STRASSE' (Java toUpperCase)"),
    ("lower_turkish", "RETURN toLower('İ') AS v", "locale-insensitive"),
    ("case_no_else", "RETURN CASE 5 WHEN 1 THEN 'a' END AS v", "null"),
    ("case_null_subject",
     "RETURN CASE null WHEN null THEN 'hit' ELSE 'miss' END AS v",
     "'miss'? (simple CASE uses equality; null=null is null)"),
    ("properties_of_map", "RETURN properties({a: 1}) AS v",
     "{a: 1} (identity on maps)"),
    ("elementid_rel",
     "MATCH (:A)-[r:R]->() RETURN elementId(r) IS NOT NULL AS v", "true"),
    ("reduce_typed",
     "RETURN reduce(acc = 0, x IN [1, 2, 3] | acc + x) AS v", "6"),
    ("reduce_string_acc",
     "RETURN reduce(s = '', x IN ['a', 'b'] | s + x) AS v", "'ab'"),
    # shortestPath with a relationship predicate (per-path filtering)
    ("shortest_with_rel_pred",
     "MATCH p = shortestPath((a:A)-[:R*..4]->(c:C)) "
     "WHERE all(r IN relationships(p) WHERE r.w > 0) "
     "RETURN length(p) AS v", "2"),
    ("shortest_with_blocking_pred",
     "MATCH p = shortestPath((a:A)-[:R*..4]->(c:C)) "
     "WHERE all(r IN relationships(p) WHERE r.w > 1.5) "
     "RETURN count(*) AS v",
     "0 (first rel has w=1.0; no exhaustive fallback path exists here)"),
    ("nodes_of_path",
     "MATCH p = (a:A)-[:R]->(b:B) RETURN [n IN nodes(p) | n.x] AS v",
     "[1, 2]"),
    ("rels_of_path",
     "MATCH p = (a:A)-[r:R]->(b:B) RETURN relationships(p)[0].w AS v",
     "1.0"),
]


def main():
    prefixes = sys.argv[1:] or None
    spark = get_spark("probe4", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    from neo4j_spark.api import cypher
    from neo4j_spark.graph import PropertyGraph

    nodes = {
        "A": spark.createDataFrame([(1, ["A"], 1)],
                                   "id long, labels array<string>, x long"),
        "B": spark.createDataFrame([(2, ["B"], 2)],
                                   "id long, labels array<string>, x long"),
        "C": spark.createDataFrame([(3, ["C"], 3)],
                                   "id long, labels array<string>, x long"),
    }
    rels = {
        "R": spark.createDataFrame(
            [(10, 1, 2, "R", 1.0), (11, 2, 3, "R", 2.0)],
            "id long, src long, dst long, type string, w double"),
    }
    g = PropertyGraph(nodes, rels)

    for name, q, expected in PROBES:
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        try:
            rows = cypher(spark, q, g).collect()
            got = [tuple(r) for r in rows]
        except Exception as e:
            got = f"ERROR {type(e).__name__}: {str(e).splitlines()[0][:110]}"
        print(f"{name:26s} | want: {expected:55s} | got: {got}")


if __name__ == "__main__":
    main()
