"""Probe battery 5: write-operation edge semantics (CreatePipe/MergePipe/
SetOperation/DeletePipe constraint checks), time constructors, aggregate
ordering."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from neo4j_spark.session import get_spark  # noqa: E402


PROBES = [
    # DELETE constraints
    ("delete_connected_raises",
     "MATCH (n:A) DELETE n",
     "ERROR: cannot delete node with relationships (use DETACH)"),
    ("detach_delete_ok",
     "MATCH (n:A) DETACH DELETE n RETURN count(*) AS v", "1 (effect row)"),
    ("delete_null_noop",
     "OPTIONAL MATCH (n:A {x: 99}) DELETE n RETURN count(*) AS v",
     "1 row, no error (DELETE null is a no-op)"),
    # MERGE/CREATE null properties
    ("merge_null_prop_raises",
     "MERGE (n:A {x: null}) RETURN n.x AS v",
     "ERROR: cannot merge with null property value"),
    ("create_null_prop_absent",
     "CREATE (n:Z {a: 1, b: null}) RETURN keys(n) AS v",
     "['a'] (null property not stored)"),
    ("set_null_removes",
     "MATCH (n:A) SET n.x = null RETURN n.x AS v", "null (prop removed)"),
    ("remove_missing_noop",
     "MATCH (n:A) REMOVE n.nope RETURN n.x AS v", "1 (no error)"),
    ("set_plus_eq_merge",
     "MATCH (n:A) SET n += {y: 9} RETURN n.x AS x, n.y AS y", "1, 9"),
    ("set_replace_map",
     "MATCH (n:A) SET n = {z: 5} RETURN n.z AS z, n.x AS x",
     "5, null (= replaces all props)"),
    # CREATE shapes
    ("create_rel_both_dirs_raises",
     "CREATE (a:Z)-[r:T]-(b:Z) RETURN type(r) AS v",
     "ERROR: undirected rel in CREATE"),
    ("create_returns_bound",
     "CREATE (a:Z {k: 1})-[:T]->(b:Z {k: 2}) RETURN a.k AS ak, b.k AS bk",
     "1, 2"),
    # MERGE relationship undirected (allowed in MERGE!)
    ("merge_undirected_rel",
     "MATCH (a:A), (b:B) MERGE (a)-[r:R]-(b) RETURN count(r) AS v",
     "1 (matches the existing a->b rel either direction)"),
    # time constructors
    ("time_map_fields",
     "RETURN toString(localtime({hour: 3, minute: 4, second: 5})) AS v",
     "'03:04:05'"),
    ("time_selector",
     "RETURN toString(localtime({time: localtime('01:02:03')})) AS v",
     "'01:02:03'"),
    ("time_truncate",
     "RETURN toString(localtime.truncate('minute', "
     "localtime('01:02:03'))) AS v", "'01:02'or'01:02:00'"),
    # aggregates / ordering
    ("orderby_count_direct",
     "UNWIND ['a', 'b', 'b'] AS x RETURN x, count(*) AS c "
     "ORDER BY count(*) DESC", "b(2) then a(1)"),
    ("min_duration",
     "UNWIND [duration('PT2H'), duration('PT1H')] AS d "
     "RETURN min(d).seconds AS v", "3600 (min over durations)"),
    ("min_date",
     "UNWIND [date('2020-02-01'), date('2020-01-01')] AS d "
     "RETURN toString(min(d)) AS v", "'2020-01-01'"),
    ("sum_mixed_int_float",
     "UNWIND [1, 2.5] AS x RETURN sum(x) AS v", "3.5 (widen to float)"),
]


def main():
    prefixes = sys.argv[1:] or None
    spark = get_spark("probe5", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    from neo4j_spark.api import cypher
    from neo4j_spark.graph import PropertyGraph

    for name, q, expected in PROBES:
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        nodes = {
            "A": spark.createDataFrame(
                [(1, ["A"], 1)], "id long, labels array<string>, x long"),
            "B": spark.createDataFrame(
                [(2, ["B"], 2)], "id long, labels array<string>, x long"),
        }
        rels = {
            "R": spark.createDataFrame(
                [(10, 1, 2, "R", 1.0)],
                "id long, src long, dst long, type string, w double"),
        }
        g = PropertyGraph(nodes, rels)
        try:
            rows = cypher(spark, q, g).collect()
            got = [tuple(r) for r in rows]
        except Exception as e:
            got = f"ERROR {type(e).__name__}: {str(e).splitlines()[0][:110]}"
        print(f"{name:26s} | want: {expected:58s} | got: {got}")


if __name__ == "__main__":
    main()
