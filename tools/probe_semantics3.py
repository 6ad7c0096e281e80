"""Probe battery 3: graph-pattern semantics — OPTIONAL MATCH, MERGE,
paths, var-length edges, DELETE constraints, pattern comprehension
corners.  Uses the diamond fixture (parallel edges + self-loop)."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from neo4j_spark.session import get_spark  # noqa: E402


# (name, query, expected)
PROBES = [
    # diamond: a(1)->b(2) x2 parallel, a->c(3), b->d(4), c->d, a->a loop
    ("self_loop_match", "MATCH (n:N)-[:E]->(n) RETURN n.name AS v",
     "['a'] (self-loop binds same var)"),
    ("self_loop_varlen",
     "MATCH (n:N {name: 'a'})-[:E*2]->(m) "
     "RETURN m.name AS v ORDER BY v",
     "paths of length exactly 2 w/ rel-uniqueness: a->a->b(x2),a->a->c,"
     "a->b->d(x2),a->c->d, and a->a via loop twice is blocked"),
    ("parallel_edges_count",
     "MATCH (:N {name: 'a'})-[r:E]->(:N {name: 'b'}) RETURN count(r) AS v",
     "2 (parallel rels are distinct)"),
    ("undirected_self_loop",
     "MATCH (n:N {name: 'a'})-[r:E]-(n) RETURN count(r) AS v",
     "1 (self-loop traversed once undirected? reference: once)"),
    ("path_length_zero",
     "MATCH p = (n:N {name: 'a'}) RETURN length(p) AS v", "0"),
    ("varlen_zero_min",
     "MATCH (n:N {name: 'a'})-[:E*0..1]->(m) RETURN m.name AS v ORDER BY v",
     "a (0-len), a (loop), b, b, c"),
    ("optional_match_null_prop",
     "OPTIONAL MATCH (n:N {name: 'zzz'}) RETURN n.name AS v, n IS NULL AS i",
     "null, true"),
    ("optional_chain_null",
     "OPTIONAL MATCH (n:N {name: 'zzz'})-[:E]->(m) RETURN m.name AS v",
     "null row"),
    ("match_after_optional_null",
     "OPTIONAL MATCH (n:N {name: 'zzz'}) WITH n "
     "RETURN labels(n) AS l, id(n) AS i", "null, null"),
    # pattern comprehension / count corners
    ("pattern_comp_on_null",
     "OPTIONAL MATCH (n:N {name: 'zzz'}) "
     "RETURN [(n)-[:E]->(m) | m.name] AS v",
     "[] or null? (reference: [] — comprehension over null src rows?)"),
    ("count_pattern_null",
     "OPTIONAL MATCH (n:N {name: 'zzz'}) "
     "RETURN COUNT { (n)-[:E]->() } AS v", "0"),
    ("exists_pattern_null",
     "OPTIONAL MATCH (n:N {name: 'zzz'}) "
     "RETURN EXISTS { (n)-[:E]->() } AS v", "false"),
    # properties/entity functions on nulls
    ("props_null", "OPTIONAL MATCH (n:N {name: 'zzz'}) "
     "RETURN properties(n) AS v, keys(n) AS k", "null, null"),
    ("type_null", "OPTIONAL MATCH (:N {name: 'zzz'})-[r:E]->() "
     "RETURN type(r) AS v, startNode(r) IS NULL AS s", "null, true"),
    # DISTINCT on nodes
    ("distinct_nodes",
     "MATCH (a:N {name: 'a'})-[:E]->(b:N {name: 'b'}) "
     "RETURN count(DISTINCT b) AS v", "1 (two parallel edges, one node)"),
    # ORDER BY on node property after aggregation
    ("orderby_agg_alias",
     "MATCH (n:N) WITH n.name AS nm, count(*) AS c "
     "RETURN nm ORDER BY c DESC, nm LIMIT 2", "a, b"),
    # shortestPath with self-loop / same endpoints
    ("shortest_same_node",
     "MATCH p = shortestPath((a:N {name: 'a'})-[:E*0..5]-(a)) "
     "RETURN length(p) AS v", "0 (zero-length allowed when min=0)"),
    ("shortest_parallel",
     "MATCH p = shortestPath((a:N {name: 'a'})-[:E*]->(d:N {name: 'd'})) "
     "RETURN length(p) AS v", "2"),
    # relationship uniqueness across pattern PARTS (none in Cypher 5 —
    # uniqueness is per MATCH clause... actually per pattern)
    ("rel_uniqueness_two_rels",
     "MATCH (a:N {name: 'a'})-[r1:E]->(b)-[r2:E]->(c) "
     "WHERE b.name = 'b' AND c.name = 'd' RETURN count(*) AS v",
     "2 (r1 two parallel choices, r2 one)"),
    ("rel_uniqueness_same_pattern",
     "MATCH (a)-[r1:E]->(b), (c)-[r2:E]->(d) WHERE id(r1) = id(r2) "
     "RETURN count(*) AS v",
     "0 (rel uniqueness across comma-parts of ONE MATCH)"),
    # WITH * and RETURN *
    ("return_star",
     "MATCH (n:N {name: 'a'}) RETURN *", "one row, column n (struct)"),
    ("with_star_where",
     "MATCH (n:N) WITH * WHERE n.name = 'b' RETURN n.name AS v", "b"),
    # id()/elementId()
    ("element_id_str",
     "MATCH (n:N {name: 'a'}) RETURN elementId(n) = elementId(n) AS v,"
     " id(n) AS i", "true, 1"),
    # CREATE+RETURN visibility in one query (write then read)
    ("merge_on_match_count",
     "MERGE (n:N {name: 'a'}) ON MATCH SET n.seen = 1 "
     "RETURN n.name AS v, n.seen AS s", "a, 1"),
]


def main():
    prefixes = sys.argv[1:] or None
    spark = get_spark("probe3", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    from neo4j_spark.api import cypher
    from neo4j_spark.graph import PropertyGraph

    for name, q, expected in PROBES:
        if prefixes and not any(name.startswith(p) for p in prefixes):
            continue
        # fresh diamond graph per probe (writes mutate)
        nodes = {
            "N": spark.createDataFrame(
                [(i, ["N"], chr(96 + i)) for i in (1, 2, 3, 4)],
                "id long, labels array<string>, name string"),
        }
        rels = {
            "E": spark.createDataFrame(
                [
                    (100, 1, 2, "E"), (101, 1, 2, "E"), (102, 1, 3, "E"),
                    (103, 2, 4, "E"), (104, 3, 4, "E"), (105, 1, 1, "E"),
                ],
                "id long, src long, dst long, type string"),
        }
        g = PropertyGraph(nodes, rels)
        try:
            rows = cypher(spark, q, g).collect()
            got = [tuple(r) for r in rows]
        except Exception as e:
            got = f"ERROR {type(e).__name__}: {str(e).splitlines()[0][:110]}"
        print(f"{name:26s} | want: {expected:60s} | got: {got}")


if __name__ == "__main__":
    main()
