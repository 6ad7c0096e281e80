"""End-to-end Cypher -> DataFrame tests on micro-graphs and the sf0.001
TPC-H graph (test strategy per SURVEY §5: TCK-style literal graphs +
oracle-style checks)."""

import pytest

from neo4j_spark.api import cypher


def rows(df):
    return [tuple(r) for r in df.collect()]


class TestScans:
    def test_all_nodes_count(self, spark, chain_graph):
        df = cypher(spark, "MATCH (n) RETURN count(*) AS n", chain_graph)
        assert rows(df) == [(3,)]

    def test_label_scan(self, spark, chain_graph):
        df = cypher(spark, "MATCH (n:B) RETURN n.x AS x", chain_graph)
        assert rows(df) == [(2,)]

    def test_filter_projection(self, spark, chain_graph):
        df = cypher(spark, "MATCH (n) WHERE n.x > 1 RETURN n.x AS x ORDER BY x",
                    chain_graph)
        assert rows(df) == [(2,), (3,)]


class TestExpand:
    def test_expand_all(self, spark, chain_graph):
        df = cypher(spark,
                    "MATCH (a)-[r:R]->(b) RETURN a.x AS ax, b.x AS bx ORDER BY ax",
                    chain_graph)
        assert rows(df) == [(1, 2), (2, 3)]

    def test_expand_direction_in(self, spark, chain_graph):
        df = cypher(spark, "MATCH (a)<-[:R]-(b) RETURN a.x AS ax, b.x AS bx ORDER BY ax",
                    chain_graph)
        assert rows(df) == [(2, 1), (3, 2)]

    def test_expand_undirected(self, spark, chain_graph):
        df = cypher(spark, "MATCH (a {x: 2})-[:R]-(b) RETURN b.x AS bx ORDER BY bx",
                    chain_graph)
        assert rows(df) == [(1,), (3,)]

    def test_two_hop(self, spark, chain_graph):
        df = cypher(spark,
                    "MATCH (a)-[:R]->()-[:R]->(c) RETURN a.x AS ax, c.x AS cx",
                    chain_graph)
        assert rows(df) == [(1, 3)]

    def test_rel_uniqueness(self, spark, diamond_graph):
        # a->b->a impossible without reusing the rel; self loop a->a->a blocked
        df = cypher(spark,
                    "MATCH (a {name:'a'})-[r1:E]->(a)-[r2:E]->(a) RETURN count(*) AS n",
                    diamond_graph)
        assert rows(df) == [(0,)]

    def test_parallel_edges(self, spark, diamond_graph):
        df = cypher(spark,
                    "MATCH (a {name:'a'})-[:E]->(b {name:'b'}) RETURN count(*) AS n",
                    diamond_graph)
        assert rows(df) == [(2,)]


class TestOptionalMatch:
    def test_optional_null_padding(self, spark, chain_graph):
        df = cypher(
            spark,
            "MATCH (n) OPTIONAL MATCH (n)-[:R]->(m) "
            "RETURN n.x AS nx, m.x AS mx ORDER BY nx",
            chain_graph)
        assert rows(df) == [(1, 2), (2, 3), (3, None)]

    def test_optional_count(self, spark, chain_graph):
        df = cypher(
            spark,
            "MATCH (n) OPTIONAL MATCH (n)-[:R]->(m) RETURN count(m) AS c",
            chain_graph)
        assert rows(df) == [(2,)]


class TestAggregation:
    def test_group_agg(self, spark, diamond_graph):
        df = cypher(
            spark,
            "MATCH (a)-[:E]->(b) RETURN a.name AS name, count(*) AS degree "
            "ORDER BY name", diamond_graph)
        assert rows(df) == [("a", 4), ("b", 1), ("c", 1)]

    def test_collect(self, spark, chain_graph):
        df = cypher(spark,
                    "MATCH (n) RETURN collect(n.x) AS xs", chain_graph)
        assert sorted(rows(df)[0][0]) == [1, 2, 3]

    def test_agg_distinct(self, spark, diamond_graph):
        df = cypher(
            spark,
            "MATCH (a)-[:E]->(b) RETURN count(DISTINCT b.name) AS n",
            diamond_graph)
        assert rows(df) == [(4,)]  # targets: a (self-loop), b, c, d

    def test_avg_min_max(self, spark, chain_graph):
        df = cypher(
            spark,
            "MATCH (n) RETURN avg(n.x) AS a, min(n.x) AS mn, max(n.x) AS mx",
            chain_graph)
        assert rows(df) == [(2.0, 1, 3)]


class TestHorizons:
    def test_with_where(self, spark, chain_graph):
        df = cypher(
            spark,
            "MATCH (n) WITH n.x AS x WHERE x >= 2 RETURN sum(x) AS s",
            chain_graph)
        assert rows(df) == [(5,)]

    def test_unwind(self, spark, chain_graph):
        df = cypher(spark,
                    "UNWIND [1,2,3] AS x RETURN x * 10 AS y ORDER BY y",
                    chain_graph)
        assert rows(df) == [(10,), (20,), (30,)]

    def test_union_all(self, spark, chain_graph):
        df = cypher(
            spark,
            "MATCH (n:A) RETURN n.x AS x UNION ALL MATCH (n:B) RETURN n.x AS x",
            chain_graph)
        assert sorted(rows(df)) == [(1,), (2,)]

    def test_union_distinct(self, spark, chain_graph):
        df = cypher(
            spark,
            "MATCH (n) RETURN 1 AS x UNION MATCH (n) RETURN 1 AS x",
            chain_graph)
        assert rows(df) == [(1,)]

    def test_skip_limit(self, spark, chain_graph):
        df = cypher(spark,
                    "MATCH (n) RETURN n.x AS x ORDER BY x SKIP 1 LIMIT 1",
                    chain_graph)
        assert rows(df) == [(2,)]

    def test_distinct(self, spark, diamond_graph):
        df = cypher(
            spark,
            "MATCH (a)-[:E]->(b) RETURN DISTINCT b.name AS name ORDER BY name",
            diamond_graph)
        assert rows(df) == [("a",), ("b",), ("c",), ("d",)]


class TestPredicates:
    def test_exists_subquery(self, spark, diamond_graph):
        df = cypher(
            spark,
            "MATCH (n) WHERE EXISTS { (n)-[:E]->() } "
            "RETURN n.name AS name ORDER BY name",
            diamond_graph)
        assert rows(df) == [("a",), ("b",), ("c",)]

    def test_not_pattern(self, spark, diamond_graph):
        df = cypher(
            spark,
            "MATCH (n) WHERE NOT (n)-[:E]->() RETURN n.name AS name",
            diamond_graph)
        assert rows(df) == [("d",)]

    def test_count_subquery(self, spark, diamond_graph):
        df = cypher(
            spark,
            "MATCH (n) RETURN n.name AS name, COUNT { (n)-[:E]->() } AS c "
            "ORDER BY name", diamond_graph)
        assert rows(df) == [("a", 4), ("b", 1), ("c", 1), ("d", 0)]

    def test_in_list(self, spark, chain_graph):
        df = cypher(spark,
                    "MATCH (n) WHERE n.x IN [1, 3] RETURN n.x AS x ORDER BY x",
                    chain_graph)
        assert rows(df) == [(1,), (3,)]

    def test_string_predicates(self, spark, diamond_graph):
        df = cypher(
            spark,
            "MATCH (n) WHERE n.name STARTS WITH 'a' OR n.name =~ 'b|c' "
            "RETURN n.name AS name ORDER BY name", diamond_graph)
        assert rows(df) == [("a",), ("b",), ("c",)]


class TestVarLength:
    def test_var_expand_counts(self, spark, diamond_graph):
        # paths a->...->d of length 2: a->b->d (x2 parallel), a->c->d
        df = cypher(
            spark,
            "MATCH (a {name:'a'})-[:E*2..2]->(d {name:'d'}) RETURN count(*) AS n",
            diamond_graph)
        assert rows(df) == [(3,)]

    def test_var_expand_range(self, spark, chain_graph):
        df = cypher(
            spark,
            "MATCH (a:A)-[r:R*1..2]->(b) RETURN size(r) AS hops ORDER BY hops",
            chain_graph)
        assert rows(df) == [(1,), (2,)]

    def test_shortest_path(self, spark, diamond_graph):
        df = cypher(
            spark,
            "MATCH p = shortestPath((a {name:'a'})-[:E*..6]->(d {name:'d'})) "
            "RETURN length(p) AS l", diamond_graph)
        assert rows(df) == [(2,)]

    def test_all_shortest_paths(self, spark, diamond_graph):
        df = cypher(
            spark,
            "MATCH p = allShortestPaths((a {name:'a'})-[:E*..6]->(d {name:'d'})) "
            "RETURN count(*) AS n", diamond_graph)
        assert rows(df) == [(3,)]


class TestExpressions:
    def test_case(self, spark, chain_graph):
        df = cypher(
            spark,
            "MATCH (n) RETURN CASE WHEN n.x > 2 THEN 'big' ELSE 'small' END AS s, "
            "n.x AS x ORDER BY x", chain_graph)
        assert rows(df) == [("small", 1), ("small", 2), ("big", 3)]

    def test_list_ops(self, spark, chain_graph):
        df = cypher(
            spark,
            "RETURN [x IN range(1, 5) WHERE x % 2 = 1 | x * 10] AS l, "
            "head(range(1,3)) AS h, last(range(1,3)) AS t, size(range(1,4)) AS s",
            chain_graph)
        assert rows(df) == [([10, 30, 50], 1, 3, 4)]

    def test_arithmetic(self, spark, chain_graph):
        df = cypher(
            spark,
            "RETURN 7 / 2 AS intdiv, 7.0 / 2 AS fdiv, 7 % 3 AS m, 2 ^ 3 AS p, "
            "'a' + 'b' AS cat, [1,2] + [3] AS lst", chain_graph)
        assert rows(df) == [(3, 3.5, 1, 8.0, "ab", [1, 2, 3])]

    def test_null_semantics(self, spark, chain_graph):
        df = cypher(
            spark,
            "RETURN null = null AS eq, null IS NULL AS isn, "
            "(true AND null) IS NULL AS andn, (false AND null) AS f",
            chain_graph)
        assert rows(df) == [(None, True, True, False)]

    def test_functions(self, spark, chain_graph):
        df = cypher(
            spark,
            "RETURN toUpper('ab') AS u, substring('hello', 1, 3) AS sub, "
            "abs(-3) AS a, round(2.5) AS r, toInteger('42') AS i, "
            "coalesce(null, 5) AS c, split('a,b', ',') AS sp",
            chain_graph)
        assert rows(df) == [("AB", "ell", 3, 3.0, 42, 5, ["a", "b"])]

    def test_labels_id_type(self, spark, chain_graph):
        df = cypher(
            spark,
            "MATCH (a:A)-[r]->(b) RETURN labels(a) AS ls, type(r) AS t, "
            "id(a) AS ia, id(b) AS ib", chain_graph)
        assert rows(df) == [(["A"], "R", 1, 2)]

    def test_pattern_comprehension(self, spark, diamond_graph):
        df = cypher(
            spark,
            "MATCH (a {name:'a'}) RETURN [(a)-[:E]->(b) | b.name] AS ns",
            diamond_graph)
        assert sorted(rows(df)[0][0]) == ["a", "b", "b", "c"]

    def test_quantifiers(self, spark, chain_graph):
        df = cypher(
            spark,
            "RETURN all(x IN [1,2] WHERE x > 0) AS a, "
            "any(x IN [1,2] WHERE x > 1) AS an, "
            "none(x IN [1,2] WHERE x > 5) AS no, "
            "single(x IN [1,2] WHERE x = 1) AS si, "
            "reduce(acc = 0, x IN [1,2,3] | acc + x) AS r",
            chain_graph)
        assert rows(df) == [(True, True, True, True, 6)]


class TestTpchGraph:
    def test_customer_orders(self, spark, tpch_graph):
        df = cypher(
            spark,
            "MATCH (c:Customer)-[:PLACED]->(o:Order) "
            "RETURN count(*) AS n", tpch_graph)
        n = rows(df)[0][0]
        assert n == 1500

    def test_three_hop_revenue(self, spark, tpch_graph):
        df = cypher(
            spark,
            "MATCH (c:Customer)-[:PLACED]->(o:Order)-[l:CONTAINS]->(p:Part) "
            "WHERE c.mktsegment = 'BUILDING' "
            "RETURN count(*) AS lines", tpch_graph)
        assert rows(df)[0][0] > 0

    def test_nation_region(self, spark, tpch_graph):
        df = cypher(
            spark,
            "MATCH (n:Nation)-[:IN_REGION]->(r:Region) "
            "RETURN r.name AS region, count(*) AS nations ORDER BY region",
            tpch_graph)
        out = rows(df)
        assert len(out) == 5
        assert sum(r[1] for r in out) == 25


def test_union_trailing_order_by_applies_to_union(spark, chain_graph):
    df = cypher(spark,
                "RETURN 2 AS x UNION RETURN 1 AS x ORDER BY x", chain_graph)
    assert [r.x for r in df.collect()] == [1, 2]


def test_union_trailing_limit(spark, chain_graph):
    df = cypher(spark,
                "RETURN 2 AS x UNION ALL RETURN 1 AS x ORDER BY x LIMIT 1",
                chain_graph)
    assert [r.x for r in df.collect()] == [1]


def test_unary_minus_binds_looser_than_power(spark, chain_graph):
    df = cypher(spark, "RETURN -2 ^ 2 AS a, 2 ^ -1 AS b, -2 ^ -2 AS c",
                chain_graph)
    assert [tuple(r) for r in df.collect()] == [(-4.0, 0.5, -0.25)]
