"""Driver contract: entry / queries / oracle_sql.

Each ``queries()`` entry exercises one operator family from SURVEY.md §2 —
most run real Cypher through the neo4j_spark engine over the TPC-H property
graph (FIXTURES.md §2 mapping); the training-data-pipeline extensions
(dedup / similarity / text / streaming) call their DataFrame operators
directly.  ``oracle_sql()`` gives the DuckDB-equivalent ANSI SQL over the
raw parquet tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F

_GRAPH_CACHE: dict = {}


def _graph(spark: SparkSession, sf_dir: str):
    key = (id(spark), sf_dir)
    if key not in _GRAPH_CACHE:
        from neo4j_spark.sources.tpch import tpch_graph

        _GRAPH_CACHE[key] = tpch_graph(spark, sf_dir)
    return _GRAPH_CACHE[key]


from collections import OrderedDict as _OrderedDict

# Bounded LRU (same pattern as ml.similarity._IVF_HANDLES): a long-lived
# driver cycling many sf_dirs/sessions must not grow the plan cache
# without bound.  Entries are lazy DataFrames — dropping one only costs
# a re-translate on the next use.
_PLAN_CACHE: "_OrderedDict" = _OrderedDict()
_PLAN_CACHE_MAX = 512


def _plan_cache_put(key, df):
    _PLAN_CACHE[key] = df
    _PLAN_CACHE.move_to_end(key)
    while len(_PLAN_CACHE) > _PLAN_CACHE_MAX:
        _PLAN_CACHE.popitem(last=False)


def _cy(text: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        from neo4j_spark.api import cypher

        # executable-plan cache (the reference's executableQueryCache,
        # ExecutionEngine.scala:77): repeated runs of the same read query
        # reuse the translated DataFrame — execution still runs fresh.
        # Write queries have side effects at translate time; don't cache.
        # Keyed on applicationId (session-lifetime), not id(spark), so a
        # garbage-collected session can't alias a stopped context; write
        # detection tokenizes on whitespace so "\nSET" is caught too.
        key = (spark.sparkContext.applicationId, sf_dir, text)
        if key in _PLAN_CACHE:
            _PLAN_CACHE.move_to_end(key)
            return _PLAN_CACHE[key]
        df = cypher(spark, text, _graph(spark, sf_dir))
        toks = set(text.upper().replace("{", " { ").split())
        writeish = {"CREATE", "MERGE", "DELETE", "DETACH", "SET",
                    "REMOVE", "FOREACH"}
        call_subquery = "CALL" in toks and "{" in toks
        if not (toks & writeish) and not call_subquery:
            _plan_cache_put(key, df)
        return df

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: 3-hop revenue-by-segment over the property graph."""
    from neo4j_spark.api import cypher

    g = _graph(spark, "/root/testdata/sf0.001")
    return cypher(spark, """
        MATCH (c:Customer)-[:PLACED]->(o:Order)-[l:CONTAINS]->(p:Part)
        WHERE l.shipdate <= datetime('1998-09-02')
        RETURN c.mktsegment AS segment,
               round(sum(l.extendedprice * (1 - l.discount)), 2) AS revenue,
               count(*) AS n_lines
        ORDER BY revenue DESC
    """, g)


# ---------------------------------------------------------------------------
# Cypher texts (operator inventory)
# ---------------------------------------------------------------------------

CYPHER_QUERIES = {
    # --- scans (SURVEY §2.1) ---
    "all_nodes_scan": "MATCH (n) RETURN count(*) AS n",
    "node_by_label_scan": "MATCH (c:Customer) RETURN count(*) AS n",
    "node_by_id_seek":
        "MATCH (c:Customer) WHERE id(c) = 3000000000042 RETURN c.name AS name",
    "node_index_seek_range":
        "MATCH (c:Customer) WHERE c.acctbal >= 1000 AND c.acctbal < 5000 "
        "RETURN count(*) AS n",
    "node_index_contains_scan":
        "MATCH (p:Part) WHERE p.name CONTAINS 'ge' RETURN count(*) AS n",
    "node_index_ends_with_scan":
        "MATCH (p:Part) WHERE p.name ENDS WITH 'bolt' RETURN count(*) AS n",
    "rel_type_scan": "MATCH ()-[l:CONTAINS]->() RETURN count(*) AS n",
    "union_label_scan": "MATCH (n:Customer|Supplier) RETURN count(*) AS n",
    # --- expand / joins (§2.3) ---
    "expand_all":
        "MATCH (n:Nation)-[:IN_REGION]->(r:Region) "
        "RETURN r.name AS region, count(*) AS nations ORDER BY region",
    "expand_in":
        "MATCH (o:Order)<-[:PLACED]-(c:Customer) "
        "WHERE c.mktsegment = 'BUILDING' RETURN count(*) AS n",
    "expand_undirected":
        "MATCH (n:Nation)-[:FROM_NATION]-(x) RETURN count(*) AS n",
    "expand_into_triangle":
        "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)<-[:FROM_NATION]-(s:Supplier) "
        "RETURN count(*) AS n",
    "multi_hop_chain":
        "MATCH (c:Customer)-[:PLACED]->(o:Order)-[l:CONTAINS]->(p:Part) "
        "WHERE c.mktsegment = 'AUTOMOBILE' RETURN count(*) AS n",
    "optional_expand":
        "MATCH (c:Customer) OPTIONAL MATCH (c)-[:PLACED]->(o:Order) "
        "RETURN c.custkey AS custkey, count(o) AS n_orders",
    "value_hash_join":
        "MATCH (c:Customer), (o:Order) WHERE c.custkey = o.orderkey "
        "RETURN count(*) AS n",
    "cartesian_product":
        "MATCH (r:Region), (n:Nation) RETURN count(*) AS n",
    # --- aggregation (§2.4) ---
    "aggregation_q1":
        "MATCH ()-[l:CONTAINS]->() WHERE l.shipdate <= datetime('1998-09-02') "
        "RETURN l.returnflag AS returnflag, l.linestatus AS linestatus, "
        "round(sum(l.quantity), 2) AS sum_qty, "
        "round(sum(l.extendedprice), 2) AS sum_base, "
        "round(avg(l.discount), 6) AS avg_disc, count(*) AS cnt",
    "agg_count_distinct":
        "MATCH (o:Order)-[:SUPPLIED_BY]->(s:Supplier) "
        "RETURN s.suppkey AS suppkey, count(DISTINCT o.orderkey) AS n_orders",
    # TPC-H classics as property-graph queries: multi-hop joins +
    # selective filters + grouped aggregation — the optimizer surface
    # (join order, pushdown, broadcast) a warehouse query exercises
    "q3_shipping_priority":
        "MATCH (c:Customer {mktsegment: 'BUILDING'})-[:PLACED]->"
        "(o:Order)-[l:CONTAINS]->(:Part) "
        "WHERE o.orderdate < datetime('1997-01-01') "
        "AND l.shipdate > datetime('1997-01-01') "
        "RETURN o.orderkey AS okey, "
        "round(sum(l.extendedprice * (1 - l.discount)), 2) AS revenue "
        "ORDER BY revenue DESC, okey LIMIT 10",
    # revenue in exact integer cents (x100 each factor, /10000 once):
    # a float sum's rounding can land on a .005 boundary and hash
    # differently per engine; integer sums are bit-stable everywhere
    "q5_local_supplier_volume":
        "MATCH (r:Region {name: 'ASIA'})<-[:IN_REGION]-(n:Nation)"
        "<-[:FROM_NATION]-(s:Supplier)<-[sb:SUPPLIED_BY]-(o:Order)"
        "-[l:CONTAINS]->(:Part), "
        "(c:Customer)-[:PLACED]->(o), (c)-[:FROM_NATION]->(n) "
        "WHERE sb.linenumber = l.linenumber "
        "AND o.orderdate >= datetime('1996-01-01') "
        "AND o.orderdate < datetime('1997-01-01') "
        "RETURN n.name AS nation, "
        "sum(toInteger(round(l.extendedprice * 100)) * "
        "toInteger(round((1 - l.discount) * 100))) / 10000.0 AS revenue "
        "ORDER BY revenue DESC",
    "q10_returned_items":
        "MATCH (c:Customer)-[:PLACED]->(o:Order)-[l:CONTAINS]->(:Part), "
        "(c)-[:FROM_NATION]->(n:Nation) "
        "WHERE l.returnflag = 'R' "
        "AND o.orderdate >= datetime('1996-01-01') "
        "AND o.orderdate < datetime('1996-04-01') "
        "RETURN c.custkey AS ck, n.name AS nation, "
        "sum(toInteger(round(l.extendedprice * 100)) * "
        "toInteger(round((1 - l.discount) * 100))) / 10000.0 AS revenue "
        "ORDER BY revenue DESC, ck LIMIT 20",
    "agg_stddev":
        "MATCH (o:Order) RETURN o.orderstatus AS status, "
        "round(stDev(o.totalprice), 2) AS sd, "
        "round(stDevP(o.totalprice), 2) AS sdp",
    "agg_percentile":
        "MATCH (o:Order) RETURN o.orderpriority AS priority, "
        "round(percentileCont(o.totalprice, 0.5), 2) AS p50",
    "agg_min_max_avg":
        "MATCH (c:Customer) RETURN c.mktsegment AS segment, "
        "round(min(c.acctbal), 2) AS mn, round(max(c.acctbal), 2) AS mx, "
        "round(avg(c.acctbal), 2) AS av, count(*) AS n",
    # --- sort / top / paging (§2.6) ---
    "top_k":
        "MATCH (c:Customer) RETURN c.custkey AS custkey, c.acctbal AS acctbal "
        "ORDER BY acctbal DESC, custkey LIMIT 10",
    "skip_limit":
        "MATCH (c:Customer) RETURN c.custkey AS custkey "
        "ORDER BY custkey SKIP 100 LIMIT 50",
    "sort_multi_key":
        "MATCH (o:Order) RETURN o.orderkey AS orderkey, o.orderstatus AS st, "
        "o.totalprice AS price ORDER BY st ASC, price DESC, orderkey LIMIT 20",
    # --- set operators (§2.7) ---
    "union_all":
        "MATCH (c:Customer) RETURN c.name AS name "
        "UNION ALL MATCH (s:Supplier) RETURN s.name AS name",
    "union_distinct":
        "MATCH (c:Customer) RETURN c.mktsegment AS v "
        "UNION MATCH (o:Order) RETURN o.orderstatus AS v",
    "distinct_op":
        "MATCH (o:Order) RETURN DISTINCT o.orderpriority AS priority",
    # --- subquery predicates / apply family (§2.5) ---
    "semi_apply":
        "MATCH (c:Customer) WHERE EXISTS { (c)-[:PLACED]->(:Order) } "
        "RETURN count(*) AS n",
    "anti_semi_apply":
        "MATCH (c:Customer) WHERE NOT EXISTS { (c)-[:PLACED]->(:Order) } "
        "RETURN count(*) AS n",
    "count_subquery":
        "MATCH (c:Customer) RETURN c.custkey AS custkey, "
        "COUNT { (c)-[:PLACED]->() } AS n_orders",
    "select_or_semi_apply":
        "MATCH (c:Customer) WHERE c.acctbal < 0 OR (c)-[:PLACED]->(:Order) "
        "RETURN count(*) AS n",
    "select_or_anti_semi_apply":
        "MATCH (c:Customer) "
        "WHERE NOT (c.acctbal < 0 OR (c)-[:PLACED]->(:Order)) "
        "RETURN count(*) AS n",
    # --- count store (§2.1, LP:2748/3466) ---
    "count_store_nodes": "MATCH (s:Supplier) RETURN count(s) AS n",
    "count_store_rels": "MATCH ()-[r:PLACED]->() RETURN count(r) AS n",
    "rollup_pattern_comprehension":
        "MATCH (r:Region) RETURN r.name AS region, "
        "size([(n:Nation)-[:IN_REGION]->(r) | n.name]) AS n_nations "
        "ORDER BY region",
    # path-BOUND pattern comprehension: [p = pattern | proj over p]
    "rollup_path_comprehension":
        "MATCH (n:Nation) WHERE n.nationkey <= 3 "
        "RETURN n.name AS nation, "
        "toString([p = (n)-[:IN_REGION]->(:Region) | length(p)]) AS lens "
        "ORDER BY nation",
    # --- var-length / shortest (§2.3 iterative) ---
    "var_expand_fixed":
        "MATCH (c:Customer)-[*2..2]->(r:Region) RETURN count(*) AS n",
    "var_expand_range":
        "MATCH (c:Customer {custkey: 1})-[*1..2]->(x) RETURN count(*) AS n",
    "shortest_path_op":
        "MATCH (c:Customer) "
        "MATCH p = shortestPath((c)-[*..3]->(r:Region)) "
        "RETURN length(p) AS l, count(*) AS n",
    "all_shortest_paths":
        "MATCH p = allShortestPaths((a:Nation {name: 'NATION_0'})-[*..4]-"
        "(b:Nation {name: 'NATION_5'})) "
        "RETURN length(p) AS len, count(*) AS c",
    "pruning_var_expand":
        "MATCH (r:Region {name: 'EUROPE'})-[*1..2]-(b) "
        "RETURN count(DISTINCT id(b)) AS c",
    # --- GQL path selectors (StatefulShortestPath LP:2290) ---
    "sel_any_shortest":
        "MATCH p = ANY SHORTEST (c:Customer)-[*1..2]->(r:Region) "
        "WHERE c.custkey <= 300 "
        "RETURN c.custkey AS ck, r.name AS rn, size(relationships(p)) AS len",
    "sel_shortest_one":
        "MATCH p = SHORTEST 1 (a:Nation)-[*1..2]-(b:Nation) "
        "WHERE a.nationkey < b.nationkey "
        "RETURN a.name AS an, b.name AS bn, size(relationships(p)) AS len",
    "sel_shortest_groups":
        "MATCH p = SHORTEST 1 GROUPS (a:Nation {name: 'NATION_0'})-[*1..2]-"
        "(b:Nation) RETURN b.name AS bn, size(relationships(p)) AS len",
    "sel_any_k":
        "MATCH p = ANY 2 (o:Order)-[:CONTAINS*1..1]->(pt:Part) "
        "WHERE o.orderkey <= 100 "
        "RETURN o.orderkey AS ok, pt.partkey AS pk, count(*) AS n",
    # NFA StatefulShortestPath (LP:2290, NFA.scala:37): multi-element
    # pattern with an UNBOUNDED quantifier — product-graph BFS, no
    # enumeration cap
    "call_scope_clause":
        "MATCH (n:Nation) CALL (n) { MATCH (n)-[:IN_REGION]->(r) "
        "RETURN r.name AS rn } RETURN rn, count(*) AS c ORDER BY rn",
    "sel_shortest_qpp_multi":
        # transition type sets pairwise disjoint + directed => the NFA
        # product BFS is exactly uniqueness-correct (_nfa_eligible guard)
        "MATCH ANY SHORTEST (a:Customer WHERE a.custkey <= 10)"
        "((x)-[:PLACED|CONTAINS]->(y) "
        "WHERE y.orderkey IS NOT NULL OR y.partkey IS NOT NULL)+"
        "(o:Order)-[:SUPPLIED_BY]->(b:Supplier) "
        "RETURN a.custkey AS ck, b.suppkey AS sk ORDER BY ck, sk",
    "sel_all_shortest_unbounded":
        "MATCH ALL SHORTEST (a:Customer WHERE a.custkey <= 5)"
        "((x)-[:PLACED|CONTAINS]->(y))+(b:Part) "
        "RETURN count(*) AS n",
    # path-propagating NFA (nfa_shortest_tracked, PGPathPropagatingBFS
    # design): nodes(p) / group variables through an UNBOUNDED SHORTEST
    "sel_shortest_path_nodes":
        "MATCH p = ANY SHORTEST (a:Supplier WHERE a.suppkey <= 100)"
        "((x)-[:FROM_NATION|IN_REGION]->(y))+(b:Region) "
        "RETURN a.suppkey AS sk, toString([n IN nodes(p) | n.name]) AS names, "
        "length(p) AS len ORDER BY sk",
    "sel_shortest_group_vars":
        "MATCH ANY SHORTEST (a:Supplier WHERE a.suppkey <= 100)"
        "((x)-[:FROM_NATION|IN_REGION]->(y))+(b:Region) "
        "RETURN a.suppkey AS sk, size(y) AS hops, b.name AS region "
        "ORDER BY sk",
    # SHORTEST 2 over an unbounded quantifier: exact dynamic Trail
    # unroll (per supplier: the 1-hop trail to its nation and the 2-hop
    # trail on to its region)
    "sel_shortest_k_unbounded":
        "MATCH p = SHORTEST 2 (a:Supplier WHERE a.suppkey <= 50)"
        "((x)-[:FROM_NATION|IN_REGION]->(y))+(b) "
        "RETURN a.suppkey AS sk, length(p) AS len ORDER BY sk, len",
    # SHORTEST k>1 with REAL per-pair path multiplicity (several orders
    # of one customer containing the same part): the k-budgeted
    # path-propagating NFA BFS keeps min(k, #paths) per pair
    # (nfa_shortest_tracked, PGPathPropagatingBFS design)
    "sel_shortest_k_multi":
        "MATCH p = SHORTEST 2 (c:Customer WHERE c.custkey <= 50)"
        "((x)-[:PLACED|CONTAINS]->(y))+(b:Part) "
        "RETURN c.custkey AS ck, b.partkey AS pk, count(*) AS n "
        "ORDER BY ck, pk",
    # SHORTEST k GROUPS over an unbounded quantifier: every walk sits in
    # the (single) shortest length-group per pair, so the result is the
    # full orders x lineitem multiplicity
    "sel_groups_k_unbounded":
        "MATCH p = SHORTEST 2 GROUPS (c:Customer WHERE c.custkey <= 20)"
        "((x)-[:PLACED|CONTAINS]->(y))+(b:Part) "
        "RETURN c.custkey AS ck, b.partkey AS pk, count(*) AS n "
        "ORDER BY ck, pk",
    # --- expressions / functions (§2.8) ---
    "projection_functions":
        "MATCH (c:Customer) RETURN c.custkey AS custkey, "
        "toUpper(c.name) AS uname, substring(c.name, 0, 5) AS prefix, "
        "round(c.acctbal * 1.1, 4) AS scaled ORDER BY custkey LIMIT 20",
    "case_expression":
        "MATCH (o:Order) RETURN o.orderkey AS orderkey, "
        "CASE o.orderstatus WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open' "
        "ELSE 'other' END AS status ORDER BY orderkey LIMIT 100",
    "temporal_year":
        "MATCH (o:Order) RETURN o.orderdate.year AS y, count(*) AS n",
    "temporal_filter":
        "MATCH (o:Order) WHERE o.orderdate >= datetime('1995-01-01') "
        "AND o.orderdate < datetime('1996-01-01') RETURN count(*) AS n",
    "unwind_op":
        "UNWIND [1, 2, 3, 4, 5] AS x RETURN x, x * x AS sq",
    "list_ops":
        "RETURN toString([x IN range(1, 10) WHERE x % 2 = 0 | x * x]) AS l",
    # heterogeneous lists + CIP global orderability (AnyValues.java:69,
    # ValueGroup.java:32): STRING < BOOLEAN < NUMBER < null; LIMIT after
    # the mixed ORDER BY makes the global order hash-observable
    "mixed_list_order":
        "UNWIND [3, 1.5, 'b', 'a', true, false, null, 2, 'c', -1.0] AS x "
        "WITH x ORDER BY x LIMIT 4 "
        "RETURN coalesce(toString(x), '<null>') AS s",
    "mixed_list_order_desc":
        "UNWIND [3, 1.5, 'b', 'a', true, false, null, 2, 'c', -1.0] AS x "
        "WITH x ORDER BY x DESC LIMIT 4 "
        "RETURN coalesce(toString(x), '<null>') AS s",
    # named IANA time zones (DateTimeValue ZoneId handling): the zone id
    # rides alongside the instant; accessors/truncate act in the zone
    "temporal_named_zone":
        "WITH datetime({year: 2024, month: 3, day: 31, hour: 1, "
        "minute: 30, timezone: 'Europe/Paris'}) AS dt "
        "RETURN dt.timezone AS tz, dt.epochMillis AS ms, dt.hour AS h, "
        "dt.offset AS off, toString(dt) AS s, "
        "datetime.truncate('day', dt).epochMillis AS day_ms",
    # zoned datetime ± duration: months/days shift the wall clock in the
    # value's zone (DST-aware), seconds add exactly (DurationValue.addTo)
    "temporal_zoned_arith":
        "WITH datetime({year: 2024, month: 3, day: 30, hour: 12, "
        "timezone: 'Europe/Paris'}) AS dt "
        "RETURN (dt + duration('P1D')).epochMillis AS day_ms, "
        "(dt + duration('P1D')).hour AS day_h, "
        "(dt + duration('PT24H')).hour AS sec_h, "
        "(dt - duration('P1M')).epochMillis AS back_ms, "
        "toString(dt + duration('P1D')) AS s",
    # container groups in the tagged encoding (anyvalue.py round 3:
    # MAP(1) < LIST(4) < POINT(6) < scalars; lists element-wise)
    # PATH's dedicated slot in the global order (ValueGroup.java:32:
    # MAP < NODE < RELATIONSHIP < LIST < PATH < POINT < ... < NULL;
    # AnyValues.java:69-72), plus path-to-path order inside a mixed key
    # (PathValue.unsafeCompareTo: first node, rel ids, rel count)
    "mixed_path_order":
        "MATCH p = (n:Nation {name: 'NATION_0'})-[r:IN_REGION]->(:Region) "
        "WITH p, n, r LIMIT 1 "
        "UNWIND [p, 'a', n, [1], 3.5, r, {k: 1}, "
        "point({x: 1, y: 2}), true, null] AS v "
        "WITH v ORDER BY v "
        "RETURN toString(collect(coalesce(valueType(v), 'NULL'))) AS ord",
    # extended simple CASE (CypherParser.g4 extendedWhen: comma lists,
    # comparison/predicate operands)
    "case_extended":
        "MATCH (o:Order) RETURN CASE o.orderpriority "
        "WHEN '1-URGENT', '2-HIGH' THEN 'hot' "
        "WHEN STARTS WITH '3' THEN 'mid' "
        "ELSE 'cold' END AS bucket, count(*) AS n "
        "ORDER BY bucket",
    # strict concatenation (ConcatenationAcceptance: || never coerces)
    "concat_ops":
        "MATCH (c:Customer) WHERE c.custkey <= 10 "
        "RETURN c.custkey AS k, c.name || '-' || c.mktsegment AS tag, "
        "size([c.custkey] || [c.custkey + 1]) AS n ORDER BY k",
    "mixed_container_order":
        "UNWIND [[1, 2], 'a', {k: 1}, [1], 7, [1, 'x'], null, true] AS x "
        "WITH x ORDER BY x LIMIT 5 "
        "RETURN coalesce(toString(x), '<null>') AS s",
    "mixed_list_nested":
        "WITH [[1], 'a'] AS l "
        "RETURN toString(l[0]) AS first, toString(l[1]) AS second, "
        "size(l) AS n, l[0] IS :: LIST AS isl, l[0] = [1] AS eq",
    "mixed_cmp_predicates":
        "RETURN 1 < 'a' AS a, 1 = 'a' AS b, 2 IN [1, 'a', 2] AS c, "
        "3 IN [1, 'a', null] AS d, toString([1, 'a', true][2]) AS e, "
        "valueType([1, 'a'][0]) AS vt",
    # arbitrary-depth container mixing (layout recursed to the static
    # schema's nesting, anyvalue.py container_depth)
    "mixed_deep_nesting":
        "UNWIND [[[2]], [[1]], 'z', [[1], 0]] AS v "
        "WITH v ORDER BY v "
        "RETURN toString(collect(toString(v))) AS ordered, "
        "toString([[[1], 'a'], 'b']) AS deep3, "
        "[[1, null], 'a'] = [[1, null], 'a'] AS eq_n, "
        "[[1, 2], 'a'] = [[1, 3], 'a'] AS neq, "
        "[[1]] IN [[[1]], 'x'] AS inn",
    # reference-exact edge semantics (round-4 probe sweep):
    # CypherMath.java arithmetic, Value.java NaN rules, DateValue/
    # DurationValue parse forms, CypherFunctions coercions
    "edge_arithmetic":
        "RETURN 9007199254740993 / 3 AS exact_div, -3 / 2 AS trunc_div, "
        "-3 % 2 AS mod_sign, 1.0 % 0.0 AS nan_mod, cot(0) AS cot0, "
        "2 ^ 3 AS pow_v",
    "edge_nan_semantics":
        "RETURN 0.0/0.0 = 0.0/0.0 AS eq, 0.0/0.0 <> 0.0/0.0 AS ne, "
        "(0.0/0.0) < 1.0 AS lt, 0.0/0.0 = 1.0 AS eqn, NaN > Inf AS gi",
    "edge_coercions":
        "WITH toIntegerList(['1', 'x', 2.9]) AS lst "
        "RETURN toInteger('42.7') AS a, toInteger(true) AS b, "
        "toInteger(-3.9) AS c, toIntegerOrNull('1e20') AS d, "
        "toInteger(0.0/0.0) AS e, lst[0] AS l0, lst[1] AS l1, lst[2] AS l2",
    "edge_list_plus":
        "RETURN toString(([1] + 2)[1]) AS a, ([1] + 2.5)[0] AS b, "
        "[1] + 'a' AS hetero, 'a' + [1] AS hetero2",
    "edge_iso_dates":
        "RETURN toString(date('2020-W03-2')) AS w, "
        "toString(date('2020-Q2-01')) AS q, toString(date('2020-123')) AS o, "
        "toString(date('2020-02')) AS ym, date('2020-01-14').week AS wk",
    "edge_duration_parse":
        "RETURN duration('-PT1H').seconds AS a, duration('P1.5D').hours "
        "AS b, duration('P0001-02-03T04:05:06').months AS m, "
        "duration('-P1DT30M').seconds AS s",
    "edge_string_preds":
        "RETURN 'abc' STARTS WITH 1 AS a, split('a,b;c', [',', ';'])[1] "
        "AS b, single(x IN [1, null] WHERE x > 0) AS c, "
        "substring('hello', 1, 2) AS d",
    "edge_unwind_scalar":
        "UNWIND 5 AS x RETURN x AS v",
    # dynamic labels/types (Cypher25Parser.g4 dynamicLabelType):
    # $(expr) with plan-time-constant args resolves before planning, so
    # label-shard pruning and the count store still apply
    "dyn_label_match":
        "MATCH (n:$('Nation'))-[:$(['IN_REGION'])]->(r:$('Region')) "
        "RETURN r.name AS rn, count(*) AS c ORDER BY rn",
    "labels_function":
        "MATCH (n:Nation) RETURN labels(n)[0] AS label, count(*) AS n",
    "keys_function":
        "MATCH (r:Region) RETURN r.name AS name, size(keys(r)) AS n_keys "
        "ORDER BY name",
    "string_functions":
        "MATCH (s:Supplier) RETURN s.suppkey AS suppkey, "
        "toLower(s.name) AS lname, reverse(s.name) AS rname, "
        "size(s.name) AS len ORDER BY suppkey",
    "call_db_labels": "CALL db.labels() YIELD label RETURN label",
    # --- scans (§2.1, widened) ---
    "rel_by_id_seek":
        "MATCH ()-[l:CONTAINS]->() WHERE id(l) = 15000000000001 "
        "RETURN l.quantity AS q",
    "all_rels_scan": "MATCH ()-[r]->() RETURN count(*) AS n",
    "intersection_label_scan":
        "MATCH (n:Customer:Customer) RETURN count(*) AS n",
    "subtraction_label_scan":
        "MATCH (n:Customer&!Supplier) RETURN count(*) AS n",
    "wildcard_label_scan": "MATCH (n:%) RETURN count(*) AS n",
    "neg_rel_type_scan":
        "MATCH ()-[r:!IN_REGION&!CONTAINS]->() "
        "RETURN type(r) AS t, count(*) AS c ORDER BY t",
    "project_endpoints":
        "MATCH ()-[r:IN_REGION]->() WITH r "
        "MATCH (a)-[r]->(b) "
        "RETURN a.name AS nation, b.name AS region ORDER BY nation",
    "temporal_truncate":
        "MATCH (o:Order) "
        "RETURN date.truncate('month', o.orderdate) AS m, count(*) AS c "
        "ORDER BY m LIMIT 5",
    "is_typed_predicate":
        "MATCH (o:Order) RETURN o.totalprice IS :: FLOAT AS isf, "
        "o.orderkey IS :: INTEGER AS isi, "
        "o.orderdate IS NOT :: STRING AS notstr, count(*) AS c",
    "in_ternary_null":
        "RETURN null IN [1,2] AS a, 1 IN [1,null] AS b, 3 IN [1,null] AS c, "
        "null IN [] AS d, 2 IN [1,2] AS e",
    "case_when_null":
        "RETURN CASE WHEN null THEN 1 ELSE 2 END AS v, "
        "CASE 1 WHEN 2 THEN 'a' ELSE 'b' END AS w",
    "isempty_fn":
        "MATCH (d:Document) WHERE NOT isEmpty(d.text) "
        "RETURN count(*) AS c",
    "normalize_unicode":
        "RETURN normalize('A\\u030A', NFC) AS v",
    # --- joins / apply (§2.3, §2.5, widened) ---
    "triadic_selection":
        "MATCH (c1:Customer)-[:FROM_NATION]->(n:Nation)"
        "<-[:FROM_NATION]-(c2:Customer) "
        "WHERE c1.custkey < c2.custkey AND c2.acctbal > 9000 "
        "AND NOT EXISTS { (c1)-[:PLACED]->()<-[:PLACED]-(c2) } "
        "RETURN count(*) AS n",
    "optional_match_where":
        "MATCH (c:Customer) OPTIONAL MATCH (c)-[:PLACED]->(o:Order) "
        "WHERE o.totalprice > 100000 "
        "RETURN c.custkey AS ck, count(o) AS n",
    "call_subquery":
        "MATCH (r:Region) CALL { MATCH (n:Nation) RETURN count(*) AS nn } "
        "RETURN r.name AS name, nn ORDER BY name",
    "call_sub_order_limit":
        "MATCH (r:Region) CALL { WITH r "
        "MATCH (n:Nation)-[:IN_REGION]->(r) "
        "RETURN n.name AS top_n ORDER BY n.nationkey DESC LIMIT 1 } "
        "RETURN r.name AS rn, top_n ORDER BY rn",
    "optional_call_subquery":
        "MATCH (r:Region) OPTIONAL CALL { WITH r "
        "MATCH (n:Nation {name: 'NOPE'})-[:IN_REGION]->(r) "
        "RETURN n.name AS nn } "
        "RETURN count(*) AS n, count(nn) AS hits",
    "call_subquery_correlated":
        "MATCH (r:Region) CALL { WITH r "
        "MATCH (n:Nation)-[:IN_REGION]->(r) RETURN count(*) AS nn } "
        "RETURN r.name AS name, nn ORDER BY name",
    "load_csv":
        "LOAD CSV WITH HEADERS FROM "
        "'file:///root/repo/tests/fixtures/people.csv' AS row "
        "RETURN row.name AS name, toInteger(row.age) AS age ORDER BY name",
    "load_csv_linenumber":
        "LOAD CSV WITH HEADERS FROM "
        "'file:///root/repo/tests/fixtures/people.csv' AS row "
        "RETURN linenumber() AS ln, row.name AS name ORDER BY ln",
    "call_schema_viz":
        "CALL db.schema.visualization() YIELD nodes, relationships "
        "RETURN toString(nodes) AS nodes, toString(relationships) AS relationships",
    "call_dbms_components":
        "CALL dbms.components() YIELD name, edition RETURN name, edition",
    "duration_functions":
        "MATCH (o:Order) WHERE o.orderkey <= 20 "
        "RETURN o.orderkey AS ok, (o.orderdate + duration('P1M')).month AS m2, "
        "duration('P1Y2M').months AS dm, duration({days: 2, hours: 36}).days "
        "AS dd",
    "trim_variants":
        "RETURN trim('  x  ') AS t1, trim(BOTH 'x' FROM 'xxabxx') AS t2, "
        "trim(LEADING 'x' FROM 'xxab') AS t3, "
        "trim(TRAILING 'x' FROM 'abxx') AS t4",
    "collect_subquery":
        "MATCH (r:Region) RETURN r.name AS rn, "
        "toString(COLLECT { MATCH (n:Nation)-[:IN_REGION]->(r) "
        "RETURN n.name ORDER BY n.name }) AS ns ORDER BY rn",
    "call_in_transactions":
        "MATCH (r:Region) CALL { WITH r "
        "MATCH (n:Nation)-[:IN_REGION]->(r) RETURN count(*) AS cnt } "
        "IN TRANSACTIONS OF 2 ROWS REPORT STATUS AS s "
        "RETURN r.name AS rn, cnt, s.committed AS committed",
    "map_projection":
        "MATCH (c:Customer) WHERE c.custkey <= 50 "
        "RETURN c.custkey AS ck, "
        "c{.name, scaled: round(c.acctbal * 2, 2)}.scaled AS scaled2, "
        "toString(keys(c{.name, .mktsegment})) AS ks",
    # --- horizons (§2.4/§2.6, widened) ---
    "with_pipeline":
        "MATCH (c:Customer)-[:PLACED]->(o:Order) "
        "WITH c, count(o) AS n_orders WHERE n_orders > 5 "
        "RETURN count(*) AS n",
    "with_orderby_limit":
        "MATCH (o:Order) WITH o ORDER BY o.totalprice DESC LIMIT 5 "
        "RETURN round(sum(o.totalprice), 2) AS s",
    "skip_no_limit":
        "MATCH (n:Nation) RETURN n.name AS name ORDER BY name SKIP 20",
    "percentile_disc":
        "MATCH (o:Order) RETURN percentileDisc(o.totalprice, 0.5) AS p",
    "collect_agg":
        "MATCH (n:Nation)-[:IN_REGION]->(r:Region) "
        "RETURN r.name AS region, size(collect(n.name)) AS n ORDER BY region",
    # --- QPP / trail (§2.3 Trail LP:3977) ---
    "qpp_fixed":
        "MATCH (c:Customer) ((x)-[:FROM_NATION|IN_REGION]->(y)){2,2} "
        "(r:Region) RETURN count(*) AS n",
    "qpp_range":
        "MATCH (c:Customer {custkey: 1}) ((x)-[e]->(y)){1,2} (z) "
        "RETURN count(*) AS n",
    "qpp_group_rels":
        "MATCH ((a:Nation)-[r:IN_REGION]->(b:Region)){1,1} "
        "RETURN size(r) AS nr, count(*) AS n",
    "label_expr_nested":
        "MATCH (n:(Customer|Supplier)&!Part) RETURN count(*) AS n",
    "label_expr_negated_group":
        "MATCH (n:Nation|Region) WHERE n:!(Customer|Part) "
        "RETURN count(*) AS n",
    "shortest_path_expr_unbound":
        "MATCH (n:Nation) WHERE n.nationkey < 5 "
        "RETURN n.nationkey AS k, "
        "length(shortestPath((n)-[:IN_REGION*..2]->(r:Region))) AS l "
        "ORDER BY k",
    "qpp_nested_var":
        "MATCH (c:Customer WHERE c.custkey <= 10)"
        "((x)-[:FROM_NATION|IN_REGION*1..2]->(y)){1,2}(r:Region) "
        "RETURN c.custkey AS ck, count(*) AS n_paths ORDER BY ck",
    "qpp_star":
        "MATCH (n:Nation) (()-[:IN_REGION]->())* (x) RETURN count(*) AS n",
    "qpp_question":
        "MATCH (r:Region) (()<-[:IN_REGION]-())? (x) RETURN count(*) AS n",
    "qpp_node_where":
        "MATCH ((a:Nation WHERE a.nationkey < 5)-[:IN_REGION]->(b)){1,1} "
        "RETURN count(*) AS n",
    "shortest_path_expr":
        # shortestPath() as a VALUE (NestedPlanExpression): null-padded
        # per input row, unlike the row-filtering MATCH form
        "MATCH (s:Supplier {suppkey: 1}), (r:Region) "
        "RETURN r.name AS name, "
        "length(shortestPath((s)-[*]->(r))) AS l ORDER BY name",
    "qpp_rel_shorthand":
        # GQL quantified-relationship sugar -[:T]->+ (desugars to Trail)
        "MATCH (n:Nation)-[:IN_REGION]->+(x) RETURN count(*) AS n",
    "qpp_multi_rel_unit":
        # unit with TWO relationship positions + path projection: the
        # path's rel sequence interleaves the per-position group arrays
        # (round-6 fix — concatenation reordered the path)
        "MATCH p = (c:Customer WHERE c.custkey <= 5)"
        "((x)-[:FROM_NATION]->(y)-[:IN_REGION]->(z)){1}(r:Region) "
        "RETURN c.custkey AS ck, [q IN nodes(p) | "
        "coalesce(q.custkey, q.nationkey, q.regionkey)] AS seq ORDER BY ck",
    "qpp_where_suffix_ref":
        # per-repetition WHERE referencing a singleton bound RIGHT of the
        # QPP (GQL: the predicate holds once the whole pattern binds) —
        # deferred as all() over the group arrays
        "MATCH (c:Customer WHERE c.custkey <= 20)"
        "((a)-[:FROM_NATION]->(b) WHERE a.custkey <= r.regionkey * 5)+"
        "(n)-[:IN_REGION]->(r:Region) RETURN count(*) AS n",
    "sel_pattern_where":
        # parenthesised pattern-level WHERE applies BEFORE the selector
        "MATCH SHORTEST 1 ((n:Nation)-[e:IN_REGION]->+(r:Region) "
        "WHERE n.nationkey < 3) RETURN count(*) AS n",
    "sel_paren_path_var":
        # parenthesised path-variable declaration under a selector
        "MATCH ANY SHORTEST (p = (n:Nation {nationkey: 0})"
        "-[:IN_REGION]->+(r:Region)) "
        "RETURN [q IN nodes(p) | coalesce(q.nationkey, q.regionkey + 100)]"
        " AS seq",
    "collect_union_subquery":
        # COLLECT {} over a UNION body (distinct union dedupes across
        # branches)
        "RETURN size(COLLECT { MATCH (r:Region) RETURN r.name AS v "
        "UNION MATCH (n:Nation WHERE n.nationkey < 2) RETURN n.name AS v })"
        " AS n",
    "qpp_path_length":
        # named path whose only var-length content is a QPP segment
        "MATCH p = (s:Supplier)-[:FROM_NATION]->+(x) "
        "RETURN length(p) AS l, count(*) AS n",
    "label_expr_where":
        # label disjunction in predicate position (WHERE n:A|B)
        "MATCH (n) WHERE n:Region|Nation RETURN count(*) AS n",
    "dynamic_prop_key":
        # dynamic property access n[k] with a non-literal key
        "WITH 'name' AS k MATCH (r:Region) RETURN r[k] AS name "
        "ORDER BY name",
    "skip_limit_exprs":
        # SKIP/LIMIT as constant arithmetic expressions
        "MATCH (n:Nation) RETURN n.name AS name ORDER BY name "
        "SKIP 2 * 2 LIMIT 10 / 2",
    "exists_union_subquery":
        "MATCH (r:Region) WHERE EXISTS { "
        "MATCH (n:Nation)-[:IN_REGION]->(r) RETURN n "
        "UNION MATCH (x:Region {name: 'NOPE'}) RETURN x AS n } "
        "RETURN count(*) AS n",
    # --- expressions / functions (§2.8, widened) ---
    "quantifiers":
        "RETURN all(x IN [2, 4, 6] WHERE x % 2 = 0) AS a, "
        "any(x IN [1, 3] WHERE x > 2) AS b, "
        "none(x IN [1] WHERE x > 5) AS c, "
        "single(x IN [1, 2, 3] WHERE x = 2) AS d",
    "reduce_expr":
        "RETURN reduce(acc = 0, x IN range(1, 10) | acc + x) AS s",
    "head_last_tail":
        "RETURN head([1, 2, 3]) AS h, last([1, 2, 3]) AS l, "
        "size(tail([1, 2, 3])) AS t",
    "coalesce_fn":
        "MATCH (c:Customer) RETURN coalesce(c.missing, c.mktsegment) AS v, "
        "count(*) AS n",
    "case_searched":
        "MATCH (o:Order) RETURN CASE WHEN o.totalprice > 200000 THEN 'big' "
        "WHEN o.totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket, "
        "count(*) AS n",
    "string_plus_concat":
        "MATCH (r:Region) RETURN r.name + '_x' AS v ORDER BY v",
    "list_membership":
        "MATCH (o:Order) WHERE o.orderpriority IN ['1-URGENT', '2-HIGH'] "
        "RETURN count(*) AS n",
    "regex_full_match":
        "MATCH (p:Part) WHERE p.name =~ '.*widget' RETURN count(*) AS n",
    "xor_predicate":
        "MATCH (c:Customer) WHERE c.acctbal > 5000 XOR "
        "c.mktsegment = 'BUILDING' RETURN count(*) AS n",
    "vector_similarity_fn":
        "RETURN round(vector.similarity.cosine([1.0, 2.0, 3.0], "
        "[3.0, 2.0, 1.0]), 6) AS s",
    "vector_euclidean_fn":
        "RETURN round(vector.similarity.euclidean([1.0, 2.0], [1.0, 2.0]), 6)"
        " AS a, round(vector.similarity.euclidean([0.0, 0.0], [3.0, 4.0]), 6)"
        " AS b",
    "point_distance_fn":
        "RETURN point.distance(point({x: 0.0, y: 0.0}), "
        "point({x: 3.0, y: 4.0})) AS d",
    "point_withinbbox":
        "MATCH (c:Customer) "
        "WITH c, point({x: c.acctbal, y: toFloat(c.custkey % 100)}) AS p "
        "WHERE point.withinBBox(p, point({x: 0.0, y: 0.0}), "
        "point({x: 5000.0, y: 50.0})) RETURN count(*) AS n",
    "conversion_functions":
        "RETURN toInteger('42') AS i, toFloat('4.5') AS f, "
        "toBoolean('true') AS b, toString(7) AS s, toIntegerOrNull('x') AS x",
    "valuetype_fn":
        "RETURN valueType(1) AS i, valueType('x') AS s, valueType(1.5) AS f, "
        "valueType(true) AS b, valueType(null) AS n, valueType([1, 2]) AS l",
    "get_degree":
        "MATCH (n:Nation) RETURN n.name AS name, COUNT { (n)--() } AS deg "
        "ORDER BY name",
    "exists_subquery":
        "MATCH (s:Supplier) "
        "WHERE EXISTS { MATCH (s)<-[:SUPPLIED_BY]-(:Order) } "
        "RETURN count(*) AS n",
    "exists_where_correlated":
        # correlation only via the inner WHERE (no shared pattern var)
        "MATCH (s:Supplier) "
        "WHERE EXISTS { MATCH (c:Customer) "
        "WHERE c.acctbal > s.acctbal + 2000.0 } "
        "RETURN count(*) AS n",
    "count_sub_where_correlated":
        "MATCH (r:Region) RETURN r.name AS name, "
        "COUNT { MATCH (n:Nation) WHERE n.name > r.name } AS c "
        "ORDER BY name",
    # --- set ops / unwind (§2.7, widened) ---
    "union_three_way":
        "MATCH (r:Region) RETURN r.name AS name "
        "UNION MATCH (n:Nation) RETURN n.name AS name "
        "UNION MATCH (s:Supplier) RETURN s.name AS name",
    "unwind_cross":
        "UNWIND [1, 2, 3] AS x UNWIND ['a', 'b'] AS y RETURN x, y",
    # --- procedures (§2.11, widened) ---
    "call_db_rel_types":
        "CALL db.relationshipTypes() YIELD relationshipType "
        "RETURN relationshipType",
    "call_db_property_keys":
        "CALL db.propertyKeys() YIELD propertyKey RETURN propertyKey",
    "call_fulltext_query":
        "CALL db.index.fulltext.queryNodes('name', 'widget') "
        "YIELD node, score RETURN count(*) AS n",
    "call_fulltext_rels":
        "CALL db.index.fulltext.queryRelationships('returnflag', 'R') "
        "YIELD relationship, score RETURN count(*) AS n",
    # Lucene query syntax (FulltextProcedures.java:120 -> Lucene parser):
    # quoted phrases (consecutive-token match) and boolean operators
    "call_fulltext_phrase":
        "CALL db.index.fulltext.queryNodes('name', '\"red widget\"') "
        "YIELD node, score RETURN count(*) AS n",
    "call_fulltext_boolean":
        "CALL db.index.fulltext.queryNodes('name', "
        "'(red OR blue) AND widget') "
        "YIELD node, score RETURN count(*) AS n",
    # Lucene wildcard terms (MultiTermQuery, constant-score rewrite)
    "call_fulltext_wildcard":
        "CALL db.index.fulltext.queryNodes('name', 'wid* OR gi?mo') "
        "YIELD node, score RETURN count(*) AS n",
    # Lucene term range [lo TO hi} — tokens in ['w', 'x')
    "call_fulltext_range":
        "CALL db.index.fulltext.queryNodes('name', '[w TO x}') "
        "YIELD node, score RETURN count(*) AS n",
    "call_list_config":
        "CALL dbms.listConfig() YIELD name, value "
        "WHERE name = 'spark.sql.adaptive.enabled' "
        "RETURN value AS v",
    # --- graph algorithms (graph-algo parity) ---
    "algo_connected_components":
        "CALL algo.connectedComponents() YIELD node, comp "
        "RETURN count(DISTINCT comp) AS n_components",
    "algo_pagerank":
        "CALL algo.pageRank(5, 0.85) YIELD node, rank "
        "RETURN count(*) AS n, round(sum(rank), 3) AS s",
    "algo_sssp":
        "CALL algo.shortestPathLengths(3000000000001) YIELD node, dist "
        "RETURN dist, count(*) AS n ORDER BY dist",
    "algo_apsp":
        "CALL algo.allPairsShortest(['FROM_NATION', 'IN_REGION']) "
        "YIELD src, dst, dist RETURN dist, count(*) AS n ORDER BY dist",
    "algo_astar":
        "MATCH (c:Customer {custkey: 1})-[:FROM_NATION]->()"
        "-[:IN_REGION]->(r:Region) WITH id(c) AS cid, id(r) AS rid "
        "CALL algo.astar(cid, rid) YIELD dist RETURN dist",
    "algo_degree_centrality":
        "CALL algo.degreeCentrality() YIELD node, degree "
        "RETURN count(*) AS n, sum(degree) AS s",
    "algo_triangle_count":
        "CALL algo.triangleCount() YIELD node, triangles "
        "RETURN count(*) AS n",
    "algo_node_similarity":
        "CALL algo.nodeSimilarity('CONTAINS') "
        "YIELD a, b, intersection, similarity "
        "RETURN count(*) AS n, sum(intersection) AS s, "
        "sum(CASE WHEN similarity >= 0.3 THEN 1 ELSE 0 END) AS n_sim",
    "algo_all_paths":
        "CALL algo.allPaths(2000000000000, 2000000000005, 4, false) "
        "YIELD length RETURN length, count(*) AS n ORDER BY length",
    # k cheapest simple paths (Dijkstra + numberOfShortest(k) interest)
    "algo_k_shortest_paths":
        "CALL algo.kShortestPaths(3000000000102, 5000000001784, 2) "
        "YIELD nodeIds, cost "
        "RETURN count(*) AS n, max(cost) AS c",
    "algo_all_simple_paths":
        "CALL algo.allSimplePaths(2000000000000, 2000000000005, 4, false) "
        "YIELD length RETURN length, count(*) AS n ORDER BY length",
    "algo_exact_depth_paths":
        "CALL algo.exactDepthPaths(2000000000000, 2000000000005, 4, false) "
        "YIELD length RETURN count(*) AS n",
    "algo_sssp_correlated":
        "MATCH (n:Nation) CALL algo.shortestPathLengths(id(n)) "
        "YIELD node, dist RETURN n.nationkey AS k, count(*) AS reach, "
        "max(dist) AS md ORDER BY k",
    "algo_sssp_weighted":
        "CALL algo.shortestPathLengths(6000000000001, 'quantity') "
        "YIELD node, dist RETURN count(*) AS n, round(sum(dist), 2) AS s",
    # --- coverage long tail (SURVEY §2.1/§2.2/§2.5/§2.6/§2.8) ---
    "node_index_scan":
        "MATCH (c:Customer) WHERE c.acctbal IS NOT NULL RETURN count(*) AS n",
    "rel_index_seek_range":
        "MATCH ()-[l:CONTAINS]->() WHERE l.quantity >= 10 AND l.quantity < 20 "
        "RETURN count(*) AS n",
    "rel_index_contains_scan":
        "MATCH ()-[l:CONTAINS]->() WHERE l.returnflag CONTAINS 'A' "
        "RETURN count(*) AS n",
    "rel_index_ends_with_scan":
        "MATCH ()-[l:CONTAINS]->() WHERE l.linestatus ENDS WITH 'F' "
        "RETURN count(*) AS n",
    "node_by_element_id_seek":
        "MATCH (c:Customer) WHERE elementId(c) = '3000000000042' "
        "RETURN c.name AS name",
    "let_semi_apply":
        "MATCH (c:Customer) RETURN c.custkey AS custkey, "
        "EXISTS { (c)-[:PLACED]->() } AS has_order ORDER BY custkey LIMIT 50",
    "conditional_apply":
        "MATCH (c:Customer) OPTIONAL MATCH (c)-[:FROM_NATION]->(n:Nation) "
        "WITH c, n WHERE n IS NOT NULL RETURN count(*) AS n",
    "anti_op":
        "MATCH (c:Customer) WHERE NOT EXISTS { (c)-[:PLACED]->() } "
        "RETURN count(*) AS n",
    "subquery_foreach":
        "MATCH (r:Region) CALL { WITH r MATCH (n:Nation)-[:IN_REGION]->(r) "
        "RETURN count(*) AS cnt } RETURN r.name AS name, cnt ORDER BY name",
    "left_outer_hash_join":
        "MATCH (o:Order) OPTIONAL MATCH (c:Customer)-[:PLACED]->(o) "
        "RETURN count(c) AS n",
    "partial_sort":
        "MATCH (o:Order) RETURN o.orderkey AS okey, o.orderpriority AS pri, "
        "o.totalprice AS price ORDER BY pri, price DESC, okey LIMIT 20",
    "partial_top":
        "MATCH (o:Order) WITH o ORDER BY o.orderdate, o.orderkey LIMIT 100 "
        "RETURN o.orderstatus AS status, count(*) AS n",
    "ordered_distinct":
        "MATCH (o:Order) RETURN DISTINCT o.orderpriority AS pri ORDER BY pri",
    "exhaustive_limit":
        "MATCH (r:Region) WITH r LIMIT 3 RETURN count(*) AS n",
    "math_functions":
        "WITH 2.0 AS x RETURN abs(-x) AS ab, ceil(x/3) AS ce, floor(x) AS fl, "
        "round(sqrt(x), 3) AS sq, sign(-x) AS sg, round(exp(1.0), 3) AS ex, "
        "round(log(x), 3) AS lg, round(atan2(x, 1.0), 3) AS at, "
        "round(pi(), 3) AS p",
    "percentiles_array":
        "MATCH (o:Order) WITH percentiles(o.totalprice, [0.25, 0.5, 0.75]) AS ps "
        "RETURN round(ps[0], 2) AS p25, round(ps[1], 2) AS p50, "
        "round(ps[2], 2) AS p75",
    "list_slice_index":
        "WITH [1, 2, 3, 4, 5] AS l RETURN size(l[1..3]) AS sl_n, l[0] AS first, "
        "l[-1] AS neg, l[1..3][0] AS sl0",
    "char_length_fn":
        "RETURN char_length('abc') AS a, size('abcd') AS b",
    "string_case_fns":
        "RETURN toUpper('aBc') AS u, toLower('AbC') AS l, reverse('abc') AS r, "
        "substring('hello', 1, 3) AS s",
    "path_functions":
        "MATCH p = (n:Nation)-[:IN_REGION]->(r:Region) "
        "RETURN size(nodes(p)) AS nn, size(relationships(p)) AS nr, "
        "length(p) AS l, count(*) AS c",
    "rel_endpoint_fns":
        "MATCH (n:Nation)-[e:IN_REGION]->(r:Region) RETURN type(e) AS t, "
        "count(DISTINCT startNode(e).nationkey) AS sn, "
        "count(DISTINCT endNode(e).regionkey) AS en",
    "list_comprehension":
        "WITH [1, 2, 3, 4, 5, 6] AS l "
        "WITH [x IN l WHERE x % 2 = 0 | x * 10] AS evens "
        "RETURN size(evens) AS n_evens, "
        "reduce(s = 0, x IN evens | s + x) AS total",
    "nondeterministic_sanity":
        "RETURN size(split(toString(randomUUID()), '-')) AS parts, "
        "timestamp() > 0 AS ok, rand() >= 0 AS r01",
    "trig_edge_fns":
        "RETURN round(cot(1.0), 3) AS ct, round(haversin(1.0), 3) AS hv, "
        "round(e(), 3) AS eu, isNaN(0.0/0.0) AS nan",
    "range_step":
        "RETURN size(range(0, 10, 2)) AS n, size(range(10, 0, -3)) AS m, "
        "last(range(10, 0, -3)) AS lst",
    "pattern_comprehension_expr":
        "MATCH (r:Region) RETURN r.name AS name, "
        "size([(n:Nation)-[:IN_REGION]->(r) | n.nationkey]) AS n_nations "
        "ORDER BY name",
    "union_rel_type_scan":
        "MATCH ()-[l:CONTAINS|SUPPLIED_BY]->() RETURN count(*) AS n",
    "call_subquery_union":
        "MATCH (n:Nation) CALL { WITH n MATCH (n)-[:IN_REGION]->(r) "
        "RETURN r.name AS rn UNION WITH n RETURN 'X' AS rn } "
        "RETURN count(*) AS total",
    "qpp_where":
        "MATCH ((a:Nation)-[:IN_REGION]->(b:Region) WHERE b.regionkey < 3)"
        "{1,1} RETURN count(*) AS n",
    "pattern_comp_in_where":
        "MATCH (n:Nation) WHERE size([(n)-[:IN_REGION]->(r) | r.name]) = 1 "
        "RETURN count(*) AS n",
    "let_select_or_semi_apply":
        "MATCH (c:Customer) RETURN c.custkey AS ck, (c.acctbal < 0 "
        "OR EXISTS { (c)-[:PLACED]->() }) AS flag ORDER BY ck LIMIT 40",
    "temporal_constructors":
        "RETURN date({year: 2024, month: 3, day: 5}) AS d, "
        "datetime({year: 2024, month: 3, day: 5, hour: 10, minute: 30}).hour "
        "AS h, localtime('10:30:05').second AS s, time('10:30:05Z').hour AS t, "
        "duration.between(date('2024-01-01'), date('2024-03-15')).months AS m",
    "rel_by_element_id_seek":
        "MATCH ()-[l:IN_REGION]->() WHERE elementId(l) = '11000000000003' "
        "RETURN count(*) AS n",
    # --- coverage long tail 2 (§2.5/§2.6/§2.7/§2.8) ---
    "string_left_right":
        "RETURN left('hello', 3) AS l, right('hello', 3) AS r, "
        "btrim('xxaxx', 'x') AS b, replace('abcabc', 'b', 'Z') AS rep, "
        "split('a,b,c', ',')[1] AS sp, nullIf(1, 1) AS ni",
    "properties_fn":
        "MATCH (r:Region) RETURN properties(r).name AS name ORDER BY name",
    "list_conversions":
        "RETURN toIntegerList(['1', '2', 'x'])[0] AS a, "
        "toFloatList(['1.5'])[0] AS f, toStringList([1, 2])[1] AS s, "
        "toBooleanList(['true'])[0] AS b",
    "rollup_apply_reduce":
        "MATCH (r:Region) RETURN r.name AS rn, reduce(s = 0, x IN "
        "[(n:Nation)-[:IN_REGION]->(r) | n.nationkey] | s + x) AS sumkeys "
        "ORDER BY rn",
    "let_anti_semi_apply":
        "MATCH (c:Customer) RETURN c.custkey AS ck, "
        "NOT EXISTS { (c)-[:PLACED]->() } AS no_order ORDER BY ck LIMIT 40",
    "load_csv_no_header":
        "LOAD CSV FROM 'file:///root/repo/tests/fixtures/people.csv' AS row "
        "RETURN row[0] AS c0 ORDER BY c0",
    "ordered_union":
        "CALL { MATCH (r:Region) RETURN r.name AS name "
        "UNION ALL MATCH (n:Nation) RETURN n.name AS name } "
        "RETURN name ORDER BY name LIMIT 8",
    "point_3d_distance":
        "RETURN round(point.distance(point({x: 0.0, y: 0.0, z: 0.0}), "
        "point({x: 1.0, y: 2.0, z: 2.0})), 6) AS d",
    "temporal_epoch_millis":
        "MATCH (o:Order) WHERE o.orderkey <= 10 "
        "RETURN o.orderkey AS ok, o.orderdate.epochMillis AS em ORDER BY ok",
    # --- round 8: acceptance-mined semantics ---
    # a CALL {} body whose mid-pipeline aggregation matches zero rows
    # still yields one row per input (Apply + EagerAggregation;
    # caught by the CallInTransactions happy-path port)
    "call_agg_empty_group":
        "MATCH (n:Nation) WHERE n.nationkey < 5 "
        "CALL { WITH n MATCH (c:Customer)-[:FROM_NATION]->"
        "(m:Nation WHERE m.nationkey = n.nationkey) "
        "WHERE c.acctbal < -997 "
        "WITH count(c) AS nc, round(coalesce(sum(c.acctbal), 0.0), 2) AS s "
        "RETURN nc, s } "
        "RETURN n.nationkey AS k, nc, s ORDER BY k",
    # rel uniqueness counts occurrences (AddUniquenessPredicates.scala:66,
    # GraphPatternAcceptance): same-MATCH reuse is always empty ...
    "rel_reuse_same_match":
        "MATCH (a)-[r:FROM_NATION]->(b), (x)-[r]->(z) "
        "RETURN count(*) AS n",
    # ... while cross-MATCH reuse is the ordinary ProjectEndpoints join
    "rel_reuse_cross_match":
        "MATCH (a)-[r:FROM_NATION]->(b) MATCH (x)-[r]->(z) "
        "RETURN count(*) AS n",
    # boolean-context list coercion (CoerceToPredicate, ReturnAcceptance
    # 'RETURN true AND list'): [] -> false, non-empty -> true
    "bool_list_coercion":
        "WITH [x IN range(1, 0) | x] AS e, [1] AS f "
        "RETURN (e OR true) AS a, (e AND true) AS b, NOT e AS c, "
        "(f AND true) AS d",
    # valueType with exact list element unions (CypherTypeOrder-sorted,
    # LIST<NOTHING>/NULL normalization; ValueTypeFunctionAcceptance)
    "valuetype_list_unions":
        "UNWIND [[1], ['3', true], [], [null], [1, null]] AS v "
        "RETURN valueType(v) AS t",
    # pattern comprehension WHERE referencing an OUTER variable
    # (NodePatternPredicatesAcceptance)
    "pattern_comp_outer_var":
        "WITH 1000.0 AS x MATCH (n:Nation) WHERE n.nationkey < 3 "
        "RETURN n.nationkey AS k, "
        "size([p=(n)<-[:FROM_NATION]-(c:Customer WHERE c.acctbal > x) "
        "| p]) AS d ORDER BY k",
    # rel-type algebra with wildcards/negated groups in the scan
    # (LabelExpressionAcceptance rel outlines)
    "rel_type_algebra":
        "MATCH ()-[r:!(FROM_NATION&%)&%]->() RETURN count(*) AS n",
    # nested correlated CALL {} (hidden-correlation columns must be
    # unique per nesting level; CallInTransactions happy-path port)
    "nested_call_subquery":
        "MATCH (n:Nation) WHERE n.nationkey < 3 "
        "CALL { WITH n CALL { WITH n RETURN n.nationkey * 10 AS t } "
        "RETURN t } RETURN n.nationkey AS k, t ORDER BY k",
    # list comprehension whose lambda drives a correlated pattern
    # comprehension (explode-lower-collect; PatternExpressionAcceptance)
    "listcomp_correlated_subq":
        "MATCH (r:Region) RETURN r.regionkey AS k, "
        "[x IN [r] | size([p=(x)<-[:IN_REGION]-(n:Nation) | p])] AS d "
        "ORDER BY k",
    # a path whose relationship is ANONYMOUS still carries it in the
    # PathValue (CypherTransactionsAcceptance path-import scenarios)
    "path_anon_rel":
        "MATCH p = (n:Nation {nationkey: 0})-[]->() "
        "RETURN size(relationships(p)) AS s, size(nodes(p)) AS c",
    # an aggregating EXISTS body always emits one row, so the EXISTS is
    # true even for zero matches (ExistsExpressionAcceptance 'EXISTS
    # subquery with aggregation inside')
    "exists_agg_body":
        "MATCH (c:Customer) WHERE c.custkey <= 20 "
        "RETURN c.custkey AS k, "
        "EXISTS { MATCH (c)-[:PLACED]->(o) RETURN count(o) } AS e "
        "ORDER BY k",
    # a NULL entity argument matches no pattern: COUNT 0 / EXISTS false
    # (CountExpressionAcceptance 'COUNT should return zero for NULL nodes')
    "subquery_null_entity":
        "OPTIONAL MATCH (n:Region) WHERE n.regionkey > 100 "
        "RETURN COUNT { (n) } AS c, COUNT { (n)-[:IN_REGION]-() } AS d, "
        "EXISTS { (n) } AS e",
    # underscore digit separators in every numeric literal form
    # (LiteralAcceptance scenarios 1-24)
    "literal_underscores":
        "RETURN 1_000_000 AS a, 0xA_B AS b, 0o7_7 AS c, 1_0.2_5 AS d, "
        "1e1_0 AS e",
    # SKIP/LIMIT accept any graph-free statically-computable expression
    # (SkipLimitAcceptance 'Reduce LIMIT should be allowed')
    "limit_reduce_expr":
        "MATCH (r:Region) RETURN r.name AS n ORDER BY n "
        "LIMIT reduce(s = 0, x IN [1, 1] | s + x)",
    # outer variables stay in scope across an inner aggregating WITH in
    # a subquery expression (ExistsExpressionAcceptance 'Exists with
    # inner aggregation and using outer variable')
    "exists_leading_agg":
        "MATCH (n:Nation) WHERE n.nationkey < 5 AND "
        "EXISTS { WITH count(*) AS c "
        "MATCH (n)-[:IN_REGION]->(r {regionkey: 1}) RETURN n } "
        "RETURN n.nationkey AS k ORDER BY k",
}


def _q_user_function(spark, sf_dir):
    """@UserFunction analog (procedure-api/UserFunction.java): register a
    scalar fn, call it from Cypher."""
    from neo4j_spark.api import cypher
    from neo4j_spark.functions.registry import register_function

    register_function("double_it", lambda args: args[0] * 2)
    return cypher(spark, "MATCH (r:Region) "
                  "RETURN sum(double_it(r.regionkey)) AS s",
                  _graph(spark, sf_dir))


def _q_user_aggregate(spark, sf_dir):
    """@UserAggregationFunction analog: geometric mean as a registered
    aggregate built from builtin combinators (stays map-side partial)."""
    from neo4j_spark.api import cypher
    from neo4j_spark.functions.registry import register_aggregate

    register_aggregate("geo_mean", lambda args: F.exp(F.avg(F.log(args[0]))))
    return cypher(spark, "MATCH (n:Nation) "
                  "RETURN round(geo_mean(n.nationkey + 1), 4) AS g",
                  _graph(spark, sf_dir))


_CATALOG_CACHE: dict = {}


def _catalog(spark, sf_dir):
    """Composite catalog: the TPC-H graph split into two constituents
    ('geo' = Nation/Region, 'trade' = Customer/Nation) sharing the
    Nation frame — the reference's composite-database shape
    (query-router + RunQueryAt LP:3559)."""
    key = (id(spark), sf_dir)
    if key not in _CATALOG_CACHE:
        from neo4j_spark.graph import GraphCatalog, PropertyGraph
        from neo4j_spark.sources.tpch import TAG

        g = _graph(spark, sf_dir)
        geo = PropertyGraph(
            {k: g.node_frames[k] for k in ("Nation", "Region")},
            {"IN_REGION": g.rel_frames["IN_REGION"]},
            {"IN_REGION": ("Nation", "Region")})
        cust_from = g.rel_frames["FROM_NATION"].filter(
            (F.col("src") >= 3 * TAG) & (F.col("src") < 4 * TAG))
        trade = PropertyGraph(
            {k: g.node_frames[k] for k in ("Customer", "Nation")},
            {"FROM_NATION": cust_from},
            {"FROM_NATION": ("Customer", "Nation")})
        _CATALOG_CACHE[key] = GraphCatalog(
            {"geo": geo, "trade": trade}, default="geo")
    return _CATALOG_CACHE[key]


def _use_cy(text: str):
    def run(spark, sf_dir):
        from neo4j_spark.api import cypher

        return cypher(spark, text, _catalog(spark, sf_dir))

    return run


_q_use_graph_select = _use_cy(
    "USE geo MATCH (n:Nation)-[:IN_REGION]->(r:Region) "
    "RETURN r.name AS region, count(*) AS nations ORDER BY region")

def _q_dyn_label_route(spark, sf_dir):
    """Row-dependent dynamic labels: CREATE (n:$(expr)) routes each row to
    the shard named by its own value (training-pipeline document
    routing shape)."""
    return _write(
        spark, sf_dir,
        "MATCH (c:Customer) WHERE c.custkey <= 100 "
        "CREATE (t:$(c.mktsegment) {ck: c.custkey})",
        "MATCH (b:BUILDING) RETURN count(*) AS n")


def _q_call_token_create(spark, sf_dir):
    """db.createLabel / db.createRelationshipType (BuiltInProcedures.java):
    token creation visible in the catalog procedures."""
    return _write(
        spark, sf_dir,
        "CALL db.createLabel('Brand')",
        "CALL db.createRelationshipType('OWNS')",
        "CALL db.labels() YIELD label WITH label "
        "WHERE label IN ['Brand', 'Region'] RETURN label ORDER BY label")


def _q_call_tx_metadata(spark, sf_dir):
    """tx.setMetaData / tx.getMetaData round-trip."""
    return _write(
        spark, sf_dir,
        "CALL tx.setMetaData({app: 'pipeline', shard: 3})",
        "CALL tx.getMetaData() YIELD metadata "
        "RETURN metadata.app AS app, metadata.shard AS shard")


_q_use_graph_by_name = _use_cy(
    # dynamic graph reference (GraphByName.scala): plan-time constant arg
    "USE graph.byName('trade') MATCH (c:Customer)-[:FROM_NATION]->(n:Nation) "
    "RETURN n.nationkey AS nk, count(*) AS customers ORDER BY nk")

_q_use_graph_union = _use_cy(
    "USE geo MATCH (n:Nation) RETURN 'nation' AS kind, count(*) AS n "
    "UNION ALL "
    "USE trade MATCH (c:Customer) RETURN 'customer' AS kind, count(*) AS n")

_q_use_graph_call_sub = _use_cy("""
    USE geo MATCH (n:Nation)-[:IN_REGION]->(r:Region)
    WITH r.name AS region, n.nationkey AS nk
    CALL {
      WITH nk
      USE trade
      MATCH (c:Customer)-[:FROM_NATION]->(m:Nation)
      WHERE m.nationkey = nk
      RETURN count(c) AS customers
    }
    RETURN region, sum(customers) AS customers ORDER BY region""")


def _q_input_rows(spark, sf_dir):
    """Input operator (LP:2389): client-provided rows via $param UNWIND."""
    from neo4j_spark.api import cypher

    return cypher(
        spark,
        "UNWIND $rows AS row RETURN row.a AS a, row.b AS b ORDER BY a",
        _graph(spark, sf_dir),
        params={"rows": [{"a": 2, "b": "y"}, {"a": 1, "b": "x"}]})


def _q_call_vector(spark, sf_dir):
    from neo4j_spark.api import cypher

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    return cypher(
        spark,
        "CALL db.index.vector.queryNodes('embedding', 5, $qvec) "
        "YIELD node, score RETURN node, round(score, 6) AS score",
        _graph(spark, sf_dir), {"qvec": qvec})


# ---------------------------------------------------------------------------
# Extension operators (direct DataFrame API)
# ---------------------------------------------------------------------------


def _q_ddl_index_catalog(spark, sf_dir):
    """SchemaLogicalPlan / ShowCommandLogicalPlan: CREATE INDEX + CREATE
    CONSTRAINT (validated against the snapshot) + SHOW."""
    from neo4j_spark.api import cypher

    g = _graph(spark, sf_dir).copy()
    cypher(spark, "CREATE INDEX cov_idx FOR (n:Customer) ON (n.acctbal)",
           g).collect()
    cypher(spark, "CREATE CONSTRAINT cov_uq FOR (n:Customer) "
           "REQUIRE n.custkey IS UNIQUE", g).collect()
    idx = cypher(spark, "SHOW INDEXES", g)
    con = cypher(spark, "SHOW CONSTRAINTS", g)
    return idx.select("name", "type").unionByName(
        con.select("name", "type")).orderBy("name")


def _q_call_fulltext_indexed(spark, sf_dir):
    """CREATE FULLTEXT INDEX analog: materialized inverted-index parquet,
    then an index-backed query (identical scoring to the scan path)."""
    from neo4j_spark.api import cypher

    g = _graph(spark, sf_dir).copy()
    cypher(spark, "CALL db.index.fulltext.createNodeIndex("
           "'ft_name', ['Part'], ['name']) YIELD name RETURN name",
           g).collect()
    return cypher(spark, "CALL db.index.fulltext.queryNodes("
                  "'ft_name', 'widget') YIELD node, score "
                  "RETURN count(*) AS n, round(sum(score), 1) AS s", g)


def _q_call_fulltext_slop(spark, sf_dir):
    """Sloppy phrase "data table"~N (QueryParser slop ->
    SloppyPhraseMatcher: one occurrence per word, adjusted-position
    range max(p_i - i) - min(p_i - i) <= N).  Slop 1 over a two-word
    phrase = forward match with at most one intervening token; the
    DuckDB oracle states exactly that as a regex over the tokenized
    text."""
    from neo4j_spark.api import cypher

    g = _graph(spark, sf_dir).copy()
    cypher(spark, "CALL db.index.fulltext.createNodeIndex("
           "'ft_slop', ['Document'], ['text']) YIELD name RETURN name",
           g).collect()
    return cypher(spark, "CALL db.index.fulltext.queryNodes("
                  "'ft_slop', '\"data table\"~1') YIELD node "
                  "RETURN count(*) AS n", g)


def _q_call_fulltext_analyzer(spark, sf_dir):
    """Configurable analyzer ('english': stop words + S-stemming): the
    query term 'tables' stems to 'table' and matches unstemmed docs."""
    from neo4j_spark.api import cypher

    g = _graph(spark, sf_dir).copy()
    cypher(spark, "CALL db.index.fulltext.createNodeIndex("
           "'ft_en', ['Document'], ['text'], {analyzer: 'english'}) "
           "YIELD name RETURN name", g).collect()
    return cypher(spark, "CALL db.index.fulltext.queryNodes("
                  "'ft_en', 'tables') YIELD node "
                  "RETURN count(*) AS n", g)


def _q_call_fulltext_stopwords(spark, sf_dir):
    """'standard' analyzer drops English stop words on both sides: 'the'
    alone matches nothing; 'the scan' scores only 'scan'."""
    from neo4j_spark.api import cypher

    g = _graph(spark, sf_dir).copy()
    cypher(spark, "CALL db.index.fulltext.createNodeIndex("
           "'ft_std', ['Document'], ['text'], {analyzer: 'standard'}) "
           "YIELD name RETURN name", g).collect()
    return cypher(spark, """
        CALL db.index.fulltext.queryNodes('ft_std', 'the')
        YIELD node WITH count(*) AS n_the
        CALL db.index.fulltext.queryNodes('ft_std', 'the scan')
        YIELD node RETURN n_the, count(*) AS n_scan
        """, g)


def _q_dedup_exact(spark, sf_dir):
    # r8 optimization (guide §2.3/§8: shuffle a hash proxy, not the
    # payload): the former exact_dedup(text) -> groupBy(lang) shape
    # sort-aggregated and SHUFFLED the full document text; the distinct
    # count per lang needs only (lang, 128-bit hash proxy) to cross the
    # exchange.  Oracle-identical (count(DISTINCT text) GROUP BY lang)
    # up to simultaneous collision of two seeded xxhash64 halves
    # (~n²·2⁻¹²⁹ expected — ~1.5e-21 at 1e9 distinct docs per group);
    # verified on all SFs.
    from neo4j_spark.ml.dedup import distinct_count_by

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return distinct_count_by(docs, ["lang"], "text", alias="n_unique") \
        .select(F.col("lang"), F.col("n_unique"))


def _q_dedup_minhash(spark, sf_dir):
    from neo4j_spark.ml.dedup import minhash_dedup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_dedup_pairs(docs, threshold=0.8).orderBy("id_a", "id_b")


def _q_stream_near_dup(spark, sf_dir):
    """Streaming near-dup probe (stream-static LSH join + exact Jaccard
    verify, streaming/neardup.py) run in its batch-equivalent mode: the
    plan is stream-agnostic, and pytest asserts the drained stream equals
    this batch output exactly."""
    import tempfile

    from neo4j_spark.streaming.neardup import (build_near_dup_index,
                                               stream_near_dup)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    idx = tempfile.gettempdir() + f"/neo4j_spark_neardup_{abs(hash(sf_dir))}"
    build_near_dup_index(docs, idx)
    return (stream_near_dup(docs, spark, idx, threshold=0.8)
            .dropDuplicates().orderBy("doc_id", "corpus_id"))


def _q_dedup_simhash(spark, sf_dir):
    from neo4j_spark.ml.dedup import simhash_dup_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    return simhash_dup_pairs(docs, max_hamming=8).orderBy("id_a", "id_b")


def _q_ngram_jaccard(spark, sf_dir):
    from neo4j_spark.ml.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return ngram_jaccard_pairs(docs, "doc_id", "text", "lang",
                               threshold=0.5).orderBy("id_a", "id_b")


def _q_dedup_embedding_cosine(spark, sf_dir):
    from neo4j_spark.ml.similarity import embedding_cosine_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return (embedding_cosine_pairs(emb, threshold=0.45)
            .orderBy("id_a", "id_b"))


def _q_text_scrub_pii(spark, sf_dir):
    """PII scrubbing (emails/phones/IPv4 -> typed tags): codegen'd
    regexp_replace chain, zero Python.  A deterministic synthetic email is
    appended per doc so the redaction is observable on the synthetic
    corpus."""
    from neo4j_spark.ml.text import pii_counts, scrub_pii

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = F.concat(F.col("text"), F.lit(" contact: user"),
                 F.col("doc_id").cast("string"), F.lit("@example.com"))
    return docs.select(F.col("doc_id"), scrub_pii(t).alias("scrubbed"),
                       *pii_counts(t)).orderBy("doc_id").limit(50)


def _q_text_dup_ngrams(spark, sf_dir):
    """Within-document duplicate-2-gram ratio (Gopher repetition rules):
    pure array expressions, quality signal at scan cost."""
    from neo4j_spark.ml.text import dup_ngram_ratio

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (docs.select("doc_id",
                        dup_ngram_ratio(F.col("text"), 2).alias("dup2"))
            .orderBy("doc_id").limit(200))


def _q_text_dup_lines(spark, sf_dir):
    """Repetition/boilerplate signal: fraction of repeated lines
    (words recast as lines to exercise it on the one-line corpus)."""
    from neo4j_spark.ml.text import dup_line_ratio

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lines = F.regexp_replace(F.col("text"), " ", "\n")
    return docs.select("doc_id",
                       dup_line_ratio(lines).alias("dup_ratio")) \
        .orderBy("doc_id").limit(100)


def _q_text_stats(spark, sf_dir):
    from neo4j_spark.ml.text import token_count, punct_ratio

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        "doc_id", token_count(F.col("text")).alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars"))


def _q_text_quality(spark, sf_dir):
    from neo4j_spark.ml.text import document_stats

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return document_stats(docs).select(
        "doc_id", "n_tokens", "quality", "lang_pred")


def _q_text_fingerprint(spark, sf_dir):
    from neo4j_spark.ml.text import fingerprint

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))


def _q_embedding_quantize(spark, sf_dir):
    """Symmetric int8 quantization (4x corpus shrink for ANN at scale)."""
    from neo4j_spark.ml.similarity import quantize_embeddings

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = quantize_embeddings(emb.withColumn(
        "embedding", F.transform("embedding", lambda x: x.cast("double"))))
    return out.select(
        "vec_id", F.round("qscale", 6).alias("qscale"),
        # string-joined so the driver's pandas canonicalizer (which cannot
        # sort/hash list cells) compares it as a scalar
        F.array_join(F.col("qvec").cast("array<string>"), ",").alias("qvec"),
    ).orderBy("vec_id").limit(100)


def _q_embedding_normalize(spark, sf_dir):
    from neo4j_spark.ml.similarity import l2_normalize, l2norm

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    v = F.transform("embedding", lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.round(l2norm(l2_normalize(v)), 4).alias("unit_norm")) \
        .orderBy("vec_id").limit(100)


def _q_knn_bruteforce(spark, sf_dir):
    from neo4j_spark.ml.similarity import knn_bruteforce

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return knn_bruteforce(emb.filter(F.col("vec_id") != 0), qvec, k=10)


def _q_knn_join(spark, sf_dir):
    from neo4j_spark.ml.similarity import knn_join_bruteforce

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    return knn_join_bruteforce(queries, emb.filter(F.col("vec_id") >= 5), k=3)


def _q_knn_lsh(spark, sf_dir):
    from neo4j_spark.ml.similarity import knn_lsh

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    # 7 planes x 8 tables, radius-2 probing: >= 0.9 recall gate
    # (tests/test_ml_extensions.py::test_lsh_recall_vs_bruteforce)
    return knn_lsh(emb.filter(F.col("vec_id") != 0), qvec, k=10,
                   n_planes=7, n_tables=8, probe_hamming=2)


def _q_knn_ivf(spark, sf_dir):
    from neo4j_spark.ml.similarity import knn_ivf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return knn_ivf(emb.filter(F.col("vec_id") != 0), qvec, k=10,
                   n_centroids=8, n_probe=8)


def _q_knn_ivf_indexed(spark, sf_dir):
    """Partition-pruned probe over a persisted IVF index (the 100 TB
    layout: only the probed list directories are read)."""
    import tempfile

    from neo4j_spark.ml.similarity import (
        ivf_centroids, knn_ivf_probe, save_ivf_index)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    corpus = emb.filter(F.col("vec_id") != 0)
    path = f"{tempfile.gettempdir()}/neo4j_spark_ivf_{abs(hash(sf_dir))}"
    cents = ivf_centroids(corpus, n_centroids=8)
    save_ivf_index(corpus, path, centroids=cents)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return knn_ivf_probe(spark, path, qvec, k=10, n_probe=8)


def _q_events_tumbling(spark, sf_dir):
    from neo4j_spark.streaming.windows import load_events, tumbling_counts

    return tumbling_counts(load_events(spark, sf_dir))


def _q_events_sliding(spark, sf_dir):
    from neo4j_spark.streaming.windows import load_events, sliding_avg

    return sliding_avg(load_events(spark, sf_dir))


def _q_events_session(spark, sf_dir):
    from neo4j_spark.streaming.windows import load_events, session_windows

    return session_windows(load_events(spark, sf_dir))


def _q_events_stream_join(spark, sf_dir):
    """Stream-stream interval join (click <- preceding views per user)."""
    from neo4j_spark.streaming.windows import interval_self_join, load_events

    pairs = interval_self_join(load_events(spark, sf_dir))
    return (pairs.groupBy(F.col("l_user").alias("user_id"))
            .agg(F.count(F.lit(1)).alias("n_pairs"))
            .orderBy("user_id").limit(100))


def _q_events_json(spark, sf_dir):
    from neo4j_spark.streaming.windows import load_events

    ev = load_events(spark, sf_dir)
    return (ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
              .filter(F.col("k") > 50)
              .groupBy("event_type").agg(F.count(F.lit(1)).alias("n")))


def _q_stream_dedup(spark, sf_dir):
    from neo4j_spark.streaming.windows import load_events, stream_dedup

    return stream_dedup(load_events(spark, sf_dir)).groupBy().agg(
        F.count(F.lit(1)).alias("n"))


def _q_multimodal_decode(spark, sf_dir):
    from neo4j_spark.ml.multimodal import attach_fake_binary, decode_images

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    decoded = decode_images(attach_fake_binary(docs))
    return decoded.select("doc_id", "width", "height", "channels")


def _q_multimodal_resize(spark, sf_dir):
    from neo4j_spark.ml.multimodal import (attach_fake_binary, decode_images,
                                           resize_images)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    resized = resize_images(decode_images(attach_fake_binary(docs)))
    return resized.select("doc_id", "width", "height", "channels",
                          "orig_width", "orig_height")


def _q_multimodal_frame_sample(spark, sf_dir):
    from neo4j_spark.ml.multimodal import (attach_fake_binary, decode_images,
                                           frame_sample)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sampled = frame_sample(decode_images(attach_fake_binary(docs)), every_n=10)
    return sampled.select("doc_id", "width", "height")


def _q_audio_features(spark, sf_dir):
    from neo4j_spark.ml.multimodal import attach_fake_binary, audio_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = audio_features(attach_fake_binary(docs))
    return feats.select("doc_id", "duration_s", "sample_rate")


def _q_top1_with_ties(spark, sf_dir):
    from neo4j_spark.operators.topk import top1_with_ties

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return top1_with_ties(orders, ["o_orderdate"], ascending=[False]).select(
        F.col("o_orderkey").alias("orderkey"),
        F.col("o_orderdate").alias("odate"))


# Deterministic sampling (ml/sampling.py).  The md5 hash backend is used
# here precisely because it is engine-portable — DuckDB reproduces the
# split bit-for-bit, making these fully oracle-checkable.
def _q_dedup_resolve(spark, sf_dir):
    """Duplicate-group RESOLUTION: pairs -> connected components ->
    canonical doc per group (ml/dedup.py keep_canonical).  Driven here
    with exact-duplicate pairs so the whole chain (including the star-
    contraction CC) is oracle-checkable: canonical-per-component ==
    min(doc_id) per distinct text."""
    from neo4j_spark.ml.dedup import keep_canonical

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a, b = docs.alias("a"), docs.alias("b")
    pairs = (a.join(b, (F.xxhash64(F.col("a.text"))
                        == F.xxhash64(F.col("b.text")))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .select(F.col("a.doc_id").alias("id_a"),
                     F.col("b.doc_id").alias("id_b")))
    kept = keep_canonical(docs, pairs, id_col="doc_id", policy="min_id")
    return kept.agg(F.count(F.lit(1)).alias("kept"),
                    F.sum("doc_id").alias("id_sum"))


def _q_sample_hash_split(spark, sf_dir):
    from neo4j_spark.ml.sampling import hash_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    split = hash_split(docs, "doc_id",
                       {"train": 0.8, "val": 0.1, "test": 0.1},
                       seed=42, hash_fn="md5")
    return (split.groupBy("split").agg(F.count("*").alias("n"))
            .orderBy("split"))


def _q_sample_stratified(spark, sf_dir):
    from neo4j_spark.ml.sampling import stratified_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = stratified_sample(docs, "lang", {"en": 0.5, "de": 0.2},
                            key="doc_id", seed=7, hash_fn="md5")
    return out.select("doc_id", "lang").orderBy("doc_id")


def _q_sample_topk(spark, sf_dir):
    from neo4j_spark.ml.sampling import take_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return take_sample(docs, 50, key="doc_id", seed=5, hash_fn="md5") \
        .select("doc_id", "lang").orderBy("doc_id")


def _q_sample_weighted(spark, sf_dir):
    from neo4j_spark.ml.sampling import weighted_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return weighted_sample(docs, 30, "n_chars", key="doc_id",
                           seed=11, hash_fn="md5") \
        .select("doc_id").orderBy("doc_id")


def _q_pack_sequences(spark, sf_dir):
    """Concat-and-split sequence packing (ml/sampling.pack_sequences):
    deterministic md5 global order, two-phase distributed prefix sum,
    floor(global_token_pos / max_tokens) window ids.  The oracle states
    the same packing as ONE global SQL window — the Spark side must
    reproduce it exactly despite never building a global window."""
    from neo4j_spark.ml.sampling import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (pack_sequences(docs, 2048, hash_fn="md5")
            .select("doc_id", "n_tokens", "pack_id", "pack_offset")
            .orderBy("doc_id"))


def _q_sample_kfold(spark, sf_dir):
    from neo4j_spark.ml.sampling import kfold_split

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (kfold_split(docs, "doc_id", 5, seed=1, hash_fn="md5")
            .groupBy("fold").agg(F.count("*").alias("n")).orderBy("fold"))


def _q_sample_dataset_mix(spark, sf_dir):
    from neo4j_spark.ml.sampling import dataset_mix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    names = sorted(r[0] for r in docs.select("source").distinct().collect())
    a, b = names[0], names[1]
    srcs = {n: docs.where(F.col("source") == n) for n in names[:2]}
    mix = dataset_mix(srcs, {a: 3.0, b: 1.0}, key="doc_id", seed=4,
                      hash_fn="md5")
    return (mix.groupBy("mix_source").agg(F.count("*").alias("n"))
            .orderBy("mix_source"))


# ---------------------------------------------------------------------------
# Updating operators (SURVEY §2.10) — each runs on an isolated graph copy
# ---------------------------------------------------------------------------


def _write(spark, sf_dir, *statements):
    from neo4j_spark.api import cypher

    g = _graph(spark, sf_dir).copy()
    for stmt in statements[:-1]:
        cypher(spark, stmt, g).collect()
    return cypher(spark, statements[-1], g)


def _q_create_named_path(spark, sf_dir):
    """CREATE p = (...) binds the created elements as a PathValue, and a
    path RETURNed from CALL {} IN TRANSACTIONS flows to the outer query
    (CypherTransactionsAcceptance 'should support call in tx returning
    paths'); SET through a variable UNWOUND from relationships(p)
    writes to the REL frames."""
    return _write(
        spark, sf_dir,
        "UNWIND range(1, 3) AS i "
        "CALL { WITH i CREATE p = (:TA {v: i})-[:TR {w: i}]->(:TB) "
        "RETURN p } IN TRANSACTIONS "
        "UNWIND relationships(p) AS r SET r.w = r.w * 10",
        "MATCH (:TA)-[r:TR]->(:TB) RETURN r.w AS w ORDER BY w")


def _q_union_unit_call(spark, sf_dir):
    """A union UNIT subquery (no RETURN in any branch) runs every branch
    per input row and preserves the outer cardinality (SubqueryAcceptance
    'Ending union unit subquery call')."""
    return _write(
        spark, sf_dir,
        "MATCH (r:Region) "
        "CALL { WITH r CREATE (:TmpU1) UNION CREATE (:TmpU2) } "
        "RETURN count(*) AS c0",
        "MATCH (t) WHERE t:TmpU1 OR t:TmpU2 RETURN count(*) AS c")


def _q_write_create(spark, sf_dir):
    return _write(
        spark, sf_dir,
        "UNWIND range(1, 100) AS x CREATE (:Tmp {v: x})",
        "MATCH (t:Tmp) RETURN count(*) AS n, sum(t.v) AS s")


def _q_write_set(spark, sf_dir):
    return _write(
        spark, sf_dir,
        "MATCH (c:Customer) WHERE c.acctbal < 0 SET c.poor = true",
        "MATCH (c:Customer) WHERE c.poor = true RETURN count(*) AS n")


def _q_write_set_label(spark, sf_dir):
    return _write(
        spark, sf_dir,
        "MATCH (c:Customer) WHERE c.acctbal >= 9000 SET c:Premium",
        "MATCH (p:Premium) RETURN count(*) AS n")


def _q_write_detach_delete(spark, sf_dir):
    return _write(
        spark, sf_dir,
        "MATCH (s:Supplier) DETACH DELETE s",
        "MATCH (n) RETURN count(*) AS n")


def _q_write_merge(spark, sf_dir):
    return _write(
        spark, sf_dir,
        "MATCH (:Customer)-[:FROM_NATION]->(m:Nation) "
        "MERGE (n:Nation {nationkey: m.nationkey})",
        "MATCH (n:Nation) RETURN count(*) AS n")


def _q_ddl_user_admin(spark, sf_dir):
    """Community user administration round-trip (SURVEY §2.10 admin
    commands; CommunityAdministrationCommandRuntime.scala): CREATE USER
    (with and without CHANGE NOT REQUIRED), ALTER CURRENT USER SET
    PASSWORD (clears the change-required flag,
    SetOwnPasswordExecutionPlanner.scala:71), SHOW USERS."""
    from neo4j_spark.api import cypher

    g = _graph(spark, sf_dir).copy()
    cypher(spark, "CREATE USER alice SET PASSWORD 'sekrit-123'",
           g).collect()
    cypher(spark, "CREATE USER bob SET PASSWORD 'hunter2-00' "
           "CHANGE NOT REQUIRED", g).collect()
    cypher(spark, "ALTER CURRENT USER SET PASSWORD "
           "FROM 'neo4j' TO 'fresh-pw-1'", g).collect()
    return (cypher(spark, "SHOW USERS", g)
            .select(F.col("user").alias("username"),
                    F.col("passwordChangeRequired").alias(
                        "change_required"))
            .orderBy("username"))


def _q_call_in_tx_on_error(spark, sf_dir):
    """CALL {} IN TRANSACTIONS ON ERROR CONTINUE with a failing batch:
    batches of 2 over [1,2,3,0,4] — the [3,0] batch divides by zero
    (i=0, j=0), rolls back, and reports committed=false/errorMessage;
    the other batches commit, so 6 TmpTx nodes remain
    (CallInTransactionsErrorHandling.feature, TransactionApply LP:4039)."""
    return _write(
        spark, sf_dir,
        "UNWIND [1, 2, 3, 0, 4] AS i "
        "CALL { WITH i UNWIND [1, 0] AS j CREATE (n:TmpTx {p: 1/(i + j)}) } "
        "IN TRANSACTIONS OF 2 ROWS ON ERROR CONTINUE REPORT STATUS AS s "
        "CALL { MATCH (n:TmpTx) RETURN count(*) AS n_comm } "
        "RETURN i, s.started AS started, s.committed AS committed, "
        "s.errorMessage IS NOT NULL AS has_err, n_comm ORDER BY i")


def _q_call_in_tx_break(spark, sf_dir):
    """ON ERROR BREAK: the failing [3,0] batch rolls back and stops the
    loop — the [4] batch is never started (started=false, no txId), and
    only 4 TmpTx nodes remain."""
    return _write(
        spark, sf_dir,
        "UNWIND [1, 2, 3, 0, 4] AS i "
        "CALL { WITH i UNWIND [1, 0] AS j CREATE (n:TmpTx {p: 1/(i + j)}) } "
        "IN TRANSACTIONS OF 2 ROWS ON ERROR BREAK REPORT STATUS AS s "
        "CALL { MATCH (n:TmpTx) RETURN count(*) AS n_comm } "
        "RETURN i, s.started AS started, s.committed AS committed, "
        "s.transactionId IS NOT NULL AS has_tx, n_comm ORDER BY i")


def _q_call_in_tx_concurrent(spark, sf_dir):
    """IN n CONCURRENT TRANSACTIONS (CypherParser.g4:203): concurrency
    is a permission, not a guarantee — and a write-only body's batches
    cannot observe one another, so the engine runs them all as ONE
    distributed Spark job (translate._call_in_tx fused path): every
    partition writes in parallel, no driver-side batch loop at all.
    Bodies needing per-batch commit identity (ON ERROR CONTINUE/BREAK,
    REPORT STATUS) keep the serial loop, an equally legal schedule."""
    return _write(
        spark, sf_dir,
        "UNWIND range(1, 40) AS i "
        "CALL { WITH i CREATE (:TmpTx {v: i}) } "
        "IN 4 CONCURRENT TRANSACTIONS OF 5 ROWS",
        "MATCH (n:TmpTx) RETURN count(*) AS n, sum(n.v) AS s")


def _q_shortest_path_pred_fallback(spark, sf_dir):
    """FindShortestPaths withFallback (ShortestPathAcceptance): a WHERE
    predicate over the path selects WHICH path is shortest — the 2-hop
    A-X-D winner dies on the NONE(n:X) predicate and the search must
    surface the 3-hop A-B-C-D instead of returning nothing."""
    return _write(
        spark, sf_dir,
        "CREATE (a:TmpA {name: 'A'}), (b:TmpB {name: 'B'}), "
        "(c:TmpC {name: 'C'}), (d:TmpD {name: 'D'}), (x:TmpX {name: 'X'}) "
        "CREATE (a)-[:TREL]->(b), (b)-[:TREL]->(c), (c)-[:TREL]->(d), "
        "(a)-[:TREL]->(x), (x)-[:TREL]->(d)",
        "MATCH p = shortestPath((src:TmpA)-[:TREL*]->(dst:TmpD)) "
        "WHERE NONE(n in nodes(p) WHERE n:TmpX) "
        "UNWIND [n IN nodes(p) | n.name] AS node RETURN node")


def _q_write_remove(spark, sf_dir):
    return _write(
        spark, sf_dir,
        "MATCH (p:Part) REMOVE p.brand",
        "MATCH (p:Part) WHERE p.brand IS NULL RETURN count(*) AS n")


def _q_write_foreach(spark, sf_dir):
    return _write(
        spark, sf_dir,
        "FOREACH (x IN range(1, 50) | CREATE (:Tmp {v: x}))",
        "MATCH (t:Tmp) RETURN count(*) AS n, sum(t.v) AS s")


def _q_write_merge_on_clauses(spark, sf_dir):
    return _write(
        spark, sf_dir,
        "MERGE (n:Nation {nationkey: 999}) ON CREATE SET n.name = 'NEW'",
        "MERGE (n:Nation {nationkey: 999}) ON MATCH SET n.name = 'SEEN'",
        "MATCH (n:Nation {nationkey: 999}) RETURN n.name AS name")


def _q_write_remove_label(spark, sf_dir):
    return _write(
        spark, sf_dir,
        "MATCH (n:Nation) SET n:Extra",
        "MATCH (n:Nation) WHERE n.nationkey < 5 REMOVE n:Extra",
        "MATCH (n:Extra) RETURN count(*) AS n")


def _q_write_delete_rel(spark, sf_dir):
    return _write(
        spark, sf_dir,
        "MATCH ()-[r:IN_REGION]->() DELETE r",
        "MATCH ()-[r:IN_REGION]->() RETURN count(*) AS n")


def _q_write_set_props_map(spark, sf_dir):
    return _write(
        spark, sf_dir,
        "MATCH (r:Region) SET r += {bonus: 7}",
        "MATCH (r:Region) RETURN sum(r.bonus) AS s")


def _q_write_create_rel(spark, sf_dir):
    return _write(
        spark, sf_dir,
        "MATCH (c:Customer), (r:Region) WHERE c.custkey <= 3 "
        "AND r.regionkey = 0 CREATE (c)-[:LIKES]->(r)",
        "MATCH (:Customer)-[l:LIKES]->(:Region) RETURN count(*) AS n")


def _q_write_merge_rel(spark, sf_dir):
    """Relationship MERGE is idempotent: running it twice leaves one
    LIKES edge per (customer, region) pair (MergePipe ON MATCH no-op)."""
    return _write(
        spark, sf_dir,
        "MATCH (c:Customer), (r:Region) WHERE c.custkey <= 2 "
        "AND r.regionkey = 0 MERGE (c)-[:LIKES]->(r)",
        "MATCH (c:Customer), (r:Region) WHERE c.custkey <= 2 "
        "AND r.regionkey = 0 MERGE (c)-[:LIKES]->(r)",
        "MATCH (:Customer)-[l:LIKES]->(:Region) RETURN count(*) AS n")


def _q_write_match_foreach(spark, sf_dir):
    """ForeachApply (LP:2366): FOREACH nested under a MATCH row stream."""
    return _write(
        spark, sf_dir,
        "MATCH (r:Region) FOREACH (x IN [1, 2] | CREATE (:Cnt {v: x}))",
        "MATCH (t:Cnt) RETURN count(*) AS n, sum(t.v) AS s")


def _q_write_set_from_entity(spark, sf_dir):
    """SetPropertiesFromMap from a bound entity: SET t = s replaces t's
    properties with s's (SetOperation.scala)."""
    return _write(
        spark, sf_dir,
        "MATCH (r:Region {regionkey: 0}), (n:Nation {nationkey: 7}) "
        "SET n = r",
        "MATCH (n:Nation) WHERE n.nationkey IS NULL "
        "RETURN count(*) AS n, count(n.name) AS withname")


def _q_write_merge_chain(spark, sf_dir):
    """General path MERGE (MergePipe LP:2602): match-or-create the whole
    chain; running it twice leaves one instance."""
    return _write(
        spark, sf_dir,
        "MERGE (a:Hub {k: 1})-[:WIRE]->(b:Hub {k: 2})-[:WIRE]->"
        "(c:Hub {k: 3})",
        "MERGE (a:Hub {k: 1})-[:WIRE]->(b:Hub {k: 2})-[:WIRE]->"
        "(c:Hub {k: 3})",
        "MATCH (h:Hub) OPTIONAL MATCH (h)-[w:WIRE]->() "
        "RETURN count(DISTINCT h.k) AS hubs, count(DISTINCT w) AS wires")


def _q_text_chunking(spark, sf_dir):
    from neo4j_spark.ml.text import chunk_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return chunk_documents(docs, max_tokens=24, overlap=4) \
        .orderBy("doc_id", "chunk_id")


def _q_text_tfidf(spark, sf_dir):
    from neo4j_spark.ml.text import tf_idf_top_terms

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return tf_idf_top_terms(docs, k=3).orderBy("doc_id", "rank")


def _q_text_contamination(spark, sf_dir):
    from neo4j_spark.ml.text import contamination_check

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("source") == "src0")
    train = docs.filter(F.col("source") != "src0")
    return contamination_check(train, bench, n=3).orderBy("doc_id")


WRITE_QUERIES = {
    "write_create": _q_write_create,
    "write_merge_chain": _q_write_merge_chain,
    "write_merge_rel": _q_write_merge_rel,
    "write_match_foreach": _q_write_match_foreach,
    "write_set_from_entity": _q_write_set_from_entity,
    "write_merge_on_clauses": _q_write_merge_on_clauses,
    "write_remove_label": _q_write_remove_label,
    "write_delete_rel": _q_write_delete_rel,
    "write_set_props_map": _q_write_set_props_map,
    "write_create_rel": _q_write_create_rel,
    "write_foreach": _q_write_foreach,
    "write_set_property": _q_write_set,
    "write_set_label": _q_write_set_label,
    "write_detach_delete": _q_write_detach_delete,
    "union_unit_call": _q_union_unit_call,
    "create_named_path": _q_create_named_path,
    "write_merge": _q_write_merge,
    "write_remove": _q_write_remove,
    "call_in_tx_on_error": _q_call_in_tx_on_error,
    "call_in_tx_break": _q_call_in_tx_break,
    "call_in_tx_concurrent": _q_call_in_tx_concurrent,
    "shortest_path_pred_fallback": _q_shortest_path_pred_fallback,
    "ddl_user_admin": _q_ddl_user_admin,
}


EXTENSION_QUERIES = {
    "dedup_exact": _q_dedup_exact,
    "dedup_minhash_lsh": _q_dedup_minhash,
    "stream_near_dup": _q_stream_near_dup,
    "dedup_simhash": _q_dedup_simhash,
    "ngram_jaccard": _q_ngram_jaccard,
    "dedup_embedding_cosine": _q_dedup_embedding_cosine,
    "text_stats": _q_text_stats,
    "text_scrub_pii": _q_text_scrub_pii,
    "text_dup_lines": _q_text_dup_lines,
    "text_dup_ngrams": _q_text_dup_ngrams,
    "text_quality": _q_text_quality,
    "text_fingerprint": _q_text_fingerprint,
    "text_chunking": _q_text_chunking,
    "text_tfidf": _q_text_tfidf,
    "text_contamination": _q_text_contamination,
    "knn_bruteforce": _q_knn_bruteforce,
    "embedding_quantize": _q_embedding_quantize,
    "embedding_normalize": _q_embedding_normalize,
    "knn_join": _q_knn_join,
    "knn_lsh": _q_knn_lsh,
    "knn_ivf": _q_knn_ivf,
    "knn_ivf_indexed": _q_knn_ivf_indexed,
    "events_tumbling_window": _q_events_tumbling,
    "events_stream_join": _q_events_stream_join,
    "events_sliding_window": _q_events_sliding,
    "events_session_window": _q_events_session,
    "events_json_props": _q_events_json,
    "stream_dedup": _q_stream_dedup,
    "multimodal_decode": _q_multimodal_decode,
    "multimodal_resize": _q_multimodal_resize,
    "multimodal_frame_sample": _q_multimodal_frame_sample,
    "audio_features": _q_audio_features,
    "top1_with_ties": _q_top1_with_ties,
    "dedup_resolve": _q_dedup_resolve,
    "sample_hash_split": _q_sample_hash_split,
    "sample_stratified": _q_sample_stratified,
    "sample_topk": _q_sample_topk,
    "sample_weighted": _q_sample_weighted,
    "sample_kfold": _q_sample_kfold,
    "pack_sequences": _q_pack_sequences,
    "sample_dataset_mix": _q_sample_dataset_mix,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {name: _cy(text) for name, text in CYPHER_QUERIES.items()}

    # qpp_nested_var exercises this engine's documented var-length-inside-
    # QPP unrolling extension; default conformance mode follows the
    # reference and raises, so the entry opts in via the conf.
    _nested = out["qpp_nested_var"]

    def _q_qpp_nested_var(spark: SparkSession, sf_dir: str) -> DataFrame:
        prev = spark.conf.get("neo4j_spark.cypher.extensions", "false")
        spark.conf.set("neo4j_spark.cypher.extensions", "true")
        try:
            return _nested(spark, sf_dir)  # translation happens here
        finally:
            spark.conf.set("neo4j_spark.cypher.extensions", prev)

    out["qpp_nested_var"] = _q_qpp_nested_var
    out["call_vector_query"] = _q_call_vector
    out["call_fulltext_indexed"] = _q_call_fulltext_indexed
    out["call_fulltext_analyzer"] = _q_call_fulltext_analyzer
    out["call_fulltext_slop"] = _q_call_fulltext_slop
    out["call_fulltext_stopwords"] = _q_call_fulltext_stopwords
    out["ddl_index_catalog"] = _q_ddl_index_catalog
    out["input_rows"] = _q_input_rows
    out["use_graph_select"] = _q_use_graph_select
    out["use_graph_by_name"] = _q_use_graph_by_name
    out["call_token_create"] = _q_call_token_create
    out["dyn_label_route"] = _q_dyn_label_route
    out["call_tx_metadata"] = _q_call_tx_metadata
    out["use_graph_union"] = _q_use_graph_union
    out["use_graph_call_sub"] = _q_use_graph_call_sub
    out["user_function_call"] = _q_user_function
    out["user_aggregate_call"] = _q_user_aggregate
    out.update(WRITE_QUERIES)
    out.update(EXTENSION_QUERIES)
    # plan-cache the deterministic batch extension pipelines too (reads
    # over parquet; building the minhash/knn DataFrame graph costs ~1s of
    # driver-side analysis that repeated runs need not pay).  Streaming,
    # multimodal and write entries stay uncached.
    cacheable = ("dedup_", "knn_", "text_", "embedding_", "ngram_",
                 "sample_", "top1_",
                 # events_* are pure BATCH plan builders (load_events is
                 # spark.read.parquet + a ts cast; the window aggregates
                 # are lazy) — each uncached build pays ~0.15s of parquet
                 # schema-inference alone.  stream_* / multimodal_* stay
                 # uncached: they materialize temp files/indexes at build.
                 "events_")

    def _memo(name, fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # keyed on applicationId (session lifetime) like _cy — an
            # id() of a garbage-collected session could alias a stopped
            # context
            key = (spark.sparkContext.applicationId, sf_dir, name)
            if key not in _PLAN_CACHE:
                _plan_cache_put(key, fn(spark, sf_dir))
            else:
                _PLAN_CACHE.move_to_end(key)
            return _PLAN_CACHE[key]

        return run

    for name in list(out):
        if name.startswith(cacheable):
            out[name] = _memo(name, out[name])
    return out


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _cast_rounds_double(sql: str) -> str:
    """Wrap every round(...) in CAST(... AS DOUBLE).

    DuckDB types bare numeric literals as DECIMAL, and round() over a
    DECIMAL stays DECIMAL — value-identical to Spark's DOUBLE but a
    different cell type, which fails the driver's value hash.  Applied
    mechanically to every oracle so engine and oracle agree on DOUBLE."""
    out = []
    i = 0
    low = sql.lower()
    while True:
        j = low.find("round(", i)
        # skip identifiers like x_round( — require a non-word char before
        while j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            j = low.find("round(", j + 1)
        if j < 0:
            out.append(sql[i:])
            break
        depth = 0
        k = j + 5  # at the '('
        while k < len(sql):
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
                if depth == 0:
                    break
            k += 1
        inner = _cast_rounds_double(sql[j + 6:k])  # recurse into the args
        out.append(sql[i:j])
        out.append(f"CAST({sql[j:j + 6]}{inner}) AS DOUBLE)")
        i = k + 1
    return "".join(out)


def oracle_sql() -> dict[str, str]:
    sqls = _oracle_sql_raw()
    return {k: _cast_rounds_double(v) for k, v in sqls.items()}


def _md5_u(key_sql: str, seed: int) -> str:
    """DuckDB expression reproducing ml/sampling.uniform_hash(md5) bit-for-bit."""
    return ("CAST('0x' || substring(md5(CAST(%s AS VARCHAR) || ':%d'), 1, 13) "
            "AS UBIGINT) / 4503599627370496.0" % (key_sql, seed))


def _md5_split(key_sql: str, weights, seed: int) -> str:
    from neo4j_spark.ml.sampling import md5_split_sql

    return md5_split_sql(key_sql, weights, seed)


def _oracle_sql_raw() -> dict[str, str]:
    return {
        "all_nodes_scan":
            "SELECT CAST((SELECT count(*) FROM region) + (SELECT count(*) FROM nation)"
            " + (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)"
            " + (SELECT count(*) FROM part) + (SELECT count(*) FROM orders)"
            " + (SELECT count(*) FROM documents) + (SELECT count(*) FROM embeddings)"
            " AS BIGINT) AS n",
        "node_by_label_scan": "SELECT count(*) AS n FROM customer",
        "node_by_id_seek":
            "SELECT c_name AS name FROM customer WHERE c_custkey = 42",
        "node_index_seek_range":
            "SELECT count(*) AS n FROM customer "
            "WHERE c_acctbal >= 1000 AND c_acctbal < 5000",
        "node_index_contains_scan":
            "SELECT count(*) AS n FROM part WHERE p_name LIKE '%ge%'",
        "node_index_ends_with_scan":
            "SELECT count(*) AS n FROM part WHERE p_name LIKE '%bolt'",
        "rel_type_scan": "SELECT count(*) AS n FROM lineitem",
        "union_label_scan":
            "SELECT CAST((SELECT count(*) FROM customer) + "
            "(SELECT count(*) FROM supplier) AS BIGINT) AS n",
        "expand_all":
            "SELECT r_name AS region, count(*) AS nations FROM nation "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name "
            "ORDER BY region",
        "expand_in":
            "SELECT count(*) AS n FROM orders JOIN customer "
            "ON o_custkey = c_custkey WHERE c_mktsegment = 'BUILDING'",
        "expand_undirected":
            "SELECT CAST((SELECT count(*) FROM customer) + "
            "(SELECT count(*) FROM supplier) AS BIGINT) AS n",
        "expand_into_triangle":
            "SELECT count(*) AS n FROM customer JOIN supplier "
            "ON c_nationkey = s_nationkey",
        "multi_hop_chain":
            "SELECT count(*) AS n FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment = 'AUTOMOBILE'",
        "optional_expand":
            "SELECT c_custkey AS custkey, count(o_orderkey) AS n_orders "
            "FROM customer LEFT JOIN orders ON o_custkey = c_custkey "
            "GROUP BY c_custkey",
        "value_hash_join":
            "SELECT count(*) AS n FROM customer JOIN orders "
            "ON c_custkey = o_orderkey",
        "cartesian_product":
            "SELECT count(*) AS n FROM region CROSS JOIN nation",
        "aggregation_q1":
            "SELECT l_returnflag AS returnflag, l_linestatus AS linestatus, "
            "round(sum(l_quantity), 2) AS sum_qty, "
            "round(sum(l_extendedprice), 2) AS sum_base, "
            "round(avg(l_discount), 6) AS avg_disc, count(*) AS cnt "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
            "GROUP BY l_returnflag, l_linestatus",
        "q3_shipping_priority":
            "SELECT o_orderkey AS okey, "
            "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
            "FROM customer JOIN orders ON o_custkey = c_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' "
            "AND l_shipdate > TIMESTAMP '1997-01-01' "
            "GROUP BY 1 ORDER BY revenue DESC, okey LIMIT 10",
        "q5_local_supplier_volume":
            # the graph query correlates the money rel (CONTAINS) to the
            # supplier rel (SUPPLIED_BY) on (order, linenumber) — the
            # synthetic generator does NOT keep linenumber unique per
            # order, so the faithful relational form is a lineitem
            # self-join on that key, not the single-table TPC-H join
            "SELECT n_name AS nation, "
            "sum(CAST(round(lm.l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - lm.l_discount) * 100) AS BIGINT)) / 10000.0 "
            "AS revenue "
            "FROM customer, orders, lineitem lm, lineitem ls, supplier, "
            "nation, region "
            "WHERE c_custkey = o_custkey AND lm.l_orderkey = o_orderkey "
            "AND ls.l_orderkey = o_orderkey "
            "AND lm.l_linenumber = ls.l_linenumber "
            "AND ls.l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey "
            "AND r_name = 'ASIA' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01' "
            "GROUP BY 1 ORDER BY revenue DESC",
        "q10_returned_items":
            "SELECT c_custkey AS ck, n_name AS nation, "
            "sum(CAST(round(l_extendedprice * 100) AS BIGINT) * "
            "CAST(round((1 - l_discount) * 100) AS BIGINT)) / 10000.0 "
            "AS revenue "
            "FROM customer JOIN orders ON o_custkey = c_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "WHERE l_returnflag = 'R' "
            "AND o_orderdate >= TIMESTAMP '1996-01-01' "
            "AND o_orderdate < TIMESTAMP '1996-04-01' "
            "GROUP BY 1, 2 ORDER BY revenue DESC, ck LIMIT 20",
        "agg_count_distinct":
            "SELECT l_suppkey AS suppkey, count(DISTINCT l_orderkey) AS n_orders "
            "FROM lineitem GROUP BY l_suppkey",
        "agg_stddev":
            "SELECT o_orderstatus AS status, "
            "round(stddev_samp(o_totalprice), 2) AS sd, "
            "round(stddev_pop(o_totalprice), 2) AS sdp "
            "FROM orders GROUP BY o_orderstatus",
        "agg_percentile":
            "SELECT o_orderpriority AS priority, "
            "round(quantile_cont(o_totalprice, 0.5), 2) AS p50 "
            "FROM orders GROUP BY o_orderpriority",
        "agg_min_max_avg":
            "SELECT c_mktsegment AS segment, round(min(c_acctbal), 2) AS mn, "
            "round(max(c_acctbal), 2) AS mx, round(avg(c_acctbal), 2) AS av, "
            "count(*) AS n FROM customer GROUP BY c_mktsegment",
        "top_k":
            "SELECT c_custkey AS custkey, c_acctbal AS acctbal FROM customer "
            "ORDER BY acctbal DESC, custkey LIMIT 10",
        "skip_limit":
            "SELECT c_custkey AS custkey FROM customer ORDER BY custkey "
            "LIMIT 50 OFFSET 100",
        "sort_multi_key":
            "SELECT o_orderkey AS orderkey, o_orderstatus AS st, "
            "o_totalprice AS price FROM orders "
            "ORDER BY st ASC, price DESC, orderkey LIMIT 20",
        "union_all":
            "SELECT c_name AS name FROM customer "
            "UNION ALL SELECT s_name AS name FROM supplier",
        "union_distinct":
            "SELECT c_mktsegment AS v FROM customer "
            "UNION SELECT o_orderstatus AS v FROM orders",
        "distinct_op":
            "SELECT DISTINCT o_orderpriority AS priority FROM orders",
        "semi_apply":
            "SELECT count(*) AS n FROM customer WHERE EXISTS "
            "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
        "anti_semi_apply":
            "SELECT count(*) AS n FROM customer WHERE NOT EXISTS "
            "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
        "count_subquery":
            "SELECT c_custkey AS custkey, "
            "CAST(coalesce(cnt, 0) AS BIGINT) AS n_orders FROM customer "
            "LEFT JOIN (SELECT o_custkey, count(*) AS cnt FROM orders "
            "GROUP BY o_custkey) ON o_custkey = c_custkey",
        "select_or_semi_apply":
            "SELECT count(*) AS n FROM customer WHERE c_acctbal < 0 OR EXISTS "
            "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
        "select_or_anti_semi_apply":
            "SELECT count(*) AS n FROM customer WHERE NOT (c_acctbal < 0 "
            "OR EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))",
        "count_store_nodes":
            "SELECT count(*) AS n FROM supplier",
        "count_store_rels":
            "SELECT count(*) AS n FROM orders",
        "rollup_pattern_comprehension":
            "SELECT r_name AS region, CAST(count(n_nationkey) AS BIGINT) "
            "AS n_nations FROM region LEFT JOIN nation "
            "ON n_regionkey = r_regionkey GROUP BY r_name ORDER BY region",
        "rollup_path_comprehension":
            "SELECT n_name AS nation, '[1]' AS lens FROM nation "
            "WHERE n_nationkey <= 3 ORDER BY nation",
        "var_expand_fixed":
            "SELECT count(*) AS n FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey",
        "var_expand_range":
            "SELECT CAST((SELECT count(*) FROM orders WHERE o_custkey = 1) + 1"
            " + 2 * (SELECT count(*) FROM lineitem JOIN orders "
            "ON l_orderkey = o_orderkey WHERE o_custkey = 1) + 1 AS BIGINT) AS n",
        "shortest_path_op":
            "SELECT CAST(2 AS BIGINT) AS l, count(*) AS n FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey",
        "all_shortest_paths":
            "SELECT CAST(2 AS BIGINT) AS len, count(*) AS c "
            "FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey "
            "WHERE a.n_name = 'NATION_0' AND b.n_name = 'NATION_5'",
        "pruning_var_expand":
            "SELECT CAST("
            "(SELECT count(*) FROM nation JOIN region "
            " ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE')"
            " + (SELECT count(*) FROM customer JOIN nation "
            " ON c_nationkey = n_nationkey JOIN region "
            " ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE')"
            " + (SELECT count(*) FROM supplier JOIN nation "
            " ON s_nationkey = n_nationkey JOIN region "
            " ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE')"
            " AS BIGINT) AS c",
        "sel_any_shortest":
            "SELECT c_custkey AS ck, r_name AS rn, CAST(2 AS INTEGER) AS len "
            "FROM customer JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey WHERE c_custkey <= 300",
        "sel_shortest_one":
            "SELECT a.n_name AS an, b.n_name AS bn, CAST(2 AS INTEGER) AS len "
            "FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey "
            "AND a.n_nationkey < b.n_nationkey",
        "sel_shortest_groups":
            "SELECT b.n_name AS bn, CAST(2 AS INTEGER) AS len "
            "FROM nation a JOIN nation b ON a.n_regionkey = b.n_regionkey "
            "AND b.n_nationkey != a.n_nationkey WHERE a.n_name = 'NATION_0'",
        "sel_any_k":
            "SELECT l_orderkey AS ok, l_partkey AS pk, "
            "least(count(*), 2) AS n FROM lineitem "
            "WHERE l_orderkey <= 100 GROUP BY 1, 2",
        "call_scope_clause":
            "SELECT r_name AS rn, count(*) AS c FROM nation "
            "JOIN region ON n_regionkey = r_regionkey "
            "GROUP BY rn ORDER BY rn",
        "sel_shortest_path_nodes":
            "SELECT s_suppkey AS sk, "
            "'[' || s_name || ', ' || n_name || ', ' || r_name || ']' AS names, "
            "CAST(2 AS BIGINT) AS len FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE s_suppkey <= 100 ORDER BY sk",
        "sel_shortest_group_vars":
            "SELECT s_suppkey AS sk, CAST(2 AS INTEGER) AS hops, "
            "r_name AS region FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE s_suppkey <= 100 ORDER BY sk",
        "sel_shortest_k_unbounded":
            "SELECT s_suppkey AS sk, CAST(v AS BIGINT) AS len "
            "FROM supplier, (SELECT unnest([1, 2]) AS v) "
            "WHERE s_suppkey <= 50 ORDER BY sk, len",
        "sel_shortest_k_multi":
            # every customer->order->part walk has length 2; SHORTEST 2
            # keeps at most two walks per (customer, part) pair
            "SELECT o.o_custkey AS ck, CAST(l.l_partkey AS BIGINT) AS pk, "
            "least(count(*), 2) AS n "
            "FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "WHERE o.o_custkey <= 50 GROUP BY 1, 2 ORDER BY ck, pk",
        "sel_groups_k_unbounded":
            # one length-group per pair => all walks survive
            "SELECT o.o_custkey AS ck, CAST(l.l_partkey AS BIGINT) AS pk, "
            "count(*) AS n "
            "FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "WHERE o.o_custkey <= 20 GROUP BY 1, 2 ORDER BY ck, pk",
        "sel_shortest_qpp_multi":
            # QPP exits at Order after exactly one repetition (parts are
            # sinks for PLACED|CONTAINS), so ANY SHORTEST = one row per
            # distinct (customer, supplying supplier) pair at length 2
            "SELECT DISTINCT o.o_custkey AS ck, "
            "CAST(l.l_suppkey AS BIGINT) AS sk "
            "FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "WHERE o.o_custkey <= 10 ORDER BY ck, sk",
        "sel_all_shortest_unbounded":
            # every customer->order->part walk has length 2 = the minimum,
            # so ALL SHORTEST multiplicity = the orders x lineitem join
            "SELECT count(*) AS n FROM orders o "
            "JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "WHERE o.o_custkey <= 5",
        "projection_functions":
            "SELECT c_custkey AS custkey, upper(c_name) AS uname, "
            "substr(c_name, 1, 5) AS prefix, round(c_acctbal * 1.1, 4) AS scaled "
            "FROM customer ORDER BY custkey LIMIT 20",
        "case_expression":
            "SELECT o_orderkey AS orderkey, CASE o_orderstatus "
            "WHEN 'F' THEN 'finished' WHEN 'O' THEN 'open' ELSE 'other' END "
            "AS status FROM orders ORDER BY orderkey LIMIT 100",
        "temporal_year":
            "SELECT CAST(year(o_orderdate) AS BIGINT) AS y, count(*) AS n "
            "FROM orders GROUP BY 1",
        "temporal_filter":
            "SELECT count(*) AS n FROM orders "
            "WHERE o_orderdate >= TIMESTAMP '1995-01-01' "
            "AND o_orderdate < TIMESTAMP '1996-01-01'",
        "unwind_op":
            "SELECT CAST(x AS BIGINT) AS x, CAST(x * x AS BIGINT) AS sq "
            "FROM (SELECT unnest([1, 2, 3, 4, 5]) AS x)",
        "list_ops":
            "SELECT '[4, 16, 36, 64, 100]' AS l",
        "mixed_list_order":
            "SELECT unnest(['a', 'b', 'c', 'false']) AS s",
        "mixed_list_order_desc":
            "SELECT unnest(['<null>', '3', '2', '1.5']) AS s",
        "temporal_named_zone":
            "SELECT 'Europe/Paris' AS tz, "
            "CAST(epoch_ms(timezone('Europe/Paris', "
            "TIMESTAMP '2024-03-31 01:30:00')) AS BIGINT) AS ms, "
            "CAST(1 AS BIGINT) AS h, '+01:00' AS off, "
            "'2024-03-31T01:30+01:00[Europe/Paris]' AS s, "
            "CAST(epoch_ms(timezone('Europe/Paris', "
            "TIMESTAMP '2024-03-31 00:00:00')) AS BIGINT) AS day_ms",
        "temporal_zoned_arith":
            "SELECT CAST(epoch_ms(timezone('Europe/Paris', "
            "TIMESTAMP '2024-03-31 12:00:00')) AS BIGINT) AS day_ms, "
            "CAST(12 AS BIGINT) AS day_h, CAST(13 AS BIGINT) AS sec_h, "
            "CAST(epoch_ms(timezone('Europe/Paris', "
            "TIMESTAMP '2024-02-29 12:00:00')) AS BIGINT) AS back_ms, "
            "'2024-03-31T12:00+02:00[Europe/Paris]' AS s",
        "case_extended":
            "SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 'hot' WHEN o_orderpriority LIKE '3%' THEN 'mid' "
            "ELSE 'cold' END AS bucket, count(*) AS n FROM orders "
            "GROUP BY bucket ORDER BY bucket",
        "concat_ops":
            "SELECT c_custkey AS k, c_name || '-' || c_mktsegment AS tag, "
            "CAST(2 AS INTEGER) AS n FROM customer WHERE c_custkey <= 10 "
            "ORDER BY k",
        "mixed_path_order":
            "SELECT '[MAP NOT NULL, NODE NOT NULL, RELATIONSHIP NOT NULL, "
            "LIST<INTEGER NOT NULL> NOT NULL, PATH NOT NULL, POINT NOT NULL, "
            "STRING NOT NULL, BOOLEAN NOT NULL, FLOAT NOT NULL, NULL]' "
            "AS ord",
        "mixed_container_order":
            "SELECT unnest(['{k: 1}', '[1]', '[1, x]', '[1, 2]', 'a']) "
            "AS s",
        "mixed_deep_nesting":
            # eq_n: the null INSIDE [1, null] makes the comparison
            # UNDEFINED (SequenceValue.ternaryEqualsUsingRandomAccess)
            "SELECT '[[[1]], [[1], 0], [[2]], z]' AS ordered, "
            "'[[[1], a], b]' AS deep3, CAST(NULL AS BOOLEAN) AS eq_n, "
            "CAST(0 AS BOOLEAN) AS neq, CAST(1 AS BOOLEAN) AS inn",
        "mixed_list_nested":
            "SELECT '[1]' AS first, 'a' AS second, CAST(2 AS INTEGER) AS n, "
            "TRUE AS isl, TRUE AS eq",
        "mixed_cmp_predicates":
            "SELECT CAST(NULL AS BOOLEAN) AS a, FALSE AS b, TRUE AS c, "
            "CAST(NULL AS BOOLEAN) AS d, 'true' AS e, "
            "'INTEGER NOT NULL' AS vt",
        "edge_arithmetic":
            "SELECT CAST(3002399751580331 AS BIGINT) AS exact_div, "
            "CAST(-1 AS BIGINT) AS trunc_div, CAST(-1 AS BIGINT) AS "
            "mod_sign, CAST('nan' AS DOUBLE) AS nan_mod, "
            "CAST('inf' AS DOUBLE) AS cot0, CAST(8 AS DOUBLE) AS pow_v",
        "edge_nan_semantics":
            # NaN comparisons are FALSE (NaNAcceptance.feature:
            # NOT(0.0 < 0.0/0.0) = true), not undefined
            "SELECT FALSE AS eq, TRUE AS ne, FALSE AS lt, "
            "FALSE AS eqn, FALSE AS gi",
        "edge_coercions":
            "SELECT CAST(42 AS BIGINT) AS a, CAST(1 AS BIGINT) AS b, "
            "CAST(-3 AS BIGINT) AS c, CAST(NULL AS BIGINT) AS d, "
            "CAST(0 AS BIGINT) AS e, CAST(1 AS BIGINT) AS l0, "
            "CAST(NULL AS BIGINT) AS l1, CAST(2 AS BIGINT) AS l2",
        "edge_list_plus":
            "SELECT '2' AS a, CAST(1.0 AS DOUBLE) AS b, '[1, a]' AS hetero, "
            "'[a, 1]' AS hetero2",
        "edge_iso_dates":
            "SELECT '2020-01-14' AS w, '2020-04-01' AS q, '2020-05-02' AS o, "
            "'2020-02-01' AS ym, CAST(3 AS BIGINT) AS wk",
        "edge_duration_parse":
            "SELECT CAST(-3600 AS BIGINT) AS a, CAST(12 AS BIGINT) AS b, "
            "CAST(14 AS BIGINT) AS m, CAST(-1800 AS BIGINT) AS s",
        "edge_string_preds":
            "SELECT CAST(NULL AS BOOLEAN) AS a, 'b' AS b, "
            "CAST(NULL AS BOOLEAN) AS c, 'el' AS d",
        "edge_unwind_scalar":
            "SELECT CAST(5 AS BIGINT) AS v",
        "dyn_label_match":
            "SELECT r_name AS rn, count(*) AS c FROM nation "
            "JOIN region ON n_regionkey = r_regionkey "
            "GROUP BY r_name ORDER BY rn",
        "labels_function":
            "SELECT 'Nation' AS label, count(*) AS n FROM nation",
        "keys_function":
            "SELECT r_name AS name, CAST(2 AS BIGINT) AS n_keys FROM region "
            "ORDER BY name",
        "string_functions":
            "SELECT s_suppkey AS suppkey, lower(s_name) AS lname, "
            "reverse(s_name) AS rname, CAST(length(s_name) AS BIGINT) AS len "
            "FROM supplier ORDER BY suppkey",
        "call_db_labels":
            "SELECT label FROM (VALUES ('Customer'), ('Document'), "
            "('Embedding'), ('Nation'), ('Order'), ('Part'), ('Region'), "
            "('Supplier')) t(label)",
        # --- widened coverage ---
        "rel_by_id_seek":
            # rel key = l_orderkey * 64 + per-order ordinal (row_number
            # over the same total column order the graph mapping uses)
            "SELECT l_quantity AS q FROM (SELECT l_quantity, row_number() "
            "OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, "
            "l_partkey, l_suppkey, l_extendedprice, l_quantity, "
            "l_shipdate) AS rn FROM lineitem WHERE l_orderkey = 0) "
            "WHERE rn = 1",
        "all_rels_scan":
            "SELECT CAST((SELECT count(*) FROM nation)"
            " + (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)"
            " + (SELECT count(*) FROM orders)"
            " + 2 * (SELECT count(*) FROM lineitem) AS BIGINT) AS n",
        "intersection_label_scan":
            "SELECT count(*) AS n FROM customer",
        "subtraction_label_scan":
            "SELECT count(*) AS n FROM customer",
        "wildcard_label_scan":
            "SELECT CAST((SELECT count(*) FROM region)"
            " + (SELECT count(*) FROM nation)"
            " + (SELECT count(*) FROM customer)"
            " + (SELECT count(*) FROM supplier)"
            " + (SELECT count(*) FROM part)"
            " + (SELECT count(*) FROM orders)"
            " + (SELECT count(*) FROM documents)"
            " + (SELECT count(*) FROM embeddings) AS BIGINT) AS n",
        "neg_rel_type_scan":
            "SELECT * FROM (SELECT 'FROM_NATION' AS t, "
            "(SELECT count(*) FROM customer)"
            " + (SELECT count(*) FROM supplier) AS c "
            "UNION ALL SELECT 'PLACED', (SELECT count(*) FROM orders) "
            "UNION ALL SELECT 'SUPPLIED_BY', "
            "(SELECT count(*) FROM lineitem)) ORDER BY t",
        "project_endpoints":
            "SELECT n.n_name AS nation, r.r_name AS region FROM nation n "
            "JOIN region r ON n.n_regionkey = r.r_regionkey "
            "ORDER BY nation",
        "temporal_truncate":
            "SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m, "
            "count(*) AS c FROM orders GROUP BY 1 ORDER BY m LIMIT 5",
        "is_typed_predicate":
            "SELECT TRUE AS isf, TRUE AS isi, TRUE AS notstr, "
            "count(*) AS c FROM orders",
        "in_ternary_null":
            "SELECT CAST(NULL AS BOOLEAN) AS a, TRUE AS b, "
            "CAST(NULL AS BOOLEAN) AS c, FALSE AS d, TRUE AS e",
        "case_when_null":
            "SELECT 2 AS v, 'b' AS w",
        "isempty_fn":
            "SELECT count(*) AS c FROM documents WHERE length(text) > 0",
        "normalize_unicode":
            "SELECT chr(197) AS v",
        "triadic_selection":
            "SELECT count(*) AS n FROM customer c1 JOIN customer c2 "
            "ON c1.c_nationkey = c2.c_nationkey "
            "AND c1.c_custkey < c2.c_custkey WHERE c2.c_acctbal > 9000",
        "optional_match_where":
            "SELECT c_custkey AS ck, count(o_orderkey) AS n FROM customer "
            "LEFT JOIN orders ON o_custkey = c_custkey "
            "AND o_totalprice > 100000 GROUP BY c_custkey",
        "call_subquery":
            "SELECT r_name AS name, (SELECT count(*) FROM nation) AS nn "
            "FROM region ORDER BY name",
        "call_sub_order_limit":
            "SELECT r_name AS rn, (SELECT n_name FROM nation "
            "WHERE n_regionkey = r_regionkey "
            "ORDER BY n_nationkey DESC LIMIT 1) AS top_n "
            "FROM region ORDER BY rn",
        "optional_call_subquery":
            "SELECT count(*) AS n, CAST(0 AS BIGINT) AS hits FROM region",
        "call_subquery_correlated":
            "SELECT r_name AS name, (SELECT count(*) FROM nation "
            "WHERE n_regionkey = r_regionkey) AS nn FROM region ORDER BY name",
        "load_csv":
            "SELECT name, CAST(age AS BIGINT) AS age FROM "
            "read_csv('/root/repo/tests/fixtures/people.csv', header=true) "
            "ORDER BY name",
        "load_csv_linenumber":
            "SELECT CAST(row_number() OVER (ORDER BY name) + 1 AS BIGINT) "
            "AS ln, name FROM "
            "read_csv('/root/repo/tests/fixtures/people.csv', header=true) "
            "ORDER BY ln",
        "input_rows":
            "SELECT * FROM (VALUES (CAST(1 AS BIGINT), 'x'), "
            "(CAST(2 AS BIGINT), 'y')) t(a, b) ORDER BY a",
        "use_graph_select":
            "SELECT r_name AS region, count(*) AS nations FROM nation "
            "JOIN region ON n_regionkey = r_regionkey "
            "GROUP BY r_name ORDER BY region",
        "call_token_create":
            "SELECT unnest(['Brand', 'Region']) AS label",
        "dyn_label_route":
            "SELECT count(*) AS n FROM customer "
            "WHERE c_custkey <= 100 AND c_mktsegment = 'BUILDING'",
        "call_tx_metadata":
            "SELECT 'pipeline' AS app, '3' AS shard",
        "use_graph_by_name":
            "SELECT c_nationkey AS nk, count(*) AS customers "
            "FROM customer GROUP BY c_nationkey ORDER BY nk",
        "use_graph_union":
            "SELECT 'nation' AS kind, count(*) AS n FROM nation "
            "UNION ALL "
            "SELECT 'customer' AS kind, count(*) AS n FROM customer",
        "use_graph_call_sub":
            "SELECT r_name AS region, count(c_custkey) AS customers "
            "FROM region JOIN nation ON n_regionkey = r_regionkey "
            "LEFT JOIN customer ON c_nationkey = n_nationkey "
            "GROUP BY r_name ORDER BY region",
        "call_schema_viz":
            "SELECT '[Customer, Document, Embedding, Nation, Order, "
            "Part, Region, Supplier]' AS nodes, "
            "'[(:Customer)-[:FROM_NATION]->(:Nation), "
            "(:Customer)-[:PLACED]->(:Order), "
            "(:Nation)-[:IN_REGION]->(:Region), "
            "(:Order)-[:CONTAINS]->(:Part), "
            "(:Order)-[:SUPPLIED_BY]->(:Supplier), "
            "(:Supplier)-[:FROM_NATION]->(:Nation)]' AS relationships",
        "call_dbms_components":
            "SELECT 'neo4j-spark-engine' AS name, 'community' AS edition",
        "duration_functions":
            "SELECT o_orderkey AS ok, "
            "CAST(month(o_orderdate + INTERVAL 1 MONTH) AS BIGINT) AS m2, "
            "CAST(14 AS BIGINT) AS dm, CAST(2 AS BIGINT) AS dd "
            "FROM orders WHERE o_orderkey <= 20",
        "trim_variants":
            "SELECT 'x' AS t1, 'ab' AS t2, 'ab' AS t3, 'ab' AS t4",
        "collect_subquery":
            "SELECT r_name AS rn, '[' || (SELECT string_agg(n_name, ', ' "
            "ORDER BY n_name) FROM nation WHERE n_regionkey = r_regionkey) "
            "|| ']' AS ns FROM region ORDER BY rn",
        "call_in_transactions":
            "SELECT r_name AS rn, (SELECT count(*) FROM nation "
            "WHERE n_regionkey = r_regionkey) AS cnt, TRUE AS committed "
            "FROM region",
        "map_projection":
            "SELECT c_custkey AS ck, round(c_acctbal * 2, 2) AS scaled2, "
            "'[name, mktsegment]' AS ks FROM customer WHERE c_custkey <= 50",
        "with_pipeline":
            "SELECT count(*) AS n FROM (SELECT o_custkey FROM orders "
            "GROUP BY o_custkey HAVING count(*) > 5)",
        "with_orderby_limit":
            "SELECT round(sum(o_totalprice), 2) AS s FROM "
            "(SELECT o_totalprice FROM orders ORDER BY o_totalprice DESC "
            "LIMIT 5)",
        "skip_no_limit":
            "SELECT n_name AS name FROM nation ORDER BY name OFFSET 20",
        "percentile_disc":
            "SELECT quantile_disc(o_totalprice, 0.5) AS p FROM orders",
        "collect_agg":
            "SELECT r_name AS region, count(*) AS n FROM nation "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name "
            "ORDER BY region",
        "qpp_fixed":
            "SELECT count(*) AS n FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey",
        "qpp_range":
            "SELECT CAST((SELECT count(*) FROM orders WHERE o_custkey = 1) + 1"
            " + 2 * (SELECT count(*) FROM lineitem JOIN orders "
            "ON l_orderkey = o_orderkey WHERE o_custkey = 1) + 1 AS BIGINT) AS n",
        "qpp_group_rels":
            "SELECT CAST(1 AS BIGINT) AS nr, count(*) AS n FROM nation "
            "GROUP BY 1",
        "label_expr_nested":
            "SELECT CAST((SELECT count(*) FROM customer) + "
            "(SELECT count(*) FROM supplier) AS BIGINT) AS n",
        "label_expr_negated_group":
            "SELECT CAST((SELECT count(*) FROM nation) + "
            "(SELECT count(*) FROM region) AS BIGINT) AS n",
        "shortest_path_expr_unbound":
            "SELECT CAST(n_nationkey AS BIGINT) AS k, CAST(1 AS BIGINT) AS l FROM nation "
            "WHERE n_nationkey < 5 ORDER BY k",
        "qpp_nested_var":
            # c->nation->region decomposes two ways: one rep of inner
            # length 2, or two reps of inner length 1
            "SELECT c_custkey AS ck, CAST(2 AS BIGINT) AS n_paths "
            "FROM customer WHERE c_custkey <= 10 ORDER BY ck",
        "qpp_star":
            "SELECT CAST(2 * (SELECT count(*) FROM nation) AS BIGINT) AS n",
        "qpp_question":
            "SELECT CAST((SELECT count(*) FROM region) + "
            "(SELECT count(*) FROM nation) AS BIGINT) AS n",
        "qpp_node_where":
            "SELECT count(*) AS n FROM nation WHERE n_nationkey < 5",
        "shortest_path_expr":
            "SELECT r_name AS name, CASE WHEN r_regionkey = "
            "(SELECT n_regionkey FROM nation JOIN supplier "
            "ON s_nationkey = n_nationkey WHERE s_suppkey = 1) "
            "THEN CAST(2 AS BIGINT) ELSE NULL END AS l "
            "FROM region ORDER BY name",
        "qpp_multi_rel_unit":
            "SELECT c_custkey AS ck, [c_custkey, CAST(n_nationkey AS "
            "BIGINT), CAST(r_regionkey AS BIGINT)] AS seq FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE c_custkey <= 5 ORDER BY ck",
        "qpp_where_suffix_ref":
            "SELECT count(*) AS n FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE c_custkey <= 20 AND c_custkey <= r_regionkey * 5",
        "sel_pattern_where":
            "SELECT count(*) AS n FROM nation WHERE n_nationkey < 3",
        "sel_paren_path_var":
            "SELECT [CAST(0 AS BIGINT), CAST(n_regionkey + 100 AS BIGINT)]"
            " AS seq FROM nation WHERE n_nationkey = 0",
        "collect_union_subquery":
            "SELECT CAST((SELECT count(*) FROM region) + "
            "(SELECT count(DISTINCT n_name) FROM nation WHERE "
            "n_nationkey < 2 AND n_name NOT IN (SELECT r_name FROM region))"
            " AS BIGINT) AS n",
        "qpp_rel_shorthand":
            "SELECT count(*) AS n FROM nation",
        "qpp_path_length":
            "SELECT CAST(1 AS BIGINT) AS l, count(*) AS n FROM supplier",
        "label_expr_where":
            "SELECT CAST((SELECT count(*) FROM region) + "
            "(SELECT count(*) FROM nation) AS BIGINT) AS n",
        "dynamic_prop_key":
            "SELECT r_name AS name FROM region ORDER BY name",
        "skip_limit_exprs":
            "SELECT n_name AS name FROM nation ORDER BY name "
            "LIMIT 5 OFFSET 4",
        "exists_union_subquery":
            "SELECT count(*) AS n FROM region WHERE EXISTS "
            "(SELECT 1 FROM nation WHERE n_regionkey = r_regionkey)",
        "quantifiers":
            "SELECT true AS a, true AS b, true AS c, true AS d",
        "reduce_expr": "SELECT CAST(55 AS BIGINT) AS s",
        "head_last_tail":
            "SELECT CAST(1 AS BIGINT) AS h, CAST(3 AS BIGINT) AS l, "
            "CAST(2 AS BIGINT) AS t",
        "coalesce_fn":
            "SELECT c_mktsegment AS v, count(*) AS n FROM customer "
            "GROUP BY c_mktsegment",
        "case_searched":
            "SELECT CASE WHEN o_totalprice > 200000 THEN 'big' "
            "WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket, "
            "count(*) AS n FROM orders GROUP BY 1",
        "string_plus_concat":
            "SELECT r_name || '_x' AS v FROM region ORDER BY v",
        "list_membership":
            "SELECT count(*) AS n FROM orders "
            "WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')",
        "regex_full_match":
            "SELECT count(*) AS n FROM part WHERE regexp_full_match(p_name, "
            "'.*widget')",
        "xor_predicate":
            "SELECT count(*) AS n FROM customer WHERE "
            "(c_acctbal > 5000) <> (c_mktsegment = 'BUILDING')",
        "vector_similarity_fn":
            # Lucene-normalized cosine score (1 + cos)/2 in [0, 1]
            # (VectorIndexProcedures.java:142)
            "SELECT round((1 + list_cosine_similarity("
            "[1.0, 2.0, 3.0]::DOUBLE[], [3.0, 2.0, 1.0]::DOUBLE[])) / 2, "
            "6) AS s",
        "vector_euclidean_fn":
            "SELECT CAST(1.0 AS DOUBLE) AS a, CAST(0.038462 AS DOUBLE) AS b",
        "point_distance_fn":
            "SELECT CAST(5.0 AS DOUBLE) AS d",
        "point_withinbbox":
            "SELECT count(*) AS n FROM customer "
            "WHERE c_acctbal BETWEEN 0 AND 5000 "
            "AND (c_custkey % 100) BETWEEN 0 AND 50",
        "conversion_functions":
            "SELECT CAST(42 AS BIGINT) AS i, CAST(4.5 AS DOUBLE) AS f, TRUE AS b, "
            "'7' AS s, CAST(NULL AS BIGINT) AS x",
        "valuetype_fn":
            "SELECT 'INTEGER NOT NULL' AS i, 'STRING NOT NULL' AS s, "
            "'FLOAT NOT NULL' AS f, 'BOOLEAN NOT NULL' AS b, 'NULL' AS n, "
            "'LIST<INTEGER NOT NULL> NOT NULL' AS l",
        "get_degree":
            "SELECT n_name AS name, "
            "CAST(1 + coalesce(c.cnt, 0) + coalesce(s.cnt, 0) AS BIGINT) "
            "AS deg FROM nation "
            "LEFT JOIN (SELECT c_nationkey, count(*) AS cnt FROM customer "
            "GROUP BY 1) c ON c_nationkey = n_nationkey "
            "LEFT JOIN (SELECT s_nationkey, count(*) AS cnt FROM supplier "
            "GROUP BY 1) s ON s_nationkey = n_nationkey ORDER BY name",
        "exists_subquery":
            "SELECT count(*) AS n FROM supplier WHERE EXISTS "
            "(SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)",
        "exists_where_correlated":
            "SELECT count(*) AS n FROM supplier WHERE EXISTS "
            "(SELECT 1 FROM customer WHERE c_acctbal > s_acctbal + 2000.0)",
        "count_sub_where_correlated":
            "SELECT r_name AS name, "
            "CAST((SELECT count(*) FROM nation WHERE n_name > r_name) "
            "AS BIGINT) AS c FROM region ORDER BY name",
        "union_three_way":
            "SELECT r_name AS name FROM region "
            "UNION SELECT n_name AS name FROM nation "
            "UNION SELECT s_name AS name FROM supplier",
        "unwind_cross":
            "SELECT CAST(x AS BIGINT) AS x, y FROM "
            "(SELECT unnest([1, 2, 3]) AS x) CROSS JOIN "
            "(SELECT unnest(['a', 'b']) AS y)",
        "call_db_rel_types":
            "SELECT relationshipType FROM (VALUES ('CONTAINS'), "
            "('FROM_NATION'), ('IN_REGION'), ('PLACED'), ('SUPPLIED_BY')) "
            "t(relationshipType)",
        "call_db_property_keys":
            "SELECT propertyKey FROM (VALUES ('acctbal'), ('brand'), ('cls'), "
            "('custkey'), ('docid'), ('embedding'), ('lang'), ('mktsegment'), "
            "('name'), ('nationkey'), ('orderdate'), ('orderkey'), "
            "('orderpriority'), ('orderstatus'), ('partkey'), ('regionkey'), "
            "('retailprice'), ('size'), ('source'), ('suppkey'), ('text'), "
            "('totalprice'), ('type'), ('vecid')) t(propertyKey)",
        "ddl_index_catalog":
            "SELECT 'cov_idx' AS name, 'RANGE' AS type "
            "UNION ALL SELECT 'cov_uq', 'UNIQUE' ORDER BY name",
        "call_fulltext_indexed":
            # Lucene BM25 defaults (k1=1.2, b=0.75, Lucene>=8 form):
            # idf = ln(1+(N-df+0.5)/(df+0.5)), tfN = tf/(tf+k1*(1-b+b*dl/avgdl))
            "WITH docs AS (SELECT list_filter(string_split_regex("
            "lower(p_name), '\\W+'), x -> x != '') AS toks FROM part "
            "WHERE p_name IS NOT NULL), "
            "stats AS (SELECT count(*) AS nd, avg(len(toks)) AS avgdl "
            "FROM docs), "
            "sc AS (SELECT len(list_filter(toks, x -> x = 'widget')) AS tf, "
            "len(toks) AS dl FROM docs), "
            "dfq AS (SELECT count(*) AS dfr FROM sc WHERE tf > 0) "
            "SELECT count(*) AS n, round(sum("
            "ln(1 + (nd - dfr + 0.5) / (dfr + 0.5)) "
            "* tf / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 1) AS s "
            "FROM sc, stats, dfq WHERE tf > 0",
        "call_fulltext_query":
            "SELECT count(*) AS n FROM part WHERE p_name LIKE '%widget%'",
        "call_fulltext_rels":
            "SELECT count(*) AS n FROM lineitem "
            "WHERE lower(l_returnflag) = 'r'",
        "call_fulltext_phrase":
            "SELECT count(*) AS n FROM part "
            "WHERE p_name LIKE '%red widget%'",
        "call_fulltext_slop":
            # slop-1 two-word phrase == forward order, <= 1 intervening
            # token (adjusted-position window, see the query docstring)
            "SELECT count(*) AS n FROM documents WHERE "
            "regexp_matches(lower(text), "
            "'\\bdata( [a-z0-9]+)? table\\b')",
        "call_fulltext_analyzer":
            "SELECT count(*) AS n FROM documents "
            "WHERE regexp_matches(lower(text), '\\btables?\\b')",
        "call_fulltext_stopwords":
            "SELECT CAST(0 AS BIGINT) AS n_the, count(*) AS n_scan "
            "FROM documents "
            "WHERE regexp_matches(lower(text), '\\bscan\\b')",
        "call_fulltext_boolean":
            "SELECT count(*) AS n FROM part "
            "WHERE (p_name LIKE '%red%' OR p_name LIKE '%blue%') "
            "AND p_name LIKE '%widget%'",
        "call_fulltext_wildcard":
            "SELECT count(*) AS n FROM part "
            "WHERE regexp_matches(lower(p_name), "
            "'\\b(wid[a-z]*|gi.mo)\\b')",
        "call_fulltext_range":
            # tokens lexicographically in ['w','x') = tokens starting 'w'
            "SELECT count(*) AS n FROM part "
            "WHERE regexp_matches(lower(p_name), '\\bw')",
        "call_list_config":
            "SELECT 'true' AS v",
        "algo_connected_components":
            "SELECT CAST(1 + (SELECT count(*) FROM documents) + "
            "(SELECT count(*) FROM embeddings) AS BIGINT) AS n_components",
        "algo_pagerank":
            "SELECT CAST((SELECT count(*) FROM region) + (SELECT count(*) FROM nation)"
            " + (SELECT count(*) FROM customer) + (SELECT count(*) FROM supplier)"
            " + (SELECT count(*) FROM part) + (SELECT count(*) FROM orders)"
            " + (SELECT count(*) FROM documents) + (SELECT count(*) FROM embeddings)"
            " AS BIGINT) AS n, CAST(1.0 AS DOUBLE) AS s",
        "algo_sssp":
            "WITH o AS (SELECT o_orderkey FROM orders WHERE o_custkey = 1), "
            "li AS (SELECT * FROM lineitem WHERE l_orderkey IN "
            "(SELECT o_orderkey FROM o)), "
            "cn AS (SELECT c_nationkey FROM customer WHERE c_custkey = 1), "
            "sn AS (SELECT DISTINCT s_nationkey FROM supplier "
            "WHERE s_suppkey IN (SELECT l_suppkey FROM li)), "
            "n3 AS (SELECT s_nationkey FROM sn WHERE s_nationkey NOT IN "
            "(SELECT c_nationkey FROM cn)), "
            "r2 AS (SELECT n_regionkey FROM nation WHERE n_nationkey IN "
            "(SELECT c_nationkey FROM cn)), "
            "r4 AS (SELECT DISTINCT n_regionkey FROM nation "
            "WHERE n_nationkey IN (SELECT s_nationkey FROM n3) "
            "AND n_regionkey NOT IN (SELECT n_regionkey FROM r2)) "
            "SELECT * FROM ("
            "SELECT CAST(0.0 AS DOUBLE) AS dist, CAST(1 AS BIGINT) AS n UNION ALL "
            "SELECT 1.0, (SELECT count(*) FROM o) + 1 UNION ALL "
            "SELECT 2.0, 1 + (SELECT count(DISTINCT l_partkey) FROM li) "
            "+ (SELECT count(DISTINCT l_suppkey) FROM li) UNION ALL "
            "SELECT 3.0, (SELECT count(*) FROM n3) UNION ALL "
            "SELECT 4.0, (SELECT count(*) FROM r4)) WHERE n > 0",
        "algo_astar":
            "SELECT CAST(2 AS DOUBLE) AS dist",
        "algo_apsp":
            # {customer,supplier}-[:FROM_NATION]->nation-[:IN_REGION]->
            # region DAG: dist 1 = direct edges, dist 2 = closures to the
            # region
            "SELECT CAST(1 AS DOUBLE) AS dist, "
            "CAST((SELECT count(*) FROM customer) + "
            "(SELECT count(*) FROM supplier) + "
            "(SELECT count(*) FROM nation) AS BIGINT) AS n "
            "UNION ALL SELECT CAST(2 AS DOUBLE), "
            "CAST((SELECT count(*) FROM customer) + "
            "(SELECT count(*) FROM supplier) AS BIGINT) ORDER BY dist",
        "algo_degree_centrality":
            "SELECT CAST((SELECT count(*) FROM region) + "
            "(SELECT count(*) FROM nation) + (SELECT count(*) FROM customer)"
            " + (SELECT count(*) FROM supplier) + "
            "(SELECT count(*) FROM part) + (SELECT count(*) FROM orders) + "
            "(SELECT count(*) FROM documents) + "
            "(SELECT count(*) FROM embeddings) AS BIGINT) AS n, "
            "CAST(2 * ((SELECT count(*) FROM nation)"
            " + (SELECT count(*) FROM customer)"
            " + (SELECT count(*) FROM supplier)"
            " + (SELECT count(*) FROM orders)"
            " + 2 * (SELECT count(*) FROM lineitem)) AS BIGINT) AS s",
        "algo_triangle_count": "SELECT CAST(0 AS BIGINT) AS n",
        "algo_node_similarity":
            "WITH e AS (SELECT DISTINCT l_orderkey AS src, l_partkey AS dst "
            "FROM lineitem), "
            "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src), "
            "inter AS (SELECT a.src AS pa, b.src AS pb, count(*) AS i "
            "FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src "
            "GROUP BY 1, 2), "
            "sim AS (SELECT i, round(CAST(i AS DOUBLE) / "
            "(da.deg + db.deg - i), 6) AS s FROM inter "
            "JOIN deg da ON da.src = inter.pa "
            "JOIN deg db ON db.src = inter.pb) "
            "SELECT count(*) AS n, CAST(sum(i) AS BIGINT) AS s, "
            "CAST(sum(CASE WHEN s >= 0.3 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_sim FROM sim",
        "algo_all_paths":
            "WITH fam_a AS (SELECT count(*) AS c FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey JOIN lineitem l ON l.l_orderkey = o.o_orderkey JOIN supplier s ON s.s_suppkey = l.l_suppkey WHERE c.c_nationkey = 0 AND s.s_nationkey = 5), fam_b AS (SELECT count(*) AS c FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey JOIN supplier s1 ON s1.s_suppkey = l1.l_suppkey JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey WHERE s1.s_nationkey = 0 AND s2.s_nationkey = 5), fam_c AS (SELECT count(*) AS c FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey JOIN orders o ON o.o_orderkey = l.l_orderkey JOIN customer cu ON cu.c_custkey = o.o_custkey WHERE s.s_nationkey = 0 AND cu.c_nationkey = 5) SELECT * FROM (SELECT CAST(2 AS BIGINT) AS length, CAST((SELECT CASE WHEN (SELECT n_regionkey FROM nation WHERE n_nationkey = 0) = (SELECT n_regionkey FROM nation WHERE n_nationkey = 5) THEN 1 ELSE 0 END) AS BIGINT) AS n UNION ALL SELECT CAST(4 AS BIGINT), CAST(fam_a.c + fam_b.c + fam_c.c AS BIGINT) FROM fam_a, fam_b, fam_c) WHERE n > 0 ORDER BY length",
        "algo_all_simple_paths":
            "WITH fam_a AS (SELECT count(*) AS c FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey JOIN lineitem l ON l.l_orderkey = o.o_orderkey JOIN supplier s ON s.s_suppkey = l.l_suppkey WHERE c.c_nationkey = 0 AND s.s_nationkey = 5), fam_b AS (SELECT count(*) AS c FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey JOIN supplier s1 ON s1.s_suppkey = l1.l_suppkey JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey WHERE s1.s_nationkey = 0 AND s2.s_nationkey = 5), fam_c AS (SELECT count(*) AS c FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey JOIN orders o ON o.o_orderkey = l.l_orderkey JOIN customer cu ON cu.c_custkey = o.o_custkey WHERE s.s_nationkey = 0 AND cu.c_nationkey = 5) SELECT * FROM (SELECT CAST(2 AS BIGINT) AS length, CAST((SELECT CASE WHEN (SELECT n_regionkey FROM nation WHERE n_nationkey = 0) = (SELECT n_regionkey FROM nation WHERE n_nationkey = 5) THEN 1 ELSE 0 END) AS BIGINT) AS n UNION ALL SELECT CAST(4 AS BIGINT), CAST(fam_a.c + fam_b.c + fam_c.c AS BIGINT) FROM fam_a, fam_b, fam_c) WHERE n > 0 ORDER BY length",
        "algo_exact_depth_paths":
            "WITH fam_a AS (SELECT count(*) AS c FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey JOIN lineitem l ON l.l_orderkey = o.o_orderkey JOIN supplier s ON s.s_suppkey = l.l_suppkey WHERE c.c_nationkey = 0 AND s.s_nationkey = 5), fam_b AS (SELECT count(*) AS c FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey JOIN supplier s1 ON s1.s_suppkey = l1.l_suppkey JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey WHERE s1.s_nationkey = 0 AND s2.s_nationkey = 5), fam_c AS (SELECT count(*) AS c FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey JOIN orders o ON o.o_orderkey = l.l_orderkey JOIN customer cu ON cu.c_custkey = o.o_custkey WHERE s.s_nationkey = 0 AND cu.c_nationkey = 5) SELECT CAST(fam_a.c + fam_b.c + fam_c.c AS BIGINT) AS n FROM fam_a, fam_b, fam_c",
        "algo_k_shortest_paths":
            # every customer->order->part path costs 2 hops; k = 2 keeps
            # least(2, multiplicity) of them
            "SELECT least(2, count(*)) AS n, "
            "CASE WHEN count(*) > 0 THEN CAST(2.0 AS DOUBLE) END AS c "
            "FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey "
            "WHERE o.o_custkey = 102 AND l.l_partkey = 1784",
        "algo_sssp_correlated":
            # directed reach from a nation: itself (0) + its region (1)
            "SELECT CAST(n_nationkey AS BIGINT) AS k, "
            "CAST(2 AS BIGINT) AS reach, CAST(1.0 AS DOUBLE) AS md "
            "FROM nation ORDER BY k",
        "algo_sssp_weighted":
            "SELECT CAST(count(*) + 1 AS BIGINT) AS n, round(sum(md), 2) AS s "
            "FROM (SELECT l_partkey, min(l_quantity) AS md FROM lineitem "
            "WHERE l_orderkey = 1 GROUP BY l_partkey)",
        "call_vector_query":
            "SELECT CAST(8000000000000 + vec_id AS BIGINT) AS node, "
            "round((1 + list_cosine_similarity(embedding::DOUBLE[], "
            "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)"
            ")) / 2, 6) "
            "AS score FROM embeddings "
            "ORDER BY list_cosine_similarity(embedding::DOUBLE[], "
            "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)) "
            "DESC, node LIMIT 5",
        # --- coverage long tail 2 ---
        "string_left_right":
            "SELECT left('hello', 3) AS l, right('hello', 3) AS r, "
            "trim('xxaxx', 'x') AS b, replace('abcabc', 'b', 'Z') AS rep, "
            "str_split('a,b,c', ',')[2] AS sp, "
            "CAST(nullif(1, 1) AS BIGINT) AS ni",
        "properties_fn": "SELECT r_name AS name FROM region ORDER BY name",
        "list_conversions":
            "SELECT CAST(1 AS BIGINT) AS a, CAST(1.5 AS DOUBLE) AS f, "
            "'2' AS s, true AS b",
        "rollup_apply_reduce":
            "SELECT r_name AS rn, CAST(coalesce(s, 0) AS BIGINT) AS sumkeys "
            "FROM region LEFT JOIN (SELECT n_regionkey, sum(n_nationkey) AS s "
            "FROM nation GROUP BY n_regionkey) ON n_regionkey = r_regionkey "
            "ORDER BY rn",
        "let_anti_semi_apply":
            "SELECT c_custkey AS ck, NOT EXISTS (SELECT 1 FROM orders "
            "WHERE o_custkey = c_custkey) AS no_order FROM customer "
            "ORDER BY ck LIMIT 40",
        "load_csv_no_header":
            "SELECT column0 AS c0 FROM read_csv("
            "'/root/repo/tests/fixtures/people.csv', header=false, "
            "all_varchar=true) ORDER BY c0",
        "ordered_union":
            "SELECT name FROM (SELECT r_name AS name FROM region "
            "UNION ALL SELECT n_name AS name FROM nation) "
            "ORDER BY name LIMIT 8",
        "point_3d_distance": "SELECT CAST(3.0 AS DOUBLE) AS d",
        "temporal_epoch_millis":
            "SELECT o_orderkey AS ok, "
            "epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS em "
            "FROM orders WHERE o_orderkey <= 10 ORDER BY ok",
        # --- updating operators (§2.10) ---
        "write_create":
            "SELECT CAST(100 AS BIGINT) AS n, CAST(5050 AS BIGINT) AS s",
        "write_merge_rel": "SELECT CAST(3 AS BIGINT) AS n",
        "write_match_foreach":
            "SELECT CAST(10 AS BIGINT) AS n, CAST(15 AS BIGINT) AS s",
        "write_set_from_entity":
            "SELECT CAST(1 AS BIGINT) AS n, CAST(1 AS BIGINT) AS withname",
        "write_foreach":
            "SELECT CAST(50 AS BIGINT) AS n, CAST(1275 AS BIGINT) AS s",
        "write_set_property":
            "SELECT count(*) AS n FROM customer WHERE c_acctbal < 0",
        "write_set_label":
            "SELECT count(*) AS n FROM customer WHERE c_acctbal >= 9000",
        "write_detach_delete":
            "SELECT CAST((SELECT count(*) FROM region) + (SELECT count(*) FROM nation)"
            " + (SELECT count(*) FROM customer) + (SELECT count(*) FROM part)"
            " + (SELECT count(*) FROM orders)"
            " + (SELECT count(*) FROM documents) + (SELECT count(*) FROM embeddings)"
            " AS BIGINT) AS n",
        "write_merge":
            "SELECT count(*) AS n FROM nation",
        "ddl_user_admin":
            "SELECT * FROM (VALUES ('alice', TRUE), ('bob', FALSE), "
            "('neo4j', FALSE)) AS t(username, change_required) "
            "ORDER BY username",
        "call_in_tx_on_error":
            "SELECT * FROM (VALUES "
            "(CAST(0 AS BIGINT), TRUE, FALSE, TRUE,  CAST(6 AS BIGINT)), "
            "(CAST(1 AS BIGINT), TRUE, TRUE,  FALSE, CAST(6 AS BIGINT)), "
            "(CAST(2 AS BIGINT), TRUE, TRUE,  FALSE, CAST(6 AS BIGINT)), "
            "(CAST(3 AS BIGINT), TRUE, FALSE, TRUE,  CAST(6 AS BIGINT)), "
            "(CAST(4 AS BIGINT), TRUE, TRUE,  FALSE, CAST(6 AS BIGINT))"
            ") AS t(i, started, committed, has_err, n_comm) ORDER BY i",
        "call_in_tx_break":
            "SELECT * FROM (VALUES "
            "(CAST(0 AS BIGINT), TRUE,  FALSE, TRUE,  CAST(4 AS BIGINT)), "
            "(CAST(1 AS BIGINT), TRUE,  TRUE,  TRUE,  CAST(4 AS BIGINT)), "
            "(CAST(2 AS BIGINT), TRUE,  TRUE,  TRUE,  CAST(4 AS BIGINT)), "
            "(CAST(3 AS BIGINT), TRUE,  FALSE, TRUE,  CAST(4 AS BIGINT)), "
            "(CAST(4 AS BIGINT), FALSE, FALSE, FALSE, CAST(4 AS BIGINT))"
            ") AS t(i, started, committed, has_tx, n_comm) ORDER BY i",
        "call_in_tx_concurrent":
            "SELECT CAST(40 AS BIGINT) AS n, CAST(820 AS BIGINT) AS s",
        "call_agg_empty_group":
            "SELECT n_nationkey AS k, "
            "(SELECT count(*) FROM customer c WHERE c.c_nationkey = "
            "n.n_nationkey AND c.c_acctbal < -997) AS nc, "
            "(SELECT round(coalesce(sum(c.c_acctbal), 0.0), 2) "
            "FROM customer c WHERE c.c_nationkey = n.n_nationkey "
            "AND c.c_acctbal < -997) AS s "
            "FROM nation n WHERE n_nationkey < 5 ORDER BY k",
        "rel_reuse_same_match":
            "SELECT CAST(0 AS BIGINT) AS n",
        "rel_reuse_cross_match":
            "SELECT CAST((SELECT count(*) FROM customer) + "
            "(SELECT count(*) FROM supplier) AS BIGINT) AS n",
        "bool_list_coercion":
            "SELECT TRUE AS a, FALSE AS b, TRUE AS c, TRUE AS d",
        "valuetype_list_unions":
            "SELECT * FROM (VALUES "
            "('LIST<INTEGER NOT NULL> NOT NULL'), "
            "('LIST<BOOLEAN NOT NULL | STRING NOT NULL> NOT NULL'), "
            "('LIST<NOTHING> NOT NULL'), "
            "('LIST<NULL> NOT NULL'), "
            "('LIST<INTEGER> NOT NULL')) AS t(t)",
        "pattern_comp_outer_var":
            "SELECT n_nationkey AS k, "
            "(SELECT count(*) FROM customer c WHERE c.c_nationkey = "
            "n.n_nationkey AND c.c_acctbal > 1000.0) AS d "
            "FROM nation n WHERE n_nationkey < 3 ORDER BY k",
        "rel_type_algebra":
            "SELECT CAST((SELECT count(*) FROM nation) + "
            "(SELECT count(*) FROM orders) + "
            "2 * (SELECT count(*) FROM lineitem) AS BIGINT) AS n",
        "nested_call_subquery":
            "SELECT n_nationkey AS k, "
            "CAST(n_nationkey * 10 AS BIGINT) AS t "
            "FROM nation WHERE n_nationkey < 3 ORDER BY k",
        "listcomp_correlated_subq":
            "SELECT r_regionkey AS k, "
            "[(SELECT count(*) FROM nation n "
            "WHERE n.n_regionkey = r.r_regionkey)] AS d "
            "FROM region r ORDER BY k",
        "path_anon_rel":
            "SELECT CAST(1 AS BIGINT) AS s, CAST(2 AS BIGINT) AS c",
        "exists_agg_body":
            "SELECT c_custkey AS k, TRUE AS e FROM customer "
            "WHERE c_custkey <= 20 ORDER BY k",
        "subquery_null_entity":
            "SELECT CAST(0 AS BIGINT) AS c, CAST(0 AS BIGINT) AS d, "
            "FALSE AS e",
        "literal_underscores":
            "SELECT CAST(1000000 AS BIGINT) AS a, "
            "CAST(171 AS BIGINT) AS b, CAST(63 AS BIGINT) AS c, "
            "CAST(10.25 AS DOUBLE) AS d, 1e10 AS e",
        "limit_reduce_expr":
            "SELECT r_name AS n FROM region ORDER BY n LIMIT 2",
        "exists_leading_agg":
            "SELECT n_nationkey AS k FROM nation "
            "WHERE n_nationkey < 5 AND n_regionkey = 1 ORDER BY k",
        "create_named_path":
            "SELECT * FROM (VALUES (CAST(10 AS BIGINT)), (20), (30)) "
            "AS t(w)",
        "union_unit_call":
            "SELECT CAST(2 * (SELECT count(*) FROM region) AS BIGINT) AS c",
        "shortest_path_pred_fallback":
            "SELECT * FROM (VALUES ('A'), ('B'), ('C'), ('D')) AS t(node)",
        "write_merge_chain":
            "SELECT CAST(3 AS BIGINT) AS hubs, CAST(2 AS BIGINT) AS wires",
        "write_remove":
            "SELECT count(*) AS n FROM part",
        "write_merge_on_clauses":
            "SELECT 'SEEN' AS name",
        "write_remove_label":
            "SELECT CAST(count(*) - 5 AS BIGINT) AS n FROM nation",
        "write_delete_rel":
            "SELECT CAST(0 AS BIGINT) AS n",
        "write_set_props_map":
            "SELECT CAST(7 * count(*) AS BIGINT) AS s FROM region",
        "write_create_rel":
            "SELECT count(*) AS n FROM customer WHERE c_custkey <= 3",
        # --- extensions ---
        "dedup_exact":
            "SELECT lang, count(DISTINCT text) AS n_unique FROM documents "
            "GROUP BY lang",
        "text_scrub_pii":
            "WITH t AS (SELECT doc_id, concat(text, ' contact: user', "
            "CAST(doc_id AS VARCHAR), '@example.com') AS s FROM documents) "
            "SELECT doc_id, "
            "regexp_replace(regexp_replace(regexp_replace(s, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<email>', "
            "'g'), '(?:\\+\\d{1,3}[-. ]?)?\\(?\\d{3}\\)?[-. ]?\\d{3}"
            "[-. ]?\\d{4}', '<phone>', 'g'), "
            "'\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<ipv4>', 'g') "
            "AS scrubbed, "
            "CAST(len(regexp_extract_all(s, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) "
            "AS n_email, "
            "CAST(len(regexp_extract_all(s, "
            "'(?:\\+\\d{1,3}[-. ]?)?\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?"
            "\\d{4}')) AS BIGINT) AS n_phone, "
            "CAST(len(regexp_extract_all(s, "
            "'\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b')) AS BIGINT) AS n_ipv4 "
            "FROM t ORDER BY doc_id LIMIT 50",
        "text_dup_lines":
            "WITH l AS (SELECT doc_id, list_filter(string_split("
            "replace(text, ' ', chr(10)), chr(10)), x -> trim(x) != '') "
            "AS ls FROM documents) "
            "SELECT doc_id, CASE WHEN len(ls) <= 0 THEN 0.0 ELSE "
            "round((len(ls) - len(list_distinct(list_transform(ls, "
            "x -> trim(x))))) / CAST(len(ls) AS DOUBLE), 6) END "
            "AS dup_ratio FROM l ORDER BY doc_id LIMIT 100",
        "text_dup_ngrams":
            # 2-grams via list comprehension over the token list; the
            # Spark side builds the same windows with F.get lookups
            "WITH t AS (SELECT doc_id, [x for x in string_split_regex("
            "lower(text), '[^a-z0-9'']+') if x <> ''] AS w "
            "FROM documents) "
            "SELECT doc_id, CASE WHEN len(w) >= 2 THEN "
            "round(1.0 - len(list_distinct([w[i] || ' ' || w[i+1] "
            "for i in range(1, len(w))])) / CAST(len(w) - 1 AS DOUBLE), 6) "
            "ELSE 0.0 END AS dup2 FROM t ORDER BY doc_id LIMIT 200",
        "text_stats":
            "SELECT doc_id, CAST(len(list_filter(string_split_regex("
            "lower(text), '[^a-z0-9'']+'), t -> t != '')) AS BIGINT) AS n_tokens, "
            "CAST(length(text) AS BIGINT) AS n_chars FROM documents",
        # Deterministic sampling: the md5 backend is bit-reproducible in
        # DuckDB, so these are full value oracles, not rows-only checks.
        "dedup_resolve":
            "SELECT CAST(COUNT(*) AS BIGINT) AS kept, "
            "CAST(SUM(mid) AS BIGINT) AS id_sum FROM "
            "(SELECT MIN(doc_id) AS mid FROM documents GROUP BY text)",
        "sample_hash_split":
            "SELECT split, count(*) AS n FROM (SELECT "
            + _md5_split("doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, 42)
            + " AS split FROM documents) GROUP BY split ORDER BY split",
        "sample_stratified":
            f"SELECT doc_id, lang FROM documents WHERE {_md5_u('doc_id', 7)}"
            " < CASE lang WHEN 'en' THEN CAST(0.5 AS DOUBLE) WHEN 'de' THEN "
            "CAST(0.2 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END ORDER BY doc_id",
        "sample_topk":
            "SELECT doc_id, lang FROM (SELECT doc_id, lang FROM documents "
            f"ORDER BY {_md5_u('doc_id', 5)} LIMIT 50) ORDER BY doc_id",
        "sample_weighted":
            "SELECT doc_id FROM (SELECT doc_id FROM documents "
            "WHERE CAST(n_chars AS DOUBLE) > 0 "
            f"ORDER BY pow({_md5_u('doc_id', 11)}, "
            "1.0 / CAST(n_chars AS DOUBLE)) DESC LIMIT 30) ORDER BY doc_id",
        "pack_sequences":
            "WITH t AS (SELECT doc_id, "
            "CAST(len(list_filter(string_split_regex(lower(text), "
            "'[^a-z0-9'']+'), x -> x != '')) AS BIGINT) AS n_tokens, "
            "substring(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 13) "
            "AS pk FROM documents), "
            "c AS (SELECT doc_id, n_tokens, COALESCE(SUM(n_tokens) OVER "
            "(ORDER BY pk, doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
            "1 PRECEDING), 0) AS gpos FROM t) "
            "SELECT doc_id, n_tokens, "
            "CAST(floor(gpos / 2048) AS BIGINT) AS pack_id, "
            "CAST(gpos % 2048 AS BIGINT) AS pack_offset FROM c "
            "ORDER BY doc_id",
        "sample_kfold":
            f"SELECT CAST(LEAST(floor({_md5_u('doc_id', 1)} * 5), 4) "
            "AS INTEGER) AS fold, count(*) AS n FROM documents "
            "GROUP BY fold ORDER BY fold",
        "sample_dataset_mix":
            "WITH two AS (SELECT source FROM documents GROUP BY source "
            "ORDER BY source LIMIT 2), "
            "n AS (SELECT d.source, count(*) AS c FROM documents d "
            "JOIN two t ON d.source = t.source GROUP BY d.source), "
            "s AS (SELECT source, CAST(c AS DOUBLE) AS c, CASE WHEN source = "
            "(SELECT min(source) FROM two) THEN CAST(0.75 AS DOUBLE) ELSE "
            "CAST(0.25 AS DOUBLE) END AS share FROM n), "
            "sc AS (SELECT min(c / share) AS scale FROM s), "
            "r AS (SELECT source, LEAST(CAST(1.0 AS DOUBLE), share * "
            "(SELECT scale FROM sc) / c) AS rate FROM s) "
            "SELECT d.source AS mix_source, count(*) AS n "
            "FROM documents d JOIN r ON d.source = r.source "
            f"WHERE {_md5_u('doc_id', 4)} < r.rate "
            "GROUP BY d.source ORDER BY mix_source",
        "events_json_props":
            "SELECT event_type, count(*) AS n FROM events "
            "WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50 "
            "GROUP BY event_type",
        "stream_dedup":
            "SELECT count(*) AS n FROM (SELECT DISTINCT event_id, ts, user_id, "
            "event_type, value, props FROM events)",
        "events_stream_join":
            "SELECT l.user_id AS user_id, count(*) AS n_pairs "
            "FROM events l JOIN events r ON l.event_type = 'click' "
            "AND r.event_type = 'view' AND l.user_id = r.user_id "
            "AND r.ts >= l.ts - INTERVAL 600 SECONDS AND r.ts < l.ts "
            "GROUP BY l.user_id ORDER BY user_id LIMIT 100",
        "events_tumbling_window":
            "SELECT CAST(extract(epoch FROM date_trunc('hour', ts)) AS BIGINT) "
            "AS window_start, event_type, count(*) AS n, "
            "round(sum(value), 2) AS total_value FROM events "
            "GROUP BY 1, 2",
        "events_sliding_window":
            "WITH e AS (SELECT to_timestamp(floor(extract(epoch FROM ts) "
            "/ 1800) * 1800) AS s1, value FROM events), "
            "w AS (SELECT s1 AS ws, value FROM e "
            "UNION ALL SELECT s1 - INTERVAL 30 MINUTE AS ws, value FROM e) "
            "SELECT CAST(extract(epoch FROM ws) AS BIGINT) AS window_start, "
            "round(avg(value), 6) AS avg_value, count(*) AS n "
            "FROM w GROUP BY 1",
        "events_session_window":
            "WITH marked AS (SELECT user_id, ts, value, CASE WHEN "
            "ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) "
            ">= INTERVAL 10 MINUTE OR lag(ts) OVER (PARTITION BY user_id "
            "ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS new_s FROM events), "
            "sessions AS (SELECT user_id, ts, value, sum(new_s) OVER "
            "(PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) "
            "AS sid FROM marked) "
            "SELECT user_id, CAST(floor(extract(epoch FROM min(ts))) AS BIGINT) "
            "AS session_start, count(*) AS n_events, "
            "round(sum(value), 2) AS session_value "
            "FROM sessions GROUP BY user_id, sid",
        "embedding_quantize":
            "WITH e AS (SELECT vec_id, list_transform(embedding, "
            "x -> CAST(x AS DOUBLE)) AS v FROM embeddings), "
            "s AS (SELECT vec_id, v, CASE WHEN list_max(list_transform(v, "
            "x -> abs(x))) = 0 THEN 1.0 ELSE list_max(list_transform(v, "
            "x -> abs(x))) END AS scale FROM e) "
            "SELECT vec_id, round(scale, 6) AS qscale, "
            "array_to_string(list_transform(v, x -> CAST(round(greatest(least("
            "x / scale * 127.0, 127.0), -127.0)) AS INT)), ',') AS qvec "
            "FROM s ORDER BY vec_id LIMIT 100",
        "embedding_normalize":
            "SELECT vec_id, CASE WHEN sqrt(list_sum(list_transform("
            "embedding, x -> CAST(x AS DOUBLE) * x))) = 0 THEN CAST(0.0 AS DOUBLE) "
            "ELSE CAST(1.0 AS DOUBLE) END AS unit_norm FROM embeddings "
            "ORDER BY vec_id LIMIT 100",
        "knn_bruteforce":
            "SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], "
            "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS score "
            "FROM embeddings WHERE vec_id != 0 "
            "ORDER BY score DESC, vec_id LIMIT 10",
        "knn_join":
            "WITH scored AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
            "round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 6) AS score "
            "FROM embeddings q CROSS JOIN embeddings c "
            "WHERE q.vec_id < 5 AND c.vec_id >= 5), "
            "ranked AS (SELECT *, row_number() OVER (PARTITION BY query_id "
            "ORDER BY score DESC, neighbor_id) AS rn FROM scored) "
            "SELECT query_id, neighbor_id, score FROM ranked WHERE rn <= 3",
        "text_chunking":
            # stride=20 (max_tokens=24, overlap=4); last start capped at
            # len-overlap-1 so no chunk is contained in its predecessor
            "WITH w AS (SELECT doc_id, string_split(text, ' ') AS words "
            "FROM documents), "
            "e AS (SELECT doc_id, words, unnest(range(0, "
            "greatest(len(words) - 5, 0) + 1, 20)) AS start FROM w) "
            "SELECT doc_id, CAST(start // 20 AS BIGINT) AS chunk_id, "
            "array_to_string(list_slice(words, start + 1, start + 24), ' ') "
            "AS chunk_text, "
            "CAST(len(list_slice(words, start + 1, start + 24)) AS BIGINT) "
            "AS n_tokens FROM e ORDER BY doc_id, chunk_id",
        "text_tfidf":
            "WITH terms AS (SELECT doc_id, unnest(string_split(text, ' ')) "
            "AS term FROM documents), "
            "tf AS (SELECT doc_id, term, count(*) AS tf FROM terms "
            "GROUP BY 1, 2), "
            "dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1), "
            "n AS (SELECT count(DISTINCT doc_id) AS nd FROM documents), "
            "sc AS (SELECT doc_id, term, round(tf * ln(nd / df), 6) AS tfidf "
            "FROM tf JOIN dfq USING (term) CROSS JOIN n), "
            "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
            "ORDER BY tfidf DESC, term) AS rank FROM sc) "
            "SELECT doc_id, term, tfidf, CAST(rank AS BIGINT) AS rank "
            "FROM r WHERE rank <= 3 ORDER BY doc_id, rank",
        "text_contamination":
            "WITH tw AS (SELECT doc_id, string_split(text, ' ') AS w "
            "FROM documents WHERE source != 'src0'), "
            "tg AS (SELECT doc_id, list_distinct(CASE WHEN len(w) - 2 >= 1 "
            "THEN list_transform(range(1, len(w) - 1), "
            "i -> array_to_string(list_slice(w, i, i + 2), ' ')) "
            "ELSE [] END) AS grams FROM tw), "
            "bw AS (SELECT string_split(text, ' ') AS w FROM documents "
            "WHERE source = 'src0'), "
            "bg AS (SELECT DISTINCT unnest(CASE WHEN len(w) - 2 >= 1 "
            "THEN list_transform(range(1, len(w) - 1), "
            "i -> array_to_string(list_slice(w, i, i + 2), ' ')) "
            "ELSE [] END) AS gram FROM bw), "
            "dg AS (SELECT doc_id, unnest(grams) AS gram FROM tg), "
            "j AS (SELECT dg.doc_id, CASE WHEN b.gram IS NULL THEN 0 ELSE 1 "
            "END AS hit FROM dg LEFT JOIN bg b USING (gram)), "
            "a AS (SELECT doc_id, count(*) AS n_grams, "
            "round(avg(hit), 6) AS contamination FROM j GROUP BY doc_id) "
            "SELECT t.doc_id, coalesce(a.n_grams, 0) AS n_grams, "
            "coalesce(a.contamination, 0.0) AS contamination "
            "FROM (SELECT DISTINCT doc_id FROM documents "
            "WHERE source != 'src0') t LEFT JOIN a USING (doc_id) "
            "ORDER BY doc_id",
        "multimodal_decode":
            "SELECT doc_id, CAST(16 + length(text) % 64 AS INTEGER) AS width, "
            "CAST(16 + (length(text) // 64) % 64 AS INTEGER) AS height, "
            "CAST(3 AS INTEGER) AS channels FROM documents",
        "multimodal_resize":
            "SELECT doc_id, CAST(224 AS INTEGER) AS width, "
            "CAST(224 AS INTEGER) AS height, CAST(3 AS INTEGER) AS channels, "
            "CAST(16 + length(text) % 64 AS INTEGER) AS orig_width, "
            "CAST(16 + (length(text) // 64) % 64 AS INTEGER) AS orig_height "
            "FROM documents",
        "multimodal_frame_sample":
            "SELECT doc_id, CAST(16 + length(text) % 64 AS INTEGER) AS width, "
            "CAST(16 + (length(text) // 64) % 64 AS INTEGER) AS height "
            "FROM documents WHERE doc_id % 10 = 0",
        "audio_features":
            "SELECT doc_id, length(text) / 16000.0 AS duration_s, "
            "CAST(16000 AS INTEGER) AS sample_rate FROM documents",
        "top1_with_ties":
            "SELECT o_orderkey AS orderkey, o_orderdate AS odate FROM orders "
            "WHERE o_orderdate = (SELECT max(o_orderdate) FROM orders)",
        "text_quality":
            r"WITH t AS (SELECT doc_id, text, list_filter(string_split_regex("
            r"lower(text), '[^\p{L}\p{N}'']+'), x -> x <> '') AS toks "
            "FROM documents), "
            "h AS (SELECT doc_id, len(toks) AS n_tok, "
            "greatest(len(toks), 1) AS nz, "
            "len(list_filter(toks, x -> x IN ('the','a','and','of','to','in',"
            "'is','it','that','for'))) AS h_en, "
            "len(list_filter(toks, x -> x IN ('der','die','das','und','ist',"
            "'nicht','ein','zu','mit'))) AS h_de, "
            "len(list_filter(toks, x -> x IN ('le','la','les','et','est','un',"
            "'une','dans','pour'))) AS h_fr, "
            "len(list_filter(toks, x -> x IN ('el','la','los','y','es','un',"
            "'una','en','para','que'))) AS h_es, "
            r"length(regexp_replace(text, '[\p{L}\p{N}\s]', '', 'g')) * 1.0 "
            "/ greatest(length(text), 1) AS p_ratio FROM t) "
            "SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens, "
            "round((least(n_tok / 100.0, 1.0) "
            "+ (1.0 - least(p_ratio * 5, 1.0)) "
            "+ least((h_en * 1.0 / nz) * 4, 1.0)) / 3, 6) AS quality, "
            "CASE WHEN h_en = 0 AND h_de = 0 AND h_fr = 0 AND h_es = 0 "
            "THEN 'und' "
            "WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es THEN 'en' "
            "WHEN h_de >= h_fr AND h_de >= h_es THEN 'de' "
            "WHEN h_fr >= h_es THEN 'fr' ELSE 'es' END AS lang_pred FROM h",
        "ngram_jaccard":
            r"WITH g AS (SELECT doc_id, lang, "
            r"list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}'']+'), "
            r"x -> x <> '') AS toks FROM documents), "
            "s AS (SELECT doc_id, lang, CASE WHEN len(toks) >= 3 THEN "
            "list_distinct(list_transform(range(1, len(toks)-1), "
            "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) "
            "ELSE [array_to_string(toks, ' ')] END AS grams FROM g), "
            "p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "round(len(list_intersect(a.grams, b.grams)) * 1.0 / "
            "len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard "
            "FROM s a JOIN s b ON a.lang = b.lang AND a.doc_id < b.doc_id) "
            "SELECT id_a, id_b, jaccard FROM p WHERE jaccard >= 0.5",
        "dedup_embedding_cosine":
            "WITH p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "round(list_cosine_similarity(a.embedding::DOUBLE[], "
            "b.embedding::DOUBLE[]), 6) AS cos "
            "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id) "
            "SELECT id_a, id_b, cos FROM p WHERE cos >= 0.45",
        # knn_ivf probes every centroid list (n_probe = n_centroids) =>
        # exact — same result set as brute force.
        "knn_ivf":
            "SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], "
            "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6) AS score "
            "FROM embeddings WHERE vec_id != 0 "
            "ORDER BY score DESC, vec_id LIMIT 10",
        # --- coverage long tail ---
        "node_index_scan":
            "SELECT count(*) AS n FROM customer WHERE c_acctbal IS NOT NULL",
        "rel_index_seek_range":
            "SELECT count(*) AS n FROM lineitem "
            "WHERE l_quantity >= 10 AND l_quantity < 20",
        "rel_index_contains_scan":
            "SELECT count(*) AS n FROM lineitem WHERE l_returnflag LIKE '%A%'",
        "rel_index_ends_with_scan":
            "SELECT count(*) AS n FROM lineitem WHERE l_linestatus LIKE '%F'",
        "node_by_element_id_seek":
            "SELECT c_name AS name FROM customer WHERE c_custkey = 42",
        "let_semi_apply":
            "SELECT c_custkey AS custkey, EXISTS(SELECT 1 FROM orders "
            "WHERE o_custkey = c_custkey) AS has_order FROM customer "
            "ORDER BY custkey LIMIT 50",
        "conditional_apply":
            "SELECT count(*) AS n FROM customer "
            "JOIN nation ON c_nationkey = n_nationkey",
        "anti_op":
            "SELECT count(*) AS n FROM customer WHERE NOT EXISTS"
            "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)",
        "subquery_foreach":
            "SELECT r_name AS name, (SELECT count(*) FROM nation "
            "WHERE n_regionkey = r_regionkey) AS cnt FROM region ORDER BY name",
        "left_outer_hash_join":
            "SELECT count(c_custkey) AS n FROM orders "
            "LEFT JOIN customer ON o_custkey = c_custkey",
        "partial_sort":
            "SELECT o_orderkey AS okey, o_orderpriority AS pri, "
            "o_totalprice AS price FROM orders "
            "ORDER BY pri, price DESC, okey LIMIT 20",
        "partial_top":
            "SELECT o_orderstatus AS status, count(*) AS n FROM "
            "(SELECT * FROM orders ORDER BY o_orderdate, o_orderkey LIMIT 100) "
            "GROUP BY o_orderstatus",
        "ordered_distinct":
            "SELECT DISTINCT o_orderpriority AS pri FROM orders ORDER BY pri",
        "exhaustive_limit":
            "SELECT count(*) AS n FROM (SELECT * FROM region LIMIT 3)",
        "math_functions":
            "SELECT CAST(abs(-2.0) AS DOUBLE) AS ab, ceil(2.0/3) AS ce, "
            "CAST(floor(2.0) AS DOUBLE) AS fl, "
            "round(sqrt(2.0), 3) AS sq, CAST(sign(-2.0) AS BIGINT) AS sg, "
            "round(exp(1.0), 3) AS ex, round(ln(2.0), 3) AS lg, "
            "round(atan2(2.0, 1.0), 3) AS at, round(pi(), 3) AS p",
        "percentiles_array":
            "SELECT round(quantile_cont(o_totalprice, 0.25), 2) AS p25, "
            "round(quantile_cont(o_totalprice, 0.5), 2) AS p50, "
            "round(quantile_cont(o_totalprice, 0.75), 2) AS p75 FROM orders",
        "list_slice_index":
            "SELECT CAST(2 AS BIGINT) AS sl_n, CAST(1 AS BIGINT) AS first, "
            "CAST(5 AS BIGINT) AS neg, CAST(2 AS BIGINT) AS sl0",
        "char_length_fn":
            "SELECT CAST(3 AS BIGINT) AS a, CAST(4 AS BIGINT) AS b",
        "string_case_fns":
            "SELECT 'ABC' AS u, 'abc' AS l, 'cba' AS r, 'ell' AS s",
        "path_functions":
            "SELECT CAST(2 AS BIGINT) AS nn, CAST(1 AS BIGINT) AS nr, "
            "CAST(1 AS BIGINT) AS l, count(*) AS c FROM nation",
        "rel_endpoint_fns":
            "SELECT 'IN_REGION' AS t, count(DISTINCT n_nationkey) AS sn, "
            "count(DISTINCT n_regionkey) AS en FROM nation",
        "list_comprehension":
            "SELECT CAST(3 AS BIGINT) AS n_evens, CAST(120 AS BIGINT) AS total",
        "nondeterministic_sanity":
            "SELECT CAST(5 AS BIGINT) AS parts, true AS ok, true AS r01",
        "trig_edge_fns":
            "SELECT round(1/tan(1.0), 3) AS ct, "
            "round(pow(sin(0.5), 2), 3) AS hv, round(exp(1.0), 3) AS eu, "
            "isnan(CAST('nan' AS DOUBLE)) AS nan",
        "range_step":
            "SELECT CAST(6 AS BIGINT) AS n, CAST(4 AS BIGINT) AS m, "
            "CAST(1 AS BIGINT) AS lst",
        "pattern_comprehension_expr":
            "SELECT r_name AS name, CAST((SELECT count(*) FROM nation "
            "WHERE n_regionkey = r_regionkey) AS BIGINT) AS n_nations "
            "FROM region ORDER BY name",
        "union_rel_type_scan":
            "SELECT CAST(2 * count(*) AS BIGINT) AS n FROM lineitem",
        "knn_ivf_indexed":
            "SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], "
            "(SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6)"
            " AS score FROM embeddings WHERE vec_id != 0 "
            "ORDER BY score DESC, vec_id LIMIT 10",
        "rel_by_element_id_seek":
            "SELECT CAST(1 AS BIGINT) AS n",
        "call_subquery_union":
            "SELECT CAST(2 * count(*) AS BIGINT) AS total FROM nation",
        "qpp_where":
            "SELECT count(*) AS n FROM nation "
            "JOIN region ON n_regionkey = r_regionkey WHERE r_regionkey < 3",
        "pattern_comp_in_where":
            "SELECT count(*) AS n FROM nation WHERE (SELECT count(*) "
            "FROM region WHERE r_regionkey = n_regionkey) = 1",
        "let_select_or_semi_apply":
            "SELECT c_custkey AS ck, (c_acctbal < 0 OR EXISTS"
            "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)) AS flag "
            "FROM customer ORDER BY ck LIMIT 40",
        "temporal_constructors":
            "SELECT DATE '2024-03-05' AS d, CAST(10 AS BIGINT) AS h, "
            "CAST(5 AS BIGINT) AS s, CAST(10 AS BIGINT) AS t, "
            "CAST(2 AS BIGINT) AS m",
        "user_function_call":
            "SELECT CAST(2 * sum(r_regionkey) AS BIGINT) AS s FROM region",
        "user_aggregate_call":
            "SELECT round(exp(avg(ln(n_nationkey + 1))), 4) AS g FROM nation",
        # dedup_minhash_lsh / dedup_simhash / knn_lsh / text_fingerprint /
        # stream_near_dup: hash-function-specific (xxhash64) — rows-only
        # check (omitted); recall/equivalence gated in pytest + bench.
    }
