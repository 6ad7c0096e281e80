"""Equivalence probe for key-property elision (node_key_props /
key_elidable + id-only endpoint elision): 28 shapes incl. first/middle/last endpoint positions,
bail shapes, a writing statement, and OPTIONAL/COUNT{} interplay, each
compared with the usage analysis forced off.  Usage:
python tools/probe_keyprop.py [sf_dir]"""
import sys
sys.path.insert(0, ".")
from neo4j_spark.session import get_spark
from neo4j_spark.sources.tpch import tpch_graph
from neo4j_spark.api import cypher
from neo4j_spark.cypher.translate import Translator

spark = get_spark("probe_keyprop", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
g = tpch_graph(spark, sf)

QUERIES = [
 # --- should fire ---
 ("fire_both_ends",
  "MATCH (o:Order)-[:SUPPLIED_BY]->(s:Supplier) "
  "RETURN s.suppkey AS suppkey, count(DISTINCT o.orderkey) AS n_orders"),
 ("fire_last",
  "MATCH (c:Customer)-[:PLACED]->(o:Order) "
  "RETURN c.name AS nm, max(o.orderkey) AS mx"),
 ("fire_first",
  "MATCH (o:Order)-[:CONTAINS]->(p:Part) "
  "WHERE p.retailprice > 1500 RETURN count(DISTINCT o.orderkey) AS n"),
 ("fire_middle",
  "MATCH (c:Customer)-[:PLACED]->(o:Order)-[:CONTAINS]->(p:Part) "
  "WHERE p.size > 40 RETURN c.custkey AS ck, count(o.orderkey) AS n"),
 ("fire_where_use",
  "MATCH (c:Customer)-[:PLACED]->(o:Order) WHERE o.orderkey % 7 = 0 "
  "RETURN count(*) AS n"),
 ("fire_unlabeled",
  "MATCH (o)-[:SUPPLIED_BY]->(s:Supplier) "
  "RETURN s.name AS nm, count(o.orderkey) AS n"),
 ("fire_order_by",
  "MATCH (c:Customer)-[:PLACED]->(o:Order) "
  "RETURN o.orderkey AS k ORDER BY k DESC LIMIT 5"),
 ("fire_incoming_dir",
  "MATCH (o:Order)<-[:PLACED]-(c:Customer) "
  "RETURN c.custkey AS ck, count(o.orderkey) AS n"),
 # --- sharded multi-label endpoint pinned to one alternative (r9):
 # shard pruning guarantees the scan keeps only that label's shards,
 # so per-shard key derivation is sound ---
 ("fire_sharded_src_customer",
  "MATCH (x:Customer)-[:FROM_NATION]->(n:Nation) "
  "RETURN n.name AS nm, count(DISTINCT x.custkey) AS n"),
 ("fire_sharded_src_supplier",
  "MATCH (s:Supplier)-[:FROM_NATION]->(n:Nation) "
  "RETURN n.name AS nm, max(s.suppkey) AS mx"),
 # --- id-only endpoint elision (r9): a var used ONLY as a bare
 # pattern endpoint (possibly across parts) binds as a {_id} struct ---
 ("fire_idonly_connector",
  "MATCH (c:Customer)-[:PLACED]->(o:Order), (c)-[:FROM_NATION]->(n:Nation) "
  "RETURN n.name AS nm, count(*) AS cnt ORDER BY nm"),
 ("fire_idonly_single_part",
  "MATCH (c:Customer)-[:PLACED]->(o:Order) "
  "RETURN o.orderstatus AS st, count(*) AS cnt ORDER BY st"),
 ("fire_idonly_optional_anchor",
  "MATCH (c:Customer)-[:FROM_NATION]->(n:Nation) "
  "OPTIONAL MATCH (c)-[:PLACED]->(o:Order) "
  "RETURN n.name AS nm, count(o) AS cnt ORDER BY nm"),
 # --- id-only must bail ---
 ("bail_idonly_prop_use",
  "MATCH (c:Customer)-[:PLACED]->(o:Order), (c)-[:FROM_NATION]->(n:Nation) "
  "RETURN n.name AS nm, count(c.acctbal) AS cnt ORDER BY nm"),
 ("bail_idonly_relabeled_pos",
  "MATCH (c:Customer)-[:PLACED]->(o:Order), (c:Customer)-[:FROM_NATION]->"
  "(n:Nation) RETURN n.name AS nm, count(*) AS cnt ORDER BY nm"),
 ("bail_idonly_in_path",
  "MATCH (c:Customer)-[:PLACED]->(o:Order), p = (c)-[:FROM_NATION]->"
  "(n:Nation) RETURN n.name AS nm, count([x IN nodes(p) | x.name][0]) "
  "AS cnt ORDER BY nm"),
 # --- must bail ---
 ("bail_whole_var",
  "MATCH (c:Customer)-[:PLACED]->(o:Order) RETURN o LIMIT 0"),
 ("bail_other_prop",
  "MATCH (c:Customer)-[:PLACED]->(o:Order) "
  "RETURN sum(o.totalprice) AS s"),
 ("bail_mixed_props",
  "MATCH (c:Customer)-[:PLACED]->(o:Order) "
  "RETURN o.orderkey AS k, o.orderstatus AS st LIMIT 0"),
 ("bail_labels_fn",
  "MATCH (c:Customer)-[:PLACED]->(o:Order) "
  "RETURN labels(o) AS l, o.orderkey AS k LIMIT 0"),
 ("bail_with_var",
  "MATCH (c:Customer)-[:PLACED]->(o:Order) WITH o "
  "RETURN o.orderkey AS k LIMIT 0"),
 ("bail_star",
  "MATCH (c:Customer)-[:PLACED]->(o:Order) RETURN * LIMIT 0"),
 ("bail_undirected",
  "MATCH (c:Customer)-[:PLACED]-(o) RETURN count(o.orderkey) AS n"),
 ("bail_multi_src_label",
  "MATCH (x)-[:FROM_NATION]->(n:Nation) RETURN count(x.custkey) AS n"),
 ("bail_two_positions",
  "MATCH (c:Customer)-[:PLACED]->(o:Order) MATCH (o)-[:CONTAINS]->(p:Part) "
  "RETURN count(o.orderkey) AS n"),
 # --- writes must disable (created node breaks the bijection) ---
 ("bail_write_stmt",
  "MATCH (c:Customer)-[:PLACED]->(o:Order) WITH c, o LIMIT 1 "
  "CREATE (q:Order {orderkey: -5}) RETURN o.orderkey AS k"),
 # --- interplay ---
 ("fire_optional_null",
  "MATCH (r:Region) OPTIONAL MATCH (c:Customer)-[:NOPE]->(o:Order) "
  "RETURN r.name AS nm, o.orderkey AS k ORDER BY nm"),
 ("fire_count_sub_anchor",
  "MATCH (o:Order)-[:SUPPLIED_BY]->(s:Supplier) "
  "RETURN s.suppkey AS sk, COUNT { (o)-[:CONTAINS]->() } AS nc LIMIT 0"),
]

def rows(q, graph):
    df = cypher(spark, q, graph)
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())

orig = Translator._var_key_prop_only
orig_eo = Translator._var_endpoints_only
fail = 0
for name, q in QUERIES:
    want_fire = name.startswith("fire")
    try:
        Translator._var_key_prop_only = orig
        Translator._var_endpoints_only = orig_eo
        g1 = g.copy()  # isolate any write
        df_on = cypher(spark, q, g1)
        plan_on = df_on._jdf.queryExecution().executedPlan().toString()
        on = rows(q, g.copy())
        Translator._var_key_prop_only = lambda self, n, p: False
        Translator._var_endpoints_only = lambda self, n, d: False
        off = rows(q, g.copy())
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__} {e}", flush=True)
        fail += 1
        continue
    finally:
        Translator._var_key_prop_only = orig
        Translator._var_endpoints_only = orig_eo
    ok_eq = on == off
    # crude fire detection: orders.parquet absent from plan when o elided
    print(f"{'OK' if ok_eq else 'FAIL'} {name}: rows_equal={ok_eq} "
          f"orders_scans={plan_on.count('orders.parquet')} ({len(on)} rows)",
          flush=True)
    if not ok_eq:
        fail += 1
print("FAILURES:", fail)
