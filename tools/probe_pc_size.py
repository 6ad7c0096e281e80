"""Equivalence probe for the size(pattern-comprehension) -> COUNT{}
pre-aggregation rewrite: 7 shapes (3 firing, 4 bail), each compared
against the RollUpApply lowering with the rewrite monkeypatched off.
Usage: python tools/probe_pc_size.py [sf_dir]"""
import sys
sys.path.insert(0, ".")
from neo4j_spark.session import get_spark
from neo4j_spark.sources.tpch import tpch_graph
from neo4j_spark.api import cypher
from neo4j_spark.cypher.translate import Translator

spark = get_spark("probe_pc_size", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
g = tpch_graph(spark, sf)

QUERIES = [
 ("fire_size_pc", "MATCH (r:Region) RETURN r.name AS region, "
  "size([(n:Nation)-[:IN_REGION]->(r) | n.name]) AS n_nations "
  "ORDER BY region"),
 ("fire_size_pc_where_relprop", "MATCH (o:Order) RETURN o.orderkey AS k, "
  "size([(o)-[l:CONTAINS]->() WHERE l.quantity > 25 | l.linenumber]) AS n "
  "ORDER BY k LIMIT 20"),
 ("fire_size_pc_in_where", "MATCH (r:Region) "
  "WHERE size([(n:Nation)-[:IN_REGION]->(r) | n.name]) >= 5 "
  "RETURN count(*) AS n"),
 # computed projection could raise (ANSI overflow/div0): must bail
 ("bail_size_pc_arith_proj", "MATCH (r:Region) RETURN r.name AS region, "
  "size([(n:Nation)-[:IN_REGION]->(r) | n.nationkey + 1]) AS n "
  "ORDER BY region"),
 # the raw list surfaces: RollUpApply must materialize it
 ("bail_raw_list", "MATCH (r:Region) RETURN r.name AS region, "
  "[(n:Nation)-[:IN_REGION]->(r) | n.name] AS names ORDER BY region"),
 ("bail_size_two_hop", "MATCH (r:Region) RETURN r.name AS region, "
  "size([(c:Customer)-[:FROM_NATION]->()-[:IN_REGION]->(r) | c.custkey]) "
  "AS n ORDER BY region"),
 # path-bound comprehension: _preagg_pattern_sub bails on path_var
 ("bail_size_path_pc", "MATCH (n:Nation) WHERE n.nationkey <= 3 "
  "RETURN n.name AS nation, "
  "size([p = (n)-[:IN_REGION]->(:Region) | length(p)]) AS lens "
  "ORDER BY nation"),
]

orig_pc = Translator._lower_pattern_comp
orig_ps = Translator._preagg_pattern_sub
fail = 0
for name, q in QUERIES:
    used_pc = {"v": 0}

    def spy_pc(self, df, e):
        used_pc["v"] += 1
        return orig_pc(self, df, e)

    Translator._lower_pattern_comp = spy_pc
    on = sorted(map(lambda r: tuple(map(str, r)),
                    cypher(spark, q, g).collect()))
    fired = used_pc["v"] == 0  # fired = RollUpApply never ran
    Translator._lower_pattern_comp = orig_pc
    Translator._preagg_pattern_sub = lambda self, cur_df, parts, where: None
    off = sorted(map(lambda r: tuple(map(str, r)),
                     cypher(spark, q, g).collect()))
    Translator._preagg_pattern_sub = orig_ps
    want = name.startswith("fire")
    ok = on == off and fired == want
    if not ok:
        fail += 1
    print(("OK " if ok else "FAIL"), name, "rows_equal:", on == off,
          "fired:", fired, "want:", want, flush=True)
print("FAILURES:", fail)
sys.exit(1 if fail else 0)
