"""Interleaved A/B for the read-only CALL {} IN TRANSACTIONS batch
overlap (guide §2.6): times a multi-batch read-only entry with the
materialization pool forced serial (max_workers=1) vs as shipped, and
asserts the rows are identical.  Usage:
python tools/opt_ab_txoverlap.py [sf_dir]"""
import sys
import time

sys.path.insert(0, ".")
import concurrent.futures as cf

from neo4j_spark.api import cypher
from neo4j_spark.session import get_spark
from neo4j_spark.sources.tpch import tpch_graph

spark = get_spark("ab_txoverlap", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
g = tpch_graph(spark, sf)

Q = ("UNWIND range(1, 8) AS b "
     "CALL { WITH b MATCH (o:Order)-[l:CONTAINS]->(p:Part) "
     "WHERE o.orderkey % 8 = b - 1 "
     "RETURN count(*) AS n, sum(l.quantity) AS s } "
     "IN TRANSACTIONS OF 1 ROWS ON ERROR CONTINUE REPORT STATUS AS st "
     "RETURN b, n, s, st.committed AS ok ORDER BY b")

RealTPE = cf.ThreadPoolExecutor


class SerialTPE(RealTPE):
    def __init__(self, max_workers=None, **kw):
        super().__init__(max_workers=1, **kw)


def set_serial(on: bool):
    cf.ThreadPoolExecutor = SerialTPE if on else RealTPE


for s in (False, True):  # warm codegen both arms
    set_serial(s)
    cypher(spark, Q, g.copy()).collect()
best = {False: 1e9, True: 1e9}
rows = {}
for i in range(6):
    for s in ((False, True) if i % 2 == 0 else (True, False)):
        set_serial(s)
        t0 = time.time()
        rows[s] = [tuple(r) for r in cypher(spark, Q, g.copy()).collect()]
        best[s] = min(best[s], time.time() - t0)
set_serial(False)
same = rows[True] == rows[False]
print("rows identical:", same)
print(f"serial={best[True]:.2f}s overlapped={best[False]:.2f}s "
      f"speedup={best[True]/best[False]:.2f}x")
sys.exit(0 if same else 1)
