"""Interleaved same-session A/B for the count pre-aggregation rewrites
(_preagg_optional_count / _preagg_trailing_count): times each affected
query with the rewrite ON and OFF alternately (min of N), so host drift
hits both arms equally."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neo4j_spark.api import cypher
from neo4j_spark.cypher import translate as TR
from neo4j_spark.session import get_spark
from neo4j_spark.sources.tpch import tpch_graph

QUERIES = {
    "optional_expand":
        "MATCH (c:Customer) OPTIONAL MATCH (c)-[:PLACED]->(o:Order) "
        "RETURN c.custkey AS custkey, count(o) AS n_orders",
    "multi_hop_chain":
        "MATCH (c:Customer)-[:PLACED]->(o:Order)-[l:CONTAINS]->(p:Part) "
        "WHERE c.mktsegment = 'AUTOMOBILE' RETURN count(*) AS n",
    "left_outer_hash_join":
        "MATCH (o:Order) OPTIONAL MATCH (c:Customer)-[:PLACED]->(o) "
        "RETURN count(c) AS n",
}


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("AB_RUNS", "6"))
    spark = get_spark("opt_ab_preagg",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    graph = tpch_graph(spark, sf_dir)

    orig_o = TR.Translator._preagg_optional_count
    orig_t = TR.Translator._preagg_trailing_count
    off_o = lambda self, df, m, nxt: None  # noqa: E731
    off_t = lambda self, df, m, nxt: None  # noqa: E731

    def set_rewrites(on: bool):
        TR.Translator._preagg_optional_count = orig_o if on else off_o
        TR.Translator._preagg_trailing_count = orig_t if on else off_t

    for name, q in QUERIES.items():
        # warm codegen both arms
        for on in (True, False):
            set_rewrites(on)
            cypher(spark, q, graph).count()
        best = {True: None, False: None}
        for i in range(runs):
            for on in (True, False) if i % 2 == 0 else (False, True):
                set_rewrites(on)
                spark.catalog.clearCache()
                t0 = time.time()
                cypher(spark, q, graph).count()
                el = time.time() - t0
                if best[on] is None or el < best[on]:
                    best[on] = el
        set_rewrites(True)
        a = sorted(map(tuple, cypher(spark, q, graph).collect()))
        set_rewrites(False)
        b = sorted(map(tuple, cypher(spark, q, graph).collect()))
        set_rewrites(True)
        print(f"{name:24s} rewrite {best[True]:.3f}s  "
              f"baseline {best[False]:.3f}s  "
              f"({(best[True] / best[False] - 1) * 100:+.0f}%)  "
              f"equal={a == b}")


if __name__ == "__main__":
    main()
