"""Interleaved on/off bench A/B for the subquery pre-aggregation at
sf0.1 (count_subquery + three EXISTS-family entries), min of 6 per arm,
row counts asserted equal."""
import sys, time
sys.path.insert(0, ".")
from neo4j_spark.session import get_spark
from neo4j_spark.cypher.translate import Translator
import __spark_entry__ as em

spark = get_spark("ab_subpreagg", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
warm = "/root/testdata/sf0.001"
qs = em.queries()
orig = Translator._preagg_pattern_sub
OFF = lambda self, cur_df, parts, where: None

names = ["count_subquery", "semi_apply", "anti_semi_apply", "exists_subquery"]
for name in names:
    fn = qs[name]
    # warm codegen for both shapes
    for arm in (orig, OFF):
        Translator._preagg_pattern_sub = arm
        fn(spark, warm).count()
    res = {"on": [], "off": []}
    rows = {}
    for i in range(6):
        for label, arm in (("on", orig), ("off", OFF)):
            Translator._preagg_pattern_sub = arm
            spark.catalog.clearCache()
            t0 = time.time()
            n = fn(spark, sf).count()
            res[label].append(time.time() - t0)
            rows[label] = n
    Translator._preagg_pattern_sub = orig
    eq = rows["on"] == rows["off"]
    print(f"{name}: on={min(res['on']):.3f}s off={min(res['off']):.3f}s "
          f"rows_equal={eq} ({rows['on']})", flush=True)
