"""Interleaved on/off bench A/B for key-property elision at sf0.1
(agg_count_distinct), min of 10 per arm, row counts asserted equal."""
import sys, time
sys.path.insert(0, ".")
from neo4j_spark.session import get_spark
from neo4j_spark.cypher.translate import Translator
import __spark_entry__ as em

spark = get_spark("ab_acd", cpus=32)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
qs = em.queries()
orig = Translator._var_key_prop_only
OFF = lambda self, n, p: False
for name in ["agg_count_distinct"]:
    fn = qs[name]
    for arm in (orig, OFF):
        Translator._var_key_prop_only = arm
        fn(spark, "/root/testdata/sf0.001").count()
    res = {"on": [], "off": []}; rows = {}
    for i in range(10):
        for label, arm in (("on", orig), ("off", OFF)):
            Translator._var_key_prop_only = arm
            spark.catalog.clearCache()
            t0 = time.time()
            n = fn(spark, sf).count()
            res[label].append(time.time() - t0)
            rows[label] = n
    Translator._var_key_prop_only = orig
    print("RESULT %s: on=%.3f off=%.3f rows_equal=%s (%d)" % (
        name, min(res["on"]), min(res["off"]),
        rows["on"] == rows["off"], rows["on"]))
