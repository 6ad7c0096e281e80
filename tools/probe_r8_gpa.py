"""Probe: GraphPatternAcceptance.feature scenarios vs current engine."""
import sys

sys.path.insert(0, ".")
from pyspark.sql import SparkSession

from neo4j_spark.api import cypher
from neo4j_spark.graph import PropertyGraph

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")


def t(label, q, setup=None, want="?"):
    g = PropertyGraph({}, {})
    try:
        if setup:
            cypher(spark, setup, g).collect()
        r = cypher(spark, q, g).collect()
        print(f"{label}: {len(r)} rows  (want {want})")
    except Exception as e:
        print(f"{label}: ERR {str(e)[:110]}  (want {want})")


# -- error scenarios: VariableAlreadyBound family
t("s1 path var twice", "MATCH p = (a)-[b]->(c), p = (f)-[e]->(g) RETURN *",
  want="ERR VariableAlreadyBound")
t("s2 subpath var repeated",
  "MATCH (p = ()-[:R]->())+ (p = ()-[:S]->())+ RETURN p",
  want="ERR VariableAlreadyBound")
t("s3 subpath var two patterns",
  "MATCH (a)(sp = ()-[h]->())+(j), (b)(sp = (x)-[y]->(z))* RETURN *",
  want="ERR VariableAlreadyBound")
t("s4 subpath var twice in one pattern",
  "MATCH (sp = ()-[h]->())+(j)(sp = (q)-->())+, (x)-[y]->(z) RETURN *",
  want="ERR VariableAlreadyBound")
t("s5 group var + singleton",
  "MATCH ((a)-[b]->(c))*(d), (f)-[e]->(a) RETURN *",
  want="ERR VariableAlreadyBound")
t("s6 group var two QPPs",
  "MATCH ((a)-[b]->(c))*(d), (h)-[e]->() ((a)-[f]->(g)){2,} RETURN *",
  want="ERR VariableAlreadyBound")
t("s7 group var + quantified rel",
  "MATCH ((a)-[b]->(c))*(d), (g)-[b]->+(f) RETURN *",
  want="ERR VariableAlreadyBound")
t("s8 group var + var-length rel",
  "MATCH ((a)-[b]->(c))*(d), (g)-[b*]->(f) RETURN *", want="ERR any")
t("s11 min node count",
  "MATCH ((f)-[i]->(g))+, ((k)-[m]->(n))* RETURN *", want="ERR any")
t("s16 group var across graph pattern",
  "MATCH ((a)-[r]->(b))+, (b)-[c]->(d) RETURN *", want="ERR any")

# -- result scenarios
t("s9 T pattern",
  "MATCH (n0)-->(n1)-->(n2), (n1)-->(n3) RETURN n0, n1, n2, n3",
  setup="CREATE (:A)-[:R]->(b:B)-[:S]->(:C), (:D)-[:T]->(b)-[:U]->(:E)",
  want="4")
t("s10 cartesian",
  "MATCH (n0)-->(n1:B), (n2:B)-->(n3) RETURN n0, n1, n2, n3",
  setup="CREATE (:A)-[:R]->(b:B)-[:S]->(:C), (:D)-[:T]->(b)-[:U]->(:E)",
  want="4")
t("s12 singleton node var implicit join",
  "MATCH (a)-[q]-(b)-[f]-(c)-->(n), (x)-[r]->(z)<-[]-(n) RETURN *",
  setup="CREATE (:A)-[:R]->(:B)-[:S]->(:C)-[:T]->(d:D), "
        "(:E)-[:U]->(:F)<-[:V]-(d)",
  want="1")
t("s13 node var repeated inside QPP",
  "MATCH ((a)-[q]->(b)-[c]->(d)-[r]->(f)<--(a))+ RETURN *",
  setup="CREATE (a:A)-[:R]->(:B)-[:R]->(:C)-[:R]->(d:D), (a)-[:R]->(d)",
  want="1")
t("s14 rel var implicit join across patterns",
  "MATCH (a)-[r]-(b)-[f]-(c)-->(n), (x)-[r]->(z)<-[]-(n) RETURN *",
  setup="CREATE (a:A)-[:R]->(b:B)-[:S]->(:C)-[:T]->(d:D), (d)-[:U]->(b)",
  want="0")
t("s15 rel var repeated inside QPP",
  "MATCH ((a)-[r]->(b)-[c]->(d)-[r]->(f)<--(a))+ RETURN *",
  setup="CREATE (a:A)-[:R]->(b:B), (b)-[:C]->(a)",
  want="0")
t("s17 lateral joins",
  "MATCH (a)-[r]->(b), (c)-[s]->(d) MATCH (a)-[t]->(e), (c)-[u]->(f) "
  "RETURN *",
  setup="CREATE (a:A)-[:R]->(:B), (a)-[:S]->(:C)",
  want="4")
