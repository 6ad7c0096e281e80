"""Probe: ShortestPathAcceptance.feature scenarios vs current engine."""
import sys

sys.path.insert(0, ".")
from pyspark.sql import SparkSession

from neo4j_spark.api import cypher
from neo4j_spark.graph import PropertyGraph

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

G5 = ("CREATE (a:A {name: 'A'}), (b:B {name: 'B'}), (c:C {name: 'C'}), "
      "(d:D {name: 'D'}), (x:X {name: 'X'}) "
      "CREATE (a)-[:REL]->(b), (b)-[:REL]->(c), (c)-[:REL]->(d), "
      "(a)-[:REL]->(x), (x)-[:REL]->(d)")
G4 = ("CREATE (a:A {name: 'A'}), (b:B {name: 'B'}), (c:C {name: 'C'}), "
      "(d:D {name: 'D'}) CREATE (a)-[:REL]->(b), (b)-[:REL]->(c), "
      "(c)-[:REL]->(d), (b)-[:REL]->(d)")


def t(label, q, setup=None, want="?"):
    g = PropertyGraph({}, {})
    try:
        if setup:
            cypher(spark, setup, g).collect()
        r = cypher(spark, q, g).collect()
        print(f"{label}: {[tuple(x) for x in r]}  (want {want})")
    except Exception as e:
        print(f"{label}: ERR {str(e)[:130]}  (want {want})")


t("none nodes pred",
  "MATCH p = shortestPath((src:A)-[*]->(dst:D)) "
  "WHERE NONE(n in nodes(p) WHERE n:X) "
  "UNWIND [n IN nodes(p) | n.name] AS node RETURN node",
  setup=G5, want="A B C D in order")
t("none rels pred",
  "MATCH p = shortestPath((src:A)-[*]->(dst:D)) "
  "WHERE NONE(r in relationships(p) WHERE r.blocked IS NOT NULL) "
  "UNWIND [n IN nodes(p) | n.name] AS node RETURN node",
  setup="CREATE (a:A {name: 'A'}), (b:B {name: 'B'}), (c:C {name: 'C'}), "
        "(d:D {name: 'D'}), (x:X {name: 'X'}) "
        "CREATE (a)-[:REL]->(b), (b)-[:REL]->(c), (c)-[:REL]->(d), "
        "(a)-[:X {blocked: true}]->(x), (x)-[:X {blocked: true}]->(d)",
  want="A B C D")
t("none rels pred 2",
  "MATCH p = shortestPath((src:A)-[*]->(dst:D)) "
  "WHERE NONE(r in relationships(p) WHERE r.blocked) "
  "UNWIND [n IN nodes(p) | n.name] AS node RETURN node",
  setup="CREATE (a:A {name: 'A'}), (b:B {name: 'B'}), (c:C {name: 'C'}), "
        "(d:D {name: 'D'}), (x:X {name: 'X'}) "
        "CREATE (a)-[:X {blocked: false}]->(b), (b)-[:X {blocked: false}]->(c), "
        "(c)-[:X {blocked: false}]->(d), (a)-[:X {blocked: true}]->(x), "
        "(x)-[:X {blocked: true}]->(d)",
  want="A B C D")
t("length parity pred",
  "MATCH p = shortestPath((src:A)-[rs*]->(dst:D)) "
  "WHERE length(p) % 2 = 1 "
  "UNWIND [n IN nodes(p) | n.name] AS node RETURN node",
  setup=G5, want="A B C D")
t("context info",
  "MATCH (src:A), (dest:D) MATCH p = shortestPath((src)-[rs*]->(dest)) "
  "WHERE ALL(r in rs WHERE type(rs[0]) = type(r)) AND "
  "ALL(r in rs WHERE r.blocked IS NULL OR r.blocked <> true) "
  "RETURN [n IN nodes(p) | n.name] AS ns",
  setup=G5, want="[A,X,D]")
t("expression context",
  "MATCH (src:A), (dst:D) "
  "RETURN [n IN nodes(shortestPath((src:A)-[*]->(dst:D))) | n.name] AS ns",
  setup=G5, want="[A,X,D]")
t("all rels same type",
  "MATCH p = shortestPath((src:A)-[rs*]->(dst:D)) "
  "WHERE ALL(r in rs WHERE type(rs[0]) = type(r)) "
  "UNWIND [n IN nodes(p) | n.name] AS node RETURN node",
  setup="CREATE (a:A {name: 'A'}), (b:B {name: 'B'}), (c:C {name: 'C'}), "
        "(d:D {name: 'D'}), (x:X {name: 'X'}) "
        "CREATE (a)-[:REL]->(b), (b)-[:REL]->(c), (c)-[:REL]->(d), "
        "(a)-[:ALT1]->(x), (x)-[:ALT2]->(d)",
  want="A B C D")
t("finds shortest",
  "MATCH p = shortestPath((src:A)-[*]->(dst:D)) "
  "UNWIND [n IN nodes(p) | n.name] AS node RETURN node",
  setup=G4, want="A B D")
t("optional shortest",
  "OPTIONAL MATCH p = shortestPath((src:A)-[*]->(dst:D)) "
  "UNWIND [n IN nodes(p) | n.name] AS node RETURN node",
  setup=G4, want="A B D")
t("optional bound",
  "MATCH (a:A), (d:D) OPTIONAL MATCH p = shortestPath((a)-[*]->(d)) "
  "UNWIND [n IN nodes(p) | n.name] AS node RETURN node",
  setup=G4, want="A B D")
t("optional null path",
  "MATCH (a:A), (d:D) OPTIONAL MATCH p = shortestPath((a)-[*]->(d)) "
  "RETURN p IS NULL AS isnull",
  setup="CREATE (:A {name: 'A'}), (:B {name: 'B'}), (:C {name: 'C'}), "
        "(:D {name: 'D'})",
  want="[true]")
t("rels of shortest",
  "MATCH p = shortestPath((src:A)-[r*]->(dst:D)) "
  "UNWIND [r IN relationships(p) | r.id] AS rel RETURN rel",
  setup="CREATE (a:A {name: 'A'}), (b:B {name: 'B'}), (c:C {name: 'C'}), "
        "(d:D {name: 'D'}) CREATE (a)-[:REL {id: 1}]->(b), "
        "(b)-[:REL {id: 2}]->(c), (c)-[:REL {id: 3}]->(d), "
        "(b)-[:REL {id: 4}]->(d)",
  want="1, 4 in order")
t("length limit prunes",
  "MATCH p = shortestPath((src:A)-[*..1]->(dst:D)) "
  "UNWIND [n IN nodes(p) | n.name] AS node RETURN node",
  setup="CREATE (a:A {name: 'A'}), (b:B {name: 'B'}), (c:C {name: 'C'}), "
        "(d:D {name: 'D'}) CREATE (a)-[:REL]->(b), (b)-[:REL]->(c), "
        "(c)-[:REL]->(d)",
  want="empty")
t("null start node",
  "OPTIONAL MATCH (src:Y) WITH src "
  "MATCH p = shortestPath((src)-[*]->(dst:D)) "
  "UNWIND [n IN nodes(p) | n.name] AS node RETURN node",
  setup="CREATE (a:A {name: 'A'}), (b:B {name: 'B'}), (c:C {name: 'C'}), "
        "(d:D {name: 'D'}) CREATE (a)-[:REL]->(b), (b)-[:REL]->(c), "
        "(c)-[:REL]->(d)",
  want="empty")
t("all shortest",
  "MATCH p = allShortestPaths((src:A)-[*]->(dst:C)) "
  "RETURN [n IN nodes(p) | n.name] AS nodes",
  setup="CREATE (a:A {name: 'A'}), (b:B {name: 'B'}), (c:C {name: 'C'}), "
        "(d:D {name: 'D'}) CREATE (a)-[:REL]->(b), (b)-[:REL]->(c), "
        "(a)-[:REL]->(d), (d)-[:REL]->(c)",
  want="[A,B,C] [A,D,C]")
t("shortest + pattern expr",
  "MATCH path = allShortestPaths((a:A)-[:REL*0..100]-(c:C)) "
  "WITH nodes(path) AS pathNodes WITH pathNodes[0] AS p, pathNodes[3] as c "
  "RETURN size([path=(c)-[:REL]-(:B)-[:REL]-(:B)-[:REL]-(p) | path]) AS size",
  setup="CREATE (a:A {name: 'A'}), (b1:B {name: 'B'}), (b2:B {name: 'B'}), "
        "(c:C {name: 'C'}) CREATE (a)-[:REL]->(b1), (b1)-[:REL]->(b2), "
        "(b2)-[:REL]->(c)",
  want="[1]")
t("longer path when pred kills short",
  "MATCH p = allShortestPaths((start:START)-[*]->(end:END)) "
  "WHERE ALL(x in relationships(p) WHERE x.p IS NOT NULL) "
  "RETURN length(p) AS len",
  setup="CREATE (s:START), (e:END) CREATE (s)-[:R]->()-[:R]->(e), "
        "(s)-[:R {p:42}]->()-[:R {p:42}]->()-[:R {p:42}]->(e)",
  want="[3]")
