"""Probe: PatternExpressionAcceptance.feature scenarios."""
import sys

sys.path.insert(0, ".")
from neo4j_spark.session import get_spark

from neo4j_spark.api import cypher
from neo4j_spark.graph import PropertyGraph

spark = get_spark("probe", cpus=8)
spark.sparkContext.setLogLevel("ERROR")
out = open("/tmp/pe.log", "w")


def t(label, q, setup=None):
    g = PropertyGraph({}, {})
    try:
        if setup:
            cypher(spark, setup, g).collect()
        r = cypher(spark, q, g).collect()
        out.write(f"{label}: OK {sorted([tuple(x) for x in r])[:6]}\n")
    except Exception as e:
        out.write(f"{label}: ERR {str(e).split(chr(10))[0][:110]}\n")
    out.flush()


ABC = "CREATE (a:A), (a)-[:T]->(:B), (a)-[:T]->(:C)"
t("s1 head(nodes(x))",
  "MATCH (n) RETURN [x=(n)-->() | head(nodes(x)).l] AS p",
  "CREATE (a:A {l: 1}), (a)-[:T]->(:B), (a)-[:T]->(:C)")
t("s2 comp in WITH + agg",
  "MATCH (n:A) WITH [x=(n)-->() | labels(head(nodes(x)))[0]] AS p, "
  "count(n) AS c RETURN p, c", ABC)
t("s3 comp in WHERE",
  "MATCH (n) WHERE size([x=(n)-->() | x]) > 1 RETURN labels(n) AS l", ABC)
t("s4 pattern expr + CASE in WHERE",
  "MATCH (n) WHERE (n)-->() AND (CASE WHEN n:A THEN "
  "size([p=(n)-->(:C) | p]) WHEN n:B THEN size([p=(n)-->(:D) | p]) "
  "ELSE 42 END) > 1 RETURN labels(n) AS l",
  "CREATE (a:A), (a)-[:T]->(:C), (a)-[:T]->(:C), (:B)-[:T]->(:D), "
  "()-[:T]->()")
t("s5 order by",
  "MATCH (liker) RETURN size([p=(liker)--() | p]) AS c, liker.time AS t "
  "ORDER BY liker.time",
  "CREATE (a {time: 10}), (b {time: 20}), (a)-[:T]->(b)")
t("s6 pattern expr in RETURN",
  "MATCH (n) RETURN size((n)-->()) AS s", ABC)
t("s7 bare pattern as expr value",
  "MATCH (n:A) RETURN size([p IN (n)-->() | 1]) AS s", ABC)
t("s8 var-length comp in WITH",
  "MATCH (n:A) WITH [x=(n)-[*1..2]->() | length(x)] AS p RETURN p", ABC)
t("s9 aggregating on pattern comp",
  "MATCH (n:A) RETURN count([x=(n)-->() | x]) AS c", ABC)
t("s10 size undirected",
  "MATCH (n:A) RETURN size([x=(n)--() | x]) AS c", ABC)
t("s11 exists()",
  "MATCH (n:A) RETURN exists((n)-->()) AS e", ABC)
t("s12 comp inside list comprehension",
  "MATCH (n:A) RETURN [x IN [y=(n)-->() | length(y)] | x + 1] AS r", ABC)
t("s13 new node var in pattern EXPR fails",
  "MATCH (n) WHERE (n)-->(b) RETURN n", ABC)
t("s14 new rel var in pattern EXPR fails",
  "MATCH (n) WHERE (n)-[r]->() RETURN n", ABC)
t("s15 degree via size",
  "MATCH (n:A) RETURN size([p=(n)-[:T]->() | p]) AS c, "
  "size([p=(n)-[:T|S]->() | p]) AS c2", ABC)
t("s16 nested pattern comps",
  "MATCH (a:A) RETURN [x=(a)-->(b) | [y=(b)-->(c) | labels(c)[0]]] AS r",
  "CREATE (a:A)-[:T]->(b:B)-[:T]->(:C), (b)-[:T]->(:D)")
t("s17 null var comp",
  "OPTIONAL MATCH (n:Missing) WITH n "
  "RETURN [x=(n)-->() | x] AS r, size([x=(n)-->() | x]) AS s", ABC)
t("s18 null inner predicate",
  "MATCH (n:A) RETURN size([x=(n)-->(m WHERE m.missing > 1) | x]) AS s",
  ABC)
t("s19 size comp null cmp",
  "OPTIONAL MATCH (n:Missing) WITH n "
  "RETURN size([x=(n)-->() | x]) < 1 AS lt, "
  "size([x=(n)-->() | x]) >= 1 AS ge, size([x=(n)-->() | x]) = 0 AS eq",
  ABC)
out.close()
