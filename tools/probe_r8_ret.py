"""Probe: ReturnAcceptance.feature scenarios vs current engine."""
import sys

sys.path.insert(0, ".")
from pyspark.sql import SparkSession

from neo4j_spark.api import cypher
from neo4j_spark.graph import PropertyGraph

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")


def t(label, q, setup=None, params=None, want="?", show_nodes=None):
    g = PropertyGraph({}, {})
    try:
        if setup:
            cypher(spark, setup, g).collect()
        r = cypher(spark, q, g, params=params).collect()
        extra = ""
        if show_nodes:
            f = g.node_frames.get(show_nodes)
            extra = f" nodes={f.count() if f is not None else 0}"
        print(f"{label}: {[tuple(x) for x in r]}{extra}  (want {want})")
    except Exception as e:
        print(f"{label}: ERR {str(e)[:110]}  (want {want})")


t("limit0 side effects", "CREATE (n:N) RETURN n.x AS x LIMIT 0",
  want="0 rows, 1 node", show_nodes="N")
t("limit3 side effects",
  "UNWIND range(1, 10) AS i CREATE (n:N) RETURN i LIMIT 3",
  want="3 rows, 10 nodes", show_nodes="N")
t("list[null]", "RETURN [1, 2, 3][null] AS result", want="null")
t("list[null..5]", "RETURN [1, 2, 3][null..5] AS result", want="null")
t("list[1..null]", "RETURN [1, 2, 3][1..null] AS result", want="null")
t("map[null]", "RETURN {key: 1337}[null] AS result", want="null")
t("nested list null", "RETURN [[1], [null], null] AS result",
  want="[[1],[null],null]")
t("map null", "RETURN {foo: null} AS result", want="{foo:null}")
t("deep null mix",
  "RETURN [null, [null, {a: null}], {b: [null, {c: [null]}]}] AS result",
  want="same")
t("deep map null",
  "RETURN {a: null, b: {c: null, d: {e: null}, "
  "f: [null, {g: null, h: [null], i: {j: null}}]}} AS result", want="same")
t("n[prop] string", "WITH 'prop' AS prop MATCH (n) RETURN n[prop] AS result",
  setup="CREATE ()", want="null")
t("n['prop'] literal", "MATCH (n) RETURN n['prop'] AS result",
  setup="CREATE ()", want="null")
t("true AND []", "RETURN true AND $list AS result", params={"list": []},
  want="false")
t("exponent", "WITH 2 AS number, 3 AS exponent "
  "RETURN number ^ exponent AS result", want="8.0 float")
t("float*int/10", "WITH 1.0 AS a, 1000 AS b RETURN a * (b / 10) AS result",
  want="100.0")
t("range neg step", "RETURN range(2, 8, -1) AS result", want="[]")
t("range pos step", "RETURN range(8, 2, 1) AS result", want="[]")
t("unaliased union", "RETURN 5 UNION ALL RETURN 5", want="2 rows of 5")
t("graph proj agg",
  "MATCH (actor:Actor)-->(movie:Movie) "
  "WITH actor.name AS name, collect(movie{.title}) AS movies "
  "RETURN { name: name, movies: movies } AS actor",
  setup="CREATE (a:Actor {name: 'Actor 1'}), "
        "(a)-[:REL]->(:Movie {title: 'Movie 1'}), "
        "(a)-[:REL]->(:Movie {title: 'Movie 2'})",
  want="{name, movies:[...]}")
t("union return order",
  "WITH 1 AS y, 2 AS x RETURN y, x "
  "UNION WITH 2 AS x, 1 AS y RETURN *",
  want="1 row (1,2) cols y,x")
