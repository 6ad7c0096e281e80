"""Probe: QuantifiedPathPatternGpmTests.feature — run each plain
Scenario's query against the fixture graph and compare RESULT ROW COUNTS
(enumeration semantics: duplicate rows matter)."""
import re
import sys

sys.path.insert(0, ".")
from neo4j_spark.session import get_spark

from neo4j_spark.api import cypher
from neo4j_spark.graph import PropertyGraph

FEATURE = ("/root/reference/community/cypher/spec-suite-tools/src/test/"
           "resources/acceptance/features/QuantifiedPathPatternGpmTests"
           ".feature")

SETUP = """
CREATE (a:Person {name: "Chris", age: 30, city:"Paris"})-[:E {id:3, weight:3}]->(b:Person {name:"Diana", age: 35, city:"Paris"}),
       (d:Person:A {name:'Alice', age: 20, city:"Oslo"})-[:E {id:1, weight:6}]->(a),
       (:Person{name:"Bob", age: 25, city:"London"})-[:E {id:2, weight:2}]->(a),
       (b)-[:E {id:5, weight:7}]->(:Person{name:"Tony", age: 40, city:"Oslo"}),
       (b)-[:E {id:4, weight:1}]->(:Person{name:"Sue", age: 32, city:"London"}),
       (d)-[:K {id:6, weight:3}]->(a),
       (a)-[:K {id:7, weight:2}]->(b)
"""

text = open(FEATURE).read()
blocks = re.split(r"\n  Scenario", text)[1:]

spark = get_spark("probe", cpus=8)
spark.sparkContext.setLogLevel("ERROR")
g = PropertyGraph({}, {})
cypher(spark, SETUP, g).collect()

out = open("/tmp/qpp_gpm.log", "w")
for b in blocks:
    header = b.split("\n", 1)[0].strip().lstrip(":").strip()
    if b.startswith(" Outline") or "<" in b.split('"""')[1]:
        out.write(f"SKIP outline: {header}\n")
        continue
    parts = b.split('"""')
    if len(parts) < 3:
        out.write(f"SKIP no-query: {header}\n")
        continue
    q = parts[1].strip()
    # expected table rows: lines starting with | after "Then", minus header
    after = parts[2]
    tbl = [ln for ln in after.split("\n")
           if ln.strip().startswith("|")]
    want = max(0, len(tbl) - 1)
    try:
        got = len(cypher(spark, q, g).collect())
        mark = "ok" if got == want else f"GOT {got} want {want}"
        out.write(f"{header}: {mark}\n")
    except Exception as e:
        out.write(f"{header}: ERR {str(e).split(chr(10))[0][:110]}\n")
    out.flush()
out.close()
