"""Probe: LabelExpressionAcceptance semantics vs current engine."""
import sys

sys.path.insert(0, ".")
from neo4j_spark.session import get_spark

from neo4j_spark.api import cypher
from neo4j_spark.graph import PropertyGraph

spark = get_spark("probe", cpus=8)
spark.sparkContext.setLogLevel("ERROR")
out = open("/tmp/lx.log", "w")

SETUP = ("CREATE (), (:A), (:B), (:C), (:A:B), (:A:C), (:B:C), (:A:B:C)")
g = PropertyGraph({}, {})
cypher(spark, SETUP, g).collect()

MATCH_CASES = [
    ("(n)", "[] A B C A:B A:C B:C A:B:C"),
    ("(n:A)", "A A:B A:C A:B:C"),
    ("(n:A&B)", "A:B A:B:C"),
    ("(n:A|B)", "A B A:B A:C B:C A:B:C"),
    ("(n:!A)", "[] B C B:C"),
    ("(n:!!A)", "A A:B A:C A:B:C"),
    ("(n:A&!A)", ""),
    ("(n:A|!A)", "[] A B C A:B A:C B:C A:B:C"),
    ("(n:%)", "A B C A:B A:C B:C A:B:C"),
    ("(n:!%)", "[]"),
    ("(n:%|!%)", "[] A B C A:B A:C B:C A:B:C"),
    ("(n:%&!%)", ""),
    ("(n:A&%)", "A A:B A:C A:B:C"),
    ("(n:A|%)", "A B C A:B A:C B:C A:B:C"),
    ("(n:(A&B)&!(B&C))", "A:B"),
    ("(n:!(A&%)&%)", "B C B:C"),
]


def sig(rows):
    return " ".join(sorted(
        (":".join(sorted(r[0])) or "[]") for r in rows))


for pat, want in MATCH_CASES:
    try:
        r = cypher(spark, f"MATCH {pat} RETURN labels(n) AS l", g).collect()
        got = sig([tuple(x) for x in r])
        ok = got == " ".join(sorted(want.split())) if want else got == ""
        out.write(f"MATCH {pat}: {'ok' if ok else 'GOT ' + got}\n")
    except Exception as e:
        out.write(f"MATCH {pat}: ERR {str(e).split(chr(10))[0][:90]}\n")
    out.flush()

# WHERE-predicate variants (same table per the feature)
for pat, want in MATCH_CASES:
    if pat == "(n)":
        continue
    expr = pat[3:-1]  # strip "(n:" ... ")"
    try:
        r = cypher(spark,
                   f"MATCH (n) WHERE n:{expr} RETURN labels(n) AS l",
                   g).collect()
        got = sig([tuple(x) for x in r])
        ok = got == " ".join(sorted(want.split())) if want else got == ""
        out.write(f"WHERE n:{expr}: {'ok' if ok else 'GOT ' + got}\n")
    except Exception as e:
        out.write(f"WHERE n:{expr}: ERR {str(e).split(chr(10))[0][:90]}\n")
    out.flush()

# unknown-entity-type expression
g2 = PropertyGraph({}, {})
cypher(spark, "CREATE (:A)-[:B]->(:C)", g2).collect()
for expr, want in [("%", 3), ("A", 1), ("B", 1), ("A|B", 2)]:
    try:
        r = cypher(spark,
                   "MATCH (a)-[b]->(c) UNWIND [a, b, c] AS x WITH x "
                   f"WHERE x:{expr} RETURN count(*) AS result",
                   g2).collect()
        got = r[0][0]
        out.write(f"UNK x:{expr}: {'ok' if got == want else 'GOT %s' % got}\n")
    except Exception as e:
        out.write(f"UNK x:{expr}: ERR {str(e).split(chr(10))[0][:90]}\n")
    out.flush()
out.close()
