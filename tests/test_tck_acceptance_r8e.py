"""TCK-style acceptance tranche 8e — behavior-ported from
QuantifiedPathPatternGpmTests.feature (spec-suite-tools acceptance
corpus) with fresh wording.

The scenarios enumerate QPP matches over one fixture graph; duplicate
rows matter (enumeration, not set semantics), so the RESULT ROW COUNT
is the conformance signal — the reference's expected tables are pinned
here as their cardinality plus value spot-checks.
"""

import pytest

# conformance tranche: excluded from the default (core) run so the
# driver's verify window can finish; run with `pytest -m acceptance`
pytestmark = pytest.mark.acceptance


from neo4j_spark.api import cypher
from neo4j_spark.graph import PropertyGraph

SETUP = """
CREATE (a:Person {name: "Chris", age: 30, city:"Paris"})
       -[:E {id:3, weight:3}]->
       (b:Person {name:"Diana", age: 35, city:"Paris"}),
       (d:Person:A {name:'Alice', age: 20, city:"Oslo"})
       -[:E {id:1, weight:6}]->(a),
       (:Person{name:"Bob", age: 25, city:"London"})
       -[:E {id:2, weight:2}]->(a),
       (b)-[:E {id:5, weight:7}]->(:Person{name:"Tony", age: 40,
                                           city:"Oslo"}),
       (b)-[:E {id:4, weight:1}]->(:Person{name:"Sue", age: 32,
                                           city:"London"}),
       (d)-[:K {id:6, weight:3}]->(a),
       (a)-[:K {id:7, weight:2}]->(b)
"""


@pytest.fixture(scope="module")
def qg(spark):
    g = PropertyGraph({}, {})
    cypher(spark, SETUP, g).collect()
    return g


def count(spark, g, q):
    return len(cypher(spark, q, g).collect())


# (scenario-id, query, expected row count) — counts are the reference's
# expected-table cardinalities
CASES = [
    ("4", "MATCH ((a)-->(b))+ RETURN a", 29),
    ("5", "MATCH ((a)-->(b)){1,} RETURN a", 29),
    ("7", "MATCH ((a)-[]->(b))+ RETURN a", 29),
    ("8", "MATCH ((a)-[r]->(b))+ RETURN a", 29),
    ("6", "MATCH ((a)-->(b)){1, 2} RETURN a", 17),
    ("9", "MATCH (x) ((a)-[r]->(b))+ RETURN x, a", 29),
    ("10", "MATCH (x) ((a)-[r]->(b))+ (y) RETURN x, a, r, b, y", 29),
    ("11", "MATCH (x) ((a)-[r]->(b))* RETURN x, a, r, b", 35),
    ("12", "MATCH (x) ((a)-[r]->(b))* (y) RETURN x, a, r, b, y", 35),
    ("13", "MATCH (x)-->(z) ((a)-[r]->(b))+ RETURN x, z, a, r, b", 22),
    ("14", "MATCH ((a:Person)-[r]->(b))+ RETURN a, r, b", 29),
    ("15", "MATCH ((a:Person|A)-[r]->(b))+ RETURN a, r, b", 29),
    ("16", "MATCH ((a:Person&A)-[r]->(b))+ RETURN a, r, b", 2),
    ("17", "MATCH (x:Person&A)((a)-[r]->(b))+ RETURN x, a, r, b", 14),
    ("18", "MATCH (x:Person&A)((a:Person|A)-[r]->(b))+ "
     "RETURN x, a, r, b", 14),
    ("22", "MATCH (x:Person&A)((a:Person|A)-[r:E|K]->(b))+ "
     "RETURN x, a, r, b", 14),
    ("19", "MATCH ((a)-[r:E]->(b))+ RETURN a, r, b", 13),
    ("20", "MATCH ((a)-[r:E|K]->(b))+ RETURN a, r, b", 29),
    ("21", "MATCH (x:Person&A)((a)-[r:E]->(b))+ RETURN x, a, r, b", 4),
    ("23", "MATCH ((a)-[r]->(b)-[s]->(c))+ RETURN a, r, b, s, c", 10),
    ("24", "MATCH ((a)-[r:K]->(b)-[s:E]->(c))+ RETURN a, r, b, s, c", 3),
    ("25", "MATCH ((a)-[r:E]->(b)-[s:E]->(c))+ RETURN a, r, b, s, c", 4),
    ("26", "MATCH (x)-[y:E]->(z)((a)-[r:E]->(b)-[s:E]->(c))+ "
     "RETURN x, y, z, a, r, b, s, c", 4),
    ("27", "MATCH (x)-[y:E]->(z)((a)-[r:K]->(b)-[s:E]->(c))+ "
     "RETURN x, y, z, a, r, b, s, c", 4),
    ("28", "MATCH (x)-->(y)-->(z), (y)((a)-[r:E]->(b))+ "
     "RETURN x, y, z, a, r, b", 13),
    ("29", "MATCH (p) ((a)-[r]->(b))+ (q WHERE p.city = q.city) "
     "RETURN p, a, r, b, q", 8),
    ("30", "MATCH ((a:Person)-[r]->(b WHERE a.age < b.age))+ "
     "RETURN a, r, b", 20),
    ("31", "MATCH ((a:Person)-[r WHERE r.weight < 5]->(b))+ "
     "RETURN a, r, b", 15),
    ("32", "MATCH ((a:Person)-[r WHERE r.weight < 5]->"
     "(b WHERE b.city = 'Oslo'))+ RETURN a, r, b", 0),
    ("33", "MATCH ((a:Person)-[r]->(b) WHERE NOT a.city = 'Oslo')+ "
     "RETURN a, r, b", 15),
    ("34", "MATCH ((a:Person)-[r]->(b) WHERE NOT a.city = 'Oslo' "
     "AND NOT b.city = 'Oslo')+ RETURN a, r, b", 10),
    ("35", "MATCH ((a:Person)-[r WHERE r.weight > 5]->(b) "
     "WHERE a.age + b.age > 50)+ RETURN a, r, b", 1),
]


class TestQppGpmEnumeration:
    @pytest.mark.parametrize("sid,q,want", CASES,
                             ids=[c[0] for c in CASES])
    def test_cardinality(self, spark, qg, sid, q, want):
        assert count(spark, qg, q) == want

    def test_value_spot_checks(self, spark, qg):
        # scenario 16: exactly Alice's two parallel edges to Chris
        got = sorted(tuple(r) for r in cypher(spark, """
            MATCH ((a:Person&A)-[r]->(b))+
            RETURN [x IN a | x.name] AS an, [x IN r | x.id] AS ri,
                   [x IN b | x.name] AS bn
        """, qg).collect())
        assert got == [(["Alice"], [1], ["Chris"]),
                       (["Alice"], [6], ["Chris"])]
        # scenario 35: the single row is Diana -[w7]-> Tony
        # (Alice+Chris = 50 fails the strict > 50)
        [(an, ri, bn)] = [tuple(r) for r in cypher(spark, """
            MATCH ((a:Person)-[r WHERE r.weight > 5]->(b)
                   WHERE a.age + b.age > 50)+
            RETURN [x IN a | x.name] AS an, [x IN r | x.weight] AS rw,
                   [x IN b | x.name] AS bn
        """, qg).collect()]
        assert (an, ri, bn) == (["Diana"], [7], ["Tony"])
