"""Property-based randomized cross-checks against DuckDB.

The reference tests its runtimes against randomly generated logical plans
(``community/cypher/logical-plan-generator``, used by the runtime spec's
``LogicalQueryGenerator.scala``).  Here the random axis is the *predicate
language*: hypothesis generates boolean-expression trees over a nullable
table, each tree is rendered to BOTH a Cypher WHERE clause and an
equivalent DuckDB SQL WHERE clause, and the row sets must agree — a
randomized conformance check of the ternary-logic expression compiler
(AnyValue.ternaryEquals semantics, SURVEY §1.2) against a trusted SQL
engine.
"""

import duckdb
import pytest

# conformance tranche: excluded from the default (core) run so the
# driver's verify window can finish; run with `pytest -m acceptance`
pytestmark = pytest.mark.acceptance

from hypothesis import HealthCheck, given, settings, strategies as st

# deterministic nullable rows: (id, val, flag)
ROWS = []
for i in range(40):
    val = None if i % 7 == 3 else (i * 3) % 17 - 4
    flag = None if i % 11 == 5 else (i % 3 == 0)
    ROWS.append((i, val, flag))


@pytest.fixture(scope="module")
def rnd_graph(spark):
    from neo4j_spark.graph import PropertyGraph

    nodes = {
        "T": spark.createDataFrame(
            [(i, ["T"], v, f) for i, v, f in ROWS],
            "id long, labels array<string>, val long, flag boolean"),
    }
    return PropertyGraph(nodes, {})


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, val BIGINT, flag BOOLEAN)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", ROWS)
    yield con
    con.close()


# ---- predicate spec trees --------------------------------------------------

_leaf = st.one_of(
    st.tuples(st.just("cmp"), st.sampled_from(["<", "<=", "=", ">=", ">", "<>"]),
              st.integers(-6, 14)),
    st.tuples(st.just("in"),
              st.lists(st.one_of(st.integers(-6, 14), st.none()),
                       min_size=0, max_size=4)),
    st.tuples(st.just("isnull")),
    st.tuples(st.just("isnotnull")),
    st.tuples(st.just("flag")),
)

_pred = st.recursive(
    _leaf,
    lambda ch: st.one_of(
        st.tuples(st.just("and"), ch, ch),
        st.tuples(st.just("or"), ch, ch),
        st.tuples(st.just("not"), ch),
    ),
    max_leaves=7,
)


def _lit(v):
    return "NULL" if v is None else str(v)


def _cypher(p) -> str:
    op = p[0]
    if op == "cmp":
        o = "<>" if p[1] == "<>" else p[1]
        return f"(n.val {o} {p[2]})"
    if op == "in":
        items = ", ".join("null" if v is None else str(v) for v in p[1])
        return f"(n.val IN [{items}])"
    if op == "isnull":
        return "(n.val IS NULL)"
    if op == "isnotnull":
        return "(n.val IS NOT NULL)"
    if op == "flag":
        return "(n.flag)"
    if op == "and":
        return f"({_cypher(p[1])} AND {_cypher(p[2])})"
    if op == "or":
        return f"({_cypher(p[1])} OR {_cypher(p[2])})"
    return f"(NOT {_cypher(p[1])})"


def _sql(p) -> str:
    op = p[0]
    if op == "cmp":
        return f"(val {p[1]} {p[2]})"
    if op == "in":
        if not p[1]:
            return "FALSE"
        return f"(val IN ({', '.join(_lit(v) for v in p[1])}))"
    if op == "isnull":
        return "(val IS NULL)"
    if op == "isnotnull":
        return "(val IS NOT NULL)"
    if op == "flag":
        return "(flag)"
    if op == "and":
        return f"({_sql(p[1])} AND {_sql(p[2])})"
    if op == "or":
        return f"({_sql(p[1])} OR {_sql(p[2])})"
    return f"(NOT {_sql(p[1])})"


@given(p=_pred)
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_predicates_match_duckdb(spark, rnd_graph, duck, p):
    from neo4j_spark.api import cypher

    q = f"MATCH (n:T) WHERE {_cypher(p)} RETURN id(n) AS id ORDER BY id"
    got = [r["id"] for r in cypher(spark, q, rnd_graph).collect()]
    want = [r[0] for r in duck.execute(
        f"SELECT id FROM t WHERE {_sql(p)} ORDER BY id").fetchall()]
    assert got == want, f"pred={p}\ncypher={_cypher(p)}\nsql={_sql(p)}"


@given(lo=st.integers(-6, 14), hi=st.integers(-6, 14))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_aggregates_match_duckdb(spark, rnd_graph, duck, lo, hi):
    """Grouped aggregates over a randomly-bounded slice, encoding CYPHER
    null semantics on the SQL side: sum of an all-null group is 0 (not
    NULL), count(x)/collect(x) skip nulls, avg/min of all-null is null."""
    from neo4j_spark.api import cypher

    q = (f"MATCH (n:T) WHERE n.val >= {lo} AND n.val < {hi} "
         "OR n.val IS NULL "
         "RETURN n.flag AS flag, sum(n.val) AS s, count(n.val) AS c, "
         "avg(n.val) AS a, min(n.val) AS mn, size(collect(n.val)) AS cl "
         "ORDER BY flag")
    got = [(r["flag"], r["s"], r["c"], round(r["a"], 6) if r["a"] is not None
            else None, r["mn"], r["cl"])
           for r in cypher(spark, q, rnd_graph).collect()]
    want = [(r[0], r[1], r[2], round(r[3], 6) if r[3] is not None else None,
             r[4], r[5])
            for r in duck.execute(
        f"SELECT flag, coalesce(sum(val), 0) AS s, count(val) AS c, "
        f"avg(val) AS a, min(val) AS mn, count(val) AS cl FROM t "
        f"WHERE val >= {lo} AND val < {hi} OR val IS NULL "
        f"GROUP BY flag ORDER BY flag NULLS LAST").fetchall()]
    assert got == want


@given(lo=st.integers(-6, 14), hi=st.integers(-6, 14),
       k=st.integers(1, 10), skip=st.integers(0, 5))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_random_range_sort_paging_matches_duckdb(spark, rnd_graph, duck,
                                                 lo, hi, k, skip):
    from neo4j_spark.api import cypher

    q = (f"MATCH (n:T) WHERE n.val >= {lo} AND n.val < {hi} "
         f"RETURN id(n) AS id ORDER BY n.val, id SKIP {skip} LIMIT {k}")
    got = [r["id"] for r in cypher(spark, q, rnd_graph).collect()]
    want = [r[0] for r in duck.execute(
        f"SELECT id FROM t WHERE val >= {lo} AND val < {hi} "
        f"ORDER BY val, id OFFSET {skip} LIMIT {k}").fetchall()]
    assert got == want


# ---- randomized string-function pipelines ---------------------------------

SROWS = [
    (0, None), (1, ""), (2, "a"), (3, "abc"), (4, " a b "), (5, "Hello"),
    (6, "xxabxx"), (7, "  pad  "), (8, "aAbB"), (9, "x" * 8), (10, "b a"),
]


@pytest.fixture(scope="module")
def str_graph(spark):
    from neo4j_spark.graph import PropertyGraph

    nodes = {
        "S": spark.createDataFrame(
            [(i, ["S"], s) for i, s in SROWS],
            "id long, labels array<string>, s string"),
    }
    return PropertyGraph(nodes, {})


@pytest.fixture(scope="module")
def str_duck():
    con = duckdb.connect()
    con.execute("CREATE TABLE s (id BIGINT, s VARCHAR)")
    con.executemany("INSERT INTO s VALUES (?, ?)", SROWS)
    yield con
    con.close()


_str_op = st.one_of(
    st.sampled_from([("upper",), ("lower",), ("reverse",), ("trim",),
                     ("ltrim",), ("rtrim",)]),
    st.tuples(st.just("left"), st.integers(0, 3)),
    st.tuples(st.just("right"), st.integers(0, 3)),
    st.tuples(st.just("substring"), st.integers(0, 3), st.integers(0, 4)),
    st.tuples(st.just("replace"), st.sampled_from("abx"),
              st.sampled_from("zq")),
)


def _cy_str(ops) -> str:
    e = "n.s"
    for op in ops:
        if op[0] == "upper":
            e = f"toUpper({e})"
        elif op[0] == "lower":
            e = f"toLower({e})"
        elif op[0] in ("reverse", "trim", "ltrim", "rtrim"):
            e = f"{op[0]}({e})"
        elif op[0] in ("left", "right"):
            e = f"{op[0]}({e}, {op[1]})"
        elif op[0] == "substring":
            e = f"substring({e}, {op[1]}, {op[2]})"
        elif op[0] == "replace":
            e = f"replace({e}, '{op[1]}', '{op[2]}')"
    return e


def _sql_str(ops) -> str:
    e = "s"
    for op in ops:
        if op[0] in ("upper", "lower", "reverse", "trim", "ltrim", "rtrim"):
            e = f"{op[0]}({e})"
        elif op[0] in ("left", "right"):
            e = f"{op[0]}({e}, {op[1]})"
        elif op[0] == "substring":
            e = f"substr({e}, {op[1] + 1}, {op[2]})"  # Cypher is 0-based
        elif op[0] == "replace":
            e = f"replace({e}, '{op[1]}', '{op[2]}')"
    return e


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=st.lists(_str_op, min_size=1, max_size=3))
def test_random_string_pipelines_match_duckdb(spark, str_graph, str_duck,
                                              ops):
    from neo4j_spark.api import cypher

    cy = (f"MATCH (n:S) RETURN id(n) AS id, {_cy_str(ops)} AS v "
          "ORDER BY id")
    got = [(r["id"], r["v"]) for r in cypher(spark, cy, str_graph).collect()]
    want = str_duck.execute(
        f"SELECT id, {_sql_str(ops)} AS v FROM s ORDER BY id").fetchall()
    # normalize duckdb's empty-string vs engine behavior only via equality
    assert got == [tuple(w) for w in want], f"ops={ops}"


# ---- randomized arithmetic trees ------------------------------------------

_arith = st.recursive(
    st.one_of(st.just(("col",)), st.integers(-9, 9).map(lambda v: ("lit", v))),
    lambda ch: st.one_of(
        st.tuples(st.sampled_from(["+", "-", "*"]), ch, ch),
        st.tuples(st.just("/"), ch, st.integers(1, 6)),
        st.tuples(st.just("%"), ch, st.integers(1, 6)),
        st.tuples(st.just("abs"), ch),
        st.tuples(st.just("neg"), ch),
    ),
    max_leaves=5,
)


def _cy_arith(e) -> str:
    if e[0] == "col":
        return "n.val"
    if e[0] == "lit":
        return str(e[1])
    if e[0] in ("+", "-", "*"):
        return f"({_cy_arith(e[1])} {e[0]} {_cy_arith(e[2])})"
    if e[0] in ("/", "%"):
        return f"({_cy_arith(e[1])} {e[0]} {e[2]})"
    if e[0] == "abs":
        return f"abs({_cy_arith(e[1])})"
    return f"(-{_cy_arith(e[1])})"


def _sql_arith(e) -> str:
    if e[0] == "col":
        return "val"
    if e[0] == "lit":
        return str(e[1])
    if e[0] in ("+", "-", "*"):
        return f"({_sql_arith(e[1])} {e[0]} {_sql_arith(e[2])})"
    if e[0] == "/":
        # Cypher integer division truncates toward zero (CypherMath.java);
        # duckdb // floors — render the Java semantics explicitly
        return (f"CAST(trunc(CAST({_sql_arith(e[1])} AS DOUBLE) / {e[2]}) "
                "AS BIGINT)")
    if e[0] == "%":
        return f"({_sql_arith(e[1])} % {e[2]})"
    if e[0] == "abs":
        return f"abs({_sql_arith(e[1])})"
    return f"(0 - {_sql_arith(e[1])})"  # "-(-1)" would lex as a SQL comment


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(e=_arith)
def test_random_arithmetic_matches_duckdb(spark, rnd_graph, duck, e):
    from neo4j_spark.api import cypher

    cy = (f"MATCH (n:T) RETURN id(n) AS id, {_cy_arith(e)} AS v "
          "ORDER BY id")
    got = [(r["id"], r["v"]) for r in cypher(spark, cy, rnd_graph).collect()]
    want = duck.execute(
        f"SELECT id, CAST({_sql_arith(e)} AS BIGINT) AS v FROM t "
        "ORDER BY id").fetchall()
    assert got == [tuple(w) for w in want], f"expr={e}"


# ---- randomized temporal components ---------------------------------------

_COMPONENTS = {
    # cypher accessor -> duckdb expression over column d
    "year": "CAST(year(d) AS BIGINT)",
    "month": "CAST(month(d) AS BIGINT)",
    "day": "CAST(day(d) AS BIGINT)",
    "week": "CAST(week(d) AS BIGINT)",
    "quarter": "CAST(quarter(d) AS BIGINT)",
    "dayOfWeek": "CAST(isodow(d) AS BIGINT)",
    "ordinalDay": "CAST(dayofyear(d) AS BIGINT)",
}


@pytest.fixture(scope="module")
def date_fixture(spark):
    import datetime

    from neo4j_spark.graph import PropertyGraph

    rows = [(i, datetime.date(1996 + (i * 7) % 30, (i * 5) % 12 + 1,
                              (i * 11) % 28 + 1)) for i in range(25)]
    g = PropertyGraph({
        "D": spark.createDataFrame(
            [(i, ["D"], d) for i, d in rows],
            "id long, labels array<string>, d date")}, {})
    con = duckdb.connect()
    con.execute("CREATE TABLE dt (id BIGINT, d DATE)")
    con.executemany("INSERT INTO dt VALUES (?, ?)", rows)
    return g, con


@settings(max_examples=14, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(comp=st.sampled_from(sorted(_COMPONENTS)))
def test_random_temporal_components_match_duckdb(spark, date_fixture, comp):
    from neo4j_spark.api import cypher

    g, con = date_fixture
    got = [(r["id"], r["v"]) for r in cypher(
        spark, f"MATCH (n:D) RETURN id(n) AS id, n.d.{comp} AS v "
        "ORDER BY id", g).collect()]
    want = con.execute(
        f"SELECT id, {_COMPONENTS[comp].replace('(d)', '(d)')} AS v "
        "FROM dt ORDER BY id").fetchall()
    assert got == [tuple(w) for w in want], f"component={comp}"
