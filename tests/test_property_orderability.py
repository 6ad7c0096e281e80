"""Property-based conformance of GLOBAL ORDERABILITY over heterogeneous
values: hypothesis generates random mixed-type value lists (scalars +
nested lists), the engine sorts them (ORDER BY through the tagged
encoding, anyvalue.py), and the rendered order must match a Python model
of the reference's total order (AnyValues.java:69 / ValueGroup.java:32
ranks: LIST < STRING < BOOLEAN < NUMBER < NULL for the classes used
here; numbers by value with NaN greatest, booleans false < true, lists
elementwise with prefix-shorter-first)."""

import datetime as _dt
import math

from hypothesis import HealthCheck, given, settings, strategies as st

from neo4j_spark.api import cypher

# value pools chosen so no two DISTINCT values render identically.
# Numbers are floats only: mixing ints and floats makes Spark's list
# unification widen ints to double ('1' renders '1.0'), which is pure
# rendering, not ordering — integer order/rendering through the tagged
# encoding is covered by mixed_list_order / mixed_deep_nesting
_FLOATS = [-3.5, 0.5, 2.5, float("nan")]
_STRS = ["", "B", "a", "ab"]
_BOOLS = [False, True]
_DATES = [_dt.date(2023, 1, 1), _dt.date(2024, 6, 15)]

_scalar = st.one_of(
    st.sampled_from(_FLOATS), st.sampled_from(_DATES),
    st.sampled_from(_STRS), st.sampled_from(_BOOLS), st.none())
_value = st.recursive(
    _scalar, lambda kids: st.lists(kids, min_size=0, max_size=3),
    max_leaves=5)


def _rank(v) -> int:
    if v is None:
        return 16
    if isinstance(v, list):
        return 4
    if isinstance(v, _dt.date):
        return 9
    if isinstance(v, bool):
        return 14
    if isinstance(v, str):
        return 13
    return 15  # number


def _cmp(a, b) -> int:
    ra, rb = _rank(a), _rank(b)
    if ra != rb:
        return -1 if ra < rb else 1
    if ra == 16:
        return 0
    if ra == 15:
        # NaN sorts greatest among numbers (AnyValues order)
        na, nb = math.isnan(a), math.isnan(b)
        if na or nb:
            return 0 if na and nb else (1 if na else -1)
        return -1 if a < b else (1 if a > b else 0)
    if ra in (9, 13, 14):
        return (a > b) - (a < b)
    # lists: elementwise, shorter prefix first
    for x, y in zip(a, b):
        c = _cmp(x, y)
        if c != 0:
            return c
    return (len(a) > len(b)) - (len(a) < len(b))


def _lit(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, _dt.date):
        return f"date('{v.isoformat()}')"
    if isinstance(v, list):
        return "[" + ", ".join(_lit(x) for x in v) + "]"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return "'" + v + "'"
    if isinstance(v, float):
        return "0.0/0.0" if math.isnan(v) else repr(v)
    return repr(v)


def _render(v, top=True):
    """Mirror the engine's ProduceResult text form for tagged values."""
    if v is None:
        return None if top else "null"
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ", ".join(_render(x, top=False) for x in v) + "]"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, str):
        return v
    return repr(v)


import functools  # noqa: E402

import pytest

# conformance tranche: excluded from the default (core) run so the
# driver's verify window can finish; run with `pytest -m acceptance`
pytestmark = pytest.mark.acceptance


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(_value, min_size=1, max_size=6))
def test_random_mixed_order_matches_reference_model(spark, chain_graph,
                                                    vals):
    # the engine sorts through the tagged encoding; values that compare
    # EQUAL under the model render identically, so rendered order is
    # well-defined even though their mutual order is unspecified
    lits = ", ".join(_lit(v) for v in vals)
    got = [r[0] for r in cypher(
        spark, f"UNWIND [{lits}] AS x RETURN x ORDER BY x",
        chain_graph).collect()]
    want = [_render(v) for v in
            sorted(vals, key=functools.cmp_to_key(_cmp))]
    # top-level scalars pass through untagged when the list happens to be
    # homogeneous — normalize engine output to the rendered text form
    norm = []
    for g in got:
        if g is None:
            norm.append(None)
        elif isinstance(g, bool):
            norm.append("true" if g else "false")
        elif isinstance(g, float):
            norm.append("NaN" if math.isnan(g) else repr(g))
        elif isinstance(g, list):
            norm.append(_render(g))
        else:
            norm.append(str(g))
    assert norm == want


def _teq(a, b):
    """Reference ternaryEquals model (AnyValue.java:62, Value.java:151):
    null operand -> None; NaN operand -> False; cross-class -> False;
    lists: length mismatch False, else ternary AND elementwise."""
    if a is None or b is None:
        return None
    ra, rb = _rank(a), _rank(b)
    if ra != rb:
        return False
    if ra == 15 and (math.isnan(a) or math.isnan(b)):
        return False
    if ra == 9:
        return a == b
    if ra == 4:
        if len(a) != len(b):
            return False
        acc = True
        for x, y in zip(a, b):
            e = _teq(x, y)
            if e is False:
                return False
            if e is None:
                acc = None
        return acc
    return a == b


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=st.lists(st.tuples(_value, _value), min_size=1, max_size=5))
def test_random_ternary_equality_matches_reference_model(spark, chain_graph,
                                                         pairs):
    cols = ", ".join(
        f"{_lit(a)} = {_lit(b)} AS c{i}" for i, (a, b) in enumerate(pairs))
    [row] = cypher(spark, f"RETURN {cols}", chain_graph).collect()
    got = [row[i] for i in range(len(pairs))]
    want = [_teq(a, b) for a, b in pairs]
    assert got == want


# integer pool variant: ints stay longs (render '1', order via __vi)
_INT_SCALAR = st.one_of(
    st.sampled_from([-3, 1, 7]), st.sampled_from(_STRS),
    st.sampled_from(_BOOLS), st.none())
_INT_VALUE = st.recursive(
    _INT_SCALAR, lambda kids: st.lists(kids, min_size=0, max_size=3),
    max_leaves=5)


def _render_i(v, top=True):
    if v is None:
        return None if top else "null"
    if isinstance(v, list):
        return "[" + ", ".join(_render_i(x, top=False) for x in v) + "]"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return v
    return repr(v)


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(_INT_VALUE, min_size=1, max_size=6))
def test_random_integer_order_matches_reference_model(spark, chain_graph,
                                                      vals):
    lits = ", ".join(_lit(v) for v in vals)
    got = [r[0] for r in cypher(
        spark, f"UNWIND [{lits}] AS x RETURN x ORDER BY x DESC",
        chain_graph).collect()]
    want = [_render_i(v) for v in
            sorted(vals, key=functools.cmp_to_key(_cmp), reverse=True)]
    norm = []
    for g in got:
        if g is None:
            norm.append(None)
        elif isinstance(g, bool):
            norm.append("true" if g else "false")
        elif isinstance(g, list):
            norm.append(_render_i(g))
        else:
            norm.append(str(g))
    assert norm == want


def _tin(x, lst):
    """Ternary IN model: definite hit True; null element or null subject
    (non-empty list) None; else False.  x IN null is None."""
    if lst is None:
        return None
    if x is None:
        return None if len(lst) > 0 else False
    undef = False
    for el in lst:
        e = _teq(x, el)
        if e is True:
            return True
        if e is None:
            undef = True
    return None if undef else False


@settings(max_examples=30, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(cases=st.lists(
    st.tuples(_value, st.one_of(st.none(),
                                st.lists(_value, max_size=4))),
    min_size=1, max_size=5))
def test_random_in_matches_reference_model(spark, chain_graph, cases):
    cols = ", ".join(
        f"{_lit(a)} IN {_lit(b)} AS c{i}" for i, (a, b) in enumerate(cases))
    [row] = cypher(spark, f"RETURN {cols}", chain_graph).collect()
    got = [row[i] for i in range(len(cases))]
    want = [_tin(a, b) for a, b in cases]
    assert got == want


def _tcmp(a, b):
    """Ternary comparability model (<): null/NaN operand or cross-group
    -> None; booleans/strings/numbers by value; lists elementwise with
    ternary element comparisons."""
    if a is None or b is None:
        return None
    ra, rb = _rank(a), _rank(b)
    if ra != rb:
        return None
    if ra == 15:
        if math.isnan(a) or math.isnan(b):
            return None
        return a < b
    if ra in (9, 13, 14):
        return a < b
    # lists: first non-equal element decides; undefined element -> None
    for x, y in zip(a, b):
        e = _teq(x, y)
        if e is None:
            return None
        if e is False:
            c = _tcmp(x, y)
            return c
    return len(a) < len(b)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(pairs=st.lists(st.tuples(_value, _value), min_size=1, max_size=3))
def test_random_less_than_matches_reference_model(spark, chain_graph,
                                                  pairs):
    cols = ", ".join(
        f"{_lit(a)} < {_lit(b)} AS c{i}" for i, (a, b) in enumerate(pairs))
    [row] = cypher(spark, f"RETURN {cols}", chain_graph).collect()
    got = [row[i] for i in range(len(pairs))]
    want = [_tcmp(a, b) for a, b in pairs]
    assert got == want


def test_list_comparison_deterministic_cases(spark, chain_graph):
    """Hand-picked ternary list comparisons (the shapes the random sweep
    exercises, pinned so a fast deterministic run still covers them)."""
    cases = [
        ("[0.0/0.0] < [0.0/0.0]", None), ("[0.5] < [0.0/0.0]", None),
        ("[null] < [0.5]", None), ("[0.5] < [2.5]", True),
        ("[0.5, ''] < [0.5, 'a']", True), ("[''] < [0.5]", None),
        ("[] < 0.5", None), ("[[0.5]] < [[2.5]]", True),
        ("[true] < [false]", False), ("[0.5] <= [0.5]", True),
        ("[0.5, null] < [0.5, 2.5]", None), ("[null] < []", False),
        ("-3.5 < []", None), ("[] < ['']", True),
        ("0.5 IN null", None),
    ]
    cols = ", ".join(f"{q} AS c{i}" for i, (q, _) in enumerate(cases))
    [row] = cypher(spark, f"RETURN {cols}", chain_graph).collect()
    for i, (q, want) in enumerate(cases):
        assert row[i] == want, f"{q}: got {row[i]}, want {want}"


class TestPathOrderability:
    """PATH's dedicated group rank in the global order
    (ValueGroup.java:32 slots PATH between LIST and POINT;
    PathValue.unsafeCompareTo: first node, then rel ids, then rel
    count)."""

    def test_path_group_slot_in_mixed_key(self, spark, tpch_graph):
        from neo4j_spark.api import cypher

        out = cypher(spark, """
            MATCH p = (n:Nation {name: 'NATION_0'})-[r:IN_REGION]->(:Region)
            WITH p, n, r LIMIT 1
            UNWIND [p, [1], point({x: 1, y: 2}), n, r] AS v
            WITH v ORDER BY v
            RETURN collect(valueType(v)) AS vts
        """, tpch_graph).collect()
        # valueType is VALUE-based even through the tagged mixed-type
        # encoding: [1] reads as LIST<INTEGER NOT NULL>, not LIST<ANY>
        # (ValueTypeFunctionAcceptance exact list element unions)
        assert out[0]["vts"] == [
            "NODE NOT NULL", "RELATIONSHIP NOT NULL",
            "LIST<INTEGER NOT NULL> NOT NULL",
            "PATH NOT NULL", "POINT NOT NULL"]

    def test_paths_order_by_first_node_then_rels(self, spark, tpch_graph):
        from neo4j_spark.api import cypher

        # two paths in one mixed key: first-node id decides
        out = cypher(spark, """
            MATCH p = (n:Nation)-[:IN_REGION]->(:Region)
            WITH p, n.name AS nm WHERE nm IN ['NATION_0', 'NATION_3']
            UNWIND [p, 'tail'] AS v
            WITH nm, v ORDER BY v, nm
            RETURN collect(nm)[0..2] AS first_two
        """, tpch_graph).collect()
        assert out[0]["first_two"] == ["NATION_0", "NATION_3"]

    def test_path_equality_in_mixed_list(self, spark, tpch_graph):
        from neo4j_spark.api import cypher

        out = cypher(spark, """
            MATCH p = (n:Nation {name: 'NATION_0'})-[:IN_REGION]->(:Region)
            WITH p LIMIT 1
            RETURN [p, 'a'][0] = p AS eq, p IN [p, 1] AS inn,
                   ([p, 'a'][0] < 'z') IS NULL AS cross_undef
        """, tpch_graph).collect()
        assert [tuple(r) for r in out] == [(True, True, True)]
