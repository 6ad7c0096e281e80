"""Tagged-struct encoding for heterogeneous (mixed-type) Cypher values.

The reference stores every runtime value as an ``AnyValue`` with one global
comparator (``community/values/src/main/java/org/neo4j/values/AnyValues.java:69``
and ``storable/ValueGroup.java:32``); Spark columns have ONE static type, so
mixed-type values (``[1, 'a', true]``, mixed ORDER BY keys) are encoded as a
struct whose FIELD ORDER mirrors the CIP's ascending global sort order:

    __vg  int      order-group rank (see ANY_RANK below)
    __vn  double   number payload (NaN sorts after +Inf, matching the CIP)
    __vs  string   string payload
    __vb  boolean  boolean payload (false < true)
    __vi  long     integer payload (keeps toString(1) = '1', not '1.0')

Struct comparison in Spark is field-order lexicographic, so sorting a tagged
column ascending IS the Cypher global order: groups separate on ``__vg``,
then exactly one payload field is non-null within a group.  SQL-null cells
encode as rank 16 (VOID sorts last), so ``asc_nulls_last`` and the encoding
agree.

Scope: the scalar storable groups — temporal instants (7/8/9), times
(10/11), DURATION (12), STRING (13), BOOLEAN (14), NUMBER (15), VOID (16)
— in the 5-field layout above, PLUS (round 3) the container/virtual
groups MAP(1), NODE(2), RELATIONSHIP(3), LIST(4), POINT(6) in an
EXTENDED layout appending three payload fields:

    __vl  array<scalar-layout>          list elements, in order
    __vm  struct<__msz, __mkv: array<{__mk, __mv}>>  map size + entries
                                        sorted by key (AnyValues.java's
                                        map comparator: size, then
                                        key-ordered entries)
    __vp  struct<__pc, __px: array<double>>  point CRS + coordinates

Because only ONE payload group is non-null per row and equal-null fields
tie in Spark's struct comparison, appending fields preserves the scalar
order while making lists sort element-wise (Spark array comparison is
exactly the CIP's list order: element-wise, prefix-shorter-first), maps
by size-then-sorted-entries and points by CRS-then-coordinates.  Nodes
and relationships order by id, reusing the ``__vi`` payload.

Nesting depth is derived from the STATIC schema: Spark types are finite
trees, so the encoder builds the layout recursively to exactly the depth
the mixed operands need (``container_depth``) — ``[[1], 'a']`` encodes at
depth 1, ``[[[1], 'a'], 'b']`` at depth 2, and so on.  The reference's
AnyValue tree is unbounded only dynamically; any CONCRETE value/schema is
finite, which is all a static layout must cover.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, functions as F, types as T

INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)

# ascending global sort order (AnyValues.java javadoc + ValueGroup.java):
# MAP(1) NODE(2) RELATIONSHIP(3) LIST(4) PATH(5) POINT(6) ZONED_DT(7)
# LOCAL_DT(8) DATE(9) ZONED_TIME(10) LOCAL_TIME(11) DURATION(12)
# STRING(13) BOOLEAN(14) NUMBER(15) VOID(16)
RANK_MAP = 1
RANK_NODE = 2
RANK_REL = 3
RANK_LIST = 4
RANK_PATH = 5
RANK_POINT = 6
RANK_ZONED_DT = 7
RANK_LOCAL_DT = 8
RANK_DATE = 9
RANK_ZONED_TIME = 10
RANK_LOCAL_TIME = 11
RANK_DURATION = 12
RANK_STRING = 13
RANK_BOOLEAN = 14
RANK_NUMBER = 15
RANK_NULL = 16
TEMPORAL_RANKS = (RANK_ZONED_DT, RANK_LOCAL_DT, RANK_DATE,
                  RANK_ZONED_TIME, RANK_LOCAL_TIME)

ANY_FIELDS = ("__vg", "__vn", "__vs", "__vb", "__vi")
CONTAINER_FIELDS = ("__vl", "__vm", "__vp")

# simpleString type fragments for the extended layout's payloads
_SCAL_T = ("struct<__vg:int,__vn:double,__vs:string,__vb:boolean,"
           "__vi:bigint>")
_POINT_T = "struct<__pc:string,__px:array<double>>"


def _layout_str(depth: int) -> str:
    """simpleString of the tagged layout at ``depth`` container levels
    (0 = the 5-field scalar layout)."""
    if depth <= 0:
        return _SCAL_T
    inner = _layout_str(depth - 1)
    return ("struct<__vg:int,__vn:double,__vs:string,__vb:boolean,"
            f"__vi:bigint,__vl:array<{inner}>,"
            f"__vm:struct<__msz:int,__mkv:array<struct<__mk:string,"
            f"__mv:{inner}>>>,__vp:{_POINT_T}>")


def _list_t(depth: int) -> str:
    return f"array<{_layout_str(depth - 1)}>"


def _map_t(depth: int) -> str:
    return (f"struct<__msz:int,__mkv:array<struct<__mk:string,"
            f"__mv:{_layout_str(depth - 1)}>>>")

# back-compat aliases (depth-1 layout payloads)
_LIST_T = _list_t(1)
_MAP_T = _map_t(1)


def is_any_type(t) -> bool:
    return (isinstance(t, T.StructType)
            and tuple(t.fieldNames())[:5] == ANY_FIELDS)


def is_deep_any_type(t) -> bool:
    return (isinstance(t, T.StructType)
            and tuple(t.fieldNames()) == ANY_FIELDS + CONTAINER_FIELDS)


def any_layout_depth(t) -> int:
    """Container depth of a TAGGED layout type (0 = scalar 5-field)."""
    if not is_deep_any_type(t):
        return 0
    el = t["__vl"].dataType.elementType
    return 1 + any_layout_depth(el)


def _nulls():
    return (F.lit(None).cast("double"), F.lit(None).cast("string"),
            F.lit(None).cast("boolean"), F.lit(None).cast("long"))


def _pack(g: Column, n: Column, s: Column, b: Column, i: Column) -> Column:
    return F.struct(g.cast("int").alias("__vg"), n.alias("__vn"),
                    s.alias("__vs"), b.alias("__vb"), i.alias("__vi"))


def to_any(c: Column, t: Optional[T.DataType]) -> Column:
    """Encode a natively-typed column as a tagged AnyValue struct.

    A runtime NULL in any payload type encodes as rank 16 so null ordering
    and ternary logic see one uniform representation."""
    nn, ns, nb, ni = _nulls()
    if is_any_type(t):
        # normalize SQL-null cells (unification casts) to rank-16 so
        # ordering/equality see one null representation
        return F.when(c.isNull(),
                      _pack(F.lit(RANK_NULL), nn, ns, nb, ni)).otherwise(c)
    if t is None or isinstance(t, T.NullType):
        return _pack(F.lit(RANK_NULL), nn, ns, nb, ni)
    if isinstance(t, INT_TYPES):
        g = F.when(c.isNull(), RANK_NULL).otherwise(RANK_NUMBER)
        return _pack(g, c.cast("double"), ns, nb, c.cast("long"))
    if isinstance(t, (T.FloatType, T.DoubleType, T.DecimalType)):
        g = F.when(c.isNull(), RANK_NULL).otherwise(RANK_NUMBER)
        return _pack(g, c.cast("double"), ns, nb, ni)
    if isinstance(t, T.StringType):
        g = F.when(c.isNull(), RANK_NULL).otherwise(RANK_STRING)
        return _pack(g, nn, c, nb, ni)
    if isinstance(t, T.BooleanType):
        g = F.when(c.isNull(), RANK_NULL).otherwise(RANK_BOOLEAN)
        return _pack(g, nn, ns, c, ni)
    from .exprs import _is_duration

    if isinstance(t, T.StructType) \
            and {"hour", "minute", "second"} <= set(t.fieldNames()):
        # TimeValue / LocalTimeValue components struct: zoned-ness is a
        # runtime property (offset '' = local); zoned times order by the
        # UTC-adjusted instant, local times by time-of-day
        h, m = c.getField("hour"), c.getField("minute")
        sec, ns = c.getField("second"), c.getField("nanosecond")
        off = (c.getField("offset") if "offset" in t.fieldNames()
               else F.lit(""))
        off = F.coalesce(off, F.lit(""))
        zoned = off != ""
        off_sec = (F.when(off.isin("", "Z"), F.lit(0)).otherwise(
            F.when(F.substring(off, 1, 1) == "-", -1).otherwise(1)
            * (F.substring(off, 2, 2).cast("int") * 3600
               + F.substring(off, 5, 2).cast("int") * 60)))
        day_sec = (h * 3600 + m * 60 + sec).cast("double") \
            + ns.cast("double") / F.lit(1e9)
        frac = F.when(ns == 0, F.lit("")).otherwise(F.concat(
            F.lit("."), F.regexp_replace(
                F.format_string("%09d", ns), "(000)+$", "")))
        txt = F.concat(F.format_string("%02d:%02d:%02d", h, m, sec),
                       frac, off)
        g = (F.when(c.isNull(), RANK_NULL)
              .when(zoned, RANK_ZONED_TIME).otherwise(RANK_LOCAL_TIME))
        return _pack(g, F.when(zoned, day_sec - off_sec.cast("double"))
                     .otherwise(day_sec), txt, nb, ni)
    from .exprs import _is_zoned_dt

    if _is_zoned_dt(t):
        from .exprs import zoned_dt_to_string

        g = F.when(c.isNull(), RANK_NULL).otherwise(RANK_ZONED_DT)
        return _pack(g,
                     F.unix_micros(c.getField("instant")).cast("double"),
                     zoned_dt_to_string(c), nb, ni)
    if isinstance(t, T.StructType) and _is_duration(t):
        # DurationValue.COMPARATOR: average length in seconds, then nanos,
        # then months/days/seconds.  __vn carries avgSeconds + nanos/1e9
        # (the first two keys); the ISO text in __vs both formats toString
        # and breaks the remaining (rare) ties deterministically.
        from ..functions.registry import _duration_to_string

        avg = (c.getField("months") * F.lit(2_629_746)
               + c.getField("days") * F.lit(86_400)
               + c.getField("seconds")).cast("double")             + c.getField("nanos").cast("double") / F.lit(1e9)
        g = F.when(c.isNull(), RANK_NULL).otherwise(RANK_DURATION)
        return _pack(g, avg, _duration_to_string(c), nb, ni)
    if isinstance(t, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        # temporal groups (ZONED_DT < LOCAL_DT < DATE per ValueGroup.java):
        # epoch micros in __vn order within the group; the ISO text rides
        # in __vs for toString (never reached by ordering unless the
        # instants tie, where it agrees)
        if isinstance(t, T.DateType):
            rank, txt = RANK_DATE, c.cast("string")
        else:
            from ..functions.registry import _datetime_to_string

            rank = (RANK_ZONED_DT if isinstance(t, T.TimestampType)
                    else RANK_LOCAL_DT)
            txt = _datetime_to_string(
                c, with_offset=isinstance(t, T.TimestampType))
        g = F.when(c.isNull(), RANK_NULL).otherwise(rank)
        return _pack(g, F.unix_micros(c.cast("timestamp")).cast("double"),
                     txt, nb, ni)
    from .exprs import CypherTypeError

    raise CypherTypeError(
        f"cannot mix values of type {t.simpleString()} with other value "
        "classes — heterogeneous encoding covers string/boolean/number/null")


def any_is_null(c: Column) -> Column:
    # an SQL-null tagged struct IS a Cypher null: unification casts
    # (e.g. array<void> widening into array<tagged>) produce null
    # payload cells rather than rank-16 structs
    return c.isNull() | (c.getField("__vg") == RANK_NULL)


def _num_eq(l: Column, r: Column) -> Column:
    """NUMBER-group payload equality (NumberValues.numbersEqual): two
    longs compare EXACTLY on the __vi payload (the double payload
    collapses distinct longs above 2^53); long vs double is equal only
    when the double also round-trips to the same long; NaN never equals
    (Value.java:151)."""
    ln, rn = l.getField("__vn"), r.getField("__vn")
    li, ri = l.getField("__vi"), r.getField("__vi")
    return (F.when(li.isNotNull() & ri.isNotNull(), li == ri)
             .when(F.isnan(ln) | F.isnan(rn), F.lit(False))
             .when(li.isNotNull() | ri.isNotNull(),
                   # exact mixed check (cast double->long SATURATES in
                   # Spark, so Long.MAX would spuriously equal 2^63)
                   _long_vs_double_sign(
                       F.coalesce(li, ri),
                       F.when(li.isNotNull(), rn).otherwise(ln)) == 0)
             .otherwise(ln == rn))


_LONG_RANGE_D = float(2 ** 63)  # first double past Long.MAX_VALUE


def _long_vs_double_sign(lv: Column, d: Column) -> Column:
    """Exact three-way comparison of a long against a double as real
    numbers (NumberValues.compareDoubleAgainstLong — the double payload
    alone collapses longs above 2^53): branch doubles outside long
    range, then compare against floor(d) with a fraction tiebreak.
    floor(d) is exact because integral doubles >= 2^53 have no fraction
    and floors below 2^53 round-trip through double exactly."""
    fd = F.floor(d)
    return (F.when(d >= F.lit(_LONG_RANGE_D), F.lit(-1))
             .when(d < F.lit(-_LONG_RANGE_D), F.lit(1))
             .when(lv < fd, F.lit(-1))
             .when(lv > fd, F.lit(1))
             .when(d > fd.cast("double"), F.lit(-1))
             .otherwise(F.lit(0)))


def _num_cmp(l: Column, r: Column, cmp,
             nan_undefined: bool = False) -> Column:
    """NUMBER/temporal-group payload comparison: two longs compare
    exactly (NumberValues.compareLongs); long vs double compares
    EXACTLY via the floor-and-fraction path
    (NumberValues.compareDoubleAgainstLong — e.g. 9007199254740993 >
    9007199254740992.0 must hold).  A NaN operand decides FALSE in the
    runtime expression semantics (NaNAcceptance.feature: NOT(0.0 <
    0.0/0.0) = true) but is UNDEFINED inside sequence comparisons
    (``nan_undefined=True`` — FloatingPointValue.ternaryUndefined ->
    Comparison.UNDEFINED, so [NaN] < [NaN] is null)."""
    ln, rn = l.getField("__vn"), r.getField("__vn")
    li, ri = l.getField("__vi"), r.getField("__vi")
    mixed = F.when(li.isNotNull(), _long_vs_double_sign(li, rn)) \
             .otherwise(-_long_vs_double_sign(ri, ln))
    nan_res = (F.lit(None).cast("boolean") if nan_undefined
               else F.lit(False))
    return (F.when(li.isNotNull() & ri.isNotNull(), cmp(li, ri))
             .when(F.isnan(ln) | F.isnan(rn), nan_res)
             .when(li.isNotNull() | ri.isNotNull(), cmp(mixed, F.lit(0)))
             .otherwise(cmp(ln, rn)))


def any_eq(l: Column, r: Column) -> Column:
    """Ternary equality (AnyValue.ternaryEquals, AnyValue.java:62):
    null operand -> null; cross-class -> false; within class -> payload
    equality (integer 1 = float 1.0 via the double payload)."""
    lg, rg = l.getField("__vg"), r.getField("__vg")
    num_eq = _num_eq(l, r)
    same = (F.when(lg.isin(RANK_STRING, RANK_DURATION),
                   l.getField("__vs") == r.getField("__vs"))
             .when(lg == RANK_BOOLEAN, l.getField("__vb") == r.getField("__vb"))
             .when(lg.isin(RANK_NUMBER, *TEMPORAL_RANKS), num_eq))
    return (F.when((lg == RANK_NULL) | (rg == RANK_NULL),
                   F.lit(None).cast("boolean"))
             .when(lg != rg, F.lit(False))
             .otherwise(same))


def any_cmp(l: Column, r: Column, op: str,
            nan_undefined: bool = False) -> Column:
    """Ternary comparison predicate (AnyValues TERNARY_COMPARATOR):
    null operand or incomparable classes -> null; else payload compare.
    NOTE: this is the *predicate* semantics — ORDER BY uses the struct's
    own lexicographic order (the global orderability), which is total."""
    lg, rg = l.getField("__vg"), r.getField("__vg")

    def cmp(a, b):
        return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[op]

    num_cmp = _num_cmp(l, r, cmp, nan_undefined)
    same = (F.when(lg == RANK_STRING,
                   cmp(l.getField("__vs"), r.getField("__vs")))
             .when(lg == RANK_BOOLEAN,
                   cmp(l.getField("__vb"), r.getField("__vb")))
             .when(lg.isin(RANK_NUMBER, *TEMPORAL_RANKS), num_cmp))
    return (F.when((lg == RANK_NULL) | (rg == RANK_NULL)
                   | (lg != rg) | (lg == RANK_DURATION),
                   F.lit(None).cast("boolean"))
             .otherwise(same))


def any_to_string(c: Column) -> Column:
    """toString over a tagged value: integers print without the decimal
    point (the __vi payload exists exactly for this)."""
    g = c.getField("__vg")
    return (F.when(g == RANK_NULL, F.lit(None).cast("string"))
             .when(g.isin(RANK_STRING, RANK_DURATION, *TEMPORAL_RANKS),
                   c.getField("__vs"))
             .when(g == RANK_BOOLEAN,
                   F.when(c.getField("__vb"), "true").otherwise("false"))
             .when(c.getField("__vi").isNotNull(),
                   c.getField("__vi").cast("string"))
             .otherwise(c.getField("__vn").cast("string")))


def any_value_type(c: Column) -> Column:
    """valueType() name for a tagged value (CypherFunctions.valueType)."""
    g = c.getField("__vg")
    return (F.when(g == RANK_NULL, F.lit("NULL"))
             .when(g == RANK_STRING, F.lit("STRING NOT NULL"))
             .when(g == RANK_BOOLEAN, F.lit("BOOLEAN NOT NULL"))
             .when(g == RANK_ZONED_DT, F.lit("ZONED DATETIME NOT NULL"))
             .when(g == RANK_LOCAL_DT, F.lit("LOCAL DATETIME NOT NULL"))
             .when(g == RANK_DATE, F.lit("DATE NOT NULL"))
             .when(g == RANK_ZONED_TIME, F.lit("ZONED TIME NOT NULL"))
             .when(g == RANK_LOCAL_TIME, F.lit("LOCAL TIME NOT NULL"))
             .when(g == RANK_DURATION, F.lit("DURATION NOT NULL"))
             .when(c.getField("__vi").isNotNull(),
                   F.lit("INTEGER NOT NULL"))
             .otherwise(F.lit("FLOAT NOT NULL")))


# ---------------------------------------------------------------------------
# Extended (container) layout — round 3
# ---------------------------------------------------------------------------

_SCALAR_SPARK_TYPES = (*INT_TYPES, T.FloatType, T.DoubleType, T.DecimalType,
                       T.StringType, T.BooleanType, T.DateType,
                       T.TimestampType, T.TimestampNTZType)


def _is_scalar_class(t) -> bool:
    """True when ``t`` encodes in the 5-field scalar layout."""
    if t is None or isinstance(t, T.NullType):
        return True
    if isinstance(t, _SCALAR_SPARK_TYPES):
        return True
    if isinstance(t, T.StructType):
        from .exprs import _is_duration, _is_zoned_dt

        names = set(t.fieldNames())
        if {"hour", "minute", "second"} <= names or _is_duration(t) \
                or _is_zoned_dt(t):
            return True
    return False


def container_depth(t) -> int:
    """Container-nesting depth a Spark type needs in the tagged encoding
    (0 = fits the scalar layout).  Static schemas are finite trees, so
    this terminates and bounds the recursive layout exactly."""
    if t is None or _is_scalar_class(t):
        return 0
    if is_any_type(t):
        return any_layout_depth(t)
    if isinstance(t, T.ArrayType):
        return 1 + container_depth(t.elementType)
    if isinstance(t, T.MapType):
        return 1 + container_depth(t.valueType)
    if isinstance(t, T.StructType):
        names = set(t.fieldNames())
        if {"crs", "x", "y"} <= names or "_id" in names:
            return 1  # POINT / NODE / RELATIONSHIP
        if {"nodes", "rels"} <= names:
            return 1  # PATH encodes as a flat id list
        return 1 + max((container_depth(f.dataType) for f in t.fields),
                       default=0)
    from .exprs import CypherTypeError

    raise CypherTypeError(
        f"cannot mix values of type {t.simpleString()} with other value "
        "classes in the heterogeneous encoding")


def _null_containers(depth: int = 1):
    return (F.lit(None).cast(_list_t(depth)),
            F.lit(None).cast(_map_t(depth)),
            F.lit(None).cast(_POINT_T))


def _pack_deep(g: Column, n, s, b, i, l, m, p) -> Column:
    return F.struct(g.cast("int").alias("__vg"), n.alias("__vn"),
                    s.alias("__vs"), b.alias("__vb"), i.alias("__vi"),
                    l.alias("__vl"), m.alias("__vm"), p.alias("__vp"))


def _widen(c: Column, depth: int = 1) -> Column:
    """Pad a 5-field scalar tagged struct to the extended layout."""
    nl, nm, np_ = _null_containers(depth)
    return _pack_deep(c.getField("__vg"), c.getField("__vn"),
                      c.getField("__vs"), c.getField("__vb"),
                      c.getField("__vi"), nl, nm, np_)


def _rewiden(c: Column, from_d: int, to_d: int) -> Column:
    """Re-encode a tagged value from layout depth ``from_d`` to a deeper
    ``to_d`` (payload values are rewidened recursively; scalar fields
    copy)."""
    if from_d == to_d:
        return c
    if from_d == 0:
        return _widen(c, to_d)
    nl, nm, np_ = _null_containers(to_d)
    lv = c.getField("__vl")
    lst = F.when(lv.isNull(), F.lit(None).cast(_list_t(to_d))).otherwise(
        F.transform(lv, lambda el: _rewiden(el, from_d - 1, to_d - 1)))
    mv = c.getField("__vm")
    mp = F.when(mv.isNull(), F.lit(None).cast(_map_t(to_d))).otherwise(
        F.struct(
            mv.getField("__msz").alias("__msz"),
            F.transform(
                mv.getField("__mkv"),
                lambda e: F.struct(
                    e.getField("__mk").alias("__mk"),
                    _rewiden(e.getField("__mv"), from_d - 1,
                             to_d - 1).alias("__mv"))).alias("__mkv")))
    return _pack_deep(c.getField("__vg"), c.getField("__vn"),
                      c.getField("__vs"), c.getField("__vb"),
                      c.getField("__vi"), lst, mp, c.getField("__vp"))


def to_any_deep(c: Column, t: Optional[T.DataType],
                depth: Optional[int] = None) -> Column:
    """Encode a column as an EXTENDED tagged struct: scalars as in
    ``to_any`` plus MAP/NODE/RELATIONSHIP/LIST/POINT container groups,
    recursively to ``depth`` container levels (derived from the static
    schema when omitted).  Operands mixed into one column must share the
    same depth — callers pass the max over their operand types."""
    if depth is None:
        depth = max(1, container_depth(t))
    nn, ns, nb, ni = _nulls()
    nl, nm, np_ = _null_containers(depth)

    def enc_inner(col: Column, it) -> Column:
        # encode a payload value one level down
        if depth - 1 == 0:
            return to_any(col, it)  # tagged input normalizes SQL nulls
        return to_any_deep(col, it, depth - 1)

    if is_any_type(t):
        return F.when(c.isNull(), tagged_null(depth)).otherwise(
            _rewiden(c, any_layout_depth(t), depth))
    if _is_scalar_class(t):
        return _widen(to_any(c, t), depth)
    if isinstance(t, T.ArrayType):
        enc = F.transform(c, lambda el: enc_inner(el, t.elementType))
        g = F.when(c.isNull(), RANK_NULL).otherwise(RANK_LIST)
        return _pack_deep(g, nn, ns, nb, ni, enc, nm, np_)
    if isinstance(t, T.StructType) and {"crs", "x", "y"} <= set(
            t.fieldNames()):
        coords = [c.getField("x").cast("double"),
                  c.getField("y").cast("double")]
        if "z" in t.fieldNames():
            coords.append(c.getField("z").cast("double"))
        pp = F.struct(c.getField("crs").alias("__pc"),
                      F.array(*coords).alias("__px"))
        g = F.when(c.isNull(), RANK_NULL).otherwise(RANK_POINT)
        return _pack_deep(g, nn, ns, nb, ni, nl, nm,
                          F.when(c.isNull(), np_).otherwise(pp))
    if isinstance(t, T.StructType) and "_id" in t.fieldNames():
        is_rel = "_type" in t.fieldNames()
        rank = RANK_REL if is_rel else RANK_NODE
        g = F.when(c.isNull(), RANK_NULL).otherwise(rank)
        # carry the rel type / sorted label set in the (otherwise unused)
        # string slot so label predicates work on runtime-tagged entities
        # (LabelExpressionAcceptance 'expression on unknown entity type');
        # identity (eq/compare/render) still reads only __vi
        if is_rel:
            meta = c.getField("_type")
        elif "_labels" in t.fieldNames():
            meta = F.array_join(F.array_sort(F.array_remove(
                c.getField("_labels"), "_none")), "\x1f")
        else:
            meta = F.lit(None).cast("string")
        return _pack_deep(g, nn, F.when(c.isNull(), ns).otherwise(meta),
                          nb, c.getField("_id").cast("long"),
                          nl, nm, np_)
    if isinstance(t, T.StructType) and {"nodes", "rels"} <= set(
            t.fieldNames()):
        # PATH: its own group rank (ValueGroup.java:32 slots PATH(5)
        # between LIST and POINT; AnyValues.java:69-72).  Payload is the
        # id sequence [first node, rel ids...] so the element-wise array
        # order reproduces PathValue.unsafeCompareTo (PathValue.java:113
        # — first node, then rel ids, then rel count via the
        # prefix-shorter-first rule).
        ids = F.concat(
            F.array(F.element_at(c.getField("nodes"), 1)
                     .getField("_id").cast("long")),
            F.transform(c.getField("rels"),
                        lambda r_: r_.getField("_id").cast("long")))
        enc = F.transform(ids, lambda v: enc_inner(v, T.LongType()))
        g = F.when(c.isNull(), RANK_NULL).otherwise(RANK_PATH)
        return _pack_deep(g, nn, ns, nb, ni, enc, nm, np_)
    if isinstance(t, T.StructType):  # map literal (static keys)
        items = sorted(
            [(f.name, f.dataType) for f in t.fields], key=lambda kv: kv[0])
        kv = F.array(*[
            F.struct(F.lit(k).alias("__mk"),
                     enc_inner(c.getField(k), ft).alias("__mv"))
            for k, ft in items])
        mm = F.struct(F.lit(len(items)).cast("int").alias("__msz"),
                      kv.alias("__mkv"))
        g = F.when(c.isNull(), RANK_NULL).otherwise(RANK_MAP)
        return _pack_deep(g, nn, ns, nb, ni, nl,
                          F.when(c.isNull(), nm).otherwise(mm), np_)
    if isinstance(t, T.MapType):
        entries = F.array_sort(F.map_entries(c))
        kv = F.transform(
            entries,
            lambda e: F.struct(
                e.getField("key").cast("string").alias("__mk"),
                enc_inner(e.getField("value"), t.valueType).alias("__mv")))
        mm = F.struct(F.size(c).cast("int").alias("__msz"),
                      kv.alias("__mkv"))
        g = F.when(c.isNull(), RANK_NULL).otherwise(RANK_MAP)
        return _pack_deep(g, nn, ns, nb, ni, nl,
                          F.when(c.isNull(), nm).otherwise(mm), np_)
    from .exprs import CypherTypeError as _CTE

    raise _CTE(
        f"cannot mix values of type {t.simpleString()} with other value "
        "classes in the heterogeneous encoding")


def _scal_eq(l: Column, r: Column) -> Column:
    """Ternary equality on two SCALAR-layout tagged values.  A NaN
    payload decides FALSE (Value.java:151 hasNaNOperand) — Spark's == is
    NaN-safe and would say true."""
    lg, rg = l.getField("__vg"), r.getField("__vg")
    num_eq = _num_eq(l, r)
    same = (F.when(lg.isin(RANK_STRING, RANK_DURATION),
                   l.getField("__vs") == r.getField("__vs"))
             .when(lg == RANK_BOOLEAN,
                   l.getField("__vb") == r.getField("__vb"))
             .when(lg.isin(RANK_NUMBER, *TEMPORAL_RANKS), num_eq))
    return (F.when((lg == RANK_NULL) | (rg == RANK_NULL),
                   F.lit(None).cast("boolean"))
             .when(lg != rg, F.lit(False))
             .otherwise(same))


def _ternary_all(pair_eqs: Column) -> Column:
    """Fold an array of ternary booleans: any false -> false, else any
    null -> null, else true (ListValue.ternaryEquality).  The array is
    let-bound so its (recursively large) subtree appears ONCE in the
    expression tree — inlining it per consumer compounds exponentially
    through nested-container recursion (a depth-3 comparison OOMed the
    driver on the inlined form)."""
    from ..functions.let import let

    return let(pair_eqs, lambda pe: (
        F.when(F.exists(pe, lambda x: ~F.coalesce(x, F.lit(True))),
               F.lit(False))
         .when(F.exists(pe, lambda x: x.isNull()),
               F.lit(None).cast("boolean"))
         .otherwise(F.lit(True))))


def any_eq_deep(l: Column, r: Column, depth: int = 1) -> Column:
    """Ternary equality over EXTENDED tagged values: scalar groups as in
    any_eq; LIST element-wise ternary (null elements -> null result,
    AnyValue.ternaryEquals over ListValue) recursing through nested
    containers; MAP by size + sorted entries; POINT by crs + coordinates;
    NODE/REL by id."""
    lg, rg = l.getField("__vg"), r.getField("__vg")

    def inner_eq(a, b):
        return (_scal_eq(a, b) if depth - 1 == 0
                else any_eq_deep(a, b, depth - 1))

    lv, rv = l.getField("__vl"), r.getField("__vl")
    list_eq = F.when(F.size(lv) != F.size(rv), F.lit(False)).otherwise(
        _ternary_all(F.zip_with(lv, rv, inner_eq)))
    lm, rm = l.getField("__vm"), r.getField("__vm")
    map_eq = F.when(
        lm.getField("__msz") != rm.getField("__msz"), F.lit(False)
    ).otherwise(_ternary_all(F.zip_with(
        lm.getField("__mkv"), rm.getField("__mkv"),
        lambda a, b: F.when(a.getField("__mk") != b.getField("__mk"),
                            F.lit(False))
                      .otherwise(inner_eq(a.getField("__mv"),
                                          b.getField("__mv"))))))
    pt_eq = (l.getField("__vp") == r.getField("__vp"))
    id_eq = (l.getField("__vi") == r.getField("__vi"))
    same = (F.when(lg.isin(RANK_LIST, RANK_PATH), list_eq)
             .when(lg == RANK_MAP, map_eq)
             .when(lg == RANK_POINT, pt_eq)
             .when(lg.isin(RANK_NODE, RANK_REL), id_eq)
             .otherwise(_scal_eq(l, r)))
    return (F.when((lg == RANK_NULL) | (rg == RANK_NULL),
                   F.lit(None).cast("boolean"))
             .when(lg != rg, F.lit(False))
             .otherwise(same))


def _ternary_list_cmp(lv: Column, rv: Column, op: str,
                      depth: int) -> Column:
    """Ternary elementwise list comparison (AnyValues.TERNARY_COMPARATOR
    over SequenceValues): scan in order — an UNDEFINED element comparison
    before the first definite difference makes the whole comparison
    undefined; the first definite difference decides (via the element
    ternary comparator, itself possibly undefined for cross-group or NaN
    elements); equal prefixes fall back to length."""
    def inner_eq(a, b):
        return (_scal_eq(a, b) if depth - 1 == 0
                else any_eq_deep(a, b, depth - 1))

    def inner_cmp(a, b):
        # element comparisons follow Comparability (ternary) semantics:
        # a NaN element is UNDEFINED, not runtime-FALSE
        return (any_cmp(a, b, op, nan_undefined=True) if depth - 1 == 0
                else any_cmp_deep(a, b, op, depth - 1,
                                  nan_undefined=True))

    # every intermediate is let-bound: each (recursive) subtree appears
    # exactly once, keeping expression size LINEAR in nesting depth —
    # the inlined form compounds ~10x per level and OOMs at depth 3
    from ..functions.let import let, let2

    ls, rs = F.size(lv), F.size(rv)
    len_cmp = {"<": ls < rs, "<=": ls <= rs,
               ">": ls > rs, ">=": ls >= rs}[op]
    n = F.least(ls, rs)

    def with_sliced(la, ra):
        def with_eqs(eqs):
            idxs = F.when(F.size(eqs) == 0, F.array().cast("array<int>")) \
                    .otherwise(F.sequence(F.lit(1), F.size(eqs)))
            zipped = F.zip_with(
                eqs, idxs,
                lambda e, i: F.struct(e.alias("e"), i.alias("i")))

            def with_zipped(zp):
                i_false = F.array_min(F.transform(
                    F.filter(zp, lambda p: ~F.coalesce(p.getField("e"),
                                                       F.lit(True))),
                    lambda p: p.getField("i")))
                i_null = F.array_min(F.transform(
                    F.filter(zp, lambda p: p.getField("e").isNull()),
                    lambda p: p.getField("i")))

                def with_idx(i_f, i_n):
                    el_cmp = inner_cmp(F.element_at(la, i_f),
                                       F.element_at(ra, i_f))
                    return (F.when(i_n.isNotNull()
                                   & (i_f.isNull() | (i_n < i_f)),
                                   F.lit(None).cast("boolean"))
                             .when(i_f.isNotNull(), el_cmp)
                             .otherwise(len_cmp))

                return let2(i_false, i_null, with_idx)

            return let(zipped, with_zipped)

        return let(F.zip_with(la, ra, inner_eq), with_eqs)

    return let2(F.slice(lv, F.lit(1), n), F.slice(rv, F.lit(1), n),
                with_sliced)


def any_cmp_deep(l: Column, r: Column, op: str, depth: int = 1,
                 nan_undefined: bool = False) -> Column:
    """Ternary comparison over extended tagged values at layout ``depth``:
    scalars as in any_cmp (NaN FALSE at top level, UNDEFINED inside
    sequences); LIST compares elementwise with ternary semantics; other
    container classes and cross-class pairs yield null."""
    lg, rg = l.getField("__vg"), r.getField("__vg")

    def cmp(a, b):
        return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[op]

    num_cmp = _num_cmp(l, r, cmp, nan_undefined)
    same = (F.when(lg == RANK_STRING,
                   cmp(l.getField("__vs"), r.getField("__vs")))
             .when(lg == RANK_BOOLEAN,
                   cmp(l.getField("__vb"), r.getField("__vb")))
             .when(lg.isin(RANK_NUMBER, *TEMPORAL_RANKS), num_cmp)
             .when(lg.isin(RANK_LIST, RANK_PATH),
                   _ternary_list_cmp(l.getField("__vl"),
                                     r.getField("__vl"), op, depth)))
    return (F.when((lg == RANK_NULL) | (rg == RANK_NULL)
                   | (lg != rg) | (lg == RANK_DURATION),
                   F.lit(None).cast("boolean"))
             .otherwise(same))


def _scal_to_string(c: Column) -> Column:
    g = c.getField("__vg")
    return (F.when(g == RANK_NULL, F.lit("null"))
             .when(g.isin(RANK_STRING, RANK_DURATION, *TEMPORAL_RANKS),
                   c.getField("__vs"))
             .when(g == RANK_BOOLEAN,
                   F.when(c.getField("__vb"), "true").otherwise("false"))
             .when(c.getField("__vi").isNotNull(),
                   c.getField("__vi").cast("string"))
             .otherwise(c.getField("__vn").cast("string")))


def any_render_element(c: Column, depth: int) -> Column:
    """Render one tagged value as LIST-ELEMENT text: nulls print as the
    literal ``null`` (top-level toString keeps SQL null).  An SQL-null
    element (unification-cast null, not a rank-16 struct) is a Cypher
    null too."""
    if depth == 0:
        return F.when(c.isNull(), F.lit("null")).otherwise(
            F.coalesce(_scal_to_string(c), F.lit("null")))
    return F.when(c.isNull() | (c.getField("__vg") == RANK_NULL),
                  F.lit("null")).otherwise(any_to_string_deep(c, depth))


def any_to_string_deep(c: Column, depth: int = 1) -> Column:
    """Rendering for extended tagged values.  The reference's toString()
    rejects containers; this extension renders them (lists as
    ``[a, b]``, maps as ``{k: v}``, points as ``point({...})``, nested
    recursively) so mixed container values stay observable through a
    string column."""
    g = c.getField("__vg")

    def inner_str(x):
        # nested nulls (rank-16 OR SQL-null cells from unification casts)
        # render as the text 'null'; top-level null stays SQL null
        return any_render_element(x, depth - 1)

    lst = F.concat(
        F.lit("["),
        F.array_join(F.transform(c.getField("__vl"), inner_str),
                     ", "),
        F.lit("]"))
    mp = F.concat(
        F.lit("{"),
        F.array_join(
            F.transform(c.getField("__vm").getField("__mkv"),
                        lambda e: F.concat(e.getField("__mk"), F.lit(": "),
                                           inner_str(e.getField("__mv")))),
            ", "),
        F.lit("}"))
    pt = F.concat(
        F.lit("point({crs: "), c.getField("__vp").getField("__pc"),
        F.lit(", coords: ["),
        F.array_join(F.transform(
            c.getField("__vp").getField("__px"),
            lambda x: x.cast("string")), ", "),
        F.lit("]})"))
    return (F.when(g == RANK_NULL, F.lit(None).cast("string"))
             .when(g == RANK_LIST, lst)
             .when(g == RANK_MAP, mp)
             .when(g == RANK_POINT, pt)
             .when(g.isin(RANK_NODE, RANK_REL),
                   c.getField("__vi").cast("string"))
             .otherwise(any_to_string(c)))


def tagged_null(depth: int) -> Column:
    """A tagged NULL value (rank 16) at the given layout depth."""
    nn, ns, nb, ni = _nulls()
    if depth <= 0:
        return _pack(F.lit(RANK_NULL), nn, ns, nb, ni)
    nl, nm, np_ = _null_containers(depth)
    return _pack_deep(F.lit(RANK_NULL), nn, ns, nb, ni, nl, nm, np_)


def any_get_key(c: Column, key: Column, t) -> Column:
    """Map-key access through the heterogeneous encoding
    (``m.k`` / ``m['k']`` on a tagged value): the inner tagged payload
    one layout level down; tagged NULL when the subject is not a map or
    the key is absent (MapValue.get, returns NO_VALUE on miss)."""
    d = any_layout_depth(t)
    if d <= 0:
        return tagged_null(0)
    hits = F.filter(c.getField("__vm").getField("__mkv"),
                    lambda e: e.getField("__mk") == key)
    v = F.element_at(hits, 1).getField("__mv")
    return F.when((c.getField("__vg") == RANK_MAP) & (F.size(hits) > 0),
                  v).otherwise(tagged_null(d - 1))


def any_get_index(c: Column, idx: Column, t) -> Column:
    """List indexing through the heterogeneous encoding (0-based,
    negative wrap); tagged NULL when out of bounds or not a list."""
    d = any_layout_depth(t)
    if d <= 0:
        return tagged_null(0)
    lst = c.getField("__vl")
    n = F.size(lst)
    v = F.when(idx >= 0, F.get(lst, idx)).otherwise(F.get(lst, n + idx))
    return F.when((c.getField("__vg") == RANK_LIST) & v.isNotNull(),
                  v).otherwise(tagged_null(d - 1))


def any_value_type_deep(c: Column) -> Column:
    """valueType() over extended tagged values (container groups report
    the coarse GQL names; element types are runtime-erased here)."""
    g = c.getField("__vg")
    return (F.when(g == RANK_LIST, F.lit("LIST<ANY> NOT NULL"))
             .when(g == RANK_MAP, F.lit("MAP NOT NULL"))
             .when(g == RANK_POINT, F.lit("POINT NOT NULL"))
             .when(g == RANK_NODE, F.lit("NODE NOT NULL"))
             .when(g == RANK_REL, F.lit("RELATIONSHIP NOT NULL"))
             .when(g == RANK_PATH, F.lit("PATH NOT NULL"))
             .otherwise(any_value_type(c)))


# GQL type-description order (CypherTypeOrder.scala:22): the rank of the
# OUTER type constructor orders union members in a rendered description
_TYPE_DESC_RANK = {
    "NOTHING": 0, "NULL": 1, "BOOLEAN": 2, "STRING": 3, "INTEGER": 4,
    "FLOAT": 5, "DATE": 6, "LOCAL TIME": 7, "ZONED TIME": 8,
    "LOCAL DATETIME": 9, "ZONED DATETIME": 10, "DURATION": 11,
    "POINT": 12, "NODE": 13, "RELATIONSHIP": 14, "MAP": 15, "LIST": 16,
    "PATH": 17}


def _type_desc_rank(s: Column) -> Column:
    """CypherTypeOrder rank of a rendered type description's head."""
    out = F.lit(len(_TYPE_DESC_RANK) + 1)
    # longer names first so 'LOCAL DATETIME' wins over 'LOCAL TIME' etc.
    for name in sorted(_TYPE_DESC_RANK, key=len, reverse=True):
        out = F.when(s.startswith(name), F.lit(_TYPE_DESC_RANK[name])) \
               .otherwise(out)
    return out


def normalize_type_union(ts: Column) -> Column:
    """Render a union of element type descriptions the way the
    reference's CypherType normalization does
    (ValueTypeFunctionAcceptance, TypeSpec/ClosedDynamicUnionType):

    - distinct members, ordered by CypherTypeOrder then text;
    - LIST<NOTHING> is a subtype of every LIST — absorbed by siblings;
    - a NULL member makes the others nullable (drops their outer
      'NOT NULL' suffix) instead of printing;
    - empty union -> NOTHING, all-null -> NULL.

    ``ts``: array<string> of member descriptions; returns one string."""
    ts = F.array_distinct(ts)
    has_null = F.array_contains(ts, "NULL")
    ts2 = F.array_remove(ts, "NULL")
    other_list = F.exists(
        ts2, lambda s: s.startswith("LIST<")
        & (s != "LIST<NOTHING> NOT NULL"))
    ts2 = F.when(other_list,
                 F.array_remove(ts2, "LIST<NOTHING> NOT NULL")) \
           .otherwise(ts2)
    ts2 = F.when(has_null,
                 F.transform(ts2, lambda s: F.regexp_replace(
                     s, " NOT NULL$", ""))).otherwise(ts2)

    def cmp(x, y):
        rx, ry = _type_desc_rank(x), _type_desc_rank(y)
        return (F.when(rx < ry, F.lit(-1)).when(rx > ry, F.lit(1))
                 .when(x < y, F.lit(-1)).when(x > y, F.lit(1))
                 .otherwise(F.lit(0)))

    ordered = F.array_sort(ts2, cmp)
    return (F.when(F.size(ts) == 0, F.lit("NOTHING"))
             .when(F.size(ts2) == 0, F.lit("NULL"))
             .otherwise(F.array_join(ordered, " | ")))


def any_value_type_precise(c: Column, d: int) -> Column:
    """valueType() over extended tagged values with EXACT list element
    types (CypherType.description): element descriptions are computed
    per runtime element and normalized by :func:`normalize_type_union`."""
    if d <= 0:
        return any_value_type(c)
    g = c.getField("__vg")
    inner = normalize_type_union(F.transform(
        c.getField("__vl"), lambda x: any_value_type_precise(x, d - 1)))
    return (F.when(g == RANK_LIST,
                   F.concat(F.lit("LIST<"), inner, F.lit("> NOT NULL")))
             .when(g == RANK_MAP, F.lit("MAP NOT NULL"))
             .when(g == RANK_POINT, F.lit("POINT NOT NULL"))
             .when(g == RANK_NODE, F.lit("NODE NOT NULL"))
             .when(g == RANK_REL, F.lit("RELATIONSHIP NOT NULL"))
             .when(g == RANK_PATH, F.lit("PATH NOT NULL"))
             .otherwise(any_value_type(c)))


def type_contains_any(t) -> bool:
    """True when a Spark type has a tagged any-layout anywhere inside."""
    if t is None:
        return False
    if is_any_type(t):
        return True
    if isinstance(t, T.ArrayType):
        return type_contains_any(t.elementType)
    if isinstance(t, T.MapType):
        return type_contains_any(t.valueType)
    if isinstance(t, T.StructType) and not is_any_type(t):
        return any(type_contains_any(f.dataType) for f in t.fields)
    return False


def render_containing(c: Column, t, top: bool = True) -> Column:
    """Cypher-text rendering for a column whose type CONTAINS a tagged
    layout at any nesting depth (e.g. array<array<tagged>> from partial
    unification).  Top-level null stays SQL null; nested nulls print as
    the literal ``null``."""
    if is_any_type(t):
        d = any_layout_depth(t)
        if top:
            return any_to_string(c) if d == 0 else any_to_string_deep(c, d)
        return any_render_element(c, d)
    if isinstance(t, T.ArrayType):
        def el(x):
            return render_containing(x, t.elementType, top=False)
        body = F.concat(
            F.lit("["),
            F.array_join(F.transform(c, el), ", ", "null"),
            F.lit("]"))
        if top:
            return F.when(c.isNull(), F.lit(None).cast("string")) \
                    .otherwise(body)
        return F.when(c.isNull(), F.lit("null")).otherwise(body)
    if isinstance(t, T.StructType):
        # plain (statically-keyed) map holding tagged values in some
        # field: {k: v, ...} text with each field rendered recursively
        parts = []
        for i, f in enumerate(t.fields):
            if i:
                parts.append(F.lit(", "))
            parts.append(F.lit(f"{f.name}: "))
            parts.append(render_containing(c.getField(f.name), f.dataType,
                                           top=False))
        body = F.concat(F.lit("{"), *parts, F.lit("}"))
        if top:
            return F.when(c.isNull(), F.lit(None).cast("string")) \
                    .otherwise(body)
        return F.when(c.isNull(), F.lit("null")).otherwise(body)
    # scalar alongside tagged siblings: plain text
    out = c.cast("string")
    return out if top else F.coalesce(out, F.lit("null"))
