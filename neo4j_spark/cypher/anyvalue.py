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
(10/11), DURATION (12), STRING (13), BOOLEAN (14), NUMBER (15), VOID (16).  Containers,
points, and graph entities keep their native homogeneous Spark types;
mixing THOSE classes in one value raises a clear error (the reference's
full AnyValue tree is wider than any fixed struct can be).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, functions as F, types as T

INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)

# ascending global sort order (AnyValues.java javadoc + ValueGroup.java):
# MAP(1) NODE(2) RELATIONSHIP(3) LIST(4) PATH(5) POINT(6) ZONED_DT(7)
# LOCAL_DT(8) DATE(9) ZONED_TIME(10) LOCAL_TIME(11) DURATION(12)
# STRING(13) BOOLEAN(14) NUMBER(15) VOID(16)
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


def is_any_type(t) -> bool:
    return (isinstance(t, T.StructType)
            and tuple(t.fieldNames()) == ANY_FIELDS)


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
        return c
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
    return c.getField("__vg") == RANK_NULL


def any_eq(l: Column, r: Column) -> Column:
    """Ternary equality (AnyValue.ternaryEquals, AnyValue.java:62):
    null operand -> null; cross-class -> false; within class -> payload
    equality (integer 1 = float 1.0 via the double payload)."""
    lg, rg = l.getField("__vg"), r.getField("__vg")
    same = (F.when(lg.isin(RANK_STRING, RANK_DURATION),
                   l.getField("__vs") == r.getField("__vs"))
             .when(lg == RANK_BOOLEAN, l.getField("__vb") == r.getField("__vb"))
             .when(lg.isin(RANK_NUMBER, *TEMPORAL_RANKS),
                   l.getField("__vn") == r.getField("__vn")))
    return (F.when((lg == RANK_NULL) | (rg == RANK_NULL),
                   F.lit(None).cast("boolean"))
             .when(lg != rg, F.lit(False))
             .otherwise(same))


def any_cmp(l: Column, r: Column, op: str) -> Column:
    """Ternary comparison predicate (AnyValues TERNARY_COMPARATOR):
    null operand or incomparable classes -> null; else payload compare.
    NOTE: this is the *predicate* semantics — ORDER BY uses the struct's
    own lexicographic order (the global orderability), which is total."""
    lg, rg = l.getField("__vg"), r.getField("__vg")

    def cmp(a, b):
        return {"<": a < b, "<=": a <= b, ">": a > b, ">=": a >= b}[op]

    same = (F.when(lg == RANK_STRING,
                   cmp(l.getField("__vs"), r.getField("__vs")))
             .when(lg == RANK_BOOLEAN,
                   cmp(l.getField("__vb"), r.getField("__vb")))
             .when(lg.isin(RANK_NUMBER, *TEMPORAL_RANKS),
                   cmp(l.getField("__vn"), r.getField("__vn"))))
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
