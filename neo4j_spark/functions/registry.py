"""Cypher builtin scalar function registry -> Spark Column expressions.

Inventory follows the reference's function registry (reference:
``community/cypher/front-end/expressions/.../functions/Function.scala:47``
``knownFunctions``; runtime impls in
``community/cypher/runtime-util/.../operations/CypherFunctions.java``).
Everything stays JVM-side (pyspark.sql.functions) except unicode
``normalize``, which needs a Python UDF.
"""

from __future__ import annotations

import math
from typing import Callable, Dict

from pyspark.sql import Column, functions as F, types as T

from ..cypher import ast as A
from ..cypher.exprs import CypherTypeError


class FunctionError(ValueError):
    pass


# User scalar functions (@UserFunction analog, procedure-api/UserFunction.java):
# name -> callable(list[Column]) -> Column.  Registered names are tried
# before the unknown-function error, so users can also shadow nothing but
# never builtins.  Aggregating UDFs (@UserAggregationFunction) register a
# pandas_udf GROUPED_AGG the same way and are used inside RETURN aggregates.
USER_FUNCTIONS = {}

# SHOW FUNCTIONS catalog (knownFunctions, Function.scala:47)
BUILTIN_FUNCTIONS = (
    "abs", "acos", "asin", "atan", "atan2", "avg", "btrim", "ceil",
    "char_length", "character_length", "coalesce", "collect", "cos", "cot",
    "count", "date", "datetime", "degrees", "duration", "e", "elementId",
    "endNode", "exp", "floor", "haversin", "head", "id", "isEmpty", "isNaN",
    "keys", "labels", "last", "left", "length", "localdatetime", "localtime",
    "log", "log10", "ltrim", "max", "min", "normalize", "nodes", "nullIf",
    "percentileCont", "percentileDisc", "percentiles", "pi", "point",
    "properties", "radians", "rand", "randomUUID", "range", "reduce",
    "relationships", "replace", "reverse", "right", "round", "rtrim", "sign",
    "sin", "size", "split", "sqrt", "startNode", "stDev", "stDevP",
    "substring", "sum", "tail", "tan", "time", "timestamp", "toBoolean",
    "toBooleanList", "toBooleanOrNull", "toFloat", "toFloatList",
    "toFloatOrNull", "toInteger", "toIntegerList", "toIntegerOrNull",
    "toLower", "toString", "toStringList", "toStringOrNull", "toUpper",
    "trim", "type", "valueType",
)


def register_function(name, fn):
    """Register a scalar user function: fn(args: list[Column]) -> Column."""
    USER_FUNCTIONS[name.lower()] = fn


def unregister_function(name):
    USER_FUNCTIONS.pop(name.lower(), None)


# User aggregating functions (@UserAggregationFunction analog,
# procedure-api/UserAggregationFunction.java): name ->
# callable(list[Column]) -> aggregate Column.  Build from builtin aggregate
# combinators or a pandas_udf(functionType=GROUPED_AGG) — both land in
# df.groupBy().agg() and keep partial aggregation map-side.
USER_AGGREGATES = {}


def register_aggregate(name, fn):
    USER_AGGREGATES[name.lower()] = fn


def unregister_aggregate(name):
    USER_AGGREGATES.pop(name.lower(), None)


def _cypher_type_name(t) -> str:
    """Spark DataType → GQL type name (util/symbols/*Type.scala
    toCypherTypeString)."""
    if t is None or isinstance(t, T.NullType):
        return "NULL"
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "INTEGER"
    if isinstance(t, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "FLOAT"
    if isinstance(t, T.StringType):
        return "STRING"
    if isinstance(t, T.BooleanType):
        return "BOOLEAN"
    if isinstance(t, T.DateType):
        return "DATE"
    if isinstance(t, T.TimestampType):
        return "ZONED DATETIME"
    if isinstance(t, T.TimestampNTZType):
        return "LOCAL DATETIME"
    if isinstance(t, T.ArrayType):
        return "LIST<" + _cypher_type_name(t.elementType) + ">"
    if isinstance(t, T.StructType):
        names = set(t.fieldNames())
        if {"months", "days", "seconds", "nanos"} <= names:
            return "DURATION"
        if names == {"instant", "tz"}:
            return "ZONED DATETIME"
        if {"crs", "x", "y"} <= names:
            return "POINT"
        if {"_src", "_dst"} <= names:
            return "RELATIONSHIP"
        if {"_id", "_labels"} <= names:
            return "NODE"
        if {"_nodes", "_rels"} <= names or {"__nodes", "__rels"} <= names \
                or {"nodes", "rels"} <= names or names == {"len"}:
            # incl. the engine's path structs: {nodes, rels} from
            # _build_path / shortest_path, {len} length-only stubs
            return "PATH"
        return "MAP"
    if isinstance(t, T.MapType):
        return "MAP"
    if isinstance(t, T.BinaryType):
        return "BYTEARRAY"
    return "ANY"


def _norm_udf():
    import unicodedata

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _normalize(s, form):
        # unicodedata has no Spark builtin; the Arrow batch boundary keeps
        # the per-row cost to the normalize call itself (no per-row
        # serialization the old row-at-a-time udf paid)
        return pd.Series(
            [None if x is None else unicodedata.normalize(f or "NFC", x)
             for x, f in zip(s, form)], dtype=object)

    # real class objects: this module's `from __future__ import
    # annotations` stringifies inline hints, and pandas_udf cannot
    # resolve 'pd.Series' because pandas is imported HERE, not in the
    # module globals the hint lookup uses
    _normalize.__annotations__ = {
        "s": pd.Series, "form": pd.Series, "return": pd.Series}
    return pandas_udf(_normalize, T.StringType())


def _duration_to_string(col: Column) -> Column:
    """ISO-8601 duration text (DurationValue.toString): P<Y><M><D>T<H><M><S>,
    zero components omitted, all-zero -> 'PT0S', fractional seconds from
    nanos with trailing zeros trimmed.

    The input struct is let-bound: this body reads it ~15 times, and
    inlining a computed duration (e.g. the carry chain of duration * x)
    15x multiplied planning time into minutes."""
    from .let import let

    return let(col, _duration_to_string_body)


def _duration_to_string_body(col: Column) -> Column:
    m, d = col.getField("months"), col.getField("days")
    s, ns = col.getField("seconds"), col.getField("nanos")
    years, months = F.floor(m / 12), m % 12
    hours = F.floor(s / 3600)
    minutes = F.floor(s / 60) % 60
    secs = s % 60
    frac = F.when(ns == 0, F.lit("")).otherwise(
        F.regexp_replace(F.format_string("%09d", ns), "0+$", ""))
    piece = lambda v, u: F.when(  # noqa: E731
        v != 0, F.concat(v.cast("string"), F.lit(u))).otherwise(F.lit(""))
    date_part = F.concat(piece(years, "Y"), piece(months, "M"), piece(d, "D"))
    sec_txt = F.when((secs != 0) | (ns != 0),
                     F.concat(secs.cast("string"),
                              F.when(ns == 0, F.lit("")).otherwise(
                                  F.concat(F.lit("."), frac)),
                              F.lit("S"))).otherwise(F.lit(""))
    time_part = F.concat(piece(hours, "H"), piece(minutes, "M"), sec_txt)
    body = F.concat(
        date_part,
        F.when(time_part != "", F.concat(F.lit("T"), time_part))
         .otherwise(F.lit("")))
    out = F.when(body == "", F.lit("PT0S")).otherwise(F.concat(F.lit("P"), body))
    return F.when(col.isNull(), F.lit(None).cast("string")).otherwise(out)


def _datetime_to_string(col: Column, with_offset: bool = False) -> Column:
    """ISO-8601 datetime text (java.time LocalDateTime/ZonedDateTime
    toString): 'T' separator, seconds omitted when zero, fractional part
    trimmed to millis/micros groups.  Input let-bound (read ~5x)."""
    from .let import let

    return let(col, lambda c: _datetime_to_string_body(c, with_offset))


def _datetime_to_string_body(col: Column, with_offset: bool) -> Column:
    micros = F.pmod(F.unix_micros(col.cast("timestamp")), 1_000_000)
    base = F.date_format(col, "yyyy-MM-dd'T'HH:mm")
    secs = F.date_format(col, "ss")
    frac = F.when(
        micros == 0, F.lit("")).otherwise(F.concat(F.lit("."), F.regexp_replace(
            F.format_string("%06d", micros), "(000)+$", "")))
    tail = F.when((secs == "00") & (micros == 0), F.lit("")) \
        .otherwise(F.concat(F.lit(":"), secs, frac))
    off = F.date_format(col, "XXX") if with_offset else F.lit("")
    return F.concat(base, tail, off)


def _checked(cond: Column, value: Column, msg: str) -> Column:
    """``value`` where ``cond`` holds, else raise ``msg`` at runtime —
    the per-row argument checks of CypherFunctions.java.  raise_error in
    the else branch survives the optimizer where an assert_true wrapped
    in ``when(x.isNull(), ...)`` is elided (AssertTrue types as null, so
    the IsNull folds away without evaluating it)."""
    return F.when(cond, value).otherwise(
        F.call_function("raise_error", F.lit(msg)))


def compile_function(cc, e: A.Func) -> Column:
    """cc: ExprCompiler; e: Func AST node."""
    name = e.name
    args = e.args

    def c(i: int) -> Column:
        return cc.compile(args[i])

    def ctyped(i: int):
        return cc.compile_typed(args[i])

    n = len(args)

    # ---- graph-specific scalars -----------------------------------------
    if name in ("id", "elementid"):
        col = c(0)
        out = col.getField("_id")
        return out.cast("string") if name == "elementid" else out
    if name == "labels":
        # the storage layer shards unlabeled nodes under the internal
        # '_none' marker — labels() must render them as the empty list
        # (TokenRead semantics: labels(()) = [])
        return F.array_remove(c(0).getField("_labels"), "_none")
    if name == "type":
        return c(0).getField("_type")
    if name in ("startnode", "endnode"):
        # resolve to the full bound node struct when the pattern bound the
        # endpoint (startNode(e) ≡ the src-side variable); id-only
        # reference otherwise (NodeIdReference analog)
        if isinstance(args[0], A.Var) and cc.translator is not None:
            ends = getattr(cc.translator, "rel_endpoints", {}) \
                .get(args[0].name)
            if ends is not None:
                want = ends[0] if name == "startnode" else ends[1]
                if want is not None and cc.df is not None \
                        and want in cc.df.columns:
                    return F.col(want)
        fld = "_src" if name == "startnode" else "_dst"
        return F.struct(c(0).getField(fld).alias("_id"))
    if name == "properties":
        col, t = ctyped(0)
        if isinstance(t, T.NullType):
            return F.lit(None)
        if isinstance(t, T.StructType):
            fields = [f.name for f in t.fields if not f.name.startswith("_")]
            out = F.struct(*[col.getField(f).alias(f) for f in fields])
            if "_id" in t.fieldNames():
                # null entity (failed OPTIONAL MATCH) -> null, not a
                # struct of nulls
                out = F.when(col.getField("_id").isNull(),
                             F.lit(None)).otherwise(out)
            return out
        return col
    if name == "keys":
        col, t = ctyped(0)
        if isinstance(t, T.NullType):
            return F.lit(None).cast("array<string>")
        if isinstance(t, T.StructType):
            fields = [f.name for f in t.fields if not f.name.startswith("_")]
            if "_id" not in t.fieldNames():
                # plain map value: a null-VALUED key is still a key
                # (MapValue keeps NO_VALUE entries; only entities drop
                # null properties as absent)
                return F.when(col.isNull(),
                              F.lit(None).cast("array<string>")) \
                        .otherwise(F.array(*[F.lit(f) for f in fields]))
            arr = F.array(*[
                F.when(col.getField(f).isNotNull(), F.lit(f)) for f in fields
            ])
            out = F.array_compact(arr)
            return F.when(col.getField("_id").isNull(),
                          F.lit(None).cast("array<string>")).otherwise(out)
        if isinstance(t, T.MapType):
            return F.map_keys(col)
        raise FunctionError("keys() expects node/rel/map")
    if name == "nodes":
        return c(0).getField("nodes")
    if name == "relationships":
        return c(0).getField("rels")
    if name == "length":
        col, t = ctyped(0)
        if isinstance(t, T.StructType) and "rels" in t.fieldNames():
            return F.size(col.getField("rels")).cast("long")
        if isinstance(t, T.StructType) and "len" in t.fieldNames():
            return col.getField("len")  # length-only path stub
        return F.length(col).cast("long")
    if name == "size":
        col, t = ctyped(0)
        if isinstance(t, T.ArrayType):
            return F.size(col).cast("long")
        if isinstance(t, T.MapType):
            # size(MAP) is a type error (CypherFunctions.size accepts
            # String or List only), same as the StructType map case below
            from ..cypher.exprs import CypherTypeError

            raise CypherTypeError(
                "Invalid input for function 'size()': Expected a String "
                "or List, got a Map")
        from ..cypher import anyvalue as AV

        if AV.is_any_type(t):
            # dynamic (tagged) value: size dispatches on the runtime
            # class — string length / list size; anything else raises
            # per row (CypherFunctions.size accepts String or List)
            g_ = col.getField("__vg")
            ok = [AV.RANK_STRING, AV.RANK_NULL]
            out = F.when(g_ == AV.RANK_STRING,
                         F.length(col.getField("__vs")).cast("long"))
            if AV.is_deep_any_type(t):
                ok.append(AV.RANK_LIST)
                out = out.when(g_ == AV.RANK_LIST,
                               F.size(col.getField("__vl")).cast("long"))
            return _checked(g_.isin(*ok), out,
                            "Invalid input for function 'size()': "
                            "Expected a String or List")
        if isinstance(t, T.StructType):
            # size(MAP/entity/temporal/point) is a type error in the
            # reference (CypherFunctions.size accepts String or List
            # only) — raise the Cypher error naming the actual argument
            # class, not a Spark analysis error
            from ..cypher.exprs import CypherTypeError

            names = set(t.fieldNames())
            if {"months", "days", "seconds", "nanos"} <= names:
                kind = "Duration"
            elif {"crs", "x", "y"} <= names:
                kind = "Point"
            elif {"nodes", "rels"} <= names:
                kind = "Path"
            elif "_id" in names:
                kind = "Relationship" if "_type" in names else "Node"
            else:
                kind = "Map"
            raise CypherTypeError(
                "Invalid input for function 'size()': Expected a String "
                f"or List, got a {kind}")
        return F.length(col).cast("long")

    # ---- conditionals ----------------------------------------------------
    if name == "coalesce":
        return F.coalesce(*[c(i) for i in range(n)])
    if name == "nullif":
        return F.nullif(c(0), c(1)) if hasattr(F, "nullif") else \
            F.when(c(0) == c(1), F.lit(None)).otherwise(c(0))

    # ---- math ------------------------------------------------------------
    simple = {
        "abs": F.abs, "ceil": lambda x: F.ceil(x).cast("double"),
        "floor": lambda x: F.floor(x).cast("double"),
        # Math.log/Math.log10 semantics (CypherFunctions.java): 0 -> -Inf,
        # negative -> NaN — Spark's log/log10 return NULL for both
        "sqrt": F.sqrt, "exp": F.exp,
        "log": lambda x: (F.when(x.cast("double") == 0.0,
                                 F.lit(float("-inf")))
                           .when(x.cast("double") < 0,
                                 F.lit(float("nan")))
                           .otherwise(F.log(x))),
        "log10": lambda x: (F.when(x.cast("double") == 0.0,
                                   F.lit(float("-inf")))
                             .when(x.cast("double") < 0,
                                   F.lit(float("nan")))
                             .otherwise(F.log10(x))),
        "sin": F.sin, "cos": F.cos, "tan": F.tan, "asin": F.asin,
        "acos": F.acos, "atan": F.atan, "degrees": F.degrees,
        "radians": F.radians,
    }
    if name in simple:
        return simple[name](c(0))
    if name == "isnan":
        # isNaN over a statically non-numeric argument is a type error
        # (NaNAcceptance.feature: isNaN('foo') -> InvalidArgumentType),
        # not a cast failure
        col, t = ctyped(0)
        from ..cypher import anyvalue as AV

        if AV.is_any_type(t):
            g_ = col.getField("__vg")
            return _checked(
                g_.isin(AV.RANK_NUMBER, AV.RANK_NULL),
                F.when(g_ == AV.RANK_NULL, F.lit(None).cast("boolean"))
                 .otherwise(F.isnan(col.getField("__vn"))),
                "Invalid input for function 'isNaN()': Expected a Number")
        if t is not None and not isinstance(
                t, (T.NullType, T.ByteType, T.ShortType, T.IntegerType,
                    T.LongType, T.FloatType, T.DoubleType, T.DecimalType)):
            from ..cypher.exprs import CypherTypeError

            raise CypherTypeError(
                "Invalid input for function 'isNaN()': Expected a Number, "
                f"got {t.simpleString()}")
        # isNaN(null) -> null (Spark's isnan(null) is false)
        return F.when(col.isNull(), F.lit(None).cast("boolean")) \
                .otherwise(F.isnan(col.cast("double")))
    if name == "round":
        # CypherFunctions.java:253-303.  round(x) and round(x, 0) use
        # Math.round: ties toward +INFINITY (round(-2.5) = -2.0), NaN and
        # infinities pass through, and values with no fractional part
        # (|x| >= 2^53) are returned unchanged.  With a precision > 0 or
        # an EXPLICIT mode, the reference switches to
        # BigDecimal.valueOf(x).setScale(p, mode); Spark's F.round /
        # F.bround are exactly that for HALF_UP / HALF_EVEN, and the other
        # modes are computed in decimal space (cast double->decimal is
        # BigDecimal.valueOf semantics) so FLOOR(2.3 * 10) is an exact 23,
        # not floor(22.999...).
        x = c(0).cast("double")
        p = args[1].value if n >= 2 and isinstance(args[1], A.Lit) else 0
        if p is None or (n >= 3 and isinstance(args[2], A.Lit)
                         and args[2].value is None):
            return F.lit(None).cast("double")
        p = int(p)
        if p < 0:
            raise CypherTypeError(
                "Precision argument to 'round()' cannot be negative")
        mode = None
        if n >= 3:
            if not isinstance(args[2], A.Lit) or not isinstance(
                    args[2].value, str):
                raise CypherTypeError(
                    "round() rounding mode must be a string literal")
            mode = args[2].value.upper()
        nonfinite = F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
        if mode is None and p == 0:
            whole = F.abs(x) >= F.lit(9007199254740992.0)  # 2^53
            return F.when(nonfinite | whole, x) \
                .otherwise(F.floor(x + F.lit(0.5)).cast("double"))
        if mode is None or mode == "HALF_UP":
            return F.when(nonfinite, x).otherwise(F.round(x, p))
        if mode == "HALF_EVEN":
            return F.when(nonfinite, x).otherwise(F.bround(x, p))
        valid = {"CEILING", "FLOOR", "UP", "DOWN", "HALF_DOWN",
                 "UNNECESSARY"}
        if mode not in valid:
            raise CypherTypeError(
                "Unknown rounding mode. Valid values are: CEILING, FLOOR, "
                "UP, DOWN, HALF_EVEN, HALF_UP, HALF_DOWN, UNNECESSARY.")
        dec = x.cast("decimal(38,18)")
        factor = F.lit(10 ** p).cast("decimal(20,0)")
        scaled = dec * factor
        sgn = F.when(x < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
        a = F.abs(scaled)
        if mode == "CEILING":
            ticks = F.ceil(scaled).cast("double")
        elif mode == "FLOOR":
            ticks = F.floor(scaled).cast("double")
        elif mode == "UP":
            ticks = sgn * F.ceil(a).cast("double")
        elif mode == "DOWN":
            ticks = sgn * F.floor(a).cast("double")
        elif mode == "HALF_DOWN":
            ticks = sgn * F.ceil(a - F.lit(0.5).cast("decimal(2,1)")) \
                .cast("double")
        else:  # UNNECESSARY: error if rounding would change the value
            exact = F.floor(a).cast("decimal(38,0)").cast("decimal(38,18)") \
                == a
            return F.when(nonfinite, x).otherwise(
                F.when(exact, x).otherwise(F.raise_error(F.lit(
                    "Rounding is necessary for 'round()' with mode "
                    "UNNECESSARY"))))
        out = ticks / F.lit(float(10 ** p))
        return F.when(nonfinite, x).otherwise(out)
    if name == "sign":
        return F.signum(c(0)).cast("long")
    if name == "cot":
        # cot(0) = 1/0.0 = Infinity in Java (CypherFunctions.cot); Spark
        # ANSI division raises, so guard the zero (sign of a negative zero
        # is not observable column-side — both zeros map to +Infinity)
        t = F.tan(c(0))
        return F.when(t != 0.0, F.lit(1.0) / t).otherwise(
            F.when(t.isNull(), F.lit(None).cast("double"))
             .otherwise(F.lit(float("inf"))))
    if name == "haversin":
        return (F.lit(1.0) - F.cos(c(0))) / 2
    if name == "atan2":
        return F.atan2(c(0), c(1))
    if name == "pi":
        return F.lit(math.pi)
    if name == "e":
        return F.lit(math.e)
    if name == "rand":
        return F.rand()
    if name == "randomuuid":
        return F.expr("uuid()")

    # ---- strings ---------------------------------------------------------
    if name == "tolower":
        return F.lower(c(0))
    if name == "toupper":
        return F.upper(c(0))
    if name == "trim":
        return F.trim(c(0)) if n == 1 else F.btrim(c(0), c(1))
    if name == "ltrim":
        return F.ltrim(c(0)) if n == 1 else \
            F.regexp_replace(c(0), F.concat(F.lit("^["), c(1), F.lit("]+")), F.lit(""))
    if name == "rtrim":
        return F.rtrim(c(0)) if n == 1 else \
            F.regexp_replace(c(0), F.concat(F.lit("["), c(1), F.lit("]+$")), F.lit(""))
    if name == "btrim":
        return F.btrim(c(0)) if n == 1 else F.btrim(c(0), c(1))
    if name == "left":
        # negative length throws (StringWrappingStringValue.substring:100)
        col, ln = c(0), c(1)
        return _checked(ln.isNull() | (ln >= 0),
                        col.substr(F.lit(1), ln),
                        "negative length in left()")
    if name == "right":
        col, ln = c(0), c(1)
        return _checked(
            ln.isNull() | (ln >= 0),
            col.substr(F.greatest(F.length(col) - ln + 1, F.lit(1)), ln),
            "negative length in right()")
    if name == "substring":
        # negative start/length throw (CypherFunctions.substring checks)
        col, s0 = c(0), c(1)
        ok = s0.isNull() | (s0 >= 0)
        start = s0 + 1  # Cypher 0-based
        if n == 3:
            ln = c(2)
            return _checked(ok & (ln.isNull() | (ln >= 0)),
                            col.substr(start, ln),
                            "negative start or length in substring()")
        return _checked(ok, col.substr(start, F.length(col)),
                        "negative start in substring()")
    if name == "replace":
        # Java String.replace semantics (StringValue.java:190-194): an
        # EMPTY search string interleaves the replacement between every
        # character and at both ends ("abc".replace("", "X") = XaXbXcX);
        # Spark's replace returns the original for an empty search
        src, find, rep = c(0), c(1), c(2)
        interleaved = F.concat(
            rep, F.array_join(
                F.transform(F.split(src, ""),
                            lambda ch: F.concat(ch, rep)), ""))
        plain = (F.replace(src, find, rep) if hasattr(F, "replace")
                 else F.expr("replace(...)"))
        # "".replace("", "X") is "X" in Java — the interleave would
        # double it (Spark split("", "") yields [""])
        return (F.when((find == "") & (F.length(src) == 0), rep)
                 .when(find == "", interleaved).otherwise(plain))
    if name == "reverse":
        return F.reverse(c(0))
    if name == "split":
        import re as _re
        if isinstance(args[1], A.Lit):
            if args[1].value is None:
                return F.lit(None).cast("array<string>")
            return F.split(c(0), _re.escape(args[1].value))
        if isinstance(args[1], A.ListLit) and all(
                isinstance(x, A.Lit) for x in args[1].items):
            # split(s, [d1, d2, ...]): any delimiter splits; a null in
            # the separator list makes the whole call null
            # (CypherFunctions.split:956)
            if any(x.value is None for x in args[1].items):
                return F.lit(None).cast("array<string>")
            pat = "|".join(_re.escape(x.value) for x in args[1].items)
            return F.split(c(0), pat)
        return F.split(c(0), c(1))
    if name == "normalize":
        form_name = "NFC"
        form_col = None
        if n == 2:
            a = args[1]
            # the normal form is a keyword (NFC/NFD/NFKC/NFKD), not a string
            if isinstance(a, A.Var) and a.name.upper() in (
                    "NFC", "NFD", "NFKC", "NFKD"):
                form_name = a.name.upper()
            else:
                form_name = None
                form_col = c(1)
        if form_name is not None and isinstance(args[0], A.Lit) and (
                args[0].value is None or isinstance(args[0].value, str)):
            # deterministic over a known form and a literal input:
            # normalize at translate time so the plan carries a plain
            # string literal and no Python worker stage at all
            import unicodedata
            v = args[0].value
            folded = None if v is None else unicodedata.normalize(
                form_name, v)
            return F.lit(folded).cast("string")
        form = F.lit(form_name) if form_name is not None else form_col
        return _norm_udf()(c(0), form)
    if name == "linenumber":  # valid during LOAD CSV (LoadCSVPipe.scala)
        return F.col("__csv_line").cast("long")
    if name == "file":
        return F.col("__csv_file")
    if name == "isempty":
        col, t = ctyped(0)
        if isinstance(t, T.StringType):
            return F.length(col) == 0
        if isinstance(t, T.StructType):
            names_ = set(t.fieldNames())
            if "_id" in names_ or {"nodes", "rels"} <= names_:
                # isEmpty(NODE/RELATIONSHIP/PATH) is a type error
                # (IsEmptyFunctionAcceptance: "should not work for ...")
                from ..cypher.exprs import CypherTypeError

                kind_ = ("Path" if "nodes" in names_ else
                         "Relationship" if "_type" in names_ else "Node")
                raise CypherTypeError(
                    "Invalid input for function 'isEmpty()': Expected a "
                    f"String, List or Map, got a {kind_}")
            # map literals compile to structs; field count is static
            return F.when(col.isNull(), F.lit(None).cast("boolean")) \
                .otherwise(F.lit(len(t.fields) == 0))
        return F.size(col) == 0
    if name in ("char_length", "character_length"):
        return F.length(c(0)).cast("long")

    # ---- conversions -----------------------------------------------------
    if name in ("tostring", "tostringornull"):
        col, t = ctyped(0)
        from ..cypher import anyvalue as AV
        from ..cypher.exprs import _is_duration
        if name == "tostringornull":
            # only numbers/booleans/strings/temporals/durations/points are
            # stringable; lists and maps yield null (ToStringOrNull.scala)
            from ..cypher.exprs import _is_zoned_dt as _zdt
            stringable_struct = isinstance(t, T.StructType) and (
                AV.is_any_type(t) or _zdt(t) or _is_duration(t)
                or {"hour", "minute", "second"} <= set(t.fieldNames())
                or {"crs", "x", "y"} <= set(t.fieldNames()))
            if isinstance(t, (T.ArrayType, T.MapType)) \
                    or (isinstance(t, T.StructType) and not stringable_struct):
                return F.lit(None).cast("string")
        if AV.is_any_type(t):
            if AV.is_deep_any_type(t):
                return AV.any_to_string_deep(col, AV.any_layout_depth(t))
            return AV.any_to_string(col)
        from ..cypher.exprs import _is_zoned_dt, zoned_dt_to_string
        if _is_zoned_dt(t):
            return zoned_dt_to_string(col)
        if isinstance(t, T.StructType) and _is_duration(t):
            return _duration_to_string(col)
        if isinstance(t, T.StructType) \
                and {"hour", "minute", "second"} <= set(t.fieldNames()):
            # time/localtime components struct -> HH:MM:SS[.fff][offset]
            ns = col.getField("nanosecond")
            frac = F.when(ns == 0, F.lit("")).otherwise(F.concat(
                F.lit("."), F.regexp_replace(
                    F.format_string("%09d", ns), "(000)+$", "")))
            off = (col.getField("offset")
                   if "offset" in t.fieldNames() else F.lit(""))
            return F.concat(
                F.format_string("%02d:%02d:%02d",
                                col.getField("hour"), col.getField("minute"),
                                col.getField("second")),
                frac, F.coalesce(off, F.lit("")))
        if isinstance(t, (T.TimestampNTZType, T.TimestampType)):
            return _datetime_to_string(col, with_offset=isinstance(
                t, T.TimestampType))
        if isinstance(t, (T.ArrayType, T.StructType)) \
                and AV.type_contains_any(t):
            # a container holding tagged values ANYWHERE (incl. partial
            # unification shapes like array<array<tagged>>): render
            # through the tagged layout, not the raw struct cast
            return AV.render_containing(col, t)
        if isinstance(t, T.StructType) \
                and {"crs", "x", "y"} <= set(t.fieldNames()):
            # PointValue.prettyPrint: point({x: ..., y: ..., crs: '...'})
            zpart = F.lit("")
            if "z" in t.fieldNames():
                zpart = F.when(
                    col.getField("z").isNotNull(),
                    F.concat(F.lit(", z: "),
                             col.getField("z").cast("string"))) \
                    .otherwise(F.lit(""))
            return F.when(col.isNull(), F.lit(None).cast("string")) \
                .otherwise(F.concat(
                    F.lit("point({x: "), col.getField("x").cast("string"),
                    F.lit(", y: "), col.getField("y").cast("string"),
                    zpart, F.lit(", crs: '"), col.getField("crs"),
                    F.lit("'})")))
        return col.cast("string")
    if name in ("tointeger", "tointegerornull"):
        col, t = ctyped(0)
        if isinstance(t, T.StringType):
            # stringToLongValue (CypherFunctions.java:1646) tries an
            # EXACT long parse first — integer-form strings above 2^53
            # stay exact — and only falls back to double truncation for
            # decimal/scientific forms
            direct = col.try_cast("long")
            d = col.try_cast("double")
            as_long = F.coalesce(direct, d.try_cast("long"))
            if name == "tointeger":
                # a string that parses as a number but exceeds the long
                # range THROWS for toInteger (OrNull maps it to null)
                return _checked(d.isNull() | as_long.isNotNull(), as_long,
                                "integer value is too large")
            return as_long
        if isinstance(t, T.BooleanType):
            return F.when(col, 1).otherwise(0).cast("long")
        if isinstance(t, (T.FloatType, T.DoubleType)):
            # Java (long) double semantics (NumberValue.longValue):
            # NaN -> 0, out-of-range saturates — ANSI cast raises instead
            maxl, minl = 9223372036854775807, -9223372036854775808
            return (F.when(F.isnan(col), F.lit(0).cast("long"))
                     .when(col >= F.lit(9.223372036854776e18), F.lit(maxl))
                     .when(col <= F.lit(-9.223372036854776e18), F.lit(minl))
                     .otherwise(col.cast("long")))
        return col.cast("long")
    if name in ("tofloat", "tofloatornull"):
        col, t = ctyped(0)
        if isinstance(t, T.StringType):
            return col.try_cast("double")
        if isinstance(t, T.BooleanType):
            # only String/Float/Integer convert (CypherFunctions
            # .toFloat:1453 throws on Boolean)
            if name == "tofloat":
                from ..cypher.exprs import CypherTypeError
                raise CypherTypeError(
                    "Invalid input for function 'toFloat()': Expected a "
                    "String, Float or Integer, got a Boolean")
            return F.lit(None).cast("double")
        return col.cast("double")
    if name in ("toboolean", "tobooleanornull"):
        col, t = ctyped(0)
        if isinstance(t, T.StringType):
            # Cypher accepts only 'true'/'false' (trimmed, case-insensitive);
            # Spark's boolean cast also takes y/n/yes/no/0/1
            # (CypherFunctions.java toBoolean)
            lowered = F.lower(F.trim(col))
            return (F.when(lowered == "true", F.lit(True))
                     .when(lowered == "false", F.lit(False))
                     .otherwise(F.lit(None).cast("boolean")))
        if isinstance(t, (T.FloatType, T.DoubleType, T.DecimalType)):
            # only Boolean/Integer/String convert (CypherFunctions
            # .toBoolean:1411 throws on anything else)
            if name == "toboolean":
                from ..cypher.exprs import CypherTypeError
                raise CypherTypeError(
                    "Invalid input for function 'toBoolean()': Expected "
                    "a Boolean, Integer or String, got a Float")
            return F.lit(None).cast("boolean")
        return col.cast("boolean")
    if name in ("tointegerlist", "tofloatlist", "tostringlist",
                "tobooleanlist"):
        # elementwise to*OrNull (CypherFunctions.toIntegerList et al:
        # every entry maps through the OrNull coercion); heterogeneous
        # lists dispatch per-element on the tagged rank
        from ..cypher import anyvalue as AV

        col, t = ctyped(0)
        el_t = t.elementType if isinstance(t, T.ArrayType) else None
        tagged = el_t is not None and AV.is_any_type(el_t)

        def _to_bool_str(x):
            lowered = F.lower(F.trim(x))
            return (F.when(lowered == "true", F.lit(True))
                     .when(lowered == "false", F.lit(False))
                     .otherwise(F.lit(None).cast("boolean")))

        if tagged:
            def conv(x):
                g = x.getField("__vg")
                vs, vb = x.getField("__vs"), x.getField("__vb")
                vi, vn = x.getField("__vi"), x.getField("__vn")
                if name == "tostringlist":
                    return AV.any_to_string(x)
                if name == "tointegerlist":
                    return (F.when(g == AV.RANK_BOOLEAN,
                                   vb.cast("long"))
                             .when((g == AV.RANK_NUMBER) & vi.isNotNull(),
                                   vi)
                             .when(g == AV.RANK_NUMBER,
                                   vn.try_cast("long"))
                             .when(g == AV.RANK_STRING,
                                   vs.try_cast("double").try_cast("long")))
                if name == "tofloatlist":
                    return (F.when(g == AV.RANK_NUMBER, vn)
                             .when(g == AV.RANK_STRING,
                                   vs.try_cast("double")))
                return (F.when(g == AV.RANK_BOOLEAN, vb)
                         .when(g == AV.RANK_STRING, _to_bool_str(vs)))
            return F.transform(col, conv)
        if name == "tointegerlist":
            if isinstance(el_t, T.StringType):
                return F.transform(
                    col,
                    lambda x: x.try_cast("double").try_cast("long"))
            return F.transform(col, lambda x: x.try_cast("long"))
        if name == "tofloatlist":
            return F.transform(col, lambda x: x.try_cast("double"))
        if name == "tostringlist":
            return F.transform(col, lambda x: x.cast("string"))
        if isinstance(el_t, T.StringType):
            return F.transform(col, _to_bool_str)
        return F.transform(col, lambda x: x.try_cast("boolean"))
    if name == "valuetype":
        # GQL type descriptions (functions/ValueType.scala →
        # CypherType.description, util/symbols/*.scala): non-null values
        # carry a "NOT NULL" suffix, null → "NULL", [] → LIST<NOTHING>.
        col, t = ctyped(0)
        from ..cypher import anyvalue as AV
        if AV.is_any_type(t):
            if AV.is_deep_any_type(t):
                return AV.any_value_type_precise(
                    col, AV.any_layout_depth(t))
            return AV.any_value_type(col)
        base = _cypher_type_name(t)
        if base == "NULL":
            return F.lit("NULL")
        if isinstance(t, T.ArrayType) and AV.is_any_type(t.elementType):
            # heterogeneous list: compute each element's description at
            # runtime and normalize the union (ValueTypeFunctionAcceptance
            # 'Testing LIST type values')
            d = AV.any_layout_depth(t.elementType)
            inner = AV.normalize_type_union(F.transform(
                col, lambda x: AV.any_value_type_precise(x, d)))
            return F.when(col.isNull(), F.lit("NULL")) \
                    .otherwise(F.concat(F.lit("LIST<"), inner,
                                        F.lit("> NOT NULL")))
        if isinstance(t, T.ArrayType):
            inner = _cypher_type_name(t.elementType)
            inner_col = F.when(
                F.size(col) == 0, F.lit("NOTHING"),
            ).when(
                F.exists(col, lambda x: x.isNull()), F.lit(inner),
            ).otherwise(F.lit(inner + " NOT NULL"))
            body = F.concat(F.lit("LIST<"), inner_col, F.lit("> NOT NULL"))
        else:
            body = F.lit(base + " NOT NULL")
        return F.when(col.isNull(), F.lit("NULL")).otherwise(body)

    # ---- lists -----------------------------------------------------------
    if name == "head":
        return F.get(c(0), 0)
    if name == "last":
        col = c(0)
        # element_at(-1) raises on empty arrays; last([]) is null
        return F.get(col, F.size(col) - 1)
    if name == "tail":
        col = c(0)
        return F.slice(col, 2, F.greatest(F.size(col) - 1, F.lit(0)))
    if name == "range":
        start, stop = c(0), c(1)
        step = c(2) if n == 3 else F.lit(1)
        # Neo4j: an empty range (start past stop for the step's direction)
        # is [], where Spark's sequence() raises; a ZERO step throws
        # (CypherFunctions.range: "step argument to range() cannot be zero")
        ok = ((step > 0) & (start <= stop)) | ((step < 0) & (start >= stop))
        return _checked(step.isNull() | (step != 0),
                        F.when(ok, F.sequence(start, stop, step))
                         .otherwise(F.array().cast("array<bigint>")),
                        "step argument to range() cannot be zero")

    # ---- temporal --------------------------------------------------------
    def _map_field(col, t, key, default):
        if key in t.fieldNames():
            return F.coalesce(col.getField(key).cast("int"), F.lit(default))
        return F.lit(default)

    if name == "date":
        if n == 0:
            return F.current_date()
        col, t = ctyped(0)
        if isinstance(t, T.StructType):
            lower = {f.lower(): f for f in t.fieldNames()}

            def fld(key, default):
                if key in lower:
                    return F.coalesce(
                        col.getField(lower[key]).cast("int"), F.lit(default))
                return F.lit(default)

            if "date" in lower:  # selector: date({date: <temporal>})
                from ..cypher.exprs import _is_zoned_dt, _zoned_wall
                inner = col.getField(lower["date"])
                it = t[lower["date"]].dataType
                if _is_zoned_dt(it):
                    # calendar date in the VALUE's zone, not the session's
                    return _zoned_wall(inner).cast("date")
                return inner.cast("date")
            y = fld("year", 1)
            if "week" in lower:
                # ISO week date (TemporalFields week/dayOfWeek): week 1 is
                # the week of Jan 4; Monday-based.  Out-of-range week/dow
                # raise (DateValue checked fields), never roll over —
                # validated by mapping the computed date back
                jan4 = F.make_date(y, F.lit(1), F.lit(4))
                monday1 = F.date_sub(jan4, F.weekday(jan4))
                d = F.date_add(monday1, (fld("week", 1) - 1) * 7
                               + fld("dayofweek", 1) - 1)
                ok = (F.weekofyear(d) == fld("week", 1)) \
                    & fld("dayofweek", 1).between(1, 7)
                return _checked(ok, d, "Invalid value for Week/DayOfWeek")
            if "quarter" in lower:
                q1 = F.make_date(y, (fld("quarter", 1) - 1) * 3 + 1, F.lit(1))
                d = F.date_add(q1, fld("dayofquarter", 1) - 1)
                return _checked(F.quarter(d) == fld("quarter", 1), d,
                                "Invalid value for DayOfQuarter")
            if "ordinalday" in lower:
                d = F.date_add(F.make_date(y, F.lit(1), F.lit(1)),
                               fld("ordinalday", 1) - 1)
                return _checked(F.year(d) == y, d,
                                "Invalid value for OrdinalDay")
            return F.make_date(y, fld("month", 1), fld("day", 1))
        # string parse: besides calendar dates, DateValue.parse (PATTERN)
        # accepts ISO week (yyyy-Www-d), quarter (yyyy-Qq-dd) and ordinal
        # (yyyy-ddd) forms, dashed or compact, plus year / year-month
        wk = r"(?i)^(\d{4})-?W(\d{1,2})(?:-?(\d))?$"
        qt = r"(?i)^(\d{4})-?Q([1-4])(?:-?(\d{1,2}))?$"
        od = r"^(\d{4})-?(\d{3})$"
        ym = r"^(\d{4})(?:-(\d{1,2}))?$"
        cal8 = r"^(\d{4})(\d{2})(\d{2})$"

        def ex(pat, i, default=1):
            return F.coalesce(
                F.regexp_extract(col, pat, i).try_cast("int"),
                F.lit(default))

        jan4 = F.make_date(ex(wk, 1), F.lit(1), F.lit(4))
        week_date = F.date_add(
            F.date_sub(jan4, F.weekday(jan4)),
            (ex(wk, 2) - 1) * 7 + ex(wk, 3) - 1)
        quarter_date = F.date_add(
            F.make_date(ex(qt, 1), (ex(qt, 2) - 1) * 3 + 1, F.lit(1)),
            ex(qt, 3) - 1)
        ordinal_date = F.date_add(
            F.make_date(ex(od, 1), F.lit(1), F.lit(1)), ex(od, 2) - 1)
        # DateValue.parse raises on out-of-range components ('2020-W60-1',
        # '2020-999') rather than rolling into later periods; validate by
        # mapping the computed date back to its components
        week_ok = (F.weekofyear(week_date) == ex(wk, 2)) \
            & ex(wk, 3).between(1, 7)
        quarter_ok = F.quarter(quarter_date) == ex(qt, 2)
        ordinal_ok = F.year(ordinal_date) == ex(od, 1)
        return (F.when(col.rlike(wk),
                       _checked(week_ok, week_date,
                                "Invalid value for Week/DayOfWeek"))
                 .when(col.rlike(qt),
                       _checked(quarter_ok, quarter_date,
                                "Invalid value for DayOfQuarter"))
                 .when(col.rlike(od),
                       _checked(ordinal_ok, ordinal_date,
                                "Invalid value for OrdinalDay"))
                 .when(col.rlike(ym),
                       F.make_date(ex(ym, 1), ex(ym, 2), F.lit(1)))
                 .when(col.rlike(cal8),
                       F.make_date(ex(cal8, 1), ex(cal8, 2), ex(cal8, 3)))
                 .otherwise(F.to_date(col)))
    if name in ("datetime.fromepoch", "localdatetime.fromepoch"):
        # datetime.fromepoch(seconds, nanoseconds)
        # (TemporalFunction.java FromEpoch)
        sec = c(0).cast("double")
        ns = (c(1).cast("double") if n > 1 else F.lit(0.0))
        return F.timestamp_micros(
            (sec * 1e6 + ns / 1e3).cast("long"))
    if name in ("datetime.fromepochmillis", "localdatetime.fromepochmillis"):
        return F.timestamp_millis(c(0).cast("long"))
    if name in ("datetime", "localdatetime"):
        if n == 0:
            return F.current_timestamp()
        col, t = ctyped(0)
        if isinstance(t, T.StructType):
            from ..cypher.exprs import _is_zoned_dt

            if _is_zoned_dt(t):
                return col if name == "datetime" \
                    else F.from_utc_timestamp(
                        col.getField("instant"),
                        col.getField("tz")).cast("timestamp_ntz")
            lower = {f.lower(): f for f in t.fieldNames()}
            if "datetime" in lower:
                # selector: datetime({datetime: <temporal>})
                inner = col.getField(lower["datetime"])
                it = t[lower["datetime"]].dataType
                if _is_zoned_dt(it):
                    return inner if name == "datetime" \
                        else F.from_utc_timestamp(
                            inner.getField("instant"),
                            inner.getField("tz")).cast("timestamp_ntz")
                return inner.cast("timestamp" if name == "datetime"
                                  else "timestamp_ntz")
            if "epochseconds" in lower:
                return F.timestamp_seconds(
                    col.getField(lower["epochseconds"]).cast("long"))
            if "epochmillis" in lower:
                return F.timestamp_millis(
                    col.getField(lower["epochmillis"]).cast("long"))
            # datetime({year, month, day, hour, minute, second, ...}) and
            # the {date: d, time: t} composition selectors
            # (TemporalValue map constructors, TemporalFunction.java:59)
            sec = _map_field(col, t, "second", 0).cast("double")
            for k, mult in (("millisecond", 1e-3), ("microsecond", 1e-6),
                            ("nanosecond", 1e-9)):
                sec = sec + _map_field(col, t, k, 0).cast("double") * mult
            if "date" in lower:
                from ..cypher.exprs import _is_zoned_dt as _izd
                dc = col.getField(lower["date"])
                dt_ = t[lower["date"]].dataType
                if _izd(dt_):
                    dc = dc.getField("instant")
                dc = dc.cast("date")
                y_, mo_, dd_ = F.year(dc), F.month(dc), F.dayofmonth(dc)
            else:
                y_ = _map_field(col, t, "year", 1)
                mo_ = _map_field(col, t, "month", 1)
                dd_ = _map_field(col, t, "day", 1)
            if "time" in lower:
                tc = col.getField(lower["time"])
                tt_ = t[lower["time"]].dataType
                if isinstance(tt_, T.StructType):
                    h_, mi_ = tc.getField("hour"), tc.getField("minute")
                    sec = (tc.getField("second").cast("double")
                           + tc.getField("nanosecond").cast("double") / 1e9)
                else:
                    h_, mi_ = F.hour(tc), F.minute(tc)
                    sec = F.second(tc).cast("double")
            else:
                h_ = _map_field(col, t, "hour", 0)
                mi_ = _map_field(col, t, "minute", 0)
            ymd = (y_, mo_, dd_, h_, mi_, sec)
            if "timezone" in lower and name == "datetime":
                # IANA zone id (or offset): the instant is the wall time
                # interpreted IN that zone; the id rides alongside so
                # .timezone/.offset/toString round-trip
                # (DateTimeValue.java ZoneId handling)
                tz = col.getField(lower["timezone"]).cast("string")
                inst = F.make_timestamp(*ymd, timezone=tz)
                return F.struct(inst.alias("instant"), tz.alias("tz"))
            if name == "localdatetime":
                # LOCAL datetime: wall-clock components, no zone
                # (LocalDateTimeValue) — NTZ so toString has no offset
                return (F.make_timestamp_ntz(*ymd)
                        if hasattr(F, "make_timestamp_ntz")
                        else F.make_timestamp(*ymd).cast("timestamp_ntz"))
            return F.make_timestamp(*ymd)
        if (name == "datetime" and isinstance(args[0], A.Lit)
                and isinstance(args[0].value, str)
                and args[0].value.endswith("]") and "[" in args[0].value):
            # 'wall[Zone/Id]' (optionally with an explicit offset before
            # the bracket, e.g. '2015-06-24T12:50+01:00[Europe/London]')
            body, _, zpart = args[0].value.rpartition("[")
            zone = zpart[:-1]
            import re as _re

            if _re.search(r"(Z|[+-]\d{2}:?\d{2})$", body):
                inst = F.to_timestamp(F.lit(body))
            else:
                inst = F.to_utc_timestamp(
                    F.to_timestamp_ntz(F.lit(body)), zone)
            return F.struct(inst.alias("instant"),
                            F.lit(zone).alias("tz"))
        if (name == "datetime" and isinstance(args[0], A.Lit)
                and isinstance(args[0].value, str)
                and "T" in args[0].value):
            # explicit offset in the literal ('...T12:50+02:00' / 'Z'):
            # keep it as the value's zone so .offset/.timezone/toString
            # round-trip (DateTimeValue.parse keeps the offset).
            # DateTimeValue also accepts minute-precision times
            # ('...T00:00Z'); Spark's to_timestamp needs seconds — pad.
            import re as _re

            lit = _re.sub(r"(T\d{2}:\d{2})(?=$|Z|[+-]\d{2})", r"\1:00",
                          args[0].value)
            m = _re.search(r"(Z|[+-]\d{2}:\d{2}|[+-]\d{4})$", lit)
            if m:
                off = m.group(1)
                if off != "Z" and ":" not in off:
                    off = off[:3] + ":" + off[3:]
                return F.struct(
                    F.to_timestamp(F.lit(lit)).alias("instant"),
                    F.lit(off).alias("tz"))
            return F.to_timestamp(F.lit(lit))
        if name == "localdatetime":
            # LOCAL datetime strings parse zone-free (LocalDateTimeValue)
            # — NTZ keeps the LOCAL_DT orderability group and offset-free
            # toString
            return col.cast("timestamp_ntz")
        return F.to_timestamp(col)
    if name in ("time", "localtime"):
        # TimeValue/LocalTimeValue: no Spark TIME type — a components
        # struct {hour, minute, second, nanosecond, offset} so property
        # access (t.hour) works like every other temporal accessor
        def _time_struct(h, m, s, ns, off):
            return F.struct(h.cast("long").alias("hour"),
                            m.cast("long").alias("minute"),
                            s.cast("long").alias("second"),
                            ns.cast("long").alias("nanosecond"),
                            off.alias("offset"))

        if n == 0:
            now = F.current_timestamp()
            return _time_struct(F.hour(now), F.minute(now), F.second(now),
                                F.lit(0), F.lit("Z" if name == "time" else ""))
        col, t = ctyped(0)
        if isinstance(t, T.StructType):  # time({hour, minute, second})
            lower = {f.lower(): f for f in t.fieldNames()}
            if "time" in lower and "hour" not in lower:
                # selector: time({time: <time value>}) copies components
                inner = col.getField(lower["time"])
                it = t[lower["time"]].dataType
                if isinstance(it, T.StructType):
                    off = (inner.getField("offset")
                           if "offset" in it.fieldNames() else F.lit(""))
                    return _time_struct(
                        inner.getField("hour"), inner.getField("minute"),
                        inner.getField("second"),
                        inner.getField("nanosecond"), off)
                return _time_struct(F.hour(inner), F.minute(inner),
                                    F.second(inner), F.lit(0), F.lit(""))
            return _time_struct(
                _map_field(col, t, "hour", 0), _map_field(col, t, "minute", 0),
                _map_field(col, t, "second", 0),
                _map_field(col, t, "nanosecond", 0), F.lit(""))
        pat = r"^(\d{1,2}):(\d{2})(?::(\d{2}))?(?:\.(\d{1,9}))?(.*)$"

        def grp(i):
            return F.coalesce(
                F.regexp_extract(col, pat, i).try_cast("long"), F.lit(0))

        frac = F.regexp_extract(col, pat, 4)
        nanos = F.coalesce(
            F.rpad(frac, 9, "0").try_cast("long"), F.lit(0))
        return _time_struct(grp(1), grp(2), grp(3), nanos,
                            F.regexp_extract(col, pat, 5))
    # clock variants (TemporalFunction.java:124-126): in a batch snapshot
    # transaction/statement/realtime clocks coincide
    if name in ("date.realtime", "date.transaction", "date.statement"):
        return F.current_date()
    if name in ("datetime.realtime", "datetime.transaction",
                "datetime.statement", "localdatetime.realtime",
                "localdatetime.transaction", "localdatetime.statement"):
        return F.current_timestamp()
    if name in ("date.truncate", "datetime.truncate",
                "localdatetime.truncate"):
        # truncate(unit, temporal) (TemporalValue.truncate): unit names map
        # 1:1 onto Spark's date_trunc formats
        if not isinstance(args[0], A.Lit):
            raise FunctionError("truncate unit must be a string literal")
        unit = str(args[0].value)
        col, t = ctyped(1)
        from ..cypher.exprs import _is_zoned_dt
        if _is_zoned_dt(t):
            from .let import let

            def ztrunc(c):
                # truncate in the value's OWN zone, back to the instant
                tz = c.getField("tz")
                wall = F.from_utc_timestamp(c.getField("instant"), tz)
                trunc = F.date_trunc(unit, wall)
                if name == "date.truncate":
                    return trunc.cast("date")
                if name == "localdatetime.truncate":
                    return trunc
                return F.struct(
                    F.to_utc_timestamp(trunc, tz).alias("instant"),
                    tz.alias("tz"))

            return let(col, ztrunc)
        out = F.date_trunc(unit, col)
        return out.cast("date") if name == "date.truncate" else out
    if name in ("time.truncate", "localtime.truncate"):
        # truncate over the components struct: zero every unit below the
        # requested one (TimeValue/LocalTimeValue truncate; units day..
        # microsecond — 'day' zeroes the whole time-of-day)
        if not isinstance(args[0], A.Lit):
            raise FunctionError("truncate unit must be a string literal")
        unit = str(args[0].value).lower()
        rank = {"day": 0, "hour": 1, "minute": 2, "second": 3,
                "millisecond": 4, "microsecond": 5}
        if unit not in rank:
            raise FunctionError(f"unsupported time truncation unit {unit}")
        r = rank[unit]
        col, t = ctyped(1)
        zero = F.lit(0).cast("long")
        h = col.getField("hour") if r >= 1 else zero
        m = col.getField("minute") if r >= 2 else zero
        s = col.getField("second") if r >= 3 else zero
        ns = col.getField("nanosecond")
        if r == 4:
            ns = (ns / 1000000).cast("long") * 1000000
        elif r == 5:
            ns = (ns / 1000).cast("long") * 1000
        elif r < 4:
            ns = zero
        off = (col.getField("offset")
               if isinstance(t, T.StructType)
               and "offset" in t.fieldNames() else F.lit(""))
        return F.struct(h.cast("long").alias("hour"),
                        m.cast("long").alias("minute"),
                        s.cast("long").alias("second"),
                        ns.cast("long").alias("nanosecond"),
                        off.alias("offset"))
    if name == "timestamp":
        return F.unix_millis(F.current_timestamp())
    if name == "duration":
        # duration('P1Y2M3DT4H5M6.5S') or duration({years, months, days,
        # hours, minutes, seconds, ...}) -> {months, days, seconds, nanos}
        # struct (DurationValue.java 4-component interval)
        col, t = ctyped(0)
        if isinstance(t, T.StructType):
            names = t.fieldNames()

            def total(*parts):
                tot = F.lit(0.0)
                for k, mult in parts:
                    if k in names:
                        tot = tot + F.coalesce(
                            col.getField(k).cast("double"), F.lit(0.0)) * mult
                return tot

            months = total(("years", 12), ("quarters", 3), ("months", 1))
            days = total(("weeks", 7), ("days", 1))
            secs_f = total(("hours", 3600), ("minutes", 60), ("seconds", 1),
                           ("milliseconds", 1e-3), ("microseconds", 1e-6),
                           ("nanoseconds", 1e-9))
            sign = F.lit(1.0)
            guard = None
        else:
            # DurationValue.java PATTERN (line 310): overall [-+]? sign,
            # per-unit [-+]? signs, decimal fractions ('.' or ','),
            # case-insensitive, plus the date-based form
            # P<yyyy>-<mm>-<dd>T<hh>:<mm>:<ss.fff>
            num = r"([-+]?\d+(?:[.,]\d+)?)"
            unit_pat = (r"(?i)^([-+]?)P(?:" + num + r"Y)?(?:" + num + r"M)?"
                        r"(?:" + num + r"W)?(?:" + num + r"D)?"
                        r"(?:T(?:" + num + r"H)?(?:" + num + r"M)?"
                        r"(?:" + num + r"S)?)?$")
            date_pat = (r"(?i)^([-+]?)P(\d{4})-(\d{2})-(\d{2})"
                        r"T(\d{2}):(\d{2}):(\d{2}(?:[.,]\d+)?)$")

            def grp(pat, i):
                return F.coalesce(
                    F.translate(F.regexp_extract(col, pat, i), ",", ".")
                     .try_cast("double"), F.lit(0.0))

            is_unit = col.rlike(unit_pat)
            sign = F.when(
                F.when(is_unit, F.regexp_extract(col, unit_pat, 1))
                 .otherwise(F.regexp_extract(col, date_pat, 1)) == "-",
                F.lit(-1.0)).otherwise(F.lit(1.0))
            months = F.when(
                is_unit, grp(unit_pat, 2) * 12 + grp(unit_pat, 3)) \
                .otherwise(grp(date_pat, 2) * 12 + grp(date_pat, 3))
            days = F.when(is_unit, grp(unit_pat, 4) * 7 + grp(unit_pat, 5)) \
                .otherwise(grp(date_pat, 4))
            secs_f = F.when(
                is_unit,
                grp(unit_pat, 6) * 3600 + grp(unit_pat, 7) * 60
                + grp(unit_pat, 8)) \
                .otherwise(grp(date_pat, 5) * 3600 + grp(date_pat, 6) * 60
                           + grp(date_pat, 7))
            guard = col.isNull() | is_unit | col.rlike(date_pat)
        # approximate() carry chain (DurationValue.java:858): truncate each
        # unit toward zero, carry the fractional remainder into the next
        # smaller unit (AVG_SECONDS_PER_MONTH = 2_629_746); the overall
        # sign applies to every component last
        months_l = months.cast("long")
        days_c = days + (months - months_l) * (2629746.0 / 86400.0)
        days_l = days_c.cast("long")
        secs_c = secs_f + (days_c - days_l) * 86400.0
        secs_l = secs_c.cast("long")
        nanos_l = F.round((secs_c - secs_l) * 1e9).cast("long")
        res = F.struct(
            (sign * months_l).cast("long").alias("months"),
            (sign * days_l).cast("long").alias("days"),
            (sign * secs_l).cast("long").alias("seconds"),
            (sign * nanos_l).cast("long").alias("nanos"))
        if guard is not None:
            res = _checked(guard, res,
                           "Text cannot be parsed to a Duration")
        # duration(null) -> null (TemporalFunction: null input, null value)
        return F.when(col.isNull(), F.lit(None).cast(
            "struct<months:bigint,days:bigint,seconds:bigint,nanos:bigint>")
        ).otherwise(res)
    if name == "duration.between":
        (a, ta), (b, tb) = ctyped(0), ctyped(1)

        def _is_time_struct(t):
            return (isinstance(t, T.StructType)
                    and {"hour", "minute"} <= set(t.fieldNames())
                    and "months" not in t.fieldNames())

        if _is_time_struct(ta) and _is_time_struct(tb):
            # time-of-day operands: pure seconds/nanos difference
            def _secs(col):
                return (col.getField("hour") * 3600
                        + col.getField("minute") * 60
                        + col.getField("second"))

            return F.struct(
                F.lit(0).cast("long").alias("months"),
                F.lit(0).cast("long").alias("days"),
                (_secs(b) - _secs(a)).cast("long").alias("seconds"),
                (b.getField("nanosecond")
                 - a.getField("nanosecond")).cast("long").alias("nanos"))
        # months, then whole days, then the EXACT seconds remainder — so
        # a + duration.between(a, b) = b (DurationValue.between).  Named
        # zones: calendar parts shift the wall clock in the first zoned
        # operand's zone; remainders stay exact on instants (DST gaps
        # land in the seconds component).  Operands are ordered first so
        # every component carries the sign of b - a.  Both operands are
        # let-bound: the body reads each many times, and COMPUTED
        # operands (datetime arithmetic) inlined per read took ~90 s of
        # Catalyst time on a single duration.between call.
        from ..cypher.exprs import _is_zoned_dt as _izd
        from .let import let2

        zoned = _izd(ta) or _izd(tb)

        def between_body(a, b):
            tzc = (a if _izd(ta) else b).getField("tz") if zoned else None

            def _inst(col, t):
                return (col.getField("instant") if _izd(t)
                        else col.cast("timestamp"))

            ia, ib = _inst(a, ta), _inst(b, tb)
            cond = ia <= ib
            sgn = F.when(cond, F.lit(1)).otherwise(F.lit(-1)).cast("long")
            lo = F.when(cond, ia).otherwise(ib)
            hi = F.when(cond, ib).otherwise(ia)
            wlo = F.from_utc_timestamp(lo, tzc) if zoned else lo
            whi = F.from_utc_timestamp(hi, tzc) if zoned else hi
            months = F.floor(F.months_between(whi, wlo)).cast("long")

            def _iv(mo, dy):
                return F.make_interval(
                    F.lit(0), mo.cast("int"), F.lit(0), dy.cast("int"),
                    F.lit(0), F.lit(0), F.lit(0).cast("decimal(18,6)"))

            def _shift(dy):
                w = wlo + _iv(months, dy)
                return F.to_utc_timestamp(w, tzc) if zoned else w

            d0 = F.datediff(whi.cast("date"),
                            (wlo + _iv(months, F.lit(0))).cast("date")) \
                  .cast("long")
            days = F.when(F.unix_seconds(_shift(d0)) > F.unix_seconds(hi),
                          d0 - 1).otherwise(d0)
            secs = F.unix_seconds(hi) - F.unix_seconds(_shift(days))
            return F.struct(
                (sgn * months).alias("months"), (sgn * days).alias("days"),
                (sgn * secs).cast("long").alias("seconds"),
                F.lit(0).cast("long").alias("nanos"))

        return let2(a, b, between_body)
    if name in ("duration.indays", "duration.inmonths",
                "duration.inseconds"):
        # single-component truncations (DurationValue.durationBetween
        # variants) — named-zone datetime operands contribute their
        # INSTANT, same as duration.between above
        from ..cypher.exprs import _is_zoned_dt as _izd

        (a, ta), (b, tb) = ctyped(0), ctyped(1)

        def _inst2(col, t):
            return col.getField("instant") if _izd(t) else col

        ia, ib = _inst2(a, ta), _inst2(b, tb)
        zero = F.lit(0).cast("long")
        if name == "duration.indays":
            days = F.datediff(ib.cast("date"), ia.cast("date")).cast("long")
            return F.struct(zero.alias("months"), days.alias("days"),
                            zero.alias("seconds"), zero.alias("nanos"))
        if name == "duration.inmonths":
            months = F.floor(F.months_between(ib, ia)).cast("long")
            return F.struct(months.alias("months"), zero.alias("days"),
                            zero.alias("seconds"), zero.alias("nanos"))
        secs = (F.unix_seconds(ib.cast("timestamp"))
                - F.unix_seconds(ia.cast("timestamp"))).cast("long")
        return F.struct(zero.alias("months"), zero.alias("days"),
                        secs.alias("seconds"), zero.alias("nanos"))

    # ---- spatial ---------------------------------------------------------
    if name == "point":
        col, t = ctyped(0)
        if isinstance(t, T.StructType):
            names = t.fieldNames()
            crs = col.getField("crs") if "crs" in names else (
                F.lit("wgs-84") if "longitude" in names or "latitude" in names
                else F.lit("cartesian"))
            x = col.getField("x") if "x" in names else col.getField("longitude")
            y = col.getField("y") if "y" in names else col.getField("latitude")
            z = (col.getField("z") if "z" in names
                 else col.getField("height") if "height" in names
                 else F.lit(None).cast("double"))
            return F.struct(
                crs.alias("crs"), x.cast("double").alias("x"),
                y.cast("double").alias("y"), z.cast("double").alias("z"))
        raise FunctionError("point() expects a map")
    if name in ("point.distance", "distance"):
        (a, ta), (b, tb) = ctyped(0), ctyped(1)
        if isinstance(ta, T.NullType) or isinstance(tb, T.NullType):
            return F.lit(None).cast("double")
        dx = a.getField("x") - b.getField("x")
        dy = a.getField("y") - b.getField("y")
        # 3D: include the z delta when both points carry one (cartesian-3d /
        # wgs-84-3d, CoordinateReferenceSystem.java); 2D points have z null
        dz = F.when(
            a.getField("z").isNotNull() & b.getField("z").isNotNull(),
            a.getField("z") - b.getField("z")).otherwise(F.lit(0.0))
        eucl = F.sqrt(dx * dx + dy * dy + dz * dz)
        # haversine for wgs-84 (meters, earth radius 6378140 like the reference)
        r = F.lit(2 * 6378140.0)
        lat1, lat2 = F.radians(a.getField("y")), F.radians(b.getField("y"))
        dlat = lat2 - lat1
        dlon = F.radians(b.getField("x") - a.getField("x"))
        h = F.pow(F.sin(dlat / 2), 2) + F.cos(lat1) * F.cos(lat2) * F.pow(F.sin(dlon / 2), 2)
        # wgs-84-3d: pythagoras over the great-circle distance and the
        # height difference (reference CRSCalculator.GeographicCalculator)
        hav = F.sqrt(F.pow(r * F.asin(F.sqrt(h)), 2) + dz * dz)
        # points in DIFFERENT coordinate reference systems are not
        # comparable: distance is null (PointValue: distance requires
        # equal CRS; CypherFunctions.distance returns NO_VALUE)
        return (F.when(a.getField("crs") != b.getField("crs"),
                       F.lit(None).cast("double"))
                 .when(a.getField("crs").startswith("wgs"), hav)
                 .otherwise(eucl))
    if name == "point.withinbbox":
        p, lo, hi = c(0), c(1), c(2)
        return (
            (p.getField("x") >= lo.getField("x")) & (p.getField("x") <= hi.getField("x"))
            & (p.getField("y") >= lo.getField("y")) & (p.getField("y") <= hi.getField("y"))
        )

    # ---- vector similarity (VectorSimilarityFunctions; scores live in
    # [0, 1] per VectorIndexProcedures.java:142 — cosine is the Lucene
    # normalization (1 + cos)/2, euclidean 1/(1 + d^2); a NULL vector
    # yields null, not an error (SimilarityFunctionAcceptance.feature)
    if name == "vector.similarity.cosine":
        a, b = ctyped(0), ctyped(1)
        if any(isinstance(t, T.NullType) or t is None for _, t in (a, b)):
            return F.lit(None).cast("double")
        a, b = a[0], b[0]
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
        na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
        nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
        return (F.lit(1.0) + dot / (na * nb)) / F.lit(2.0)
    if name == "vector.similarity.euclidean":
        a, b = ctyped(0), ctyped(1)
        if any(isinstance(t, T.NullType) or t is None for _, t in (a, b)):
            return F.lit(None).cast("double")
        a, b = a[0], b[0]
        d2 = F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, x: acc + x)
        return F.lit(1.0) / (F.lit(1.0) + d2)

    if name in USER_FUNCTIONS:
        return USER_FUNCTIONS[name]([c(i) for i in range(n)])

    raise FunctionError(f"unknown function {name}()")
