"""Public API: ``cypher(spark, query, graph, params) -> DataFrame``.

Lifecycle mirrors the reference ExecutionEngine
(reference: ``community/cypher/cypher/src/main/scala/org/neo4j/cypher/internal/ExecutionEngine.scala:96``):
parse -> (cached) translate -> lazy DataFrame; Catalyst is the physical
planner, the returned DataFrame the executable query.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from .graph import PropertyGraph
from .cypher.parser import parse


def cypher(
    spark: SparkSession,
    query: str,
    graph: PropertyGraph,
    params: Optional[Dict[str, Any]] = None,
) -> DataFrame:
    from .cypher.translate import Translator

    ast = parse(query)
    return Translator(spark, graph, params or {}).translate(ast)


class CypherSession:
    """Bound (spark, graph) pair with an AST cache — the analog of the
    reference's executableQueryCache (ExecutionEngine.scala:77)."""

    def __init__(self, spark: SparkSession, graph: PropertyGraph) -> None:
        self.spark = spark
        self.graph = graph
        self._ast_cache: Dict[str, Any] = {}

    def run(self, query: str, params: Optional[Dict[str, Any]] = None) -> DataFrame:
        from .cypher.translate import Translator

        ast = self._ast_cache.get(query)
        if ast is None:
            ast = parse(query)
            self._ast_cache[query] = ast
        return Translator(self.spark, self.graph, params or {}).translate(ast)
