"""neo4j_spark — a PySpark-native property-graph analytics engine.

Re-expresses the query capabilities of the reference graph database
(neo4j/neo4j; Cypher over a property graph) as idiomatic Spark DataFrame
programs: MATCH patterns compile to joins, horizons to projections and
aggregations, iterative path operators to driver-side BFS loops, and the
whole plan is optimized by Catalyst/AQE.
"""

from .graph import PropertyGraph, graph_from_frames
from .session import get_spark
from .api import cypher, CypherSession

__all__ = [
    "PropertyGraph",
    "graph_from_frames",
    "get_spark",
    "cypher",
    "CypherSession",
]

__version__ = "0.1.0"
