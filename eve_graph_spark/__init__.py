"""eve_graph_spark — a PySpark-native analytics engine.

From-scratch, idiomatic-Spark re-expression of the capabilities of the
reference graph service `madmikeross/eve-graph` (property graph of solar
systems + weighted shortest-path queries + diff-sync ingestion), extended
with large-scale data-pipeline operators (dedup, similarity search,
multimodal columns, text analysis).

Design notes (SURVEY.md §1.6, §4):
- Graph model = vertex DataFrame + edge DataFrame (GraphFrames convention).
- All relational operators are declarative DataFrame plans so Catalyst does
  pushdown / pruning / join planning; no custom Catalyst rules are needed.
- The only driver-side iteration is the Pregel-style SSSP loop
  (`operators/graph.py`), checkpointed to truncate lineage.
"""

from eve_graph_spark.session import get_spark

__all__ = ["get_spark", "GraphEngine", "PropertyGraph", "RouteNotFound"]
__version__ = "0.1.0"


def __getattr__(name):
    # lazy re-exports: importing the package stays cheap (no pyspark sql
    # module graph pulled in until an API object is actually requested)
    if name in ("GraphEngine", "RouteNotFound"):
        from eve_graph_spark import api

        return getattr(api, name)
    if name == "PropertyGraph":
        from eve_graph_spark.graph_api import PropertyGraph

        return PropertyGraph
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
