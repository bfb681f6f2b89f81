from graphtpu.core.graph import (
    Graph,
    DiGraph,
    build_graph,
    read_edgelist_graph,
    padded_neighbors,
    dense_adjacency,
    column_normalized,
)
from graphtpu.core import config
from graphtpu.core.prng import key_for

__all__ = [
    "Graph",
    "DiGraph",
    "build_graph",
    "read_edgelist_graph",
    "padded_neighbors",
    "dense_adjacency",
    "column_normalized",
    "config",
    "key_for",
]
