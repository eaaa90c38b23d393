from .build import BipartiteGraph, build_graph, symmetric_normalize

__all__ = ["BipartiteGraph", "build_graph", "symmetric_normalize"]
