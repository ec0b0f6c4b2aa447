from . import (
    curation,
    dedup,
    graph,
    joins,
    retrieval,
    similarity,
    sketch,
    skew,
    text,
)

__all__ = ["curation", "dedup", "graph", "joins", "retrieval",
           "similarity", "sketch", "skew", "text"]
