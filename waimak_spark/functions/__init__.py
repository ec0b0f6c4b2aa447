from . import curation, dedup, similarity, text

__all__ = ["curation", "dedup", "similarity", "text"]
