"""Operators — update semantics, QC, nearest/as-of joins, dedup, similarity,
text analysis. Each module documents the reference functions it re-expresses."""
