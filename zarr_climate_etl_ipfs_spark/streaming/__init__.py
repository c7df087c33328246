"""Structured Streaming surface: the reference's hand-rolled incremental
batch loop (SURVEY.md §2.9) as real streams."""
