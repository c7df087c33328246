"""Sources & sinks: the grid store (parquet), ingest canonicalization, and
driver-side extractors (SURVEY.md §2.1)."""
