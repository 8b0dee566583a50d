"""DataFrame-level operators: the extraction pipeline, text analysis,
dedup, similarity search, metrics, and checkpoint/resume."""
