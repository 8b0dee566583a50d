"""Structured Streaming surfaces: incremental extraction and windowed
event aggregation."""
