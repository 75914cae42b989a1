"""Structured Streaming ingest (incremental path into the batch DAG)."""
