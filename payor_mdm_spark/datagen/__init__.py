"""Deterministic synthetic transcript-world generator (tests + bench)."""
