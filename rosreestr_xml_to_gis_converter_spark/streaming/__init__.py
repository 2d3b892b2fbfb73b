"""Structured Streaming operators (ingest-side of the engine)."""
