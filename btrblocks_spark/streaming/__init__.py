"""Structured Streaming ingest + stateful operators for the events stream."""
