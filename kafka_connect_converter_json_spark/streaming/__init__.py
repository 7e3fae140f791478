"""Streaming/ingest layer: idempotent MERGE sink, epoch replay with
checkpoint/resume, lineage emission, Structured Streaming wrapper."""
