"""Structured Streaming assemblies: medallion pipeline, orchestration."""
