"""Incremental index maintenance (batch MERGE + Structured Streaming)."""
