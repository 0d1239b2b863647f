"""Deterministic synthetic fixtures (no external data)."""
