"""Inverted-index build: logical (pure DataFrame) and materialized
(compressed posting blocks on disk with manifest/resume)."""
