"""Scalar/text/dedup/similarity function library (engine UDF surface)."""
