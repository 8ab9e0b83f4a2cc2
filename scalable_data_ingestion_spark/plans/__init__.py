"""Relational query library (joins, aggregations, windows, set ops, events)."""
