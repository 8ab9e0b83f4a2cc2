"""Structured Streaming surface: file-drop ingestion pipeline and
event-time windowed aggregations (SURVEY.md §2.9 — absent from the
reference, which re-globs a directory per run; here it's a real
readStream with archival, watermarks, and windows)."""
