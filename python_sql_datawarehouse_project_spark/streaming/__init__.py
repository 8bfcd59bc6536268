"""Structured Streaming layer: file-source ingestion (S11 analogue)
and event-time window operators with watermarks (SURVEY.md §2.9 —
new capability beyond the strictly-batch reference)."""
