"""Structured Streaming operators (capability superset — the
reference has no streaming, SURVEY.md §2.11)."""
