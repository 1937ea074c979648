"""Structured Streaming queries (SURVEY.md §2.10 upgrade path) — filled in
milestone M7."""
