"""Structured-Streaming incremental build (SURVEY.md §2.10)."""
