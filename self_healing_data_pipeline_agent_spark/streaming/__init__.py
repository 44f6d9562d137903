"""Structured Streaming pipelines (SURVEY.md §2.B X17)."""
