"""Structured-Streaming surfaces (SURVEY.md §3 G)."""
