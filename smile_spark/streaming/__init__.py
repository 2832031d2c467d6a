"""Structured Streaming wrappers (north-star extension; the reference
has no streaming surface — SURVEY.md §2.2)."""
