"""Structured Streaming surface (SURVEY.md §2.11: NEW — the reference is
batch-only). Built on the events table shape; see events.py."""
