"""Structured Streaming surface (net-new — the reference has no streaming
constructs anywhere, SURVEY.md §2.11)."""
