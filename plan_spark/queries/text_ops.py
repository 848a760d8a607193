"""Text-analysis + dedup operators over the documents table (north-star
LLM-pipeline surface; reference capability anchor: storage2 FTS
fts_index.go:154-330)."""
