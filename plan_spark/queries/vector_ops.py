"""Vector similarity operators over the embeddings table (reference
capability anchor: storage2 KNN — flat/IVF indexes, distance_metrics.go)."""
