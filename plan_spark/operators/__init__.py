"""Custom operators the reference lacks a direct Spark primitive for
(SURVEY.md §2.3 range/as-of joins; §2.10 dedup/KNN/FTS)."""
