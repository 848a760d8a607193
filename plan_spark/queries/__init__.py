"""Declared query surface: TPC-H-adapted set + analytics + LLM-pipeline ops."""
