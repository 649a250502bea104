"""Batch-transform stages: fetch, parse, decode, dedup, text stats, ANN."""
