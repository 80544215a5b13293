"""Structured-Streaming surface: drop-dir bulk ingest (the reference's
spool-file pipeline re-expressed), streaming windowed aggregation, and
streaming sessionization.
"""
