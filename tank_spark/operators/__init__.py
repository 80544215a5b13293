"""Operators mirroring the reference's HTTP-route dataflows (SURVEY.md §2):
tile query, heatmap aggregate, CRUD point access, ingest coercion — plus the
standard relational surface Spark provides that the reference lacks (§2.11).
"""
