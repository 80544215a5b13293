"""Exposed scalar-function surface (SURVEY.md §2.7)."""
