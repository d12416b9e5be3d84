"""Polygon / region sources (S1/S2/S3 of SURVEY.md §2.1)."""
