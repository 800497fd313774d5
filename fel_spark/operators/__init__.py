"""Operators: ranking, mention extraction, blocking, scoring, clustering,
dedup, similarity search, text analytics."""
