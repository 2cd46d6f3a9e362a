"""Composed operators: dedup, similarity search, as-of joins, sessionization."""
