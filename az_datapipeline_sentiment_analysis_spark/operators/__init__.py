"""Composed operators: dedup, similarity search, as-of joins,
bounded-memory exact quantiles, sessionization."""
