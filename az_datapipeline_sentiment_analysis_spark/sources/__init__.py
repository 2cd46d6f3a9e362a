"""Sources: REST paged data source, JSON bronze->silver ingest."""
