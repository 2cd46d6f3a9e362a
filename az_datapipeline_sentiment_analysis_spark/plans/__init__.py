"""Declared query plans: the engine's operator surface as (PySpark, oracle-SQL) pairs."""
