"""Scalar/array/text function library (JVM-first, pandas-UDF where needed)."""
