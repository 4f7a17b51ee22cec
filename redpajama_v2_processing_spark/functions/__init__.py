"""Column-level function library (native Spark SQL expressions first)."""
