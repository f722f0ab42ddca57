"""Column-level helper functions built on pyspark.sql.functions."""
