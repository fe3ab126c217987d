"""Column-level functions: vectorized pandas UDFs + native Catalyst helpers."""
