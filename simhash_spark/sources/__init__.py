"""Sources & sinks: fixture generation, checkpoint catalog (parquet+manifest)."""
