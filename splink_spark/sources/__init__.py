"""Sources/sinks: parquet table registry and the resumable stage manager."""
