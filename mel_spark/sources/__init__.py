"""Sources & sinks: parquet/Iceberg checkpointed stage IO."""
