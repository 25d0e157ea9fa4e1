"""Sources: batch parquet tables, test fixtures, Kafka streaming (gated)."""
