"""Sources: parquet test tables, reference-format CSV point files, Kafka
edges (streaming)."""
