"""Host-side IO: parquet scan/sink, block serde, spill codec."""
