"""Source-side ingest: test-table loaders, source-file manifests, Avro."""
