"""Sources: delimited file scan, discovery/routing, streaming ingest."""
