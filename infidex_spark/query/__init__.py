"""Query-time top-k retrieval over the built index."""
