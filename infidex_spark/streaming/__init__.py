"""Incremental index maintenance: streaming ingest into delta segments,
segment merge/compaction, tombstone deletes."""
