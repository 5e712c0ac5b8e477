"""Large-scale training-data pipeline operators over document/embedding
tables: deduplication, similarity search, text analysis, multimodal
column plumbing."""
