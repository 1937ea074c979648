"""Engine operators: CDC normalization, keyed upsert/merge, dedup,
similarity search, text analysis, multimodal column plumbing."""
