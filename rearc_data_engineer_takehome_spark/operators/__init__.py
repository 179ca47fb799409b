"""Operators: parsing, relational analytics, data quality, dedup,
similarity search, text analysis, multimodal column plumbing."""
