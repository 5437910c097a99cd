"""Spark operators: extraction, adapters, validation rules, report,
dedup, similarity search, text statistics."""
