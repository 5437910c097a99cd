"""Training-data pipeline functions: dedup, similarity search, text
analysis, multimodal plumbing — the large-scale corpus-curation operators
that sit beside the extraction engine (see SURVEY.md §7).

Everything here is JVM-side column expressions or Arrow-batched pandas UDFs;
no row-at-a-time Python anywhere (BASELINE.json input_hint contract).
"""
