"""Sources & sinks beyond parquet (SURVEY.md §2.1), including the
OSM-shaped wrangling demo layer — the reference-fidelity surface:
generate a messy OSM XML extract, ingest it with Spark's native XML
source, audit tag quality, normalize values, shape nested documents,
flatten to the relational star, and write CSV/JSON sinks.
"""
