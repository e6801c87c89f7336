"""PySpark-native analytics engine with the query/data-processing
capabilities of ``ian-whitestone/data-wrangling-openstreetmap``.

The reference is a single-process Python ETL + exploratory-query project
(OSM XML wrangling: audit → clean → shape → load → query). This package
re-expresses that capability surface — plus the driver-mandated
extensions (dedup, similarity search, multimodal columns, text analysis,
geospatial, streaming) — as idiomatic PySpark: declarative DataFrame/SQL
plans optimized by Catalyst, designed for 100 TB scale, tested locally
against a DuckDB oracle.

Layout:
    session.py    SparkSession builder tuned for local + scale notes
    io.py         table loading / temp-view registration
    registry.py   query registry: name -> (spark fn, oracle SQL)
    operators/    graded query implementations (SURVEY.md §2 inventory)
    functions/    reusable Column-expression libraries (geo, vector, text)
    sources/      ingestion demos (OSM-like XML, multimodal binary)
    streaming/    Structured Streaming forms sharing batch transforms
    plans/        explain-plan introspection helpers
"""

__version__ = "0.1.0"
