"""tracy_matdb_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of HallLabs/tracy_matdb
(reference studied read-only at /root/reference) as an idiomatic Spark
DataFrame/SQL engine over Parquet, extended with the LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
needed at 100 TB scale.

Layout:
    session.py    SparkSession factory (deterministic, AQE, Arrow)
    catalog.py    driver-table loading / view registration
    functions/    portable deterministic PRNG, text, vector column builders
    operators/    split, dedup, generators, DSL compiler, similarity, asof
    sources/      ingest helpers (XYZ/CFG-style text formats -> DataFrame)
    plans/        YAML pipeline spec + parameter-grid expansion (driver-side)
    streaming/    Structured Streaming surface over the events table
    queries/      the registered query inventory (Spark fn + DuckDB oracle)
"""

__version__ = "0.1.0"
