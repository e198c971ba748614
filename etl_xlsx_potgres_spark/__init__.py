"""etl_xlsx_potgres_spark — a PySpark-native analytics engine.

A ground-up, Spark-first re-expression of the capabilities of the
reference repo ``HelouiseDayane/ETL-xlsx-potgres`` (a pandas+psycopg2
xlsx->Postgres ETL, surveyed in SURVEY.md), extended with the
relational operator surface and LLM-data-pipeline operators
(deduplication, similarity search, multimodal columns, text analysis)
required for 100 TB-scale training-data processing.

Layout:
    session.py    SparkSession factory (AQE, Arrow, UTC, sized shuffles)
    sources/      declared-schema readers (parquet test tables, xlsx)
    operators/    reusable DataFrame transforms (clean, dedup, reshape,
                  quality/quarantine, similarity, text, multimodal)
    functions/    scalar/array/json helper expressions
    plans/        the query library exposed through __spark_entry__
                  (each query has a DuckDB oracle twin for the
                  correctness gate)
    sinks/        JDBC append/upsert writers
    streaming/    Structured Streaming variants of the event ops
"""

__version__ = "0.1.0"
