"""etl_bom_radiation_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference ETL pipeline
(SavvyPlus/etl-bom-radiation: ESRI ASCII grid ingest -> Hive-partitioned
fact table -> SQL query surface) as an idiomatic Spark engine, and extends
it with LLM-data-pipeline operators (dedup, similarity search, multimodal
columns, text analysis) designed for 100 TB scale.

Layout:
    session      - SparkSession factory (UTC, AQE, tuned shuffle partitions)
    grid/        - ESRI ASCII grid decode (the flagship transform)
    workspace    - catalog/warehouse bootstrap (CREATE DATABASE/TABLE, dirs,
                   MSCK/ADD PARTITION, prefix cleanup)
    ingest       - batch + streaming ingest pipeline with archival/quarantine
    queries/     - the declared query surface (registry of spark fn + DuckDB
                   oracle): relational, windows/set-ops, scalar functions,
                   grid, LLM-pipeline, UDFs, streaming batch forms
    streaming/   - structured-streaming operators (windows, dedup, state,
                   incremental rollup maintenance)
    scale        - explicit scale levers: bucketed co-located joins and
                   salted skew joins
"""

__version__ = "0.1.0"
