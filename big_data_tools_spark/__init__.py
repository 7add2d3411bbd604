"""big_data_tools_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capability surface of the reference repo
(hinashussain/Big-Data-Tools, a Databricks PySpark ETL + feature
engineering + ML-classification notebook), extended with
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) and designed for 100 TB scale:

- declarative DataFrame / Spark SQL plans (Catalyst optimizes);
- zero row-at-a-time Python UDFs in the core operator set;
- broadcast-aware star joins, AQE-friendly shuffles;
- explicit schemas at ingest (no inference scans in the hot path).

Layout:
    session     SparkSession builder with scale-sane defaults
    io          sources (parquet/json with explicit schemas), sinks
    operators   reusable DataFrame -> DataFrame operators
    functions   scalar/column expression helpers
    queries     registry of named queries + DuckDB oracle SQL twins
    plans       plan-lint helpers (explain auditing)
    streaming   Structured Streaming veneer over the events table
    ml          feature/train/eval pipeline (reference §2.9 parity)
"""

__version__ = "0.1.0"
