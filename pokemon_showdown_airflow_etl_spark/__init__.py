"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference Pokemon-Showdown-Airflow-ETL pipeline.

The reference (/root/reference) is an Airflow + SQLite + loose-JSON-files
ETL that discovers, downloads, retries and compacts battle replays. This
package re-expresses every one of its operators (SURVEY.md section 2) as
declarative Spark DataFrame plans over a partitioned parquet lake:

- ``schemas``    — explicit StructTypes for the replay document, the
                   search-page row, the ``replay_status`` metadata table
                   and the cursor state (reference db.py:43-70).
- ``functions``  — scalar column expressions (C1-C13) and battle-log
                   protocol parsing.
- ``operators``  — metadata-table relational operators (filters,
                   aggregations, windows, set ops), MERGE-style upsert,
                   compaction, plus the LLM-data-pipeline operators
                   (dedup, similarity search, text analysis, multimodal).
- ``sources``    — the paginated replay API client (pluggable transport,
                   retry/backoff parity with api.py:44-99) and file scans.
- ``jobs``       — the four pipeline stages (discover, download, retry,
                   compact) plus maintenance jobs, mirroring the
                   reference DAG topology (showdown_replay_etl_dag.py).
- ``plans``      — the named query catalog checked against a DuckDB
                   oracle by the driver (__spark_entry__.py).
- ``streaming``  — Structured Streaming formulation of the incremental
                   watermark ingest and daily tumbling windows.
"""

__version__ = "0.1.0"
