"""ksql_spark — a PySpark-native analytics engine with the query surface of
brendandburns/ksql (reference: /root/reference/ksql.js — an AlaSQL 0.3.1 console
over Kubernetes snapshots) re-expressed Spark-first, plus LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Layout:
  session.py   — SparkSession factory (AQE, Arrow, tuned shuffle partitions)
  tables.py    — parquet loaders for the driver test tables
  registry.py  — operator registry: (name → DataFrame builder + DuckDB oracle SQL)
  queries/     — the operator inventory from SURVEY.md §2, one module per family
  compat/      — the `->` nested-access SQL rewriter (ksql.js/README.md parity)
  sources/     — the `k8s` Python DataSource (fixture + live modes)
  streaming/   — Structured Streaming jobs (windows, watermark, dedup, refresh)
  repl.py      — interactive REPL entry point (parity with ksql.js:156-187)
  http_api.py  — HTTP /api?query= endpoint (parity with ksql.js:294-314)
"""

__version__ = "0.1.0"
