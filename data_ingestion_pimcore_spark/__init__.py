"""data_ingestion_pimcore_spark — a PySpark-native analytics & ingestion engine.

A from-scratch re-expression of the capabilities of the reference system
``Quietbothered/data_ingestion_pimcore`` (a chunk-exactly-once file→HTTP
ingestion service) as an idiomatic Spark engine, plus the standard
relational surface (joins/aggs/windows/sorts/set-ops/scalar fns) and
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale.

Layout:
  session.py    — SparkSession factory with scale-aware defaults
  registry.py   — query registry powering __spark_entry__ / bench / tests
  config.py     — IngestRequest validation (reference request_model parity)
  integrity.py  — canonical serialization, checksums, deterministic ids
  chunker.py    — record-count and byte-budget chunk assignment
  state.py      — ingestion state store (resume / re-ingestion versioning)
  sink.py       — ordered ACK-gated sink + consumer-side ChunkValidator
  pipeline.py   — end-to-end ingestion pipeline composition
  sources/      — JSON array / JSONL / Excel readers
  ops/          — relational, dedup, similarity, text, timeseries, multimodal
"""

__version__ = "0.1.0"
