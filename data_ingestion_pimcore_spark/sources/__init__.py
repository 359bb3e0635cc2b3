"""Input connectors (reference S1–S4).

* ``json_source`` — JSON-array files (S1) + recursive directory
  expansion (S2), both the built-in JVM reader path and a streaming
  Python DataSource for single giant array files.
* ``excel_source`` — xlsx workbooks (S4) parsed with the stdlib
  (zipfile + expat iterparse; this container has no openpyxl), with the
  reference's header→schema (P1), null-padding (P2) and empty-row
  filter (F1) semantics, exposed as a Spark 4 Python DataSource.

Cloud filesystems (S3): Spark resolves ``s3a://`` / ``gs://`` /
``abfss://`` URIs natively through Hadoop FS connectors — paths are
passed through to ``spark.read`` unchanged, so no fsspec analogue is
needed. The Python DataSources here open local paths only (the
reference's ``file://`` case); remote objects reach them via Spark's
file distribution or a mounted store.
"""

from .excel_source import ExcelDataSource, iter_excel_records, read_excel
from .json_source import JsonArrayDataSource, iter_json_array, read_json_array

__all__ = [
    "ExcelDataSource",
    "JsonArrayDataSource",
    "iter_excel_records",
    "iter_json_array",
    "read_excel",
    "read_json_array",
]
