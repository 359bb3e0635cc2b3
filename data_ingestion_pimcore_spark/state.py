"""Persistent ingestion state store (reference ST1/ST2).

Parity with the reference's SQLite table
``ingestion_state(ingestion_id TEXT PRIMARY KEY, last_chunk INTEGER,
total_records INTEGER, status TEXT)``
(`app/services/ingestion_state_store.py:26-33`) with its defaults:
missing row → last_chunk = -1, total_records = 0 (`:36-50`).

Storage is a parquet file written atomically (temp + rename) — the
same role Structured Streaming's commit log plays on the driver:
offsets are tiny driver-local metadata, not distributed data. A
``as_dataframe`` view keeps it queryable from Spark, mirroring how the
reference exposes state to resume logic.

Re-ingestion versioning (ST2, `app/controllers/ingestion_controllers.py:31-41`):
``version_for(re_ingestion)`` returns "resume" or an epoch-millis
string, producing a fresh ingestion_id (fresh numbering/totals) when
re-ingestion is requested.
"""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession

STATUS_IN_PROGRESS = "IN_PROGRESS"
STATUS_COMPLETED = "COMPLETED"

_SCHEMA = pa.schema(
    [
        ("ingestion_id", pa.string()),
        ("last_chunk", pa.int64()),
        ("total_records", pa.int64()),
        ("status", pa.string()),
    ]
)


class IngestionStateStore:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._rows: dict[str, dict] = {}
        if os.path.exists(path):
            tbl = pq.read_table(path)
            for row in tbl.to_pylist():
                self._rows[row["ingestion_id"]] = row

    # -- reads (defaults per ingestion_state_store.py:36-50) --------------

    def get_last_chunk(self, ingestion_id: str) -> int:
        return self._rows.get(ingestion_id, {}).get("last_chunk", -1)

    def get_total_records(self, ingestion_id: str) -> int:
        return self._rows.get(ingestion_id, {}).get("total_records", 0)

    def get_status(self, ingestion_id: str) -> str | None:
        return self._rows.get(ingestion_id, {}).get("status")

    # -- writes (ACK-gated upsert, ingestion_state_store.py:52-68) --------

    def update_chunk(self, ingestion_id: str, chunk_number: int, total_records: int):
        """Commit progress — call ONLY after consumer ACK ("no false
        progress", reference README:471-482)."""
        self._rows[ingestion_id] = {
            "ingestion_id": ingestion_id,
            "last_chunk": int(chunk_number),
            "total_records": int(total_records),
            "status": STATUS_IN_PROGRESS,
        }
        self._flush()

    def mark_completed(self, ingestion_id: str):
        row = self._rows.setdefault(
            ingestion_id,
            {
                "ingestion_id": ingestion_id,
                "last_chunk": -1,
                "total_records": 0,
                "status": STATUS_IN_PROGRESS,
            },
        )
        row["status"] = STATUS_COMPLETED
        self._flush()

    def _flush(self) -> None:
        tmp = f"{self.path}.tmp"
        pq.write_table(
            pa.Table.from_pylist(list(self._rows.values()), schema=_SCHEMA), tmp
        )
        os.replace(tmp, self.path)  # atomic on POSIX

    def as_dataframe(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(
            "ingestion_id string, last_chunk long, total_records long, status string"
        ).parquet(self.path)


def version_for(re_ingestion: bool) -> str:
    """"resume" keeps the ingestion_id (resume semantics); re-ingestion
    mints a fresh versioned id (ingestion_controllers.py:34-41)."""
    return str(int(time.time() * 1000)) if re_ingestion else "resume"
