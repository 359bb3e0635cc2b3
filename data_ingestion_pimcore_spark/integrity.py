"""Integrity operators: canonical serialization, checksums, identities.

Reference parity:
* canonical serialization — sorted keys, Decimal→float
  (`app/services/data_integrity_manager.py:25-36`,
  `app/utils/json_decimal_encoder.py:6-8`)
* chunk checksum — sha256(canonical(records))
  (`app/services/data_integrity_manager.py:38-46`)
* chunk identity — f"{ingestion_id}:{chunk_number}"
  (`app/services/data_integrity_manager.py:48-54`)
* file/ingestion ids — sha256(path|type), sha256(file_id|version)
  (`app/utils/generate_ingestion_id.py:13-21`)

Two layers:
1. Driver/consumer-side Python functions — used by the ordered sink and
   the consumer-side ChunkValidator, which must agree byte-for-byte on
   the payload they hash (producer and consumer share ONE canonicalizer
   — SURVEY §7.4.1).
2. Distributed Column builders — express the same derivations as
   JVM-side expressions (sha2/concat_ws/to_json) so integrity metadata
   for 100 TB is computed inside whole-stage codegen, never in Python.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import json
from decimal import Decimal
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Python layer (driver-side sink + consumer validator)
# ---------------------------------------------------------------------------


def _canonical_default(obj: Any):
    if isinstance(obj, Decimal):
        return float(obj)  # json_decimal_encoder.py:6-8 semantics
    if isinstance(obj, (_dt.datetime, _dt.date)):
        return obj.isoformat()
    if isinstance(obj, bytes):
        return obj.hex()
    try:  # numpy scalars appear when records come out of Arrow/pandas
        import numpy as np

        if isinstance(obj, np.integer):
            return int(obj)
        if isinstance(obj, np.floating):
            return float(obj)
        if isinstance(obj, np.bool_):
            return bool(obj)
        if isinstance(obj, np.ndarray):
            return obj.tolist()
    except ImportError:
        pass
    raise TypeError(f"not canonically serializable: {type(obj)}")


def _stdlib_canonical_dumps(obj: Any) -> bytes:
    return json.dumps(
        obj,
        sort_keys=True,
        separators=(",", ":"),
        ensure_ascii=False,
        default=_canonical_default,
    ).encode("utf-8")


try:
    import orjson as _orjson

    def canonical_dumps(obj: Any) -> bytes:
        """Deterministic byte serialization: sorted keys, compact
        separators, Decimal→float (data_integrity_manager.py:25-36).

        orjson fast path (~10× stdlib; byte-identical output — both
        emit shortest-round-trip floats, UTF-8 passthrough, minimal
        escaping; asserted by the canonical-bytes golden test). Falls
        back to stdlib for values orjson cannot encode (>64-bit ints);
        the fallback is value-deterministic, so producer and consumer
        always agree byte-for-byte.
        """
        try:
            # PASSTHROUGH_DATETIME: route datetimes through the same
            # _canonical_default isoformat as the stdlib path, not
            # orjson's native RFC3339 writer.
            return _orjson.dumps(
                obj,
                option=_orjson.OPT_SORT_KEYS | _orjson.OPT_PASSTHROUGH_DATETIME,
                default=_canonical_default,
            )
        except TypeError:
            return _stdlib_canonical_dumps(obj)

except ImportError:  # pragma: no cover - orjson is present in this env
    canonical_dumps = _stdlib_canonical_dumps


def compute_checksum(records: list[dict]) -> str:
    """sha256 over the canonical bytes of the whole record list
    (data_integrity_manager.py:38-46)."""
    return hashlib.sha256(canonical_dumps(records)).hexdigest()


def build_chunk_id(ingestion_id: str, chunk_number: int) -> str:
    """Deterministic chunk identity → idempotent duplicate sends
    (data_integrity_manager.py:48-54)."""
    return f"{ingestion_id}:{chunk_number}"


def build_file_id(file_path: str, file_type: str) -> str:
    """sha256(f"{file_path}|{file_type}") (generate_ingestion_id.py:13-16)."""
    return hashlib.sha256(f"{file_path}|{file_type}".encode()).hexdigest()


def build_ingestion_id(file_id: str, version: str) -> str:
    """sha256(f"{file_id}|{version}") (generate_ingestion_id.py:18-21)."""
    return hashlib.sha256(f"{file_id}|{version}".encode()).hexdigest()


# ---------------------------------------------------------------------------
# Distributed layer (Column builders — JVM-side, codegen'd)
# ---------------------------------------------------------------------------


def file_id_col(file_path: Column, file_type: Column) -> Column:
    return F.sha2(F.concat_ws("|", file_path, file_type), 256)


def ingestion_id_col(file_id: Column, version: Column) -> Column:
    return F.sha2(F.concat_ws("|", file_id, version), 256)


def chunk_id_col(ingestion_id: Column, chunk_number: Column) -> Column:
    return F.concat_ws(":", ingestion_id, chunk_number.cast("string"))


def json_record_col(df: DataFrame) -> Column:
    """Canonical JSON of a whole row: struct fields in sorted column
    order (to_json emits fields in declared order, so sort at
    construction — SURVEY §2.1 I1)."""
    return F.to_json(F.struct(*[F.col(c) for c in sorted(df.columns)]))


def record_bytes_col(df: DataFrame) -> Column:
    """Serialized record size in bytes (json_reader.py:66 equivalent)."""
    return F.octet_length(json_record_col(df))


def canonical_string_col(df: DataFrame, decimal_scale: int = 6) -> Column:
    """Cross-engine-stable canonical record string: columns in sorted
    name order joined with '|'; doubles via DECIMAL(18,s) formatting,
    timestamps via a fixed format — identical in Spark and DuckDB
    (unlike raw JSON, whose float/timestamp formatting is
    engine-specific). Used by oracle-checked integrity queries."""
    parts: list[Column] = []
    for name in sorted(df.columns):
        dt = dict(df.dtypes)[name]
        c = F.col(name)
        if dt == "double" or dt == "float":
            parts.append(c.cast(f"decimal(18,{decimal_scale})").cast("string"))
        elif "timestamp" in dt:
            parts.append(F.date_format(c, "yyyy-MM-dd HH:mm:ss"))
        else:
            parts.append(c.cast("string"))
    return F.concat_ws("|", *parts)


def sql_canonical_string(columns: list[tuple[str, str]], decimal_scale: int = 6) -> str:
    """DuckDB fragment mirroring canonical_string_col.

    ``columns`` is [(name, dtype), ...] in the DataFrame's order; the
    fragment sorts by name, matching the Spark side.
    """
    parts = []
    for name, dt in sorted(columns):
        if dt in ("double", "float"):
            parts.append(f"CAST(CAST({name} AS DECIMAL(18,{decimal_scale})) AS VARCHAR)")
        elif "timestamp" in dt:
            parts.append(f"STRFTIME({name}, '%Y-%m-%d %H:%M:%S')")
        else:
            parts.append(f"CAST({name} AS VARCHAR)")
    return "CONCAT_WS('|', " + ", ".join(parts) + ")"
