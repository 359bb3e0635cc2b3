"""End-to-end ingestion pipeline: source → ordered chunking → integrity
→ ordered ACK-gated delivery → resumable state.

Batch-mode equivalent of the reference's ``stream_and_push``
(`app/services/json_reader.py:36-127`), re-expressed Spark-first:

* All compute (scan, canonicalization, chunk assignment, sizes) is a
  distributed declarative plan.
* The resume filter (``chunk_number > last_chunk``, reference K3) is a
  DataFrame predicate, so Catalyst prunes already-ACKed chunks *before*
  the expensive work on re-runs.
* Only the network emit is sequential per ingestion — the consumer's
  ordering contract (CV2) demands it (SURVEY §4.3.2). Rows stream to
  the driver via ``toLocalIterator`` in (chunk, row) order with O(one
  partition) driver memory; many ingestions parallelize across each
  other.

Resume semantics are the *intended* ones (the Excel path's record-skip,
`app/services/excel_reader.py:65-69` + README:519-528), not the JSON
path's re-send bug (SURVEY §2.1 "Known reference bugs").
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .chunker import CHUNK_COL, assign_chunks_by_bytes, assign_chunks_by_count
from .config import IngestRequest
from .integrity import (
    build_file_id,
    build_ingestion_id,
    build_chunk_id,
    compute_checksum,
)
from .sink import Transport, send_chunk_with_retry
from .state import IngestionStateStore, version_for


@dataclass
class IngestSummary:
    ingestion_id: str
    chunks_sent: int
    total_records: int
    last_chunk: int
    status: str


def _chunked(df: DataFrame, request: IngestRequest, order_cols: list[str]) -> DataFrame:
    if request.chunk_size_by_records is not None:
        return assign_chunks_by_count(df, order_cols, request.chunk_size_by_records)
    return assign_chunks_by_bytes(df, order_cols, request.chunk_size_by_memory)


def ingest(
    spark: SparkSession,
    request: IngestRequest,
    df: DataFrame,
    state: IngestionStateStore,
    transport: Transport,
) -> IngestSummary:
    """Run one ingestion execution to completion (or raise ChunkRejected).

    ``df`` is the already-loaded source (see sources/); ``request.order_cols``
    must name a deterministic total order so chunk numbering is
    reproducible across runs — the crux of resume correctness at scale.
    """
    order_cols = list(request.order_cols)
    if not order_cols:
        raise ValueError("order_cols required for deterministic chunk numbering")

    file_id = build_file_id(request.file_path, request.file_type)
    ingestion_id = build_ingestion_id(file_id, version_for(request.re_ingestion))

    last_chunk = state.get_last_chunk(ingestion_id)
    total_records = state.get_total_records(ingestion_id)

    record_cols = df.columns
    chunked = _chunked(df, request, order_cols)
    # K3: skip already-ACKed chunks — a pushed-down predicate, so re-runs
    # never recompute completed work.
    pending = chunked.where(F.col(CHUNK_COL) > last_chunk)
    # Ordered delivery: co-locate each chunk, sort, stream to driver.
    ordered = pending.repartitionByRange(
        max(pending.sparkSession.sparkContext.defaultParallelism, 1),
        F.col(CHUNK_COL),
        *order_cols,
    ).sortWithinPartitions(CHUNK_COL, *order_cols)

    chunks_sent = 0
    cur_chunk: int | None = None
    cur_records: list[dict] = []

    def flush(chunk_number: int, records: list[dict], is_last: bool):
        nonlocal chunks_sent, total_records
        payload = {
            "ingestion_id": ingestion_id,
            "chunk_number": chunk_number,
            "chunk_id": build_chunk_id(ingestion_id, chunk_number),
            "checksum": compute_checksum(records),
            "records": records,
            "is_last": is_last,
        }
        send_chunk_with_retry(transport, payload)  # raises after 3 NACKs
        total_records += len(records)
        # K2: ACK-gated offset commit — no false progress.
        state.update_chunk(ingestion_id, chunk_number, total_records)
        chunks_sent += 1

    for row in ordered.toLocalIterator(prefetchPartitions=True):
        n = row[CHUNK_COL]
        if cur_chunk is not None and n != cur_chunk:
            flush(cur_chunk, cur_records, is_last=False)
            cur_records = []
        cur_chunk = n
        d = row.asDict(recursive=True)
        cur_records.append({c: d[c] for c in record_cols})
    if cur_chunk is not None:
        flush(cur_chunk, cur_records, is_last=True)

    # K4: completion handshake; mark COMPLETED only after consumer ACK.
    last = state.get_last_chunk(ingestion_id)
    resp = transport(
        {
            "ingestion_id": ingestion_id,
            "status": "COMPLETED",
            "chunk_number": last,
            "total_records": total_records,
        }
    )
    if resp.ack:
        state.mark_completed(ingestion_id)

    return IngestSummary(
        ingestion_id=ingestion_id,
        chunks_sent=chunks_sent,
        total_records=total_records,
        last_chunk=state.get_last_chunk(ingestion_id),
        status=state.get_status(ingestion_id) or "IN_PROGRESS",
    )
