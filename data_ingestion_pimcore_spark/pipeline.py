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

import hashlib
import threading
from contextlib import contextmanager
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .chunker import (
    CHUNK_COL,
    ascending_chunk_layout,
    assign_chunks_by_bytes,
    assign_chunks_by_count,
)
from .config import IngestRequest
from .integrity import (
    build_chunk_id,
    build_file_id,
    build_ingestion_id,
    canonical_dumps,
)
from .sink import Transport, send_chunk_with_retry
from .state import IngestionStateStore, version_for


def _chunk_payloads(
    pending: DataFrame, record_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """(chunk_number, n_records, checksum, payload-JSON) per chunk.

    ``applyInPandas`` hands each chunk to one executor task as a whole
    Arrow group (bounded by the chunk size contract, ≤4000 records /
    the byte budget), which serializes it canonically and hashes it —
    the expensive Python work, parallel across chunks.
    """

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_cols, kind="mergesort")
        # Per-column tolist with null-fixing ONLY for columns that
        # actually contain nulls: a whole-frame astype(object) +
        # where(notna) would copy every value into object cells per
        # chunk (~40% of payload-build CPU); numeric/string columns
        # without nulls convert in one C call instead.
        columns = _record_columns(pdf, record_cols)
        # dict(zip(...)) over column lists ≈ 4x pandas to_dict("records")
        # on 4000-row chunks — this runs once per chunk in the hot path.
        records = [dict(zip(record_cols, row)) for row in zip(*columns)]
        blob = canonical_dumps(records)
        # Payload stays BYTES end-to-end (Arrow binary → driver → wire):
        # a string column would pay a UTF-8 validate/decode on the
        # sequential driver edge for every chunk.
        return pd.DataFrame(
            {
                CHUNK_COL: [int(pdf[CHUNK_COL].iloc[0])],
                "n_records": [len(records)],
                "checksum": [hashlib.sha256(blob).hexdigest()],
                "payload": [blob],
            }
        )

    return pending.groupBy(CHUNK_COL).applyInPandas(
        build,
        schema=f"{CHUNK_COL} long, n_records long, checksum string, payload binary",
    )


def _record_columns(pdf: pd.DataFrame, record_cols: list[str]) -> list[list]:
    """Per-column tolist with null-fixing only where needed (see
    _chunk_payloads.build)."""
    columns = []
    for c in record_cols:
        s = pdf[c]
        vals = _ts_column_strings(s)
        if vals is None:
            vals = s.tolist()
            if s.isna().any():
                vals = [None if pd.isna(v) else v for v in vals]
        columns.append(vals)
    return columns


def _ts_column_strings(s: pd.Series) -> list | None:
    """Vectorized isoformat for tz-naive datetime columns, or None when
    the slow path must handle the column.

    ``tolist()`` turns a datetime64 column into pd.Timestamp objects
    that ``canonical_dumps`` then routes one-by-one through the Python
    ``default=`` callback (``_canonical_default`` → ``isoformat()``) —
    measured ~3.3 µs/record of the payload build, the single biggest
    Python cost. Stringifying the whole column through numpy instead
    (one C call + one vectorized strip) is byte-identical for every
    value the fast path accepts:

    * ``datetime64[s|ms|us]`` str() is ``YYYY-MM-DDTHH:MM:SS[.ffffff]``
      with a fixed-width fraction; ``isoformat()`` prints the same but
      OMITS an all-zero fraction, so zero-microsecond columns cast to
      ``[s]`` (no fraction at all) and mixed columns strip ``.000000``.
    * tz-aware columns (offset suffix) and ns-precision values
      (isoformat prints 9 digits) fall back to the per-value path.
    """
    if not str(s.dtype).startswith("datetime64"):
        return None
    if getattr(s.dt, "tz", None) is not None:
        return None
    if str(s.dtype) == "datetime64[ns]" and bool((s.dt.nanosecond > 0).any()):
        return None
    isna = s.isna()
    if not bool((s.dt.microsecond > 0).any()):
        arr = s.values.astype("datetime64[s]").astype(str)
        vals = arr.tolist()
    else:
        arr = s.values.astype("datetime64[us]").astype(str)
        vals = (
            pd.Series(arr).str.replace(r"\.000000$", "", regex=True).tolist()
        )
    if bool(isna.any()):
        vals = [None if m else v for v, m in zip(vals, isna.tolist())]
    return vals


def _chunk_payloads_local(
    pending: DataFrame, record_cols: list[str], order_cols: list[str]
) -> DataFrame:
    """Payload builder for BYTE-mode chunks: the caller hash-partitions
    ``pending`` by ``chunk_number`` (see ``ingest``), so every chunk's
    rows are co-located in one task and payloads build in place (AQE
    may merge whole partitions, which preserves the property; resume
    filters drop rows, never split a chunk across tasks). Any violation
    of the co-location assumption would surface as a CV3 checksum NACK
    at delivery, not silent corruption.
    """

    def run(batches):
        bufs: dict[int, list[pd.DataFrame]] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            for c, g in pdf.groupby(CHUNK_COL, sort=False):
                bufs.setdefault(int(c), []).append(g)
        out = []
        for c, frames in sorted(bufs.items()):
            g = pd.concat(frames) if len(frames) > 1 else frames[0]
            g = g.sort_values(order_cols, kind="mergesort")
            columns = _record_columns(g, record_cols)
            records = [dict(zip(record_cols, row)) for row in zip(*columns)]
            blob = canonical_dumps(records)
            out.append(
                (c, len(records), hashlib.sha256(blob).hexdigest(), blob)
            )
        if out:
            yield pd.DataFrame(
                out, columns=[CHUNK_COL, "n_records", "checksum", "payload"]
            )

    return pending.mapInPandas(
        run,
        schema=f"{CHUNK_COL} long, n_records long, checksum string, payload binary",
    )


def _chunk_payloads_fused(
    pending: DataFrame,
    record_cols: list[str],
    rn_col: str,
    chunk_size: int,
    n_rows: int,
    n_parts: int,
) -> DataFrame:
    """Shuffle-light payload builder for COUNT-mode chunks.

    Chunk membership is a closed formula of the global row number
    (rows ``[c·size+1, min((c+1)·size, n_rows)]``), so a task that
    holds ALL of a chunk's rows serializes + hashes it locally in the
    ordering stage itself — the full-record shuffle of the groupBy
    path disappears. Only chunks straddling a partition border (≤ 2
    per task) emit fragments: per-row canonical JSON, merged in the
    drain's range-partition pass (which the delivery layout needed
    anyway, and which co-locates a chunk's fragments by construction).
    ``canonical_dumps`` of a list is exactly ``[`` + ``,``-joined
    element dumps + ``]`` (compact separators, both orjson and the
    stdlib fallback), so fragment concatenation is byte-identical to
    whole-chunk serialization — the consumer's CV3 re-hash verifies
    this on every delivery.

    At 100 TB each record crosses the network ONCE (the ordering
    exchange) plus its finished payload bytes once (the drain layout
    exchange), instead of twice + payload. Partial chunks from resume
    filters route through the fragment path automatically (their
    in-task count never matches the formula). Returns payloads already
    range-partitioned and sorted by chunk — the drain consumes them
    directly.
    """

    out_cols = [CHUNK_COL, "n_records", "checksum", "payload", "complete", "first_rn"]
    out_schema = (
        f"{CHUNK_COL} long, n_records long, checksum string, payload binary, "
        "complete boolean, first_rn long"
    )

    def expected(c: int) -> int:
        hi = min((c + 1) * chunk_size, n_rows)
        return hi - c * chunk_size

    # open_chunks: c -> list of (rn_list, records) slices seen so far
    # in THIS task. NOTE the range-id exchange is a HASH partitioning,
    # so one task can hold several NON-adjacent rn ranges: fragment
    # emission must split on rn discontinuities, or the driver-side
    # first_rn merge would interleave two tasks' runs out of order.
    def emit_complete(c: int, buf: list[tuple[list[int], list[dict]]]):
        pairs = sorted(
            (rn, r) for rns, recs in buf for rn, r in zip(rns, recs)
        )
        records = [r for _, r in pairs]
        # one list-level canonical_dumps per chunk (orjson per-call
        # overhead × rows would dominate — measured 15% slower)
        blob = canonical_dumps(records)
        return (
            c, len(records), hashlib.sha256(blob).hexdigest(), blob,
            True, pairs[0][0],
        )

    def emit_fragments(c: int, buf: list[tuple[list[int], list[dict]]]):
        pairs = sorted(
            (rn, r) for rns, recs in buf for rn, r in zip(rns, recs)
        )
        out = []
        run_start = 0
        for i in range(1, len(pairs) + 1):
            if i == len(pairs) or pairs[i][0] != pairs[i - 1][0] + 1:
                run = pairs[run_start:i]
                body = b",".join(canonical_dumps(r) for _, r in run)
                out.append((c, len(run), None, body, False, run[0][0]))
                run_start = i
        return out

    def run(batches):
        open_chunks: dict[int, list[tuple[list[int], list[dict]]]] = {}
        counts: dict[int, int] = {}
        for pdf in batches:
            if pdf.empty:
                continue
            done = []
            # vectorized per (batch × chunk) group — the per-row Python
            # loop variant measured ~70% slower at sf0.1
            for c, g in pdf.groupby(CHUNK_COL, sort=False):
                c = int(c)
                g = g.sort_values(rn_col, kind="mergesort")
                columns = _record_columns(g, record_cols)
                recs = [dict(zip(record_cols, row)) for row in zip(*columns)]
                buf = open_chunks.setdefault(c, [])
                buf.append((g[rn_col].tolist(), recs))
                counts[c] = counts.get(c, 0) + len(recs)
                if counts[c] == expected(c):
                    done.append(emit_complete(c, buf))
                    del open_chunks[c], counts[c]
            if done:
                yield pd.DataFrame(done, columns=out_cols)
        if open_chunks:
            tail = [
                row
                for c, buf in sorted(open_chunks.items())
                for row in emit_fragments(c, buf)
            ]
            yield pd.DataFrame(tail, columns=out_cols)

    local = pending.mapInPandas(run, schema=out_schema)

    # Drain layout doubles as the fragment co-locator: ascending chunk
    # partitions give the order the sequential emit requires AND put a
    # chunk's fragments side by side; the (rare) fragment rows are
    # merged on the driver inside deliver_payloads, so complete
    # payloads never re-enter Python after serialization. (An
    # executor-side merge stage was measured ~10% slower end-to-end —
    # it Arrow-round-trips every payload byte once more; a where/union
    # split would recompute the serialize pass per branch.) The layout
    # is the closed-formula sentinel exchange, NOT repartitionByRange:
    # RangePartitioner's sampling pass re-executed this entire fused
    # stage once per ingest just to read chunk numbers (round-8 stage
    # profile — the discarded pass cost more CPU than the kept one).
    n_chunks = -(-n_rows // chunk_size)
    return ascending_chunk_layout(
        local, n_chunks, n_parts, sort_cols=(CHUNK_COL, "first_rn")
    )


def _merge_fragment_rows(rows):
    """Driver-side merge of consecutive fragment rows (complete=false)
    emitted by _chunk_payloads_fused; complete rows pass through.
    O(straddling chunks) work — a few sha256 calls per ingestion."""
    frag_c = None
    frag_n = 0
    frag_bodies: list[bytes] = []

    def flush():
        nonlocal frag_c, frag_n, frag_bodies
        if frag_c is None:
            return []
        blob = b"[" + b",".join(frag_bodies) + b"]"
        out = {
            CHUNK_COL: frag_c,
            "n_records": frag_n,
            "checksum": hashlib.sha256(blob).hexdigest(),
            "payload": blob,
        }
        frag_c, frag_n, frag_bodies = None, 0, []
        return [out]

    for row in rows:
        if row["complete"]:
            yield from flush()
            yield row
        else:
            c = row[CHUNK_COL]
            if frag_c is not None and frag_c != c:
                yield from flush()
            frag_c = c
            frag_n += row["n_records"]
            frag_bodies.append(bytes(row["payload"]))
    yield from flush()


# fsspec scheme (what reference users send, json_reader.py:42 via
# fsspec.get_fs_token_paths) → the Hadoop-FS connector scheme Spark's
# JVM readers dispatch on. Identity for schemes both sides share
# (gs://, file://, hdfs://, and the already-Hadoop forms).
_SCHEME_MAP = {
    "s3": "s3a",  # fsspec/s3fs form → hadoop-aws connector
    "s3n": "s3a",  # legacy hadoop scheme, long removed upstream
    "gcs": "gs",  # fsspec/gcsfs alias → GCS connector canonical form
    "az": "abfss",  # fsspec/adlfs Gen2 form → ABFS secure connector
    "abfs": "abfss",
}


def normalize_uri(path: str) -> str:
    """Rewrite an fsspec-style object-store URI to the Hadoop-FS scheme
    the JVM readers dispatch on (``s3://`` → ``s3a://`` etc.). The
    reference accepts fsspec forms (``fsspec.get_fs_token_paths``,
    json_reader.py:42); Spark's readers want connector schemes — this
    keeps reference-shaped requests working unchanged. Scheme-less
    local paths and already-canonical URIs pass through untouched."""
    scheme, sep, rest = path.partition("://")
    if not sep:
        return path
    # Fallback lowercases too: downstream dispatch (_CONNECTOR_CLASS,
    # is_object_uri) matches schemes case-insensitively, so a literal
    # `WASB://` must normalize to `wasb://` or the connector lookup
    # KeyErrors instead of taking the Python-source fallback.
    return _SCHEME_MAP.get(scheme.lower(), scheme.lower()) + "://" + rest


# Post-normalize_uri connector scheme → the Hadoop FS class whose
# presence on the JVM classpath means the JVM reader can take the URI
# directly; absent, json-array requests fall back to the Python
# streaming source (object_store.py).
_CONNECTOR_CLASS = {
    "s3a": "org.apache.hadoop.fs.s3a.S3AFileSystem",
    "gs": "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem",
    "abfss": "org.apache.hadoop.fs.azurebfs.SecureAzureBlobFileSystem",
    "wasb": "org.apache.hadoop.fs.azure.NativeAzureFileSystem",
    "wasbs": "org.apache.hadoop.fs.azure.NativeAzureFileSystem$Secure",
}


def _jvm_has_class(spark: SparkSession, cls: str) -> bool:
    """True iff the JVM can load ``cls`` — how the json dispatch
    detects whether the hadoop-aws s3a connector is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(cls)
        return True
    except Exception:
        return False


def load_source(spark: SparkSession, request: IngestRequest) -> DataFrame:
    """O1 file-type dispatch (`ingestion_controllers.py:45-59`), minus
    the HTTP shell: each validated file_type maps to a source connector.

    Multi-cloud (the reference's fsspec s3fs/gcsfs/adlfs behavior,
    requirements.txt:1,26,27,68), the Hadoop-FS way:

    * JVM readers (parquet/csv/jsonl and the multiLine json path)
      accept any Hadoop-FS URI directly — ``file://``, ``s3a://``,
      ``gs://``, ``abfss://``. S3 recipe::

          spark-submit --packages org.apache.hadoop:hadoop-aws:3.4.1
          spark.conf: spark.hadoop.fs.s3a.aws.credentials.provider =
              org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider
            spark.hadoop.fs.s3a.access.key / .secret.key (or the
            DefaultAWSCredentialsProviderChain / IRSA on EKS)
          file_path = "s3a://bucket/exports/products_*.json"

    * The Python-side streaming readers (giant-array ``json_array``
      files, xlsx) use stdlib IO: ``file://`` URIs resolve locally;
      ``s3://`` / ``gs://`` / ``az://`` objects stream through
      sources/object_store.py (the matching fsspec package when
      installed, else anonymous GET against the standard per-cloud
      endpoint variable — AWS_ENDPOINT_URL_S3, STORAGE_EMULATOR_HOST,
      AZURE_STORAGE_CONNECTION_STRING — each tested end-to-end
      against an in-process HTTP stub). When the JVM lacks the
      matching connector class (_CONNECTOR_CLASS), object-store
      JSON-array requests fall back to that Python streaming source
      automatically.
    """
    from .sources import read_excel, read_json_array
    from .sources.object_store import is_object_uri

    ft = request.file_type
    path = normalize_uri(request.file_path)
    if ft == "json":
        if is_object_uri(path) and not _jvm_has_class(
            spark, _CONNECTOR_CLASS[path.partition("://")[0].lower()]
        ):
            from .sources.json_source import read_json_array_streaming

            values = read_json_array_streaming(spark, request.file_path)
            # Dataset[String] JSON entry: full-scan schema inference +
            # parse — the same two-pass semantics (and cost) as the JVM
            # multiLine reader. The RDD hop is this connector edge only,
            # never a registered-query operator.
            return spark.read.json(values.rdd.map(lambda r: r[0]))
        return read_json_array(spark, path)
    if ft == "excel":
        return read_excel(spark, path)
    if ft == "jsonl":
        return spark.read.json(path)
    if ft == "csv":
        return spark.read.option("header", "true").csv(path)
    if ft == "xml":
        # Spark 4 native XML source (the spark-xml package merged
        # upstream); rowTag follows the reference's record-per-element
        # JSON-array convention.
        return spark.read.format("xml").option("rowTag", "row").load(path)
    return spark.read.parquet(path)


def run_ingestion(
    spark: SparkSession,
    request: IngestRequest,
    state: IngestionStateStore,
    transport: Transport,
) -> IngestSummary:
    """Controller entry: load by file_type, then run the chunked,
    ACK-gated delivery to completion. (The reference replies STARTED
    and runs this in a background task — async dispatch is an HTTP-app
    concern, orthogonal to the engine.)"""
    return ingest(spark, request, load_source(spark, request), state, transport)


def deliver_payloads(
    payloads: DataFrame,
    ingestion_id: str,
    state: IngestionStateStore,
    transport: Transport,
    total_records: int,
    mark_last: bool,
    merge_fragments: bool = False,
) -> tuple[int, int]:
    """Ordered, ACK-gated emit of prepared chunk payloads (K1–K3).

    Sequential per contract (CV2); the expensive work already happened
    in executors. ``mark_last`` sets ``is_last=True`` on the final
    chunk (batch mode knows the end; streaming batches pass False and
    rely on the completion event). ``merge_fragments`` enables the
    driver-side fragment merge for the fused count-mode payload stream.
    Returns (chunks_sent, total_records).
    """
    chunks_sent = 0

    def build_payload(row, is_last: bool) -> dict:
        # The executor-serialized canonical blob passes through as-is;
        # parsing it is consumer-side work (an HTTP consumer parses the
        # POST body), so the sequential driver edge stays O(bytes-copy)
        # per chunk instead of O(parse + re-serialize).
        return {
            "ingestion_id": ingestion_id,
            "chunk_number": row[CHUNK_COL],
            "chunk_id": build_chunk_id(ingestion_id, row[CHUNK_COL]),
            "checksum": row["checksum"],
            "records_json": row["payload"],
            "is_last": is_last,
        }

    def flush(row, is_last: bool):
        nonlocal chunks_sent, total_records
        payload = build_payload(row, is_last)
        send_chunk_with_retry(transport, payload)  # raises after 3 NACKs
        total_records += row["n_records"]
        # K2: ACK-gated offset commit — no false progress.
        state.update_chunk(ingestion_id, row[CHUNK_COL], total_records)
        chunks_sent += 1

    rows = payloads.toLocalIterator(prefetchPartitions=True)
    if merge_fragments:
        rows = _merge_fragment_rows(rows)
    window = int(getattr(transport, "pipeline_window", 0) or 0)
    if window > 1 and hasattr(transport, "submit"):
        return _deliver_pipelined(
            rows,
            build_payload,
            transport,
            state,
            ingestion_id,
            total_records,
            mark_last,
            window,
        )
    prev = None
    for row in rows:
        if prev is not None:
            flush(prev, is_last=False)
        prev = row
    if prev is not None:
        flush(prev, is_last=mark_last)
    return chunks_sent, total_records


def _deliver_pipelined(
    rows,
    build_payload,
    transport,
    state,
    ingestion_id: str,
    total_records: int,
    mark_last: bool,
    window: int,
) -> tuple[int, int]:
    """Windowed variant of the ordered emit for consumers that expose
    ``submit``/``resolve`` (PipelinedChunkValidator): up to ``window``
    chunks are in flight so the consumer's pool overlaps their CV3
    precompute, while COMMITS — resolve(), K2 state update — happen
    strictly in submission order, one at a time, exactly like the
    synchronous loop. A NACK at chunk i discards everything in flight
    behind it (nothing was committed), retries i through the bounded
    synchronous path (the remaining MAX_ATTEMPTS-1 attempts), then
    resubmits the discarded chunks in order — so failure semantics,
    retry counts, and no-false-progress match the synchronous loop."""
    from collections import deque

    from .sink import MAX_ATTEMPTS, ChunkRejected

    inflight: deque = deque()
    chunks_sent = 0

    def commit_one():
        nonlocal chunks_sent, total_records
        row, payload, handle = inflight.popleft()
        resp = transport.resolve(handle)
        if not resp.ack:
            # pipeline flush: later in-flight chunks were never
            # committed; recover this chunk synchronously, then
            # resubmit the flushed tail in order
            pending = [(r, p) for r, p, _ in inflight]
            inflight.clear()
            for _attempt in range(MAX_ATTEMPTS - 1):
                resp = transport(payload)
                if resp.ack:
                    break
            if not resp.ack:
                raise ChunkRejected(
                    f"chunk {payload.get('chunk_number')} rejected after "
                    f"{MAX_ATTEMPTS} attempts: {resp.error}"
                )
            for r, p in pending:
                inflight.append((r, p, transport.submit(p)))
        total_records += row["n_records"]
        state.update_chunk(ingestion_id, payload["chunk_number"], total_records)
        chunks_sent += 1

    def enqueue(row, is_last: bool):
        payload = build_payload(row, is_last)
        inflight.append((row, payload, transport.submit(payload)))

    prev = None
    for row in rows:
        if prev is not None:
            enqueue(prev, is_last=False)
            if len(inflight) >= window:
                commit_one()
        prev = row
    if prev is not None:
        enqueue(prev, is_last=mark_last)
    while inflight:
        commit_one()
    return chunks_sent, total_records


@dataclass
class IngestSummary:
    ingestion_id: str
    chunks_sent: int
    total_records: int
    last_chunk: int
    status: str


_RESUME_RN = "__resume_rn"

# Drain-layout granularity: chunks per toLocalIterator partition (one
# drain job each). See the sizing comment at the layout site in ingest().
CHUNKS_PER_DRAIN_PART = 16


def _chunked(
    df: DataFrame,
    request: IngestRequest,
    order_cols: list[str],
    stats_out: dict | None = None,
) -> DataFrame:
    # Count mode always keeps the row number: the fused payload builder
    # and record-level resume both key off it. Byte mode needs it only
    # for record-level resume.
    rn_col = _RESUME_RN if request.record_resume else None
    if request.chunk_size_by_records is not None:
        return assign_chunks_by_count(
            df,
            order_cols,
            request.chunk_size_by_records,
            stats_out=stats_out,
            rn_col=_RESUME_RN,
        )
    return assign_chunks_by_bytes(
        df,
        order_cols,
        request.chunk_size_by_memory,
        stats_out=stats_out,
        rn_col=rn_col,
    )


_MAX_BYTES_KEY = "spark.sql.execution.arrow.maxBytesPerBatch"
_MAX_RECS_KEY = "spark.sql.execution.arrow.maxRecordsPerBatch"
_ARROW_CONF_LOCK = threading.Lock()
_ARROW_CONF_STATE: dict = {}


@contextmanager
def _ingest_arrow_conf(spark: SparkSession, request: IngestRequest):
    """Arrow-input tuning for the count-mode drain window.

    Spark's JVM→Python Arrow writer enforces
    ``spark.sql.execution.arrow.maxBytesPerBatch`` by calling
    ``ArrowWriter.sizeInBytes()`` — a recursive walk of every vector's
    buffers — after EVERY row (BatchedPythonArrowInput), the hottest
    JVM path of the payload-build stage in a JFR profile (~3 core-s per
    sf0.1 ingest, linear in rows). The Int.MaxValue sentinel disables
    the walk entirely. That trade is safe HERE because count-mode
    batches are simultaneously re-capped to the chunk size, so a batch
    is never bigger than one chunk payload — memory the drain
    materializes per chunk anyway. It would NOT be safe globally:
    blob-heavy stages (multimodal) rely on the byte cap. Byte-mode
    ingests keep the default cap too (records there may be large — the
    byte budget, not a record count, is the contract).

    Runtime confs are read per-execution, so the try/finally window
    covers exactly this ingestion's drain jobs. Concurrent ingestions
    reference-count the window (module lock) — BOTH modes register, so
    the byte-cap sentinel is only ever set while NO byte-mode drain is
    active in the session (a byte-mode ingest sharing the window would
    otherwise silently lose the cap it relies on). The sentinel is
    applied by the first count-mode drain in, dropped the moment a
    byte-mode drain enters, re-applied when the last byte-mode drain
    leaves, and fully restored by the last drain out. The record cap
    uses the SMALLEST active chunk size — caps only tighten, never
    loosen, under concurrency.
    """
    conf = spark.conf
    mode = "count" if request.chunk_size_by_records is not None else "byte"
    with _ARROW_CONF_LOCK:
        st = _ARROW_CONF_STATE
        if not st:
            old = {}
            for k in (_MAX_BYTES_KEY, _MAX_RECS_KEY):
                try:
                    old[k] = conf.get(k)
                except Exception:
                    old[k] = None
            st.update(saved=old, count=0, byte=0, cap=None)
        st[mode] += 1
        if mode == "count":
            cap = min(10_000, request.chunk_size_by_records)
            if st["cap"] is None or cap < st["cap"]:
                st["cap"] = cap
        _arrow_conf_sync(conf, st)
    try:
        yield
    finally:
        with _ARROW_CONF_LOCK:
            st = _ARROW_CONF_STATE
            st[mode] -= 1
            if st["count"] == 0 and st["byte"] == 0:
                for k, v in st["saved"].items():
                    if v is None:
                        conf.unset(k)
                    else:
                        conf.set(k, v)
                st.clear()
            else:
                _arrow_conf_sync(conf, st)


def _arrow_conf_sync(conf, st: dict) -> None:
    """Reconcile the Arrow batch caps with the active-drain census.

    Called with ``_ARROW_CONF_LOCK`` held and ``st`` initialized. The
    byte-size sentinel is safe only while every active drain is
    count-mode (each batch then re-capped to a chunk's record count);
    one byte-mode entrant and the saved cap comes straight back.
    """

    def _restore(key: str) -> None:
        v = st["saved"][key]
        if v is None:
            conf.unset(key)
        else:
            conf.set(key, v)

    if st["count"] > 0 and st["byte"] == 0:
        conf.set(_MAX_BYTES_KEY, "2147483647")
    else:
        _restore(_MAX_BYTES_KEY)
    if st["count"] > 0:
        conf.set(_MAX_RECS_KEY, str(st["cap"]))
    else:
        _restore(_MAX_RECS_KEY)


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
    chunk_stats: dict = {}
    chunked = _chunked(df, request, order_cols, stats_out=chunk_stats)
    if request.record_resume:
        # Record-level resume (reference excel_reader.py:65-69): skip
        # individual already-counted records, so a partially-delivered
        # chunk is re-sent with only its unacked remainder. Chunk
        # numbering is untouched — assignment is deterministic, and the
        # consumer's running count continues exactly where it stopped.
        pending = chunked.where(F.col(_RESUME_RN) > total_records)
    else:
        # K3: skip already-ACKed chunks — a pushed-down predicate, so
        # re-runs never recompute completed work.
        pending = chunked.where(F.col(CHUNK_COL) > last_chunk)
    # Canonicalization + checksumming run IN EXECUTORS (one Arrow group
    # per chunk), in parallel across all cores; the driver only streams
    # the finished payloads in chunk order and performs the (contract-
    # mandated sequential, CV2) network emit. Payload bytes are the
    # canonical JSON the consumer re-hashes, so producer and consumer
    # share one canonicalizer end to end.
    if request.chunk_size_by_records is not None:
        # Count mode: fused builder — complete chunks serialize in the
        # task that already holds their rows; the only remaining
        # exchange is the drain-layout one, which also merges
        # partition-border fragments. Output is already range-
        # partitioned and chunk-sorted for the sequential emit.
        est_chunks = -(-chunk_stats["n_rows"] // request.chunk_size_by_records)
        n_parts = max(2, min(256, -(-est_chunks // CHUNKS_PER_DRAIN_PART)))
        payloads = _chunk_payloads_fused(
            pending,
            record_cols,
            _RESUME_RN,
            request.chunk_size_by_records,
            chunk_stats["n_rows"],
            n_parts,
        )
    else:
        # Byte mode: one hash exchange on chunk_number co-locates each
        # chunk's rows (the v2 byte chunker no longer shuffles by epoch
        # itself — its assignment pass is a broadcast probe), then
        # payloads build in place.
        drop = [_RESUME_RN] if request.record_resume else []
        payloads = _chunk_payloads_local(
            pending.drop(*drop).repartition(F.col(CHUNK_COL)),
            record_cols,
            order_cols,
        )
    # Drain layout: toLocalIterator schedules ONE job per partition —
    # smaller partitions mean each drain job computes LESS before the
    # sequential emit can start, pipelining compute under the emit, but
    # each job pays scheduling overhead. ~16 chunks/partition is the
    # measured optimum (quiet-machine interleaved A/B at sf0.1, medians:
    # 64/part 161k, 16/part 178k, 8/part 176k, 4/part 164k rec/s — the
    # original ~64 sizing dated from when every drain job re-evaluated a
    # Python-RDD offsets broadcast, since fixed). Ascending partitions
    # keep global order for the sequential emit, bound driver memory per
    # prefetched partition (16 × payload cap), and scale the job count
    # with the data up to the 256 cap. The exchange is the
    # closed-formula sentinel layout (chunker.ascending_chunk_layout),
    # not repartitionByRange — RangePartitioner's sampling pass would
    # re-execute the payload build once per ingest. NOTE coalesce()
    # would NOT preserve order here — under AQE it merges
    # non-consecutive shuffle partitions.
    # Chunk-count estimates fall out of the chunker's own counts pass
    # (stats_out) — no extra count() job over the source, which for
    # JSON/CSV/Excel ingests would be a second full parse pass. The
    # fused count-mode path already produced this layout.
    if request.chunk_size_by_records is None:
        est_chunks = chunk_stats["n_chunks"]
        n_parts = max(2, min(256, -(-est_chunks // CHUNKS_PER_DRAIN_PART)))
        payloads = ascending_chunk_layout(payloads, est_chunks, n_parts)
    # NOTE a background persist+count "warm" of the payload frame was
    # A/B'd here (round 7) and removed: the drain's FIRST job already
    # executes the full upstream (scan + ordering exchange + fused
    # canonicalization map stage) before its single reduce task, so
    # every partition's expensive work is parallel and complete by the
    # first row — the background materialization only duplicated it
    # (interleaved A/B at sf0.1: statistically flat, 5.2-5.8 s both).
    with _ingest_arrow_conf(spark, request):
        chunks_sent, total_records = deliver_payloads(
            payloads,
            ingestion_id,
            state,
            transport,
            total_records,
            mark_last=True,
            merge_fragments=request.chunk_size_by_records is not None,
        )

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


def warm_ingest(
    spark: SparkSession,
    like: DataFrame | None = None,
    like_order_cols: tuple[str, ...] | None = None,
    like_rows: int = 32768,
) -> None:
    """One-time session warm-up: run miniature ingestions through the
    exact plan shapes of ``ingest()`` — deterministic-pid sampling,
    global-row-number window, Arrow ``mapInPandas`` serialization,
    broadcast offset join, ordered ``toLocalIterator`` drain, state
    snapshot — so the FIRST real ingestion does not pay Python-worker
    pool spin-up, Arrow path initialization, and whole-stage-codegen
    JIT on top of its own work.

    Sized to actually reach the JVM's hot-compile thresholds: a 64-row
    pass loads the codegen classes but leaves every generated loop
    interpreted, which made the first full-size ingestion ~3× steady
    state. ~50k JVM-generated rows (`spark.range`, no driver transfer)
    through BOTH chunk modes push the window/serialize/probe loops
    into C2, after which the first real request runs near steady
    state. A long-running ingestion service calls this once at boot;
    the cost is paid off on the first request.

    ``like`` (optional) additionally warms the EXACT plan of an
    expected source: whole-stage codegen is generated per plan schema
    and Spark's compile cache is keyed on the generated source, so a
    mini count-mode ingest over a ``like_rows`` parquet slice of the
    real table lets the first full-size request reuse the compiled
    classes instead of paying Janino + interpreter warm-up on its own
    rows. Pass the request's ``order_cols`` via ``like_order_cols``."""
    import shutil
    import tempfile

    from .sink import ChunkValidator
    from .state import IngestionStateStore

    df = (
        spark.range(24576)
        .withColumn("k", F.col("id"))
        .withColumn("v", F.concat(F.lit("w"), F.col("id").cast("string")))
        .withColumn("x", F.col("id") * 1.5)
        .drop("id")
    )
    count_req = IngestRequest(
        file_path="warmup://count",
        file_type="parquet",
        chunk_size_by_records=4000,
        re_ingestion=True,
        order_cols=("k", "v"),
    )
    byte_req = IngestRequest(
        file_path="warmup://bytes",
        file_type="parquet",
        chunk_size_by_memory=256 * 1024,
        re_ingestion=True,
        order_cols=("k", "v"),
    )
    for req in (count_req, byte_req):
        state = IngestionStateStore(tempfile.mktemp(suffix=".parquet"))
        ingest(spark, req, df, state, ChunkValidator())
    if like is None:
        return
    mini_dir = tempfile.mkdtemp(prefix="warm_like_")
    mini_path = f"{mini_dir}/slice.parquet"
    try:
        like.limit(like_rows).write.mode("overwrite").parquet(mini_path)
        like_req = IngestRequest(
            file_path=mini_path,
            file_type="parquet",
            chunk_size_by_records=4000,
            re_ingestion=True,
            order_cols=tuple(like_order_cols or like.columns[:1]),
        )
        ingest(
            spark,
            like_req,
            spark.read.parquet(mini_path),
            IngestionStateStore(tempfile.mktemp(suffix=".parquet")),
            ChunkValidator(),
        )
    finally:
        shutil.rmtree(mini_dir, ignore_errors=True)
