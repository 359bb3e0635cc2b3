"""Ordered, ACK-gated chunk sink + consumer-side validator.

Producer side (reference K1–K4, `app/services/json_reader.py:138-196`):
POST-shaped payloads ``{ingestion_id, chunk_number, chunk_id, checksum,
records, is_last}``, up to 3 attempts per chunk, transport success is
NOT enough — the business-level ``ack`` must be True; offsets commit
only after ACK; completion event marked only after consumer ACK.

Consumer side (the Pimcore-mock contract our sink must satisfy,
`tests/pim_core_mock_test/services/chunk_data_integrity_validator.py:27-60`
and `tests/pim_core_mock_test/pim_core_mock_test.py:25-96`):
* CV1 duplicate chunk_id → ACK without reprocessing (idempotency)
* CV2 chunk_number != last+1 → NACK "Out-of-order chunk"
* CV3 checksum mismatch → NACK "Checksum mismatch"
* CV4 empty records → NACK "Empty chunk"
* CV5 completion event resets + ACKs

Transports are pluggable: the in-process validator for tests/bench, or
any callable(payload) -> AckResponse (an HTTP POST in production).
Ordering (CV2) makes the *send* inherently sequential per ingestion —
compute parallelizes, the emit loop does not (SURVEY §4.3.2); many
ingestions parallelize across each other.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from .integrity import compute_checksum

try:
    # The reference's consumer parses chunk bodies with orjson (its
    # DataIntegrityManager serializer); match its C-parser speed on the
    # sequential validation edge (~4x stdlib on 4000-record chunks).
    from orjson import loads as _loads
except ImportError:  # pragma: no cover - orjson is present in this env
    from json import loads as _loads

ERR_OUT_OF_ORDER = "Out-of-order chunk"
ERR_CHECKSUM = "Checksum mismatch"
ERR_EMPTY = "Empty chunk"

MAX_ATTEMPTS = 3  # json_reader.py:163


@dataclass
class AckResponse:
    ack: bool
    ingestion_id: str
    chunk_number: int
    error: str | None = None


class ChunkRejected(RuntimeError):
    """Raised when a chunk is NACKed MAX_ATTEMPTS times (json_reader.py:193-196)."""


@dataclass
class ChunkValidator:
    """In-process consumer double implementing CV1–CV5."""

    processed_chunks: set[str] = field(default_factory=set)
    last_chunk: dict[str, int] = field(default_factory=dict)
    received_chunks: list[int] = field(default_factory=list)
    received_records: list[list[dict]] = field(default_factory=list)
    total_records: dict[str, int] = field(default_factory=dict)
    completed: list[str] = field(default_factory=list)
    # Test hook: chunk numbers to NACK once (fake_pim_core.py reject_chunk).
    reject_once: set[int] = field(default_factory=set)
    # Test-bookkeeping switch: retaining every parsed record lets tests
    # assert on delivered content, but a real consumer processes and
    # releases — benches disable retention so the engine's consumer
    # does the same (contract) work as the reference-equivalent loop's,
    # without paying GC for gigabytes of held dicts the reference
    # consumer wouldn't hold either. Validation (CV1–CV5) is identical
    # either way.
    retain_records: bool = True

    def __call__(self, payload: dict) -> AckResponse:
        iid = payload["ingestion_id"]
        if payload.get("status") == "COMPLETED":
            # CV5 completion accounting (pim_core_mock_test.py:30-48)
            self.completed.append(iid)
            self.last_chunk.pop(iid, None)
            self.total_records.pop(iid, None)
            return AckResponse(True, iid, payload.get("chunk_number", -1))

        n = payload["chunk_number"]
        if n in self.reject_once:
            self.reject_once.discard(n)
            return AckResponse(False, iid, n, "SIMULATED_FAILURE")
        # The wire carries the records as serialized JSON (records_json);
        # parsing is CONSUMER work, exactly as an HTTP consumer parses
        # the POST body. Dict payloads (tests) pass records directly.
        records = payload.get("records")
        if records is None and payload.get("records_json") is not None:
            records = _loads(payload["records_json"])
        if not records:
            return AckResponse(False, iid, n, ERR_EMPTY)  # CV4
        if payload["chunk_id"] in self.processed_chunks:
            return AckResponse(True, iid, n)  # CV1 idempotent replay
        if n != self.last_chunk.get(iid, -1) + 1:
            return AckResponse(False, iid, n, ERR_OUT_OF_ORDER)  # CV2
        if compute_checksum(records) != payload["checksum"]:
            return AckResponse(False, iid, n, ERR_CHECKSUM)  # CV3
        self.processed_chunks.add(payload["chunk_id"])
        self.last_chunk[iid] = n
        self.received_chunks.append(n)
        if self.retain_records:
            self.received_records.append(records)
        self.total_records[iid] = self.total_records.get(iid, 0) + len(records)
        return AckResponse(True, iid, n)


def _precompute_chunk(records_json, retain: bool):
    """The pure (state-free) part of chunk validation — orjson parse +
    canonical re-dump + sha256 — extracted so a process pool can run it
    for several in-flight chunks at once. Returns (n_records, computed
    checksum, records-or-None). Module-level for pickling."""
    records = _loads(records_json)
    if not records:
        return 0, "", None
    return (
        len(records),
        compute_checksum(records),
        records if retain else None,
    )


@dataclass
class _PipelineHandle:
    payload: dict
    future: object | None  # None → resolve() takes the synchronous path


class PipelinedChunkValidator(ChunkValidator):
    """CV1–CV5-identical consumer whose EXPENSIVE validation step (the
    CV3 parse + canonical re-dump + sha256) runs in a small process
    pool over a window of in-flight chunks, while every state mutation
    — the actual CV1/CV2/CV4/CV5 bookkeeping and the CV3 verdict —
    happens strictly in submission order on the committing caller's
    thread (``resolve`` is called in-order by the windowed producer
    loop in ``pipeline.deliver_payloads``).

    This is consumer-side design headroom, not a contract change: CV2
    orders COMMITS, and commits here are exactly as ordered as the
    synchronous validator's — a NACK at chunk i leaves chunks > i
    uncommitted (their precompute results are discarded without
    touching state). A real deployment shape: the consumer service
    checksums on N cores behind an ordered commit stage, lifting the
    single-thread ~185k rec/s validation ceiling (BASELINE.md) by ~the
    worker count. Synchronous calls (``__call__``) still work — the
    completion handshake, dict test payloads, and the producer's
    bounded retry fallback all use them."""

    def __init__(self, workers: int = 4, window: int | None = None, **kw):
        super().__init__(**kw)
        import multiprocessing
        import os
        from concurrent.futures import ProcessPoolExecutor

        # fork context by DEFAULT — a deliberate trade-off (r10 advice
        # evaluated): forking a driver that hosts py4j/JVM threads
        # risks a child deadlocking on a lock held at fork time
        # (malloc/logging), and fork-with-threads is deprecated toward
        # CPython 3.14. BUT the alternatives are worse as a library
        # default: forkserver and spawn both re-import the caller's
        # __main__ in every worker (spawn.get_preparation_data ships
        # main_path for plain `python script.py` entrypoints), so an
        # unguarded driver script — bench harnesses, notebook exports,
        # the external driver — would re-execute wholesale inside each
        # worker (measured: instant BrokenProcessPool via the bootstrap
        # guard when the caller builds pools/Spark at module level).
        # Exposure is contained instead: workers run ONLY the pure
        # precompute (_precompute_chunk: orjson loads + sha256 — no
        # JVM, py4j, logging, or locks), are spawned eagerly right
        # after pool creation (before heavy driver activity widens the
        # forked-lock window), and a worker death surfaces as
        # BrokenProcessPool on resolve(), which the producer's bounded
        # retry converts into the synchronous fallback path rather
        # than a hang.
        #
        # GUARDED opt-out (r11 verdict item 4): callers whose entry
        # script IS import-guarded (`if __name__ == "__main__":`) can
        # set SPARK_GRAFT_POOL_START_METHOD=forkserver|spawn to drop
        # the fork-with-threads hazard entirely — with forkserver,
        # session.get_spark pre-starts the server BEFORE any JVM/py4j
        # threads exist, so workers fork from a clean template. The
        # same degrade-to-sync containment applies under every method:
        # a mis-set flag on an unguarded script breaks the pool, and
        # delivery falls back to the synchronous path instead of
        # failing the ingestion.
        method = os.environ.get("SPARK_GRAFT_POOL_START_METHOD", "fork")
        self._pool = ProcessPoolExecutor(
            max_workers=workers, mp_context=multiprocessing.get_context(method)
        )
        # eager spawn: worker startup overlaps the producer's scan /
        # first-batch compute instead of the first chunk's latency
        for _ in range(workers):
            self._pool.submit(int)
        self.pipeline_window = window or 2 * workers
        # GC/interp-exit safety net for callers that skip close():
        # cancel pending precomputes instead of blocking atexit on them
        import functools
        import weakref

        self._finalizer = weakref.finalize(
            self,
            functools.partial(
                type(self._pool).shutdown,
                self._pool,
                wait=False,
                cancel_futures=True,
            ),
        )

    def submit(self, payload: dict) -> _PipelineHandle:
        rj = payload.get("records_json")
        if payload.get("status") == "COMPLETED" or rj is None:
            return _PipelineHandle(payload, None)
        try:
            fut = self._pool.submit(_precompute_chunk, rj, self.retain_records)
        except RuntimeError:
            # BrokenProcessPool (a worker died) or pool shut down:
            # degrade to the synchronous path — same validation, no
            # precompute overlap — instead of failing the ingestion
            return _PipelineHandle(payload, None)
        return _PipelineHandle(payload, fut)

    def resolve(self, handle: _PipelineHandle) -> AckResponse:
        """In-order commit of a submitted chunk. MUST be called in
        submission order — the caller's window loop guarantees it."""
        if handle.future is None:
            return self(handle.payload)
        payload = handle.payload
        iid = payload["ingestion_id"]
        n = payload["chunk_number"]
        if n in self.reject_once:
            self.reject_once.discard(n)
            return AckResponse(False, iid, n, "SIMULATED_FAILURE")
        try:
            n_records, computed, records = handle.future.result()
        except Exception:
            # Worker death mid-precompute (BrokenProcessPool): the
            # precompute is PURE, so nothing was lost — revalidate this
            # chunk synchronously (identical CV1–CV5 semantics); later
            # submits see the broken pool and degrade to sync too.
            return self(handle.payload)
        if not n_records:
            return AckResponse(False, iid, n, ERR_EMPTY)  # CV4
        if payload["chunk_id"] in self.processed_chunks:
            return AckResponse(True, iid, n)  # CV1 idempotent replay
        if n != self.last_chunk.get(iid, -1) + 1:
            return AckResponse(False, iid, n, ERR_OUT_OF_ORDER)  # CV2
        if computed != payload["checksum"]:
            return AckResponse(False, iid, n, ERR_CHECKSUM)  # CV3
        self.processed_chunks.add(payload["chunk_id"])
        self.last_chunk[iid] = n
        self.received_chunks.append(n)
        if self.retain_records:
            self.received_records.append(records)
        self.total_records[iid] = self.total_records.get(iid, 0) + n_records
        return AckResponse(True, iid, n)

    def close(self):
        self._finalizer.detach()
        self._pool.shutdown(wait=False, cancel_futures=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


Transport = Callable[[dict], AckResponse]


def send_chunk_with_retry(transport: Transport, payload: dict) -> AckResponse:
    """At-least-once delivery with bounded retry; ACK gate, not HTTP
    status, decides success (json_reader.py:163-196; README:345-362)."""
    last_err = None
    for _attempt in range(MAX_ATTEMPTS):
        resp = transport(payload)
        if resp.ack:
            return resp
        last_err = resp.error
    raise ChunkRejected(
        f"chunk {payload.get('chunk_number')} rejected after "
        f"{MAX_ATTEMPTS} attempts: {last_err}"
    )


class HttpTransport:
    """HTTP callback transport (reference K1 wire behavior): POST the
    chunk payload as JSON to ``callback_url``, 60 s client timeout
    (`app/services/json_reader.py:54`), and treat the business-level
    ``ack`` field of the response body — never the HTTP status — as the
    success signal (README:345-362). Pluggable wherever a Transport is
    accepted; ``send_chunk_with_retry`` supplies the 3-attempt retry
    loop around it.

    stdlib http.client over ONE persistent keep-alive connection (the
    reference's httpx client pools connections the same way,
    `json_reader.py:54`; this container has no httpx): urllib opened a
    fresh TCP connection per chunk, paying connect + teardown syscalls
    and GIL time 1500 times per 10x ingest — measurable drain dilation
    once several ingestions share the driver's GIL. A request that
    fails on a possibly-stale kept-alive socket transparently
    reconnects ONCE before reporting a transport NACK (the normal
    keep-alive race, not a delivery failure).
    """

    TIMEOUT_S = 60  # json_reader.py:54

    def __init__(self, callback_url: str):
        from urllib.parse import urlparse

        self.callback_url = callback_url
        u = urlparse(callback_url)
        if u.scheme not in ("http", "https"):
            raise ValueError(f"unsupported callback scheme: {u.scheme!r}")
        self._https = u.scheme == "https"
        self._host = u.hostname or ""
        self._port = u.port
        self._path = (u.path or "/") + (f"?{u.query}" if u.query else "")
        self._conn = None

    def _connection(self):
        import http.client
        import socket

        if self._conn is None:
            cls = (
                http.client.HTTPSConnection
                if self._https
                else http.client.HTTPConnection
            )
            self._conn = cls(self._host, self._port, timeout=self.TIMEOUT_S)
            # TCP_NODELAY: http.client sends headers and body as
            # separate segments; on a REUSED connection Nagle holds the
            # second until the first is ACKed, colliding with delayed
            # ACK — measured 44.9 ms/chunk vs 3.1 fresh-connection
            # (this is why naive keep-alive read SLOWER than
            # per-request connections).
            self._conn.connect()
            self._conn.sock.setsockopt(
                socket.IPPROTO_TCP, socket.TCP_NODELAY, 1
            )
        return self._conn

    def close(self):
        if self._conn is not None:
            try:
                self._conn.close()
            except Exception:
                pass
            self._conn = None

    def __call__(self, payload: dict) -> AckResponse:
        import json as _json

        if payload.get("records_json") is not None:
            # Records were already serialized in the executors; splice
            # the blob into the body instead of parse→re-serialize on
            # the sequential driver edge. The blob may be str or bytes
            # (the pipeline ships it as Arrow binary).
            head = {
                k: v
                for k, v in payload.items()
                if k not in ("records", "records_json")
            }
            blob = payload["records_json"]
            if isinstance(blob, str):
                blob = blob.encode("utf-8")
            head_json = _json.dumps(head)
            body = (
                head_json[:-1].encode("utf-8") + b',"records":' + bytes(blob) + b"}"
            )
        else:
            body = _json.dumps(payload).encode("utf-8")
        iid = payload.get("ingestion_id", "")
        n = payload.get("chunk_number", -1)
        last_exc = None
        for attempt in (0, 1):  # second try = one reconnect, see class doc
            try:
                # Connect INSIDE the try: a connect-time failure (consumer
                # down or restarting between chunks) must surface as a
                # transport NACK for send_chunk_with_retry's 3-attempt
                # loop, not a raw socket exception — and must not leave
                # self._conn pointing at a never-connected object.
                conn = self._connection()
                conn.request(
                    "POST",
                    self._path,
                    body=body,
                    headers={"Content-Type": "application/json"},
                )
                resp = conn.getresponse()
                data = resp.read()  # must drain to reuse the connection
                break
            except Exception as exc:
                self.close()
                last_exc = exc
        else:
            # transport failure == NACK, retried by send_chunk_with_retry
            return AckResponse(False, iid, n, f"transport error: {last_exc}")
        try:
            parsed = _json.loads(data.decode("utf-8"))
        except Exception as exc:
            return AckResponse(False, iid, n, f"transport error: {exc}")
        return AckResponse(
            ack=bool(parsed.get("ack")),
            ingestion_id=parsed.get("ingestion_id", iid),
            chunk_number=parsed.get("chunk_number", n),
            error=parsed.get("error"),
        )
