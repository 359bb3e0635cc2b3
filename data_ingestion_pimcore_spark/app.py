"""Service layer replicating the reference's HTTP app semantics without
the HTTP shell (no web framework in this container; the wire layer is
one thin adapter away).

Reference parity:
* ``POST /api/ingest`` → ``IngestionService.ingest(payload)``: validate
  (`app/schemas/request_model.py:31-68`; invalid → error response, the
  400 path of `app/main.py:25-33`), derive identity
  (`app/controllers/ingestion_controllers.py:31-41`), dispatch the
  pipeline as a background task and reply ``{"status": "STARTED",
  "ingestion_id": ...}`` immediately
  (`app/controllers/ingestion_controllers.py:45-78`) — the async
  boundary is a thread here, a FastAPI background task there; on a
  cluster it would be a ``StreamingQuery`` handle (O1).
* ``GET /health`` → ``health()`` (`app/main.py:36-41`).
* callback_url resolves the transport: ``http(s)://`` → the real
  ``HttpTransport``; ``inprocess://`` → an injected in-process consumer
  (tests/bench).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from .config import IngestRequest, InvalidRequest
from .pipeline import run_ingestion
from .sink import HttpTransport, Transport
from .state import IngestionStateStore


@dataclass
class _Execution:
    thread: threading.Thread
    error: BaseException | None = None


@dataclass
class IngestionService:
    spark: SparkSession
    state: IngestionStateStore
    # registry for inprocess:// callback urls (tests, bench)
    inprocess_transports: dict[str, Transport] = field(default_factory=dict)
    _running: dict[str, _Execution] = field(default_factory=dict)

    def health(self) -> dict:
        return {"status": "ok"}

    def _resolve_transport(self, callback_url: str) -> Transport:
        if callback_url.startswith(("http://", "https://")):
            return HttpTransport(callback_url)
        t = self.inprocess_transports.get(callback_url)
        if t is None:
            raise InvalidRequest(f"no transport for callback_url {callback_url!r}")
        return t

    def ingest(self, payload: dict) -> dict:
        """Validate → identity → background dispatch → immediate reply."""
        try:
            request = IngestRequest(**payload)
            transport = self._resolve_transport(request.callback_url)
        except InvalidRequest as exc:
            return {"status": "ERROR", "error": str(exc)}
        except TypeError as exc:  # unknown/missing fields
            return {"status": "ERROR", "error": str(exc)}

        from .integrity import build_file_id, build_ingestion_id
        from .state import version_for

        ingestion_id = build_ingestion_id(
            build_file_id(request.file_path, request.file_type),
            version_for(request.re_ingestion),
        )

        def run() -> None:
            from .logging_util import get_logger

            try:
                s = run_ingestion(self.spark, request, self.state, transport)
                get_logger("info").info(
                    f"ingestion {ingestion_id[:12]} {s.status}: "
                    f"{s.chunks_sent} chunks, {s.total_records} records"
                )
            except BaseException as exc:  # recorded, not raised: K1 failure
                self._running[ingestion_id].error = exc
                get_logger("error").error(
                    f"ingestion {ingestion_id[:12]} failed: {exc}"
                )

        t = threading.Thread(target=run, name=f"ingest-{ingestion_id[:12]}", daemon=True)
        self._running[ingestion_id] = _Execution(thread=t)
        t.start()
        return {"status": "STARTED", "ingestion_id": ingestion_id}

    def wait(self, ingestion_id: str, timeout: float | None = None) -> dict:
        """Join a background ingestion and report its terminal state
        (test/ops hook; the reference exposes state only via SQLite)."""
        ex = self._running.get(ingestion_id)
        if ex is None:
            return {"status": "UNKNOWN", "ingestion_id": ingestion_id}
        ex.thread.join(timeout)
        return {
            "status": self.state.get_status(ingestion_id) or "IN_PROGRESS",
            "ingestion_id": ingestion_id,
            "last_chunk": self.state.get_last_chunk(ingestion_id),
            "total_records": self.state.get_total_records(ingestion_id),
            "error": str(ex.error) if ex.error else None,
        }
