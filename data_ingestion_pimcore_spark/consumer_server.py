"""Standalone HTTP consumer process — the reference deployment twin.

The reference producer POSTs each chunk to an EXTERNAL consumer service
(Pimcore; mocked by
`tests/pim_core_mock_test/pim_core_mock_test.py:25-96`) and waits for
the business-level ACK. The consumer's CV1–CV5 validation work
therefore runs in the consumer's own process, not the producer's — the
producer pays only the POST round-trip per chunk. Running N ingestions
against N consumer processes is the reference's parallel unit
(`app/controllers/ingestion_controllers.py:47-51`: one background task
per request), and is what the concurrent-ingestion bench measures.

This module wraps :class:`~.sink.ChunkValidator` (the in-process
contract double) in a stdlib HTTP server:

* ``POST /callback`` — one chunk (or completion event) per request;
  body is the producer's JSON payload with ``records`` spliced in by
  :class:`~.sink.HttpTransport`. Responds ``{ack, ingestion_id,
  chunk_number, error}`` with HTTP 200 even on NACK (the ack FIELD is
  the success signal — reference README:345-362).
* ``GET /stats`` — consumer-side accounting for tests/benches:
  ``{chunks_acked, records_acked, completed}``.

Run standalone (binds 127.0.0.1, ephemeral port, prints ``PORT <n>``):

    python -m data_ingestion_pimcore_spark.consumer_server
"""

from __future__ import annotations

import json
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .sink import ChunkValidator

try:  # reference consumer parses with orjson (DataIntegrityManager)
    from orjson import loads as _loads
except ImportError:  # pragma: no cover - orjson present in this env
    _loads = json.loads


class ConsumerHandler(BaseHTTPRequestHandler):
    """One validator per server: a consumer service instance."""

    # HTTP/1.1 => keep-alive: the producer's HttpTransport holds ONE
    # persistent connection for the whole sequential drain (1500 POSTs
    # per 10x ingest) instead of a TCP handshake per chunk. Responses
    # always carry Content-Length (_reply), which 1.1 requires.
    protocol_version = "HTTP/1.1"
    # TCP_NODELAY on accepted sockets: the unbuffered handler writes
    # status/headers/body as separate sends; server-side Nagle would
    # stall the response tail against the client's delayed ACK.
    disable_nagle_algorithm = True

    validator: ChunkValidator
    # One lock per server subclass (see make_server): do_POST runs on a
    # thread per connection, so the validator's check-then-update CV1/CV2
    # steps and the shared counters must be serialized — two ingestions
    # sharing one consumer is exactly the scenario threading exists for.
    lock = threading.Lock()
    chunks_acked = 0
    records_acked = 0

    def do_POST(self):  # noqa: N802 (stdlib casing)
        body = _loads(self.rfile.read(int(self.headers["Content-Length"])))
        cls = type(self)
        with cls.lock:
            v = cls.validator
            seen_before = len(v.received_chunks)
            resp = v(body)
            # Count only genuinely PROCESSED chunks: a CV1 duplicate
            # replay is ACKed but must not inflate the exactly-once
            # accounting.
            if (
                resp.ack
                and body.get("status") != "COMPLETED"
                and len(v.received_chunks) > seen_before
            ):
                cls.chunks_acked += 1
                cls.records_acked += len(body.get("records") or ())
        self._reply(
            {
                "ack": resp.ack,
                "ingestion_id": resp.ingestion_id,
                "chunk_number": resp.chunk_number,
                "error": resp.error,
            }
        )

    def do_GET(self):  # noqa: N802
        cls = type(self)
        with cls.lock:
            stats = {
                "chunks_acked": cls.chunks_acked,
                "records_acked": cls.records_acked,
                "completed": list(cls.validator.completed),
            }
        self._reply(stats)

    def _reply(self, obj: dict) -> None:
        out = json.dumps(obj).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # quiet
        pass


def make_server(port: int = 0) -> ThreadingHTTPServer:
    """Build a threaded consumer server. The DRAIN is sequential per
    contract CV2 (one in-flight chunk), but keep-alive makes the
    producer hold its connection open between chunks — a single-thread
    server would sit on that idle socket and starve any second client
    (the /stats probe, a second ingestion sharing the consumer), so
    each CONNECTION gets a thread while chunk handling stays
    effectively serial. Fresh handler subclass per server →
    independent validator state per consumer instance."""
    handler = type(
        "Consumer",
        (ConsumerHandler,),
        {"validator": ChunkValidator(retain_records=False), "lock": threading.Lock()},
    )
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler)
    srv.daemon_threads = True
    return srv


def main() -> None:
    srv = make_server()
    print(f"PORT {srv.server_port}", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:  # pragma: no cover
        pass


if __name__ == "__main__":
    main()
