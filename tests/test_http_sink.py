"""End-to-end ingestion over REAL HTTP: a localhost consumer running the
ChunkValidator contract behind a stdlib HTTP server, exercising the K1
wire shape (POST JSON, business-level ack, transport-failure retry).
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from data_ingestion_pimcore_spark.config import IngestRequest
from data_ingestion_pimcore_spark.pipeline import ingest
from data_ingestion_pimcore_spark.sink import (
    ChunkRejected,
    ChunkValidator,
    HttpTransport,
)
from data_ingestion_pimcore_spark.state import IngestionStateStore


class _ConsumerHandler(BaseHTTPRequestHandler):
    validator: ChunkValidator = None
    fail_next: list = None  # pop → respond HTTP 500 (transport failure)

    def do_POST(self):
        if self.fail_next:
            self.fail_next.pop()
            self.send_response(500)
            self.end_headers()
            return
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        resp = type(self).validator(body)
        out = json.dumps(
            {
                "ack": resp.ack,
                "ingestion_id": resp.ingestion_id,
                "chunk_number": resp.chunk_number,
                "error": resp.error,
            }
        ).encode()
        # HTTP 200 even on NACK: status is NOT the success signal
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def http_consumer():
    v = ChunkValidator()
    handler = type("H", (_ConsumerHandler,), {"validator": v, "fail_next": []})
    srv = HTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}/callback", v, handler
    srv.shutdown()


def _req(path):
    return IngestRequest(
        file_path=path,
        file_type="parquet",
        chunk_size_by_records=40,
        order_cols=("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
    )


def test_ingest_over_real_http(spark, tmp_path, http_consumer):
    url, v, _ = http_consumer
    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").limit(100)
    s = ingest(
        spark,
        _req(f"{sf}/lineitem.parquet"),
        li,
        IngestionStateStore(str(tmp_path / "st.pq")),
        HttpTransport(url),
    )
    assert s.status == "COMPLETED"
    assert s.total_records == 100
    assert v.received_chunks == [0, 1, 2]
    assert [len(r) for r in v.received_records] == [40, 40, 20]
    assert v.completed == [s.ingestion_id]


def test_http_transport_failure_is_retried(spark, tmp_path, http_consumer):
    url, v, handler = http_consumer
    handler.fail_next.extend([1, 2])  # two HTTP 500s, then healthy
    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").limit(50)
    s = ingest(
        spark,
        _req(f"{sf}/lineitem.parquet"),
        li,
        IngestionStateStore(str(tmp_path / "st.pq")),
        HttpTransport(url),
    )
    assert s.status == "COMPLETED" and s.total_records == 50


def test_http_three_failures_reject_chunk(spark, tmp_path, http_consumer):
    url, v, handler = http_consumer
    handler.fail_next.extend([1, 2, 3])
    sf = "/root/testdata/sf0.001"
    li = spark.read.parquet(f"{sf}/lineitem.parquet").limit(50)
    state = IngestionStateStore(str(tmp_path / "st.pq"))
    with pytest.raises(ChunkRejected):
        ingest(spark, _req(f"{sf}/lineitem.parquet"), li, state, HttpTransport(url))
    # no false progress: nothing was ACKed, nothing committed
    assert v.received_chunks == []


def test_stream_ingest_over_real_http(spark, tmp_path, http_consumer):
    """Streaming twin of test_ingest_over_real_http: micro-batched
    stream_ingest delivers over the actual HTTP wire (POST JSON,
    business ACK, K4 completion), chunk numbers sequential across
    micro-batches."""
    import json as _json

    from data_ingestion_pimcore_spark.streaming import stream_ingest

    url, v, _ = http_consumer
    landing = tmp_path / "landing"
    landing.mkdir()
    for fname, start in (("f1.jsonl", 1), ("f2.jsonl", 26)):
        rows = [
            {"product_id": i, "sku": f"SKU-{i:06d}", "qty": i % 7}
            for i in range(start, start + 25)
        ]
        (landing / fname).write_text("\n".join(_json.dumps(r) for r in rows))

    stream = (
        spark.readStream.schema("product_id long, sku string, qty long")
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .json(str(landing))
    )
    req = IngestRequest(
        file_path=str(landing),
        file_type="jsonl",
        chunk_size_by_records=10,
        order_cols=("product_id",),
    )
    s = stream_ingest(
        spark,
        req,
        stream,
        IngestionStateStore(str(tmp_path / "st.pq")),
        HttpTransport(url),
        str(tmp_path / "ckpt"),
    )
    assert s.status == "COMPLETED" and s.total_records == 50
    assert v.received_chunks == list(range(len(v.received_chunks)))
    assert [len(r) for r in v.received_records] == [10, 10, 5, 10, 10, 5]
    got = [r["product_id"] for recs in v.received_records for r in recs]
    assert got == list(range(1, 51))
    assert v.completed == [s.ingestion_id]


def test_http_app_full_wire(spark, tmp_path, http_consumer, monkeypatch):
    """Both wire layers real: POST /api/ingest into the stdlib HTTP
    shell (validate → 400 / STARTED + background thread) and delivery
    out over HttpTransport to the localhost consumer — plus the
    status endpoint, health probe, and rotating log files."""
    import logging
    import urllib.error
    import urllib.request

    from data_ingestion_pimcore_spark.app import IngestionService
    from data_ingestion_pimcore_spark.http_app import start_http_app

    # point the log factory at a fresh root for this test
    for k in ("info", "error", "debug"):
        logging.getLogger(f"data_ingestion_pimcore_spark.{k}").handlers.clear()
    monkeypatch.setenv("SPARK_GRAFT_LOG_DIR", str(tmp_path / "logs"))

    url, v, _ = http_consumer
    svc = IngestionService(
        spark=spark, state=IngestionStateStore(str(tmp_path / "st.pq"))
    )
    srv, _t, port = start_http_app(svc)
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/health") as r:
            assert json.loads(r.read())["status"] == 200

        bad = json.dumps({"file_path": "", "file_type": "parquet"}).encode()
        req = urllib.request.Request(
            f"{base}/api/ingest", data=bad,
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req)
        assert exc_info.value.code == 400
        assert "file_path" in json.loads(exc_info.value.read())["error"]

        sf = "/root/testdata/sf0.001"
        body = json.dumps(
            {
                "file_path": f"{sf}/lineitem.parquet",
                "file_type": "parquet",
                "callback_url": url,
                "chunk_size_by_records": 2000,
                "order_cols": [
                    "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                ],
            }
        ).encode()
        req = urllib.request.Request(
            f"{base}/api/ingest", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            resp = json.loads(r.read())
        assert resp["status"] == "STARTED"
        iid = resp["ingestion_id"]
        done = svc.wait(iid, timeout=300)
        assert done["status"] == "COMPLETED", done

        with urllib.request.urlopen(f"{base}/api/status/{iid}") as r:
            st = json.loads(r.read())
        assert st["status"] == "COMPLETED"
        assert st["total_records"] == done["total_records"] > 0
        assert v.completed == [iid]

        info_log = (tmp_path / "logs" / "info" / "info.log").read_text()
        assert "api_hit : /api/ingest" in info_log
        err_log = (tmp_path / "logs" / "error" / "error.log").read_text()
        assert "rejected" in err_log  # the 400 request was logged
    finally:
        srv.shutdown()
        for k in ("info", "error", "debug"):
            logging.getLogger(f"data_ingestion_pimcore_spark.{k}").handlers.clear()


def test_numbered_log_namer():
    from data_ingestion_pimcore_spark.logging_util import numbered_namer

    assert numbered_namer("/x/info/info.log.1") == "/x/info/info1.log"
    assert numbered_namer("/x/debug/debug.log.10") == "/x/debug/debug10.log"
    assert numbered_namer("/x/info/info.log") == "/x/info/info.log"


def test_http_transport_reconnects_after_server_side_close():
    """Persistent-connection transport (round 8): a server that closes
    the connection after every response (HTTP/1.0 semantics — the
    stale-keep-alive race in its most aggressive form) must not surface
    transport NACKs: each call transparently reconnects once."""
    import json as _json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from data_ingestion_pimcore_spark.sink import HttpTransport

    class CloseEveryTime(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.0"  # server closes after each reply

        def do_POST(self):
            body = _json.loads(
                self.rfile.read(int(self.headers["Content-Length"]))
            )
            out = _json.dumps(
                {
                    "ack": True,
                    "ingestion_id": body["ingestion_id"],
                    "chunk_number": body["chunk_number"],
                    "error": None,
                }
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), CloseEveryTime)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        transport = HttpTransport(
            f"http://127.0.0.1:{srv.server_port}/callback"
        )
        for i in range(5):
            resp = transport(
                {"ingestion_id": "x", "chunk_number": i, "records": []}
            )
            assert resp.ack, (i, resp)
    finally:
        srv.shutdown()
