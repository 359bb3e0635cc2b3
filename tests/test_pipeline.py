"""Invariant tests for the ingestion pipeline — the reference's test
philosophy ("tests exist to prove invariants": crash safety, resume
determinism, chunk-exactly-once — reference README:689-733), ported to
the Spark engine with an in-process consumer identical in behavior to
the reference's ChunkValidator.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_ingestion_pimcore_spark.config import IngestRequest, InvalidRequest
from data_ingestion_pimcore_spark.integrity import (
    build_chunk_id,
    build_file_id,
    build_ingestion_id,
    compute_checksum,
)
from data_ingestion_pimcore_spark.pipeline import ingest
from data_ingestion_pimcore_spark.sink import (
    ERR_CHECKSUM,
    ERR_EMPTY,
    ERR_OUT_OF_ORDER,
    ChunkRejected,
    ChunkValidator,
    send_chunk_with_retry,
)
from data_ingestion_pimcore_spark.state import IngestionStateStore, version_for


@pytest.fixture()
def products(spark):
    """Fixture-1-style product records (FIXTURES.md §1), 100 rows."""
    rows = [
        (
            i,
            f"SKU-{i:08d}",
            f"Product {i}",
            "BrandA" if i % 2 == 0 else "BrandB",
            round(1.5 * i + 0.25, 2),
            "EUR",
            i % 3 != 0,
            i * 7 % 100,
            f"desc {i}" if i % 5 else None,
        )
        for i in range(1, 101)
    ]
    return spark.createDataFrame(
        rows,
        "product_id long, sku string, name string, brand string, price double, "
        "currency string, in_stock boolean, quantity long, description string",
    )


def _request(**kw):
    defaults = dict(
        file_path="/data/pim/products.json",
        file_type="json",
        chunk_size_by_records=10,
        order_cols=("product_id",),
    )
    defaults.update(kw)
    return IngestRequest(**defaults)


def _store(tmp_path):
    return IngestionStateStore(str(tmp_path / "state.parquet"))


def test_golden_chunk_stream(spark, tmp_path, products):
    """100 records at size 10 → chunks 0..9 in order, all ACKed,
    checksums verified by the consumer, state COMPLETED."""
    validator = ChunkValidator()
    state = _store(tmp_path)
    s = ingest(spark, _request(), products, state, validator)
    assert validator.received_chunks == list(range(10))
    assert [len(r) for r in validator.received_records] == [10] * 10
    # ordered payloads follow product_id order
    first = [r["product_id"] for r in validator.received_records[0]]
    assert first == list(range(1, 11))
    assert s.chunks_sent == 10 and s.total_records == 100
    assert s.status == "COMPLETED" and s.last_chunk == 9
    assert validator.completed == [s.ingestion_id]


def test_resume_skips_acked_chunks(spark, tmp_path, products):
    """Pre-ACK chunks ≤ 2 → first re-sent chunk is 3 and contains
    records 31–40 (the intended record-skip semantics of
    test_resume_logic.py:6-17 / excel_reader.py:65-69)."""
    req = _request()
    state = _store(tmp_path)
    iid = build_ingestion_id(
        build_file_id(req.file_path, req.file_type), version_for(False)
    )
    state.update_chunk(iid, 2, 30)
    validator = ChunkValidator()
    validator.last_chunk[iid] = 2  # consumer already saw 0..2
    s = ingest(spark, req, products, state, validator)
    assert validator.received_chunks[0] == 3
    assert [r["product_id"] for r in validator.received_records[0]] == list(
        range(31, 41)
    )
    # A1 intended semantics: totals accumulate only newly sent records.
    assert s.total_records == 30 + 70
    assert s.status == "COMPLETED"


def test_record_level_resume_mid_chunk(spark, tmp_path, products):
    """record_resume=True: a crash mid-chunk (chunks 0-1 acked, 5
    records of chunk 2 counted) re-sends chunk 2 with ONLY its unacked
    remainder — the reference Excel path's records_to_skip semantics
    (excel_reader.py:32,65-69) — then continues with full chunks."""
    req = _request(record_resume=True)
    state = _store(tmp_path)
    iid = build_ingestion_id(
        build_file_id(req.file_path, req.file_type), version_for(False)
    )
    state.update_chunk(iid, 1, 25)  # 2 full chunks + 5 records of chunk 2
    validator = ChunkValidator()
    validator.last_chunk[iid] = 1
    s = ingest(spark, req, products, state, validator)
    assert validator.received_chunks[0] == 2
    assert [r["product_id"] for r in validator.received_records[0]] == list(
        range(26, 31)
    )
    assert [len(r) for r in validator.received_records] == [5] + [10] * 7
    assert s.total_records == 100
    assert s.status == "COMPLETED"


def test_transient_nack_retried(spark, tmp_path, products):
    validator = ChunkValidator(reject_once={4})
    state = _store(tmp_path)
    s = ingest(spark, _request(), products, state, validator)
    assert s.chunks_sent == 10
    assert validator.received_chunks == list(range(10))


def test_permanent_nack_no_false_progress(spark, tmp_path, products):
    """A chunk NACKed 3× fails the run; state stops at the last ACK —
    earlier chunks are never rolled back (README:294-299, 471-482)."""

    class AlwaysReject(ChunkValidator):
        def __call__(self, payload):
            is_chunk = payload.get("status") != "COMPLETED"
            if payload.get("chunk_number") == 5 and is_chunk:
                from data_ingestion_pimcore_spark.sink import AckResponse

                return AckResponse(False, payload["ingestion_id"], 5, "boom")
            return super().__call__(payload)

    validator = AlwaysReject()
    state = _store(tmp_path)
    req = _request()
    iid = build_ingestion_id(
        build_file_id(req.file_path, req.file_type), version_for(False)
    )
    with pytest.raises(ChunkRejected):
        ingest(spark, req, products, state, validator)
    assert state.get_last_chunk(iid) == 4
    assert state.get_total_records(iid) == 50
    assert state.get_status(iid) == "IN_PROGRESS"
    # resume after consumer recovers delivers exactly the remainder
    validator2 = ChunkValidator()
    validator2.last_chunk[iid] = 4
    s = ingest(spark, req, products, state, validator2)
    assert validator2.received_chunks == [5, 6, 7, 8, 9]
    assert s.total_records == 100 and s.status == "COMPLETED"


def test_reingestion_restarts_numbering(spark, tmp_path, products):
    """re_ingestion=true mints a fresh ingestion_id → chunk numbering
    and totals restart (ingestion_controllers.py:31-41; README:613-665)."""
    state = _store(tmp_path)
    v1 = ChunkValidator()
    s1 = ingest(spark, _request(), products, state, v1)
    v2 = ChunkValidator()
    s2 = ingest(spark, _request(re_ingestion=True), products, state, v2)
    assert s2.ingestion_id != s1.ingestion_id
    assert v2.received_chunks == list(range(10))
    assert s2.total_records == 100


def test_validator_contract_cv1_to_cv4():
    """Consumer-side contract, exercised directly (CV1–CV4)."""
    v = ChunkValidator()
    iid = "ing-1"
    records = [{"a": 1}, {"a": 2}]
    payload = {
        "ingestion_id": iid,
        "chunk_number": 0,
        "chunk_id": build_chunk_id(iid, 0),
        "checksum": compute_checksum(records),
        "records": records,
        "is_last": False,
    }
    assert v(payload).ack  # first delivery
    assert v(payload).ack  # CV1: duplicate chunk_id → ACK, not reprocessed
    assert v.received_chunks == [0]

    out_of_order = dict(payload, chunk_number=5, chunk_id=build_chunk_id(iid, 5))
    r = v(out_of_order)
    assert not r.ack and r.error == ERR_OUT_OF_ORDER  # CV2

    bad = dict(
        payload,
        chunk_number=1,
        chunk_id=build_chunk_id(iid, 1),
        checksum="deadbeef",
    )
    r = v(bad)
    assert not r.ack and r.error == ERR_CHECKSUM  # CV3

    empty = dict(payload, chunk_number=1, chunk_id=build_chunk_id(iid, 1), records=[])
    r = v(empty)
    assert not r.ack and r.error == ERR_EMPTY  # CV4


def test_retry_gives_up_after_three():
    from data_ingestion_pimcore_spark.sink import AckResponse

    calls = []

    def always_nack(payload):
        calls.append(1)
        return AckResponse(False, "i", 0, "no")

    with pytest.raises(ChunkRejected):
        send_chunk_with_retry(always_nack, {"chunk_number": 0})
    assert len(calls) == 3


def test_request_validation():
    with pytest.raises(InvalidRequest):
        _request(chunk_size_by_records=None)  # neither mode
    with pytest.raises(InvalidRequest):
        _request(chunk_size_by_memory=1000)  # both modes
    with pytest.raises(InvalidRequest):
        _request(chunk_size_by_records=4001)  # over reference cap
    with pytest.raises(InvalidRequest):
        _request(file_type="avro")  # not a supported connector
    assert _request(chunk_size_by_records=None, chunk_size_by_memory=1).chunk_size_by_memory == 1


def test_byte_budget_ingest(spark, tmp_path, products):
    """Byte-mode end-to-end: no chunk payload exceeds the budget (unless
    a single record alone does), no empty chunks, ordered delivery."""
    budget = 600
    validator = ChunkValidator()
    state = _store(tmp_path)
    req = _request(chunk_size_by_records=None, chunk_size_by_memory=budget)
    s = ingest(spark, req, products, state, validator)
    assert s.total_records == 100 and s.status == "COMPLETED"
    assert validator.received_chunks == list(range(len(validator.received_chunks)))
    for recs in validator.received_records:
        assert recs  # CV4 never triggered
    # budget invariant asserted on engine-side sizes in test_chunker.py


def test_canonical_dumps_golden_bytes():
    """Pin the canonical byte format (sorted keys, compact separators,
    shortest-repr floats, raw unicode, Decimal→float, ISO dates) to
    golden strings — the reference-parity contract
    (data_integrity_manager.py:25-36, orjson OPT_SORT_KEYS format)."""
    import datetime
    from decimal import Decimal

    from data_ingestion_pimcore_spark.integrity import canonical_dumps

    assert canonical_dumps({"b": 1, "a": 2}) == b'{"a":2,"b":1}'
    # nested maps sort at every level
    assert (
        canonical_dumps({"z": {"y": 1, "x": [2, {"n": 3, "m": 4}]}})
        == b'{"z":{"x":[2,{"m":4,"n":3}],"y":1}}'
    )
    # shortest-repr floats in orjson's exponent spelling (1e-7, not
    # stdlib's zero-padded 1e-07) — the reference's wire format, since
    # data_integrity_manager.py serializes with orjson
    assert canonical_dumps([0.1, 1e-07, 2.5]) == b"[0.1,1e-7,2.5]"
    # Decimal downcasts to float (json_decimal_encoder.py:6-8 semantics)
    assert canonical_dumps({"p": Decimal("19.99")}) == b'{"p":19.99}'
    # unicode is NOT ascii-escaped
    assert canonical_dumps({"s": "café"}) == '{"s":"café"}'.encode("utf-8")
    # datetimes → ISO-8601 strings
    assert (
        canonical_dumps({"t": datetime.datetime(2026, 1, 2, 3, 4, 5)})
        == b'{"t":"2026-01-02T03:04:05"}'
    )
    # null / bool spelling
    assert canonical_dumps({"x": None, "y": True}) == b'{"x":null,"y":true}'


def test_state_store_wal_replay(tmp_path):
    """Crash-recovery: commits appended to the WAL but not yet compacted
    into the parquet snapshot must be recovered by a fresh store opened
    on the same path (snapshot + log replay)."""
    p = str(tmp_path / "st.parquet")
    s1 = IngestionStateStore(p)
    s1.update_chunk("ing-a", 0, 10)
    s1.update_chunk("ing-a", 1, 20)
    s1.update_chunk("ing-b", 5, 500)
    # no compact/mark_completed — simulate a crash mid-ingestion

    s2 = IngestionStateStore(p)
    assert s2.get_last_chunk("ing-a") == 1
    assert s2.get_total_records("ing-a") == 20
    assert s2.get_last_chunk("ing-b") == 5
    assert s2.get_status("ing-a") == "IN_PROGRESS"

    s2.update_chunk("ing-a", 2, 30)
    s2.mark_completed("ing-a")  # compacts: snapshot holds the fold
    s3 = IngestionStateStore(p)
    assert s3.get_last_chunk("ing-a") == 2
    assert s3.get_status("ing-a") == "COMPLETED"
    assert s3.get_last_chunk("ing-b") == 5
    # unknown ingestion falls back to the reference defaults
    assert s3.get_last_chunk("nope") == -1 and s3.get_total_records("nope") == 0


def test_state_store_wal_torn_tail(tmp_path):
    """A torn final WAL line (partial write at crash) is ignored; intact
    earlier commits survive."""
    p = str(tmp_path / "st.parquet")
    s1 = IngestionStateStore(p)
    s1.update_chunk("ing-a", 3, 99)
    with open(p + ".log", "a", encoding="utf-8") as f:
        f.write('{"ingestion_id": "ing-a", "last_chu')  # torn write
    s2 = IngestionStateStore(p)
    assert s2.get_last_chunk("ing-a") == 3
    assert s2.get_total_records("ing-a") == 99


def test_warm_ingest_runs(spark):
    """Service-startup warm-up completes end-to-end (miniature
    ingestion through all ingest() plan shapes)."""
    from data_ingestion_pimcore_spark.pipeline import warm_ingest

    warm_ingest(spark)


def test_fused_payloads_equal_groupby_payloads(spark):
    """The fused builder (complete-in-task + fragment merge) must
    produce byte-identical payloads and checksums to the shuffle-based
    groupBy builder for every chunk, across chunk sizes that do and
    don't divide the row count (fragment-heavy cases included)."""
    from pyspark.sql import functions as F

    from data_ingestion_pimcore_spark.pipeline import (
        _RESUME_RN,
        _chunk_payloads,
        _chunk_payloads_fused,
        _chunked,
        _merge_fragment_rows,
    )

    # deterministic synthetic source with a unique key: order_cols must
    # be a TOTAL order (pipeline contract), and the two builders
    # evaluate the lineage independently, so the source must produce
    # identical rows on every evaluation (no limit/dropDuplicates).
    order = ["k"]
    li = spark.range(2500).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("a"),
        F.concat(F.lit("v"), F.col("id")).alias("s"),
        (F.col("id") * 1.5).alias("x"),
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id") % 7).alias("n"),
    )
    for chunk_size in (100, 999, 2500, 4000):
        req = _request(
            file_path="mem://fused-eq",
            file_type="parquet",
            chunk_size_by_records=chunk_size,
            order_cols=tuple(order),
        )
        stats: dict = {}
        chunked = _chunked(li, req, order, stats_out=stats)
        fused = _chunk_payloads_fused(
            chunked, li.columns, _RESUME_RN, chunk_size, stats["n_rows"], 2
        )
        got = {
            r["chunk_number"]: (
                r["n_records"], r["checksum"], bytes(r["payload"])
            )
            for r in _merge_fragment_rows(
                fused.orderBy("chunk_number", "first_rn").collect()
            )
        }
        grp = _chunk_payloads(
            chunked.drop(_RESUME_RN), li.columns, order
        ).collect()
        want = {
            r["chunk_number"]: (r["n_records"], r["checksum"], bytes(r["payload"]))
            for r in grp
        }
        assert got == want, f"chunk_size={chunk_size}"


def test_interleaved_concurrent_ingestions_resume(spark, tmp_path, products):
    """Two ingestions sharing ONE SparkSession, run truly interleaved
    on two threads (the reference's parallel unit: one background task
    per request, ingestion_controllers.py:47-51). B completes while A
    is permanently NACKed at chunk 5; A's resume then sends exactly the
    unACKed chunks. Proves per-ingestion state isolation (K2/K3) and
    CV2 ordering hold under concurrency — the scaling axis the
    concurrent bench measures."""
    import threading

    from data_ingestion_pimcore_spark.sink import AckResponse

    class RejectAt5(ChunkValidator):
        def __call__(self, payload):
            if (
                payload.get("chunk_number") == 5
                and payload.get("status") != "COMPLETED"
            ):
                return AckResponse(False, payload["ingestion_id"], 5, "boom")
            return super().__call__(payload)

    req_a = _request(file_path="/data/pim/conc_a.json")
    req_b = _request(file_path="/data/pim/conc_b.json")
    state_a = IngestionStateStore(str(tmp_path / "a.parquet"))
    state_b = IngestionStateStore(str(tmp_path / "b.parquet"))
    val_a, val_b = RejectAt5(), ChunkValidator()
    out: dict = {}

    def run(tag, req, state, val):
        try:
            out[tag] = ingest(spark, req, products, state, val)
        except ChunkRejected as exc:
            out[tag] = exc

    ta = threading.Thread(target=run, args=("a", req_a, state_a, val_a))
    tb = threading.Thread(target=run, args=("b", req_b, state_b, val_b))
    ta.start(), tb.start()
    ta.join(), tb.join()

    # B ran to completion, untouched by A's failure
    assert out["b"].status == "COMPLETED"
    assert val_b.received_chunks == list(range(10))
    assert out["b"].total_records == 100

    # A stopped at the NACK with no false progress
    assert isinstance(out["a"], ChunkRejected)
    iid_a = build_ingestion_id(
        build_file_id(req_a.file_path, req_a.file_type), version_for(False)
    )
    assert state_a.get_last_chunk(iid_a) == 4
    assert state_a.get_total_records(iid_a) == 50

    # resume A (consumer recovered) while a THIRD ingestion runs
    # concurrently in the same session — resume math must not see it
    val_a2 = ChunkValidator()
    val_a2.last_chunk[iid_a] = 4
    req_c = _request(file_path="/data/pim/conc_c.json")
    state_c = IngestionStateStore(str(tmp_path / "c.parquet"))
    val_c = ChunkValidator()
    ta2 = threading.Thread(target=run, args=("a2", req_a, state_a, val_a2))
    tc = threading.Thread(target=run, args=("c", req_c, state_c, val_c))
    ta2.start(), tc.start()
    ta2.join(), tc.join()

    assert val_a2.received_chunks == [5, 6, 7, 8, 9]
    assert out["a2"].total_records == 100
    assert out["a2"].status == "COMPLETED"
    assert out["c"].status == "COMPLETED" and val_c.received_chunks == list(
        range(10)
    )


def test_consumer_server_http_roundtrip(spark, tmp_path, products):
    """The standalone consumer process wrapper (consumer_server) speaks
    the full wire contract: an ingest over real HTTP completes, its
    stats endpoint reports the consumer-side accounting, and CV3 is
    enforced consumer-side (a tampered checksum NACKs)."""
    import json as _json
    import threading
    import urllib.request

    from data_ingestion_pimcore_spark.consumer_server import make_server
    from data_ingestion_pimcore_spark.sink import HttpTransport

    srv = make_server()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/callback"
        state = _store(tmp_path)
        s = ingest(spark, _request(), products, state, HttpTransport(url))
        assert s.status == "COMPLETED" and s.chunks_sent == 10

        with urllib.request.urlopen(url) as r:
            stats = _json.load(r)
        assert stats["chunks_acked"] == 10
        assert stats["records_acked"] == 100
        assert stats["completed"] == [s.ingestion_id]

        # CV3 consumer-side: tampered checksum → business NACK over 200
        transport = HttpTransport(url)
        resp = transport(
            {
                "ingestion_id": "other",
                "chunk_number": 0,
                "chunk_id": "other:0",
                "checksum": "0" * 64,
                "records": [{"x": 1}],
                "is_last": False,
            }
        )
        assert not resp.ack and resp.error == ERR_CHECKSUM
    finally:
        srv.shutdown()


def test_sigkill_mid_drain_resume_exactly_once(spark, tmp_path):
    """Process-level crash safety — the reference's core promise
    ("crash-safe, resumable", reference README:5-12) proven at the
    process boundary, not just the WAL layer: a SEPARATE producer
    process runs `pipeline.ingest` against a live HTTP consumer and is
    SIGKILLed mid-drain, after the consumer has PROCESSED a chunk whose
    ACK the producer never got to commit (the classic at-least-once
    window). A fresh producer run with the same state store must send
    exactly the unACKed chunks; the consumer's CV1 idempotent replay
    absorbs the one duplicate, so its accounting ends with every chunk
    processed exactly once."""
    import json as _json
    import os
    import signal
    import subprocess
    import sys as _sys
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from data_ingestion_pimcore_spark.pipeline import load_source
    from data_ingestion_pimcore_spark.sink import HttpTransport

    # -- input: 200 products as parquet on disk (both processes read it)
    src = str(tmp_path / "products.parquet")
    rows = [(i, f"SKU-{i:06d}", 1.5 * i) for i in range(1, 201)]
    spark.createDataFrame(
        rows, "product_id long, sku string, price double"
    ).repartition(2).write.parquet(src)

    # -- consumer: lives in THIS process, survives the producer's death.
    #    After ACKing chunk 4 it processes chunk 5, signals the kill
    #    window, and stalls the response until the producer is dead —
    #    deterministically creating "consumer processed, producer
    #    uncommitted".
    validator = ChunkValidator()
    kill_window = threading.Event()
    producer_dead = threading.Event()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = _json.loads(
                self.rfile.read(int(self.headers["Content-Length"]))
            )
            resp = validator(body)
            if (
                body.get("chunk_number") == 5
                and body.get("status") != "COMPLETED"
                and not producer_dead.is_set()
            ):
                kill_window.set()
                producer_dead.wait(timeout=30)
            out = _json.dumps(
                {
                    "ack": resp.ack,
                    "ingestion_id": resp.ingestion_id,
                    "chunk_number": resp.chunk_number,
                    "error": resp.error,
                }
            ).encode()
            try:
                self.send_response(200)
                self.send_header("Content-Length", str(len(out)))
                self.end_headers()
                self.wfile.write(out)
            except OSError:
                pass  # producer died mid-response — expected once

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_port}/callback"
    state_path = str(tmp_path / "state.parquet")

    producer_script = f"""
import sys
sys.path.insert(0, {repr(os.getcwd())})
from data_ingestion_pimcore_spark.session import get_spark
from data_ingestion_pimcore_spark.config import IngestRequest
from data_ingestion_pimcore_spark.pipeline import ingest
from data_ingestion_pimcore_spark.sink import HttpTransport
from data_ingestion_pimcore_spark.state import IngestionStateStore

spark = get_spark("crash-producer")
spark.sparkContext.setLogLevel("ERROR")
req = IngestRequest(
    file_path={repr(src)}, file_type="parquet",
    chunk_size_by_records=10, order_cols=("product_id",),
)
df = spark.read.parquet({repr(src)})
ingest(spark, req, df, IngestionStateStore({repr(state_path)}),
       HttpTransport({repr(url)}))
"""
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    proc = subprocess.Popen(
        [_sys.executable, "-c", producer_script],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
    )
    try:
        assert kill_window.wait(timeout=180), "producer never reached chunk 5"
        os.kill(proc.pid, signal.SIGKILL)
        proc.wait(timeout=30)
        producer_dead.set()

        # the consumer processed 0..5; the producer's durable state
        # committed only the ACKed 0..4 (chunk 5's ACK never arrived)
        state = IngestionStateStore(state_path)
        req = _request(
            file_path=src, file_type="parquet", order_cols=("product_id",)
        )
        iid = build_ingestion_id(
            build_file_id(src, "parquet"), version_for(False)
        )
        assert state.get_last_chunk(iid) == 4
        assert state.get_total_records(iid) == 50
        assert validator.received_chunks == [0, 1, 2, 3, 4, 5]

        # fresh producer (this process's session), same state store,
        # same live consumer: resume sends exactly the unACKed 5..19 —
        # chunk 5 arrives as a CV1 duplicate and is ACKed WITHOUT
        # reprocessing (received_chunks gains no second 5)
        df = load_source(spark, req)
        s = ingest(spark, req, df, state, HttpTransport(url))
        assert s.status == "COMPLETED"
        assert validator.received_chunks == list(range(20))
        assert validator.total_records == {}  # CV5 reset on completion
        assert validator.completed == [iid]
        # per-chunk content seen exactly once, in order, 10 records each
        assert [len(r) for r in validator.received_records] == [10] * 20
    finally:
        if proc.poll() is None:
            proc.kill()
        srv.shutdown()


def test_consumer_server_stats_ignore_cv1_replay(tmp_path):
    """/stats counts exactly-once PROCESSING: a CV1 duplicate replay is
    ACKed on the wire but must not inflate chunks/records_acked."""
    import json as _json
    import threading
    import urllib.request

    from data_ingestion_pimcore_spark.consumer_server import make_server
    from data_ingestion_pimcore_spark.sink import HttpTransport

    srv = make_server()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/callback"
        transport = HttpTransport(url)
        records = [{"a": 1}, {"a": 2}]
        payload = {
            "ingestion_id": "ing-1",
            "chunk_number": 0,
            "chunk_id": build_chunk_id("ing-1", 0),
            "checksum": compute_checksum(records),
            "records": records,
            "is_last": False,
        }
        assert transport(payload).ack  # first delivery: processed
        assert transport(payload).ack  # CV1 replay: acked, NOT processed
        with urllib.request.urlopen(url) as r:
            stats = _json.load(r)
        assert stats["chunks_acked"] == 1
        assert stats["records_acked"] == 2
    finally:
        srv.shutdown()


def test_ts_column_strings_byte_identical_to_isoformat():
    """The vectorized timestamp stringifier (round 8) must be
    byte-identical to the per-value isoformat path for everything it
    accepts, and refuse (return None) what it cannot match."""
    import numpy as np
    import pandas as pd

    from data_ingestion_pimcore_spark.integrity import canonical_dumps
    from data_ingestion_pimcore_spark.pipeline import _ts_column_strings

    def slow(s):
        return [
            None if pd.isna(v) else v.isoformat() for v in s.tolist()
        ]

    cases = {
        "zero_micros": pd.Series(
            pd.to_datetime(
                ["1996-03-13 00:00:00", "1998-12-01 23:59:59", None]
            )
        ),
        "mixed_micros": pd.Series(
            pd.to_datetime(
                ["2020-01-01 00:00:00.123456", "2020-01-01 00:00:00.000000",
                 None, "2020-06-01 12:00:00.000001"]
            )
        ),
        "us_unit": pd.Series(
            np.array(["2001-02-03T04:05:06.789000", "2001-02-03T04:05:06"],
                     dtype="datetime64[us]")
        ),
        "s_unit": pd.Series(
            np.array(["1970-01-01T00:00:00", "2200-06-15T10:20:30"],
                     dtype="datetime64[s]")
        ),
        "all_nat": pd.Series(pd.to_datetime([None, None])),
    }
    for name, s in cases.items():
        fast = _ts_column_strings(s)
        assert fast is not None, name
        assert fast == slow(s), name
        # and the serialized bytes agree end to end
        assert canonical_dumps(fast) == canonical_dumps(
            [None if v is None else v for v in slow(s)]
        ), name

    # refusals: ns precision and tz-aware fall back to the slow path
    ns = pd.Series(pd.to_datetime(["2020-01-01 00:00:00.123456789"]))
    assert ns.dt.nanosecond.iloc[0] != 0
    assert _ts_column_strings(ns) is None
    tz = pd.Series(pd.to_datetime(["2020-01-01 00:00:00"])).dt.tz_localize(
        "UTC"
    )
    assert _ts_column_strings(tz) is None
    assert _ts_column_strings(pd.Series([1, 2])) is None


def test_ingest_arrow_conf_window_refcounted(spark):
    """The drain-window Arrow conf must nest across concurrent
    ingestions: set by the first in, restored only by the last out,
    record cap tightening to the smallest active chunk size."""
    from data_ingestion_pimcore_spark.config import IngestRequest
    from data_ingestion_pimcore_spark.pipeline import (
        _MAX_BYTES_KEY,
        _MAX_RECS_KEY,
        _ingest_arrow_conf,
    )

    before_bytes = spark.conf.get(_MAX_BYTES_KEY)
    before_recs = spark.conf.get(_MAX_RECS_KEY)
    r1 = IngestRequest(
        file_path="x", file_type="parquet", chunk_size_by_records=4000,
        order_cols=("a",),
    )
    r2 = IngestRequest(
        file_path="y", file_type="parquet", chunk_size_by_records=2000,
        order_cols=("a",),
    )
    with _ingest_arrow_conf(spark, r1):
        assert spark.conf.get(_MAX_BYTES_KEY) == "2147483647"
        assert spark.conf.get(_MAX_RECS_KEY) == "4000"
        with _ingest_arrow_conf(spark, r2):
            assert spark.conf.get(_MAX_RECS_KEY) == "2000"
        # inner exit must NOT restore while the outer is active
        assert spark.conf.get(_MAX_BYTES_KEY) == "2147483647"
    assert spark.conf.get(_MAX_BYTES_KEY) == before_bytes
    assert spark.conf.get(_MAX_RECS_KEY) == before_recs

    # byte-mode ingests leave the confs alone when running solo ...
    rb = IngestRequest(
        file_path="z", file_type="parquet",
        chunk_size_by_memory=1024, order_cols=("a",),
    )
    with _ingest_arrow_conf(spark, rb):
        assert spark.conf.get(_MAX_BYTES_KEY) == before_bytes
        assert spark.conf.get(_MAX_RECS_KEY) == before_recs
    assert spark.conf.get(_MAX_BYTES_KEY) == before_bytes

    # ... and SUPPRESS the byte-cap sentinel while sharing the window
    # with a count-mode drain: a blob-heavy byte-mode ingest must never
    # silently lose the byte cap it relies on (round-9 ADVICE).
    with _ingest_arrow_conf(spark, r1):
        assert spark.conf.get(_MAX_BYTES_KEY) == "2147483647"
        with _ingest_arrow_conf(spark, rb):
            # byte-mode entrant drops the sentinel immediately ...
            assert spark.conf.get(_MAX_BYTES_KEY) == before_bytes
            # ... but the count-mode record cap stays (caps only tighten)
            assert spark.conf.get(_MAX_RECS_KEY) == "4000"
        # last byte-mode exit re-applies the sentinel for the survivor
        assert spark.conf.get(_MAX_BYTES_KEY) == "2147483647"
    assert spark.conf.get(_MAX_BYTES_KEY) == before_bytes
    assert spark.conf.get(_MAX_RECS_KEY) == before_recs

    # byte-mode entering FIRST blocks the sentinel for a later count-mode
    with _ingest_arrow_conf(spark, rb):
        with _ingest_arrow_conf(spark, r2):
            assert spark.conf.get(_MAX_BYTES_KEY) == before_bytes
            assert spark.conf.get(_MAX_RECS_KEY) == "2000"
    assert spark.conf.get(_MAX_BYTES_KEY) == before_bytes
    assert spark.conf.get(_MAX_RECS_KEY) == before_recs


# ---------------------------- pipelined (windowed) consumer validation


def test_pipelined_validator_golden_stream(spark, tmp_path, products):
    """The windowed pipeline must produce the IDENTICAL delivery the
    synchronous validator produces: same chunks in order, same records,
    same state progression, COMPLETED handshake."""
    from data_ingestion_pimcore_spark.sink import PipelinedChunkValidator

    with PipelinedChunkValidator(workers=2) as validator:
        state = _store(tmp_path)
        s = ingest(spark, _request(), products, state, validator)
        assert s.status == "COMPLETED" and s.chunks_sent == 10
        assert validator.received_chunks == list(range(10))
        assert [len(r) for r in validator.received_records] == [10] * 10
        ids = [
            r["product_id"] for ch in validator.received_records for r in ch
        ]
        assert ids == list(range(1, 101))
        assert validator.completed == [s.ingestion_id]


def test_pipelined_transient_nack_recovers_in_order(spark, tmp_path, products):
    """A NACK mid-window flushes the in-flight tail WITHOUT committing
    it, retries the failed chunk synchronously, resubmits the tail —
    the consumer must still see a gapless, duplicate-free sequence."""
    from data_ingestion_pimcore_spark.sink import PipelinedChunkValidator

    with PipelinedChunkValidator(workers=2, reject_once={4}) as validator:
        state = _store(tmp_path)
        s = ingest(spark, _request(), products, state, validator)
        assert s.chunks_sent == 10 and s.status == "COMPLETED"
        assert validator.received_chunks == list(range(10))


def test_pipelined_permanent_nack_no_false_progress(spark, tmp_path, products):
    """A chunk NACKed MAX_ATTEMPTS times fails the run; nothing behind
    the failed chunk may have committed — state stops at the last ACK
    even though later chunks were in flight when the NACK landed."""
    from data_ingestion_pimcore_spark.sink import (
        AckResponse,
        PipelinedChunkValidator,
    )

    class AlwaysReject(PipelinedChunkValidator):
        def _veto(self, payload):
            return (
                payload.get("chunk_number") == 5
                and payload.get("status") != "COMPLETED"
            )

        def resolve(self, handle):
            if self._veto(handle.payload):
                return AckResponse(False, handle.payload["ingestion_id"], 5, "boom")
            return super().resolve(handle)

        def __call__(self, payload):
            if self._veto(payload):
                return AckResponse(False, payload["ingestion_id"], 5, "boom")
            return super().__call__(payload)

    with AlwaysReject(workers=2) as validator:
        state = _store(tmp_path)
        req = _request()
        iid = build_ingestion_id(
            build_file_id(req.file_path, req.file_type), version_for(False)
        )
        with pytest.raises(ChunkRejected):
            ingest(spark, req, products, state, validator)
        assert state.get_last_chunk(iid) == 4
        assert state.get_total_records(iid) == 50
        assert state.get_status(iid) == "IN_PROGRESS"
        # chunks behind the failure must NOT have reached consumer state
        assert validator.received_chunks == [0, 1, 2, 3, 4]
    # resume delivers exactly the remainder, same as the sync path
    from data_ingestion_pimcore_spark.sink import PipelinedChunkValidator

    with PipelinedChunkValidator(workers=2) as v2:
        v2.last_chunk[iid] = 4
        s = ingest(spark, req, products, state, v2)
        assert v2.received_chunks == [5, 6, 7, 8, 9]
        assert s.total_records == 100 and s.status == "COMPLETED"


def test_pipelined_validator_contract_cv1_to_cv4():
    """CV1–CV4 through the submit/resolve surface directly."""
    from data_ingestion_pimcore_spark.sink import PipelinedChunkValidator

    import orjson

    with PipelinedChunkValidator(workers=2) as v:
        iid = "ing-p"
        records = [{"a": 1}, {"a": 2}]

        def payload(n, **kw):
            base = {
                "ingestion_id": iid,
                "chunk_number": n,
                "chunk_id": build_chunk_id(iid, n),
                "checksum": compute_checksum(records),
                "records_json": orjson.dumps(records).decode(),
                "is_last": False,
            }
            base.update(kw)
            return base

        assert v.resolve(v.submit(payload(0))).ack
        assert v.resolve(v.submit(payload(0))).ack  # CV1 duplicate → ACK
        assert v.received_chunks == [0]
        r = v.resolve(v.submit(payload(5)))
        assert not r.ack and r.error == ERR_OUT_OF_ORDER  # CV2
        r = v.resolve(v.submit(payload(1, checksum="deadbeef")))
        assert not r.ack and r.error == ERR_CHECKSUM  # CV3
        r = v.resolve(
            v.submit(payload(1, records_json="[]"))
        )
        assert not r.ack and r.error == ERR_EMPTY  # CV4
        # the stream recovers after the rejects
        assert v.resolve(v.submit(payload(1))).ack
        assert v.total_records[iid] == 4


@pytest.mark.parametrize("start_method", ["fork", "forkserver", "spawn"])
def test_pipelined_worker_death_degrades_to_sync(
    spark, tmp_path, products, monkeypatch, start_method
):
    """Fault injection for the CV3 pool (r10 verdict item 7): SIGKILL
    every pool worker mid-stream. The precompute is pure, so the
    in-flight chunk revalidates synchronously, later submits see the
    broken pool and degrade to the synchronous path, and the delivery
    must still be the golden stream — gapless, duplicate-free,
    COMPLETED — not a crashed ingestion. Parametrized over the guarded
    start methods (r11 verdict item 4): under pytest __main__ is
    pytest's own (import-guarded), so forkserver/spawn are safe here —
    the same guarantee a flag-setting caller promises for their entry
    script."""
    import os
    import signal

    from data_ingestion_pimcore_spark.sink import PipelinedChunkValidator

    monkeypatch.setenv("SPARK_GRAFT_POOL_START_METHOD", start_method)
    if start_method == "forkserver":
        from multiprocessing import forkserver

        forkserver.ensure_running()  # the session-factory hook's job

    class KillAfter3(PipelinedChunkValidator):
        submits = 0

        def submit(self, payload):
            h = super().submit(payload)
            KillAfter3.submits += 1
            if KillAfter3.submits == 3:
                for pid in list(self._pool._processes):
                    os.kill(pid, signal.SIGKILL)
            return h

    with KillAfter3(workers=2) as validator:
        state = _store(tmp_path)
        s = ingest(spark, _request(), products, state, validator)
        assert s.status == "COMPLETED" and s.chunks_sent == 10
        assert validator.received_chunks == list(range(10))
        ids = [
            r["product_id"] for ch in validator.received_records for r in ch
        ]
        assert ids == list(range(1, 101))
        assert validator.completed == [s.ingestion_id]


@pytest.mark.parametrize("start_method", ["fork", "forkserver", "spawn"])
def test_pipelined_parity_under_faults(
    spark, tmp_path, products, monkeypatch, start_method
):
    """The ingest_pipelined_parity booleans, exercised UNDER FAILURE
    (r10 verdict item 7): the pipelined run takes a NACK mid-window
    (flush + synchronous retry + resubmit, pipeline.deliver_payloads)
    AND a pool-worker SIGKILL — and must still deliver the byte-
    identical stream the synchronous consumer delivers. Parametrized
    over the guarded start methods (r11 verdict item 4)."""
    import os
    import signal

    monkeypatch.setenv("SPARK_GRAFT_POOL_START_METHOD", start_method)
    if start_method == "forkserver":
        from multiprocessing import forkserver

        forkserver.ensure_running()

    from data_ingestion_pimcore_spark.integrity import compute_checksum
    from data_ingestion_pimcore_spark.sink import (
        ChunkValidator,
        PipelinedChunkValidator,
    )

    v_sync = ChunkValidator()
    s_sync = ingest(spark, _request(), products, _store(tmp_path), v_sync)
    assert s_sync.status == "COMPLETED"

    class KillAfter5(PipelinedChunkValidator):
        submits = 0

        def submit(self, payload):
            h = super().submit(payload)
            KillAfter5.submits += 1
            if KillAfter5.submits == 5:
                for pid in list(self._pool._processes):
                    os.kill(pid, signal.SIGKILL)
            return h

    store2 = IngestionStateStore(str(tmp_path / "state2.parquet"))
    with KillAfter5(workers=2, reject_once={3}) as v_pipe:
        s_pipe = ingest(spark, _request(), products, store2, v_pipe)
        assert s_pipe.status == "COMPLETED"

    n = s_sync.chunks_sent
    assert s_pipe.chunks_sent == n
    assert v_pipe.received_chunks == v_sync.received_chunks == list(range(n))
    assert v_pipe.received_records == v_sync.received_records
    assert all(
        compute_checksum(a) == compute_checksum(b)
        for a, b in zip(v_sync.received_records, v_pipe.received_records)
    )
    assert len(v_sync.completed) == len(v_pipe.completed) == 1
    assert s_sync.total_records == s_pipe.total_records == 100
