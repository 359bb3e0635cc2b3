"""Service-layer parity with the reference HTTP app: validate → STARTED
reply → background pipeline → state observable, and the 400 path."""

from __future__ import annotations

from data_ingestion_pimcore_spark.app import IngestionService
from data_ingestion_pimcore_spark.sink import ChunkValidator
from data_ingestion_pimcore_spark.state import IngestionStateStore

SF = "/root/testdata/sf0.001"


def _svc(spark, tmp_path, v):
    return IngestionService(
        spark,
        IngestionStateStore(str(tmp_path / "state.pq")),
        inprocess_transports={"inprocess://validator": v},
    )


def test_ingest_started_then_completed(spark, tmp_path):
    v = ChunkValidator()
    svc = _svc(spark, tmp_path, v)
    assert svc.health() == {"status": "ok"}
    resp = svc.ingest(
        {
            "file_path": f"{SF}/lineitem.parquet",
            "file_type": "parquet",
            "chunk_size_by_records": 2000,
            "order_cols": ("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        }
    )
    # immediate STARTED reply, work continues in the background
    assert resp["status"] == "STARTED" and resp["ingestion_id"]
    final = svc.wait(resp["ingestion_id"], timeout=300)
    assert final["status"] == "COMPLETED" and final["error"] is None
    assert final["total_records"] == 6000
    assert v.completed == [resp["ingestion_id"]]
    assert v.received_chunks == list(range(3))


def test_ingest_validation_error_paths(spark, tmp_path):
    svc = _svc(spark, tmp_path, ChunkValidator())
    # both chunk modes -> reference's either/or rule
    r = svc.ingest(
        {
            "file_path": "x.json",
            "file_type": "json",
            "chunk_size_by_records": 10,
            "chunk_size_by_memory": 1000,
        }
    )
    assert r["status"] == "ERROR" and "exactly one" in r["error"]
    # bad file type
    r = svc.ingest({"file_path": "x.bin", "file_type": "bin", "chunk_size_by_records": 10})
    assert r["status"] == "ERROR" and "file_type" in r["error"]
    # record bound 1..4000
    r = svc.ingest({"file_path": "x.json", "file_type": "json", "chunk_size_by_records": 4001})
    assert r["status"] == "ERROR"
    # unknown callback scheme
    r = svc.ingest(
        {
            "file_path": "x.json",
            "file_type": "json",
            "chunk_size_by_records": 10,
            "callback_url": "ftp://nope",
        }
    )
    assert r["status"] == "ERROR" and "transport" in r["error"]


def test_ingest_failure_reported_not_raised(spark, tmp_path):
    """A chunk rejected 3x fails the background task; the service
    surfaces the error through wait(), state stays honest."""
    v = ChunkValidator()
    v.reject_once.update({1})  # NACK chunk 1 forever? no — once per call
    # make chunk 1 fail all 3 attempts
    calls = {"n": 0}

    def always_reject_chunk1(payload):
        if payload.get("chunk_number") == 1 and payload.get("status") != "COMPLETED":
            from data_ingestion_pimcore_spark.sink import AckResponse

            return AckResponse(False, payload["ingestion_id"], 1, "boom")
        return v(payload)

    svc = IngestionService(
        spark,
        IngestionStateStore(str(tmp_path / "state.pq")),
        inprocess_transports={"inprocess://validator": always_reject_chunk1},
    )
    resp = svc.ingest(
        {
            "file_path": f"{SF}/lineitem.parquet",
            "file_type": "parquet",
            "chunk_size_by_records": 2000,
            "order_cols": ("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"),
        }
    )
    final = svc.wait(resp["ingestion_id"], timeout=300)
    assert final["status"] == "IN_PROGRESS"  # never falsely COMPLETED
    assert "rejected after 3 attempts" in final["error"]
    assert final["last_chunk"] == 0  # chunk 0 ACKed, chunk 1 never committed
