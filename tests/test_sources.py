"""Source connectors: Excel (S4/P1/P2/F1) and JSON array (S1/S2).

Excel fixtures are authored with the stdlib writer in
``data_ingestion_pimcore_spark/sources/xlsx_writer.py`` (no openpyxl here); the JSON
fixtures replicate the reference's input shape — a single top-level
array with nested objects and decimal fractions (FIXTURES.md §1).
"""

from __future__ import annotations

import json
import os

import pytest

from data_ingestion_pimcore_spark.sources.excel_source import (
    EmptyHeaderError,
    excel_paths,
    iter_excel_records,
    read_excel,
)
from data_ingestion_pimcore_spark.sources.json_source import (
    iter_json_array,
    json_paths,
    read_json_array,
    read_json_array_streaming,
)
from data_ingestion_pimcore_spark.sources.xlsx_writer import DateCell, write_xlsx


@pytest.fixture()
def workbook(tmp_path):
    rows = [
        ["id", "name", " padded ", None, "qty"],  # header: None → column_3
        [1, "alpha", "x", True, 10],
        [None, None, None, None, None],  # empty row → dropped (F1)
        [2, "beta"],  # short row → null-padded (P2)
        [3, "gamma", "y", False, 2.5, "extra-ignored"],
        [0, "", None, None, None],  # falsy-but-present row: any() false → dropped
        [4, "delta", DateCell(45292), True, 7],  # 2024-01-01
    ]
    return write_xlsx(str(tmp_path / "book.xlsx"), rows)


def test_excel_iter_records(workbook):
    recs = list(iter_excel_records(workbook))
    assert [r["id"] for r in recs] == [1, 2, 3, 4]
    # P1: header stringify+strip, None → positional name
    assert list(recs[0]) == ["id", "name", "padded", "column_3", "qty"]
    # P2: short row null-padded
    assert recs[1] == {"id": 2, "name": "beta", "padded": None, "column_3": None, "qty": None}
    # types: bool, int, float survive; extra trailing cell ignored
    assert recs[0]["column_3"] is True and recs[2]["qty"] == 2.5
    # date-styled serial → ISO string
    assert recs[3]["padded"] == "2024-01-01" and recs[3]["column_3"] is True


def test_excel_active_sheet_not_first(tmp_path):
    """wb.active semantics (reference excel_reader.py:40): when the
    workbook was saved with a non-first active sheet (activeTab=1),
    the reader must take THAT sheet, not sheet 1."""
    p = str(tmp_path / "multi.xlsx")
    sheet1 = [["wrong", "sheet"], [1, "nope"]]
    sheet2 = [["id", "name"], [10, "right"], [11, "also-right"]]
    write_xlsx(p, sheet1, more_sheets=[sheet2], active_tab=1)
    recs = list(iter_excel_records(p))
    assert recs == [
        {"id": 10, "name": "right"},
        {"id": 11, "name": "also-right"},
    ]
    # default active_tab=0 still reads the first sheet
    p2 = str(tmp_path / "single_active.xlsx")
    write_xlsx(p2, sheet1, more_sheets=[sheet2], active_tab=0)
    assert list(iter_excel_records(p2))[0] == {"wrong": 1, "sheet": "nope"}


def test_excel_date_cell(tmp_path):
    p = write_xlsx(
        str(tmp_path / "d.xlsx"),
        [["when"], [DateCell(45292)], [DateCell(45292.5)]],
    )
    recs = list(iter_excel_records(p))
    assert recs[0]["when"] == "2024-01-01"
    assert recs[1]["when"].startswith("2024-01-01T12:00")


def test_excel_formula_cells_read_cached_values(tmp_path):
    """data_only=True semantics (reference excel_reader.py:38): a cell
    saved with ``<f>`` + cached ``<v>`` surfaces the CACHED value. The
    cached values here are deliberately WRONG for their formulas
    (2+2 cached as 5; concat cached as 'stale'), so a reader that
    evaluated formulas would visibly diverge — proving evaluation
    never happens. Covers numeric, string (t=\"str\"), and float
    cached results, plus a formula cell mixed among plain cells."""
    from data_ingestion_pimcore_spark.sources.xlsx_writer import FormulaCell

    p = write_xlsx(
        str(tmp_path / "f.xlsx"),
        [
            ["a", "b", "calc", "label"],
            [2, 2, FormulaCell("A2+B2", 5), FormulaCell('A2&"x"', "stale")],
            [1, 4, FormulaCell("SUM(A3:B3)", 2.5), "plain"],
        ],
    )
    recs = list(iter_excel_records(p))
    assert recs[0] == {"a": 2, "b": 2, "calc": 5, "label": "stale"}
    assert recs[1] == {"a": 1, "b": 4, "calc": 2.5, "label": "plain"}
    # the raw sheet XML really does carry <f> elements (fixture sanity)
    import zipfile

    with zipfile.ZipFile(p) as z:
        sheet = z.read("xl/worksheets/sheet1.xml").decode()
    assert "<f>A2+B2</f>" in sheet and '<f>A2&amp;"x"</f>' in sheet


def test_excel_empty_header(tmp_path):
    p = write_xlsx(str(tmp_path / "e.xlsx"), [])
    with pytest.raises(EmptyHeaderError):
        list(iter_excel_records(p))


def test_excel_spark_datasource(spark, tmp_path, workbook):
    df = read_excel(spark, workbook)
    assert df.columns == ["id", "name", "padded", "column_3", "qty"]
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == ["1", "2", "3", "4"]
    assert rows[0]["column_3"] == "true"  # canonical bool rendering
    assert rows[1]["qty"] is None  # padded null survives to Spark


def test_excel_dir_glob(spark, tmp_path):
    os.makedirs(tmp_path / "sub")
    write_xlsx(str(tmp_path / "a.xlsx"), [["k"], [1]])
    write_xlsx(str(tmp_path / "sub" / "b.xlsx"), [["k"], [2]])
    assert len(excel_paths(str(tmp_path))) == 2
    df = read_excel(spark, str(tmp_path))
    assert sorted(r["k"] for r in df.collect()) == ["1", "2"]


@pytest.fixture()
def json_array_file(tmp_path):
    records = [
        {
            "product_id": i,
            "sku": f"SKU-{i:08d}",
            "price": i + 0.25,
            "attributes": {"b": "2", "a": "1"},
            "categories": ["x", "y"],
            "description": None if i % 5 == 0 else f"desc {i}",
        }
        for i in range(1, 26)
    ]
    p = tmp_path / "products.json"
    p.write_text(json.dumps(records, indent=2))
    return str(p), records


def test_iter_json_array_streaming_parse(json_array_file):
    path, records = json_array_file
    # tiny read_size forces many buffer refills mid-element
    got = list(iter_json_array(path, read_size=7))
    assert got == records


def test_iter_json_array_edge_cases(tmp_path):
    p = tmp_path / "x.json"
    p.write_text("  [ ]  ")
    assert list(iter_json_array(str(p))) == []
    p.write_text('[1, "two", {"three": [3]}, null, true]')
    assert list(iter_json_array(str(p), read_size=3)) == [
        1, "two", {"three": [3]}, None, True,
    ]
    p.write_text('{"not": "array"}')
    with pytest.raises(ValueError, match="not a JSON array"):
        list(iter_json_array(str(p)))
    p.write_text('[{"a": 1}, {"b": 2}')
    with pytest.raises(ValueError, match="truncated"):
        list(iter_json_array(str(p)))


def test_read_json_array_jvm(spark, json_array_file):
    path, records = json_array_file
    df = read_json_array(spark, path)
    assert df.count() == 25
    assert set(df.columns) >= {"product_id", "sku", "price", "attributes"}
    first = df.orderBy("product_id").first()
    assert first["product_id"] == 1 and first["sku"] == "SKU-00000001"


def test_json_array_python_datasource(spark, json_array_file):
    path, records = json_array_file
    df = read_json_array_streaming(spark, path)
    vals = [json.loads(r["value"]) for r in df.collect()]
    assert sorted(v["product_id"] for v in vals) == list(range(1, 26))
    # nested structures pass through verbatim (schema-on-read)
    assert vals[0]["attributes"] == {"b": "2", "a": "1"}


def test_run_ingestion_json_end_to_end(spark, tmp_path, json_array_file):
    """File-type dispatch → JSON array source → chunker → ACK sink."""
    from data_ingestion_pimcore_spark.config import IngestRequest
    from data_ingestion_pimcore_spark.pipeline import run_ingestion
    from data_ingestion_pimcore_spark.sink import ChunkValidator
    from data_ingestion_pimcore_spark.state import IngestionStateStore

    path, records = json_array_file
    req = IngestRequest(
        file_path=path,
        file_type="json",
        chunk_size_by_records=10,
        order_cols=("product_id",),
    )
    v = ChunkValidator()
    s = run_ingestion(spark, req, IngestionStateStore(str(tmp_path / "st.pq")), v)
    assert s.status == "COMPLETED" and s.total_records == 25
    assert v.received_chunks == [0, 1, 2]
    assert [r["product_id"] for r in v.received_records[0]] == list(range(1, 11))
    # nested map/array columns survive the wire (schema-on-read parity)
    assert v.received_records[0][0]["attributes"] == {"a": "1", "b": "2"}


def test_scheme_qualified_paths_end_to_end(spark, tmp_path, json_array_file):
    """file:// URIs work through load_source for every file_type:
    JVM readers take the URI natively, Python-side streaming readers
    resolve it locally — the minimal multi-cloud scheme contract
    (s3a:// etc. follow the same JVM path with connector configs)."""
    import json as _json

    from data_ingestion_pimcore_spark.config import IngestRequest
    from data_ingestion_pimcore_spark.pipeline import load_source
    from data_ingestion_pimcore_spark.sources.json_source import (
        iter_json_array,
        local_path,
    )

    path, records = json_array_file
    uri = f"file://{path}"

    # Python streaming parser accepts the URI
    assert list(iter_json_array(local_path(uri))) == records

    # JSON (JVM multiLine) through load_source with a file:// URI
    req = IngestRequest(
        file_path=uri, file_type="json",
        chunk_size_by_records=10, order_cols=("product_id",),
    )
    assert load_source(spark, req).count() == 25

    # parquet + csv through file:// URIs
    pq = tmp_path / "t.parquet"
    spark.range(7).write.mode("overwrite").parquet(f"file://{pq}")
    req_pq = IngestRequest(
        file_path=f"file://{pq}", file_type="parquet",
        chunk_size_by_records=10, order_cols=("id",),
    )
    assert load_source(spark, req_pq).count() == 7

    csv = tmp_path / "t.csv"
    csv.write_text("a,b\n1,x\n2,y\n")
    req_csv = IngestRequest(
        file_path=f"file://{csv}", file_type="csv",
        chunk_size_by_records=10, order_cols=("a",),
    )
    assert load_source(spark, req_csv).count() == 2


def test_run_ingestion_excel_end_to_end(spark, tmp_path):
    from data_ingestion_pimcore_spark.config import IngestRequest
    from data_ingestion_pimcore_spark.pipeline import run_ingestion
    from data_ingestion_pimcore_spark.sink import ChunkValidator
    from data_ingestion_pimcore_spark.state import IngestionStateStore

    rows = [["sku", "qty"]] + [[f"SKU-{i:04d}", i] for i in range(1, 26)]
    path = write_xlsx(str(tmp_path / "book.xlsx"), rows)
    req = IngestRequest(
        file_path=path,
        file_type="excel",
        chunk_size_by_records=10,
        order_cols=("sku",),
    )
    v = ChunkValidator()
    s = run_ingestion(spark, req, IngestionStateStore(str(tmp_path / "st.pq")), v)
    assert s.status == "COMPLETED" and s.total_records == 25
    assert v.received_chunks == [0, 1, 2]
    assert v.received_records[0][0] == {"sku": "SKU-0001", "qty": "1"}


def test_json_dir_glob(spark, tmp_path):
    os.makedirs(tmp_path / "nested")
    (tmp_path / "a.json").write_text('[{"v": 1}]')
    (tmp_path / "nested" / "b.json").write_text('[{"v": 2}, {"v": 3}]')
    assert len(json_paths(str(tmp_path))) == 2
    df = read_json_array(spark, str(tmp_path))
    assert sorted(r["v"] for r in df.collect()) == [1, 2, 3]
    sdf = read_json_array_streaming(spark, str(tmp_path))
    assert sdf.count() == 3


def test_xml_ingest_end_to_end(spark, tmp_path):
    """file_type='xml' dispatches through load_source (Spark 4 native
    XML) and runs the full chunked ACK-gated pipeline to completion."""
    from data_ingestion_pimcore_spark.config import IngestRequest
    from data_ingestion_pimcore_spark.pipeline import run_ingestion
    from data_ingestion_pimcore_spark.sink import ChunkValidator
    from data_ingestion_pimcore_spark.state import IngestionStateStore

    path = tmp_path / "items.xml"
    rows = "".join(
        f"<row><pid>{i}</pid><name>item{i}</name></row>" for i in range(1, 26)
    )
    path.write_text(f"<rows>{rows}</rows>")
    req = IngestRequest(
        file_path=str(path),
        file_type="xml",
        chunk_size_by_records=10,
        order_cols=("pid",),
    )
    v = ChunkValidator()
    summary = run_ingestion(
        spark, req, IngestionStateStore(str(tmp_path / "state.parquet")), v
    )
    assert summary.status == "COMPLETED"
    assert summary.total_records == 25
    assert [r["pid"] for r in v.received_records[0]] == list(range(1, 11))


def test_fsspec_scheme_normalization():
    """Object-store URIs in the reference's fsspec forms
    (json_reader.py:42) map to the Hadoop connector schemes Spark
    dispatches on; canonical and local forms pass through unchanged."""
    from data_ingestion_pimcore_spark.pipeline import normalize_uri

    assert normalize_uri("s3://bucket/exports/*.json") == "s3a://bucket/exports/*.json"
    assert normalize_uri("s3n://b/x") == "s3a://b/x"
    assert normalize_uri("S3://b/x") == "s3a://b/x"  # scheme is case-insensitive
    assert normalize_uri("gcs://b/x") == "gs://b/x"
    assert normalize_uri("gs://b/x") == "gs://b/x"
    az = "az://cont@acct.dfs.core.windows.net/p/q.parquet"
    assert normalize_uri(az) == "abfss://cont@acct.dfs.core.windows.net/p/q.parquet"
    assert normalize_uri("abfs://c@a/p") == "abfss://c@a/p"
    assert normalize_uri("abfss://c@a/p") == "abfss://c@a/p"
    assert normalize_uri("file:///tmp/x.parquet") == "file:///tmp/x.parquet"
    assert normalize_uri("hdfs://nn:8020/x") == "hdfs://nn:8020/x"
    assert normalize_uri("/tmp/x.parquet") == "/tmp/x.parquet"  # scheme-less
    # Unmapped-but-valid schemes lowercase in the fallback too: a
    # literal WASB:// or GS:// passes is_object_uri (case-insensitive)
    # and must land on the lowercase _CONNECTOR_CLASS keys rather than
    # KeyError past the guard (round-7 advice).
    assert normalize_uri("WASB://c@a/p") == "wasb://c@a/p"
    assert normalize_uri("GS://b/x") == "gs://b/x"
    assert normalize_uri("HDFS://nn:8020/x") == "hdfs://nn:8020/x"
    from data_ingestion_pimcore_spark.pipeline import _CONNECTOR_CLASS
    from data_ingestion_pimcore_spark.sources.object_store import is_object_uri

    for uri in ("WASB://c@a/p", "wasbs://c@a/p", "GS://b/x", "S3N://b/x"):
        norm = normalize_uri(uri)
        if is_object_uri(norm):
            assert norm.partition("://")[0].lower() in _CONNECTOR_CLASS


def test_s3_scheme_reaches_jvm_reader(spark):
    """A reference-shaped s3:// request is rewritten to s3a:// BEFORE
    JVM dispatch: without cloud credentials/connector jars the read
    must fail mentioning the s3a scheme/filesystem — proof the rewrite
    landed in front of the reader, not a docs-only recipe."""
    import pytest

    from data_ingestion_pimcore_spark.config import IngestRequest
    from data_ingestion_pimcore_spark.pipeline import load_source

    req = IngestRequest(
        file_path="s3://no-such-bucket/data.parquet",
        file_type="parquet",
        chunk_size_by_records=10,
        order_cols=("id",),
    )
    with pytest.raises(Exception, match="(?i)s3a"):
        load_source(spark, req).count()
