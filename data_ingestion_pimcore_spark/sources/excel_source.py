"""Excel (xlsx) source — reference S4/P1/P2/F1 re-expressed for Spark.

The reference streams workbooks with openpyxl in read-only mode
(`/root/reference/app/services/excel_reader.py:38-42`): lazily iterate
the active sheet's rows, first row becomes the schema
(stringify+strip, ``None`` header → ``column_{i}``, empty header row
aborts — `excel_reader.py:45-53`), rows shorter than the header are
null-padded (`excel_reader.py:72`), and rows with no truthy cell are
dropped (`excel_reader.py:61-63`).

This container has no openpyxl, and an xlsx file is just a zip of XML —
so the parser here is stdlib-only: ``zipfile`` + incremental
``xml.etree.ElementTree.iterparse`` over the worksheet stream, which
keeps memory O(row) exactly like openpyxl's ``read_only=True``.
Fidelity notes vs openpyxl ``data_only=True``:

* shared strings, inline strings, booleans, numbers and formula
  *cached values* (``<v>`` of a formula cell) are all read — formulas
  themselves are never evaluated, matching ``data_only=True``;
* date-formatted numeric cells (builtin numFmt ids 14-22/45-47 or a
  custom format containing y/m/d/h/s codes) are converted from Excel
  serial numbers to ISO-8601 strings — openpyxl yields ``datetime``
  objects; ISO strings are the engine's canonical wire form anyway
  (integrity.canonical_dumps serializes datetimes via isoformat).

Scale model (SURVEY §7.4.6): ONE workbook is unsplittable — the zip's
central directory and the row stream are sequential — so parallelism
comes from *many files*: the Spark DataSource plans one InputPartition
per workbook, giving a 1000-file ingest 1000-way parallelism with zero
shuffle. The per-file generator is the same code the batch pipeline
uses driver-side for a single small file.
"""

from __future__ import annotations

import glob as _glob
import os
import re
import zipfile
from datetime import datetime, timedelta
from typing import Any, Iterator
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"

# Builtin number-format ids rendered as dates/times (ECMA-376 §18.8.30).
_DATE_BUILTIN_FMTS = set(range(14, 23)) | {27, 30, 36, 45, 46, 47, 50, 57, 58}
# A custom format code is date-like if it contains day/month/year/hour/sec
# tokens outside quoted literals ("..." sections) and color/condition [..] blocks.
_DATE_TOKEN_RE = re.compile(r"[dmyhs]", re.IGNORECASE)
_QUOTED_RE = re.compile(r'"[^"]*"|\[[^\]]*\]')

_EPOCH_1900 = datetime(1899, 12, 30)  # Excel's day 0 (with the 1900 leap bug baked in)
_EPOCH_1904 = datetime(1904, 1, 1)


class EmptyHeaderError(ValueError):
    """Header row has no cells — ingestion aborts (excel_reader.py:48-51)."""


def _col_index(ref: str) -> int:
    """'C7' → 2 (0-based column). Cells carry their address; absent
    cells are simply missing from the XML, so indices gap-fill."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return n - 1


def _parse_shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        raw = zf.open("xl/sharedStrings.xml")
    except KeyError:
        return []
    out: list[str] = []
    for _event, el in ET.iterparse(raw):
        if el.tag == f"{_NS}si":
            # concat all <t> descendants (rich-text runs split them)
            out.append("".join(t.text or "" for t in el.iter(f"{_NS}t")))
            el.clear()
    return out


def _parse_date_styles(zf: zipfile.ZipFile) -> set[int]:
    """Style indices (cell ``s`` attribute) whose numFmt is date-like."""
    try:
        root = ET.fromstring(zf.read("xl/styles.xml"))
    except KeyError:
        return set()
    custom_date_fmts = set()
    for nf in root.iter(f"{_NS}numFmt"):
        code = _QUOTED_RE.sub("", nf.get("formatCode", ""))
        if _DATE_TOKEN_RE.search(code):
            custom_date_fmts.add(int(nf.get("numFmtId")))
    styles: set[int] = set()
    xfs = root.find(f"{_NS}cellXfs")
    if xfs is None:
        return styles
    for i, xf in enumerate(xfs.findall(f"{_NS}xf")):
        fmt = int(xf.get("numFmtId", "0"))
        if fmt in _DATE_BUILTIN_FMTS or fmt in custom_date_fmts:
            styles.add(i)
    return styles


def _active_sheet_path(zf: zipfile.ZipFile) -> str:
    """Resolve the workbook's ACTIVE sheet — the reference reads
    ``wb.active`` (`excel_reader.py:40`), which is the sheet selected
    when the file was last saved (``bookViews/workbookView@activeTab``,
    0-based index into the sheets list), not necessarily the first."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = wb.find(f"{_NS}sheets")
    if sheets is None or len(sheets) == 0:
        raise ValueError("workbook has no sheets")
    active = 0
    view = wb.find(f"{_NS}bookViews/{_NS}workbookView")
    if view is not None:
        try:
            active = int(view.get("activeTab", "0"))
        except ValueError:
            active = 0
    if not (0 <= active < len(sheets)):
        active = 0  # corrupt activeTab → openpyxl falls back to first
    rid = sheets[active].get(_REL_NS)
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    for rel in rels:
        if rel.get("Id") == rid:
            target = rel.get("Target")
            return target if target.startswith("xl/") else f"xl/{target}"
    return "xl/worksheets/sheet1.xml"


def _excel_serial_to_iso(serial: float, date1904: bool) -> str:
    epoch = _EPOCH_1904 if date1904 else _EPOCH_1900
    dt = epoch + timedelta(days=serial)
    # whole days → date string; fractional → full timestamp
    if abs(serial - round(serial)) < 1e-9:
        return dt.date().isoformat()
    return dt.replace(microsecond=round(dt.microsecond, -3) % 1_000_000).isoformat()


def _zip_open(path: str) -> zipfile.ZipFile:
    """Open a workbook from a local path or an object-store URI
    (s3/gs/az). xlsx is a zip — random access required — so
    object-store workbooks are fetched whole into memory (bounded by
    workbook size, which the format already caps well below partition
    scale)."""
    from .object_store import fetch_bytes, is_object_uri

    if is_object_uri(path):
        import io

        return zipfile.ZipFile(io.BytesIO(fetch_bytes(path)))
    return zipfile.ZipFile(path)


def sheet_names_and_paths(path: str) -> list[tuple[str, str]]:
    """All worksheets of a workbook as (name, archive path), in
    workbook order — the ``wb.sheetnames`` surface (the reference only
    ever reads ``wb.active``; multi-sheet is a beyond-reference
    extension; parallelism unit at scale = one task per sheet, since a
    single worksheet stream is unsplittable)."""
    with _zip_open(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        sheets = wb.find(f"{_NS}sheets")
        if sheets is None or len(sheets) == 0:
            raise ValueError("workbook has no sheets")
        rels = {
            rel.get("Id"): rel.get("Target")
            for rel in ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        }
        out = []
        for el in sheets:
            target = rels.get(el.get(_REL_NS), "worksheets/sheet1.xml")
            if not target.startswith("xl/"):
                target = f"xl/{target}"
            out.append((el.get("name") or "", target))
        return out


def _iter_raw_rows(path: str, sheet_path: str | None = None) -> Iterator[list[Any]]:
    """Yield rows as lists of native values (None gaps preserved),
    streaming: O(row) memory via iterparse, like openpyxl read_only.
    ``sheet_path`` selects a worksheet by archive path (default: the
    active sheet, reference semantics)."""
    with _zip_open(path) as zf:
        shared = _parse_shared_strings(zf)
        date_styles = _parse_date_styles(zf)
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        pr = wb.find(f"{_NS}workbookPr")
        date1904 = pr is not None and pr.get("date1904") in ("1", "true")
        with zf.open(sheet_path or _active_sheet_path(zf)) as sheet:
            for _event, el in ET.iterparse(sheet):
                if el.tag != f"{_NS}row":
                    continue
                row: list[Any] = []
                for cell in el.findall(f"{_NS}c"):
                    idx = _col_index(cell.get("r", ""))
                    if idx < 0:  # no address → append position
                        idx = len(row)
                    while len(row) <= idx:
                        row.append(None)
                    row[idx] = _cell_value(cell, shared, date_styles, date1904)
                el.clear()
                yield row


def _cell_value(
    cell: ET.Element, shared: list[str], date_styles: set[int], date1904: bool
) -> Any:
    t = cell.get("t", "n")
    if t == "inlineStr":
        is_el = cell.find(f"{_NS}is")
        return "".join(x.text or "" for x in is_el.iter(f"{_NS}t")) if is_el is not None else None
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    text = v.text
    if t == "s":
        return shared[int(text)]
    if t == "str":  # formula cached string value (data_only=True analogue)
        return text
    if t == "b":
        return text == "1"
    if t == "e":  # error cell, e.g. #DIV/0!
        return text
    # numeric
    num = float(text)
    s_attr = cell.get("s")
    if s_attr is not None and int(s_attr) in date_styles:
        return _excel_serial_to_iso(num, date1904)
    if num.is_integer() and abs(num) < 2**53:
        return int(num)
    return num


def headers_from_row(first_row: list[Any]) -> list[str]:
    """P1: stringify+strip, None → column_{i}; empty row aborts
    (excel_reader.py:45-53)."""
    if not first_row:
        raise EmptyHeaderError("empty header row")
    return [
        str(c).strip() if c is not None else f"column_{i}"
        for i, c in enumerate(first_row)
    ]


def iter_excel_lists(
    path: str, sheet_path: str | None = None
) -> tuple[list[str], Iterator[list[Any]]]:
    """(headers, iterator of raw data rows) for one workbook — the
    list-level surface the Arrow reader batches from. Applies the
    header rule and the F1 empty-row filter (``not any(row)`` — a row
    of all ``0``/``""`` is also dropped, replicated deliberately);
    rows keep their native lengths (padding/projection is the
    caller's concern, so the reader can do it column-wise)."""
    rows = _iter_raw_rows(path, sheet_path)
    try:
        first = next(rows)
    except StopIteration:
        raise EmptyHeaderError("empty worksheet")
    headers = headers_from_row(first)

    def data() -> Iterator[list[Any]]:
        for row in rows:
            if not any(row):  # F1 empty-row filter (excel_reader.py:61-63)
                continue
            yield row

    return headers, data()


def iter_excel_records(
    path: str, sheet_path: str | None = None
) -> Iterator[dict[str, Any]]:
    """Stream one workbook as header-projected records.

    Reproduces the reference row loop (`excel_reader.py:45-74`):
    header → schema, empty-row filter, null padding for short rows,
    extra trailing cells ignored. ``sheet_path`` selects a specific
    worksheet (default active).
    """
    headers, rows = iter_excel_lists(path, sheet_path)
    n = len(headers)
    for row in rows:
        yield {
            headers[i]: row[i] if i < len(row) else None for i in range(n)
        }


def excel_paths(path: str) -> list[str]:
    """Directory → recursive ``**/*.xlsx`` glob in sorted order (the
    S2 semantics applied to workbooks); file → itself. ``file://``
    URIs resolve to local paths (the zip reader is stdlib-side);
    object-store URIs pass through verbatim (one object per task)."""
    from .json_source import local_path
    from .object_store import is_object_uri

    if is_object_uri(path):
        return [path]
    path = local_path(path)
    if os.path.isdir(path):
        return sorted(
            _glob.glob(os.path.join(path, "**", "*.xlsx"), recursive=True)
        )
    return [path]


# ---------------------------------------------------------------- Spark

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class _ExcelReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("excel source requires a path")
        # endpoint config travels with the plan as options (see
        # json_source._JsonArrayReader for why env capture won't do)
        from .object_store import worker_env

        self._s3_env = worker_env(options)

    def partitions(self):
        # One partition per workbook: a single xlsx is unsplittable
        # (sequential zip + row stream), many parallelize perfectly.
        return [_FilePartition(p) for p in excel_paths(self.path)]

    # Rows per Arrow batch crossing the worker→JVM boundary. Workbook
    # rows are short strings, so 8k rows ≈ a few hundred KB per batch —
    # large enough to amortize the per-batch framing, far below any
    # Arrow 2 GiB buffer concern.
    _BATCH_ROWS = 8192

    def read(self, partition: _FilePartition):
        # r13 (guide §4.2): yield whole Arrow RecordBatches instead of
        # per-row tuples — the row path re-serialized every cell
        # through the tuple→Arrow converter one row at a time, and at
        # 20k rows/workbook that was the scan's biggest non-parse cost.
        # Interleaved A/B, both readers in ONE session (4 iters,
        # logs/ab_excel_interleaved_r13.out): 32-file scan 1.66 s →
        # 1.46 s min / 1.79 → 1.61 med, 1-file scan flat, all 640k
        # collected rows identical. The remaining floor is the
        # sequential iterparse of ~80k XML cells per workbook — a
        # per-file parse cost no batching can remove.
        # Values are stringified and placed
        # column-wise by the file's own header→schema-field mapping, so
        # mismatched/short/over-long rows keep the exact row-path
        # semantics.
        os.environ.update(self._s3_env)
        import pyarrow as pa

        fields = [f.name for f in self.schema.fields]
        headers, rows = iter_excel_lists(partition.path)
        pos = {h: i for i, h in enumerate(headers)}
        idx = [pos.get(f) for f in fields]
        cols: list[list] = [[] for _ in fields]
        n = 0
        for row in rows:
            ln = len(row)
            for c, i in enumerate(idx):
                v = row[i] if i is not None and i < ln else None
                cols[c].append(_to_string(v))
            n += 1
            if n >= self._BATCH_ROWS:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(c, type=pa.string()) for c in cols], names=fields
                )
                cols = [[] for _ in fields]
                n = 0
        if n:
            yield pa.RecordBatch.from_arrays(
                [pa.array(c, type=pa.string()) for c in cols], names=fields
            )


def _to_string(v: Any) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


class ExcelDataSource(DataSource):
    """``spark.read.format("excel").load(path)`` — schema-on-read: all
    columns StringType named by the header row of the FIRST workbook
    (every workbook in a directory must share the header, as in any
    multi-file ingest). Register with
    ``spark.dataSource.register(ExcelDataSource)``.
    """

    @classmethod
    def name(cls) -> str:
        return "excel"

    def schema(self) -> str:
        from .object_store import worker_env

        # schema inference also runs in a planning worker
        os.environ.update(worker_env(self.options))
        paths = excel_paths(self.options.get("path", ""))
        if not paths:
            raise ValueError("no .xlsx files at path")
        first_row = next(_iter_raw_rows(paths[0]), None)
        if first_row is None:
            raise EmptyHeaderError("empty worksheet")
        cols = ", ".join(f"`{h}` string" for h in headers_from_row(first_row))
        return cols

    def reader(self, schema) -> DataSourceReader:
        return _ExcelReader(schema, self.options)


def read_excel(spark, path: str):
    """Convenience: register (idempotent) + read."""
    from .object_store import configured_endpoints

    spark.dataSource.register(ExcelDataSource)
    reader = spark.read.format("excel")
    for opt, val in configured_endpoints().items():
        reader = reader.option(opt, val)
    return reader.load(path)
