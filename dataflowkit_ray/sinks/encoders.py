"""Secondary sinks: CSV / JSON / JSON-Lines (+ optional gzip), Parquet.

The reference's encode stage (``/root/reference/scrape/encoders.go``)
serializes accumulated rows to csv/json/jsonl/xml/xlsx with an optional
gzip wrapper (``newEncodeWriter``, ``encoders.go:39-61``).  The engine's
canonical sink is exactly-once Parquet (``sinks/exactly_once.py``); these
encoders cover the interchange formats.  XML follows
``encoders.go:330-382``: ``<root>`` wrapper, one ``<row>`` per record,
entity-escaped values, ';'-joined lists, ``details`` lists of structs
recursively embedded.  XLSX stays unported (binary spreadsheet lib not
in this container; SURVEY.md §2.1 S11).

Each format writes distributed (one file per sink partition, tasks in
parallel); gzip compresses inside the task.  List columns are ';'-joined
for CSV exactly like the reference's cell formatter
(``encoders.go:265-302,384-394``).
"""

from __future__ import annotations

import gzip
import io
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv as pacsv


def _csv_coerce(t: pa.Table) -> pa.Table:
    """Reference CSV cell rules: lists -> ';'-joined strings
    (``encoders.go:265-302``)."""
    cols = {}
    for name, col in zip(t.column_names, t.columns):
        if pa.types.is_list(col.type) or pa.types.is_large_list(col.type):
            col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
            as_str = pc.cast(col, pa.list_(pa.string()))
            cols[name] = pc.binary_join(as_str, ";")
        else:
            cols[name] = col
    return pa.table(cols)


def _xml_value(w: io.BytesIO, value) -> None:
    from xml.sax.saxutils import escape

    if isinstance(value, dict):
        for k, v in value.items():
            w.write(f"<{k}>".encode())
            _xml_value(w, v)
            w.write(f"</{k}>".encode())
    elif isinstance(value, (list, tuple)):
        if value and isinstance(value[0], dict):
            for item in value:  # details embed: recurse per struct
                _xml_value(w, item)
        else:
            w.write(escape(";".join(str(v) for v in value)).encode())
    elif value is None:
        pass
    else:
        w.write(escape(str(value)).encode())


def _write_xml(t: pa.Table, buf: io.BytesIO) -> None:
    """``encoders.go:330-382`` semantics: escaped scalars, ';'-joined
    lists, recursive ``details``; one <row> wrapper per record."""
    buf.write(b'<?xml version="1.0" encoding="UTF-8"?><root>')
    for row in t.to_pylist():
        buf.write(b"<row>")
        for k, v in row.items():
            buf.write(f"<{k}>".encode())
            _xml_value(buf, v)
            buf.write(f"</{k}>".encode())
        buf.write(b"</row>")
    buf.write(b"</root>")


def _write_xlsx(t: pa.Table, path: str) -> None:
    """Minimal OOXML spreadsheet (``encoders.go:396-439``): one sheet,
    header row, every cell an inline string formatted by the CSV cell
    rules (lists ';'-joined).  Hand-rolled zip of XML parts — no
    spreadsheet library needed; deterministic timestamps for
    bit-identical re-runs."""
    import zipfile
    from xml.sax.saxutils import escape

    ct = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        "</Types>"
    )
    rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    wb = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="sheet" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    coerced = _csv_coerce(t)
    buf = io.StringIO()
    buf.write(
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
    )

    def row_xml(cells: list[str]) -> str:
        return (
            "<row>"
            + "".join(
                f'<c t="inlineStr"><is><t>{escape(c)}</t></is></c>' for c in cells
            )
            + "</row>"
        )

    buf.write(row_xml(coerced.column_names))
    for row in coerced.to_pylist():
        buf.write(row_xml(["" if v is None else str(v) for v in row.values()]))
    buf.write("</sheetData></worksheet>")
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
        for name, data in (
            ("[Content_Types].xml", ct),
            ("_rels/.rels", rels),
            ("xl/workbook.xml", wb),
            ("xl/_rels/workbook.xml.rels", wb_rels),
            ("xl/worksheets/sheet1.xml", buf.getvalue()),
        ):
            zi = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            z.writestr(zi, data)
    os.replace(tmp, path)


def _write_partition(t: pa.Table, path: str, fmt: str, compression: str | None) -> None:
    if fmt == "xlsx":
        _write_xlsx(t, path)  # zip container: no outer gzip wrapper
        return
    buf = io.BytesIO()
    if fmt == "csv":
        pacsv.write_csv(_csv_coerce(t), buf)
    elif fmt == "json":
        import json

        buf.write(json.dumps(t.to_pylist()).encode())
    elif fmt == "jsonl":
        import json

        for row in t.to_pylist():
            buf.write(json.dumps(row).encode())
            buf.write(b"\n")
    elif fmt == "xml":
        _write_xml(t, buf)
    else:
        raise ValueError(f"bad encoder format {fmt!r}")
    data = buf.getvalue()
    if compression == "gz":
        data = gzip.compress(data, mtime=0)  # mtime=0: bit-identical re-runs
        path += ".gz"
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def write_sink(ds, sink) -> int:
    """Write a Dataset through a SinkSpec; returns row count written."""
    import shutil

    if sink.format == "parquet":
        if sink.exactly_once:
            from dataflowkit_ray.sinks.exactly_once import ExactlyOnceSink

            return ExactlyOnceSink(sink.path).commit_epoch(ds, 0)["rows"]
        # plain path: clear stale output first — write_parquet appends
        # uniquely-named files, so a re-run into the same dir would mix
        # two runs' output (and double the glob-based count)
        shutil.rmtree(sink.path, ignore_errors=True)
        ds.write_parquet(sink.path)
        import glob

        import pyarrow.parquet as pq

        return sum(
            pq.read_metadata(f).num_rows for f in glob.glob(f"{sink.path}/*.parquet")
        )

    shutil.rmtree(sink.path, ignore_errors=True)
    os.makedirs(sink.path, exist_ok=True)
    fmt, compression, out_dir = sink.format, sink.compression, sink.path
    ext = {"csv": "csv", "json": "json", "jsonl": "jsonl", "xml": "xml", "xlsx": "xlsx"}[fmt]

    from dataflowkit_ray.stages.agg import composite_bucket

    def add_part(t: pa.Table) -> pa.Table:
        return t.append_column(
            "_sink_part", pa.array(composite_bucket(t, [t.column_names[0]], 8))
        )

    def write_part(t: pa.Table) -> pa.Table:
        part = int(t["_sink_part"][0].as_py())
        t = t.drop_columns(["_sink_part"])
        _write_partition(t, os.path.join(out_dir, f"part-{part:04d}.{ext}"), fmt, compression)
        return pa.table({"rows": [len(t)]})

    written = (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("_sink_part")
        .map_groups(write_part, batch_format="pyarrow")
        .take_all()
    )
    return int(sum(r["rows"] for r in written))


def read_source(paths: list[str], format: str = "parquet", columns=None):
    """One facade over the input codecs (the Fetcher-type switch,
    ``/root/reference/fetch/fetcher.go:97-107``)."""
    import ray.data

    if format == "parquet":
        return ray.data.read_parquet(paths, columns=columns)
    if format == "csv":
        ds = ray.data.read_csv(paths)
    elif format == "json":
        ds = ray.data.read_json(paths)
    else:
        raise ValueError(f"bad source format {format!r}")
    return ds.select_columns(columns) if columns else ds
