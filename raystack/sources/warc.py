"""WARC ingest: Common-Crawl-style web archives → the engine's webtext table.

WARC (ISO 28500, the public Web ARChive spec) is the format crawl data
actually arrives in: a stream of records, each a CRLF-terminated header
block (``WARC/1.0``, ``Name: value`` lines, ``Content-Length``), an empty
line, ``Content-Length`` payload bytes, and a blank-line separator.
``response`` records carry an HTTP response (status line + headers + body);
``resource``/``conversion`` records carry the payload directly. ``.warc.gz``
files are multi-member gzip — one member per record — which stdlib ``gzip``
reads transparently as one stream.

:func:`read_warc` is a Ray Data source built on the public
``FileBasedDatasource``: each file STREAMS through ``_read_stream`` —
records parse incrementally off a buffered reader and emit as bounded Arrow
batches, so a 1 GB archive never materializes in worker memory. Output
schema matches the engine's webtext table head: ``url`` (WARC-Target-URI),
``warc_ts`` (WARC-Date, timestamp[us]), ``html`` (payload bytes, binary),
plus ``http_status`` and ``content_type`` for curation filters. Chain
``ops.text.add_extracted_text`` + ``pipeline.encode_partitioned`` for the
full crawl→columnar path.

:func:`write_warc` is the symmetric writer (used by tests and as an export
sink): standards-shaped records, optional per-record gzip members.
"""

from __future__ import annotations

import datetime as _dt
import gzip
import io

import pyarrow as pa

_CRLF = b"\r\n"
_BATCH_ROWS = 1024
_BATCH_BYTES = 32 * 1024 * 1024

_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.large_binary()),
    ("http_status", pa.int32()),
    ("content_type", pa.string()),
])


def _parse_warc_date(s: str) -> _dt.datetime | None:
    """WARC-Date is ISO 8601 UTC: 2024-03-01T12:34:56Z (ms/us optional)."""
    if not s:
        return None
    try:
        return _dt.datetime.fromisoformat(s.replace("Z", "+00:00")) \
            .astimezone(_dt.timezone.utc).replace(tzinfo=None)
    except ValueError:
        return None


def _read_headers(stream) -> dict[str, str] | None:
    """Read one CRLF header block (first line = version/status line under
    key ''). Returns None on clean EOF before any line."""
    first = stream.readline()
    while first in (_CRLF, b"\n"):  # tolerate stray blank lines between records
        first = stream.readline()
    if not first:
        return None
    headers = {"": first.strip().decode("latin-1")}
    while True:
        line = stream.readline()
        if not line:  # EOF inside a header block: truncated record, drop it
            return None
        if line in (_CRLF, b"\n"):
            return headers
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = \
                v.strip().decode("latin-1")


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response payload -> (status, content-type, body)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        sep = payload.find(b"\n\n")
        if sep < 0:
            return None, None, payload
        head, body = payload[:sep], payload[sep + 2:]
    else:
        head, body = payload[:sep], payload[sep + 4:]
    lines = head.split(b"\n")
    status = None
    ctype = None
    first = lines[0].strip()
    if first.startswith(b"HTTP/"):
        parts = first.split()
        if len(parts) >= 2 and parts[1].isdigit():
            status = int(parts[1])
    else:
        # not an HTTP head after all — the whole payload is the body
        return None, None, payload
    for ln in lines[1:]:
        if b":" in ln:
            k, v = ln.split(b":", 1)
            if k.strip().lower() == b"content-type":
                ctype = v.strip().decode("latin-1")
                break
    return status, ctype, body


def iter_warc_records(stream):
    """Yield dict rows from a (binary, buffered) WARC stream. Keeps only
    content records (``response``/``resource``/``conversion``); request /
    metadata / warcinfo records are skipped but their bytes are consumed."""
    while True:
        headers = _read_headers(stream)
        if headers is None:
            return
        if not headers.get("", "").startswith("WARC/"):
            return  # lost sync — stop rather than emit garbage
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        payload = stream.read(length) if length else b""
        if len(payload) < length:
            return  # truncated archive: drop the partial record
        rtype = headers.get("warc-type", "").lower()
        if rtype in ("response", "resource", "conversion"):
            url = headers.get("warc-target-uri", "") or None
            ts = _parse_warc_date(headers.get("warc-date", ""))
            if rtype == "response":
                status, ctype, body = _split_http(payload)
            else:
                status, body = None, payload
                ctype = headers.get("content-type")
            yield {"url": url, "warc_ts": ts, "html": body,
                   "http_status": status, "content_type": ctype}
        # consume the record separator (two CRLFs); readline tolerates EOF
        stream.readline()
        stream.readline()


def read_warc(paths, **read_args):
    """Ray Data source: WARC/``.warc.gz`` files → webtext-shaped Dataset
    (url, warc_ts, html, http_status, content_type), streaming per file."""
    import ray
    from ray.data.datasource import FileBasedDatasource

    class _Warc(FileBasedDatasource):
        _FILE_EXTENSIONS = ["warc", "warc.gz", "gz"]

        def _open_input_source(self, filesystem, path, **open_args):
            # bypass Ray's extension-based decompression: .warc.gz is one
            # gzip member PER RECORD, and _read_stream uses stdlib gzip,
            # whose multi-member handling is guaranteed
            open_args.pop("compression", None)
            buffer_size = open_args.pop("buffer_size", None)
            if buffer_size is None:
                buffer_size = self._data_context.streaming_read_buffer_size
            return filesystem.open_input_stream(
                path, buffer_size=buffer_size, compression=None, **open_args)

        def _read_stream(self, f, path: str):
            # gzip is handled HERE with stdlib gzip (multi-member per the
            # Common Crawl convention) — the datasource is constructed with
            # compression detection disabled, so f is always the raw bytes
            raw = gzip.GzipFile(fileobj=f) if path.endswith(".gz") else f
            stream = io.BufferedReader(raw, buffer_size=1 << 20)
            rows: list[dict] = []
            nbytes = 0
            for row in iter_warc_records(stream):
                rows.append(row)
                nbytes += len(row["html"] or b"")
                if len(rows) >= _BATCH_ROWS or nbytes >= _BATCH_BYTES:
                    yield _to_table(rows)
                    rows, nbytes = [], 0
            if rows:
                yield _to_table(rows)

    return ray.data.read_datasource(_Warc(paths), **read_args)


def _to_table(rows: list[dict]) -> pa.Table:
    return pa.table({
        "url": pa.array([r["url"] for r in rows], type=pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in rows],
                            type=pa.timestamp("us")),
        "html": pa.array([r["html"] for r in rows], type=pa.large_binary()),
        "http_status": pa.array([r["http_status"] for r in rows],
                                type=pa.int32()),
        "content_type": pa.array([r["content_type"] for r in rows],
                                 type=pa.string()),
    }, schema=_SCHEMA)


def read_warc_file_table(path: str,
                         extract: tuple[bytes, bytes] | None = None
                         ) -> pa.Table:
    """One WARC file → one Arrow table (the map-task reader for the
    raw-task exchange; :func:`read_warc` is the streaming Dataset
    variant). ``extract=(open_tag, close_tag)`` appends the extracted
    ``text`` column via the same vectorized kernel the Dataset path uses
    (byte-identical by construction). Whole-file materialization is the
    task-exchange contract — map groups are size-bounded upstream the
    same way parquet row groups are."""
    import io as _io

    with open(path, "rb") as f:
        raw = gzip.GzipFile(fileobj=f) if path.endswith(".gz") else f
        stream = _io.BufferedReader(raw, buffer_size=1 << 20)
        rows = list(iter_warc_records(stream))
    t = _to_table(rows)
    if extract is not None:
        from ..ops.text import extract_text_batch
        t = extract_text_batch(t, html_col="html", out_col="text",
                               open_tag=extract[0], close_tag=extract[1])
    return t


def warc_schema(extract: bool = False) -> pa.Schema:
    """The fixed table schema of WARC ingest (plan-time twin of
    :func:`read_warc_file_table`)."""
    s = _SCHEMA
    if extract:
        s = s.append(pa.field("text", pa.large_string()))
    return s


# ---------------------------------------------------------------------------
# writer (tests + export sink)
# ---------------------------------------------------------------------------

def _format_ts(ts) -> str:
    if ts is None:
        return "1970-01-01T00:00:00Z"
    if isinstance(ts, str):
        return ts
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def write_warc(path: str, records: list[dict], compress: bool | None = None,
               record_type: str = "response") -> int:
    """Write records (dicts with url / warc_ts / html, optional
    http_status / content_type / warc_type) as a WARC file. ``compress``
    defaults from the ``.gz`` suffix; gzip output is one member per record
    (the Common Crawl convention, required for record-level seeking)."""
    if compress is None:
        compress = path.endswith(".gz")
    n = 0
    with open(path, "wb") as out:
        for rec in records:
            body = rec.get("html", b"") or b""
            rtype = rec.get("warc_type", record_type)
            if rtype == "response":
                status = rec.get("http_status", 200) or 200
                ctype = rec.get("content_type") or "text/html"
                payload = (f"HTTP/1.1 {status} OK\r\n"
                           f"Content-Type: {ctype}\r\n"
                           f"Content-Length: {len(body)}\r\n\r\n"
                           ).encode("latin-1") + body
                block_ct = "application/http; msgtype=response"
            else:
                payload = body
                block_ct = rec.get("content_type") or \
                    "application/octet-stream"
            head = (f"WARC/1.0\r\n"
                    f"WARC-Type: {rtype}\r\n"
                    f"WARC-Record-ID: <urn:uuid:raystack-{n}>\r\n"
                    f"WARC-Date: {_format_ts(rec.get('warc_ts'))}\r\n"
                    f"WARC-Target-URI: {rec.get('url', '')}\r\n"
                    f"Content-Type: {block_ct}\r\n"
                    f"Content-Length: {len(payload)}\r\n\r\n"
                    ).encode("latin-1")
            blob = head + payload + _CRLF + _CRLF
            if compress:
                buf = io.BytesIO()
                with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                    gz.write(blob)
                out.write(buf.getvalue())
            else:
                out.write(blob)
            n += 1
    return n
