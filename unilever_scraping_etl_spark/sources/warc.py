"""WARC (ISO 28500) web-archive ingestion — the bulk form of the
reference's scraping. The reference fetches live pages one HTTP call
at a time (`scrap_tokopedia.py` requests/Selenium path); a 100 TB
training-data pipeline starts from web-archive dumps instead (Common
Crawl ships WARC), so the engine needs a distributed WARC reader.

Public format only: WARC/1.0 per ISO 28500 / the IIPC spec — named
headers terminated by CRLFCRLF, a Content-Length-delimited payload,
and a CRLFCRLF record trailer; ``response`` records carry an HTTP
message as payload. No warc library exists in this container, and none
is needed: the parser below is ~80 lines of stdlib byte handling.

Scale posture:
- parallelism is PER FILE (`binaryFile` scan → one task per WARC):
  records inside a file chain through Content-Length, so intra-file
  parsing is inherently sequential — the same structure warcio walks.
  Real archives ship thousands of ~1 GB segment files, which is
  exactly the width a cluster wants; Spark's binaryFile source caps
  single files at 2 GB, matching Common Crawl segment sizing.
- the parser is an Arrow-batched ``mapInPandas`` (one python call per
  file batch, never per record-row from the JVM side), and the body
  stays ``binary`` so downstream metadata-only queries prune it.
- malformed input follows the house quarantine discipline (F6): a
  corrupt record yields one ``parse_ok=false`` row carrying the error
  and parsing of that FILE stops (Content-Length chaining means there
  is no trustworthy resync point past corruption); other files are
  unaffected.

``build_warc`` is the writer half — used by tests and the round-trip
oracle query to synthesize deterministic archives (record ids are
md5-derived from the target URI, no RNG).
"""

from __future__ import annotations

import gzip
import hashlib
import io

import pandas as pd
from pyspark.sql import DataFrame

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"

RECORD_SCHEMA = ("warc_file string, record_id string, warc_type string, "
                 "target_uri string, warc_date string, http_status int, "
                 "content_type string, body binary, parse_ok boolean, "
                 "error string")
_COLS = [c.split(" ")[0] for c in RECORD_SCHEMA.split(", ")]


def build_warc(records: list[dict], compress: bool = False) -> bytes:
    """Serialize ``records`` as a WARC/1.0 byte stream. Each record
    dict: ``uri`` (str), ``body`` (bytes — the HTTP response body),
    optional ``date`` (ISO-8601, default a fixed epoch so fixtures are
    byte-stable), ``status`` (int, default 200), ``content_type``
    (default text/html). Record ids derive from md5(uri) —
    deterministic, no RNG (the split_train_test discipline)."""
    def hval(name: str, v: str, ascii_only: bool = False) -> str:
        # a CR/LF inside ANY interpolated header value would inject a
        # bogus header line / terminate the block early (framing
        # attack) — reject, whichever field it rides in
        if "\r" in v or "\n" in v:
            raise ValueError(f"CR/LF in {name}: {v!r}")
        if ascii_only and not v.isascii():
            raise ValueError(f"non-ASCII {name}: {v!r} (URIs may be "
                             "IRIs; dates and media types may not)")
        return v

    out = io.BytesIO()
    for r in records:
        body = r["body"]
        status = int(r.get("status", 200))
        ctype = hval("content_type", r.get("content_type", "text/html"),
                     ascii_only=True)
        date = hval("date", r.get("date", "2024-01-01T00:00:00Z"),
                    ascii_only=True)
        http = (f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
                ).encode("ascii") + body
        uri = hval("WARC-Target-URI", r["uri"])
        rid = hashlib.md5(uri.encode()).hexdigest()
        hdr = (f"WARC/1.0\r\n"
               f"WARC-Type: response\r\n"
               f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
               f"WARC-Date: {date}\r\n"
               f"WARC-Target-URI: {uri}\r\n"
               f"Content-Type: application/http;msgtype=response\r\n"
               # utf-8, not ascii: the WARC spec allows UTF-8 header
               # values and real corpus URIs are IRIs
               f"Content-Length: {len(http)}\r\n\r\n").encode("utf-8")
        out.write(hdr + http + _HDR_END)
    raw = out.getvalue()
    return gzip.compress(raw, mtime=0) if compress else raw


def parse_warc_bytes(warc_file: str, data: bytes) -> list[dict]:
    """One WARC file's bytes -> record dicts (RECORD_SCHEMA rows).
    Gzip is magic-sniffed and handles BOTH layouts: whole-file gzip
    and the real-archive form where each record is its own gzip
    member (stdlib decompress walks concatenated members). Corruption
    yields one parse_ok=false row and stops this file (no resync past
    a broken Content-Length chain)."""
    rows: list[dict] = []

    def bad(err: str) -> list[dict]:
        rows.append(dict.fromkeys(_COLS) | {
            "warc_file": warc_file, "parse_ok": False, "error": err})
        return rows

    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except OSError as e:
            return bad(f"gzip: {e}")
    pos, n = 0, len(data)
    while pos < n:
        if data[pos:pos + 5] != b"WARC/":
            return bad(f"offset {pos}: record does not start with WARC/")
        hdr_end = data.find(_HDR_END, pos)
        if hdr_end < 0:
            return bad(f"offset {pos}: unterminated header block")
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            # WARC headers are UTF-8 per spec (IRIs in Target-URI);
            # replace rather than crash on undeclared legacy bytes
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
            if length < 0:
                raise ValueError(length)
        except (KeyError, ValueError):
            return bad(f"offset {pos}: missing/bad Content-Length")
        payload = data[hdr_end + 4:hdr_end + 4 + length]
        if len(payload) < length:
            return bad(f"offset {pos}: truncated payload "
                       f"({len(payload)} < {length})")
        pos = hdr_end + 4 + length
        if data[pos:pos + 4] != _HDR_END:
            return bad(f"offset {pos}: missing record trailer")
        pos += 4
        wtype = headers.get("warc-type", "")
        status, ctype, body = None, None, payload
        if wtype == "response" and payload[:5] == b"HTTP/":
            he = payload.find(_HDR_END)
            if he >= 0:
                status_line, *hlines = payload[:he].split(_CRLF)
                parts = status_line.decode("latin-1").split(" ")
                try:
                    # garbage archives ship status lines like
                    # "HTTP/1.1 OK" — a bad code is a NULL status on
                    # this record, never a task crash (F6 contract)
                    status = int(parts[1]) if len(parts) > 1 else None
                except ValueError:
                    status = None
                for line in hlines:
                    k, _, v = line.decode("latin-1").partition(":")
                    if k.strip().lower() == "content-type":
                        ctype = v.strip()
                body = payload[he + 4:]
        rows.append({
            "warc_file": warc_file,
            "record_id": headers.get("warc-record-id"),
            "warc_type": wtype,
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "http_status": status,
            "content_type": ctype,
            "body": body,
            "parse_ok": True,
            "error": None,
        })
    return rows


def fixture_archive(docs: DataFrame, id_col: str, text_col: str,
                    out_dir: str, n_files: int = 8,
                    compress: bool = True) -> None:
    """Serialize a documents frame into ``n_files`` WARC files under
    ``out_dir`` — the INPUT-synthesis half of the round-trip oracle
    queries (`warc_ingest`, `archive_funnel`). Driver-side toPandas BY
    DESIGN: this is bounded fixture construction, not an engine path —
    the engine path under test starts at :func:`read_warc`. URIs are
    ``http://corpus.local/doc/<id>`` so the id survives the trip."""
    import pathlib

    pdf = docs.select(id_col, text_col).toPandas()
    groups: dict[int, list[dict]] = {}
    # zip over the columns, not itertuples: pandas renames non-
    # identifier/keyword column names to positional fields there
    for did, text in zip(pdf[id_col], pdf[text_col]):
        groups.setdefault(int(did) % n_files, []).append(
            {"uri": f"http://corpus.local/doc/{did}",
             "body": str(text).encode("utf-8")})
    suffix = ".warc.gz" if compress else ".warc"
    for k, recs in groups.items():
        (pathlib.Path(out_dir) / f"part{k}{suffix}").write_bytes(
            build_warc(recs, compress=compress))


def fixture_docs(records: DataFrame) -> DataFrame:
    """Read-side twin of :func:`fixture_archive`: project parsed
    records back to ``(doc_id, text, http_status)`` by unpacking the
    ``corpus.local/doc/<id>`` URI scheme — shared by every query built
    on the synthesized archive so the scheme lives in ONE place."""
    from pyspark.sql import functions as F

    return records.filter(F.col("parse_ok")).select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
         .cast("bigint").alias("doc_id"),
        F.col("body").cast("string").alias("text"),
        F.col("http_status"))


def read_warc(spark, path: str) -> DataFrame:
    """Directory (or glob) of WARC files -> one row per record
    (RECORD_SCHEMA). binaryFile scan for file-level parallelism, then
    an Arrow-batched mapInPandas running the stdlib parser; the JVM
    side never sees partial records."""
    files = spark.read.format("binaryFile").load(path)

    def run(batches):
        for pdf in batches:
            rows: list[dict] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_warc_bytes(p, bytes(content)))
            yield pd.DataFrame(rows, columns=_COLS)

    return files.select("path", "content").mapInPandas(run, RECORD_SCHEMA)
