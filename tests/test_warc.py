"""WARC ingestion (sources/warc.py): ISO 28500 writer/parser round
trips, malformed-input quarantine, and the distributed binaryFile →
mapInPandas read path. Registered query `warc_ingest` oracle-checks
the full round trip against the documents table."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from unilever_scraping_etl_spark.sources import warc


def _recs():
    return [
        {"uri": "http://x.test/a", "body": b"hello world"},
        {"uri": "http://x.test/b", "body": b"bin\x00ary\xff bytes",
         "status": 404, "content_type": "application/octet-stream"},
        # a body that CONTAINS the record/header terminator — the
        # Content-Length framing must carry it through intact
        {"uri": "http://x.test/c", "body": b"tricky\r\n\r\nbody\r\n"},
    ]


def test_build_parse_round_trip():
    data = warc.build_warc(_recs())
    rows = warc.parse_warc_bytes("f", data)
    assert [r["parse_ok"] for r in rows] == [True] * 3
    assert [r["target_uri"] for r in rows] == [
        "http://x.test/a", "http://x.test/b", "http://x.test/c"]
    assert rows[0]["body"] == b"hello world"
    assert rows[1]["http_status"] == 404
    assert rows[1]["content_type"] == "application/octet-stream"
    assert rows[1]["body"] == b"bin\x00ary\xff bytes"
    assert rows[2]["body"] == b"tricky\r\n\r\nbody\r\n"
    # deterministic ids: rebuilt archive is byte-identical
    assert warc.build_warc(_recs()) == data


def test_gzip_whole_file_round_trip():
    data = warc.build_warc(_recs(), compress=True)
    assert data[:2] == b"\x1f\x8b"
    rows = warc.parse_warc_bytes("f.gz", data)
    assert [r["parse_ok"] for r in rows] == [True] * 3
    # mtime=0 keeps the compressed form reproducible too
    assert warc.build_warc(_recs(), compress=True) == data


def test_per_record_gzip_members_parse():
    """Real .warc.gz files gzip EACH RECORD as its own member
    (the Common Crawl layout, enabling per-record random access);
    stdlib gzip.decompress walks all members, so the parser must read
    the concatenation transparently."""
    recs = _recs()
    data = b"".join(
        gzip.compress(warc.build_warc([r]), mtime=0) for r in recs)
    rows = warc.parse_warc_bytes("f.gz", data)
    assert [r["parse_ok"] for r in rows] == [True] * 3
    assert [r["target_uri"] for r in rows] == [r["uri"] for r in recs]


def test_truncation_quarantines_and_keeps_prior_records():
    data = warc.build_warc(_recs())
    rows = warc.parse_warc_bytes("f", data[:len(data) - 30])
    ok = [r for r in rows if r["parse_ok"]]
    bad = [r for r in rows if not r["parse_ok"]]
    assert len(ok) == 2 and len(bad) == 1
    assert "truncated" in bad[0]["error"] or "trailer" in bad[0]["error"]
    assert bad[0]["warc_file"] == "f"


def test_garbage_and_bad_length_quarantine():
    rows = warc.parse_warc_bytes("f", b"not a warc at all")
    assert rows[0]["parse_ok"] is False
    assert "WARC/" in rows[0]["error"]
    mangled = warc.build_warc(_recs()[:1]).replace(
        b"Content-Length", b"Content-Lies", 1)
    rows = warc.parse_warc_bytes("f", mangled)
    assert rows[0]["parse_ok"] is False
    assert "Content-Length" in rows[0]["error"]


def test_non_numeric_status_is_null_not_a_crash():
    """Garbage archives ship status lines like 'HTTP/1.1 OK'; that
    must be a NULL status on the record, never an exception escaping
    the mapInPandas task (F6 contract)."""
    body = b"HTTP/1.1 OK\r\nContent-Type: text/html\r\n\r\nhi"
    hdr = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Target-URI: http://x.test/odd\r\n"
           b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n")
    (r,) = warc.parse_warc_bytes("f", hdr + body + b"\r\n\r\n")
    assert r["parse_ok"] and r["http_status"] is None
    assert r["body"] == b"hi"


def test_negative_content_length_quarantines_accurately():
    hdr = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"Content-Length: -5\r\n\r\n")
    rows = warc.parse_warc_bytes("f", hdr + b"xxxx\r\n\r\n")
    assert rows[0]["parse_ok"] is False
    assert "Content-Length" in rows[0]["error"]


def test_non_ascii_iri_round_trips_and_crlf_uri_rejected():
    import pytest as _pytest
    uri = "http://x.test/caf\u00e9/\u65e5\u672c"
    data = warc.build_warc([{"uri": uri, "body": b"b"}])
    (r,) = warc.parse_warc_bytes("f", data)
    assert r["parse_ok"] and r["target_uri"] == uri
    with _pytest.raises(ValueError, match="CR/LF"):
        warc.build_warc([{"uri": "http://x.test/a\r\nInjected: h",
                          "body": b""}])


def test_all_header_values_reject_injection():
    import pytest as _pytest
    with _pytest.raises(ValueError, match="CR/LF in date"):
        warc.build_warc([{"uri": "http://x", "body": b"",
                          "date": "2024\r\nWARC-Type: forged"}])
    with _pytest.raises(ValueError, match="CR/LF in content_type"):
        warc.build_warc([{"uri": "http://x", "body": b"",
                          "content_type": "text/html\r\nX: y"}])
    with _pytest.raises(ValueError, match="non-ASCII content_type"):
        warc.build_warc([{"uri": "http://x", "body": b"",
                          "content_type": "text/caf\u00e9"}])


def test_non_response_record_has_null_http_fields():
    body = b"software: test\r\n"
    hdr = (b"WARC/1.0\r\n"
           b"WARC-Type: warcinfo\r\n"
           b"WARC-Record-ID: <urn:uuid:00>\r\n"
           b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n")
    rows = warc.parse_warc_bytes("f", hdr + body + b"\r\n\r\n")
    (r,) = rows
    assert r["parse_ok"] and r["warc_type"] == "warcinfo"
    assert r["http_status"] is None and r["body"] == body


def test_read_warc_distributed(spark, tmp_path):
    """Three files -> one task each through binaryFile + mapInPandas;
    every record lands with its source file attached and the scan
    stage plans no shuffle."""
    for i in range(3):
        recs = [{"uri": f"http://x.test/{i}/{j}",
                 "body": f"doc {i}-{j}".encode()} for j in range(4)]
        (tmp_path / f"part{i}.warc").write_bytes(
            warc.build_warc(recs, compress=(i == 2)))
    df = warc.read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 12 and all(r.parse_ok for r in rows)
    assert len({r.warc_file for r in rows}) == 3
    got = {(r.target_uri, bytes(r.body).decode()) for r in rows}
    assert ("http://x.test/2/3", "doc 2-3") in got
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
