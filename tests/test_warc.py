"""WARC framing tests: adversarial payloads, truncation, version guard."""

from __future__ import annotations

import pytest

from realestatedeals_spark.io.warc import build_warc, parse_warc


def test_warc_roundtrip_with_adversarial_payloads():
    """Payloads containing CRLFCRLF and fake header blocks must survive —
    the reason framing uses Content-Length, never delimiter splits."""
    recs = [
        ("https://x/1", b"plain body"),
        ("https://x/2", b"evil\r\n\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\nxyz"),
        ("https://x/3", b""),
        ("https://x/4", bytes(range(256)) * 4),
    ]
    out = parse_warc(build_warc(recs))
    assert [(h["WARC-Target-URI"], p) for h, p in out] == recs
    assert all(h["WARC-Type"] == "response" for h, _ in out)


def test_warc_malformed_is_typed():
    data = build_warc([("https://x/1", b"abcdef")])
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(data[:-10])
    with pytest.raises(ValueError, match="version"):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\n")
    # missing Content-Length
    with pytest.raises(ValueError, match="Content-Length"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")
    with pytest.raises(ValueError, match="not terminated"):
        parse_warc(b"WARC/1.0\r\nWARC-Type: response")
    assert parse_warc(b"") == []


def test_warc_gz_member_per_record_roundtrip():
    """Multi-member .warc.gz: records roundtrip through per-record gzip
    members; the stream is plain concatenation (members countable), and a
    truncated member raises a typed error."""
    import gzip

    from realestatedeals_spark.io.warc import build_warc_gz, parse_warc_gz

    recs = [
        ("https://x/1", b"alpha"),
        ("https://x/2", b"evil\r\n\r\nWARC/1.0 fake"),
        ("https://x/3", bytes(range(256))),
    ]
    gz = build_warc_gz(recs)
    out = parse_warc_gz(gz)
    assert [(h["WARC-Target-URI"], p) for h, p in out] == recs
    # member-per-record: stream equals the concat of single-record gz blobs
    assert gz.count(b"\x1f\x8b\x08") == 3
    with pytest.raises(ValueError, match="truncated gzip"):
        parse_warc_gz(gz[:-6])
    # a single-member (non-CC-style) gzip of the whole file still parses
    from realestatedeals_spark.io.warc import build_warc

    whole = gzip.compress(build_warc(recs), mtime=0)
    assert [(h["WARC-Target-URI"], p) for h, p in parse_warc_gz(whole)] == recs
