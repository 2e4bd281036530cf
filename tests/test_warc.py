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
