"""Minimal REAL WARC/1.0 reader+writer (ISO 28500 record framing) — the
de-facto interchange format every web-crawl corpus arrives in. Records
are framed by ``Content-Length`` (spec-correct: payloads are opaque bytes
and may contain anything, so a delimiter split would be wrong), each
record being a header block terminated by CRLFCRLF, the payload, and a
trailing CRLFCRLF.

Scale shape: one WARC file = one binary row; record splitting happens
per-file inside mapInPandas (Arrow-batched), so a 100 TB crawl parses as
an embarrassingly parallel scan over file rows — the same shape as the
codec operators. io_warc_scan (plans/mor_delete_plan.py) proves payload
fidelity end-to-end with an md5 oracle.

Reference parity: the reference fetches pages one requests.get at a time
(hunter.py); WARC is what those responses look like when a crawler
archives them for pipeline consumption.
"""

from __future__ import annotations


def build_warc(records: list[tuple[str, bytes]]) -> bytes:
    """Serialize (target_uri, payload) pairs as WARC/1.0 response records."""
    out = bytearray()
    for uri, payload in records:
        hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            f"Content-Length: {len(payload)}\r\n"
            "\r\n"
        )
        out += hdr.encode("utf-8") + payload + b"\r\n\r\n"
    return bytes(out)


def parse_warc(data: bytes) -> list[tuple[dict, bytes]]:
    """Parse a WARC byte stream into (headers, payload) records, framed by
    Content-Length. Raises on malformed version lines, missing lengths,
    or truncated payloads — per-record, so a caller can quarantine."""
    records: list[tuple[dict, bytes]] = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding of CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        end_hdr = data.find(b"\r\n\r\n", pos)
        if end_hdr < 0:
            raise ValueError("WARC header block not terminated")
        head_lines = data[pos:end_hdr].decode("utf-8", errors="strict").split("\r\n")
        if not head_lines[0].startswith("WARC/"):
            raise ValueError(f"bad WARC version line: {head_lines[0]!r}")
        headers = {}
        for line in head_lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip()] = v.strip()
        if "Content-Length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        length = int(headers["Content-Length"])
        body_start = end_hdr + 4
        if body_start + length > n:
            raise ValueError("truncated WARC payload")
        records.append((headers, data[body_start : body_start + length]))
        pos = body_start + length
    return records


def build_warc_gz(records: list[tuple[str, bytes]]) -> bytes:
    """Common-Crawl-style .warc.gz: each record is its OWN gzip member
    (concatenated members are a valid gzip stream), which is what makes
    per-record random access possible given an offset index."""
    import gzip

    out = bytearray()
    for uri, payload in records:
        out += gzip.compress(build_warc([(uri, payload)]), mtime=0)
    return bytes(out)


def parse_warc_gz(data: bytes) -> list[tuple[dict, bytes]]:
    """Parse a multi-member gzip WARC stream: decompress member-by-member
    (zlib ``unused_data`` gives the next member's start), then frame each
    member's records by Content-Length as usual."""
    import zlib

    records: list[tuple[dict, bytes]] = []
    rest = data
    while rest:
        d = zlib.decompressobj(wbits=31)  # gzip wrapper
        chunk = d.decompress(rest)
        if not d.eof:
            raise ValueError("truncated gzip member in .warc.gz")
        records.extend(parse_warc(chunk))
        rest = d.unused_data
    return records
