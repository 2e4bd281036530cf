"""Real FLAC codec (lossless), mono 16-bit subset, from the public format
spec (xiph.org FLAC format / RFC 9639 structure): fLaC magic + STREAMINFO
metadata block, frame headers with extended-UTF-8 frame numbers and CRC-8,
subframes (CONSTANT / VERBATIM / FIXED orders 0-4) with Rice-coded
residuals (4- and 5-bit parameter variants, partition orders, escape
codes), frame CRC-16, and the STREAMINFO MD5 of the unencoded PCM verified
on decode. LPC subframes are a typed decode boundary (the encoder here
only emits fixed predictors, which are already lossless).

Unlike the WAV/G.711/ADPCM paths this is an actual compressing *lossless*
codec: decode(encode(x)) == x bit-for-bit, which is what lets
x5_flac_roundtrip carry a plain arithmetic SQL oracle over the synthesized
signal (plans/multimodal.py) — no codec replay needed on the oracle side.

Reference parity: the RealEstateDeals reference stores media URLs as
opaque strings (reference listing.py:9 ``photoUrl``); this module is part
of the media-decode surface a 100 TB training-data pipeline needs on top
of that hook.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_SYNC = 0b11111111111110  # 14-bit frame sync


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial x^8+x^2+x+1 (0x07), init 0 — FLAC frame header CRC."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial x^16+x^15+x^2+1 (0x8005), init 0 — FLAC frame CRC."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_coded_number(n: int) -> bytes:
    """FLAC's extended UTF-8 coding for frame numbers (UTF-8 shape, but
    allowed up to 36 bits / 7 bytes)."""
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    # nbytes-byte shape carries (7 - nbytes) lead bits + 6 per trail byte
    # = 5*nbytes + 1 payload bits (36 for the 7-byte shape)
    nbytes = 2
    while nbytes < 7 and bits > 5 * nbytes + 1:
        nbytes += 1
    for i in range(nbytes - 1):
        out.append(0x80 | (n & 0x3F))
        n >>= 6
    lead_mask = (0xFF << (8 - nbytes)) & 0xFF
    out.append(lead_mask | n)
    return bytes(reversed(out))


class _MsbWriter:
    """MSB-first bit writer (no byte stuffing — FLAC is not JPEG)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def put_unary(self, q: int) -> None:
        while q >= 32:
            self.put(0, 32)
            q -= 32
        self.put(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.put(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


class _MsbReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.bitpos = pos * 8

    def bits(self, n: int) -> int:
        if self.bitpos + n > len(self.data) * 8:
            raise ValueError("truncated FLAC stream")
        v = 0
        for _ in range(n):
            byte = self.data[self.bitpos >> 3]
            v = (v << 1) | ((byte >> (7 - (self.bitpos & 7))) & 1)
            self.bitpos += 1
        return v

    def signed(self, n: int) -> int:
        v = self.bits(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.bits(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7

    def bytepos(self) -> int:
        assert self.bitpos % 8 == 0
        return self.bitpos >> 3


def _zigzag(e: np.ndarray) -> np.ndarray:
    return np.where(e >= 0, e << 1, (-e << 1) - 1)


def _best_rice_k(u: np.ndarray, kmax: int = 14) -> tuple[int, int]:
    """(k, total_bits) minimizing Rice cost sum(u>>k) + n*(k+1)."""
    best_k, best_cost = 0, None
    for k in range(kmax + 1):
        cost = int((u >> k).sum()) + len(u) * (k + 1)
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    return best_k, best_cost


def encode_flac(samples: np.ndarray, sample_rate: int = 8000, block_size: int = 4096) -> bytes:
    """Encode mono 16-bit PCM as a real FLAC stream: per block, pick the
    fixed predictor order 0-4 with the cheapest Rice-coded residual
    (escape-coded raw if even order-0 residuals are wide), warmup samples
    verbatim, partition order 0. Emits STREAMINFO with the true MD5 of the
    PCM so the decoder can verify losslessness end-to-end."""
    s = np.asarray(samples, dtype=np.int64)
    if len(s) == 0:
        raise ValueError("empty signal")
    if s.min() < -32768 or s.max() > 32767:
        raise ValueError("16-bit range exceeded")
    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()

    frames = bytearray()
    frame_lens: list[int] = []
    for fno, b0 in enumerate(range(0, len(s), block_size)):
        block = s[b0 : b0 + block_size]
        n = len(block)
        hdr = bytearray()
        # sync(14) + reserved(1)=0 + blocking strategy(1)=0 (fixed, frame no.)
        hdr += struct.pack(">H", (_SYNC << 2) | 0)
        # blocksize code 0111 (16-bit field), sample rate code 0000 (STREAMINFO)
        hdr.append((0b0111 << 4) | 0b0000)
        # channel 0000 (mono), sample size 100 (16-bit), reserved 0
        hdr.append((0b0000 << 4) | (0b100 << 1) | 0)
        hdr += _utf8_coded_number(fno)
        hdr += struct.pack(">H", n - 1)
        hdr.append(_crc8(bytes(hdr)))

        bw = _MsbWriter()
        if n > 1 and int(block.min()) == int(block.max()):
            # CONSTANT subframe: one verbatim sample covers the block
            bw.put(0, 1)
            bw.put(0, 6)
            bw.put(0, 1)
            bw.put(int(block[0]) & 0xFFFF, 16)
            bw.align()
            frame = bytes(hdr) + bw.bytes()
            frame += struct.pack(">H", _crc16(frame))
            frames += frame
            frame_lens.append(len(frame))
            continue
        # choose fixed order: successive differences, cheapest rice cost
        best = None  # (cost, order, resid, k)
        resid = block
        for order in range(0, 5):
            if order > 0:
                if len(resid) < 2:
                    break
                resid = np.diff(resid)
            if n <= order:
                break
            u = _zigzag(resid)
            k, cost = _best_rice_k(u)
            cost += order * 16  # warmup bits
            if best is None or cost < best[0]:
                best = (cost, order, resid, k)
        _, order, resid, k = best
        # subframe header: 0 + 001xxx (fixed, order) + wasted-bits 0
        bw.put(0, 1)
        bw.put(0b001000 | order, 6)
        bw.put(0, 1)
        for w in block[:order]:
            bw.put(int(w) & 0xFFFF, 16)
        u = _zigzag(resid)
        # escape (raw) width: smallest signed width covering the residuals
        lo, hi = int(resid.min()), int(resid.max())
        esc_w = 1
        while not (-(1 << (esc_w - 1)) <= lo and hi <= (1 << (esc_w - 1)) - 1):
            esc_w += 1
        escape_cost = 4 + 5 + len(u) * esc_w
        if best[0] - order * 16 > escape_cost:
            # method 00, partition order 0, escape param 1111, raw width
            bw.put(0b00, 2)
            bw.put(0, 4)
            bw.put(0b1111, 4)
            bw.put(esc_w, 5)
            for e in resid:
                bw.put(int(e) & ((1 << esc_w) - 1), esc_w)
        else:
            bw.put(0b00, 2)
            bw.put(0, 4)
            bw.put(k, 4)
            for val in u:
                bw.put_unary(int(val) >> k)
                bw.put(int(val) & ((1 << k) - 1), k)
        bw.align()
        frame = bytes(hdr) + bw.bytes()
        frame += struct.pack(">H", _crc16(frame))
        frames += frame
        frame_lens.append(len(frame))

    streaminfo = bytearray()
    streaminfo += struct.pack(">HH", min(block_size, len(s)), block_size)
    for fl in (min(frame_lens), max(frame_lens)):
        streaminfo += struct.pack(">I", fl)[1:]  # 24-bit
    # sample_rate(20) | channels-1(3) | bps-1(5) | total(36) = 64 bits
    packed = (sample_rate << 44) | (0 << 41) | (15 << 36) | len(s)
    streaminfo += struct.pack(">Q", packed)
    streaminfo += md5
    assert len(streaminfo) == 34
    out = b"fLaC"
    out += bytes([0x80 | 0]) + struct.pack(">I", 34)[1:] + bytes(streaminfo)
    return out + bytes(frames)


def decode_flac(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a mono 16-bit FLAC stream: STREAMINFO + frame walk with CRC-8
    (header) and CRC-16 (frame) verification, CONSTANT/VERBATIM/FIXED
    subframes, Rice residuals at any partition order incl. escapes, and a
    final MD5 check against STREAMINFO. LPC subframes raise typed
    NotImplementedError (encoder never emits them)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream")
    pos = 4
    rate = total = bps = None
    md5_want = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("truncated FLAC metadata")
        hdr = data[pos]
        btype, last = hdr & 0x7F, hdr & 0x80
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1 : pos + 4])
        body = data[pos + 4 : pos + 4 + blen]
        if btype == 0:
            packed = struct.unpack(">Q", body[10:18])[0]
            rate = packed >> 44
            channels = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            md5_want = body[18:34]
            if channels != 1 or bps != 16:
                raise NotImplementedError(f"FLAC channels={channels} bps={bps}: mono 16-bit decoded here")
        pos += 4 + blen
        if last:
            break
    if rate is None:
        raise ValueError("missing STREAMINFO")

    out: list[int] = []
    while len(out) < total:
        frame_start = pos
        br = _MsbReader(data, pos)
        sync = br.bits(14)
        if sync != _SYNC:
            raise ValueError("lost frame sync")
        br.bits(1)  # reserved
        br.bits(1)  # blocking strategy
        bs_code = br.bits(4)
        sr_code = br.bits(4)
        ch_code = br.bits(4)
        ss_code = br.bits(3)
        br.bits(1)  # reserved
        if ch_code != 0 or ss_code != 0b100:
            raise NotImplementedError("only mono 16-bit frames decoded here")
        # extended UTF-8 frame number: skip by shape
        lead = br.bits(8)
        extra = 0
        if lead >= 0xC0:
            while (lead << extra) & 0x40:
                extra += 1
                br.bits(8)
        if bs_code == 0b0110:
            n = br.bits(8) + 1
        elif bs_code == 0b0111:
            n = br.bits(16) + 1
        elif 0b0010 <= bs_code <= 0b0101:
            n = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            n = 256 << (bs_code - 8)
        else:
            raise ValueError(f"bad blocksize code {bs_code}")
        if sr_code == 0b1100:
            br.bits(8)
        elif sr_code in (0b1101, 0b1110):
            br.bits(16)
        hdr_len = (br.bitpos // 8) - frame_start
        crc8_got = br.bits(8)
        if _crc8(data[frame_start : frame_start + hdr_len]) != crc8_got:
            raise ValueError("frame header CRC-8 mismatch")

        # one subframe (mono)
        if br.bits(1) != 0:
            raise ValueError("bad subframe padding bit")
        sft = br.bits(6)
        wasted = 0
        if br.bits(1):
            wasted = 1 + br.unary()
        width = 16 - wasted
        if sft == 0:  # CONSTANT
            v = br.signed(width)
            block = np.full(n, v, dtype=np.int64)
        elif sft == 1:  # VERBATIM
            block = np.array([br.signed(width) for _ in range(n)], dtype=np.int64)
        elif 0b001000 <= sft <= 0b001100:  # FIXED order 0-4
            order = sft & 0x7
            warm = [br.signed(width) for _ in range(order)]
            method = br.bits(2)
            if method > 1:
                raise ValueError("reserved residual method")
            pbits = 4 if method == 0 else 5
            po = br.bits(4)
            nparts = 1 << po
            resid: list[int] = []
            for p in range(nparts):
                cnt = (n >> po) - (order if p == 0 else 0)
                param = br.bits(pbits)
                if param == (1 << pbits) - 1:  # escape: raw with given width
                    rw = br.bits(5)
                    resid.extend(br.signed(rw) if rw else 0 for _ in range(cnt))
                else:
                    for _ in range(cnt):
                        q = br.unary()
                        u = (q << param) | br.bits(param)
                        resid.append((u >> 1) ^ -(u & 1))
            block = np.empty(n, dtype=np.int64)
            block[:order] = warm
            coef = {
                0: [],
                1: [1],
                2: [2, -1],
                3: [3, -3, 1],
                4: [4, -6, 4, -1],
            }[order]
            for i in range(order, n):
                acc = resid[i - order]
                for j, c in enumerate(coef):
                    acc += c * block[i - 1 - j]
                block[i] = acc
        elif sft >= 0b100000:
            raise NotImplementedError("FLAC LPC subframe: fixed predictors decoded here")
        else:
            raise ValueError(f"reserved subframe type {sft:06b}")
        if wasted:
            block = block << wasted
        br.align()
        body_end = br.bytepos()
        if body_end + 2 > len(data):
            raise ValueError("truncated FLAC frame footer")
        crc16_got = struct.unpack(">H", data[body_end : body_end + 2])[0]
        if _crc16(data[frame_start:body_end]) != crc16_got:
            raise ValueError("frame CRC-16 mismatch")
        pos = body_end + 2
        out.extend(int(v) for v in block)

    got = np.array(out[:total], dtype=np.int32)
    if md5_want != b"\x00" * 16 and hashlib.md5(got.astype("<i2").tobytes()).digest() != md5_want:
        raise ValueError("decoded PCM fails STREAMINFO MD5")
    return rate, got
