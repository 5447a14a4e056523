"""Gorilla time-series compression (Facebook Gorilla, VLDB'15 §4.1).

Deterministic byte encoding of one (timestamps, values) series:

- timestamps: delta-of-delta with the paper's bucket code
  (0 | 10+7b | 110+9b | 1110+12b | 1111+64b full delta-of-delta)
- values: XOR with previous; '0' if identical, else '1' + ('0' reuse previous
  leading/meaningful window | '1' + 6b leading + 6b meaningful-length) + bits

decode(encode(ts, v)) == (ts, v) bit-exact — property-tested. Used as the
blob payload of the rollup sink (one blob per (url, bucket_start, tier)).
The reference has no compressed storage (SURVEY.md §2.1 S4); this implements
the north rule's storage format from the public paper.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["gorilla_encode", "gorilla_decode"]

_MAGIC = b"GTS1"


class _BitWriter:
    """Accumulates bits MSB-first, flushing whole bytes to a bytearray.

    Keeping the accumulator bounded (< 8 bits after each write) makes the
    writer O(total_bits): a single growing big-int accumulator costs
    O(total_bits) PER WRITE (every shift copies the whole integer), which is
    quadratic and dominates encode time for multi-KB blobs.
    """
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        nbits = self.nbits + bits
        while nbits >= 8:
            nbits -= 8
            self.buf.append((acc >> nbits) & 0xFF)
        self.acc = acc & ((1 << nbits) - 1)
        self.nbits = nbits

    def getvalue(self) -> bytes:
        out = bytes(self.buf)
        if self.nbits:
            out += bytes([(self.acc << ((-self.nbits) % 8)) & 0xFF])
        return out


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        # O(bits/8) slice extraction instead of per-bit looping
        start = self.pos >> 3
        end = (self.pos + bits + 7) >> 3
        chunk = int.from_bytes(self.data[start:end], "big")
        tail = (end << 3) - (self.pos + bits)
        self.pos += bits
        return (chunk >> tail) & ((1 << bits) - 1)


def _clz64(x: int) -> int:
    return 64 - x.bit_length() if x else 64


def gorilla_encode(ts: np.ndarray, values: np.ndarray) -> bytes:
    """Encode int64 timestamps (sorted) + float64 values into a Gorilla blob."""
    ts = np.asarray(ts, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    n = len(ts)
    header = _MAGIC + struct.pack(">I", n)
    if n == 0:
        return header
    header += struct.pack(">q", int(ts[0]))
    header += struct.pack(">Q", int(np.float64(values[0]).view(np.uint64)))
    if n == 1:
        return header

    w = _BitWriter()
    # timestamps
    deltas = np.diff(ts)
    dods = np.diff(np.concatenate(([np.int64(0)], deltas)))
    for dod in dods.tolist():
        if dod == 0:
            w.write(0, 1)
        elif -63 <= dod <= 64:
            w.write(0b10, 2)
            w.write(dod + 63, 7)
        elif -255 <= dod <= 256:
            w.write(0b110, 3)
            w.write(dod + 255, 9)
        elif -2047 <= dod <= 2048:
            w.write(0b1110, 4)
            w.write(dod + 2047, 12)
        else:
            w.write(0b1111, 4)
            w.write(dod & ((1 << 64) - 1), 64)

    # values
    bits = values.view(np.uint64)
    xors = (bits[1:] ^ bits[:-1]).tolist()
    prev_lead, prev_mean = 65, 0  # invalid window → first nonzero xor writes one
    for x in xors:
        if x == 0:
            w.write(0, 1)
            continue
        w.write(1, 1)
        lead = _clz64(x)
        if lead > 31:
            lead = 31  # paper caps leading-zero field
        trail = (x & -x).bit_length() - 1
        meaningful = 64 - lead - trail
        if (prev_lead <= lead and
                (64 - prev_lead - prev_mean) <= trail):
            # fits inside previous window
            w.write(0, 1)
            w.write(x >> (64 - prev_lead - prev_mean), prev_mean)
        else:
            w.write(1, 1)
            w.write(lead, 6)
            w.write(meaningful - 1, 6)  # 1..64 stored as 0..63
            w.write(x >> trail, meaningful)
            prev_lead, prev_mean = lead, meaningful
    return header + w.getvalue()


def _decode_ts_slow(r: "_BitReader", ts: np.ndarray, start: int, delta: int):
    """General delta-of-delta walk from ts[start-1] with running ``delta``.

    Inlined bit reads (peek the 4-bit class prefix once per point) — the
    method-dispatch version ran ~2x slower on irregular series.
    """
    data = bytes(r.data) + b"\x00" * 10
    pos = r.pos
    from_bytes = int.from_bytes
    t = int(ts[start - 1])
    for i in range(start, len(ts)):
        s = pos >> 3
        chunk = from_bytes(data[s:s + 2], "big")
        cls = (chunk >> (12 - (pos & 7))) & 0xF
        if cls < 8:            # '0'
            pos += 1
            dod = 0
        else:
            if cls < 12:       # '10' + 7
                pos += 2
                k, bias = 7, 63
            elif cls < 14:     # '110' + 9
                pos += 3
                k, bias = 9, 255
            elif cls == 14:    # '1110' + 12
                pos += 4
                k, bias = 12, 2047
            else:              # '1111' + 64
                pos += 4
                k, bias = 64, 0
            e = (pos + k + 7) >> 3
            chunk = from_bytes(data[pos >> 3:e], "big")
            dod = (chunk >> ((e << 3) - (pos + k))) & ((1 << k) - 1)
            pos += k
            if k == 64:
                if dod >= (1 << 63):
                    dod -= 1 << 64
            else:
                dod -= bias
        delta += dod
        t += delta
        ts[i] = t
    r.pos = pos


def gorilla_decode(blob: bytes):
    """Decode a blob → (ts int64 array, values float64 array)."""
    if blob[:4] != _MAGIC:
        raise ValueError("bad gorilla magic")
    (n,) = struct.unpack(">I", blob[4:8])
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float64)
    (t0,) = struct.unpack(">q", blob[8:16])
    (v0_bits,) = struct.unpack(">Q", blob[16:24])
    ts = np.empty(n, dtype=np.int64)
    vals_bits = np.empty(n, dtype=np.uint64)
    ts[0] = t0
    vals_bits[0] = v0_bits
    if n == 1:
        return ts, vals_bits.view(np.float64)

    r = _BitReader(blob[24:])
    # Fast path — regular cadence (the daily/hourly tier layout): the first
    # dod is a '1111'+64b full delta, every later dod is a single '0' bit.
    # One vectorized check replaces the per-point control-bit walk.
    if n >= 3 and r.read(4) == 0b1111:
        delta0 = r.read(64)
        if delta0 >= (1 << 63):
            delta0 -= 1 << 64
        probe = _BitReader(blob[24:])
        probe.pos = 68
        ntail = n - 2
        if probe.read(ntail) == 0:
            ts[1:] = t0 + delta0 * np.arange(1, n, dtype=np.int64)
            r.pos = 68 + ntail
        else:
            # irregular: first dod fully consumed (pos already 68)
            ts[1] = t0 + delta0
            _decode_ts_slow(r, ts, 2, delta0)
    else:
        r.pos = 0
        _decode_ts_slow(r, ts, 1, 0)

    # value stream: hot loop with inlined bit reads (method dispatch and a
    # per-point np.uint64() construction measured ~2x of the decode cost)
    data = bytes(r.data) + b"\x00" * 10  # pad: end-of-stream peeks read full width
    pos = r.pos
    prev = int(v0_bits)
    prev_lead, prev_mean = 65, 0
    out = vals_bits
    from_bytes = int.from_bytes
    for i in range(1, n):
        # peek 2 control bits without advancing
        s = pos >> 3
        chunk = from_bytes(data[s:s + 2], "big")
        ctrl = (chunk >> (14 - (pos & 7))) & 3
        if ctrl < 2:  # '0x' → repeat previous value
            pos += 1
            out[i] = prev
            continue
        if ctrl == 2:  # '10' → reuse previous window
            pos += 2
            k = prev_mean
            e = (pos + k + 7) >> 3
            chunk = from_bytes(data[pos >> 3:e], "big")
            mbits = (chunk >> ((e << 3) - (pos + k))) & ((1 << k) - 1)
            pos += k
            prev ^= mbits << (64 - prev_lead - prev_mean)
        else:  # '11' → new window: 6b lead + 6b (meaningful-1) + bits
            pos += 2
            e = (pos + 12 + 7) >> 3
            chunk = from_bytes(data[pos >> 3:e], "big")
            hdr = (chunk >> ((e << 3) - (pos + 12))) & 0xFFF
            pos += 12
            lead = hdr >> 6
            mean = (hdr & 63) + 1
            e = (pos + mean + 7) >> 3
            chunk = from_bytes(data[pos >> 3:e], "big")
            mbits = (chunk >> ((e << 3) - (pos + mean))) & ((1 << mean) - 1)
            pos += mean
            prev ^= mbits << (64 - lead - mean)
            prev_lead, prev_mean = lead, mean
        out[i] = prev
    return ts, vals_bits.view(np.float64)
