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


def _bitlen64(x: np.ndarray) -> np.ndarray:
    """Vectorized int.bit_length for uint64 arrays (0 → 0).

    Split into 32-bit halves so the float64 conversion is exact, then
    floor(log2): for 32-bit ints the gap between x and the next power of two
    (>= 1/(2^32 ln 2) in log2 units) dwarfs the ulp of the result, so the
    floor can't round across a boundary. Direct 64-bit log2 would NOT be
    safe (conversion itself rounds past 2^53)."""
    hi = (x >> np.uint64(32)).astype(np.float64)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.float64)
    with np.errstate(divide="ignore"):
        blh = np.floor(np.log2(hi)) + 33.0   # -inf where hi == 0
        bll = np.floor(np.log2(lo)) + 1.0    # -inf where lo == 0
    return np.maximum(np.maximum(blh, bll), 0.0).astype(np.int64)


def _pack_tokens(vals: np.ndarray, widths: np.ndarray) -> bytes:
    """Pack variable-width bit tokens (each <= 32 bits) MSB-first.

    Vectorized: cumulative bit offsets place every token; each token is
    left-shifted to its byte-aligned end and OR-merged byte-wise into the
    buffer (np.bitwise_or.at handles boundary bytes shared by two tokens).
    A shifted token spans <= ceil((32+7)/8) = 5 bytes.
    """
    widths64 = widths.astype(np.int64)
    end = np.cumsum(widths64)
    total = int(end[-1]) if len(end) else 0
    if total == 0:
        return b""
    start = end - widths64
    shift = ((-end) % 8).astype(np.uint64)
    shifted = vals.astype(np.uint64) << shift
    first = start >> 3
    last = ((end + ((-end) % 8)) >> 3) - 1
    buf = np.zeros((total + 7) >> 3, dtype=np.uint8)
    nbyte = last - first + 1
    for j in range(5):
        sel = nbyte > j
        if not sel.any():
            break
        byte = (shifted[sel] >> np.uint64(8 * j)) & np.uint64(0xFF)
        np.bitwise_or.at(buf, last[sel] - j, byte.astype(np.uint8))
    return buf.tobytes()


# Below this length the ~0.4 ms fixed cost of the vectorized path (25+
# numpy dispatches on tiny arrays) exceeds the per-point loop entirely;
# measured crossover ~150 points on this host.
_SMALL_N = 192


def _encode_small(header: bytes, ts: np.ndarray, values: np.ndarray) -> bytes:
    """Per-point encode loop — faster than the vectorized path for short
    series (daily-tier blobs are often < 100 points at fine chunking).
    Value windows use the paper's shrink-fit reuse; the decoder is policy-
    agnostic (it follows the control bits), so the two paths interoperate."""
    w = _BitWriter()
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
            w.write(0, 1)
            w.write(x >> (64 - prev_lead - prev_mean), prev_mean)
        else:
            w.write(1, 1)
            w.write(lead, 6)
            w.write(meaningful - 1, 6)  # 1..64 stored as 0..63
            w.write(x >> trail, meaningful)
            prev_lead, prev_mean = lead, meaningful
    return header + w.getvalue()


def gorilla_encode(ts: np.ndarray, values: np.ndarray) -> bytes:
    """Encode int64 timestamps (sorted) + float64 values into a Gorilla blob.

    Long series: fully vectorized (no per-point Python) — delta-of-delta
    classes via np.select, XOR lead/trail via vectorized bit-length, one
    variable-width token pack at the end. The value-window policy there is
    'reuse iff (lead, trail) exactly match the previous nonzero XOR' —
    unlike the paper's shrink-fit rule this is expressible as a vector
    compare (no sequential window state); any policy is valid Gorilla, the
    decoder follows the control bits (paper §4.1.2 explicitly leaves the
    reuse heuristic to the encoder). Short series (< _SMALL_N) dispatch to
    the per-point loop, which beats numpy's fixed dispatch cost there.
    """
    ts = np.asarray(ts, dtype=np.int64)
    values = np.asarray(values, dtype=np.float64)
    n = len(ts)
    if len(values) != n:
        raise ValueError(
            f"ts/values length mismatch: {n} vs {len(values)}")
    header = _MAGIC + struct.pack(">I", n)
    if n == 0:
        return header
    header += struct.pack(">q", int(ts[0]))
    header += struct.pack(">Q", int(values[:1].view(np.uint64)[0]))
    if n == 1:
        return header
    if n < _SMALL_N:
        return _encode_small(header, ts, values)

    m = n - 1
    # ---- timestamp tokens: dod class prefix + payload (64b split 32+32)
    deltas = np.diff(ts)
    dods = np.empty(m, dtype=np.int64)
    dods[0] = deltas[0]
    np.subtract(deltas[1:], deltas[:-1], out=dods[1:])
    cls = np.select(
        [dods == 0,
         (dods >= -63) & (dods <= 64),
         (dods >= -255) & (dods <= 256),
         (dods >= -2047) & (dods <= 2048)],
        [0, 1, 2, 3], default=4)
    du = dods.view(np.uint64)  # two's complement bits
    tv = np.zeros((m, 3), dtype=np.uint64)
    tw = np.zeros((m, 3), dtype=np.uint8)
    tv[:, 0] = np.array([0b0, 0b10, 0b110, 0b1110, 0b1111],
                        dtype=np.uint64)[cls]
    tw[:, 0] = np.array([1, 2, 3, 4, 4], dtype=np.uint8)[cls]
    # biased payloads wrap correctly in two's-complement uint64 arithmetic
    tv[:, 1] = np.select(
        [cls == 1, cls == 2, cls == 3, cls == 4],
        [(du + np.uint64(63)) & np.uint64(0x7F),
         (du + np.uint64(255)) & np.uint64(0x1FF),
         (du + np.uint64(2047)) & np.uint64(0xFFF),
         du >> np.uint64(32)],
        default=np.uint64(0))
    tw[:, 1] = np.array([0, 7, 9, 12, 32], dtype=np.uint8)[cls]
    tv[:, 2] = du & np.uint64(0xFFFFFFFF)
    tw[:, 2] = np.where(cls == 4, 32, 0).astype(np.uint8)

    # ---- value tokens: ctrl + optional 12b window header + mbits (split)
    bits = values.view(np.uint64)
    xors = bits[1:] ^ bits[:-1]
    nz = xors != 0
    bl = _bitlen64(xors).astype(np.int64)
    lead = np.minimum(64 - bl, 31)          # paper caps the 6b lead field
    low = xors & (~xors + np.uint64(1))     # x & -x
    trail = _bitlen64(low).astype(np.int64) - 1   # -1 on zero xor (unused)
    mean = 64 - lead - trail
    idxnz = np.flatnonzero(nz)
    reuse = np.zeros(m, dtype=bool)
    if len(idxnz) > 1:
        same = ((lead[idxnz[1:]] == lead[idxnz[:-1]])
                & (trail[idxnz[1:]] == trail[idxnz[:-1]]))
        reuse[idxnz[1:][same]] = True
    new = nz & ~reuse
    vv = np.zeros((m, 4), dtype=np.uint64)
    vw = np.zeros((m, 4), dtype=np.uint8)
    vw[:, 0] = np.where(nz, 2, 1).astype(np.uint8)
    vv[:, 0] = np.where(reuse, np.uint64(0b10),
                        np.where(nz, np.uint64(0b11), np.uint64(0)))
    vw[new, 1] = 12
    vv[new, 1] = ((lead[new].astype(np.uint64) << np.uint64(6))
                  | (mean[new] - 1).astype(np.uint64))
    trail_u = np.where(nz, trail, 0).astype(np.uint64)
    mb = xors >> trail_u                     # fits in `mean` bits by design
    vw[:, 2] = np.where(nz & (mean > 32), mean - 32, 0).astype(np.uint8)
    vv[:, 2] = mb >> np.uint64(32)
    vw[:, 3] = np.where(nz, np.minimum(mean, 32), 0).astype(np.uint8)
    vv[:, 3] = mb & np.uint64(0xFFFFFFFF)

    allw = np.concatenate([tw.ravel(), vw.ravel()])
    allv = np.concatenate([tv.ravel(), vv.ravel()])
    used = allw > 0
    return header + _pack_tokens(allv[used], allw[used])


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
