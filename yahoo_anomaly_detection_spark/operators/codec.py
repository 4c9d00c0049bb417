"""Gorilla XOR (values) + delta-of-delta (timestamps) codec.

North-rule component (no reference counterpart — the reference keeps
raw float32 tensors in memory, /root/reference/StatsTesting/
base_anomaly_stats.py:23). Format follows the Gorilla paper
(Pelkonen et al., VLDB 2015, "Gorilla: A Fast, Scalable, In-Memory
Time Series Database"):

Timestamps (int64 microseconds):
    header: t0 as raw 64 bits, then delta0 as zigzag-varint-free
    raw 64 bits; each subsequent point stores D = Δt_i − Δt_{i−1}:
        D == 0                → '0'
        D ∈ [−63, 64]         → '10'  + 7  bits of D+63
        D ∈ [−255, 256]       → '110' + 9  bits of D+255
        D ∈ [−2047, 2048]     → '1110'+ 12 bits of D+2047
        else                  → '1111'+ 64 bits (microsecond-safe
                                 widening of the paper's 32)

Values (float64 bit patterns, XOR with previous):
        xor == 0              → '0'
        fits previous window  → '10' + meaningful bits
        else                  → '11' + 5 bits #leading-zeros
                                 + 6 bits meaningful-length(1..64,
                                 stored mod 64) + meaningful bits

Pure-Python encode/decode cores (unit-testable off-Spark, property
round-trip in tests) + Spark wrappers that run them as vectorized
Arrow-batched pandas UDFs over per-(conv_id, coarse-bucket) arrays
assembled with ``sort_array(collect_list(struct(ts, v)))`` — one
shuffle, per-group payloads, no per-row Python at the DataFrame level.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"GDD1"


class _BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def getvalue(self) -> bytes:
        if self.nacc:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nacc)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, nbits: int) -> int:
        """Extract nbits via one small byte-slice → int (O(1) per call,
        vs the naive per-bit loop)."""
        pos = self.pos
        self.pos = pos + nbits
        start = pos >> 3
        end = (pos + nbits + 7) >> 3
        chunk = int.from_bytes(self.data[start:end], "big")
        return (chunk >> (end * 8 - pos - nbits)) & ((1 << nbits) - 1)


_DOD_BUCKETS = ((64, "10", 7, 63), (256, "110", 9, 255), (2048, "1110", 12, 2047))


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (x must be > 0)."""
    x = x.copy()
    lz = np.zeros(x.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = (x >> np.uint64(64 - s)) == 0
        lz[m] += s
        x[m] <<= np.uint64(s)
    return lz


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (x must be > 0)."""
    low = x & (~x + np.uint64(1))
    return np.int64(63) - _clz64(low)


_PACK_CHUNK = 1 << 21  # emissions per chunk — bounds temporaries to
# ~tens of MB so glibc serves them from reused arena memory instead of
# fresh mmaps (first-touch faults on this sandbox's host cost ~100µs/
# page during its memory-pressure episodes — a 1.5 GB fresh temporary
# is seconds of kernel time; recycled memory is nanoseconds)


def _pack_bits(vals: np.ndarray, nbits: np.ndarray) -> bytes:
    """MSB-first bitstream assembly: emission k contributes the low
    nbits[k] bits of vals[k]. O(total_bits) in numpy (repeat + shift +
    packbits), replacing the per-emission Python loop; chunked to keep
    peak temporary memory bounded."""
    out = []
    for lo in range(0, len(vals), _PACK_CHUNK):
        v = vals[lo: lo + _PACK_CHUNK]
        n = nbits[lo: lo + _PACK_CHUNK]
        total = int(n.sum())
        if total == 0:
            continue
        ends = np.cumsum(n)
        starts = ends - n
        rep_n = np.repeat(n, n)
        within = np.arange(total, dtype=np.int64) - np.repeat(starts, n)
        np.subtract(rep_n, 1, out=rep_n)
        np.subtract(rep_n, within, out=rep_n)
        bits = ((np.repeat(v, n) >> rep_n.astype(np.uint64))
                & np.uint64(1)).astype(np.uint8)
        out.append(bits)
    if not out:
        return b""
    return np.packbits(np.concatenate(out) if len(out) > 1 else out[0]
                       ).tobytes()


def encode_series(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Vectorized encode of parallel (int64 µs ts, float64 values).

    Same on-disk format as :func:`encode_series_scalar` and decodable
    by :func:`decode_series`, with one policy difference: instead of
    the greedy per-point XOR window (a sequential dependency — each
    point's '10'-reuse decision depends on the previously emitted
    window), the whole series shares ONE window covering every nonzero
    XOR (lz = min leading-zeros, tz = min trailing-zeros). The first
    nonzero XOR emits the '11' window record, every later one emits
    the 2-bit '10' reuse code — always legal because every XOR fits
    the common window by construction. Slightly wider payload bits per
    point than greedy, but the whole encode is ~10 numpy passes
    instead of a 78k-points/s/core Python loop (measured 32s → <2s
    for 2.5M points at sf0.1)."""
    n = len(ts_us)
    ts_us = np.asarray(ts_us, dtype=np.int64)
    bits_v = np.ascontiguousarray(
        np.asarray(values, dtype=np.float64)
    ).view(np.uint64)
    header = MAGIC + struct.pack("<I", n)
    if n == 0:
        return header
    if n == 1:
        out = _BitWriter()
        out.write(int(ts_us[0]) & ((1 << 64) - 1), 64)
        out.write(int(bits_v[0]), 64)
        return header + out.getvalue()

    m = n - 1  # one record per point 1..n-1
    xors = bits_v[1:] ^ bits_v[:-1]
    deltas = np.diff(ts_us)

    # slot layout per record, flattened row-major to preserve the
    # interleaved (dod code, value code) stream order:
    #   T1 = dod prefix(+payload), T2 = 64-bit dod escape payload,
    #   V1 = value control ('0' | '10' | 13-bit '11' header),
    #   V2 = windowed XOR payload
    vals = np.zeros((m, 4), np.uint64)
    nbits = np.zeros((m, 4), np.int64)

    if n >= 3:
        d = np.diff(deltas).astype(np.int64)
        t1v, t1n = vals[1:, 0], nbits[1:, 0]
        t2v, t2n = vals[1:, 1], nbits[1:, 1]
        zero = d == 0
        t1n[zero] = 1
        b1 = (~zero) & (d >= -63) & (d <= 64)
        t1v[b1] = ((0b10 << 7) + (d[b1] + 63)).astype(np.uint64)
        t1n[b1] = 9
        b2 = (~zero) & ~b1 & (d >= -255) & (d <= 256)
        t1v[b2] = ((0b110 << 9) + (d[b2] + 255)).astype(np.uint64)
        t1n[b2] = 12
        b3 = (~zero) & ~b1 & ~b2 & (d >= -2047) & (d <= 2048)
        t1v[b3] = ((0b1110 << 12) + (d[b3] + 2047)).astype(np.uint64)
        t1n[b3] = 16
        b4 = (~zero) & ~(b1 | b2 | b3)
        t1v[b4] = 0b1111
        t1n[b4] = 4
        t2v[b4] = d[b4].astype(np.uint64)
        t2n[b4] = 64

    v1v, v1n = vals[:, 2], nbits[:, 2]
    v2v, v2n = vals[:, 3], nbits[:, 3]
    xz = xors == 0
    v1n[xz] = 1
    nz = ~xz
    if nz.any():
        x = xors[nz]
        lz = min(31, int(_clz64(x).min()))
        tz = int(_ctz64(x).min())
        mb = 64 - lz - tz
        first = int(np.flatnonzero(nz)[0])
        v1v[nz] = 0b10
        v1n[nz] = 2
        v1v[first] = (0b11 << 11) | (lz << 6) | (mb & 63)
        v1n[first] = 13
        v2v[nz] = xors[nz] >> np.uint64(tz)
        v2n[nz] = mb

    # two's-complement wrap int64 -> uint64 via astype (np.array of
    # mixed int64/uint64 would promote to float64 and corrupt bits)
    lead_v = np.array([ts_us[0], 0, deltas[0]], np.int64).astype(np.uint64)
    lead_v[1] = bits_v[0]
    lead_n = np.array([64, 64, 64], np.int64)
    allv = np.concatenate([lead_v, vals.ravel()])
    alln = np.concatenate([lead_n, nbits.ravel()])
    keep = alln > 0
    return header + _pack_bits(allv[keep], alln[keep])


def encode_series_scalar(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Scalar reference encoder (greedy per-point XOR window — the
    Gorilla paper's exact policy). Kept as the unit-testable spec and
    cross-check for the vectorized encoder; not used in the hot path."""
    n = len(ts_us)
    ts_us = np.asarray(ts_us, dtype=np.int64)
    bits_v = np.asarray(values, dtype=np.float64).view(np.uint64)
    out = _BitWriter()
    header = MAGIC + struct.pack("<I", n)
    if n == 0:
        return header
    out.write(int(ts_us[0]) & ((1 << 64) - 1), 64)
    out.write(int(bits_v[0]), 64)
    if n == 1:
        return header + out.getvalue()
    delta0 = int(ts_us[1]) - int(ts_us[0])
    out.write(delta0 & ((1 << 64) - 1), 64)
    # vectorized precompute: deltas, DoD, xors, lz/tz counts
    deltas = np.diff(ts_us)
    dod = np.diff(deltas)  # for points 2..n-1
    xors = bits_v[1:] ^ bits_v[:-1]
    prev_lz, prev_mb = -1, -1  # previous window: leading zeros, meaningful bits
    for i in range(1, n):
        if i >= 2:
            d = int(dod[i - 2])
            if d == 0:
                out.write(0, 1)
            else:
                for lim, prefix, nbits, bias in _DOD_BUCKETS:
                    if -lim + 1 <= d <= lim:
                        out.write(int(prefix, 2), len(prefix))
                        out.write(d + bias, nbits)
                        break
                else:
                    out.write(0b1111, 4)
                    out.write(d & ((1 << 64) - 1), 64)
        x = int(xors[i - 1])
        if x == 0:
            out.write(0, 1)
        else:
            lz = 64 - x.bit_length()
            tz = (x & -x).bit_length() - 1
            if lz > 31:
                lz = 31  # 5-bit field
            mb = 64 - lz - tz
            if prev_lz >= 0 and lz >= prev_lz and tz >= 64 - prev_lz - prev_mb:
                out.write(0b10, 2)
                out.write(x >> (64 - prev_lz - prev_mb), prev_mb)
            else:
                out.write(0b11, 2)
                out.write(lz, 5)
                out.write(mb & 63, 6)  # 64 stored as 0
                out.write(x >> tz, mb)
                prev_lz, prev_mb = lz, mb
    return header + out.getvalue()


def decode_series(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of :func:`encode_series` (exact round-trip)."""
    if payload[:4] != MAGIC:
        raise ValueError("bad magic")
    (n,) = struct.unpack("<I", payload[4:8])
    ts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.uint64)
    if n == 0:
        return ts, vals.view(np.float64)
    r = _BitReader(payload[8:])

    def _s64(u: int) -> int:
        return u - (1 << 64) if u >= (1 << 63) else u

    ts[0] = _s64(r.read(64))
    vals[0] = r.read(64)
    if n == 1:
        return ts, vals.view(np.float64)
    delta = _s64(r.read(64))
    ts[1] = ts[0] + delta
    prev_lz, prev_mb = -1, -1
    prev_bits = int(vals[0])
    # first value record for i=1 follows the header delta
    for i in range(1, n):
        if i >= 2:
            if r.read(1) == 0:
                d = 0
            elif r.read(1) == 0:
                d = r.read(7) - 63
            elif r.read(1) == 0:
                d = r.read(9) - 255
            elif r.read(1) == 0:
                d = r.read(12) - 2047
            else:
                d = _s64(r.read(64))
            delta += d
            ts[i] = ts[i - 1] + delta
        if r.read(1) == 0:
            x = 0
        elif r.read(1) == 0:  # '10' reuse window
            x = r.read(prev_mb) << (64 - prev_lz - prev_mb)
        else:  # '11' new window
            lz = r.read(5)
            mb = r.read(6) or 64
            x = r.read(mb) << (64 - lz - mb)
            prev_lz, prev_mb = lz, mb
        prev_bits ^= x
        vals[i] = prev_bits
    return ts, vals.view(np.float64)


# ----------------------------------------------------------- v2 (GDD2)
MAGIC2 = b"GDD2"

# GDD2: the same Gorilla semantics (delta-of-delta timestamps, XOR
# values against the previous value, shared meaningful-bit window) in
# a BYTE-ALIGNED struct-of-arrays layout so DECODE is pure numpy —
# the v1 bitstream decoder is an inherently sequential per-point
# Python loop (~300k pts/s/core); GDD2 decodes at >10M pts/s/core:
#
#   magic(4) n(u32)
#   [n>=1] ts0(i64) v0(u64-bits)
#   [n>=2] delta0(i64) lz(u8) tz(u8) wbytes(u8)
#   ts_ctrl  : 2-bit codes, 4/byte, points 2..n-1
#              (0: dod==0, 1: int8 dod, 2: int16 dod, 3: int64 dod)
#   vx_ctrl  : 1-bit codes, 8/byte, points 1..n-1 (1: payload present)
#   dod8/dod16/dod64 : SoA payload blocks per class, in point order
#   xor payloads     : (count × wbytes) little-endian, dropping the
#                      tz trailing and 64-lz-... leading zero bytes
#
# Size is within ~2 bits/point of v1 (byte alignment vs bit packing);
# both read paths are supported — decode dispatches on the magic.


def encode_series_v2(ts_us: np.ndarray, values: np.ndarray) -> bytes:
    """Vectorized byte-aligned Gorilla encode (format GDD2)."""
    n = len(ts_us)
    ts_us = np.asarray(ts_us, dtype=np.int64)
    bits_v = np.ascontiguousarray(
        np.asarray(values, dtype=np.float64)
    ).view(np.uint64)
    out = [MAGIC2, struct.pack("<I", n)]
    if n == 0:
        return b"".join(out)
    out.append(struct.pack("<q", int(ts_us[0])))
    out.append(struct.pack("<Q", int(bits_v[0])))
    if n == 1:
        return b"".join(out)

    deltas = np.diff(ts_us)
    xors = bits_v[1:] ^ bits_v[:-1]
    nz = xors != 0
    if nz.any():
        x = xors[nz]
        lz = int(_clz64(x).min())
        tz = int(_ctz64(x).min())
        wbytes = (64 - lz - tz + 7) // 8
    else:
        lz = tz = wbytes = 0
    out.append(struct.pack("<qBBB", int(deltas[0]), lz, tz, wbytes))

    # ts control + SoA payloads
    if n >= 3:
        dod = np.diff(deltas)
        codes = np.zeros(len(dod), np.uint8)
        small = (dod >= -128) & (dod <= 127)
        med = ~small & (dod >= -32768) & (dod <= 32767)
        big = ~small & ~med
        codes[small & (dod != 0)] = 1
        codes[med] = 2
        codes[big] = 3
        pad = (-len(codes)) % 4
        cp = np.pad(codes, (0, pad)).reshape(-1, 4)
        packed = (cp[:, 0] << 6) | (cp[:, 1] << 4) | (cp[:, 2] << 2) | cp[:, 3]
        out.append(packed.astype(np.uint8).tobytes())
    # value control
    out.append(np.packbits(nz.astype(np.uint8)).tobytes())
    if n >= 3:
        out.append(dod[codes == 1].astype("<i1").tobytes())
        out.append(dod[codes == 2].astype("<i2").tobytes())
        out.append(dod[codes == 3].astype("<i8").tobytes())
    if nz.any() and wbytes:
        payload = (xors[nz] >> np.uint64(tz)).astype("<u8")
        out.append(
            payload.view(np.uint8).reshape(-1, 8)[:, :wbytes].tobytes()
        )
    return b"".join(out)


def decode_series_v2(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Fully vectorized inverse of :func:`encode_series_v2`."""
    if payload[:4] != MAGIC2:
        raise ValueError("bad magic")
    (n,) = struct.unpack("<I", payload[4:8])
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    ts0 = struct.unpack("<q", payload[8:16])[0]
    v0 = struct.unpack("<Q", payload[16:24])[0]
    if n == 1:
        return (np.array([ts0], np.int64),
                np.array([v0], np.uint64).view(np.float64))
    delta0, lz, tz, wbytes = struct.unpack("<qBBB", payload[24:35])
    pos = 35
    m_ts = n - 2
    m_vx = n - 1

    if m_ts:
        nb = (m_ts + 3) // 4
        packed = np.frombuffer(payload, np.uint8, nb, pos)
        pos += nb
        codes = np.empty(nb * 4, np.uint8)
        codes[0::4] = packed >> 6
        codes[1::4] = (packed >> 4) & 3
        codes[2::4] = (packed >> 2) & 3
        codes[3::4] = packed & 3
        codes = codes[:m_ts]
    else:
        codes = np.empty(0, np.uint8)

    nbv = (m_vx + 7) // 8
    vx = np.unpackbits(
        np.frombuffer(payload, np.uint8, nbv, pos), count=m_vx
    ).astype(bool)
    pos += nbv

    dod = np.zeros(m_ts, np.int64)
    for code, dt in ((1, "<i1"), (2, "<i2"), (3, "<i8")):
        mask = codes == code
        cnt = int(mask.sum())
        if cnt:
            width = np.dtype(dt).itemsize
            dod[mask] = np.frombuffer(payload, dt, cnt, pos)
            pos += cnt * width

    xors = np.zeros(m_vx, np.uint64)
    cnt = int(vx.sum())
    if cnt and wbytes:
        raw = np.frombuffer(payload, np.uint8, cnt * wbytes, pos)
        full = np.zeros((cnt, 8), np.uint8)
        full[:, :wbytes] = raw.reshape(cnt, wbytes)
        xors[vx] = full.reshape(-1).view("<u8") << np.uint64(tz)

    deltas = np.empty(m_vx, np.int64)
    deltas[0] = delta0
    if m_ts:
        deltas[1:] = delta0 + np.cumsum(dod)
    ts = np.empty(n, np.int64)
    ts[0] = ts0
    ts[1:] = ts0 + np.cumsum(deltas)

    bits = np.empty(n, np.uint64)
    bits[0] = v0
    bits[1:] = xors
    np.bitwise_xor.accumulate(bits, out=bits)
    return ts, bits.view(np.float64)


def encode_batch_v2(ts_list: list, vals_list: list) -> list[bytes]:
    """Batch GDD2 encode: byte-identical to per-series
    :func:`encode_series_v2`, but every per-point computation (diffs,
    XORs, dod classification, window minima, control-stream packing,
    payload gathers) runs ONCE over the concatenation of all series.
    Per-series numpy overhead (~230µs/series for the typical ~60-point
    conversation-hour bucket — dwarfing the actual work) drops to a
    ~6µs byte-assembly loop. This is the encoder the Spark layer uses:
    one mapInPandas batch holds tens of thousands of small buckets.
    """
    B = len(ts_list)
    if B == 0:
        return []
    lengths = np.fromiter((len(t) for t in ts_list), np.int64, B)
    out_payloads: list[bytes] = [b""] * B
    n_hdr = struct.Struct("<I")

    N = int(lengths.sum())
    if N == 0:
        return [MAGIC2 + n_hdr.pack(0)] * B
    ts_all = np.concatenate([np.asarray(t, np.int64) for t in ts_list])
    bits = np.concatenate(
        [np.ascontiguousarray(np.asarray(v, np.float64)).view(np.uint64)
         for v in vals_list]
    )
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    gid = np.repeat(np.arange(B), lengths)

    # headers, vectorized into byte matrices (per-series row slices).
    # starts is clamped: a trailing zero-length series has start == N
    # (out of bounds); its header row is garbage but never emitted —
    # the assembly loop only appends headers when n >= 1.
    safe_starts = np.minimum(starts, N - 1)
    ts0_b = ts_all[safe_starts].astype("<i8").view(np.uint8).reshape(B, 8)
    v0_b = bits[safe_starts].astype("<u8").view(np.uint8).reshape(B, 8)

    # first-diffs / xors, boundary positions dropped so the remainder
    # is the dense concatenation of every series' own arrays
    d_all = np.diff(ts_all)
    x_all = bits[1:] ^ bits[:-1]
    vd1 = gid[:-1] == gid[1:]
    x_valid = x_all[vd1]
    xcnt = np.maximum(lengths - 1, 0)
    xoff = np.concatenate(([0], np.cumsum(xcnt)))
    delta0 = np.zeros(B, np.int64)
    has2 = lengths >= 2
    delta0[has2] = d_all[starts[has2]]

    dod_all = np.diff(d_all)
    vd2 = gid[:-2] == gid[2:]
    dod_valid = dod_all[vd2].astype(np.int64)
    dcnt = np.maximum(lengths - 2, 0)
    doff = np.concatenate(([0], np.cumsum(dcnt)))

    # dod classification + per-class global payload blocks (global
    # order == series-major order, so per-series chunks are slices)
    codes = np.zeros(len(dod_valid), np.uint8)
    small = (dod_valid >= -128) & (dod_valid <= 127)
    med = ~small & (dod_valid >= -32768) & (dod_valid <= 32767)
    big = ~small & ~med
    codes[small & (dod_valid != 0)] = 1
    codes[med] = 2
    codes[big] = 3
    class_blobs = []
    class_offs = []
    for cls, dt in ((1, "<i1"), (2, "<i2"), (3, "<i8")):
        m = codes == cls
        blob = dod_valid[m].astype(dt).view(np.uint8)
        width = np.dtype(dt).itemsize
        cum = np.concatenate(([0], np.cumsum(m)))
        cnt_i = cum[doff[1:]] - cum[doff[:-1]]
        off_i = np.concatenate(([0], np.cumsum(cnt_i))) * width
        class_blobs.append(blob)
        class_offs.append((off_i, cnt_i * width))

    # per-series XOR window via dense reduceat (x_valid has no gaps)
    nz = x_valid != 0
    cumnz = np.concatenate(([0], np.cumsum(nz)))
    nzc = cumnz[xoff[1:]] - cumnz[xoff[:-1]]
    lz_i = np.zeros(B, np.int64)
    tz_i = np.zeros(B, np.int64)
    wbytes_i = np.zeros(B, np.int64)
    if nz.any():
        lz_arr = np.where(nz, _clz64(x_valid), 64)
        tz_arr = np.where(nz, _ctz64(x_valid), 64)
        # reduceat boundaries only through the LAST series with xors:
        # trailing shorter series have xoff == len(x_valid), and
        # clamping those into range would steal the final element from
        # the previous series' segment (regression: empty-last batch).
        # Mid-batch empties yield [i:i) degenerate segments whose
        # garbage value is masked by has_nz below.
        last_ne = int(np.flatnonzero(xcnt > 0)[-1])
        red_starts = xoff[: last_ne + 1]
        lz_red = np.minimum.reduceat(lz_arr, red_starts)
        tz_red = np.minimum.reduceat(tz_arr, red_starts)
        idx = np.flatnonzero(nzc > 0)  # all ≤ last_ne by construction
        lz_i[idx] = lz_red[idx]
        tz_i[idx] = tz_red[idx]
        wbytes_i[idx] = (64 - lz_i[idx] - tz_i[idx] + 7) // 8
    hdr2 = np.empty((B, 11), np.uint8)
    hdr2[:, :8] = delta0.astype("<i8").view(np.uint8).reshape(B, 8)
    hdr2[:, 8] = lz_i
    hdr2[:, 9] = tz_i
    hdr2[:, 10] = wbytes_i

    # ts control stream: per-series 2-bit codes padded to whole bytes —
    # scatter into a globally padded array, pack once
    dpad = ((dcnt + 3) // 4) * 4
    dpoff = np.concatenate(([0], np.cumsum(dpad)))
    padded = np.zeros(int(dpoff[-1]), np.uint8)
    if len(codes):
        # position of each code: its series' padded base + local index
        local = np.arange(len(codes)) - np.repeat(doff[:-1], dcnt)
        padded[np.repeat(dpoff[:-1], dcnt) + local] = codes
    q = padded.reshape(-1, 4)
    tctrl = ((q[:, 0] << 6) | (q[:, 1] << 4) | (q[:, 2] << 2) | q[:, 3])
    tctrl_off = dpoff // 4

    # value control stream: per-series presence bits padded to bytes
    xpad = ((xcnt + 7) // 8) * 8
    xpoff = np.concatenate(([0], np.cumsum(xpad)))
    vbits = np.zeros(int(xpoff[-1]), np.uint8)
    if len(x_valid):
        localx = np.arange(len(x_valid)) - np.repeat(xoff[:-1], xcnt)
        vbits[np.repeat(xpoff[:-1], xcnt) + localx] = nz
    vctrl = np.packbits(vbits)
    vctrl_off = xpoff // 8

    # XOR payload matrix: global rows in series-major order; each
    # series keeps the first wbytes columns of its rows
    tz_rep = np.repeat(tz_i, xcnt).astype(np.uint64)
    shifted = (x_valid >> tz_rep)[nz].astype("<u8")
    pay = shifted.view(np.uint8).reshape(-1, 8)
    nzoff = np.concatenate(([0], np.cumsum(nzc)))

    tctrl_b = tctrl.tobytes()
    vctrl_b = vctrl.tobytes()
    b1, b2, b3 = (b.tobytes() for b in class_blobs)
    (o1, w1), (o2, w2), (o3, w3) = class_offs
    for i in range(B):
        n = int(lengths[i])
        parts = [MAGIC2, n_hdr.pack(n)]
        if n >= 1:
            parts.append(ts0_b[i].tobytes())
            parts.append(v0_b[i].tobytes())
        if n >= 2:
            parts.append(hdr2[i].tobytes())
            if n >= 3:
                parts.append(tctrl_b[tctrl_off[i]: tctrl_off[i + 1]])
            parts.append(vctrl_b[vctrl_off[i]: vctrl_off[i + 1]])
            if n >= 3:
                parts.append(b1[o1[i]: o1[i] + w1[i]])
                parts.append(b2[o2[i]: o2[i] + w2[i]])
                parts.append(b3[o3[i]: o3[i] + w3[i]])
            wb = int(wbytes_i[i])
            if wb and nzc[i]:
                parts.append(
                    pay[nzoff[i]: nzoff[i + 1], :wb].tobytes()
                )
        out_payloads[i] = b"".join(parts)
    return out_payloads


# ------------------------------------------------------------- Spark layer
ENCODED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("bucket_start", T.TimestampType(), False),
        T.StructField("codec", T.StringType(), False),
        T.StructField("n_points", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


_ENCODERS = {
    "gorilla_dod_v1": encode_series,
    "gorilla_dod_v2": encode_series_v2,
}


def decode_any(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Magic-dispatched decode (GDD1 bitstream or GDD2 byte-aligned)."""
    if payload[:4] == MAGIC2:
        return decode_series_v2(payload)
    return decode_series(payload)


def compress_buckets(points: DataFrame, coarse: str = "hour",
                     ts_col: str = "ts", value_col: str = "value",
                     codec: str = "gorilla_dod_v2") -> DataFrame:
    """points (conv_id, ts, value) → one Gorilla payload per
    (conv_id, coarse bucket). collect_list is bounded by the coarse
    bucket (≤ bucket span of points per group), sorted in-plan."""
    # ship PRIMITIVE arrays to Python: a struct array would surface in
    # pandas as one dict per point (millions of boxed objects — the
    # dominant cost, measured); two parallel primitive arrays arrive
    # as numpy-convertible buffers instead. Sorting happens on the
    # struct (t-major), then the columns are split JVM-side.
    grouped = (
        points.groupBy(
            "conv_id",
            F.date_trunc(coarse, F.col(ts_col)).alias("bucket_start"),
        )
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.unix_micros(F.col(ts_col)).alias("t"),
                        F.col(value_col).cast("double").alias("v"),
                    )
                )
            ).alias("pts")
        )
        .select(
            "conv_id",
            "bucket_start",
            F.expr("transform(pts, p -> p.t)").alias("ts_us"),
            F.expr("transform(pts, p -> p.v)").alias("vals"),
        )
    )

    encode = _ENCODERS[codec]

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ts_list = [np.asarray(t, dtype=np.int64) for t in pdf["ts_us"]]
            v_list = [np.asarray(v, dtype=np.float64) for v in pdf["vals"]]
            if codec == "gorilla_dod_v2":
                # whole-batch encode: per-point work runs once over the
                # concatenation of every bucket in the Arrow batch
                payloads = encode_batch_v2(ts_list, v_list)
            else:
                payloads = [encode(t, v) for t, v in zip(ts_list, v_list)]
            yield pd.DataFrame(
                {
                    "conv_id": pdf["conv_id"],
                    "bucket_start": pdf["bucket_start"],
                    "codec": codec,
                    "n_points": pd.Series(
                        [len(t) for t in ts_list], dtype="int32"
                    ),
                    "payload": payloads,
                }
            )

    return grouped.mapInPandas(enc, schema=ENCODED_SCHEMA)


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def decompress_buckets(encoded: DataFrame) -> DataFrame:
    """Inverse of :func:`compress_buckets` — payload → point rows."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            frames = []
            for conv, payload in zip(pdf["conv_id"], pdf["payload"]):
                t, v = decode_any(bytes(payload))
                frames.append(
                    pd.DataFrame(
                        {
                            "conv_id": conv,
                            "ts": pd.to_datetime(t, unit="us"),
                            "value": v,
                        }
                    )
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {"conv_id": pd.Series(dtype=str),
                 "ts": pd.Series(dtype="datetime64[us]"),
                 "value": pd.Series(dtype=float)}
            )

    return encoded.mapInPandas(dec, schema=DECODED_SCHEMA)
