"""Vectorized integer codecs for posting lists: varint (LEB128) and PForDelta.

Pure-numpy, no Python-level per-value loops on the hot paths (SURVEY.md A5/A6;
north_star: "varint/PFOR-compressed"). These run INSIDE Arrow-vectorized UDFs
on executors; they never touch Spark APIs themselves.

Varint: classic LEB128 (Williams & Zobel 1999) — 7 value bits per byte, high
bit = continuation. Encoding is done column-wise over the whole array (<= 10
vector ops); decoding splits the byte stream on terminal bytes and reduces
per-byte contributions with ``np.bitwise_or.at``.

PFOR: PForDelta-style (Zukowski et al., ICDE 2006) 128-int blocks. Each block
picks the smallest bit width ``b`` whose overflow ("exception") count is
<= PFOR_MAX_EXCEPTIONS; low ``b`` bits of every value are bit-packed, and the
exceptions' positions + high bits are appended varint-encoded.
"""

from __future__ import annotations

import numpy as np

PFOR_BLOCK = 128
PFOR_MAX_EXCEPTIONS = 16

CODEC_VARINT = 1
CODEC_PFOR = 2


# ---------------------------------------------------------------- varint ----

def varint_encode(values: np.ndarray) -> bytes:
    return varint_encode_with_lengths(values)[0]


def varint_encode_with_lengths(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """LEB128-encode a uint64 array -> (byte stream, per-value byte lengths).

    The lengths array lets callers compute byte offsets of arbitrary value
    positions (block boundaries) without re-scanning the stream."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b"", np.empty(0, dtype=np.int64)
    if v.max() < 128:  # dense-gap fast path: every value is one byte
        ones = np.broadcast_to(np.ones(1, dtype=np.int64), n)  # no 8B*n alloc
        return v.astype(np.uint8).tobytes(), ones
    # bytes needed per value: ceil(bit_length / 7), min 1
    nbits = np.zeros(n, dtype=np.int64)
    tmp = v.copy()
    alive = tmp > 0
    while alive.any():
        nbits[alive] += 1
        tmp >>= np.uint64(7)
        alive = tmp > 0
    np.maximum(nbits, 1, out=nbits)
    ends = np.cumsum(nbits)
    total = int(ends[-1])
    starts = ends - nbits
    out = np.zeros(total, dtype=np.uint8)
    max_len = int(nbits.max())
    for b in range(max_len):
        mask = nbits > b
        byte = (v[mask] >> np.uint64(7 * b)) & np.uint64(0x7F)
        cont = (nbits[mask] - 1 > b).astype(np.uint8) << 7
        out[starts[mask] + b] = byte.astype(np.uint8) | cont
    return out.tobytes(), nbits


def varint_decode(buf: bytes | memoryview | np.ndarray, offset: int = 0, count: int | None = None):
    """Decode LEB128 stream -> (uint64 array, bytes consumed).

    If ``count`` is given, stops after that many values; otherwise consumes the
    whole buffer from ``offset``.
    """
    raw = np.frombuffer(buf, dtype=np.uint8)
    raw = raw[offset:]
    if count is not None:
        # bound the scan: a value is at most 10 varint bytes, so per-block
        # decode stays O(block), not O(remaining blob) (the WAND hot path)
        raw = raw[: count * 10]
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64), 0
    if count is not None and raw.size >= count and not (raw[:count] & 0x80).any():
        # all-single-byte fast path (dense gaps / small tfs)
        return raw[:count].astype(np.uint64), count
    terminal = (raw & 0x80) == 0
    ends = np.flatnonzero(terminal)  # index of last byte of each value
    if count is not None:
        ends = ends[:count]
        if ends.size < (count or 0):
            raise ValueError("varint stream truncated")
        raw = raw[: ends[-1] + 1] if ends.size else raw[:0]
    n = ends.size
    if n == 0:
        return np.empty(0, dtype=np.uint64), 0
    consumed = int(ends[-1]) + 1
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    idx = np.arange(consumed, dtype=np.int64)
    value_id = np.searchsorted(ends, idx)  # which value each byte belongs to
    pos = idx - starts[value_id]
    contrib = (raw[:consumed].astype(np.uint64) & np.uint64(0x7F)) << (np.uint64(7) * pos.astype(np.uint64))
    out = np.zeros(n, dtype=np.uint64)
    np.bitwise_or.at(out, value_id, contrib)
    return out, consumed


# ------------------------------------------------------------------ pfor ----

def _pack_bits(values: np.ndarray, width: int) -> bytes:
    """Bit-pack uint64 values (< 2**width) into bytes, MSB-first per value."""
    if width == 0 or values.size == 0:
        return b""
    shifts = np.arange(width - 1, -1, -1, dtype=np.uint64)
    bits = ((values[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def _unpack_bits(buf: np.ndarray, n: int, width: int) -> np.ndarray:
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    nbits = n * width
    bits = np.unpackbits(buf, count=nbits).reshape(n, width).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(width - 1, -1, -1, dtype=np.uint64))
    return bits @ weights


def pfor_encode(values: np.ndarray) -> bytes:
    """PForDelta-encode a uint64 array (any length) into a byte stream.

    Layout: varint(n_values), then per 128-block:
      [width:1B][n_exceptions:1B][packed low bits][exception positions varint]
      [exception high bits varint]
    """
    v = np.ascontiguousarray(values, dtype=np.uint64)
    parts = [varint_encode(np.array([v.size], dtype=np.uint64))]
    for s in range(0, v.size, PFOR_BLOCK):
        blk = v[s : s + PFOR_BLOCK]
        bl = _bit_lengths(blk)
        max_w = int(bl.max()) if blk.size else 0
        # smallest width with an acceptable number of exceptions
        width = max_w
        for w in range(max_w + 1):
            if int((bl > w).sum()) <= PFOR_MAX_EXCEPTIONS:
                width = w
                break
        exc_mask = bl > width
        exc_pos = np.flatnonzero(exc_mask).astype(np.uint64)
        if width == 0:
            low = np.zeros_like(blk)
        elif width >= 64:
            # 1<<64 is undefined (wraps to 1 on x86) — values >= 2^63 store raw
            low = blk
        else:
            low = blk & ((np.uint64(1) << np.uint64(width)) - np.uint64(1))
        # width == max bit length when exceptions exist is impossible at
        # width >= 64 (no value has >64 bits), so this shift stays defined
        high = blk[exc_mask] >> np.uint64(width)
        parts.append(bytes([width, int(exc_pos.size)]))
        parts.append(_pack_bits(low, width))
        parts.append(varint_encode(exc_pos))
        parts.append(varint_encode(high))
    return b"".join(parts)


def _bit_lengths(v: np.ndarray) -> np.ndarray:
    out = np.zeros(v.size, dtype=np.int64)
    tmp = v.copy()
    alive = tmp > 0
    while alive.any():
        out[alive] += 1
        tmp >>= np.uint64(1)
        alive = tmp > 0
    return out


def pfor_decode(buf: bytes | memoryview | np.ndarray, offset: int = 0):
    """Decode PFOR stream -> (uint64 array, bytes consumed from offset).

    Two passes: a cheap header walk records (width, data offset) per block and
    decodes the tiny (<=16-entry) exception varints; the bit-unpack — the
    actual work — then runs ONCE per distinct width over all same-width blocks
    stacked into a matrix (one ``unpackbits`` + one shift-accumulate), instead
    of a per-128-block Python iteration. Round-1 measured the per-block loop
    70x slower than varint on dense gaps; batching removes that gap.
    """
    raw = np.frombuffer(buf, dtype=np.uint8)[offset:]
    header, used = varint_decode(raw, 0, count=1)
    n = int(header[0])
    pos = used
    out = np.empty(n, dtype=np.uint64)
    groups: dict[tuple[int, int], list[tuple[int, int]]] = {}
    exc_fixups: list[tuple[np.ndarray, np.ndarray, int]] = []
    done = 0
    while done < n:  # header walk: O(1) per block (+ tiny exception varints)
        blk_n = min(PFOR_BLOCK, n - done)
        width = int(raw[pos]); n_exc = int(raw[pos + 1]); pos += 2
        packed_bytes = (blk_n * width + 7) // 8
        groups.setdefault((width, blk_n), []).append((pos, done))
        pos += packed_bytes
        if n_exc:
            exc_pos, used = varint_decode(raw, pos, count=n_exc)
            pos += used
            high, used = varint_decode(raw, pos, count=n_exc)
            pos += used
            exc_fixups.append((done + exc_pos.astype(np.int64), high, width))
        done += blk_n
    for (width, blk_n), blks in groups.items():
        if width == 0:
            for _, out_pos in blks:
                out[out_pos : out_pos + blk_n] = 0
            continue
        packed_bytes = (blk_n * width + 7) // 8
        data_pos = np.array([p for p, _ in blks], dtype=np.int64)
        out_pos = np.array([o for _, o in blks], dtype=np.int64)
        gather = data_pos[:, None] + np.arange(packed_bytes, dtype=np.int64)
        bits = np.unpackbits(raw[gather], axis=1, count=blk_n * width)
        bits = bits.reshape(len(blks), blk_n, width)
        vals = np.zeros((len(blks), blk_n), dtype=np.uint64)
        for w in range(width):  # MSB-first shift-accumulate, <=64 passes
            vals <<= np.uint64(1)
            vals |= bits[:, :, w]
        scatter = out_pos[:, None] + np.arange(blk_n, dtype=np.int64)
        out[scatter.ravel()] = vals.ravel()
    for idx, high, width in exc_fixups:
        out[idx] |= high << np.uint64(width)
    return out, pos


def encode(values: np.ndarray, codec: int) -> bytes:
    if codec == CODEC_VARINT:
        return varint_encode(values)
    if codec == CODEC_PFOR:
        return pfor_encode(values)
    raise ValueError(f"unknown codec {codec}")


def decode(buf, codec: int, offset: int = 0, count: int | None = None):
    if codec == CODEC_VARINT:
        return varint_decode(buf, offset, count)
    if codec == CODEC_PFOR:
        return pfor_decode(buf, offset)
    raise ValueError(f"unknown codec {codec}")


# ---------------------------------------------------------- delta helpers ---

def delta_encode(sorted_ids: np.ndarray, base: int = 0) -> np.ndarray:
    """Ascending docIDs -> gaps (first gap relative to ``base``)."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.uint64)
    if ids.size == 0:
        return ids
    gaps = np.empty_like(ids)
    gaps[0] = ids[0] - np.uint64(base)
    np.subtract(ids[1:], ids[:-1], out=gaps[1:])
    return gaps


def delta_decode(gaps: np.ndarray, base: int = 0) -> np.ndarray:
    if gaps.size == 0:
        return np.asarray(gaps, dtype=np.uint64)
    out = np.cumsum(gaps.astype(np.uint64))
    if base:
        out += np.uint64(base)
    return out
