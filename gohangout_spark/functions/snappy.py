"""Snappy block-format codec, from scratch — no snappy wheel exists in
this container, but the FORMAT is public (google/snappy
format_description.txt), so the Kafka wire tier's snappy leg is
implementable rather than waivable, the same judgment as crc32c/murmur2
(sources/kafka_wire.py) and the from-spec media codecs.

Format (all little-endian):

- preamble: uncompressed length as a varint (7 data bits per byte,
  high bit = continuation)
- elements, tag byte's low 2 bits select the type:
  - 00 LITERAL: upper 6 bits = len-1 for len <= 60; values 60..63 mean
    the length-1 follows in 1..4 little-endian bytes
  - 01 COPY, 1-byte offset: length = 4 + ((tag >> 2) & 0x7) in 4..11;
    offset = ((tag & 0xE0) << 3) | next_byte, in 1..2047
  - 10 COPY, 2-byte offset: length = 1 + (tag >> 2) in 1..64; offset =
    next two bytes LE
  - 11 COPY, 4-byte offset: same lengths, 4-byte LE offset
- copies may overlap themselves (offset < length): byte-wise copy
  semantics give run-length expansion, which the decoder must honor.

The compressor is a greedy single-pass LZ77 with a 4-byte hash table —
the same shape as the reference C++ fast path, tuned for clarity, not
ratio. Round-trip correctness is what the wire tier needs; every
compressed stream here decodes with the canonical algorithm (and vice
versa: the decoder accepts any conformant stream, tested against
hand-assembled element sequences).
"""

from __future__ import annotations

_MAX_BLOCK = 1 << 32


def _write_uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated length preamble")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: length varint too long")


def _emit_literal(out: bytearray, lit: bytes) -> None:
    n = len(lit) - 1
    if n < 60:
        out.append(n << 2)
    elif n < (1 << 8):
        out.append(60 << 2)
        out.append(n)
    elif n < (1 << 16):
        out.append(61 << 2)
        out += n.to_bytes(2, "little")
    elif n < (1 << 24):
        out.append(62 << 2)
        out += n.to_bytes(3, "little")
    else:
        out.append(63 << 2)
        out += n.to_bytes(4, "little")
    out += lit


def _emit_copy(out: bytearray, offset: int, length: int) -> None:
    # chunk long matches into <= 64-byte copies; use the 1-byte-offset
    # form when it fits (len 4..11, offset < 2048), else the 2-byte form
    while length >= 68:
        out.append((63 << 2) | 2)
        out += offset.to_bytes(2, "little")
        length -= 64
    if length > 64:
        # leave >= 4 for the final copy (1-byte form needs len >= 4)
        out.append((59 << 2) | 2)  # 60-byte copy
        out += offset.to_bytes(2, "little")
        length -= 60
    if 4 <= length <= 11 and offset < 2048:
        out.append(((offset >> 8) << 5) | ((length - 4) << 2) | 1)
        out.append(offset & 0xFF)
    else:
        out.append(((length - 1) << 2) | 2)
        out += offset.to_bytes(2, "little")


def compress(data: bytes) -> bytes:
    """Greedy hash-match compressor; output decodes with any conformant
    snappy decoder."""
    if len(data) >= _MAX_BLOCK:
        raise ValueError("snappy: block too large")
    out = bytearray(_write_uvarint(len(data)))
    n = len(data)
    if n == 0:
        return bytes(out)
    if n < 4:
        _emit_literal(out, data)
        return bytes(out)
    table: dict[bytes, int] = {}
    pos = 0
    lit_start = 0
    # stop matching 4 bytes before the end (need a full 4-byte seed)
    limit = n - 4
    while pos <= limit:
        seed = data[pos : pos + 4]
        cand = table.get(seed)
        table[seed] = pos
        if cand is None or data[cand : cand + 4] != seed:
            pos += 1
            continue
        offset = pos - cand
        if offset >= (1 << 16):
            pos += 1
            continue
        # extend the match
        length = 4
        while pos + length < n and data[cand + length] == data[pos + length]:
            length += 1
        if pos > lit_start:
            _emit_literal(out, data[lit_start:pos])
        _emit_copy(out, offset, length)
        pos += length
        lit_start = pos
    if lit_start < n:
        _emit_literal(out, data[lit_start:])
    return bytes(out)


def decompress(data: bytes) -> bytes:
    expected, pos = _read_uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x03
        if kind == 0:  # literal
            length = (tag >> 2) + 1
            if length > 60:
                extra = length - 60
                if pos + extra > n:
                    raise ValueError("snappy: truncated literal length")
                length = int.from_bytes(data[pos : pos + extra], "little") + 1
                pos += extra
            if pos + length > n:
                raise ValueError("snappy: truncated literal body")
            out += data[pos : pos + length]
            pos += length
            continue
        if kind == 1:  # copy, 1-byte offset
            length = 4 + ((tag >> 2) & 0x7)
            if pos >= n:
                raise ValueError("snappy: truncated copy-1 offset")
            offset = ((tag & 0xE0) << 3) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            length = (tag >> 2) + 1
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy-2 offset")
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            length = (tag >> 2) + 1
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy-4 offset")
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError(f"snappy: bad copy offset {offset} at {len(out)}")
        if offset >= length:
            start = len(out) - offset
            out += out[start : start + length]
        else:
            # overlapping copy: byte-wise (run-length expansion)
            for _ in range(length):
                out.append(out[-offset])
    if len(out) != expected:
        raise ValueError(
            f"snappy: decoded {len(out)} bytes, preamble said {expected}"
        )
    return bytes(out)
