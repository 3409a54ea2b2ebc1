"""LZ4 block + frame codec and XXH32, from scratch — no lz4/xxhash
wheel exists in this container, but all three FORMATS are public
(lz4_Block_format.md, lz4_Frame_format.md, xxHash spec), so the Kafka
wire tier's lz4 leg is implementable rather than waivable — the same
judgment as crc32c/murmur2/snappy.

Block format (lz4_Block_format.md): a stream of sequences —
token byte (high nibble = literal length, low nibble = match length-4;
nibble value 15 extends with 255-terminated extra bytes), the literals,
then a 2-byte little-endian match offset (1..65535) and any match
length extension. The LAST sequence is literals-only (no offset).
Compressor end-of-block rules: the last 5 bytes are always literals,
and the last match must start at least 12 bytes before the end.

Frame format (lz4_Frame_format.md): magic 0x184D2204 LE | FLG | BD |
HC | data blocks | EndMark (u32 0) | optional content checksum.
FLG: version=01 in bits 7-6; we set block-independence (bit 5) and
content-checksum (bit 2). BD: block-max-size code in bits 6-4 (7 =
4 MiB). HC = byte 1 of XXH32(FLG+BD, seed 0). Each data block is
u32-LE size (high bit set = stored uncompressed) + data. The content
checksum is XXH32(whole uncompressed payload, seed 0) — this is the
checksum Kafka's lz4 leg validates end to end.

XXH32 (public xxHash spec): four 32-bit lanes over 16-byte stripes with
prime multiplies and rotations, a tail loop, and a final avalanche.
Pinned against the reference check values in tests
(XXH32("") = 0x02CC5D05 etc.).
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B1
_P2 = 0x85EBCA77
_P3 = 0xC2B2AE3D
_P4 = 0x27D4EB2F
_P5 = 0x165667B1
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    n = len(data)
    pos = 0
    if n >= 16:
        v1 = (seed + _P1 + _P2) & _M32
        v2 = (seed + _P2) & _M32
        v3 = seed & _M32
        v4 = (seed - _P1) & _M32
        limit = n - 16
        while pos <= limit:
            lanes = struct.unpack_from("<IIII", data, pos)
            v1 = (_rotl((v1 + lanes[0] * _P2) & _M32, 13) * _P1) & _M32
            v2 = (_rotl((v2 + lanes[1] * _P2) & _M32, 13) * _P1) & _M32
            v3 = (_rotl((v3 + lanes[2] * _P2) & _M32, 13) * _P1) & _M32
            v4 = (_rotl((v4 + lanes[3] * _P2) & _M32, 13) * _P1) & _M32
            pos += 16
        acc = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M32
    else:
        acc = (seed + _P5) & _M32
    acc = (acc + n) & _M32
    while pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc = (_rotl((acc + lane * _P3) & _M32, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        acc = (_rotl((acc + data[pos] * _P5) & _M32, 11) * _P1) & _M32
        pos += 1
    acc ^= acc >> 15
    acc = (acc * _P2) & _M32
    acc ^= acc >> 13
    acc = (acc * _P3) & _M32
    acc ^= acc >> 16
    return acc


# ----------------------------------------------------------- block codec

_MIN_MATCH = 4
_LAST_LITERALS = 5
_MF_LIMIT = 12  # a match may not start within this many bytes of the end


def _write_len(out: bytearray, n: int) -> None:
    while n >= 255:
        out.append(255)
        n -= 255
    out.append(n)


def compress_block(data: bytes) -> bytes:
    """Greedy hash-match LZ4 block compressor (conformant output; ratio
    is secondary to correctness for the wire tier)."""
    n = len(data)
    out = bytearray()
    if n == 0:
        out.append(0)  # one empty-literal token
        return bytes(out)
    table: dict[bytes, int] = {}
    pos = 0
    lit_start = 0
    limit = n - _MF_LIMIT  # last match must start before here
    while pos < limit:
        seed = data[pos : pos + 4]
        cand = table.get(seed)
        table[seed] = pos
        if cand is None or pos - cand > 0xFFFF or data[cand : cand + 4] != seed:
            pos += 1
            continue
        length = _MIN_MATCH
        # matches may not consume the last 5 bytes
        max_len = n - _LAST_LITERALS - pos
        while length < max_len and data[cand + length] == data[pos + length]:
            length += 1
        lit = data[lit_start:pos]
        lit_len = len(lit)
        token_lit = 15 if lit_len >= 15 else lit_len
        token_match = 15 if length - _MIN_MATCH >= 15 else length - _MIN_MATCH
        out.append((token_lit << 4) | token_match)
        if token_lit == 15:
            _write_len(out, lit_len - 15)
        out += lit
        out += (pos - cand).to_bytes(2, "little")
        if token_match == 15:
            _write_len(out, length - _MIN_MATCH - 15)
        pos += length
        lit_start = pos
    # final literals-only sequence
    lit = data[lit_start:]
    lit_len = len(lit)
    token_lit = 15 if lit_len >= 15 else lit_len
    out.append(token_lit << 4)
    if token_lit == 15:
        _write_len(out, lit_len - 15)
    out += lit
    return bytes(out)


def decompress_block(data: bytes, max_size: int = 1 << 28) -> bytes:
    out = bytearray()
    n = len(data)
    pos = 0
    while pos < n:
        token = data[pos]
        pos += 1
        lit_len = token >> 4
        if lit_len == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated literal length")
                b = data[pos]
                pos += 1
                lit_len += b
                if b != 255:
                    break
        if pos + lit_len > n:
            raise ValueError("lz4: truncated literals")
        out += data[pos : pos + lit_len]
        pos += lit_len
        if pos >= n:
            break  # last sequence: literals only
        if pos + 2 > n:
            raise ValueError("lz4: truncated match offset")
        offset = int.from_bytes(data[pos : pos + 2], "little")
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError(f"lz4: bad match offset {offset} at {len(out)}")
        match_len = (token & 0x0F) + _MIN_MATCH
        if (token & 0x0F) == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated match length")
                b = data[pos]
                pos += 1
                match_len += b
                if b != 255:
                    break
        if len(out) + match_len > max_size:
            raise ValueError("lz4: output exceeds max_size")
        if offset >= match_len:
            start = len(out) - offset
            out += out[start : start + match_len]
        else:
            for _ in range(match_len):
                out.append(out[-offset])
    return bytes(out)


# ----------------------------------------------------------- frame codec

_MAGIC = 0x184D2204
_BLOCK_MAX = 4 << 20  # BD code 7


def compress_frame(data: bytes) -> bytes:
    """One LZ4 frame: block-independent 4 MiB blocks + content checksum
    (the layout Kafka's lz4 message attribute carries)."""
    flg = (1 << 6) | (1 << 5) | (1 << 2)  # version 01, B.Indep, C.Checksum
    bd = 7 << 4
    header = bytes([flg, bd])
    hc = (xxh32(header) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", _MAGIC) + header + bytes([hc]))
    for i in range(0, max(len(data), 1), _BLOCK_MAX):
        chunk = data[i : i + _BLOCK_MAX]
        if not chunk:
            break
        comp = compress_block(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp)) + comp
        else:
            # incompressible: stored block (high bit set)
            out += struct.pack("<I", len(chunk) | 0x80000000) + chunk
    out += struct.pack("<I", 0)  # EndMark
    out += struct.pack("<I", xxh32(data))
    return bytes(out)


def decompress_frame(data: bytes) -> bytes:
    if len(data) < 7:
        raise ValueError("lz4: frame too short")
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != _MAGIC:
        raise ValueError(f"lz4: bad frame magic {magic:#x}")
    flg, bd = data[4], data[5]
    if (flg >> 6) != 1:
        raise ValueError("lz4: unsupported frame version")
    has_content_size = bool(flg & (1 << 3))
    has_block_checksum = bool(flg & (1 << 4))
    has_content_checksum = bool(flg & (1 << 2))
    pos = 6
    if has_content_size:
        pos += 8
    hc = data[pos]
    pos += 1
    if ((xxh32(data[4:pos - 1]) >> 8) & 0xFF) != hc:
        raise ValueError("lz4: frame header checksum mismatch")
    if bd & 0x8F:
        raise ValueError("lz4: reserved BD bits set")
    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise ValueError("lz4: truncated block size")
        (size,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if size == 0:
            break  # EndMark
        stored = bool(size & 0x80000000)
        size &= 0x7FFFFFFF
        if pos + size > len(data):
            raise ValueError("lz4: truncated block")
        block = data[pos : pos + size]
        pos += size
        if has_block_checksum:
            if pos + 4 > len(data):
                raise ValueError("lz4: truncated block checksum")
            (bc,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxh32(block) != bc:
                raise ValueError("lz4: block checksum mismatch")
        out += block if stored else decompress_block(block)
    if has_content_checksum:
        if pos + 4 > len(data):
            raise ValueError("lz4: truncated content checksum")
        (cc,) = struct.unpack_from("<I", data, pos)
        if xxh32(bytes(out)) != cc:
            raise ValueError("lz4: content checksum mismatch")
    return bytes(out)
