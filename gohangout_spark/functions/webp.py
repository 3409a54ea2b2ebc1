"""WebP lossless (VP8L) decode AND encode in pure Python + numpy.

Closes the WebP entry in the image-codec story next to PNG (zlib +
filter algebra), GIF (LZW) and baseline JPEG (DCT + Huffman): VP8L
decodes for real — RIFF/WEBP/VP8L container parse, the LSB-first
bitreader, simple and normal (code-length-coded) canonical Huffman
codes including the zero-bit single-symbol case, per-tile meta-Huffman
groups via the recursive entropy image, LZ77 backward references with
the prefix-coded length/distance scheme and the 120-entry
close-neighbor distance map, the hash-indexed color cache, and all four
inverse transforms (PREDICTOR's 14 modes, COLOR's signed-multiplier
deltas, SUBTRACT_GREEN, COLOR_INDEXING with sub-byte pixel packing).

The encoder writes spec-conformant streams from any RGB(A) array using
flat canonical codes (optionally behind SUBTRACT_GREEN or a packed
palette), which is enough to exercise the decoder's literal, transform
and packing paths with EXACT roundtrips — lossless means equality, not
tolerance. The LZ77/color-cache/meta-Huffman/predictor decode paths are
pinned by hand-assembled bitstreams in the tests (the encoder stays
deliberately simple).

Scope notes: lossy WebP (VP8 intra prediction + DCT) is a different
codec and remains out of scope alongside mp3/aac. The close-neighbor
distance map is generated from the spec's plane-code rule (dx in
-7..8, dy in 0..7 ordered by squared distance; ties larger dy first,
then smaller |dx|, positive dx before negative — matches libwebp's
kCodeToPlane with xoffset = 8-(code&0xF), yoffset = code>>4) —
reference:
https://developers.google.com/speed/webp/docs/webp_lossless_bitstream_specification.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------------- bit io


class _BitReader:
    """LSB-first bit reader (VP8L convention: bit 0 of byte 0 first)."""

    def __init__(self, data: bytes):
        self._d = data
        self.pos = 0  # bit position

    def bit(self) -> int:
        p = self.pos
        if p >> 3 >= len(self._d):
            raise ValueError("VP8L: bitstream exhausted")
        self.pos = p + 1
        return (self._d[p >> 3] >> (p & 7)) & 1

    def bits(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.bit() << i
        return v


class _BitWriter:
    def __init__(self):
        self._bits: list[int] = []

    def put_bits(self, value: int, n: int) -> None:
        for i in range(n):
            self._bits.append((value >> i) & 1)

    def put_code(self, code: int, length: int) -> None:
        """Huffman code bits, MSB of the code first (tree-walk order)."""
        for i in range(length - 1, -1, -1):
            self._bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray((len(self._bits) + 7) // 8)
        for i, b in enumerate(self._bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)


# ------------------------------------------------------- canonical huffman

_CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment (by length, symbol)."""
    syms = sorted(
        (l, s) for s, l in enumerate(lengths) if l > 0
    )
    codes: dict[int, tuple[int, int]] = {}
    code, prev_len = 0, 0
    for l, s in syms:
        code <<= l - prev_len
        codes[s] = (code, l)
        code += 1
        prev_len = l
    return codes


class _HuffTree:
    """Decode-side canonical Huffman: walk bit-by-bit via a (len,code)
    table. A single-symbol tree decodes with ZERO bits consumed (the
    spec's degenerate case — libwebp builds a 0-depth table)."""

    def __init__(self, lengths: list[int]):
        live = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if not live:
            raise ValueError("VP8L: empty huffman code")
        if len(live) == 1:
            self._single: int | None = live[0][0]
            self._table: dict[tuple[int, int], int] = {}
            self._max_len = 0
            return
        self._single = None
        codes = _canonical_codes(lengths)
        # completeness (kraft sum == 1) — a hole makes some bitstrings
        # undecodable, an overfull code is ambiguous
        kraft = sum(1 / (1 << l) for _, l in codes.values())
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError("VP8L: incomplete/overfull huffman code")
        self._table = {(l, c): s for s, (c, l) in codes.items()}
        self._max_len = max(l for _, l in codes.values())

    def read(self, br: _BitReader) -> int:
        if self._single is not None:
            return self._single
        code, length = 0, 0
        while length <= self._max_len:
            code = (code << 1) | br.bit()
            length += 1
            sym = self._table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: bad huffman code in stream")


def _read_code_lengths(br: _BitReader, cl_tree: _HuffTree, n: int) -> list[int]:
    lengths = [0] * n
    if br.bit():  # use max_symbol
        length_nbits = 2 + 2 * br.bits(3)
        max_symbol = 2 + br.bits(length_nbits)
    else:
        max_symbol = n
    sym, prev = 0, 8
    while sym < n:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_tree.read(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            rep = 3 + br.bits(2)
            for _ in range(rep):
                if sym < n:
                    lengths[sym] = prev
                    sym += 1
        elif cl == 17:
            sym += 3 + br.bits(3)
        else:  # 18
            sym += 11 + br.bits(7)
    return lengths


def _read_huffman_code(br: _BitReader, alphabet_size: int) -> _HuffTree:
    if br.bit():  # simple
        num_symbols = br.bit() + 1
        first_8bit = br.bit()
        lengths = [0] * alphabet_size
        s0 = br.bits(8 if first_8bit else 1)
        if num_symbols == 2:
            s1 = br.bits(8)
            lengths[s0] = lengths[s1] = 1
        else:
            lengths[s0] = 1
        return _HuffTree(lengths)
    num_cl = 4 + br.bits(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.bits(3)
    cl_tree = _HuffTree(cl_lengths)
    return _HuffTree(_read_code_lengths(br, cl_tree, alphabet_size))


# -------------------------------------------------------- lz77 prefix code


def _prefix_decode(prefix: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decoding (spec §4.2.2)."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.bits(extra) + 1


def _dist_map() -> list[tuple[int, int]]:
    """The 120 close-neighbor (dx, dy) plane codes (spec kCodeToPlane:
    xoffset = 8 - (code & 0xF), yoffset = code >> 4): neighbors with dy
    in 0..7 (dy=0 only for dx>0), dx in -7..8, ordered by squared
    distance; ties break larger dy first, then smaller |dx|, positive
    dx before negative."""
    cands = []
    for dy in range(8):
        for dx in range(-7, 9):
            if dy == 0 and dx <= 0:
                continue
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] ** 2 + p[1] ** 2, -p[1], abs(p[0]), -p[0]))
    return cands


_DIST_MAP = _dist_map()


def _cache_key(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


# ---------------------------------------------------------------- decoder

_ALPHABETS = [256 + 24, 256, 256, 256, 40]  # green gets +cache_size


class WebpLosslessCodec:
    """decode(payload) -> HxWx4 uint8 RGBA; encode(pixels, ...) -> bytes."""

    # ------------------------------------------------------------ decode

    def decode(self, payload: bytes) -> np.ndarray:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
            raise ValueError("not a RIFF/WEBP payload")
        pos, vp8l = 12, None
        while pos + 8 <= len(payload):
            fourcc = payload[pos : pos + 4]
            size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
            if fourcc == b"VP8L":
                vp8l = payload[pos + 8 : pos + 8 + size]
                break
            pos += 8 + size + (size % 2)
        if vp8l is None:
            raise ValueError("no VP8L chunk (lossy VP8/VP8X not supported)")
        if vp8l[0] != 0x2F:
            raise ValueError("bad VP8L signature byte")
        br = _BitReader(vp8l[1:])
        w = br.bits(14) + 1
        h = br.bits(14) + 1
        br.bit()  # alpha hint
        if br.bits(3) != 0:
            raise ValueError("unknown VP8L version")
        argb = self._decode_image(br, w, h, is_level0=True)
        out = np.zeros((h, w, 4), dtype=np.uint8)
        out[..., 0] = (argb >> 16) & 0xFF  # R
        out[..., 1] = (argb >> 8) & 0xFF   # G
        out[..., 2] = argb & 0xFF          # B
        out[..., 3] = (argb >> 24) & 0xFF  # A
        return out

    def _decode_image(
        self, br: _BitReader, w: int, h: int, is_level0: bool
    ) -> np.ndarray:
        transforms = []
        xsize = w
        if is_level0:
            while br.bit():
                ttype = br.bits(2)
                if any(t[0] == ttype for t in transforms):
                    raise ValueError("VP8L: duplicate transform")
                transforms.append(self._read_transform(br, ttype, xsize, h))
                if ttype == 3:  # color indexing packs pixels
                    ncolors = len(transforms[-1][1])
                    wb = 3 if ncolors <= 2 else 2 if ncolors <= 4 else (
                        1 if ncolors <= 16 else 0
                    )
                    xsize = (xsize + (1 << wb) - 1) >> wb
        cache_bits = br.bits(4) if br.bit() else 0
        if cache_bits and not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color cache size")

        # meta huffman (spatially varying code groups)
        meta = None
        meta_bits = 0
        n_groups = 1
        if is_level0 and br.bit():
            meta_bits = br.bits(3) + 2
            mw = (xsize + (1 << meta_bits) - 1) >> meta_bits
            mh = (h + (1 << meta_bits) - 1) >> meta_bits
            meta_img = self._decode_image(br, mw, mh, is_level0=False)
            meta = ((meta_img >> 8) & 0xFFFF).astype(np.int64)
            n_groups = int(meta.max()) + 1

        groups = []
        for _ in range(n_groups):
            sizes = list(_ALPHABETS)
            sizes[0] += (1 << cache_bits) if cache_bits else 0
            groups.append([_read_huffman_code(br, s) for s in sizes])

        cache = [0] * (1 << cache_bits) if cache_bits else None
        n = xsize * h
        pix = np.zeros(n, dtype=np.uint32)
        pos = 0
        while pos < n:
            if meta is not None:
                x, y = pos % xsize, pos // xsize
                g = groups[int(meta[y >> meta_bits, x >> meta_bits])]
            else:
                g = groups[0]
            s = g[0].read(br)
            if s < 256:
                red = g[1].read(br)
                blue = g[2].read(br)
                alpha = g[3].read(br)
                v = (alpha << 24) | (red << 16) | (s << 8) | blue
                pix[pos] = v
                if cache is not None:
                    cache[_cache_key(v, cache_bits)] = v
                pos += 1
            elif s < 256 + 24:
                length = _prefix_decode(s - 256, br)
                dcode = _prefix_decode(g[4].read(br), br)
                if dcode > 120:
                    dist = dcode - 120
                else:
                    dx, dy = _DIST_MAP[dcode - 1]
                    dist = max(1, dy * xsize + dx)
                if dist > pos or pos + length > n:
                    raise ValueError("VP8L: backward reference out of range")
                for i in range(length):
                    v = int(pix[pos - dist + i])
                    pix[pos + i] = v
                    if cache is not None:
                        cache[_cache_key(v, cache_bits)] = v
                pos += length
            else:
                if cache is None:
                    raise ValueError("VP8L: cache symbol without color cache")
                pix[pos] = cache[s - 256 - 24]
                pos += 1

        img = pix.reshape(h, xsize)
        for ttype, data in reversed(transforms):
            img = self._inverse_transform(ttype, data, img, w, h)
        return img

    # ------------------------------------------------------ transforms

    def _read_transform(self, br: _BitReader, ttype: int, w: int, h: int):
        if ttype == 2:  # SUBTRACT_GREEN: no data
            return (2, None)
        if ttype in (0, 1):  # PREDICTOR / COLOR: tiled sub-image
            bits = br.bits(3) + 2
            tw = (w + (1 << bits) - 1) >> bits
            th = (h + (1 << bits) - 1) >> bits
            tiles = self._decode_image(br, tw, th, is_level0=False)
            return (ttype, (bits, tiles))
        if ttype == 3:  # COLOR_INDEXING
            ncolors = br.bits(8) + 1
            pal_img = self._decode_image(br, ncolors, 1, is_level0=False)
            # palette entries are component-delta coded
            pal = np.zeros(ncolors, dtype=np.uint32)
            prev = 0
            for i in range(ncolors):
                cur = int(pal_img[0, i])
                # per-channel byte-wise addition
                a = ((prev >> 24) + (cur >> 24)) & 0xFF
                r = (((prev >> 16) & 0xFF) + ((cur >> 16) & 0xFF)) & 0xFF
                g = (((prev >> 8) & 0xFF) + ((cur >> 8) & 0xFF)) & 0xFF
                b = ((prev & 0xFF) + (cur & 0xFF)) & 0xFF
                prev = (a << 24) | (r << 16) | (g << 8) | b
                pal[i] = prev
            return (3, pal)
        raise ValueError(f"VP8L: unknown transform {ttype}")

    @staticmethod
    def _avg2(a: np.uint32, b: np.uint32) -> int:
        a, b = int(a), int(b)
        out = 0
        for shift in (0, 8, 16, 24):
            out |= ((((a >> shift) & 0xFF) + ((b >> shift) & 0xFF)) >> 1) << shift
        return out

    def _inverse_transform(self, ttype, data, img, w, h):
        if ttype == 2:  # add green
            g = (img >> 8) & 0xFF
            r = (((img >> 16) & 0xFF) + g) & 0xFF
            b = ((img & 0xFF) + g) & 0xFF
            return (img & 0xFF00FF00) | (r.astype(np.uint32) << 16) | b.astype(
                np.uint32
            )
        if ttype == 3:  # palette lookup (+ sub-byte unpack)
            pal = data
            ncolors = len(pal)
            wb = 3 if ncolors <= 2 else 2 if ncolors <= 4 else (
                1 if ncolors <= 16 else 0
            )
            if wb == 0:
                idx = (img >> 8) & 0xFF
            else:
                per = 1 << wb
                ibits = 8 >> wb
                mask = (1 << ibits) - 1
                packed = ((img >> 8) & 0xFF).astype(np.uint32)
                cols = []
                for j in range(per):
                    cols.append((packed >> (j * ibits)) & mask)
                idx = np.stack(cols, axis=-1).reshape(h, -1)[:, :w]
            idx = np.minimum(idx, ncolors - 1)
            return pal[idx.astype(np.int64)]
        if ttype == 1:  # color transform (inverse)
            bits, tiles = data

            def s8(v: int) -> int:  # two's-complement byte
                return v - 256 if v >= 128 else v

            out = img.copy()
            for y in range(h):
                trow = tiles[y >> bits]
                for x in range(w):
                    cte = int(trow[x >> bits])
                    g2r = s8(cte & 0xFF)
                    g2b = s8((cte >> 8) & 0xFF)
                    r2b = s8((cte >> 16) & 0xFF)
                    v = int(out[y, x])
                    g = s8((v >> 8) & 0xFF)
                    r = (((v >> 16) & 0xFF) + ((g2r * g) >> 5)) & 0xFF
                    b = (v & 0xFF) + ((g2b * g) >> 5)
                    b = (b + ((r2b * s8(r)) >> 5)) & 0xFF
                    out[y, x] = (v & 0xFF00FF00) | (r << 16) | b
            return out
        if ttype == 0:  # predictor (inverse): pixel = residual + pred
            bits, tiles = data
            out = img.astype(np.uint32).copy()

            def add(p, q):
                r = 0
                for sh in (0, 8, 16, 24):
                    r |= ((((p >> sh) & 0xFF) + ((q >> sh) & 0xFF)) & 0xFF) << sh
                return r

            def clamp_add_sub_full(l, t, tl):
                r = 0
                for sh in (0, 8, 16, 24):
                    v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
                    r |= max(0, min(255, v)) << sh
                return r

            def clamp_add_sub_half(l, t, tl):
                r = 0
                for sh in (0, 8, 16, 24):
                    a = (((l >> sh) & 0xFF) + ((t >> sh) & 0xFF)) >> 1
                    d = a - ((tl >> sh) & 0xFF)
                    # C division truncates toward zero, not floor
                    v = a + (abs(d) // 2) * (1 if d >= 0 else -1)
                    r |= max(0, min(255, v)) << sh
                return r

            def select(l, t, tl):
                # spec: predict = |t+l-tl - l| vs |t+l-tl - t| per channel
                dl = sum(
                    abs((((t >> sh) & 0xFF) + ((l >> sh) & 0xFF) - ((tl >> sh) & 0xFF)) - ((l >> sh) & 0xFF))
                    for sh in (0, 8, 16, 24)
                )
                dt = sum(
                    abs((((t >> sh) & 0xFF) + ((l >> sh) & 0xFF) - ((tl >> sh) & 0xFF)) - ((t >> sh) & 0xFF))
                    for sh in (0, 8, 16, 24)
                )
                return l if dt > dl else t

            for y in range(h):
                for x in range(w):
                    if x == 0 and y == 0:
                        pred = 0xFF000000
                    elif y == 0:
                        pred = int(out[0, x - 1])  # left
                    elif x == 0:
                        pred = int(out[y - 1, 0])  # top
                    else:
                        mode = (int(tiles[y >> bits, x >> bits]) >> 8) & 0xFF
                        L = int(out[y, x - 1])
                        T = int(out[y - 1, x])
                        TL = int(out[y - 1, x - 1])
                        # rightmost column: spec addresses P[pos-width+1],
                        # i.e. the CURRENT row's leftmost (already decoded)
                        TR = int(out[y - 1, x + 1]) if x + 1 < w else int(
                            out[y, 0]
                        )
                        if mode == 0:
                            pred = 0xFF000000
                        elif mode == 1:
                            pred = L
                        elif mode == 2:
                            pred = T
                        elif mode == 3:
                            pred = TR
                        elif mode == 4:
                            pred = TL
                        elif mode == 5:
                            pred = self._avg2(self._avg2(L, TR), T)
                        elif mode == 6:
                            pred = self._avg2(L, TL)
                        elif mode == 7:
                            pred = self._avg2(L, T)
                        elif mode == 8:
                            pred = self._avg2(TL, T)
                        elif mode == 9:
                            pred = self._avg2(T, TR)
                        elif mode == 10:
                            pred = self._avg2(self._avg2(L, TL), self._avg2(T, TR))
                        elif mode == 11:
                            pred = select(L, T, TL)
                        elif mode == 12:
                            pred = clamp_add_sub_full(L, T, TL)
                        elif mode == 13:
                            pred = clamp_add_sub_half(L, T, TL)
                        else:
                            raise ValueError(f"VP8L: bad predictor mode {mode}")
                    out[y, x] = add(int(out[y, x]), pred)
            return out
        raise ValueError(f"VP8L: unknown transform {ttype}")

    # ------------------------------------------------------------ encode

    @staticmethod
    def _write_flat_code(bw: _BitWriter, alphabet_size: int, used: int) -> None:
        """Normal code: first ``used`` symbols at length 8 (kraft-complete
        requires used == 256), the rest zero via repeat-18 runs."""
        assert used == 256, "flat code is only kraft-complete at 256 symbols"
        bw.put_bits(0, 1)  # not simple
        # code-length code: symbols {8, 18} at length 1 each.
        # positions in _CL_ORDER: 18 -> index 1, 8 -> index 12
        bw.put_bits(13 - 4, 4)  # num_code_lengths = 13
        cl = {18: 1, 8: 1}
        for i in range(13):
            bw.put_bits(cl.get(_CL_ORDER[i], 0), 3)
        cl_codes = _canonical_codes(
            [cl.get(s, 0) for s in range(19)]
        )
        bw.put_bits(0, 1)  # no max_symbol shortcut
        c8, l8 = cl_codes[8]
        for _ in range(256):
            bw.put_code(c8, l8)
        zeros = alphabet_size - 256
        c18, l18 = cl_codes[18]
        while zeros > 0:
            run = min(zeros, 138)
            if run < 11:
                # tail shorter than a rep-18: pad with explicit 8s? cannot
                # (kraft). Alphabets here always leave >= 24 zeros.
                raise AssertionError("zero tail too short for rep-18")
            bw.put_code(c18, l18)
            bw.put_bits(run - 11, 7)
            zeros -= run

    @staticmethod
    def _write_normal_code(bw: _BitWriter, lengths: list[int]) -> None:
        """General normal-code emission for an arbitrary (kraft-complete)
        length assignment: the code-length tree is a flat 3-bit code over
        exactly 8 CL symbols (the used ones padded from the unused pool),
        zero runs use CL 17/18. Used by tests to assemble streams that
        exercise decode-only paths (LZ77, color cache, custom trees)."""
        used = {l for l in lengths if l > 0}
        runs: list[tuple[int, int]] = []  # (cl_symbol_or_-run, count)
        i = 0
        while i < len(lengths):
            if lengths[i] == 0:
                j = i
                while j < len(lengths) and lengths[j] == 0:
                    j += 1
                runs.append((-1, j - i))
                i = j
            else:
                runs.append((lengths[i], 1))
                i += 1
        # trailing zeros must still be emitted: without the max_symbol
        # shortcut the reader consumes code lengths for ALL symbols
        zero_syms = set()
        for sym, cnt in runs:
            if sym == -1:
                if cnt >= 11:
                    zero_syms.add(18)
                    if cnt % 138 and 0 < cnt % 138 < 11:
                        zero_syms.add(0)
                elif cnt >= 3:
                    zero_syms.add(17)
                else:
                    zero_syms.add(0)
        cl_used = used | zero_syms
        if len(cl_used) > 8:
            raise ValueError("normal-code writer supports <= 8 CL symbols")
        pool = [s for s in range(19) if s not in cl_used]
        chosen = sorted(cl_used) + pool[: 8 - len(cl_used)]
        cl_lengths = [0] * 19
        for s in chosen:
            cl_lengths[s] = 3
        num_cl = max(_CL_ORDER.index(s) for s in chosen) + 1
        bw.put_bits(0, 1)  # not simple
        bw.put_bits(num_cl - 4, 4)
        for i in range(num_cl):
            bw.put_bits(cl_lengths[_CL_ORDER[i]], 3)
        cl_codes = _canonical_codes(cl_lengths)
        bw.put_bits(0, 1)  # no max_symbol shortcut
        for sym, cnt in runs:
            if sym >= 0:
                c, l = cl_codes[sym]
                bw.put_code(c, l)
                continue
            left = cnt
            while left > 0:
                if left >= 11:
                    take = min(left, 138)
                    if 0 < left - take < 11 and take > 11:
                        take = left - 11  # keep the tail 18-codable
                    c, l = cl_codes[18]
                    bw.put_code(c, l)
                    bw.put_bits(take - 11, 7)
                elif left >= 3:
                    take = left
                    c, l = cl_codes[17]
                    bw.put_code(c, l)
                    bw.put_bits(take - 3, 3)
                else:
                    take = 1
                    c, l = cl_codes[0]
                    bw.put_code(c, l)
                left -= take

    @staticmethod
    def _write_single_code(bw: _BitWriter, symbol: int) -> None:
        bw.put_bits(1, 1)  # simple
        bw.put_bits(0, 1)  # one symbol
        if symbol < 2:
            bw.put_bits(0, 1)  # 1-bit first symbol
            bw.put_bits(symbol, 1)
        else:
            bw.put_bits(1, 1)  # 8-bit first symbol
            bw.put_bits(symbol, 8)

    def encode(
        self,
        pixels: np.ndarray,
        *,
        subtract_green: bool = False,
        palette: bool = False,
    ) -> bytes:
        """Spec-conformant VP8L from HxWx3 RGB or HxWx4 RGBA uint8.
        ``subtract_green`` / ``palette`` (<= 16 distinct colors, packed)
        route the stream through the respective transform machinery."""
        px = np.asarray(pixels, dtype=np.uint8)
        if px.ndim != 3 or px.shape[2] not in (3, 4):
            raise ValueError("expected HxWx3 or HxWx4 uint8")
        h, w = px.shape[:2]
        if px.shape[2] == 3:
            px = np.concatenate(
                [px, np.full((h, w, 1), 255, dtype=np.uint8)], axis=2
            )
        argb = (
            px[..., 3].astype(np.uint32) << 24
            | px[..., 0].astype(np.uint32) << 16
            | px[..., 1].astype(np.uint32) << 8
            | px[..., 2].astype(np.uint32)
        )

        bw = _BitWriter()
        bw.put_bits(w - 1, 14)
        bw.put_bits(h - 1, 14)
        bw.put_bits(1 if (px[..., 3] != 255).any() else 0, 1)
        bw.put_bits(0, 3)  # version

        if palette:
            pal, inv = np.unique(argb.reshape(-1), return_inverse=True)
            if len(pal) > 16:
                raise ValueError("palette encode supports <= 16 colors")
            bw.put_bits(1, 1)
            bw.put_bits(3, 2)  # COLOR_INDEXING
            bw.put_bits(len(pal) - 1, 8)
            # palette sub-image, delta-coded per channel
            deltas = []
            prev = 0
            for v in pal.tolist():
                d = 0
                for sh in (0, 8, 16, 24):
                    d |= (((v >> sh) & 0xFF) - ((prev >> sh) & 0xFF)) % 256 << sh
                deltas.append(d)
                prev = v
            self._encode_entropy_image(bw, np.array(deltas, dtype=np.uint32).reshape(1, -1))
            bw.put_bits(0, 1)  # end of transforms
            # pack indices into green bytes
            wb = 3 if len(pal) <= 2 else 2 if len(pal) <= 4 else 1
            per = 1 << wb
            ibits = 8 >> wb
            idx = inv.reshape(h, w)
            pw = (w + per - 1) // per
            packed = np.zeros((h, pw), dtype=np.uint32)
            for j in range(per):
                cols = idx[:, j::per]
                packed[:, : cols.shape[1]] |= cols.astype(np.uint32) << (
                    j * ibits
                )
            body = (packed << 8) | 0xFF000000  # alpha 255, r/b 0
            self._encode_pixels(bw, body)
        else:
            if subtract_green:
                bw.put_bits(1, 1)
                bw.put_bits(2, 2)  # SUBTRACT_GREEN
                g = (argb >> 8) & 0xFF
                r = (((argb >> 16) & 0xFF) - g) & 0xFF
                b = ((argb & 0xFF) - g) & 0xFF
                argb = (argb & 0xFF00FF00) | (r << 16) | b
            bw.put_bits(0, 1)  # end of transforms
            self._encode_pixels(bw, argb)

        payload = b"\x2f" + bw.bytes()
        vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) % 2:
            vp8l += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(vp8l)) + b"WEBP" + vp8l

    def _encode_pixels(
        self, bw: _BitWriter, argb: np.ndarray, level0: bool = True
    ) -> None:
        """Literal-only body: no cache, no meta, flat 8-bit ARGB codes.
        Sub-images (``level0=False``) carry no meta-huffman bit."""
        bw.put_bits(0, 1)  # no color cache
        if level0:
            bw.put_bits(0, 1)  # no meta huffman
        self._write_flat_code(bw, 256 + 24, 256)  # green
        for _ in range(3):  # red, blue, alpha
            self._write_flat_code(bw, 256, 256)
        self._write_single_code(bw, 0)  # distance (unused)
        flat = argb.reshape(-1)
        for v in flat.tolist():
            bw.put_code((v >> 8) & 0xFF, 8)   # green
            bw.put_code((v >> 16) & 0xFF, 8)  # red
            bw.put_code(v & 0xFF, 8)          # blue
            bw.put_code((v >> 24) & 0xFF, 8)  # alpha

    def _encode_entropy_image(self, bw: _BitWriter, argb: np.ndarray) -> None:
        """Sub-image stream (is_level0=False): no transform bit, no meta
        bit — straight to cache flag and codes."""
        self._encode_pixels(bw, argb, level0=False)
