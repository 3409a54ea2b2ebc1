"""Baseline JPEG (ITU-T T.81 / JFIF) decode AND encode in numpy + stdlib.

The last image-format gap the container's missing libraries forced: with
this module the engine decodes JPEG for real — marker parse, Huffman
entropy decode, dequantize, de-zigzag, 8×8 IDCT, chroma upsampling,
YCbCr→RGB. The encoder exists to produce test payloads and closes the
loop: 4:4:4 baseline, quality-scaled Annex-K quantization tables, and
HUFFMAN TABLES BUILT FROM THE DATA (canonical, written to DHT) — so no
hand-transcribed code tables anywhere; the decoder reads whatever DHT
declares, which also covers optimized-Huffman files from other encoders.

Decoder scope: baseline sequential DCT (SOF0), 8-bit samples, 1-3
components, sampling factors 1-2 (4:4:4, 4:2:2, 4:2:0), restart markers —
and the encoder can emit all of those layouts too (subsample= and
restart_interval=), so every decoder path has roundtrip coverage.
Progressive (SOF2) and arithmetic coding raise with a clear message.

JPEG is lossy: roundtrips are asserted within quantization tolerance, and
the DC-only closed form for solid-color images (every AC coefficient is
zero, so decode = dequantized-DC reconstruction exactly) gives the
analytic oracle the workload query checks end to end.
"""

from __future__ import annotations

import struct

import numpy as np

# orthonormal 8x8 DCT basis: DCT X = D @ B @ D.T, IDCT B = D.T @ X @ D
_D = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        c = np.sqrt(1 / 8) if _u == 0 else np.sqrt(2 / 8)
        _D[_u, _x] = c * np.cos((2 * _x + 1) * _u * np.pi / 16)

# Annex K example quantization tables (the ones every camera scales)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality scaling of the Annex-K tables."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qt = (base * scale + 50) // 100
    return np.clip(qt, 1, 255).astype(np.int32)


def _rgb_to_ycbcr(px: np.ndarray) -> np.ndarray:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


# ------------------------------------------------------------------ huffman

def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """DHT (BITS, HUFFVAL) → {symbol: (code, length)} per T.81 C.2."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _adjust_bits(hist: list[int], limit: int) -> list[int]:
    """T.81 Annex K.3 length limiting: push pairs of over-long codes up
    into shorter lengths until nothing exceeds ``limit``. ``hist`` is a
    1-indexed-by-length histogram (index 0 = length 1)."""
    hist = list(hist)
    for i in range(len(hist) - 1, limit - 1, -1):
        while hist[i] > 0:
            j = i - 2
            while hist[j] == 0:
                j -= 1
            hist[i] -= 2
            hist[i - 1] += 1
            hist[j + 1] += 2
            hist[j] -= 1
    return hist[:limit] + [0] * max(0, limit - len(hist[:limit]))


def _build_huffman(freqs: dict[int, int]) -> tuple[list[int], list[int]]:
    """Symbol frequencies → JPEG (BITS, HUFFVAL): Huffman code lengths via
    heapq, LENGTH-LIMITED to 16 bits with Annex K's adjust_bits (skewed
    frequency profiles legitimately exceed 16 — code-review r4), symbols
    assigned canonically in (length, symbol) order. The all-ones codeword
    is reserved per T.81 (the final canonical code is deepened by one bit
    when the table would be Kraft-complete) so the 1-bit padding written
    before RSTn/EOI can never decode as a symbol."""
    import heapq
    from itertools import count

    if not freqs:
        freqs = {0: 1}
    if len(freqs) == 1:
        ((sym, _),) = freqs.items()
        return [1] + [0] * 15, [sym]
    tick = count()
    depth: dict[int, int] = {s: 0 for s in freqs}
    # classic Huffman; each heap node carries its member symbols so merges
    # can bump every member's depth
    nodes = {sym: [sym] for sym in freqs}
    heap = [(f, next(tick), sym) for sym, f in freqs.items()]
    heapq.heapify(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        merged = (s1, s2)
        nodes[merged] = nodes.pop(s1) + nodes.pop(s2)
        for sym in nodes[merged]:
            depth[sym] += 1
        heapq.heappush(heap, (f1 + f2, next(tick), merged))
    maxlen = max(depth.values())
    hist = [0] * max(16, maxlen)
    for s in freqs:
        hist[depth[s] - 1] += 1
    bits = _adjust_bits(hist, 16)
    # reserve the all-ones code: if the adjusted lengths are Kraft-complete
    # the canonically-last (deepest) code is all 1-bits — deepen it by one
    kraft = sum(n / (1 << (i + 1)) for i, n in enumerate(bits))
    if kraft >= 1.0 - 1e-12:
        deepest = max(i for i, n in enumerate(bits) if n)
        if deepest == 15:  # already at 16 bits: make room first
            bits = _adjust_bits(bits, 15) + [0]
            deepest = max(i for i, n in enumerate(bits) if n)
        bits[deepest] -= 1
        bits[deepest + 1] += 1
    # canonical symbol order: sort by ORIGINAL depth then symbol, then
    # re-assign to the adjusted length histogram in that order
    ordered = sorted(freqs, key=lambda s: (depth[s], s))
    return bits, ordered


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _amplitude_bits(v: int, size: int) -> int:
    """T.81 F.1.2.1: negative amplitudes encode as v - 1 in `size` bits."""
    return v if v >= 0 else v + (1 << size) - 1


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self):
        while self.n <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0xFF  # pad past end
                self.n += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # destuff
                else:
                    # marker reached (RSTn handled by caller) — pad
                    self.pos -= 1
                    self.acc = (self.acc << 8) | 0xFF
                    self.n += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, lut: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            if (code, length) in lut:
                return lut[(code, length)]
        raise ValueError("invalid Huffman code in JPEG stream")

    def align(self):
        self.n = 0
        self.acc = 0

    def skip_rst(self) -> bool:
        """Consume an RSTn marker at the current byte position if present."""
        self.align()
        p = self.pos
        while p < len(self.data) and self.data[p] == 0xFF:
            nxt = self.data[p + 1] if p + 1 < len(self.data) else 0
            if 0xD0 <= nxt <= 0xD7:
                self.pos = p + 2
                return True
            if nxt == 0xFF:
                p += 1
                continue
            break
        return False


# ------------------------------------------------------------------ encoder

def _encode_block(
    block: np.ndarray, qt: np.ndarray, dc_pred: int
) -> tuple[list[tuple[str, int, int]], int]:
    """One 8x8 sample block → list of (kind, symbol, extra-bits) tokens.
    kind 'dc'/'ac' selects the Huffman table at serialization time."""
    coef = _D @ (block - 128.0) @ _D.T
    q = np.round(coef / qt).astype(np.int32)
    zz = q.flatten()[_ZIGZAG]
    tokens: list[tuple[str, int, int]] = []
    diff = int(zz[0]) - dc_pred
    size = _category(diff)
    tokens.append(("dc", size, _amplitude_bits(diff, size)))
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            if run == 16:
                tokens.append(("ac", 0xF0, 0))  # ZRL
                run = 0
            continue
        size = _category(v)
        tokens.append(("ac", (run << 4) | size, _amplitude_bits(v, size)))
        run = 0
    if last_nz < 63:
        tokens.append(("ac", 0x00, 0))  # EOB
    return tokens, int(zz[0])


class JpegCodec:
    """Baseline JPEG decode/encode — see module docstring. ``subsample``
    selects 4:4:4 (default) or 4:2:0 chroma on ENCODE (2×2 mean-pooled
    chroma, the near-universal camera layout); decode handles either from
    the SOF sampling factors."""

    def __init__(
        self,
        quality: int = 90,
        subsample: str = "444",
        restart_interval: int = 0,
    ):
        if subsample not in ("444", "422", "420"):
            raise ValueError("subsample must be '444', '422' or '420'")
        self.quality = quality
        self.subsample = subsample
        # emit DRI + RSTn every N MCUs (0 = none): real-world encoders do,
        # so the decoder's restart path gets roundtrip coverage
        self.restart_interval = int(restart_interval)

    # -------------------------------------------------------------- encode

    def encode(self, pixels: np.ndarray) -> bytes:
        px = np.asarray(pixels, dtype=np.uint8)
        if px.ndim != 3 or px.shape[2] != 3:
            raise ValueError("JPEG encode expects HxWx3 RGB")
        h, w = px.shape[:2]
        qt_l = _scaled_qt(_QT_LUMA, self.quality)
        qt_c = _scaled_qt(_QT_CHROMA, self.quality)
        ycc = _rgb_to_ycbcr(px)
        hs = 2 if self.subsample in ("420", "422") else 1  # horizontal factor
        vs = 2 if self.subsample == "420" else 1           # vertical factor
        mcu_w, mcu_h = 8 * hs, 8 * vs
        ph, pw = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
        padded = np.pad(ycc, ((0, ph - h), (0, pw - w), (0, 0)), mode="edge")
        luma = padded[..., 0]
        if hs == 1 and vs == 1:
            chroma = [padded[..., 1], padded[..., 2]]
        else:
            # hs x vs mean pooling of each chroma plane
            chroma = [
                padded[..., c]
                .reshape(ph // vs, vs, pw // hs, hs)
                .mean(axis=(1, 3))
                for c in (1, 2)
            ]

        # pass 1: tokenize MCU by MCU — 4:2:0 MCUs hold 4 luma blocks +
        # 1 Cb + 1 Cr; 4:4:4 MCUs hold one block per component
        all_tokens: list[tuple[str, str, int, int]] = []  # (cls, kind, sym, bits)
        preds = [0, 0, 0]

        def emit(cls, plane, ci, y0, x0, qt):
            toks, preds[ci] = _encode_block(
                plane[y0 : y0 + 8, x0 : x0 + 8], qt, preds[ci]
            )
            for kind, sym, bits in toks:
                all_tokens.append((cls, kind, sym, bits))

        mcu_marks: list[int] = []  # token index where each MCU starts
        mcu_idx = 0
        for my in range(0, ph, mcu_h):
            for mx in range(0, pw, mcu_w):
                if (
                    self.restart_interval
                    and mcu_idx
                    and mcu_idx % self.restart_interval == 0
                ):
                    preds[0] = preds[1] = preds[2] = 0  # DC reset at RSTn
                mcu_idx += 1
                mcu_marks.append(len(all_tokens))
                for by in range(0, mcu_h, 8):
                    for bx in range(0, mcu_w, 8):
                        emit("l", luma, 0, my + by, mx + bx, qt_l)
                emit("c", chroma[0], 1, my // vs, mx // hs, qt_c)
                emit("c", chroma[1], 2, my // vs, mx // hs, qt_c)

        # pass 2: per-(class, kind) Huffman tables from actual frequencies
        freqs: dict[tuple[str, str], dict[int, int]] = {}
        for cls, kind, sym, _ in all_tokens:
            d = freqs.setdefault((cls, kind), {})
            d[sym] = d.get(sym, 0) + 1
        tables = {k: _build_huffman(v) for k, v in freqs.items()}
        codes = {k: _canonical_codes(*tables[k]) for k in tables}

        # pass 3: serialize, inserting RSTn between restart intervals
        bw = _BitWriter()
        marks = mcu_marks + [len(all_tokens)]
        for mi in range(len(mcu_marks)):
            if (
                self.restart_interval
                and mi
                and mi % self.restart_interval == 0
            ):
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + ((mi // self.restart_interval - 1) % 8)])
            for cls, kind, sym, bits in all_tokens[marks[mi] : marks[mi + 1]]:
                code, length = codes[(cls, kind)][sym]
                bw.write(code, length)
                size = sym & 0x0F if kind == "ac" else sym
                if size:
                    bw.write(bits, size)
        bw.flush()

        def seg(marker: int, payload: bytes) -> bytes:
            return struct.pack(">HH", marker, len(payload) + 2) + payload

        def dqt(tid: int, qt: np.ndarray) -> bytes:
            return seg(
                0xFFDB, bytes([tid]) + bytes(int(x) for x in qt.flatten()[_ZIGZAG])
            )

        def dht(tclass: int, tid: int, key: tuple[str, str]) -> bytes:
            bits, vals = tables.get(key, ([1] + [0] * 15, [0]))
            return seg(
                0xFFC4,
                bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals),
            )

        y_hv = (hs << 4) | vs
        sof = seg(
            0xFFC0,
            bytes([8])
            + struct.pack(">HH", h, w)
            + bytes([3])
            + bytes([1, y_hv, 0])  # Y: id 1, sampling, qt 0
            + bytes([2, 0x11, 1])  # Cb
            + bytes([3, 0x11, 1]),  # Cr
        )
        sos = seg(
            0xFFDA,
            bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0]),
        )
        jfif = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        dri = (
            seg(0xFFDD, struct.pack(">H", self.restart_interval))
            if self.restart_interval
            else b""
        )
        return (
            b"\xff\xd8"
            + jfif
            + dqt(0, qt_l)
            + dqt(1, qt_c)
            + dht(0, 0, ("l", "dc"))
            + dht(1, 0, ("l", "ac"))
            + dht(0, 1, ("c", "dc"))
            + dht(1, 1, ("c", "ac"))
            + sof
            + dri
            + sos
            + bytes(bw.out)
            + b"\xff\xd9"
        )

    # -------------------------------------------------------------- decode

    def decode(self, payload: bytes) -> np.ndarray:
        if payload[:2] != b"\xff\xd8":
            raise ValueError("not a JPEG payload")
        pos = 2
        qts: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
        frame = None
        restart_interval = 0
        while pos < len(payload):
            if payload[pos] != 0xFF:
                pos += 1
                continue
            marker = payload[pos + 1]
            pos += 2
            if marker == 0xFF:  # T.81 B.1.1.2: optional fill byte
                pos -= 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue
            if marker == 0xD9:
                break
            (length,) = struct.unpack(">H", payload[pos : pos + 2])
            body = payload[pos + 2 : pos + length]
            pos += length
            if marker == 0xDB:  # DQT (possibly several tables)
                off = 0
                while off < len(body):
                    prec = body[off] >> 4
                    tid = body[off] & 0x0F
                    off += 1
                    if prec == 0:
                        raw = np.frombuffer(body, np.uint8, 64, off)
                        off += 64
                    else:
                        raw = np.frombuffer(body, ">u2", 64, off).astype(np.int64)
                        off += 128
                    qt = np.zeros(64, dtype=np.int64)
                    qt[_ZIGZAG] = raw
                    qts[tid] = qt.reshape(8, 8)
            elif marker == 0xC4:  # DHT (possibly several tables)
                off = 0
                while off < len(body):
                    tclass = body[off] >> 4
                    tid = body[off] & 0x0F
                    bits = list(body[off + 1 : off + 17])
                    n = sum(bits)
                    vals = list(body[off + 17 : off + 17 + n])
                    codes = _canonical_codes(bits, vals)
                    huff[(tclass, tid)] = {
                        (c, l): sym for sym, (c, l) in codes.items()
                    }
                    off += 17 + n
            elif marker == 0xC0 or marker == 0xC1:  # baseline SOF
                prec = body[0]
                if prec != 8:
                    raise ValueError(
                        f"only 8-bit JPEG supported, got precision {prec}"
                    )
                h, w = struct.unpack(">HH", body[1:5])
                ncomp = body[5]
                comps = []
                for i in range(ncomp):
                    cid, hv, qid = body[6 + 3 * i : 9 + 3 * i]
                    comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "qt": qid})
                frame = {"h": h, "w": w, "comps": comps}
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
                raise ValueError(
                    "only BASELINE sequential JPEG supported (got progressive/"
                    f"extended SOF 0x{marker:02x})"
                )
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack(">H", body[:2])
            elif marker == 0xDA:  # SOS — entropy data follows
                ns = body[0]
                scan = {}
                for i in range(ns):
                    cid, tids = body[1 + 2 * i], body[2 + 2 * i]
                    scan[cid] = (tids >> 4, tids & 0x0F)
                return self._decode_scan(
                    payload[pos:], frame, scan, qts, huff, restart_interval
                )
        raise ValueError("JPEG has no scan data")

    def _decode_scan(self, data, frame, scan, qts, huff, restart_interval):
        if frame is None:
            raise ValueError("JPEG SOS before SOF")
        h, w, comps = frame["h"], frame["w"], frame["comps"]
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        mcu_w, mcu_h = 8 * hmax, 8 * vmax
        mcus_x = -(-w // mcu_w)
        mcus_y = -(-h // mcu_h)
        planes = [
            np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)) for c in comps
        ]
        br = _BitReader(data)
        preds = [0] * len(comps)
        # scan-invariant per-component state hoisted out of the MCU loop
        # (code-review r4: the float qt copy alone was ~3 allocations/MCU)
        comp_state = [
            (
                huff[(0, scan[c["id"]][0])],
                huff[(1, scan[c["id"]][1])],
                qts[c["qt"]].astype(np.float64),
            )
            for c in comps
        ]
        mcu_count = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    if br.skip_rst():
                        preds = [0] * len(comps)
                for ci, c in enumerate(comps):
                    dc_lut, ac_lut, qt = comp_state[ci]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            zz = np.zeros(64, dtype=np.float64)
                            size = br.decode_symbol(dc_lut)
                            diff = _extend(br.read_bits(size), size)
                            preds[ci] += diff
                            zz[0] = preds[ci]
                            k = 1
                            while k < 64:
                                rs = br.decode_symbol(ac_lut)
                                if rs == 0x00:  # EOB
                                    break
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                k += rs >> 4
                                size = rs & 0x0F
                                if k > 63:
                                    raise ValueError("AC index out of range")
                                zz[k] = _extend(br.read_bits(size), size)
                                k += 1
                            coef = np.zeros(64)
                            coef[_ZIGZAG] = zz
                            block = _D.T @ (coef.reshape(8, 8) * qt) @ _D + 128.0
                            y0 = (my * c["v"] + by) * 8
                            x0 = (mx * c["h"] + bx) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
                mcu_count += 1
        # upsample each plane to full MCU-grid resolution, then crop
        full = []
        for ci, c in enumerate(comps):
            p = planes[ci]
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
            full.append(p[:h, :w])
        if len(full) == 1:
            gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
            return np.stack([gray] * 3, axis=-1)
        ycc = np.stack(full[:3], axis=-1)
        return _ycbcr_to_rgb(ycc)


def solid_color_roundtrip_reference(rgb: tuple[int, int, int], quality: int = 90):
    """Closed-form decode of a solid-color JPEG (pure math, no codec): every
    AC coefficient is zero, so the block reconstructs from the quantized DC
    alone — YCbCr channel value v maps to round(round(8*(v-128)/q)*q/8)+128
    with q the channel's scaled DC quantum. Used by the analytic oracle."""
    qdc_l = int(_scaled_qt(_QT_LUMA, quality)[0, 0])
    qdc_c = int(_scaled_qt(_QT_CHROMA, quality)[0, 0])
    r, g, b = (float(x) for x in rgb)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    def rt(v, q):
        dc = np.round(8.0 * (v - 128.0) / q)
        return dc * q / 8.0 + 128.0

    y2, cb2, cr2 = rt(y, qdc_l), rt(cb, qdc_c), rt(cr, qdc_c)
    r2 = y2 + 1.402 * (cr2 - 128.0)
    g2 = y2 - 0.344136 * (cb2 - 128.0) - 0.714136 * (cr2 - 128.0)
    b2 = y2 + 1.772 * (cb2 - 128.0)
    return tuple(int(np.clip(np.round(v), 0, 255)) for v in (r2, g2, b2))
