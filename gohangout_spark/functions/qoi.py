"""QOI ("Quite OK Image") lossless image codec, built from the public
one-page specification (qoiformat.org, spec v1.0 — public domain). QOI is
a real-world interchange format (games/tools ecosystems) whose entire
spec is ALGORITHMIC: six chunk ops, a 64-slot running index keyed by
``(3r+5g+7b+11a) % 64``, and byte-wise wrapping diffs — no Huffman
tables, no DCT, no literal tables of any kind, so the whole codec is
derivable from the spec text alone (the same doctrine as
functions/adpcm.py and functions/g711.py).

Stream layout (spec §"Data Format"):

- 14-byte header: magic ``qoif``, u32-BE width, u32-BE height,
  u8 channels (3|4), u8 colorspace.
- chunk stream, one of:
  ``QOI_OP_RGB``   ``0xFE r g b``            (alpha carried over)
  ``QOI_OP_RGBA``  ``0xFF r g b a``
  ``QOI_OP_INDEX`` ``00iiiiii``              (64-slot running array)
  ``QOI_OP_DIFF``  ``01 dr dg db``           (2-bit each, bias 2, wrap)
  ``QOI_OP_LUMA``  ``10 dg(6) | dr-dg(4) db-dg(4)`` (bias 32 / 8, wrap)
  ``QOI_OP_RUN``   ``11rrrrrr``              (run 1..62; 63/64 reserved)
- end marker: seven ``0x00`` bytes then ``0x01``.

The previous pixel starts at (0,0,0,255); the index array starts
all-zero; every decoded pixel is written into ``index[hash]``.

Scale shape: images are independent (clip-parallel mapInPandas, same as
every codec in functions/multimodal.py); within an image the running
index makes decode sequential — exactly like PNG's filter chain, and
irrelevant at corpus scale where parallelism comes from the image axis.

Reference parity: gohangout has no media surface (SURVEY.md §2.6) —
beyond-parity. Correctness evidence: the ``multimodal_qoi_features``
gate's fixture pixels are closed-form in (i, x, y) and deliberately
exercise ALL FIVE 3-channel ops (RUN rows, DIFF gradient rows, LUMA
ramp rows, RGB jump rows, and an INDEX-heavy repeat row); the DuckDB
oracle re-derives the pixels from the same closed form and compares
position-weighted checksums, so any mis-decoded op, wrong bias, wrong
hash multiplier or wrong index update hash-mismatches. pytest
(tests/test_qoi.py) adds hand-assembled spec streams, RGBA/alpha
paths, the run-62 cap, and encode→decode roundtrip property tests.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"qoif"
_OP_INDEX, _OP_DIFF, _OP_LUMA, _OP_RUN = 0x00, 0x40, 0x80, 0xC0
_OP_RGB, _OP_RGBA = 0xFE, 0xFF
_END = b"\x00" * 7 + b"\x01"


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


class QoiCodec:
    """QOI encode/decode for HxWx3 (RGB) / HxWx4 (RGBA) uint8 arrays."""

    def encode(self, pixels: np.ndarray, colorspace: int = 0) -> bytes:
        px = np.asarray(pixels, dtype=np.uint8)
        if px.ndim != 3 or px.shape[2] not in (3, 4):
            raise ValueError("QOI encode expects HxWx3 or HxWx4 uint8")
        h, w, channels = px.shape
        if h == 0 or w == 0:
            raise ValueError("empty image")
        flat = px.reshape(-1, channels)
        if channels == 3:
            flat = np.concatenate(
                [flat, np.full((len(flat), 1), 255, dtype=np.uint8)], axis=1
            )
        out = bytearray(_MAGIC + struct.pack(">IIBB", w, h, channels, colorspace))
        index = np.zeros((64, 4), dtype=np.int64)
        prev = (0, 0, 0, 255)
        run = 0
        for r, g, b, a in flat.astype(np.int64):
            pxl = (int(r), int(g), int(b), int(a))
            if pxl == prev:
                run += 1
                if run == 62:
                    out.append(_OP_RUN | (run - 1))
                    run = 0
                continue
            if run > 0:
                out.append(_OP_RUN | (run - 1))
                run = 0
            idx = _hash(*pxl)
            if tuple(index[idx]) == pxl:
                out.append(_OP_INDEX | idx)
            else:
                index[idx] = pxl
                if pxl[3] == prev[3]:
                    # wrapping int8 diffs (spec: "wraparound operation")
                    vr = (pxl[0] - prev[0] + 128) % 256 - 128
                    vg = (pxl[1] - prev[1] + 128) % 256 - 128
                    vb = (pxl[2] - prev[2] + 128) % 256 - 128
                    vg_r, vg_b = vr - vg, vb - vg
                    if -2 <= vr <= 1 and -2 <= vg <= 1 and -2 <= vb <= 1:
                        out.append(
                            _OP_DIFF | ((vr + 2) << 4) | ((vg + 2) << 2) | (vb + 2)
                        )
                    elif -32 <= vg <= 31 and -8 <= vg_r <= 7 and -8 <= vg_b <= 7:
                        out.append(_OP_LUMA | (vg + 32))
                        out.append(((vg_r + 8) << 4) | (vg_b + 8))
                    else:
                        out += bytes((_OP_RGB, pxl[0], pxl[1], pxl[2]))
                else:
                    out += bytes((_OP_RGBA, *pxl))
            prev = pxl
        if run > 0:
            out.append(_OP_RUN | (run - 1))
        out += _END
        return bytes(out)

    def decode(self, payload: bytes) -> np.ndarray:
        if payload[:4] != _MAGIC or len(payload) < 14 + len(_END):
            raise ValueError("not a QOI stream")
        w, h, channels, _colorspace = struct.unpack_from(">IIBB", payload, 4)
        if channels not in (3, 4):
            raise ValueError(f"bad channel count {channels}")
        n = w * h
        out = np.zeros((n, 4), dtype=np.uint8)
        index = np.zeros((64, 4), dtype=np.uint8)
        r, g, b, a = 0, 0, 0, 255
        pos, i = 14, 0
        end = len(payload) - len(_END)
        if payload[end:] != _END:
            raise ValueError("missing QOI end marker")
        while i < n:
            if pos >= end:
                raise ValueError("truncated QOI chunk stream")
            b1 = payload[pos]
            pos += 1
            if b1 == _OP_RGB:
                r, g, b = payload[pos], payload[pos + 1], payload[pos + 2]
                pos += 3
            elif b1 == _OP_RGBA:
                r, g, b, a = payload[pos : pos + 4]
                pos += 4
            elif b1 >= _OP_RUN:  # 0xC0..0xFD
                run = (b1 & 0x3F) + 1
                out[i : i + run] = (r, g, b, a)
                i += run
                continue
            elif b1 >= _OP_LUMA:
                vg = (b1 & 0x3F) - 32
                b2 = payload[pos]
                pos += 1
                r = (r + vg + ((b2 >> 4) & 0x0F) - 8) % 256
                b = (b + vg + (b2 & 0x0F) - 8) % 256
                g = (g + vg) % 256
            elif b1 >= _OP_DIFF:
                r = (r + ((b1 >> 4) & 3) - 2) % 256
                g = (g + ((b1 >> 2) & 3) - 2) % 256
                b = (b + (b1 & 3) - 2) % 256
            else:  # QOI_OP_INDEX
                r, g, b, a = (int(v) for v in index[b1 & 0x3F])
            index[_hash(r, g, b, a)] = (r, g, b, a)
            out[i] = (r, g, b, a)
            i += 1
        if i != n:
            raise ValueError("QOI run overflowed the pixel count")
        return out[:, :channels].reshape(h, w, channels)
