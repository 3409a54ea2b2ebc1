"""ITU-T G.711 companded audio (μ-law / A-law): the telephony lossy
codec, built from the public G.711 specification (the segmented
8-bit logarithmic companding curves, as in the classic Sun g711.c
reference implementation the spec's tables reduce to). 2:1 compression
vs 16-bit PCM, STATELESS per sample — the extreme of the scale shape the
multimodal path wants: decode is a pure per-byte map, so a 100 TB audio
corpus parallelizes at any granularity with zero carried state (contrast
functions/adpcm.py, whose intra-block recurrence is sequential).

Framed as WAVE_FORMAT_MULAW (0x0007) / WAVE_FORMAT_ALAW (0x0006) mono
WAV, 8 bits per sample.

Reference parity: gohangout has no media surface (SURVEY.md §8) — this
completes the beyond-parity lossy-audio family (ADPCM's adaptive
quantizer + G.711's static companding). Correctness evidence:
tests/test_multimodal.py cross-checks all four maps bit-for-bit against
CPython's independent ``audioop`` implementation over the full 16-bit
input range (and the full 256-byte code range on decode), and the
``multimodal_g711_decode`` gate replays BOTH encode and decode as pure
SQL arithmetic from the closed-form fixture — no literals shipped at
all, the strongest oracle construction in the multimodal family.
"""

from __future__ import annotations

import struct

import numpy as np

_BIAS = 0x84  # μ-law add-in bias (16-bit domain; >>2 in the 14-bit fold)
_ULAW_CLIP = 8159  # 14-bit magnitude clip
# segment upper bounds: μ-law in the biased 14-bit domain, A-law in 13-bit
_SEG_UEND = np.array([0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF])
_SEG_AEND = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])


def ulaw_encode(pcm) -> np.ndarray:
    """int16 linear -> μ-law bytes (uint8), vectorized."""
    s = np.asarray(pcm, dtype=np.int64) >> 2  # 16 -> 14 bits
    neg = s < 0
    mag = np.where(neg, -s, s)
    mag = np.minimum(mag, _ULAW_CLIP) + (_BIAS >> 2)
    seg = np.searchsorted(_SEG_UEND, mag, side="left")  # first end >= mag
    uval = np.where(
        seg >= 8,  # biased magnitude past the top segment saturates
        0x7F,
        (seg << 4) | ((mag >> np.minimum(seg + 1, 8)) & 0xF),
    )
    mask = np.where(neg, 0x7F, 0xFF)
    return (uval ^ mask).astype(np.uint8)


def ulaw_decode(codes) -> np.ndarray:
    """μ-law bytes -> int16 linear, vectorized."""
    u = (~np.asarray(codes, dtype=np.int64)) & 0xFF
    t = (((u & 0xF) << 3) + _BIAS) << ((u & 0x70) >> 4)
    return np.where(u & 0x80, _BIAS - t, t - _BIAS).astype(np.int16)


def alaw_encode(pcm) -> np.ndarray:
    """int16 linear -> A-law bytes (uint8), vectorized."""
    s = np.asarray(pcm, dtype=np.int64) >> 3  # 16 -> 13 bits
    neg = s < 0
    mag = np.where(neg, -s - 1, s)
    mask = np.where(neg, 0x55, 0xD5)
    seg = np.searchsorted(_SEG_AEND, mag, side="left")
    low = np.where(seg < 2, (mag >> 1) & 0xF, (mag >> np.minimum(seg, 7)) & 0xF)
    aval = np.where(seg >= 8, 0x7F, (seg << 4) | low)
    return (aval ^ mask).astype(np.uint8)


def alaw_decode(codes) -> np.ndarray:
    """A-law bytes -> int16 linear, vectorized."""
    a = np.asarray(codes, dtype=np.int64) ^ 0x55
    t = (a & 0xF) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8, t + 0x108)  # seg >= 1 shares the offset
    t = np.where(seg >= 2, t << np.maximum(seg - 1, 0), t)
    return np.where(a & 0x80, t, -t).astype(np.int16)


class G711Codec:
    """Mono G.711-in-WAV encode/decode (wFormatTag 0x0007 μ-law /
    0x0006 A-law, 8 bits per sample — one code byte per sample, no
    blocks, no state)."""

    TAGS = {"ulaw": 0x0007, "alaw": 0x0006}

    def __init__(self, law: str = "ulaw", sample_rate: int = 8000):
        if law not in self.TAGS:
            raise ValueError(f"law must be ulaw|alaw, got {law!r}")
        self.law = law
        self.sample_rate = sample_rate

    def encode(self, pcm: np.ndarray) -> bytes:
        pcm = np.asarray(pcm, dtype=np.int64)
        if len(pcm) == 0:
            raise ValueError("empty clip")
        codes = (ulaw_encode if self.law == "ulaw" else alaw_encode)(pcm)
        data = codes.tobytes()
        fmt = struct.pack(
            "<HHIIHH",
            self.TAGS[self.law],
            1,
            self.sample_rate,
            self.sample_rate,  # 1 byte/sample
            1,
            8,
        )
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks

    def decode(self, payload: bytes) -> np.ndarray:
        if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            raise ValueError("not a WAV file")
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (size,) = struct.unpack_from("<I", payload, pos + 4)
            if cid == b"fmt ":
                fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
            elif cid == b"data":
                data = payload[pos + 8 : pos + 8 + size]
            pos += 8 + size + (size & 1)
        if fmt is None or data is None:
            raise ValueError("missing fmt/data chunk")
        tag, channels, _rate, _avg, _align, bits = fmt
        laws = {v: k for k, v in self.TAGS.items()}
        if tag not in laws or channels != 1 or bits != 8:
            raise ValueError(f"not mono G.711: tag={tag:#x} ch={channels}")
        codes = np.frombuffer(data, dtype=np.uint8)
        return (ulaw_decode if laws[tag] == "ulaw" else alaw_decode)(codes)
