"""FLV Screen Video (codec id 3): the repo's first INTERFRAME video
codec, built from the public Adobe Flash Video File Format Specification
(v10, SCREENVIDEOPACKET) — frames are tiled into blocks of up to 256x256
px; each block is either zlib-compressed BGR pixel data (rows BOTTOM-UP,
as the spec's screen-grab heritage dictates) or a zero-length marker
meaning "unchanged since the previous frame". Keyframes carry every
block; interframes carry only the blocks that changed — TEMPORAL
prediction by block copy, the simplest real instance of the interframe
decode seam documented in functions/multimodal.py.

Container: a minimal but honest FLV file (9-byte header, video-only flag,
PreviousTagSize chain, type-9 video tags with UI24 sizes/timestamps and
the FrameType<<4 | CodecID video-data byte) — the exact framing Flash
screen recordings used.

Scale shape: decode is sequential ACROSS frames of one clip (interframes
need the previous frame) but independent across clips and across blocks
within a frame — the mapInPandas clip-parallel layout the other video
codecs use carries over unchanged; a keyframe-split would parallelize
within clips, exactly as in every conformant Screen Video player.

Reference parity: gohangout has no media surface (SURVEY.md §8) — this
shrinks the beyond-parity "interframe video" gap. Correctness evidence:
the ``multimodal_screenvideo_frames`` gate's oracle replays the fixture's
block-update schedule in closed form (lossless zlib blocks ⇒ exact
colors; a broken block copy, bottom-up row order, edge crop or tag walk
all hash-mismatch), and pytest pins roundtrips, the unchanged-block
markers actually being emitted, and the packet bit layout.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


class ScreenVideoCodec:
    """Mono-stream FLV Screen Video encode/decode.

    ``block_size`` is the nominal block edge in pixels (16..256, multiple
    of 16 — the spec packs ``edge/16 - 1`` in 4 bits). Edge blocks at the
    right/top are cropped. ``iter_frames`` yields H x W x 3 uint8 RGB
    arrays (the shared video-codec contract)."""

    CODEC_ID = 3  # Screen Video, FLV spec

    def __init__(self, block_size: int = 16):
        if not (16 <= block_size <= 256) or block_size % 16:
            raise ValueError("block_size must be a multiple of 16 in 16..256")
        self.block_size = block_size

    # ------------------------------------------------------------ blocks

    def _grid(self, w: int, h: int):
        bs = self.block_size
        nbx = (w + bs - 1) // bs
        nby = (h + bs - 1) // bs
        return bs, nbx, nby

    @staticmethod
    def _block_region(frame, bs, bx, by, w, h):
        """Pixel view of block (bx, by) — blocks are addressed from the
        LOWER-left corner (spec block order), numpy rows are top-down."""
        x0, x1 = bx * bs, min((bx + 1) * bs, w)
        y1 = h - by * bs          # exclusive bottom edge in top-down rows
        y0 = max(h - (by + 1) * bs, 0)
        return frame[y0:y1, x0:x1]

    @staticmethod
    def _block_bytes(region) -> bytes:
        """Spec block payload: BGR, rows bottom-up, no padding."""
        return region[::-1, :, ::-1].tobytes()

    # ------------------------------------------------------------ encode

    def encode(self, frames) -> bytes:
        if not frames:
            raise ValueError("empty clip")
        h, w, _ = frames[0].shape
        if not (1 <= w <= 0xFFF and 1 <= h <= 0xFFF):
            raise ValueError("dims must fit UB[12]")
        bs, nbx, nby = self._grid(w, h)
        tags = []
        prev = None
        for j, frame in enumerate(frames):
            if frame.shape != (h, w, 3):
                raise ValueError("all frames must share dims")
            frame = np.ascontiguousarray(frame, dtype=np.uint8)
            body = bytearray()
            body += struct.pack(">H", ((bs // 16 - 1) << 12) | w)
            body += struct.pack(">H", ((bs // 16 - 1) << 12) | h)
            for by in range(nby):
                for bx in range(nbx):
                    region = self._block_region(frame, bs, bx, by, w, h)
                    if prev is not None and np.array_equal(
                        region, self._block_region(prev, bs, bx, by, w, h)
                    ):
                        body += b"\x00\x00"  # DataSize 0: unchanged
                        continue
                    data = zlib.compress(self._block_bytes(region))
                    body += struct.pack(">H", len(data)) + data
            key = prev is None
            video_data = bytes([((1 if key else 2) << 4) | self.CODEC_ID]) + bytes(
                body
            )
            ts = j * 40  # 25 fps timestamps, UI24 + extended byte
            tag = (
                bytes([9])
                + struct.pack(">I", len(video_data))[1:]  # DataSize UI24
                + struct.pack(">I", ts)[1:]               # Timestamp UI24
                + bytes([ts >> 24])                       # TimestampExtended
                + b"\x00\x00\x00"                         # StreamID
                + video_data
            )
            tags.append(tag)
            prev = frame
        out = bytearray(b"FLV\x01\x01" + struct.pack(">I", 9))  # video-only
        out += struct.pack(">I", 0)  # PreviousTagSize0
        for tag in tags:
            out += tag
            out += struct.pack(">I", len(tag))
        return bytes(out)

    # ------------------------------------------------------------ decode

    def _tags(self, payload: bytes):
        if payload[:3] != b"FLV":
            raise ValueError("not an FLV file")
        (data_offset,) = struct.unpack(">I", payload[5:9])
        pos = data_offset + 4  # skip PreviousTagSize0
        while pos + 11 <= len(payload):
            tag_type = payload[pos]
            (size,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
            body = payload[pos + 11 : pos + 11 + size]
            yield tag_type, body
            pos += 11 + size + 4  # tag + PreviousTagSize

    def iter_frames(self, payload: bytes):
        prev = None
        for tag_type, body in self._tags(payload):
            if tag_type != 9 or not body:
                continue
            frame_type, codec_id = body[0] >> 4, body[0] & 0xF
            if codec_id != self.CODEC_ID:
                raise ValueError(f"not Screen Video: codec id {codec_id}")
            hw = struct.unpack(">H", body[1:3])[0]
            hh = struct.unpack(">H", body[3:5])[0]
            bs = ((hw >> 12) + 1) * 16
            w, h = hw & 0xFFF, hh & 0xFFF
            if ((hh >> 12) + 1) * 16 != bs:
                raise ValueError("non-square blocks unsupported")
            nbx, nby = (w + bs - 1) // bs, (h + bs - 1) // bs
            if prev is None:
                if frame_type != 1:
                    raise ValueError("first frame must be a keyframe")
                frame = np.zeros((h, w, 3), dtype=np.uint8)
            else:
                frame = prev.copy()
            pos = 5
            for by in range(nby):
                for bx in range(nbx):
                    (size,) = struct.unpack(">H", body[pos : pos + 2])
                    pos += 2
                    if size == 0:
                        if prev is None:
                            raise ValueError("unchanged block in keyframe")
                        continue
                    raw = zlib.decompress(body[pos : pos + size])
                    pos += size
                    x0, x1 = bx * bs, min((bx + 1) * bs, w)
                    y1 = h - by * bs
                    y0 = max(h - (by + 1) * bs, 0)
                    bw, bh = x1 - x0, y1 - y0
                    px = np.frombuffer(raw, dtype=np.uint8).reshape(bh, bw, 3)
                    frame[y0:y1, x0:x1] = px[::-1, :, ::-1]  # bottom-up BGR
            prev = frame
            yield frame.copy()

    def probe(self, payload: bytes) -> dict:
        """Header metadata without inflating any block: frame count,
        keyframe count, dims, block edge — the cheap planning scan."""
        info = {"n_frames": 0, "n_keyframes": 0}
        for tag_type, body in self._tags(payload):
            if tag_type != 9 or not body:
                continue
            if body[0] & 0xF != self.CODEC_ID:
                raise ValueError(
                    f"not Screen Video: codec id {body[0] & 0xF}"
                )
            info["n_frames"] += 1
            if body[0] >> 4 == 1:
                info["n_keyframes"] += 1
            hw = struct.unpack(">H", body[1:3])[0]
            hh = struct.unpack(">H", body[3:5])[0]
            info["width"], info["height"] = hw & 0xFFF, hh & 0xFFF
            info["block_size"] = ((hw >> 12) + 1) * 16
        return info
