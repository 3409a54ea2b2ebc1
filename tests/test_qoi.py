"""QOI codec correctness: hand-assembled spec streams (byte layout pinned
independently of our encoder), wrapping-diff semantics, the run-62 cap,
RGBA/alpha paths, index behavior, encode→decode roundtrips, and
op-family coverage of the ``multimodal_qoi_features`` fixture. No Spark
session needed — this pins the pure-Python core the mapInPandas decode
path calls."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gohangout_spark.functions.qoi import QoiCodec, _hash


def _header(w, h, channels=3, colorspace=0):
    return b"qoif" + struct.pack(">IIBB", w, h, channels, colorspace)


_END = b"\x00" * 7 + b"\x01"


def _walk_ops(payload):
    """Chunk-tag walk of a QOI stream (spec §Data Format), independent of
    the codec's decoder: yields op names in stream order."""
    pos, end = 14, len(payload) - 8
    while pos < end:
        b1 = payload[pos]
        if b1 == 0xFE:
            yield "RGB"
            pos += 4
        elif b1 == 0xFF:
            yield "RGBA"
            pos += 5
        elif b1 >= 0xC0:
            yield "RUN"
            pos += 1
        elif b1 >= 0x80:
            yield "LUMA"
            pos += 2
        elif b1 >= 0x40:
            yield "DIFF"
            pos += 1
        else:
            yield "INDEX"
            pos += 1


class TestQoiSpecStreams:
    """Decode hand-assembled byte streams — the expected pixels are
    computed by hand from the spec, so a decoder bug cannot be masked by
    a matching encoder bug."""

    def test_rgb_diff_luma_run_index_chain(self):
        # 6x1 RGB: RGB(10,20,30); DIFF(+1,+1,+1); LUMA(dg=9,dr-dg=+1,
        # db-dg=-2); RUN(2); INDEX back to (10,20,30)
        chunks = bytes(
            [
                0xFE, 10, 20, 30,
                0x40 | (3 << 4) | (3 << 2) | 3,      # DIFF +1/+1/+1
                0x80 | (9 + 32), ((1 + 8) << 4) | (-2 + 8),
                0xC0 | (2 - 1),                      # RUN 2
                0x00 | _hash(10, 20, 30, 255),       # INDEX
            ]
        )
        px = QoiCodec().decode(_header(6, 1) + chunks + _END)
        expected = np.array(
            [[[10, 20, 30], [11, 21, 31], [21, 30, 38],
              [21, 30, 38], [21, 30, 38], [10, 20, 30]]],
            dtype=np.uint8,
        )
        assert (px == expected).all()

    def test_first_pixel_defaults_and_wrap(self):
        # prev starts (0,0,0,255): DIFF(-2,-1,+1) from it wraps r to 254
        chunks = bytes([0x40 | (0 << 4) | (1 << 2) | 3])
        px = QoiCodec().decode(_header(1, 1) + chunks + _END)
        assert px.tolist() == [[[254, 255, 1]]]

    def test_luma_wraps_mod_256(self):
        chunks = bytes([0xFE, 250, 250, 250, 0x80 | (31 + 32), 0x88])
        px = QoiCodec().decode(_header(2, 1) + chunks + _END)
        # g: 250+31=281 -> 25; r,b likewise with dr-dg=db-dg=0
        assert px[0, 1].tolist() == [25, 25, 25]

    def test_rgba_carries_alpha_into_rgb_op(self):
        chunks = bytes([0xFF, 1, 2, 3, 77, 0xFE, 9, 9, 9])
        px = QoiCodec().decode(_header(2, 1, channels=4) + chunks + _END)
        assert px[0, 0].tolist() == [1, 2, 3, 77]
        assert px[0, 1].tolist() == [9, 9, 9, 77]  # RGB keeps alpha

    def test_index_zero_initialized(self):
        # INDEX into an untouched slot yields (0,0,0,0) per the
        # zero-initialized index array
        chunks = bytes([0x05])
        px = QoiCodec().decode(_header(1, 1, channels=4) + chunks + _END)
        assert px.tolist() == [[[0, 0, 0, 0]]]

    def test_run_bias_one(self):
        chunks = bytes([0xFE, 5, 6, 7, 0xC0 | 0])  # RUN code 0 == length 1
        px = QoiCodec().decode(_header(2, 1) + chunks + _END)
        assert (px == [5, 6, 7]).all()

    def test_error_paths(self):
        c = QoiCodec()
        with pytest.raises(ValueError, match="not a QOI"):
            c.decode(b"nope" + b"\x00" * 20)
        with pytest.raises(ValueError, match="end marker"):
            c.decode(_header(1, 1) + bytes([0xFE, 1, 2, 3]) + b"\x00" * 8)
        with pytest.raises(ValueError, match="truncated"):
            c.decode(_header(4, 4) + bytes([0xC0 | 1]) + _END)
        with pytest.raises(ValueError, match="channel"):
            c.decode(_header(1, 1, channels=2) + bytes([0xC0]) + _END)


class TestQoiEncoder:
    def test_flat_image_is_rgb_plus_runs(self):
        px = np.full((10, 10, 3), 200, dtype=np.uint8)
        enc = QoiCodec().encode(px)
        # RGB(200,200,200), RUN 62, RUN 37 — the run-62 cap splits it
        assert list(_walk_ops(enc)) == ["RGB", "RUN", "RUN"]
        assert enc[14 + 4] == (0xC0 | 61) and enc[14 + 5] == (0xC0 | 36)

    def test_leading_default_pixels_become_run(self):
        # (0,0,0) == the spec's (0,0,0,255) start pixel in RGB view
        px = np.zeros((1, 5, 3), dtype=np.uint8)
        px[0, 4] = (9, 9, 9)
        enc = QoiCodec().encode(px)
        assert list(_walk_ops(enc))[0] == "RUN"
        assert (QoiCodec().decode(enc) == px).all()

    def test_wraparound_picks_diff(self):
        px = np.array([[[255, 255, 255], [0, 0, 0]]], dtype=np.uint8)
        enc = QoiCodec().encode(px)
        assert "DIFF" in list(_walk_ops(enc))
        assert (QoiCodec().decode(enc) == px).all()

    def test_alpha_change_forces_rgba(self):
        px = np.array([[[1, 2, 3, 255], [1, 2, 3, 4]]], dtype=np.uint8)
        enc = QoiCodec().encode(px)
        assert "RGBA" in list(_walk_ops(enc))
        assert (QoiCodec().decode(enc) == px).all()

    def test_rejects_bad_shapes(self):
        c = QoiCodec()
        with pytest.raises(ValueError, match="HxWx3"):
            c.encode(np.zeros((4, 4), dtype=np.uint8))
        with pytest.raises(ValueError, match="empty"):
            c.encode(np.zeros((0, 4, 3), dtype=np.uint8))


class TestQoiRoundtrip:
    @pytest.mark.parametrize("channels", [3, 4])
    @pytest.mark.parametrize("kind", ["noise", "smooth", "palette"])
    def test_roundtrip(self, channels, kind):
        rng = np.random.RandomState(hash((channels, kind)) % 2**31)
        for _ in range(8):
            h, w = rng.randint(1, 20), rng.randint(1, 20)
            if kind == "noise":
                px = rng.randint(0, 256, (h, w, channels), dtype=np.uint8)
            elif kind == "smooth":
                base = rng.randint(0, 256, channels)
                px = (
                    (base + np.cumsum(rng.randint(-2, 2, (h, w, channels)), axis=1))
                    % 256
                ).astype(np.uint8)
            else:
                pal = rng.randint(0, 256, (4, channels), dtype=np.uint8)
                px = pal[rng.randint(0, 4, (h, w))]
            enc = QoiCodec().encode(px)
            dec = QoiCodec().decode(enc)
            assert dec.shape == px.shape and (dec == px).all()


class TestQoiFixture:
    def test_fixture_exercises_all_five_ops(self):
        """The gate's evidentiary value rests on the fixture hitting every
        3-channel op family — assert it, don't assume it."""
        from gohangout_spark.functions.multimodal import qoi_fixture_pixel

        codec = QoiCodec()
        seen = set()
        for i in range(48):
            w, h = 12 + i % 5, 10 + i % 4
            px = np.zeros((h, w, 3), dtype=np.uint8)
            for y in range(h):
                for x in range(w):
                    px[y, x] = qoi_fixture_pixel(i, x, y)
            seen |= set(_walk_ops(codec.encode(px)))
        assert seen == {"RGB", "DIFF", "LUMA", "RUN", "INDEX"}
