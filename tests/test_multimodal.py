"""ADPCM correctness: the IMA/DVI quantizer recurrence cross-checked
bit-for-bit against CPython's independent ``audioop`` implementation
(the cross-check cited by functions/adpcm.py and the
``multimodal_adpcm_decode`` gate docstrings), plus hand-walked spec
vectors, lossy roundtrip bounds, and multi-block/padding container
behavior. No Spark session needed — this pins the pure-Python core the
mapInPandas decode path calls.

NOTE on nibble packing: ``audioop`` packs the FIRST nibble in the HIGH
half of each byte (CPython Modules/audioop.c lin2adpcm/adpcm2lin),
whereas the WAV IMA layout our container uses packs low-nibble-first —
the tests below repack accordingly so the comparison is over the same
nibble SEQUENCE.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

audioop = pytest.importorskip("audioop")  # removed from stdlib in 3.13

from gohangout_spark.functions.adpcm import (
    INDEX_TABLE,
    STEP_TABLE,
    ImaAdpcmCodec,
    adpcm_core_decode,
    adpcm_core_encode,
)


def _signals():
    rng = np.random.RandomState(7)
    sine = np.round(12000 * np.sin(np.arange(400) * 0.07)).astype(np.int64)
    noise = rng.randint(-32768, 32768, size=401).astype(np.int64)
    steps = np.repeat([0, 30000, -30000, 5, -5, 32767, -32768], 23).astype(np.int64)
    return {"sine": sine, "noise": noise, "steps": steps}


def _pack_high_first(nibbles):
    """audioop byte layout: first nibble HIGH, second nibble LOW."""
    if len(nibbles) % 2:
        nibbles = list(nibbles) + [0]
    return bytes((a << 4) | b for a, b in zip(nibbles[0::2], nibbles[1::2]))


def _unpack_high_first(frag):
    out = []
    for byte in frag:
        out.append(byte >> 4)
        out.append(byte & 0xF)
    return out


class TestAdpcmCoreVsAudioop:
    @pytest.mark.parametrize("name", ["sine", "noise", "steps"])
    def test_encode_matches_lin2adpcm(self, name):
        """Our encoder's nibble stream and final (predictor, index) state
        must equal audioop.lin2adpcm's bit-for-bit from the same seed."""
        samples = _signals()[name]
        # even length: audioop emits whole bytes only
        samples = samples[: len(samples) // 2 * 2]
        ours, pred, index = adpcm_core_encode(samples, 0, 0)
        frag, (a_pred, a_index) = audioop.lin2adpcm(
            samples.astype("<i2").tobytes(), 2, None
        )
        assert _unpack_high_first(frag) == ours
        assert (a_pred, a_index) == (pred, index)

    @pytest.mark.parametrize("name", ["sine", "noise", "steps"])
    def test_decode_matches_adpcm2lin(self, name):
        """Decoding our own nibble stream through audioop must reproduce
        our decoder's samples and state exactly."""
        samples = _signals()[name]
        samples = samples[: len(samples) // 2 * 2]
        nibbles, _, _ = adpcm_core_encode(samples, 0, 0)
        ours, pred, index = adpcm_core_decode(nibbles, 0, 0)
        pcm, (a_pred, a_index) = audioop.adpcm2lin(
            _pack_high_first(nibbles), 2, None
        )
        theirs = np.frombuffer(pcm, dtype="<i2").astype(int).tolist()
        assert theirs == ours
        assert (a_pred, a_index) == (pred, index)

    def test_nonzero_seed_state_threads_through(self):
        """State (predictor, index) carried across calls matches audioop's
        stateful API — pins the cross-block index carry the container uses."""
        samples = _signals()["sine"]
        a, b = samples[:100], samples[100:200]
        n1, p1, i1 = adpcm_core_encode(a, 0, 0)
        n2, p2, i2 = adpcm_core_encode(b, p1, i1)
        f1, st = audioop.lin2adpcm(a.astype("<i2").tobytes(), 2, None)
        f2, st = audioop.lin2adpcm(b.astype("<i2").tobytes(), 2, st)
        assert _unpack_high_first(f1) + _unpack_high_first(f2) == n1 + n2
        assert st == (p2, i2)


class TestAdpcmSpecVectors:
    """Hand-walked IMA spec vectors (step table entry 0 = 7)."""

    def test_decode_nibble_3_from_zero(self):
        # step=7: vpdiff = 7>>3 + 7>>1 + 7>>2 = 0+3+1 = 4; index 0-1 -> clamp 0
        assert adpcm_core_decode([3], 0, 0) == ([4], 4, 0)

    def test_decode_nibble_7_from_zero(self):
        # vpdiff = 0 + 7 + 3 + 1 = 11; index 0+8 = 8
        assert adpcm_core_decode([7], 0, 0) == ([11], 11, 8)

    def test_decode_sign_nibble_is_negative(self):
        # nib 0xF = sign | 7: predictor 0 - 11 = -11
        assert adpcm_core_decode([15], 0, 0) == ([-11], -11, 8)

    def test_decode_clamps_predictor(self):
        # from +32767 at max step, a big positive vpdiff clamps at 32767
        samples, pred, _ = adpcm_core_decode([7], 32767, 88)
        assert samples == [32767] and pred == 32767

    def test_index_clamps_at_table_ends(self):
        _, _, idx = adpcm_core_decode([0, 0, 0], 0, 1)
        assert idx == 0  # -1 per zero nibble, clamped at 0
        _, _, idx = adpcm_core_decode([7, 7], 0, 85)
        assert idx == 88  # +8 twice, clamped at 88

    def test_tables_match_published_spec(self):
        assert len(STEP_TABLE) == 89
        assert STEP_TABLE[0] == 7 and STEP_TABLE[-1] == 32767
        assert INDEX_TABLE[:8] == [-1, -1, -1, -1, 2, 4, 6, 8]

    def test_encoder_decoder_predictors_never_drift(self):
        """The encoder reconstructs with the decoder's truncated arithmetic,
        so running the decoder over the encoder's nibbles must land on the
        encoder's own final predictor for ANY input."""
        for samples in _signals().values():
            nibbles, e_pred, e_idx = adpcm_core_encode(samples, 0, 0)
            _, d_pred, d_idx = adpcm_core_decode(nibbles, 0, 0)
            assert (d_pred, d_idx) == (e_pred, e_idx)


class TestAdpcmContainer:
    def test_roundtrip_bounded_error(self):
        """Lossy, but bounded: with the per-block predictor seeded from the
        true first sample, the reconstruction error on a smooth signal stays
        within ~1.5x the local step size (spec behavior, not a tight bound)."""
        codec = ImaAdpcmCodec(16000, 256)
        pcm = np.round(8000 * np.sin(np.arange(2000) * 0.01)).astype(np.int64)
        out = codec.decode(codec.encode(pcm))
        assert len(out) == len(pcm)
        assert np.max(np.abs(out.astype(np.int64) - pcm)) < 256

    def test_block_first_sample_is_lossless(self):
        codec = ImaAdpcmCodec(16000, 20)  # 33 samples/block
        pcm = _signals()["noise"][:165]
        out = codec.decode(codec.encode(pcm))
        assert np.array_equal(out[::33].astype(np.int64), pcm[::33])

    def test_multi_block_padding_trimmed_by_fact(self):
        """A clip that is NOT a whole number of blocks: the short final block
        is padded on encode and the fact chunk trims it back on decode."""
        codec = ImaAdpcmCodec(16000, 20)
        for n in (1, 32, 33, 34, 100):
            pcm = _signals()["sine"][:n]
            payload = codec.encode(pcm)
            assert len(codec.decode(payload)) == n

    def test_blocks_are_independent(self):
        """Each block decodes from its own header seed alone — the property
        the 100 TB block-parallel claim rests on."""
        codec = ImaAdpcmCodec(16000, 20)
        pcm = _signals()["noise"][:99]  # 3 exact blocks
        payload = codec.encode(pcm)
        full = codec.decode(payload)
        spb = codec.samples_per_block
        for bi, (pred, index, nibbles) in enumerate(codec.block_streams(payload)):
            samples, _, _ = adpcm_core_decode(nibbles, pred, index)
            block = [pred] + samples
            assert block == full[bi * spb : (bi + 1) * spb].astype(int).tolist()

    def test_wav_framing_fields(self):
        codec = ImaAdpcmCodec(8000, 256)
        payload = codec.encode(np.zeros(10, dtype=np.int64))
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        fmt_at = payload.index(b"fmt ") + 8
        tag, ch, rate, _avg, align, bits = struct.unpack_from("<HHIIHH", payload, fmt_at)
        assert (tag, ch, rate, align, bits) == (0x0011, 1, 8000, 256, 4)

    def test_decode_rejects_non_adpcm(self):
        codec = ImaAdpcmCodec()
        with pytest.raises(ValueError):
            codec.decode(b"RIFX" + b"\x00" * 40)


class TestG711VsAudioop:
    """G.711 companding cross-checked bit-for-bit against CPython's
    independent audioop implementation over the FULL input ranges —
    all 65536 16-bit samples on encode, all 256 code bytes on decode."""

    def test_ulaw_encode_full_range(self):
        from gohangout_spark.functions.g711 import ulaw_encode

        pcm = np.arange(-32768, 32768, dtype=np.int64)
        ref = np.frombuffer(audioop.lin2ulaw(pcm.astype("<i2").tobytes(), 2), np.uint8)
        assert np.array_equal(ulaw_encode(pcm), ref)

    def test_ulaw_decode_full_range(self):
        from gohangout_spark.functions.g711 import ulaw_decode

        codes = np.arange(256, dtype=np.uint8)
        ref = np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), "<i2")
        assert np.array_equal(ulaw_decode(codes), ref)

    def test_alaw_encode_full_range(self):
        from gohangout_spark.functions.g711 import alaw_encode

        pcm = np.arange(-32768, 32768, dtype=np.int64)
        ref = np.frombuffer(audioop.lin2alaw(pcm.astype("<i2").tobytes(), 2), np.uint8)
        assert np.array_equal(alaw_encode(pcm), ref)

    def test_alaw_decode_full_range(self):
        from gohangout_spark.functions.g711 import alaw_decode

        codes = np.arange(256, dtype=np.uint8)
        ref = np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), "<i2")
        assert np.array_equal(alaw_decode(codes), ref)


class TestG711Container:
    def test_roundtrip_matches_raw_maps(self):
        """Container decode(encode(pcm)) == raw expand(compand(pcm)) for
        both laws — pins the WAV framing around the verified maps."""
        from gohangout_spark.functions.g711 import (
            G711Codec,
            alaw_decode,
            alaw_encode,
            ulaw_decode,
            ulaw_encode,
        )

        t = np.arange(500, dtype=np.int64)
        pcm = ((t * t * 241 + t * 37) % 65536) - 32768
        for law, enc, dec in (
            ("ulaw", ulaw_encode, ulaw_decode),
            ("alaw", alaw_encode, alaw_decode),
        ):
            codec = G711Codec(law)
            assert np.array_equal(codec.decode(codec.encode(pcm)), dec(enc(pcm)))

    def test_decode_dispatches_on_fmt_tag(self):
        """A ulaw-configured codec decodes an alaw payload correctly —
        the fmt tag, not the constructor arg, picks the expansion curve
        (the mapInPandas extractor relies on this)."""
        from gohangout_spark.functions.g711 import G711Codec, alaw_decode, alaw_encode

        pcm = np.array([100, -5000, 31000, -32768], dtype=np.int64)
        payload = G711Codec("alaw").encode(pcm)
        assert np.array_equal(
            G711Codec("ulaw").decode(payload), alaw_decode(alaw_encode(pcm))
        )

    def test_companding_error_bounded(self):
        """Lossy but bounded: half a top-segment quantization step plus
        the fold truncation — measured maxima over the FULL 16-bit range
        are 644 (μ-law) and 512 (A-law); assert those exact ceilings so
        any regression that widens a segment shift fails immediately."""
        from gohangout_spark.functions.g711 import (
            alaw_decode,
            alaw_encode,
            ulaw_decode,
            ulaw_encode,
        )

        pcm = np.arange(-32768, 32768, dtype=np.int64)
        assert np.max(np.abs(ulaw_decode(ulaw_encode(pcm)) - pcm)) <= 644
        assert np.max(np.abs(alaw_decode(alaw_encode(pcm)) - pcm)) <= 512

    def test_wav_framing_fields(self):
        from gohangout_spark.functions.g711 import G711Codec

        for law, tag in (("ulaw", 0x0007), ("alaw", 0x0006)):
            payload = G711Codec(law, 8000).encode(np.zeros(10, dtype=np.int64))
            fmt_at = payload.index(b"fmt ") + 8
            got = struct.unpack_from("<HHIIHH", payload, fmt_at)
            assert got == (tag, 1, 8000, 8000, 1, 8)

    def test_rejects_unknown_law_and_payload(self):
        from gohangout_spark.functions.g711 import G711Codec

        with pytest.raises(ValueError):
            G711Codec("mp3")
        with pytest.raises(ValueError):
            G711Codec().decode(b"not a wav")


class TestScreenVideo:
    """FLV Screen Video: interframe block-copy decode (codec id 3)."""

    def _codec(self):
        from gohangout_spark.functions.screenvideo import ScreenVideoCodec

        return ScreenVideoCodec(16)

    def test_roundtrip_with_edge_blocks(self):
        codec = self._codec()
        rng = np.random.RandomState(11)
        frames = [rng.randint(0, 256, (23, 37, 3), dtype=np.uint8) for _ in range(4)]
        out = list(codec.iter_frames(codec.encode(frames)))
        assert len(out) == 4
        assert all(np.array_equal(a, b) for a, b in zip(frames, out))

    def test_interframe_markers_are_emitted(self):
        """A single-block change must encode as ONE zlib block and
        unchanged-markers for the rest — the temporal path is real."""
        import struct

        codec = self._codec()
        rng = np.random.RandomState(5)
        f0 = rng.randint(0, 256, (32, 48, 3), dtype=np.uint8)  # 3x2 blocks
        f1 = f0.copy()
        f1[16:32, 0:16] = 7  # exactly one block region
        payload = codec.encode([f0, f1])
        tags = list(codec._tags(payload))
        body = tags[1][1]  # interframe video data
        assert body[0] >> 4 == 2  # inter frame type
        pos, sizes = 5, []
        while pos + 2 <= len(body):
            (size,) = struct.unpack(">H", body[pos : pos + 2])
            sizes.append(size)
            pos += 2 + size
        assert sizes.count(0) == 5 and len(sizes) == 6
        out = list(codec.iter_frames(payload))
        assert np.array_equal(out[1], f1)

    def test_hand_assembled_stream_pins_bottom_up_bgr(self):
        """Decode a manually built FLV+packet (never touched our encoder):
        block rows are BOTTOM-UP and channels BGR per the spec."""
        import struct
        import zlib

        # target frame, top-down RGB
        want = np.array(
            [[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8
        )
        # spec payload: bottom row first, BGR
        raw = bytes([9, 8, 7, 12, 11, 10, 3, 2, 1, 6, 5, 4])
        block = zlib.compress(raw)
        packet = (
            struct.pack(">H", (0 << 12) | 2)
            + struct.pack(">H", (0 << 12) | 2)
            + struct.pack(">H", len(block))
            + block
        )
        video_data = bytes([(1 << 4) | 3]) + packet
        tag = (
            bytes([9])
            + struct.pack(">I", len(video_data))[1:]
            + b"\x00\x00\x00\x00"
            + b"\x00\x00\x00"
            + video_data
        )
        payload = (
            b"FLV\x01\x01" + struct.pack(">I", 9) + struct.pack(">I", 0)
            + tag + struct.pack(">I", len(tag))
        )
        (frame,) = self._codec().iter_frames(payload)
        assert np.array_equal(frame, want)

    def test_static_clip_collapses_to_markers(self):
        codec = self._codec()
        f0 = np.full((17, 20, 3), 55, dtype=np.uint8)
        payload = codec.encode([f0, f0.copy(), f0.copy()])
        out = list(codec.iter_frames(payload))
        assert all(np.array_equal(f0, f) for f in out)
        # 3 frames but only the keyframe carries pixel data
        info = codec.probe(payload)
        assert info == {
            "n_frames": 3, "n_keyframes": 1,
            "width": 20, "height": 17, "block_size": 16,
        }

    def test_rejects_inter_first_and_bad_magic(self):
        import struct

        codec = self._codec()
        f0 = np.zeros((4, 4, 3), dtype=np.uint8)
        payload = codec.encode([f0, f0.copy()])
        tags = list(codec._tags(payload))
        # rebuild an FLV holding ONLY the interframe
        body = tags[1][1]
        tag = (
            bytes([9]) + struct.pack(">I", len(body))[1:]
            + b"\x00" * 7 + body
        )
        bad = (
            b"FLV\x01\x01" + struct.pack(">I", 9) + struct.pack(">I", 0)
            + tag + struct.pack(">I", len(tag))
        )
        with pytest.raises(ValueError):
            list(codec.iter_frames(bad))
        with pytest.raises(ValueError):
            list(codec.iter_frames(b"AVI whatever"))

    def test_fixture_interframes_skip_blocks(self):
        """The gate fixture's interframes must actually exercise the
        temporal path: every clip's inter tags contain >= 1 unchanged
        marker (schedule updates ~1/3 of blocks per frame)."""
        import struct

        from gohangout_spark.functions.multimodal import (
            screenvideo_fixture_params,
        )
        from gohangout_spark.functions.screenvideo import ScreenVideoCodec

        from gohangout_spark.functions.multimodal import (
            screenvideo_fixture_frames,
        )

        codec = ScreenVideoCodec(16)
        payload = codec.encode(screenvideo_fixture_frames(0))
        for k, (tag_type, body) in enumerate(codec._tags(payload)):
            if k == 0:
                continue
            pos, zeros, total = 5, 0, 0
            while pos + 2 <= len(body):
                (size,) = struct.unpack(">H", body[pos : pos + 2])
                zeros += size == 0
                total += 1
                pos += 2 + size
            assert zeros >= 1 and zeros < total


class TestMp3LayerI:
    """MPEG-1 Audio Layer I (functions/mp3.py): ISO 11172-3 bitstream
    layer — header, allocation, scalefactors, §2.4.3.3 requantization —
    plus the documented closed-form DCT-IV PR pair for the PCM tier."""

    def test_quantize_requantize_within_one_step(self):
        from gohangout_spark.functions.mp3 import _quantize, _requantize

        rng = np.random.default_rng(3)
        for nb in (2, 3, 8, 10, 15):
            step = 2.0 / ((1 << nb) - 1)
            for s in rng.uniform(-0.999, 0.999, 500):
                err = abs(_requantize(_quantize(s, nb), nb) - s)
                assert err <= step, (nb, s, err)

    def test_subband_bitstream_roundtrip(self):
        from gohangout_spark.functions.mp3 import Mp3LayerICodec

        rng = np.random.default_rng(5)
        c = Mp3LayerICodec(sample_rate=32000, nb=12)
        S = rng.uniform(-1.5, 1.5, (36, 32))
        S[:, 7] = 0.0  # silent subband -> alloc 0
        S2, info = c.decode_subbands(c.encode_subbands(S))
        # 31 active subbands at nb=12: 32+128+186+4464 = 4810 bits = 602
        # bytes -> smallest fitting Layer I rate is 416 kbps (624 bytes)
        assert info == {"sample_rate": 32000, "bitrate_kbps": 416, "n_frames": 3}
        assert S2.shape == (36, 32)
        assert np.all(S2[:, 7] == 0.0)
        # error bounded by scalefactor * quantization step per subband
        step = 2.0 / ((1 << 12) - 1)
        peaks = np.abs(S).max(axis=0)
        for s in range(32):
            sf = next(x for x in __import__(
                "gohangout_spark.functions.mp3", fromlist=["SCALEFACTORS"]
            ).SCALEFACTORS if x >= peaks[s]) if peaks[s] > 0 else 0.0
        assert np.abs(S2 - S).max() <= 2.0 * step  # sf <= 2

    def test_header_fields_independent_read(self):
        from gohangout_spark.functions.mp3 import Mp3LayerICodec

        data = Mp3LayerICodec(sample_rate=44100, nb=6).encode_subbands(
            np.ones((12, 32)) * 0.25
        )
        b = data[:4]
        assert (b[0] << 4) | (b[1] >> 4) == 0xFFF        # sync
        assert (b[1] >> 3) & 1 == 1                      # ID: MPEG-1
        assert (b[1] >> 1) & 0b11 == 0b11                # Layer I
        assert b[1] & 1 == 1                             # no CRC
        assert (b[2] >> 2) & 0b11 == 0                   # 44.1 kHz index
        assert (b[3] >> 6) & 0b11 == 0b11                # single_channel
        bitrate_index = (b[2] >> 4) & 0xF
        nslots = int(12 * bitrate_index * 32 * 1000 / 44100)
        assert len(data) == 4 * nslots                   # §2.4.2.3 length

    def test_pcm_dct4_pair_reconstructs(self):
        from gohangout_spark.functions.mp3 import Mp3LayerICodec

        rng = np.random.default_rng(11)
        c = Mp3LayerICodec(sample_rate=48000, nb=8)
        pcm = rng.uniform(-0.5, 0.5, 384 * 2)
        out, sr = c.decode(c.encode(pcm))
        assert sr == 48000 and len(out) == 384 * 2
        assert np.abs(out - pcm).max() < 0.05  # bounded by quantization only

    def test_corrupt_sync_and_truncation(self):
        from gohangout_spark.functions.mp3 import Mp3LayerICodec

        with pytest.raises(ValueError, match="sync"):
            Mp3LayerICodec.decode_subbands(b"\x00" * 64)
        with pytest.raises(ValueError, match="no frames"):
            Mp3LayerICodec.decode_subbands(b"\xff")

    def test_forbidden_parameters_rejected(self):
        from gohangout_spark.functions.mp3 import Mp3LayerICodec

        with pytest.raises(ValueError, match="sample_rate"):
            Mp3LayerICodec(sample_rate=22050)
        with pytest.raises(ValueError, match="nb"):
            Mp3LayerICodec(nb=16)
        with pytest.raises(ValueError, match="nb"):
            Mp3LayerICodec(nb=1)

    def test_bit_budget_picks_smallest_fitting_bitrate(self):
        from gohangout_spark.functions.mp3 import Mp3LayerICodec

        c = Mp3LayerICodec(sample_rate=32000, nb=10)
        # one active subband: 32+128+6+120 = 286 bits = 36 bytes -> the
        # 32 kbps frame (48 bytes) holds it
        one = np.zeros((12, 32)); one[:, 3] = 0.5
        _, info = c.decode_subbands(c.encode_subbands(one))
        assert info["bitrate_kbps"] == 32
        # all 32 active at nb=10: 32+128+192+3840 = 4192 bits = 524 bytes
        # -> needs >= 352 kbps (528 bytes)
        full = np.full((12, 32), 0.5)
        _, info = c.decode_subbands(c.encode_subbands(full))
        assert info["bitrate_kbps"] == 352

    def test_fixture_table_and_extractor(self, spark):
        from gohangout_spark.functions.multimodal import (
            extract_mp3_features,
            make_mp3_media_table,
        )

        out = {
            r["media_id"]: r
            for r in extract_mp3_features(make_mp3_media_table(spark, n=8)).collect()
        }
        assert len(out) == 8
        assert out[1]["active_subband"] == 1
        assert out[1]["n_frames"] == 2 and out[1]["sample_rate"] == 32000
        # amplitude for clip 1 is (1-10)/16 = -0.5625; decoded |value|
        # within one quantization step of it
        assert abs(out[1]["peak_level"] - 0.5625) < 2.0 / 1023 * 2
