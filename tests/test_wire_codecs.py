"""From-scratch snappy / LZ4 / XXH32 codecs (functions/snappy.py,
functions/lz4.py) — the compression legs of the Kafka wire tier. No
snappy/lz4/xxhash wheel exists in this container; these implement the
PUBLIC formats (google/snappy format_description.txt,
lz4_Block_format.md, lz4_Frame_format.md, the xxHash spec), so the
codecs are pinned here against published check values and
hand-assembled canonical streams, not a reference library."""

import random

import pytest

from gohangout_spark.functions import snappy
from gohangout_spark.functions.lz4 import (
    compress_block,
    compress_frame,
    decompress_block,
    decompress_frame,
    xxh32,
)


def _corpus():
    rng = random.Random(42)
    cases = [
        b"", b"a", b"abc", b"aaaa", b"a" * 100, b"ab" * 5000,
        b"the quick brown fox jumps over the lazy dog " * 50,
        bytes(range(256)) * 20,
    ]
    for _ in range(60):
        n = rng.randrange(0, 3000)
        base = bytes(rng.randrange(4) for _ in range(max(1, n // 7)))
        cases.append((base * 8)[:n])
    for _ in range(20):
        cases.append(bytes(rng.randrange(256) for _ in range(rng.randrange(0, 2000))))
    return cases


class TestXXH32:
    def test_published_check_values(self):
        """The widely-published XXH32 seed-0 vectors."""
        vectors = {
            b"": 0x02CC5D05,
            b"a": 0x550D7456,
            b"abc": 0x32D153FF,
            b"message digest": 0x7C948494,
            b"abcdefghijklmnopqrstuvwxyz": 0x63A14D5F,
            b"ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
            b"0123456789": 0x9C285E64,
            b"1234567890123456789012345678901234567890123456789012345678"
            b"9012345678901234567890": 0x9C05F475,
        }
        for data, want in vectors.items():
            assert xxh32(data) == want, data

    def test_seed_changes_hash(self):
        assert xxh32(b"abc", 1) != xxh32(b"abc", 0)


class TestSnappy:
    def test_roundtrip_corpus(self):
        for c in _corpus():
            assert snappy.decompress(snappy.compress(c)) == c

    def test_canonical_elements_decode(self):
        """Hand-assembled spec streams: a literal, a 1-byte-offset
        overlapping copy (RLE), and a 2-byte-offset copy."""
        rle = bytes([10, (4 - 1) << 2]) + b"aaaa" + bytes([((6 - 4) << 2) | 1, 1])
        assert snappy.decompress(rle) == b"a" * 10
        two = (
            bytes([8, (4 - 1) << 2]) + b"abcd"
            + bytes([((4 - 1) << 2) | 2]) + (4).to_bytes(2, "little")
        )
        assert snappy.decompress(two) == b"abcdabcd"

    def test_compresses_repetitive_input(self):
        data = b"hello world, again and again. " * 1000
        assert len(snappy.compress(data)) < len(data) // 5

    def test_length_preamble_mismatch_detected(self):
        z = bytearray(snappy.compress(b"abcdef"))
        z[0] += 1  # claim one more byte than the stream decodes
        with pytest.raises(ValueError, match="preamble"):
            snappy.decompress(bytes(z))

    def test_bad_offset_detected(self):
        # copy back 4 from position 2
        bad = bytes([6, (2 - 1) << 2]) + b"ab" + bytes(
            [((4 - 1) << 2) | 2]
        ) + (4).to_bytes(2, "little")
        with pytest.raises(ValueError, match="offset"):
            snappy.decompress(bad)


class TestLZ4:
    def test_block_roundtrip_corpus(self):
        for c in _corpus():
            assert decompress_block(compress_block(c)) == c

    def test_frame_roundtrip_corpus(self):
        for c in _corpus():
            assert decompress_frame(compress_frame(c)) == c

    def test_canonical_block_decode(self):
        """Hand-assembled sequence: token 0x44 = 4 literals + match
        len 4+4, offset 4 -> 'abcd' + 8 bytes of 'abcdabcd', then a
        literals-only tail."""
        block = bytes([0x44]) + b"abcd" + (4).to_bytes(2, "little") + bytes(
            [0x10]
        ) + b"z"
        assert decompress_block(block) == b"abcd" + b"abcdabcd" + b"z"

    def test_rle_overlap_copy(self):
        # 1 literal, then match offset 1 length 14: 'a' * 15
        block = bytes([0x1A]) + b"a" + (1).to_bytes(2, "little") + bytes([0x00])
        assert decompress_block(block) == b"a" * 15

    def test_frame_header_checksum_validated(self):
        z = bytearray(compress_frame(b"payload"))
        z[4] ^= 0x04  # flip a FLG bit: HC no longer matches
        with pytest.raises(ValueError, match="header checksum"):
            decompress_frame(bytes(z))

    def test_content_checksum_validated(self):
        z = bytearray(compress_frame(b"some payload " * 100))
        z[-10] ^= 0x01
        with pytest.raises(ValueError, match="checksum"):
            decompress_frame(bytes(z))

    def test_incompressible_block_stored(self):
        rng = random.Random(1)
        data = bytes(rng.randrange(256) for _ in range(5000))
        z = compress_frame(data)
        # stored block: high bit set on the block size word
        assert int.from_bytes(z[7:11], "little") & 0x80000000
        assert decompress_frame(z) == data


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYPOTHESIS = True
except ImportError:  # pragma: no cover
    HAVE_HYPOTHESIS = False


@pytest.mark.skipif(not HAVE_HYPOTHESIS, reason="hypothesis not installed")
class TestCodecProperties:
    """Property-based identity: ANY byte string must round-trip both
    codecs — arbitrary bytes (incompressible path) and structured
    repetitive bytes (the match-heavy path where offset/length bugs
    live)."""

    @given(st.binary(max_size=4096))
    @settings(max_examples=200, deadline=None)
    def test_snappy_roundtrip_any_bytes(self, data):
        assert snappy.decompress(snappy.compress(data)) == data

    @given(st.binary(max_size=4096))
    @settings(max_examples=200, deadline=None)
    def test_lz4_block_roundtrip_any_bytes(self, data):
        assert decompress_block(compress_block(data)) == data

    @given(st.binary(max_size=4096))
    @settings(max_examples=100, deadline=None)
    def test_lz4_frame_roundtrip_any_bytes(self, data):
        assert decompress_frame(compress_frame(data)) == data

    @given(
        st.binary(min_size=1, max_size=24),
        st.integers(min_value=1, max_value=600),
        st.binary(max_size=32),
    )
    @settings(max_examples=200, deadline=None)
    def test_repetitive_structures_roundtrip(self, unit, reps, tail):
        data = unit * reps + tail
        assert snappy.decompress(snappy.compress(data)) == data
        assert decompress_block(compress_block(data)) == data

    @given(st.binary(max_size=2048), st.integers(min_value=0, max_value=2**32 - 1))
    @settings(max_examples=100, deadline=None)
    def test_xxh32_is_deterministic_and_seed_sensitive(self, data, seed):
        a, b = xxh32(data, seed), xxh32(data, seed)
        assert a == b
        assert 0 <= a <= 0xFFFFFFFF
