"""Perceptual-hash (dHash) unit tests: the bit math on hand-built images,
band packing, the banded near-dup join's recall vs brute force, and the
perceptual invariance that justifies calling it an image near-dup signal
(exact-scale resilience). The image_dhash_features / image_dhash_neardup
workload oracles gate the same construction at fixture scale."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from gohangout_spark.functions.phash import (
    dhash_bits,
    dhash_neardup_pairs,
    dhash_table,
    pack_bands,
)


def _img(means: np.ndarray, block: int = 4) -> np.ndarray:
    """Expand a gy×gx matrix of block values into an RGB image whose
    block means are exactly those values (constant blocks, r=g=b)."""
    px = np.kron(means, np.ones((block, block), dtype=np.int64))
    return np.stack([px, px, px], axis=-1).astype(np.uint8)


class TestDhashBits:
    def test_horizontal_comparison_and_shape(self):
        means = np.array(
            [[10, 20, 5], [7, 7, 9]], dtype=np.int64
        )  # 2 rows x 3 cols -> grid (3, 2), 2 bits per row
        bits = dhash_bits(_img(means), grid=(3, 2))
        assert bits.shape == (2, 2)
        # row 0: 10<20 -> 1, 20<5 -> 0 ; row 1: 7<7 -> 0 (strict), 7<9 -> 1
        assert bits.tolist() == [[1, 0], [0, 1]]

    def test_integer_luma_weights(self):
        # distinct channels: luma = (299r + 587g + 114b) // 1000
        a = np.zeros((2, 4, 3), dtype=np.uint8)
        a[:, :2] = (255, 0, 0)  # luma 76
        a[:, 2:] = (0, 33, 0)  # luma 19
        bits = dhash_bits(a, grid=(2, 1))
        assert bits.tolist() == [[0]]  # 76 > 19 -> left not darker
        b = a[:, ::-1].copy()
        assert dhash_bits(b, grid=(2, 1)).tolist() == [[1]]

    def test_block_mean_is_floor_division(self):
        # 2x2 blocks [0,1;1,1] sum 3 -> mean 3//4 = 0, vs solid 1 -> bit 1
        px = np.zeros((2, 4, 3), dtype=np.uint8)
        px[0, 1] = px[1, 0] = px[1, 1] = 1
        px[:, 2:] = 1
        assert dhash_bits(px, grid=(2, 1)).tolist() == [[1]]

    def test_grid_mismatch_raises(self):
        with pytest.raises(ValueError, match="does not tile"):
            dhash_bits(np.zeros((30, 36, 3), dtype=np.uint8), grid=(9, 8))

    def test_scale_invariance(self):
        # nearest-neighbor 2x upscale preserves block means exactly ->
        # identical hash: the perceptual property that makes dHash a
        # near-dup signal across re-encodes/resizes
        rng = np.random.RandomState(7)
        means = rng.randint(0, 255, size=(8, 9)).astype(np.int64)
        small, big = _img(means, block=2), _img(means, block=4)
        assert np.array_equal(
            dhash_bits(small, grid=(9, 8)), dhash_bits(big, grid=(9, 8))
        )


class TestPackBands:
    def test_positions(self):
        bits = np.zeros(64, dtype=np.int64).reshape(8, 8)
        bits[0, 0] = 1  # pos 0 -> band 0, offset 0
        bits[1, 7] = 1  # pos 15 -> band 0, offset 15
        bits[2, 0] = 1  # pos 16 -> band 1, offset 0
        bits[7, 7] = 1  # pos 63 -> band 3, offset 15
        assert pack_bands(bits) == [1 | (1 << 15), 1, 0, 1 << 15]

    def test_band_count_rounds_up(self):
        assert len(pack_bands(np.ones(17, dtype=np.int64))) == 2


class TestNeardupJoin:
    def test_banded_join_matches_brute_force(self, spark):
        from gohangout_spark.functions.multimodal import (
            PpmCodec,
            make_dhash_media_table,
        )

        media = make_dhash_media_table(spark, n=48)
        ht = dhash_table(media, codec=PpmCodec())
        hashes = {r.media_id: list(r.bands) for r in ht.collect()}
        brute = set()
        for a in hashes:
            for b in hashes:
                if a < b:
                    d = sum(
                        bin(x ^ y).count("1")
                        for x, y in zip(hashes[a], hashes[b])
                    )
                    if d <= 3:
                        brute.add((a, b, d))
        got = {
            (r.id_a, r.id_b, r.hamming)
            for r in dhash_neardup_pairs(ht, max_hamming=3).collect()
        }
        assert got == brute
        # the 24 fixture twins are near-dups BY CONSTRUCTION (<= 2 bits)
        assert {(j, j + 24) for j in range(24)} <= {(a, b) for a, b, _ in got}

    def test_fixture_base_matches_md5(self):
        from gohangout_spark.functions.multimodal import dhash_fixture_base

        dg = hashlib.md5(b"5").digest()
        assert dhash_fixture_base(5, 2, 3) == (
            dg[0] * 3 + dg[1] * 4 * 4 + dg[2]
        ) % 254


class TestDefaults:
    def test_default_codec_decodes_real_payloads(self, spark):
        # dhash_table() with no codec must work on the repo's real media
        # payloads (AutoCodec magic dispatch) — the fake codec's 4-7 px
        # images cannot tile the 9x8 grid, so it would be a dead default
        from gohangout_spark.functions.multimodal import make_dhash_media_table

        media = make_dhash_media_table(spark, n=4)
        rows = dhash_table(media).collect()
        assert len(rows) == 4 and all(len(r.bands) == 4 for r in rows)
