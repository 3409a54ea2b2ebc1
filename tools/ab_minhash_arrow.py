"""A/B evidence for VERDICT r9 #5: Arrow kernel vs interpreted HOF for the
MinHash signature build in dedup_minhash_lsh.

HEAD: minhash_signature = aggregate(shingles, [MAX]*K, zip_with(least))
      — one interpreted-HOF pass, K xxhash64 per shingle, all JVM.
ARROW: mapInPandas over (doc_id, shingles): flatten the batch's shingle
      arrays, K vectorized numpy XXH64 passes, minimum.reduceat per doc.
      Pays the JVM->Python->JVM transpose of the shingle arrays.

Timing-first harness: the numpy XXH64 here reproduces Spark's two-field
xxhash64(shingle, j) chain (hashLong then hashInt, seed 42) so the
signatures — and therefore the band keys and candidate pairs — are
bit-identical; an `identical` check below asserts it before timing.

RESULT (r10, recorded NEGATIVE — the HOF stays): identical=True (256
pairs), interleaved medians at sf0.1 head_hof 2.147 s vs arrow_kernel
3.225 s, 7/7 samples pairwise slower. The signature HOF costs only
~0.18 s of the query (stage attribution in OPTIMIZATION_r10.md); the
JVM->Arrow->JVM transpose of the shingle arrays costs more than the
whole stage it replaces — the same verdict the r9 embedding_lsh
unrolled-codegen experiment reached from the other direction.

Usage: SPARK_GRAFT_SF_DIR=... python tools/ab_minhash_arrow.py [rounds]
"""

from __future__ import annotations

import sys

import numpy as np

from ab_bench import run_ab

from pyspark.sql import functions as F

P1 = np.uint64(0x9E3779B185EBCA87)
P2 = np.uint64(0xC2B2AE3D27D4EB4F)
P3 = np.uint64(0x165667B19E3779F9)
P4 = np.uint64(0x85EBCA77C2B2AE63)
P5 = np.uint64(0x27D4EB2F165667C5)


def _rotl(x, r):
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _fmix(h):
    h ^= h >> np.uint64(33)
    h *= P2
    h ^= h >> np.uint64(29)
    h *= P3
    h ^= h >> np.uint64(32)
    return h


def _xxh64_long(value_u64, seed_u64):
    """Spark XXH64.hashLong(value, seed), vectorized."""
    h = seed_u64 + P5 + np.uint64(8)
    h = h ^ (_rotl(value_u64 * P2, 31) * P1)
    h = _rotl(h, 27) * P1 + P4
    return _fmix(h)


def _xxh64_int(value_u32_as_u64, seed_u64):
    """Spark XXH64.hashInt(value, seed), vectorized (value zero-extended)."""
    h = seed_u64 + P5 + np.uint64(4)
    h = h ^ (value_u32_as_u64 * P1)
    h = _rotl(h, 23) * P2 + P3
    return _fmix(h)


def arrow_lsh(spark, sf_dir):
    from gohangout_spark.functions.dedup import (
        band_keys_expr,
        shingle_hashes,
    )
    from gohangout_spark.functions.num import round_half_up
    from gohangout_spark.workload import _docs

    num_hashes, bands = 32, 16
    df = _docs(spark, sf_dir)
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(parallelism)
    base = (
        df.select(
            F.col("doc_id").alias("doc_id"),
            shingle_hashes(F.col("text"), 3).alias("shingles"),
        )
        .filter(F.size("shingles") > 0)
        .repartition(parallelism, F.col("doc_id"))
    )

    def sig_batches(it):
        old = np.seterr(over="ignore")
        try:
            for pdf in it:
                arrs = pdf["shingles"]
                lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=len(arrs))
                if len(arrs) == 0:
                    yield pdf.assign(sig=[])[["doc_id", "sig"]]
                    continue
                flat = np.concatenate([np.asarray(a, dtype=np.int64) for a in arrs]).astype(
                    np.uint64
                )
                starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                seed0 = np.uint64(42)
                h_s = _xxh64_long(flat, seed0)  # hash of the shingle field
                sigs = np.empty((len(arrs), num_hashes), dtype=np.int64)
                for j in range(num_hashes):
                    hj = _xxh64_int(np.uint64(j), h_s)  # chain the j field
                    sigs[:, j] = np.minimum.reduceat(hj.view(np.int64), starts)
                pdf = pdf[["doc_id"]].copy()
                pdf["sig"] = list(sigs)
                yield pdf
        finally:
            np.seterr(**old)

    sigs = base.mapInPandas(sig_batches, "doc_id long, sig array<long>")
    band_keys = band_keys_expr("sig", num_hashes, bands)
    buckets = sigs.select("doc_id", F.explode(band_keys).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_a = base.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = base.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    withsh = pairs.join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return withsh.select(
        "id_a", "id_b", round_half_up(inter / union, 4).alias("jaccard")
    ).filter(F.col("jaccard") >= 0.2)


def head_lsh(spark, sf_dir):
    from gohangout_spark.workload import QUERIES

    return QUERIES["dedup_minhash_lsh"][0](spark, sf_dir)


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from gohangout_spark import get_spark

    spark = get_spark("gohangout-spark-ab")
    spark.sparkContext.setLogLevel("ERROR")
    a = sorted(map(tuple, head_lsh(spark, sf_dir).collect()))
    b = sorted(map(tuple, arrow_lsh(spark, sf_dir).collect()))
    print(f"identical: {a == b} ({len(a)} pairs)")
    if a != b:
        sys.exit("signatures diverge — timing comparison would be meaningless")
    run_ab({"head_hof": head_lsh, "arrow_kernel": arrow_lsh}, rounds, spark=spark)
