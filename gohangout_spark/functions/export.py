"""Training-data export: WebDataset-style tar shards.

WebDataset (the de-facto sharded training format: tar archives whose
members group by key — ``<key>.txt``, ``<key>.json`` — consumed
sequentially by dataloaders) needs no special library to WRITE: each
shard is a plain tar, produced here with the stdlib ``tarfile`` module
inside ``applyInPandas``, one task per shard.

Scale shape: rows get a deterministic global training order
(:func:`gohangout_spark.functions.sampling.deterministic_shuffle`), the
shard id is ``train_idx // docs_per_shard``, and a groupBy(shard) gives
each task exactly one tar to write — shards scale out with the cluster,
and the write is reproducible byte-for-byte (fixed mtime/uid, members in
train_idx order, zero-padded keys) so a re-run — or a task replayed
after executor loss — produces identical shards, which is what makes
the side-effecting write safe under Spark's re-execution semantics.
``out_dir`` must be a filesystem every task AND the driver can reach
(local disk only on local[*]; a shared mount on a cluster). Returns a
manifest (shard, path, n_docs, n_bytes) the caller can validate or
commit atomically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST_SCHEMA = "shard long, path string, n_docs long, n_bytes long"


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    *,
    docs_per_shard: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
    meta_cols: list[str] | None = None,
    seed: int = 42,
) -> DataFrame:
    """Write ``df`` as WebDataset tar shards under ``out_dir`` and return
    the manifest. Each sample becomes ``<idx>.txt`` (the text) plus
    ``<idx>.json`` (the ``meta_cols``, if given); ``<idx>`` is the
    9-digit global training index, so member order IS training order.
    NULL text exports as an empty member (the doc stays addressable).
    """
    import io
    import json
    import tarfile

    import pandas as pd

    from gohangout_spark.functions.sampling import deterministic_shuffle

    meta_cols = list(meta_cols or [])
    os.makedirs(out_dir, exist_ok=True)  # driver-side, for local runs

    ordered = deterministic_shuffle(df, id_col, seed=seed, idx_col="__idx")
    keep = ["__idx", text_col, *meta_cols]
    with_shard = ordered.select(*keep).withColumn(
        "__shard", (F.col("__idx") / docs_per_shard).cast("long")
    )

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["__shard"].iloc[0])
        # executor-side too: on a real cluster the driver's makedirs ran on
        # a different machine; out_dir must be a SHARED filesystem
        # (NFS/fuse-mounted object store) for the manifest paths to resolve
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"shard-{shard:05d}.tar")
        pdf = pdf.sort_values("__idx")
        with open(path, "wb") as fh, tarfile.open(fileobj=fh, mode="w") as tar:
            for _, row in pdf.iterrows():
                key = f"{int(row['__idx']):09d}"
                txt = (row[text_col] or "").encode("utf-8")
                info = tarfile.TarInfo(name=f"{key}.txt")
                info.size = len(txt)
                info.mtime = 0
                tar.addfile(info, io.BytesIO(txt))
                if meta_cols:
                    # numpy scalars (int64/float64 meta columns) are not JSON
                    # types — unwrap via .item() so numbers stay numbers in
                    # the .json members (default=str would stringify them and
                    # break typed round-trips for dataloader consumers)
                    meta = json.dumps(
                        {
                            c: (
                                row[c].item()
                                if hasattr(row[c], "item")
                                else row[c]
                            )
                            for c in meta_cols
                        },
                        sort_keys=True,
                        default=str,
                    ).encode("utf-8")
                    info = tarfile.TarInfo(name=f"{key}.json")
                    info.size = len(meta)
                    info.mtime = 0
                    tar.addfile(info, io.BytesIO(meta))
        return pd.DataFrame(
            [(shard, path, len(pdf), os.path.getsize(path))],
            columns=["shard", "path", "n_docs", "n_bytes"],
        )

    manifest = with_shard.groupBy("__shard").applyInPandas(_write, MANIFEST_SCHEMA)
    # applyInPandas is lazy and re-running it would rewrite every shard
    # (harmlessly — identical bytes — but at full cost): cache + count
    # materializes the write once; later actions read the cache
    out = manifest.orderBy("shard").cache()
    out.count()
    return out
