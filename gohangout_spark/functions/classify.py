"""Linear text classification — the fasttext-style quality-filter stage.

Production LLM pipelines gate documents with small linear classifiers
(quality, language, toxicity) because they run at scan speed over 100 TB.
The factoring here mirrors the char-LM operator (functions/lm.py): TRAIN
distributed (one MLlib logistic regression over hashed features), then ship
the learned weights as PLAN LITERALS and score scan-side — no model server,
no join, no Python in the scoring path.

Features come from functions.similarity.hashed_embeddings (the hashing
trick — no vocabulary), so the whole score is a deterministic function of
the text that an oracle can replay: dot(hashed_vector, weights) + bias
through a sigmoid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gohangout_spark.functions.num import round_half_up


def linear_score_col(
    vec_col: Column,
    weights: list[float],
    bias: float = 0.0,
    *,
    sigmoid: bool = True,
) -> Column:
    """``sigmoid(dot(vec, weights) + bias)`` with the weights inlined as
    literals — whole-stage-codegen scoring, O(dim) per row. The dot runs
    in ascending dim order (zip_with + left-to-right aggregate), so an
    oracle summing ``generate_series`` order reproduces it bit-for-bit."""
    w = F.array(*[F.lit(float(x)) for x in weights])
    dot = F.aggregate(
        F.zip_with(vec_col, w, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    z = dot + F.lit(float(bias))
    return (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))) if sigmoid else z


def score_documents(
    docs: DataFrame,
    weights: list[float],
    bias: float = 0.0,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "score",
    digits: int = 4,
    normalize: bool = True,
    arrow: bool = False,
) -> DataFrame:
    """Hash-feature + linear-score in one call: (id, score). The feature
    dim is ``len(weights)``; rounding is the engine-deterministic floor
    form so the score is oracle-comparable.

    ``normalize`` MUST match how the weights were fit:
    :func:`train_text_classifier` trains on L2-normalized features, so the
    default is True — scoring unnormalized vectors with normalized-trained
    weights scales the logit by ||v|| while the bias stays fixed, flipping
    decisions for long/short docs. Set False only for weights defined over
    raw counts (e.g. the analytic fixture in the workload oracle).

    ``arrow=True`` computes the features with the bit-identical Arrow
    kernel (hashed_embeddings_pandas) — same scores, the right choice at
    production dims (docs/SCALE.md #4)."""
    from gohangout_spark.functions.similarity import (
        hashed_embeddings,
        hashed_embeddings_pandas,
    )

    fe = hashed_embeddings_pandas if arrow else hashed_embeddings
    emb = fe(
        docs, text_col=text_col, id_col=id_col, dim=len(weights),
        seed=seed, normalize=normalize,
    )
    return emb.select(
        F.col(id_col),
        round_half_up(
            linear_score_col(F.col("embedding"), weights, bias), digits
        ).alias(out_col),
    )


def train_text_classifier(
    docs: DataFrame,
    label_col: str,
    *,
    text_col: str = "text",
    dim: int = 64,
    seed: int = 42,
    reg_param: float = 0.01,
    max_iter: int = 50,
) -> tuple[list[float], float]:
    """Fit a logistic regression over hashed text features and return
    (weights, bias) ready for :func:`linear_score_col` — the distributed
    train / scan-side score split. ``label_col`` must be 0/1.

    Scale shape: feature hashing is scan-side (no vocabulary collect);
    MLlib's LogisticRegression aggregates gradients tree-wise, so driver
    traffic is O(dim) per iteration. The returned model is dim+1 floats —
    trivially a plan literal.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    from gohangout_spark.functions.similarity import hashed_embeddings

    feats = hashed_embeddings(
        docs, text_col=text_col, dim=dim, seed=seed, normalize=True
    ).select(
        array_to_vector(F.col("embedding")).alias("features"),
        F.col(label_col).cast("double").alias("label"),
    )
    lr = LogisticRegression(
        regParam=reg_param, maxIter=max_iter, standardization=False
    )
    model = lr.fit(feats)
    return [float(x) for x in model.coefficients], float(model.intercept)
