"""Character-bigram language-model quality scoring (CCNet-style).

CCNet (arXiv:1911.00359) buckets crawl text by the perplexity of a small LM
trained on a trusted reference corpus — low-perplexity ≈ fluent, reference-
like text. The production system uses a KenLM 5-gram over tokens; this
module implements the same signal shape with a character-bigram model so
the WHOLE loop (train + score) runs in-engine with no model libraries:

- train: bigram transition counts over the reference corpus. The model is
  bounded by the alphabet (37 chars: a-z 0-9 space → 1369 cells) no matter
  how big the reference is, so the aggregated counts collect to the driver
  as a tiny table and broadcast to the scorer as a plan literal.
- score: per-doc mean negative log-likelihood of its char transitions,
  evaluated SCAN-SIDE: a 1369-element double-array literal indexed by
  ``(instr(alphabet,c1)-1)*V + instr(alphabet,c2)`` inside built-in HOFs.
  No Python, no join, no shuffle — pure whole-stage-codegen projection,
  which is what lets the scorer run over 100 TB as a narrow pass.

Smoothing is add-one over the alphabet: p(c2|c1) = (cnt+1)/(tot_c1+V).
Integer counts + closed-form probabilities keep the scorer exactly
reproducible in any engine (the workload oracle recomputes the model in
DuckDB SQL and hash-matches).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "
V = len(ALPHABET)  # 37

__all__ = ["normalize_chars", "fit_char_bigram_lm", "perplexity", "perplexity_buckets"]


def normalize_chars(col: Column) -> Column:
    """Lowercase, map every non-alphabet char to space, collapse runs,
    trim — the shared normalization for train and score (they MUST match
    or the perplexity silently shifts)."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(col), "[^a-z0-9 ]", " "), " +", " ")
    )


def _bigram_pairs(norm: Column) -> Column:
    """array<struct<c1,c2>> of the char transitions of a normalized string.

    Built from two shifted ROW-LEVEL slices of the char array zipped
    together (the zipped_shingles trick): referencing ``norm`` inside a
    ``transform(sequence(...), i -> substr(norm, i, 2))`` lambda makes
    Catalyst re-evaluate the whole regexp-normalization chain PER ELEMENT
    — O(chars²) regex work per row, measured ~20× slower at sf0.01."""
    chars = F.split(norm, "")
    length = F.greatest(F.size(chars) - 1, F.lit(1))
    zipped = F.arrays_zip(
        F.slice(chars, 1, length).alias("c1"), F.slice(chars, 2, length).alias("c2")
    )
    return F.when(F.size(chars) >= 2, zipped).otherwise(
        F.array().cast("array<struct<c1:string,c2:string>>")
    )


def fit_char_bigram_lm(ref_docs: DataFrame, *, text_col: str = "text") -> list[float]:
    """Train on the reference corpus; returns the V×V row-major table of
    log p(c2|c1) with add-one smoothing (index (i1-1)*V + (i2-1), 0-based).

    One explode over the REFERENCE (the trusted set — orders of magnitude
    smaller than the corpus being scored), one combiner-reduced groupBy on
    2-char keys, and a ≤1369-row driver collect.
    """
    import math

    pairs = ref_docs.select(
        F.explode(_bigram_pairs(normalize_chars(F.col(text_col)))).alias("p")
    ).select(F.concat(F.col("p.c1"), F.col("p.c2")).alias("pair"))
    counts = {
        r["pair"]: r["cnt"]
        for r in pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    totals = [0] * V
    for pair, c in counts.items():
        totals[ALPHABET.index(pair[0])] += c
    table = []
    for i1, c1 in enumerate(ALPHABET):
        tot = totals[i1]
        for c2 in ALPHABET:
            cnt = counts.get(c1 + c2, 0)
            table.append(math.log((cnt + 1) / (tot + V)))
    return table


def perplexity(
    docs: DataFrame,
    model: list[float],
    *,
    text_col: str = "text",
    out_col: str = "ppl",
) -> DataFrame:
    """Per-doc pseudo-perplexity exp(mean -ln p(c2|c1)) under ``model``,
    rounded to 4 decimals; NULL for docs with <2 normalized chars.
    Scan-side only — the model ships as a plan literal."""
    if len(model) != V * V:
        raise ValueError(f"model must have {V * V} entries, got {len(model)}")
    arr = F.array(*[F.lit(x) for x in model])
    alpha = F.lit(ALPHABET)
    norm = normalize_chars(F.col(text_col))
    pairs = _bigram_pairs(norm)

    def logp(p):
        i1 = F.instr(alpha, p.getField("c1"))
        i2 = F.instr(alpha, p.getField("c2"))
        return F.element_at(arr, ((i1 - 1) * V + i2).cast("int"))

    nll_sum = F.aggregate(
        pairs, F.lit(0.0), lambda acc, p: acc - logp(p)
    )
    n_pairs = F.size(pairs)
    ppl = F.when(n_pairs > 0, F.round(F.exp(nll_sum / n_pairs), 4))
    return docs.withColumn(out_col, ppl)


def perplexity_buckets(
    docs: DataFrame,
    model: list[float],
    *,
    text_col: str = "text",
    cutoffs: tuple[float, float] | None = None,
) -> DataFrame:
    """CCNet's head/middle/tail split: docs bucketed by perplexity
    tertiles. ``cutoffs`` (low, high) skips the quantile job when the
    thresholds are known; otherwise approxQuantile (distributed sketch,
    driver gets 2 doubles). NULL-ppl docs land in 'tail'."""
    scored = perplexity(docs, model, text_col=text_col)
    if cutoffs is None:
        lo, hi = scored.approxQuantile("ppl", [1 / 3, 2 / 3], 1e-3)
    else:
        lo, hi = cutoffs
    bucket = (
        F.when(F.col("ppl").isNull(), "tail")
        .when(F.col("ppl") <= lo, "head")
        .when(F.col("ppl") <= hi, "middle")
        .otherwise("tail")
    )
    return scored.withColumn("ppl_bucket", bucket)
