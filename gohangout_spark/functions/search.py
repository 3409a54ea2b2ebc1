"""Keyword relevance search (BM25 / TF-IDF) over a document corpus.

The 100 TB shape: the query's terms are a tiny fixed set, so per-term
term-frequencies are computed as *scan-side array projections* over the
tokenized text (``size(filter(tokens, = term))`` — whole-stage codegen, no
explode, no shuffle of the corpus). Corpus statistics (N, avgdl, per-term
document frequency) partial-aggregate map-side into a SINGLE row collected
to the driver — O(|query terms|) bytes — and are inlined as literals into
the scoring projection. Top-k is ``orderBy(...).limit(k)``, which Spark
plans as TakeOrderedAndProject: each partition keeps a k-row heap and only
k rows per partition ever move. Two scans total (stats, score); callers
that search repeatedly over a static corpus should pass ``stats=`` from
:func:`corpus_stats` once, making every query a single scan.

Scoring follows Lucene's BM25 practical form: idf = ln(1 + (N - df + 0.5)
/ (df + 0.5)) (always positive), tf saturation k1, length normalization b.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gohangout_spark.functions.num import round_half_up

from gohangout_spark.functions.text import tokens

__all__ = ["query_terms", "corpus_stats", "bm25_topk", "tfidf_topk"]


def query_terms(query: str) -> list[str]:
    """Tokenize a query string exactly like text.tokens (lowercase,
    [^a-z0-9]+ split), deduplicated with first-seen order preserved."""
    out: list[str] = []
    for t in re.split(r"[^a-z0-9]+", query.lower()):
        if t and t not in out:
            out.append(t)
    return out


def _eq_term(t: str):
    # NB: a `lambda x, t=t:` default-arg closure would be seen by PySpark as
    # a two-parameter (element, index) lambda and bind `t` to the array
    # index — use a factory so the HOF lambda has exactly one parameter.
    return lambda x: x == F.lit(t)


def _tf_frame(docs: DataFrame, terms: list[str], id_col: str, text_col: str) -> DataFrame:
    # bind the tokenizer once per row (the dedup.zipped_shingles trick) and
    # emit dl + per-term counts through one inline(array(struct)) generator:
    # as separate projection columns each referencing tokens(), the
    # tokenizer would re-run per COLUMN (terms+1 times per row) — measured
    # 1.19 s → 0.86 s on the sf0.1 bm25_search gate
    def _counts(toks):
        return F.struct(
            F.size(toks).alias("dl"),
            *[
                F.size(F.filter(toks, _eq_term(t))).alias(f"tf{i}")
                for i, t in enumerate(terms)
            ],
        )

    bound = F.transform(F.array(tokens(F.col(text_col))), _counts)[0]
    return docs.select(id_col, F.inline(F.array(bound)))


def corpus_stats(
    docs: DataFrame, terms: list[str], *, id_col: str = "doc_id", text_col: str = "text"
) -> dict:
    """One full-scan aggregate → {n, avgdl, df: [per term]}. The result is
    O(|terms|) — safe to collect; reuse it across queries on a static
    corpus (precompute df for the whole vocabulary offline if needed)."""
    tf = _tf_frame(docs, terms, id_col, text_col)
    row = tf.agg(
        F.count("*").alias("n"),
        F.avg("dl").alias("avgdl"),
        *[F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}") for i in range(len(terms))],
    ).first()
    return {
        "n": row["n"],
        "avgdl": float(row["avgdl"] or 0.0),
        "df": [row[f"df{i}"] for i in range(len(terms))],
    }


def bm25_topk(
    docs: DataFrame,
    query: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    stats: dict | None = None,
) -> DataFrame:
    """Top-k docs by BM25 relevance to ``query``. Returns (id, score)
    with score rounded to 4 decimals; ties break by id ascending.

    Reference scope note: gohangout has no search operator — this is part
    of the training-data-pipeline extension surface (corpus exploration /
    targeted subset extraction)."""
    terms = query_terms(query)
    if not terms:
        raise ValueError("query has no tokens")
    tf = _tf_frame(docs, terms, id_col, text_col)
    st = stats or corpus_stats(docs, terms, id_col=id_col, text_col=text_col)
    n, avgdl = float(st["n"]), st["avgdl"]

    import math

    score = F.lit(0.0)
    for i, _t in enumerate(terms):
        idf = math.log(1.0 + (n - st["df"][i] + 0.5) / (st["df"][i] + 0.5))
        tf_i = F.col(f"tf{i}").cast("double")
        denom = tf_i + k1 * (1.0 - b + b * F.col("dl").cast("double") / F.lit(avgdl))
        score = score + F.lit(idf) * tf_i * (k1 + 1.0) / denom
    out = (
        tf.select(id_col, round_half_up(score, 4).alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )
    return out


def tfidf_topk(
    docs: DataFrame,
    query: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    stats: dict | None = None,
) -> DataFrame:
    """Top-k by plain tf-idf cosine-free sum: sum_t tf_norm * idf, with
    tf_norm = tf/dl and idf = ln(N / (1 + df)). Same scan shape as BM25."""
    terms = query_terms(query)
    if not terms:
        raise ValueError("query has no tokens")
    tf = _tf_frame(docs, terms, id_col, text_col)
    st = stats or corpus_stats(docs, terms, id_col=id_col, text_col=text_col)

    import math

    n = float(st["n"])
    score = F.lit(0.0)
    for i, _t in enumerate(terms):
        idf = math.log(n / (1.0 + st["df"][i]))
        tf_norm = F.when(
            F.col("dl") > 0, F.col(f"tf{i}").cast("double") / F.col("dl").cast("double")
        ).otherwise(F.lit(0.0))
        score = score + tf_norm * F.lit(idf)
    return (
        tf.select(id_col, round_half_up(score, 4).alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def inverted_index(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    max_postings: int | None = None,
) -> DataFrame:
    """Build an inverted index: one row per term with document frequency
    and the sorted posting list of doc ids — the batch-build side of the
    search operators (bm25/tfidf score ad-hoc; a materialized index serves
    repeated queries).

    Shape: explode DISTINCT per-doc terms (array_distinct scan-side, so a
    doc contributes each term once), one combiner-reduced groupBy on the
    term, postings collected per term and sorted for determinism. ``min_df``
    drops hapax terms (at web scale most of the vocabulary — the classic
    index-size lever). ``max_postings`` handles stopword-grade terms: a
    first COUNT-ONLY pass (combiner-reduced, O(vocab) rows) finds the hot
    terms, and the postings pass never collects them — their row keeps df
    with a NULL posting list. Collecting a 100M-doc list and then nulling
    it would still have shuffled it; the two-pass shape is the honest cap.
    Write the result bucketed by term for O(1) lookup joins.
    """
    terms = docs.select(
        F.col(id_col).alias("__id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("term"),
    )
    if max_postings is None:
        return (
            terms.groupBy("term")
            .agg(
                F.count(F.lit(1)).alias("df"),
                F.sort_array(F.collect_list("__id")).alias("postings"),
            )
            .where(F.col("df") >= min_df)
        )
    # Deliberately TWO scans, not a shared exchange: forcing both passes
    # under one repartition-by-term would shuffle the raw exploded term
    # rows (O(tokens)) and kill the map-side partial aggregation. As-is,
    # the df pass shuffles combiner-reduced (term, count) partials with a
    # text-only column-pruned scan, and the postings pass shuffles only
    # post-anti-join rows — at 100 TB the extra scan is far cheaper than
    # an uncombined token shuffle. The hot-term exclusion broadcasts (hot
    # terms are few by definition).
    df_pass = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df")).where(
        F.col("df") >= min_df
    )
    # collect postings ONLY for qualified cold terms (min_df <= df <=
    # max_postings): a left_anti against just the hot set would still
    # build-and-discard a posting list for every sub-min_df hapax term —
    # by this docstring's own claim, most of the vocabulary (code-review
    # r4). One semi-join on the qualified-cold set drops both tails before
    # any list is collected.
    cold_terms = df_pass.where(F.col("df") <= max_postings).select("term")
    postings = (
        terms.join(cold_terms, "term", "left_semi")
        .groupBy("term")
        .agg(F.sort_array(F.collect_list("__id")).alias("postings"))
    )
    return df_pass.join(postings, "term", "left").select(
        "term", "df", "postings"
    )
