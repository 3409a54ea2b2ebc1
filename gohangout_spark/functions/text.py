"""Text-analysis operators for training-data pipelines.

All pure Column expressions (JVM-side, whole-stage codegen) — language ID,
quality scoring, token counting and document fingerprinting run at full scan
speed with zero Python in the hot path. Designed for 100 TB corpora: every
function is a narrow projection over the text column; nothing shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from gohangout_spark.functions.num import round_half_up

# language marker words (tiny deterministic n-gram heuristic; a real system
# would plug fasttext via mapInPandas — the *shape* is identical)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "de", "y"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "that", "for"]


def tokens(col: Column) -> Column:
    """Lowercased word tokens (whitespace/punct split, empties removed)."""
    return F.filter(F.split(F.lower(col), r"[^a-z0-9]+"), lambda t: t != "")


def strip_control_chars(col: Column) -> Column:
    """Remove C0 control characters (except \\t \\n \\r) and DEL — the
    standard first pass over scraped text; a pure codegen projection."""
    return F.regexp_replace(col, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")


# minimal named-entity set for html_to_text, decoded in THIS order —
# '&amp;' strictly last, or '&amp;lt;' would double-decode to '<'
HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_to_text(col: Column) -> Column:
    """Boilerplate HTML → text: drop tags, decode the common entities
    (amp last — order matters), squeeze whitespace, trim. Chained
    regexp_replace/replace — JVM-side, no UDF, replayable verbatim in
    any engine with the same regex dialect (RE2 ⊆ Java here)."""
    out = F.regexp_replace(col, r"<[^>]+>", " ")
    for ent, ch in HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    # explicit class, not \s: Java's \s includes \x0B, RE2's does not —
    # the explicit form is dialect-independent
    return F.trim(F.regexp_replace(out, r"[ \t\n\r\f]+", " "))


# telltale lead characters of utf-8 bytes mis-decoded as latin-1/cp1252:
# every 2-3 byte utf-8 sequence starts 0xC2-0xEF, which latin-1 renders
# in this set. Presence gates the repair attempt (plain text never pays).
MOJIBAKE_MARKERS = "ÃÂâÎÏÐ"


def fix_mojibake(col: Column) -> Column:
    """Repair the classic double-encoding mojibake ('é' shown as 'Ã©'):
    text that is really utf-8 bytes mis-decoded as latin-1/cp1252 is
    re-encoded to those bytes and decoded as utf-8. The repair only
    applies when (a) a marker character is present, (b) the latin-1
    re-encode is possible, and (c) the bytes parse as valid utf-8 —
    otherwise the input passes through untouched, so clean text
    (including clean text CONTAINING 'Ã' legitimately, which fails (c)
    with high probability on real words) is never corrupted. Arrow-path
    pandas UDF (byte-level transcode, no JVM primitive exists)."""
    from pyspark.sql.functions import pandas_udf

    def _fix_one(x):
        if x is None or not any(m in x for m in MOJIBAKE_MARKERS):
            return x
        try:
            return x.encode("latin-1").decode("utf-8")
        except (UnicodeEncodeError, UnicodeDecodeError):
            return x

    def _fix(s):
        return s.map(_fix_one)

    return pandas_udf(_fix, "string")(col)


def nfc_normalize(col: Column) -> Column:
    """Unicode NFC normalization (compose combining sequences) — the
    canonical-form pass a multilingual corpus needs before hashing or
    dedup (decomposed 'e'+U+0301 and composed U+00E9 must collide).
    Spark has no built-in normalizer, so this is the one text op on the
    Arrow path: a pandas UDF over stdlib unicodedata, vectorized per
    batch. Oracle twin: DuckDB's native nfc_normalize."""
    from pyspark.sql.functions import pandas_udf

    def _nfc(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    # no type hints: `from __future__ import annotations` stringifies
    # them and pandas_udf rejects the unresolvable 'pd.Series' signature
    return pandas_udf(_nfc, "string")(col)


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def marker_score(col: Column, markers: list[str]) -> Column:
    """Count of marker-word occurrences (word-boundary regex, one pass/lang)."""
    pattern = r"\b(" + "|".join(markers) + r")\b"
    return F.regexp_count(F.lower(col), F.lit(pattern))


def language_id(col: Column, langs: dict[str, list[str]] | None = None) -> Column:
    """Argmax marker-count language; ties break by language-code order;
    no markers at all → 'unknown'."""
    langs = langs or LANG_MARKERS
    scored = [(lang, marker_score(col, m)) for lang, m in sorted(langs.items())]
    best_score = F.greatest(*[s for _, s in scored]) if len(scored) > 1 else scored[0][1]
    expr = F.lit("unknown")
    for lang, score in reversed(scored):
        expr = F.when((score == best_score) & (best_score > 0), F.lit(lang)).otherwise(expr)
    return expr


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    p = F.length(F.regexp_replace(col, r"[^\.,;:!\?'\"]", ""))
    return F.when(n > 0, p.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def stopword_ratio(
    col: Column,
    stopwords: list[str] | None = None,
    *,
    toks: Column | None = None,
) -> Column:
    """``toks`` lets a caller that already bound the token array (the
    zipped_shingles trick) reuse it instead of re-running the tokenizer —
    quality_score composes this way so the stopword semantics live in
    exactly one place."""
    sw = stopwords or STOPWORDS
    if toks is None:
        toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    total = F.size(toks)
    return F.when(total > 0, hits.cast("double") / total.cast("double")).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    reasonable stopword density (the classic C4/Gopher-style filters).
    The token array is bound once per row (dedup.zipped_shingles trick):
    composing token_count + stopword_ratio directly would run the
    tokenizer three times per row — CodegenFallback HOFs get no
    projection-level subexpression elimination (measured 0.61 → 0.52 s
    on the sf0.1 quality projection)."""

    def _score(toks):
        n_tok = F.size(toks).cast("double")
        len_score = F.least(n_tok / F.lit(20.0), F.lit(1.0))
        punct_pen = F.least(punct_ratio(col) * 5.0, F.lit(1.0))
        sw = stopword_ratio(col, toks=toks)
        sw_score = F.when(sw > 0.05, F.lit(1.0)).otherwise(sw * 20.0)
        return round_half_up(
            (len_score * 0.5 + (1.0 - punct_pen) * 0.25 + sw_score * 0.25), 4
        )

    return F.transform(F.array(tokens(col)), _score)[0]


def fingerprint(col: Column) -> Column:
    """OpenRefine-style key collision fingerprint: md5 of the sorted distinct
    token set — canonicalizes word order + duplication for dedup."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col))))
    return F.md5(canon)


def rolling_hash_fingerprint(col: Column, window: int = 8, keep_every: int = 4) -> Column:
    """Winnowing-ish shingle fingerprint: hash every ``window``-token shingle,
    keep hashes ≡ 0 (mod keep_every) → compact doc sketch (array<bigint>).
    Zipped shifted slices keep the tokenizer out of the per-element lambda
    (see dedup.shingle_hashes)."""
    from gohangout_spark.functions.dedup import zipped_shingles

    zipped = zipped_shingles(tokens(col), window)
    hashes = F.transform(
        zipped, lambda s: F.xxhash64(*[s.getField(f"t{k}") for k in range(window)])
    )
    return F.array_sort(F.array_distinct(F.filter(hashes, lambda h: h % keep_every == 0)))


# GPT-2-style pretokenizer pattern, lowercase-simplified so it runs
# unchanged in Java regex (Spark) and RE2 (DuckDB oracle): contraction
# suffixes, space-prefixed letter runs, space-prefixed digit runs,
# punctuation runs. (The real GPT-2 pattern adds \p{L}/\p{N} classes and a
# trailing-space lookahead; neither changes the COUNT shape this feeds.)
BPE_PRETOKEN_RE = r"'(?:[sdmt]|ll|ve|re)| ?[a-z]+| ?[0-9]+| ?[^\sa-z0-9']+"


def bpe_token_count(col: Column) -> Column:
    """Subword-ish token count: the number of GPT-2-style pretokens of the
    lowercased text. Tracks BPE token counts far better than whitespace
    counts (contractions and punctuation split out, digits separate) —
    the budget signal sequence packing and token-budget sampling actually
    need. One regexp_extract_all per row, pure codegen."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(BPE_PRETOKEN_RE), F.lit(0)))


def chunk_documents(
    docs,
    *,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Split documents into overlapping fixed-token chunks (the RAG /
    long-context preprocessing primitive): chunk k starts at token
    1 + k·(chunk_tokens − overlap); generation stops once the remaining
    tail is covered (starts run to len − overlap), so the last chunk may
    be short but no chunk is redundant. Returns one row per chunk:
    (id, chunk_idx 0-based, chunk_text, n_chunk_tokens).

    Scan-side starts + slices via HOFs; only CHUNKS explode (the
    ~len/step row multiplier any chunker pays), never per-token rows.
    Empty/NULL docs produce zero chunks (filter-join back if you need
    them retained, as chunk_dedup_stats does).
    """
    from pyspark.sql import functions as F

    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    # tokenize into a REAL projection column first: referencing the
    # tokenizer expression inside the transform lambda would re-run it
    # per chunk (the zipped_shingles pitfall); a bound column is read,
    # not re-evaluated
    base = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    n = F.size(toks)
    starts = F.when(
        n > 0,
        F.sequence(F.lit(1), F.greatest(n - overlap, F.lit(1)), F.lit(step)),
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.concat_ws(" ", F.slice(toks, s, chunk_tokens)).alias("chunk_text"),
            F.least(n - s + 1, F.lit(chunk_tokens)).cast("int").alias("n_chunk_tokens"),
        ),
    )
    out = base.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "c")
    )
    return out.select(
        id_col,
        "chunk_idx",
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_chunk_tokens").alias("n_chunk_tokens"),
    )


def flesch_reading_ease(col: Column) -> Column:
    """Flesch reading-ease score from two portable heuristics: sentences =
    runs of [.!?] (min 1), syllables = vowel-group runs [aeiouy]+ per word
    (min 1/word). 206.835 − 1.015·(words/sentences) − 84.6·(syllables/
    words); NULL for empty text. regexp_count keeps both counts codegen'd
    scan-side, and the same regexes run verbatim in a SQL oracle."""
    n_words = token_count(col).cast("double")
    n_sent = F.greatest(
        F.regexp_count(col, F.lit(r"[.!?]+")), F.lit(1)
    ).cast("double")
    raw_syl = F.regexp_count(F.lower(col), F.lit(r"[aeiouy]+")).cast("double")
    n_syl = F.greatest(raw_syl, n_words)  # every word has >= 1 syllable
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words / n_sent)
        - F.lit(84.6) * (n_syl / n_words)
    )
    return F.when(n_words > 0, round_half_up(score, 2))


def charset_profile(col: Column) -> list[Column]:
    """Character-class composition of a document — the script/charset
    signal multilingual curation pipelines gate on before language-ID
    (a doc that is 40% digits or 30% punctuation is telemetry, not
    prose). Five disjoint ASCII-safe classes counted scan-side as
    ``length(text) - length(regexp_replace(text, class, ''))`` so every
    count is an exact integer and the same regexes run verbatim in a SQL
    oracle (the ``charset_entropy_profile`` gate). Returns the five
    columns [n_lower, n_upper, n_digit, n_space, n_other] — n_other is
    everything else including non-ASCII, so the five sum to length."""

    def cnt(cls: str) -> Column:
        return (
            F.length(col) - F.length(F.regexp_replace(col, cls, ""))
        ).cast("long")

    n_lower, n_upper = cnt("[a-z]"), cnt("[A-Z]")
    n_digit, n_space = cnt("[0-9]"), cnt(r"[ \t\n\r]")
    n_other = (
        F.length(col).cast("long") - n_lower - n_upper - n_digit - n_space
    )
    return [
        n_lower.alias("n_lower"),
        n_upper.alias("n_upper"),
        n_digit.alias("n_digit"),
        n_space.alias("n_space"),
        n_other.alias("n_other"),
    ]


def char_entropy(col: Column) -> Column:
    """Shannon entropy (bits/char) of the document's character
    distribution — the compressibility proxy curation pipelines use to
    drop degenerate text (repeated-char spam scores near 0, natural
    English ~4.1, uniform noise higher). Computed entirely in JVM
    higher-order functions — split to chars, per-distinct-char counts
    via ``filter``/``size``, then ``aggregate`` sums −p·log2(p) — so the
    hot path is one codegen'd scan with NO shuffle and no Python.
    Rounded half-up to 4 decimals (house float-gate convention,
    flesch_reading_ease) so the log2 seam is engine-portable. NULL for
    empty/NULL text."""
    from gohangout_spark.functions.num import round_half_up

    # drop the empty-string element some Spark versions append to a
    # per-char split — the oracle's generate_series walk sees exactly
    # length(text) chars, and a stray "" would add a 0*log(0)=NaN term
    chars = F.filter(F.split(col, ""), lambda x: x != F.lit(""))
    n = F.size(chars).cast("double")

    # single pass over the SORTED chars with run-length state — O(n log n)
    # instead of the O(distinct·n) per-distinct-char filters of the first
    # two cuts (11.3 s -> 9.0 s -> this; the distinct-filter variant cost
    # ~70 full array scans per document). State: (previous char, current
    # run length, accumulated Σ p·log2 p of CLOSED runs); finish folds the
    # final open run. The run>0 guard keeps the empty initial state from
    # contributing a 0·log2(0) NaN.
    def term(run):
        p = run.cast("double") / n
        return p * F.log2(p)

    def step(st, c):
        closing = st.getField("run") > 0
        same = c == st.getField("prev")
        return F.struct(
            c.alias("prev"),
            F.when(same, st.getField("run") + 1).otherwise(F.lit(1)).alias("run"),
            F.when(same | ~closing, st.getField("acc"))
            .otherwise(st.getField("acc") + term(st.getField("run")))
            .alias("acc"),
        )

    ent = F.aggregate(
        F.array_sort(chars),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).cast("long").alias("run"),
            F.lit(0.0).alias("acc"),
        ),
        step,
        lambda st: -(
            st.getField("acc")
            + F.when(st.getField("run") > 0, term(st.getField("run"))).otherwise(
                F.lit(0.0)
            )
        ),
    )
    return F.when(F.length(col) > 0, round_half_up(ent, 4))


def char_entropy_pandas(col: Column) -> Column:
    """Arrow-batched numpy variant of :func:`char_entropy` — same math,
    same 4-decimal half-up rounding, ~5× faster at 100× corpus scale
    (measured: the pure-JVM HOF spends its time materializing a
    per-codepoint string array per row — 38.7 s for 500k docs vs the
    vectorized unique/bincount path; the same trade perplexity_pandas
    documents for char-level work). Decodes to UTF-32 so a "char" is a
    code point, matching the SQL oracle's substring walk."""
    import math

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    def one(t):
        if not isinstance(t, str) or not t:
            return None
        arr = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        _, cnt = np.unique(arr, return_counts=True)
        p = cnt / cnt.sum()
        e = float(-(p * np.log2(p)).sum())
        return math.floor(e * 1e4 + 0.5) / 1e4

    # no type hints: `from __future__ import annotations` stringifies
    # them and pandas_udf rejects the unresolvable signature (the
    # nfc_normalize pattern)
    def _ent(s):
        return s.map(one)

    return pandas_udf(_ent, "double")(col)
