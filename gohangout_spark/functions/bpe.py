"""Byte-pair-encoding tokenizer: trained in-engine, applied scan-side.

The Sennrich et al. 2016 (arXiv:1508.07909) algorithm factors cleanly for
a 100 TB corpus:

- the DISTRIBUTED part is the corpus reduction: one scan → word-frequency
  table (explode + combiner-reduced groupBy). The table is bounded by the
  VOCABULARY, not the corpus — this is the only pass that touches all the
  data.
- the merge loop runs driver-side over that counted vocabulary (exactly
  how production BPE trainers work — they too operate on word counts, not
  raw text). Each iteration is O(distinct words); ties break
  deterministically (count desc, pair lexicographic) so the same corpus
  always yields the same merge table.
- encoding ships the merge-rank dict to an Arrow-batched pandas UDF
  (greedy lowest-rank-first merging, the standard implementation). A
  pure-expression encode would need ~n_merges chained interpreted HOF
  aggregates per row — the interpreted-lambda cliff documented in
  docs/SCALE.md — so the Arrow path is the only sensible one.

``</w>`` marks word ends (merges never cross word boundaries).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gohangout_spark.functions.text import tokens

END = "</w>"

__all__ = [
    "word_counts",
    "train_bpe",
    "bpe_merges_from_counts",
    "bpe_encode_udf",
    "learned_token_count",
    "unigram_segment_word",
    "unigram_encode_stats",
    "wordpiece_segment_word",
    "wordpiece_encode_stats",
]


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one full-corpus pass: (word, n) counts, combiner-reduced."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_merges_from_counts(counts: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Driver-side merge loop over a counted vocabulary (pure function —
    unit-testable without Spark). Greedy: repeatedly merge the most
    frequent adjacent symbol pair; ties by (count desc, pair asc)."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, n in counts:
        syms = tuple(list(word[:-1]) + [word[-1] + END]) if word else ()
        if syms:
            vocab[syms] = vocab.get(syms, 0) + n

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        merged = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + n
        vocab = new_vocab
    return merges


def train_bpe(
    docs: DataFrame,
    *,
    n_merges: int = 50,
    text_col: str = "text",
    max_vocab: int = 1_000_000,
) -> list[tuple[str, str]]:
    """One distributed word-count scan + the driver merge loop. The collect
    is bounded BY CONTRACT at ``max_vocab`` distinct words (VERDICT r3 #5:
    at 100 TB the distinct-word table is billions of rows — the cap is
    enforced here, not delegated to the caller). The cap keeps the most
    frequent words, ties broken by word for determinism, planned as
    TakeOrderedAndProject (a per-partition top-k + driver merge, never a
    full sort or unbounded collect). Rare-word tails carry negligible pair
    mass, so early merges — the ones a finite ``n_merges`` produces — are
    unaffected on natural corpora; raise ``max_vocab`` if the tail matters.
    ``max_vocab=None`` restores the uncapped collect for small corpora."""
    wc = word_counts(docs, text_col)
    if max_vocab is not None:
        wc = wc.orderBy(F.desc("n"), F.asc("word")).limit(int(max_vocab))
    counts = [(r["word"], r["n"]) for r in wc.collect()]
    return bpe_merges_from_counts(counts, n_merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    syms = list(word[:-1]) + [word[-1] + END] if word else []
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode_udf(merges: list[tuple[str, str]]):
    """Column function: text → array<string> of BPE tokens under the
    learned merge table (lowest-rank-first greedy, the standard order —
    training applies merges in discovery order, which this reproduces:
    an earlier merge always outranks a later one). Arrow-batched; the
    merge-rank dict broadcasts with the serialized UDF."""
    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    # explicit SCALAR type: postponed annotations stringify inferred hints
    @pandas_udf("array<string>", PandasUDFType.SCALAR)
    def _enc(text):
        import re

        out = []
        for t in text:
            if t is None:
                out.append(None)
                continue
            toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
            enc: list[str] = []
            for w in toks:
                enc.extend(_encode_word(w, ranks))
            out.append(enc)
        return pd.Series(out)

    return _enc


def learned_token_count(col: Column, merges: list[tuple[str, str]]) -> Column:
    """Learned-vocabulary token count — the budget signal packing and
    token-budget sampling want once a real tokenizer exists. (Named to
    avoid shadowing text.bpe_token_count, the one-arg regex
    approximation.)"""
    return F.size(bpe_encode_udf(merges)(col))


# --------------------------------------------------------------------------
# Unigram-LM (SentencePiece-style) Viterbi segmentation with a frozen model
# --------------------------------------------------------------------------

#: Frozen demo unigram model: (piece, integer cost ~ -log p). Lower cost =
#: more probable. Single chars (cost 50) guarantee every [a-z0-9]+ word is
#: segmentable; multi-char pieces are cheaper than their char sum so the
#: Viterbi search has real work to do. Pieces are capped at 4 chars to
#: bound the oracle's path enumeration. Integer costs make the DP exact —
#: no float ties — and the (cost, path) tuple order makes the argmin
#: segmentation unique and engine-independent.
UNIGRAM_DEMO_VOCAB: list[tuple[str, int]] = [
    ("the", 40), ("ing", 45), ("tion", 55), ("ment", 58), ("doc", 52),
    ("er", 38), ("an", 36), ("re", 37), ("at", 36), ("en", 37),
    ("ed", 38), ("es", 39), ("on", 37), ("in", 35), ("qu", 39),
    ("ify", 54), ("ic", 38), ("or", 37), ("al", 37), ("ti", 41),
] + [(c, 50) for c in "abcdefghijklmnopqrstuvwxyz0123456789"]


def unigram_segment_word(
    word: str, costs: dict[str, int], max_piece_len: int
) -> tuple[str, int] | None:
    """Viterbi min-cost segmentation of one word under a frozen unigram
    model (SentencePiece inference with -log p as integer cost). Ties are
    broken by lexicographic piece-stream order — ``min((cost, path))`` —
    which is a valid DP objective: equal-position candidates have
    identical consumed chars, so their path strings never stand in a
    prefix relation and tuple order is preserved under common suffixes.
    Returns (space-joined pieces, total cost), or None if the word has a
    char outside the model (impossible with single-char coverage)."""
    best: list[tuple[int, str] | None] = [None] * (len(word) + 1)
    best[0] = (0, "")
    for i in range(1, len(word) + 1):
        cand = None
        for length in range(1, min(max_piece_len, i) + 1):
            prev = best[i - length]
            if prev is None:
                continue
            c = costs.get(word[i - length : i])
            if c is None:
                continue
            pc, pp = prev
            t = (pc + c, pp + " " + word[i - length : i] if pp else word[i - length : i])
            if cand is None or t < cand:
                cand = t
        best[i] = cand
    if best[len(word)] is None:
        return None
    cost, path = best[len(word)]
    return path, cost


def unigram_encode_stats(
    docs: DataFrame,
    vocab: list[tuple[str, int]] | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc unigram-LM tokenization stats: ``n_pieces``, ``total_cost``
    and ``pieces_hash`` (md5 of the space-joined piece stream in token
    order — pinning the actual SEGMENTATION, not just its cost). The
    frozen model ships inside the Arrow UDF; segmentations are memoized
    per batch (corpora repeat words — the DP runs once per distinct word
    per batch). Scale shape: embarrassingly doc-parallel mapInPandas,
    the same seam every tokenizer in this module uses; the
    ``unigram_encode_fixed`` gate replays the whole Viterbi search in a
    recursive-CTE DuckDB oracle (path enumeration + (cost, path) argmin)
    and hash-matches stream md5s."""
    import hashlib
    import re

    import pandas as pd

    vocab = UNIGRAM_DEMO_VOCAB if vocab is None else vocab
    costs = dict(vocab)
    if len(costs) != len(vocab):
        raise ValueError("duplicate pieces in vocab")
    max_len = max(len(p) for p in costs)

    def stats(batches):
        memo: dict[str, tuple[str, int]] = {}
        for pdf in batches:
            out = []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                toks = [w for w in re.split(r"[^a-z0-9]+", (t or "").lower()) if w]
                parts, cost_sum = [], 0
                for w in toks:
                    seg = memo.get(w)
                    if seg is None:
                        seg = unigram_segment_word(w, costs, max_len)
                        if seg is None:
                            raise ValueError(f"unsegmentable word {w!r}")
                        memo[w] = seg
                    parts.append(seg[0])
                    cost_sum += seg[1]
                stream = " ".join(parts)
                out.append(
                    (
                        int(did),
                        sum(len(p.split(" ")) for p in parts),
                        cost_sum,
                        hashlib.md5(stream.encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out, columns=[id_col, "n_pieces", "total_cost", "pieces_hash"]
            )

    return docs.select(id_col, text_col).mapInPandas(
        stats, f"{id_col} long, n_pieces long, total_cost long, pieces_hash string"
    )


# --------------------------------------------------------------------------
# WordPiece (BERT-style) greedy longest-match-first segmentation
# --------------------------------------------------------------------------

UNK = "[UNK]"

#: Frozen demo WordPiece vocabulary (the BERT tokenizer's inference
#: algorithm — Devlin et al. 2019, arXiv:1810.04805 — is greedy
#: longest-match-first, NOT a search like unigram, so a frozen vocab fully
#: determines every segmentation). Pieces starting ``##`` only match at
#: word-interior positions; all others only at position 0. Content is
#: capped at 4 chars (bounds the oracle's substring probes). Single-char
#: initial pieces cover every [a-z0-9]; single-char CONTINUATIONS
#: deliberately omit ``##q`` and ``##x`` so words with an interior q/x
#: exercise the third leg of the algorithm — the whole-word ``[UNK]``
#: fallback (BERT emits one [UNK] for the entire word when matching dead-
#: ends, it does not backtrack). Multi-char pieces make longest-match
#: matter: e.g. ``##er`` must beat ``##e``, ``quer`` must beat ``q``.
WORDPIECE_DEMO_VOCAB: list[str] = (
    ["the", "fast", "key", "sort", "tab", "scan", "mer", "part", "win",
     "hash", "join", "bat", "dup", "gro", "quer", "row", "data", "slow",
     "fil", "cust", "val", "agg", "col", "big", "vec", "ord", "sma",
     "str", "spa", "line"]
    + list("abcdefghijklmnopqrstuvwxyz0123456789")
    + ["##er", "##ge", "##le", "##ch", "##dow", "##eam", "##ue", "##ry",
       "##ter", "##tor", "##umn", "##ing", "##ll", "##rk", "##up"]
    + ["##" + c for c in "abcdefghijklmnoprstuvwyz0123456789"]  # no q, x
)


def _wordpiece_tables(vocab: list[str]) -> tuple[dict[str, str], dict[str, str], int]:
    """(initial content→form, continuation content→form, max content len).
    Rejects duplicate content within a position class — the greedy argmax
    must be unique for the oracle's anti-join replay to be well-defined."""
    init: dict[str, str] = {}
    cont: dict[str, str] = {}
    for form in vocab:
        if form.startswith("##"):
            txt, table = form[2:], cont
        else:
            txt, table = form, init
        if not txt:
            raise ValueError(f"empty piece content in {form!r}")
        if txt in table:
            raise ValueError(f"duplicate piece content {form!r}")
        table[txt] = form
    return init, cont, max(len(t) for t in (*init, *cont))


def wordpiece_segment_word(
    word: str, init: dict[str, str], cont: dict[str, str], max_len: int
) -> list[str]:
    """Greedy longest-match-first WordPiece segmentation of one word (pure
    function — unit-testable without Spark). At each position the longest
    vocab piece of the correct position class wins; a position with no
    match collapses the WHOLE word to a single ``[UNK]`` (no backtracking
    — BERT's exact behavior)."""
    pieces: list[str] = []
    pos = 0
    while pos < len(word):
        table = init if pos == 0 else cont
        for length in range(min(max_len, len(word) - pos), 0, -1):
            form = table.get(word[pos : pos + length])
            if form is not None:
                pieces.append(form)
                pos += length
                break
        else:
            return [UNK]
    return pieces


def wordpiece_encode_stats(
    docs: DataFrame,
    vocab: list[str] | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc WordPiece tokenization stats under a frozen vocabulary:
    ``n_pieces`` (an [UNK] word contributes 1), ``n_unk`` (words that
    collapsed to [UNK]) and ``pieces_hash`` (md5 of the space-joined piece
    stream in token order — pinning the actual segmentation). Same scale
    seam as every tokenizer here: embarrassingly doc-parallel
    mapInPandas, frozen tables ship with the UDF, segmentations memoized
    per batch so the greedy walk runs once per distinct word per batch.
    The ``wordpiece_encode_fixed`` gate replays the greedy walk in a
    recursive-CTE DuckDB oracle (longest-match enforced by an anti-join
    on any longer matching piece; dead-ended words LEFT-JOIN to [UNK])
    and hash-matches the per-doc streams. Completes the tokenizer
    family: BPE (merge ranks), unigram (Viterbi global optimum),
    WordPiece (greedy longest prefix) — the three algorithms production
    LLM tokenizers actually use."""
    import hashlib
    import re

    import pandas as pd

    init, cont, max_len = _wordpiece_tables(
        WORDPIECE_DEMO_VOCAB if vocab is None else vocab
    )

    def stats(batches):
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                toks = [w for w in re.split(r"[^a-z0-9]+", (t or "").lower()) if w]
                parts: list[list[str]] = []
                for w in toks:
                    seg = memo.get(w)
                    if seg is None:
                        seg = wordpiece_segment_word(w, init, cont, max_len)
                        memo[w] = seg
                    parts.append(seg)
                stream = " ".join(" ".join(p) for p in parts)
                out.append(
                    (
                        int(did),
                        sum(len(p) for p in parts),
                        sum(1 for p in parts if p == [UNK]),
                        hashlib.md5(stream.encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out, columns=[id_col, "n_pieces", "n_unk", "pieces_hash"]
            )

    return docs.select(id_col, text_col).mapInPandas(
        stats, f"{id_col} long, n_pieces long, n_unk long, pieces_hash string"
    )
