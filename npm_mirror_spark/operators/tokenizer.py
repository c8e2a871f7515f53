"""Learned BPE tokenizer — distributed training, map-side encoding.

The spec's token-counting ask is covered by the regex pre-tokenizer
(text.py::bpe_ish_tokens); this module adds the real thing: byte-pair
encoding LEARNED from the corpus (Sennrich et al. 2016), the tokenizer
family behind every modern LM vocabulary.

Scale design — why this is the canonical cluster shape (it is how
production tokenizer trainers actually work, e.g. HuggingFace
tokenizers' trainer consuming word counts):

1. ONE distributed pass reduces the corpus to the WORD-TYPE table
   (word, count) — a single (word) shuffle of integer counts.  Word
   types grow ~ O(corpus^0.5..0.7) (Heaps' law): a 100 TB corpus has
   ~10^7-10^8 types, and a ``max_word_types`` cap by count (standard
   practice) bounds the table regardless.
2. The merge loop runs DRIVER-SIDE on that bounded table.  Each round
   re-counts adjacent symbol pairs weighted by word count and merges
   the argmax pair — O(types x word_len) per round on data that fits in
   MBs.  Distributing this loop would shuffle per round for no reason;
   the whole point of step 1 is that the loop input is corpus-size
   independent.
3. Encoding is MAP-SIDE: the merge list (a few 10k pairs) broadcasts by
   closure into an Arrow kernel that segments each batch, memoizing
   per-word segmentations (Zipf: a batch re-uses few thousand types).

Everything is exact integer counting with lexicographic tie-breaks, so
training is bit-deterministic — but a merge LOOP is not expressible in
one SQL query, so the registered query is rows-only (like q_lm_nll);
tests pin the classic Sennrich worked example, determinism, and the
decode round-trip.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from npm_mirror_spark.operators.dedup import normalize_text

END = "</w>"  # end-of-word marker (Sennrich): makes merges word-internal


def word_type_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the whole corpus — one explode + one shuffle."""
    return (
        df.select(F.explode(F.split(normalize_text(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    pairs: Counter = Counter()
    for syms, n in vocab.items():
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += n
    return pairs


def _merge_word(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    out = []
    i = 0
    merged = pair[0] + pair[1]
    while i < len(syms):
        if i + 1 < len(syms) and (syms[i], syms[i + 1]) == pair:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    max_word_types: int = 1_000_000,
    min_count: int | None = None,
) -> dict:
    """Learn ``n_merges`` BPE merges from the corpus.

    Ties break to the lexicographically smallest pair (exact integer
    counts -> bit-deterministic merge sequence).  Returns
    {"merges": [(a, b), ...], "vocab_size": int, "n_word_types": int}.

    Vocabulary bounding — two faces, different biases:
    ``max_word_types`` truncates by count RANK (top-N), which silently
    biases merges when the cut lands inside a count plateau: of equal-
    count words, only the lexicographically smaller survive, and their
    pair statistics shift accordingly.  ``min_count`` cuts by a count
    THRESHOLD (the standard practice: drop hapax/rare types), which is
    plateau-stable — every word of a kept count is kept, so the
    surviving pair statistics are exactly the full-corpus statistics
    restricted to words with n >= min_count.  The truncation bias is
    bounded by the plateau mass at the cut count (see
    tests/test_tokenizer.py::test_min_count_vs_rank_truncation_bias).
    Both compose: threshold first, rank cap as the hard memory bound.
    """
    wc = word_type_counts(df, text_col)
    if min_count is not None:
        wc = wc.where(F.col("n") >= int(min_count))
    rows = (
        wc.orderBy(F.desc("n"), F.asc("word"))
        .limit(max_word_types)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["word"]) + (END,): r["n"] for r in rows
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = _pair_counts(vocab)
        if not pairs:
            break
        maxc = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == maxc)
        # (max count; ties -> lexicographically smallest pair)
        merges.append(best)
        vocab = {_merge_word(s, best): n for s, n in vocab.items()}
    symbols = {s for w in vocab for s in w}
    return {
        "merges": merges,
        "vocab_size": len(symbols),
        "n_word_types": len(rows),
    }


def bpe_segment(
    word: str,
    merges: list[tuple[str, str]],
    ranks: dict[tuple[str, str], int] | None = None,
) -> list[str]:
    """Apply the learned merges to one word, lowest training rank first.

    Pass a precomputed ``ranks`` ({pair: index}) when segmenting many
    words: rebuilding the dict per word costs O(|merges|) each — with
    ~10k merges and ~100k word types per batch that is ~10^9 wasted
    dict inserts (encode_bpe builds it once per kernel)."""
    syms: tuple[str, ...] = tuple(word) + (END,)
    if ranks is None:
        ranks = {p: i for i, p in enumerate(merges)}
    while len(syms) > 1:
        ranked = [
            (ranks[p], p)
            for p in zip(syms, syms[1:])
            if p in ranks
        ]
        if not ranked:
            break
        syms = _merge_word(syms, min(ranked)[1])
    return list(syms)


def encode_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens array<string>, n_tokens) — Arrow kernel, merges by
    closure, per-word segmentation memoized across the batch."""
    schema = f"{id_col} long, tokens array<string>, n_tokens int"

    def kernel(batches):
        import pandas as pd

        cache: dict[str, list[str]] = {}
        ranks = {p: i for i, p in enumerate(merges)}  # once per kernel

        def seg(word: str) -> list[str]:
            got = cache.get(word)
            if got is None:
                got = cache[word] = bpe_segment(word, merges, ranks)
            return got

        import re

        for pdf in batches:
            out_id, out_tok, out_n = [], [], []
            for i, t in zip(pdf[id_col], pdf[text_col]):
                toks: list[str] = []
                # NULL text: the trainer (word_type_counts) drops these
                # docs entirely, so encode must too — str(None) would
                # tokenize the literal word 'none', a phantom token the
                # training vocabulary never saw (advice finding)
                if t is None or (isinstance(t, float) and t != t):
                    out_id.append(i)
                    out_tok.append(toks)
                    out_n.append(0)
                    continue
                # same normalization as word_type_counts (dedup.normalize_text
                # = JVM lower + regexp_replace('\\s+')): Java \s is the ASCII
                # class [ \t\n\x0B\f\r], Python's is unicode-aware — using
                # Python \s here would split NBSP-joined words the trainer
                # counted as ONE type, desyncing encode from the vocabulary
                for w in (
                    re.sub(r"[ \t\n\x0b\f\r]+", " ", str(t).lower())
                    .strip(" \t\n\x0b\f\r")
                    .split(" ")
                ):
                    if w:
                        toks.extend(seg(w))
                out_id.append(i)
                out_tok.append(toks)
                out_n.append(len(toks))
            yield pd.DataFrame(
                {id_col: out_id, "tokens": out_tok, "n_tokens": out_n}
            )

    return df.select(id_col, text_col).mapInPandas(kernel, schema)
