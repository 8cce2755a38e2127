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

__all__ = ["tokenize_documents", "greedy_tokenize"]


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
