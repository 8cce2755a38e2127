"""Round 7: BPE tokenizer TRAINING (Sennrich et al. 2016) — the missing
half of the subword story (wordpiece greedy encode existed since r6).

Spark reduces the corpus to the (word, freq) table in one job; the merge
loop is vocabulary-scale driver work (how HF/SentencePiece trainers
consume pre-counted word lists).  Not SQL-expressible (iterative argmax
rewriting), so pytest-gated: the textbook corpus reproduces the known
merge sequence, encode/train round-trip, and the distributed encoder
conserves tokens.
"""

import pytest

import polars_spark as pl
from polars_spark.llm.tokenizer import (
    _bpe_merge_loop,
    bpe_encode_word,
    bpe_tokenize_documents,
    train_bpe,
)


def test_textbook_merge_sequence():
    # Sennrich's canonical example family: 'low'x5 'lower'x2 'newest'x6
    # 'widest'x3 — first merges must be (e,s), (es,t), (est,</w>), (l,o), (lo,w)
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = _bpe_merge_loop(wf, 5)
    assert merges == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
    ]


def test_encode_applies_merges_in_rank_order():
    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = _bpe_merge_loop(wf, 10)
    ranks = {m: i for i, m in enumerate(merges)}
    assert bpe_encode_word("lowest", ranks) == ["low", "est</w>"]
    # unseen characters survive as singletons
    assert bpe_encode_word("lox", ranks)[-1] == "</w>"


def test_train_bpe_on_spark_corpus(spark, pl):
    lf = pl.LazyFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["low low low low low", "lower lower newest newest", "newest newest newest newest widest widest widest"],
        }
    )
    merges = train_bpe(lf.to_spark(), n_merges=5)
    assert merges == [
        ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w"),
    ]


def test_distributed_encode_conserves_and_matches_driver(spark, pl):
    docs = {
        "doc_id": [1, 2],
        "text": ["newest widest lowest", "low lower low"],
    }
    lf = pl.LazyFrame(docs)
    merges = train_bpe(lf.to_spark(), n_merges=8)
    out = {
        r["doc_id"]: r["tokens"]
        for r in bpe_tokenize_documents(lf.to_spark(), merges).collect()
    }
    ranks = {m: i for i, m in enumerate(merges)}
    for i, text in zip(docs["doc_id"], docs["text"]):
        want = [t for w in text.split() for t in bpe_encode_word(w, ranks)]
        assert out[i] == want
    # token conservation: concatenating tokens minus the markers restores text
    for i, text in zip(docs["doc_id"], docs["text"]):
        restored = "".join(out[i]).replace("</w>", " ").strip()
        assert restored == text


def test_min_pair_freq_stops_merging():
    wf = {"ab": 1, "cd": 1}
    assert _bpe_merge_loop(wf, 10, min_pair_freq=2) == []
