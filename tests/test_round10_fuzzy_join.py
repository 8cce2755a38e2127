"""Round-10: fuzzy_string_pairs — PassJoin blocking recall guarantee.

The blocking must find EVERY pair within the distance budget (pigeonhole:
one of k+1 segments survives any k-edit script and appears within +-k of
its source position).  Fuzzed against brute-force Levenshtein over random
words with planted typos (substitutions, insertions, deletions, swaps) at
k=1 and k=2, plus the length/empty edge shapes.
"""

from __future__ import annotations

import random

import pytest


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _typo(rng: random.Random, w: str) -> str:
    if not w:
        return "x"
    op = rng.randrange(3)
    i = rng.randrange(len(w))
    c = rng.choice("abcdefgh")
    if op == 0:
        return w[:i] + c + w[i + 1 :]  # substitute
    if op == 1:
        return w[:i] + c + w[i:]  # insert
    return w[:i] + w[i + 1 :]  # delete


@pytest.mark.parametrize("k", [1, 2])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_recall_matches_bruteforce(spark, k, seed):
    from polars_spark.llm import fuzzy_string_pairs

    rng = random.Random(5000 + 97 * seed + k)
    base = [
        "".join(rng.choice("abcdefghij") for _ in range(rng.randrange(1, 12)))
        for _ in range(40)
    ]
    words = set(base)
    for w in base[:20]:  # plant typo chains (distance 1..2 from base)
        t = _typo(rng, w)
        words.add(t)
        words.add(_typo(rng, t))
    words = sorted(words)

    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {
        (r.w, r.w_right, r.edit_distance)
        for r in fuzzy_string_pairs(df, left_on="w", max_distance=k).collect()
    }
    want = {
        (a, b, _lev(a, b))
        for i, a in enumerate(words)
        for b in words[i + 1 :]
        if _lev(a, b) <= k
    }
    assert got == want, (
        f"k={k} seed={seed}: missing={sorted(want - got)[:5]} "
        f"extra={sorted(got - want)[:5]}"
    )


def test_two_frame_mode_and_nulls(spark):
    from polars_spark.llm import fuzzy_string_pairs

    l = spark.createDataFrame([("cat",), ("dog",), (None,)], "a string")
    r = spark.createDataFrame([("cut",), ("dig",), ("horse",), (None,)], "b string")
    got = {
        (x.a, x.b, x.edit_distance)
        for x in fuzzy_string_pairs(l, r, left_on="a", right_on="b", max_distance=1).collect()
    }
    assert got == {("cat", "cut", 1), ("dog", "dig", 1)}


def test_distance_zero_is_exact_join(spark):
    from polars_spark.llm import fuzzy_string_pairs

    l = spark.createDataFrame([("aa",), ("bb",)], "a string")
    r = spark.createDataFrame([("aa",), ("ab",)], "b string")
    got = {
        (x.a, x.b)
        for x in fuzzy_string_pairs(l, r, left_on="a", right_on="b", max_distance=0).collect()
    }
    assert got == {("aa", "aa")}


def test_empty_string_participates(spark):
    from polars_spark.llm import fuzzy_string_pairs

    df = spark.createDataFrame([("",), ("a",), ("ab",)], "w string")
    got = {
        (r.w, r.w_right, r.edit_distance)
        for r in fuzzy_string_pairs(df, left_on="w", max_distance=1).collect()
    }
    assert got == {("", "a", 1), ("a", "ab", 1)}


def test_hot_block_skew_zero_padded_ids(spark):
    """Round-11 skew guard: zero-padded sequential ids share every
    contiguous low-entropy region ('Customer#', leading zeros) — the
    single-level PassJoin block is the whole corpus.  With the hot-block
    deletion-variant route the answer must stay EXACT (brute-force
    oracle) and the candidate join must not go quadratic (tiny cap
    forces the hot route even at test size)."""
    from polars_spark.llm import fuzzy_string_pairs

    n = 400
    names = [f"Customer#{i:09d}" for i in range(1, n + 1)]
    df = spark.createDataFrame([(s,) for s in names], "c_name string")
    got = fuzzy_string_pairs(
        df, left_on="c_name", max_distance=1, hot_pair_cap=64
    ).collect()
    got_pairs = {(r[0], r[1]) for r in got}

    # brute-force oracle over the same names
    def lev1(a: str, b: str) -> bool:
        if a == b:
            return False
        diff = sum(1 for x, y in zip(a, b) if x != y)
        return diff <= 1  # same length here, so distance == hamming

    want = {
        (a, b) for ai, a in enumerate(names) for b in names[ai + 1 :] if lev1(a, b)
    }
    assert got_pairs == want
    assert all(r.edit_distance == 1 for r in got)


def test_hot_block_long_strings_reversed_route(spark):
    """Complements longer than the deletion bound take the reversed-
    contiguous route; shared-prefix long strings must still verify
    exactly."""
    from polars_spark.llm import fuzzy_string_pairs

    prefix = "http://example.com/a/very/long/shared/prefix/path/" + "x" * 30
    names = [prefix + f"{i:04d}" for i in range(120)]
    df = spark.createDataFrame([(s,) for s in names], "u string")
    got = fuzzy_string_pairs(df, left_on="u", max_distance=1, hot_pair_cap=64)
    got_pairs = {(r[0], r[1]) for r in got.collect()}
    want = {
        (a, b)
        for ai, a in enumerate(names)
        for b in names[ai + 1 :]
        if sum(1 for x, y in zip(a, b) if x != y) <= 1
    }
    assert got_pairs == want


def test_max_pairs_cap_raises_informatively(spark):
    """Round-12 safety valve: the operator is ANSWER-size-bound (k=2 on
    sequential ids -> ~quadratic true answer), so a cap must fail loudly
    with the measured rate instead of running for hours."""
    import pytest

    from polars_spark.llm import fuzzy_string_pairs

    names = [f"id{i:05d}" for i in range(300)]  # dense lev-1/2 neighborhood
    df = spark.createDataFrame([(s,) for s in names], "name string")
    with pytest.raises(RuntimeError, match="max_pairs=50 .*pairs/s"):
        fuzzy_string_pairs(df, left_on="name", max_distance=2, max_pairs=50)


def test_max_pairs_under_cap_keeps_output(spark):
    """cap not exceeded -> identical output to the unguarded call."""
    from polars_spark.llm import fuzzy_string_pairs

    names = ["alpha", "alphb", "beta", "betb", "gamma"]
    df = spark.createDataFrame([(s,) for s in names], "name string")
    base = {
        tuple(r)
        for r in fuzzy_string_pairs(df, left_on="name", max_distance=1).collect()
    }
    capped = {
        tuple(r)
        for r in fuzzy_string_pairs(
            df, left_on="name", max_distance=1, max_pairs=10_000
        ).collect()
    }
    assert capped == base and len(base) == 2
