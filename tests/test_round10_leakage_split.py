"""Round-10: leakage_safe_split — near-dup components never straddle splits.

The operator's contract is the INVARIANT, not any particular assignment:
for every near-duplicate component, all members get the same split, and
the assignment is the stable md5-bucket rule keyed on the component label
(so adding unrelated documents never moves an existing component).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def planted(spark):
    texts = {
        # component A: 1, 2, 3 are near-copies
        1: "the quick brown fox jumps over the lazy dog again and again today",
        2: "the quick brown fox jumps over the lazy dog again and again today",
        3: "the quick brown fox jumps over the lazy dog again and again tonight",
        # component B: 10, 11
        10: "pack my box with five dozen liquor jugs before the long winter",
        11: "pack my box with five dozen liquor jugs before the long winter",
        # singletons
        20: "completely unrelated text about distributed query processing engines",
        21: "another standalone document mentioning watermarks and stateful streams",
    }
    return spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )


def _split(spark, docs, seed=7):
    from polars_spark.llm import leakage_safe_split, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs, "doc_id", "text", n=3, k=32, bands=8, threshold=0.8)
    return leakage_safe_split(
        docs, pairs, id_col="doc_id",
        fractions={"train": 0.8, "val": 0.1, "test": 0.1}, seed=seed,
    )


def test_components_never_straddle_splits(spark, planted):
    out = _split(spark, planted).select("doc_id", "group_key", "split").collect()
    by_doc = {r.doc_id: r for r in out}
    assert len(by_doc) == 7
    # each component shares one group_key and one split
    for comp in [(1, 2, 3), (10, 11)]:
        keys = {by_doc[d].group_key for d in comp}
        splits = {by_doc[d].split for d in comp}
        assert len(keys) == 1 and len(splits) == 1, (comp, keys, splits)
    # component label is the min id
    assert by_doc[1].group_key == 1 and by_doc[10].group_key == 10
    # singletons key on their own id
    assert by_doc[20].group_key == 20 and by_doc[21].group_key == 21


def test_assignment_stable_under_corpus_growth(spark, planted):
    """Adding unrelated documents must not move existing components — the
    property that keeps eval sets uncontaminated across dataset versions."""
    before = {r.doc_id: r.split for r in _split(spark, planted).collect()}
    extra = spark.createDataFrame(
        [(100 + i, f"fresh document number {i} with entirely novel words {i*7}")
         for i in range(5)],
        "doc_id long, text string",
    )
    grown = planted.unionByName(extra)
    after = {r.doc_id: r.split for r in _split(spark, grown).collect()}
    for d, s in before.items():
        assert after[d] == s, (d, s, after[d])


def test_fraction_validation(spark, planted):
    from polars_spark.llm import leakage_safe_split, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(planted, "doc_id", "text", n=3, k=32, bands=8, threshold=0.8)
    with pytest.raises(ValueError):
        leakage_safe_split(planted, pairs, fractions={"train": 0.5, "val": 0.1})
