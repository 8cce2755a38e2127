"""Model-evaluation aggregates over prediction tables — the scoring half
of an LLM data pipeline (grade millions of sampled completions without
collecting them).

``exact_match_f1``: SQuAD-style normalized exact-match + token-overlap F1
per row, pure column algebra (no UDF): normalization is a regexp chain,
token F1 uses the multiset-intersection identity
``|A ∩ B| = Σ_{t ∈ distinct(A)} min(count_A(t), count_B(t))``
computed with array higher-order functions.

``pass_at_k``: the unbiased HumanEval estimator per task,
``pass@k = 1 - C(n-c, k) / C(n, k)`` computed in product form
``1 - Π_{i=0..k-1} (n-c-i)/(n-i)`` (numerically safe, no factorials) —
one groupBy(task) shuffle, the product unrolled as a column expression
since k is a small literal.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["normalize_answer", "exact_match_f1", "pass_at_k"]


def normalize_answer(c: Column) -> Column:
    """SQuAD answer normalization: lowercase, strip punctuation, drop
    english articles (a/an/the), collapse whitespace."""
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, r"\b(a|an|the)\b", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def _tokens(c: Column) -> Column:
    return F.filter(F.split(c, " "), lambda t: t != "")


def exact_match_f1(
    preds: DataFrame,
    *,
    pred_col: str = "prediction",
    ref_col: str = "reference",
) -> DataFrame:
    """Adds ``em`` (0/1) and ``f1`` per row.  Token F1 over the normalized
    token multisets; both-empty counts as a match (SQuAD convention)."""
    p = normalize_answer(F.col(pred_col))
    r = normalize_answer(F.col(ref_col))
    pt, rt = _tokens(p), _tokens(r)
    # multiset intersection via distinct tokens of the prediction
    common = F.aggregate(
        F.array_distinct(pt),
        F.lit(0),
        lambda acc, t: acc
        + F.least(
            F.size(F.filter(pt, lambda x: x == t)),
            F.size(F.filter(rt, lambda x: x == t)),
        ),
    )
    np_, nr = F.size(pt), F.size(rt)
    prec = common / np_
    rec = common / nr
    f1 = F.when((np_ == 0) & (nr == 0), F.lit(1.0)).when(
        (np_ == 0) | (nr == 0) | (common == 0), F.lit(0.0)
    ).otherwise(2 * prec * rec / (prec + rec))
    em = (p == r).cast("int")
    return preds.withColumn("em", em).withColumn("f1", f1)


def pass_at_k(
    samples: DataFrame,
    k: int,
    *,
    task_col: str = "task_id",
    passed_col: str = "passed",
) -> DataFrame:
    """(task, n, c, pass_at_k) per task — the unbiased estimator from the
    HumanEval paper (Chen et al. 2021, eq. 1): with n samples of which c
    pass, ``1 - C(n-c,k)/C(n,k)``; defined as 1.0 when ``n - c < k``
    (every size-k draw contains a pass).  ``k`` must be a literal; the
    product unrolls to k multiplications inside one aggregate projection."""
    if k < 1:
        raise ValueError("k must be >= 1")
    g = samples.groupBy(task_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(passed_col).cast("int")).alias("c"),
    )
    n, c = F.col("n"), F.col("c")
    prod = F.lit(1.0)
    for i in range(k):
        prod = prod * ((n - c - i).cast("double") / (n - i).cast("double"))
    est = F.when(n - c < k, F.lit(1.0)).otherwise(1.0 - prod)
    return g.withColumn("pass_at_k", est)
