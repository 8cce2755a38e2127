"""Model-based quality scoring: a fastText/DataComp-style document quality
classifier trained and applied with Spark MLlib.

Real curation pipelines (CCNet, DCLM, FineWeb) gate documents with a
learned quality model, not only hand rules.  This module provides the
Spark-native shape of that stage:

  1. ``quality_features`` — cheap per-doc signals as pure column algebra
     (no UDFs, pipelines into the scan);
  2. ``train_quality_classifier`` — VectorAssembler + LogisticRegression
     (seeded, L2) fitted on a labeled frame.  Training data is typically
     small (tens of thousands of labeled docs), the *scoring* is what must
     scale;
  3. ``score_quality`` — distributed scoring: the fitted model broadcasts
     its coefficient vector and scoring is a map-side projection over the
     feature columns (we extract the raw linear model and apply
     sigmoid(w·x+b) as column algebra — no per-row JVM<->Python hops, and
     the score survives into any downstream Catalyst plan).

Not oracle-gated: LBFGS training is not SQL-expressible.  Covered by
pytest: a separable synthetic labeling must reach high accuracy, and the
column-algebra scorer must match MLlib's own transform() probabilities.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quality_features", "train_quality_classifier", "score_quality", "FEATURES"]

FEATURES = [
    "f_n_chars",
    "f_n_tokens",
    "f_mean_tok_len",
    "f_alpha_ratio",
    "f_digit_ratio",
    "f_punct_ratio",
    "f_upper_ratio",
]


def _nz(c: Column) -> Column:
    return F.greatest(c, F.lit(1.0))


def quality_features(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Append the FEATURES columns — pure projections, zero shuffles."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("double")
    n_tokens = F.size(F.split(F.trim(t), r"\s+")).cast("double")
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", "")).cast("double")
    digit = F.length(F.regexp_replace(t, r"[^0-9]", "")).cast("double")
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", "")).cast("double")
    upper = F.length(F.regexp_replace(t, r"[^A-Z]", "")).cast("double")
    return df.withColumns(
        {
            "f_n_chars": n_chars,
            "f_n_tokens": n_tokens,
            "f_mean_tok_len": n_chars / _nz(n_tokens),
            "f_alpha_ratio": alpha / _nz(n_chars),
            "f_digit_ratio": digit / _nz(n_chars),
            "f_punct_ratio": punct / _nz(n_chars),
            "f_upper_ratio": upper / _nz(n_chars),
        }
    )


def train_quality_classifier(
    labeled: DataFrame,
    *,
    label_col: str = "label",
    features: list[str] | None = None,
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """Fit a seeded logistic-regression quality model on a labeled frame
    whose feature columns already exist (see quality_features).  Returns
    the fitted PipelineModel."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    features = features or FEATURES
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=features, outputCol="__fvec_raw"),
            StandardScaler(
                inputCol="__fvec_raw", outputCol="__fvec", withMean=True, withStd=True
            ),
            LogisticRegression(
                featuresCol="__fvec",
                labelCol=label_col,
                regParam=reg_param,
                maxIter=max_iter,
                standardization=False,
            ),
        ]
    )
    return pipe.fit(labeled)


def score_quality(
    model,
    df: DataFrame,
    *,
    features: list[str] | None = None,
    out_col: str = "quality_prob",
) -> DataFrame:
    """Score a corpus with a fitted model as PURE COLUMN ALGEBRA.

    The scaler means/stds and LR coefficients are extracted once on the
    driver (tiny) and inlined as literals: score = sigmoid(w·z + b) with
    z = (x - mean) / std.  Compared to model.transform(), this avoids the
    UDT vector column entirely — the score is a plain double that Catalyst
    can push around, and scoring cost is a handful of fused multiply-adds
    per row at any corpus size."""
    features = features or FEATURES
    scaler = model.stages[1]
    lr = model.stages[2]
    means = list(scaler.mean)
    stds = [s if s != 0 else 1.0 for s in scaler.std]
    coefs = list(lr.coefficients)
    b = float(lr.intercept)
    z = F.lit(b)
    for name, m, s, w in zip(features, means, stds, coefs):
        z = z + F.lit(w) * ((F.col(name) - F.lit(m)) / F.lit(s))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return df.withColumn(out_col, prob)
