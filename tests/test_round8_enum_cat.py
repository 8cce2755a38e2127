"""Round-8 Categorical/Enum physical-fidelity pins (reference
polars-core/src/datatypes/dtype.rs:135-138 FrozenCategories and
function_expr/cat.rs).

- Enum strict cast ERRORS on a value outside the frozen set; non-strict
  cast nulls it (the polars strict/non-strict split).
- Enum ordering is CATEGORY INDEX, not lexical: min/max honor it, and the
  category metadata survives a with_columns round-trip (Spark field
  metadata).
- Categorical is the documented string passthrough: lexical ordering only.
"""

from __future__ import annotations

import pandas as pd
import pytest


def test_enum_strict_cast_raises(pl):
    lf = pl.from_pandas(pd.DataFrame({"s": ["A", "N", "X"]}))
    with pytest.raises(Exception, match="conversion to enum failed"):
        lf.select(pl.col("s").cast(pl.Enum(["A", "N", "R"]))).collect()


def test_enum_nonstrict_cast_nulls(pl):
    lf = pl.from_pandas(pd.DataFrame({"s": ["A", "N", "X", None]}))
    out = lf.select(e=pl.col("s").cast(pl.Enum(["A", "N", "R"]), strict=False)).collect()
    assert out["e"].tolist() == ["A", "N", None, None]


def test_enum_min_max_category_order(pl):
    # categories deliberately reverse-lexical: a lexical regression flips it
    lf = pl.from_pandas(pd.DataFrame({"s": ["N", "R", "A", "N"], "g": list("xxyy")}))
    lf2 = lf.with_columns(flag=pl.col("s").cast(pl.Enum(["R", "N", "A"])))
    out = lf2.group_by("g").agg(
        lo=pl.col("flag").min(), hi=pl.col("flag").max()
    ).sort("g").collect()
    assert out["lo"].tolist() == ["R", "N"]
    assert out["hi"].tolist() == ["N", "A"]
    # expr-level (no column round-trip) agrees
    whole = lf.select(lo=pl.col("s").cast(pl.Enum(["R", "N", "A"])).min()).collect()
    assert whole["lo"].tolist() == ["R"]


def test_enum_metadata_survives_projection(pl):
    lf = pl.from_pandas(pd.DataFrame({"s": ["A", "R"]}))
    lf2 = (
        lf.with_columns(flag=pl.col("s").cast(pl.Enum(["R", "N", "A"])))
        .with_columns(other=pl.lit(1))
        .select("flag", "other")
    )
    assert lf2.to_spark().schema["flag"].metadata.get("pls_enum") == ["R", "N", "A"]


def test_enum_get_categories(pl):
    lf = pl.from_pandas(pd.DataFrame({"s": ["A"]}))
    e = pl.col("s").cast(pl.Enum(["R", "N", "A"]))
    out = lf.select(c=e.cat.get_categories().explode()).collect()
    assert out["c"].tolist() == ["R", "N", "A"]


def test_categorical_is_lexical_string(pl):
    lf = pl.from_pandas(pd.DataFrame({"s": ["b", "a", "c"]}))
    out = lf.select(
        lo=pl.col("s").cast(pl.Categorical("lexical")).min(),
        hi=pl.col("s").cast(pl.Categorical).max(),
    ).collect()
    assert out["lo"].tolist() == ["a"]
    assert out["hi"].tolist() == ["c"]


def test_enum_sort_category_order(pl):
    lf = pl.from_pandas(pd.DataFrame({"s": ["A", "R", "N", "A", None]}))
    lf2 = lf.with_columns(flag=pl.col("s").cast(pl.Enum(["R", "N", "A"]), strict=False))
    up = lf2.sort("flag").collect()["flag"].tolist()
    # null smallest -> first ascending; then category order R < N < A
    assert up == [None, "R", "N", "A", "A"]
    down = lf2.sort("flag", descending=True).collect()["flag"].tolist()
    assert down == ["A", "A", "N", "R", None]
    # order survives a post-sort projection + head
    top = lf2.sort("flag", descending=True).head(2).collect()["flag"].tolist()
    assert top == ["A", "A"]
