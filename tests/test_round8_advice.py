"""Round-8 ADVICE regression tests.

1. Multi-path scan order when a glob entry expands to a DIRECTORY
   (Spark-written parquet dataset) — previously fell to the fallback rank
   and silently violated the given-list order contract.
2. ensure_engine_confs realigns session.timeZone at collect time when the
   consumer re-set it after the engine's first alignment.
3. ewm pass-sharing: two structurally different Python-UDF `.over()` keys
   must not collide into one shuffle pass (both stringify `<lambda>(g)`).
4. LazyFrame.plot must hit the altair gate BEFORE collecting.
5. cast to Datetime must not take the Time branch (`startswith("time")`
   matched "timestamp").
"""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pytest


def test_glob_dir_scan_order(pl, spark, tmp_path):
    # Spark-written parquet DIRECTORIES, names chosen so lexicographic and
    # given-list order disagree: ['dir_b*', 'dir_a'] must yield b before a.
    root = str(tmp_path)
    pl.from_pandas(pd.DataFrame({"v": [1, 2]})).to_spark().coalesce(1).write.parquet(
        os.path.join(root, "dir_a")
    )
    pl.from_pandas(pd.DataFrame({"v": [3, 4]})).to_spark().coalesce(1).write.parquet(
        os.path.join(root, "dir_b_x")
    )
    lf = pl.scan_parquet([os.path.join(root, "dir_b*"), os.path.join(root, "dir_a")])
    got = lf.select(pl.col("v")).collect()["v"].tolist()
    assert got == [3, 4, 1, 2], got


def test_timezone_realigned_at_collect(pl, spark):
    lf = pl.from_pandas(
        pd.DataFrame({"ts": [dt.datetime(2024, 1, 1, 12, 0, 0)]})
    )
    # the session this frame actually lives on (the active session may be a
    # child left by other tests — the contract is about the OWNING session)
    sess = lf.to_spark().sparkSession
    # consumer re-sets the timezone AFTER the engine aligned the session
    sess.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        out = lf.select(pl.col("ts").dt.hour().alias("h")).collect()
        assert out["h"].tolist() == [12]
        # and the session is realigned for the engine's semantics
        assert sess.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        sess.conf.set("spark.sql.session.timeZone", "UTC")


def test_ewm_udf_keys_do_not_share_pass(pl, spark):
    pdf = pd.DataFrame(
        {"g": ["aa", "ab", "ba", "bb"] * 3, "x": [float(i) for i in range(12)]}
    )
    lf = pl.from_pandas(pdf).with_row_index("i").sort("i")
    k1 = pl.col("g").map_elements(lambda s: s[:1], return_dtype=pl.Utf8)
    k2 = pl.col("g").map_elements(lambda s: s[1:], return_dtype=pl.Utf8)
    out = (
        lf.with_columns(
            e1=pl.col("x").ewm_mean(alpha=0.5, adjust=False).over(k1),
            e2=pl.col("x").ewm_mean(alpha=0.5, adjust=False).over(k2),
        )
        .sort("i")
        .collect()
    )

    # oracle: pandas ewm per true key
    def ewm(keys):
        s = pd.Series(pdf["x"].values)
        return (
            s.groupby(pd.Series(keys))
            .transform(lambda v: v.ewm(alpha=0.5, adjust=False).mean())
            .tolist()
        )

    exp1 = ewm([g[:1] for g in pdf["g"]])
    exp2 = ewm([g[1:] for g in pdf["g"]])
    assert out["e1"].tolist() == pytest.approx(exp1)
    assert out["e2"].tolist() == pytest.approx(exp2)


def test_plot_gates_before_collect(pl, monkeypatch):
    pytest.importorskip
    try:
        import altair  # noqa: F401

        pytest.skip("altair present: gate does not raise")
    except ImportError:
        pass
    lf = pl.from_pandas(pd.DataFrame({"a": [1]}))
    calls = {"n": 0}
    orig = type(lf).collect

    def spy(self, **kw):
        calls["n"] += 1
        return orig(self, **kw)

    monkeypatch.setattr(type(lf), "collect", spy)
    with pytest.raises(NotImplementedError):
        _ = lf.plot
    assert calls["n"] == 0, "plot collected before the altair gate"


def test_cast_datetime_not_time_branch(pl, spark):
    lf = pl.from_pandas(pd.DataFrame({"ts": [dt.datetime(2024, 3, 5, 7, 8, 9)]}))
    out = lf.select(
        same=pl.col("ts").cast(pl.Datetime("us")),
        from_str=pl.lit("2024-03-05 07:08:09").cast(pl.Datetime("us")),
    ).collect()
    assert out["same"].tolist() == [pd.Timestamp(2024, 3, 5, 7, 8, 9)]
    assert out["from_str"].tolist() == [pd.Timestamp(2024, 3, 5, 7, 8, 9)]


def test_newsession_isolation(pl, spark):
    """README embedding contract: a child newSession() keeps its own confs
    while the engine-owned parent stays aligned (and vice versa)."""
    child = spark.newSession()
    child.conf.set("spark.sql.session.timeZone", "America/New_York")
    # engine work on the PARENT session must not disturb the child
    out = pl.from_pandas(pd.DataFrame({"a": [1, 2]})).select(
        s=pl.col("a").sum()
    ).collect()
    assert out["s"].tolist() == [3]
    assert child.conf.get("spark.sql.session.timeZone") == "America/New_York"
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_sibling_window_cannot_flip_first_over(pl):
    """r8 window-fuzz finding: agg.over(g) built a BARE partition window, so
    first()/last() were only accidentally frame-ordered — a sibling window
    with a different orderBy re-sorted the partition and flipped them."""
    pdf = pd.DataFrame(
        {
            "rid": range(6),
            "g": ["a", "a", "b", "b", "a", "b"],
            "i": [30, 20, 10, 40, 5, 1],
            "s": list("uvwxyz"),
        }
    )
    lf = pl.from_pandas(pdf).sort("rid")
    out = lf.with_columns(
        r=pl.col("i").rank("min").over("g"),  # re-sorts partitions by i
        f=pl.col("s").first().over("g"),
        l=pl.col("s").last().over("g"),
    ).sort("rid").collect()
    assert out["f"].tolist() == ["u", "u", "w", "w", "u", "w"]
    assert out["l"].tolist() == ["y", "y", "z", "z", "y", "z"]
