"""Temporal grouping: group_by_dynamic (tumbling + sliding), rolling context,
upsample-ish spine behavior (SURVEY §2.10)."""

import pandas as pd
import pytest

from tests.conftest import rows


def _events(lf):
    ts = [
        "2024-01-01 00:05",
        "2024-01-01 00:20",
        "2024-01-01 00:35",
        "2024-01-01 00:50",
        "2024-01-01 01:05",
    ]
    return lf(ts=[pd.Timestamp(t) for t in ts], v=[1.0, 2.0, 3.0, 4.0, 5.0], g=["a", "a", "a", "b", "b"])


def test_dynamic_tumbling(pl, lf):
    f = _events(lf)
    out = f.group_by_dynamic("ts", every="30m").agg(
        pl.col("v").sum().alias("s"), pl.len().alias("n")
    ).sort("ts")
    r = rows(out)
    assert r == [
        (pd.Timestamp("2024-01-01 00:00"), 3.0, 2),
        (pd.Timestamp("2024-01-01 00:30"), 7.0, 2),
        (pd.Timestamp("2024-01-01 01:00"), 5.0, 1),
    ]


def test_dynamic_sliding(pl, lf):
    f = _events(lf)
    out = f.group_by_dynamic("ts", every="30m", period="1h").agg(pl.len().alias("n")).sort("ts")
    r = rows(out)
    # window [23:30,00:30): 2 rows; [00:00,01:00): 4; [00:30,01:30): 3; [01:00,02:00): 1
    assert r == [
        (pd.Timestamp("2023-12-31 23:30"), 2),
        (pd.Timestamp("2024-01-01 00:00"), 4),
        (pd.Timestamp("2024-01-01 00:30"), 3),
        (pd.Timestamp("2024-01-01 01:00"), 1),
    ]


def test_dynamic_by_group(pl, lf):
    f = _events(lf)
    out = f.group_by_dynamic("ts", every="1h", group_by="g").agg(pl.col("v").sum().alias("s"))
    r = rows(out, sort_by=["g", "ts"])
    assert r == [
        ("a", pd.Timestamp("2024-01-01 00:00"), 6.0),
        ("b", pd.Timestamp("2024-01-01 00:00"), 4.0),
        ("b", pd.Timestamp("2024-01-01 01:00"), 5.0),
    ]


def test_rolling_context(pl, lf):
    f = _events(lf)
    out = f.rolling("ts", period="30m", group_by="g").agg(
        pl.col("v").sum().alias("s"), pl.col("v").count().alias("n")
    )
    r = rows(out, sort_by=["g", "ts"])
    # (t-30m, t] per row within group
    assert [t[3] for t in r] == [1, 2, 2, 1, 2]
    assert [t[2] for t in r] == [1.0, 3.0, 5.0, 4.0, 9.0]


def test_rolling_excludes_left_boundary(pl, lf):
    f = lf(
        ts=[pd.Timestamp("2024-01-01 00:00"), pd.Timestamp("2024-01-01 00:30")],
        v=[1.0, 2.0],
        g=["a", "a"],
    )
    out = f.rolling("ts", period="30m", group_by="g").agg(pl.col("v").sum().alias("s"))
    r = rows(out, sort_by="ts")
    # second window is (00:00, 00:30] -> excludes the 00:00 row (closed='right')
    assert [t[2] for t in r] == [1.0, 2.0]


def test_rolling_closed_variants(pl, lf):
    ts = [pd.Timestamp("2024-01-01 00:00"), pd.Timestamp("2024-01-01 00:30"), pd.Timestamp("2024-01-01 01:00")]
    f = lf(ts=ts, v=[1.0, 2.0, 4.0], g=["a"] * 3)

    def sums(closed):
        out = f.rolling("ts", period="30m", group_by="g", closed=closed).agg(
            pl.col("v").sum().alias("s")
        )
        return [t[2] for t in rows(out, sort_by="ts")]

    assert sums("right") == [1.0, 2.0, 4.0]   # (t-30m, t]
    assert sums("both") == [1.0, 3.0, 6.0]    # [t-30m, t]
    # polars sum semantics: an EMPTY window sums to 0, not null
    assert sums("left") == [0.0, 1.0, 2.0]    # [t-30m, t)
    assert sums("none") == [0.0, 0.0, 0.0]    # (t-30m, t)


def test_duration_totals(pl, lf):
    f = lf(
        a=[pd.Timestamp("2024-01-01 00:00")],
        b=[pd.Timestamp("2024-01-02 03:04:05")],
    )
    out = f.select(
        (pl.col("b") - pl.col("a")).dt.total_seconds().alias("secs"),
        (pl.col("b") - pl.col("a")).dt.total_hours().alias("hrs"),
        (pl.col("b") - pl.col("a")).dt.total_days().alias("days"),
    )
    r = rows(out)[0]
    assert r == (97445, 27, 1)


def test_dynamic_closed_right(pl, lf):
    ts = [pd.Timestamp("2024-01-01 00:00"), pd.Timestamp("2024-01-01 00:30"), pd.Timestamp("2024-01-01 00:45")]
    f = lf(ts=ts, v=[1.0, 2.0, 4.0])
    out = f.group_by_dynamic("ts", every="30m", closed="right").agg(pl.col("v").sum().alias("s"))
    r = rows(out, sort_by="ts")
    # (start, end]: 00:00 falls in the (-30m, 00:00] window; 00:30 in (00:00, 00:30]
    assert r == [
        (pd.Timestamp("2023-12-31 23:30"), 1.0),
        (pd.Timestamp("2024-01-01 00:00"), 2.0),
        (pd.Timestamp("2024-01-01 00:30"), 4.0),
    ]


def test_group_by_sessions_merges_within_gap(pl):
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 00:19", "2024-01-01 02:00"]
            ),
            "u": ["a"] * 4,
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    f = pl.from_pandas(pdf)
    got = (
        f.group_by_sessions("ts", gap="15m", group_by="u")
        .agg(pl.len().alias("n"), pl.col("v").sum().alias("s"))
        .collect()
        .sort_values("session_start", ignore_index=True)
    )
    assert got["n"].tolist() == [3, 1]
    assert got["s"].tolist() == [6.0, 4.0]
    assert got["session_end"][0] == pd.Timestamp("2024-01-01 00:34")


def test_group_by_sessions_boundary_event_merges(pl):
    # Spark session_window semantics: an event landing EXACTLY at the
    # session-end boundary merges (diff <= gap extends the session) — this
    # pins the inequality the tmp_session_windows oracle replays
    pdf = pd.DataFrame(
        {
            "ts": pd.to_datetime(
                ["2024-01-01 00:00:00", "2024-01-01 00:15:00", "2024-01-01 00:30:01"]
            ),
            "u": ["a", "a", "a"],
        }
    )
    got = (
        pl.from_pandas(pdf)
        .group_by_sessions("ts", gap="15m", group_by="u")
        .agg(pl.len().alias("n"))
        .collect()
        .sort_values("session_start", ignore_index=True)
    )
    assert got["n"].tolist() == [2, 1]


class TestUtcOffsets:
    def test_base_and_dst_offset_paris(self, pl, lf):
        import datetime as dt

        f = lf(ts=[dt.datetime(2024, 1, 15, 12), dt.datetime(2024, 7, 15, 12)])
        out = f.select(
            pl.col("ts").dt.base_utc_offset("Europe/Paris").alias("base"),
            pl.col("ts").dt.dst_offset("Europe/Paris").alias("dst"),
        ).collect()
        base, dst = out["base"].to_list(), out["dst"].to_list()
        assert base[0].total_seconds() == 3600 and base[1].total_seconds() == 3600
        assert dst[0].total_seconds() == 0 and dst[1].total_seconds() == 3600

    def test_dst_southern_hemisphere(self, pl, lf):
        import datetime as dt

        # Sydney: DST in January, none in July; base +10h year-round
        f = lf(ts=[dt.datetime(2024, 1, 15, 12), dt.datetime(2024, 7, 15, 12)])
        out = f.select(
            pl.col("ts").dt.base_utc_offset("Australia/Sydney").alias("base"),
            pl.col("ts").dt.dst_offset("Australia/Sydney").alias("dst"),
        ).collect()
        assert [b.total_seconds() for b in out["base"].to_list()] == [36000.0, 36000.0]
        assert [d.total_seconds() for d in out["dst"].to_list()] == [3600.0, 0.0]


class TestPipeWithSchemaAndSerialize:
    def test_pipe_with_schema_sees_resolved_schema(self, pl, lf):
        f = lf(a=[1, 2], b=["x", "y"])
        seen = {}

        def fn(frame, schema):
            seen.update(schema)
            return frame.select(pl.col("a"))

        out = f.pipe_with_schema(fn)
        assert out.columns == ["a"]
        assert "a" in seen and "b" in seen

    def test_serialize_json_plan(self, pl, lf, tmp_path):
        f = lf(a=[1, 2]).filter(pl.col("a") > 1)
        s = f.serialize(format="json")
        assert isinstance(s, str) and "class" in s
        # binary (the reference default) round-trips: schema + rows
        b = f.serialize()
        assert isinstance(b, bytes)
        assert pl.LazyFrame.deserialize(b).collect()["a"].tolist() == [2]
        p = tmp_path / "plan.json"
        f.serialize(str(p), format="json")
        assert p.read_text() == s
        # a JSON plan string stays diagnostics-only
        with pytest.raises(NotImplementedError, match="deserialize"):
            pl.LazyFrame.deserialize(s)
        # file path round-trip
        pb = tmp_path / "frame.bin"
        f.serialize(str(pb))
        assert pl.LazyFrame.deserialize(str(pb)).collect()["a"].tolist() == [2]


def test_dynamic_closed_both_and_none(pl, lf):
    import datetime as dt

    ts = [
        dt.datetime(2024, 1, 1, 0, 0),   # exact hour boundary
        dt.datetime(2024, 1, 1, 0, 30),
        dt.datetime(2024, 1, 1, 1, 0),   # exact hour boundary
        dt.datetime(2024, 1, 1, 1, 15),
    ]
    f = lf(ts=ts, v=[1, 2, 4, 8])
    both = rows(
        f.group_by_dynamic("ts", every="1h", closed="both").agg(
            pl.col("v").sum().alias("s")
        ),
        sort_by="ts",
    )
    # 00:00-01:00 gets {1,2} plus the 01:00 boundary row (4); 01:00-02:00
    # gets {4,8}; 00:00 also closes the previous (empty until now) window
    assert [(r[1]) for r in both] == [1, 7, 12]
    none = rows(
        f.group_by_dynamic("ts", every="1h", closed="none").agg(
            pl.col("v").sum().alias("s")
        ),
        sort_by="ts",
    )
    # exact-start rows dropped entirely
    assert [(r[1]) for r in none] == [2, 8]


def test_dynamic_start_by_datapoint_and_weekday(pl, lf):
    import datetime as dt

    # data starts at 00:17 — datapoint-aligned hourly windows begin there
    ts = [dt.datetime(2024, 1, 1, 0, 17), dt.datetime(2024, 1, 1, 0, 50),
          dt.datetime(2024, 1, 1, 1, 20)]
    f = lf(ts=ts, v=[1, 2, 4])
    out = rows(
        f.group_by_dynamic("ts", every="1h", start_by="datapoint").agg(
            pl.col("v").sum().alias("s")
        ),
        sort_by="ts",
    )
    assert out[0][0].minute == 17  # window origin = first datapoint
    assert [r[1] for r in out] == [3, 4]

    # weekly windows starting on Monday: 2024-01-01 IS a Monday
    ts2 = [dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 4), dt.datetime(2024, 1, 8)]
    g = lf(ts=ts2, v=[1, 2, 4])
    out2 = rows(
        g.group_by_dynamic("ts", every="1w", start_by="monday").agg(
            pl.col("v").sum().alias("s")
        ),
        sort_by="ts",
    )
    assert [r[0].weekday() for r in out2] == [0, 0]  # both windows start Monday
    assert [r[1] for r in out2] == [3, 4]


def test_rolling_integer_index(pl, lf):
    f = lf(t=[1, 2, 3], v=[1.0, 2.0, 3.0]).sort("t")
    out = f.rolling("t", period="2i").agg(pl.col("v").sum().alias("s"))
    assert out.collect()["s"].tolist() == [1.0, 3.0, 5.0]
