"""Namespace methods: .str / .dt / .list / .struct / .bin / .name.

Mirrors cases from py-polars/tests/unit/operations/namespaces/."""

import datetime as dt

import pandas as pd
import pytest

from tests.conftest import rows


# ---------------------------------------------------------------- .str


def test_str_case_len(pl, lf):
    f = lf(s=["Hello World", "abc"])
    r = rows(
        f.select(
            pl.col("s").str.to_lowercase().alias("lo"),
            pl.col("s").str.to_uppercase().alias("up"),
            pl.col("s").str.to_titlecase().alias("ti"),
            pl.col("s").str.len_chars().alias("nc"),
            pl.col("s").str.len_bytes().alias("nb"),
            pl.col("s").str.reverse().alias("rev"),
        )
    )
    assert r[0] == ("hello world", "HELLO WORLD", "Hello World", 11, 11, "dlroW olleH")
    assert r[1] == ("abc", "ABC", "Abc", 3, 3, "cba")


def test_str_contains_find_count(pl, lf):
    f = lf(s=["foo bar foo", "baz"])
    r = rows(
        f.select(
            pl.col("s").str.contains("foo").alias("c"),
            pl.col("s").str.contains("F.o", literal=True).alias("cl"),
            pl.col("s").str.starts_with("foo").alias("sw"),
            pl.col("s").str.ends_with("foo").alias("ew"),
            pl.col("s").str.find("bar").alias("fd"),
            pl.col("s").str.count_matches("foo").alias("cm"),
            pl.col("s").str.count_matches("o", literal=True).alias("cml"),
        )
    )
    assert r[0] == (True, False, True, True, 4, 2, 4)
    assert r[1] == (False, False, False, False, None, 0, 0)


def test_str_extract(pl, lf):
    f = lf(s=["a=1 b=2", "nope"])
    r = rows(
        f.select(
            pl.col("s").str.extract(r"a=(\d+)", 1).alias("ex"),
            pl.col("s").str.extract_all(r"\d+").alias("all"),
        )
    )
    assert r[0][0] == "1" and list(r[0][1]) == ["1", "2"]
    assert r[1][0] is None and list(r[1][1]) == []


def test_str_replace(pl, lf):
    f = lf(s=["aaa", "bcb"])
    r = rows(
        f.select(
            pl.col("s").str.replace("a", "X").alias("first"),
            pl.col("s").str.replace_all("a", "X").alias("all"),
            pl.col("s").str.replace_all("b", "Y", literal=True).alias("lit"),
            pl.col("s").str.replace_many(["a", "b"], ["1", "2"]).alias("many"),
        )
    )
    assert r[0] == ("Xaa", "XXX", "aaa", "111")
    assert r[1] == ("bcb", "bcb", "YcY", "2c2")


def test_str_strip_pad(pl, lf):
    f = lf(s=["  hi  ", "xxhixx"])
    r = rows(
        f.select(
            pl.col("s").str.strip_chars().alias("t"),
            pl.col("s").str.strip_chars("x").alias("tx"),
            pl.col("s").str.strip_prefix("xx").alias("pre"),
            pl.col("s").str.strip_suffix("xx").alias("suf"),
        )
    )
    assert r[0][0] == "hi"
    assert r[1][1] == "hi"
    assert r[1][2] == "hixx" and r[1][3] == "xxhi"
    r2 = rows(
        lf(s=["5", "-5"]).select(
            pl.col("s").str.zfill(3).alias("z"),
            pl.col("s").str.pad_start(4, "_").alias("ps"),
            pl.col("s").str.pad_end(4, "_").alias("pe"),
        )
    )
    assert r2[0] == ("005", "___5", "5___")
    assert r2[1][0] == "-05"


def test_str_slice_split(pl, lf):
    f = lf(s=["hello world"])
    r = rows(
        f.select(
            pl.col("s").str.slice(6).alias("sl"),
            pl.col("s").str.slice(0, 5).alias("sl2"),
            pl.col("s").str.slice(-5, 5).alias("sl3"),
            pl.col("s").str.head(5).alias("hd"),
            pl.col("s").str.tail(5).alias("tl"),
            pl.col("s").str.split(" ").alias("sp"),
        )
    )[0]
    assert r[0] == "world" and r[1] == "hello" and r[2] == "world"
    assert r[3] == "hello" and r[4] == "world" and list(r[5]) == ["hello", "world"]


def test_str_split_exact_splitn(pl, lf):
    f = lf(s=["a-b-c"])
    pdf = f.select(
        pl.col("s").str.split_exact("-", 1).alias("se"),
        pl.col("s").str.splitn("-", 2).alias("sn"),
    ).collect()
    assert pdf["se"][0] == {"field_0": "a", "field_1": "b"}
    assert pdf["sn"][0] == {"field_0": "a", "field_1": "b-c"}


def test_str_conversions(pl, lf):
    f = lf(s=["42", "ff"])
    r = rows(
        f.select(
            pl.col("s").str.to_integer(strict=False).alias("i10"),
            pl.col("s").str.to_integer(base=16).alias("i16"),
        )
    )
    assert r[0] == (42, 66)
    assert r[1][0] is None and r[1][1] == 255


def test_str_datetime_parse(pl, lf):
    f = lf(s=["2024-03-05 10:30:00"])
    r = rows(
        f.select(
            pl.col("s").str.to_datetime("%Y-%m-%d %H:%M:%S").alias("ts"),
            pl.col("s").str.to_date("%Y-%m-%d %H:%M:%S").alias("d"),
        )
    )[0]
    assert r[0] == pd.Timestamp("2024-03-05 10:30:00")
    assert str(r[1]) == "2024-03-05"


def test_str_json(pl, lf):
    f = lf(s=['{"a": 1, "b": "x"}'])
    r = rows(
        f.select(
            pl.col("s").str.json_path_match("$.b").alias("jp"),
            pl.col("s").str.json_decode("a INT, b STRING").struct.field("a").alias("ja"),
        )
    )[0]
    assert r == ("x", 1)


def test_str_encode_decode(pl, lf):
    f = lf(s=["hi"])
    r = rows(
        f.select(
            pl.col("s").str.encode("hex").alias("hx"),
            pl.col("s").str.encode("base64").alias("b64"),
        )
    )[0]
    assert r[0] == "6869"
    assert r[1] == "aGk="


# ---------------------------------------------------------------- .dt


def test_dt_parts(pl, lf):
    f = lf(t=[pd.Timestamp("2024-03-05 10:30:45.123456")])
    r = rows(
        f.select(
            pl.col("t").dt.year().alias("y"),
            pl.col("t").dt.quarter().alias("q"),
            pl.col("t").dt.month().alias("mo"),
            pl.col("t").dt.week().alias("w"),
            pl.col("t").dt.weekday().alias("wd"),  # 2024-03-05 is Tuesday -> 2
            pl.col("t").dt.day().alias("d"),
            pl.col("t").dt.ordinal_day().alias("od"),
            pl.col("t").dt.hour().alias("h"),
            pl.col("t").dt.minute().alias("mi"),
            pl.col("t").dt.second().alias("s"),
            pl.col("t").dt.millisecond().alias("ms"),
            pl.col("t").dt.microsecond().alias("us"),
        )
    )[0]
    assert r == (2024, 1, 3, 10, 2, 5, 65, 10, 30, 45, 123, 123456)


def test_dt_iso_year_weekday_sunday(pl, lf):
    f = lf(t=[pd.Timestamp("2021-01-01"), pd.Timestamp("2024-03-10")])  # Fri, Sun
    r = rows(f.select(pl.col("t").dt.iso_year().alias("iy"), pl.col("t").dt.weekday().alias("wd")))
    assert r[0] == (2020, 5)  # 2021-01-01 is ISO year 2020, Friday=5
    assert r[1][1] == 7  # Sunday=7


def test_dt_truncate_round(pl, lf):
    f = lf(t=[pd.Timestamp("2024-03-05 10:37:45")])
    r = rows(
        f.select(
            pl.col("t").dt.truncate("15m").alias("t15"),
            pl.col("t").dt.truncate("1h").alias("t1h"),
            pl.col("t").dt.truncate("1mo").alias("t1mo"),
            pl.col("t").dt.round("1h").alias("r1h"),
        )
    )[0]
    assert r[0] == pd.Timestamp("2024-03-05 10:30:00")
    assert r[1] == pd.Timestamp("2024-03-05 10:00:00")
    assert r[2] == pd.Timestamp("2024-03-01 00:00:00")
    assert r[3] == pd.Timestamp("2024-03-05 11:00:00")


def test_dt_offset_month_edges(pl, lf):
    f = lf(t=[pd.Timestamp("2024-01-31 12:00:00")])
    r = rows(
        f.select(
            pl.col("t").dt.offset_by("1mo").alias("mo"),
            pl.col("t").dt.offset_by("2d12h").alias("fixed"),
            pl.col("t").dt.month_start().alias("ms"),
            pl.col("t").dt.month_end().alias("me"),
        )
    )[0]
    assert r[0] == pd.Timestamp("2024-02-29 12:00:00")  # saturating add_months
    assert r[1] == pd.Timestamp("2024-02-03 00:00:00")
    assert r[2] == pd.Timestamp("2024-01-01 12:00:00")
    assert r[3] == pd.Timestamp("2024-01-31 12:00:00")


def test_dt_epoch_strftime(pl, lf):
    f = lf(t=[pd.Timestamp("1970-01-02 00:00:00")])
    r = rows(
        f.select(
            pl.col("t").dt.epoch("s").alias("es"),
            pl.col("t").dt.epoch("ms").alias("ems"),
            pl.col("t").dt.epoch("us").alias("eus"),
            pl.col("t").dt.epoch("d").alias("ed"),
            pl.col("t").dt.strftime("%Y/%m/%d %H:%M").alias("fmt"),
        )
    )[0]
    assert r == (86400, 86400000, 86400000000, 1, "1970/01/02 00:00")


def test_dt_is_leap_year_date(pl, lf):
    f = lf(t=[pd.Timestamp("2024-05-05 10:00:00"), pd.Timestamp("2023-05-05 10:00:00")])
    r = rows(f.select(pl.col("t").dt.is_leap_year().alias("ly"), pl.col("t").dt.date().alias("d")))
    assert r[0][0] is True and r[1][0] is False
    assert str(r[0][1]) == "2024-05-05"


# ---------------------------------------------------------------- .list


def test_list_get_oob_raises_by_default(pl, lf):
    # reference list.get default null_on_oob=False RAISES on an empty list
    import pytest as _pytest

    f = lf(a=[[3, 1, 2], []])
    with _pytest.raises(Exception, match="out of bounds"):
        f.select(pl.col("a").list.get(0)).collect()


def test_list_basics(pl, lf):
    f = lf(a=[[3, 1, 2], [5], []])
    r = rows(
        f.select(
            pl.col("a").list.len().alias("n"),
            pl.col("a").list.get(0, null_on_oob=True).alias("g0"),
            pl.col("a").list.first().alias("fst"),
            pl.col("a").list.last().alias("lst"),
            pl.col("a").list.contains(2).alias("has2"),
            pl.col("a").list.min().alias("mn"),
            pl.col("a").list.max().alias("mx"),
            pl.col("a").list.sum().alias("sm"),
            pl.col("a").list.mean().alias("me"),
        )
    )
    assert r[0] == (3, 3, 3, 2, True, 1, 3, 6.0, 2.0)
    assert r[1] == (1, 5, 5, 5, False, 5, 5, 5.0, 5.0)
    assert r[2] == (0, None, None, None, False, None, None, 0.0, None)


def test_list_sort_unique_slice(pl, lf):
    f = lf(a=[[3, 1, 2, 1]])
    pdf = f.select(
        pl.col("a").list.sort().alias("s"),
        pl.col("a").list.sort(descending=True).alias("sd"),
        pl.col("a").list.unique().alias("u"),
        pl.col("a").list.reverse().alias("rv"),
        pl.col("a").list.head(2).alias("hd"),
        pl.col("a").list.tail(2).alias("tl"),
        pl.col("a").list.n_unique().alias("nu"),
        pl.col("a").list.arg_max().alias("am"),
    ).collect()
    assert list(pdf["s"][0]) == [1, 1, 2, 3]
    assert list(pdf["sd"][0]) == [3, 2, 1, 1]
    assert sorted(pdf["u"][0]) == [1, 2, 3]
    assert list(pdf["rv"][0]) == [1, 2, 1, 3]
    assert list(pdf["hd"][0]) == [3, 1]
    assert list(pdf["tl"][0]) == [2, 1]
    assert pdf["nu"][0] == 3
    assert pdf["am"][0] == 0


def test_list_eval_filter(pl, lf):
    f = lf(a=[[1, 2, 3, 4]])
    pdf = f.select(
        pl.col("a").list.eval(pl.element() * 10).alias("e"),
        pl.col("a").list.filter(pl.element() % 2 == 0).alias("f"),
        pl.col("a").list.count_matches(2).alias("cm"),
    ).collect()
    assert list(pdf["e"][0]) == [10, 20, 30, 40]
    assert list(pdf["f"][0]) == [2, 4]
    assert pdf["cm"][0] == 1


def test_list_set_ops(pl, lf):
    f = lf(a=[[1, 2, 3]], b=[[2, 3, 4]])
    pdf = f.select(
        pl.col("a").list.set_union(pl.col("b")).alias("u"),
        pl.col("a").list.set_intersection(pl.col("b")).alias("i"),
        pl.col("a").list.set_difference(pl.col("b")).alias("d"),
        pl.col("a").list.set_symmetric_difference(pl.col("b")).alias("sd"),
    ).collect()
    assert sorted(pdf["u"][0]) == [1, 2, 3, 4]
    assert sorted(pdf["i"][0]) == [2, 3]
    assert sorted(pdf["d"][0]) == [1]
    assert sorted(pdf["sd"][0]) == [1, 4]


def test_list_join_median(pl, lf):
    f = lf(a=[["x", "y"]], b=[[1.0, 2.0, 3.0, 4.0]])
    pdf = f.select(
        pl.col("a").list.join("-").alias("j"),
        pl.col("b").list.median().alias("m"),
    ).collect()
    assert pdf["j"][0] == "x-y"
    assert pdf["m"][0] == 2.5


# ---------------------------------------------------------------- .struct / .bin / .name


def test_struct_ops(pl, lf):
    f = lf(a=[1], b=["x"])
    st = pl.struct(pl.col("a"), pl.col("b")).alias("s")
    pdf = (
        f.select(st)
        .select(
            pl.col("s").struct.field("a").alias("fa"),
            pl.col("s").struct.json_encode().alias("js"),
            pl.col("s").struct.rename_fields(["p", "q"]).alias("rn"),
            pl.col("s").struct.prefix_fields("x_").alias("px"),
        )
        .collect()
    )
    assert pdf["fa"][0] == 1
    assert pdf["js"][0] == '{"a":1,"b":"x"}'
    assert pdf["rn"][0] == {"p": 1, "q": "x"}
    assert pdf["px"][0] == {"x_a": 1, "x_b": "x"}


def test_bin_ops(pl, lf):
    f = lf(s=["hi"])
    r = rows(
        f.select(
            pl.col("s").cast("Binary").bin.size().alias("n"),
            pl.col("s").cast("Binary").bin.encode("hex").alias("hx"),
            pl.col("s").cast("Binary").bin.starts_with(pl.lit("h").cast("Binary")).alias("sw"),
        )
    )[0]
    assert r[0] == 2 and r[1] == "6869" and r[2] is True


def test_name_ns(pl, lf):
    f = lf(abc=[1])
    out = f.select(
        pl.col("abc").name.prefix("p_"),
        pl.col("abc").name.suffix("_s"),
        pl.col("abc").name.to_uppercase(),
    )
    assert out.columns == ["p_abc", "abc_s", "ABC"]


def test_list_shift_diff_gather(pl, lf):
    f = lf(a=[[1, 2, 4, 8]])
    pdf = f.select(
        pl.col("a").list.shift(1).alias("sh"),
        pl.col("a").list.shift(-1).alias("shn"),
        pl.col("a").list.diff().alias("df"),
        pl.col("a").list.gather(pl.lit([2, 0])).alias("ga"),
        pl.col("a").list.to_struct(fields=["p", "q", "r", "s"]).alias("st"),
    ).collect()
    def denan(xs):
        return [None if pd.isna(v) else int(v) for v in xs]

    assert denan(pdf["sh"][0]) == [None, 1, 2, 4]
    assert denan(pdf["shn"][0]) == [2, 4, 8, None]
    assert denan(pdf["df"][0]) == [None, 1, 2, 4]
    assert list(pdf["ga"][0]) == [4, 1]
    assert pdf["st"][0] == {"p": 1, "q": 2, "r": 4, "s": 8}


def test_rolling_by_expr(pl, lf):
    import pandas as pd

    ts = [pd.Timestamp("2024-01-01 00:00"), pd.Timestamp("2024-01-01 00:20"), pd.Timestamp("2024-01-01 00:50")]
    f = lf(ts=ts, g=["a"] * 3, v=[1.0, 2.0, 4.0])
    out = f.with_columns(
        pl.col("v").rolling_sum_by("ts", "30m").over("g").alias("rs"),
    )
    r = rows(out, sort_by="ts")
    # (t-30m, t]: the 00:50 window starts exactly at 00:20, which is excluded
    assert [t[3] for t in r] == [1.0, 3.0, 4.0]


def test_dataframe_constructor(pl):
    f = pl.DataFrame({"x": [1, 2]})
    assert f.collect()["x"].tolist() == [1, 2]


def test_str_split_inclusive(pl, lf):
    f = lf(s=["a,b,c", "x", "a,b,"])
    r = rows(f.select(pl.col("s").str.split(",", inclusive=True).alias("p")))
    assert list(r[0][0]) == ["a,", "b,", "c"]
    assert list(r[1][0]) == ["x"]
    assert list(r[2][0]) == ["a,", "b,", ""]


def test_str_replace_n(pl, lf):
    f = lf(s=["a-b-c-d"])
    r = rows(
        f.select(
            pl.col("s").str.replace("-", "_", n=2).alias("two"),
            pl.col("s").str.replace("-", "_", literal=True, n=3).alias("three"),
        )
    )
    assert r[0][0] == "a_b_c-d"
    assert r[0][1] == "a_b_c_d"


def test_enum_cast_validation(pl, lf):
    import pytest as _pytest

    f = lf(s=["lo", "hi", None])
    dt = pl.Enum(["lo", "mid", "hi"])
    ok = rows(f.select(pl.col("s").cast(dt).alias("e")))
    assert [t[0] for t in ok] == ["lo", "hi", None]
    bad = lf(s=["lo", "nope"])
    # non-strict: unknown category -> null
    r = rows(bad.select(pl.col("s").cast(dt, strict=False).alias("e")))
    assert sorted([t[0] for t in r], key=str) == ["lo", "None"] or [t[0] for t in r] == ["lo", None]
    # strict: raises at execution
    with _pytest.raises(Exception, match="enum"):
        bad.select(pl.col("s").cast(dt).alias("e")).collect()


def test_str_join_and_extract_many(pl, lf):
    f = lf(g=["a", "a", "b"], s=["x", "y", "z"]).set_sorted("s")
    out = f.group_by("g").agg(pl.col("s").str.join("-").alias("j")).sort("g").collect()
    assert out["j"].tolist() == ["x-y", "z"]
    f2 = lf(s=["the cat and the dog"])
    em = f2.select(pl.col("s").str.extract_many(["cat", "dog", "the"]).alias("m")).collect()
    assert list(em["m"][0]) == ["the", "cat", "the", "dog"]


def test_dt_new_accessors(pl, lf):
    import pandas as pd

    f = lf(t=pd.to_datetime(["2024-02-15 10:30:45"]))
    r = f.select(
        pl.col("t").dt.century().alias("c"),
        pl.col("t").dt.millennium().alias("m"),
        pl.col("t").dt.days_in_month().alias("dim"),
        pl.col("t").dt.is_business_day().alias("biz"),
        pl.col("t").dt.add_business_days(3).alias("abd"),
        pl.col("t").dt.replace(year=2000, minute=0).alias("rep"),
    ).collect().to_dict("records")[0]
    assert (r["c"], r["m"], r["dim"], r["biz"]) == (21, 3, 29, True)
    assert str(r["abd"]) == "2024-02-20"
    assert str(r["rep"]) == "2000-02-15 10:00:45"


def test_list_std_var_item_gather_every(pl, lf):
    import math

    f = lf(l=[[1.0, 5.0, 3.0, None]], one=[[7.0]])
    r = f.select(
        pl.col("l").list.std().alias("sd"),
        pl.col("l").list.var().alias("vr"),
        pl.col("l").list.drop_nulls().alias("dn"),
        pl.col("l").list.gather_every(2).alias("ge"),
        pl.col("one").list.item().alias("it"),
        pl.col("l").list.item().alias("it_bad"),
    ).collect().to_dict("records")[0]
    assert abs(r["vr"] - 4.0) < 1e-12 and abs(r["sd"] - 2.0) < 1e-12
    assert list(r["dn"]) == [1.0, 5.0, 3.0]
    assert list(r["ge"]) == [1.0, 3.0]
    assert r["it"] == 7.0
    import pandas as pd

    assert pd.isna(r["it_bad"])


def test_bin_byte_ops(pl, lf):
    f = lf(h=["68656c6c6f"]).with_columns(pl.col("h").str.decode("hex").alias("raw"))
    r = f.select(
        pl.col("raw").bin.get(0).alias("g0"),
        pl.col("raw").bin.get(-1).alias("gl"),
        pl.col("raw").bin.head(2).alias("hd"),
        pl.col("raw").bin.tail(2).alias("tl"),
        pl.col("raw").bin.slice(1, 3).alias("sl"),
        pl.col("raw").bin.get(99).alias("oob"),
    ).collect().to_dict("records")[0]
    assert bytes(r["g0"]) == b"h" and bytes(r["gl"]) == b"o"
    assert bytes(r["hd"]) == b"he" and bytes(r["tl"]) == b"lo" and bytes(r["sl"]) == b"ell"
    assert r["oob"] is None


def test_struct_drop_and_cat_delegation(pl, lf):
    f = lf(s=["hello"]).with_columns(pl.struct(a=pl.lit(1), b=pl.lit(2), c=pl.lit(3)).alias("st"))
    assert f.select(pl.col("st").struct.drop("b", "c").alias("d")).collect()["d"].tolist() == [{"a": 1}]
    r = f.select(
        pl.col("s").cat.starts_with("he").alias("sw"),
        pl.col("s").cat.len_chars().alias("lc"),
        pl.col("s").cat.physical().alias("ph"),
    ).collect().to_dict("records")[0]
    assert r == {"sw": True, "lc": 5, "ph": "hello"}


def test_str_explode_and_list_agg(pl, lf):
    f = lf(g=["a", "a"], s=["hi", "yo"], l=[[1.0, 2.0], [3.0]]).set_sorted("s")
    out = f.group_by("g").agg(pl.col("s").str.explode().alias("ch")).collect()
    assert list(out["ch"][0]) == ["h", "i", "y", "o"]
    ev = f.select(pl.col("l").list.agg(pl.element() * 10).alias("e")).collect()
    assert [list(v) for v in ev["e"]] == [[10.0, 20.0], [30.0]]


def test_struct_unnest_expr(pl, lf):
    f = lf(a=[1, 2]).select(
        "a",
        pl.struct(pl.col("a").alias("x"), (pl.col("a") * 10).alias("y")).alias("s"),
    )
    out = f.select("a", pl.col("s").struct.unnest()).collect()
    assert sorted(out.columns) == ["a", "x", "y"]
    assert out.sort_values("a")["y"].tolist() == [10, 20]


def test_str_replace_n_with_group_refs(pl, lf):
    f = lf(s=["ab12cd34ef56gh", "x9y", "none", "77"])
    out = rows(
        f.select(pl.col("s").str.replace(r"(\d)(\d)", "<$2$1>", n=2).alias("r")),
        sort_by="r",
    )
    got = sorted(r[0] for r in out)
    # first two matches replaced with swapped groups; the third match and
    # non-matching strings untouched
    assert got == sorted(["ab<21>cd<43>ef56gh", "x9y", "none", "<77>"])


def test_add_business_days_expr_n(pl, lf):
    import datetime as dt

    f = lf(d=[dt.date(2024, 1, 5), dt.date(2024, 1, 5), dt.date(2024, 1, 8)],
           n=[1, -1, 3])
    out = rows(f.select(pl.col("d").dt.add_business_days(pl.col("n")).alias("r"),
                        pl.col("n")), sort_by="n")
    got = {r[1]: r[0] for r in out}
    assert got[1] == dt.date(2024, 1, 8)    # Fri +1bd -> Mon
    assert got[-1] == dt.date(2024, 1, 4)   # Fri -1bd -> Thu
    assert got[3] == dt.date(2024, 1, 11)   # Mon +3bd -> Thu


def test_list_sample_with_replacement(pl, lf):
    f = lf(l=[[1, 2, 3], [10], []])
    out = rows(f.select(pl.col("l").list.sample(5, with_replacement=True, seed=7).alias("s")))
    vals = [list(r[0]) if r[0] is not None else None for r in out]
    by_len = sorted((v for v in vals if v is not None), key=len)
    assert by_len[0] == [10] * 5 or by_len[1] == [10] * 5  # single-elem list repeats
    big = [v for v in vals if v is not None and set(v) <= {1, 2, 3}][0]
    assert len(big) == 5 and set(big) <= {1, 2, 3}
    assert None in vals  # empty list -> null
    # seeded: identical across runs
    out2 = rows(f.select(pl.col("l").list.sample(5, with_replacement=True, seed=7).alias("s")))
    assert [list(r[0]) if r[0] is not None else None for r in out2] == vals


def test_replace_many_dict_and_list_index_of(pl, lf):
    f = lf(s=["a b c"], l=[[5, 7]])
    assert f.select(pl.col("s").str.replace_many({"a": "1", "c": "3"})).item() == "1 b 3"
    assert f.select(pl.col("l").list.index_of(7)).item() == 1
    assert f.select(pl.col("l").list.index_of(9)).rows() == [(None,)]


def test_str_expression_valued_params(pl, lf):
    """Numeric str-namespace params accept Expr or bare column names
    (polars IntoExprColumn); find/split accept expression patterns."""
    f = lf(txt=["hello world"], pat=["wor"], idx=[2], n=[3], length=[8])
    assert f.select(pl.col("txt").str.find(pl.col("pat"))).item() == 6
    assert f.select(pl.col("txt").str.find(pl.col("pat"), literal=True)).item() == 6
    assert f.select(pl.col("txt").str.slice("idx", length=3)).item() == "llo"
    assert f.select(pl.col("txt").str.tail("n")).item() == "rld"
    g = lf(s=["-7"], l=[5])
    assert g.select(pl.col("s").str.zfill("l")).item() == "-0007"
    h = lf(s=["a1b22c"], by=[r"\d+"])
    assert h.select(pl.col("s").str.split(by=pl.col("by"), literal=False)).item() == ["a", "b", "c"]
    assert lf(b=["110"]).select(pl.col("b").str.to_integer(base=2, dtype=pl.Int32)).schema["b"] == "int"


def test_list_param_tail(pl, lf):
    assert lf(a=[[1, 2, 3]]).select(pl.col("a").list[0]).item() == 1
    assert lf(a=[[1, 2, 3]]).select(pl.col("a").list[1:3]).item() == [2, 3]
    assert lf(a=[[], [5]]).select(pl.col("a").list.item(allow_empty=True)).to_series().to_list() == [None, 5]
    assert lf(n=[[1, 3, 6, 10]]).select(pl.col("n").list.diff(n=2, null_behavior="drop")).item() == [5, 7]
    assert lf(a=[[1, 2]]).select(pl.col("a").list.gather([0, 4], null_on_oob=True)).item() == [1, None]
    assert lf(a=[[1], []]).select(pl.col("a").list.explode(empty_as_null=False)).to_series().to_list() == [1]
    assert lf(a=[[1, 2]], b=[9]).select(pl.col("a").list.concat("b")).item() == [1, 2, 9]


def test_concat_align_right_and_horizontal_extend(pl, lf):
    a = lf(k=[1, 2], v=[1, 1])
    b = lf(k=[2, 3], w=[2, 2])
    assert pl.concat([a, b], how="align_right").rows() == [(2, 1, 2), (3, None, 2)]
    assert pl.concat([lf(a=[1, 2]), lf(b=[9])], how="horizontal_extend").rows() == [(1, 9), (2, None)]


def test_name_namespace_tail(pl, lf):
    f = lf(n_foo=[1])
    assert f.select(pl.all().name.replace(r"^n_", "col_")).columns == ["col_foo"]
    g = lf(a=[1])
    assert g.select(
        pl.struct(x=pl.col("a")).alias("s").name.prefix_fields("p_")
    ).rows() == [({"p_x": 1},)]
    assert g.select(
        pl.struct(x=pl.col("a")).alias("s").name.map_fields(lambda x: x.upper())
    ).rows() == [({"X": 1},)]


def test_expr_selector_right_operand(pl, lf):
    # pl.lit(10) / pl.all() — selector on the RIGHT of a binary op
    f = lf(a=[2], b=[4])
    assert f.select((pl.lit(10) / pl.all()).name.keep()).rows() == [(5.0, 2.5)]


def test_struct_field_forms(pl, lf):
    f = lf(a=[1], b=["x"], c=[2]).select(pl.struct(pl.all()).alias("s"))
    assert f.select(pl.col("s").struct[0]).item() == 1
    assert f.select(pl.col("s").struct.field("a", "c")).columns == ["a", "c"]
    assert f.select(pl.col("s").struct.field("*")).columns == ["a", "b", "c"]
    assert f.select(pl.col("s").struct.field("^[ab]$")).columns == ["a", "b"]


def test_bin_arr_tail_params(pl, lf):
    f = lf(d=[b"xxxx"])
    assert f.select(pl.col("d").cast(pl.Binary).bin.size("kb")).item() == 4 / 1024
    g = lf(arr=[[9, 8]], idx=[1], sep=["-"])
    assert g.select(pl.col("arr").arr.get("idx", null_on_oob=True)).item() == 8
    assert g.select(pl.col("arr").arr.to_list()).item() == [9, 8]
    h = lf(s=[["a", "b"]], separator=["-"])
    assert h.select(pl.col("s").arr.join(pl.col("separator"))).item() == "a-b"
    assert lf(n=[[1, 2]]).select(
        pl.col("n").list.to_struct(fields=lambda i: f"n{i}")
    ).rows() == [({"n0": 1, "n1": 2},)]
    assert lf(end=[3]).select(pl.int_ranges("end")).item() == [0, 1, 2]
