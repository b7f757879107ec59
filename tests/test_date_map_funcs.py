"""Date family (add_months / months_between / trunc / next_day) and
array/map constructors (split / str_to_map / map_concat / concat_ws) vs
pandas-python oracles.

Reference surface: spark_dates.rs:1177, spark_map.rs:1516,
spark_strings.rs (concat_ws/split)."""

import datetime

import numpy as np
import pandas as pd
import pytest

from auron_tpu import TableBlock
from auron_tpu.expr import col, lit, evaluate
from auron_tpu.expr.eval import materialize, project_block
from auron_tpu.expr.nodes import func
from auron_tpu.plan import Session
from auron_tpu.plan.builder import table

EPOCH = datetime.date(1970, 1, 1)


def _days(d):
    return (d - EPOCH).days


def mkblock(**data):
    return TableBlock.from_pandas(pd.DataFrame(data))


def mkdates(**cols):
    """date32 blocks (datetime64 passes through pandas as [s]/[ns], which
    infers timestamp64 — force DATE32 like the engine's scan boundary)."""
    from auron_tpu.dtypes import DATE32
    data = {k: np.asarray(v, dtype="datetime64[D]").astype(np.int32)
            for k, v in cols.items()}
    return TableBlock.from_numpy(data, dtypes={k: DATE32 for k in cols})


def out(block, expr, name="_c"):
    res = project_block(block, [expr.alias(name)])
    res = TableBlock(res.columns, block.row_mask)
    return res.to_pandas()[name]


DATES = [datetime.date(2020, 1, 31), datetime.date(2019, 2, 28),
         datetime.date(2000, 12, 15), datetime.date(1999, 6, 1)]


def test_add_months():
    b = mkdates(d=np.array(DATES, dtype="datetime64[D]"))
    got = out(b, func("add_months", col("d"), params=(1,)))
    # Jan 31 + 1mo -> Feb 29 2020 (leap clamp); Feb 28 + 1 -> Mar 28
    want = [datetime.date(2020, 2, 29), datetime.date(2019, 3, 28),
            datetime.date(2001, 1, 15), datetime.date(1999, 7, 1)]
    assert [x.date() for x in got] == want
    got = out(b, func("add_months", col("d"), params=(-13,)))
    want = [datetime.date(2018, 12, 31), datetime.date(2018, 1, 28),
            datetime.date(1999, 11, 15), datetime.date(1998, 5, 1)]
    assert [x.date() for x in got] == want


def test_months_between():
    b = mkdates(
        a=np.array(["2020-03-31", "2020-03-15", "2020-01-01"],
                   dtype="datetime64[D]"),
        b_=np.array(["2020-01-31", "2020-01-15", "2020-03-11"],
                    dtype="datetime64[D]"))
    got = out(b, func("months_between", col("a"), col("b_")))
    # both month-ends -> 2.0; same day -> 2.0; fractional 31-day rule
    np.testing.assert_allclose(
        got.to_numpy(),
        [2.0, 2.0, -2.0 + (1 - 11) / 31.0], atol=1e-8)  # roundOff=8 digits


def test_trunc_and_next_day():
    b = mkdates(d=np.array(["2020-08-17"], dtype="datetime64[D]"))  # Monday
    assert out(b, func("trunc", col("d"), params=("year",)))[0].date() == \
        datetime.date(2020, 1, 1)
    assert out(b, func("trunc", col("d"), params=("month",)))[0].date() == \
        datetime.date(2020, 8, 1)
    assert out(b, func("trunc", col("d"), params=("quarter",)))[0].date() \
        == datetime.date(2020, 7, 1)
    assert out(b, func("trunc", col("d"), params=("week",)))[0].date() == \
        datetime.date(2020, 8, 17)  # already Monday
    assert out(b, func("next_day", col("d"), params=("Mon",)))[0].date() \
        == datetime.date(2020, 8, 24)
    assert out(b, func("next_day", col("d"), params=("Sunday",)))[0].date() \
        == datetime.date(2020, 8, 23)
    assert out(b, func("next_day", col("d"),
                       params=("noday",))).isna().all()


def test_concat_ws_skips_nulls():
    b = mkblock(a=["x", None, "z", None],
                b_=["1", "2", None, None])
    got = out(b, func("concat_ws", col("a"), col("b_"), params=("-",)))
    assert got.tolist() == ["x-1", "2", "z", ""]


def test_split_and_element_at():
    s = Session()
    s.register_pandas("t", pd.DataFrame(
        {"s": ["a,b,c", "x", "", "a,b"]}))
    f = (table(s, "t").block_transform("split", "parts", "s", ",")
         .select(n=func("size", params=("parts",)),
                 first=func("element_at_array", params=("parts", 1)),
                 last=func("element_at_array", params=("parts", -1))))
    got = f.collect()
    assert got["n"].tolist() == [3, 1, 1, 2]
    assert got["first"].tolist() == ["a", "x", "", "a"]
    assert got["last"].tolist() == ["c", "x", "", "b"]


def test_str_to_map_and_get():
    s = Session()
    s.register_pandas("t", pd.DataFrame(
        {"s": ["a:1,b:2", "b:9", "c:7,a:0"]}))
    f = (table(s, "t").block_transform("str_to_map", "m", "s")
         .select(a=func("map_get", params=("m", "a")),
                 b=func("map_get", params=("m", "b"))))
    got = f.collect()
    assert got["a"].fillna("?").tolist() == ["1", "?", "0"]
    assert got["b"].fillna("?").tolist() == ["2", "9", "?"]


def test_map_concat_last_wins():
    s = Session()
    s.register_pandas("t", pd.DataFrame(
        {"s1": ["a:1,b:2", "a:5"], "s2": ["b:9", "c:3"]}))
    f = (table(s, "t")
         .block_transform("str_to_map", "m1", "s1")
         .block_transform("str_to_map", "m2", "s2")
         .block_transform("map_concat", "m", "m1", "m2")
         .select(a=func("map_get", params=("m", "a")),
                 b=func("map_get", params=("m", "b")),
                 c=func("map_get", params=("m", "c"))))
    got = f.collect()
    assert got["a"].fillna("?").tolist() == ["1", "5"]
    assert got["b"].fillna("?").tolist() == ["9", "?"]  # m2 wins on b
    assert got["c"].fillna("?").tolist() == ["?", "3"]


def test_make_array_and_union():
    s = Session()
    s.register_pandas("t", pd.DataFrame(
        {"a": np.array([1, 2, 3], np.int64),
         "b": np.array([2, 5, 3], np.int64),
         "c": np.array([9, 2, 3], np.int64)}))
    f = (table(s, "t")
         .block_transform("make_array", "x", "a", "b")
         .block_transform("make_array", "y", "b", "c")
         .block_transform("array_union", "u", "x", "y")
         .select(n=func("size", params=("u",)),
                 first=func("element_at_array", params=("u", 1)),
                 second=func("element_at_array", params=("u", 2))))
    got = f.collect()
    # row0: [1,2] U [2,9] = [1,2,9]; row1: [2,5] U [5,2] = [2,5];
    # row2: [3,3] U [3,3] = [3]
    assert got["n"].tolist() == [3, 2, 1]
    assert got["first"].tolist() == [1, 2, 3]
    assert got["second"].tolist()[:2] == [2, 5]


def test_make_array_strings_union():
    s = Session()
    s.register_pandas("t", pd.DataFrame(
        {"a": ["x", "y"], "b": ["y", "y"], "c": ["z", "w"]}))
    f = (table(s, "t")
         .block_transform("make_array", "p", "a", "b")
         .block_transform("make_array", "q", "b", "c")
         .block_transform("array_union", "u", "p", "q")
         .select(n=func("size", params=("u",)),
                 first=func("element_at_array", params=("u", 1))))
    got = f.collect()
    # row0: [x,y] U [y,z] = [x,y,z]; row1: [y,y] U [y,w] = [y,w]
    assert got["n"].tolist() == [3, 2]
    assert got["first"].tolist() == ["x", "y"]


def test_repeat_and_space():
    b = mkblock(a=["ab", "c", None])
    got = out(b, func("repeat", col("a"), params=(3,)))
    assert got.tolist()[:2] == ["ababab", "ccc"]
    s = Session()
    s.register_pandas("t", pd.DataFrame({"n": np.array([0, 2, 5],
                                                       np.int64)}))
    f = table(s, "t").select(sp=func("space", col("n")))
    assert f.collect()["sp"].tolist() == ["", "  ", "     "]


# -- CalendarInterval arithmetic (interval_add kernel + SQL INTERVAL) --------

def test_interval_add_months_clamps():
    b = mkdates(d=np.array(DATES, dtype="datetime64[D]"))
    got = out(b, func("interval_add", col("d"), params=(1, 3, 0, 1)))
    # +1 month (clamped) then +3 days
    want = [pd.Timestamp(d) + pd.DateOffset(months=1) + pd.Timedelta(days=3)
            for d in DATES]
    assert [x.date() for x in got] == [w.date() for w in want]
    # subtraction via sign=-1: -(1 year) applied as -(12 months)
    got = out(b, func("interval_add", col("d"), params=(12, 0, 0, -1)))
    want = [pd.Timestamp(d) - pd.DateOffset(years=1) for d in DATES]
    assert [x.date() for x in got] == [w.date() for w in want]


def test_interval_add_date_promotes_to_timestamp():
    b = mkdates(d=np.array(DATES, dtype="datetime64[D]"))
    got = out(b, func("interval_add", col("d"),
                      params=(0, 1, 6 * 3_600_000_000, 1)))
    want = [pd.Timestamp(d) + pd.Timedelta(days=1, hours=6) for d in DATES]
    assert got.tolist() == want


def test_interval_add_timestamp_keeps_time_of_day():
    from auron_tpu.dtypes import TIMESTAMP64
    ts = [pd.Timestamp("2020-01-31 13:45:10"),
          pd.Timestamp("1999-12-31 23:59:59")]
    us = np.array([t.value // 1000 for t in ts], np.int64)
    b = TableBlock.from_numpy({"t": us}, dtypes={"t": TIMESTAMP64})
    got = out(b, func("interval_add", col("t"), params=(1, 0, 0, 1)))
    want = [t + pd.DateOffset(months=1) for t in ts]
    assert got.tolist() == want


def test_sql_interval_units():
    import auron_tpu.sql  # noqa: F401  installs Session.sql
    dates = pd.DataFrame({
        "d": pd.to_datetime(["2020-01-31", "2019-02-28", "2000-06-15"]),
        "k": np.array([1, 2, 3], np.int64)})
    s = Session()
    s.register_pandas("t", dates)
    got = s.sql("SELECT k, d + INTERVAL 1 MONTH AS m, "
                "d - INTERVAL 2 YEARS AS y, "
                "d + INTERVAL 1 WEEK AS w FROM t")
    base = dates["d"]
    pd.testing.assert_series_equal(
        got["m"], base + pd.DateOffset(months=1), check_names=False)
    pd.testing.assert_series_equal(
        got["y"], base - pd.DateOffset(years=2), check_names=False)
    pd.testing.assert_series_equal(
        got["w"], base + pd.Timedelta(days=7), check_names=False)


def test_sql_interval_mixed_units_where():
    import auron_tpu.sql  # noqa: F401
    dates = pd.DataFrame({
        "d": pd.to_datetime(["2020-01-01", "2020-03-05", "2020-06-01"]),
        "v": np.array([10, 20, 30], np.int64)})
    s = Session()
    s.register_pandas("t", dates)
    got = s.sql("SELECT v FROM t WHERE d < DATE '2020-01-01' "
                "+ INTERVAL 2 MONTHS 10 DAYS")
    lim = pd.Timestamp("2020-01-01") + pd.DateOffset(months=2, days=10)
    want = dates[dates["d"] < lim]["v"]
    assert sorted(got["v"].tolist()) == sorted(want.tolist())


# -- remaining ScalarFunction enum built-ins (auron.proto:218-297) ------------

def _proj1(df, expr, dtypes=None):
    from auron_tpu import TableBlock
    from auron_tpu.expr.eval import project_block
    b = TableBlock.from_pandas(df) if dtypes is None else \
        TableBlock.from_pandas(df, dtypes)
    out = project_block(b, [expr.alias("o")])
    return TableBlock(out.columns, b.row_mask).to_pandas()["o"]


def test_enum_builtin_string_kernels():
    import pandas as pd
    df = pd.DataFrame({"s": ["Hello World", "  pad  ", "a,b", "", "x$1y"]})
    got = _proj1(df, func("left", col("s"), params=(3,)))
    assert got.tolist() == [s[:3] for s in df["s"]]
    got = _proj1(df, func("right", col("s"), params=(3,)))
    assert got.tolist() == [s[-3:] if s else "" for s in df["s"]]
    got = _proj1(df, func("btrim", col("s")))
    assert got.tolist() == [s.strip() for s in df["s"]]
    got = _proj1(df, func("octet_length", col("s")))
    assert got.tolist() == [len(s.encode()) for s in df["s"]]
    got = _proj1(df, func("bit_length", col("s")))
    assert got.tolist() == [8 * len(s.encode()) for s in df["s"]]
    got = _proj1(df, func("regexp_replace", col("s"),
                          params=("o", "0")))
    assert got.tolist() == [s.replace("o", "0") for s in df["s"]]
    got = _proj1(df, func("regexp_extract", col("s"),
                          params=(r"(\w+) (\w+)", 2)))
    assert got.tolist() == ["World", "", "", "", ""]
    got = _proj1(df, func("find_in_set", col("s"),
                          params=("a,b,Hello World",)))
    # probe with a comma ("a,b") -> 0 even though it appears in the list
    assert got.tolist() == [3, 0, 0, 0, 0]
    got = _proj1(pd.DataFrame({"s": ["b", "ab,cd", "zz"]}),
                 func("find_in_set", col("s"), params=("ab,b,zz",)))
    assert got.tolist() == [2, 0, 3]
    got = _proj1(df, func("hex", col("s")))
    assert got.tolist() == [s.encode().hex().upper() for s in df["s"]]


def test_enum_builtin_levenshtein_chr_factorial():
    import numpy as np
    import pandas as pd
    df = pd.DataFrame({"a": ["kitten", "flaw", "", "same"],
                       "b": ["sitting", "lawn", "abc", "same"]})
    got = _proj1(df, func("levenshtein", col("a"), col("b")))
    assert got.tolist() == [3, 2, 3, 0]
    df2 = pd.DataFrame({"n": np.array([65, 97, 0, -5, 321], np.int64)})
    got = _proj1(df2, func("chr", col("n")))
    assert got.tolist() == ["A", "a", "", "", "A"]  # 321 % 256 == 65
    got = _proj1(df2, func("factorial", col("n")))
    assert got.tolist()[2] == 1  # 0! = 1
    assert pd.isna(got.iloc[3]) and pd.isna(got.iloc[4])  # <0 / >20 -> NULL
    assert pd.isna(_proj1(df2, func("factorial", col("n"))).iloc[4])


def test_enum_builtin_log_nvl2_make_date():
    import numpy as np
    import pandas as pd
    df = pd.DataFrame({"x": np.array([8.0, 1.0, -1.0], np.float64),
                       "b": np.array([2.0, 10.0, 2.0], np.float64)})
    got = _proj1(df, func("log", col("b"), col("x")))
    assert abs(got.iloc[0] - 3.0) < 1e-12
    assert pd.isna(got.iloc[2])  # log of negative -> NULL
    df2 = pd.DataFrame({"a": pd.array([1, None, 3], dtype="Int64"),
                        "y": np.array([10, 20, 30], np.int64),
                        "z": np.array([-1, -2, -3], np.int64)})
    got = _proj1(df2, func("nvl2", col("a"), col("y"), col("z")))
    assert got.tolist() == [10, -2, 30]
    df3 = pd.DataFrame({"y": np.array([2024, 2023, 2023], np.int64),
                        "m": np.array([2, 2, 13], np.int64),
                        "d": np.array([29, 29, 1], np.int64)})
    got = _proj1(df3, func("make_date", col("y"), col("m"), col("d")))
    assert str(got.iloc[0])[:10] == "2024-02-29"
    assert pd.isna(got.iloc[1]) and pd.isna(got.iloc[2])  # invalid dates


def test_enum_builtin_date_trunc():
    import numpy as np
    import pandas as pd
    ts = pd.to_datetime(["2024-05-17 13:45:33.123456",
                         "1969-12-31 23:59:59.000000"])
    df = pd.DataFrame({"t": ts})
    for unit, pandas_freq in (("hour", "h"), ("day", "D"),
                              ("minute", "min")):
        got = _proj1(df, func("date_trunc", col("t"), params=(unit,)))
        want = ts.floor(pandas_freq)
        assert pd.to_datetime(got).tolist() == want.tolist(), unit
    got = _proj1(df, func("date_trunc", col("t"), params=("month",)))
    assert str(pd.to_datetime(got.iloc[0]))[:10] == "2024-05-01"
    assert str(pd.to_datetime(got.iloc[1]))[:10] == "1969-12-01"
    got = _proj1(df, func("date_trunc", col("t"), params=("week",)))
    assert str(pd.to_datetime(got.iloc[0]))[:10] == "2024-05-13"  # Monday
