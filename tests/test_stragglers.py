"""ScalarFunction-enum stragglers + ANSI interval columns (round-2 verdict
missing #7; reference auron.proto:218-297: Digest=7, DatePart=28,
ToTimestampMillis/Micros/Seconds=56-58, Now=59)."""

import time

import numpy as np
import pandas as pd
import pytest

import auron_tpu.sql  # noqa: F401
from auron_tpu.expr.nodes import col, func, lit
from auron_tpu.plan import Session


@pytest.fixture
def sess():
    s = Session()
    s.register_pandas("t", pd.DataFrame({
        "d": pd.to_datetime(["2001-03-15", "1999-12-31", "2000-02-29"]),
        "ts": pd.to_datetime(["2001-03-15 13:45:30", "1999-12-31 23:59:59",
                              "2000-02-29 06:00:00"]),
        "sec": np.array([981173106, 0, 1234567890], np.int64),
        "s": ["abc", "", "hello world"],
    }))
    return s


def test_date_part(sess):
    got = sess.sql(
        "SELECT date_part('year', d) AS y, date_part('quarter', d) AS q, "
        "date_part('month', d) AS m, date_part('day', d) AS dd, "
        "date_part('dow', d) AS w, date_part('hour', ts) AS h, "
        "date_part('minute', ts) AS mi, date_part('second', ts) AS se "
        "FROM t")
    assert got["y"].tolist() == [2001, 1999, 2000]
    assert got["q"].tolist() == [1, 4, 1]
    assert got["m"].tolist() == [3, 12, 2]
    assert got["dd"].tolist() == [15, 31, 29]
    assert got["h"].tolist() == [13, 23, 6]
    assert got["mi"].tolist() == [45, 59, 0]
    assert got["se"].tolist() == [30, 59, 0]


def test_date_part_epoch_and_ts_fields(sess):
    got = sess.sql("SELECT date_part('epoch', ts) AS e, "
                   "date_part('year', ts) AS y FROM t")
    want = [pd.Timestamp(x).timestamp() for x in
            ("2001-03-15 13:45:30", "1999-12-31 23:59:59",
             "2000-02-29 06:00:00")]
    assert np.allclose(got["e"], want)
    assert got["y"].tolist() == [2001, 1999, 2000]


def test_digest(sess):
    import hashlib
    got = sess.sql("SELECT digest(s, 'sha256') AS h, "
                   "digest(s, 'md5') AS m, digest(s, 'blake2b') AS b "
                   "FROM t")
    for i, s in enumerate(["abc", "", "hello world"]):
        assert got["h"][i] == hashlib.sha256(s.encode()).hexdigest()
        assert got["m"][i] == hashlib.md5(s.encode()).hexdigest()
        assert got["b"][i] == hashlib.blake2b(s.encode()).hexdigest()


def test_to_timestamp_units(sess):
    got = sess.sql(
        "SELECT to_timestamp_seconds(sec) AS a, "
        "to_timestamp_millis(sec) AS b, to_timestamp_micros(sec) AS c, "
        "to_timestamp_millis(ts) AS d FROM t")
    secs = [981173106, 0, 1234567890]
    assert [v.timestamp() for v in got["a"]] == [float(x) for x in secs]
    assert [int(v.value) for v in got["b"]] == [x * 10**6 for x in secs]
    assert [int(v.value) for v in got["c"]] == [x * 10**3 for x in secs]
    # truncation to millis drops sub-ms (none here, values equal)
    assert got["d"][0] == pd.Timestamp("2001-03-15 13:45:30")


def test_now(sess):
    t0 = time.time()
    got = sess.sql("SELECT now() AS n FROM t")
    t1 = time.time()
    vals = got["n"].astype(np.int64) // 10**6  # seconds
    assert all(t0 - 2 <= v <= t1 + 2 for v in vals)
    assert len(set(got["n"])) == 1  # constant across rows


def test_interval_dt_column_storage_and_agg():
    td = pd.to_timedelta(["1 days 02:00:00", "0 days 00:00:30",
                          "2 days", None])
    s = Session()
    s.register_pandas("t", pd.DataFrame({
        "g": np.array([1, 1, 2, 2], np.int64), "iv": td}))
    got = s.sql("SELECT g, SUM(iv) AS tot, MIN(iv) AS lo, MAX(iv) AS hi "
                "FROM t GROUP BY g ORDER BY g")
    assert got["tot"].tolist() == [pd.Timedelta("1 days 02:00:30"),
                                   pd.Timedelta("2 days")]
    assert got["lo"].tolist() == [pd.Timedelta("30s"),
                                  pd.Timedelta("2 days")]
    assert got["hi"].tolist() == [pd.Timedelta("1 days 02:00:00"),
                                  pd.Timedelta("2 days")]


def test_interval_dt_roundtrip_and_sort():
    td = pd.to_timedelta(["2 days", "1 days", "3 days"])
    s = Session()
    s.register_pandas("t", pd.DataFrame({"iv": td,
                                         "k": np.arange(3, dtype=np.int64)}))
    got = s.sql("SELECT k FROM t ORDER BY iv")
    assert got["k"].tolist() == [1, 0, 2]
