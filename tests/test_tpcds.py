"""TPC-DS differential suite: every query must match its pandas oracle,
single- and multi-partition, plain and skewed (SURVEY.md §4 tier-4 analog)."""

import pytest

from auron_tpu.tpcds.queries import QUERIES
from auron_tpu.tpcds import runner
from auron_tpu.tpcds.runner import run_all


# rollup flagships run 9 grouping sets per execution — smaller sf keeps the
# suite's wall time bounded without losing the differential coverage;
# q54's maternity-buyer funnel needs a LARGER sf to produce any rows
_HEAVY_SF = {"q67": 0.15, "q36": 0.3, "q25": 0.3, "q29": 0.3,
             "q47": 0.25, "q57": 0.25, "q54": 4.0, "q72": 2.0,
             "q91": 5.0}


@pytest.mark.parametrize("q", list(QUERIES))
def test_query_single_partition(q):
    (r,) = run_all(sf=_HEAVY_SF.get(q, 0.5), num_partitions=1, queries=[q])
    assert r["match"], r


@pytest.mark.parametrize("q", list(QUERIES))
def test_query_multi_partition(q):
    (r,) = run_all(sf=_HEAVY_SF.get(q, 0.5), num_partitions=4, queries=[q])
    assert r["match"], r


def test_query_skewed_keys():
    for r in run_all(sf=0.5, num_partitions=4, skew=0.5,
                     queries=["q3", "q42"]):
        assert r["match"], r


def test_q58_q83_dense_weeks():
    """q58/q83 are structurally empty on uniform synthetic dates (an item
    must appear in all three channels inside one literal week), so cluster
    a slice of each channel onto the target weeks + a small item range to
    force nonzero differential rows."""
    import numpy as np

    from auron_tpu.tpcds.datagen import date_sk, generate
    from auron_tpu.tpcds.queries import QUERIES
    from auron_tpu.tpcds.runner import frames_match, make_session

    tables = generate(sf=0.5, seed=7)
    rng = np.random.default_rng(11)
    week_days = {
        "q58": [date_sk("2000-01-03") + d for d in range(-4, 3)],
        "q83": [date_sk(i) + d for d in range(-6, 7)
                for i in ("2000-06-30", "2000-09-27", "2000-11-17")],
    }
    for tbl, date_col, item_col in (
            ("store_sales", "ss_sold_date_sk", "ss_item_sk"),
            ("catalog_sales", "cs_sold_date_sk", "cs_item_sk"),
            ("web_sales", "ws_sold_date_sk", "ws_item_sk"),
            ("store_returns", "sr_returned_date_sk", "sr_item_sk"),
            ("catalog_returns", "cr_returned_date_sk", "cr_item_sk"),
            ("web_returns", "wr_returned_date_sk", "wr_item_sk")):
        df = tables[tbl]
        # sales channels need many rows per item so per-channel revenue
        # sums concentrate enough to pass q58's ±10% band filter
        n = min(6000 if tbl.endswith("sales") else 600, len(df))
        days = week_days["q58" if tbl.endswith("sales") else "q83"]
        df.loc[df.index[:n], date_col] = rng.choice(days, n).astype(
            df[date_col].dtype)
        df.loc[df.index[:n], item_col] = rng.integers(1, 40, n).astype(
            df[item_col].dtype)
    s = make_session(tables, num_partitions=1)
    for q in ("q58", "q83"):
        build, oracle = QUERIES[q]
        got = build(s).collect()
        want = oracle(tables)
        assert len(want) > 0, f"{q}: dense fixture still empty"
        assert frames_match(got, want), (q, got, want)


def test_q23_dense_frequent_items():
    """q23's frequent-items CTE (count > 4 per item/date) is structurally
    empty on uniform synthetic dates — cluster store sales onto a small
    item/customer range and Feb 2000 so every stage produces rows."""
    import numpy as np

    from auron_tpu.tpcds.datagen import date_sk, generate
    from auron_tpu.tpcds.queries import QUERIES
    from auron_tpu.tpcds.runner import frames_match, make_session

    tables = generate(sf=0.5, seed=3)
    rng = np.random.default_rng(5)
    feb = [date_sk("2000-02-01") + d for d in range(28)]
    ss = tables["store_sales"]
    n = min(8000, len(ss))
    ss.loc[ss.index[:n], "ss_sold_date_sk"] = rng.choice(feb, n).astype(
        ss["ss_sold_date_sk"].dtype)
    ss.loc[ss.index[:n], "ss_item_sk"] = rng.integers(1, 41, n).astype(
        ss["ss_item_sk"].dtype)
    ss.loc[ss.index[:n], "ss_customer_sk"] = rng.integers(
        1, 51, n).astype(ss["ss_customer_sk"].dtype)
    for tbl, date_col, item_col, cust_col in (
            ("catalog_sales", "cs_sold_date_sk", "cs_item_sk",
             "cs_bill_customer_sk"),
            ("web_sales", "ws_sold_date_sk", "ws_item_sk",
             "ws_bill_customer_sk")):
        df = tables[tbl]
        m = min(3000, len(df))
        df.loc[df.index[:m], date_col] = rng.choice(feb, m).astype(
            df[date_col].dtype)
        df.loc[df.index[:m], item_col] = rng.integers(1, 41, m).astype(
            df[item_col].dtype)
        df.loc[df.index[:m], cust_col] = rng.integers(1, 51, m).astype(
            df[cust_col].dtype)
    s = make_session(tables, num_partitions=1)
    # the same clustering gives q78 its (item, customer, year) overlap
    # across all three channels, which uniform data never produces
    for q in ("q23a", "q23b", "q78"):
        build, oracle = QUERIES[q]
        got = build(s).collect()
        want = oracle(tables)
        assert len(want) > 0, f"{q}: dense fixture still empty"
        if q == "q23a":
            assert want.iloc[0, 0] > 0, "q23a: no qualifying sales"
        assert frames_match(got, want), (q, got, want)


def test_q64_dense_cross_years():
    """q64's year-over-year self-join needs the SAME item+store combo
    surviving the 17-table funnel in both 1999 and 2000 — cluster a few
    qualifying items at one store across both years, with matching
    returns and catalog refunds."""
    import numpy as np

    from auron_tpu.tpcds.datagen import date_sk, generate
    from auron_tpu.tpcds.queries import QUERIES
    from auron_tpu.tpcds.runner import frames_match, make_session

    tables = generate(sf=0.5, seed=9)
    rng = np.random.default_rng(13)
    it = tables["item"]
    it.loc[it.index[:6], "i_color"] = "purple"
    it.loc[it.index[:6], "i_current_price"] = 70.0
    ss = tables["store_sales"]
    n = min(4000, len(ss))
    y99 = [date_sk("1999-03-01") + d for d in range(200)]
    y00 = [date_sk("2000-03-01") + d for d in range(200)]
    half = n // 2
    dt = ss["ss_sold_date_sk"].dtype
    ss.loc[ss.index[:half], "ss_sold_date_sk"] = rng.choice(
        y99, half).astype(dt)
    ss.loc[ss.index[half:n], "ss_sold_date_sk"] = rng.choice(
        y00, n - half).astype(dt)
    ss.loc[ss.index[:n], "ss_item_sk"] = rng.integers(0, 6, n).astype(
        ss["ss_item_sk"].dtype)
    ss.loc[ss.index[:n], "ss_store_sk"] = np.zeros(
        n, dtype=ss["ss_store_sk"].dtype.type
        if hasattr(ss["ss_store_sk"].dtype, "type") else np.int32)
    sr = tables["store_returns"]
    m = min(2000, len(sr))
    # align returns with sales from BOTH halves (1999 AND 2000 dates) —
    # the year-over-year self-join needs returned sales in each year
    pick = np.linspace(0, n - 1, m).astype(int)
    sr.loc[sr.index[:m], "sr_item_sk"] = \
        ss["ss_item_sk"].to_numpy()[pick]
    sr.loc[sr.index[:m], "sr_ticket_number"] = \
        ss["ss_ticket_number"].to_numpy()[pick]
    cs, cr = tables["catalog_sales"], tables["catalog_returns"]
    k = min(300, len(cr), len(cs))
    cs.loc[cs.index[:k], "cs_item_sk"] = rng.integers(0, 6, k).astype(
        cs["cs_item_sk"].dtype)
    cr.loc[cr.index[:k], "cr_item_sk"] = \
        cs["cs_item_sk"].to_numpy()[:k]
    cr.loc[cr.index[:k], "cr_order_number"] = \
        cs["cs_order_number"].to_numpy()[:k]
    for c in ("cr_refunded_cash", "cr_reversed_charge",
              "cr_store_credit"):
        cr.loc[cr.index[:k], c] = 1.0
    s = make_session(tables, num_partitions=1)
    build, oracle = QUERIES["q64"]
    got = build(s).collect()
    want = oracle(tables)
    assert len(want) > 0, "q64: dense fixture still empty"
    assert frames_match(got, want), (got, want)


def test_no_query_matches_on_zero_rows():
    """Differential power floor (round-2 verdict weak #3): a query whose
    oracle returns 0 rows proves nothing. Every query must have support
    at the default test sf (datagen._correlation_seeds + _zero_row_seeds2
    provide the dsdgen-like joint distributions)."""
    tables = runner.generate_cached(0.2, 0, 0.0)
    zero = []
    for q in runner.QUERIES:
        _, oracle = runner.QUERIES[q]
        if len(oracle(tables)) == 0:
            zero.append(q)
    assert not zero, f"queries matching on zero rows: {zero}"
