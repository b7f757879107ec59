"""TPC-DS queries hand-converted to Frame pipelines + pandas oracles.

The reference never parses SQL either — Spark plans, Auron converts
operators (/root/reference/spark-extension/.../AuronConverters.scala). Here
the conversion target is the Frame builder. Each query ships with a pandas
oracle; the runner diffs rows (QueryResultComparator.scala:39-106 analog,
double tolerance + sorted-row comparison).

Query sources: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q3.sql (join+agg+topk), q1.sql (two-level agg + decorrelated avg subquery +
multi-join), q7-style (multi-dim join + avg aggregates).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np
import pandas as pd

from auron_tpu.expr.nodes import col, func, lit, when
from auron_tpu.ops.sort import SortKey
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame


# ---------------------------------------------------------------------------
# q3: brand revenue for manufacturer 128 in November, top 100.
# ---------------------------------------------------------------------------

def q3(s: Session) -> Frame:
    dt = s.table("date_dim").filter(col("d_moy") == lit(11))
    it = s.table("item").filter(col("i_manufact_id") == lit(128))
    ss = s.table("store_sales")
    joined = (ss.join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
                .join(it, ("ss_item_sk",), ("i_item_sk",)))
    return (joined.groupby("d_year", "i_brand", "i_brand_id")
            .agg(domains={"d_year": (1998, 2005), "i_brand_id": (1, 61)},
                 sum_agg=("sum", col("ss_ext_sales_price")))
            .sort(SortKey("d_year"), SortKey("sum_agg", ascending=False),
                  SortKey("i_brand_id"), limit=100)
            .select(d_year=col("d_year"), brand_id=col("i_brand_id"),
                    brand=col("i_brand"), sum_agg=col("sum_agg")))


def q3_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dt = t["date_dim"][t["date_dim"]["d_moy"] == 11]
    it = t["item"][t["item"]["i_manufact_id"] == 128]
    j = (t["store_sales"]
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(it, left_on="ss_item_sk", right_on="i_item_sk"))
    g = j.groupby(["d_year", "i_brand", "i_brand_id"]).agg(
        sum_agg=("ss_ext_sales_price", "sum")).reset_index()
    g = g.sort_values(["d_year", "sum_agg", "i_brand_id"],
                      ascending=[True, False, True], kind="stable").head(100)
    g = g[["d_year", "i_brand_id", "i_brand", "sum_agg"]]
    return g.rename(columns={"i_brand_id": "brand_id", "i_brand": "brand"})


# ---------------------------------------------------------------------------
# q1: customers returning more than 1.2x their store's average (year 2000),
# in TN stores. The correlated subquery decorrelates into a per-store avg
# aggregate joined back — exactly how Spark plans it.
# ---------------------------------------------------------------------------

def q1(s: Session) -> Frame:
    dt = s.table("date_dim").filter(col("d_year") == lit(2000))
    ctr = (s.table("store_returns")
           .join(dt, ("sr_returned_date_sk",), ("d_date_sk",))
           .groupby("sr_customer_sk", "sr_store_sk")
           .agg(ctr_total_return=("sum", col("sr_return_amt"))))
    avg_by_store = (ctr.groupby("sr_store_sk")
                    .agg(avg_return=("avg", col("ctr_total_return")))
                    .rename(sr_store_sk="avg_store_sk"))
    tn_stores = s.table("store").filter(col("s_state") == lit("TN"))
    out = (ctr.join(avg_by_store, ("sr_store_sk",), ("avg_store_sk",))
           .filter(col("ctr_total_return") >
                   col("avg_return") * lit(1.2))
           .join(tn_stores, ("sr_store_sk",), ("s_store_sk",))
           .join(s.table("customer"), ("sr_customer_sk",),
                 ("c_customer_sk",))
           .select("c_customer_id")
           .sort(SortKey("c_customer_id"), limit=100))
    return out


def q1_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dt = t["date_dim"][t["date_dim"]["d_year"] == 2000]
    sr = t["store_returns"].merge(dt, left_on="sr_returned_date_sk",
                                  right_on="d_date_sk")
    ctr = sr.groupby(["sr_customer_sk", "sr_store_sk"]).agg(
        ctr_total_return=("sr_return_amt", "sum")).reset_index()
    avg = ctr.groupby("sr_store_sk").agg(
        avg_return=("ctr_total_return", "mean")).reset_index()
    j = ctr.merge(avg, on="sr_store_sk")
    j = j[j["ctr_total_return"] > j["avg_return"] * 1.2]
    tn = t["store"][t["store"]["s_state"] == "TN"]
    j = j.merge(tn, left_on="sr_store_sk", right_on="s_store_sk")
    j = j.merge(t["customer"], left_on="sr_customer_sk",
                right_on="c_customer_sk")
    return j[["c_customer_id"]].sort_values("c_customer_id",
                                            kind="stable").head(100)


# ---------------------------------------------------------------------------
# q7: item averages for single/college male demographic with an email- or
# event-silent promotion, year 2000 (q7.sql verbatim).
# ---------------------------------------------------------------------------

def q7(s: Session) -> Frame:
    dt = s.table("date_dim").filter(col("d_year") == lit(2000))
    cd = s.table("customer_demographics").filter(
        (col("cd_gender") == lit("M")) &
        (col("cd_marital_status") == lit("S")) &
        (col("cd_education_status") == lit("College")))
    pr = s.table("promotion").filter(
        (col("p_channel_email") == lit("N")) |
        (col("p_channel_event") == lit("N")))
    joined = (s.table("store_sales")
              .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
              .join(s.table("item"), ("ss_item_sk",), ("i_item_sk",))
              .join(cd, ("ss_cdemo_sk",), ("cd_demo_sk",))
              .join(pr, ("ss_promo_sk",), ("p_promo_sk",)))
    return (joined.groupby("i_item_id")
            .agg(agg1=("avg", col("ss_quantity")),
                 agg2=("avg", col("ss_list_price")),
                 agg3=("avg", col("ss_coupon_amt")),
                 agg4=("avg", col("ss_sales_price")))
            .sort(SortKey("i_item_id"), limit=100))


def q7_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dt = t["date_dim"][t["date_dim"]["d_year"] == 2000]
    cd = t["customer_demographics"]
    cd = cd[(cd["cd_gender"] == "M") & (cd["cd_marital_status"] == "S") &
            (cd["cd_education_status"] == "College")]
    pr = t["promotion"]
    pr = pr[(pr["p_channel_email"] == "N") | (pr["p_channel_event"] == "N")]
    j = (t["store_sales"]
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk")
         .merge(cd, left_on="ss_cdemo_sk", right_on="cd_demo_sk")
         .merge(pr, left_on="ss_promo_sk", right_on="p_promo_sk"))
    g = j.groupby("i_item_id").agg(
        agg1=("ss_quantity", "mean"),
        agg2=("ss_list_price", "mean"),
        agg3=("ss_coupon_amt", "mean"),
        agg4=("ss_sales_price", "mean")).reset_index()
    return g.sort_values("i_item_id", kind="stable").head(100)[
        ["i_item_id", "agg1", "agg2", "agg3", "agg4"]]


# ---------------------------------------------------------------------------
# q42: category revenue for manager 1, November 2000 (q42.sql verbatim).
# ---------------------------------------------------------------------------

def q42(s: Session) -> Frame:
    dt = s.table("date_dim").filter((col("d_moy") == lit(11)) &
                                    (col("d_year") == lit(2000)))
    it = s.table("item").filter(col("i_manager_id") == lit(1))
    joined = (s.table("store_sales")
              .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
              .join(it, ("ss_item_sk",), ("i_item_sk",)))
    return (joined.groupby("d_year", "i_category_id", "i_category")
            .agg(rev=("sum", col("ss_ext_sales_price")))
            .sort(SortKey("rev", ascending=False), SortKey("d_year"),
                  SortKey("i_category_id"), SortKey("i_category"),
                  limit=100))


def q42_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dt = t["date_dim"]
    dt = dt[(dt["d_moy"] == 11) & (dt["d_year"] == 2000)]
    it = t["item"][t["item"]["i_manager_id"] == 1]
    j = (t["store_sales"]
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(it, left_on="ss_item_sk", right_on="i_item_sk"))
    g = j.groupby(["d_year", "i_category_id", "i_category"]).agg(
        rev=("ss_ext_sales_price", "sum")).reset_index()
    return g.sort_values(["rev", "d_year", "i_category_id", "i_category"],
                         ascending=[False, True, True, True],
                         kind="stable").head(100)[
        ["d_year", "i_category_id", "i_category", "rev"]]


QUERIES: Dict[str, Tuple[Callable, Callable]] = {
    "q1": (q1, q1_oracle),
    "q3": (q3, q3_oracle),
    "q7": (q7, q7_oracle),
    "q42": (q42, q42_oracle),
}


# ---------------------------------------------------------------------------
# q52: yearly brand revenue, manager slice, November 2000 (q52.sql).
# ---------------------------------------------------------------------------

def q52(s: Session) -> Frame:
    dt = s.table("date_dim").filter((col("d_moy") == lit(11)) &
                                    (col("d_year") == lit(2000)))
    it = s.table("item").filter(col("i_manager_id") == lit(1))
    joined = (s.table("store_sales")
              .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
              .join(it, ("ss_item_sk",), ("i_item_sk",)))
    return (joined.groupby("d_year", "i_brand", "i_brand_id")
            .agg(ext_price=("sum", col("ss_ext_sales_price")))
            .sort(SortKey("d_year"), SortKey("ext_price", ascending=False),
                  SortKey("i_brand_id"), limit=100)
            .select(d_year=col("d_year"), brand_id=col("i_brand_id"),
                    brand=col("i_brand"), ext_price=col("ext_price")))


def q52_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dt = t["date_dim"]
    dt = dt[(dt["d_moy"] == 11) & (dt["d_year"] == 2000)]
    it = t["item"][t["item"]["i_manager_id"] == 1]
    j = (t["store_sales"]
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(it, left_on="ss_item_sk", right_on="i_item_sk"))
    g = j.groupby(["d_year", "i_brand", "i_brand_id"]).agg(
        ext_price=("ss_ext_sales_price", "sum")).reset_index()
    g = g.sort_values(["d_year", "ext_price", "i_brand_id"],
                      ascending=[True, False, True],
                      kind="stable").head(100)[
        ["d_year", "i_brand_id", "i_brand", "ext_price"]]
    return g.rename(columns={"i_brand_id": "brand_id", "i_brand": "brand"})


# ---------------------------------------------------------------------------
# q55: brand revenue, manager slice by month (q55.sql shape).
# ---------------------------------------------------------------------------

def q55(s: Session) -> Frame:
    dt = s.table("date_dim").filter((col("d_moy") == lit(11)) &
                                    (col("d_year") == lit(1999)))
    it = s.table("item").filter(col("i_manager_id") == lit(28))
    joined = (s.table("store_sales")
              .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
              .join(it, ("ss_item_sk",), ("i_item_sk",)))
    return (joined.groupby("i_brand_id", "i_brand")
            .agg(ext_price=("sum", col("ss_ext_sales_price")))
            .sort(SortKey("ext_price", ascending=False),
                  SortKey("i_brand_id"), limit=100))


def q55_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dt = t["date_dim"]
    dt = dt[(dt["d_moy"] == 11) & (dt["d_year"] == 1999)]
    it = t["item"][t["item"]["i_manager_id"] == 28]
    j = (t["store_sales"]
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(it, left_on="ss_item_sk", right_on="i_item_sk"))
    g = j.groupby(["i_brand_id", "i_brand"]).agg(
        ext_price=("ss_ext_sales_price", "sum")).reset_index()
    return g.sort_values(["ext_price", "i_brand_id"],
                         ascending=[False, True], kind="stable").head(100)[
        ["i_brand_id", "i_brand", "ext_price"]]


# ---------------------------------------------------------------------------
# q43: weekday sales pivot per store, GMT-5 stores, year 2000 (q43.sql
# verbatim — sum(CASE WHEN d_day_name = '<day>' THEN ss_sales_price END)).
# ---------------------------------------------------------------------------

_DAYS = ("Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
         "Saturday")
_DAY_ALIAS = ("sun_sales", "mon_sales", "tue_sales", "wed_sales",
              "thu_sales", "fri_sales", "sat_sales")


def q43(s: Session) -> Frame:
    dt = s.table("date_dim").filter(col("d_year") == lit(2000))
    st = s.table("store").filter(col("s_gmt_offset") == lit(-5.0))
    joined = (s.table("store_sales")
              .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
              .join(st, ("ss_store_sk",), ("s_store_sk",)))
    aggs = {alias: ("sum", when(col("d_day_name") == lit(day),
                                col("ss_sales_price")).end())
            for day, alias in zip(_DAYS, _DAY_ALIAS)}
    return (joined.groupby("s_store_name", "s_store_id")
            .agg(**aggs)
            .sort(SortKey("s_store_name"), SortKey("s_store_id"),
                  *[SortKey(a) for a in _DAY_ALIAS], limit=100))


def q43_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dt = t["date_dim"][t["date_dim"]["d_year"] == 2000]
    st = t["store"][t["store"]["s_gmt_offset"] == -5.0]
    j = (t["store_sales"]
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk"))
    for day, alias in zip(_DAYS, _DAY_ALIAS):
        j[alias] = j["ss_sales_price"].where(j["d_day_name"] == day)
    g = j.groupby(["s_store_name", "s_store_id"])[list(_DAY_ALIAS)] \
        .sum(min_count=1).reset_index()
    return g.sort_values(["s_store_name", "s_store_id"] + list(_DAY_ALIAS),
                         kind="stable").head(100)


QUERIES.update({
    "q52": (q52, q52_oracle),
    "q55": (q55, q55_oracle),
    "q43": (q43, q43_oracle),
})


# ---------------------------------------------------------------------------
# q67-style: top-3 brands by revenue within each category (window rank over
# aggregated revenue — the reference's window group-limit pattern).
# ---------------------------------------------------------------------------

def q67(s: Session) -> Frame:
    from auron_tpu.ops.window import WindowFunc
    dt = s.table("date_dim").filter(col("d_year") == lit(2000))
    joined = (s.table("store_sales")
              .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
              .join(s.table("item"), ("ss_item_sk",), ("i_item_sk",)))
    rev = (joined.groupby("i_category", "i_brand")
           .agg(rev=("sum", col("ss_ext_sales_price"))))
    ranked = rev.window(("i_category",),
                        (SortKey("rev", ascending=False),
                         SortKey("i_brand")),
                        (WindowFunc("rk", "rank"),), group_limit=3)
    return ranked.sort(SortKey("i_category"), SortKey("rk"),
                       SortKey("i_brand"))


def q67_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dt = t["date_dim"][t["date_dim"]["d_year"] == 2000]
    j = (t["store_sales"]
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk"))
    rev = j.groupby(["i_category", "i_brand"]).agg(
        rev=("ss_ext_sales_price", "sum")).reset_index()
    rev = rev.sort_values(["i_category", "rev", "i_brand"],
                          ascending=[True, False, True], kind="stable")
    rev["rk"] = rev.groupby("i_category")["rev"].rank(
        method="min", ascending=False).astype(np.int64)
    out = rev.groupby("i_category").head(3)
    return out.sort_values(["i_category", "rk", "i_brand"],
                           kind="stable")[
        ["i_category", "i_brand", "rev", "rk"]]


QUERIES["q67"] = (q67, q67_oracle)


# ---------------------------------------------------------------------------
# q19: brand revenue for manager 8, November 1998, where the customer's home
# zip prefix differs from the store's (q19.sql verbatim — the zip predicate
# makes this a 6-table join with a cross-column string comparison).
# ---------------------------------------------------------------------------

def q19(s: Session) -> Frame:
    dt = s.table("date_dim").filter((col("d_moy") == lit(11)) &
                                    (col("d_year") == lit(1998)))
    it = s.table("item").filter(col("i_manager_id") == lit(8))
    joined = (s.table("store_sales")
              .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
              .join(it, ("ss_item_sk",), ("i_item_sk",))
              .join(s.table("customer"), ("ss_customer_sk",),
                    ("c_customer_sk",))
              .join(s.table("customer_address"), ("c_current_addr_sk",),
                    ("ca_address_sk",))
              .join(s.table("store"), ("ss_store_sk",), ("s_store_sk",))
              .filter(func("substring", col("ca_zip"), params=(1, 5)) !=
                      func("substring", col("s_zip"), params=(1, 5))))
    return (joined.groupby("i_brand", "i_brand_id", "i_manufact_id",
                           "i_manufact")
            .agg(ext_price=("sum", col("ss_ext_sales_price")))
            .sort(SortKey("ext_price", ascending=False), SortKey("i_brand"),
                  SortKey("i_brand_id"), SortKey("i_manufact_id"),
                  SortKey("i_manufact"), limit=100))


def q19_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dt = t["date_dim"]
    dt = dt[(dt["d_moy"] == 11) & (dt["d_year"] == 1998)]
    it = t["item"][t["item"]["i_manager_id"] == 8]
    j = (t["store_sales"]
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(it, left_on="ss_item_sk", right_on="i_item_sk")
         .merge(t["customer"], left_on="ss_customer_sk",
                right_on="c_customer_sk")
         .merge(t["customer_address"], left_on="c_current_addr_sk",
                right_on="ca_address_sk")
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk"))
    j = j[j["ca_zip"].str[:5] != j["s_zip"].str[:5]]
    g = j.groupby(["i_brand", "i_brand_id", "i_manufact_id",
                   "i_manufact"]).agg(
        ext_price=("ss_ext_sales_price", "sum")).reset_index()
    return g.sort_values(
        ["ext_price", "i_brand", "i_brand_id", "i_manufact_id",
         "i_manufact"],
        ascending=[False, True, True, True, True],
        kind="stable").head(100)[
        ["i_brand", "i_brand_id", "i_manufact_id", "i_manufact",
         "ext_price"]]


# ---------------------------------------------------------------------------
# q73: baskets of 1-5 items bought on the 1st/2nd of the month by high-
# buy-potential households with cars, in four counties (q73.sql verbatim:
# HAVING on count(*), CASE-guarded division predicate, joined back to
# customer). ORDER BY cnt DESC is not a total order; the comparator's
# row-multiset equality covers the tie freedom.
# ---------------------------------------------------------------------------

def q73(s: Session) -> Frame:
    dt = s.table("date_dim").filter(
        (col("d_dom") >= lit(1)) & (col("d_dom") <= lit(2)) &
        col("d_year").isin([1999, 2000, 2001]))
    st = s.table("store").filter(col("s_county").isin(
        ["Williamson County", "Franklin Parish", "Bronx County",
         "Orange County"]))
    hd = (s.table("household_demographics")
          .filter((col("hd_buy_potential").isin([">10000", "unknown"])) &
                  (col("hd_vehicle_count") > lit(0)))
          .filter(when(col("hd_vehicle_count") > lit(0),
                       col("hd_dep_count") / col("hd_vehicle_count"))
                  .end() > lit(1)))
    cnts = (s.table("store_sales")
            .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
            .join(st, ("ss_store_sk",), ("s_store_sk",))
            .join(hd, ("ss_hdemo_sk",), ("hd_demo_sk",))
            .groupby("ss_ticket_number", "ss_customer_sk")
            .agg(cnt=("count_star", None))
            .filter((col("cnt") >= lit(1)) & (col("cnt") <= lit(5))))
    return (cnts.join(s.table("customer"), ("ss_customer_sk",),
                      ("c_customer_sk",))
            .select("c_last_name", "c_first_name", "c_salutation",
                    "c_preferred_cust_flag", "ss_ticket_number", "cnt")
            .sort(SortKey("cnt", ascending=False),
                  SortKey("c_last_name"), SortKey("c_first_name"),
                  SortKey("c_salutation"),
                  SortKey("c_preferred_cust_flag"),
                  SortKey("ss_ticket_number")))


def q73_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dt = t["date_dim"]
    dt = dt[(dt["d_dom"].between(1, 2)) &
            (dt["d_year"].isin([1999, 2000, 2001]))]
    st = t["store"][t["store"]["s_county"].isin(
        ["Williamson County", "Franklin Parish", "Bronx County",
         "Orange County"])]
    hd = t["household_demographics"]
    hd = hd[(hd["hd_buy_potential"].isin([">10000", "unknown"])) &
            (hd["hd_vehicle_count"] > 0) &
            ((hd["hd_dep_count"] / hd["hd_vehicle_count"]) > 1)]
    j = (t["store_sales"]
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk")
         .merge(hd, left_on="ss_hdemo_sk", right_on="hd_demo_sk"))
    g = j.groupby(["ss_ticket_number", "ss_customer_sk"]) \
        .size().reset_index(name="cnt")
    g = g[(g["cnt"] >= 1) & (g["cnt"] <= 5)]
    g = g.merge(t["customer"], left_on="ss_customer_sk",
                right_on="c_customer_sk")
    return g.sort_values(
        ["cnt", "c_last_name", "c_first_name", "c_salutation",
         "c_preferred_cust_flag", "ss_ticket_number"],
        ascending=[False, True, True, True, True, True], kind="stable")[
        ["c_last_name", "c_first_name", "c_salutation",
         "c_preferred_cust_flag", "ss_ticket_number", "cnt"]]


QUERIES.update({"q19": (q19, q19_oracle), "q73": (q73, q73_oracle)})


# ---------------------------------------------------------------------------
# Real-query batches live in sibling modules (one per channel group).
# ---------------------------------------------------------------------------

from auron_tpu.tpcds.queries_store import QUERIES_STORE_1  # noqa: E402

QUERIES.update(QUERIES_STORE_1)

from auron_tpu.tpcds.queries_store2 import QUERIES_STORE_2  # noqa: E402

QUERIES.update(QUERIES_STORE_2)

from auron_tpu.tpcds.queries_catalog import QUERIES_CATALOG  # noqa: E402

QUERIES.update(QUERIES_CATALOG)

from auron_tpu.tpcds.queries_web import QUERIES_WEB  # noqa: E402

QUERIES.update(QUERIES_WEB)

from auron_tpu.tpcds.queries_misc import QUERIES_MISC  # noqa: E402

QUERIES.update(QUERIES_MISC)

from auron_tpu.tpcds.queries_rollup import QUERIES_ROLLUP  # noqa: E402

QUERIES.update(QUERIES_ROLLUP)  # replaces the earlier simplified q67

from auron_tpu.tpcds.queries_misc2 import QUERIES_MISC2  # noqa: E402

QUERIES.update(QUERIES_MISC2)

from auron_tpu.tpcds.queries_window import QUERIES_WINDOW  # noqa: E402

QUERIES.update(QUERIES_WINDOW)

from auron_tpu.tpcds.queries_lag import QUERIES_LAG  # noqa: E402

QUERIES.update(QUERIES_LAG)

from auron_tpu.tpcds.queries_misc3 import QUERIES_MISC3  # noqa: E402

QUERIES.update(QUERIES_MISC3)

from auron_tpu.tpcds.queries_returns import QUERIES_RETURNS  # noqa: E402

QUERIES.update(QUERIES_RETURNS)

from auron_tpu.tpcds.queries_demo import QUERIES_DEMO  # noqa: E402

QUERIES.update(QUERIES_DEMO)

from auron_tpu.tpcds.queries_weeks import QUERIES_WEEKS  # noqa: E402

QUERIES.update(QUERIES_WEEKS)

from auron_tpu.tpcds.queries_ship import QUERIES_SHIP  # noqa: E402

QUERIES.update(QUERIES_SHIP)

from auron_tpu.tpcds.queries_years import QUERIES_YEARS  # noqa: E402

QUERIES.update(QUERIES_YEARS)

from auron_tpu.tpcds.queries_stats import QUERIES_STATS  # noqa: E402

QUERIES.update(QUERIES_STATS)

from auron_tpu.tpcds.queries_channels import QUERIES_CHANNELS  # noqa: E402

QUERIES.update(QUERIES_CHANNELS)

from auron_tpu.tpcds.queries_growth import QUERIES_GROWTH  # noqa: E402

QUERIES.update(QUERIES_GROWTH)

from auron_tpu.tpcds.queries_reports import QUERIES_REPORTS  # noqa: E402

QUERIES.update(QUERIES_REPORTS)

from auron_tpu.tpcds.queries_final import QUERIES_FINAL  # noqa: E402

QUERIES.update(QUERIES_FINAL)

from auron_tpu.tpcds.queries_heavy import QUERIES_HEAVY  # noqa: E402

QUERIES.update(QUERIES_HEAVY)

from auron_tpu.tpcds.queries_cross import QUERIES_CROSS  # noqa: E402

QUERIES.update(QUERIES_CROSS)

from auron_tpu.tpcds.queries_cross14 import QUERIES_CROSS14  # noqa: E402

QUERIES.update(QUERIES_CROSS14)

from auron_tpu.tpcds.queries_last import QUERIES_LAST  # noqa: E402

QUERIES.update(QUERIES_LAST)
