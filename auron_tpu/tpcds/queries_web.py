"""Real TPC-DS web-channel queries as Frame pipelines + oracles.

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{12,45,62,84,85,90,92,94}.sql — predicates ported verbatim. Correlated
subqueries are decorrelated the way Spark plans them (per-key aggregate +
join); EXISTS / NOT EXISTS become semi / anti joins; the IN-subquery OR in
q45 becomes an existence join feeding the OR filter.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

from auron_tpu.dtypes import FLOAT64
from auron_tpu.expr.nodes import col, func, lit, when
from auron_tpu.ops.sort import SortKey
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame
from auron_tpu.tpcds.datagen import date_sk
from auron_tpu.tpcds.queries_store2 import q98, q98_oracle


def _between(c, lo, hi):
    return (c >= lit(lo)) & (c <= lit(hi))


# ---------------------------------------------------------------------------
# q12: web item revenue share within class over a 30-day window (q12.sql) —
# q98's shape over web_sales with LIMIT 100.
# ---------------------------------------------------------------------------

def q12(s: Session) -> Frame:
    return q98(s, datecol="ws_sold_date_sk", itemcol="ws_item_sk",
               pricecol="ws_ext_sales_price", table="web_sales", limit=100)


def q12_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    return q98_oracle(t, datecol="ws_sold_date_sk", itemcol="ws_item_sk",
                      pricecol="ws_ext_sales_price", table="web_sales",
                      limit=100)


# ---------------------------------------------------------------------------
# q45: web revenue by zip/city for magic zips OR a 10-item id list
# (q45.sql) — the OR over an IN-subquery runs as an existence join whose
# flag feeds the residual filter.
# ---------------------------------------------------------------------------

_Q45_ZIPS = ["85669", "86197", "88274", "83405", "86475", "85392", "85460",
             "80348", "81792"]


def q45(s: Session) -> Frame:
    dt = s.table("date_dim").filter((col("d_qoy") == lit(2)) &
                                    (col("d_year") == lit(2001)))
    ids = (s.table("item")
           .filter(col("i_item_sk").isin([2, 3, 5, 7, 11, 13, 17, 19, 23,
                                          29]))
           .select(sub_item_id=col("i_item_id")))
    j = (s.table("web_sales")
         .join(s.table("customer"), ("ws_bill_customer_sk",),
               ("c_customer_sk",))
         .join(s.table("customer_address"), ("c_current_addr_sk",),
               ("ca_address_sk",))
         .join(s.table("item"), ("ws_item_sk",), ("i_item_sk",))
         .join(dt, ("ws_sold_date_sk",), ("d_date_sk",))
         .join(ids, ("i_item_id",), ("sub_item_id",), how="existence")
         .filter(func("substring", col("ca_zip"),
                      params=(1, 5)).isin(_Q45_ZIPS) | col("exists#")))
    return (j.groupby("ca_zip", "ca_city")
            .agg(total=("sum", col("ws_sales_price")))
            .sort(SortKey("ca_zip"), SortKey("ca_city"), limit=100))


def q45_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[(dd["d_qoy"] == 2) & (dd["d_year"] == 2001)]
    it = t["item"]
    sub = set(it[it["i_item_sk"].isin([2, 3, 5, 7, 11, 13, 17, 19, 23,
                                       29])]["i_item_id"])
    j = (t["web_sales"]
         .merge(t["customer"], left_on="ws_bill_customer_sk",
                right_on="c_customer_sk")
         .merge(t["customer_address"], left_on="c_current_addr_sk",
                right_on="ca_address_sk")
         .merge(it, left_on="ws_item_sk", right_on="i_item_sk")
         .merge(dt, left_on="ws_sold_date_sk", right_on="d_date_sk"))
    j = j[j["ca_zip"].str[:5].isin(_Q45_ZIPS) |
          j["i_item_id"].isin(sub)]
    g = j.groupby(["ca_zip", "ca_city"]).agg(
        total=("ws_sales_price", "sum")).reset_index()
    return g.sort_values(["ca_zip", "ca_city"], kind="stable").head(100)


# ---------------------------------------------------------------------------
# q62: web shipping-latency buckets by warehouse/mode/site, year 2000
# (q62.sql).
# ---------------------------------------------------------------------------

_Q62_BUCKETS = [("d30", None, 30), ("d31_60", 30, 60), ("d61_90", 60, 90),
                ("d91_120", 90, 120), ("d_over_120", 120, None)]


def q62(s: Session) -> Frame:
    dt = s.table("date_dim").filter(_between(col("d_month_seq"), 1200,
                                            1200 + 11))
    j = (s.table("web_sales")
         .join(dt, ("ws_ship_date_sk",), ("d_date_sk",))
         .join(s.table("warehouse"), ("ws_warehouse_sk",),
               ("w_warehouse_sk",))
         .join(s.table("ship_mode"), ("ws_ship_mode_sk",),
               ("sm_ship_mode_sk",))
         .join(s.table("web_site"), ("ws_web_site_sk",), ("web_site_sk",)))
    lag = col("ws_ship_date_sk") - col("ws_sold_date_sk")
    aggs = {}
    for name, lo, hi in _Q62_BUCKETS:
        cond = None
        if lo is not None:
            cond = lag > lit(lo)
        if hi is not None:
            c2 = lag <= lit(hi)
            cond = c2 if cond is None else (cond & c2)
        aggs[name] = ("sum", when(cond, lit(1)).otherwise(lit(0)))
    return (j.groupby(("wname", func("substring", col("w_warehouse_name"),
                                     params=(1, 20))),
                      "sm_type", "web_name")
            .agg(**aggs)
            .sort(SortKey("wname"), SortKey("sm_type"),
                  SortKey("web_name"), limit=100))


def q62_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[dd["d_month_seq"].between(1200, 1200 + 11)]
    j = (t["web_sales"]
         .merge(dt, left_on="ws_ship_date_sk", right_on="d_date_sk")
         .merge(t["warehouse"], left_on="ws_warehouse_sk",
                right_on="w_warehouse_sk")
         .merge(t["ship_mode"], left_on="ws_ship_mode_sk",
                right_on="sm_ship_mode_sk")
         .merge(t["web_site"], left_on="ws_web_site_sk",
                right_on="web_site_sk"))
    j["wname"] = j["w_warehouse_name"].str[:20]
    lag = j["ws_ship_date_sk"] - j["ws_sold_date_sk"]
    for name, lo, hi in _Q62_BUCKETS:
        cond = pd.Series(True, index=j.index)
        if lo is not None:
            cond &= lag > lo
        if hi is not None:
            cond &= lag <= hi
        j[name] = cond.astype(np.int64)
    g = j.groupby(["wname", "sm_type", "web_name"])[
        [b[0] for b in _Q62_BUCKETS]].sum().reset_index()
    return g.sort_values(["wname", "sm_type", "web_name"],
                         kind="stable").head(100)


# ---------------------------------------------------------------------------
# q84: Edgewood customers in an income band who returned something
# (q84.sql) — customer joined through address/demographics/income band to
# store_returns; two-column string concat output.
# ---------------------------------------------------------------------------

def q84(s: Session) -> Frame:
    ca = s.table("customer_address").filter(
        col("ca_city") == lit("Edgewood"))
    ib = s.table("income_band").filter(
        (col("ib_lower_bound") >= lit(38128)) &
        (col("ib_upper_bound") <= lit(38128 + 50000)))
    j = (s.table("customer")
         .join(ca, ("c_current_addr_sk",), ("ca_address_sk",))
         .join(s.table("customer_demographics"), ("c_current_cdemo_sk",),
               ("cd_demo_sk",))
         .join(s.table("household_demographics"), ("c_current_hdemo_sk",),
               ("hd_demo_sk",))
         .join(ib, ("hd_income_band_sk",), ("ib_income_band_sk",))
         .join(s.table("store_returns"), ("cd_demo_sk",), ("sr_cdemo_sk",)))
    return (j.select(customer_id=col("c_customer_id"),
                     customername=func("concat", col("c_last_name"),
                                       lit(", "), col("c_first_name")))
            .sort(SortKey("customer_id"), SortKey("customername"),
                  limit=100))


def q84_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    ca = t["customer_address"]
    ca = ca[ca["ca_city"] == "Edgewood"]
    ib = t["income_band"]
    ib = ib[(ib["ib_lower_bound"] >= 38128) &
            (ib["ib_upper_bound"] <= 38128 + 50000)]
    j = (t["customer"]
         .merge(ca, left_on="c_current_addr_sk", right_on="ca_address_sk")
         .merge(t["customer_demographics"], left_on="c_current_cdemo_sk",
                right_on="cd_demo_sk")
         .merge(t["household_demographics"], left_on="c_current_hdemo_sk",
                right_on="hd_demo_sk")
         .merge(ib, left_on="hd_income_band_sk",
                right_on="ib_income_band_sk")
         .merge(t["store_returns"], left_on="cd_demo_sk",
                right_on="sr_cdemo_sk"))
    out = pd.DataFrame({
        "customer_id": j["c_customer_id"],
        "customername": j["c_last_name"] + ", " + j["c_first_name"]})
    return out.sort_values(["customer_id", "customername"],
                           kind="stable").head(100)


# ---------------------------------------------------------------------------
# q85: web-return reasons for matching refund/return demographics in
# price/state bands (q85.sql) — customer_demographics joined twice with a
# cross-copy equality, 8-table join.
# ---------------------------------------------------------------------------

def q85(s: Session) -> Frame:
    dt = s.table("date_dim").filter(col("d_year") == lit(2000))
    cd2 = (s.table("customer_demographics")
           .rename(cd_demo_sk="cd2_demo_sk",
                   cd_gender="cd2_gender",
                   cd_marital_status="cd2_marital_status",
                   cd_education_status="cd2_education_status"))
    j = (s.table("web_sales")
         .join(s.table("web_returns"), ("ws_item_sk", "ws_order_number"),
               ("wr_item_sk", "wr_order_number"))
         .join(s.table("web_page"), ("ws_web_page_sk",),
               ("wp_web_page_sk",))
         .join(s.table("customer_demographics"), ("wr_refunded_cdemo_sk",),
               ("cd_demo_sk",))
         .join(cd2, ("wr_returning_cdemo_sk",), ("cd2_demo_sk",))
         .join(s.table("customer_address"), ("wr_refunded_addr_sk",),
               ("ca_address_sk",))
         .join(dt, ("ws_sold_date_sk",), ("d_date_sk",))
         .join(s.table("reason"), ("wr_reason_sk",), ("r_reason_sk",)))
    demo = ((col("cd_marital_status") == col("cd2_marital_status")) &
            (col("cd_education_status") == col("cd2_education_status")) &
            (((col("cd_marital_status") == lit("M")) &
              (col("cd_education_status") == lit("Advanced Degree")) &
              _between(col("ws_sales_price"), 100.00, 150.00)) |
             ((col("cd_marital_status") == lit("S")) &
              (col("cd_education_status") == lit("College")) &
              _between(col("ws_sales_price"), 50.00, 100.00)) |
             ((col("cd_marital_status") == lit("W")) &
              (col("cd_education_status") == lit("2 yr Degree")) &
              _between(col("ws_sales_price"), 150.00, 200.00))))
    addr = ((col("ca_country") == lit("United States")) &
            ((col("ca_state").isin(["IN", "OH", "NJ"]) &
              _between(col("ws_net_profit"), 100, 200)) |
             (col("ca_state").isin(["WI", "CT", "KY"]) &
              _between(col("ws_net_profit"), 150, 300)) |
             (col("ca_state").isin(["LA", "IA", "AR"]) &
              _between(col("ws_net_profit"), 50, 250))))
    return (j.filter(demo & addr)
            .groupby("r_reason_desc")
            .agg(a1=("avg", col("ws_quantity")),
                 a2=("avg", col("wr_refunded_cash")),
                 a3=("avg", col("wr_fee")))
            .select(a1=col("a1"), a2=col("a2"), a3=col("a3"),
                    reason_20=func("substring", col("r_reason_desc"),
                                   params=(1, 20)))
            .sort(SortKey("reason_20"), SortKey("a1"), SortKey("a2"),
                  SortKey("a3"), limit=100))


def q85_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dt = t["date_dim"][t["date_dim"]["d_year"] == 2000]
    cd = t["customer_demographics"]
    cd2 = cd.rename(columns={
        "cd_demo_sk": "cd2_demo_sk", "cd_gender": "cd2_gender",
        "cd_marital_status": "cd2_marital_status",
        "cd_education_status": "cd2_education_status"})
    j = (t["web_sales"]
         .merge(t["web_returns"],
                left_on=["ws_item_sk", "ws_order_number"],
                right_on=["wr_item_sk", "wr_order_number"])
         .merge(t["web_page"], left_on="ws_web_page_sk",
                right_on="wp_web_page_sk")
         .merge(cd, left_on="wr_refunded_cdemo_sk", right_on="cd_demo_sk")
         .merge(cd2, left_on="wr_returning_cdemo_sk",
                right_on="cd2_demo_sk")
         .merge(t["customer_address"], left_on="wr_refunded_addr_sk",
                right_on="ca_address_sk")
         .merge(dt, left_on="ws_sold_date_sk", right_on="d_date_sk")
         .merge(t["reason"], left_on="wr_reason_sk",
                right_on="r_reason_sk"))
    demo = ((j["cd_marital_status"] == j["cd2_marital_status"]) &
            (j["cd_education_status"] == j["cd2_education_status"]) &
            (((j["cd_marital_status"] == "M") &
              (j["cd_education_status"] == "Advanced Degree") &
              j["ws_sales_price"].between(100.00, 150.00)) |
             ((j["cd_marital_status"] == "S") &
              (j["cd_education_status"] == "College") &
              j["ws_sales_price"].between(50.00, 100.00)) |
             ((j["cd_marital_status"] == "W") &
              (j["cd_education_status"] == "2 yr Degree") &
              j["ws_sales_price"].between(150.00, 200.00))))
    addr = ((j["ca_country"] == "United States") &
            ((j["ca_state"].isin(["IN", "OH", "NJ"]) &
              j["ws_net_profit"].between(100, 200)) |
             (j["ca_state"].isin(["WI", "CT", "KY"]) &
              j["ws_net_profit"].between(150, 300)) |
             (j["ca_state"].isin(["LA", "IA", "AR"]) &
              j["ws_net_profit"].between(50, 250))))
    j = j[demo & addr]
    g = j.groupby("r_reason_desc").agg(
        a1=("ws_quantity", "mean"),
        a2=("wr_refunded_cash", "mean"),
        a3=("wr_fee", "mean")).reset_index()
    g["reason_20"] = g["r_reason_desc"].str[:20]
    return g.sort_values(["reason_20", "a1", "a2", "a3"],
                         kind="stable").head(100)[
        ["a1", "a2", "a3", "reason_20"]]


# ---------------------------------------------------------------------------
# q90: morning/evening web-traffic ratio (q90.sql). The SQL cross-joins two
# scalar counts; one pass with two filtered counters is the same number.
# ---------------------------------------------------------------------------

def q90(s: Session) -> Frame:
    hd = s.table("household_demographics").filter(
        col("hd_dep_count") == lit(6))
    wp = s.table("web_page").filter(_between(col("wp_char_count"), 5000,
                                            5200))
    j = (s.table("web_sales")
         .join(s.table("time_dim"), ("ws_sold_time_sk",), ("t_time_sk",))
         .join(hd, ("ws_ship_hdemo_sk",), ("hd_demo_sk",))
         .join(wp, ("ws_web_page_sk",), ("wp_web_page_sk",)))
    counts = j.groupby().agg(
        amc=("count_star", None, _between(col("t_hour"), 8, 9)),
        pmc=("count_star", None, _between(col("t_hour"), 19, 20)))
    return counts.select(
        am_pm_ratio=col("amc").cast(FLOAT64) / col("pmc"))


def q90_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    hd = t["household_demographics"]
    hd = hd[hd["hd_dep_count"] == 6]
    wp = t["web_page"]
    wp = wp[wp["wp_char_count"].between(5000, 5200)]
    j = (t["web_sales"]
         .merge(t["time_dim"], left_on="ws_sold_time_sk",
                right_on="t_time_sk")
         .merge(hd, left_on="ws_ship_hdemo_sk", right_on="hd_demo_sk")
         .merge(wp, left_on="ws_web_page_sk", right_on="wp_web_page_sk"))
    amc = int(j["t_hour"].between(8, 9).sum())
    pmc = int(j["t_hour"].between(19, 20).sum())
    ratio = amc / pmc if pmc else np.nan
    return pd.DataFrame({"am_pm_ratio": [ratio]})


# ---------------------------------------------------------------------------
# q92: excess web discounts vs 1.3x the item's window average (q92.sql) —
# the correlated avg subquery decorrelates to a per-item aggregate join.
# ---------------------------------------------------------------------------

def q92(s: Session) -> Frame:
    lo = date_sk("2000-01-27")
    dt = s.table("date_dim").filter(_between(col("d_date_sk"), lo, lo + 90))
    it = s.table("item").filter(col("i_manufact_id") == lit(350))
    per_item = (s.table("web_sales")
                .join(dt, ("ws_sold_date_sk",), ("d_date_sk",))
                .groupby("ws_item_sk")
                .agg(avg_disc=("avg", col("ws_ext_discount_amt")))
                .rename(ws_item_sk="sub_item_sk"))
    j = (s.table("web_sales")
         .join(dt, ("ws_sold_date_sk",), ("d_date_sk",))
         .join(it, ("ws_item_sk",), ("i_item_sk",))
         .join(per_item, ("ws_item_sk",), ("sub_item_sk",))
         .filter(col("ws_ext_discount_amt") > lit(1.3) * col("avg_disc")))
    return j.groupby().agg(excess=("sum", col("ws_ext_discount_amt")))


def q92_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    lo = date_sk("2000-01-27")
    dd = t["date_dim"]
    dt = dd[dd["d_date_sk"].between(lo, lo + 90)]
    ws = t["web_sales"]
    ws = ws[ws["ws_sold_date_sk"].isin(dt["d_date_sk"])]
    per_item = ws.groupby("ws_item_sk").agg(
        avg_disc=("ws_ext_discount_amt", "mean")).reset_index()
    it = t["item"][t["item"]["i_manufact_id"] == 350]
    j = (ws.merge(it, left_on="ws_item_sk", right_on="i_item_sk")
         .merge(per_item, on="ws_item_sk"))
    j = j[j["ws_ext_discount_amt"] > 1.3 * j["avg_disc"]]
    return pd.DataFrame({"excess": [j["ws_ext_discount_amt"].sum()
                                    if len(j) else np.nan]})


# ---------------------------------------------------------------------------
# q94: Illinois 'pri' web orders shipped from multiple warehouses with no
# returns (q94.sql) — EXISTS -> conditioned semi join, NOT EXISTS -> anti
# join, count(DISTINCT order).
# ---------------------------------------------------------------------------

def q94(s: Session) -> Frame:
    lo = date_sk("1999-02-01")
    dt = s.table("date_dim").filter(_between(col("d_date_sk"), lo, lo + 60))
    ca = s.table("customer_address").filter(col("ca_state") == lit("IL"))
    site = s.table("web_site").filter(
        col("web_company_name") == lit("pri"))
    ws2 = s.table("web_sales").select(ws2_order=col("ws_order_number"),
                                      ws2_wh=col("ws_warehouse_sk"))
    wr = s.table("web_returns").select(wr_order=col("wr_order_number"))
    j = (s.table("web_sales")
         .join(dt, ("ws_ship_date_sk",), ("d_date_sk",))
         .join(ca, ("ws_ship_addr_sk",), ("ca_address_sk",))
         .join(site, ("ws_web_site_sk",), ("web_site_sk",))
         .join(ws2, ("ws_order_number",), ("ws2_order",), how="left_semi",
               condition=col("ws_warehouse_sk") != col("ws2_wh"))
         .join(wr, ("ws_order_number",), ("wr_order",), how="left_anti"))
    return j.groupby().agg(
        order_count=("count_distinct", col("ws_order_number")),
        total_ship=("sum", col("ws_ext_ship_cost")),
        total_profit=("sum", col("ws_net_profit")))


def q94_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    lo = date_sk("1999-02-01")
    dd = t["date_dim"]
    dt = dd[dd["d_date_sk"].between(lo, lo + 60)]
    ca = t["customer_address"]
    ca = ca[ca["ca_state"] == "IL"]
    site = t["web_site"][t["web_site"]["web_company_name"] == "pri"]
    ws = t["web_sales"]
    j = (ws.merge(dt, left_on="ws_ship_date_sk", right_on="d_date_sk")
         .merge(ca, left_on="ws_ship_addr_sk", right_on="ca_address_sk")
         .merge(site, left_on="ws_web_site_sk", right_on="web_site_sk"))
    wh = ws.groupby("ws_order_number")["ws_warehouse_sk"].agg(["min", "max"])
    multi = set(wh[wh["min"] != wh["max"]].index)
    returned = set(t["web_returns"]["wr_order_number"])
    j = j[j["ws_order_number"].isin(multi) &
          ~j["ws_order_number"].isin(returned)]
    return pd.DataFrame({
        "order_count": [j["ws_order_number"].nunique()],
        "total_ship": [j["ws_ext_ship_cost"].sum() if len(j) else np.nan],
        "total_profit": [j["ws_net_profit"].sum() if len(j) else np.nan]})


QUERIES_WEB = {
    "q12": (q12, q12_oracle),
    "q45": (q45, q45_oracle),
    "q62": (q62, q62_oracle),
    "q84": (q84, q84_oracle),
    "q85": (q85, q85_oracle),
    "q90": (q90, q90_oracle),
    "q92": (q92, q92_oracle),
    "q94": (q94, q94_oracle),
}
