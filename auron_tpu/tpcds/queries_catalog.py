"""Real TPC-DS catalog-channel + inventory queries as Frames + oracles.

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{15,20,21,25,26,37,40,82,99}.sql — predicates ported verbatim. Date-literal
windows (d_date BETWEEN 'x' AND 'x' + N days) filter on d_date_sk through
datagen.date_sk: the dimension is contiguous-daily, so the sk bound is the
same predicate.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

from auron_tpu.expr.nodes import col, func, lit, when
from auron_tpu.ops.sort import SortKey
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame
from auron_tpu.tpcds.datagen import date_sk
from auron_tpu.tpcds.queries_store2 import q98, q98_oracle


def _between(c, lo, hi):
    return (c >= lit(lo)) & (c <= lit(hi))


# ---------------------------------------------------------------------------
# q15: catalog revenue by zip for magic zips / coastal states / big tickets
# (q15.sql).
# ---------------------------------------------------------------------------

_Q15_ZIPS = ["85669", "86197", "88274", "83405", "86475", "85392", "85460",
             "80348", "81792"]


def q15(s: Session) -> Frame:
    dt = s.table("date_dim").filter((col("d_qoy") == lit(2)) &
                                    (col("d_year") == lit(2001)))
    j = (s.table("catalog_sales")
         .join(s.table("customer"), ("cs_bill_customer_sk",),
               ("c_customer_sk",))
         .join(s.table("customer_address"), ("c_current_addr_sk",),
               ("ca_address_sk",))
         .join(dt, ("cs_sold_date_sk",), ("d_date_sk",))
         .filter(func("substring", col("ca_zip"),
                      params=(1, 5)).isin(_Q15_ZIPS) |
                 col("ca_state").isin(["CA", "WA", "GA"]) |
                 (col("cs_sales_price") > lit(500))))
    return (j.groupby("ca_zip")
            .agg(total=("sum", col("cs_sales_price")))
            .sort(SortKey("ca_zip"), limit=100))


def q15_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[(dd["d_qoy"] == 2) & (dd["d_year"] == 2001)]
    j = (t["catalog_sales"]
         .merge(t["customer"], left_on="cs_bill_customer_sk",
                right_on="c_customer_sk")
         .merge(t["customer_address"], left_on="c_current_addr_sk",
                right_on="ca_address_sk")
         .merge(dt, left_on="cs_sold_date_sk", right_on="d_date_sk"))
    j = j[j["ca_zip"].str[:5].isin(_Q15_ZIPS) |
          j["ca_state"].isin(["CA", "WA", "GA"]) |
          (j["cs_sales_price"] > 500)]
    g = j.groupby("ca_zip").agg(total=("cs_sales_price",
                                       "sum")).reset_index()
    return g.sort_values("ca_zip", kind="stable").head(100)


# ---------------------------------------------------------------------------
# q20: catalog item revenue share within class (q20.sql) — q98's shape over
# catalog_sales with LIMIT 100.
# ---------------------------------------------------------------------------

def q20(s: Session) -> Frame:
    return q98(s, datecol="cs_sold_date_sk", itemcol="cs_item_sk",
               pricecol="cs_ext_sales_price", table="catalog_sales",
               limit=100)


def q20_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    return q98_oracle(t, datecol="cs_sold_date_sk", itemcol="cs_item_sk",
                      pricecol="cs_ext_sales_price", table="catalog_sales",
                      limit=100)


# ---------------------------------------------------------------------------
# q21: warehouse inventory before/after the 2000-03-11 pivot for items in
# the 0.99-1.49 price band, keeping ratios in [2/3, 3/2] (q21.sql).
# ---------------------------------------------------------------------------

def q21(s: Session) -> Frame:
    pivot = date_sk("2000-03-11")
    dt = s.table("date_dim").filter(_between(col("d_date_sk"), pivot - 30,
                                            pivot + 30))
    it = s.table("item").filter(_between(col("i_current_price"), 0.99,
                                         1.49))
    j = (s.table("inventory")
         .join(s.table("warehouse"), ("inv_warehouse_sk",),
               ("w_warehouse_sk",))
         .join(it, ("inv_item_sk",), ("i_item_sk",))
         .join(dt, ("inv_date_sk",), ("d_date_sk",)))
    x = (j.groupby("w_warehouse_name", "i_item_id")
         .agg(inv_before=("sum", when(col("d_date_sk") < lit(pivot),
                                      col("inv_quantity_on_hand"))
                          .otherwise(lit(0))),
              inv_after=("sum", when(col("d_date_sk") >= lit(pivot),
                                     col("inv_quantity_on_hand"))
                         .otherwise(lit(0)))))
    ratio = when(col("inv_before") > lit(0),
                 col("inv_after") / col("inv_before")).end()
    return (x.filter((ratio >= lit(2.0 / 3.0)) & (ratio <= lit(3.0 / 2.0)))
            .sort(SortKey("w_warehouse_name"), SortKey("i_item_id"),
                  limit=100))


def q21_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    pivot = date_sk("2000-03-11")
    dd = t["date_dim"]
    dt = dd[dd["d_date_sk"].between(pivot - 30, pivot + 30)]
    it = t["item"][t["item"]["i_current_price"].between(0.99, 1.49)]
    j = (t["inventory"]
         .merge(t["warehouse"], left_on="inv_warehouse_sk",
                right_on="w_warehouse_sk")
         .merge(it, left_on="inv_item_sk", right_on="i_item_sk")
         .merge(dt, left_on="inv_date_sk", right_on="d_date_sk"))
    j["inv_before"] = np.where(j["d_date_sk"] < pivot,
                               j["inv_quantity_on_hand"], 0)
    j["inv_after"] = np.where(j["d_date_sk"] >= pivot,
                              j["inv_quantity_on_hand"], 0)
    g = j.groupby(["w_warehouse_name", "i_item_id"])[
        ["inv_before", "inv_after"]].sum().reset_index()
    ratio = g["inv_after"] / g["inv_before"]
    g = g[(g["inv_before"] > 0) & ratio.between(2.0 / 3.0, 3.0 / 2.0)]
    return g.sort_values(["w_warehouse_name", "i_item_id"],
                         kind="stable").head(100)


# ---------------------------------------------------------------------------
# q25: April-2001 store sales that were returned and re-bought via catalog
# within the season (q25.sql) — ss⋈sr on (customer, item, ticket), sr⋈cs on
# (customer, item), three date_dim roles.
# ---------------------------------------------------------------------------

def q25(s: Session) -> Frame:
    d1 = (s.table("date_dim")
          .filter((col("d_moy") == lit(4)) & (col("d_year") == lit(2001)))
          .rename(d_date_sk="d1_date_sk"))
    d2 = (s.table("date_dim")
          .filter(_between(col("d_moy"), 4, 10) &
                  (col("d_year") == lit(2001)))
          .rename(d_date_sk="d2_date_sk"))
    d3 = (s.table("date_dim")
          .filter(_between(col("d_moy"), 4, 10) &
                  (col("d_year") == lit(2001)))
          .rename(d_date_sk="d3_date_sk"))
    j = (s.table("store_sales")
         .join(s.table("store_returns"),
               ("ss_customer_sk", "ss_item_sk", "ss_ticket_number"),
               ("sr_customer_sk", "sr_item_sk", "sr_ticket_number"))
         .join(s.table("catalog_sales"),
               ("sr_customer_sk", "sr_item_sk"),
               ("cs_bill_customer_sk", "cs_item_sk"))
         .join(d1, ("ss_sold_date_sk",), ("d1_date_sk",))
         .join(d2, ("sr_returned_date_sk",), ("d2_date_sk",))
         .join(d3, ("cs_sold_date_sk",), ("d3_date_sk",))
         .join(s.table("store"), ("ss_store_sk",), ("s_store_sk",))
         .join(s.table("item"), ("ss_item_sk",), ("i_item_sk",)))
    return (j.groupby("i_item_id", "i_item_desc", "s_store_id",
                      "s_store_name")
            .agg(store_sales_profit=("sum", col("ss_net_profit")),
                 store_returns_loss=("sum", col("sr_net_loss")),
                 catalog_sales_profit=("sum", col("cs_net_profit")))
            .sort(SortKey("i_item_id"), SortKey("i_item_desc"),
                  SortKey("s_store_id"), SortKey("s_store_name"),
                  limit=100))


def q25_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    d1 = dd[(dd["d_moy"] == 4) & (dd["d_year"] == 2001)]
    d23 = dd[dd["d_moy"].between(4, 10) & (dd["d_year"] == 2001)]
    j = (t["store_sales"]
         .merge(t["store_returns"],
                left_on=["ss_customer_sk", "ss_item_sk",
                         "ss_ticket_number"],
                right_on=["sr_customer_sk", "sr_item_sk",
                          "sr_ticket_number"])
         .merge(t["catalog_sales"],
                left_on=["sr_customer_sk", "sr_item_sk"],
                right_on=["cs_bill_customer_sk", "cs_item_sk"]))
    j = j[j["ss_sold_date_sk"].isin(d1["d_date_sk"]) &
          j["sr_returned_date_sk"].isin(d23["d_date_sk"]) &
          j["cs_sold_date_sk"].isin(d23["d_date_sk"])]
    j = (j.merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk"))
    g = j.groupby(["i_item_id", "i_item_desc", "s_store_id",
                   "s_store_name"]).agg(
        store_sales_profit=("ss_net_profit", "sum"),
        store_returns_loss=("sr_net_loss", "sum"),
        catalog_sales_profit=("cs_net_profit", "sum")).reset_index()
    return g.sort_values(["i_item_id", "i_item_desc", "s_store_id",
                          "s_store_name"], kind="stable").head(100)


# ---------------------------------------------------------------------------
# q26: catalog item averages for the single/college male demographic with a
# quiet promotion channel, year 2000 (q26.sql — q7's catalog twin).
# ---------------------------------------------------------------------------

def q26(s: Session) -> Frame:
    dt = s.table("date_dim").filter(col("d_year") == lit(2000))
    cd = s.table("customer_demographics").filter(
        (col("cd_gender") == lit("M")) &
        (col("cd_marital_status") == lit("S")) &
        (col("cd_education_status") == lit("College")))
    pr = s.table("promotion").filter(
        (col("p_channel_email") == lit("N")) |
        (col("p_channel_event") == lit("N")))
    j = (s.table("catalog_sales")
         .join(dt, ("cs_sold_date_sk",), ("d_date_sk",))
         .join(s.table("item"), ("cs_item_sk",), ("i_item_sk",))
         .join(cd, ("cs_bill_cdemo_sk",), ("cd_demo_sk",))
         .join(pr, ("cs_promo_sk",), ("p_promo_sk",)))
    return (j.groupby("i_item_id")
            .agg(agg1=("avg", col("cs_quantity")),
                 agg2=("avg", col("cs_list_price")),
                 agg3=("avg", col("cs_coupon_amt")),
                 agg4=("avg", col("cs_sales_price")))
            .sort(SortKey("i_item_id"), limit=100))


def q26_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dt = t["date_dim"][t["date_dim"]["d_year"] == 2000]
    cd = t["customer_demographics"]
    cd = cd[(cd["cd_gender"] == "M") & (cd["cd_marital_status"] == "S") &
            (cd["cd_education_status"] == "College")]
    pr = t["promotion"]
    pr = pr[(pr["p_channel_email"] == "N") | (pr["p_channel_event"] == "N")]
    j = (t["catalog_sales"]
         .merge(dt, left_on="cs_sold_date_sk", right_on="d_date_sk")
         .merge(t["item"], left_on="cs_item_sk", right_on="i_item_sk")
         .merge(cd, left_on="cs_bill_cdemo_sk", right_on="cd_demo_sk")
         .merge(pr, left_on="cs_promo_sk", right_on="p_promo_sk"))
    g = j.groupby("i_item_id").agg(
        agg1=("cs_quantity", "mean"),
        agg2=("cs_list_price", "mean"),
        agg3=("cs_coupon_amt", "mean"),
        agg4=("cs_sales_price", "mean")).reset_index()
    return g.sort_values("i_item_id", kind="stable").head(100)


# ---------------------------------------------------------------------------
# q37 / q82: items in a price/manufacturer band with 100-500 units on hand
# during a 60-day window that also sold through a channel (q37: catalog,
# q82: store). The channel join only multiplies rows; GROUP BY dedupes.
# ---------------------------------------------------------------------------

def _q37_like(s: Session, price_lo, manufacts, window_start, sales_table,
              sales_item_col) -> Frame:
    lo = date_sk(window_start)
    dt = s.table("date_dim").filter(_between(col("d_date_sk"), lo, lo + 60))
    it = s.table("item").filter(
        _between(col("i_current_price"), price_lo, price_lo + 30) &
        col("i_manufact_id").isin(manufacts))
    inv = s.table("inventory").filter(
        _between(col("inv_quantity_on_hand"), 100, 500))
    j = (it.join(inv, ("i_item_sk",), ("inv_item_sk",))
         .join(dt, ("inv_date_sk",), ("d_date_sk",))
         .join(s.table(sales_table), ("i_item_sk",), (sales_item_col,)))
    return (j.groupby("i_item_id", "i_item_desc", "i_current_price").agg()
            .sort(SortKey("i_item_id"), SortKey("i_item_desc"),
                  SortKey("i_current_price"), limit=100))


def _q37_like_oracle(t, price_lo, manufacts, window_start, sales_table,
                     sales_item_col) -> pd.DataFrame:
    lo = date_sk(window_start)
    dd = t["date_dim"]
    dt = dd[dd["d_date_sk"].between(lo, lo + 60)]
    it = t["item"]
    it = it[it["i_current_price"].between(price_lo, price_lo + 30) &
            it["i_manufact_id"].isin(manufacts)]
    inv = t["inventory"]
    inv = inv[inv["inv_quantity_on_hand"].between(100, 500)]
    j = (it.merge(inv, left_on="i_item_sk", right_on="inv_item_sk")
         .merge(dt, left_on="inv_date_sk", right_on="d_date_sk")
         .merge(t[sales_table], left_on="i_item_sk",
                right_on=sales_item_col))
    g = j[["i_item_id", "i_item_desc",
           "i_current_price"]].drop_duplicates()
    return g.sort_values(["i_item_id", "i_item_desc", "i_current_price"],
                         kind="stable").head(100)


def q37(s: Session) -> Frame:
    return _q37_like(s, 68, [677, 940, 694, 808], "2000-02-01",
                     "catalog_sales", "cs_item_sk")


def q37_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    return _q37_like_oracle(t, 68, [677, 940, 694, 808], "2000-02-01",
                            "catalog_sales", "cs_item_sk")


def q82(s: Session) -> Frame:
    return _q37_like(s, 62, [129, 270, 821, 423], "2000-05-25",
                     "store_sales", "ss_item_sk")


def q82_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    return _q37_like_oracle(t, 62, [129, 270, 821, 423], "2000-05-25",
                            "store_sales", "ss_item_sk")


# ---------------------------------------------------------------------------
# q40: catalog sales net of refunds around the 2000-03-11 pivot by
# warehouse state (q40.sql) — LEFT JOIN catalog_returns + coalesce.
# ---------------------------------------------------------------------------

def q40(s: Session) -> Frame:
    pivot = date_sk("2000-03-11")
    dt = s.table("date_dim").filter(_between(col("d_date_sk"), pivot - 30,
                                            pivot + 30))
    it = s.table("item").filter(_between(col("i_current_price"), 0.99,
                                         1.49))
    net = col("cs_sales_price") - func("coalesce",
                                       col("cr_refunded_cash"), lit(0.0))
    j = (s.table("catalog_sales")
         .join(s.table("catalog_returns"),
               ("cs_order_number", "cs_item_sk"),
               ("cr_order_number", "cr_item_sk"), how="left")
         .join(s.table("warehouse"), ("cs_warehouse_sk",),
               ("w_warehouse_sk",))
         .join(it, ("cs_item_sk",), ("i_item_sk",))
         .join(dt, ("cs_sold_date_sk",), ("d_date_sk",)))
    return (j.groupby("w_state", "i_item_id")
            .agg(sales_before=("sum",
                               when(col("d_date_sk") < lit(pivot), net)
                               .otherwise(lit(0.0))),
                 sales_after=("sum",
                              when(col("d_date_sk") >= lit(pivot), net)
                              .otherwise(lit(0.0))))
            .sort(SortKey("w_state"), SortKey("i_item_id"), limit=100))


def q40_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    pivot = date_sk("2000-03-11")
    dd = t["date_dim"]
    dt = dd[dd["d_date_sk"].between(pivot - 30, pivot + 30)]
    it = t["item"][t["item"]["i_current_price"].between(0.99, 1.49)]
    j = (t["catalog_sales"]
         .merge(t["catalog_returns"],
                left_on=["cs_order_number", "cs_item_sk"],
                right_on=["cr_order_number", "cr_item_sk"], how="left")
         .merge(t["warehouse"], left_on="cs_warehouse_sk",
                right_on="w_warehouse_sk")
         .merge(it, left_on="cs_item_sk", right_on="i_item_sk")
         .merge(dt, left_on="cs_sold_date_sk", right_on="d_date_sk"))
    net = j["cs_sales_price"] - j["cr_refunded_cash"].fillna(0.0)
    j["sales_before"] = np.where(j["d_date_sk"] < pivot, net, 0.0)
    j["sales_after"] = np.where(j["d_date_sk"] >= pivot, net, 0.0)
    g = j.groupby(["w_state", "i_item_id"])[
        ["sales_before", "sales_after"]].sum().reset_index()
    return g.sort_values(["w_state", "i_item_id"], kind="stable").head(100)


# ---------------------------------------------------------------------------
# q99: catalog shipping-latency buckets by warehouse/mode/call-center for
# year 2000 (q99.sql).
# ---------------------------------------------------------------------------

_Q99_BUCKETS = [("d30", None, 30), ("d31_60", 30, 60), ("d61_90", 60, 90),
                ("d91_120", 90, 120), ("d_over_120", 120, None)]


def q99(s: Session) -> Frame:
    dt = s.table("date_dim").filter(_between(col("d_month_seq"), 1200,
                                            1200 + 11))
    j = (s.table("catalog_sales")
         .join(dt, ("cs_ship_date_sk",), ("d_date_sk",))
         .join(s.table("warehouse"), ("cs_warehouse_sk",),
               ("w_warehouse_sk",))
         .join(s.table("ship_mode"), ("cs_ship_mode_sk",),
               ("sm_ship_mode_sk",))
         .join(s.table("call_center"), ("cs_call_center_sk",),
               ("cc_call_center_sk",)))
    lag = col("cs_ship_date_sk") - col("cs_sold_date_sk")
    aggs = {}
    for name, lo, hi in _Q99_BUCKETS:
        cond = None
        if lo is not None:
            cond = lag > lit(lo)
        if hi is not None:
            c2 = lag <= lit(hi)
            cond = c2 if cond is None else (cond & c2)
        aggs[name] = ("sum", when(cond, lit(1)).otherwise(lit(0)))
    return (j.groupby(("wname", func("substring", col("w_warehouse_name"),
                                     params=(1, 20))),
                      "sm_type", "cc_name")
            .agg(**aggs)
            .sort(SortKey("wname"), SortKey("sm_type"), SortKey("cc_name"),
                  limit=100))


def q99_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[dd["d_month_seq"].between(1200, 1200 + 11)]
    j = (t["catalog_sales"]
         .merge(dt, left_on="cs_ship_date_sk", right_on="d_date_sk")
         .merge(t["warehouse"], left_on="cs_warehouse_sk",
                right_on="w_warehouse_sk")
         .merge(t["ship_mode"], left_on="cs_ship_mode_sk",
                right_on="sm_ship_mode_sk")
         .merge(t["call_center"], left_on="cs_call_center_sk",
                right_on="cc_call_center_sk"))
    j["wname"] = j["w_warehouse_name"].str[:20]
    lag = j["cs_ship_date_sk"] - j["cs_sold_date_sk"]
    for name, lo, hi in _Q99_BUCKETS:
        cond = pd.Series(True, index=j.index)
        if lo is not None:
            cond &= lag > lo
        if hi is not None:
            cond &= lag <= hi
        j[name] = cond.astype(np.int64)
    g = j.groupby(["wname", "sm_type", "cc_name"])[
        [b[0] for b in _Q99_BUCKETS]].sum().reset_index()
    return g.sort_values(["wname", "sm_type", "cc_name"],
                         kind="stable").head(100)


QUERIES_CATALOG = {
    "q15": (q15, q15_oracle),
    "q20": (q20, q20_oracle),
    "q21": (q21, q21_oracle),
    "q25": (q25, q25_oracle),
    "q26": (q26, q26_oracle),
    "q37": (q37, q37_oracle),
    "q40": (q40, q40_oracle),
    "q82": (q82, q82_oracle),
    "q99": (q99, q99_oracle),
}
