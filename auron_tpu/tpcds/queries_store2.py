"""Real TPC-DS store-channel queries (part 2) as Frame pipelines + oracles.

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{65,68,79,88,93,96,98}.sql — predicates ported verbatim. Queries without a
LIMIT skip the engine-side ORDER BY (the comparator is row-multiset-based);
LIMIT queries append tiebreak sort keys to both sides where the SQL order
is not total.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

from auron_tpu.expr.nodes import col, func, lit, when
from auron_tpu.ops.sort import SortKey
from auron_tpu.ops.window import WindowFunc
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame


def _between(c, lo, hi):
    return (c >= lit(lo)) & (c <= lit(hi))


# ---------------------------------------------------------------------------
# q65: items selling under 10% of their store's average item revenue over
# a 12-month window (q65.sql) — two aggregation levels over the same
# (store, item) revenue subquery, joined back to store/item.
# ---------------------------------------------------------------------------

_Q65_SORT = ["s_store_name", "i_item_desc", "revenue", "i_current_price",
             "i_wholesale_cost", "i_brand"]  # last 4 = tiebreaks


def _q65_rev(s: Session) -> Frame:
    dt = s.table("date_dim").filter(_between(col("d_month_seq"), 1176,
                                            1176 + 11))
    return (s.table("store_sales")
            .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
            .groupby("ss_store_sk", "ss_item_sk")
            .agg(revenue=("sum", col("ss_sales_price"))))


def q65(s: Session) -> Frame:
    sb = (_q65_rev(s).groupby("ss_store_sk")
          .agg(ave=("avg", col("revenue")))
          .rename(ss_store_sk="sb_store_sk"))
    sc = _q65_rev(s)
    return (sc.join(sb, ("ss_store_sk",), ("sb_store_sk",))
            .filter(col("revenue") <= col("ave") * lit(0.1))
            .join(s.table("store"), ("ss_store_sk",), ("s_store_sk",))
            .join(s.table("item"), ("ss_item_sk",), ("i_item_sk",))
            .select("s_store_name", "i_item_desc", "revenue",
                    "i_current_price", "i_wholesale_cost", "i_brand")
            .sort(*[SortKey(k) for k in _Q65_SORT], limit=100))


def q65_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[dd["d_month_seq"].between(1176, 1176 + 11)]
    rev = (t["store_sales"]
           .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
           .groupby(["ss_store_sk", "ss_item_sk"])
           .agg(revenue=("ss_sales_price", "sum")).reset_index())
    sb = rev.groupby("ss_store_sk").agg(
        ave=("revenue", "mean")).reset_index()
    j = rev.merge(sb, on="ss_store_sk")
    j = j[j["revenue"] <= 0.1 * j["ave"]]
    j = (j.merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk"))
    return j.sort_values(_Q65_SORT, kind="stable").head(100)[
        ["s_store_name", "i_item_desc", "revenue", "i_current_price",
         "i_wholesale_cost", "i_brand"]]


# ---------------------------------------------------------------------------
# q68: month-start baskets in Midway/Fairview bought away from the
# customer's current city (q68.sql) — q46's dual-address shape with
# ext-price/list/tax sums.
# ---------------------------------------------------------------------------

_Q68_SORT = ["c_last_name", "ss_ticket_number", "c_first_name", "ca_city",
             "bought_city", "extended_price", "extended_tax",
             "list_price"]  # keys after the first two = tiebreaks


def q68(s: Session) -> Frame:
    dt = s.table("date_dim").filter(
        _between(col("d_dom"), 1, 2) &
        col("d_year").isin([1999, 2000, 2001]))
    st = s.table("store").filter(col("s_city").isin(["Midway", "Fairview"]))
    hd = s.table("household_demographics").filter(
        (col("hd_dep_count") == lit(4)) |
        (col("hd_vehicle_count") == lit(3)))
    dn = (s.table("store_sales")
          .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
          .join(st, ("ss_store_sk",), ("s_store_sk",))
          .join(hd, ("ss_hdemo_sk",), ("hd_demo_sk",))
          .join(s.table("customer_address"), ("ss_addr_sk",),
                ("ca_address_sk",))
          .groupby("ss_ticket_number", "ss_customer_sk", "ss_addr_sk",
                   "ca_city")
          .agg(extended_price=("sum", col("ss_ext_sales_price")),
               list_price=("sum", col("ss_ext_list_price")),
               extended_tax=("sum", col("ss_ext_tax")))
          .rename(ca_city="bought_city"))
    return (dn.join(s.table("customer"), ("ss_customer_sk",),
                    ("c_customer_sk",))
            .join(s.table("customer_address"), ("c_current_addr_sk",),
                  ("ca_address_sk",))
            .filter(col("ca_city") != col("bought_city"))
            .select("c_last_name", "c_first_name", "ca_city", "bought_city",
                    "ss_ticket_number", "extended_price", "extended_tax",
                    "list_price")
            .sort(*[SortKey(k) for k in _Q68_SORT], limit=100))


def q68_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[dd["d_dom"].between(1, 2) &
            dd["d_year"].isin([1999, 2000, 2001])]
    st = t["store"][t["store"]["s_city"].isin(["Midway", "Fairview"])]
    hd = t["household_demographics"]
    hd = hd[(hd["hd_dep_count"] == 4) | (hd["hd_vehicle_count"] == 3)]
    j = (t["store_sales"]
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk")
         .merge(hd, left_on="ss_hdemo_sk", right_on="hd_demo_sk")
         .merge(t["customer_address"], left_on="ss_addr_sk",
                right_on="ca_address_sk"))
    dn = j.groupby(["ss_ticket_number", "ss_customer_sk", "ss_addr_sk",
                    "ca_city"]).agg(
        extended_price=("ss_ext_sales_price", "sum"),
        list_price=("ss_ext_list_price", "sum"),
        extended_tax=("ss_ext_tax", "sum")).reset_index() \
        .rename(columns={"ca_city": "bought_city"})
    out = (dn.merge(t["customer"], left_on="ss_customer_sk",
                    right_on="c_customer_sk")
           .merge(t["customer_address"], left_on="c_current_addr_sk",
                  right_on="ca_address_sk"))
    out = out[out["ca_city"] != out["bought_city"]]
    return out.sort_values(_Q68_SORT, kind="stable").head(100)[
        ["c_last_name", "c_first_name", "ca_city", "bought_city",
         "ss_ticket_number", "extended_price", "extended_tax",
         "list_price"]]


# ---------------------------------------------------------------------------
# q79: Monday baskets at mid-size stores for high-dependency households
# (q79.sql) — group on (ticket, customer, addr, city), substr projection.
# ---------------------------------------------------------------------------

_Q79_SORT = ["c_last_name", "c_first_name", "s_city_30",
             "ss_ticket_number", "profit", "amt"]  # amt = extra tiebreak


def q79(s: Session) -> Frame:
    dt = s.table("date_dim").filter(
        (col("d_dow") == lit(1)) &
        col("d_year").isin([1999, 2000, 2001]))
    st = s.table("store").filter(
        _between(col("s_number_employees"), 200, 295))
    hd = s.table("household_demographics").filter(
        (col("hd_dep_count") == lit(6)) | (col("hd_vehicle_count") > lit(2)))
    ms = (s.table("store_sales")
          .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
          .join(st, ("ss_store_sk",), ("s_store_sk",))
          .join(hd, ("ss_hdemo_sk",), ("hd_demo_sk",))
          .groupby("ss_ticket_number", "ss_customer_sk", "ss_addr_sk",
                   "s_city")
          .agg(amt=("sum", col("ss_coupon_amt")),
               profit=("sum", col("ss_net_profit"))))
    return (ms.join(s.table("customer"), ("ss_customer_sk",),
                    ("c_customer_sk",))
            .select(c_last_name=col("c_last_name"),
                    c_first_name=col("c_first_name"),
                    s_city_30=func("substring", col("s_city"),
                                   params=(1, 30)),
                    ss_ticket_number=col("ss_ticket_number"),
                    amt=col("amt"), profit=col("profit"))
            .sort(*[SortKey(k) for k in _Q79_SORT], limit=100))


def q79_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[(dd["d_dow"] == 1) & dd["d_year"].isin([1999, 2000, 2001])]
    st = t["store"][t["store"]["s_number_employees"].between(200, 295)]
    hd = t["household_demographics"]
    hd = hd[(hd["hd_dep_count"] == 6) | (hd["hd_vehicle_count"] > 2)]
    j = (t["store_sales"]
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk")
         .merge(hd, left_on="ss_hdemo_sk", right_on="hd_demo_sk"))
    # ss_addr_sk is nullable and a GROUP key: SQL (and the engine) keep
    # the NULL group
    ms = j.groupby(["ss_ticket_number", "ss_customer_sk", "ss_addr_sk",
                    "s_city"], dropna=False).agg(
        amt=("ss_coupon_amt", "sum"),
        profit=("ss_net_profit", "sum")).reset_index()
    out = ms.merge(t["customer"], left_on="ss_customer_sk",
                   right_on="c_customer_sk")
    out["s_city_30"] = out["s_city"].str[:30]
    return out.sort_values(_Q79_SORT, kind="stable").head(100)[
        ["c_last_name", "c_first_name", "s_city_30", "ss_ticket_number",
         "amt", "profit"]]


# ---------------------------------------------------------------------------
# q88: one row of eight half-hour store-traffic counts (q88.sql). The SQL
# cross-joins eight scalar count subqueries over identical join shapes; a
# columnar engine runs ONE pass with eight filtered counters — the same
# result from one global aggregate with per-call FILTERs.
# ---------------------------------------------------------------------------

_Q88_BUCKETS = [("h8_30_to_9", 8, True), ("h9_to_9_30", 9, False),
                ("h9_30_to_10", 9, True), ("h10_to_10_30", 10, False),
                ("h10_30_to_11", 10, True), ("h11_to_11_30", 11, False),
                ("h11_30_to_12", 11, True), ("h12_to_12_30", 12, False)]


def q88(s: Session) -> Frame:
    hd = s.table("household_demographics").filter(
        ((col("hd_dep_count") == lit(4)) &
         (col("hd_vehicle_count") <= lit(6))) |
        ((col("hd_dep_count") == lit(2)) &
         (col("hd_vehicle_count") <= lit(4))) |
        ((col("hd_dep_count") == lit(0)) &
         (col("hd_vehicle_count") <= lit(2))))
    st = s.table("store").filter(col("s_store_name") == lit("ese"))
    j = (s.table("store_sales")
         .join(s.table("time_dim"), ("ss_sold_time_sk",), ("t_time_sk",))
         .join(hd, ("ss_hdemo_sk",), ("hd_demo_sk",))
         .join(st, ("ss_store_sk",), ("s_store_sk",)))
    aggs = {}
    for name, hour, late in _Q88_BUCKETS:
        halff = (col("t_minute") >= lit(30)) if late \
            else (col("t_minute") < lit(30))
        aggs[name] = ("count_star", None,
                      (col("t_hour") == lit(hour)) & halff)
    return j.groupby().agg(**aggs)


def q88_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    hd = t["household_demographics"]
    hd = hd[((hd["hd_dep_count"] == 4) & (hd["hd_vehicle_count"] <= 6)) |
            ((hd["hd_dep_count"] == 2) & (hd["hd_vehicle_count"] <= 4)) |
            ((hd["hd_dep_count"] == 0) & (hd["hd_vehicle_count"] <= 2))]
    st = t["store"][t["store"]["s_store_name"] == "ese"]
    j = (t["store_sales"]
         .merge(t["time_dim"], left_on="ss_sold_time_sk",
                right_on="t_time_sk")
         .merge(hd, left_on="ss_hdemo_sk", right_on="hd_demo_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk"))
    row = {}
    for name, hour, late in _Q88_BUCKETS:
        half = j["t_minute"] >= 30 if late else j["t_minute"] < 30
        row[name] = [int(((j["t_hour"] == hour) & half).sum())]
    return pd.DataFrame(row)


# ---------------------------------------------------------------------------
# q93: actual sales after 'reason 28' returns (q93.sql) — store_sales LEFT
# JOIN store_returns on (item, ticket), reason filter, CASE net-quantity.
# ---------------------------------------------------------------------------

def q93(s: Session) -> Frame:
    r = s.table("reason").filter(col("r_reason_desc") == lit("reason 28"))
    j = (s.table("store_sales")
         .join(s.table("store_returns"),
               ("ss_item_sk", "ss_ticket_number"),
               ("sr_item_sk", "sr_ticket_number"), how="left")
         .join(r, ("sr_reason_sk",), ("r_reason_sk",)))
    act = when(col("sr_return_quantity").is_not_null(),
               (col("ss_quantity") - col("sr_return_quantity")) *
               col("ss_sales_price")) \
        .otherwise(col("ss_quantity") * col("ss_sales_price"))
    return (j.with_columns(act_sales=act)
            .groupby("ss_customer_sk")
            .agg(sumsales=("sum", col("act_sales")))
            .sort(SortKey("sumsales"), SortKey("ss_customer_sk"),
                  limit=100))


def q93_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    r = t["reason"][t["reason"]["r_reason_desc"] == "reason 28"]
    j = (t["store_sales"]
         .merge(t["store_returns"],
                left_on=["ss_item_sk", "ss_ticket_number"],
                right_on=["sr_item_sk", "sr_ticket_number"], how="left")
         .merge(r, left_on="sr_reason_sk", right_on="r_reason_sk"))
    j["act_sales"] = np.where(
        j["sr_return_quantity"].notna(),
        (j["ss_quantity"] - j["sr_return_quantity"]) * j["ss_sales_price"],
        j["ss_quantity"] * j["ss_sales_price"])
    g = j.groupby("ss_customer_sk").agg(
        sumsales=("act_sales", "sum")).reset_index()
    return g.sort_values(["sumsales", "ss_customer_sk"],
                         kind="stable").head(100)[
        ["ss_customer_sk", "sumsales"]]


# ---------------------------------------------------------------------------
# q96: evening store-traffic count (q96.sql) — single global count(*).
# ---------------------------------------------------------------------------

def q96(s: Session) -> Frame:
    td = s.table("time_dim").filter((col("t_hour") == lit(20)) &
                                    (col("t_minute") >= lit(30)))
    hd = s.table("household_demographics").filter(
        col("hd_dep_count") == lit(7))
    st = s.table("store").filter(col("s_store_name") == lit("ese"))
    return (s.table("store_sales")
            .join(td, ("ss_sold_time_sk",), ("t_time_sk",))
            .join(hd, ("ss_hdemo_sk",), ("hd_demo_sk",))
            .join(st, ("ss_store_sk",), ("s_store_sk",))
            .groupby().agg(cnt=("count_star", None)))


def q96_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    td = t["time_dim"]
    td = td[(td["t_hour"] == 20) & (td["t_minute"] >= 30)]
    hd = t["household_demographics"]
    hd = hd[hd["hd_dep_count"] == 7]
    st = t["store"][t["store"]["s_store_name"] == "ese"]
    j = (t["store_sales"]
         .merge(td, left_on="ss_sold_time_sk", right_on="t_time_sk")
         .merge(hd, left_on="ss_hdemo_sk", right_on="hd_demo_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk"))
    return pd.DataFrame({"cnt": [len(j)]})


# ---------------------------------------------------------------------------
# q98: item revenue share within class over a 30-day window (q98.sql) —
# aggregate + whole-partition window sum + ratio projection.
# ---------------------------------------------------------------------------

def q98(s: Session, sales: str = "ss", datecol: str = "ss_sold_date_sk",
        itemcol: str = "ss_item_sk", pricecol: str = "ss_ext_sales_price",
        table: str = "store_sales", limit=None) -> Frame:
    from auron_tpu.tpcds.datagen import date_sk
    lo, hi = date_sk("1999-02-22"), date_sk("1999-02-22") + 30
    dt = s.table("date_dim").filter(_between(col("d_date_sk"), lo, hi))
    it = s.table("item").filter(
        col("i_category").isin(["Sports", "Books", "Home"]))
    rev = (s.table(table)
           .join(dt, (datecol,), ("d_date_sk",))
           .join(it, (itemcol,), ("i_item_sk",))
           .groupby("i_item_id", "i_item_desc", "i_category", "i_class",
                    "i_current_price")
           .agg(itemrevenue=("sum", col(pricecol))))
    w = rev.window(("i_class",), (SortKey("i_item_id"),),
                   (WindowFunc("class_rev", "sum", input="itemrevenue",
                               cumulative=False),))
    out = (w.with_columns(revenueratio=col("itemrevenue") * lit(100.0) /
                          col("class_rev"))
           .select("i_item_desc", "i_category", "i_class",
                   "i_current_price", "itemrevenue", "revenueratio",
                   "i_item_id"))
    if limit:
        out = out.sort(SortKey("i_category"), SortKey("i_class"),
                       SortKey("i_item_id"), SortKey("i_item_desc"),
                       SortKey("revenueratio"), limit=limit)
    return out.select("i_item_desc", "i_category", "i_class",
                      "i_current_price", "itemrevenue", "revenueratio")


def q98_oracle(t: Dict[str, pd.DataFrame], datecol: str = "ss_sold_date_sk",
               itemcol: str = "ss_item_sk",
               pricecol: str = "ss_ext_sales_price",
               table: str = "store_sales", limit=None) -> pd.DataFrame:
    from auron_tpu.tpcds.datagen import date_sk
    lo, hi = date_sk("1999-02-22"), date_sk("1999-02-22") + 30
    dd = t["date_dim"]
    dt = dd[dd["d_date_sk"].between(lo, hi)]
    it = t["item"][t["item"]["i_category"].isin(["Sports", "Books",
                                                 "Home"])]
    j = (t[table]
         .merge(dt, left_on=datecol, right_on="d_date_sk")
         .merge(it, left_on=itemcol, right_on="i_item_sk"))
    rev = j.groupby(["i_item_id", "i_item_desc", "i_category", "i_class",
                     "i_current_price"]).agg(
        itemrevenue=(pricecol, "sum")).reset_index()
    rev["class_rev"] = rev.groupby("i_class")["itemrevenue"] \
        .transform("sum")
    rev["revenueratio"] = rev["itemrevenue"] * 100.0 / rev["class_rev"]
    if limit:
        rev = rev.sort_values(["i_category", "i_class", "i_item_id",
                               "i_item_desc", "revenueratio"],
                              kind="stable").head(limit)
    return rev[["i_item_desc", "i_category", "i_class", "i_current_price",
                "itemrevenue", "revenueratio"]]


QUERIES_STORE_2 = {
    "q65": (q65, q65_oracle),
    "q68": (q68, q68_oracle),
    "q79": (q79, q79_oracle),
    "q88": (q88, q88_oracle),
    "q93": (q93, q93_oracle),
    "q96": (q96, q96_oracle),
    "q98": (q98, q98_oracle),
}
