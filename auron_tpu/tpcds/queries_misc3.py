"""Real TPC-DS channel-overlap / promotion-ratio / rollup-rank queries.

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{16,61,71,86,97}.sql — verbatim predicates. q97's FULL OUTER JOIN of
distinct (customer, item) sets drives the IS NULL overlap counters; q16 is
q94's catalog twin (EXISTS with warehouse inequality, NOT EXISTS returns);
q86 is the web rollup-rank (q36 machinery); q71 unions three channels into
a meal-time brand report; q61 is a promotional/total revenue ratio.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

from auron_tpu.expr.nodes import col, lit, when
from auron_tpu.ops.sort import SortKey
from auron_tpu.ops.window import WindowFunc
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame, table
from auron_tpu.tpcds.datagen import date_sk


def _between(c, lo, hi):
    return (c >= lit(lo)) & (c <= lit(hi))


def _null_like(example):
    return when(lit(False), example).end()


# ---------------------------------------------------------------------------
# q97: store/catalog buyer-item overlap via FULL OUTER JOIN of the two
# distinct (customer, item) sets (q97.sql).
# ---------------------------------------------------------------------------

def q97(s: Session) -> Frame:
    dt = s.table("date_dim").filter(_between(col("d_month_seq"), 1200,
                                            1200 + 11))
    ssci = (s.table("store_sales")
            .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
            .select(customer_sk=col("ss_customer_sk"),
                    item_sk=col("ss_item_sk")).distinct())
    csci = (s.table("catalog_sales")
            .join(dt, ("cs_sold_date_sk",), ("d_date_sk",))
            .select(c2=col("cs_bill_customer_sk"),
                    i2=col("cs_item_sk")).distinct())
    j = ssci.join(csci, ("customer_sk", "item_sk"), ("c2", "i2"),
                  how="full")
    return j.groupby().agg(
        store_only=("sum", when(col("customer_sk").is_not_null() &
                                col("c2").is_null(), lit(1))
                    .otherwise(lit(0))),
        catalog_only=("sum", when(col("customer_sk").is_null() &
                                  col("c2").is_not_null(), lit(1))
                      .otherwise(lit(0))),
        store_and_catalog=("sum",
                           when(col("customer_sk").is_not_null() &
                                col("c2").is_not_null(), lit(1))
                           .otherwise(lit(0))))


def q97_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = set(dd[dd["d_month_seq"].between(1200, 1211)]["d_date_sk"])
    ss = t["store_sales"]
    ss = ss[ss["ss_sold_date_sk"].isin(dt)]
    a = set(map(tuple, ss[["ss_customer_sk",
                           "ss_item_sk"]].drop_duplicates().to_numpy()))
    cs = t["catalog_sales"]
    cs = cs[cs["cs_sold_date_sk"].isin(dt)]
    b = set(map(tuple, cs[["cs_bill_customer_sk",
                           "cs_item_sk"]].drop_duplicates().to_numpy()))
    return pd.DataFrame({
        "store_only": [len(a - b)], "catalog_only": [len(b - a)],
        "store_and_catalog": [len(a & b)]})


# ---------------------------------------------------------------------------
# q16: Georgia catalog orders shipped from multiple warehouses with no
# returns (q16.sql) — q94's catalog twin.
# ---------------------------------------------------------------------------

def q16(s: Session) -> Frame:
    lo = date_sk("2002-02-01")
    dt = s.table("date_dim").filter(_between(col("d_date_sk"), lo, lo + 60))
    ca = s.table("customer_address").filter(col("ca_state") == lit("GA"))
    cc = s.table("call_center").filter(
        col("cc_county").isin(["Williamson County"]))
    cs2 = s.table("catalog_sales").select(o2=col("cs_order_number"),
                                          w2=col("cs_warehouse_sk"))
    cr = s.table("catalog_returns").select(ro=col("cr_order_number"))
    j = (s.table("catalog_sales")
         .join(dt, ("cs_ship_date_sk",), ("d_date_sk",))
         .join(ca, ("cs_ship_addr_sk",), ("ca_address_sk",))
         .join(cc, ("cs_call_center_sk",), ("cc_call_center_sk",))
         .join(cs2, ("cs_order_number",), ("o2",), how="left_semi",
               condition=col("cs_warehouse_sk") != col("w2"))
         .join(cr, ("cs_order_number",), ("ro",), how="left_anti"))
    return j.groupby().agg(
        order_count=("count_distinct", col("cs_order_number")),
        total_ship=("sum", col("cs_ext_ship_cost")),
        total_profit=("sum", col("cs_net_profit")))


def q16_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    lo = date_sk("2002-02-01")
    dd = t["date_dim"]
    dt = dd[dd["d_date_sk"].between(lo, lo + 60)]
    ca = t["customer_address"]
    ca = ca[ca["ca_state"] == "GA"]
    cc = t["call_center"]
    cc = cc[cc["cc_county"].isin(["Williamson County"])]
    cs = t["catalog_sales"]
    j = (cs.merge(dt, left_on="cs_ship_date_sk", right_on="d_date_sk")
         .merge(ca, left_on="cs_ship_addr_sk", right_on="ca_address_sk")
         .merge(cc, left_on="cs_call_center_sk",
                right_on="cc_call_center_sk"))
    wh = cs.groupby("cs_order_number")["cs_warehouse_sk"].agg(
        ["min", "max"])
    multi = set(wh[wh["min"] != wh["max"]].index)
    returned = set(t["catalog_returns"]["cr_order_number"])
    j = j[j["cs_order_number"].isin(multi) &
          ~j["cs_order_number"].isin(returned)]
    return pd.DataFrame({
        "order_count": [j["cs_order_number"].nunique()],
        "total_ship": [j["cs_ext_ship_cost"].sum() if len(j) else np.nan],
        "total_profit": [j["cs_net_profit"].sum() if len(j) else np.nan]})


# ---------------------------------------------------------------------------
# q86: web net-paid rollup with grouping-rank (q86.sql — q36's shape).
# ---------------------------------------------------------------------------

def q86(s: Session) -> Frame:
    dt = s.table("date_dim").filter(_between(col("d_month_seq"), 1200,
                                            1200 + 11))
    j = (s.table("web_sales")
         .join(dt, ("ws_sold_date_sk",), ("d_date_sk",))
         .join(s.table("item"), ("ws_item_sk",), ("i_item_sk",)))

    def level(keys, loc):
        g = j.groupby(*keys).agg(total_sum=("sum", col("ws_net_paid")))
        nulls = {}
        if "i_category" not in keys:
            nulls["i_category"] = _null_like(lit(""))
        if "i_class" not in keys:
            nulls["i_class"] = _null_like(lit(""))
        g = g.with_columns(
            lochierarchy=lit(loc),
            part_cat=(col("i_category") if loc == 0 else
                      _null_like(lit(""))), **nulls)
        return g.select("total_sum", "i_category", "i_class",
                        "lochierarchy", "part_cat")

    u = (level(("i_category", "i_class"), 0)
         .union(level(("i_category",), 1)).union(level((), 2)))
    w = u.window(("lochierarchy", "part_cat"),
                 (SortKey("total_sum", ascending=False),),
                 (WindowFunc("rank_within_parent", "rank"),))
    return (w.select("total_sum", "i_category", "i_class", "lochierarchy",
                     "rank_within_parent")
            .sort(SortKey("lochierarchy", ascending=False),
                  SortKey("i_category"), SortKey("rank_within_parent"),
                  SortKey("i_class"), SortKey("total_sum"), limit=100))


def q86_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[dd["d_month_seq"].between(1200, 1211)]
    j = (t["web_sales"]
         .merge(dt, left_on="ws_sold_date_sk", right_on="d_date_sk")
         .merge(t["item"], left_on="ws_item_sk", right_on="i_item_sk"))
    parts = []
    for keys, loc in ((["i_category", "i_class"], 0), (["i_category"], 1),
                      ([], 2)):
        if keys:
            g = j.groupby(keys)["ws_net_paid"].sum() \
                .reset_index(name="total_sum")
        else:
            g = pd.DataFrame({"total_sum": [j["ws_net_paid"].sum()]})
        g["lochierarchy"] = loc
        g["part_cat"] = g["i_category"] if loc == 0 else None
        for c in ("i_category", "i_class"):
            if c not in g.columns:
                g[c] = None
        parts.append(g[["total_sum", "i_category", "i_class",
                        "lochierarchy", "part_cat"]])
    u = pd.concat(parts, ignore_index=True)
    u["rank_within_parent"] = u.groupby(
        ["lochierarchy", "part_cat"], dropna=False)["total_sum"] \
        .rank(method="min", ascending=False).astype(np.int64)
    return u.sort_values(
        ["lochierarchy", "i_category", "rank_within_parent", "i_class",
         "total_sum"], ascending=[False, True, True, True, True],
        na_position="first", kind="stable").head(100)[
        ["total_sum", "i_category", "i_class", "lochierarchy",
         "rank_within_parent"]]


# ---------------------------------------------------------------------------
# q71: breakfast/dinner brand revenue across all three channels,
# November 1999 (q71.sql).
# ---------------------------------------------------------------------------

def _q71_channel(s, fact, price, date_col, item_col, time_col):
    dt = s.table("date_dim").filter((col("d_moy") == lit(11)) &
                                    (col("d_year") == lit(1999)))
    return (s.table(fact)
            .join(dt, (date_col,), ("d_date_sk",))
            .select(ext_price=col(price), sold_item_sk=col(item_col),
                    time_sk=col(time_col)))


def q71(s: Session) -> Frame:
    u = (_q71_channel(s, "web_sales", "ws_ext_sales_price",
                      "ws_sold_date_sk", "ws_item_sk", "ws_sold_time_sk")
         .union(_q71_channel(s, "catalog_sales", "cs_ext_sales_price",
                             "cs_sold_date_sk", "cs_item_sk",
                             "cs_sold_time_sk"))
         .union(_q71_channel(s, "store_sales", "ss_ext_sales_price",
                             "ss_sold_date_sk", "ss_item_sk",
                             "ss_sold_time_sk")))
    it = s.table("item").filter(col("i_manager_id") == lit(1))
    td = s.table("time_dim").filter(
        (col("t_meal_time") == lit("breakfast")) |
        (col("t_meal_time") == lit("dinner")))
    j = (u.join(it, ("sold_item_sk",), ("i_item_sk",))
         .join(td, ("time_sk",), ("t_time_sk",)))
    return (j.groupby("i_brand", "i_brand_id", "t_hour", "t_minute")
            .agg(ext_price=("sum", col("ext_price")))
            .sort(SortKey("ext_price", ascending=False),
                  SortKey("i_brand_id"), SortKey("t_hour"),
                  SortKey("t_minute"), SortKey("i_brand"))
            .select(brand_id=col("i_brand_id"), brand=col("i_brand"),
                    t_hour=col("t_hour"), t_minute=col("t_minute"),
                    ext_price=col("ext_price")))


def q71_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[(dd["d_moy"] == 11) & (dd["d_year"] == 1999)]
    parts = []
    for fact, price, date_col, item_col, time_col in (
            ("web_sales", "ws_ext_sales_price", "ws_sold_date_sk",
             "ws_item_sk", "ws_sold_time_sk"),
            ("catalog_sales", "cs_ext_sales_price", "cs_sold_date_sk",
             "cs_item_sk", "cs_sold_time_sk"),
            ("store_sales", "ss_ext_sales_price", "ss_sold_date_sk",
             "ss_item_sk", "ss_sold_time_sk")):
        j = t[fact].merge(dt, left_on=date_col, right_on="d_date_sk")
        parts.append(pd.DataFrame({
            "ext_price": j[price], "sold_item_sk": j[item_col],
            "time_sk": j[time_col]}))
    u = pd.concat(parts, ignore_index=True)
    it = t["item"][t["item"]["i_manager_id"] == 1]
    td = t["time_dim"]
    td = td[td["t_meal_time"].isin(["breakfast", "dinner"])]
    j = (u.merge(it, left_on="sold_item_sk", right_on="i_item_sk")
         .merge(td, left_on="time_sk", right_on="t_time_sk"))
    g = j.groupby(["i_brand", "i_brand_id", "t_hour", "t_minute"]).agg(
        ext_price=("ext_price", "sum")).reset_index()
    g = g.sort_values(
        ["ext_price", "i_brand_id", "t_hour", "t_minute", "i_brand"],
        ascending=[False, True, True, True, True], kind="stable")[
        ["i_brand_id", "i_brand", "t_hour", "t_minute", "ext_price"]]
    return g.rename(columns={"i_brand_id": "brand_id", "i_brand": "brand"})


# ---------------------------------------------------------------------------
# q61: promotional vs total Jewelry revenue for GMT-5 customers/stores,
# November 1998 (q61.sql) — two global sums cross-joined into a ratio.
# ---------------------------------------------------------------------------

def _q61_base(s: Session) -> Frame:
    dt = s.table("date_dim").filter((col("d_year") == lit(1998)) &
                                    (col("d_moy") == lit(11)))
    st = s.table("store").filter(col("s_gmt_offset") == lit(-5.0))
    ca = s.table("customer_address").filter(
        col("ca_gmt_offset") == lit(-5.0))
    it = s.table("item").filter(col("i_category") == lit("Jewelry"))
    return (s.table("store_sales")
            .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
            .join(st, ("ss_store_sk",), ("s_store_sk",))
            .join(s.table("customer"), ("ss_customer_sk",),
                  ("c_customer_sk",))
            .join(ca, ("c_current_addr_sk",), ("ca_address_sk",))
            .join(it, ("ss_item_sk",), ("i_item_sk",)))


def q61(s: Session) -> Frame:
    pr = s.table("promotion").filter(
        (col("p_channel_dmail") == lit("Y")) |
        (col("p_channel_email") == lit("Y")) |
        (col("p_channel_tv") == lit("Y")))
    promo = (_q61_base(s).join(pr, ("ss_promo_sk",), ("p_promo_sk",))
             .groupby().agg(promotions=("sum", col("ss_ext_sales_price")))
             .with_columns(_k=lit(1)))
    total = (_q61_base(s)
             .groupby().agg(total=("sum", col("ss_ext_sales_price")))
             .with_columns(_k2=lit(1)))
    return (promo.join(total, ("_k",), ("_k2",), strategy="broadcast")
            .select(promotions=col("promotions"), total=col("total"),
                    ratio=col("promotions") / col("total") * lit(100.0)))


def q61_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[(dd["d_year"] == 1998) & (dd["d_moy"] == 11)]
    st = t["store"][t["store"]["s_gmt_offset"] == -5.0]
    ca = t["customer_address"]
    ca = ca[ca["ca_gmt_offset"] == -5.0]
    it = t["item"][t["item"]["i_category"] == "Jewelry"]
    base = (t["store_sales"]
            .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
            .merge(st, left_on="ss_store_sk", right_on="s_store_sk")
            .merge(t["customer"], left_on="ss_customer_sk",
                   right_on="c_customer_sk")
            .merge(ca, left_on="c_current_addr_sk",
                   right_on="ca_address_sk")
            .merge(it, left_on="ss_item_sk", right_on="i_item_sk"))
    pr = t["promotion"]
    pr = pr[(pr["p_channel_dmail"] == "Y") | (pr["p_channel_email"] == "Y")
            | (pr["p_channel_tv"] == "Y")]
    promo = base.merge(pr, left_on="ss_promo_sk", right_on="p_promo_sk")
    p = promo["ss_ext_sales_price"].sum() if len(promo) else np.nan
    tot = base["ss_ext_sales_price"].sum() if len(base) else np.nan
    return pd.DataFrame({"promotions": [p], "total": [tot],
                         "ratio": [p / tot * 100.0]})


QUERIES_MISC3 = {
    "q16": (q16, q16_oracle),
    "q61": (q61, q61_oracle),
    "q71": (q71, q71_oracle),
    "q86": (q86, q86_oracle),
    "q97": (q97, q97_oracle),
}
