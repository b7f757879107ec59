"""Real TPC-DS growth/comparison queries (q6, q31, q70, q75).

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{6,31,70,75}.sql — ported verbatim. Correlated/scalar subqueries
decorrelate the way Spark plans them: q6's per-category average price is
a join against a grouped item aggregate, its month_seq scalar a semi
join; q70's top-5-state subquery is a windowed rank filter feeding a
semi join; q31's six CTE aliases are per-quarter slices of one grouped
frame joined on county.
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


def _null_like(example):
    return when(lit(False), example).end()


def _between(c, lo, hi):
    return (c >= lit(lo)) & (c <= lit(hi))


# ---------------------------------------------------------------------------
# q6: states where >=10 customers bought items priced 20% above their
# category average during January 2000 (q6.sql).
# ---------------------------------------------------------------------------

def q6(s: Session) -> Frame:
    mseq = (s.table("date_dim")
            .filter((col("d_year") == lit(2000)) &
                    (col("d_moy") == lit(1)))
            .select(ms=col("d_month_seq")).distinct())
    dt = (s.table("date_dim")
          .join(mseq, ("d_month_seq",), ("ms",), how="left_semi"))
    cat_avg = (s.table("item")
               .groupby("i_category")
               .agg(avg_price=("avg", col("i_current_price")))
               .rename(i_category="ac"))
    it = (s.table("item")
          .join(cat_avg, ("i_category",), ("ac",))
          .filter(col("i_current_price") > lit(1.2) * col("avg_price")))
    j = (s.table("store_sales")
         .join(s.table("customer"), ("ss_customer_sk",),
               ("c_customer_sk",))
         .join(s.table("customer_address"), ("c_current_addr_sk",),
               ("ca_address_sk",))
         .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
         .join(it, ("ss_item_sk",), ("i_item_sk",)))
    return (j.groupby("ca_state")
            .agg(cnt=("count_star", None))
            .filter(col("cnt") >= lit(10))
            .select(state=col("ca_state"), cnt=col("cnt"))
            .sort(SortKey("cnt"), SortKey("state"), limit=100))


def q6_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    ms = set(dd[(dd["d_year"] == 2000) & (dd["d_moy"] == 1)]
             ["d_month_seq"])
    dt = dd[dd["d_month_seq"].isin(ms)]
    it = t["item"].copy()
    avg = it.groupby("i_category")["i_current_price"].transform("mean")
    it = it[it["i_current_price"] > 1.2 * avg]
    j = (t["store_sales"]
         .merge(t["customer"], left_on="ss_customer_sk",
                right_on="c_customer_sk")
         .merge(t["customer_address"], left_on="c_current_addr_sk",
                right_on="ca_address_sk")
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(it, left_on="ss_item_sk", right_on="i_item_sk"))
    g = (j.groupby("ca_state").size().reset_index(name="cnt")
         .rename(columns={"ca_state": "state"}))
    g = g[g["cnt"] >= 10]
    return g.sort_values(["cnt", "state"], kind="stable").head(100)


# ---------------------------------------------------------------------------
# q31: counties where web sales grew faster than store sales in both
# Q1->Q2 and Q2->Q3 of 2000 (q31.sql).
# ---------------------------------------------------------------------------

def _q31_cte(s: Session, table: str, date_col: str, addr_col: str,
             price_col: str, out: str) -> Frame:
    dt = s.table("date_dim").filter(col("d_year") == lit(2000))
    return (s.table(table)
            .join(dt, (date_col,), ("d_date_sk",))
            .join(s.table("customer_address"), (addr_col,),
                  ("ca_address_sk",))
            .groupby("ca_county", "d_qoy")
            .agg(**{out: ("sum", col(price_col))}))


def q31(s: Session) -> Frame:
    ss = _q31_cte(s, "store_sales", "ss_sold_date_sk", "ss_addr_sk",
                  "ss_ext_sales_price", "store_sales")
    ws = _q31_cte(s, "web_sales", "ws_sold_date_sk", "ws_bill_addr_sk",
                  "ws_ext_sales_price", "web_sales")

    def q(f: Frame, qoy: int, cname: str, vname: str, vout: str) -> Frame:
        return (f.filter(col("d_qoy") == lit(qoy))
                .select(**{cname: col("ca_county"),
                           vout: col(vname)}))

    j = (q(ss, 1, "ca_county", "store_sales", "ss1")
         .join(q(ss, 2, "c2", "store_sales", "ss2"),
               ("ca_county",), ("c2",))
         .join(q(ss, 3, "c3", "store_sales", "ss3"),
               ("ca_county",), ("c3",))
         .join(q(ws, 1, "c4", "web_sales", "ws1"),
               ("ca_county",), ("c4",))
         .join(q(ws, 2, "c5", "web_sales", "ws2"),
               ("ca_county",), ("c5",))
         .join(q(ws, 3, "c6", "web_sales", "ws3"),
               ("ca_county",), ("c6",)))
    web12 = when(col("ws1") > lit(0.0),
                 col("ws2") / col("ws1")).end()
    sto12 = when(col("ss1") > lit(0.0),
                 col("ss2") / col("ss1")).end()
    web23 = when(col("ws2") > lit(0.0),
                 col("ws3") / col("ws2")).end()
    sto23 = when(col("ss2") > lit(0.0),
                 col("ss3") / col("ss2")).end()
    return (j.filter((web12 > sto12) & (web23 > sto23))
            .with_columns(d_year=lit(2000),
                          web_q1_q2_increase=col("ws2") / col("ws1"),
                          store_q1_q2_increase=col("ss2") / col("ss1"),
                          web_q2_q3_increase=col("ws3") / col("ws2"),
                          store_q2_q3_increase=col("ss3") / col("ss2"))
            .select("ca_county", "d_year", "web_q1_q2_increase",
                    "store_q1_q2_increase", "web_q2_q3_increase",
                    "store_q2_q3_increase")
            .sort(SortKey("ca_county")))


def q31_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[dd["d_year"] == 2000]

    def cte(table, date_col, addr_col, price_col, out):
        j = (t[table]
             .merge(dt, left_on=date_col, right_on="d_date_sk")
             .merge(t["customer_address"], left_on=addr_col,
                    right_on="ca_address_sk"))
        return j.groupby(["ca_county", "d_qoy"]).agg(
            **{out: (price_col, "sum")}).reset_index()

    ss = cte("store_sales", "ss_sold_date_sk", "ss_addr_sk",
             "ss_ext_sales_price", "store_sales")
    ws = cte("web_sales", "ws_sold_date_sk", "ws_bill_addr_sk",
             "ws_ext_sales_price", "web_sales")

    def q(f, qoy, vname, vout):
        g = f[f["d_qoy"] == qoy][["ca_county", vname]].copy()
        return g.rename(columns={vname: vout})

    j = (q(ss, 1, "store_sales", "ss1")
         .merge(q(ss, 2, "store_sales", "ss2"), on="ca_county")
         .merge(q(ss, 3, "store_sales", "ss3"), on="ca_county")
         .merge(q(ws, 1, "web_sales", "ws1"), on="ca_county")
         .merge(q(ws, 2, "web_sales", "ws2"), on="ca_county")
         .merge(q(ws, 3, "web_sales", "ws3"), on="ca_county"))
    web12 = np.where(j["ws1"] > 0, j["ws2"] / j["ws1"], np.nan)
    sto12 = np.where(j["ss1"] > 0, j["ss2"] / j["ss1"], np.nan)
    web23 = np.where(j["ws2"] > 0, j["ws3"] / j["ws2"], np.nan)
    sto23 = np.where(j["ss2"] > 0, j["ss3"] / j["ss2"], np.nan)
    j = j[(web12 > sto12) & (web23 > sto23)].copy()
    j["d_year"] = 2000
    j["web_q1_q2_increase"] = j["ws2"] / j["ws1"]
    j["store_q1_q2_increase"] = j["ss2"] / j["ss1"]
    j["web_q2_q3_increase"] = j["ws3"] / j["ws2"]
    j["store_q2_q3_increase"] = j["ss3"] / j["ss2"]
    out = j[["ca_county", "d_year", "web_q1_q2_increase",
             "store_q1_q2_increase", "web_q2_q3_increase",
             "store_q2_q3_increase"]]
    return out.sort_values("ca_county", kind="stable")


# ---------------------------------------------------------------------------
# q70: net-profit ROLLUP(s_state, s_county) restricted to each state's
# top-5 by a windowed rank (q70.sql). The inner rank partitions BY
# s_state over per-state sums, so each partition is a single row —
# ported literally anyway, as Spark executes it.
# ---------------------------------------------------------------------------

def q70(s: Session) -> Frame:
    dt = s.table("date_dim").filter(
        _between(col("d_month_seq"), 1200, 1211))
    j0 = (s.table("store_sales")
          .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
          .join(s.table("store"), ("ss_store_sk",), ("s_store_sk",)))
    sel = (j0.groupby("s_state")
           .agg(tp=("sum", col("ss_net_profit")))
           .window(("s_state",),
                   (SortKey("tp", ascending=False),),
                   (WindowFunc("ranking", "rank"),))
           .filter(col("ranking") <= lit(5))
           .select(sel_state=col("s_state")))
    j = j0.join(sel, ("s_state",), ("sel_state",), how="left_semi")

    def level(keys, loc):
        g = (j.groupby(*keys)
             .agg(total_sum=("sum", col("ss_net_profit"))))
        nulls = {}
        for c in ("s_state", "s_county"):
            if c not in keys:
                nulls[c] = _null_like(lit(""))
        g = g.with_columns(
            lochierarchy=lit(loc),
            part_state=(col("s_state") if loc == 0 else
                        _null_like(lit(""))),
            **nulls)
        return g.select("total_sum", "s_state", "s_county",
                        "lochierarchy", "part_state")

    u = (level(("s_state", "s_county"), 0)
         .union(level(("s_state",), 1))
         .union(level((), 2)))
    w = u.window(("lochierarchy", "part_state"),
                 (SortKey("total_sum", ascending=False),),
                 (WindowFunc("rank_within_parent", "rank"),))
    return (w.sort(SortKey("lochierarchy", ascending=False),
                   SortKey("part_state"),
                   SortKey("rank_within_parent"),
                   SortKey("s_state"), SortKey("s_county"),
                   SortKey("total_sum"), limit=100)
            .select("total_sum", "s_state", "s_county", "lochierarchy",
                    "rank_within_parent"))


def q70_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[dd["d_month_seq"].between(1200, 1211)]
    j0 = (t["store_sales"]
          .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
          .merge(t["store"], left_on="ss_store_sk",
                 right_on="s_store_sk"))
    g = j0.groupby("s_state").agg(tp=("ss_net_profit",
                                      "sum")).reset_index()
    g["ranking"] = g.groupby("s_state")["tp"].rank(
        method="min", ascending=False)
    states = set(g[g["ranking"] <= 5]["s_state"])
    j = j0[j0["s_state"].isin(states)]
    parts = []
    for keys, loc in ((["s_state", "s_county"], 0), (["s_state"], 1),
                      ([], 2)):
        if keys:
            p = j.groupby(keys).agg(
                total_sum=("ss_net_profit", "sum")).reset_index()
        else:
            p = pd.DataFrame({"total_sum": [j["ss_net_profit"].sum()]})
        p["lochierarchy"] = loc
        p["part_state"] = p["s_state"] if loc == 0 else None
        for c in ("s_state", "s_county"):
            if c not in p.columns:
                p[c] = None
        parts.append(p[["total_sum", "s_state", "s_county",
                        "lochierarchy", "part_state"]])
    u = pd.concat(parts, ignore_index=True)
    u["rank_within_parent"] = u.groupby(
        ["lochierarchy", "part_state"], dropna=False)["total_sum"].rank(
        method="min", ascending=False).astype(np.int64)
    srt = u.copy()
    srt["part_state"] = srt["part_state"].fillna("")
    srt["_st"] = srt["s_state"].fillna("")
    srt["_co"] = srt["s_county"].fillna("")
    srt = srt.sort_values(
        ["lochierarchy", "part_state", "rank_within_parent", "_st",
         "_co", "total_sum"],
        ascending=[False, True, True, True, True, True],
        kind="stable").head(100)
    return srt[["total_sum", "s_state", "s_county", "lochierarchy",
                "rank_within_parent"]]


# ---------------------------------------------------------------------------
# q75: Books net sales (quantity and amount, returns deducted) 2002 vs
# 2001 for brand/class/category/manufact combinations that dropped more
# than 10% (q75.sql) — per-channel LEFT JOIN to returns, UNION
# (distinct), re-aggregate, year self-join.
# ---------------------------------------------------------------------------

def _q75_channel(s: Session, sales: str, item_sk: str, date_col: str,
                 order_col: str, qty: str, price: str, ret: str,
                 r_order: str, r_item: str, r_qty: str,
                 r_amt: str) -> Frame:
    it = s.table("item").filter(col("i_category") == lit("Books"))
    r = s.table(ret).select(ro=col(r_order), ri=col(r_item),
                            rq=col(r_qty), ra=col(r_amt))
    return (s.table(sales)
            .join(it, (item_sk,), ("i_item_sk",))
            .join(s.table("date_dim"), (date_col,), ("d_date_sk",))
            .join(r, (order_col, item_sk), ("ro", "ri"), how="left")
            .with_columns(
                sales_cnt=col(qty) - func("coalesce", col("rq"), lit(0)),
                sales_amt=col(price) - func("coalesce", col("ra"),
                                            lit(0.0)))
            .select("d_year", "i_brand_id", "i_class_id",
                    "i_category_id", "i_manufact_id", "sales_cnt",
                    "sales_amt"))


_Q75_KEYS = ["i_brand_id", "i_class_id", "i_category_id",
             "i_manufact_id"]


def q75(s: Session) -> Frame:
    cs = _q75_channel(s, "catalog_sales", "cs_item_sk",
                      "cs_sold_date_sk", "cs_order_number",
                      "cs_quantity", "cs_ext_sales_price",
                      "catalog_returns", "cr_order_number", "cr_item_sk",
                      "cr_return_quantity", "cr_return_amount")
    ss = _q75_channel(s, "store_sales", "ss_item_sk", "ss_sold_date_sk",
                      "ss_ticket_number", "ss_quantity",
                      "ss_ext_sales_price", "store_returns",
                      "sr_ticket_number", "sr_item_sk",
                      "sr_return_quantity", "sr_return_amt")
    ws = _q75_channel(s, "web_sales", "ws_item_sk", "ws_sold_date_sk",
                      "ws_order_number", "ws_quantity",
                      "ws_ext_sales_price", "web_returns",
                      "wr_order_number", "wr_item_sk",
                      "wr_return_quantity", "wr_return_amt")
    all_sales = (cs.union(ss).union(ws).distinct()
                 .groupby("d_year", *_Q75_KEYS)
                 .agg(sales_cnt=("sum", col("sales_cnt")),
                      sales_amt=("sum", col("sales_amt"))))
    curr = (all_sales.filter(col("d_year") == lit(2002))
            .select(*_Q75_KEYS, curr_yr_cnt=col("sales_cnt"),
                    curr_amt=col("sales_amt")))
    prev = (all_sales.filter(col("d_year") == lit(2001))
            .select(pb=col("i_brand_id"), pc=col("i_class_id"),
                    pg=col("i_category_id"), pm=col("i_manufact_id"),
                    prev_yr_cnt=col("sales_cnt"),
                    prev_amt=col("sales_amt")))
    j = (curr.join(prev, tuple(_Q75_KEYS), ("pb", "pc", "pg", "pm"))
         .filter((col("curr_yr_cnt") * lit(1.0)) / col("prev_yr_cnt")
                 < lit(0.9)))
    return (j.with_columns(
                prev_year=lit(2001), year=lit(2002),
                sales_cnt_diff=col("curr_yr_cnt") - col("prev_yr_cnt"),
                sales_amt_diff=col("curr_amt") - col("prev_amt"))
            .select("prev_year", "year", *_Q75_KEYS, "prev_yr_cnt",
                    "curr_yr_cnt", "sales_cnt_diff", "sales_amt_diff")
            .sort(SortKey("sales_cnt_diff"), SortKey("sales_amt_diff"),
                  limit=100))


def _q75_channel_oracle(t, sales, item_sk, date_col, order_col, qty,
                        price, ret, r_order, r_item, r_qty, r_amt):
    it = t["item"]
    it = it[it["i_category"] == "Books"]
    r = t[ret][[r_order, r_item, r_qty, r_amt]]
    j = (t[sales]
         .merge(it, left_on=item_sk, right_on="i_item_sk")
         .merge(t["date_dim"], left_on=date_col, right_on="d_date_sk")
         .merge(r, left_on=[order_col, item_sk],
                right_on=[r_order, r_item], how="left"))
    j["sales_cnt"] = j[qty] - j[r_qty].fillna(0)
    j["sales_amt"] = j[price] - j[r_amt].fillna(0.0)
    return j[["d_year", "i_brand_id", "i_class_id", "i_category_id",
              "i_manufact_id", "sales_cnt", "sales_amt"]]


def q75_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    cs = _q75_channel_oracle(
        t, "catalog_sales", "cs_item_sk", "cs_sold_date_sk",
        "cs_order_number", "cs_quantity", "cs_ext_sales_price",
        "catalog_returns", "cr_order_number", "cr_item_sk",
        "cr_return_quantity", "cr_return_amount")
    ss = _q75_channel_oracle(
        t, "store_sales", "ss_item_sk", "ss_sold_date_sk",
        "ss_ticket_number", "ss_quantity", "ss_ext_sales_price",
        "store_returns", "sr_ticket_number", "sr_item_sk",
        "sr_return_quantity", "sr_return_amt")
    ws = _q75_channel_oracle(
        t, "web_sales", "ws_item_sk", "ws_sold_date_sk",
        "ws_order_number", "ws_quantity", "ws_ext_sales_price",
        "web_returns", "wr_order_number", "wr_item_sk",
        "wr_return_quantity", "wr_return_amt")
    u = pd.concat([cs, ss, ws], ignore_index=True).drop_duplicates()
    g = u.groupby(["d_year"] + _Q75_KEYS).agg(
        sales_cnt=("sales_cnt", "sum"),
        sales_amt=("sales_amt", "sum")).reset_index()
    curr = g[g["d_year"] == 2002]
    prev = g[g["d_year"] == 2001]
    j = curr.merge(prev, on=_Q75_KEYS, suffixes=("", "_p"))
    j = j[j["sales_cnt"] / j["sales_cnt_p"] < 0.9].copy()
    j["prev_year"] = 2001
    j["year"] = 2002
    j["prev_yr_cnt"] = j["sales_cnt_p"]
    j["curr_yr_cnt"] = j["sales_cnt"]
    j["sales_cnt_diff"] = j["sales_cnt"] - j["sales_cnt_p"]
    j["sales_amt_diff"] = j["sales_amt"] - j["sales_amt_p"]
    out = j[["prev_year", "year"] + _Q75_KEYS +
            ["prev_yr_cnt", "curr_yr_cnt", "sales_cnt_diff",
             "sales_amt_diff"]]
    return out.sort_values(["sales_cnt_diff", "sales_amt_diff"],
                           kind="stable").head(100)


QUERIES_GROWTH = {
    "q6": (q6, q6_oracle),
    "q31": (q31, q31_oracle),
    "q70": (q70, q70_oracle),
    "q75": (q75, q75_oracle),
}
