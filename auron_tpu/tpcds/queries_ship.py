"""Real TPC-DS return-ratio ranking + warehouse shipping pivot.

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{49,66}.sql — verbatim. q49 ranks per-channel return ratios and UNIONs
(distinct) the three top-10 slices; q66 pivots DHL/BARIAN shipments into
12-month sales/net columns per warehouse across web+catalog.
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
# q49
# ---------------------------------------------------------------------------

_Q49_CHANNELS = {
    "web": ("web_sales", "web_returns", "ws_order_number",
            "wr_order_number", "ws_item_sk", "wr_item_sk",
            "ws_sold_date_sk", "ws_quantity", "ws_net_paid",
            "ws_net_profit", "wr_return_quantity", "wr_return_amt"),
    "catalog": ("catalog_sales", "catalog_returns", "cs_order_number",
                "cr_order_number", "cs_item_sk", "cr_item_sk",
                "cs_sold_date_sk", "cs_quantity", "cs_net_paid_inc_tax",
                "cs_net_profit", "cr_return_quantity",
                "cr_return_amount"),
    "store": ("store_sales", "store_returns", "ss_ticket_number",
              "sr_ticket_number", "ss_item_sk", "sr_item_sk",
              "ss_sold_date_sk", "ss_quantity", "ss_net_paid",
              "ss_net_profit", "sr_return_quantity", "sr_return_amt"),
}


def _q49_channel(s: Session, name: str) -> Frame:
    (sale, ret, so, ro, si, ri, sd, qty, paid, profit, rqty,
     ramt) = _Q49_CHANNELS[name]
    dt = s.table("date_dim").filter((col("d_year") == lit(2001)) &
                                    (col("d_moy") == lit(12)))
    r = (s.table(ret).select(**{f"r_{ro}": col(ro), f"r_{ri}": col(ri),
                                "rqty": col(rqty), "ramt": col(ramt)}))
    j = (s.table(sale)
         .join(r, (so, si), (f"r_{ro}", f"r_{ri}"), how="left")
         .join(dt, (sd,), ("d_date_sk",))
         .filter((col("ramt") > lit(10000.0)) &
                 (col(profit) > lit(1.0)) & (col(paid) > lit(0.0)) &
                 (col(qty) > lit(0))))
    g = (j.groupby(("item", col(si)))
         .agg(rq=("sum", func("coalesce", col("rqty"), lit(0))),
              sq=("sum", func("coalesce", col(qty), lit(0))),
              ra=("sum", func("coalesce", col("ramt"), lit(0.0))),
              pa=("sum", func("coalesce", col(paid), lit(0.0))))
         .with_columns(return_ratio=col("rq") / col("sq"),
                       currency_ratio=col("ra") / col("pa")))
    # rank peers are defined by the ORDER BY alone: ties share a rank
    w = (g.window((), (SortKey("return_ratio"),),
                  (WindowFunc("return_rank", "rank"),))
         .window((), (SortKey("currency_ratio"),),
                 (WindowFunc("currency_rank", "rank"),)))
    return (w.filter((col("return_rank") <= lit(10)) |
                     (col("currency_rank") <= lit(10)))
            .select(channel=lit(name), item=col("item"),
                    return_ratio=col("return_ratio"),
                    return_rank=col("return_rank"),
                    currency_rank=col("currency_rank")))


def q49(s: Session) -> Frame:
    u = (_q49_channel(s, "web").union(_q49_channel(s, "catalog"))
         .union(_q49_channel(s, "store")).distinct())
    return u.sort(SortKey("channel"), SortKey("return_rank"),
                  SortKey("currency_rank"), SortKey("item"), limit=100)


def _q49_channel_oracle(t, name):
    (sale, ret, so, ro, si, ri, sd, qty, paid, profit, rqty,
     ramt) = _Q49_CHANNELS[name]
    dd = t["date_dim"]
    dt = dd[(dd["d_year"] == 2001) & (dd["d_moy"] == 12)]
    j = (t[sale]
         .merge(t[ret][[ro, ri, rqty, ramt]],
                left_on=[so, si], right_on=[ro, ri], how="left")
         .merge(dt, left_on=sd, right_on="d_date_sk"))
    j = j[(j[ramt] > 10000.0) & (j[profit] > 1.0) & (j[paid] > 0.0) &
          (j[qty] > 0)]
    g = j.groupby(si).agg(
        rq=(rqty, lambda x: x.fillna(0).sum()),
        sq=(qty, "sum"), ra=(ramt, lambda x: x.fillna(0).sum()),
        pa=(paid, "sum")).reset_index().rename(columns={si: "item"})
    g["return_ratio"] = g["rq"] / g["sq"]
    g["currency_ratio"] = g["ra"] / g["pa"]
    g = g.sort_values(["return_ratio", "item"], kind="stable")
    g["return_rank"] = g["return_ratio"].rank(method="min") \
        .astype(np.int64)
    g["currency_rank"] = g["currency_ratio"].rank(method="min") \
        .astype(np.int64)
    g = g[(g["return_rank"] <= 10) | (g["currency_rank"] <= 10)].copy()
    g["channel"] = name
    return g[["channel", "item", "return_ratio", "return_rank",
              "currency_rank"]]


def q49_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    u = pd.concat([_q49_channel_oracle(t, n)
                   for n in ("web", "catalog", "store")],
                  ignore_index=True).drop_duplicates()
    return u.sort_values(["channel", "return_rank", "currency_rank",
                          "item"], kind="stable").head(100)


# ---------------------------------------------------------------------------
# q66
# ---------------------------------------------------------------------------

_MONTHS = ["jan", "feb", "mar", "apr", "may", "jun", "jul", "aug", "sep",
           "oct", "nov", "dec"]
_Q66_KEYS = ["w_warehouse_name", "w_warehouse_sq_ft", "w_city", "w_county",
             "w_state", "w_country"]


def _q66_channel(s: Session, fact, date_col, time_col, mode_col, wh_col,
                 price_col, net_col) -> Frame:
    dt = s.table("date_dim").filter(col("d_year") == lit(2001))
    td = s.table("time_dim").filter(_between(col("t_time"), 30838,
                                            30838 + 28800))
    sm = s.table("ship_mode").filter(
        col("sm_carrier").isin(["DHL", "BARIAN"]))
    j = (s.table(fact)
         .join(s.table("warehouse"), (wh_col,), ("w_warehouse_sk",))
         .join(dt, (date_col,), ("d_date_sk",))
         .join(td, (time_col,), ("t_time_sk",))
         .join(sm, (mode_col,), ("sm_ship_mode_sk",)))
    aggs = {}
    for m_i, m in enumerate(_MONTHS, start=1):
        aggs[f"{m}_sales"] = ("sum", when(col("d_moy") == lit(m_i),
                                          col(price_col) * col("qty_"))
                              .otherwise(lit(0.0)))
        aggs[f"{m}_net"] = ("sum", when(col("d_moy") == lit(m_i),
                                        col(net_col) * col("qty_"))
                            .otherwise(lit(0.0)))
    qty = {"web_sales": "ws_quantity",
           "catalog_sales": "cs_quantity"}[fact]
    j = j.with_columns(qty_=col(qty))
    g = j.groupby(*_Q66_KEYS, ("year", col("d_year"))).agg(**aggs)
    return g.with_columns(ship_carriers=lit("DHL,BARIAN"))


def q66(s: Session) -> Frame:
    a = _q66_channel(s, "web_sales", "ws_sold_date_sk", "ws_sold_time_sk",
                     "ws_ship_mode_sk", "ws_warehouse_sk",
                     "ws_ext_sales_price", "ws_net_paid")
    b = _q66_channel(s, "catalog_sales", "cs_sold_date_sk",
                     "cs_sold_time_sk", "cs_ship_mode_sk",
                     "cs_warehouse_sk", "cs_sales_price",
                     "cs_net_paid_inc_tax")
    cols = (_Q66_KEYS + ["ship_carriers", "year"] +
            [f"{m}_sales" for m in _MONTHS] + [f"{m}_net" for m in _MONTHS])
    u = a.select(*cols).union(b.select(*cols))
    aggs = {}
    for m in _MONTHS:
        aggs[f"{m}_sales"] = ("sum", col(f"{m}_sales"))
        aggs[f"{m}_sales_psf"] = ("sum", col(f"{m}_sales") /
                                  col("w_warehouse_sq_ft"))
        aggs[f"{m}_net"] = ("sum", col(f"{m}_net"))
    return (u.groupby(*_Q66_KEYS, "ship_carriers", "year").agg(**aggs)
            .sort(SortKey("w_warehouse_name"), limit=100))


def q66_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[dd["d_year"] == 2001]
    td = t["time_dim"]
    td = td[td["t_time"].between(30838, 30838 + 28800)]
    sm = t["ship_mode"]
    sm = sm[sm["sm_carrier"].isin(["DHL", "BARIAN"])]

    def chan(fact, date_col, time_col, mode_col, wh_col, price_col,
             net_col, qty_col):
        j = (t[fact]
             .merge(t["warehouse"], left_on=wh_col,
                    right_on="w_warehouse_sk")
             .merge(dt, left_on=date_col, right_on="d_date_sk")
             .merge(td, left_on=time_col, right_on="t_time_sk")
             .merge(sm, left_on=mode_col, right_on="sm_ship_mode_sk"))
        for m_i, m in enumerate(_MONTHS, start=1):
            sel = j["d_moy"] == m_i
            j[f"{m}_sales"] = np.where(sel, j[price_col] * j[qty_col], 0.0)
            j[f"{m}_net"] = np.where(sel, j[net_col] * j[qty_col], 0.0)
        g = j.groupby(_Q66_KEYS + ["d_year"])[
            [f"{m}_sales" for m in _MONTHS] +
            [f"{m}_net" for m in _MONTHS]].sum().reset_index() \
            .rename(columns={"d_year": "year"})
        g["ship_carriers"] = "DHL,BARIAN"
        return g
    u = pd.concat([
        chan("web_sales", "ws_sold_date_sk", "ws_sold_time_sk",
             "ws_ship_mode_sk", "ws_warehouse_sk", "ws_ext_sales_price",
             "ws_net_paid", "ws_quantity"),
        chan("catalog_sales", "cs_sold_date_sk", "cs_sold_time_sk",
             "cs_ship_mode_sk", "cs_warehouse_sk", "cs_sales_price",
             "cs_net_paid_inc_tax", "cs_quantity")], ignore_index=True)
    for m in _MONTHS:
        u[f"{m}_sales_psf"] = u[f"{m}_sales"] / u["w_warehouse_sq_ft"]
    agg = {f"{m}_sales": (f"{m}_sales", "sum") for m in _MONTHS}
    agg.update({f"{m}_sales_psf": (f"{m}_sales_psf", "sum")
                for m in _MONTHS})
    agg.update({f"{m}_net": (f"{m}_net", "sum") for m in _MONTHS})
    g = u.groupby(_Q66_KEYS + ["ship_carriers", "year"]).agg(
        **agg).reset_index()
    return g.sort_values("w_warehouse_name", kind="stable").head(100)


QUERIES_SHIP = {
    "q49": (q49, q49_oracle),
    "q66": (q66, q66_oracle),
}
