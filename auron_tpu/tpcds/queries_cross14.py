"""Real TPC-DS q14a/q14b: cross-channel brand/class/category analysis.

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{14a,14b}.sql — ported verbatim. The three-way INTERSECT of
(brand, class, category) sets decomposes into semi joins of DISTINCT
sets; the avg_sales and week_seq scalar subqueries stay traced via
Frame.as_scalar_expr; q14a finishes with a 4-column ROLLUP.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

from auron_tpu.expr.nodes import col, lit, when
from auron_tpu.ops.sort import SortKey
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame


def _null_like(example):
    return when(lit(False), example).end()


def _between(c, lo, hi):
    return (c >= lit(lo)) & (c <= lit(hi))


_TRIPLE = ("i_brand_id", "i_class_id", "i_category_id")
_CHANNELS = (
    ("store", "store_sales", "ss_item_sk", "ss_sold_date_sk",
     "ss_quantity", "ss_list_price"),
    ("catalog", "catalog_sales", "cs_item_sk", "cs_sold_date_sk",
     "cs_quantity", "cs_list_price"),
    ("web", "web_sales", "ws_item_sk", "ws_sold_date_sk",
     "ws_quantity", "ws_list_price"),
)


def _q14_cross_items(s: Session) -> Frame:
    def chan(table, item_col, date_col):
        dt = s.table("date_dim").filter(
            _between(col("d_year"), 1999, 2001))
        return (s.table(table)
                .join(dt, (date_col,), ("d_date_sk",))
                .join(s.table("item"), (item_col,), ("i_item_sk",))
                .select(*_TRIPLE).distinct())

    ss = chan("store_sales", "ss_item_sk", "ss_sold_date_sk")
    cs = (chan("catalog_sales", "cs_item_sk", "cs_sold_date_sk")
          .select(cb=col("i_brand_id"), cc=col("i_class_id"),
                  cg=col("i_category_id")))
    ws = (chan("web_sales", "ws_item_sk", "ws_sold_date_sk")
          .select(wb=col("i_brand_id"), wc=col("i_class_id"),
                  wg=col("i_category_id")))
    x = (ss.join(cs, _TRIPLE, ("cb", "cc", "cg"), how="left_semi")
         .join(ws, _TRIPLE, ("wb", "wc", "wg"), how="left_semi")
         .select(xb=col("i_brand_id"), xc=col("i_class_id"),
                 xg=col("i_category_id")))
    return (s.table("item")
            .join(x, _TRIPLE, ("xb", "xc", "xg"), how="left_semi")
            .select(cri=col("i_item_sk")))


def _q14_avg_sales(s: Session):
    parts = None
    for _, table, _, date_col, qty, price in _CHANNELS:
        dt = s.table("date_dim").filter(
            _between(col("d_year"), 1999, 2001))
        f = (s.table(table)
             .join(dt, (date_col,), ("d_date_sk",))
             .select(v=col(qty) * col(price)))
        parts = f if parts is None else parts.union(f)
    return (parts.groupby()
            .agg(average_sales=("avg", col("v")))
            .as_scalar_expr())


def _q14_channel(s: Session, chan, cross: Frame, avg,
                 date_filter) -> Frame:
    label, table, item_col, date_col, qty, price = chan
    dt = s.table("date_dim").filter(date_filter)
    return (s.table(table)
            .join(dt, (date_col,), ("d_date_sk",))
            .join(cross, (item_col,), ("cri",), how="left_semi")
            .join(s.table("item"), (item_col,), ("i_item_sk",))
            .groupby(*_TRIPLE)
            .agg(sales=("sum", col(qty) * col(price)),
                 number_sales=("count_star", None))
            .filter(col("sales") > avg)
            .with_columns(channel=lit(label))
            .select("channel", *_TRIPLE, "sales", "number_sales"))


_Q14A_KEYS = ["channel", "i_brand_id", "i_class_id", "i_category_id"]


def q14a(s: Session) -> Frame:
    cross = _q14_cross_items(s)
    avg = _q14_avg_sales(s)
    nov2001 = (col("d_year") == lit(2001)) & (col("d_moy") == lit(11))
    u = None
    for chan in _CHANNELS:
        f = _q14_channel(s, chan, cross, avg, nov2001)
        u = f if u is None else u.union(f)

    def level(keys):
        g = (u.groupby(*keys)
             .agg(sum_sales=("sum", col("sales")),
                  sum_number_sales=("sum", col("number_sales"))))
        nulls = {k: _null_like(lit("") if k == "channel" else lit(0))
                 for k in _Q14A_KEYS if k not in keys}
        if nulls:
            g = g.with_columns(**nulls)
        return g.select(*_Q14A_KEYS, "sum_sales", "sum_number_sales")

    u2 = None
    for depth in (4, 3, 2, 1, 0):
        lv = level(tuple(_Q14A_KEYS[:depth]))
        u2 = lv if u2 is None else u2.union(lv)
    return u2.sort(*[SortKey(k) for k in _Q14A_KEYS], limit=100)


def q14b(s: Session) -> Frame:
    cross = _q14_cross_items(s)
    avg = _q14_avg_sales(s)

    def week_filter(year):
        wk = (s.table("date_dim")
              .filter((col("d_year") == lit(year)) &
                      (col("d_moy") == lit(12)) &
                      (col("d_dom") == lit(11)))
              .select(w=col("d_week_seq")).distinct().as_scalar_expr())
        return col("d_week_seq") == wk

    ty = _q14_channel(s, _CHANNELS[0], cross, avg, week_filter(2000))
    ly = (_q14_channel(s, _CHANNELS[0], cross, avg, week_filter(1999))
          .select(channel2=col("channel"), lb=col("i_brand_id"),
                  lc=col("i_class_id"), lg=col("i_category_id"),
                  sales2=col("sales"),
                  number_sales2=col("number_sales")))
    return (ty.join(ly, _TRIPLE, ("lb", "lc", "lg"))
            .select("channel", *_TRIPLE, "sales", "number_sales",
                    "channel2", "lb", "lc", "lg", "sales2",
                    "number_sales2")
            .sort(SortKey("channel"), SortKey("i_brand_id"),
                  SortKey("i_class_id"), SortKey("i_category_id"),
                  limit=100))


def _q14_sets_oracle(t):
    dd = t["date_dim"]
    dt = dd[dd["d_year"].between(1999, 2001)]
    sks = set(dt["d_date_sk"])
    triples = []
    vals = []
    for _, table, item_col, date_col, qty, price in _CHANNELS:
        f = t[table]
        f = f[f[date_col].isin(sks)]
        j = f.merge(t["item"], left_on=item_col, right_on="i_item_sk")
        triples.append(set(map(tuple, j[list(_TRIPLE)].to_numpy())))
        vals.append(f[qty] * f[price])
    inter = triples[0] & triples[1] & triples[2]
    it = t["item"]
    cross = set(it[[tuple(x) in inter
                    for x in it[list(_TRIPLE)].to_numpy()]]
                ["i_item_sk"])
    avg = pd.concat(vals, ignore_index=True).mean()
    return cross, avg


def _q14_channel_oracle(t, chan, cross, avg, dsel):
    label, table, item_col, date_col, qty, price = chan
    f = t[table]
    f = f[f[date_col].isin(dsel) & f[item_col].isin(cross)]
    j = f.merge(t["item"], left_on=item_col, right_on="i_item_sk")
    j = j.assign(v=j[qty] * j[price])
    g = j.groupby(list(_TRIPLE)).agg(
        sales=("v", "sum"),
        number_sales=("v", "size")).reset_index()
    g = g[g["sales"] > avg]
    g.insert(0, "channel", label)
    return g


def q14a_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    cross, avg = _q14_sets_oracle(t)
    dd = t["date_dim"]
    dsel = set(dd[(dd["d_year"] == 2001) &
                  (dd["d_moy"] == 11)]["d_date_sk"])
    u = pd.concat([_q14_channel_oracle(t, c, cross, avg, dsel)
                   for c in _CHANNELS], ignore_index=True)
    parts = []
    for depth in (4, 3, 2, 1, 0):
        keys = _Q14A_KEYS[:depth]
        if keys:
            g = u.groupby(keys, dropna=False).agg(
                sum_sales=("sales", "sum"),
                sum_number_sales=("number_sales", "sum")).reset_index()
        else:
            g = pd.DataFrame({
                "sum_sales": [u["sales"].sum()],
                "sum_number_sales": [u["number_sales"].sum()]})
        for k in _Q14A_KEYS:
            if k not in g.columns:
                g[k] = None
        parts.append(g[_Q14A_KEYS + ["sum_sales",
                                     "sum_number_sales"]])
    out = pd.concat(parts, ignore_index=True)
    return out.sort_values(_Q14A_KEYS, na_position="first",
                           kind="stable").head(100)


def q14b_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    cross, avg = _q14_sets_oracle(t)
    dd = t["date_dim"]

    def week(year):
        wk = dd[(dd["d_year"] == year) & (dd["d_moy"] == 12) &
                (dd["d_dom"] == 11)]["d_week_seq"].iloc[0]
        return set(dd[dd["d_week_seq"] == wk]["d_date_sk"])

    ty = _q14_channel_oracle(t, _CHANNELS[0], cross, avg, week(2000))
    ly = _q14_channel_oracle(t, _CHANNELS[0], cross, avg, week(1999))
    ly = ly.rename(columns={
        "channel": "channel2", "i_brand_id": "lb", "i_class_id": "lc",
        "i_category_id": "lg", "sales": "sales2",
        "number_sales": "number_sales2"})
    j = ty.merge(ly, left_on=list(_TRIPLE), right_on=["lb", "lc", "lg"])
    out = j[["channel"] + list(_TRIPLE) +
            ["sales", "number_sales", "channel2", "lb", "lc", "lg",
             "sales2", "number_sales2"]]
    return out.sort_values(["channel", "i_brand_id", "i_class_id",
                            "i_category_id"], kind="stable").head(100)


QUERIES_CROSS14 = {
    "q14a": (q14a, q14a_oracle),
    "q14b": (q14b, q14b_oracle),
}
