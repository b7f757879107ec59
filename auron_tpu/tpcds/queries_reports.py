"""Real TPC-DS channel report queries (q5, q77, q80).

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{5,77,80}.sql — ported verbatim. All three build per-channel
sales/returns/profit CTEs, UNION ALL them with a channel label, and
GROUP BY ROLLUP (channel, id); the date predicates ride d_date_sk ranges
(d_date ↔ d_date_sk is a bijection and INTERVAL n days = +n sks).
"""

from __future__ import annotations

from typing import Dict

import pandas as pd

from auron_tpu.expr.nodes import col, func, lit, when
from auron_tpu.ops.sort import SortKey
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame

from .datagen import date_sk


def _null_like(example):
    return when(lit(False), example).end()


def _between(c, lo, hi):
    return (c >= lit(lo)) & (c <= lit(hi))


def _rollup_channel_id(u: Frame, id_example, order_sales=False) -> Frame:
    """GROUP BY ROLLUP (channel, id) + ORDER BY channel, id [, sales]."""
    def level(keys):
        g = (u.groupby(*keys)
             .agg(sales=("sum", col("sales")),
                  returns=("sum", col("returns")),
                  profit=("sum", col("profit"))))
        nulls = {}
        if "channel" not in keys:
            nulls["channel"] = _null_like(lit(""))
        if "id" not in keys:
            nulls["id"] = _null_like(id_example)
        if nulls:
            g = g.with_columns(**nulls)
        return g.select("channel", "id", "sales", "returns", "profit")

    u2 = (level(("channel", "id"))
          .union(level(("channel",)))
          .union(level(())))
    keys = [SortKey("channel"), SortKey("id")]
    if order_sales:
        keys.append(SortKey("sales"))
    return u2.sort(*keys, limit=100)


def _rollup_channel_id_oracle(u: pd.DataFrame,
                              order_sales=False) -> pd.DataFrame:
    parts = []
    for keys in (["channel", "id"], ["channel"], []):
        if keys:
            g = u.groupby(keys, dropna=False).agg(
                sales=("sales", "sum"), returns=("returns", "sum"),
                profit=("profit", "sum")).reset_index()
        else:
            g = pd.DataFrame({"sales": [u["sales"].sum()],
                              "returns": [u["returns"].sum()],
                              "profit": [u["profit"].sum()]})
        for c in ("channel", "id"):
            if c not in g.columns:
                g[c] = None
        parts.append(g[["channel", "id", "sales", "returns", "profit"]])
    out = pd.concat(parts, ignore_index=True)
    keys = ["channel", "id"] + (["sales"] if order_sales else [])
    return out.sort_values(keys, na_position="first",
                           kind="stable").head(100)


# ---------------------------------------------------------------------------
# q5: store/catalog-page/web-site sales vs returns for the 14 days from
# 2000-08-23 (q5.sql) — per-channel UNION ALL of sales rows and
# zero-padded return rows, re-joined to the channel dimension.
# ---------------------------------------------------------------------------

_Q5_LO = date_sk("2000-08-23")


def _q5_dates(s: Session, days: int = 14) -> Frame:
    return s.table("date_dim").filter(
        _between(col("d_date_sk"), _Q5_LO, _Q5_LO + days))


def q5(s: Session) -> Frame:
    z = lit(0.0)
    ss = s.table("store_sales").select(
        sk=col("ss_store_sk"), date_sk=col("ss_sold_date_sk"),
        sales_price=col("ss_ext_sales_price"), profit=col("ss_net_profit"),
        return_amt=z, net_loss=z)
    sr = s.table("store_returns").select(
        sk=col("sr_store_sk"), date_sk=col("sr_returned_date_sk"),
        sales_price=z, profit=z, return_amt=col("sr_return_amt"),
        net_loss=col("sr_net_loss"))
    ssr = (ss.union(sr)
           .join(_q5_dates(s), ("date_sk",), ("d_date_sk",))
           .join(s.table("store"), ("sk",), ("s_store_sk",))
           .groupby("s_store_id")
           .agg(sales=("sum", col("sales_price")),
                returns=("sum", col("return_amt")),
                profit_=("sum", col("profit")),
                profit_loss=("sum", col("net_loss"))))

    cs = s.table("catalog_sales").select(
        sk=col("cs_catalog_page_sk"), date_sk=col("cs_sold_date_sk"),
        sales_price=col("cs_ext_sales_price"), profit=col("cs_net_profit"),
        return_amt=z, net_loss=z)
    cr = s.table("catalog_returns").select(
        sk=col("cr_catalog_page_sk"), date_sk=col("cr_returned_date_sk"),
        sales_price=z, profit=z, return_amt=col("cr_return_amount"),
        net_loss=col("cr_net_loss"))
    csr = (cs.union(cr)
           .join(_q5_dates(s), ("date_sk",), ("d_date_sk",))
           .join(s.table("catalog_page"), ("sk",),
                 ("cp_catalog_page_sk",))
           .groupby("cp_catalog_page_id")
           .agg(sales=("sum", col("sales_price")),
                returns=("sum", col("return_amt")),
                profit_=("sum", col("profit")),
                profit_loss=("sum", col("net_loss"))))

    ws = s.table("web_sales").select(
        sk=col("ws_web_site_sk"), date_sk=col("ws_sold_date_sk"),
        sales_price=col("ws_ext_sales_price"), profit=col("ws_net_profit"),
        return_amt=z, net_loss=z)
    wsale = s.table("web_sales").select(
        jsite=col("ws_web_site_sk"), jitem=col("ws_item_sk"),
        jorder=col("ws_order_number"))
    wr = (s.table("web_returns")
          .join(wsale, ("wr_item_sk", "wr_order_number"),
                ("jitem", "jorder"), how="left")
          .select(sk=col("jsite"), date_sk=col("wr_returned_date_sk"),
                  sales_price=z, profit=z,
                  return_amt=col("wr_return_amt"),
                  net_loss=col("wr_net_loss")))
    wsr = (ws.union(wr)
           .join(_q5_dates(s), ("date_sk",), ("d_date_sk",))
           .join(s.table("web_site"), ("sk",), ("web_site_sk",))
           .groupby("web_site_id")
           .agg(sales=("sum", col("sales_price")),
                returns=("sum", col("return_amt")),
                profit_=("sum", col("profit")),
                profit_loss=("sum", col("net_loss"))))

    u = (ssr.select(channel=lit("store channel"),
                    id=func("concat", lit("store"), col("s_store_id")),
                    sales=col("sales"), returns=col("returns"),
                    profit=col("profit_") - col("profit_loss"))
         .union(csr.select(
             channel=lit("catalog channel"),
             id=func("concat", lit("catalog_page"),
                     col("cp_catalog_page_id")),
             sales=col("sales"), returns=col("returns"),
             profit=col("profit_") - col("profit_loss")))
         .union(wsr.select(
             channel=lit("web channel"),
             id=func("concat", lit("web_site"), col("web_site_id")),
             sales=col("sales"), returns=col("returns"),
             profit=col("profit_") - col("profit_loss"))))
    return _rollup_channel_id(u, lit(""))


def q5_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dsk = set(dd[dd["d_date_sk"].between(_Q5_LO, _Q5_LO + 14)]
              ["d_date_sk"])

    def two_sided(sales, s_sk, s_date, s_price, s_profit, rets, r_sk,
                  r_date, r_amt, r_loss):
        a = pd.DataFrame({
            "sk": sales[s_sk], "date_sk": sales[s_date],
            "sales_price": sales[s_price], "profit": sales[s_profit],
            "return_amt": 0.0, "net_loss": 0.0})
        b = pd.DataFrame({
            "sk": rets[r_sk], "date_sk": rets[r_date],
            "sales_price": 0.0, "profit": 0.0,
            "return_amt": rets[r_amt], "net_loss": rets[r_loss]})
        u = pd.concat([a, b], ignore_index=True)
        return u[u["date_sk"].isin(dsk)]

    ssr = (two_sided(t["store_sales"], "ss_store_sk", "ss_sold_date_sk",
                     "ss_ext_sales_price", "ss_net_profit",
                     t["store_returns"], "sr_store_sk",
                     "sr_returned_date_sk", "sr_return_amt",
                     "sr_net_loss")
           .merge(t["store"], left_on="sk", right_on="s_store_sk")
           .groupby("s_store_id")
           .agg(sales=("sales_price", "sum"),
                returns=("return_amt", "sum"),
                profit_=("profit", "sum"),
                profit_loss=("net_loss", "sum")).reset_index())
    csr = (two_sided(t["catalog_sales"], "cs_catalog_page_sk",
                     "cs_sold_date_sk", "cs_ext_sales_price",
                     "cs_net_profit", t["catalog_returns"],
                     "cr_catalog_page_sk", "cr_returned_date_sk",
                     "cr_return_amount", "cr_net_loss")
           .merge(t["catalog_page"], left_on="sk",
                  right_on="cp_catalog_page_sk")
           .groupby("cp_catalog_page_id")
           .agg(sales=("sales_price", "sum"),
                returns=("return_amt", "sum"),
                profit_=("profit", "sum"),
                profit_loss=("net_loss", "sum")).reset_index())
    wret = t["web_returns"].merge(
        t["web_sales"][["ws_item_sk", "ws_order_number",
                        "ws_web_site_sk"]],
        left_on=["wr_item_sk", "wr_order_number"],
        right_on=["ws_item_sk", "ws_order_number"], how="left")
    wsr = (two_sided(t["web_sales"], "ws_web_site_sk", "ws_sold_date_sk",
                     "ws_ext_sales_price", "ws_net_profit", wret,
                     "ws_web_site_sk", "wr_returned_date_sk",
                     "wr_return_amt", "wr_net_loss")
           .merge(t["web_site"], left_on="sk", right_on="web_site_sk")
           .groupby("web_site_id")
           .agg(sales=("sales_price", "sum"),
                returns=("return_amt", "sum"),
                profit_=("profit", "sum"),
                profit_loss=("net_loss", "sum")).reset_index())
    parts = []
    for f, chan, pre, idc in ((ssr, "store channel", "store",
                               "s_store_id"),
                              (csr, "catalog channel", "catalog_page",
                               "cp_catalog_page_id"),
                              (wsr, "web channel", "web_site",
                               "web_site_id")):
        parts.append(pd.DataFrame({
            "channel": chan, "id": pre + f[idc],
            "sales": f["sales"], "returns": f["returns"],
            "profit": f["profit_"] - f["profit_loss"]}))
    return _rollup_channel_id_oracle(pd.concat(parts, ignore_index=True))


# ---------------------------------------------------------------------------
# q77: 30-day per-location sales vs returns, store/catalog/web — sales
# CTEs LEFT JOIN their return CTEs (catalog's is a global cross join)
# before the channel rollup (q77.sql).
# ---------------------------------------------------------------------------

_Q77_LO = date_sk("2000-08-03")


def _q77_dates(s: Session) -> Frame:
    return s.table("date_dim").filter(
        _between(col("d_date_sk"), _Q77_LO, _Q77_LO + 30))


def q77(s: Session) -> Frame:
    dt = _q77_dates(s)
    ss = (s.table("store_sales")
          .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
          .join(s.table("store"), ("ss_store_sk",), ("s_store_sk",))
          .groupby("s_store_sk")
          .agg(sales=("sum", col("ss_ext_sales_price")),
               profit=("sum", col("ss_net_profit"))))
    sr = (s.table("store_returns")
          .join(dt, ("sr_returned_date_sk",), ("d_date_sk",))
          .join(s.table("store"), ("sr_store_sk",), ("s_store_sk",))
          .groupby("s_store_sk")
          .agg(returns_=("sum", col("sr_return_amt")),
               profit_loss=("sum", col("sr_net_loss")))
          .rename(s_store_sk="r_store_sk"))
    store = (ss.join(sr, ("s_store_sk",), ("r_store_sk",), how="left")
             .select(channel=lit("store channel"), id=col("s_store_sk"),
                     sales=col("sales"),
                     returns=func("coalesce", col("returns_"), lit(0.0)),
                     profit=col("profit") - func(
                         "coalesce", col("profit_loss"), lit(0.0))))

    cs = (s.table("catalog_sales")
          .join(dt, ("cs_sold_date_sk",), ("d_date_sk",))
          .groupby("cs_call_center_sk")
          .agg(sales=("sum", col("cs_ext_sales_price")),
               profit=("sum", col("cs_net_profit")))
          .with_columns(k=lit(1)))
    cr = (s.table("catalog_returns")
          .join(dt, ("cr_returned_date_sk",), ("d_date_sk",))
          .groupby()
          .agg(returns_=("sum", col("cr_return_amount")),
               profit_loss=("sum", col("cr_net_loss")))
          .with_columns(k2=lit(1)))
    catalog = (cs.join(cr, ("k",), ("k2",))
               .select(channel=lit("catalog channel"),
                       id=col("cs_call_center_sk"), sales=col("sales"),
                       returns=col("returns_"),
                       profit=col("profit") - col("profit_loss")))

    ws = (s.table("web_sales")
          .join(dt, ("ws_sold_date_sk",), ("d_date_sk",))
          .join(s.table("web_page"), ("ws_web_page_sk",),
                ("wp_web_page_sk",))
          .groupby("wp_web_page_sk")
          .agg(sales=("sum", col("ws_ext_sales_price")),
               profit=("sum", col("ws_net_profit"))))
    wr = (s.table("web_returns")
          .join(dt, ("wr_returned_date_sk",), ("d_date_sk",))
          .join(s.table("web_page"), ("wr_web_page_sk",),
                ("wp_web_page_sk",))
          .groupby("wp_web_page_sk")
          .agg(returns_=("sum", col("wr_return_amt")),
               profit_loss=("sum", col("wr_net_loss")))
          .rename(wp_web_page_sk="r_page_sk"))
    web = (ws.join(wr, ("wp_web_page_sk",), ("r_page_sk",), how="left")
           .select(channel=lit("web channel"), id=col("wp_web_page_sk"),
                   sales=col("sales"),
                   returns=func("coalesce", col("returns_"), lit(0.0)),
                   profit=col("profit") - func(
                       "coalesce", col("profit_loss"), lit(0.0))))

    return _rollup_channel_id(store.union(catalog).union(web), lit(0),
                              order_sales=True)


def q77_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dsk = dd[dd["d_date_sk"].between(_Q77_LO, _Q77_LO + 30)]

    ss = (t["store_sales"]
          .merge(dsk, left_on="ss_sold_date_sk", right_on="d_date_sk")
          .merge(t["store"], left_on="ss_store_sk",
                 right_on="s_store_sk")
          .groupby("s_store_sk")
          .agg(sales=("ss_ext_sales_price", "sum"),
               profit=("ss_net_profit", "sum")))
    sr = (t["store_returns"]
          .merge(dsk, left_on="sr_returned_date_sk",
                 right_on="d_date_sk")
          .merge(t["store"], left_on="sr_store_sk",
                 right_on="s_store_sk")
          .groupby("s_store_sk")
          .agg(returns_=("sr_return_amt", "sum"),
               profit_loss=("sr_net_loss", "sum")))
    st = ss.join(sr, how="left").reset_index()
    store = pd.DataFrame({
        "channel": "store channel", "id": st["s_store_sk"],
        "sales": st["sales"],
        "returns": st["returns_"].fillna(0.0),
        "profit": st["profit"] - st["profit_loss"].fillna(0.0)})

    cs = (t["catalog_sales"]
          .merge(dsk, left_on="cs_sold_date_sk", right_on="d_date_sk")
          .groupby("cs_call_center_sk")
          .agg(sales=("cs_ext_sales_price", "sum"),
               profit=("cs_net_profit", "sum")).reset_index())
    crs = t["catalog_returns"].merge(
        dsk, left_on="cr_returned_date_sk", right_on="d_date_sk")
    catalog = pd.DataFrame({
        "channel": "catalog channel", "id": cs["cs_call_center_sk"],
        "sales": cs["sales"],
        "returns": crs["cr_return_amount"].sum(),
        "profit": cs["profit"] - crs["cr_net_loss"].sum()})

    ws = (t["web_sales"]
          .merge(dsk, left_on="ws_sold_date_sk", right_on="d_date_sk")
          .merge(t["web_page"], left_on="ws_web_page_sk",
                 right_on="wp_web_page_sk")
          .groupby("wp_web_page_sk")
          .agg(sales=("ws_ext_sales_price", "sum"),
               profit=("ws_net_profit", "sum")))
    wrr = (t["web_returns"]
           .merge(dsk, left_on="wr_returned_date_sk",
                  right_on="d_date_sk")
           .merge(t["web_page"], left_on="wr_web_page_sk",
                  right_on="wp_web_page_sk")
           .groupby("wp_web_page_sk")
           .agg(returns_=("wr_return_amt", "sum"),
                profit_loss=("wr_net_loss", "sum")))
    wj = ws.join(wrr, how="left").reset_index()
    web = pd.DataFrame({
        "channel": "web channel", "id": wj["wp_web_page_sk"],
        "sales": wj["sales"],
        "returns": wj["returns_"].fillna(0.0),
        "profit": wj["profit"] - wj["profit_loss"].fillna(0.0)})

    u = pd.concat([store, catalog, web], ignore_index=True)
    return _rollup_channel_id_oracle(u, order_sales=True)


# ---------------------------------------------------------------------------
# q80: 30-day channel report over full-priced (>$50), non-TV-promoted
# items, returns matched per line item via LEFT JOIN (q80.sql).
# ---------------------------------------------------------------------------

_Q80_LO = date_sk("2000-08-23")


def _q80_channel(s: Session, sales: str, item_sk: str, date_col: str,
                 promo_col: str, dim_fk: str, dim_table: str,
                 dim_sk: str, dim_id: str, price: str, profit: str,
                 ret: str, r_keys, s_keys, r_amt: str,
                 r_loss: str) -> Frame:
    dt = s.table("date_dim").filter(
        _between(col("d_date_sk"), _Q80_LO, _Q80_LO + 30))
    it = s.table("item").filter(col("i_current_price") > lit(50.0))
    pr = s.table("promotion").filter(col("p_channel_tv") == lit("N"))
    r = s.table(ret).select(
        rk1=col(r_keys[0]), rk2=col(r_keys[1]),
        ramt=col(r_amt), rloss=col(r_loss))
    return (s.table(sales)
            .join(r, s_keys, ("rk1", "rk2"), how="left")
            .join(dt, (date_col,), ("d_date_sk",))
            .join(s.table(dim_table), (dim_fk,), (dim_sk,))
            .join(it, (item_sk,), ("i_item_sk",))
            .join(pr, (promo_col,), ("p_promo_sk",))
            .groupby(dim_id)
            .agg(sales=("sum", col(price)),
                 returns=("sum", func("coalesce", col("ramt"),
                                      lit(0.0))),
                 profit=("sum", col(profit) - func(
                     "coalesce", col("rloss"), lit(0.0)))))


def q80(s: Session) -> Frame:
    ssr = _q80_channel(
        s, "store_sales", "ss_item_sk", "ss_sold_date_sk", "ss_promo_sk",
        "ss_store_sk", "store", "s_store_sk", "s_store_id",
        "ss_ext_sales_price", "ss_net_profit", "store_returns",
        ("sr_item_sk", "sr_ticket_number"),
        ("ss_item_sk", "ss_ticket_number"), "sr_return_amt",
        "sr_net_loss")
    csr = _q80_channel(
        s, "catalog_sales", "cs_item_sk", "cs_sold_date_sk",
        "cs_promo_sk", "cs_catalog_page_sk", "catalog_page",
        "cp_catalog_page_sk", "cp_catalog_page_id",
        "cs_ext_sales_price", "cs_net_profit", "catalog_returns",
        ("cr_item_sk", "cr_order_number"),
        ("cs_item_sk", "cs_order_number"), "cr_return_amount",
        "cr_net_loss")
    wsr = _q80_channel(
        s, "web_sales", "ws_item_sk", "ws_sold_date_sk", "ws_promo_sk",
        "ws_web_site_sk", "web_site", "web_site_sk", "web_site_id",
        "ws_ext_sales_price", "ws_net_profit", "web_returns",
        ("wr_item_sk", "wr_order_number"),
        ("ws_item_sk", "ws_order_number"), "wr_return_amt",
        "wr_net_loss")
    u = (ssr.select(channel=lit("store channel"),
                    id=func("concat", lit("store"), col("s_store_id")),
                    sales=col("sales"), returns=col("returns"),
                    profit=col("profit"))
         .union(csr.select(
             channel=lit("catalog channel"),
             id=func("concat", lit("catalog_page"),
                     col("cp_catalog_page_id")),
             sales=col("sales"), returns=col("returns"),
             profit=col("profit")))
         .union(wsr.select(
             channel=lit("web channel"),
             id=func("concat", lit("web_site"), col("web_site_id")),
             sales=col("sales"), returns=col("returns"),
             profit=col("profit"))))
    return _rollup_channel_id(u, lit(""))


def _q80_channel_oracle(t, sales, item_sk, date_col, promo_col, dim_fk,
                        dim_table, dim_sk, dim_id, price, profit, ret,
                        r_keys, s_keys, r_amt, r_loss):
    dd = t["date_dim"]
    dt = dd[dd["d_date_sk"].between(_Q80_LO, _Q80_LO + 30)]
    it = t["item"]
    it = it[it["i_current_price"] > 50.0]
    pr = t["promotion"]
    pr = pr[pr["p_channel_tv"] == "N"]
    j = (t[sales]
         .merge(t[ret][list(r_keys) + [r_amt, r_loss]],
                left_on=list(s_keys), right_on=list(r_keys), how="left")
         .merge(dt, left_on=date_col, right_on="d_date_sk")
         .merge(t[dim_table], left_on=dim_fk, right_on=dim_sk)
         .merge(it, left_on=item_sk, right_on="i_item_sk")
         .merge(pr, left_on=promo_col, right_on="p_promo_sk"))
    j = j.assign(_ret=j[r_amt].fillna(0.0),
                 _pro=j[profit] - j[r_loss].fillna(0.0))
    return j.groupby(dim_id).agg(
        sales=(price, "sum"), returns=("_ret", "sum"),
        profit=("_pro", "sum")).reset_index()


def q80_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    ssr = _q80_channel_oracle(
        t, "store_sales", "ss_item_sk", "ss_sold_date_sk", "ss_promo_sk",
        "ss_store_sk", "store", "s_store_sk", "s_store_id",
        "ss_ext_sales_price", "ss_net_profit", "store_returns",
        ("sr_item_sk", "sr_ticket_number"),
        ("ss_item_sk", "ss_ticket_number"), "sr_return_amt",
        "sr_net_loss")
    csr = _q80_channel_oracle(
        t, "catalog_sales", "cs_item_sk", "cs_sold_date_sk",
        "cs_promo_sk", "cs_catalog_page_sk", "catalog_page",
        "cp_catalog_page_sk", "cp_catalog_page_id",
        "cs_ext_sales_price", "cs_net_profit", "catalog_returns",
        ("cr_item_sk", "cr_order_number"),
        ("cs_item_sk", "cs_order_number"), "cr_return_amount",
        "cr_net_loss")
    wsr = _q80_channel_oracle(
        t, "web_sales", "ws_item_sk", "ws_sold_date_sk", "ws_promo_sk",
        "ws_web_site_sk", "web_site", "web_site_sk", "web_site_id",
        "ws_ext_sales_price", "ws_net_profit", "web_returns",
        ("wr_item_sk", "wr_order_number"),
        ("ws_item_sk", "ws_order_number"), "wr_return_amt",
        "wr_net_loss")
    parts = []
    for f, chan, pre, idc in ((ssr, "store channel", "store",
                               "s_store_id"),
                              (csr, "catalog channel", "catalog_page",
                               "cp_catalog_page_id"),
                              (wsr, "web channel", "web_site",
                               "web_site_id")):
        parts.append(pd.DataFrame({
            "channel": chan, "id": pre + f[idc], "sales": f["sales"],
            "returns": f["returns"], "profit": f["profit"]}))
    return _rollup_channel_id_oracle(pd.concat(parts, ignore_index=True))


QUERIES_REPORTS = {
    "q5": (q5, q5_oracle),
    "q77": (q77, q77_oracle),
    "q80": (q80, q80_oracle),
}
