"""Real TPC-DS multi-channel queries as Frame pipelines + oracles.

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{29,33,76}.sql — predicates ported verbatim. q33's uncorrelated IN
subquery runs as a left-semi join (Spark's plan); q76's three IS NULL
channels exercise NULL group keys end-to-end (the engine keeps NULL groups
per SQL; oracles use dropna=False).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

from auron_tpu.expr.nodes import col, lit
from auron_tpu.ops.sort import SortKey
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame


def _between(c, lo, hi):
    return (c >= lit(lo)) & (c <= lit(hi))


# ---------------------------------------------------------------------------
# q29: September-1999 store sales returned within a quarter and re-bought
# via catalog (q29.sql — q25's shape with quantity sums).
# ---------------------------------------------------------------------------

def q29(s: Session) -> Frame:
    d1 = (s.table("date_dim")
          .filter((col("d_moy") == lit(9)) & (col("d_year") == lit(1999)))
          .rename(d_date_sk="d1_date_sk"))
    d2 = (s.table("date_dim")
          .filter(_between(col("d_moy"), 9, 12) &
                  (col("d_year") == lit(1999)))
          .rename(d_date_sk="d2_date_sk"))
    d3 = (s.table("date_dim")
          .filter(col("d_year").isin([1999, 2000, 2001]))
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
            .agg(store_sales_quantity=("sum", col("ss_quantity")),
                 store_returns_quantity=("sum", col("sr_return_quantity")),
                 catalog_sales_quantity=("sum", col("cs_quantity")))
            .sort(SortKey("i_item_id"), SortKey("i_item_desc"),
                  SortKey("s_store_id"), SortKey("s_store_name"),
                  limit=100))


def q29_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    d1 = dd[(dd["d_moy"] == 9) & (dd["d_year"] == 1999)]
    d2 = dd[dd["d_moy"].between(9, 12) & (dd["d_year"] == 1999)]
    d3 = dd[dd["d_year"].isin([1999, 2000, 2001])]
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
          j["sr_returned_date_sk"].isin(d2["d_date_sk"]) &
          j["cs_sold_date_sk"].isin(d3["d_date_sk"])]
    j = (j.merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk"))
    g = j.groupby(["i_item_id", "i_item_desc", "s_store_id",
                   "s_store_name"]).agg(
        store_sales_quantity=("ss_quantity", "sum"),
        store_returns_quantity=("sr_return_quantity", "sum"),
        catalog_sales_quantity=("cs_quantity", "sum")).reset_index()
    return g.sort_values(["i_item_id", "i_item_desc", "s_store_id",
                          "s_store_name"], kind="stable").head(100)


# ---------------------------------------------------------------------------
# q33: Electronics-manufacturer revenue across all three channels for
# May 1998, GMT-5 customers (q33.sql) — per-channel aggregate over a
# semi-joined manufacturer list, UNION ALL, re-aggregate.
# ---------------------------------------------------------------------------

def _q33_channel(s: Session, table: str, item_col: str, date_col: str,
                 addr_col: str, price_col: str) -> Frame:
    dt = s.table("date_dim").filter((col("d_year") == lit(1998)) &
                                    (col("d_moy") == lit(5)))
    ca = s.table("customer_address").filter(
        col("ca_gmt_offset") == lit(-5.0))
    elec = (s.table("item")
            .filter(col("i_category").isin(["Electronics"]))
            .select(em=col("i_manufact_id")))
    return (s.table(table)
            .join(s.table("item"), (item_col,), ("i_item_sk",))
            .join(elec, ("i_manufact_id",), ("em",), how="left_semi")
            .join(dt, (date_col,), ("d_date_sk",))
            .join(ca, (addr_col,), ("ca_address_sk",))
            .groupby("i_manufact_id")
            .agg(total_sales=("sum", col(price_col))))


def q33(s: Session) -> Frame:
    ss = _q33_channel(s, "store_sales", "ss_item_sk", "ss_sold_date_sk",
                      "ss_addr_sk", "ss_ext_sales_price")
    cs = _q33_channel(s, "catalog_sales", "cs_item_sk", "cs_sold_date_sk",
                      "cs_bill_addr_sk", "cs_ext_sales_price")
    ws = _q33_channel(s, "web_sales", "ws_item_sk", "ws_sold_date_sk",
                      "ws_bill_addr_sk", "ws_ext_sales_price")
    return (ss.union(cs).union(ws)
            .groupby("i_manufact_id")
            .agg(total_sales=("sum", col("total_sales")))
            .sort(SortKey("total_sales"), SortKey("i_manufact_id"),
                  limit=100))


def _q33_channel_oracle(t, table, item_col, date_col, addr_col, price_col):
    dd = t["date_dim"]
    dt = dd[(dd["d_year"] == 1998) & (dd["d_moy"] == 5)]
    ca = t["customer_address"]
    ca = ca[ca["ca_gmt_offset"] == -5.0]
    it = t["item"]
    elec = set(it[it["i_category"] == "Electronics"]["i_manufact_id"])
    j = (t[table]
         .merge(it, left_on=item_col, right_on="i_item_sk")
         .merge(dt, left_on=date_col, right_on="d_date_sk")
         .merge(ca, left_on=addr_col, right_on="ca_address_sk"))
    j = j[j["i_manufact_id"].isin(elec)]
    return j.groupby("i_manufact_id").agg(
        total_sales=(price_col, "sum")).reset_index()


def q33_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    parts = [
        _q33_channel_oracle(t, "store_sales", "ss_item_sk",
                            "ss_sold_date_sk", "ss_addr_sk",
                            "ss_ext_sales_price"),
        _q33_channel_oracle(t, "catalog_sales", "cs_item_sk",
                            "cs_sold_date_sk", "cs_bill_addr_sk",
                            "cs_ext_sales_price"),
        _q33_channel_oracle(t, "web_sales", "ws_item_sk",
                            "ws_sold_date_sk", "ws_bill_addr_sk",
                            "ws_ext_sales_price")]
    u = pd.concat(parts, ignore_index=True)
    g = u.groupby("i_manufact_id").agg(
        total_sales=("total_sales", "sum")).reset_index()
    return g.sort_values(["total_sales", "i_manufact_id"],
                         kind="stable").head(100)[
        ["i_manufact_id", "total_sales"]]


# ---------------------------------------------------------------------------
# q76: sales rows with a NULL channel fk, per channel (q76.sql) — UNION ALL
# of three IS NULL slices; the NULL fk is itself a group key, so NULL
# groups must survive aggregation (SQL keeps them; oracle dropna=False).
# ---------------------------------------------------------------------------

def _q76_channel(s: Session, channel: str, table: str, null_col: str,
                 date_col: str, item_col: str, price_col: str) -> Frame:
    return (s.table(table)
            .filter(col(null_col).is_null())
            .join(s.table("date_dim"), (date_col,), ("d_date_sk",))
            .join(s.table("item"), (item_col,), ("i_item_sk",))
            .select("d_year", "d_qoy", "i_category",
                    channel=lit(channel),
                    col_name=col(null_col),
                    ext_sales_price=col(price_col)))


def q76(s: Session) -> Frame:
    ss = _q76_channel(s, "store", "store_sales", "ss_store_sk",
                      "ss_sold_date_sk", "ss_item_sk",
                      "ss_ext_sales_price")
    ws = _q76_channel(s, "web", "web_sales", "ws_ship_customer_sk",
                      "ws_sold_date_sk", "ws_item_sk",
                      "ws_ext_sales_price")
    cs = _q76_channel(s, "catalog", "catalog_sales", "cs_ship_addr_sk",
                      "cs_sold_date_sk", "cs_item_sk",
                      "cs_ext_sales_price")
    return (ss.union(ws).union(cs)
            .groupby("channel", "col_name", "d_year", "d_qoy",
                     "i_category")
            .agg(sales_cnt=("count_star", None),
                 sales_amt=("sum", col("ext_sales_price")))
            .sort(SortKey("channel"), SortKey("d_year"), SortKey("d_qoy"),
                  SortKey("i_category"), limit=100))


def _q76_channel_oracle(t, channel, table, null_col, date_col, item_col,
                        price_col):
    j = t[table]
    j = j[j[null_col].isna()]
    j = (j.merge(t["date_dim"], left_on=date_col, right_on="d_date_sk")
         .merge(t["item"], left_on=item_col, right_on="i_item_sk"))
    out = j[["d_year", "d_qoy", "i_category"]].copy()
    out["channel"] = channel
    out["col_name"] = j[null_col]
    out["ext_sales_price"] = j[price_col]
    return out


def q76_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    u = pd.concat([
        _q76_channel_oracle(t, "store", "store_sales", "ss_store_sk",
                            "ss_sold_date_sk", "ss_item_sk",
                            "ss_ext_sales_price"),
        _q76_channel_oracle(t, "web", "web_sales", "ws_ship_customer_sk",
                            "ws_sold_date_sk", "ws_item_sk",
                            "ws_ext_sales_price"),
        _q76_channel_oracle(t, "catalog", "catalog_sales",
                            "cs_ship_addr_sk", "cs_sold_date_sk",
                            "cs_item_sk", "cs_ext_sales_price")],
        ignore_index=True)
    g = u.groupby(["channel", "col_name", "d_year", "d_qoy", "i_category"],
                  dropna=False).agg(
        sales_cnt=("ext_sales_price", "size"),
        sales_amt=("ext_sales_price", "sum")).reset_index()
    return g.sort_values(["channel", "d_year", "d_qoy", "i_category"],
                         kind="stable").head(100)


QUERIES_MISC = {
    "q29": (q29, q29_oracle),
    "q33": (q33, q33_oracle),
    "q76": (q76, q76_oracle),
}
