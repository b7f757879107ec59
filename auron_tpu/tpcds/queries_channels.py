"""Real TPC-DS cross-channel item queries (q56, q60, q58, q83).

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{56,60,58,83}.sql — predicates ported verbatim. The `i_item_id IN
(SELECT ...)` filters are uncorrelated IN-subqueries and compile to left
semi joins, exactly as Spark plans them. q58/q83's `d_date IN (SELECT
d_date ... WHERE d_week_seq = ...)` membership rides d_date_sk (d_date ↔
d_date_sk is a bijection in date_dim), so the week lookup is a semi join
on d_week_seq seeded by date_sk() of the literal dates.
"""

from __future__ import annotations

from typing import Dict

import pandas as pd

from auron_tpu.expr.nodes import col, lit
from auron_tpu.ops.sort import SortKey
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame

from .datagen import date_sk


# ---------------------------------------------------------------------------
# q56 / q60: three-channel item revenue for an item-attribute slice, one
# month, GMT-5 customers — UNION ALL then re-aggregate by i_item_id.
# q56 slices by color, q60 by category (q56.sql / q60.sql).
# ---------------------------------------------------------------------------

def _item_slice_channel(s: Session, table: str, item_col: str,
                        date_col: str, addr_col: str, price_col: str,
                        item_ids: Frame, year: int, moy: int) -> Frame:
    dt = s.table("date_dim").filter((col("d_year") == lit(year)) &
                                    (col("d_moy") == lit(moy)))
    ca = s.table("customer_address").filter(
        col("ca_gmt_offset") == lit(-5.0))
    return (s.table(table)
            .join(s.table("item"), (item_col,), ("i_item_sk",))
            .join(item_ids, ("i_item_id",), ("ii",), how="left_semi")
            .join(dt, (date_col,), ("d_date_sk",))
            .join(ca, (addr_col,), ("ca_address_sk",))
            .groupby("i_item_id")
            .agg(total_sales=("sum", col(price_col))))


def _item_slice_union(s: Session, item_ids: Frame, year: int,
                      moy: int) -> Frame:
    ss = _item_slice_channel(s, "store_sales", "ss_item_sk",
                             "ss_sold_date_sk", "ss_addr_sk",
                             "ss_ext_sales_price", item_ids, year, moy)
    cs = _item_slice_channel(s, "catalog_sales", "cs_item_sk",
                             "cs_sold_date_sk", "cs_bill_addr_sk",
                             "cs_ext_sales_price", item_ids, year, moy)
    ws = _item_slice_channel(s, "web_sales", "ws_item_sk",
                             "ws_sold_date_sk", "ws_bill_addr_sk",
                             "ws_ext_sales_price", item_ids, year, moy)
    return (ss.union(cs).union(ws)
            .groupby("i_item_id")
            .agg(total_sales=("sum", col("total_sales"))))


def q56(s: Session) -> Frame:
    ids = (s.table("item")
           .filter(col("i_color").isin(["slate", "blanched", "burnished"]))
           .select(ii=col("i_item_id")))
    return (_item_slice_union(s, ids, 2001, 2)
            .sort(SortKey("i_item_id"), SortKey("total_sales"), limit=100))


def q60(s: Session) -> Frame:
    ids = (s.table("item")
           .filter(col("i_category").isin(["Music"]))
           .select(ii=col("i_item_id")))
    return (_item_slice_union(s, ids, 1998, 9)
            .sort(SortKey("i_item_id"), SortKey("total_sales"), limit=100))


def _item_slice_channel_oracle(t, table, item_col, date_col, addr_col,
                               price_col, ids, year, moy):
    dd = t["date_dim"]
    dt = dd[(dd["d_year"] == year) & (dd["d_moy"] == moy)]
    ca = t["customer_address"]
    ca = ca[ca["ca_gmt_offset"] == -5.0]
    j = (t[table]
         .merge(t["item"], left_on=item_col, right_on="i_item_sk")
         .merge(dt, left_on=date_col, right_on="d_date_sk")
         .merge(ca, left_on=addr_col, right_on="ca_address_sk"))
    j = j[j["i_item_id"].isin(ids)]
    return j.groupby("i_item_id").agg(
        total_sales=(price_col, "sum")).reset_index()


def _item_slice_union_oracle(t, ids, year, moy):
    parts = [
        _item_slice_channel_oracle(t, "store_sales", "ss_item_sk",
                                   "ss_sold_date_sk", "ss_addr_sk",
                                   "ss_ext_sales_price", ids, year, moy),
        _item_slice_channel_oracle(t, "catalog_sales", "cs_item_sk",
                                   "cs_sold_date_sk", "cs_bill_addr_sk",
                                   "cs_ext_sales_price", ids, year, moy),
        _item_slice_channel_oracle(t, "web_sales", "ws_item_sk",
                                   "ws_sold_date_sk", "ws_bill_addr_sk",
                                   "ws_ext_sales_price", ids, year, moy)]
    u = pd.concat(parts, ignore_index=True)
    return u.groupby("i_item_id").agg(
        total_sales=("total_sales", "sum")).reset_index()


def q56_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    it = t["item"]
    ids = set(it[it["i_color"].isin(
        ["slate", "blanched", "burnished"])]["i_item_id"])
    g = _item_slice_union_oracle(t, ids, 2001, 2)
    return g.sort_values(["i_item_id", "total_sales"],
                         kind="stable").head(100)


def q60_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    it = t["item"]
    ids = set(it[it["i_category"] == "Music"]["i_item_id"])
    g = _item_slice_union_oracle(t, ids, 1998, 9)
    return g.sort_values(["i_item_id", "total_sales"],
                         kind="stable").head(100)


# ---------------------------------------------------------------------------
# q58: items whose store/catalog/web revenue in the week of 2000-01-03 is
# within 10% of each other across every channel pair (q58.sql).
# ---------------------------------------------------------------------------

def _week_dates(s: Session, isos) -> Frame:
    """date_dim rows whose week contains any of the literal dates."""
    seeds = (s.table("date_dim")
             .filter(col("d_date_sk").isin([date_sk(i) for i in isos]))
             .select(wk=col("d_week_seq")))
    return (s.table("date_dim")
            .join(seeds, ("d_week_seq",), ("wk",), how="left_semi")
            .select(wd_sk=col("d_date_sk")))


def _week_rev(s: Session, table: str, item_col: str, date_col: str,
              val_col: str, out: str, isos) -> Frame:
    return (s.table(table)
            .join(s.table("item"), (item_col,), ("i_item_sk",))
            .join(_week_dates(s, isos), (date_col,), ("wd_sk",),
                  how="left_semi")
            .groupby("i_item_id")
            .agg(**{out: ("sum", col(val_col))}))


def q58(s: Session) -> Frame:
    isos = ["2000-01-03"]
    ss = (_week_rev(s, "store_sales", "ss_item_sk", "ss_sold_date_sk",
                    "ss_ext_sales_price", "ss_item_rev", isos)
          .rename(i_item_id="item_id"))
    cs = (_week_rev(s, "catalog_sales", "cs_item_sk", "cs_sold_date_sk",
                    "cs_ext_sales_price", "cs_item_rev", isos)
          .rename(i_item_id="cid"))
    ws = (_week_rev(s, "web_sales", "ws_item_sk", "ws_sold_date_sk",
                    "ws_ext_sales_price", "ws_item_rev", isos)
          .rename(i_item_id="wid"))
    j = (ss.join(cs, ("item_id",), ("cid",))
         .join(ws, ("item_id",), ("wid",)))

    def band(a, b):
        return ((col(a) >= lit(0.9) * col(b)) &
                (col(a) <= lit(1.1) * col(b)))
    j = j.filter(band("ss_item_rev", "cs_item_rev") &
                 band("ss_item_rev", "ws_item_rev") &
                 band("cs_item_rev", "ss_item_rev") &
                 band("cs_item_rev", "ws_item_rev") &
                 band("ws_item_rev", "ss_item_rev") &
                 band("ws_item_rev", "cs_item_rev"))
    tot = col("ss_item_rev") + col("cs_item_rev") + col("ws_item_rev")
    return (j.with_columns(
                ss_dev=col("ss_item_rev") / tot / lit(3.0) * lit(100.0),
                cs_dev=col("cs_item_rev") / tot / lit(3.0) * lit(100.0),
                ws_dev=col("ws_item_rev") / tot / lit(3.0) * lit(100.0),
                average=tot / lit(3.0))
            .select("item_id", "ss_item_rev", "ss_dev", "cs_item_rev",
                    "cs_dev", "ws_item_rev", "ws_dev", "average")
            .sort(SortKey("item_id"), SortKey("ss_item_rev"), limit=100))


def _week_rev_oracle(t, table, item_col, date_col, val_col, out, isos):
    dd = t["date_dim"]
    seeds = set(dd[dd["d_date_sk"].isin(
        [date_sk(i) for i in isos])]["d_week_seq"])
    sks = set(dd[dd["d_week_seq"].isin(seeds)]["d_date_sk"])
    j = t[table].merge(t["item"], left_on=item_col, right_on="i_item_sk")
    j = j[j[date_col].isin(sks)]
    return j.groupby("i_item_id").agg(**{out: (val_col, "sum")})


def q58_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    isos = ["2000-01-03"]
    ss = _week_rev_oracle(t, "store_sales", "ss_item_sk",
                          "ss_sold_date_sk", "ss_ext_sales_price",
                          "ss_item_rev", isos)
    cs = _week_rev_oracle(t, "catalog_sales", "cs_item_sk",
                          "cs_sold_date_sk", "cs_ext_sales_price",
                          "cs_item_rev", isos)
    ws = _week_rev_oracle(t, "web_sales", "ws_item_sk",
                          "ws_sold_date_sk", "ws_ext_sales_price",
                          "ws_item_rev", isos)
    j = ss.join(cs, how="inner").join(ws, how="inner").reset_index()
    j = j.rename(columns={"i_item_id": "item_id"})
    sel = ((j["ss_item_rev"].between(0.9 * j["cs_item_rev"],
                                     1.1 * j["cs_item_rev"])) &
           (j["ss_item_rev"].between(0.9 * j["ws_item_rev"],
                                     1.1 * j["ws_item_rev"])) &
           (j["cs_item_rev"].between(0.9 * j["ss_item_rev"],
                                     1.1 * j["ss_item_rev"])) &
           (j["cs_item_rev"].between(0.9 * j["ws_item_rev"],
                                     1.1 * j["ws_item_rev"])) &
           (j["ws_item_rev"].between(0.9 * j["ss_item_rev"],
                                     1.1 * j["ss_item_rev"])) &
           (j["ws_item_rev"].between(0.9 * j["cs_item_rev"],
                                     1.1 * j["cs_item_rev"])))
    j = j[sel].copy()
    tot = j["ss_item_rev"] + j["cs_item_rev"] + j["ws_item_rev"]
    j["ss_dev"] = j["ss_item_rev"] / tot / 3.0 * 100.0
    j["cs_dev"] = j["cs_item_rev"] / tot / 3.0 * 100.0
    j["ws_dev"] = j["ws_item_rev"] / tot / 3.0 * 100.0
    j["average"] = tot / 3.0
    out = j[["item_id", "ss_item_rev", "ss_dev", "cs_item_rev", "cs_dev",
             "ws_item_rev", "ws_dev", "average"]]
    return out.sort_values(["item_id", "ss_item_rev"],
                           kind="stable").head(100)


# ---------------------------------------------------------------------------
# q83: per-item return quantities across the three return channels for the
# weeks containing three literal dates; share-of-total deviations
# (q83.sql).
# ---------------------------------------------------------------------------

_Q83_DATES = ["2000-06-30", "2000-09-27", "2000-11-17"]


def q83(s: Session) -> Frame:
    sr = (_week_rev(s, "store_returns", "sr_item_sk",
                    "sr_returned_date_sk", "sr_return_quantity",
                    "sr_item_qty", _Q83_DATES)
          .rename(i_item_id="item_id"))
    cr = (_week_rev(s, "catalog_returns", "cr_item_sk",
                    "cr_returned_date_sk", "cr_return_quantity",
                    "cr_item_qty", _Q83_DATES)
          .rename(i_item_id="cid"))
    wr = (_week_rev(s, "web_returns", "wr_item_sk",
                    "wr_returned_date_sk", "wr_return_quantity",
                    "wr_item_qty", _Q83_DATES)
          .rename(i_item_id="wid"))
    j = (sr.join(cr, ("item_id",), ("cid",))
         .join(wr, ("item_id",), ("wid",)))
    tot = col("sr_item_qty") + col("cr_item_qty") + col("wr_item_qty")
    return (j.with_columns(
                sr_dev=col("sr_item_qty") / tot / lit(3.0) * lit(100.0),
                cr_dev=col("cr_item_qty") / tot / lit(3.0) * lit(100.0),
                wr_dev=col("wr_item_qty") / tot / lit(3.0) * lit(100.0),
                average=tot / lit(3.0))
            .select("item_id", "sr_item_qty", "sr_dev", "cr_item_qty",
                    "cr_dev", "wr_item_qty", "wr_dev", "average")
            .sort(SortKey("item_id"), SortKey("sr_item_qty"), limit=100))


def q83_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    sr = _week_rev_oracle(t, "store_returns", "sr_item_sk",
                          "sr_returned_date_sk", "sr_return_quantity",
                          "sr_item_qty", _Q83_DATES)
    cr = _week_rev_oracle(t, "catalog_returns", "cr_item_sk",
                          "cr_returned_date_sk", "cr_return_quantity",
                          "cr_item_qty", _Q83_DATES)
    wr = _week_rev_oracle(t, "web_returns", "wr_item_sk",
                          "wr_returned_date_sk", "wr_return_quantity",
                          "wr_item_qty", _Q83_DATES)
    j = sr.join(cr, how="inner").join(wr, how="inner").reset_index()
    j = j.rename(columns={"i_item_id": "item_id"})
    tot = j["sr_item_qty"] + j["cr_item_qty"] + j["wr_item_qty"]
    j["sr_dev"] = j["sr_item_qty"] / tot / 3.0 * 100.0
    j["cr_dev"] = j["cr_item_qty"] / tot / 3.0 * 100.0
    j["wr_dev"] = j["wr_item_qty"] / tot / 3.0 * 100.0
    j["average"] = tot / 3.0
    out = j[["item_id", "sr_item_qty", "sr_dev", "cr_item_qty", "cr_dev",
             "wr_item_qty", "wr_dev", "average"]]
    return out.sort_values(["item_id", "sr_item_qty"],
                           kind="stable").head(100)


QUERIES_CHANNELS = {
    "q56": (q56, q56_oracle),
    "q60": (q60, q60_oracle),
    "q58": (q58, q58_oracle),
    "q83": (q83, q83_oracle),
}
