"""Real TPC-DS scalar-subquery batteries as Frames + oracles.

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{9,28,32}.sql — verbatim predicates. q9's fifteen scalar subqueries ride
`Frame.as_scalar_expr`, so the whole query still compiles as ONE traced
program; q28's six bucket aggregates cross-join on a literal key; q32 is
the catalog twin of q92's decorrelated 1.3x-average filter.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

from auron_tpu.expr.nodes import col, lit, when
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame, table
from auron_tpu.tpcds.datagen import date_sk


def _between(c, lo, hi):
    return (c >= lit(lo)) & (c <= lit(hi))


# ---------------------------------------------------------------------------
# q9: five quantity-bucket CASE probes, each choosing between two averages
# by a count threshold (q9.sql) — 15 scalar subqueries in one projection.
# ---------------------------------------------------------------------------

_Q9_BUCKETS = [(1, 20, 62316685), (21, 40, 19045798), (41, 60, 365541424),
               (61, 80, 216357808), (81, 100, 184483884)]


def q9(s: Session) -> Frame:
    r = s.table("reason").filter(col("r_reason_sk") == lit(1))
    exprs = {}
    for i, (lo, hi, thresh) in enumerate(_Q9_BUCKETS, start=1):
        sl = s.table("store_sales").filter(_between(col("ss_quantity"),
                                                    lo, hi))
        cnt = sl.groupby().agg(c=("count_star", None)).as_scalar_expr()
        avg_disc = sl.groupby().agg(
            a=("avg", col("ss_ext_discount_amt"))).as_scalar_expr()
        avg_paid = sl.groupby().agg(
            a=("avg", col("ss_net_paid"))).as_scalar_expr()
        exprs[f"bucket{i}"] = when(cnt > lit(thresh),
                                   avg_disc).otherwise(avg_paid)
    return r.select(**exprs)


def q9_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    ss = t["store_sales"]
    row = {}
    for i, (lo, hi, thresh) in enumerate(_Q9_BUCKETS, start=1):
        sl = ss[ss["ss_quantity"].between(lo, hi)]
        row[f"bucket{i}"] = [sl["ss_ext_discount_amt"].mean()
                             if len(sl) > thresh
                             else sl["ss_net_paid"].mean()]
    n = len(t["reason"][t["reason"]["r_reason_sk"] == 1])
    out = pd.DataFrame(row)
    return out.loc[out.index.repeat(n)].reset_index(drop=True)


# ---------------------------------------------------------------------------
# q28: six quantity-bucket (avg, count, count distinct) triples over OR'd
# price bands, cross-joined into one row (q28.sql).
# ---------------------------------------------------------------------------

_Q28_BUCKETS = [
    (0, 5, 8, 459, 57), (6, 10, 90, 2323, 31), (11, 15, 142, 12214, 79),
    (16, 20, 135, 6071, 38), (21, 25, 122, 836, 17), (26, 30, 154, 7326, 7)]


def q28(s: Session) -> Frame:
    out = None
    for i, (qlo, qhi, lp, cp, wc) in enumerate(_Q28_BUCKETS, start=1):
        sl = (s.table("store_sales")
              .filter(_between(col("ss_quantity"), qlo, qhi) &
                      (_between(col("ss_list_price"), lp, lp + 10) |
                       _between(col("ss_coupon_amt"), cp, cp + 1000) |
                       _between(col("ss_wholesale_cost"), wc, wc + 20))))
        g = (sl.groupby().agg(**{
            f"b{i}_lp": ("avg", col("ss_list_price")),
            f"b{i}_cnt": ("count", col("ss_list_price")),
            f"b{i}_cntd": ("count_distinct", col("ss_list_price"))})
            .with_columns(_k=lit(1)))
        out = g if out is None else out.join(g, ("_k",), ("_k",),
                                             strategy="broadcast")
    return out.select(*[c for c in out._names() if c.startswith("b")])


def q28_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    ss = t["store_sales"]
    row = {}
    for i, (qlo, qhi, lp, cp, wc) in enumerate(_Q28_BUCKETS, start=1):
        sl = ss[ss["ss_quantity"].between(qlo, qhi) &
                (ss["ss_list_price"].between(lp, lp + 10) |
                 ss["ss_coupon_amt"].between(cp, cp + 1000) |
                 ss["ss_wholesale_cost"].between(wc, wc + 20))]
        row[f"b{i}_lp"] = [sl["ss_list_price"].mean()]
        row[f"b{i}_cnt"] = [int(sl["ss_list_price"].count())]
        row[f"b{i}_cntd"] = [int(sl["ss_list_price"].nunique())]
    return pd.DataFrame(row)


# ---------------------------------------------------------------------------
# q32: excess catalog discounts vs 1.3x the item's 90-day average (q32.sql)
# — q92's catalog twin, decorrelated to a per-item aggregate join.
# ---------------------------------------------------------------------------

def q32(s: Session) -> Frame:
    lo = date_sk("1998-03-18")
    dt = s.table("date_dim").filter(_between(col("d_date_sk"), lo, lo + 90))
    it = s.table("item").filter(col("i_manufact_id") == lit(269))
    per_item = (s.table("catalog_sales")
                .join(dt, ("cs_sold_date_sk",), ("d_date_sk",))
                .groupby("cs_item_sk")
                .agg(avg_disc=("avg", col("cs_ext_discount_amt")))
                .rename(cs_item_sk="sub_item_sk"))
    j = (s.table("catalog_sales")
         .join(dt, ("cs_sold_date_sk",), ("d_date_sk",))
         .join(it, ("cs_item_sk",), ("i_item_sk",))
         .join(per_item, ("cs_item_sk",), ("sub_item_sk",))
         .filter(col("cs_ext_discount_amt") > lit(1.3) * col("avg_disc")))
    return j.groupby().agg(excess=("sum", col("cs_ext_discount_amt")))


def q32_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    lo = date_sk("1998-03-18")
    dd = t["date_dim"]
    dt = dd[dd["d_date_sk"].between(lo, lo + 90)]
    cs = t["catalog_sales"]
    cs = cs[cs["cs_sold_date_sk"].isin(dt["d_date_sk"])]
    per_item = cs.groupby("cs_item_sk").agg(
        avg_disc=("cs_ext_discount_amt", "mean")).reset_index()
    it = t["item"][t["item"]["i_manufact_id"] == 269]
    j = (cs.merge(it, left_on="cs_item_sk", right_on="i_item_sk")
         .merge(per_item, on="cs_item_sk"))
    j = j[j["cs_ext_discount_amt"] > 1.3 * j["avg_disc"]]
    return pd.DataFrame({"excess": [j["cs_ext_discount_amt"].sum()
                                    if len(j) else np.nan]})


QUERIES_MISC2 = {
    "q9": (q9, q9_oracle),
    "q28": (q28, q28_oracle),
    "q32": (q32, q32_oracle),
}
