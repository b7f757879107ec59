"""Real TPC-DS month-over-month deviation queries (q47, q57).

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{47,57}.sql — verbatim. The WITH v1 series (monthly sums + whole-year avg
window + monthly rank) self-joins against rn+-1 copies to pull the
previous/next month's sum, exactly as the SQL's v1/v1_lag/v1_lead triple.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd

from auron_tpu.expr.nodes import col, func, lit, when
from auron_tpu.ops.sort import SortKey
from auron_tpu.ops.window import WindowFunc
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame


def _v1(s: Session, fact: str, date_col: str, item_col: str,
        entity_join, keys: List[str]) -> Frame:
    dt = s.table("date_dim").filter(
        (col("d_year") == lit(1999)) |
        ((col("d_year") == lit(1998)) & (col("d_moy") == lit(12))) |
        ((col("d_year") == lit(2000)) & (col("d_moy") == lit(1))))
    j = (s.table(fact)
         .join(s.table("item"), (item_col,), ("i_item_sk",))
         .join(dt, (date_col,), ("d_date_sk",)))
    j = entity_join(j)
    g = (j.groupby(*keys, "d_year", "d_moy")
         .agg(sum_sales=("sum", col("ss_sales_price" if fact ==
                                    "store_sales" else "cs_sales_price"))))
    w = g.window(tuple(keys) + ("d_year",), (SortKey("d_moy"),),
                 (WindowFunc("avg_monthly_sales", "avg", input="sum_sales",
                             cumulative=False),))
    return w.window(tuple(keys), (SortKey("d_year"), SortKey("d_moy")),
                    (WindowFunc("rn", "rank"),))


def _lag_query(s: Session, fact: str, date_col: str, item_col: str,
               entity_join, keys: List[str]) -> Frame:
    v1 = _v1(s, fact, date_col, item_col, entity_join, keys)
    lag = (v1.select(*[f for f in keys], "rn", "sum_sales")
           .rename(**{k: f"lag_{k}" for k in keys},
                   rn="lag_rn", sum_sales="psum")
           .with_columns(lag_rn1=col("lag_rn") + lit(1)))
    lead = (v1.select(*[f for f in keys], "rn", "sum_sales")
            .rename(**{k: f"lead_{k}" for k in keys},
                    rn="lead_rn", sum_sales="nsum")
            .with_columns(lead_rn1=col("lead_rn") - lit(1)))
    jkeys = tuple(keys) + ("rn",)
    v2 = (v1.join(lag, jkeys, tuple(f"lag_{k}" for k in keys) +
                  ("lag_rn1",))
          .join(lead, jkeys, tuple(f"lead_{k}" for k in keys) +
                ("lead_rn1",)))
    out = (v2.filter((col("d_year") == lit(1999)) &
                     (col("avg_monthly_sales") > lit(0.0)) &
                     (when(col("avg_monthly_sales") > lit(0.0),
                           func("abs", col("sum_sales") -
                                col("avg_monthly_sales")) /
                           col("avg_monthly_sales")).end() > lit(0.1)))
           .with_columns(delta=col("sum_sales") - col("avg_monthly_sales")))
    return (out.sort(SortKey("delta"), SortKey(keys[0]), SortKey(keys[1]),
                     SortKey(keys[2]), SortKey("d_moy"), limit=100)
            .select(*keys, "d_year", "d_moy", "avg_monthly_sales",
                    "sum_sales", "psum", "nsum"))


def q47(s: Session) -> Frame:
    keys = ["i_category", "i_brand", "s_store_name", "s_company_name"]
    return _lag_query(
        s, "store_sales", "ss_sold_date_sk", "ss_item_sk",
        lambda j: j.join(s.table("store"), ("ss_store_sk",),
                         ("s_store_sk",)), keys)


def q57(s: Session) -> Frame:
    keys = ["i_category", "i_brand", "cc_name"]
    return _lag_query(
        s, "catalog_sales", "cs_sold_date_sk", "cs_item_sk",
        lambda j: j.join(s.table("call_center"), ("cs_call_center_sk",),
                         ("cc_call_center_sk",)), keys)


def _lag_oracle(t, fact, date_col, item_col, price_col, entity, ekey_l,
                ekey_r, keys):
    dd = t["date_dim"]
    dt = dd[(dd["d_year"] == 1999) |
            ((dd["d_year"] == 1998) & (dd["d_moy"] == 12)) |
            ((dd["d_year"] == 2000) & (dd["d_moy"] == 1))]
    j = (t[fact]
         .merge(t["item"], left_on=item_col, right_on="i_item_sk")
         .merge(dt, left_on=date_col, right_on="d_date_sk")
         .merge(t[entity], left_on=ekey_l, right_on=ekey_r))
    g = j.groupby(keys + ["d_year", "d_moy"]).agg(
        sum_sales=(price_col, "sum")).reset_index()
    g["avg_monthly_sales"] = g.groupby(keys + ["d_year"])["sum_sales"] \
        .transform("mean")
    g = g.sort_values(keys + ["d_year", "d_moy"], kind="stable")
    g["rn"] = g.groupby(keys).cumcount() + 1
    lag = g[keys + ["rn", "sum_sales"]].copy()
    lag["rn"] = lag["rn"] + 1
    lag = lag.rename(columns={"sum_sales": "psum"})
    lead = g[keys + ["rn", "sum_sales"]].copy()
    lead["rn"] = lead["rn"] - 1
    lead = lead.rename(columns={"sum_sales": "nsum"})
    v2 = g.merge(lag, on=keys + ["rn"]).merge(lead, on=keys + ["rn"])
    dev = np.abs(v2["sum_sales"] - v2["avg_monthly_sales"]) / \
        v2["avg_monthly_sales"]
    v2 = v2[(v2["d_year"] == 1999) & (v2["avg_monthly_sales"] > 0) &
            (dev > 0.1)].copy()
    v2["delta"] = v2["sum_sales"] - v2["avg_monthly_sales"]
    return v2.sort_values(["delta"] + keys[:3] + ["d_moy"],
                          kind="stable").head(100)[
        keys + ["d_year", "d_moy", "avg_monthly_sales", "sum_sales",
                "psum", "nsum"]]


def q47_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    return _lag_oracle(t, "store_sales", "ss_sold_date_sk", "ss_item_sk",
                       "ss_sales_price", "store", "ss_store_sk",
                       "s_store_sk",
                       ["i_category", "i_brand", "s_store_name",
                        "s_company_name"])


def q57_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    return _lag_oracle(t, "catalog_sales", "cs_sold_date_sk", "cs_item_sk",
                       "cs_sales_price", "call_center",
                       "cs_call_center_sk", "cc_call_center_sk",
                       ["i_category", "i_brand", "cc_name"])


QUERIES_LAG = {
    "q47": (q47, q47_oracle),
    "q57": (q57, q57_oracle),
}
