"""Real TPC-DS statistical queries (q17, q39a/b) — stddev_samp family.

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{17,39a,39b}.sql — verbatim. The engine's distributed stddev rides the
exact (sum, sum-of-squares, count) merge (plan/execute.py std_div).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

from auron_tpu.expr.nodes import col, lit, when
from auron_tpu.ops.sort import SortKey
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame


# ---------------------------------------------------------------------------
# q17: quantity count/avg/stddev/cov across store sale -> return -> catalog
# re-purchase, 2001Q1-Q3 (q17.sql).
# ---------------------------------------------------------------------------

def q17(s: Session) -> Frame:
    d1 = (s.table("date_dim")
          .filter(col("d_quarter_name") == lit("2001Q1"))
          .rename(d_date_sk="d1_sk"))
    d2 = (s.table("date_dim")
          .filter(col("d_quarter_name").isin(["2001Q1", "2001Q2",
                                              "2001Q3"]))
          .rename(d_date_sk="d2_sk"))
    d3 = (s.table("date_dim")
          .filter(col("d_quarter_name").isin(["2001Q1", "2001Q2",
                                              "2001Q3"]))
          .rename(d_date_sk="d3_sk"))
    j = (s.table("store_sales")
         .join(s.table("store_returns"),
               ("ss_customer_sk", "ss_item_sk", "ss_ticket_number"),
               ("sr_customer_sk", "sr_item_sk", "sr_ticket_number"))
         .join(s.table("catalog_sales"),
               ("sr_customer_sk", "sr_item_sk"),
               ("cs_bill_customer_sk", "cs_item_sk"))
         .join(d1, ("ss_sold_date_sk",), ("d1_sk",))
         .join(d2, ("sr_returned_date_sk",), ("d2_sk",))
         .join(d3, ("cs_sold_date_sk",), ("d3_sk",))
         .join(s.table("store"), ("ss_store_sk",), ("s_store_sk",))
         .join(s.table("item"), ("ss_item_sk",), ("i_item_sk",)))
    g = (j.groupby("i_item_id", "i_item_desc", "s_state")
         .agg(ss_cnt=("count", col("ss_quantity")),
              ss_avg=("avg", col("ss_quantity")),
              ss_std=("stddev", col("ss_quantity")),
              sr_cnt=("count", col("sr_return_quantity")),
              sr_avg=("avg", col("sr_return_quantity")),
              sr_std=("stddev", col("sr_return_quantity")),
              cs_cnt=("count", col("cs_quantity")),
              cs_avg=("avg", col("cs_quantity")),
              cs_std=("stddev", col("cs_quantity"))))
    # NOTE the literal q17.sql aliases `catalog_sales_quantitystdev` to
    # stddev_samp(cs_quantity)/avg(cs_quantity) — identical to the cov
    # column, NOT the raw stddev (a quirk of the reference query text
    # that Spark executes as written; caught by the sqlite independence
    # tier in round 4). cs_std is therefore overwritten with cov.
    return (g.with_columns(ss_cov=col("ss_std") / col("ss_avg"),
                           sr_cov=col("sr_std") / col("sr_avg"),
                           cs_cov=col("cs_std") / col("cs_avg"))
            .with_columns(cs_std=col("cs_std") / col("cs_avg"))
            .sort(SortKey("i_item_id"), SortKey("i_item_desc"),
                  SortKey("s_state"), limit=100))


def q17_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    d1 = set(dd[dd["d_quarter_name"] == "2001Q1"]["d_date_sk"])
    d23 = set(dd[dd["d_quarter_name"].isin(
        ["2001Q1", "2001Q2", "2001Q3"])]["d_date_sk"])
    j = (t["store_sales"]
         .merge(t["store_returns"],
                left_on=["ss_customer_sk", "ss_item_sk",
                         "ss_ticket_number"],
                right_on=["sr_customer_sk", "sr_item_sk",
                          "sr_ticket_number"])
         .merge(t["catalog_sales"],
                left_on=["sr_customer_sk", "sr_item_sk"],
                right_on=["cs_bill_customer_sk", "cs_item_sk"]))
    j = j[j["ss_sold_date_sk"].isin(d1) &
          j["sr_returned_date_sk"].isin(d23) &
          j["cs_sold_date_sk"].isin(d23)]
    j = (j.merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk"))
    g = j.groupby(["i_item_id", "i_item_desc", "s_state"]).agg(
        ss_cnt=("ss_quantity", "count"), ss_avg=("ss_quantity", "mean"),
        ss_std=("ss_quantity", "std"),
        sr_cnt=("sr_return_quantity", "count"),
        sr_avg=("sr_return_quantity", "mean"),
        sr_std=("sr_return_quantity", "std"),
        cs_cnt=("cs_quantity", "count"), cs_avg=("cs_quantity", "mean"),
        cs_std=("cs_quantity", "std")).reset_index()
    for p in ("ss", "sr", "cs"):
        g[f"{p}_cov"] = g[f"{p}_std"] / g[f"{p}_avg"]
    # literal q17.sql: catalog_sales_quantitystdev == the cov expression
    g["cs_std"] = g["cs_cov"]
    return g.sort_values(["i_item_id", "i_item_desc", "s_state"],
                         kind="stable").head(100)


# ---------------------------------------------------------------------------
# q39: warehouse/item monthly inventory variability — January pairs with
# February where cov > 1 (q39a) / cov > 1.5 in March... the reference's
# q39a compares months 1 and 2 (q39b adds the 1.5 threshold).
# ---------------------------------------------------------------------------

def _q39_inv(s: Session, extra_cov=None) -> Frame:
    dt = s.table("date_dim").filter(col("d_year") == lit(2001))
    g = (s.table("inventory")
         .join(s.table("item"), ("inv_item_sk",), ("i_item_sk",))
         .join(s.table("warehouse"), ("inv_warehouse_sk",),
               ("w_warehouse_sk",))
         .join(dt, ("inv_date_sk",), ("d_date_sk",))
         .groupby("w_warehouse_name", "w_warehouse_sk", "i_item_sk",
                  "d_moy")
         .agg(stdev=("stddev", col("inv_quantity_on_hand")),
              mean=("avg", col("inv_quantity_on_hand"))))
    cov_pred = when(col("mean") == lit(0.0), lit(0.0)) \
        .otherwise(col("stdev") / col("mean")) > lit(1.0)
    if extra_cov is not None:
        cov_pred = cov_pred & (when(col("mean") == lit(0.0), lit(0.0))
                               .otherwise(col("stdev") / col("mean")) >
                               lit(extra_cov))
    g = g.filter(cov_pred)
    # rows surviving cov > 1 necessarily have mean != 0
    return g.with_columns(cov=col("stdev") / col("mean"))


def _q39(s: Session, extra_cov=None) -> Frame:
    # literal q39b.sql applies the extra threshold as `inv1.cov > 1.5` —
    # to the MONTH-1 side only; inv2 carries just the CTE's cov > 1.
    # (Round-4 sqlite independence tier caught the correlated bug where
    # both engine and pandas oracle thresholded both sides: 5 rows where
    # the literal SQL returns 13 at sf=0.5.)
    inv1 = (_q39_inv(s, extra_cov).filter(col("d_moy") == lit(1))
            .select(w1=col("w_warehouse_sk"), i1=col("i_item_sk"),
                    moy1=col("d_moy"), mean1=col("mean"),
                    cov1=col("cov")))
    inv2 = (_q39_inv(s, None).filter(col("d_moy") == lit(2))
            .select(w2=col("w_warehouse_sk"), i2=col("i_item_sk"),
                    moy2=col("d_moy"), mean2=col("mean"),
                    cov2=col("cov")))
    # literal q39 SELECT: ALL TEN columns of both sides (w2/i2 echo the
    # join keys)
    return (inv1.join(inv2, ("w1", "i1"), ("w2", "i2"))
            .select("w1", "i1", "moy1", "mean1", "cov1", "w2", "i2",
                    "moy2", "mean2", "cov2")
            .sort(SortKey("w1"), SortKey("i1"), SortKey("moy1"),
                  SortKey("mean1"), SortKey("cov1"), SortKey("moy2"),
                  SortKey("mean2"), SortKey("cov2")))


def q39a(s: Session) -> Frame:
    return _q39(s, None)


def q39b(s: Session) -> Frame:
    return _q39(s, 1.5)


def _q39_oracle(t, extra_cov=None):
    dd = t["date_dim"]
    dt = dd[dd["d_year"] == 2001]
    j = (t["inventory"]
         .merge(t["item"], left_on="inv_item_sk", right_on="i_item_sk")
         .merge(t["warehouse"], left_on="inv_warehouse_sk",
                right_on="w_warehouse_sk")
         .merge(dt, left_on="inv_date_sk", right_on="d_date_sk"))
    g = j.groupby(["w_warehouse_name", "w_warehouse_sk", "i_item_sk",
                   "d_moy"]).agg(
        stdev=("inv_quantity_on_hand", "std"),
        mean=("inv_quantity_on_hand", "mean")).reset_index()
    covf = np.where(g["mean"] == 0, 0.0, g["stdev"] / g["mean"])
    g = g[covf > 1.0].copy()
    g["cov"] = np.where(g["mean"] == 0, np.nan, g["stdev"] / g["mean"])
    a = g[g["d_moy"] == 1]
    if extra_cov is not None:
        # literal q39b.sql: `inv1.cov > 1.5` — month-1 side only
        a = a[a["cov"] > extra_cov]
    a = a.rename(columns={
        "w_warehouse_sk": "w1", "i_item_sk": "i1", "d_moy": "moy1",
        "mean": "mean1", "cov": "cov1"})
    b = g[g["d_moy"] == 2].rename(columns={
        "w_warehouse_sk": "w2", "i_item_sk": "i2", "d_moy": "moy2",
        "mean": "mean2", "cov": "cov2"})
    m = a.merge(b, left_on=["w1", "i1"], right_on=["w2", "i2"])
    out = m[["w1", "i1", "moy1", "mean1", "cov1", "w2", "i2", "moy2",
             "mean2", "cov2"]]
    return out.sort_values(["w1", "i1", "moy1", "mean1", "cov1", "moy2",
                            "mean2", "cov2"], kind="stable")


def q39a_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    return _q39_oracle(t, None)


def q39b_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    return _q39_oracle(t, 1.5)


QUERIES_STATS = {
    "q17": (q17, q17_oracle),
    "q39a": (q39a, q39a_oracle),
    "q39b": (q39b, q39b_oracle),
}
