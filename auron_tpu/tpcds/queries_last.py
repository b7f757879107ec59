"""Real TPC-DS q78 and q91 — the last two of the 99-query set.

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{78,91}.sql — ported verbatim. q78's "LEFT JOIN returns ... WHERE
return-key IS NULL" is an anti join per channel; q91 groups by marital/
education beyond its output columns, exactly as the SQL does.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

from auron_tpu.expr.nodes import col, func, lit
from auron_tpu.ops.sort import SortKey
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame


# ---------------------------------------------------------------------------
# q78: per customer/item/year, quantity bought in store (never returned)
# vs the other channels, for customers active in all three (q78.sql).
# ---------------------------------------------------------------------------

def _q78_cte(s: Session, table: str, item_col: str, cust_col: str,
             date_col: str, ret: str, r_order: str, r_item: str,
             s_order: str, qty: str, wc: str, sp: str,
             prefix: str) -> Frame:
    r = s.table(ret).select(ro=col(r_order), ri=col(r_item))
    return (s.table(table)
            .join(r, (s_order, item_col), ("ro", "ri"), how="left_anti")
            .join(s.table("date_dim"), (date_col,), ("d_date_sk",))
            .groupby("d_year", item_col, cust_col)
            .agg(**{f"{prefix}_qty": ("sum", col(qty)),
                    f"{prefix}_wc": ("sum", col(wc)),
                    f"{prefix}_sp": ("sum", col(sp))}))


def q78(s: Session) -> Frame:
    ss = _q78_cte(s, "store_sales", "ss_item_sk", "ss_customer_sk",
                  "ss_sold_date_sk", "store_returns",
                  "sr_ticket_number", "sr_item_sk", "ss_ticket_number",
                  "ss_quantity", "ss_wholesale_cost", "ss_sales_price",
                  "ss")
    ws = (_q78_cte(s, "web_sales", "ws_item_sk", "ws_bill_customer_sk",
                   "ws_sold_date_sk", "web_returns", "wr_order_number",
                   "wr_item_sk", "ws_order_number", "ws_quantity",
                   "ws_wholesale_cost", "ws_sales_price", "ws")
          .select(wy=col("d_year"), wi=col("ws_item_sk"),
                  wcu=col("ws_bill_customer_sk"), ws_qty=col("ws_qty"),
                  ws_wc=col("ws_wc"), ws_sp=col("ws_sp")))
    cs = (_q78_cte(s, "catalog_sales", "cs_item_sk",
                   "cs_bill_customer_sk", "cs_sold_date_sk",
                   "catalog_returns", "cr_order_number", "cr_item_sk",
                   "cs_order_number", "cs_quantity",
                   "cs_wholesale_cost", "cs_sales_price", "cs")
          .select(cy=col("d_year"), ci=col("cs_item_sk"),
                  ccu=col("cs_bill_customer_sk"), cs_qty=col("cs_qty"),
                  cs_wc=col("cs_wc"), cs_sp=col("cs_sp")))
    j = (ss.join(ws, ("d_year", "ss_item_sk", "ss_customer_sk"),
                 ("wy", "wi", "wcu"), how="left")
         .join(cs, ("d_year", "ss_item_sk", "ss_customer_sk"),
               ("cy", "ci", "ccu"), how="left")
         .filter((func("coalesce", col("ws_qty"), lit(0)) > lit(0)) &
                 (func("coalesce", col("cs_qty"), lit(0)) > lit(0)) &
                 (col("d_year") == lit(2000))))
    other_qty = (func("coalesce", col("ws_qty"), lit(0)) +
                 func("coalesce", col("cs_qty"), lit(0)))
    return (j.with_columns(
                ratio=func("round",
                           col("ss_qty") * lit(1.0) /
                           func("coalesce",
                                col("ws_qty") + col("cs_qty"), lit(1)),
                           params=(2,)),
                store_qty=col("ss_qty"),
                store_wholesale_cost=col("ss_wc"),
                store_sales_price=col("ss_sp"),
                other_chan_qty=other_qty,
                other_chan_wholesale_cost=(
                    func("coalesce", col("ws_wc"), lit(0.0)) +
                    func("coalesce", col("cs_wc"), lit(0.0))),
                other_chan_sales_price=(
                    func("coalesce", col("ws_sp"), lit(0.0)) +
                    func("coalesce", col("cs_sp"), lit(0.0))))
            .select("ratio", "store_qty", "store_wholesale_cost",
                    "store_sales_price", "other_chan_qty",
                    "other_chan_wholesale_cost",
                    "other_chan_sales_price")
            .sort(SortKey("ratio"),
                  SortKey("store_qty", ascending=False),
                  SortKey("store_wholesale_cost", ascending=False),
                  SortKey("store_sales_price", ascending=False),
                  SortKey("other_chan_qty"),
                  SortKey("other_chan_wholesale_cost"),
                  SortKey("other_chan_sales_price"), limit=100))


def _q78_cte_oracle(t, table, item_col, cust_col, date_col, ret,
                    r_order, r_item, s_order, qty, wc, sp, prefix):
    f = t[table]
    rk = set(zip(t[ret][r_order], t[ret][r_item]))
    keep = [k not in rk for k in zip(f[s_order], f[item_col])]
    f = f[keep].merge(t["date_dim"], left_on=date_col,
                      right_on="d_date_sk")
    return f.groupby(["d_year", item_col, cust_col]).agg(
        **{f"{prefix}_qty": (qty, "sum"), f"{prefix}_wc": (wc, "sum"),
           f"{prefix}_sp": (sp, "sum")}).reset_index()


def q78_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    ss = _q78_cte_oracle(
        t, "store_sales", "ss_item_sk", "ss_customer_sk",
        "ss_sold_date_sk", "store_returns", "sr_ticket_number",
        "sr_item_sk", "ss_ticket_number", "ss_quantity",
        "ss_wholesale_cost", "ss_sales_price", "ss")
    ws = _q78_cte_oracle(
        t, "web_sales", "ws_item_sk", "ws_bill_customer_sk",
        "ws_sold_date_sk", "web_returns", "wr_order_number",
        "wr_item_sk", "ws_order_number", "ws_quantity",
        "ws_wholesale_cost", "ws_sales_price", "ws")
    cs = _q78_cte_oracle(
        t, "catalog_sales", "cs_item_sk", "cs_bill_customer_sk",
        "cs_sold_date_sk", "catalog_returns", "cr_order_number",
        "cr_item_sk", "cs_order_number", "cs_quantity",
        "cs_wholesale_cost", "cs_sales_price", "cs")
    j = (ss.merge(ws, left_on=["d_year", "ss_item_sk",
                               "ss_customer_sk"],
                  right_on=["d_year", "ws_item_sk",
                            "ws_bill_customer_sk"], how="left")
         .merge(cs, left_on=["d_year", "ss_item_sk", "ss_customer_sk"],
                right_on=["d_year", "cs_item_sk",
                          "cs_bill_customer_sk"], how="left"))
    j = j[(j["ws_qty"].fillna(0) > 0) & (j["cs_qty"].fillna(0) > 0) &
          (j["d_year"] == 2000)].copy()
    raw = j["ss_qty"] / (j["ws_qty"] + j["cs_qty"]).fillna(1)
    # Spark round() is HALF_UP; pandas .round is half-even
    j["ratio"] = np.floor(raw * 100.0 + 0.5) / 100.0
    j["store_qty"] = j["ss_qty"]
    j["store_wholesale_cost"] = j["ss_wc"]
    j["store_sales_price"] = j["ss_sp"]
    j["other_chan_qty"] = j["ws_qty"].fillna(0) + j["cs_qty"].fillna(0)
    j["other_chan_wholesale_cost"] = (j["ws_wc"].fillna(0.0) +
                                      j["cs_wc"].fillna(0.0))
    j["other_chan_sales_price"] = (j["ws_sp"].fillna(0.0) +
                                   j["cs_sp"].fillna(0.0))
    out = j[["ratio", "store_qty", "store_wholesale_cost",
             "store_sales_price", "other_chan_qty",
             "other_chan_wholesale_cost", "other_chan_sales_price"]]
    return out.sort_values(
        ["ratio", "store_qty", "store_wholesale_cost",
         "store_sales_price", "other_chan_qty",
         "other_chan_wholesale_cost", "other_chan_sales_price"],
        ascending=[True, False, False, False, True, True, True],
        kind="stable").head(100)


# ---------------------------------------------------------------------------
# q91: call-center return losses from well-educated widowed / unknown-
# education married GMT-7 customers, Nov 1998 (q91.sql). The GROUP BY
# includes marital/education beyond the output columns, so call centers
# can repeat — kept verbatim.
# ---------------------------------------------------------------------------

def q91(s: Session) -> Frame:
    dt = s.table("date_dim").filter(
        (col("d_year") == lit(1998)) & (col("d_moy") == lit(11)))
    cd = s.table("customer_demographics").filter(
        ((col("cd_marital_status") == lit("M")) &
         (col("cd_education_status") == lit("Unknown"))) |
        ((col("cd_marital_status") == lit("W")) &
         (col("cd_education_status") == lit("Advanced Degree"))))
    hd = s.table("household_demographics").filter(
        func("like", col("hd_buy_potential"), params=("Unknown%",)))
    ca = s.table("customer_address").filter(
        col("ca_gmt_offset") == lit(-7.0))
    j = (s.table("catalog_returns")
         .join(s.table("call_center"), ("cr_call_center_sk",),
               ("cc_call_center_sk",))
         .join(dt, ("cr_returned_date_sk",), ("d_date_sk",))
         .join(s.table("customer"), ("cr_returning_customer_sk",),
               ("c_customer_sk",))
         .join(cd, ("c_current_cdemo_sk",), ("cd_demo_sk",))
         .join(hd, ("c_current_hdemo_sk",), ("hd_demo_sk",))
         .join(ca, ("c_current_addr_sk",), ("ca_address_sk",)))
    return (j.groupby("cc_call_center_id", "cc_name", "cc_manager",
                      "cd_marital_status", "cd_education_status")
            .agg(returns_loss=("sum", col("cr_net_loss")))
            .select(call_center=col("cc_call_center_id"),
                    call_center_name=col("cc_name"),
                    manager=col("cc_manager"),
                    returns_loss=col("returns_loss"))
            .sort(SortKey("returns_loss", ascending=False)))


def q91_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[(dd["d_year"] == 1998) & (dd["d_moy"] == 11)]
    cd = t["customer_demographics"]
    cd = cd[((cd["cd_marital_status"] == "M") &
             (cd["cd_education_status"] == "Unknown")) |
            ((cd["cd_marital_status"] == "W") &
             (cd["cd_education_status"] == "Advanced Degree"))]
    hd = t["household_demographics"]
    hd = hd[hd["hd_buy_potential"].str.startswith("Unknown")]
    ca = t["customer_address"]
    ca = ca[ca["ca_gmt_offset"] == -7.0]
    j = (t["catalog_returns"]
         .merge(t["call_center"], left_on="cr_call_center_sk",
                right_on="cc_call_center_sk")
         .merge(dt, left_on="cr_returned_date_sk", right_on="d_date_sk")
         .merge(t["customer"], left_on="cr_returning_customer_sk",
                right_on="c_customer_sk")
         .merge(cd, left_on="c_current_cdemo_sk", right_on="cd_demo_sk")
         .merge(hd, left_on="c_current_hdemo_sk", right_on="hd_demo_sk")
         .merge(ca, left_on="c_current_addr_sk",
                right_on="ca_address_sk"))
    g = j.groupby(["cc_call_center_id", "cc_name", "cc_manager",
                   "cd_marital_status",
                   "cd_education_status"]).agg(
        returns_loss=("cr_net_loss", "sum")).reset_index()
    g = g.rename(columns={"cc_call_center_id": "call_center",
                          "cc_name": "call_center_name",
                          "cc_manager": "manager"})
    return g.sort_values("returns_loss", ascending=False,
                         kind="stable")[
        ["call_center", "call_center_name", "manager", "returns_loss"]]


QUERIES_LAST = {
    "q78": (q78, q78_oracle),
    "q91": (q91, q91_oracle),
}
