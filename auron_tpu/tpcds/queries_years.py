"""Real TPC-DS year-over-year customer-growth family (q4, q11, q74).

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{4,11,74}.sql — verbatim. The year_total CTE becomes per-(channel, year)
customer aggregates; the 4-way (q11/q74) or 6-way (q4) self-join compares
growth ratios channel against channel with SQL's CASE-guarded divisions.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd

from auron_tpu.expr.nodes import Expr, col, lit, when
from auron_tpu.ops.sort import SortKey
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame

_CHANNELS = {
    "s": ("store_sales", "ss_customer_sk", "ss_sold_date_sk"),
    "c": ("catalog_sales", "cs_bill_customer_sk", "cs_sold_date_sk"),
    "w": ("web_sales", "ws_bill_customer_sk", "ws_sold_date_sk"),
}


def _year_total(s: Session, chan: str, year: int, total_expr: Expr,
                tag: str, keys: List[str]) -> Frame:
    fact, cust, date = _CHANNELS[chan]
    dt = s.table("date_dim").filter(col("d_year") == lit(year))
    g = (s.table(fact)
         .join(dt, (date,), ("d_date_sk",))
         .join(s.table("customer"), (cust,), ("c_customer_sk",))
         .groupby(*keys)
         .agg(total=("sum", total_expr)))
    ren = {k: f"{tag}_{k}" for k in keys}
    ren["total"] = f"{tag}_total"
    return g.rename(**ren)


def _growth_query(s: Session, totals: Dict[str, Expr], keys: List[str],
                  select_cols: List[str], sort_cols: List[str],
                  chans: str, cmps: List[tuple],
                  out_names: Dict[str, str]) -> Frame:
    """cmps: [(gt, lt), ...] ratio conditions ratio(gt) > ratio(lt), the
    literal CASE-guarded comparisons (q4: c>s AND c>w; q11/q74: w>s).
    out_names: key -> literal output alias (customer_id etc.)."""
    frames = {}
    for ch in chans:
        for yr, era in ((2001, "first"), (2002, "sec")):
            frames[f"{ch}_{era}"] = _year_total(
                s, ch, yr, totals[ch], f"{ch}_{era}", keys)
    first = f"{chans[0]}_sec"
    out = frames[first]
    for name, f in frames.items():
        if name == first:
            continue
        out = out.join(f, (f"{first}_{keys[0]}",),
                       (f"{name}_{keys[0]}",))
    for ch in chans:
        out = out.filter(col(f"{ch}_first_total") > lit(0.0))

    def ratio(ch):
        return when(col(f"{ch}_first_total") > lit(0.0),
                    col(f"{ch}_sec_total") /
                    col(f"{ch}_first_total")).end()
    for gt, lt in cmps:
        out = out.filter(ratio(gt) > ratio(lt))
    sel = {out_names[c]: col(f"{first}_{c}") for c in select_cols}
    return (out.select(**sel)
            .sort(*[SortKey(out_names[c]) for c in sort_cols], limit=100))


def _growth_oracle(t, total_fns: Dict, keys, select_cols, sort_cols,
                   chans: str, cmps: List[tuple],
                   out_names: Dict[str, str]) -> pd.DataFrame:
    dd = t["date_dim"]
    frames = {}
    for ch in chans:
        fact, cust, date = _CHANNELS[ch]
        for yr, era in ((2001, "first"), (2002, "sec")):
            dt = dd[dd["d_year"] == yr]
            j = (t[fact]
                 .merge(dt, left_on=date, right_on="d_date_sk")
                 .merge(t["customer"], left_on=cust,
                        right_on="c_customer_sk"))
            j = j.assign(_tot=total_fns[ch](j))
            g = j.groupby(keys)["_tot"].sum().reset_index(
                name=f"{ch}_{era}_total")
            frames[f"{ch}_{era}"] = g
    first = f"{chans[0]}_sec"
    out = frames[first]
    for name, f in frames.items():
        if name == first:
            continue
        out = out.merge(f[[keys[0], f"{name}_total"]], on=keys[0])
    for ch in chans:
        out = out[out[f"{ch}_first_total"] > 0]
    for gt, lt in cmps:
        r_gt = out[f"{gt}_sec_total"] / out[f"{gt}_first_total"]
        r_lt = out[f"{lt}_sec_total"] / out[f"{lt}_first_total"]
        out = out[r_gt > r_lt]
    out = out.sort_values(sort_cols, kind="stable").head(100)[select_cols]
    return out.rename(columns=out_names)


_Q74_KEYS = ["c_customer_id", "c_first_name", "c_last_name"]
_Q74_OUT = {"c_customer_id": "customer_id",
            "c_first_name": "customer_first_name",
            "c_last_name": "customer_last_name"}


def q74(s: Session) -> Frame:
    totals = {"s": col("ss_net_paid"), "w": col("ws_net_paid")}
    return _growth_query(s, totals, _Q74_KEYS, _Q74_KEYS,
                         ["c_customer_id"], "sw", [("w", "s")], _Q74_OUT)


def q74_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    fns = {"s": lambda j: j["ss_net_paid"],
           "w": lambda j: j["ws_net_paid"]}
    return _growth_oracle(t, fns, _Q74_KEYS, _Q74_KEYS,
                          ["c_customer_id"], "sw", [("w", "s")], _Q74_OUT)


_Q11_KEYS = ["c_customer_id", "c_first_name", "c_last_name",
             "c_preferred_cust_flag", "c_birth_country", "c_login",
             "c_email_address"]
_Q11_OUT = dict(_Q74_OUT,
                c_preferred_cust_flag="customer_preferred_cust_flag",
                c_birth_country="customer_birth_country",
                c_login="customer_login",
                c_email_address="customer_email_address")


def q11(s: Session) -> Frame:
    totals = {"s": col("ss_ext_list_price") - col("ss_ext_discount_amt"),
              "w": col("ws_ext_list_price") - col("ws_ext_discount_amt")}
    return _growth_query(s, totals, _Q11_KEYS,
                         ["c_preferred_cust_flag"],
                         ["c_preferred_cust_flag"], "sw", [("w", "s")],
                         _Q11_OUT)


def q11_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    fns = {"s": lambda j: j["ss_ext_list_price"] -
           j["ss_ext_discount_amt"],
           "w": lambda j: j["ws_ext_list_price"] -
           j["ws_ext_discount_amt"]}
    return _growth_oracle(t, fns, _Q11_KEYS,
                          ["c_preferred_cust_flag"],
                          ["c_preferred_cust_flag"], "sw", [("w", "s")],
                          _Q11_OUT)


def q4(s: Session) -> Frame:
    totals = {
        "s": (col("ss_ext_list_price") - col("ss_ext_wholesale_cost") -
              col("ss_ext_discount_amt") +
              col("ss_ext_sales_price")) / lit(2.0),
        "c": (col("cs_ext_list_price") - col("cs_ext_wholesale_cost") -
              col("cs_ext_discount_amt") +
              col("cs_ext_sales_price")) / lit(2.0),
        "w": (col("ws_ext_list_price") - col("ws_ext_wholesale_cost") -
              col("ws_ext_discount_amt") +
              col("ws_ext_sales_price")) / lit(2.0)}
    return _growth_query(s, totals, _Q11_KEYS, _Q11_KEYS, _Q11_KEYS,
                         "scw", [("c", "s"), ("c", "w")], _Q11_OUT)


def q4_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    fns = {
        "s": lambda j: (j["ss_ext_list_price"] -
                        j["ss_ext_wholesale_cost"] -
                        j["ss_ext_discount_amt"] +
                        j["ss_ext_sales_price"]) / 2.0,
        "c": lambda j: (j["cs_ext_list_price"] -
                        j["cs_ext_wholesale_cost"] -
                        j["cs_ext_discount_amt"] +
                        j["cs_ext_sales_price"]) / 2.0,
        "w": lambda j: (j["ws_ext_list_price"] -
                        j["ws_ext_wholesale_cost"] -
                        j["ws_ext_discount_amt"] +
                        j["ws_ext_sales_price"]) / 2.0}
    return _growth_oracle(t, fns, _Q11_KEYS, _Q11_KEYS, _Q11_KEYS,
                          "scw", [("c", "s"), ("c", "w")], _Q11_OUT)


QUERIES_YEARS = {
    "q4": (q4, q4_oracle),
    "q11": (q11, q11_oracle),
    "q74": (q74, q74_oracle),
}
