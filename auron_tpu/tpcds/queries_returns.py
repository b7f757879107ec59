"""Real TPC-DS return-ratio / EXCEPT / inventory-rollup queries.

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{22,30,81,87}.sql — verbatim. q30/q81 decorrelate the per-state average
correlated subquery into an aggregate join (q1's pattern, per state
instead of per store); q87 decomposes EXCEPT into anti joins of DISTINCT
sets; q22 is a four-level inventory rollup of average quantity on hand.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import pandas as pd

from auron_tpu.expr.nodes import col, lit, when
from auron_tpu.ops.sort import SortKey
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame


def _between(c, lo, hi):
    return (c >= lit(lo)) & (c <= lit(hi))


def _null_like(example):
    return when(lit(False), example).end()


# ---------------------------------------------------------------------------
# q22: average quantity on hand over ROLLUP(product, brand, class,
# category) for year 2000 (q22.sql).
# ---------------------------------------------------------------------------

_Q22_KEYS = ["i_product_name", "i_brand", "i_class", "i_category"]


def q22(s: Session) -> Frame:
    dt = s.table("date_dim").filter(_between(col("d_month_seq"), 1200,
                                            1200 + 11))
    j = (s.table("inventory")
         .join(dt, ("inv_date_sk",), ("d_date_sk",))
         .join(s.table("item"), ("inv_item_sk",), ("i_item_sk",))
         .join(s.table("warehouse"), ("inv_warehouse_sk",),
               ("w_warehouse_sk",)))
    levels: List[Frame] = []
    for k in range(len(_Q22_KEYS), -1, -1):
        keys = _Q22_KEYS[:k]
        g = j.groupby(*keys).agg(qoh=("avg", col("inv_quantity_on_hand")))
        nulls = {c: _null_like(lit("")) for c in _Q22_KEYS[k:]}
        if nulls:
            g = g.with_columns(**nulls)
        levels.append(g.select(*_Q22_KEYS, "qoh"))
    u = levels[0]
    for lv in levels[1:]:
        u = u.union(lv)
    return u.sort(SortKey("qoh"), *[SortKey(c) for c in _Q22_KEYS],
                  limit=100)


def q22_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[dd["d_month_seq"].between(1200, 1211)]
    j = (t["inventory"]
         .merge(dt, left_on="inv_date_sk", right_on="d_date_sk")
         .merge(t["item"], left_on="inv_item_sk", right_on="i_item_sk")
         .merge(t["warehouse"], left_on="inv_warehouse_sk",
                right_on="w_warehouse_sk"))
    parts = []
    for k in range(len(_Q22_KEYS), -1, -1):
        keys = _Q22_KEYS[:k]
        if keys:
            g = j.groupby(keys)["inv_quantity_on_hand"].mean() \
                .reset_index(name="qoh")
        else:
            g = pd.DataFrame({"qoh": [j["inv_quantity_on_hand"].mean()]})
        for c in _Q22_KEYS[k:]:
            g[c] = None
        parts.append(g[_Q22_KEYS + ["qoh"]])
    u = pd.concat(parts, ignore_index=True)
    return u.sort_values(["qoh"] + _Q22_KEYS, na_position="first",
                         kind="stable").head(100)


# ---------------------------------------------------------------------------
# q30 / q81: customers returning more than 1.2x their state's average
# (web / catalog) — q1's decorrelation per state, Georgia slice.
# ---------------------------------------------------------------------------

_Q30_CUST_COLS = ["c_customer_id", "c_salutation", "c_first_name",
                  "c_last_name", "c_preferred_cust_flag", "c_birth_day",
                  "c_birth_month", "c_birth_year", "c_birth_country",
                  "c_login", "c_email_address", "c_last_review_date_sk"]


def _returns_query(s: Session, table: str, cust: str, addr: str,
                   date: str, amt: str, year: int,
                   select_cols=None) -> Frame:
    dt = s.table("date_dim").filter(col("d_year") == lit(year))
    ctr = (s.table(table)
           .join(dt, (date,), ("d_date_sk",))
           .join(s.table("customer_address"), (addr,), ("ca_address_sk",))
           .groupby(("ctr_customer_sk", col(cust)),
                    ("ctr_state", col("ca_state")))
           .agg(ctr_total_return=("sum", col(amt))))
    avg_state = (ctr.groupby("ctr_state")
                 .agg(avg_return=("avg", col("ctr_total_return")))
                 .rename(ctr_state="avg_state"))
    ga = s.table("customer_address").filter(col("ca_state") == lit("GA"))
    out = (ctr.join(avg_state, ("ctr_state",), ("avg_state",))
           .filter(col("ctr_total_return") > col("avg_return") * lit(1.2))
           .join(s.table("customer"), ("ctr_customer_sk",),
                 ("c_customer_sk",))
           .join(ga, ("c_current_addr_sk",), ("ca_address_sk",)))
    cols = select_cols if select_cols is not None else _Q30_CUST_COLS
    return (out.select(*cols, "ctr_total_return")
            .sort(*[SortKey(c) for c in cols],
                  SortKey("ctr_total_return"), limit=100))


def q30(s: Session) -> Frame:
    return _returns_query(s, "web_returns", "wr_returning_customer_sk",
                          "wr_returning_addr_sk", "wr_returned_date_sk",
                          "wr_return_amt", 2002)


# q81.sql projects the customer's full GA ADDRESS, not the birth columns
_Q81_COLS = ["c_customer_id", "c_salutation", "c_first_name",
             "c_last_name", "ca_street_number", "ca_street_name",
             "ca_street_type", "ca_suite_number", "ca_city", "ca_county",
             "ca_state", "ca_zip", "ca_country", "ca_gmt_offset",
             "ca_location_type"]


def q81(s: Session) -> Frame:
    return _returns_query(s, "catalog_returns", "cr_returning_customer_sk",
                          "cr_returning_addr_sk", "cr_returned_date_sk",
                          "cr_return_amt_inc_tax", 2000,
                          select_cols=_Q81_COLS)


def _returns_oracle(t, table, cust, addr, date, amt, year,
                    select_cols=None):
    dt = t["date_dim"][t["date_dim"]["d_year"] == year]
    j = (t[table]
         .merge(dt, left_on=date, right_on="d_date_sk")
         .merge(t["customer_address"], left_on=addr,
                right_on="ca_address_sk"))
    ctr = j.groupby([cust, "ca_state"]).agg(
        ctr_total_return=(amt, "sum")).reset_index() \
        .rename(columns={cust: "ctr_customer_sk", "ca_state": "ctr_state"})
    avg = ctr.groupby("ctr_state")["ctr_total_return"].mean() \
        .reset_index(name="avg_return")
    m = ctr.merge(avg, on="ctr_state")
    m = m[m["ctr_total_return"] > m["avg_return"] * 1.2]
    ga = t["customer_address"]
    ga = ga[ga["ca_state"] == "GA"]
    out = (m.merge(t["customer"], left_on="ctr_customer_sk",
                   right_on="c_customer_sk")
           .merge(ga, left_on="c_current_addr_sk",
                  right_on="ca_address_sk"))
    cols = select_cols if select_cols is not None else _Q30_CUST_COLS
    return out.sort_values(cols + ["ctr_total_return"],
                           kind="stable").head(100)[
        cols + ["ctr_total_return"]]


def q30_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    return _returns_oracle(t, "web_returns", "wr_returning_customer_sk",
                           "wr_returning_addr_sk", "wr_returned_date_sk",
                           "wr_return_amt", 2002)


def q81_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    return _returns_oracle(t, "catalog_returns",
                           "cr_returning_customer_sk",
                           "cr_returning_addr_sk", "cr_returned_date_sk",
                           "cr_return_amt_inc_tax", 2000,
                           select_cols=_Q81_COLS)


# ---------------------------------------------------------------------------
# q87: store-channel customers NOT in catalog and NOT in web (q87.sql) —
# EXCEPT decomposes into anti joins of the DISTINCT per-channel sets.
# ---------------------------------------------------------------------------

def q87(s: Session) -> Frame:
    from auron_tpu.tpcds.queries_window import _q38_channel
    a = _q38_channel(s, "store_sales", "ss_sold_date_sk", "ss_customer_sk",
                     "")
    b = _q38_channel(s, "catalog_sales", "cs_sold_date_sk",
                     "cs_bill_customer_sk", "2")
    c = _q38_channel(s, "web_sales", "ws_sold_date_sk",
                     "ws_bill_customer_sk", "3")
    rem = (a.join(b, ("c_last_name", "c_first_name", "d_date"),
                  ("ln2", "fn2", "dd2"), how="left_anti")
           .join(c, ("c_last_name", "c_first_name", "d_date"),
                 ("ln3", "fn3", "dd3"), how="left_anti"))
    return rem.groupby().agg(cnt=("count_star", None))


def q87_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[dd["d_month_seq"].between(1200, 1211)]

    def chan(table, date_col, cust_col):
        j = (t[table]
             .merge(dt, left_on=date_col, right_on="d_date_sk")
             .merge(t["customer"], left_on=cust_col,
                    right_on="c_customer_sk"))
        return set(map(tuple, j[["c_last_name", "c_first_name",
                                 "d_date"]].drop_duplicates().to_numpy()))
    rem = (chan("store_sales", "ss_sold_date_sk", "ss_customer_sk") -
           chan("catalog_sales", "cs_sold_date_sk",
                "cs_bill_customer_sk") -
           chan("web_sales", "ws_sold_date_sk", "ws_bill_customer_sk"))
    return pd.DataFrame({"cnt": [len(rem)]})


QUERIES_RETURNS = {
    "q22": (q22, q22_oracle),
    "q30": (q30, q30_oracle),
    "q81": (q81, q81_oracle),
    "q87": (q87, q87_oracle),
}
