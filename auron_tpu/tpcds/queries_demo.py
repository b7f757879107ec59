"""Real TPC-DS demographic EXISTS queries.

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{18,35,69}.sql — verbatim. Channel-activity EXISTS / NOT EXISTS become
semi / anti joins against DISTINCT per-channel customer sets (Spark's own
plan); q18's DECIMAL(12,2)-cast averages are numerically the raw averages
(the cast widens, it does not round inputs), compared under the runner's
float tolerance.
"""

from __future__ import annotations

from typing import Dict

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


def _active(s: Session, fact, cust, date, pred, alias) -> Frame:
    dt = s.table("date_dim").filter(pred)
    return (s.table(fact).join(dt, (date,), ("d_date_sk",))
            .select(**{alias: col(cust)}).distinct())


# ---------------------------------------------------------------------------
# q18: catalog demographic averages over ROLLUP(item, country, state,
# county) for young-month F/Unknown buyers (q18.sql).
# ---------------------------------------------------------------------------

_Q18_KEYS = ["i_item_id", "ca_country", "ca_state", "ca_county"]
_Q18_AGGS = ["agg1", "agg2", "agg3", "agg4", "agg5", "agg6", "agg7"]


def q18(s: Session) -> Frame:
    dt = s.table("date_dim").filter(col("d_year") == lit(1998))
    cd1 = s.table("customer_demographics").filter(
        (col("cd_gender") == lit("F")) &
        (col("cd_education_status") == lit("Unknown")))
    cd2 = (s.table("customer_demographics")
           .select(cd2_sk=col("cd_demo_sk")))
    cust = s.table("customer").filter(
        col("c_birth_month").isin([1, 6, 8, 9, 12, 2]))
    ca = s.table("customer_address").filter(
        col("ca_state").isin(["MS", "IN", "ND", "OK", "NM", "VA"]))
    j = (s.table("catalog_sales")
         .join(dt, ("cs_sold_date_sk",), ("d_date_sk",))
         .join(s.table("item"), ("cs_item_sk",), ("i_item_sk",))
         .join(cd1, ("cs_bill_cdemo_sk",), ("cd_demo_sk",))
         .join(cust, ("cs_bill_customer_sk",), ("c_customer_sk",))
         .join(cd2, ("c_current_cdemo_sk",), ("cd2_sk",))
         .join(ca, ("c_current_addr_sk",), ("ca_address_sk",)))
    aggs = dict(agg1=("avg", col("cs_quantity")),
                agg2=("avg", col("cs_list_price")),
                agg3=("avg", col("cs_coupon_amt")),
                agg4=("avg", col("cs_sales_price")),
                agg5=("avg", col("cs_net_profit")),
                agg6=("avg", col("c_birth_year")),
                agg7=("avg", col("cd_dep_count")))
    levels = []
    for k in range(len(_Q18_KEYS), -1, -1):
        keys = _Q18_KEYS[:k]
        g = j.groupby(*keys).agg(**aggs)
        nulls = {c: _null_like(lit("")) for c in _Q18_KEYS[k:]}
        if nulls:
            g = g.with_columns(**nulls)
        levels.append(g.select(*_Q18_KEYS, *_Q18_AGGS))
    u = levels[0]
    for lv in levels[1:]:
        u = u.union(lv)
    return u.sort(SortKey("ca_country", ascending=False),
                  SortKey("ca_state", ascending=False),
                  SortKey("ca_county", ascending=False),
                  SortKey("i_item_id"), limit=100)


def q18_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dt = t["date_dim"][t["date_dim"]["d_year"] == 1998]
    cd = t["customer_demographics"]
    cd1 = cd[(cd["cd_gender"] == "F") &
             (cd["cd_education_status"] == "Unknown")]
    cust = t["customer"]
    cust = cust[cust["c_birth_month"].isin([1, 6, 8, 9, 12, 2])]
    ca = t["customer_address"]
    ca = ca[ca["ca_state"].isin(["MS", "IN", "ND", "OK", "NM", "VA"])]
    j = (t["catalog_sales"]
         .merge(dt, left_on="cs_sold_date_sk", right_on="d_date_sk")
         .merge(t["item"], left_on="cs_item_sk", right_on="i_item_sk")
         .merge(cd1, left_on="cs_bill_cdemo_sk", right_on="cd_demo_sk")
         .merge(cust, left_on="cs_bill_customer_sk",
                right_on="c_customer_sk")
         .merge(cd[["cd_demo_sk"]].rename(columns={"cd_demo_sk": "cd2"}),
                left_on="c_current_cdemo_sk", right_on="cd2")
         .merge(ca, left_on="c_current_addr_sk", right_on="ca_address_sk"))
    spec = dict(agg1=("cs_quantity", "mean"),
                agg2=("cs_list_price", "mean"),
                agg3=("cs_coupon_amt", "mean"),
                agg4=("cs_sales_price", "mean"),
                agg5=("cs_net_profit", "mean"),
                agg6=("c_birth_year", "mean"),
                agg7=("cd_dep_count", "mean"))
    parts = []
    for k in range(len(_Q18_KEYS), -1, -1):
        keys = _Q18_KEYS[:k]
        if keys:
            g = j.groupby(keys).agg(**spec).reset_index()
        else:
            g = pd.DataFrame({n: [getattr(j[c], m)()]
                              for n, (c, m) in spec.items()})
        for c in _Q18_KEYS[k:]:
            g[c] = None
        parts.append(g[_Q18_KEYS + _Q18_AGGS])
    u = pd.concat(parts, ignore_index=True) if len(j) else parts[0]
    # Spark: DESC => NULLS LAST, ASC => NULLS FIRST. pandas has one
    # na_position for all keys, so sort on ""-filled copies ("" sorts
    # before any real value: last under DESC, first under ASC).
    key = u[_Q18_KEYS].fillna("")
    order = key.sort_values(
        ["ca_country", "ca_state", "ca_county", "i_item_id"],
        ascending=[False, False, False, True], kind="stable").index
    return u.loc[order].head(100)


# ---------------------------------------------------------------------------
# q35: demographics of customers active in store AND (web OR catalog),
# first 3 quarters of 2002 (q35.sql).
# ---------------------------------------------------------------------------

_Q35_KEYS = ["ca_state", "cd_gender", "cd_marital_status", "cd_dep_count",
             "cd_dep_employed_count", "cd_dep_college_count"]


def q35(s: Session) -> Frame:
    pred = (col("d_year") == lit(2002)) & (col("d_qoy") < lit(4))
    ss = _active(s, "store_sales", "ss_customer_sk", "ss_sold_date_sk",
                 pred, "ss_c")
    ws = _active(s, "web_sales", "ws_bill_customer_sk", "ws_sold_date_sk",
                 pred, "ws_c")
    cs = _active(s, "catalog_sales", "cs_ship_customer_sk",
                 "cs_sold_date_sk", pred, "cs_c")
    j = (s.table("customer")
         .join(s.table("customer_address"), ("c_current_addr_sk",),
               ("ca_address_sk",))
         .join(s.table("customer_demographics"), ("c_current_cdemo_sk",),
               ("cd_demo_sk",))
         .join(ss, ("c_customer_sk",), ("ss_c",), how="left_semi")
         .join(ws, ("c_customer_sk",), ("ws_c",), how="existence")
         .rename(**{"exists#": "in_web"})
         .join(cs, ("c_customer_sk",), ("cs_c",), how="existence")
         .filter(col("in_web") | col("exists#")))
    return (j.groupby(*_Q35_KEYS)
            .agg(cnt1=("count_star", None),
                 mind=("min", col("cd_dep_count")),
                 maxd=("max", col("cd_dep_count")),
                 avgd=("avg", col("cd_dep_count")),
                 mine=("min", col("cd_dep_employed_count")),
                 maxe=("max", col("cd_dep_employed_count")),
                 avge=("avg", col("cd_dep_employed_count")),
                 minc=("min", col("cd_dep_college_count")),
                 maxc=("max", col("cd_dep_college_count")),
                 avgc=("avg", col("cd_dep_college_count")))
            .sort(*[SortKey(k) for k in _Q35_KEYS], limit=100)
            # literal q35.sql SELECT list: count(*) repeats per block,
            # cd_dep_count itself is grouped but NOT projected
            .select(ca_state=col("ca_state"), cd_gender=col("cd_gender"),
                    cd_marital_status=col("cd_marital_status"),
                    cnt1=col("cnt1"), mind=col("mind"), maxd=col("maxd"),
                    avgd=col("avgd"),
                    cd_dep_employed_count=col("cd_dep_employed_count"),
                    cnt2=col("cnt1"), mine=col("mine"), maxe=col("maxe"),
                    avge=col("avge"),
                    cd_dep_college_count=col("cd_dep_college_count"),
                    cnt3=col("cnt1"), minc=col("minc"), maxc=col("maxc"),
                    avgc=col("avgc")))


def q35_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = set(dd[(dd["d_year"] == 2002) & (dd["d_qoy"] < 4)]["d_date_sk"])
    ss = set(t["store_sales"][t["store_sales"]["ss_sold_date_sk"]
                              .isin(dt)]["ss_customer_sk"])
    ws = set(t["web_sales"][t["web_sales"]["ws_sold_date_sk"]
                            .isin(dt)]["ws_bill_customer_sk"])
    cs = set(t["catalog_sales"][t["catalog_sales"]["cs_sold_date_sk"]
                                .isin(dt)]["cs_ship_customer_sk"])
    c = t["customer"]
    c = c[c["c_customer_sk"].isin(ss) &
          (c["c_customer_sk"].isin(ws) | c["c_customer_sk"].isin(cs))]
    j = (c.merge(t["customer_address"], left_on="c_current_addr_sk",
                 right_on="ca_address_sk")
         .merge(t["customer_demographics"], left_on="c_current_cdemo_sk",
                right_on="cd_demo_sk"))
    g = j.groupby(_Q35_KEYS).agg(
        cnt1=("cd_dep_count", "size"),
        mind=("cd_dep_count", "min"), maxd=("cd_dep_count", "max"),
        avgd=("cd_dep_count", "mean"),
        mine=("cd_dep_employed_count", "min"),
        maxe=("cd_dep_employed_count", "max"),
        avge=("cd_dep_employed_count", "mean"),
        minc=("cd_dep_college_count", "min"),
        maxc=("cd_dep_college_count", "max"),
        avgc=("cd_dep_college_count", "mean")).reset_index()
    g = g.sort_values(_Q35_KEYS, kind="stable").head(100)
    g["cnt2"] = g["cnt1"]
    g["cnt3"] = g["cnt1"]
    return g[["ca_state", "cd_gender", "cd_marital_status", "cnt1",
              "mind", "maxd", "avgd", "cd_dep_employed_count", "cnt2",
              "mine", "maxe", "avge", "cd_dep_college_count", "cnt3",
              "minc", "maxc", "avgc"]]


# ---------------------------------------------------------------------------
# q69: demographics of store-only customers (NOT web, NOT catalog),
# spring 2001, three states (q69.sql).
# ---------------------------------------------------------------------------

_Q69_KEYS = ["cd_gender", "cd_marital_status", "cd_education_status",
             "cd_purchase_estimate", "cd_credit_rating"]


def q69(s: Session) -> Frame:
    pred = (col("d_year") == lit(2001)) & _between(col("d_moy"), 4, 6)
    ss = _active(s, "store_sales", "ss_customer_sk", "ss_sold_date_sk",
                 pred, "ss_c")
    ws = _active(s, "web_sales", "ws_bill_customer_sk", "ws_sold_date_sk",
                 pred, "ws_c")
    cs = _active(s, "catalog_sales", "cs_ship_customer_sk",
                 "cs_sold_date_sk", pred, "cs_c")
    ca = s.table("customer_address").filter(
        col("ca_state").isin(["KY", "GA", "NM"]))
    j = (s.table("customer")
         .join(ca, ("c_current_addr_sk",), ("ca_address_sk",))
         .join(s.table("customer_demographics"), ("c_current_cdemo_sk",),
               ("cd_demo_sk",))
         .join(ss, ("c_customer_sk",), ("ss_c",), how="left_semi")
         .join(ws, ("c_customer_sk",), ("ws_c",), how="left_anti")
         .join(cs, ("c_customer_sk",), ("cs_c",), how="left_anti"))
    return (j.groupby(*_Q69_KEYS)
            .agg(cnt1=("count_star", None))
            .sort(*[SortKey(k) for k in _Q69_KEYS], limit=100)
            # literal q69.sql: count(*) repeats after each trailing key
            .select(cd_gender=col("cd_gender"),
                    cd_marital_status=col("cd_marital_status"),
                    cd_education_status=col("cd_education_status"),
                    cnt1=col("cnt1"),
                    cd_purchase_estimate=col("cd_purchase_estimate"),
                    cnt2=col("cnt1"),
                    cd_credit_rating=col("cd_credit_rating"),
                    cnt3=col("cnt1")))


def q69_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = set(dd[(dd["d_year"] == 2001) &
                dd["d_moy"].between(4, 6)]["d_date_sk"])
    ss = set(t["store_sales"][t["store_sales"]["ss_sold_date_sk"]
                              .isin(dt)]["ss_customer_sk"])
    ws = set(t["web_sales"][t["web_sales"]["ws_sold_date_sk"]
                            .isin(dt)]["ws_bill_customer_sk"])
    cs = set(t["catalog_sales"][t["catalog_sales"]["cs_sold_date_sk"]
                                .isin(dt)]["cs_ship_customer_sk"])
    ca = t["customer_address"]
    ca = ca[ca["ca_state"].isin(["KY", "GA", "NM"])]
    c = t["customer"]
    c = c[c["c_customer_sk"].isin(ss) & ~c["c_customer_sk"].isin(ws) &
          ~c["c_customer_sk"].isin(cs)]
    j = (c.merge(ca, left_on="c_current_addr_sk",
                 right_on="ca_address_sk")
         .merge(t["customer_demographics"], left_on="c_current_cdemo_sk",
                right_on="cd_demo_sk"))
    g = j.groupby(_Q69_KEYS).size().reset_index(name="cnt1")
    g = g.sort_values(_Q69_KEYS, kind="stable").head(100)
    g["cnt2"] = g["cnt1"]
    g["cnt3"] = g["cnt1"]
    return g[["cd_gender", "cd_marital_status", "cd_education_status",
              "cnt1", "cd_purchase_estimate", "cnt2", "cd_credit_rating",
              "cnt3"]]


QUERIES_DEMO = {
    "q18": (q18, q18_oracle),
    "q35": (q35, q35_oracle),
    "q69": (q69, q69_oracle),
}
