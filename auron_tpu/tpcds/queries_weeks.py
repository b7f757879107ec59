"""Real TPC-DS week-over-week ratio queries + q10 demographics.

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{2,10,59}.sql — verbatim, including q2/q59's deliberate row duplication
(the week summary joins date_dim per DAY of the week, so each ratio row
appears once per matching calendar day — the oracle mirrors it).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

from auron_tpu.expr.nodes import col, func, lit, when
from auron_tpu.ops.sort import SortKey
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame

_DAYS = ("Sunday", "Monday", "Tuesday", "Wednesday", "Thursday", "Friday",
         "Saturday")
_DAY_ALIAS = ("sun", "mon", "tue", "wed", "thu", "fri", "sat")


def _between(c, lo, hi):
    return (c >= lit(lo)) & (c <= lit(hi))


def _day_pivot_aggs(price_col: str):
    return {f"{a}_sales": ("sum", when(col("d_day_name") == lit(d),
                                       col(price_col)).end())
            for d, a in zip(_DAYS, _DAY_ALIAS)}


# ---------------------------------------------------------------------------
# q2: web+catalog weekday revenue ratios, 2001 weeks vs the same weeks one
# year later (d_week_seq2 - 53) (q2.sql).
# ---------------------------------------------------------------------------

def _wswscs(s: Session) -> Frame:
    u = (s.table("web_sales")
         .select(sold_date_sk=col("ws_sold_date_sk"),
                 sales_price=col("ws_ext_sales_price"))
         .union(s.table("catalog_sales")
                .select(sold_date_sk=col("cs_sold_date_sk"),
                        sales_price=col("cs_ext_sales_price"))))
    j = u.join(s.table("date_dim"), ("sold_date_sk",), ("d_date_sk",))
    return j.groupby("d_week_seq").agg(**_day_pivot_aggs("sales_price"))


def q2(s: Session) -> Frame:
    base = _wswscs(s)
    # per-DAY duplication is part of the query: join the year's calendar
    y_dates = (s.table("date_dim").filter(col("d_year") == lit(2001))
               .select(wk1=col("d_week_seq")))
    z_dates = (s.table("date_dim").filter(col("d_year") == lit(2002))
               .select(wk2=col("d_week_seq")))
    y = base.join(y_dates, ("d_week_seq",), ("wk1",)).rename(
        **{f"{a}_sales": f"{a}_sales1" for a in _DAY_ALIAS},
        d_week_seq="d_week_seq1")
    z = (base.join(z_dates, ("d_week_seq",), ("wk2",)).rename(
        **{f"{a}_sales": f"{a}_sales2" for a in _DAY_ALIAS},
        d_week_seq="d_week_seq2")
        .with_columns(wk_m53=col("d_week_seq2") - lit(53)))
    j = y.join(z, ("d_week_seq1",), ("wk_m53",))
    ratios = {f"r_{a}": func("round",
                             col(f"{a}_sales1") / col(f"{a}_sales2"),
                             params=(2,))
              for a in _DAY_ALIAS}
    return j.select("d_week_seq1", **ratios)


def q2_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    u = pd.concat([
        t["web_sales"][["ws_sold_date_sk", "ws_ext_sales_price"]]
        .rename(columns={"ws_sold_date_sk": "sold_date_sk",
                         "ws_ext_sales_price": "sales_price"}),
        t["catalog_sales"][["cs_sold_date_sk", "cs_ext_sales_price"]]
        .rename(columns={"cs_sold_date_sk": "sold_date_sk",
                         "cs_ext_sales_price": "sales_price"})],
        ignore_index=True)
    j = u.merge(dd, left_on="sold_date_sk", right_on="d_date_sk")
    for d, a in zip(_DAYS, _DAY_ALIAS):
        j[f"{a}_sales"] = j["sales_price"].where(j["d_day_name"] == d)
    base = j.groupby("d_week_seq")[
        [f"{a}_sales" for a in _DAY_ALIAS]].sum(min_count=1).reset_index()
    y = base.merge(dd[dd["d_year"] == 2001][["d_week_seq"]],
                   on="d_week_seq")  # per-day duplication intended
    z = base.merge(dd[dd["d_year"] == 2002][["d_week_seq"]],
                   on="d_week_seq")
    z = z.copy()
    z["wk_m53"] = z["d_week_seq"] - 53
    m = y.merge(z, left_on="d_week_seq", right_on="wk_m53",
                suffixes=("1", "2"))
    out = pd.DataFrame({"d_week_seq1": m["d_week_seq1"]})
    for a in _DAY_ALIAS:
        out[f"r_{a}"] = (m[f"{a}_sales1"] / m[f"{a}_sales2"]).round(2)
    return out


# ---------------------------------------------------------------------------
# q59: store weekday revenue ratios, months 1212-1223 vs the following
# twelve months (d_week_seq2 - 52), joined on store id (q59.sql).
# ---------------------------------------------------------------------------

def _wss(s: Session) -> Frame:
    j = s.table("store_sales").join(s.table("date_dim"),
                                    ("ss_sold_date_sk",), ("d_date_sk",))
    return j.groupby("d_week_seq", "ss_store_sk").agg(
        **_day_pivot_aggs("ss_sales_price"))


def _q59_half(s: Session, lo: int, hi: int, suffix: str) -> Frame:
    wk = (s.table("date_dim")
          .filter(_between(col("d_month_seq"), lo, hi))
          .select(**{f"wk{suffix}": col("d_week_seq")}))
    out = (_wss(s)
           .join(s.table("store"), ("ss_store_sk",), ("s_store_sk",))
           .join(wk, ("d_week_seq",), (f"wk{suffix}",)))
    ren = {f"{a}_sales": f"{a}_sales{suffix}" for a in _DAY_ALIAS}
    ren.update(d_week_seq=f"d_week_seq{suffix}",
               s_store_id=f"s_store_id{suffix}")
    if suffix == "1":
        ren.update(s_store_name="s_store_name1")
    sel = [f"d_week_seq{suffix}", f"s_store_id{suffix}"] + \
        [f"{a}_sales{suffix}" for a in _DAY_ALIAS]
    if suffix == "1":
        sel.append("s_store_name1")
    return out.rename(**ren).select(*sel)


def q59(s: Session) -> Frame:
    y = _q59_half(s, 1212, 1223, "1")
    x = (_q59_half(s, 1224, 1235, "2")
         .with_columns(wk_m52=col("d_week_seq2") - lit(52)))
    j = y.join(x, ("s_store_id1", "d_week_seq1"),
               ("s_store_id2", "wk_m52"))
    ratios = {f"r_{a}": col(f"{a}_sales1") / col(f"{a}_sales2")
              for a in _DAY_ALIAS}
    return (j.select("s_store_name1", "s_store_id1", "d_week_seq1",
                     **ratios)
            .sort(SortKey("s_store_name1"), SortKey("s_store_id1"),
                  SortKey("d_week_seq1"), limit=100))


def q59_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    j = t["store_sales"].merge(dd, left_on="ss_sold_date_sk",
                               right_on="d_date_sk")
    for d, a in zip(_DAYS, _DAY_ALIAS):
        j[f"{a}_sales"] = j["ss_sales_price"].where(j["d_day_name"] == d)
    wss = j.groupby(["d_week_seq", "ss_store_sk"])[
        [f"{a}_sales" for a in _DAY_ALIAS]].sum(min_count=1).reset_index()
    wss = wss.merge(t["store"], left_on="ss_store_sk",
                    right_on="s_store_sk")

    def half(lo, hi):
        wk = dd[dd["d_month_seq"].between(lo, hi)][["d_week_seq"]]
        return wss.merge(wk, on="d_week_seq")  # per-day duplication
    y = half(1212, 1223)
    x = half(1224, 1235).copy()
    x["wk_m52"] = x["d_week_seq"] - 52
    m = y.merge(x, left_on=["s_store_id", "d_week_seq"],
                right_on=["s_store_id", "wk_m52"], suffixes=("1", "2"))
    out = pd.DataFrame({
        "s_store_name1": m["s_store_name1"],
        "s_store_id1": m["s_store_id"],
        "d_week_seq1": m["d_week_seq1"]})
    for a in _DAY_ALIAS:
        out[f"r_{a}"] = m[f"{a}_sales1"] / m[f"{a}_sales2"]
    return out.sort_values(["s_store_name1", "s_store_id1",
                            "d_week_seq1"], kind="stable").head(100)


# ---------------------------------------------------------------------------
# q10: county demographics of customers active in store AND (web OR
# catalog) in early 2002 (q10.sql).
# ---------------------------------------------------------------------------

_Q10_KEYS = ["cd_gender", "cd_marital_status", "cd_education_status",
             "cd_purchase_estimate", "cd_credit_rating", "cd_dep_count",
             "cd_dep_employed_count", "cd_dep_college_count"]


def q10(s: Session) -> Frame:
    from auron_tpu.tpcds.queries_demo import _active
    pred = (col("d_year") == lit(2002)) & _between(col("d_moy"), 1, 4)
    ss = _active(s, "store_sales", "ss_customer_sk", "ss_sold_date_sk",
                 pred, "ss_c")
    ws = _active(s, "web_sales", "ws_bill_customer_sk", "ws_sold_date_sk",
                 pred, "ws_c")
    cs = _active(s, "catalog_sales", "cs_ship_customer_sk",
                 "cs_sold_date_sk", pred, "cs_c")
    ca = s.table("customer_address").filter(col("ca_county").isin(
        ["Rush County", "Toole County", "Jefferson County",
         "Dona Ana County", "La Porte County"]))
    j = (s.table("customer")
         .join(ca, ("c_current_addr_sk",), ("ca_address_sk",))
         .join(s.table("customer_demographics"), ("c_current_cdemo_sk",),
               ("cd_demo_sk",))
         .join(ss, ("c_customer_sk",), ("ss_c",), how="left_semi")
         .join(ws, ("c_customer_sk",), ("ws_c",), how="existence")
         .rename(**{"exists#": "in_web"})
         .join(cs, ("c_customer_sk",), ("cs_c",), how="existence")
         .filter(col("in_web") | col("exists#")))
    return (j.groupby(*_Q10_KEYS)
            .agg(cnt1=("count_star", None))
            .sort(*[SortKey(k) for k in _Q10_KEYS], limit=100)
            # literal q10.sql: count(*) repeats after each trailing key
            .select(cd_gender=col("cd_gender"),
                    cd_marital_status=col("cd_marital_status"),
                    cd_education_status=col("cd_education_status"),
                    cnt1=col("cnt1"),
                    cd_purchase_estimate=col("cd_purchase_estimate"),
                    cnt2=col("cnt1"),
                    cd_credit_rating=col("cd_credit_rating"),
                    cnt3=col("cnt1"),
                    cd_dep_count=col("cd_dep_count"),
                    cnt4=col("cnt1"),
                    cd_dep_employed_count=col("cd_dep_employed_count"),
                    cnt5=col("cnt1"),
                    cd_dep_college_count=col("cd_dep_college_count"),
                    cnt6=col("cnt1")))


def q10_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = set(dd[(dd["d_year"] == 2002) &
                dd["d_moy"].between(1, 4)]["d_date_sk"])
    ss = set(t["store_sales"][t["store_sales"]["ss_sold_date_sk"]
                              .isin(dt)]["ss_customer_sk"])
    ws = set(t["web_sales"][t["web_sales"]["ws_sold_date_sk"]
                            .isin(dt)]["ws_bill_customer_sk"])
    cs = set(t["catalog_sales"][t["catalog_sales"]["cs_sold_date_sk"]
                                .isin(dt)]["cs_ship_customer_sk"])
    ca = t["customer_address"]
    ca = ca[ca["ca_county"].isin(
        ["Rush County", "Toole County", "Jefferson County",
         "Dona Ana County", "La Porte County"])]
    c = t["customer"]
    c = c[c["c_customer_sk"].isin(ss) &
          (c["c_customer_sk"].isin(ws) | c["c_customer_sk"].isin(cs))]
    j = (c.merge(ca, left_on="c_current_addr_sk",
                 right_on="ca_address_sk")
         .merge(t["customer_demographics"], left_on="c_current_cdemo_sk",
                right_on="cd_demo_sk"))
    g = j.groupby(_Q10_KEYS).size().reset_index(name="cnt1")
    g = g.sort_values(_Q10_KEYS, kind="stable").head(100)
    for k in range(2, 7):
        g[f"cnt{k}"] = g["cnt1"]
    return g[["cd_gender", "cd_marital_status", "cd_education_status",
              "cnt1", "cd_purchase_estimate", "cnt2", "cd_credit_rating",
              "cnt3", "cd_dep_count", "cnt4", "cd_dep_employed_count",
              "cnt5", "cd_dep_college_count", "cnt6"]]


QUERIES_WEEKS = {
    "q2": (q2, q2_oracle),
    "q10": (q10, q10_oracle),
    "q59": (q59, q59_oracle),
}
