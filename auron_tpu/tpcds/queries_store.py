"""Real TPC-DS store-channel queries (part 1) as Frame pipelines + oracles.

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{13,27,34,46,48,50}.sql — predicates ported verbatim. Where a query's
ORDER BY is not a total order over its output, extra tiebreak keys are
appended to BOTH the engine sort and the oracle sort so a LIMIT cuts the
same rows (the reference comparator tolerates tie freedom only because both
its engines run the identical plan).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

from auron_tpu.expr.nodes import col, func, lit, when
from auron_tpu.ops.sort import SortKey
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame


def _between(c, lo, hi):
    return (c >= lit(lo)) & (c <= lit(hi))


# ---------------------------------------------------------------------------
# q13: global store-sales averages over OR-of-AND demographic/address
# bands (q13.sql). The per-branch equijoins are common to every branch, so
# Spark (and this port) plans inner joins + a residual OR filter.
# ---------------------------------------------------------------------------

def q13(s: Session) -> Frame:
    dt = s.table("date_dim").filter(col("d_year") == lit(2001))
    j = (s.table("store_sales")
         .join(s.table("store"), ("ss_store_sk",), ("s_store_sk",))
         .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
         .join(s.table("customer_demographics"), ("ss_cdemo_sk",),
               ("cd_demo_sk",))
         .join(s.table("household_demographics"), ("ss_hdemo_sk",),
               ("hd_demo_sk",))
         .join(s.table("customer_address"), ("ss_addr_sk",),
               ("ca_address_sk",)))
    demo = (((col("cd_marital_status") == lit("M")) &
             (col("cd_education_status") == lit("Advanced Degree")) &
             _between(col("ss_sales_price"), 100.00, 150.00) &
             (col("hd_dep_count") == lit(3))) |
            ((col("cd_marital_status") == lit("S")) &
             (col("cd_education_status") == lit("College")) &
             _between(col("ss_sales_price"), 50.00, 100.00) &
             (col("hd_dep_count") == lit(1))) |
            ((col("cd_marital_status") == lit("W")) &
             (col("cd_education_status") == lit("2 yr Degree")) &
             _between(col("ss_sales_price"), 150.00, 200.00) &
             (col("hd_dep_count") == lit(1))))
    addr = ((col("ca_country") == lit("United States")) &
            ((col("ca_state").isin(["TX", "OH"]) &
              _between(col("ss_net_profit"), 100, 200)) |
             (col("ca_state").isin(["OR", "NM", "KY"]) &
              _between(col("ss_net_profit"), 150, 300)) |
             (col("ca_state").isin(["VA", "TX", "MS"]) &
              _between(col("ss_net_profit"), 50, 250))))
    return (j.filter(demo & addr).groupby()
            .agg(a1=("avg", col("ss_quantity")),
                 a2=("avg", col("ss_ext_sales_price")),
                 a3=("avg", col("ss_ext_wholesale_cost")),
                 s4=("sum", col("ss_ext_wholesale_cost"))))


def q13_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dt = t["date_dim"][t["date_dim"]["d_year"] == 2001]
    j = (t["store_sales"]
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk")
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(t["customer_demographics"], left_on="ss_cdemo_sk",
                right_on="cd_demo_sk")
         .merge(t["household_demographics"], left_on="ss_hdemo_sk",
                right_on="hd_demo_sk")
         .merge(t["customer_address"], left_on="ss_addr_sk",
                right_on="ca_address_sk"))
    demo = (((j["cd_marital_status"] == "M") &
             (j["cd_education_status"] == "Advanced Degree") &
             j["ss_sales_price"].between(100.00, 150.00) &
             (j["hd_dep_count"] == 3)) |
            ((j["cd_marital_status"] == "S") &
             (j["cd_education_status"] == "College") &
             j["ss_sales_price"].between(50.00, 100.00) &
             (j["hd_dep_count"] == 1)) |
            ((j["cd_marital_status"] == "W") &
             (j["cd_education_status"] == "2 yr Degree") &
             j["ss_sales_price"].between(150.00, 200.00) &
             (j["hd_dep_count"] == 1)))
    addr = ((j["ca_country"] == "United States") &
            ((j["ca_state"].isin(["TX", "OH"]) &
              j["ss_net_profit"].between(100, 200)) |
             (j["ca_state"].isin(["OR", "NM", "KY"]) &
              j["ss_net_profit"].between(150, 300)) |
             (j["ca_state"].isin(["VA", "TX", "MS"]) &
              j["ss_net_profit"].between(50, 250))))
    j = j[demo & addr]
    return pd.DataFrame({
        "a1": [j["ss_quantity"].mean()],
        "a2": [j["ss_ext_sales_price"].mean()],
        "a3": [j["ss_ext_wholesale_cost"].mean()],
        "s4": [j["ss_ext_wholesale_cost"].sum()
               if len(j) else np.nan]})


# ---------------------------------------------------------------------------
# q27: item/state averages under GROUP BY ROLLUP (i_item_id, s_state)
# (q27.sql). Rollup decomposes into the union of its three grouping sets;
# aggregated-away keys surface as typed NULLs (an always-false CASE).
# ---------------------------------------------------------------------------

def q27(s: Session) -> Frame:
    dt = s.table("date_dim").filter(col("d_year") == lit(2002))
    cd = s.table("customer_demographics").filter(
        (col("cd_gender") == lit("M")) &
        (col("cd_marital_status") == lit("S")) &
        (col("cd_education_status") == lit("College")))
    st = s.table("store").filter(col("s_state").isin(["TN"]))
    j = (s.table("store_sales")
         .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
         .join(s.table("item"), ("ss_item_sk",), ("i_item_sk",))
         .join(st, ("ss_store_sk",), ("s_store_sk",))
         .join(cd, ("ss_cdemo_sk",), ("cd_demo_sk",)))
    aggs = dict(agg1=("avg", col("ss_quantity")),
                agg2=("avg", col("ss_list_price")),
                agg3=("avg", col("ss_coupon_amt")),
                agg4=("avg", col("ss_sales_price")))
    null_str = when(lit(False), lit("")).end()
    l0 = (j.groupby("i_item_id", "s_state").agg(**aggs)
          .with_columns(g_state=lit(0))
          .select("i_item_id", "s_state", "g_state",
                  "agg1", "agg2", "agg3", "agg4"))
    l1 = (j.groupby("i_item_id").agg(**aggs)
          .with_columns(s_state=null_str, g_state=lit(1))
          .select("i_item_id", "s_state", "g_state",
                  "agg1", "agg2", "agg3", "agg4"))
    l2 = (j.groupby().agg(**aggs)
          .with_columns(i_item_id=null_str, s_state=null_str,
                        g_state=lit(1))
          .select("i_item_id", "s_state", "g_state",
                  "agg1", "agg2", "agg3", "agg4"))
    return (l0.union(l1).union(l2)
            .sort(SortKey("i_item_id"), SortKey("s_state"), limit=100))


def q27_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dt = t["date_dim"][t["date_dim"]["d_year"] == 2002]
    cd = t["customer_demographics"]
    cd = cd[(cd["cd_gender"] == "M") & (cd["cd_marital_status"] == "S") &
            (cd["cd_education_status"] == "College")]
    st = t["store"][t["store"]["s_state"].isin(["TN"])]
    j = (t["store_sales"]
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk")
         .merge(cd, left_on="ss_cdemo_sk", right_on="cd_demo_sk"))
    aggs = dict(agg1=("ss_quantity", "mean"),
                agg2=("ss_list_price", "mean"),
                agg3=("ss_coupon_amt", "mean"),
                agg4=("ss_sales_price", "mean"))
    l0 = j.groupby(["i_item_id", "s_state"]).agg(**aggs).reset_index()
    l0["g_state"] = 0
    l1 = j.groupby(["i_item_id"]).agg(**aggs).reset_index()
    l1["s_state"] = None
    l1["g_state"] = 1
    l2 = pd.DataFrame({k: [getattr(j[c], m)()] for k, (c, m) in
                       aggs.items()})
    l2["i_item_id"] = None
    l2["s_state"] = None
    l2["g_state"] = 1
    cols = ["i_item_id", "s_state", "g_state", "agg1", "agg2", "agg3",
            "agg4"]
    # the () grouping set emits its row even over EMPTY input (SQL:
    # aggregate over zero rows = one row of NULLs), so l2 always joins
    out = pd.concat([l0[cols], l1[cols], l2[cols]], ignore_index=True)
    return out.sort_values(["i_item_id", "s_state"], kind="stable",
                           na_position="first").head(100)


# ---------------------------------------------------------------------------
# q34: 15-20-item baskets on month edges for car-owning high-dependency
# households in Williamson County (q34.sql).
# ---------------------------------------------------------------------------

def q34(s: Session) -> Frame:
    dt = s.table("date_dim").filter(
        (_between(col("d_dom"), 1, 3) | _between(col("d_dom"), 25, 28)) &
        col("d_year").isin([1999, 2000, 2001]))
    st = s.table("store").filter(
        col("s_county").isin(["Williamson County"]))
    hd = (s.table("household_demographics")
          .filter(col("hd_buy_potential").isin([">10000", "unknown"]) &
                  (col("hd_vehicle_count") > lit(0)))
          .filter(when(col("hd_vehicle_count") > lit(0),
                       col("hd_dep_count") / col("hd_vehicle_count"))
                  .end() > lit(1.2)))
    dn = (s.table("store_sales")
          .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
          .join(st, ("ss_store_sk",), ("s_store_sk",))
          .join(hd, ("ss_hdemo_sk",), ("hd_demo_sk",))
          .groupby("ss_ticket_number", "ss_customer_sk")
          .agg(cnt=("count_star", None))
          .filter(_between(col("cnt"), 15, 20)))
    return (dn.join(s.table("customer"), ("ss_customer_sk",),
                    ("c_customer_sk",))
            .select("c_last_name", "c_first_name", "c_salutation",
                    "c_preferred_cust_flag", "ss_ticket_number", "cnt"))


def q34_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[(dd["d_dom"].between(1, 3) | dd["d_dom"].between(25, 28)) &
            dd["d_year"].isin([1999, 2000, 2001])]
    st = t["store"][t["store"]["s_county"].isin(["Williamson County"])]
    hd = t["household_demographics"]
    hd = hd[hd["hd_buy_potential"].isin([">10000", "unknown"]) &
            (hd["hd_vehicle_count"] > 0) &
            (hd["hd_dep_count"] / hd["hd_vehicle_count"] > 1.2)]
    j = (t["store_sales"]
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk")
         .merge(hd, left_on="ss_hdemo_sk", right_on="hd_demo_sk"))
    g = j.groupby(["ss_ticket_number", "ss_customer_sk"]) \
        .size().reset_index(name="cnt")
    g = g[g["cnt"].between(15, 20)]
    g = g.merge(t["customer"], left_on="ss_customer_sk",
                right_on="c_customer_sk")
    return g[["c_last_name", "c_first_name", "c_salutation",
              "c_preferred_cust_flag", "ss_ticket_number", "cnt"]]


# ---------------------------------------------------------------------------
# q46: weekend baskets in Fairview/Midway bought away from the customer's
# current city (q46.sql) — customer_address joined twice (bought vs
# current), cross-dictionary string inequality.
# ---------------------------------------------------------------------------

_Q46_SORT = ["c_last_name", "c_first_name", "ca_city", "bought_city",
             "ss_ticket_number", "amt", "profit"]  # amt/profit = tiebreaks


def q46(s: Session) -> Frame:
    dt = s.table("date_dim").filter(
        col("d_dow").isin([6, 0]) &
        col("d_year").isin([1999, 2000, 2001]))
    st = s.table("store").filter(col("s_city").isin(["Fairview", "Midway"]))
    hd = s.table("household_demographics").filter(
        (col("hd_dep_count") == lit(4)) | (col("hd_vehicle_count") == lit(3)))
    dn = (s.table("store_sales")
          .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
          .join(st, ("ss_store_sk",), ("s_store_sk",))
          .join(hd, ("ss_hdemo_sk",), ("hd_demo_sk",))
          .join(s.table("customer_address"), ("ss_addr_sk",),
                ("ca_address_sk",))
          .groupby("ss_ticket_number", "ss_customer_sk", "ss_addr_sk",
                   "ca_city")
          .agg(amt=("sum", col("ss_coupon_amt")),
               profit=("sum", col("ss_net_profit")))
          .rename(ca_city="bought_city"))
    return (dn.join(s.table("customer"), ("ss_customer_sk",),
                    ("c_customer_sk",))
            .join(s.table("customer_address"), ("c_current_addr_sk",),
                  ("ca_address_sk",))
            .filter(col("ca_city") != col("bought_city"))
            .select("c_last_name", "c_first_name", "ca_city", "bought_city",
                    "ss_ticket_number", "amt", "profit")
            .sort(*[SortKey(k) for k in _Q46_SORT], limit=100))


def q46_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[dd["d_dow"].isin([6, 0]) & dd["d_year"].isin([1999, 2000, 2001])]
    st = t["store"][t["store"]["s_city"].isin(["Fairview", "Midway"])]
    hd = t["household_demographics"]
    hd = hd[(hd["hd_dep_count"] == 4) | (hd["hd_vehicle_count"] == 3)]
    j = (t["store_sales"]
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk")
         .merge(hd, left_on="ss_hdemo_sk", right_on="hd_demo_sk")
         .merge(t["customer_address"], left_on="ss_addr_sk",
                right_on="ca_address_sk"))
    dn = j.groupby(["ss_ticket_number", "ss_customer_sk", "ss_addr_sk",
                    "ca_city"]).agg(
        amt=("ss_coupon_amt", "sum"),
        profit=("ss_net_profit", "sum")).reset_index() \
        .rename(columns={"ca_city": "bought_city"})
    out = (dn.merge(t["customer"], left_on="ss_customer_sk",
                    right_on="c_customer_sk")
           .merge(t["customer_address"], left_on="c_current_addr_sk",
                  right_on="ca_address_sk"))
    out = out[out["ca_city"] != out["bought_city"]]
    return out.sort_values(_Q46_SORT, kind="stable").head(100)[
        ["c_last_name", "c_first_name", "ca_city", "bought_city",
         "ss_ticket_number", "amt", "profit"]]


# ---------------------------------------------------------------------------
# q48: global quantity sum over OR-of-AND demographic/address bands
# (q48.sql) — q13's shape without household_demographics.
# ---------------------------------------------------------------------------

def q48(s: Session) -> Frame:
    dt = s.table("date_dim").filter(col("d_year") == lit(2001))
    j = (s.table("store_sales")
         .join(s.table("store"), ("ss_store_sk",), ("s_store_sk",))
         .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
         .join(s.table("customer_demographics"), ("ss_cdemo_sk",),
               ("cd_demo_sk",))
         .join(s.table("customer_address"), ("ss_addr_sk",),
               ("ca_address_sk",)))
    demo = (((col("cd_marital_status") == lit("M")) &
             (col("cd_education_status") == lit("4 yr Degree")) &
             _between(col("ss_sales_price"), 100.00, 150.00)) |
            ((col("cd_marital_status") == lit("D")) &
             (col("cd_education_status") == lit("2 yr Degree")) &
             _between(col("ss_sales_price"), 50.00, 100.00)) |
            ((col("cd_marital_status") == lit("S")) &
             (col("cd_education_status") == lit("College")) &
             _between(col("ss_sales_price"), 150.00, 200.00)))
    addr = ((col("ca_country") == lit("United States")) &
            ((col("ca_state").isin(["CO", "OH", "TX"]) &
              _between(col("ss_net_profit"), 0, 2000)) |
             (col("ca_state").isin(["OR", "MN", "KY"]) &
              _between(col("ss_net_profit"), 150, 3000)) |
             (col("ca_state").isin(["VA", "CA", "MS"]) &
              _between(col("ss_net_profit"), 50, 25000))))
    return (j.filter(demo & addr).groupby()
            .agg(s1=("sum", col("ss_quantity"))))


def q48_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dt = t["date_dim"][t["date_dim"]["d_year"] == 2001]
    j = (t["store_sales"]
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk")
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(t["customer_demographics"], left_on="ss_cdemo_sk",
                right_on="cd_demo_sk")
         .merge(t["customer_address"], left_on="ss_addr_sk",
                right_on="ca_address_sk"))
    demo = (((j["cd_marital_status"] == "M") &
             (j["cd_education_status"] == "4 yr Degree") &
             j["ss_sales_price"].between(100.00, 150.00)) |
            ((j["cd_marital_status"] == "D") &
             (j["cd_education_status"] == "2 yr Degree") &
             j["ss_sales_price"].between(50.00, 100.00)) |
            ((j["cd_marital_status"] == "S") &
             (j["cd_education_status"] == "College") &
             j["ss_sales_price"].between(150.00, 200.00)))
    addr = ((j["ca_country"] == "United States") &
            ((j["ca_state"].isin(["CO", "OH", "TX"]) &
              j["ss_net_profit"].between(0, 2000)) |
             (j["ca_state"].isin(["OR", "MN", "KY"]) &
              j["ss_net_profit"].between(150, 3000)) |
             (j["ca_state"].isin(["VA", "CA", "MS"]) &
              j["ss_net_profit"].between(50, 25000))))
    j = j[demo & addr]
    return pd.DataFrame({"s1": [j["ss_quantity"].sum()
                                if len(j) else np.nan]})


# ---------------------------------------------------------------------------
# q50: return-latency buckets per store, August-2001 returns (q50.sql) —
# sales joined to their returns on (ticket, item, customer), two date_dim
# roles, CASE bucket sums over the sk day difference.
# ---------------------------------------------------------------------------

_Q50_STORE_COLS = ["s_store_name", "s_company_id", "s_street_number",
                   "s_street_name", "s_street_type", "s_suite_number",
                   "s_city", "s_county", "s_state", "s_zip"]
_Q50_BUCKETS = [("d30", None, 30), ("d31_60", 30, 60), ("d61_90", 60, 90),
                ("d91_120", 90, 120), ("d_over_120", 120, None)]


def q50(s: Session) -> Frame:
    d2 = (s.table("date_dim")
          .filter((col("d_year") == lit(2001)) & (col("d_moy") == lit(8)))
          .rename(d_date_sk="d2_date_sk"))
    j = (s.table("store_sales")
         .join(s.table("store_returns"),
               ("ss_ticket_number", "ss_item_sk", "ss_customer_sk"),
               ("sr_ticket_number", "sr_item_sk", "sr_customer_sk"))
         .join(d2, ("sr_returned_date_sk",), ("d2_date_sk",))
         .join(s.table("store"), ("ss_store_sk",), ("s_store_sk",)))
    lag = col("sr_returned_date_sk") - col("ss_sold_date_sk")
    aggs = {}
    for name, lo, hi in _Q50_BUCKETS:
        cond = lit(True)
        if lo is not None:
            cond = cond & (lag > lit(lo))
        if hi is not None:
            cond = cond & (lag <= lit(hi))
        aggs[name] = ("sum", when(cond, lit(1)).otherwise(lit(0)))
    return (j.groupby(*_Q50_STORE_COLS).agg(**aggs)
            .sort(*[SortKey(c) for c in _Q50_STORE_COLS], limit=100))


def q50_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    d2 = dd[(dd["d_year"] == 2001) & (dd["d_moy"] == 8)]
    j = (t["store_sales"]
         .merge(t["store_returns"],
                left_on=["ss_ticket_number", "ss_item_sk", "ss_customer_sk"],
                right_on=["sr_ticket_number", "sr_item_sk",
                          "sr_customer_sk"])
         .merge(d2, left_on="sr_returned_date_sk", right_on="d_date_sk")
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk"))
    lag = j["sr_returned_date_sk"] - j["ss_sold_date_sk"]
    for name, lo, hi in _Q50_BUCKETS:
        cond = pd.Series(True, index=j.index)
        if lo is not None:
            cond &= lag > lo
        if hi is not None:
            cond &= lag <= hi
        j[name] = cond.astype(np.int64)
    g = j.groupby(_Q50_STORE_COLS)[
        [b[0] for b in _Q50_BUCKETS]].sum().reset_index()
    return g.sort_values(_Q50_STORE_COLS, kind="stable").head(100)


QUERIES_STORE_1 = {
    "q13": (q13, q13_oracle),
    "q27": (q27, q27_oracle),
    "q34": (q34, q34_oracle),
    "q46": (q46, q46_oracle),
    "q48": (q48, q48_oracle),
    "q50": (q50, q50_oracle),
}
