"""Real TPC-DS window-deviation + set-operation queries as Frames.

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{38,44,53,63,89}.sql — verbatim predicates (including dsdgen's
'refernece'/'birdal' typos). INTERSECT decomposes into joins of DISTINCT
sets; the whole-partition avg window rides WindowFunc(cumulative=False);
q44's HAVING-vs-scalar-subquery uses as_scalar_expr (the null-addr slice
is real: ss_addr_sk is nullable in the datagen, as in dsdgen).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

from auron_tpu.expr.nodes import col, lit, when
from auron_tpu.ops.sort import SortKey
from auron_tpu.ops.window import WindowFunc
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame


def _between(c, lo, hi):
    return (c >= lit(lo)) & (c <= lit(hi))


# ---------------------------------------------------------------------------
# q38: customers active in ALL THREE channels in year 2000 (q38.sql) —
# INTERSECT of three DISTINCT (last, first, d_date) sets, then count(*).
# ---------------------------------------------------------------------------

def _q38_channel(s, table, date_col, cust_col, suffix):
    dt = s.table("date_dim").filter(_between(col("d_month_seq"), 1200,
                                            1200 + 11))
    f = (s.table(table)
         .join(dt, (date_col,), ("d_date_sk",))
         .join(s.table("customer"), (cust_col,), ("c_customer_sk",))
         .select("c_last_name", "c_first_name", "d_date")
         .distinct())
    if suffix:
        return f.rename(**{"c_last_name": f"ln{suffix}",
                           "c_first_name": f"fn{suffix}",
                           "d_date": f"dd{suffix}"})
    return f


def q38(s: Session) -> Frame:
    a = _q38_channel(s, "store_sales", "ss_sold_date_sk", "ss_customer_sk",
                     "")
    b = _q38_channel(s, "catalog_sales", "cs_sold_date_sk",
                     "cs_bill_customer_sk", "2")
    c = _q38_channel(s, "web_sales", "ws_sold_date_sk",
                     "ws_bill_customer_sk", "3")
    # joins of DISTINCT sets ARE the intersection
    inter = (a.join(b, ("c_last_name", "c_first_name", "d_date"),
                    ("ln2", "fn2", "dd2"))
             .join(c, ("c_last_name", "c_first_name", "d_date"),
                   ("ln3", "fn3", "dd3")))
    return inter.groupby().agg(cnt=("count_star", None))


def q38_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[dd["d_month_seq"].between(1200, 1200 + 11)]

    def chan(table, date_col, cust_col):
        j = (t[table]
             .merge(dt, left_on=date_col, right_on="d_date_sk")
             .merge(t["customer"], left_on=cust_col,
                    right_on="c_customer_sk"))
        return set(map(tuple, j[["c_last_name", "c_first_name",
                                 "d_date"]].drop_duplicates().to_numpy()))
    inter = (chan("store_sales", "ss_sold_date_sk", "ss_customer_sk") &
             chan("catalog_sales", "cs_sold_date_sk",
                  "cs_bill_customer_sk") &
             chan("web_sales", "ws_sold_date_sk", "ws_bill_customer_sk"))
    return pd.DataFrame({"cnt": [len(inter)]})


# ---------------------------------------------------------------------------
# q44: best vs worst performing items at store 4 by average net profit,
# paired by rank (q44.sql). The HAVING threshold is 0.9x the average over
# the NULL-address slice — a real slice (ss_addr_sk is nullable).
# ---------------------------------------------------------------------------

def _q44_ranked(s: Session, ascending: bool) -> Frame:
    base = s.table("store_sales").filter(col("ss_store_sk") == lit(4))
    null_slice = (s.table("store_sales")
                  .filter((col("ss_store_sk") == lit(4)) &
                          col("ss_addr_sk").is_null())
                  .groupby("ss_store_sk")
                  .agg(rank_col=("avg", col("ss_net_profit")))
                  .select("rank_col"))
    thresh = null_slice.as_scalar_expr()
    v1 = (base.groupby("ss_item_sk")
          .agg(rank_col=("avg", col("ss_net_profit")))
          .filter(col("rank_col") > lit(0.9) * thresh))
    # ORDER BY rank_col alone: tied averages share a rank (SQL rank())
    ranked = v1.window((), (SortKey("rank_col", ascending=ascending),),
                       (WindowFunc("rnk", "rank"),))
    return ranked.filter(col("rnk") < lit(11))


def q44(s: Session) -> Frame:
    asc = (_q44_ranked(s, True)
           .rename(ss_item_sk="a_item", rnk="rnk", rank_col="a_rc"))
    desc = (_q44_ranked(s, False)
            .rename(ss_item_sk="d_item", rnk="d_rnk", rank_col="d_rc"))
    i1 = s.table("item").select(i1_sk=col("i_item_sk"),
                                best_performing=col("i_product_name"))
    i2 = s.table("item").select(i2_sk=col("i_item_sk"),
                                worst_performing=col("i_product_name"))
    return (asc.join(desc, ("rnk",), ("d_rnk",))
            .join(i1, ("a_item",), ("i1_sk",))
            .join(i2, ("d_item",), ("i2_sk",))
            .select("rnk", "best_performing", "worst_performing")
            .sort(SortKey("rnk"), SortKey("best_performing"),
                  SortKey("worst_performing"), limit=100))


def q44_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    ss = t["store_sales"]
    base = ss[ss["ss_store_sk"] == 4]
    null_slice = base[base["ss_addr_sk"].isna()]
    if len(null_slice) == 0:
        return pd.DataFrame({"rnk": [], "best_performing": [],
                             "worst_performing": []})
    thresh = 0.9 * null_slice["ss_net_profit"].mean()
    v1 = base.groupby("ss_item_sk")["ss_net_profit"].mean() \
        .reset_index(name="rank_col")
    v1 = v1[v1["rank_col"] > thresh]

    def ranked(asc):
        r = v1.sort_values(["rank_col", "ss_item_sk"],
                           ascending=[asc, True], kind="stable").copy()
        r["rnk"] = r["rank_col"].rank(method="min",
                                      ascending=asc).astype(np.int64)
        return r[r["rnk"] < 11]
    a = ranked(True).rename(columns={"ss_item_sk": "a_item"})
    d = ranked(False).rename(columns={"ss_item_sk": "d_item",
                                      "rnk": "d_rnk"})
    it = t["item"][["i_item_sk", "i_product_name"]]
    out = (a.merge(d, left_on="rnk", right_on="d_rnk")
           .merge(it.rename(columns={"i_product_name": "best_performing"}),
                  left_on="a_item", right_on="i_item_sk")
           .merge(it.rename(columns={"i_product_name": "worst_performing"}),
                  left_on="d_item", right_on="i_item_sk"))
    return out.sort_values(["rnk", "best_performing", "worst_performing"],
                           kind="stable").head(100)[
        ["rnk", "best_performing", "worst_performing"]]


# ---------------------------------------------------------------------------
# q53 / q63 / q89: monthly/quarterly sums vs whole-partition average, with
# the 10%-deviation CASE filter (the brand/class matrix is verbatim; the
# datagen's pools include those literal names).
# ---------------------------------------------------------------------------

# q53.sql spells 'reference' correctly; q63.sql carries the TPC-DS spec's
# 'refernece' typo — they are DIFFERENT item filters. Sharing one matrix
# for both was a latent oracle bug caught by the sqlite3 independent
# oracle at sf=0.5 (engine-vs-pandas never saw it: both sides shared the
# misreading, and at sf=0.2 the affected classes were empty).
def _matrix_5363(ref_spelling: str):
    return (
        (col("i_category").isin(["Books", "Children", "Electronics"]) &
         col("i_class").isin(["personal", "portable", ref_spelling,
                              "self-help"]) &
         col("i_brand").isin(["scholaramalgamalg #14",
                              "scholaramalgamalg #7",
                              "exportiunivamalg #9",
                              "scholaramalgamalg #9"])) |
        (col("i_category").isin(["Women", "Music", "Men"]) &
         col("i_class").isin(["accessories", "classical", "fragrances",
                              "pants"]) &
         col("i_brand").isin(["amalgimporto #1", "edu packscholar #1",
                              "exportiimporto #1", "importoamalg #1"])))


def _matrix_5363_pd(it, ref_spelling: str):
    return ((it["i_category"].isin(["Books", "Children", "Electronics"]) &
             it["i_class"].isin(["personal", "portable", ref_spelling,
                                 "self-help"]) &
             it["i_brand"].isin(["scholaramalgamalg #14",
                                 "scholaramalgamalg #7",
                                 "exportiunivamalg #9",
                                 "scholaramalgamalg #9"])) |
            (it["i_category"].isin(["Women", "Music", "Men"]) &
             it["i_class"].isin(["accessories", "classical", "fragrances",
                                 "pants"]) &
             it["i_brand"].isin(["amalgimporto #1", "edu packscholar #1",
                                 "exportiimporto #1", "importoamalg #1"])))


def _q63_like(s: Session, group_key: str, time_key: str,
              avg_name: str, ref_spelling: str) -> Frame:
    dt = s.table("date_dim").filter(
        col("d_month_seq").isin(list(range(1200, 1212))))
    it = s.table("item").filter(_matrix_5363(ref_spelling))
    j = (s.table("store_sales")
         .join(it, ("ss_item_sk",), ("i_item_sk",))
         .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
         .join(s.table("store"), ("ss_store_sk",), ("s_store_sk",)))
    g = (j.groupby(group_key, time_key)
         .agg(sum_sales=("sum", col("ss_sales_price"))))
    w = g.window((group_key,), (SortKey(time_key),),
                 (WindowFunc(avg_name, "avg", input="sum_sales",
                             cumulative=False),))
    dev = when(col(avg_name) > lit(0.0),
               func_abs(col("sum_sales") - col(avg_name)) /
               col(avg_name)).end()
    return (w.filter(dev > lit(0.1))
            .select(group_key, "sum_sales", avg_name)
            .sort(SortKey(avg_name), SortKey("sum_sales"),
                  SortKey(group_key), limit=100))


def func_abs(e):
    from auron_tpu.expr.nodes import func
    return func("abs", e)


def q63(s: Session) -> Frame:
    return _q63_like(s, "i_manager_id", "d_moy", "avg_monthly_sales",
                     "refernece")  # q63.sql keeps the spec typo


def q53(s: Session) -> Frame:
    return _q63_like(s, "i_manufact_id", "d_qoy", "avg_quarterly_sales",
                     "reference")


def _q63_like_oracle(t, group_key, time_key, avg_name, ref_spelling):
    dd = t["date_dim"]
    dt = dd[dd["d_month_seq"].between(1200, 1211)]
    it = t["item"][_matrix_5363_pd(t["item"], ref_spelling)]
    j = (t["store_sales"]
         .merge(it, left_on="ss_item_sk", right_on="i_item_sk")
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk"))
    g = j.groupby([group_key, time_key]).agg(
        sum_sales=("ss_sales_price", "sum")).reset_index()
    g[avg_name] = g.groupby(group_key)["sum_sales"].transform("mean")
    dev = np.where(g[avg_name] > 0,
                   np.abs(g["sum_sales"] - g[avg_name]) / g[avg_name],
                   np.nan)
    g = g[dev > 0.1]
    return g.sort_values([avg_name, "sum_sales", group_key],
                         kind="stable").head(100)[
        [group_key, "sum_sales", avg_name]]


def q63_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    return _q63_like_oracle(t, "i_manager_id", "d_moy",
                            "avg_monthly_sales", "refernece")


def q53_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    return _q63_like_oracle(t, "i_manufact_id", "d_qoy",
                            "avg_quarterly_sales", "reference")


_Q89_KEYS = ["i_category", "i_class", "i_brand", "s_store_name",
             "s_company_name"]


def q89(s: Session) -> Frame:
    dt = s.table("date_dim").filter(col("d_year").isin([1999]))
    it = s.table("item").filter(
        (col("i_category").isin(["Books", "Electronics", "Sports"]) &
         col("i_class").isin(["computers", "stereo", "football"])) |
        (col("i_category").isin(["Men", "Jewelry", "Women"]) &
         col("i_class").isin(["shirts", "birdal", "dresses"])))
    j = (s.table("store_sales")
         .join(it, ("ss_item_sk",), ("i_item_sk",))
         .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
         .join(s.table("store"), ("ss_store_sk",), ("s_store_sk",)))
    g = (j.groupby(*_Q89_KEYS, "d_moy")
         .agg(sum_sales=("sum", col("ss_sales_price"))))
    w = g.window(("i_category", "i_brand", "s_store_name",
                  "s_company_name"), (SortKey("d_moy"),),
                 (WindowFunc("avg_monthly_sales", "avg",
                             input="sum_sales", cumulative=False),))
    dev = when(col("avg_monthly_sales") != lit(0.0),
               func_abs(col("sum_sales") - col("avg_monthly_sales")) /
               col("avg_monthly_sales")).end()
    return (w.filter(dev > lit(0.1))
            .with_columns(delta=col("sum_sales") -
                          col("avg_monthly_sales"))
            .sort(SortKey("delta"), SortKey("s_store_name"),
                  SortKey("i_brand"), SortKey("i_class"), SortKey("d_moy"),
                  limit=100)
            .select(*_Q89_KEYS, "d_moy", "sum_sales",
                    "avg_monthly_sales"))


def q89_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    it = t["item"]
    it = it[(it["i_category"].isin(["Books", "Electronics", "Sports"]) &
             it["i_class"].isin(["computers", "stereo", "football"])) |
            (it["i_category"].isin(["Men", "Jewelry", "Women"]) &
             it["i_class"].isin(["shirts", "birdal", "dresses"]))]
    dt = t["date_dim"][t["date_dim"]["d_year"].isin([1999])]
    j = (t["store_sales"]
         .merge(it, left_on="ss_item_sk", right_on="i_item_sk")
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk"))
    g = j.groupby(_Q89_KEYS + ["d_moy"]).agg(
        sum_sales=("ss_sales_price", "sum")).reset_index()
    g["avg_monthly_sales"] = g.groupby(
        ["i_category", "i_brand", "s_store_name",
         "s_company_name"])["sum_sales"].transform("mean")
    dev = np.where(g["avg_monthly_sales"] != 0,
                   np.abs(g["sum_sales"] - g["avg_monthly_sales"]) /
                   g["avg_monthly_sales"], np.nan)
    g = g[dev > 0.1].copy()
    g["delta"] = g["sum_sales"] - g["avg_monthly_sales"]
    return g.sort_values(["delta", "s_store_name", "i_brand", "i_class",
                          "d_moy"], kind="stable").head(100)[
        _Q89_KEYS + ["d_moy", "sum_sales", "avg_monthly_sales"]]


QUERIES_WINDOW = {
    "q38": (q38, q38_oracle),
    "q44": (q44, q44_oracle),
    "q53": (q53, q53_oracle),
    "q63": (q63, q63_oracle),
    "q89": (q89, q89_oracle),
}
