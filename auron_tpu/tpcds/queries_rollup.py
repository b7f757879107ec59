"""Real TPC-DS rollup/window flagships + correlated-count q41.

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{36,41,67}.sql — verbatim predicates. ROLLUP(c1..cn) decomposes into its
n+1 grouping sets (Expand-style union with typed NULLs for aggregated-away
keys); grouping(x) arithmetic becomes literal columns per set; the window
rank then runs over the union exactly as Spark plans it.
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


def _null_like(example) -> object:
    """Typed NULL: an always-false CASE of the right dtype."""
    return when(lit(False), example).end()


def _between(c, lo, hi):
    return (c >= lit(lo)) & (c <= lit(hi))


# ---------------------------------------------------------------------------
# q67: top-100 sales rows per category over an 8-column ROLLUP (q67.sql) —
# 9 grouping sets, window rank partitioned by i_category (NULL category =
# the grand-total partition), rk <= 100.
# ---------------------------------------------------------------------------

_Q67_KEYS = ["i_category", "i_class", "i_brand", "i_product_name",
             "d_year", "d_qoy", "d_moy", "s_store_id"]
_Q67_NULL_EXAMPLES = {
    "i_category": lit(""), "i_class": lit(""), "i_brand": lit(""),
    "i_product_name": lit(""), "d_year": lit(0), "d_qoy": lit(0),
    "d_moy": lit(0), "s_store_id": lit("")}


def q67(s: Session) -> Frame:
    dt = s.table("date_dim").filter(_between(col("d_month_seq"), 1200,
                                            1200 + 11))
    j = (s.table("store_sales")
         .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
         .join(s.table("store"), ("ss_store_sk",), ("s_store_sk",))
         .join(s.table("item"), ("ss_item_sk",), ("i_item_sk",))
         .with_columns(sales=func("coalesce",
                                  col("ss_sales_price") * col("ss_quantity"),
                                  lit(0.0))))
    levels: List[Frame] = []
    for k in range(len(_Q67_KEYS), -1, -1):
        keys = _Q67_KEYS[:k]
        g = j.groupby(*keys).agg(sumsales=("sum", col("sales")))
        nulls = {c: _null_like(_Q67_NULL_EXAMPLES[c])
                 for c in _Q67_KEYS[k:]}
        if nulls:
            g = g.with_columns(**nulls)
        levels.append(g.select(*_Q67_KEYS, "sumsales"))
    u = levels[0]
    for lv in levels[1:]:
        u = u.union(lv)
    w = u.window(("i_category",),
                 (SortKey("sumsales", ascending=False),),
                 (WindowFunc("rk", "rank"),))
    return (w.filter(col("rk") <= lit(100))
            .sort(*[SortKey(c) for c in _Q67_KEYS],
                  SortKey("sumsales"), SortKey("rk"), limit=100))


def q67_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    dt = dd[dd["d_month_seq"].between(1200, 1200 + 11)]
    j = (t["store_sales"]
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(t["store"], left_on="ss_store_sk", right_on="s_store_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk"))
    j["sales"] = (j["ss_sales_price"] * j["ss_quantity"]).fillna(0.0)
    parts = []
    for k in range(len(_Q67_KEYS), -1, -1):
        keys = _Q67_KEYS[:k]
        if keys:
            g = j.groupby(keys, dropna=False)["sales"].sum() \
                .reset_index(name="sumsales")
        else:
            g = pd.DataFrame({"sumsales": [j["sales"].sum()]})
        for c in _Q67_KEYS[k:]:
            g[c] = None
        parts.append(g[_Q67_KEYS + ["sumsales"]])
    u = pd.concat(parts, ignore_index=True)
    u["rk"] = u.groupby("i_category", dropna=False)["sumsales"] \
        .rank(method="min", ascending=False).astype(np.int64)
    u = u[u["rk"] <= 100]
    return u.sort_values(_Q67_KEYS + ["sumsales", "rk"],
                         na_position="first", kind="stable").head(100)


# ---------------------------------------------------------------------------
# q36: gross-margin rank within ROLLUP(i_category, i_class) (q36.sql) —
# grouping() arithmetic as per-set literals; rank partitions on
# (lochierarchy, CASE WHEN grouping(i_class)=0 THEN i_category END).
# ---------------------------------------------------------------------------

def q36(s: Session) -> Frame:
    dt = s.table("date_dim").filter(col("d_year") == lit(2001))
    st = s.table("store").filter(col("s_state").isin(["TN"]))
    j = (s.table("store_sales")
         .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
         .join(s.table("item"), ("ss_item_sk",), ("i_item_sk",))
         .join(st, ("ss_store_sk",), ("s_store_sk",)))

    def level(keys, loc):
        g = (j.groupby(*keys)
             .agg(np_=("sum", col("ss_net_profit")),
                  sp=("sum", col("ss_ext_sales_price"))))
        nulls = {}
        if "i_category" not in keys:
            nulls["i_category"] = _null_like(lit(""))
        if "i_class" not in keys:
            nulls["i_class"] = _null_like(lit(""))
        g = g.with_columns(
            gross_margin=col("np_") / col("sp"),
            lochierarchy=lit(loc),
            # the rank partition key: category for leaf rows, NULL above
            part_cat=(col("i_category") if loc == 0 else
                      _null_like(lit(""))),
            **nulls)
        return g.select("i_category", "i_class", "gross_margin",
                        "lochierarchy", "part_cat")

    u = (level(("i_category", "i_class"), 0)
         .union(level(("i_category",), 1))
         .union(level((), 2)))
    w = u.window(("lochierarchy", "part_cat"),
                 (SortKey("gross_margin"),),
                 (WindowFunc("rank_within_parent", "rank"),))
    return (w.select("gross_margin", "i_category", "i_class",
                     "lochierarchy", "rank_within_parent")
            .sort(SortKey("lochierarchy", ascending=False),
                  SortKey("i_category"),
                  SortKey("rank_within_parent"), SortKey("i_class"),
                  SortKey("gross_margin"), limit=100))


def q36_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dt = t["date_dim"][t["date_dim"]["d_year"] == 2001]
    st = t["store"][t["store"]["s_state"].isin(["TN"])]
    j = (t["store_sales"]
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk"))
    parts = []
    for keys, loc in ((["i_category", "i_class"], 0), (["i_category"], 1),
                      ([], 2)):
        if keys:
            g = j.groupby(keys).agg(np_=("ss_net_profit", "sum"),
                                    sp=("ss_ext_sales_price",
                                        "sum")).reset_index()
        else:
            g = pd.DataFrame({"np_": [j["ss_net_profit"].sum()],
                              "sp": [j["ss_ext_sales_price"].sum()]})
        g["gross_margin"] = g["np_"] / g["sp"]
        g["lochierarchy"] = loc
        g["part_cat"] = g["i_category"] if loc == 0 else None
        for c in ("i_category", "i_class"):
            if c not in g.columns:
                g[c] = None
        parts.append(g[["i_category", "i_class", "gross_margin",
                        "lochierarchy", "part_cat"]])
    u = pd.concat(parts, ignore_index=True)
    # NULL margins (empty slice at tiny sf) rank first, like the engine's
    # nulls-first ascending sort
    u["rank_within_parent"] = u.groupby(
        ["lochierarchy", "part_cat"], dropna=False)["gross_margin"] \
        .rank(method="min", na_option="top").astype(np.int64)
    return u.sort_values(
        ["lochierarchy", "i_category", "rank_within_parent", "i_class",
         "gross_margin"],
        ascending=[False, True, True, True, True],
        na_position="first", kind="stable").head(100)[
        ["gross_margin", "i_category", "i_class", "lochierarchy",
         "rank_within_parent"]]


# ---------------------------------------------------------------------------
# q41: product names of manufacturers that make at least one item in the
# color/unit/size matrix (q41.sql) — the correlated count(*) > 0 subquery
# decorrelates to a semi join on i_manufact, exactly as Spark plans it.
# ---------------------------------------------------------------------------

def _q41_matrix():
    def band(cat, colors, units, sizes):
        return ((col("i_category") == lit(cat)) &
                col("i_color").isin(colors) &
                col("i_units").isin(units) &
                col("i_size").isin(sizes))
    m1 = (band("Women", ["powder", "khaki"], ["Ounce", "Oz"],
               ["medium", "extra large"]) |
          band("Women", ["brown", "honeydew"], ["Bunch", "Ton"],
               ["N/A", "small"]) |
          band("Men", ["floral", "deep"], ["N/A", "Dozen"],
               ["petite", "large"]) |
          band("Men", ["light", "cornflower"], ["Box", "Pound"],
               ["medium", "extra large"]))
    m2 = (band("Women", ["midnight", "snow"], ["Pallet", "Gross"],
               ["medium", "extra large"]) |
          band("Women", ["cyan", "papaya"], ["Cup", "Dram"],
               ["N/A", "small"]) |
          band("Men", ["orange", "frosted"], ["Each", "Tbl"],
               ["petite", "large"]) |
          band("Men", ["forest", "ghost"], ["Lb", "Bundle"],
               ["medium", "extra large"]))
    return m1 | m2


def q41(s: Session) -> Frame:
    matching = (s.table("item").filter(_q41_matrix())
                .select(mm=col("i_manufact")))
    return (s.table("item")
            .filter(_between(col("i_manufact_id"), 738, 738 + 40))
            .join(matching, ("i_manufact",), ("mm",), how="left_semi")
            .select("i_product_name").distinct()
            .sort(SortKey("i_product_name"), limit=100))


def q41_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    it = t["item"]

    def band(cat, colors, units, sizes):
        return ((it["i_category"] == cat) & it["i_color"].isin(colors) &
                it["i_units"].isin(units) & it["i_size"].isin(sizes))
    m = (band("Women", ["powder", "khaki"], ["Ounce", "Oz"],
              ["medium", "extra large"]) |
         band("Women", ["brown", "honeydew"], ["Bunch", "Ton"],
              ["N/A", "small"]) |
         band("Men", ["floral", "deep"], ["N/A", "Dozen"],
              ["petite", "large"]) |
         band("Men", ["light", "cornflower"], ["Box", "Pound"],
              ["medium", "extra large"]) |
         band("Women", ["midnight", "snow"], ["Pallet", "Gross"],
              ["medium", "extra large"]) |
         band("Women", ["cyan", "papaya"], ["Cup", "Dram"],
              ["N/A", "small"]) |
         band("Men", ["orange", "frosted"], ["Each", "Tbl"],
              ["petite", "large"]) |
         band("Men", ["forest", "ghost"], ["Lb", "Bundle"],
              ["medium", "extra large"]))
    manufacts = set(it[m]["i_manufact"])
    sel = it[it["i_manufact_id"].between(738, 778) &
             it["i_manufact"].isin(manufacts)]
    out = sel[["i_product_name"]].drop_duplicates()
    return out.sort_values("i_product_name", kind="stable").head(100)


QUERIES_ROLLUP = {
    "q36": (q36, q36_oracle),
    "q41": (q41, q41_oracle),
    "q67": (q67, q67_oracle),
}
