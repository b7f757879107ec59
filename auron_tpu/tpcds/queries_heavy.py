"""Real TPC-DS heavyweight queries (q23a/b, q24a/b, q72).

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{23a,23b,24a,24b,72}.sql — ported verbatim. The HAVING-vs-scalar
thresholds (q23's 50% of max customer sales, q24's 5% of average
netpaid) stay traced via Frame.as_scalar_expr; q72's d1/d2 week
equality folds into the inventory join key and its d3 date arithmetic
rides the d_date ↔ d_date_sk bijection (+5 days = +5 sks).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

from auron_tpu.expr.nodes import col, func, lit, when
from auron_tpu.ops.sort import SortKey
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame


_YEARS_23 = [2000, 2001, 2002, 2003]


# ---------------------------------------------------------------------------
# q23a/b: catalog+web February 2000 revenue from the best store customers
# (top half by lifetime sales) buying frequently-sold items (q23a.sql /
# q23b.sql).
# ---------------------------------------------------------------------------

def _q23_frequent(s: Session) -> Frame:
    dt = s.table("date_dim").filter(col("d_year").isin(_YEARS_23))
    return (s.table("store_sales")
            .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
            .join(s.table("item"), ("ss_item_sk",), ("i_item_sk",))
            .with_columns(itemdesc=func("substring", col("i_item_desc"),
                                        params=(1, 30)))
            .groupby("itemdesc", "i_item_sk", "d_date")
            .agg(cnt=("count_star", None))
            .filter(col("cnt") > lit(4))
            .select(item_sk=col("i_item_sk")))


def _q23_best(s: Session) -> Frame:
    dt = s.table("date_dim").filter(col("d_year").isin(_YEARS_23))
    sales_expr = col("ss_quantity") * col("ss_sales_price")
    cmax = (s.table("store_sales")
            .join(s.table("customer"), ("ss_customer_sk",),
                  ("c_customer_sk",))
            .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
            .groupby("c_customer_sk")
            .agg(csales=("sum", sales_expr))
            .groupby()
            .agg(tpcds_cmax=("max", col("csales")))
            .as_scalar_expr())
    return (s.table("store_sales")
            .join(s.table("customer"), ("ss_customer_sk",),
                  ("c_customer_sk",))
            .groupby("c_customer_sk")
            .agg(ssales=("sum", sales_expr))
            .filter(col("ssales") > lit(0.5) * cmax)
            .select(bc=col("c_customer_sk")))


def _q23_channel(s: Session, table: str, date_col: str, item_col: str,
                 cust_col: str, qty: str, price: str, freq: Frame,
                 best: Frame, names: bool) -> Frame:
    dt = s.table("date_dim").filter(
        (col("d_year") == lit(2000)) & (col("d_moy") == lit(2)))
    f = (s.table(table)
         .join(dt, (date_col,), ("d_date_sk",))
         .join(freq, (item_col,), ("item_sk",), how="left_semi")
         .join(best, (cust_col,), ("bc",), how="left_semi"))
    if not names:
        return f.select(sales=col(qty) * col(price))
    return (f.join(s.table("customer"), (cust_col,), ("c_customer_sk",))
            .groupby("c_last_name", "c_first_name")
            .agg(sales=("sum", col(qty) * col(price))))


def q23a(s: Session) -> Frame:
    freq, best = _q23_frequent(s), _q23_best(s)
    cs = _q23_channel(s, "catalog_sales", "cs_sold_date_sk",
                      "cs_item_sk", "cs_bill_customer_sk", "cs_quantity",
                      "cs_list_price", freq, best, False)
    ws = _q23_channel(s, "web_sales", "ws_sold_date_sk", "ws_item_sk",
                      "ws_bill_customer_sk", "ws_quantity",
                      "ws_list_price", freq, best, False)
    return cs.union(ws).groupby().agg(total=("sum", col("sales")))


def q23b(s: Session) -> Frame:
    freq, best = _q23_frequent(s), _q23_best(s)
    cs = _q23_channel(s, "catalog_sales", "cs_sold_date_sk",
                      "cs_item_sk", "cs_bill_customer_sk", "cs_quantity",
                      "cs_list_price", freq, best, True)
    ws = _q23_channel(s, "web_sales", "ws_sold_date_sk", "ws_item_sk",
                      "ws_bill_customer_sk", "ws_quantity",
                      "ws_list_price", freq, best, True)
    return (cs.union(ws)
            .sort(SortKey("c_last_name"), SortKey("c_first_name"),
                  SortKey("sales"), limit=100))


def _q23_sets_oracle(t):
    dd = t["date_dim"]
    dt = dd[dd["d_year"].isin(_YEARS_23)]
    j = (t["store_sales"]
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk"))
    j = j.assign(itemdesc=j["i_item_desc"].str[:30])
    g = j.groupby(["itemdesc", "i_item_sk", "d_date"]).size()
    freq = set(g[g > 4].reset_index()["i_item_sk"])
    ss = t["store_sales"].merge(t["customer"], left_on="ss_customer_sk",
                                right_on="c_customer_sk")
    ss = ss.assign(v=ss["ss_quantity"] * ss["ss_sales_price"])
    in_years = ss[ss["ss_sold_date_sk"].isin(set(dt["d_date_sk"]))]
    cmax = in_years.groupby("c_customer_sk")["v"].sum().max()
    lifetime = ss.groupby("c_customer_sk")["v"].sum()
    best = set(lifetime[lifetime > 0.5 * cmax].index)
    return freq, best


def _q23_channel_oracle(t, table, date_col, item_col, cust_col, qty,
                        price, freq, best):
    dd = t["date_dim"]
    dt = dd[(dd["d_year"] == 2000) & (dd["d_moy"] == 2)]
    f = t[table].merge(dt, left_on=date_col, right_on="d_date_sk")
    f = f[f[item_col].isin(freq) & f[cust_col].isin(best)]
    return f.assign(sales=f[qty] * f[price])


def q23a_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    freq, best = _q23_sets_oracle(t)
    cs = _q23_channel_oracle(t, "catalog_sales", "cs_sold_date_sk",
                             "cs_item_sk", "cs_bill_customer_sk",
                             "cs_quantity", "cs_list_price", freq, best)
    ws = _q23_channel_oracle(t, "web_sales", "ws_sold_date_sk",
                             "ws_item_sk", "ws_bill_customer_sk",
                             "ws_quantity", "ws_list_price", freq, best)
    tot = cs["sales"].sum() + ws["sales"].sum()
    empty = len(cs) + len(ws) == 0
    return pd.DataFrame({"total": [np.nan if empty else tot]})


def q23b_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    freq, best = _q23_sets_oracle(t)
    parts = []
    for args in (("catalog_sales", "cs_sold_date_sk", "cs_item_sk",
                  "cs_bill_customer_sk", "cs_quantity", "cs_list_price"),
                 ("web_sales", "ws_sold_date_sk", "ws_item_sk",
                  "ws_bill_customer_sk", "ws_quantity",
                  "ws_list_price")):
        f = _q23_channel_oracle(t, *args, freq, best)
        f = f.merge(t["customer"], left_on=args[3],
                    right_on="c_customer_sk")
        parts.append(f.groupby(["c_last_name", "c_first_name"]).agg(
            sales=("sales", "sum")).reset_index())
    u = pd.concat(parts, ignore_index=True)
    return u.sort_values(["c_last_name", "c_first_name", "sales"],
                         kind="stable").head(100)


# ---------------------------------------------------------------------------
# q24a/b: per-customer netpaid by store for one color, among market-8
# store purchases that were returned, where the customer's birth country
# matches the store-zip address country (q24a.sql / q24b.sql). The two
# variants differ only in the color literal.
# ---------------------------------------------------------------------------

_Q24_KEYS = ("c_last_name", "c_first_name", "s_store_name", "ca_state",
             "s_state", "i_color", "i_current_price", "i_manager_id",
             "i_units", "i_size")


def _q24_ssales(s: Session) -> Frame:
    st = s.table("store").filter(col("s_market_id") == lit(8))
    ca = s.table("customer_address").with_columns(
        uc=func("upper", col("ca_country")))
    j = (s.table("store_sales")
         .join(s.table("store_returns"),
               ("ss_ticket_number", "ss_item_sk"),
               ("sr_ticket_number", "sr_item_sk"))
         .join(s.table("customer"), ("ss_customer_sk",),
               ("c_customer_sk",))
         .join(s.table("item"), ("ss_item_sk",), ("i_item_sk",))
         .join(st, ("ss_store_sk",), ("s_store_sk",))
         .join(ca, ("c_birth_country", "s_zip"), ("uc", "ca_zip")))
    return (j.groupby(*_Q24_KEYS)
            .agg(netpaid=("sum", col("ss_net_paid"))))


def _q24(s: Session, color: str) -> Frame:
    ssales = _q24_ssales(s)
    thresh = (ssales.groupby()
              .agg(a=("avg", col("netpaid")))
              .select(v=col("a") * lit(0.05))
              .as_scalar_expr())
    return (ssales.filter(col("i_color") == lit(color))
            .groupby("c_last_name", "c_first_name", "s_store_name")
            .agg(paid=("sum", col("netpaid")))
            .filter(col("paid") > thresh)
            .sort(SortKey("c_last_name"), SortKey("c_first_name"),
                  SortKey("s_store_name")))


def q24a(s: Session) -> Frame:
    return _q24(s, "pale")


def q24b(s: Session) -> Frame:
    return _q24(s, "chiffon")


def _q24_ssales_oracle(t):
    st = t["store"]
    st = st[st["s_market_id"] == 8]
    ca = t["customer_address"].copy()
    ca["uc"] = ca["ca_country"].str.upper()
    j = (t["store_sales"]
         .merge(t["store_returns"],
                left_on=["ss_ticket_number", "ss_item_sk"],
                right_on=["sr_ticket_number", "sr_item_sk"])
         .merge(t["customer"], left_on="ss_customer_sk",
                right_on="c_customer_sk")
         .merge(t["item"], left_on="ss_item_sk", right_on="i_item_sk")
         .merge(st, left_on="ss_store_sk", right_on="s_store_sk")
         .merge(ca, left_on=["c_birth_country", "s_zip"],
                right_on=["uc", "ca_zip"]))
    return j.groupby(list(_Q24_KEYS)).agg(
        netpaid=("ss_net_paid", "sum")).reset_index()


def _q24_oracle(t, color):
    ssales = _q24_ssales_oracle(t)
    thresh = 0.05 * ssales["netpaid"].mean()
    f = ssales[ssales["i_color"] == color]
    g = f.groupby(["c_last_name", "c_first_name", "s_store_name"]).agg(
        paid=("netpaid", "sum")).reset_index()
    g = g[g["paid"] > thresh]
    return g.sort_values(["c_last_name", "c_first_name",
                          "s_store_name"], kind="stable")


def q24a_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    return _q24_oracle(t, "pale")


def q24b_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    return _q24_oracle(t, "chiffon")


# ---------------------------------------------------------------------------
# q72: catalog orders promised in a week the warehouse was short,
# shipped >5 days after the sale, for demanding demographics (q72.sql).
# The two count(CASE ...) columns count never-null expressions — they
# equal total_cnt, exactly as the literal SQL computes.
# ---------------------------------------------------------------------------

def q72(s: Session) -> Frame:
    d1 = (s.table("date_dim").filter(col("d_year") == lit(1999))
          .select(d1_sk=col("d_date_sk"), d_week_seq=col("d_week_seq")))
    d2 = s.table("date_dim").select(d2_sk=col("d_date_sk"),
                                    wk2=col("d_week_seq"))
    d3 = s.table("date_dim").select(d3_sk=col("d_date_sk"))
    cd = s.table("customer_demographics").filter(
        col("cd_marital_status") == lit("D"))
    hd = s.table("household_demographics").filter(
        col("hd_buy_potential") == lit(">10000"))
    inv = (s.table("inventory")
           .join(d2, ("inv_date_sk",), ("d2_sk",))
           .select(ii=col("inv_item_sk"), iw=col("inv_warehouse_sk"),
                   iq=col("inv_quantity_on_hand"), wk2=col("wk2")))
    promo = s.table("promotion").select(p_promo_sk=col("p_promo_sk"))
    cr = s.table("catalog_returns").select(cri=col("cr_item_sk"),
                                           cro=col("cr_order_number"))
    j = (s.table("catalog_sales")
         .join(d1, ("cs_sold_date_sk",), ("d1_sk",))
         .join(inv, ("cs_item_sk", "d_week_seq"), ("ii", "wk2"))
         .filter(col("iq") < col("cs_quantity"))
         .join(s.table("warehouse"), ("iw",), ("w_warehouse_sk",))
         .join(s.table("item"), ("cs_item_sk",), ("i_item_sk",))
         .join(cd, ("cs_bill_cdemo_sk",), ("cd_demo_sk",))
         .join(hd, ("cs_bill_hdemo_sk",), ("hd_demo_sk",))
         .join(d3, ("cs_ship_date_sk",), ("d3_sk",))
         .filter(col("cs_ship_date_sk") >
                 col("cs_sold_date_sk") + lit(5))
         .join(promo, ("cs_promo_sk",), ("p_promo_sk",), how="left")
         .join(cr, ("cs_item_sk", "cs_order_number"), ("cri", "cro"),
               how="left"))
    no_promo = when(col("p_promo_sk").is_null(),
                    lit(1)).otherwise(lit(0))
    has_promo = when(col("p_promo_sk").is_not_null(),
                     lit(1)).otherwise(lit(0))
    return (j.groupby("i_item_desc", "w_warehouse_name", "d_week_seq")
            .agg(no_promo=("count", no_promo),
                 promo=("count", has_promo),
                 total_cnt=("count_star", None))
            .sort(SortKey("total_cnt", ascending=False),
                  SortKey("i_item_desc"), SortKey("w_warehouse_name"),
                  SortKey("d_week_seq"), limit=100))


def q72_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    dd = t["date_dim"]
    d1 = dd[dd["d_year"] == 1999][["d_date_sk", "d_week_seq"]]
    cs = t["catalog_sales"].merge(d1, left_on="cs_sold_date_sk",
                                  right_on="d_date_sk")
    inv = t["inventory"].merge(
        dd[["d_date_sk", "d_week_seq"]].rename(
            columns={"d_date_sk": "d2_sk", "d_week_seq": "wk2"}),
        left_on="inv_date_sk", right_on="d2_sk")
    j = cs.merge(inv, left_on=["cs_item_sk", "d_week_seq"],
                 right_on=["inv_item_sk", "wk2"])
    j = j[j["inv_quantity_on_hand"] < j["cs_quantity"]]
    cd = t["customer_demographics"]
    cd = cd[cd["cd_marital_status"] == "D"]
    hd = t["household_demographics"]
    hd = hd[hd["hd_buy_potential"] == ">10000"]
    j = (j.merge(t["warehouse"], left_on="inv_warehouse_sk",
                 right_on="w_warehouse_sk")
         .merge(t["item"], left_on="cs_item_sk", right_on="i_item_sk")
         .merge(cd, left_on="cs_bill_cdemo_sk", right_on="cd_demo_sk")
         .merge(hd, left_on="cs_bill_hdemo_sk", right_on="hd_demo_sk"))
    j = j[j["cs_ship_date_sk"].isin(set(dd["d_date_sk"]))]
    j = j[j["cs_ship_date_sk"] > j["cs_sold_date_sk"] + 5]
    j = j.merge(t["catalog_returns"][["cr_item_sk", "cr_order_number"]],
                left_on=["cs_item_sk", "cs_order_number"],
                right_on=["cr_item_sk", "cr_order_number"], how="left")
    g = (j.groupby(["i_item_desc", "w_warehouse_name", "d_week_seq"])
         .size().reset_index(name="total_cnt"))
    g["no_promo"] = g["total_cnt"]
    g["promo"] = g["total_cnt"]
    g = g[["i_item_desc", "w_warehouse_name", "d_week_seq", "no_promo",
           "promo", "total_cnt"]]
    return g.sort_values(
        ["total_cnt", "i_item_desc", "w_warehouse_name", "d_week_seq"],
        ascending=[False, True, True, True], kind="stable").head(100)


QUERIES_HEAVY = {
    "q23a": (q23a, q23a_oracle),
    "q23b": (q23b, q23b_oracle),
    "q24a": (q24a, q24a_oracle),
    "q24b": (q24b, q24b_oracle),
    "q72": (q72, q72_oracle),
}
