"""Real TPC-DS queries q8, q51, q54, q95.

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q{8,51,54,95}.sql — ported verbatim. q51's ROWS UNBOUNDED
PRECEDING..CURRENT ROW frames ride the engine's cumulative window
(identical to RANGE here because (item, date) is unique after the
grouping); q54's BETWEEN scalar subqueries stay traced via
Frame.as_scalar_expr; q8's INTERSECT decomposes into a semi join of
DISTINCT sets and its prefix join keeps per-zip multiplicity.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

from auron_tpu.dtypes import INT32
from auron_tpu.expr.nodes import col, func, lit
from auron_tpu.ops.sort import SortKey
from auron_tpu.ops.window import WindowFunc
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame

from .datagen import date_sk


def _between(c, lo, hi):
    return (c >= lit(lo)) & (c <= lit(hi))


# ---------------------------------------------------------------------------
# q51: first dates where an item's cumulative web revenue overtakes its
# cumulative store revenue, via FULL OUTER JOIN of per-day running sums
# (q51.sql).
# ---------------------------------------------------------------------------

def _q51_v1(s: Session, table: str, item_col: str, date_col: str,
            price: str) -> Frame:
    dt = s.table("date_dim").filter(
        _between(col("d_month_seq"), 1200, 1211))
    g = (s.table(table)
         .filter(col(item_col).is_not_null())
         .join(dt, (date_col,), ("d_date_sk",))
         .groupby(item_col, "d_date")
         .agg(psum=("sum", col(price))))
    return (g.window((item_col,), (SortKey("d_date"),),
                     (WindowFunc("cume_sales", "sum", input="psum"),))
            .select(item_sk=col(item_col), d_date=col("d_date"),
                    cume_sales=col("cume_sales")))


def q51(s: Session) -> Frame:
    web = _q51_v1(s, "web_sales", "ws_item_sk", "ws_sold_date_sk",
                  "ws_sales_price")
    store = (_q51_v1(s, "store_sales", "ss_item_sk", "ss_sold_date_sk",
                     "ss_sales_price")
             .select(s_item=col("item_sk"), s_date=col("d_date"),
                     s_cume=col("cume_sales")))
    j = (web.join(store, ("item_sk", "d_date"), ("s_item", "s_date"),
                  how="full")
         .select(item_sk=func("coalesce", col("item_sk"),
                              col("s_item")),
                 d_date=func("coalesce", col("d_date"), col("s_date")),
                 web_sales=col("cume_sales"),
                 store_sales=col("s_cume")))
    w = j.window(("item_sk",), (SortKey("d_date"),),
                 (WindowFunc("web_cumulative", "max",
                             input="web_sales"),
                  WindowFunc("store_cumulative", "max",
                             input="store_sales")))
    return (w.filter(col("web_cumulative") > col("store_cumulative"))
            .select("item_sk", "d_date", "web_sales", "store_sales",
                    "web_cumulative", "store_cumulative")
            .sort(SortKey("item_sk"), SortKey("d_date"), limit=100))


def _q51_v1_oracle(t, table, item_col, date_col, price):
    dd = t["date_dim"]
    dt = dd[dd["d_month_seq"].between(1200, 1211)]
    j = (t[table][t[table][item_col].notna()]
         .merge(dt, left_on=date_col, right_on="d_date_sk"))
    g = (j.groupby([item_col, "d_date"])[price].sum().reset_index()
         .sort_values([item_col, "d_date"], kind="stable"))
    g["cume_sales"] = g.groupby(item_col)[price].cumsum()
    return g.rename(columns={item_col: "item_sk"})[
        ["item_sk", "d_date", "cume_sales"]]


def q51_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    web = _q51_v1_oracle(t, "web_sales", "ws_item_sk",
                         "ws_sold_date_sk", "ws_sales_price")
    store = _q51_v1_oracle(t, "store_sales", "ss_item_sk",
                           "ss_sold_date_sk", "ss_sales_price")
    j = web.merge(store, on=["item_sk", "d_date"], how="outer",
                  suffixes=("_w", "_s"))
    j = j.rename(columns={"cume_sales_w": "web_sales",
                          "cume_sales_s": "store_sales"})
    j = j.sort_values(["item_sk", "d_date"], kind="stable")
    # SQL windowed max IGNORES nulls (returns the running max of non-null
    # values); pandas cummax leaves NaN at NaN rows, so forward-fill
    for out, src in (("web_cumulative", "web_sales"),
                     ("store_cumulative", "store_sales")):
        j[out] = j.groupby("item_sk")[src].cummax()
        j[out] = j.groupby("item_sk")[out].ffill()
    j = j[j["web_cumulative"] > j["store_cumulative"]]
    return j[["item_sk", "d_date", "web_sales", "store_sales",
              "web_cumulative", "store_cumulative"]].head(100)


# ---------------------------------------------------------------------------
# q54: revenue segments of customers who bought Women/maternity items via
# catalog or web in Dec 1998, measured on their local stores over the
# following quarter (q54.sql).
# ---------------------------------------------------------------------------

def q54(s: Session) -> Frame:
    union = (s.table("catalog_sales")
             .select(sold=col("cs_sold_date_sk"),
                     cust=col("cs_bill_customer_sk"),
                     isk=col("cs_item_sk"))
             .union(s.table("web_sales")
                    .select(sold=col("ws_sold_date_sk"),
                            cust=col("ws_bill_customer_sk"),
                            isk=col("ws_item_sk"))))
    it = s.table("item").filter(
        (col("i_category") == lit("Women")) &
        (col("i_class") == lit("maternity")))
    dt = s.table("date_dim").filter(
        (col("d_moy") == lit(12)) & (col("d_year") == lit(1998)))
    mc = (union.join(it, ("isk",), ("i_item_sk",))
          .join(dt, ("sold",), ("d_date_sk",))
          .join(s.table("customer"), ("cust",), ("c_customer_sk",))
          .select("c_customer_sk", "c_current_addr_sk").distinct())

    def month_bound(offset: int):
        return (s.table("date_dim")
                .filter((col("d_year") == lit(1998)) &
                        (col("d_moy") == lit(12)))
                .select(v=col("d_month_seq") + lit(offset))
                .distinct().as_scalar_expr())

    dd2 = s.table("date_dim").filter(
        (col("d_month_seq") >= month_bound(1)) &
        (col("d_month_seq") <= month_bound(3)))
    mr = (mc.join(s.table("customer_address"), ("c_current_addr_sk",),
                  ("ca_address_sk",))
          .join(s.table("store"), ("ca_county", "ca_state"),
                ("s_county", "s_state"))
          .join(s.table("store_sales"), ("c_customer_sk",),
                ("ss_customer_sk",))
          .join(dd2, ("ss_sold_date_sk",), ("d_date_sk",))
          .groupby("c_customer_sk")
          .agg(revenue=("sum", col("ss_ext_sales_price"))))
    seg = mr.select(segment=(col("revenue") / lit(50.0)).cast(INT32))
    return (seg.groupby("segment")
            .agg(num_customers=("count_star", None))
            .with_columns(segment_base=col("segment") * lit(50))
            .select("segment", "num_customers", "segment_base")
            .sort(SortKey("segment"), SortKey("num_customers"),
                  limit=100))


def q54_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    cs = t["catalog_sales"].rename(columns={
        "cs_sold_date_sk": "sold", "cs_bill_customer_sk": "cust",
        "cs_item_sk": "isk"})[["sold", "cust", "isk"]]
    ws = t["web_sales"].rename(columns={
        "ws_sold_date_sk": "sold", "ws_bill_customer_sk": "cust",
        "ws_item_sk": "isk"})[["sold", "cust", "isk"]]
    u = pd.concat([cs, ws], ignore_index=True)
    it = t["item"]
    it = it[(it["i_category"] == "Women") &
            (it["i_class"] == "maternity")]
    dd = t["date_dim"]
    dt = dd[(dd["d_moy"] == 12) & (dd["d_year"] == 1998)]
    mc = (u.merge(it, left_on="isk", right_on="i_item_sk")
          .merge(dt, left_on="sold", right_on="d_date_sk")
          .merge(t["customer"], left_on="cust",
                 right_on="c_customer_sk"))[
        ["c_customer_sk", "c_current_addr_sk"]].drop_duplicates()
    base = dd[(dd["d_year"] == 1998) &
              (dd["d_moy"] == 12)]["d_month_seq"].iloc[0]
    dd2 = dd[dd["d_month_seq"].between(base + 1, base + 3)]
    mr = (mc.merge(t["customer_address"], left_on="c_current_addr_sk",
                   right_on="ca_address_sk")
          .merge(t["store"], left_on=["ca_county", "ca_state"],
                 right_on=["s_county", "s_state"])
          .merge(t["store_sales"], left_on="c_customer_sk",
                 right_on="ss_customer_sk")
          .merge(dd2, left_on="ss_sold_date_sk", right_on="d_date_sk")
          .groupby("c_customer_sk")
          .agg(revenue=("ss_ext_sales_price", "sum")).reset_index())
    seg = (mr["revenue"] / 50.0).astype(np.int32)
    g = (pd.DataFrame({"segment": seg})
         .groupby("segment").size().reset_index(name="num_customers"))
    g["segment_base"] = g["segment"] * 50
    return g.sort_values(["segment", "num_customers"],
                         kind="stable").head(100)


# ---------------------------------------------------------------------------
# q95: Illinois 'pri' web orders shipped from multiple warehouses that
# WERE returned (q95.sql) — q94's shape with the NOT EXISTS flipped to a
# second IN (semi join).
# ---------------------------------------------------------------------------

def q95(s: Session) -> Frame:
    lo = date_sk("1999-02-01")
    dt = s.table("date_dim").filter(
        _between(col("d_date_sk"), lo, lo + 60))
    ca = s.table("customer_address").filter(
        col("ca_state") == lit("IL"))
    site = s.table("web_site").filter(
        col("web_company_name") == lit("pri"))
    ws2 = s.table("web_sales").select(ws2_order=col("ws_order_number"),
                                      ws2_wh=col("ws_warehouse_sk"))
    wr = s.table("web_returns").select(wr_order=col("wr_order_number"))
    j = (s.table("web_sales")
         .join(dt, ("ws_ship_date_sk",), ("d_date_sk",))
         .join(ca, ("ws_ship_addr_sk",), ("ca_address_sk",))
         .join(site, ("ws_web_site_sk",), ("web_site_sk",))
         .join(ws2, ("ws_order_number",), ("ws2_order",),
               how="left_semi",
               condition=col("ws_warehouse_sk") != col("ws2_wh"))
         .join(wr, ("ws_order_number",), ("wr_order",),
               how="left_semi"))
    return j.groupby().agg(
        order_count=("count_distinct", col("ws_order_number")),
        total_ship=("sum", col("ws_ext_ship_cost")),
        total_profit=("sum", col("ws_net_profit")))


def q95_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    lo = date_sk("1999-02-01")
    dd = t["date_dim"]
    dt = dd[dd["d_date_sk"].between(lo, lo + 60)]
    ca = t["customer_address"]
    ca = ca[ca["ca_state"] == "IL"]
    site = t["web_site"][t["web_site"]["web_company_name"] == "pri"]
    ws = t["web_sales"]
    j = (ws.merge(dt, left_on="ws_ship_date_sk", right_on="d_date_sk")
         .merge(ca, left_on="ws_ship_addr_sk", right_on="ca_address_sk")
         .merge(site, left_on="ws_web_site_sk", right_on="web_site_sk"))
    wh = ws.groupby("ws_order_number")["ws_warehouse_sk"].agg(
        ["min", "max"])
    multi = set(wh[wh["min"] != wh["max"]].index)
    returned = set(t["web_returns"]["wr_order_number"])
    j = j[j["ws_order_number"].isin(multi) &
          j["ws_order_number"].isin(returned)]
    return pd.DataFrame({
        "order_count": [j["ws_order_number"].nunique()],
        "total_ship": [j["ws_ext_ship_cost"].sum() if len(j)
                       else np.nan],
        "total_profit": [j["ws_net_profit"].sum() if len(j)
                         else np.nan]})


# ---------------------------------------------------------------------------
# q8: store net profit for stores whose 2-char zip prefix matches a
# "preferred" zip: IN-listed zips INTERSECT zips with >10 preferred
# customers (q8.sql).
# ---------------------------------------------------------------------------

_Q8_ZIP_LIST = [
    "24128", "76232", "65084", "87816", "83926", "77556", "20548",
    "26231", "43848", "15126", "91137", "61265", "98294", "25782",
    "17920", "18426", "98235", "40081", "84093", "28577", "55565",
    "17183", "54601", "67897", "22752", "86284", "18376", "38607",
    "45200", "21756", "29741", "96765", "23932", "89360", "29839",
    "25989", "28898", "91068", "72550", "10390", "18845", "47770",
    "82636", "41367", "76638", "86198", "81312", "37126", "39192",
    "88424", "72175", "81426", "53672", "10445", "42666", "66864",
    "66708", "41248", "48583", "82276", "18842", "78890", "49448",
    "14089", "38122", "34425", "79077", "19849", "43285", "39861",
    "66162", "77610", "13695", "99543", "83444", "83041", "12305",
    "57665", "68341", "25003", "57834", "62878", "49130", "81096",
    "18840", "27700", "23470", "50412", "21195", "16021", "76107",
    "71954", "68309", "18119", "98359", "64544", "10336", "86379",
    "27068", "39736", "98569", "28915", "24206", "56529", "57647",
    "54917", "42961", "91110", "63981", "14922", "36420", "23006",
    "67467", "32754", "30903", "20260", "31671", "51798", "72325",
    "85816", "68621", "13955", "36446", "41766", "68806", "16725",
    "15146", "22744", "35850", "88086", "51649", "18270", "52867",
    "39972", "96976", "63792", "11376", "94898", "13595", "10516",
    "90225", "58943", "39371", "94945", "28587", "96576", "57855",
    "28488", "26105", "83933", "25858", "34322", "44438", "73171",
    "30122", "34102", "22685", "71256", "78451", "54364", "13354",
    "45375", "40558", "56458", "28286", "45266", "47305", "69399",
    "83921", "26233", "11101", "15371", "69913", "35942", "15882",
    "25631", "24610", "44165", "99076", "33786", "70738", "26653",
    "14328", "72305", "62496", "22152", "10144", "64147", "48425",
    "14663", "21076", "18799", "30450", "63089", "81019", "68893",
    "24996", "51200", "51211", "45692", "92712", "70466", "79994",
    "22437", "25280", "38935", "71791", "73134", "56571", "14060",
    "19505", "72425", "56575", "74351", "68786", "51650", "20004",
    "18383", "76614", "11634", "18906", "15765", "41368", "73241",
    "76698", "78567", "97189", "28545", "76231", "75691", "22246",
    "51061", "90578", "56691", "68014", "51103", "94167", "57047",
    "14867", "73520", "15734", "63435", "25733", "35474", "24676",
    "94627", "53535", "17879", "15559", "53268", "59166", "11928",
    "59402", "33282", "45721", "43933", "68101", "33515", "36634",
    "71286", "19736", "58058", "55253", "67473", "41918", "19515",
    "36495", "19430", "22351", "77191", "91393", "49156", "50298",
    "87501", "18652", "53179", "18767", "63193", "23968", "65164",
    "68880", "21286", "72823", "58470", "67301", "13394", "31016",
    "70372", "67030", "40604", "24317", "45748", "39127", "26065",
    "77721", "31029", "31880", "60576", "24671", "45549", "13376",
    "50016", "33123", "19769", "22927", "97789", "46081", "72151",
    "15723", "46136", "51949", "68100", "96888", "64528", "14171",
    "79777", "28709", "11489", "25103", "32213", "78668", "22245",
    "15798", "27156", "37930", "62971", "21337", "51622", "67853",
    "10567", "38415", "15455", "58263", "42029", "60279", "37125",
    "56240", "88190", "50308", "26859", "64457", "89091", "82136",
    "62377", "36233", "63837", "58078", "17043", "30010", "60099",
    "28810", "98025", "29178", "87343", "73273", "30469", "64034",
    "39516", "86057", "21309", "90257", "67875", "40162", "11356",
    "73650", "61810", "72013", "30431", "22461", "19512", "13375",
    "55307", "30625", "83849", "68908", "26689", "96451", "38193",
    "46820", "88885", "84935", "69035", "83144", "47537", "56616",
    "94983", "48033", "69952", "25486", "61547", "27385", "61860",
    "58048", "56910", "16807", "17871", "35258", "31387", "35458",
    "35576",
]


def q8(s: Session) -> Frame:
    a1 = (s.table("customer_address")
          .with_columns(zip5=func("substring", col("ca_zip"), params=(1, 5)))
          .filter(col("zip5").isin(_Q8_ZIP_LIST))
          .select("zip5").distinct())
    pref = s.table("customer").filter(
        col("c_preferred_cust_flag") == lit("Y"))
    a2 = (s.table("customer_address")
          .join(pref, ("ca_address_sk",), ("c_current_addr_sk",))
          .with_columns(zip5=func("substring", col("ca_zip"), params=(1, 5)))
          .groupby("zip5")
          .agg(cnt=("count_star", None))
          .filter(col("cnt") > lit(10))
          .select(z2=col("zip5")))
    v1 = (a1.join(a2, ("zip5",), ("z2",), how="left_semi")
          .select(pz=func("substring", col("zip5"), params=(1, 2))))
    dt = s.table("date_dim").filter(
        (col("d_qoy") == lit(2)) & (col("d_year") == lit(1998)))
    j = (s.table("store_sales")
         .join(dt, ("ss_sold_date_sk",), ("d_date_sk",))
         .join(s.table("store"), ("ss_store_sk",), ("s_store_sk",))
         .with_columns(sp=func("substring", col("s_zip"), params=(1, 2)))
         .join(v1, ("sp",), ("pz",)))
    return (j.groupby("s_store_name")
            .agg(profit=("sum", col("ss_net_profit")))
            .sort(SortKey("s_store_name"), limit=100))


def q8_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    ca = t["customer_address"].copy()
    ca["zip5"] = ca["ca_zip"].str[:5]
    a1 = set(ca[ca["zip5"].isin(_Q8_ZIP_LIST)]["zip5"])
    pref = t["customer"]
    pref = pref[pref["c_preferred_cust_flag"] == "Y"]
    j2 = ca.merge(pref, left_on="ca_address_sk",
                  right_on="c_current_addr_sk")
    cnt = j2.groupby("zip5").size()
    a2 = set(cnt[cnt > 10].index)
    v1 = pd.DataFrame({"pz": [z[:2] for z in sorted(a1 & a2)]})
    dd = t["date_dim"]
    dt = dd[(dd["d_qoy"] == 2) & (dd["d_year"] == 1998)]
    j = (t["store_sales"]
         .merge(dt, left_on="ss_sold_date_sk", right_on="d_date_sk")
         .merge(t["store"], left_on="ss_store_sk",
                right_on="s_store_sk"))
    j = j.assign(sp=j["s_zip"].str[:2]).merge(
        v1, left_on="sp", right_on="pz")
    return (j.groupby("s_store_name")
            .agg(profit=("ss_net_profit", "sum")).reset_index()
            .sort_values("s_store_name", kind="stable").head(100))


QUERIES_FINAL = {
    "q8": (q8, q8_oracle),
    "q51": (q51, q51_oracle),
    "q54": (q54, q54_oracle),
    "q95": (q95, q95_oracle),
}
