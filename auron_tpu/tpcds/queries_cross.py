"""Real TPC-DS q64: year-over-year cross-sales on returned items.

Source SQL: /root/reference/dev/auron-it/src/main/resources/tpcds-queries/
q64.sql — ported verbatim. The 17-table cross_sales CTE joins every
dimension twice (sale-time vs current demographics/address/income band)
and self-joins by item+store across consecutive years.
"""

from __future__ import annotations

from typing import Dict

import pandas as pd

from auron_tpu.expr.nodes import col, lit
from auron_tpu.ops.sort import SortKey
from auron_tpu.plan import Session
from auron_tpu.plan.builder import Frame


_Q64_COLORS = ["purple", "burlywood", "indian", "spring", "floral",
               "medium"]
_CS_KEYS = ["product_name", "item_sk", "store_name", "store_zip",
            "b_street_number", "b_streen_name", "b_city", "b_zip",
            "c_street_number", "c_street_name", "c_city", "c_zip",
            "syear", "fsyear", "s2year"]


def _q64_cross_sales(s: Session) -> Frame:
    refund = (col("cr_refunded_cash") + col("cr_reversed_charge") +
              col("cr_store_credit"))
    cs_ui = (s.table("catalog_sales")
             .join(s.table("catalog_returns"),
                   ("cs_item_sk", "cs_order_number"),
                   ("cr_item_sk", "cr_order_number"))
             .groupby("cs_item_sk")
             .agg(sale=("sum", col("cs_ext_list_price")),
                  refund=("sum", refund))
             .filter(col("sale") > lit(2.0) * col("refund"))
             .select(ui=col("cs_item_sk")))
    it = (s.table("item")
          .filter(col("i_color").isin(_Q64_COLORS) &
                  (col("i_current_price") >= lit(64.0)) &
                  (col("i_current_price") <= lit(74.0)) &
                  (col("i_current_price") >= lit(65.0)) &
                  (col("i_current_price") <= lit(79.0))))
    d1 = s.table("date_dim").select(d1_sk=col("d_date_sk"),
                                    syear=col("d_year"))
    d2 = s.table("date_dim").select(d2_sk=col("d_date_sk"),
                                    fsyear=col("d_year"))
    d3 = s.table("date_dim").select(d3_sk=col("d_date_sk"),
                                    s2year=col("d_year"))
    cd1 = s.table("customer_demographics").select(
        cd1_sk=col("cd_demo_sk"), cd1_ms=col("cd_marital_status"))
    cd2 = s.table("customer_demographics").select(
        cd2_sk=col("cd_demo_sk"), cd2_ms=col("cd_marital_status"))
    hd1 = s.table("household_demographics").select(
        hd1_sk=col("hd_demo_sk"), hd1_ib=col("hd_income_band_sk"))
    hd2 = s.table("household_demographics").select(
        hd2_sk=col("hd_demo_sk"), hd2_ib=col("hd_income_band_sk"))
    ad1 = s.table("customer_address").select(
        ad1_sk=col("ca_address_sk"), b_street_number=col(
            "ca_street_number"), b_streen_name=col("ca_street_name"),
        b_city=col("ca_city"), b_zip=col("ca_zip"))
    ad2 = s.table("customer_address").select(
        ad2_sk=col("ca_address_sk"), c_street_number=col(
            "ca_street_number"), c_street_name=col("ca_street_name"),
        c_city=col("ca_city"), c_zip=col("ca_zip"))
    ib1 = s.table("income_band").select(ib1_sk=col("ib_income_band_sk"))
    ib2 = s.table("income_band").select(ib2_sk=col("ib_income_band_sk"))
    promo = s.table("promotion").select(pp=col("p_promo_sk"))
    j = (s.table("store_sales")
         .join(s.table("store_returns"),
               ("ss_item_sk", "ss_ticket_number"),
               ("sr_item_sk", "sr_ticket_number"))
         .join(cs_ui, ("ss_item_sk",), ("ui",))
         .join(d1, ("ss_sold_date_sk",), ("d1_sk",))
         .join(s.table("store"), ("ss_store_sk",), ("s_store_sk",))
         .join(s.table("customer"), ("ss_customer_sk",),
               ("c_customer_sk",))
         .join(cd1, ("ss_cdemo_sk",), ("cd1_sk",))
         .join(hd1, ("ss_hdemo_sk",), ("hd1_sk",))
         .join(ad1, ("ss_addr_sk",), ("ad1_sk",))
         .join(cd2, ("c_current_cdemo_sk",), ("cd2_sk",))
         .join(hd2, ("c_current_hdemo_sk",), ("hd2_sk",))
         .join(ad2, ("c_current_addr_sk",), ("ad2_sk",))
         .join(d2, ("c_first_sales_date_sk",), ("d2_sk",))
         .join(d3, ("c_first_shipto_date_sk",), ("d3_sk",))
         .join(promo, ("ss_promo_sk",), ("pp",))
         .join(ib1, ("hd1_ib",), ("ib1_sk",))
         .join(ib2, ("hd2_ib",), ("ib2_sk",))
         .join(it, ("ss_item_sk",), ("i_item_sk",))
         .filter(col("cd1_ms") != col("cd2_ms")))
    return (j.rename(i_product_name="product_name",
                     ss_item_sk="item_sk", s_store_name="store_name",
                     s_zip="store_zip")
            .groupby(*_CS_KEYS)
            .agg(cnt=("count_star", None),
                 s1=("sum", col("ss_wholesale_cost")),
                 s2=("sum", col("ss_list_price")),
                 s3=("sum", col("ss_coupon_amt"))))


def q64(s: Session) -> Frame:
    cross = _q64_cross_sales(s)
    cs1 = cross.filter(col("syear") == lit(1999))
    cs2 = (cross.filter(col("syear") == lit(2000))
           .select(item2=col("item_sk"), sn2=col("store_name"),
                   sz2=col("store_zip"), syear2=col("syear"),
                   cnt2=col("cnt"), s1_2=col("s1"), s2_2=col("s2"),
                   s3_2=col("s3")))
    j = (cs1.join(cs2, ("item_sk", "store_name", "store_zip"),
                  ("item2", "sn2", "sz2"))
         .filter(col("cnt2") <= col("cnt")))
    return (j.select("product_name", "store_name", "store_zip",
                     "b_street_number", "b_streen_name", "b_city",
                     "b_zip", "c_street_number", "c_street_name",
                     "c_city", "c_zip", "syear", "cnt", "s1", "s2",
                     "s3", "s1_2", "s2_2", "s3_2", "syear2", "cnt2")
            .sort(SortKey("product_name"), SortKey("store_name"),
                  SortKey("cnt2"), SortKey("s1"), SortKey("s1_2")))


def _q64_cross_sales_oracle(t):
    cr = t["catalog_returns"].copy()
    cr["refund"] = (cr["cr_refunded_cash"] + cr["cr_reversed_charge"] +
                    cr["cr_store_credit"])
    ui = (t["catalog_sales"]
          .merge(cr, left_on=["cs_item_sk", "cs_order_number"],
                 right_on=["cr_item_sk", "cr_order_number"])
          .groupby("cs_item_sk")
          .agg(sale=("cs_ext_list_price", "sum"),
               refund=("refund", "sum")))
    ui = set(ui[ui["sale"] > 2.0 * ui["refund"]].index)
    it = t["item"]
    it = it[it["i_color"].isin(_Q64_COLORS) &
            it["i_current_price"].between(64.0, 74.0) &
            it["i_current_price"].between(65.0, 79.0)]
    dd = t["date_dim"][["d_date_sk", "d_year"]]
    cd = t["customer_demographics"][["cd_demo_sk",
                                     "cd_marital_status"]]
    hd = t["household_demographics"][["hd_demo_sk",
                                      "hd_income_band_sk"]]
    ad = t["customer_address"][["ca_address_sk", "ca_street_number",
                                "ca_street_name", "ca_city", "ca_zip"]]
    ib = set(t["income_band"]["ib_income_band_sk"])
    j = (t["store_sales"]
         .merge(t["store_returns"],
                left_on=["ss_item_sk", "ss_ticket_number"],
                right_on=["sr_item_sk", "sr_ticket_number"])
         .merge(dd.rename(columns={"d_date_sk": "d1_sk",
                                   "d_year": "syear"}),
                left_on="ss_sold_date_sk", right_on="d1_sk")
         .merge(t["store"], left_on="ss_store_sk",
                right_on="s_store_sk")
         .merge(t["customer"], left_on="ss_customer_sk",
                right_on="c_customer_sk")
         .merge(cd.rename(columns={"cd_demo_sk": "cd1_sk",
                                   "cd_marital_status": "cd1_ms"}),
                left_on="ss_cdemo_sk", right_on="cd1_sk")
         .merge(hd.rename(columns={"hd_demo_sk": "hd1_sk",
                                   "hd_income_band_sk": "hd1_ib"}),
                left_on="ss_hdemo_sk", right_on="hd1_sk")
         .merge(ad.rename(columns={
             "ca_address_sk": "ad1_sk",
             "ca_street_number": "b_street_number",
             "ca_street_name": "b_streen_name", "ca_city": "b_city",
             "ca_zip": "b_zip"}),
                left_on="ss_addr_sk", right_on="ad1_sk")
         .merge(cd.rename(columns={"cd_demo_sk": "cd2_sk",
                                   "cd_marital_status": "cd2_ms"}),
                left_on="c_current_cdemo_sk", right_on="cd2_sk")
         .merge(hd.rename(columns={"hd_demo_sk": "hd2_sk",
                                   "hd_income_band_sk": "hd2_ib"}),
                left_on="c_current_hdemo_sk", right_on="hd2_sk")
         .merge(ad.rename(columns={
             "ca_address_sk": "ad2_sk",
             "ca_street_number": "c_street_number",
             "ca_street_name": "c_street_name", "ca_city": "c_city",
             "ca_zip": "c_zip"}),
                left_on="c_current_addr_sk", right_on="ad2_sk")
         .merge(dd.rename(columns={"d_date_sk": "d2_sk",
                                   "d_year": "fsyear"}),
                left_on="c_first_sales_date_sk", right_on="d2_sk")
         .merge(dd.rename(columns={"d_date_sk": "d3_sk",
                                   "d_year": "s2year"}),
                left_on="c_first_shipto_date_sk", right_on="d3_sk")
         .merge(it, left_on="ss_item_sk", right_on="i_item_sk"))
    j = j[j["ss_item_sk"].isin(ui) &
          j["ss_promo_sk"].isin(set(t["promotion"]["p_promo_sk"])) &
          j["hd1_ib"].isin(ib) & j["hd2_ib"].isin(ib) &
          (j["cd1_ms"] != j["cd2_ms"])]
    j = j.rename(columns={"i_product_name": "product_name",
                          "ss_item_sk": "item_sk",
                          "s_store_name": "store_name",
                          "s_zip": "store_zip"})
    return j.groupby(_CS_KEYS).agg(
        cnt=("ss_sold_date_sk", "size"),
        s1=("ss_wholesale_cost", "sum"), s2=("ss_list_price", "sum"),
        s3=("ss_coupon_amt", "sum")).reset_index()


def q64_oracle(t: Dict[str, pd.DataFrame]) -> pd.DataFrame:
    cross = _q64_cross_sales_oracle(t)
    cs1 = cross[cross["syear"] == 1999]
    cs2 = cross[cross["syear"] == 2000].rename(columns={
        "item_sk": "item2", "store_name": "sn2", "store_zip": "sz2",
        "syear": "syear2", "cnt": "cnt2", "s1": "s1_2", "s2": "s2_2",
        "s3": "s3_2"})[["item2", "sn2", "sz2", "syear2", "cnt2",
                        "s1_2", "s2_2", "s3_2"]]
    j = cs1.merge(cs2, left_on=["item_sk", "store_name", "store_zip"],
                  right_on=["item2", "sn2", "sz2"])
    j = j[j["cnt2"] <= j["cnt"]]
    out = j[["product_name", "store_name", "store_zip",
             "b_street_number", "b_streen_name", "b_city", "b_zip",
             "c_street_number", "c_street_name", "c_city", "c_zip",
             "syear", "cnt", "s1", "s2", "s3", "s1_2", "s2_2", "s3_2",
             "syear2", "cnt2"]]
    return out.sort_values(["product_name", "store_name", "cnt2", "s1",
                            "s1_2"], kind="stable")


QUERIES_CROSS = {
    "q64": (q64, q64_oracle),
}
