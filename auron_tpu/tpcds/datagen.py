"""Seeded synthetic TPC-DS-shaped data — full table set.

The reference CI pulls a pre-generated 1GB dsdgen dataset
(/root/reference/.github/workflows/tpcds-reusable.yml:253-257); dsdgen is
not available offline, so this generator synthesizes every table and column
our query set touches, with TPC-DS-like shapes: skewed foreign keys, dated
dimensions, low-cardinality categorical strings, returns drawn from actual
sales rows (so multi-channel joins hit). Value pools are chosen so the
REAL query predicates (states, counties, demographics, price bands, magic
zips) select non-trivial subsets. Correctness comes from the differential
oracle (the same query computed in pandas), which is the reference's own
methodology (run vs vanilla Spark, compare rows —
dev/auron-it QueryRunner/QueryResultComparator.scala).

Date convention: d_date_sk 0 == 1998-01-01; the dimension is contiguous
daily through 2003-12-31, so ``date_sk(iso)`` converts a date literal into
the equivalent sk bound (used by queries that filter `d_date BETWEEN ...`
on this contiguous dimension). d_month_seq follows the real dsdgen
convention ((year-1900)*12 + moy-1), so q62/q99's `1200..1211` selects
calendar year 2000.
"""

from __future__ import annotations

import datetime
from typing import Dict

import numpy as np
import pandas as pd

EPOCH = datetime.date(1998, 1, 1)
N_DAYS = 2191  # 1998-01-01 .. 2003-12-31

# brand/class pools include the literal names the q47/q53/q63/q89 matrix
# predicates select (verbatim from the reference SQL, incl. dsdgen's
# 'refernece'/'birdal' typos)
BRANDS = [f"brand#{i}" for i in range(1, 53)] + [
    "scholaramalgamalg #14", "scholaramalgamalg #7",
    "exportiunivamalg #9", "scholaramalgamalg #9",
    "amalgimporto #1", "edu packscholar #1", "exportiimporto #1",
    "importoamalg #1"]
CATEGORIES = ["Books", "Electronics", "Home", "Jewelry", "Men", "Music",
              "Shoes", "Sports", "Toys", "Women", "Children"]
CLASSES = [f"class#{i}" for i in range(1, 9)] + [
    "personal", "portable", "refernece", "reference", "self-help",
    "accessories", "classical", "fragrances", "pants", "computers",
    "stereo", "football", "shirts", "birdal", "dresses", "maternity"]
STATES = ["TN", "CA", "TX", "NY", "WA", "GA", "OH", "IL", "FL", "MI",
          "OR", "NM", "KY", "VA", "MS", "CO", "MN", "IN", "NJ", "WI",
          "CT", "LA", "IA", "AR"]
CITIES = ["Fairview", "Midway", "Edgewood", "Pleasant Hill", "Oakland",
          "Riverside", "Centerville", "Liberty", "Salem", "Glendale"]
COUNTIES = ["Williamson County", "Franklin Parish", "Bronx County",
            "Orange County", "Ziebach County", "Walker County",
            "Rush County", "Toole County", "Jefferson County",
            "Dona Ana County", "La Porte County"]
MAGIC_ZIPS = ["85669", "86197", "88274", "83405", "86475", "85392",
              "85460", "80348", "81792"]
# a slice of q8's 400-zip IN list so its INTERSECT/HAVING pipeline is
# non-trivial on synthetic data; stores get zips sharing 2-char prefixes
Q8_ZIPS = ["24128", "76232", "65084", "87816", "83926", "77556",
           "20548", "26231", "43848", "15126", "91137", "61265"]
Q8_STORE_ZIPS = ["24117", "76556", "65201", "87901", "83988", "77050"]
STORE_NAMES = ["ese", "ought", "able", "pri", "bar", "anti", "cally"]
MARITAL = ["M", "S", "D", "W", "U"]
EDUCATION = ["Advanced Degree", "College", "2 yr Degree", "4 yr Degree",
             "Secondary", "Primary", "Unknown"]
BUY_POTENTIAL = [">10000", "unknown", "1001-5000", "501-1000", "0-500",
                 "5001-10000", "Unknown"]
COLORS = ["powder", "khaki", "brown", "honeydew", "floral", "deep",
          "light", "cornflower", "midnight", "snow", "cyan", "papaya",
          "orange", "frosted", "forest", "ghost", "red", "blue",
          "slate", "blanched", "burnished", "pale", "chiffon",
          "purple", "medium"]
UNITS = ["Ounce", "Oz", "Bunch", "Ton", "N/A", "Dozen", "Box", "Pound",
         "Pallet", "Gross", "Cup", "Dram", "Each", "Tbl", "Lb", "Bundle"]
SIZES = ["medium", "extra large", "N/A", "small", "petite", "large"]
SM_TYPES = ["EXPRESS", "OVERNIGHT", "REGULAR", "TWO DAY", "LIBRARY"]
DAY_NAMES = ["Sunday", "Monday", "Tuesday", "Wednesday", "Thursday",
             "Friday", "Saturday"]
FIRST_NAMES = ["James", "Mary", "John", "Linda", "Robert", "Susan",
               "Michael", "Karen", "David", "Nancy", "Chris", "Lisa"]
LAST_NAMES = ["Smith", "Johnson", "Brown", "Jones", "Miller", "Davis",
              "Wilson", "Moore", "Taylor", "White", "Clark", "Lewis"]
SALUTATIONS = ["Mr.", "Mrs.", "Ms.", "Dr.", "Sir", "Miss"]


def date_sk(iso: str) -> int:
    """Date literal -> d_date_sk on the contiguous daily dimension."""
    return (datetime.date.fromisoformat(iso) - EPOCH).days


def scale_rows(sf: float) -> Dict[str, int]:
    """Row counts per table scaled from a tiny base (sf=1.0 ~ 'SF0.01')."""
    dim = min(sf, 10)
    return {
        "store_sales": int(100_000 * sf),
        "catalog_sales": int(60_000 * sf),
        "web_sales": int(40_000 * sf),
        "inventory": int(40_000 * sf),
        "store_returns": int(10_000 * sf),
        "catalog_returns": int(6_000 * sf),
        "web_returns": int(4_000 * sf),
        "item": max(int(2_000 * dim), 200),
        "customer": max(int(10_000 * dim), 500),
        "customer_address": max(int(5_000 * dim), 250),
        "store": max(int(20 * dim), 6),
        "promotion": 100,
        "warehouse": 8,
        "web_page": 24,
        "web_site": 6,
        "catalog_page": 60,
        "call_center": 4,
        "reason": 40,
        "income_band": 20,
        "household_demographics": 720,
    }


def _date_dim() -> pd.DataFrame:
    sk = np.arange(N_DAYS, dtype=np.int32)
    dates = np.array([EPOCH + datetime.timedelta(days=int(i))
                      for i in sk], dtype="datetime64[D]")
    years = np.array([d.astype(object).year for d in dates], np.int32)
    moy = np.array([d.astype(object).month for d in dates], np.int32)
    dom = np.array([d.astype(object).day for d in dates], np.int32)
    # Python weekday(): Monday=0; TPC-DS d_dow: Sunday=0
    dow = np.array([(d.astype(object).weekday() + 1) % 7 for d in dates],
                   np.int32)
    return pd.DataFrame({
        "d_date_sk": sk,
        "d_date": pd.Series(dates),
        "d_year": years,
        "d_moy": moy,
        "d_dom": dom,
        "d_dow": dow,
        "d_qoy": (moy - 1) // 3 + 1,
        "d_day_name": [DAY_NAMES[i] for i in dow],
        "d_month_seq": ((years - 1900) * 12 + moy - 1).astype(np.int32),
        "d_quarter_name": [f"{y}Q{q}" for y, q in
                           zip(years, (moy - 1) // 3 + 1)],
        "d_week_seq": ((sk + 4) // 7).astype(np.int32),
    })


def generate(sf: float = 1.0, seed: int = 0,
             skew: float = 0.0) -> Dict[str, pd.DataFrame]:
    """skew > 0 concentrates item foreign keys on a few hot items
    (exercises the skew handler; BASELINE config #5)."""
    rng = np.random.default_rng(seed)
    n = scale_rows(sf)
    t: Dict[str, pd.DataFrame] = {}

    t["date_dim"] = _date_dim()

    hours = (np.arange(1440) // 60).astype(np.int32)
    meal = np.where(
        (hours >= 6) & (hours < 9), "breakfast",
        np.where((hours >= 17) & (hours < 20), "dinner", "")).astype(object)
    t["time_dim"] = pd.DataFrame({
        "t_time_sk": np.arange(1440, dtype=np.int32),
        "t_hour": hours,
        "t_minute": (np.arange(1440) % 60).astype(np.int32),
        "t_time": (np.arange(1440) * 60).astype(np.int32),
        "t_meal_time": meal,
    })

    ni = n["item"]
    brand_id = rng.integers(1, 61, ni).astype(np.int32)
    manufact_id = rng.integers(1, 1000, ni).astype(np.int32)
    # q3.sql filters i_manufact_id = 128 — pin a few items to it so the
    # reference's literal SQL is non-trivial on synthetic data
    manufact_id[: max(ni // 200, 3)] = 128
    category_idx = rng.integers(0, len(CATEGORIES), ni)
    t["item"] = pd.DataFrame({
        "i_item_sk": np.arange(ni, dtype=np.int32),
        "i_item_id": [f"AAAA{k:012d}" for k in range(ni)],
        "i_item_desc": [f"item description {k % 500}" for k in range(ni)],
        "i_brand_id": brand_id,
        "i_brand": [BRANDS[b - 1] for b in brand_id],
        "i_class_id": rng.integers(1, 17, ni).astype(np.int32),
        "i_class": rng.choice(CLASSES, ni),
        "i_category_id": (category_idx + 1).astype(np.int32),
        "i_category": np.array(CATEGORIES, dtype=object)[category_idx],
        "i_manufact_id": manufact_id,
        "i_manufact": [f"manufact#{m % 100}" for m in manufact_id],
        "i_manager_id": rng.integers(1, 100, ni).astype(np.int32),
        "i_current_price": (rng.random(ni) * 99.5 + 0.5).round(2),
        "i_wholesale_cost": (rng.random(ni) * 60).round(2),
        "i_product_name": [f"product {k % 300}eseoughtable" for k in
                           range(ni)],
        "i_color": rng.choice(COLORS, ni),
        "i_units": rng.choice(UNITS, ni),
        "i_size": rng.choice(SIZES, ni),
    })

    ns_ = n["store"]
    t["store"] = pd.DataFrame({
        "s_store_sk": np.arange(ns_, dtype=np.int32),
        "s_store_id": [f"STORE{k:08d}" for k in range(ns_)],
        "s_store_name": rng.choice(STORE_NAMES, ns_),
        "s_market_id": rng.integers(1, 11, ns_).astype(np.int32),
        # always at least one TN store: many queries slice s_state='TN'
        "s_state": np.concatenate([["TN"],
                                   rng.choice(STATES[:10], ns_ - 1)]),
        "s_county": rng.choice(COUNTIES, ns_),
        "s_city": rng.choice(CITIES, ns_),
        "s_zip": rng.choice(MAGIC_ZIPS + Q8_STORE_ZIPS + ["35709",
                                                          "12345"], ns_),
        "s_street_number": [str(100 + k) for k in range(ns_)],
        "s_street_name": rng.choice(["Main", "Oak", "Elm", "Park"], ns_),
        "s_street_type": rng.choice(["St", "Ave", "Blvd"], ns_),
        "s_suite_number": [f"Suite {k * 10}" for k in range(ns_)],
        "s_gmt_offset": rng.choice([-5.0, -6.0], ns_),
        "s_number_employees": rng.integers(180, 320, ns_).astype(np.int32),
        "s_company_name": rng.choice(["Unknown", "ation", "bar"], ns_),
        "s_company_id": rng.integers(1, 4, ns_).astype(np.int32),
    })

    na = n["customer_address"]
    t["customer_address"] = pd.DataFrame({
        "ca_address_sk": np.arange(na, dtype=np.int32),
        "ca_city": rng.choice(CITIES, na),
        "ca_street_number": [str(100 + k % 900) for k in range(na)],
        "ca_street_name": rng.choice(["Main", "Oak", "Elm", "Park",
                                      "Lake", "Hill"], na),
        "ca_street_type": rng.choice(["St", "Ave", "Blvd", "Way"], na),
        "ca_suite_number": [f"Suite {k % 90}" for k in range(na)],
        "ca_location_type": rng.choice(["apartment", "condo",
                                        "single family"], na),
        "ca_county": rng.choice(COUNTIES, na),
        "ca_state": rng.choice(STATES, na),
        "ca_zip": rng.choice(
            MAGIC_ZIPS + Q8_ZIPS + [f"{z:05d}" for z in
                                    rng.integers(10000, 99999, 40)], na),
        "ca_country": rng.choice(
            ["United States", "Canada"], na, p=[0.95, 0.05]),
        "ca_gmt_offset": rng.choice([-5.0, -6.0, -7.0], na),
    })

    # cross-product demographics like dsdgen (gender x marital x education)
    cd = [(g, m, e) for g in ("M", "F") for m in MARITAL for e in EDUCATION]
    cd = cd * 8  # multiple sks share a profile, as in dsdgen
    ncd = len(cd)
    t["customer_demographics"] = pd.DataFrame({
        "cd_demo_sk": np.arange(ncd, dtype=np.int32),
        "cd_gender": [x[0] for x in cd],
        "cd_marital_status": [x[1] for x in cd],
        "cd_education_status": [x[2] for x in cd],
        "cd_dep_count": rng.integers(0, 7, ncd).astype(np.int32),
        "cd_dep_employed_count": rng.integers(0, 7, ncd).astype(np.int32),
        "cd_dep_college_count": rng.integers(0, 7, ncd).astype(np.int32),
        "cd_purchase_estimate": (rng.integers(1, 12, ncd) *
                                 500).astype(np.int32),
        "cd_credit_rating": rng.choice(["Low Risk", "Good", "High Risk",
                                        "Unknown"], ncd),
    })

    nib = n["income_band"]
    t["income_band"] = pd.DataFrame({
        "ib_income_band_sk": np.arange(nib, dtype=np.int32),
        "ib_lower_bound": (np.arange(nib) * 10_000).astype(np.int32),
        "ib_upper_bound": ((np.arange(nib) + 1) * 10_000).astype(np.int32),
    })

    nhd = n["household_demographics"]
    t["household_demographics"] = pd.DataFrame({
        "hd_demo_sk": np.arange(nhd, dtype=np.int32),
        "hd_income_band_sk": rng.integers(0, nib, nhd).astype(np.int32),
        "hd_buy_potential": rng.choice(BUY_POTENTIAL, nhd),
        "hd_dep_count": rng.integers(0, 10, nhd).astype(np.int32),
        "hd_vehicle_count": rng.integers(0, 7, nhd).astype(np.int32),
    })

    nc = n["customer"]
    t["customer"] = pd.DataFrame({
        "c_customer_sk": np.arange(nc, dtype=np.int32),
        "c_customer_id": [f"CUST{k:010d}" for k in range(nc)],
        "c_first_name": rng.choice(FIRST_NAMES, nc),
        "c_last_name": rng.choice(LAST_NAMES, nc),
        "c_salutation": rng.choice(SALUTATIONS, nc),
        "c_preferred_cust_flag": rng.choice(["Y", "N"], nc),
        "c_birth_year": rng.integers(1930, 2000, nc).astype(np.int32),
        "c_birth_month": rng.integers(1, 13, nc).astype(np.int32),
        "c_birth_day": rng.integers(1, 29, nc).astype(np.int32),
        "c_birth_country": rng.choice(["UNITED STATES", "CANADA",
                                       "MEXICO"], nc),
        "c_login": [f"login{k}" for k in range(nc)],
        "c_email_address": [f"c{k}@example.com" for k in range(nc)],
        "c_last_review_date_sk": rng.integers(0, N_DAYS,
                                              nc).astype(np.int32),
        "c_current_addr_sk": rng.integers(0, na, nc).astype(np.int32),
        "c_current_cdemo_sk": rng.integers(0, ncd, nc).astype(np.int32),
        "c_current_hdemo_sk": rng.integers(0, nhd, nc).astype(np.int32),
        "c_first_sales_date_sk": rng.integers(0, N_DAYS,
                                              nc).astype(np.int32),
        "c_first_shipto_date_sk": rng.integers(0, N_DAYS,
                                               nc).astype(np.int32),
    })

    t["promotion"] = pd.DataFrame({
        "p_promo_sk": np.arange(n["promotion"], dtype=np.int32),
        "p_channel_email": rng.choice(["N", "Y"], n["promotion"]),
        "p_channel_event": rng.choice(["N", "Y"], n["promotion"]),
        "p_channel_dmail": rng.choice(["N", "Y"], n["promotion"]),
        "p_channel_tv": rng.choice(["N", "Y"], n["promotion"]),
    })

    nw = n["warehouse"]
    t["warehouse"] = pd.DataFrame({
        "w_warehouse_sk": np.arange(nw, dtype=np.int32),
        "w_warehouse_name": [f"Warehouse number {k} of many" for k in
                             range(nw)],
        "w_warehouse_sq_ft": ((np.arange(nw) + 1) *
                              50_000).astype(np.int32),
        "w_city": rng.choice(CITIES, nw),
        "w_county": rng.choice(COUNTIES, nw),
        "w_state": rng.choice(STATES[:8], nw),
        "w_country": np.array(["United States"] * nw, dtype=object),
    })

    t["ship_mode"] = pd.DataFrame({
        "sm_ship_mode_sk": np.arange(len(SM_TYPES) * 4, dtype=np.int32),
        "sm_type": SM_TYPES * 4,
        "sm_carrier": (["DHL", "BARIAN", "UPS", "FEDEX"] * 5),
    })

    t["web_site"] = pd.DataFrame({
        "web_site_sk": np.arange(n["web_site"], dtype=np.int32),
        "web_site_id": [f"SITE{k:08d}" for k in range(n["web_site"])],
        "web_name": [f"site_{k}" for k in range(n["web_site"])],
        "web_company_name": rng.choice(["pri", "able", "ese", "ought"],
                                       n["web_site"]),
    })

    t["catalog_page"] = pd.DataFrame({
        "cp_catalog_page_sk": np.arange(n["catalog_page"],
                                        dtype=np.int32),
        "cp_catalog_page_id": [f"PAGE{k:08d}"
                               for k in range(n["catalog_page"])],
    })

    t["web_page"] = pd.DataFrame({
        "wp_web_page_sk": np.arange(n["web_page"], dtype=np.int32),
        "wp_char_count": rng.integers(4000, 6200,
                                      n["web_page"]).astype(np.int32),
    })

    t["call_center"] = pd.DataFrame({
        "cc_call_center_sk": np.arange(n["call_center"], dtype=np.int32),
        "cc_call_center_id": [f"CC{k:08d}"
                              for k in range(n["call_center"])],
        "cc_name": [f"call center {k}" for k in range(n["call_center"])],
        "cc_manager": rng.choice(["Bob Belcher", "Felipe Perkins",
                                  "Mark Hightower", "Larry Mccray"],
                                 n["call_center"]),
        "cc_county": rng.choice(COUNTIES, n["call_center"]),
    })

    t["reason"] = pd.DataFrame({
        "r_reason_sk": np.arange(n["reason"], dtype=np.int32),
        "r_reason_desc": [f"reason {k}" for k in range(n["reason"])],
    })

    def item_fk(count):
        if skew > 0:
            hot = rng.random(count) < skew
            return np.where(hot, rng.integers(0, 3, count),
                            rng.integers(0, ni, count)).astype(np.int32)
        return rng.integers(0, ni, count).astype(np.int32)

    def nullable_fk(count, hi, frac=0.03):
        """dsdgen leaves some fks NULL (q76's IS NULL channels); NaN-backed
        float64 + validity at the block boundary."""
        v = rng.integers(0, hi, count).astype(np.float64)
        v[rng.random(count) < frac] = np.nan
        return v

    def money(count, lo=0.0, hi=200.0):
        return (lo + rng.random(count) * (hi - lo)).round(2)

    # ---- store_sales + returns-from-sales ---------------------------------
    nss = n["store_sales"]
    quantity = rng.integers(1, 101, nss).astype(np.int32)
    sales_price = money(nss)
    list_price = (sales_price * (1.0 + rng.random(nss))).round(2)
    wholesale = (sales_price * rng.random(nss)).round(2)
    ss = pd.DataFrame({
        "ss_sold_date_sk": rng.integers(0, N_DAYS, nss).astype(np.int32),
        "ss_sold_time_sk": rng.integers(0, 1440, nss).astype(np.int32),
        "ss_item_sk": item_fk(nss),
        "ss_customer_sk": rng.integers(0, nc, nss).astype(np.int32),
        "ss_cdemo_sk": rng.integers(0, ncd, nss).astype(np.int32),
        "ss_hdemo_sk": rng.integers(0, nhd, nss).astype(np.int32),
        "ss_addr_sk": nullable_fk(nss, na, 0.03),
        "ss_store_sk": nullable_fk(nss, ns_, 0.02),
        "ss_promo_sk": rng.integers(0, n["promotion"], nss).astype(np.int32),
        # several line items share one ticket (dsdgen sells baskets)
        "ss_ticket_number": rng.integers(0, max(nss // 4, 1),
                                         nss).astype(np.int32),
        "ss_quantity": quantity,
        "ss_sales_price": sales_price,
        "ss_list_price": list_price,
        "ss_wholesale_cost": wholesale,
        "ss_net_paid": (sales_price * quantity * 0.97).round(2),
        "ss_ext_sales_price": (sales_price * quantity).round(2),
        "ss_ext_list_price": (list_price * quantity).round(2),
        "ss_ext_wholesale_cost": (wholesale * quantity).round(2),
        "ss_ext_tax": (sales_price * quantity * 0.08).round(2),
        "ss_coupon_amt": money(nss, 0, 40),
        "ss_ext_discount_amt": money(nss, 0, 60),
        "ss_net_profit": (rng.normal(25, 120, nss)).round(2),
    })
    t["store_sales"] = ss

    nsr = min(n["store_returns"], nss)
    picks = rng.choice(nss, nsr, replace=False)
    sold = ss["ss_sold_date_sk"].to_numpy()[picks]
    t["store_returns"] = pd.DataFrame({
        "sr_returned_date_sk": np.minimum(
            sold + rng.integers(1, 150, nsr), N_DAYS - 1).astype(np.int32),
        "sr_item_sk": ss["ss_item_sk"].to_numpy()[picks],
        "sr_customer_sk": ss["ss_customer_sk"].to_numpy()[picks],
        "sr_cdemo_sk": ss["ss_cdemo_sk"].to_numpy()[picks],
        "sr_store_sk": np.nan_to_num(
            ss["ss_store_sk"].to_numpy()[picks]).astype(np.int32),
        "sr_ticket_number": ss["ss_ticket_number"].to_numpy()[picks],
        "sr_reason_sk": rng.integers(0, n["reason"], nsr).astype(np.int32),
        "sr_return_quantity": rng.integers(
            1, 1 + ss["ss_quantity"].to_numpy()[picks]).astype(np.int32),
        "sr_return_amt": (rng.random(nsr) ** 4 * 20_000).round(2),
        "sr_net_loss": money(nsr, 0, 300),
    })

    # ---- catalog_sales + returns ------------------------------------------
    ncs = n["catalog_sales"]
    cquantity = rng.integers(1, 101, ncs).astype(np.int32)
    csales = money(ncs)
    cs_sold = rng.integers(0, N_DAYS - 130, ncs).astype(np.int32)
    cs = pd.DataFrame({
        "cs_sold_date_sk": cs_sold,
        "cs_sold_time_sk": rng.integers(0, 1440, ncs).astype(np.int32),
        "cs_ship_date_sk": (cs_sold +
                            rng.integers(1, 130, ncs)).astype(np.int32),
        "cs_item_sk": item_fk(ncs),
        "cs_bill_customer_sk": rng.integers(0, nc, ncs).astype(np.int32),
        "cs_ship_customer_sk": rng.integers(0, nc, ncs).astype(np.int32),
        "cs_bill_cdemo_sk": rng.integers(0, ncd, ncs).astype(np.int32),
        "cs_bill_hdemo_sk": rng.integers(0, 720, ncs).astype(np.int32),
        "cs_bill_addr_sk": rng.integers(0, na, ncs).astype(np.int32),
        "cs_ship_addr_sk": nullable_fk(ncs, na),
        "cs_warehouse_sk": rng.integers(0, nw, ncs).astype(np.int32),
        "cs_ship_mode_sk": rng.integers(0, len(SM_TYPES) * 4,
                                        ncs).astype(np.int32),
        "cs_call_center_sk": rng.integers(0, n["call_center"],
                                          ncs).astype(np.int32),
        "cs_promo_sk": rng.integers(0, n["promotion"], ncs).astype(np.int32),
        "cs_catalog_page_sk": rng.integers(0, n["catalog_page"],
                                           ncs).astype(np.int32),
        "cs_order_number": rng.integers(0, max(ncs // 3, 1),
                                        ncs).astype(np.int32),
        "cs_quantity": cquantity,
        "cs_sales_price": csales,
        "cs_list_price": (csales * (1.0 + rng.random(ncs))).round(2),
        "cs_wholesale_cost": (csales * 0.6).round(2),
        "cs_ext_sales_price": (csales * cquantity).round(2),
        "cs_ext_list_price": (csales * cquantity * 1.3).round(2),
        "cs_ext_wholesale_cost": (csales * cquantity * 0.6).round(2),
        "cs_coupon_amt": money(ncs, 0, 40),
        "cs_ext_discount_amt": money(ncs, 0, 60),
        "cs_ext_ship_cost": money(ncs, 0, 50),
        "cs_net_paid": (csales * cquantity * 0.97).round(2),
        "cs_net_paid_inc_tax": (csales * cquantity * 1.08).round(2),
        "cs_net_profit": (rng.normal(25, 120, ncs)).round(2),
    })
    t["catalog_sales"] = cs

    ncr = min(n["catalog_returns"], ncs)
    picks = rng.choice(ncs, ncr, replace=False)
    t["catalog_returns"] = pd.DataFrame({
        "cr_returned_date_sk": np.minimum(
            cs["cs_sold_date_sk"].to_numpy()[picks] +
            rng.integers(1, 120, ncr), N_DAYS - 1).astype(np.int32),
        "cr_item_sk": cs["cs_item_sk"].to_numpy()[picks],
        "cr_order_number": cs["cs_order_number"].to_numpy()[picks],
        "cr_refunded_cash": money(ncr, 0, 400),
        "cr_reversed_charge": money(ncr, 0, 200),
        "cr_store_credit": money(ncr, 0, 200),
        "cr_returning_customer_sk": cs["cs_bill_customer_sk"]
            .to_numpy()[picks],
        "cr_returning_addr_sk": rng.integers(0, na, ncr).astype(np.int32),
        "cr_call_center_sk": rng.integers(0, n["call_center"],
                                          ncr).astype(np.int32),
        "cr_return_amt_inc_tax": money(ncr, 0, 550),
        "cr_net_loss": money(ncr, 0, 300),
        "cr_catalog_page_sk": cs["cs_catalog_page_sk"].to_numpy()[picks],
        "cr_return_amount": (rng.random(ncr) ** 4 * 20_000).round(2),
        "cr_return_quantity": rng.integers(
            1, 1 + cs["cs_quantity"].to_numpy()[picks]).astype(np.int32),
    })

    # ---- web_sales + returns ----------------------------------------------
    nws = n["web_sales"]
    wquantity = rng.integers(1, 101, nws).astype(np.int32)
    wsales = money(nws)
    ws_sold = rng.integers(0, N_DAYS - 130, nws).astype(np.int32)
    ws = pd.DataFrame({
        "ws_sold_date_sk": ws_sold,
        "ws_sold_time_sk": rng.integers(0, 1440, nws).astype(np.int32),
        "ws_ship_date_sk": (ws_sold +
                            rng.integers(1, 130, nws)).astype(np.int32),
        "ws_item_sk": item_fk(nws),
        "ws_bill_customer_sk": rng.integers(0, nc, nws).astype(np.int32),
        "ws_bill_addr_sk": rng.integers(0, na, nws).astype(np.int32),
        "ws_ship_customer_sk": nullable_fk(nws, nc),
        "ws_ship_addr_sk": rng.integers(0, na, nws).astype(np.int32),
        "ws_ship_hdemo_sk": rng.integers(0, nhd, nws).astype(np.int32),
        "ws_web_page_sk": rng.integers(0, n["web_page"],
                                       nws).astype(np.int32),
        "ws_web_site_sk": rng.integers(0, n["web_site"],
                                       nws).astype(np.int32),
        "ws_promo_sk": rng.integers(0, n["promotion"],
                                    nws).astype(np.int32),
        "ws_ship_mode_sk": rng.integers(0, len(SM_TYPES) * 4,
                                        nws).astype(np.int32),
        "ws_warehouse_sk": rng.integers(0, nw, nws).astype(np.int32),
        # a few line items share an order, possibly from DIFFERENT
        # warehouses (q94's EXISTS needs both cases present)
        "ws_order_number": rng.integers(0, max(nws // 2, 1),
                                        nws).astype(np.int32),
        "ws_quantity": wquantity,
        "ws_sales_price": wsales,
        "ws_list_price": (wsales * (1.0 + rng.random(nws))).round(2),
        "ws_wholesale_cost": (wsales * 0.6).round(2),
        "ws_ext_sales_price": (wsales * wquantity).round(2),
        "ws_ext_list_price": (wsales * wquantity * 1.3).round(2),
        "ws_ext_ship_cost": money(nws, 0, 50),
        "ws_ext_discount_amt": money(nws, 0, 60),
        "ws_ext_wholesale_cost": (wsales * wquantity * 0.6).round(2),
        "ws_net_profit": (rng.normal(25, 120, nws)).round(2),
        "ws_net_paid": (wsales * wquantity * 0.97).round(2),
    })
    t["web_sales"] = ws

    nwr = min(n["web_returns"], nws)
    picks = rng.choice(nws, nwr, replace=False)
    t["web_returns"] = pd.DataFrame({
        "wr_returned_date_sk": np.minimum(
            ws["ws_sold_date_sk"].to_numpy()[picks] +
            rng.integers(1, 120, nwr), N_DAYS - 1).astype(np.int32),
        "wr_item_sk": ws["ws_item_sk"].to_numpy()[picks],
        "wr_order_number": ws["ws_order_number"].to_numpy()[picks],
        "wr_refunded_cdemo_sk": rng.integers(0, ncd, nwr).astype(np.int32),
        "wr_returning_cdemo_sk": rng.integers(0, ncd, nwr).astype(np.int32),
        "wr_refunded_addr_sk": rng.integers(0, na, nwr).astype(np.int32),
        "wr_reason_sk": rng.integers(0, n["reason"], nwr).astype(np.int32),
        "wr_refunded_cash": money(nwr, 0, 400),
        "wr_fee": money(nwr, 0, 80),
        "wr_return_quantity": rng.integers(
            1, 1 + ws["ws_quantity"].to_numpy()[picks]).astype(np.int32),
        "wr_returning_customer_sk": ws["ws_bill_customer_sk"]
            .to_numpy()[picks],
        "wr_returning_addr_sk": rng.integers(0, na, nwr).astype(np.int32),
        # heavy-tailed: some returns clear q49's 10k threshold
        "wr_return_amt": (rng.random(nwr) ** 4 * 20_000).round(2),
        "wr_net_loss": money(nwr, 0, 300),
        "wr_web_page_sk": ws["ws_web_page_sk"].to_numpy()[picks],
    })

    # ---- inventory ---------------------------------------------------------
    ninv = n["inventory"]
    t["inventory"] = pd.DataFrame({
        # weekly snapshots like dsdgen (Mondays)
        "inv_date_sk": (rng.integers(0, N_DAYS // 7, ninv) * 7 +
                        1).astype(np.int32),
        "inv_item_sk": rng.integers(0, ni, ninv).astype(np.int32),
        "inv_warehouse_sk": rng.integers(0, nw, ninv).astype(np.int32),
        "inv_quantity_on_hand": rng.integers(0, 1000,
                                             ninv).astype(np.int32),
    })

    return t
