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
    # tickets are COHERENT baskets, like dsdgen: one (customer, date,
    # store, demographics) per ticket, several line items; a small share
    # of baskets is big (15-25 items) — q34/q73-class count-per-ticket
    # windows are structurally empty when ticket attributes are drawn
    # per ROW (no 15-row group ever shares a customer+date+store)
    sizes = rng.choice(np.array([1, 2, 3, 4, 5, 6, 16, 18, 21]),
                       size=max(nss // 3, 4),
                       p=[.22, .26, .2, .14, .09, .05, .015, .015, .01])
    tkt = np.repeat(np.arange(sizes.size), sizes)[:nss]
    if tkt.size < nss:  # top up with singleton tickets
        tkt = np.concatenate([tkt, np.arange(
            sizes.size, sizes.size + nss - tkt.size)])
    ntk = int(tkt.max()) + 1
    tk_date = rng.integers(0, N_DAYS, ntk).astype(np.int32)
    tk_time = rng.integers(0, 1440, ntk).astype(np.int32)
    tk_cust = rng.integers(0, nc, ntk).astype(np.int32)
    tk_cdemo = rng.integers(0, ncd, ntk).astype(np.int32)
    tk_hdemo = rng.integers(0, nhd, ntk).astype(np.int32)
    tk_addr = nullable_fk(ntk, na, 0.03)
    tk_store = nullable_fk(ntk, ns_, 0.02)
    tk_promo = rng.integers(0, n["promotion"], ntk).astype(np.int32)
    ss = pd.DataFrame({
        "ss_sold_date_sk": tk_date[tkt],
        "ss_sold_time_sk": tk_time[tkt],
        "ss_item_sk": item_fk(nss),
        "ss_customer_sk": tk_cust[tkt],
        "ss_cdemo_sk": tk_cdemo[tkt],
        "ss_hdemo_sk": tk_hdemo[tkt],
        "ss_addr_sk": tk_addr[tkt],
        "ss_store_sk": tk_store[tkt],
        "ss_promo_sk": tk_promo[tkt],
        "ss_ticket_number": tkt.astype(np.int32),
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
    # repurchase slice: a share of store RETURNS is followed by a catalog
    # purchase of the SAME item by the SAME customer shortly after — the
    # q17/q25/q29 sale->return->repurchase triangle has probability ~0
    # under independent FKs (those queries were structurally empty at
    # every sf; caught by the sqlite independent-oracle zero-row audit)
    sr_df = t["store_returns"]
    nrep = max(len(sr_df) // 2, 1)
    rep = rng.choice(len(sr_df), nrep, replace=False)
    clone = cs.iloc[rng.choice(ncs, nrep)].reset_index(drop=True)
    clone["cs_item_sk"] = sr_df["sr_item_sk"].to_numpy()[rep]
    clone["cs_bill_customer_sk"] = \
        sr_df["sr_customer_sk"].to_numpy()[rep]
    rep_sold = np.minimum(
        sr_df["sr_returned_date_sk"].to_numpy()[rep] +
        rng.integers(1, 80, nrep), N_DAYS - 131).astype(np.int32)
    clone["cs_sold_date_sk"] = rep_sold
    clone["cs_ship_date_sk"] = (rep_sold +
                                rng.integers(1, 130, nrep)).astype(np.int32)
    cs = pd.concat([cs, clone], ignore_index=True)
    ncs = len(cs)
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
    # cross-channel echo: a slice of web sales shares (item, customer)
    # with store sales — q78/q23b/q54-class channel-overlap queries need
    # the same buyer on both channels to exist at small sf
    necho = max(nss // 25, 1)
    epk = rng.choice(nss, necho, replace=False)
    wclone = ws.iloc[rng.choice(nws, necho)].reset_index(drop=True)
    wclone["ws_item_sk"] = ss["ss_item_sk"].to_numpy()[epk]
    wclone["ws_bill_customer_sk"] = ss["ss_customer_sk"].to_numpy()[epk]
    wclone["ws_sold_date_sk"] = np.minimum(
        ss["ss_sold_date_sk"].to_numpy()[epk] +
        rng.integers(0, 60, necho), N_DAYS - 131).astype(np.int32)
    ws = pd.concat([ws, wclone], ignore_index=True)
    nws = len(ws)
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

    # cross-channel returned items: the SAME items come back through all
    # three channels during q83's three literal weeks — zero-probability
    # under independent picks (q83 matched on 0 rows at every sf)
    hot = rng.choice(ni, max(ni // 250, 8), replace=False).astype(np.int32)
    weeks = [date_sk("2000-06-30"), date_sk("2000-09-27"),
             date_sk("2000-11-17")]
    nx = hot.size * len(weeks)
    hot_items = np.tile(hot, len(weeks))
    hot_dates = np.repeat(np.asarray(weeks, np.int32), hot.size) + \
        rng.integers(-2, 3, nx).astype(np.int32)
    for tbl, item_c, date_c in (("store_returns", "sr_item_sk",
                                 "sr_returned_date_sk"),
                                ("catalog_returns", "cr_item_sk",
                                 "cr_returned_date_sk"),
                                ("web_returns", "wr_item_sk",
                                 "wr_returned_date_sk")):
        base = t[tbl]
        xc = base.iloc[rng.choice(len(base), nx)].reset_index(drop=True)
        xc[item_c] = hot_items
        xc[date_c] = hot_dates
        t[tbl] = pd.concat([base, xc], ignore_index=True)

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
    # dense high-variance grid over (warehouse x hot items x weekly dates
    # in 2000-02..2000-04 and 2001-01..2001-02): q21's before/after ratio
    # and q39's cov = std/mean > 1 windows need REPEATED (w, i, month)
    # observations with spread — 40k random rows over a 20k-item space
    # give at most one row per pair (cov undefined, q39 empty at any sf)
    gi = rng.choice(ni, max(ni // 200, 12), replace=False).astype(np.int32)
    gdates = np.concatenate([
        np.arange(date_sk("2000-02-14"), date_sk("2000-04-10"), 7),
        np.arange(date_sk("2001-01-01"), date_sk("2001-03-01"), 7),
    ]).astype(np.int32)
    gw = np.arange(nw, dtype=np.int32)
    grid_i, grid_d, grid_w = [a.ravel() for a in
                              np.meshgrid(gi, gdates, gw, indexing="ij")]
    ng = grid_i.size
    # lognormal-ish mixture: mean ~ hundreds, std > mean -> cov > 1
    gq = np.where(rng.random(ng) < 0.55,
                  rng.integers(0, 60, ng),
                  rng.integers(600, 2200, ng)).astype(np.int32)
    t["inventory"] = pd.concat([t["inventory"], pd.DataFrame({
        "inv_date_sk": grid_d, "inv_item_sk": grid_i,
        "inv_warehouse_sk": grid_w, "inv_quantity_on_hand": gq,
    })], ignore_index=True)

    _correlation_seeds(t, rng, gi)
    return t


def _correlation_seeds(t, rng, grid_items):
    """Small fixed-size slices that give structurally-empty TPC-DS
    predicates a non-zero support (the zero-row audit: a query that
    matches its oracle on 0 rows proves nothing — round-2 verdict weak
    #3). dsdgen's real distributions have these correlations; the
    independent draws above do not. Every oracle recomputes from the
    same tables, so the differentials stay exact."""
    import pandas as pd

    ss, cs, ws = t["store_sales"], t["catalog_sales"], t["web_sales"]
    item, cust, addr = t["item"], t["customer"], t["customer_address"]

    # q54 prerequisite: the Women x maternity joint (1/~250 per item) can
    # come up EMPTY at small sf — pin a handful of items so the funnel
    # below has a base population (joint attribute pinning is what dsdgen
    # distributions give for free)
    pin54 = rng.choice(len(item), 8, replace=False)
    t["item"].loc[pin54, "i_category"] = "Women"
    t["item"].loc[pin54, "i_class"] = "maternity"

    # q21: the inventory-grid items must hit the 0.99..1.49 price band
    t["item"].loc[t["item"]["i_item_sk"].isin(grid_items[::2]),
                  "i_current_price"] = 1.19

    # q58: ~the same revenue for the same items across all 3 channels in
    # the week of 2000-01-03
    wk = date_sk("2000-01-03")
    hot58 = rng.choice(len(item), 20, replace=False).astype(np.int32)
    for frame_name, ic, dc, xc in (
            ("store_sales", "ss_item_sk", "ss_sold_date_sk",
             "ss_ext_sales_price"),
            ("catalog_sales", "cs_item_sk", "cs_sold_date_sk",
             "cs_ext_sales_price"),
            ("web_sales", "ws_item_sk", "ws_sold_date_sk",
             "ws_ext_sales_price")):
        base = t[frame_name]
        sl = base.iloc[rng.choice(len(base), hot58.size)].reset_index(
            drop=True)
        sl[ic] = hot58
        sl[dc] = (wk + rng.integers(-1, 2, hot58.size)).astype(np.int32)
        sl[xc] = 40_000.0 + hot58 * 3.0  # identical per item per channel
        if frame_name == "store_sales":
            sl["ss_ticket_number"] = (base["ss_ticket_number"].max() + 1 +
                                      np.arange(hot58.size)).astype(np.int32)
        t[frame_name] = pd.concat([base, sl], ignore_index=True)
    ss, cs, ws = t["store_sales"], t["catalog_sales"], t["web_sales"]

    # q78 / q23b: heavy shoppers buying HOT items repeatedly on the same
    # day in store, echoed on catalog+web (frequent-item x best-customer
    # cross-channel overlap)
    heavy_c = rng.choice(len(cust), 24, replace=False).astype(np.int32)
    hot_i = rng.choice(len(item), 16, replace=False).astype(np.int32)
    days = np.concatenate([
        np.arange(date_sk("2000-03-01"), date_sk("2000-03-31"), 2),
        [date_sk("2000-02-10"), date_sk("2000-02-17")]]).astype(np.int32)
    reps = 6
    si = np.tile(np.repeat(hot_i, reps), days.size)
    sd = np.repeat(days, hot_i.size * reps)
    nsl = si.size
    sl = ss.iloc[rng.choice(len(ss), nsl)].reset_index(drop=True)
    sl["ss_item_sk"] = si
    sl["ss_sold_date_sk"] = sd
    sl["ss_customer_sk"] = rng.choice(heavy_c, nsl)
    sl["ss_ticket_number"] = (ss["ss_ticket_number"].max() + 1 +
                              np.arange(nsl)).astype(np.int32)
    t["store_sales"] = pd.concat([ss, sl], ignore_index=True)
    for frame_name, ic, dc, cc in (
            ("catalog_sales", "cs_item_sk", "cs_sold_date_sk",
             "cs_bill_customer_sk"),
            ("web_sales", "ws_item_sk", "ws_sold_date_sk",
             "ws_bill_customer_sk")):
        base = t[frame_name]
        k = nsl // 4
        pick = rng.choice(nsl, k, replace=False)
        e = base.iloc[rng.choice(len(base), k)].reset_index(drop=True)
        e[ic] = si[pick]
        e[cc] = sl["ss_customer_sk"].to_numpy()[pick]
        e[dc] = rng.choice([date_sk("2000-02-05"), date_sk("2000-02-20"),
                            date_sk("2000-03-15")], k).astype(np.int32)
        t[frame_name] = pd.concat([base, e], ignore_index=True)

    # q85: the refunding and returning party are usually the SAME person
    wr = t["web_returns"]
    half = rng.random(len(wr)) < 0.6
    wr.loc[half, "wr_returning_cdemo_sk"] = \
        wr.loc[half, "wr_refunded_cdemo_sk"]

    # q85: appended ws<->wr pairs that clear the triple-compound filter
    # (matching refunded==returning cdemo at M/Advanced Degree, refund
    # address in the state list, price+profit in band, sold in 2000)
    cdm = t["customer_demographics"]
    cd85 = cdm[(cdm.cd_marital_status == "M") &
               (cdm.cd_education_status == "Advanced Degree")][
        "cd_demo_sk"].to_numpy()
    ad85 = addr[(addr.ca_state == "OH") &
                (addr.ca_country == "United States")][
        "ca_address_sk"].to_numpy()
    if cd85.size and ad85.size:
        k85 = 40
        wsb, wrb = t["web_sales"], t["web_returns"]
        order0 = int(wsb["ws_order_number"].max()) + 1
        e = wsb.iloc[rng.choice(len(wsb), k85)].reset_index(drop=True)
        e["ws_order_number"] = (order0 + np.arange(k85)).astype(np.int32)
        e["ws_sold_date_sk"] = rng.integers(
            date_sk("2000-01-05"), date_sk("2000-12-20"), k85).astype(
                np.int32)
        e["ws_sales_price"] = 120.0
        e["ws_net_profit"] = 150.0
        r = wrb.iloc[rng.choice(len(wrb), k85)].reset_index(drop=True)
        r["wr_item_sk"] = e["ws_item_sk"].to_numpy()
        r["wr_order_number"] = e["ws_order_number"].to_numpy()
        r["wr_refunded_cdemo_sk"] = rng.choice(cd85, k85)
        r["wr_returning_cdemo_sk"] = r["wr_refunded_cdemo_sk"]
        r["wr_refunded_addr_sk"] = rng.choice(ad85, k85)
        t["web_sales"] = pd.concat([wsb, e], ignore_index=True)
        t["web_returns"] = pd.concat([wrb, r], ignore_index=True)

    # q91: catalog returns in 1998-11 by customers whose demographics
    # pass the (M/Unknown | W/Advanced Degree) x 'Unknown%' buy potential
    # x gmt -7 funnel — compounding 1/35 x 1/7 x 1/3 never survives the
    # thin monthly slice otherwise
    cd, hd = t["customer_demographics"], t["household_demographics"]
    cd_ok = cd[((cd.cd_marital_status == "M") &
                (cd.cd_education_status == "Unknown")) |
               ((cd.cd_marital_status == "W") &
                (cd.cd_education_status == "Advanced Degree"))][
        "cd_demo_sk"].to_numpy()
    hd_ok = hd[hd.hd_buy_potential.str.startswith("Unknown")][
        "hd_demo_sk"].to_numpy()
    ad_ok = addr[addr.ca_gmt_offset == -7.0]["ca_address_sk"].to_numpy()
    c91 = rng.choice(len(cust), 30, replace=False)
    t["customer"].loc[c91, "c_current_cdemo_sk"] = rng.choice(cd_ok, 30)
    t["customer"].loc[c91, "c_current_hdemo_sk"] = rng.choice(hd_ok, 30)
    t["customer"].loc[c91, "c_current_addr_sk"] = rng.choice(ad_ok, 30)
    cr = t["catalog_returns"]
    csl = cr.iloc[rng.choice(len(cr), 60)].reset_index(drop=True)
    csl["cr_returned_date_sk"] = rng.integers(
        date_sk("1998-11-01"), date_sk("1998-11-30"), 60).astype(np.int32)
    csl["cr_returning_customer_sk"] = rng.choice(
        cust["c_customer_sk"].to_numpy()[c91], 60)
    t["catalog_returns"] = pd.concat([cr, csl], ignore_index=True)

    # q54: Women/maternity catalog buyers in 1998-12 whose address county
    # matches a store's, with store revenue in the following quarter
    mat = item[(item.i_category == "Women") &
               (item.i_class == "maternity")]["i_item_sk"].to_numpy()
    if mat.size:
        store = t["store"]
        c54 = rng.choice(len(cust), 25, replace=False)
        a54 = np.asarray(cust["c_current_addr_sk"].to_numpy()[c54],
                         dtype=np.int64) % len(addr)
        t["customer_address"].loc[a54, "ca_county"] = \
            store["s_county"].iloc[0]
        t["customer_address"].loc[a54, "ca_state"] = \
            store["s_state"].iloc[0]
        cs2 = t["catalog_sales"]
        e = cs2.iloc[rng.choice(len(cs2), 25)].reset_index(drop=True)
        e["cs_item_sk"] = rng.choice(mat, 25)
        e["cs_bill_customer_sk"] = cust["c_customer_sk"].to_numpy()[c54]
        e["cs_sold_date_sk"] = rng.integers(
            date_sk("1998-12-01"), date_sk("1998-12-31"), 25).astype(
                np.int32)
        t["catalog_sales"] = pd.concat([cs2, e], ignore_index=True)
        ss2 = t["store_sales"]
        k = 80
        e2 = ss2.iloc[rng.choice(len(ss2), k)].reset_index(drop=True)
        e2["ss_customer_sk"] = rng.choice(
            cust["c_customer_sk"].to_numpy()[c54], k)
        e2["ss_store_sk"] = float(store["s_store_sk"].iloc[0])
        e2["ss_sold_date_sk"] = rng.integers(
            date_sk("1999-01-01"), date_sk("1999-03-28"), k).astype(
                np.int32)
        e2["ss_ticket_number"] = (ss2["ss_ticket_number"].max() + 1 +
                                  np.arange(k)).astype(np.int32)
        t["store_sales"] = pd.concat([ss2, e2], ignore_index=True)

    _zero_row_seeds2(t, rng)


def _zero_row_seeds2(t, rng):
    """Second zero-row batch (q34/q73 tickets, q41 attribute combos, q71
    meal-time sales, q37/q82 priced inventory) — the remaining queries the
    sf=0.2 oracle audit found matching on zero rows."""
    import pandas as pd

    item, store, dd = t["item"], t["store"], t["date_dim"]
    hd = t["household_demographics"]

    # ---- q34/q73: coherent tickets clearing the whole compound filter ----
    ok = (hd.hd_buy_potential.isin([">10000", "unknown"]) &
          (hd.hd_vehicle_count > 0) &
          (hd.hd_dep_count / hd.hd_vehicle_count > 1.2))
    if not ok.any():
        fix = rng.choice(len(hd), 4, replace=False)
        t["household_demographics"].loc[fix, "hd_buy_potential"] = ">10000"
        t["household_demographics"].loc[fix, "hd_vehicle_count"] = 2
        t["household_demographics"].loc[fix, "hd_dep_count"] = 5
        hd = t["household_demographics"]
        ok = (hd.hd_buy_potential.isin([">10000", "unknown"]) &
              (hd.hd_vehicle_count > 0) &
              (hd.hd_dep_count / hd.hd_vehicle_count > 1.2))
    hd_ok = hd[ok]["hd_demo_sk"].to_numpy()
    will = store[store.s_county == "Williamson County"][
        "s_store_sk"].to_numpy()
    if will.size == 0:
        # store 0 anchors the q54 county/state match — pin a LATER store
        t["store"].loc[len(store) - 1, "s_county"] = "Williamson County"
        will = np.array([len(store) - 1], np.int32)
    days12 = dd[(dd.d_dom >= 1) & (dd.d_dom <= 2) &
                dd.d_year.isin([1999, 2000, 2001])]["d_date_sk"].to_numpy()
    # cnt windows: q34 wants 15..20 per ticket, q73 wants 1..5
    sizes = [16, 17, 18, 19] + [2, 3, 4, 2, 3, 5]
    ss = t["store_sales"]
    tkt0 = int(ss["ss_ticket_number"].max()) + 1
    total = sum(sizes)
    base = ss.iloc[rng.choice(len(ss), total)].reset_index(drop=True)
    tkt = np.repeat(np.arange(len(sizes)), sizes)
    base["ss_ticket_number"] = (tkt0 + tkt).astype(np.int32)
    nt = len(sizes)
    base["ss_sold_date_sk"] = rng.choice(days12, nt)[tkt].astype(np.int32)
    base["ss_store_sk"] = rng.choice(will, nt)[tkt].astype(
        base["ss_store_sk"].dtype)
    base["ss_hdemo_sk"] = rng.choice(hd_ok, nt)[tkt].astype(np.int32)
    base["ss_customer_sk"] = rng.integers(
        0, len(t["customer"]), nt)[tkt].astype(np.int32)
    t["store_sales"] = pd.concat([ss, base], ignore_index=True)

    # ---- q41: manufacturer groups containing the literal attribute combos
    combos = [("Women", "powder", "Ounce", "medium"),
              ("Women", "brown", "Bunch", "N/A"),
              ("Men", "floral", "N/A", "petite"),
              ("Men", "light", "Box", "medium"),
              ("Women", "midnight", "Pallet", "medium"),
              ("Men", "forest", "Lb", "extra large")]
    lo = max(len(item) // 200, 3)  # rows < lo carry q3's pinned manufact 128
    pick41 = lo + rng.choice(len(item) - lo, len(combos), replace=False)
    for r, (cat, color, units, size) in zip(pick41, combos):
        mid = int(rng.integers(738, 779))
        t["item"].loc[r, ["i_manufact_id", "i_manufact", "i_category",
                          "i_color", "i_units", "i_size"]] = \
            [mid, f"manufact#{mid % 100}", cat, color, units, size]

    # ---- q37/q82: priced items with in-window inventory + channel sales
    pick = lo + rng.choice(len(item) - lo, 8, replace=False)
    it37, it82 = pick[:4], pick[4:]
    t["item"].loc[it37, "i_manufact_id"] = np.array(
        [677, 940, 694, 808], np.int32)
    t["item"].loc[it37, "i_current_price"] = 80.0   # q37 band 68..98
    t["item"].loc[it82, "i_manufact_id"] = np.array(
        [129, 270, 821, 423], np.int32)
    t["item"].loc[it82, "i_current_price"] = 70.0   # q82 band 62..92
    inv_rows = []
    for items, d0, d1 in ((it37, "2000-02-03", "2000-03-28"),
                          (it82, "2000-05-27", "2000-07-20")):
        ds = np.arange(date_sk(d0), date_sk(d1), 9, dtype=np.int32)
        ii, dd2 = [a.ravel() for a in np.meshgrid(items, ds, indexing="ij")]
        inv_rows.append(pd.DataFrame({
            "inv_date_sk": dd2, "inv_item_sk": ii.astype(np.int32),
            "inv_warehouse_sk": rng.integers(
                0, len(t["warehouse"]),
                ii.size).astype(np.int32),
            "inv_quantity_on_hand": rng.integers(
                100, 501, ii.size).astype(np.int32)}))
    t["inventory"] = pd.concat([t["inventory"]] + inv_rows,
                               ignore_index=True)
    cs = t["catalog_sales"]
    e = cs.iloc[rng.choice(len(cs), 12)].reset_index(drop=True)
    e["cs_item_sk"] = np.tile(it37, 3).astype(np.int32)
    t["catalog_sales"] = pd.concat([cs, e], ignore_index=True)
    ss = t["store_sales"]
    e = ss.iloc[rng.choice(len(ss), 12)].reset_index(drop=True)
    e["ss_item_sk"] = np.tile(it82, 3).astype(np.int32)
    e["ss_ticket_number"] = (ss["ss_ticket_number"].max() + 1 +
                             np.arange(12)).astype(np.int32)
    t["store_sales"] = pd.concat([ss, e], ignore_index=True)

    # ---- q71: manager-1 brands sold at breakfast/dinner in 1999-11 ------
    mgr1 = item[item.i_manager_id == 1]["i_item_sk"].to_numpy()
    if mgr1.size == 0:
        r = lo + rng.choice(len(item) - lo, 4, replace=False)
        t["item"].loc[r, "i_manager_id"] = 1
        mgr1 = np.asarray(r, np.int32)
    nov99 = dd[(dd.d_moy == 11) & (dd.d_year == 1999)][
        "d_date_sk"].to_numpy()
    meals = np.concatenate([np.arange(6 * 60, 9 * 60),
                            np.arange(17 * 60, 20 * 60)])
    k71 = 24
    for tbl, ic, dc, tc, extra in (
            ("store_sales", "ss_item_sk", "ss_sold_date_sk",
             "ss_sold_time_sk", "ss_ticket_number"),
            ("catalog_sales", "cs_item_sk", "cs_sold_date_sk",
             "cs_sold_time_sk", None),
            ("web_sales", "ws_item_sk", "ws_sold_date_sk",
             "ws_sold_time_sk", None)):
        base2 = t[tbl]
        e = base2.iloc[rng.choice(len(base2), k71)].reset_index(drop=True)
        e[ic] = rng.choice(mgr1, k71).astype(np.int32)
        e[dc] = rng.choice(nov99, k71).astype(np.int32)
        e[tc] = rng.choice(meals, k71).astype(np.int32)
        if extra is not None:
            e[extra] = (base2[extra].max() + 1 +
                        np.arange(k71)).astype(np.int32)
        t[tbl] = pd.concat([base2, e], ignore_index=True)
