"""Seeded synthetic TPC-DS-shaped data.

The reference CI pulls a pre-generated 1GB dsdgen dataset
(/root/reference/.github/workflows/tpcds-reusable.yml:253-257); dsdgen is
not available offline, so this generator synthesizes the column subset our
query set touches, with TPC-DS-like shapes: skewed foreign keys, dated
dimensions, low-cardinality categorical strings. Correctness comes from the
differential oracle (same frames run through pandas), which is the
reference's own methodology (run vs vanilla engine, compare rows).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pandas as pd

BRANDS = [f"brand#{i}" for i in range(1, 61)]
CATEGORIES = ["Books", "Electronics", "Home", "Jewelry", "Men", "Music",
              "Shoes", "Sports", "Toys", "Women"]
STATES = ["TN", "CA", "TX", "NY", "WA", "GA", "OH", "IL", "FL", "MI"]


def scale_rows(sf: float) -> Dict[str, int]:
    """Row counts per table scaled from a tiny base (sf=1.0 ~ 'SF0.01')."""
    return {
        "store_sales": int(100_000 * sf),
        "store_returns": int(10_000 * sf),
        "item": max(int(2_000 * min(sf, 10)), 200),
        "date_dim": 2_000,
        "store": max(int(20 * min(sf, 10)), 5),
        "customer": max(int(10_000 * min(sf, 10)), 500),
    }


def generate(sf: float = 1.0, seed: int = 0,
             skew: float = 0.0) -> Dict[str, pd.DataFrame]:
    """skew > 0 concentrates item foreign keys on a few hot items
    (exercises the skew handler; BASELINE config #5)."""
    rng = np.random.default_rng(seed)
    n = scale_rows(sf)

    date_dim = pd.DataFrame({
        "d_date_sk": np.arange(n["date_dim"], dtype=np.int32),
        "d_year": 1998 + (np.arange(n["date_dim"]) // 365),
        "d_moy": 1 + (np.arange(n["date_dim"]) // 30) % 12,
        "d_dom": 1 + np.arange(n["date_dim"]) % 30,
    })

    item = pd.DataFrame({
        "i_item_sk": np.arange(n["item"], dtype=np.int32),
        "i_brand_id": rng.integers(1, 61, n["item"]).astype(np.int32),
        "i_manufact_id": rng.integers(1, 200, n["item"]).astype(np.int32),
        "i_manager_id": rng.integers(1, 100, n["item"]).astype(np.int32),
        "i_current_price": (rng.random(n["item"]) * 100).round(2),
        "i_category": rng.choice(CATEGORIES, n["item"]),
    })
    item["i_brand"] = [BRANDS[b - 1] for b in item["i_brand_id"]]

    store = pd.DataFrame({
        "s_store_sk": np.arange(n["store"], dtype=np.int32),
        "s_state": rng.choice(STATES, n["store"]),
    })

    customer = pd.DataFrame({
        "c_customer_sk": np.arange(n["customer"], dtype=np.int32),
        "c_customer_id": [f"CUST{i:010d}" for i in range(n["customer"])],
        "c_birth_year": rng.integers(1930, 2000,
                                     n["customer"]).astype(np.int32),
    })

    ns = n["store_sales"]
    if skew > 0:
        hot = rng.random(ns) < skew
        item_fk = np.where(hot, rng.integers(0, 3, ns),
                           rng.integers(0, n["item"], ns))
    else:
        item_fk = rng.integers(0, n["item"], ns)
    store_sales = pd.DataFrame({
        "ss_sold_date_sk": rng.integers(0, n["date_dim"],
                                        ns).astype(np.int32),
        "ss_item_sk": item_fk.astype(np.int32),
        "ss_customer_sk": rng.integers(0, n["customer"],
                                       ns).astype(np.int32),
        "ss_store_sk": rng.integers(0, n["store"], ns).astype(np.int32),
        "ss_quantity": rng.integers(1, 100, ns).astype(np.int32),
        "ss_ext_sales_price": (rng.random(ns) * 1000).round(2),
        "ss_net_profit": (rng.normal(0, 50, ns)).round(2),
    })

    nr = n["store_returns"]
    store_returns = pd.DataFrame({
        "sr_returned_date_sk": rng.integers(0, n["date_dim"],
                                            nr).astype(np.int32),
        "sr_customer_sk": rng.integers(0, n["customer"],
                                       nr).astype(np.int32),
        "sr_store_sk": rng.integers(0, n["store"], nr).astype(np.int32),
        "sr_return_amt": (rng.random(nr) * 500).round(2),
    })

    return {"date_dim": date_dim, "item": item, "store": store,
            "customer": customer, "store_sales": store_sales,
            "store_returns": store_returns}
