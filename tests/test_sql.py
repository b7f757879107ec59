"""SQL front-end differential tests: text -> wire JSON -> engine, compared
against pandas. Proves the plan contract is front-end-neutral (the
reference's auron-flink role, SURVEY §2.3)."""

import numpy as np
import pandas as pd
import pytest

import auron_tpu.sql  # installs Session.sql
from auron_tpu.plan import Session
from auron_tpu.sql import compile_sql, run_sql


@pytest.fixture
def sess(rng):
    n = 3000
    sales = pd.DataFrame({
        "item": rng.integers(0, 40, n).astype(np.int64),
        "store": rng.integers(0, 6, n).astype(np.int64),
        "qty": rng.integers(1, 20, n).astype(np.int64),
        "price": (rng.random(n) * 90 + 10).round(2),
    })
    items = pd.DataFrame({
        "id": np.arange(40, dtype=np.int64),
        "brand": rng.choice(["acme", "blorx", "corp"], 40),
        "cat": rng.choice(["a", "b"], 40),
    })
    s = Session()
    s.register_pandas("sales", sales, num_partitions=2)
    s.register_pandas("items", items)
    return s, sales, items


def test_sql_goes_through_wire(sess):
    s, sales, items = sess
    wire = compile_sql("SELECT item, qty FROM sales WHERE qty > 10", s)
    assert isinstance(wire, str) and '"_t"' in wire  # JSON, not objects


def test_filter_project(sess):
    s, sales, _ = sess
    got = s.sql("SELECT item, qty * price AS amt FROM sales "
                "WHERE qty > 10 AND price < 50")
    want = sales[(sales["qty"] > 10) & (sales["price"] < 50)]
    assert len(got) == len(want)
    np.testing.assert_allclose(
        np.sort(got["amt"].to_numpy()),
        np.sort((want["qty"] * want["price"]).to_numpy()), rtol=1e-9)


def test_join_group_order_limit(sess):
    s, sales, items = sess
    got = s.sql(
        "SELECT brand, sum(price) AS rev, count(*) AS cnt "
        "FROM sales JOIN items ON item = id "
        "WHERE qty BETWEEN 2 AND 15 "
        "GROUP BY brand ORDER BY rev DESC, brand LIMIT 2")
    j = sales[(sales["qty"] >= 2) & (sales["qty"] <= 15)].merge(
        items, left_on="item", right_on="id")
    want = j.groupby("brand").agg(rev=("price", "sum"),
                                  cnt=("price", "size")).reset_index()
    want = want.sort_values(["rev", "brand"],
                            ascending=[False, True]).head(2)
    np.testing.assert_array_equal(got["brand"].to_numpy(),
                                  want["brand"].to_numpy())
    np.testing.assert_allclose(got["rev"], want["rev"], rtol=1e-9)
    np.testing.assert_array_equal(got["cnt"], want["cnt"])


def test_case_when_and_having(sess):
    s, sales, items = sess
    got = s.sql(
        "SELECT store, sum(CASE WHEN qty > 10 THEN price ELSE 0 END) "
        "AS big_rev FROM sales GROUP BY store HAVING big_rev > 100 "
        "ORDER BY store")
    t = sales.copy()
    t["big"] = np.where(t["qty"] > 10, t["price"], 0.0)
    want = t.groupby("store")["big"].sum().reset_index(name="big_rev")
    want = want[want["big_rev"] > 100].sort_values("store")
    np.testing.assert_array_equal(got["store"].to_numpy(),
                                  want["store"].to_numpy())
    np.testing.assert_allclose(got["big_rev"], want["big_rev"], rtol=1e-8)


def test_subquery_union_distinct(sess):
    s, sales, items = sess
    got = s.sql(
        "SELECT cat FROM ("
        "  SELECT brand, cat FROM items WHERE brand = 'acme'"
        "  UNION ALL"
        "  SELECT brand, cat FROM items WHERE brand = 'blorx') t "
        "GROUP BY cat ORDER BY cat")
    want = sorted(set(items[items["brand"].isin(["acme", "blorx"])]["cat"]))
    assert got["cat"].tolist() == want


def test_left_join_and_in_and_like(sess):
    s, sales, items = sess
    got = s.sql(
        "SELECT item, brand FROM sales LEFT JOIN items ON item = id "
        "WHERE item IN (1, 2, 3) AND brand LIKE '%or%' ORDER BY item")
    j = sales.merge(items, left_on="item", right_on="id", how="left")
    want = j[j["item"].isin([1, 2, 3]) &
             j["brand"].str.contains("or", na=False)].sort_values("item")
    assert len(got) == len(want)
    assert got["brand"].tolist() == want["brand"].tolist()


def test_semi_anti_join(sess):
    s, sales, items = sess
    got = s.sql("SELECT item FROM sales LEFT SEMI JOIN items "
                "ON item = id GROUP BY item ORDER BY item")
    want = sorted(set(sales["item"]) & set(items["id"]))
    assert got["item"].tolist() == want


def test_cast_and_distinct(sess):
    s, sales, _ = sess
    got = s.sql("SELECT DISTINCT cast(qty AS string) AS q FROM sales "
                "WHERE qty < 4 ORDER BY q")
    want = sorted({str(q) for q in sales[sales["qty"] < 4]["qty"]})
    assert got["q"].tolist() == want


def test_window_functions(sess):
    s, sales, items = sess
    got = s.sql(
        "SELECT store, price, "
        "rank() OVER (PARTITION BY store ORDER BY price DESC) AS rk, "
        "sum(price) OVER (PARTITION BY store ORDER BY price DESC) AS run "
        "FROM sales WHERE qty = 1 ORDER BY store, rk LIMIT 50")
    t = sales[sales["qty"] == 1].copy()
    t = t.sort_values(["store", "price"], ascending=[True, False],
                      kind="stable")
    t["rk"] = t.groupby("store")["price"].rank(
        method="min", ascending=False).astype(np.int64)
    # engine 'sum' over an ordered window = Spark's RANGE-cumulative frame
    t["run"] = t.groupby("store")["price"].transform(
        lambda x: x.cumsum())
    # peers (equal price) share the cumulative value under RANGE frames
    t["run"] = t.groupby(["store", "price"])["run"].transform("max")
    want = t.sort_values(["store", "rk", "price"], kind="stable").head(50)
    np.testing.assert_array_equal(got["store"].to_numpy(),
                                  want["store"].to_numpy())
    np.testing.assert_array_equal(got["rk"].to_numpy(),
                                  want["rk"].to_numpy())
    np.testing.assert_allclose(got["run"].to_numpy(),
                               want["run"].to_numpy(), rtol=1e-9)


def test_exists_semi_anti(sess):
    s, sales, items = sess
    got = s.sql(
        "SELECT id, brand FROM items WHERE EXISTS "
        "(SELECT 1 FROM sales WHERE item = id AND qty > 15) "
        "ORDER BY id")
    heavy = set(sales[sales["qty"] > 15]["item"])
    want = items[items["id"].isin(heavy)].sort_values("id")
    np.testing.assert_array_equal(got["id"].to_numpy(),
                                  want["id"].to_numpy())
    got2 = s.sql(
        "SELECT id FROM items WHERE NOT EXISTS "
        "(SELECT 1 FROM sales WHERE item = id) ORDER BY id")
    want2 = items[~items["id"].isin(set(sales["item"]))].sort_values("id")
    np.testing.assert_array_equal(got2["id"].to_numpy(),
                                  want2["id"].to_numpy())


def test_in_subquery(sess):
    s, sales, items = sess
    got = s.sql(
        "SELECT item, qty FROM sales WHERE item IN "
        "(SELECT id FROM items WHERE brand = 'acme') "
        "ORDER BY item, qty LIMIT 500")
    acme = set(items[items["brand"] == "acme"]["id"])
    want = (sales[sales["item"].isin(acme)][["item", "qty"]]
            .sort_values(["item", "qty"], kind="stable").head(500))
    np.testing.assert_array_equal(got["item"].to_numpy(),
                                  want["item"].to_numpy())
    np.testing.assert_array_equal(got["qty"].to_numpy(),
                                  want["qty"].to_numpy())
    got2 = s.sql(
        "SELECT count(*) AS c FROM sales WHERE item NOT IN "
        "(SELECT id FROM items WHERE brand = 'acme')")
    want2 = (~sales["item"].isin(acme)).sum()
    assert int(got2["c"].iloc[0]) == int(want2)


def test_group_by_expression(sess):
    s, sales, items = sess
    got = s.sql(
        "SELECT item % 4 AS bucket, sum(price) AS total FROM sales "
        "GROUP BY item % 4 ORDER BY bucket")
    want = (sales.assign(bucket=sales["item"] % 4)
            .groupby("bucket").agg(total=("price", "sum"))
            .reset_index().sort_values("bucket"))
    np.testing.assert_array_equal(got["bucket"].to_numpy(),
                                  want["bucket"].to_numpy())
    np.testing.assert_allclose(got["total"].to_numpy(),
                               want["total"].to_numpy(), rtol=1e-9)


def test_order_by_expression(sess):
    s, sales, items = sess
    got = s.sql(
        "SELECT item, price FROM sales ORDER BY price * -1, item LIMIT 20")
    want = (sales.assign(_o=sales["price"] * -1)
            .sort_values(["_o", "item"], kind="stable")
            .head(20)[["item", "price"]])
    np.testing.assert_allclose(got["price"].to_numpy(),
                               want["price"].to_numpy(), rtol=1e-9)
    assert list(got.columns) == ["item", "price"]
