"""Join kernels vs a pandas-merge oracle.

Mirrors the reference's join test corpus
(/root/reference/native-engine/datafusion-ext-plans/src/joins/test.rs:394-1249:
all join types, nulls in keys, duplicate keys, multi-key, date types) driven
against pandas as ground truth instead of hand-built batches.
"""

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from auron_tpu.block import TableBlock
from auron_tpu.ops import join as J


def _mk(df, capacity=None):
    return TableBlock.from_pandas(df, capacity=capacity)


def _sorted_rows(df):
    if len(df) == 0:
        return []
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for t in df.itertuples(index=False):
        rows.append(tuple(None if (isinstance(v, float) and np.isnan(v))
                          or v is None or v is pd.NA else v for v in t))
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


def _run(left_df, right_df, spec, out_capacity=512, filter_fn=None):
    left = _mk(left_df)
    right = _mk(right_df)
    out = J.join_blocks(left, right, spec, out_capacity=out_capacity,
                        filter_fn=filter_fn)
    return out.to_pandas()


def _oracle_merge(left_df, right_df, lkeys, rkeys, how):
    l = left_df.copy()
    r = right_df.copy()
    # pandas merges NaN==NaN; SQL does not — drop null-key rows from the
    # matching set per side as appropriate
    lk_valid = ~l[list(lkeys)].isna().any(axis=1)
    rk_valid = ~r[list(rkeys)].isna().any(axis=1)
    inner = l[lk_valid].merge(r[rk_valid], left_on=list(lkeys),
                              right_on=list(rkeys), how="inner")
    if how == "inner":
        return inner
    if how == "left":
        matched = l[lk_valid].merge(r[rk_valid], left_on=list(lkeys),
                                    right_on=list(rkeys), how="left",
                                    indicator=True)
        unmatched_l = pd.concat([
            matched[matched["_merge"] == "left_only"].drop(columns="_merge"),
            l[~lk_valid].reindex(columns=matched.columns.drop("_merge")),
        ])
        return pd.concat([inner, unmatched_l], ignore_index=True)
    if how == "right":
        return _oracle_merge(right_df, left_df, rkeys, lkeys, "left")
    if how == "full":
        lpart = _oracle_merge(left_df, right_df, lkeys, rkeys, "left")
        rmatched = r[rk_valid].merge(l[lk_valid], left_on=list(rkeys),
                                     right_on=list(lkeys), how="left",
                                     indicator=True)
        unmatched_r = pd.concat([
            rmatched[rmatched["_merge"] == "right_only" if False else
                     rmatched["_merge"] == "left_only"].drop(columns="_merge"),
            r[~rk_valid].reindex(
                columns=rmatched.columns.drop("_merge")),
        ])
        return pd.concat([lpart, unmatched_r], ignore_index=True)
    raise ValueError(how)


L1 = pd.DataFrame({"k": [1, 2, 2, 3, None, 5], "a": [10, 20, 21, 30, 40, 50]})
R1 = pd.DataFrame({"j": [2, 2, 3, 4, None], "b": [200, 201, 300, 400, 500]})


@pytest.mark.parametrize("how,jt", [
    ("inner", J.INNER), ("left", J.LEFT), ("right", J.RIGHT),
    ("full", J.FULL)])
def test_basic_join_types(how, jt):
    got = _run(L1, R1, J.JoinSpec(("k",), ("j",), jt))
    want = _oracle_merge(L1, R1, ("k",), ("j",), how)
    assert _sorted_rows(got) == _sorted_rows(want)


def test_left_semi_anti():
    got = _run(L1, R1, J.JoinSpec(("k",), ("j",), J.LEFT_SEMI))
    want = L1[L1["k"].isin([2, 3])]
    assert _sorted_rows(got) == _sorted_rows(want)

    got = _run(L1, R1, J.JoinSpec(("k",), ("j",), J.LEFT_ANTI))
    # plain anti: unmatched rows INCLUDING null-key probe rows
    want = L1[~L1["k"].isin([2, 3])]
    assert _sorted_rows(got) == _sorted_rows(want)


def test_right_semi_anti():
    got = _run(L1, R1, J.JoinSpec(("k",), ("j",), J.RIGHT_SEMI))
    want = R1[R1["j"].isin([2, 3])]
    assert _sorted_rows(got) == _sorted_rows(want)

    got = _run(L1, R1, J.JoinSpec(("k",), ("j",), J.RIGHT_ANTI))
    want = R1[~R1["j"].isin([2, 3])]
    assert _sorted_rows(got) == _sorted_rows(want)


def test_null_aware_anti():
    # build has a NULL -> NOT IN yields empty
    got = _run(L1, R1, J.JoinSpec(("k",), ("j",), J.LEFT_ANTI,
                                  null_aware=True))
    assert len(got) == 0
    # build without NULLs -> null-key probe rows still dropped
    r = R1.dropna()
    got = _run(L1, r, J.JoinSpec(("k",), ("j",), J.LEFT_ANTI,
                                 null_aware=True))
    want = L1[~L1["k"].isin([2, 3]) & L1["k"].notna()]
    assert _sorted_rows(got) == _sorted_rows(want)


def test_existence_join():
    got = _run(L1, R1, J.JoinSpec(("k",), ("j",), J.EXISTENCE,
                                  existence_col="ex"))
    want = L1.copy()
    want["ex"] = want["k"].isin([2, 3])
    assert _sorted_rows(got) == _sorted_rows(want)


def test_multi_key_and_duplicates(rng):
    n_l, n_r = 300, 200
    l = pd.DataFrame({
        "k1": rng.integers(0, 8, n_l), "k2": rng.integers(0, 5, n_l),
        "a": rng.normal(size=n_l).round(3)})
    r = pd.DataFrame({
        "j1": rng.integers(0, 8, n_r), "j2": rng.integers(0, 5, n_r),
        "b": rng.normal(size=n_r).round(3)})
    for how, jt in [("inner", J.INNER), ("left", J.LEFT), ("full", J.FULL)]:
        got = _run(l, r, J.JoinSpec(("k1", "k2"), ("j1", "j2"), jt),
                   out_capacity=1 << 15)
        want = _oracle_merge(l, r, ("k1", "k2"), ("j1", "j2"), how)
        assert _sorted_rows(got) == _sorted_rows(want), (how, jt)


def test_string_keys():
    l = pd.DataFrame({"k": ["ann", "bob", "cat", "bob", None],
                      "a": [1, 2, 3, 4, 5]})
    r = pd.DataFrame({"j": ["bob", "dan", "ann"], "b": [10, 20, 30]})
    got = _run(l, r, J.JoinSpec(("k",), ("j",), J.INNER))
    want = l.dropna().merge(r, left_on="k", right_on="j")
    assert _sorted_rows(got) == _sorted_rows(want)


def test_join_filter_inner_and_left():
    # SMJ inequality-join parity (reference SMJ_INEQUALITY_JOIN_ENABLE)
    def filt(block):
        return (block["a"].values < block["b"].values) & \
            block["a"].valid_at() & block["b"].valid_at()

    got = _run(L1, R1, J.JoinSpec(("k",), ("j",), J.INNER), filter_fn=filt)
    want = _oracle_merge(L1, R1, ("k",), ("j",), "inner")
    want = want[want["a"] < want["b"]]
    assert _sorted_rows(got) == _sorted_rows(want)

    got = _run(L1, R1, J.JoinSpec(("k",), ("j",), J.LEFT), filter_fn=filt)
    inner = want
    matched_keys = set(inner["a"])
    unmatched = L1[~L1["a"].isin(matched_keys)]
    want_left = pd.concat([
        inner, unmatched.reindex(columns=inner.columns)], ignore_index=True)
    assert _sorted_rows(got) == _sorted_rows(want_left)


def test_join_filter_semi_anti():
    def filt(block):
        return (block["a"].values < block["b"].values) & \
            block["a"].valid_at() & block["b"].valid_at()

    inner = _oracle_merge(L1, R1, ("k",), ("j",), "inner")
    surviving = set(inner[inner["a"] < inner["b"]]["a"])
    got = _run(L1, R1, J.JoinSpec(("k",), ("j",), J.LEFT_SEMI),
               filter_fn=filt)
    want = L1[L1["a"].isin(surviving)]
    assert _sorted_rows(got) == _sorted_rows(want)

    got = _run(L1, R1, J.JoinSpec(("k",), ("j",), J.LEFT_ANTI),
               filter_fn=filt)
    want = L1[~L1["a"].isin(surviving)]
    assert _sorted_rows(got) == _sorted_rows(want)


def test_empty_sides():
    empty_r = pd.DataFrame({"j": pd.Series([], dtype="float64"),
                            "b": pd.Series([], dtype="int64")})
    # inner with empty build -> empty
    left = _mk(L1)
    right = TableBlock.from_numpy(
        {"j": np.zeros(4), "b": np.zeros(4, np.int64)})
    right = right.with_mask(jnp.zeros(right.capacity, dtype=bool))
    out = J.join_blocks(left, right, J.JoinSpec(("k",), ("j",), J.INNER),
                        out_capacity=64)
    assert len(out.to_pandas()) == 0
    # left outer with empty build -> all probe rows, null build cols
    out = J.join_blocks(left, right, J.JoinSpec(("k",), ("j",), J.LEFT),
                        out_capacity=64)
    df = out.to_pandas()
    assert len(df) == len(L1)
    assert df["b"].isna().all()
    del empty_r


def test_concat_blocks():
    a = _mk(L1.iloc[:3])
    b = _mk(L1.iloc[3:])
    out = J.concat_blocks([a, b]).to_pandas()
    assert _sorted_rows(out) == _sorted_rows(L1)


def test_join_overflow_debug_check():
    """DEBUG_CHECKS warns (and never crashes) when out_capacity truncates."""
    from auron_tpu import config
    l = pd.DataFrame({"k": [1] * 64, "a": range(64)})
    r = pd.DataFrame({"j": [1] * 8, "b": range(8)})
    lb, rb = _mk(l), _mk(r)
    with config.conf.scoped(**{"auron.debug.checks.enable": True}):
        out = J.join_blocks(lb, rb, J.JoinSpec(("k",), ("j",), J.INNER),
                            out_capacity=64)  # 512 matches > 64
    assert len(out.to_pandas()) == 64  # truncated but well-formed


def test_sequential_build_identity_path():
    """plan/stats detects surrogate keys in storage order; the dense join
    must skip the position table and still match the general path exactly —
    including out-of-range and null probe keys."""
    import pandas as pd
    from auron_tpu.plan import Join, MemoryScan, Session, execute_plan
    from auron_tpu.plan.stats import annotate_plan

    rng = np.random.default_rng(4)
    n_dim = 64
    dim = pd.DataFrame({"k2": np.arange(10, 10 + n_dim, dtype=np.int32),
                        "grp": np.arange(n_dim, dtype=np.int32) % 7})
    probe_keys = rng.integers(0, 10 + n_dim + 5, 500).astype(np.float64)
    probe_keys[::17] = np.nan  # NULL keys must not match
    fact = pd.DataFrame({"k": probe_keys, "v": rng.normal(size=500)})
    fact["k"] = fact["k"].astype("Int64")

    s = Session()
    s.register_pandas("fact", fact)
    s.register_pandas("dim", dim)
    plan = Join(MemoryScan("fact"), MemoryScan("dim"), ("k",), ("k2",),
                strategy="broadcast")
    plan = annotate_plan(plan, s)
    assert plan.build_sequential, "stats failed to detect sequential build"
    got = execute_plan(plan, s)[0].to_pandas()

    want = fact.dropna(subset=["k"]).merge(
        dim, left_on="k", right_on="k2")
    assert len(got) == len(want)
    got_s = got.sort_values(["k", "v"]).reset_index(drop=True)
    want_s = want.sort_values(["k", "v"]).reset_index(drop=True)
    np.testing.assert_array_equal(got_s["grp"].to_numpy(),
                                  want_s["grp"].to_numpy())


def test_sequential_not_claimed_for_shuffled_keys():
    import pandas as pd
    from auron_tpu.plan import Join, MemoryScan, Session
    from auron_tpu.plan.stats import annotate_plan
    rng = np.random.default_rng(5)
    perm = rng.permutation(32).astype(np.int32)
    dim = pd.DataFrame({"k2": perm, "grp": np.arange(32, dtype=np.int32)})
    fact = pd.DataFrame({"k": rng.integers(0, 32, 100).astype(np.int32)})
    s = Session()
    s.register_pandas("fact", fact)
    s.register_pandas("dim", dim)
    plan = annotate_plan(Join(MemoryScan("fact"), MemoryScan("dim"),
                              ("k",), ("k2",), strategy="broadcast"), s)
    assert plan.build_unique and not plan.build_sequential
