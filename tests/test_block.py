"""TableBlock layout: construction, padding, masks, pandas round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from auron_tpu import TableBlock, INT64, STRING
from auron_tpu.block import round_capacity


def test_round_capacity_buckets():
    assert round_capacity(1) == 256
    assert round_capacity(1000) == 1024
    c1, c2 = round_capacity(100_001), round_capacity(100_002)
    assert c1 == c2  # nearby sizes share a bucket -> shared jit cache
    assert round_capacity(1 << 20) == 1 << 20


def test_from_numpy_pads_and_masks():
    b = TableBlock.from_numpy({"x": np.arange(10, dtype=np.int64)})
    assert b.capacity == 256
    assert int(b.num_rows()) == 10
    assert bool(b.row_mask[9]) and not bool(b.row_mask[10])
    assert b["x"].dtype == INT64


def test_filter_mask_and_to_pandas():
    b = TableBlock.from_numpy({"x": np.arange(10, dtype=np.int64)})
    b2 = b.filter_mask(b["x"].values % 2 == 0)
    df = b2.to_pandas()
    np.testing.assert_array_equal(df["x"].to_numpy(), [0, 2, 4, 6, 8])


def test_from_pandas_strings_and_nulls():
    df = pd.DataFrame({
        "s": ["apple", "banana", None, "apple"],
        "v": [1.0, None, 3.0, 4.0],
    })
    b = TableBlock.from_pandas(df)
    assert b["s"].dtype == STRING
    assert b["s"].dict_values is not None
    out = b.to_pandas()
    assert out["s"].tolist()[0] == "apple"
    assert out["s"].isna().tolist() == [False, False, True, False]
    assert out["v"].isna().tolist() == [False, True, False, False]
    np.testing.assert_allclose(out["v"].dropna().to_numpy(), [1.0, 3.0, 4.0])


def test_block_is_jittable_pytree():
    b = TableBlock.from_numpy({"x": np.arange(8, dtype=np.int64),
                               "y": np.arange(8, dtype=np.float64)})

    @jax.jit
    def step(blk: TableBlock) -> TableBlock:
        keep = blk["x"].values > 3
        out = blk.filter_mask(keep)
        return out.with_columns(
            {"z": out["y"].with_values(out["y"].values * 2.0)})

    out = step(b)
    df = out.to_pandas()
    np.testing.assert_array_equal(df["x"].to_numpy(), [4, 5, 6, 7])
    np.testing.assert_allclose(df["z"].to_numpy(), [8.0, 10.0, 12.0, 14.0])
    # re-tracing should be cached for same structure
    out2 = step(b)
    assert out2.capacity == b.capacity


def test_rename_and_project():
    b = TableBlock.from_numpy({"x": np.arange(4, dtype=np.int64),
                               "y": np.ones(4, dtype=np.float64)})
    p = b.project(["y"]).rename({"y": "w"})
    assert p.names == ["w"]
