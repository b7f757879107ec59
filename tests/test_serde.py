"""Wire-format round-trips + native library parity with numpy fallback."""

import io

import numpy as np
import pandas as pd
import pytest

from auron_tpu import native
from auron_tpu.block import TableBlock
from auron_tpu.io.serde import (BlockStreamReader, BlockStreamWriter,
                                deserialize_block, serialize_block)

from conftest import sorted_rows


@pytest.fixture
def block(rng):
    n = 777
    df = pd.DataFrame({
        "i": rng.integers(-1000, 1000, n),
        "f": rng.normal(size=n),
        "s": rng.choice(["x", "yy", "zzz", "wwww"], n),
        "b": rng.random(n) < 0.5,
    })
    df.loc[df.index % 7 == 0, "f"] = np.nan  # nulls
    return TableBlock.from_pandas(df), df


def test_roundtrip(block):
    b, df = block
    data = serialize_block(b)
    back = deserialize_block(data)
    assert sorted_rows(back.to_pandas()) == sorted_rows(df)


def test_roundtrip_with_dead_rows(block):
    import jax.numpy as jnp
    b, df = block
    keep = np.zeros(b.capacity, bool)
    keep[: b.capacity // 2] = True
    masked = b.with_mask(b.row_mask & jnp.asarray(keep))
    back = deserialize_block(serialize_block(masked))
    live = int(np.asarray(masked.row_mask).sum())
    assert int(np.asarray(back.row_mask).sum()) == live
    assert sorted_rows(back.to_pandas()) == sorted_rows(
        df.iloc[: b.capacity // 2][: live])


def test_stream_framing(block):
    b, df = block
    buf = io.BytesIO()
    w = BlockStreamWriter(buf)
    w.write_block(b)
    w.write_block(b)
    buf.seek(0)
    blocks = list(BlockStreamReader(buf))
    assert len(blocks) == 2
    assert sorted_rows(blocks[1].to_pandas()) == sorted_rows(df)


def test_native_lib_builds():
    L = native.lib()
    assert L is not None, "native C++ serde library failed to build"
    # transpose round trip vs numpy
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, 4096, dtype=np.uint8)
    out = np.empty_like(arr)
    tr = np.empty_like(arr)
    L.auron_transpose_bytes(native._as_u8p(arr), 512, 8, native._as_u8p(tr))
    np.testing.assert_array_equal(
        tr, arr.reshape(512, 8).T.reshape(-1))
    L.auron_untranspose_bytes(native._as_u8p(tr), 512, 8, native._as_u8p(out))
    np.testing.assert_array_equal(out, arr)


def test_compression_actually_compresses(rng):
    # sorted ints transpose+zstd must beat raw size by a lot
    n = 100_000
    df = pd.DataFrame({"x": np.arange(n, dtype=np.int64)})
    b = TableBlock.from_pandas(df)
    data = serialize_block(b)
    assert len(data) < n * 8 / 10  # >10x on sorted ints


def test_orc_roundtrip(tmp_path, rng):
    import pandas as pd
    from auron_tpu.io.parquet import read_orc_blocks, write_orc
    from auron_tpu.plan.nodes import OrcScan
    df = pd.DataFrame({"a": rng.integers(0, 100, 500),
                       "b": rng.normal(size=500).round(3)})
    b = TableBlock.from_pandas(df)
    path = str(tmp_path / "t.orc")
    write_orc([b], path)
    blocks = read_orc_blocks(OrcScan((path,), num_partitions=2))
    got = pd.concat([x.to_pandas() for x in blocks], ignore_index=True)
    assert sorted_rows(got) == sorted_rows(df)


def test_staged_table_query(rng):
    """Host-staged (compressed) tables run through plans: the RSS/spill
    analog — HBM only ever holds the chunk being processed."""
    import pandas as pd
    from auron_tpu.expr.nodes import col, lit
    from auron_tpu.io.staging import register_staged
    from auron_tpu.plan import Filter, MemoryScan, Session
    df = pd.DataFrame({"k": rng.integers(0, 50, 5000),
                       "v": rng.normal(size=5000).round(3)})
    s = Session()
    register_staged(s, "big", df, chunk_rows=1200)
    assert s.staged_tables["big"].num_partitions == 5
    got = s.sql_result(Filter(MemoryScan("big"), col("v") > lit(0.0)))
    want = df[df["v"] > 0]
    assert sorted_rows(got) == sorted_rows(want)
