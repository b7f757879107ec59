"""Parquet scan hardening: one-pass reads, row-group pruning with scan
accounting, hive partition-value injection, arrow->block without pandas.

Reference contract: parquet_exec.rs:163-189 (row-group + page pruning in a
single pass with metrics)."""

import numpy as np
import pandas as pd
import pytest

from auron_tpu.expr.nodes import col, lit
from auron_tpu.io import parquet as P
from auron_tpu.io.parquet import write_parquet
from auron_tpu.plan import Session


def _scan(paths, predicate=None, projection=None, parts=1):
    from auron_tpu.plan.nodes import ParquetScan
    node = ParquetScan(tuple(paths) if isinstance(paths, (list, tuple))
                       else (paths,), projection=projection,
                       predicate=predicate, num_partitions=parts)
    return P.read_parquet_blocks(node)


def test_row_group_pruning_counts(tmp_path):
    """A sorted key column + small row groups: a range predicate must read
    FEWER row groups than the file holds (stats pruning, one pass)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    n = 10_000
    df = pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                       "v": np.random.default_rng(0).normal(size=n)})
    path = str(tmp_path / "t.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path,
                   row_group_size=1000)
    blocks = _scan(path, predicate=col("k") < lit(1500))
    got = pd.concat([b.to_pandas() for b in blocks], ignore_index=True)
    want = df[df["k"] < 1500]
    assert len(got) == len(want)
    s = P.LAST_SCAN_STATS
    assert s["row_groups_total"] == 10
    assert s["row_groups_read"] <= 2          # stats pruned 8+ groups
    assert s["rows_scanned"] < s["rows_total"]


def test_hive_partition_value_injection(tmp_path):
    """write_to_dataset partitions by a column; the scan re-injects the
    partition value as a constant column per fragment."""
    rng = np.random.default_rng(1)
    df = pd.DataFrame({
        "region": rng.choice(["east", "west"], 200),
        "x": rng.integers(0, 100, 200).astype(np.int64)})
    root = str(tmp_path / "ds")
    from auron_tpu.block import TableBlock
    write_parquet([TableBlock.from_pandas(df)], root,
                  partition_cols=["region"])
    blocks = _scan(root, parts=2)
    got = pd.concat([b.to_pandas() for b in blocks], ignore_index=True)
    assert sorted(got.columns) == ["region", "x"]
    assert len(got) == 200
    assert (got.groupby("region").size().sort_index().to_numpy()
            == df.groupby("region").size().sort_index().to_numpy()).all()
    # partition-column predicate prunes whole fragments
    blocks = _scan(root, predicate=col("region") == lit("east"))
    got = pd.concat([b.to_pandas() for b in blocks], ignore_index=True)
    assert (got["region"] == "east").all()
    assert len(got) == int((df["region"] == "east").sum())
    assert P.LAST_SCAN_STATS["rows_scanned"] < P.LAST_SCAN_STATS[
        "rows_total"]


def test_nulls_and_strings_no_pandas(tmp_path):
    """Nullable ints and strings round-trip arrow->block directly."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    path = str(tmp_path / "n.parquet")
    t = pa.table({
        "i": pa.array([1, None, 3, None, 5], pa.int64()),
        "s": pa.array(["a", "b", None, "b", "c"]),
        "f": pa.array([1.5, 2.5, None, 4.0, 5.0])})
    pq.write_table(t, path)
    (b,) = _scan(path)
    got = b.to_pandas()
    assert got["i"].isna().tolist() == [False, True, False, True, False]
    assert got["s"].fillna("?").tolist() == ["a", "b", "?", "b", "c"]
    assert got["f"].isna().tolist() == [False, False, True, False, False]


def test_projection_single_read(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    path = str(tmp_path / "p.parquet")
    df = pd.DataFrame({"a": np.arange(100, dtype=np.int64),
                       "b": np.arange(100, dtype=np.float64),
                       "c": np.arange(100, dtype=np.int32)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    (b,) = _scan(path, projection=("a", "c"),
                 predicate=col("a") >= lit(50))
    got = b.to_pandas()
    assert sorted(got.columns) == ["a", "c"]
    assert len(got) == 50


def test_fully_pruned_scan_returns_empty(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    path = str(tmp_path / "e.parquet")
    df = pd.DataFrame({"k": np.arange(100, dtype=np.int64)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path,
                   row_group_size=10)
    blocks = _scan(path, predicate=col("k") > lit(10_000))
    total = sum(int(np.asarray(b.row_mask).sum()) for b in blocks)
    assert total == 0
