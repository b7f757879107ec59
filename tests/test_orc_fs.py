"""ORC scan/sink through the shared dataset machinery + the filesystem
bridge (reference orc_exec.rs:1647 / orc_sink_exec.rs:568; URI paths play
the JniBridge hadoop-fs role via pyarrow filesystems)."""

import numpy as np
import pandas as pd

from auron_tpu.expr.nodes import col, lit
from auron_tpu.io import parquet as P
from auron_tpu.plan.nodes import OrcScan


def _orc_scan(paths, predicate=None, projection=None, parts=1):
    node = OrcScan(tuple(paths) if isinstance(paths, (list, tuple))
                   else (paths,), projection=projection,
                   predicate=predicate, num_partitions=parts)
    return P.read_orc_blocks(node)


def _df(n=200, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, 5, n),
        "v": rng.normal(size=n),
        "tag": np.array(["red", "green", "blue"], object)[
            rng.integers(0, 3, n)]})


def test_orc_roundtrip_and_projection(tmp_path):
    import pyarrow as pa
    from pyarrow import orc
    df = _df()
    path = str(tmp_path / "t.orc")
    orc.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    blocks = _orc_scan(path, projection=("k", "v"))
    got = pd.concat([b.to_pandas() for b in blocks], ignore_index=True)
    assert list(got.columns) == ["k", "v"]
    np.testing.assert_allclose(np.sort(got["v"]), np.sort(df["v"]))


def test_orc_hive_partition_pruning_and_injection(tmp_path):
    """Partitioned ORC dataset: a partition predicate must skip whole
    fragments, and the partition value must come back as a column."""
    from auron_tpu.io.parquet import write_orc
    from auron_tpu.block import TableBlock
    df = _df(300, seed=2)
    write_orc([TableBlock.from_pandas(df)], str(tmp_path / "ds"),
              partition_cols=["tag"])
    blocks = _orc_scan(str(tmp_path / "ds"),
                       predicate=col("tag") == lit("red"))
    got = pd.concat([b.to_pandas() for b in blocks], ignore_index=True)
    want = df[df["tag"] == "red"]
    assert len(got) == len(want)
    assert set(got["tag"]) == {"red"}
    s = P.LAST_SCAN_STATS
    assert s["fragments_read"] < s["fragments_total"]
    np.testing.assert_allclose(np.sort(got["v"]), np.sort(want["v"]))


def test_orc_multi_partition_scan(tmp_path):
    import pyarrow as pa
    from pyarrow import orc
    df = _df(500, seed=5)
    for i in range(3):
        orc.write_table(
            pa.Table.from_pandas(df.iloc[i::3], preserve_index=False),
            str(tmp_path / f"part{i}.orc"))
    blocks = _orc_scan([str(tmp_path / f"part{i}.orc") for i in range(3)],
                       parts=2)
    assert len(blocks) == 2
    got = pd.concat([b.to_pandas() for b in blocks], ignore_index=True)
    assert len(got) == len(df)


def test_file_uri_filesystem_bridge(tmp_path):
    """file:// URIs resolve through the pyarrow filesystem layer — the
    object-store/hadoop-fs path with a local scheme."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    df = _df(100, seed=7)
    path = str(tmp_path / "t.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    from auron_tpu.plan.nodes import ParquetScan
    node = ParquetScan((f"file://{path}",), num_partitions=1)
    blocks = P.read_parquet_blocks(node)
    got = pd.concat([b.to_pandas() for b in blocks], ignore_index=True)
    assert len(got) == len(df)

    fs, norm = P.resolve_filesystem([f"file://{path}"])
    assert fs is not None and norm == [path]
    assert P.resolve_filesystem([path])[0] is None


def test_orc_empty_after_pruning(tmp_path):
    from auron_tpu.io.parquet import write_orc
    from auron_tpu.block import TableBlock
    df = _df(50, seed=9)
    write_orc([TableBlock.from_pandas(df)], str(tmp_path / "ds"),
              partition_cols=["tag"])
    blocks = _orc_scan(str(tmp_path / "ds"),
                       predicate=col("tag") == lit("mauve"))
    got = pd.concat([b.to_pandas() for b in blocks], ignore_index=True)
    assert len(got) == 0
