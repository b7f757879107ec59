"""Remote shuffle storage (io/rss.py) — the Celeborn/Uniffle analog.

Differential contract: a shuffle pushed through remote storage by
independent 'map tasks' and pulled back by 'reduce tasks' must place
every row exactly where the in-memory exchange places it, and an
aggregation over the pulled partitions must equal the single-process
answer. Reference: AuronRssPartitionWriterBase push/pull cycle
(/root/reference/native-engine/auron/src/shuffle/rss).
"""

import numpy as np
import pandas as pd
import pytest

from auron_tpu.block import TableBlock
from auron_tpu.io.rss import (HttpShuffleStorage, LocalDirStorage,
                              RssShuffleWriter, read_partition, serve_local)
from auron_tpu.parallel.partition import HashPartitioning, partition_ids


def _data(n=4000, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "k": rng.integers(0, 97, n).astype(np.int64),
        "v": rng.integers(0, 1000, n).astype(np.int64),
        "s": rng.choice(["red", "green", "blue", None], n),
    })


def _roundtrip(storage):
    df = _data()
    part = HashPartitioning(("k",), 4)
    # three map tasks, each holding a third of the table
    for m, piece in enumerate(np.array_split(np.arange(len(df)), 3)):
        w = RssShuffleWriter(storage, "app1", shuffle=7, map_id=m,
                             partitioning=part)
        w.write(TableBlock.from_pandas(df.iloc[piece]))
    # reduce side: pull each partition, check placement + totals
    whole = TableBlock.from_pandas(df)
    want_ids = np.asarray(partition_ids(whole, part))
    got_total = 0
    seen_rows = 0
    for p in range(4):
        blk = read_partition(storage, "app1", 7, p)
        assert blk is not None
        got = blk.to_pandas()
        seen_rows += len(got)
        # every LIVE pulled row hashes to this partition (bit-exact
        # murmur3; dead capacity-padding rows carry garbage keys)
        ids_here = np.asarray(partition_ids(blk, part))
        live = np.asarray(blk.row_mask)
        assert (ids_here[live] == p).all()
        got_total += got["v"].sum()
    assert seen_rows == len(df)
    assert got_total == df["v"].sum()
    # per-key sums survive the push/pull cycle exactly
    pulled = pd.concat([read_partition(storage, "app1", 7, p).to_pandas()
                        for p in range(4)], ignore_index=True)
    lhs = pulled.groupby("k")["v"].sum().sort_index()
    rhs = df.groupby("k")["v"].sum().sort_index()
    pd.testing.assert_series_equal(lhs, rhs)
    # string dictionary columns round-trip including nulls
    assert (pulled["s"].isna().sum()) == (df["s"].isna().sum())


def test_local_dir_storage(tmp_path):
    _roundtrip(LocalDirStorage(str(tmp_path / "rss")))


def test_http_shuffle_service():
    srv, url = serve_local()
    try:
        _roundtrip(HttpShuffleStorage(url))
    finally:
        srv.shutdown()


def test_empty_partition_and_missing_shuffle(tmp_path):
    st = LocalDirStorage(str(tmp_path / "rss"))
    assert read_partition(st, "nope", 1, 0) is None
    # a map task with zero rows for a destination pushes nothing
    df = pd.DataFrame({"k": np.array([3], np.int64),
                       "v": np.array([10], np.int64)})
    w = RssShuffleWriter(st, "app2", shuffle=1, map_id=0,
                         partitioning=HashPartitioning(("k",), 8))
    pushed = w.write(TableBlock.from_pandas(df))
    assert pushed == 1  # exactly one destination got bytes
    hits = [p for p in range(8)
            if read_partition(st, "app2", 1, p) is not None]
    assert len(hits) == 1


def test_multi_block_map_task_no_overwrite(tmp_path):
    st = LocalDirStorage(str(tmp_path / "rss"))
    part = HashPartitioning(("k",), 2)
    df = _data(200)
    w = RssShuffleWriter(st, "app3", shuffle=2, map_id=0,
                         partitioning=part)
    w.write(TableBlock.from_pandas(df.iloc[:100]))
    w.write(TableBlock.from_pandas(df.iloc[100:]))
    rows = sum(len(read_partition(st, "app3", 2, p).to_pandas())
               for p in range(2))
    assert rows == len(df)


def test_object_store_storage(tmp_path):
    """pyarrow.fs URI backend (the s3://, gs://, hdfs:// production arm)
    driven through a file:// URI — same FileSystem API surface, so the
    put/get/partitions/list plumbing is what a bucket would execute."""
    from auron_tpu.io.rss import ObjectStoreStorage
    st = ObjectStoreStorage(f"file://{tmp_path}/rss_obj")
    _roundtrip(st)
    assert st.partitions("app1", 7) == [0, 1, 2, 3]
    assert st.partitions("app1", 99) == []
    assert st.get("app1", 7, 55) == []
