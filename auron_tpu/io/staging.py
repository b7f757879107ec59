"""Host-RAM staging tier — the overflow story replacing disk spill/RSS.

The reference spills operator state to disk or JVM heap under memory
pressure (auron-memmgr spill.rs) and can push shuffle blocks to remote
storage services (Celeborn/Uniffle via AuronRssPartitionWriterBase). The
TPU equivalent keeps HBM working sets bounded up front (runtime/memory.py)
and stages cold table bytes in HOST RAM as compressed serde blocks
(io/serde.py wire format), streamed to the device chunk by chunk.

`StagedTable` holds a table as a list of compressed block payloads; a
`MemoryScan` over a staged table materializes blocks on demand, so a plan
can run over tables larger than HBM by processing one chunk-partition at a
time (the multi-pass analog of the reference's spill-read loops).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional

import numpy as np

from auron_tpu.block import TableBlock
from auron_tpu.io.serde import deserialize_block, serialize_block


class StagedTable:
    """A table held as compressed host bytes, one payload per partition."""

    def __init__(self, payloads: List[bytes]):
        self.payloads = payloads

    @staticmethod
    def from_blocks(blocks, level: Optional[int] = None) -> "StagedTable":
        if level is None:
            from auron_tpu import config
            level = config.conf.get(config.STAGING_ZSTD_LEVEL)
        return StagedTable([serialize_block(b, level=level) for b in blocks])

    @staticmethod
    def from_pandas(df, chunk_rows: int = 1 << 20,
                    level: Optional[int] = None) -> "StagedTable":
        if level is None:
            from auron_tpu import config
            level = config.conf.get(config.STAGING_ZSTD_LEVEL)
        payloads = []
        for start in range(0, max(len(df), 1), chunk_rows):
            chunk = df.iloc[start:start + chunk_rows]
            if len(chunk) == 0 and start > 0:
                break
            payloads.append(serialize_block(
                TableBlock.from_pandas(chunk), level=level))
        return StagedTable(payloads)

    @property
    def num_partitions(self) -> int:
        return len(self.payloads)

    @property
    def host_bytes(self) -> int:
        return sum(len(p) for p in self.payloads)

    def block(self, i: int, capacity: Optional[int] = None) -> TableBlock:
        """Materialize partition i onto the device."""
        return deserialize_block(self.payloads[i], capacity=capacity)

    def blocks(self, capacity: Optional[int] = None) -> Iterator[TableBlock]:
        for i in range(self.num_partitions):
            yield self.block(i, capacity)


def register_staged(session, name: str, df, chunk_rows: int = 1 << 20):
    """Register a host-staged table; scans materialize per-partition."""
    staged = StagedTable.from_pandas(df, chunk_rows)
    if not hasattr(session, "staged_tables"):
        session.staged_tables = {}
    session.staged_tables[name] = staged
    # expose to the executor as a lazy block list
    session.tables[name] = _LazyBlocks(staged)
    return session


class _LazyBlocks(list):
    """List facade over a StagedTable: blocks deserialize on first access
    and are NOT cached (each pass re-streams from host — bounded HBM)."""

    def __init__(self, staged: StagedTable):
        super().__init__(range(staged.num_partitions))
        self.staged = staged

    def __getitem__(self, i):
        return self.staged.block(i)

    def __iter__(self):
        for i in range(self.staged.num_partitions):
            yield self.staged.block(i)
