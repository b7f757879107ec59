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


# Last scan's pruning accounting (parquet_exec.rs:163-189 metrics analog):
# {"row_groups_total", "row_groups_read", "rows_total", "rows_scanned"}.
LAST_SCAN_STATS: Dict[str, int] = {}


def scan_raw_decisions(tables) -> Dict[str, Optional[int]]:
    """ONE raw-byte-plane promotion decision per string column for a whole
    scan (every partition block of a table must share a representation —
    SPMD stacking and concat need identical column shapes). Distincts union
    across all of the scan's arrow tables before the from_pandas rule
    (block._raw_promotion_words) is applied."""
    import pyarrow as pa
    from auron_tpu import config
    from auron_tpu.block import _raw_promotion_words
    if not config.conf.get(config.RAW_STRING_ENABLE):
        return {}
    per_col: Dict[str, list] = {}
    totals: Dict[str, int] = {}
    stringish: Dict[str, bool] = {}
    for t, _consts in tables:
        for name in t.column_names:
            arr = t.column(name).combine_chunks()
            ty = arr.type
            is_str = pa.types.is_string(ty) or pa.types.is_large_string(ty) \
                or pa.types.is_dictionary(ty)
            stringish[name] = stringish.get(name, True) and is_str
            if not is_str:
                continue
            d = arr if pa.types.is_dictionary(ty) else arr.dictionary_encode()
            per_col.setdefault(name, []).append(
                np.asarray(d.dictionary).astype(object))
            totals[name] = totals.get(name, 0) + len(arr)
    out: Dict[str, Optional[int]] = {}
    for name, uniqs in per_col.items():
        if not stringish.get(name, False):
            out[name] = None
            continue
        uniq = np.unique(np.concatenate(uniqs).astype(str)).astype(object) \
            if uniqs else np.array([], object)
        out[name] = _raw_promotion_words(None, name, uniq, totals[name])
    return out


def _arrow_to_block(table, const_cols=None, raw_cols=None) -> TableBlock:
    """Arrow table -> TableBlock directly (no pandas intermediary): values
    land as numpy views/fills, strings dictionary-encode via arrow, nulls
    become validity planes. ``const_cols`` injects hive partition values as
    constant columns (auron.proto:410-416); ``raw_cols`` is the scan-wide
    byte-plane promotion decision (scan_raw_decisions)."""
    import pyarrow as pa
    n = table.num_rows
    data, dts, validity, dicts = {}, {}, {}, {}
    for name in table.column_names:
        arr = table.column(name).combine_chunks()
        if arr.null_count:
            validity[name] = np.asarray(arr.is_valid())
        t = arr.type
        if pa.types.is_string(t) or pa.types.is_large_string(t) or \
                pa.types.is_dictionary(t):
            darr = arr if pa.types.is_dictionary(t) \
                else arr.dictionary_encode()
            codes = np.asarray(darr.indices.fill_null(0)).astype(np.int32)
            uniq = np.asarray(darr.dictionary).astype(object)
            if raw_cols is not None:
                raw_w = raw_cols.get(name)
            else:
                from auron_tpu.block import _raw_promotion_words
                raw_w = _raw_promotion_words(None, name, uniq, n)
            if raw_w is not None:
                # high-cardinality column: raw byte planes at the scan
                # boundary, same promotion rule as TableBlock.from_pandas
                from auron_tpu.dtypes import STRING_RAW
                from auron_tpu.expr import strings_raw as SR
                data[name] = SR.encode_object_array(uniq, raw_w)[codes]
                dts[name] = STRING_RAW(raw_w)
            else:
                data[name] = codes
                dicts[name] = uniq
                from auron_tpu.dtypes import STRING as _S
                dts[name] = _S
        else:
            data[name] = arr.fill_null(0).to_numpy(zero_copy_only=False)
    for name, value in (const_cols or {}).items():
        if isinstance(value, str):
            data[name] = np.zeros(n, np.int32)
            dicts[name] = np.array([value], dtype=object)
            from auron_tpu.dtypes import STRING as _S
            dts[name] = _S
        else:
            data[name] = np.full(n, value)
    return TableBlock.from_numpy(data, dts, None, validity, dicts)




def apply_residual_predicate(blocks, predicate):
    """Scans prune best-effort (arrow filters can be skipped on delete /
    rename / partition-field paths) — the node's predicate is made
    AUTHORITATIVE here by AND-ing it into every block's row mask on device
    (mask-only, zero movement)."""
    if predicate is None:
        return blocks
    from auron_tpu.expr.eval import filter_block
    return [filter_block(b, predicate) for b in blocks]


def resolve_filesystem(paths: Sequence[str]):
    """Hadoop-FS-bridge analog (reference internal_file_reader.rs +
    JniBridge hadoop fs calls): URI-shaped paths resolve to a pyarrow
    filesystem (file://, s3://, gs://, hdfs://, ...); bare paths use the
    local FS. Returns (filesystem_or_None, normalized_paths)."""
    first = paths[0] if paths else ""
    if "://" not in first:
        return None, list(paths)
    from pyarrow import fs as pafs
    filesystem, norm0 = pafs.FileSystem.from_uri(first)
    norm = [norm0]
    for p in paths[1:]:
        norm.append(pafs.FileSystem.from_uri(p)[1])
    return filesystem, norm


def read_parquet_blocks(node) -> List[TableBlock]:
    """One-pass scan: pyarrow dataset fragments split at ROW-GROUP
    granularity with statistics-based pruning (the reference's row-group +
    page filtering, parquet_exec.rs:163-189), surviving groups read once
    with projection + filter pushdown, hive partition values injected as
    constant columns, arrow -> blocks without a pandas detour. Pruning
    accounting lands in LAST_SCAN_STATS."""
    import pyarrow.dataset as ds

    filt = _expr_to_arrow_filter(node.predicate)
    columns = list(node.projection) if node.projection else None
    filesystem, paths = resolve_filesystem(list(node.paths))
    src = paths[0] if len(paths) == 1 else list(paths)
    dataset = ds.dataset(src, format="parquet", partitioning="hive",
                         filesystem=filesystem)
    rg_total = rg_read = rows_total = rows_scanned = 0
    tables = []  # (arrow table, const partition cols)
    # the dataset-level fragment iteration prunes WHOLE fragments via hive
    # partition expressions; row-group stats prune within fragments
    all_frags = list(dataset.get_fragments())
    kept = list(dataset.get_fragments(filter=filt)) if filt is not None \
        else all_frags
    for frag in all_frags:
        frag.ensure_complete_metadata()
        rg_total += frag.metadata.num_row_groups
        rows_total += frag.metadata.num_rows
    import pyarrow.lib as _palib
    for frag in kept:
        frag.ensure_complete_metadata()
        try:
            from pyarrow.dataset import get_partition_keys
            consts = get_partition_keys(frag.partition_expression)
        except ImportError:  # older pyarrow
            consts = {}
        # statistics-based row-group pruning; a filter referencing hive
        # partition fields is not in the physical schema — fall back to
        # unpruned reads (the plan's Filter re-applies on device)
        piece_filter = filt
        if filt is not None:
            try:
                pieces = frag.split_by_row_group(filter=filt,
                                                 schema=frag.physical_schema)
            except _palib.ArrowInvalid:
                piece_filter = None
                pieces = frag.split_by_row_group()
        else:
            pieces = frag.split_by_row_group()
        for piece in pieces:
            rg_read += 1
            rows_scanned += sum(rg.num_rows for rg in piece.row_groups)
            cols = None
            if columns is not None:
                cols = [c for c in columns if c not in consts]
            try:
                t = piece.to_table(columns=cols, filter=piece_filter)
            except (OSError, _palib.ArrowException) as e:
                from auron_tpu import config as _cfg
                if not _cfg.conf.get(_cfg.FILES_IGNORE_CORRUPT):
                    raise
                # auron.files.ignoreCorruptFiles analog (conf.rs:38):
                # skip the unreadable fragment with a warning
                import warnings
                warnings.warn(f"skipping corrupt fragment "
                              f"{getattr(frag, 'path', '?')}: {e}",
                              RuntimeWarning, stacklevel=2)
                continue
            want_consts = {k: v for k, v in consts.items()
                           if columns is None or k in columns}
            tables.append((t, want_consts))

    LAST_SCAN_STATS.update({
        "row_groups_total": rg_total, "row_groups_read": rg_read,
        "rows_total": rows_total, "rows_scanned": rows_scanned})

    n_parts = node.num_partitions
    if not tables:
        # every row group pruned: an empty block with the dataset schema
        empty = dataset.schema.empty_table()
        if columns is not None:
            empty = empty.select([c for c in columns
                                  if c in empty.column_names])
        tables = [(empty, {})]
    # round-robin row groups over partitions (row-group granularity)
    import pyarrow as pa
    raw_cols = scan_raw_decisions(tables)
    out: List[TableBlock] = []
    groups: List[List] = [[] for _ in range(min(n_parts, len(tables)))]
    for i, item in enumerate(tables):
        groups[i % len(groups)].append(item)
    for grp in groups:
        consts0 = grp[0][1]
        merged = pa.concat_tables([t for t, _ in grp]) \
            if len(grp) > 1 else grp[0][0]
        # constant injection is only valid when every piece in the group
        # shares the value; mixed groups materialize per-piece instead
        same = all(c == consts0 for _, c in grp)
        if same:
            out.append(_arrow_to_block(merged, consts0, raw_cols))
        else:
            from auron_tpu.ops.join import concat_blocks
            out.append(concat_blocks([_arrow_to_block(t, c, raw_cols)
                                      for t, c in grp]))
    while len(out) < n_parts:
        out.append(out[0].with_mask(np.zeros(out[0].capacity, np.bool_)))
    return apply_residual_predicate(out, node.predicate)


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
    """ORC scan (reference orc_exec.rs:1647) through the same dataset
    machinery as parquet: fragment-level hive-partition pruning, projection
    + filter pushdown, partition-value injection, arrow -> blocks with no
    pandas detour, file-granularity partitions. (ORC has no row-group split
    API in pyarrow; stripes read whole per file — the residual filter is
    re-applied on device by the plan's Filter node.)"""
    import pyarrow as pa
    import pyarrow.dataset as ds

    filt = _expr_to_arrow_filter(node.predicate)
    columns = list(node.projection) if node.projection else None
    filesystem, paths = resolve_filesystem(list(node.paths))
    src = paths[0] if len(paths) == 1 else list(paths)
    dataset = ds.dataset(src, format="orc", partitioning="hive",
                         filesystem=filesystem)
    all_frags = list(dataset.get_fragments())
    kept = list(dataset.get_fragments(filter=filt)) if filt is not None \
        else all_frags
    LAST_SCAN_STATS.update({
        "fragments_total": len(all_frags), "fragments_read": len(kept)})
    tables = []
    for frag in kept:
        try:
            from pyarrow.dataset import get_partition_keys
            consts = get_partition_keys(frag.partition_expression)
        except ImportError:
            consts = {}
        cols = None
        if columns is not None:
            cols = [c for c in columns if c not in consts]
        try:
            t = frag.to_table(columns=cols, filter=filt)
        except pa.lib.ArrowInvalid:
            t = frag.to_table(columns=cols)  # filter names partition cols
        want = {k: v for k, v in consts.items()
                if columns is None or k in columns}
        tables.append((t, want))
    if not tables:
        empty = dataset.schema.empty_table()
        if columns is not None:
            empty = empty.select([c for c in columns
                                  if c in empty.column_names])
        tables = [(empty, {})]
    n_parts = node.num_partitions
    raw_cols = scan_raw_decisions(tables)
    out: List[TableBlock] = []
    groups: List[List] = [[] for _ in range(min(n_parts, len(tables)))]
    for i, item in enumerate(tables):
        groups[i % len(groups)].append(item)
    for grp in groups:
        from auron_tpu.ops.join import concat_blocks
        if len(grp) == 1 or all(c == grp[0][1] for _, c in grp):
            merged = pa.concat_tables([t for t, _ in grp]) \
                if len(grp) > 1 else grp[0][0]
            out.append(_arrow_to_block(merged, grp[0][1], raw_cols))
        else:
            out.append(concat_blocks([_arrow_to_block(t, c, raw_cols)
                                      for t, c in grp]))
    while len(out) < n_parts:
        out.append(out[0].with_mask(np.zeros(out[0].capacity, np.bool_)))
    return apply_residual_predicate(out, node.predicate)


def write_orc(blocks: Sequence[TableBlock], path: str,
              partition_cols: Optional[Sequence[str]] = None) -> None:
    """ORC sink (reference orc_sink_exec.rs:568) incl. hive-style dynamic
    partitions via dataset writes."""
    import pandas as pd
    import pyarrow as pa
    from pyarrow import orc
    df = pd.concat([b.to_pandas() for b in blocks], ignore_index=True)
    if partition_cols:
        # hive layout written by hand (pyarrow has no ORC dataset writer):
        # one file per distinct partition-value tuple, values in the dirname
        cols = list(partition_cols)
        for i, (vals, grp) in enumerate(df.groupby(cols, dropna=False)):
            vals = vals if isinstance(vals, tuple) else (vals,)
            sub = os.path.join(
                path, *(f"{c}={v}" for c, v in zip(cols, vals)))
            os.makedirs(sub, exist_ok=True)
            body = grp.drop(columns=cols)
            orc.write_table(
                pa.Table.from_pandas(body, preserve_index=False),
                os.path.join(sub, f"part-{i}.orc"))
    else:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        orc.write_table(pa.Table.from_pandas(df, preserve_index=False),
                        path)
