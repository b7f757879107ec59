"""Lakehouse table-format connectors (Iceberg / Hudi / Paimon).

Reference analog: thirdparty/{auron-iceberg,auron-paimon,auron-hudi} — each
plugs an `extConvertProviders` hook (AuronConverters.scala:216-221) that
turns the engine's table-format relation into a native scan over concrete
data files. Here the whole resolution is native Python (metadata JSON +
Avro manifests via io/avro.py) and the read path is the same arrow->blocks
machinery as the parquet/orc scans: file-level pruning (partition constants
+ Iceberg manifest min/max bounds), partition-value injection as constant
columns, round-robin file distribution over plan partitions.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from auron_tpu.block import TableBlock
from auron_tpu.expr import nodes as E

from . import hudi, iceberg, paimon  # noqa: F401 (re-export)

# last resolution's pruning accounting (parquet LAST_SCAN_STATS analog)
LAST_SCAN_STATS: Dict[str, int] = {}


def _lit_cmp(op: str, lo, hi, v) -> bool:
    """Can any value in [lo, hi] satisfy `x <op> v`? Conservative-true."""
    try:
        if op == "Eq":
            return (lo is None or lo <= v) and (hi is None or v <= hi)
        if op == "Lt":
            return lo is None or lo < v
        if op == "LtEq":
            return lo is None or lo <= v
        if op == "Gt":
            return hi is None or hi > v
        if op == "GtEq":
            return hi is None or hi >= v
    except TypeError:
        return True  # incomparable types: never prune
    return True


def _survives(pred: Optional[E.Expr], consts: Dict[str, Any],
              bounds: Dict[str, tuple]) -> bool:
    """File-level pruning: every top-level conjunct that is a simple
    column-vs-literal comparison is checked against the file's partition
    constants and manifest min/max bounds. Unknown shapes keep the file."""
    if pred is None:
        return True
    if isinstance(pred, E.BinaryOp) and pred.op == "And":
        return _survives(pred.left, consts, bounds) and \
            _survives(pred.right, consts, bounds)
    if isinstance(pred, E.BinaryOp) and \
            isinstance(pred.left, E.Column) and \
            isinstance(pred.right, E.Literal):
        name, v = pred.left.name, pred.right.value
        if name in consts:
            c = consts[name]
            return _lit_cmp(pred.op, c, c, v)
        if name in bounds:
            lo, hi = bounds[name]
            return _lit_cmp(pred.op, lo, hi, v)
    return True


def resolve_table(fmt: str, path: str, **options) -> Dict[str, Any]:
    if fmt == "iceberg":
        return iceberg.resolve(path, snapshot_id=options.get("snapshot_id"),
                               as_of_ms=options.get("as_of_ms"))
    if fmt == "hudi":
        return hudi.resolve(path)
    if fmt == "paimon":
        return paimon.resolve(path, snapshot=options.get("snapshot"))
    raise NotImplementedError(f"lakehouse format {fmt}")


def read_lakehouse_blocks(node) -> List[TableBlock]:
    """Executor for the LakehouseScan plan node."""
    import pyarrow as pa
    import pyarrow.dataset as ds

    from auron_tpu.io.parquet import (_arrow_to_block,
                                      _expr_to_arrow_filter,
                                      scan_raw_decisions)
    from auron_tpu.ops.join import concat_blocks

    info = resolve_table(node.fmt, node.path, **dict(node.options or ()))
    files = info["files"]
    pks = info.get("primary_keys") or []
    if pks:
        # Paimon LSM merge-on-read: a "pruned" file may hold the NEWEST
        # version (or a delete) of a key whose stale row survives in a kept
        # file — predicate pruning before the merge resurrects old rows.
        # Read every live file; the predicate re-applies post-merge on
        # device (apply_residual_predicate).
        kept = list(files)
    else:
        kept = [f for f in files
                if _survives(node.predicate, f.get("consts", {}),
                             f.get("bounds", {}))]
    LAST_SCAN_STATS.update({"files_total": len(files),
                            "files_read": len(kept)})
    columns = list(node.projection) if node.projection else None
    filt = _expr_to_arrow_filter(node.predicate)

    if pks:
        # group per (partition, bucket) — keys are unique within a bucket
        groups_pk: Dict[tuple, list] = {}
        for f in kept:
            gkey = (tuple(sorted(f.get("consts", {}).items())),
                    f.get("bucket", 0))
            groups_pk.setdefault(gkey, []).append(f)
        tables = []
        for (ckey, _bucket), fs in sorted(groups_pk.items()):
            # merge_pk_tables tiebreaks equal _SEQUENCE_NUMBERs by concat
            # position (later wins), so order files oldest-first: level
            # descending (LSM level 0 = newest writes) then path for
            # determinism — not resolve()'s UUID-random path order.
            fs = sorted(fs, key=lambda f: (-f.get("level", 0), f["path"]))
            parts = [ds.dataset(f["path"], format=f["format"]).to_table()
                     for f in fs]
            merged = paimon.merge_pk_tables(
                pa.concat_tables(parts, promote_options="permissive")
                if len(parts) > 1 else parts[0], pks)
            if columns is not None:
                merged = merged.select(
                    [c for c in columns if c in merged.column_names])
            consts = {k: v for k, v in ckey
                      if columns is None or k in columns}
            tables.append((merged, consts))
        return _tables_to_blocks(tables, kept, columns, node)

    if any(f.get("log_files") for f in kept):
        # Hudi merge-on-read: each file slice (base + ordered log files) is
        # self-contained (updates stay in their file group), so consts-based
        # pruning above is safe; the base reads unfiltered and the predicate
        # re-applies on device after the merge.
        completed = set(info.get("completed_instants") or ())
        tables = []
        for f in kept:
            base = (ds.dataset(f["path"], format=f["format"]).to_table()
                    if f.get("path") else None)
            t = (hudi.merge_file_slice(base, f["log_files"], completed)
                 if f.get("log_files") else base)
            if columns is not None:
                t = t.select([c for c in columns if c in t.column_names])
            consts = {k: v for k, v in f.get("consts", {}).items()
                      if columns is None or k in columns}
            tables.append((t, consts))
        return _tables_to_blocks(tables, kept, columns, node)

    field_ids = info.get("field_ids") or {}
    # Iceberg merge-on-read deletes. POSITION deletes are (file_path, pos)
    # tables -> per-file row-ordinal masks. EQUALITY deletes are value rows
    # over the file's equality-id columns -> anti-join masks, applied only
    # to data files with a LOWER sequence number (spec scoping).
    deleted_pos: Dict[str, Dict[int, int]] = {}  # path -> {pos: seq}
    eq_deletes = []  # (seq, cols, set of value tuples)
    for d in info.get("deletes", ()):
        if d.get("kind") == "equality":
            cols = d["equality_cols"]
            dt = ds.dataset(d["path"], format=d["format"]).to_table(
                columns=cols)
            rows = set(zip(*(dt.column(c).to_pylist() for c in cols)))
            eq_deletes.append((d.get("seq", 0), cols, rows,
                               d.get("consts") or {}))
            continue
        dt = ds.dataset(d["path"], format=d["format"]).to_table(
            columns=["file_path", "pos"])
        fp = dt.column("file_path").to_pylist()
        pos = dt.column("pos").to_pylist()
        dseq = d.get("seq", 0)
        for p, i in zip(fp, pos):
            # re-root recorded data-file paths exactly like the manifest
            # paths (no basename fallback — same-named files in different
            # partitions must never share a delete set)
            p = iceberg._local(p, node.path)
            cur = deleted_pos.setdefault(p, {})
            cur[int(i)] = max(cur.get(int(i), 0), dseq)

    tables = []
    for f in kept:
        dset = ds.dataset(f["path"], format=f["format"])
        # Iceberg schema evolution: columns map by FIELD ID, not name
        # (auron.proto:836-837; renamed columns keep their id). Parquet
        # written by Iceberg carries PARQUET:field_id metadata per field;
        # files that predate a rename read under their old name and
        # surface under the current one.
        rename: Dict[str, str] = {}
        if field_ids:
            for fld in dset.schema:
                fid = (fld.metadata or {}).get(b"PARQUET:field_id")
                if fid is None:
                    continue
                cur = field_ids.get(int(fid))
                if cur is not None and cur != fld.name:
                    rename[fld.name] = cur
        inv = {v: k for k, v in rename.items()}
        cols = None
        if columns is not None:
            cols = [inv.get(c, c) for c in columns
                    if c not in f.get("consts", {})
                    and inv.get(c, c) in dset.schema.names]
        # position deletes apply to data files with sequence <= delete's
        # (spec scoping); the path identifies the exact file
        pos_map = deleted_pos.get(f["path"]) or {}
        dels = {i for i, s in pos_map.items()
                if s >= f.get("seq", 0)} or None
        f_consts = f.get("consts", {})
        eq_apply = [
            (ecols, rows) for seq, ecols, rows, dconsts in eq_deletes
            if seq > f.get("seq", 0)
            # a partitioned delete file scopes to its own partition; an
            # unpartitioned (global) one applies everywhere
            and all(f_consts.get(k) == v for k, v in dconsts.items())]
        if dels is not None or eq_apply:
            # deletes need full row alignment / delete-key columns: read
            # unfiltered with the equality columns included, mask, then
            # project back (residual filter re-applies on device)
            read_cols = cols
            extra: list = []
            if cols is not None and eq_apply:
                need = {c for ecols, _ in eq_apply for c in ecols}
                extra = [c for c in need
                         if c not in cols and c in dset.schema.names]
                read_cols = cols + extra
            t = dset.to_table(columns=read_cols)
            keep = np.ones(t.num_rows, np.bool_)
            if dels is not None:
                idx = np.fromiter((i for i in dels if i < t.num_rows),
                                  np.int64, count=-1)
                keep[idx] = False
            for ecols, rows in eq_apply:
                vals = list(zip(*(t.column(c).to_pylist() for c in ecols)))
                keep &= np.fromiter((v not in rows for v in vals),
                                    np.bool_, count=len(vals))
            t = t.filter(pa.array(keep))
            if extra:
                t = t.drop_columns(extra)
        else:
            try:
                t = dset.to_table(columns=cols,
                                  filter=None if rename else filt)
            except (pa.lib.ArrowInvalid, KeyError):
                t = dset.to_table(columns=cols)  # filter names injected
        if rename:
            t = t.rename_columns([rename.get(n, n) for n in t.column_names])
        consts = {k: v for k, v in f.get("consts", {}).items()
                  if columns is None or k in columns}
        tables.append((t, consts))

    return _tables_to_blocks(tables, files, columns, node)


def _tables_to_blocks(tables, files, columns, node) -> List[TableBlock]:
    """Shared tail: (arrow table, consts) pairs -> partitioned TableBlocks."""
    import pyarrow as pa
    import pyarrow.dataset as ds

    from auron_tpu.io.parquet import (_arrow_to_block,
                                      apply_residual_predicate,
                                      scan_raw_decisions)
    from auron_tpu.ops.join import concat_blocks

    if not tables:
        # fully pruned: empty block, schema from any file or resolution
        if files:
            dset = ds.dataset(files[0]["path"], format=files[0]["format"])
            empty = dset.schema.empty_table()
            if columns is not None:
                empty = empty.select([c for c in columns
                                      if c in empty.column_names])
            tables = [(empty, {})]
        else:
            raise FileNotFoundError(
                f"{node.fmt} table {node.path} has no data files")

    n_parts = node.num_partitions
    raw_cols = scan_raw_decisions(tables)
    out: List[TableBlock] = []
    groups: List[List] = [[] for _ in range(min(n_parts, len(tables)))]
    for i, item in enumerate(tables):
        groups[i % len(groups)].append(item)
    for grp in groups:
        if len(grp) == 1 or all(c == grp[0][1] for _, c in grp):
            merged = pa.concat_tables([t for t, _ in grp],
                                      promote_options="permissive") \
                if len(grp) > 1 else grp[0][0]
            out.append(_arrow_to_block(merged, grp[0][1], raw_cols))
        else:
            out.append(concat_blocks([_arrow_to_block(t, c, raw_cols)
                                      for t, c in grp]))
    while len(out) < n_parts:
        out.append(out[0].with_mask(np.zeros(out[0].capacity, np.bool_)))
    return apply_residual_predicate(out, node.predicate)
