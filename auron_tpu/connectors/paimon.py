"""Apache Paimon tables -> concrete file scans (+ LSM merge for PK tables).

Reference analog: thirdparty/auron-paimon (PaimonConvertProvider). Paimon
keeps a snapshot chain (`snapshot/snapshot-N` JSON) whose base+delta
manifest LISTS (Avro) name manifest FILES (Avro) of add/delete entries;
the net set of data files is the scan. Data files live under
`<partition-dirs>/bucket-<b>/` — entries record only the file NAME plus a
BinaryRow-encoded partition, so files are located by a one-pass directory
index (names are UUIDs, collision-free) and partition constants are
recovered from the `key=value` directory segments, like the hive scans.

Primary-key (LSM) tables ARE supported here — one step beyond the
reference, whose PaimonScanSupport.scala:162-171 rejects any split that is
not raw-convertible (i.e. exactly these merge-on-read reads) and falls back
to Spark. Data files of a PK table carry system columns
`_KEY_<pk>`/`_SEQUENCE_NUMBER`/`_VALUE_KIND`; `merge_pk_tables` applies the
default `deduplicate` merge engine: within a (partition, bucket) the row
with the highest sequence number per key wins, and a winner whose RowKind
is UPDATE_BEFORE(1)/DELETE(3) removes the key.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

from auron_tpu.io import avro

# Paimon RowKind byte values (paimon-common RowKind.java)
_KIND_INSERT, _KIND_UPDATE_BEFORE, _KIND_UPDATE_AFTER, _KIND_DELETE = 0, 1, 2, 3
_SYS_SEQ = "_SEQUENCE_NUMBER"
_SYS_KIND = "_VALUE_KIND"


def _latest_snapshot(table_path: str) -> Optional[int]:
    sdir = os.path.join(table_path, "snapshot")
    hint = os.path.join(sdir, "LATEST")
    if os.path.exists(hint):
        with open(hint) as f:
            return int(f.read().strip())
    snaps = [int(n.split("-", 1)[1]) for n in os.listdir(sdir)
             if n.startswith("snapshot-")]
    return max(snaps) if snaps else None


def resolve(table_path: str,
            snapshot: Optional[int] = None) -> Dict[str, Any]:
    """Resolve a Paimon table snapshot to scan units.

    Returns {"files": [{"path", "format", "consts", "record_count",
    "bucket", "level"}], "snapshot": int, "primary_keys": [str]} — a
    non-empty ``primary_keys`` marks an LSM table whose files must go
    through ``merge_pk_tables`` before any filtering.
    """
    snap_n = snapshot if snapshot is not None else _latest_snapshot(table_path)
    if snap_n is None:
        return {"files": [], "snapshot": None, "primary_keys": []}
    with open(os.path.join(table_path, "snapshot",
                           f"snapshot-{snap_n}")) as f:
        snap = json.load(f)

    # primary keys come from the snapshot's schema (falling back to the
    # newest schema file when schemaId is absent)
    primary_keys: List[str] = []
    sdir = os.path.join(table_path, "schema")
    if os.path.isdir(sdir):
        names = [n for n in os.listdir(sdir) if n.startswith("schema-")]
        want = snap.get("schemaId")
        pick = (f"schema-{want}" if want is not None
                and f"schema-{want}" in names
                else max(names, key=lambda n: int(n.split("-", 1)[1]))
                if names else None)
        if pick:
            with open(os.path.join(sdir, pick)) as f:
                primary_keys = list(json.load(f).get("primaryKeys") or [])

    mdir = os.path.join(table_path, "manifest")
    # index every file under the table once; manifest entries carry names
    by_name: Dict[str, str] = {}
    for root, dirs, names in os.walk(table_path):
        base = os.path.basename(root)
        if base in ("manifest", "snapshot", "schema", "index", "changelog"):
            dirs[:] = []
            continue
        for n in names:
            by_name[n] = os.path.join(root, n)

    live: Dict[str, Dict[str, Any]] = {}
    for mlist_name in (snap.get("baseManifestList"),
                       snap.get("deltaManifestList")):
        if not mlist_name:
            continue
        mlist_path = os.path.join(mdir, os.path.basename(mlist_name))
        for mf in avro.read_container(mlist_path):
            mname = mf.get("_FILE_NAME") or mf.get("fileName")
            for entry in avro.read_container(
                    os.path.join(mdir, os.path.basename(mname))):
                kind = entry.get("_KIND", entry.get("kind", 0))
                fobj = entry.get("_FILE") or entry.get("file") or {}
                fname = fobj.get("_FILE_NAME") or fobj.get("fileName")
                if fname is None:
                    continue
                level = fobj.get("_LEVEL", fobj.get("level", 0)) or 0
                if level and not primary_keys:
                    raise NotImplementedError(
                        "Paimon leveled data files in an append-only table "
                        "— corrupt metadata?")
                if kind == 1:  # DELETE (compaction dropped the file)
                    live.pop(fname, None)
                    continue
                path = by_name.get(fname)
                if path is None:
                    raise FileNotFoundError(
                        f"paimon data file {fname} not under {table_path}")
                consts = {}
                rel = os.path.relpath(os.path.dirname(path), table_path)
                for seg in rel.split(os.sep):
                    if "=" in seg:
                        k, v = seg.split("=", 1)
                        consts[k] = v
                fmt = "orc" if fname.endswith(".orc") else "parquet"
                live[fname] = {
                    "path": path, "format": fmt, "consts": consts,
                    "bucket": entry.get("_BUCKET", entry.get("bucket", 0)),
                    "level": level,
                    "record_count": fobj.get("_ROW_COUNT",
                                             fobj.get("rowCount"))}
    return {"files": sorted(live.values(), key=lambda d: d["path"]),
            "snapshot": snap_n, "primary_keys": primary_keys}


def merge_pk_tables(table, pks: List[str]):
    """Deduplicate-merge one (partition, bucket)'s concatenated rows.

    ``table`` is a pyarrow Table holding every live file of the bucket
    concatenated oldest-first (callers sort level-descending: LSM level 0
    holds the newest writes) so the positional tiebreak for equal sequence
    numbers — the later row wins — reflects write recency.
    Keys come from the `_KEY_<pk>` system columns when present
    (PK tables always write them), else from the value columns of the same
    name. Returns the merged table with system columns stripped.
    """
    import numpy as np
    import pyarrow as pa

    names = set(table.column_names)
    if _SYS_SEQ not in names or _SYS_KIND not in names:
        raise ValueError(
            "Paimon primary-key data file is missing the "
            f"{_SYS_SEQ}/{_SYS_KIND} system columns")
    n = table.num_rows
    drop = [c for c in table.column_names
            if c.startswith("_KEY_") or c in (_SYS_SEQ, _SYS_KIND)]
    if n == 0:
        return table.drop_columns(drop)
    codes = []
    for k in pks:
        src = f"_KEY_{k}" if f"_KEY_{k}" in names else k
        arr = table.column(src).to_numpy(zero_copy_only=False)
        _, inv = np.unique(arr, return_inverse=True)
        codes.append(inv)
    seq = table.column(_SYS_SEQ).to_numpy(
        zero_copy_only=False).astype(np.int64)
    kind = table.column(_SYS_KIND).to_numpy(
        zero_copy_only=False).astype(np.int64)
    pos = np.arange(n, dtype=np.int64)
    order = np.lexsort((pos, seq, *codes[::-1]))  # codes[0] primary
    diff = np.zeros(n - 1, np.bool_)
    for c in codes:
        cs = c[order]
        diff |= cs[:-1] != cs[1:]
    is_last = np.append(diff, True)  # highest (seq, pos) per key
    keep = is_last & np.isin(kind[order],
                             (_KIND_INSERT, _KIND_UPDATE_AFTER))
    idx = np.sort(order[keep])  # restore storage order
    return table.take(pa.array(idx)).drop_columns(drop)
