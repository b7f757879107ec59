"""Apache Paimon append-only tables -> concrete file scans.

Reference analog: thirdparty/auron-paimon (PaimonConvertProvider). Paimon
keeps a snapshot chain (`snapshot/snapshot-N` JSON) whose base+delta
manifest LISTS (Avro) name manifest FILES (Avro) of add/delete entries;
the net set of data files is the scan. Data files live under
`<partition-dirs>/bucket-<b>/` — entries record only the file NAME plus a
BinaryRow-encoded partition, so files are located by a one-pass directory
index (names are UUIDs, collision-free) and partition constants are
recovered from the `key=value` directory segments, like the hive scans.

Primary-key tables require LSM merge across levels (merge-on-read) and are
rejected loudly — append-only tables only, matching the reference's
scan-only integration depth.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

from auron_tpu.io import avro


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
    """Resolve a Paimon append-only table snapshot to scan units.

    Returns {"files": [{"path", "format", "consts", "record_count"}],
    "snapshot": int}.
    """
    # schema: reject primary-key tables (LSM merge semantics)
    sdir = os.path.join(table_path, "schema")
    if os.path.isdir(sdir):
        schemas = sorted(n for n in os.listdir(sdir)
                         if n.startswith("schema-"))
        if schemas:
            with open(os.path.join(sdir, schemas[-1])) as f:
                sch = json.load(f)
            if sch.get("primaryKeys"):
                raise NotImplementedError(
                    "Paimon primary-key tables (LSM merge-on-read) are not "
                    "supported — append-only tables only")

    snap_n = snapshot if snapshot is not None else _latest_snapshot(table_path)
    if snap_n is None:
        return {"files": [], "snapshot": None}
    with open(os.path.join(table_path, "snapshot",
                           f"snapshot-{snap_n}")) as f:
        snap = json.load(f)

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
                if fobj.get("_LEVEL", fobj.get("level", 0)):
                    raise NotImplementedError(
                        "Paimon leveled (primary-key) data files are not "
                        "supported — append-only tables only")
                if kind == 1:  # DELETE
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
                    "record_count": fobj.get("_ROW_COUNT",
                                             fobj.get("rowCount"))}
    return {"files": sorted(live.values(), key=lambda d: d["path"]),
            "snapshot": snap_n}
