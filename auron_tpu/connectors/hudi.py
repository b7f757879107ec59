"""Apache Hudi copy-on-write tables -> concrete file scans.

Reference analog: thirdparty/auron-hudi (HudiConvertProvider) converts
Hudi's Spark relation to a native scan over the latest file slices. Here
the timeline is read natively: completed commit instants from `.hoodie/`
(and the 1.x `timeline/` layout), base files named
`<fileId>_<writeToken>_<instantTime>.parquet` grouped per file group, the
newest committed version of each group wins. Merge-on-read log files are
detected and rejected loudly (CoW only, matching the reference's scan
integration). Hive-style partition directories inject constant columns
exactly like the parquet dataset scan.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List


def _completed_instants(table_path: str):
    """(sorted completed instants, {(partition, file_id): replace_instant}
    for file groups replaced by clustering / INSERT OVERWRITE)."""
    import json
    out = []
    replaced = {}
    for tl in (os.path.join(table_path, ".hoodie"),
               os.path.join(table_path, ".hoodie", "timeline")):
        if not os.path.isdir(tl):
            continue
        for name in os.listdir(tl):
            # completed: "<ts>.commit" / "<ts>.replacecommit" (JSON body);
            # 1.x adds "<ts>_<completion-ts>.commit"
            if not name.endswith((".commit", ".replacecommit")) or \
                    ".inflight" in name or ".requested" in name:
                continue
            instant = name.split(".")[0].split("_")[0]
            out.append(instant)
            if name.endswith(".replacecommit"):
                # replaced file groups become invisible from this instant
                try:
                    with open(os.path.join(tl, name)) as f:
                        body = json.load(f)
                except (OSError, ValueError):
                    body = {}
                for part, fids in (body.get("partitionToReplaceFileIds")
                                   or {}).items():
                    for fid in fids:
                        key = (part or ".", fid)
                        cur = replaced.get(key)
                        if cur is None or instant > cur:
                            replaced[key] = instant
    return sorted(set(out)), replaced


def resolve(table_path: str) -> Dict[str, Any]:
    """Resolve the latest committed file slices of a Hudi CoW table.

    Returns {"files": [{"path", "format", "consts"}], "instant": str}.
    """
    if not os.path.isdir(os.path.join(table_path, ".hoodie")):
        raise FileNotFoundError(f"{table_path}: no .hoodie timeline")
    completed_list, replaced = _completed_instants(table_path)
    completed = set(completed_list)
    if not completed:
        return {"files": [], "instant": None}

    # newest committed base file per (partition dir, file group id)
    groups: Dict[tuple, tuple] = {}  # (part, file_id) -> (instant, path)
    for root, dirs, names in os.walk(table_path):
        if ".hoodie" in root:
            continue
        dirs[:] = [d for d in dirs if d != ".hoodie"]
        for name in names:
            if ".log." in name:  # (log files are dot-prefixed)
                raise NotImplementedError(
                    "Hudi merge-on-read (log files) is not supported — "
                    "copy-on-write tables only")
            if name.startswith("."):
                continue
            if not name.endswith(".parquet"):
                continue
            stem = name[:-len(".parquet")]
            parts = stem.split("_")
            if len(parts) < 3:
                continue  # not a hudi base file
            file_id, instant = parts[0], parts[2]
            if instant not in completed:
                continue  # uncommitted/rolled-back write
            rel = os.path.relpath(root, table_path)
            key = (rel, file_id)
            cur = groups.get(key)
            if cur is None or instant > cur[0]:
                groups[key] = (instant, os.path.join(root, name))

    files = []
    for (rel, fid), (instant, path) in sorted(groups.items()):
        rep = replaced.get((rel, fid))
        if rep is not None and instant <= rep:
            continue  # file group replaced by clustering/insert_overwrite
        consts = {}
        if rel != ".":
            for seg in rel.split(os.sep):
                if "=" in seg:
                    k, v = seg.split("=", 1)
                    consts[k] = v
        files.append({"path": path, "format": "parquet", "consts": consts})
    return {"files": files, "instant": max(completed)}
