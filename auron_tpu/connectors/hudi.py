"""Apache Hudi tables -> concrete file scans (+ merge-on-read log files).

Reference analog: thirdparty/auron-hudi (HudiConvertProvider) converts
Hudi's Spark relation to a native scan over the latest file slices. Here
the timeline is read natively: completed commit instants from `.hoodie/`
(and the 1.x `timeline/` layout), base files named
`<fileId>_<writeToken>_<instantTime>.parquet` grouped per file group, the
newest committed version of each group wins. Hive-style partition
directories inject constant columns exactly like the parquet dataset scan.

Merge-on-read goes BEYOND the reference (HudiScanSupport.scala:132 bails
on mor table types and falls back to Spark): log files
(`.<fileId>_<baseCommit>.log.<version>_<token>`) are parsed natively with
a HoodieLogFormat block reader (magic `#HUDI#`, length-framed blocks,
typed header maps — HoodieLogFormatWriter layout), AVRO_DATA_BLOCK records
decode through io/avro.py with the writer schema from the block header,
rollback COMMAND_BLOCKs void their target instant, and records merge onto
the base file by `_hoodie_record_key` with latest-block-wins semantics
(OverwriteWithLatestAvroPayload); `_hoodie_is_deleted: true` records drop
the key. Blocks from uncommitted deltacommits are invisible.
"""

from __future__ import annotations

import io
import json
import os
import struct
from typing import Any, Dict, List, Optional


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
            # MOR tables commit via "<ts>.deltacommit"; 1.x adds
            # "<ts>_<completion-ts>.commit"
            if not name.endswith((".commit", ".replacecommit",
                                  ".deltacommit")) or \
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

    # newest committed base file per (partition dir, file group id), plus
    # the group's log files keyed by the base commit they attach to
    groups: Dict[tuple, tuple] = {}  # (part, file_id) -> (instant, path)
    logs: Dict[tuple, list] = {}  # (part, fid, base_commit) -> [(v, tok, p)]
    for root, dirs, names in os.walk(table_path):
        if ".hoodie" in root:
            continue
        dirs[:] = [d for d in dirs if d != ".hoodie"]
        rel = os.path.relpath(root, table_path)
        for name in names:
            if name.startswith(".") and ".log." in name:
                # ".<fileId>_<baseCommit>.log.<version>_<writeToken>"
                stem = name[1:]
                head, _, tail = stem.partition(".log.")
                if "_" not in head:
                    continue
                fid, base_commit = head.rsplit("_", 1)
                vparts = tail.split("_", 1)
                try:
                    version = int(vparts[0])
                except ValueError:
                    continue
                tok = vparts[1] if len(vparts) > 1 else ""
                logs.setdefault((rel, fid, base_commit), []).append(
                    (version, tok, os.path.join(root, name)))
                continue
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
            key = (rel, file_id)
            cur = groups.get(key)
            if cur is None or instant > cur[0]:
                groups[key] = (instant, os.path.join(root, name))

    # log-only file groups (first write went straight to a log file)
    for (rel, fid, base_commit) in logs:
        groups.setdefault((rel, fid), (base_commit, None))

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
        slice_logs = [p for _, _, p in
                      sorted(logs.get((rel, fid, instant), ()))]
        if path is None and not slice_logs:
            continue
        f: Dict[str, Any] = {"path": path, "format": "parquet",
                             "consts": consts, "file_id": fid,
                             "base_instant": instant,
                             "partition_dir": "" if rel == "." else rel}
        if slice_logs:
            f["log_files"] = slice_logs
        files.append(f)
    return {"files": files, "instant": max(completed),
            "completed_instants": sorted(completed)}


# -- HoodieLogFormat (merge-on-read) ------------------------------------------
# Block layout (HoodieLogFormatWriter.appendBlocks): [MAGIC "#HUDI#"]
# [block length: i64 BE] [format version: i32 BE] [block type ordinal: i32]
# [header map] [content length: i64] [content] [footer map]
# [total block length: i64]. Header/footer maps: [count: i32] then per
# entry [HeaderMetadataType ordinal: i32][byte length: i32][utf-8 bytes].

LOG_MAGIC = b"#HUDI#"
LOG_FORMAT_VERSION = 1
# HoodieLogBlock.HoodieLogBlockType ordinals
BLK_COMMAND, BLK_DELETE, BLK_CORRUPT, BLK_AVRO = 0, 1, 2, 3
# HoodieLogBlock.HeaderMetadataType ordinals
HDR_INSTANT, HDR_TARGET_INSTANT, HDR_SCHEMA, HDR_COMMAND_TYPE = 0, 1, 2, 3
_META_KEY = "_hoodie_record_key"
_META_DELETED = "_hoodie_is_deleted"


def _write_meta_map(out: io.BytesIO, headers: Dict[int, str]) -> None:
    out.write(struct.pack(">i", len(headers)))
    for k, v in headers.items():
        b = v.encode("utf-8")
        out.write(struct.pack(">ii", k, len(b)))
        out.write(b)


def _read_meta_map(buf: io.BytesIO) -> Dict[int, str]:
    (n,) = struct.unpack(">i", buf.read(4))
    out = {}
    for _ in range(n):
        k, ln = struct.unpack(">ii", buf.read(8))
        out[k] = buf.read(ln).decode("utf-8")
    return out


def write_log_file(path: str, blocks: List[Dict[str, Any]]) -> None:
    """Append-order writer for fixture/sink use. Each block dict:
    {"type": BLK_*, "headers": {ordinal: str}, "records": [dict] (AVRO),
    "schema": avro record schema (AVRO)}."""
    from auron_tpu.io import avro

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "ab") as f:
        for blk in blocks:
            content = b""
            if blk["type"] == BLK_AVRO:
                headers = dict(blk.get("headers") or {})
                headers[HDR_SCHEMA] = json.dumps(blk["schema"])
                recs = blk.get("records") or []
                body = io.BytesIO()
                body.write(struct.pack(">ii", 3, len(recs)))
                for r in recs:
                    rb = avro.encode_record(blk["schema"], r)
                    body.write(struct.pack(">i", len(rb)))
                    body.write(rb)
                content = body.getvalue()
            else:
                headers = dict(blk.get("headers") or {})
            hb = io.BytesIO()
            _write_meta_map(hb, headers)
            fb = io.BytesIO()
            _write_meta_map(fb, blk.get("footers") or {})
            body = io.BytesIO()
            body.write(struct.pack(">i", LOG_FORMAT_VERSION))
            body.write(struct.pack(">i", blk["type"]))
            body.write(hb.getvalue())
            body.write(struct.pack(">q", len(content)))
            body.write(content)
            body.write(fb.getvalue())
            payload = body.getvalue()
            total = len(LOG_MAGIC) + 8 + len(payload) + 8
            body.write(struct.pack(">q", total))
            payload = body.getvalue()
            f.write(LOG_MAGIC)
            f.write(struct.pack(">q", len(payload)))
            f.write(payload)


def read_log_file(path: str) -> List[Dict[str, Any]]:
    """Parse every well-formed block of one log file in append order.
    A truncated/corrupt tail (torn write) ends the scan, mirroring
    HoodieLogFileReader's corrupt-block skip."""
    from auron_tpu.io import avro

    out: List[Dict[str, Any]] = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    while pos + len(LOG_MAGIC) + 8 <= len(data):
        if data[pos:pos + len(LOG_MAGIC)] != LOG_MAGIC:
            break
        (blen,) = struct.unpack(
            ">q", data[pos + len(LOG_MAGIC):pos + len(LOG_MAGIC) + 8])
        start = pos + len(LOG_MAGIC) + 8
        if start + blen > len(data):
            break  # torn write
        buf = io.BytesIO(data[start:start + blen])
        try:
            (_ver,) = struct.unpack(">i", buf.read(4))
            (btype,) = struct.unpack(">i", buf.read(4))
            headers = _read_meta_map(buf)
            (clen,) = struct.unpack(">q", buf.read(8))
            content = buf.read(clen)
            blk: Dict[str, Any] = {"type": btype, "headers": headers}
            if btype == BLK_AVRO:
                schema = json.loads(headers[HDR_SCHEMA])
                cb = io.BytesIO(content)
                _fmt, n = struct.unpack(">ii", cb.read(8))
                recs = []
                for _ in range(n):
                    (rl,) = struct.unpack(">i", cb.read(4))
                    recs.append(avro.decode_record(schema, cb.read(rl)))
                blk["records"] = recs
            elif btype == BLK_DELETE:
                raise NotImplementedError(
                    "Hudi DELETE_BLOCK (kryo-serialized delete records) is "
                    "not supported — write deletes as data-block records "
                    f"with {_META_DELETED}=true (Hudi's sentinel column)")
            out.append(blk)
        except (struct.error, KeyError, ValueError, EOFError):
            break  # corrupt block ends the readable prefix
        pos = start + blen
    return out


def merge_file_slice(base, log_paths: List[str], completed) -> "Any":
    """Merge one file slice: base parquet rows + ordered log blocks.

    OverwriteWithLatestAvroPayload semantics — the latest committed log
    record per `_hoodie_record_key` wins over the base row and over earlier
    log records; `_hoodie_is_deleted` truthy drops the key; keys unseen in
    the base append. Rollback COMMAND_BLOCKs void every block of their
    target instant. ``base`` is a pyarrow Table or None (log-only slice).
    """
    import pyarrow as pa

    blocks: List[Dict[str, Any]] = []
    for p in log_paths:
        blocks.extend(read_log_file(p))
    rolled = {b["headers"].get(HDR_TARGET_INSTANT)
              for b in blocks if b["type"] == BLK_COMMAND}
    upserts: Dict[Any, Optional[Dict[str, Any]]] = {}
    for b in blocks:
        if b["type"] != BLK_AVRO:
            continue
        instant = b["headers"].get(HDR_INSTANT)
        if instant in rolled or (completed and instant not in completed):
            continue  # rolled back / uncommitted deltacommit: invisible
        for rec in b["records"]:
            key = rec.get(_META_KEY)
            if key is None:
                raise ValueError(
                    f"hudi log record without {_META_KEY} meta column")
            upserts[key] = None if rec.get(_META_DELETED) else rec

    if base is None:
        rows = [r for r in upserts.values() if r is not None]
        for r in rows:
            r.pop(_META_DELETED, None)
        return pa.Table.from_pylist(rows)

    names = base.column_names
    out_rows: List[Dict[str, Any]] = []
    for row in base.to_pylist():
        key = row.get(_META_KEY)
        if key in upserts:
            rec = upserts.pop(key)
            if rec is not None:
                out_rows.append({n: rec.get(n) for n in names})
        else:
            out_rows.append(row)
    for rec in upserts.values():
        if rec is not None:
            out_rows.append({n: rec.get(n) for n in names})
    return pa.Table.from_pylist(out_rows, schema=base.schema)
