"""Remote shuffle storage — the Celeborn/Uniffle RSS analog, re-designed.

The reference decouples shuffle data from executor lifetimes by pushing
partition buffers to a remote shuffle service
(/root/reference/native-engine/auron/src/shuffle — AuronRssPartition
WriterBase; thirdparty celeborn/uniffle writers are thin subclasses that
push `(partition_id, serialized bytes)` and let reducers pull per
partition). The TPU-native equivalent keeps the same wire-level contract
— map tasks PUSH compressed serde blocks keyed by
(app, shuffle, partition, map); reduce tasks PULL every map's payloads
for one partition — over a pluggable storage backend:

* :class:`LocalDirStorage` — a shared filesystem directory (the
  disk-backed ESS analog; also what a mounted NFS/FUSE bucket gives).
* :class:`HttpShuffleStorage` — an HTTP object protocol (PUT/GET/LIST)
  matching how a Celeborn-like service is actually addressed;
  :func:`serve_local` runs an in-process server for tests, mirroring the
  REST-catalog test strategy (connectors/catalog.py).

Payloads are io/serde.py compressed blocks (bit-packed validity, byte
transposition, zstd) — the exact bytes the in-HBM exchange would move,
so a cross-process shuffle is storage-decoupled without a second format.
Writer-side rows are routed with the same bit-exact murmur3 pmod as the
in-memory exchange (parallel/partition.py), so RSS and local shuffles
place every row identically.
"""

from __future__ import annotations

import io as _io
import os
import threading
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from auron_tpu.block import TableBlock
from auron_tpu.io.serde import deserialize_block, serialize_block


class LocalDirStorage:
    """Shared-directory backend: one file per (shuffle, partition, map)."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, app: str, shuffle: int, partition: int) -> str:
        return os.path.join(self.root, app, f"shuffle-{shuffle}",
                            f"part-{partition:05d}")

    def put(self, app: str, shuffle: int, partition: int, map_id: int,
            payload: bytes) -> None:
        d = self._dir(app, shuffle, partition)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".map-{map_id:05d}.tmp")
        with open(tmp, "wb") as f:
            f.write(payload)
        # atomic publish: a reducer never observes a half-written payload
        os.replace(tmp, os.path.join(d, f"map-{map_id:05d}.blk"))

    def get(self, app: str, shuffle: int, partition: int) -> List[bytes]:
        d = self._dir(app, shuffle, partition)
        if not os.path.isdir(d):
            return []
        out = []
        for name in sorted(os.listdir(d)):
            if name.endswith(".blk"):
                with open(os.path.join(d, name), "rb") as f:
                    out.append(f.read())
        return out

    def partitions(self, app: str, shuffle: int) -> List[int]:
        d = os.path.join(self.root, app, f"shuffle-{shuffle}")
        if not os.path.isdir(d):
            return []
        return sorted(int(n.split("-")[1]) for n in os.listdir(d)
                      if n.startswith("part-"))


class HttpShuffleStorage:
    """HTTP object backend: PUT/GET/LIST against a shuffle service URL."""

    def __init__(self, base_url: str, timeout: float = 30.0):
        self.base = base_url.rstrip("/")
        self.timeout = timeout

    def _key(self, app: str, shuffle: int, partition: int,
             map_id: Optional[int] = None) -> str:
        k = f"{self.base}/{app}/shuffle-{shuffle}/part-{partition:05d}"
        if map_id is not None:
            k += f"/map-{map_id:05d}.blk"
        return k

    def put(self, app: str, shuffle: int, partition: int, map_id: int,
            payload: bytes) -> None:
        import urllib.request
        req = urllib.request.Request(
            self._key(app, shuffle, partition, map_id), data=payload,
            method="PUT",
            headers={"Content-Type": "application/octet-stream"})
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            r.read()

    def get(self, app: str, shuffle: int, partition: int) -> List[bytes]:
        import json
        import urllib.error
        import urllib.request
        try:
            with urllib.request.urlopen(
                    self._key(app, shuffle, partition) + "?list=1",
                    timeout=self.timeout) as r:
                names = json.loads(r.read())
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return []
            raise
        out = []
        for name in sorted(names):
            url = self._key(app, shuffle, partition) + "/" + name
            with urllib.request.urlopen(url, timeout=self.timeout) as r:
                out.append(r.read())
        return out


class ObjectStoreStorage:
    """Production object-store backend over pyarrow.fs URIs
    (``s3://bucket/prefix``, ``gs://bucket/prefix``, ``hdfs://...``,
    ``file:///dir``) — the same filesystem bridge the scans use
    (io/parquet.py resolve_filesystem). Object PUTs are atomic on real
    object stores; on filesystems (file/hdfs) a tmp-write + move keeps
    the publish atomic so reducers never observe half-written payloads.
    """

    def __init__(self, base_uri: str):
        from pyarrow import fs as pafs
        self.fs, self.base = pafs.FileSystem.from_uri(base_uri)
        self.base = self.base.rstrip("/")
        # object stores have atomic PUT; filesystems need rename-publish
        self._needs_move = type(self.fs).__name__ in (
            "LocalFileSystem", "HadoopFileSystem", "SubTreeFileSystem")

    def _dir(self, app: str, shuffle: int, partition: int) -> str:
        return (f"{self.base}/{app}/shuffle-{shuffle}/"
                f"part-{partition:05d}")

    def put(self, app: str, shuffle: int, partition: int, map_id: int,
            payload: bytes) -> None:
        d = self._dir(app, shuffle, partition)
        self.fs.create_dir(d, recursive=True)
        key = f"{d}/map-{map_id:05d}.blk"
        if self._needs_move:
            tmp = f"{d}/.map-{map_id:05d}.tmp"
            with self.fs.open_output_stream(tmp) as f:
                f.write(payload)
            self.fs.move(tmp, key)
        else:
            with self.fs.open_output_stream(key) as f:
                f.write(payload)

    def get(self, app: str, shuffle: int, partition: int) -> List[bytes]:
        from pyarrow import fs as pafs
        sel = pafs.FileSelector(self._dir(app, shuffle, partition),
                                allow_not_found=True)
        names = sorted(
            info.path for info in self.fs.get_file_info(sel)
            if info.type == pafs.FileType.File
            and info.base_name.endswith(".blk"))
        out = []
        for path in names:
            with self.fs.open_input_stream(path) as f:
                out.append(f.read())
        return out

    def partitions(self, app: str, shuffle: int) -> List[int]:
        from pyarrow import fs as pafs
        sel = pafs.FileSelector(f"{self.base}/{app}/shuffle-{shuffle}",
                                allow_not_found=True)
        return sorted(
            int(info.base_name.split("-")[1])
            for info in self.fs.get_file_info(sel)
            if info.base_name.startswith("part-"))


def serve_local(host: str = "127.0.0.1", port: int = 0):
    """In-process HTTP shuffle service for tests: returns (server, url).

    Speaks the object protocol HttpShuffleStorage expects (PUT object,
    GET object, GET ?list=1). Thread-per-request like the REST-catalog
    test server; state is an in-memory dict (the 'remote worker RAM')."""
    import json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    objects: Dict[str, bytes] = {}
    lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_PUT(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n)
            with lock:
                objects[self.path] = body
            self.send_response(200)
            self.end_headers()

        def do_GET(self):
            if self.path.endswith("?list=1"):
                prefix = self.path[: -len("?list=1")].rstrip("/") + "/"
                with lock:
                    names = [k[len(prefix):] for k in objects
                             if k.startswith(prefix)]
                if not names:
                    self.send_response(404)
                    self.end_headers()
                    return
                body = json.dumps(names).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
                return
            with lock:
                body = objects.get(self.path)
            if body is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.end_headers()
            self.wfile.write(body)

    srv = ThreadingHTTPServer((host, port), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, f"http://{srv.server_address[0]}:{srv.server_address[1]}"


class RssShuffleWriter:
    """Map-side push writer (AuronRssPartitionWriterBase contract).

    Routes a block's rows to ``num_partitions`` destinations with the
    bit-exact murmur3(42)+pmod used by every other exchange, serializes
    each destination's rows (dead rows dropped), and pushes the payloads.
    One writer per map task; ``write`` may be called per produced block.
    """

    def __init__(self, storage, app: str, shuffle: int, map_id: int,
                 partitioning) -> None:
        self.storage = storage
        self.app = app
        self.shuffle = shuffle
        self.map_id = map_id
        self.partitioning = partitioning
        self._seq = 0

    def write(self, block: TableBlock, level: int = 1) -> int:
        from auron_tpu.parallel.partition import partition_ids
        ids = np.asarray(partition_ids(block, self.partitioning))
        mask = np.asarray(block.row_mask)
        pushed = 0
        for p in range(self.partitioning.num_partitions):
            sub = block.with_mask(block.row_mask &
                                  (np.asarray(ids == p) & mask))
            if not bool((np.asarray(sub.row_mask)).any()):
                continue
            payload = serialize_block(sub, level=level)
            # map files are keyed (map_id, seq) so multi-block map tasks
            # never overwrite their own earlier pushes
            self.storage.put(self.app, self.shuffle, p,
                             self.map_id * 10000 + self._seq, payload)
            pushed += 1
        self._seq += 1
        return pushed


def read_partition(storage, app: str, shuffle: int, partition: int,
                   capacity: Optional[int] = None) -> Optional[TableBlock]:
    """Reduce-side pull: fetch every map's payloads for one partition and
    concatenate (ipc_reader_exec analog). None when no map produced rows."""
    from auron_tpu.ops.join import concat_blocks
    payloads = storage.get(app, shuffle, partition)
    if not payloads:
        return None
    blocks = [deserialize_block(p, capacity=capacity) for p in payloads]
    return blocks[0] if len(blocks) == 1 else concat_blocks(blocks)
