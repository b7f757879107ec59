"""Micro-batch streaming queries with device-resident incremental state.

The reference's streaming front-end (auron-flink-extension, SURVEY §2.3)
feeds row-at-a-time operators; the TPU re-design runs the SAME relational
engine over fixed-capacity micro-batches:

  poll -> decode (host, serde.py) -> per-batch plan (filter/project/join
  against static tables) -> partial aggregate -> MERGE into a persistent
  partial-state block on device -> final aggregate only when results are
  asked for.

The state merge is the PARTIAL_MERGE step of the engine's existing
partial/final protocol (plan/execute.py:_call_specs, reference
auron.proto:741-750 AggExecMode), so every algebraic aggregate the batch
engine supports (sum/count/min/max/avg/first/stddev) is a valid streaming
aggregate with exact, order-independent semantics.

Offsets advance only after the batch is absorbed; ``checkpoint()`` writes
offsets + state atomically, so restore gives exactly-once aggregation
(replayed records land in a state that never saw them).
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from auron_tpu import config
from auron_tpu.block import Column, TableBlock, round_capacity
from auron_tpu.dtypes import type_from_name
from auron_tpu.expr.nodes import col as _col
from auron_tpu.ops.join import concat_blocks
from auron_tpu.ops.selection import compact
from auron_tpu.plan import Agg, AggCall, MemoryScan, Session, execute_plan
from auron_tpu.plan.execute import _call_specs, _run_groupby

from .serde import Deserializer
from .source import MicroBatchSource, Offsets


def _shrink(block: TableBlock, live: int) -> TableBlock:
    """Cut a compacted block down to the capacity bucket for ``live`` rows
    (keeps steady-state memory at O(groups), not O(groups + batches))."""
    cap = round_capacity(max(live, 1))
    if cap >= block.capacity:
        return block
    cols = {n: Column(c.values[:cap],
                      None if c.validity is None else c.validity[:cap],
                      c.dtype, c.dict_values)
            for n, c in block.columns.items()}
    return TableBlock(cols, block.row_mask[:cap])


class StreamingQuery:
    """One continuously-maintained query over a micro-batch source.

    ``transform`` (optional) maps the batch scan node to any engine plan —
    filters, projections, joins against ``static_tables`` (stream-static
    dimension joins) — evaluated per micro-batch. With ``group_keys`` /
    ``calls`` the query is stateful: results reflect ALL records absorbed
    since the start (or the restored checkpoint). Without them it is a
    stateless pipe and ``result()`` returns rows produced since the last
    ``result(clear=True)``.
    """

    def __init__(self, source: MicroBatchSource, deserializer: Deserializer,
                 *, transform: Optional[Callable] = None,
                 group_keys: Sequence[str] = (),
                 calls: Sequence[AggCall] = (),
                 static_tables: Optional[Dict[str, TableBlock]] = None,
                 batch_rows: int = 4096):
        self.source = source
        self.deserializer = deserializer
        self.transform = transform
        self.group_keys = tuple(group_keys)
        self.calls = tuple(calls)
        self.static_tables = dict(static_tables or {})
        self.batch_rows = int(batch_rows)
        self.offsets: Offsets = {}
        self.state: Optional[TableBlock] = None   # partial-state block
        self._sink: list = []                     # stateless outputs
        self.batches_processed = 0
        self.records_processed = 0
        from auron_tpu.runtime.cancel import CancelToken
        self.cancel_token = CancelToken()

    def cancel(self, reason: str = "streaming query cancelled") -> None:
        """Cooperative stop: takes effect at the next micro-batch boundary
        (the reference's Flink job-cancel granularity)."""
        self.cancel_token.cancel(reason)

    # -- per-batch pipeline -------------------------------------------------

    def _session(self, batch: TableBlock) -> Session:
        s = Session()
        for name, blocks in self.static_tables.items():
            s.register(name, blocks)
        s.register("__batch", batch)
        return s

    def _plan(self, mode: str):
        node = MemoryScan("__batch")
        if self.transform is not None:
            node = self.transform(node)
        if self.calls:
            keys = tuple((k, _col(k)) for k in self.group_keys)
            node = Agg(node, keys=keys, calls=self.calls, mode=mode)
        return node

    def process_batch(self) -> int:
        """Poll + absorb one micro-batch; returns records absorbed (0 at
        end of currently-available data)."""
        self.cancel_token.check()
        records = self.source.poll(self.offsets, self.batch_rows)
        if not records:
            return 0
        cap = round_capacity(self.batch_rows)
        batch = self.deserializer(records, capacity=cap)
        out = execute_plan(self._plan("partial" if self.calls else "single"),
                           self._session(batch))
        if self.calls:
            self._merge_state(out)
        else:
            self._sink.extend(out)
        for r in records:  # absorbed: advance past every polled record
            key = (r.topic, r.partition)
            self.offsets[key] = max(self.offsets.get(key, 0), r.offset + 1)
        self.batches_processed += 1
        self.records_processed += len(records)
        return len(records)

    def process_available(self, max_batches: int = 1 << 30) -> int:
        """Drain everything the source currently has; returns records."""
        total = 0
        for _ in range(max_batches):
            n = self.process_batch()
            if n == 0:
                break
            total += n
        return total

    # -- state maintenance ----------------------------------------------

    def _merge_state(self, partials) -> None:
        blocks = ([] if self.state is None else [self.state]) + list(partials)
        work = blocks[0] if len(blocks) == 1 else concat_blocks(blocks)
        key_names = list(self.group_keys)
        specs = []
        for call in self.calls:
            # the final-mode spec list over state columns IS the
            # PARTIAL_MERGE combine (sum of sums, min of mins, ...); we
            # keep the state columns and skip the finishing step
            specs_i, _post, _drop = _call_specs(call, "final", work)
            specs.extend(specs_i)
        merged = _run_groupby(work, key_names, specs)
        merged, live = compact(merged)
        self.state = _shrink(merged, int(live))

    # -- results ----------------------------------------------------------

    def result(self, clear: bool = False):
        """Current answer as pandas: final aggregate over the state block
        (stateful) or the accumulated transformed rows (stateless)."""
        import pandas as pd
        if self.calls:
            if self.state is None:
                return None
            keys = tuple((k, _col(k)) for k in self.group_keys)
            s = Session()
            s.register("__state", self.state)
            out = execute_plan(Agg(MemoryScan("__state"), keys=keys,
                                   calls=self.calls, mode="final"), s)
            return pd.concat([b.to_pandas() for b in out],
                             ignore_index=True)
        if not self._sink:
            return None
        out = pd.concat([b.to_pandas() for b in self._sink],
                        ignore_index=True)
        if clear:
            self._sink = []
        return out

    def lag(self) -> int:
        """Records available at the source but not yet absorbed."""
        end = self.source.end_offsets()
        return sum(max(0, e - self.offsets.get(k, 0))
                   for k, e in end.items())

    # -- checkpoint / restore ----------------------------------------------

    def checkpoint(self, path: str) -> None:
        """Atomically persist offsets + aggregation state (numpy archive:
        host-portable, no pickle)."""
        payload: Dict[str, np.ndarray] = {}
        meta = {"offsets": [[t, p, o] for (t, p), o in self.offsets.items()],
                "records": self.records_processed,
                "schema": []}
        if self.state is not None:
            payload["__mask"] = np.asarray(self.state.row_mask)
            for name, c in self.state.columns.items():
                payload[f"v::{name}"] = np.asarray(c.values)
                if c.validity is not None:
                    payload[f"n::{name}"] = np.asarray(c.validity)
                if c.dict_values is not None:
                    # unicode (not object) dtype: loadable without pickle
                    payload[f"d::{name}"] = np.asarray(c.dict_values,
                                                       dtype=str)
                meta["schema"].append(
                    [name, c.dtype.name, list(c.dtype.params or ())])
        payload["__meta"] = np.frombuffer(
            json.dumps(meta).encode(), dtype=np.uint8)
        d = os.path.dirname(os.path.abspath(path)) or "."
        fd, tmp = tempfile.mkstemp(dir=d, suffix=".ckpt.tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                np.savez(f, **payload)
            os.replace(tmp, path)
        except BaseException:
            os.unlink(tmp)
            raise

    def restore(self, path: str) -> "StreamingQuery":
        with np.load(path, allow_pickle=False) as z:
            meta = json.loads(bytes(z["__meta"]).decode())
            self.offsets = {(t, int(p)): int(o)
                            for t, p, o in meta["offsets"]}
            self.records_processed = int(meta["records"])
            if meta["schema"]:
                cols = {}
                for name, dt_name, params in meta["schema"]:
                    dt = type_from_name(dt_name, tuple(params) or None)
                    cols[name] = Column(
                        jnp.asarray(z[f"v::{name}"]),
                        jnp.asarray(z[f"n::{name}"])
                        if f"n::{name}" in z else None,
                        dt,
                        z[f"d::{name}"] if f"d::{name}" in z else None)
                self.state = TableBlock(cols, jnp.asarray(z["__mask"]))
        return self
