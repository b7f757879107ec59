"""Semantic plan rewrites (null-rejection based join reassociation).

The reference inherits these from Spark's optimizer (EliminateOuterJoin +
join reordering run long before AuronConvertStrategy sees the plan); this
engine plans from its own Frame/SQL front-ends, so the rewrite lives here.

The one implemented today is the q93-class shape, which is also the
general "left join materialized before its null-rejecting consumer"
pattern:

    (A LEFT JOIN B on kA=kB)  INNER JOIN  C  on  B.x = C.y
  ==                                       -- NULL never equals anything,
    A INNER JOIN (B INNER JOIN C on x=y)   -- so null-extended rows die in
                                           -- the C join: the LEFT is
                                           -- really an INNER, and inner
                                           -- joins reassociate freely.

Why it matters on this hardware: the left join runs FIRST in the original
tree, so its build side is ALL of B (5M store_returns rows at sf=500 —
sort + gather over the full table, and at 50M probe rows the intermediate
crashed the worker under HBM pressure); after the rewrite B is pre-shrunk
by the selective C join (reason 28 keeps ~1/55 of returns) before the big
join ever runs. This is exactly the filter-pushdown-through-join the
reference gets from Spark for free.

Safety conditions (checked structurally):
  * the upper join is a plain equi INNER (no extra condition, not
    null-aware) with a broadcast build — C must be visible whole,
    otherwise moving it under B's exchange would re-partition it;
  * the lower join is a plain equi LEFT;
  * every upper-join probe key resolves to the lower join's RIGHT side
    (the null-producing side), unambiguously (no name collision with the
    left side).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

from auron_tpu.plan import nodes as PN


def _names(node, session) -> Optional[set]:
    from auron_tpu.plan.prune import output_names
    try:
        return set(output_names(node, session))
    except Exception:
        return None


def _try_reassociate(j: PN.PlanNode, session) -> Optional[PN.PlanNode]:
    if not isinstance(j, PN.Join) or j.join_type != "inner" \
            or j.condition is not None or j.null_aware \
            or j.strategy != "broadcast":
        return None
    lower = j.left
    if not isinstance(lower, PN.Join) or lower.join_type != "left" \
            or lower.condition is not None or lower.null_aware:
        return None
    b_side = lower.right
    exch = b_side if isinstance(b_side, PN.Exchange) else None
    b = b_side.child if exch is not None else b_side
    b_names = _names(b, session)
    a = lower.left.child if isinstance(lower.left, PN.Exchange) \
        else lower.left
    a_names = _names(a, session)
    if b_names is None or a_names is None:
        return None
    keys = set(j.left_keys)
    if not keys <= b_names or keys & a_names:
        return None
    # B' = B INNER C (broadcast, same keys as the upper join)
    bc = dataclasses.replace(j, left=b, out_capacity=None)
    new_right = dataclasses.replace(exch, child=bc) if exch is not None \
        else bc
    return dataclasses.replace(lower, right=new_right, join_type="inner",
                               out_capacity=None)


# ---------------------------------------------------------------------------
# Inner-join reordering (measured-selectivity greedy).
#
# The reference receives plans AFTER Spark's optimizer has ordered joins
# (cost-based reordering + predicate pushdown); this engine owns the whole
# driver, so the ordering decision lives here. The classic TPC-DS failure
# mode without it is q25-class: the query text joins fact-to-fact FIRST
# (store_sales x store_returns x catalog_sales) and only then applies the
# highly selective date-dimension joins — executed verbatim, the fact-fact
# intermediate is ~1000x larger than the post-date one.
#
# The pass collects a maximal spine of movable inner equi-joins, scores
# each build side by MEASURED filter selectivity (scan-chain builds up to
# auron.optimizer.reorder.probe.rows are filter-evaluated once on the host
# CPU — dimensions are small; anything bigger keeps a neutral score), and
# greedily applies the most selective ready join first, respecting column
# dependencies between build sides (a join keyed on another build's output
# can only run after it). Correctness envelope: inner equi-joins commute
# and associate freely; anything else (outer/semi/anti/existence,
# null-aware, left-built, multi-partition exchanges) is a spine barrier.
# ---------------------------------------------------------------------------

_SCORE_NEUTRAL = 1.0   # unfiltered build: joins ~every probe row
_SCORE_UNKNOWN = 2.0   # non-scan-chain or too-big build: keep late


def _scan_chain_table(node) -> Tuple[Optional[str], bool]:
    """(table, has_filter) when ``node`` is a Filter/Project/Rename chain
    over one MemoryScan; (None, _) otherwise."""
    has_filter = False
    while True:
        if isinstance(node, PN.Filter):
            has_filter = True
            node = node.child
        elif isinstance(node, (PN.Project, PN.Rename)):
            node = node.child
        elif isinstance(node, PN.MemoryScan):
            return node.table, has_filter
        else:
            return None, has_filter


def _host_exec(node, table: str, session):
    """Execute a small scan-chain build side once on the host CPU and
    return its output blocks. Table blocks are copied host-side once per
    session (dimension tables — the probe-rows bound keeps facts out)."""
    try:
        import jax
        from auron_tpu.plan.execute import Session, execute_plan
        cache = getattr(session, "_reorder_host_tables", None)
        if cache is None:
            cache = session._reorder_host_tables = {}
        blocks = cache.get(table)
        if blocks is None:
            cpu = jax.devices("cpu")[0]
            blocks = [jax.device_put(b, cpu) for b in session.tables[table]]
            cache[table] = blocks
        s2 = Session(getattr(session, "conf", None))
        s2.register(table, blocks)
        with jax.default_device(jax.devices("cpu")[0]):
            return execute_plan(node, s2, annotate=False)
    except Exception:
        return None


def _host_live_count(node, table: str, session) -> Optional[int]:
    import numpy as np
    out = _host_exec(node, table, session)
    if out is None:
        return None
    return sum(int(np.asarray(b.row_mask).sum()) for b in out)


def _build_score(st: PN.Join, session) -> float:
    """Estimated probe-survival fraction of one build side: measured
    filter selectivity for small scan-chain builds, neutral otherwise.
    Builds whose single join key is known NON-unique can expand the probe
    (fan-out) — they score past neutral so PK-style dimensions apply
    first."""
    from auron_tpu import config as C
    if st.join_type != "inner":
        # semi/anti/existence: pure probe filters/flags — their probe
        # survival is a key-overlap fraction the build's size does not
        # predict; keep them at their original relative position
        return _SCORE_NEUTRAL
    right = st.right
    node = right.child if isinstance(right, PN.Exchange) else right
    table, has_filter = _scan_chain_table(node)
    if table is None or table not in getattr(session, "tables", {}):
        return _SCORE_UNKNOWN
    fanout = False
    if len(st.right_keys) == 1:
        try:
            from auron_tpu.plan.stats import _table_ranges
            rng = _table_ranges(session, table).get(st.right_keys[0])
            fanout = rng is not None and not rng[2]
        except Exception:
            fanout = False
    if fanout:
        return _SCORE_UNKNOWN
    if not has_filter:
        return _SCORE_NEUTRAL
    try:
        cap = sum(int(b.row_mask.shape[0]) for b in session.tables[table])
    except Exception:
        return _SCORE_UNKNOWN
    if cap > int(C.conf.get(C.OPT_REORDER_PROBE_ROWS)):
        return _SCORE_UNKNOWN
    live = _host_live_count(node, table, session)
    if live is None:
        return _SCORE_NEUTRAL
    return max(live, 1) / max(cap, 1)


def _join_exchange_ok(side, keys) -> bool:
    """A partitioned join's staging exchange is movable only when it is the
    trivial single-partition hash exchange the builder inserted for these
    exact keys (n>1 placement depends on position in the tree)."""
    p = side.partitioning
    return tuple(getattr(p, "key_names", ()) or ()) == tuple(keys) and \
        int(getattr(p, "num_partitions", 0) or 0) == 1


# join types that commute freely along an inner spine: inner joins
# (drop/duplicate probe rows and append build columns), semi/anti joins
# (pure probe-row filters — each probe row kept at most once, no build
# columns), and existence joins (pure flag-column adds). Outer joins stay
# barriers: they synthesize null-extended rows whose content depends on
# position.
_MOVABLE_TYPES = ("inner", "left_semi", "left_anti", "existence")


def _spine_step_ok(j: PN.Join) -> bool:
    if j.join_type not in _MOVABLE_TYPES or j.build != "right":
        return False
    if j.null_aware and j.join_type != "left_anti":
        return False
    if j.strategy == "broadcast":
        return True
    if j.strategy == "partitioned":
        return isinstance(j.left, PN.Exchange) and \
            isinstance(j.right, PN.Exchange) and \
            _join_exchange_ok(j.left, j.left_keys) and \
            _join_exchange_ok(j.right, j.right_keys)
    return False


def _try_reorder(top: PN.Join, session,
                 needed_above=None) -> Optional[PN.PlanNode]:
    from auron_tpu.parallel.partition import HashPartitioning
    from auron_tpu.plan.prune import expr_refs

    # collect the spine top-down, then reverse to application order
    steps: List[PN.Join] = []
    node: PN.PlanNode = top
    while isinstance(node, PN.Join) and _spine_step_ok(node):
        steps.append(node)
        node = node.left.child if node.strategy == "partitioned" \
            else node.left
    if len(steps) < 2:
        return None
    steps.reverse()
    probe = node

    probe_names = _names(probe, session)
    if probe_names is None:
        return None
    right_names: List[set] = []   # names each step ADDS to the output bag
    build_names: List[set] = []   # names visible inside the join itself
    dup: set = set()
    seen = set(probe_names)
    for st in steps:
        rn = _names(st.right, session)
        if rn is None:
            return None
        if st.join_type in ("left_semi", "left_anti"):
            adds: set = set()     # pure probe filter: no output columns
        elif st.join_type == "existence":
            adds = {st.existence_col}
        else:
            adds = rn
        dup |= adds & seen
        right_names.append(adds)
        build_names.append(rn)
        seen |= adds

    deps: List[set] = []
    spine_refs: set = set()
    for st, rn in zip(steps, build_names):
        d = set(st.left_keys)
        if st.condition is not None:
            # a join condition may reference build-side columns — those
            # resolve inside the join, not from the accumulated side
            d |= expr_refs(st.condition) - rn
        deps.append(d)
        spine_refs |= d
    if dup:
        # duplicated column names across sides (multi-role dimensions
        # post-prune still expose filter-referenced columns): reordering
        # changes which duplicate "wins" in the output bag, so it is only
        # safe when no duplicate is a spine key/condition ref and none is
        # consumed above the spine (the pruner's needed-set at this node)
        na = None if needed_above is None else needed_above.get(id(top))
        if na is None or (dup & set(na)) or (dup & spine_refs):
            return None

    scores = [_build_score(st, session) for st in steps]

    order: List[int] = []
    avail = set(probe_names)
    remaining = list(range(len(steps)))
    while remaining:
        ready = [i for i in remaining if deps[i] <= avail]
        if not ready:
            return None  # a dependency outside the spine: bail out
        pick = min(ready, key=lambda i: (scores[i], i))
        order.append(pick)
        remaining.remove(pick)
        avail |= right_names[pick]
    if order == list(range(len(steps))):
        return None  # already optimal under this scoring

    acc: PN.PlanNode = probe
    for i in order:
        st = steps[i]
        left = acc
        if st.strategy == "partitioned":
            left = PN.Exchange(acc, HashPartitioning(tuple(st.left_keys), 1))
        # planner-filled hints (capacities, domains, shrink) are stale at
        # the new position; stats + calibration re-derive them
        acc = dataclasses.replace(
            st, left=left, out_capacity=None, shrink_to=None,
            build_domain=None, build_unique=False, build_sequential=False)
    return acc


def reorder_inner_joins(plan: PN.PlanNode, session,
                        needed_above=None) -> PN.PlanNode:
    """Top-down pass: the FIRST movable join spine found on each path is
    reordered wholesale (its internal joins are not revisited); DAG
    sharing preserved via an id-keyed memo. ``needed_above`` (from the
    pruner) maps id(node) -> columns consumed above it, enabling the
    duplicate-name safety check for multi-role dimension plans."""
    from auron_tpu import config as C
    if not C.conf.get(C.OPT_REORDER_JOINS):
        return plan
    memo: dict = {}

    def walk(node):
        if not isinstance(node, PN.PlanNode):
            return node
        hit = memo.get(id(node))
        if hit is not None:
            return hit
        out = node
        if isinstance(node, PN.Join):
            new = _try_reorder(node, session, needed_above)
            if new is not None:
                out = new
        changes = {}
        for f in dataclasses.fields(out):
            v = getattr(out, f.name)
            if isinstance(v, PN.PlanNode):
                # do not descend into a freshly reordered spine's joins —
                # only into build sides and the probe, which walk reaches
                # through the Join fields below
                nv = walk(v)
                if nv is not v:
                    changes[f.name] = nv
            elif isinstance(v, tuple) and v and \
                    all(isinstance(x, PN.PlanNode) for x in v):
                nv = tuple(walk(x) for x in v)
                if any(x is not y for x, y in zip(nv, v)):
                    changes[f.name] = nv
        if changes:
            out = dataclasses.replace(out, **changes)
        memo[id(node)] = out
        return out

    return walk(plan)


# ---------------------------------------------------------------------------
# ROLLUP re-aggregation.
#
# The Frame/SQL front-ends decompose ROLLUP(c1..cn) into a UNION of n+1
# grouping-set aggregations over one shared join subtree (exactly how
# Spark's ExpandExec materializes it, expand_exec.rs:506 — except Expand
# replicates every input ROW n+1 times). When every aggregate is
# re-aggregable (sum/min/max/count), the coarser levels are derivable from
# the FINEST level's output: aggregate the fact once at the full key set,
# then re-aggregate that (tiny) result per level. q67-class plans go from
# 9 x 50M-row aggregations to 1 x 50M + 8 x |groups|.
# ---------------------------------------------------------------------------

# kinds with an exact partial/final merge protocol (plan/execute.py's
# SPMD split): every grouping-set level can be expressed as a FINAL
# aggregation over ONE shared finest-key PARTIAL — partial state merges
# exactly under ANY regrouping, which is the whole point of the split.
_REAGG_KINDS = frozenset({"sum", "count", "count_star", "min", "max",
                          "avg", "stddev", "stddev_samp"})


def _unwrap_to_agg(child) -> Optional[PN.Agg]:
    node = child
    while isinstance(node, (PN.Project, PN.Rename)):
        node = node.child
    return node if isinstance(node, PN.Agg) else None


def _key_cols(agg: PN.Agg) -> Optional[Tuple[Tuple[str, str], ...]]:
    """((output name, source column), ...) when every group key is a plain
    column reference; None otherwise."""
    from auron_tpu.plan.stats import _column_of
    out = []
    for name, e in agg.keys:
        c = _column_of(e)
        if c is None:
            return None
        out.append((name, c))
    return tuple(out)


def _call_sig(c: PN.AggCall) -> Optional[tuple]:
    if c.kind not in _REAGG_KINDS or c.fn is not None:
        return None
    return (c.name, c.kind, repr(c.expr), repr(c.filter))


def _flatten_union(u: PN.Union) -> PN.Union:
    """Union-of-unions -> one flat Union (the Frame builder chains .union()
    pairwise, so an n-level rollup arrives as a left-deep nest). Pure
    concatenation either way; only used when the re-agg rewrite fires."""
    kids: List[PN.PlanNode] = []

    def add(node):
        if isinstance(node, PN.Union):
            for k in node.children_nodes:
                add(k)
        else:
            kids.append(node)

    add(u)
    if len(kids) == len(u.children_nodes):
        return u
    return PN.Union(tuple(kids))


def _try_reaggregate(u0: PN.Union, session) -> Optional[PN.Union]:
    u = _flatten_union(u0)
    aggs = [_unwrap_to_agg(c) for c in u.children_nodes]
    if len(aggs) < 2 or any(a is None for a in aggs):
        return None
    shared = aggs[0].child
    if any(a.child is not shared or a.mode != "single" for a in aggs):
        return None
    sigs = [tuple(_call_sig(c) for c in a.calls) for a in aggs]
    if any(s is None for sig in sigs for s in sig) or \
            any(sig != sigs[0] for sig in sigs[1:]):
        return None
    keycols = [_key_cols(a) for a in aggs]
    if any(k is None for k in keycols):
        return None
    finest_i = max(range(len(aggs)), key=lambda i: len(keycols[i]))
    finest_keys = dict(keycols[finest_i])
    n_finest = len(keycols[finest_i])
    for kc in keycols:
        for name, col in kc:
            if finest_keys.get(name) != col:
                return None  # not a sub-grouping of the finest level
    if all(len(kc) == n_finest for kc in keycols):
        return None  # no proper sub-grouping: nothing to derive
    finest = aggs[finest_i]

    from auron_tpu.expr.nodes import Column

    # ONE shared partial at the finest key set; every level — the finest
    # included — becomes a FINAL over it, regrouped to its own keys. The
    # partial does the full-fact work once; finals run at group scale.
    partial = PN.Agg(finest.child, finest.keys, finest.calls,
                     mode="partial", domains=finest.domains)

    def rebuild_level(agg: PN.Agg) -> PN.Agg:
        keys = tuple((name, Column(name)) for name, _ in _key_cols(agg))
        return PN.Agg(partial, keys, agg.calls, mode="final")

    def rewrap(child, new_agg) -> PN.PlanNode:
        if isinstance(child, (PN.Project, PN.Rename)):
            return dataclasses.replace(child,
                                       child=rewrap(child.child, new_agg))
        return new_agg

    new_children = []
    rebuilt_memo: Dict[int, PN.Agg] = {}
    for i, (child, agg) in enumerate(zip(u.children_nodes, aggs)):
        hit = rebuilt_memo.get(id(agg))
        if hit is None:
            hit = rebuilt_memo[id(agg)] = rebuild_level(agg)
        new_children.append(rewrap(child, hit))
    return dataclasses.replace(u, children_nodes=tuple(new_children))


def reaggregate_rollups(plan: PN.PlanNode, session) -> PN.PlanNode:
    from auron_tpu import config as C
    if not C.conf.get(C.OPT_ROLLUP_REAGG):
        return plan
    memo: dict = {}

    def walk(node):
        if not isinstance(node, PN.PlanNode):
            return node
        hit = memo.get(id(node))
        if hit is not None:
            return hit
        src = node
        if isinstance(node, PN.Union):
            # rewrite TOP-DOWN: the rollup nest must be seen whole (a
            # bottom-up pass would rewrite the innermost pair first and
            # break the shared-child condition for the outer levels)
            new = _try_reaggregate(node, session)
            if new is not None:
                node = new
        changes = {}
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            if isinstance(v, PN.PlanNode):
                nv = walk(v)
                if nv is not v:
                    changes[f.name] = nv
            elif isinstance(v, tuple) and v and \
                    all(isinstance(x, PN.PlanNode) for x in v):
                nv = tuple(walk(x) for x in v)
                if any(x is not y for x, y in zip(nv, v)):
                    changes[f.name] = nv
        out = dataclasses.replace(node, **changes) if changes else node
        memo[id(src)] = out
        return out

    return walk(plan)


def reassociate_left_joins(plan: PN.PlanNode, session) -> PN.PlanNode:
    """Bottom-up single pass; DAG sharing preserved via an id-keyed memo.
    A chain of null-rejecting dimension joins above one left join rewrites
    fully: after the first rotation the lower join is INNER, and further
    upper joins keyed on B-side columns no longer need rewriting to be
    cheap (the selective build already shrank)."""
    memo: dict = {}

    def walk(node):
        if not isinstance(node, PN.PlanNode):
            return node
        hit = memo.get(id(node))
        if hit is not None:
            return hit
        changes = {}
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            if isinstance(v, PN.PlanNode):
                nv = walk(v)
                if nv is not v:
                    changes[f.name] = nv
            elif isinstance(v, tuple) and v and \
                    all(isinstance(x, PN.PlanNode) for x in v):
                nv = tuple(walk(x) for x in v)
                if any(x is not y for x, y in zip(nv, v)):
                    changes[f.name] = nv
        node2 = dataclasses.replace(node, **changes) if changes else node
        new = _try_reassociate(node2, session)
        out = new if new is not None else node2
        memo[id(node)] = out
        return out

    return walk(plan)


# ---------------------------------------------------------------------------
# Dimension-interval elimination — the Dynamic Partition Pruning analog.
#
# Spark's DPP (inherited by the reference through the plans it consumes)
# evaluates a dimension filter first and prunes fact partitions by the
# surviving join keys. The TPU-native generalization: host-evaluate the
# tiny filtered dimension at PLAN time (the same machinery that measures
# join selectivity); when its surviving unique integer keys form a few
# contiguous runs — one month of a sequential date_dim is ONE run — and
# every other surviving dimension column is constant over the survivors
# (d_year under `d_year = 1999`), the join itself disappears: the fact
# side gets range predicates (two compares per row) plus literal
# injection of the constants, and the dimension's key column rides along
# as an alias of the fact key. A 50M-row probe gather (~0.5s measured —
# the per-index gather floor) becomes a fused ~ms filter.
# ---------------------------------------------------------------------------

_MAX_KEY_RUNS = 64


def _try_interval_dim(j: PN.Join, session,
                      needed: Optional[set] = None
                      ) -> Optional[PN.PlanNode]:
    import numpy as np

    from auron_tpu import config as C
    if (j.join_type != "inner" or j.build != "right"
            or j.condition is not None or j.null_aware
            or j.strategy != "broadcast" or len(j.right_keys) != 1):
        return None
    key = j.right_keys[0]
    table, has_filter = _scan_chain_table(j.right)
    if table is None or not has_filter \
            or table not in getattr(session, "tables", {}):
        return None
    try:
        cap = sum(int(b.row_mask.shape[0]) for b in session.tables[table])
    except Exception:
        return None
    if cap > int(C.conf.get(C.OPT_REORDER_PROBE_ROWS)):
        return None
    blocks = _host_exec(j.right, table, session)
    if not blocks:
        return None

    key_vals: list = []
    consts: dict = {}      # name -> (value, dtype, dict_decoded)
    first = True
    for b in blocks:
        mask = np.asarray(b.row_mask)
        if key not in b.columns:
            return None
        kc = b.columns[key]
        if not kc.dtype.is_integer or np.asarray(kc.values).ndim != 1:
            return None
        kvalid = mask if kc.validity is None else \
            (mask & np.asarray(kc.validity))
        key_vals.append(np.asarray(kc.values)[kvalid])
        sel = np.asarray(b.row_mask)
        for name, c in b.columns.items():
            if name == key:
                continue
            if needed is not None and name not in needed:
                continue  # filter-only input (e.g. d_year under the
                          # dim predicate): never emitted above the join
            v = np.asarray(c.values)
            if v.ndim != 1:
                return None   # raw-string planes etc.: bail
            v = v[sel]
            valid = np.ones(len(v), bool) if c.validity is None else \
                np.asarray(c.validity)[sel]
            if len(v) and not valid.all():
                return None   # NULL constants: not worth the edge cases
            if c.dict_values is not None:
                vals = [c.dict_values[int(x)]
                        if 0 <= int(x) < len(c.dict_values) else None
                        for x in v]
                uniq = set(vals)
            else:
                uniq = set(np.unique(v).tolist())
            prev = consts.get(name)
            if prev is not None:
                uniq |= prev[0]
            if len(uniq) > 1:
                return None   # non-constant dimension column survives
            consts[name] = (uniq, c.dtype)
        first = False
    ks = np.concatenate(key_vals) if key_vals else np.zeros(0, np.int64)
    ks = np.unique(ks)  # sorted; duplicates would mean probe expansion
    total = sum(len(x) for x in key_vals)
    if len(ks) != total:
        return None  # non-unique build keys: the join duplicates rows
    from auron_tpu.expr.nodes import col as _col, lit as _lit
    lk = j.left_keys[0]
    if len(ks) == 0:
        pred = _lit(False)
    else:
        splits = np.flatnonzero(np.diff(ks) != 1)
        starts = np.concatenate([[0], splits + 1])
        ends = np.concatenate([splits, [len(ks) - 1]])
        if len(starts) > _MAX_KEY_RUNS:
            return None
        terms = []
        for s0, e0 in zip(starts, ends):
            lo, hi = int(ks[s0]), int(ks[e0])
            if lo == hi:
                terms.append(_col(lk) == _lit(lo))
            else:
                terms.append((_col(lk) >= _lit(lo)) &
                             (_col(lk) <= _lit(hi)))
        pred = terms[0]
        for t in terms[1:]:
            pred = pred | t

    from auron_tpu.plan.prune import output_names
    try:
        left_names = list(output_names(j.left, session))
    except Exception:
        return None
    right_names = list(blocks[0].names)
    if set(left_names) & set(right_names):
        return None
    if needed is not None:
        # only the dimension columns consumed ABOVE the join must be
        # constant/emitted — the filter's own inputs (d_year under
        # `d_year = 1999 OR d_year = 2001`) are not outputs
        right_names = [n for n in right_names if n in needed]
    exprs = [(n, _col(n)) for n in left_names]
    for name in right_names:
        if name == key:
            kdt = blocks[0].columns[key].dtype
            exprs.append((name, _col(lk).cast(kdt)))
            continue
        uniq, dt = consts[name]
        if len(uniq) == 0:
            # dimension matched zero rows: value never observable
            # (pred is False) — emit a typed zero-value literal
            val = "" if dt.is_string else 0
        else:
            val = next(iter(uniq))
        if val is None:
            return None
        if dt.is_string:
            exprs.append((name, _lit(str(val))))
        else:
            exprs.append((name, _lit(np.asarray(val).item(), dtype=dt)))
    return PN.Project(PN.Filter(j.left, pred), tuple(exprs))


def prune_interval_dims(plan: PN.PlanNode, session,
                        needed_above: Optional[Dict] = None
                        ) -> PN.PlanNode:
    from auron_tpu import config as C
    if not C.conf.get(C.OPT_DIM_INTERVAL):
        return plan
    memo: dict = {}
    na = needed_above or {}

    def walk(node):
        if not isinstance(node, PN.PlanNode):
            return node
        hit = memo.get(id(node))
        if hit is not None:
            return hit
        src = node
        changes = {}
        for f in dataclasses.fields(node):
            v = getattr(node, f.name)
            if isinstance(v, PN.PlanNode):
                nv = walk(v)
                if nv is not v:
                    changes[f.name] = nv
            elif isinstance(v, tuple) and v and \
                    all(isinstance(x, PN.PlanNode) for x in v):
                nv = tuple(walk(x) for x in v)
                if any(a is not b for a, b in zip(nv, v)):
                    changes[f.name] = nv
        if changes:
            node = dataclasses.replace(node, **changes)
            if id(src) in na:
                na[id(node)] = na[id(src)]
        if isinstance(node, PN.Join):
            new = _try_interval_dim(node, session, na.get(id(node)))
            if new is not None:
                node = new
        memo[id(src)] = node
        return node

    return walk(plan)
