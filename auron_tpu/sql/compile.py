"""SQL AST -> wire-contract plan (front-end #2's conversion layer).

The Frame builder plays the role Spark's AuronConverters plays for
front-end #1; this module is the same conversion for SQL text. The output
is NOT a Frame — it is wire JSON (plan/wire.py), which `Session.sql`
round-trips through `plan_from_json` before executing: the engine consumes
only the neutral contract, proving a third-party front-end could drive it
the same way (the reference proves this with auron-flink, SURVEY §2.3).

Scoping rules (kept deliberately simple, like the early Spark converter):
column references resolve by FLAT name (qualifiers strip); self-joins need
pre-renamed subqueries.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

from auron_tpu.dtypes import (BOOL, DATE32, DECIMAL64, FLOAT32, FLOAT64,
                              INT16, INT32, INT64, INT8, STRING, TIMESTAMP64)
from auron_tpu.expr import nodes as E
from auron_tpu.ops.sort import SortKey
from auron_tpu.plan.builder import Frame, table
from auron_tpu.sql import parser as A

_AGG_FNS = {"sum", "avg", "min", "max", "count", "count_distinct",
            "collect_list", "collect_set", "first"}

_TYPES = {"int": INT32, "integer": INT32, "bigint": INT64, "long": INT64,
          "smallint": INT16, "tinyint": INT8, "double": FLOAT64,
          "float": FLOAT32, "real": FLOAT32, "string": STRING,
          "varchar": STRING, "date": DATE32, "timestamp": TIMESTAMP64,
          "boolean": BOOL, "decimal": DECIMAL64(18, 2)}

# scalar functions whose trailing literal arguments are STATIC params
_PARAM_FNS = {"substring": 1, "substr": 1, "concat_ws": None, "trunc": 1,
              "next_day": 1, "round": 1, "bround": 1, "like": 1}


def _is_agg(e) -> bool:
    if isinstance(e, A.WindowFn):
        return False  # window aggregates are not GROUP BY aggregates
    if isinstance(e, A.Fn) and (e.name in _AGG_FNS or e.star):
        return True
    for f in getattr(e, "__dataclass_fields__", {}):
        v = getattr(e, f)
        vs = v if isinstance(v, (list, tuple)) else [v]
        for item in vs:
            if isinstance(item, tuple):
                item = list(item)
            for x in (item if isinstance(item, list) else [item]):
                if hasattr(x, "__dataclass_fields__") and _is_agg(x):
                    return True
    return False


def _expr(e) -> E.Expr:
    """SQL expression AST -> engine expression."""
    if isinstance(e, A.Ident):
        return E.col(e.name)
    if isinstance(e, A.Lit):
        return E.lit(e.value)
    if isinstance(e, A.Un):
        if e.op == "not":
            return ~_expr(e.operand)
        return E.lit(0) - _expr(e.operand)
    if isinstance(e, A.Bin):
        l, r = _expr(e.left), _expr(e.right)
        ops = {"=": lambda: l == r, "<>": lambda: l != r,
               "!=": lambda: l != r, "<": lambda: l < r,
               "<=": lambda: l <= r, ">": lambda: l > r,
               ">=": lambda: l >= r, "+": lambda: l + r,
               "-": lambda: l - r, "*": lambda: l * r,
               "/": lambda: l / r, "%": lambda: l % r,
               "and": lambda: l & r, "or": lambda: l | r}
        return ops[e.op]()
    if isinstance(e, A.ExistsE):
        raise NotImplementedError(
            "EXISTS must be a top-level WHERE conjunct")
    if isinstance(e, A.InE):
        if e.query is not None:
            raise NotImplementedError(
                "IN (SELECT ...) must be a top-level WHERE conjunct")
        vals = []
        for v in e.values:
            if not isinstance(v, A.Lit):
                raise NotImplementedError("IN expr lists")
            vals.append(v.value)
        out = _expr(e.operand).isin(vals)
        return ~out if e.negated else out
    if isinstance(e, A.LikeE):
        out = E.func("like", _expr(e.operand), params=(e.pattern,))
        return ~out if e.negated else out
    if isinstance(e, A.BetweenE):
        op = _expr(e.operand)
        out = (op >= _expr(e.lo)) & (op <= _expr(e.hi))
        return ~out if e.negated else out
    if isinstance(e, A.IsNullE):
        op = _expr(e.operand)
        return op.is_not_null() if e.negated else op.is_null()
    if isinstance(e, A.CastE):
        if e.to not in _TYPES:
            raise NotImplementedError(f"cast type {e.to}")
        return _expr(e.operand).cast(_TYPES[e.to])
    if isinstance(e, A.CaseE):
        chain = None
        for cond, val in e.branches:
            if chain is None:
                chain = E.when(_expr(cond), _expr(val))
            else:
                chain = chain.when(_expr(cond), _expr(val))
        if e.otherwise is not None:
            return chain.otherwise(_expr(e.otherwise))
        return chain.end()
    if isinstance(e, A.Fn):
        name = {"substr": "substring"}.get(e.name, e.name)
        n_params = _PARAM_FNS.get(name)
        args = [_expr(a) for a in e.args]
        if n_params is not None:
            # trailing literal args become static params
            lits = []
            while e.args and isinstance(e.args[-1 - len(lits)], A.Lit) \
                    and (n_params == 0 or len(lits) < 2):
                lits.append(e.args[-1 - len(lits)].value)
            if lits:
                lits.reverse()
                return E.func(name, *args[:len(args) - len(lits)],
                              params=tuple(lits))
        return E.func(name, *args)
    raise NotImplementedError(f"expression {type(e).__name__}")


def _equi_keys(on) -> Tuple[List[str], List[str], Optional[E.Expr]]:
    """Split an ON clause into equi-key pairs + residual condition."""
    conjs: List[Any] = []

    def flatten(x):
        if isinstance(x, A.Bin) and x.op == "and":
            flatten(x.left)
            flatten(x.right)
        else:
            conjs.append(x)
    flatten(on)
    lk, rk, residual = [], [], None
    for c in conjs:
        if isinstance(c, A.Bin) and c.op == "=" and \
                isinstance(c.left, A.Ident) and isinstance(c.right, A.Ident):
            lk.append(c.left.name)
            rk.append(c.right.name)
        else:
            r = _expr(c)
            residual = r if residual is None else (residual & r)
    if not lk:
        raise NotImplementedError("JOIN requires at least one equi-key")
    return lk, rk, residual


def _rel(rel, session) -> Frame:
    if isinstance(rel, A.TableRef):
        return table(session, rel.name)
    if isinstance(rel, A.SubqueryRef):
        return _query(rel.query, session)
    if isinstance(rel, A.JoinRel):
        left = _rel(rel.left, session)
        right = _rel(rel.right, session)
        lk, rk, residual = _equi_keys(rel.on)
        # key sides may arrive swapped relative to left/right relations
        lnames = set(left._names())
        lk2, rk2 = [], []
        for a, b in zip(lk, rk):
            if a in lnames:
                lk2.append(a)
                rk2.append(b)
            else:
                lk2.append(b)
                rk2.append(a)
        return left.join(right, tuple(lk2), tuple(rk2), how=rel.how,
                         condition=residual)
    raise NotImplementedError(type(rel).__name__)


def _agg_kwargs(projs: List[A.Proj], group_names: List[str],
                group_asts: Optional[Dict[str, Any]] = None):
    """Split projections into key selections + aggregate calls."""
    from auron_tpu.expr.nodes import col
    group_asts = group_asts or {}
    aggs: Dict[str, tuple] = {}
    out_cols: List[str] = []
    post: List[Tuple[str, Optional[E.Expr]]] = []  # final projection
    n = 0
    for p in projs:
        alias = p.alias
        if isinstance(p.expr, A.Ident) and not _is_agg(p.expr):
            name = p.expr.name
            out_cols.append(alias or name)
            post.append((alias or name,
                         col(name) if alias and alias != name else None))
            continue
        if alias and group_asts.get(alias) == p.expr:
            # projection repeats a GROUP BY expression — it is a key,
            # already materialized as a column named by its alias
            out_cols.append(alias)
            post.append((alias, None))
            continue
        if not _is_agg(p.expr):
            raise NotImplementedError(
                "non-aggregate projection over GROUP BY must be a key")
        e = p.expr
        if isinstance(e, A.Fn):
            name = alias or f"_c{n}"
            n += 1
            if e.star or (e.name == "count" and not e.args):
                aggs[name] = ("count_star", None)
            elif e.name == "count" and e.distinct:
                aggs[name] = ("count_distinct", _expr(e.args[0]))
            else:
                aggs[name] = (e.name, _expr(e.args[0]))
            post.append((name, None))
            out_cols.append(name)
        else:
            raise NotImplementedError(
                "composite aggregate expressions (wrap in a subquery)")
    return aggs, out_cols, post


def _conjuncts(e):
    if isinstance(e, A.Bin) and e.op == "and":
        yield from _conjuncts(e.left)
        yield from _conjuncts(e.right)
    else:
        yield e


def _is_subquery_pred(c) -> bool:
    return isinstance(c, A.ExistsE) or (isinstance(c, A.InE) and
                                        c.query is not None)


def _apply_exists(f: Frame, p: A.ExistsE, session) -> Frame:
    """[NOT] EXISTS with equality correlation -> semi/anti join, exactly
    how Spark decorrelates it (RewritePredicateSubquery)."""
    sel = p.query
    if not isinstance(sel, A.Select):
        raise NotImplementedError("EXISTS over UNION")
    inner = _rel(sel.rel, session)
    inner_names = set(inner._names())
    outer_names = set(f._names())
    keys_outer, keys_inner = [], []
    residual = None
    for c in (_conjuncts(sel.where) if sel.where is not None else ()):
        if isinstance(c, A.Bin) and c.op == "=" and \
                isinstance(c.left, A.Ident) and \
                isinstance(c.right, A.Ident):
            ln, rn = c.left.name, c.right.name
            if ln in inner_names and rn in outer_names \
                    and rn not in inner_names:
                keys_inner.append(ln)
                keys_outer.append(rn)
                continue
            if rn in inner_names and ln in outer_names \
                    and ln not in inner_names:
                keys_inner.append(rn)
                keys_outer.append(ln)
                continue
        residual = c if residual is None else A.Bin("and", residual, c)
    if residual is not None:
        inner = inner.filter(_expr(residual))
    if not keys_outer:
        raise NotImplementedError(
            "EXISTS needs at least one equality correlation")
    sub = inner.select(**{f"__ex{i}": E.col(k)
                          for i, k in enumerate(keys_inner)})
    how = "left_anti" if p.negated else "left_semi"
    return f.join(sub, tuple(keys_outer),
                  tuple(f"__ex{i}" for i in range(len(keys_inner))),
                  how=how)


def _apply_in_subquery(f: Frame, p: A.InE, session) -> Frame:
    """[NOT] IN (SELECT col ...) -> semi join / null-aware anti join."""
    if not isinstance(p.operand, A.Ident):
        raise NotImplementedError("IN-subquery operand must be a column")
    sub = _query(p.query, session)
    names = sub._names()
    if len(names) != 1:
        raise NotImplementedError("IN subquery must select ONE column")
    sub = sub.select(__in0=E.col(names[0]))
    how = "left_anti" if p.negated else "left_semi"
    # NOT IN is null-aware: one build-side NULL suppresses all probe rows
    return f.join(sub, (p.operand.name,), ("__in0",), how=how,
                  null_aware=p.negated)


def _compile_cross(rel: "A.CrossRel", where, session):
    """Comma-FROM implicit joins (the TPC-DS SQL style): pull equality
    conjuncts out of WHERE as join edges and build the join tree
    greedily, exactly what a planner does with FROM a, b WHERE a.k=b.k.
    Returns (joined frame, leftover WHERE ast or None)."""
    frames = [_rel(r, session) for r in rel.rels]
    names = [set(fr._names()) for fr in frames]
    conjs = list(_conjuncts(where)) if where is not None else []
    edges = []  # (owner_l, owner_r, lname, rname, original ast)
    rest = []
    for c in conjs:
        if isinstance(c, A.Bin) and c.op == "=" and \
                isinstance(c.left, A.Ident) and \
                isinstance(c.right, A.Ident):
            ln, rn = c.left.name, c.right.name
            ol = [i for i, ns in enumerate(names) if ln in ns]
            orr = [i for i, ns in enumerate(names) if rn in ns]
            if len(ol) == 1 and len(orr) == 1 and ol[0] != orr[0]:
                edges.append((ol[0], orr[0], ln, rn, c))
                continue
        rest.append(c)
    joined = {0}
    cur = frames[0]
    remaining = list(edges)
    while len(joined) < len(frames):
        pick = None
        for i, j, *_ in remaining:
            if (i in joined) != (j in joined):
                pick = j if i in joined else i
                break
        if pick is None:
            raise NotImplementedError(
                "implicit cartesian product (no equi-key links the "
                "remaining tables)")
        use = [e for e in remaining
               if pick in (e[0], e[1]) and
               (e[0] in joined or e[1] in joined)]
        lk, rk = [], []
        for e in use:
            i, j, ln, rn, _ = e
            if j == pick:
                lk.append(ln)
                rk.append(rn)
            else:
                lk.append(rn)
                rk.append(ln)
            remaining.remove(e)
        cur = cur.join(frames[pick], tuple(lk), tuple(rk), how="inner")
        joined.add(pick)
    # edges whose endpoints were already joined degrade to plain filters
    rest.extend(e[4] for e in remaining)
    leftover = None
    for c in rest:
        leftover = c if leftover is None else A.Bin("and", leftover, c)
    return cur, leftover


def _select(sel: A.Select, session) -> Frame:
    if isinstance(sel.rel, A.CrossRel):
        f, where = _compile_cross(sel.rel, sel.where, session)
        sel = A.Select(sel.projs, sel.rel, where, sel.group_by,
                       sel.having, sel.order_by, sel.limit, sel.distinct)
    else:
        f = _rel(sel.rel, session)
    if sel.where is not None:
        plain = None
        subq = []
        for c in _conjuncts(sel.where):
            if _is_subquery_pred(c):
                subq.append(c)
            else:
                e = _expr(c)
                plain = e if plain is None else (plain & e)
        if plain is not None:
            f = f.filter(plain)
        for c in subq:
            f = (_apply_exists(f, c, session)
                 if isinstance(c, A.ExistsE)
                 else _apply_in_subquery(f, c, session))
    win = [p for p in sel.projs if isinstance(p.expr, A.WindowFn)]
    if win:
        return _select_window(sel, f, win)
    has_agg = any(_is_agg(p.expr) for p in sel.projs) or sel.group_by
    if has_agg:
        keys = []
        pre: Dict[str, E.Expr] = {}
        group_asts: Dict[str, Any] = {}
        for i, g in enumerate(sel.group_by):
            if isinstance(g, A.Ident):
                keys.append(g.name)
                continue
            # GROUP BY <expr>: materialize it as a derived column first,
            # named by the SELECT alias that repeats the same expression
            # (so it stays addressable) or a synthetic key name
            alias = next((p.alias for p in sel.projs
                          if p.alias and p.expr == g), None)
            name = alias or f"_g{i}"
            pre[name] = _expr(g)
            group_asts[name] = g
            keys.append(name)
        if pre:
            f = f.with_columns(**pre)
        aggs, out_cols, post = _agg_kwargs(sel.projs, keys, group_asts)
        f = f.groupby(*keys).agg(**aggs)
        if sel.having is not None:
            f = f.filter(_expr(sel.having))
        from auron_tpu.expr.nodes import col as _col
        f = f.select(**{n: (e if e is not None else _col(n))
                        for n, e in post})
        proj_map = list(zip(sel.projs, out_cols))
    else:
        if not (len(sel.projs) == 1 and isinstance(sel.projs[0].expr,
                                                   A.Star)):
            items = {}
            for i, p in enumerate(sel.projs):
                if isinstance(p.expr, A.Star):
                    raise NotImplementedError("mixed * and expressions")
                name = p.alias or (p.expr.name if isinstance(p.expr, A.Ident)
                                   else f"_c{i}")
                items[name] = _expr(p.expr)
            f = f.select(**items)
            proj_map = list(zip(sel.projs, items.keys()))
        else:
            proj_map = []
        if sel.distinct:
            f = f.distinct()
    if sel.order_by:
        sort_keys = []
        helpers: Dict[str, E.Expr] = {}
        for i, o in enumerate(sel.order_by):
            if isinstance(o.expr, A.Ident):
                sort_keys.append(SortKey(o.expr.name,
                                         ascending=o.ascending))
                continue
            # ORDER BY <expr> repeating a SELECT expression (e.g. the
            # aggregate itself) sorts by that output column
            match = next((name for p, name in proj_map
                          if p.expr == o.expr), None)
            if match is not None:
                sort_keys.append(SortKey(match, ascending=o.ascending))
                continue
            # otherwise sort on a hidden derived column, dropped after
            name = f"_o{i}"
            helpers[name] = _expr(o.expr)
            sort_keys.append(SortKey(name, ascending=o.ascending))
        if helpers:
            keep = list(f._names())
            f = (f.with_columns(**helpers)
                 .sort(*sort_keys, limit=sel.limit)
                 .select(*keep))
        else:
            f = f.sort(*sort_keys, limit=sel.limit)
    elif sel.limit is not None:
        f = f.limit(sel.limit)
    return f


_WINDOW_KINDS = {"row_number", "rank", "dense_rank", "percent_rank",
                 "cume_dist", "sum", "min", "max", "count", "avg",
                 "lead", "lag", "first_value", "last_value", "ntile"}


def _select_window(sel: A.Select, f: Frame, win) -> Frame:
    """SELECT with window functions (no GROUP BY mixing): group window
    calls by identical (PARTITION BY, ORDER BY) spec, apply Frame.window
    per spec, then project the requested columns."""
    from auron_tpu.ops.window import WindowFunc
    specs: Dict[tuple, list] = {}
    names: Dict[int, str] = {}
    for i, p in enumerate(sel.projs):
        if not isinstance(p.expr, A.WindowFn):
            continue
        w = p.expr
        if w.fn.name not in _WINDOW_KINDS:
            raise NotImplementedError(f"window function {w.fn.name}")
        part = tuple(g.name if isinstance(g, A.Ident) else None
                     for g in w.partition_by)
        if None in part:
            raise NotImplementedError("PARTITION BY expressions")
        order = tuple((o.expr.name, o.ascending) for o in w.order_by
                      if isinstance(o.expr, A.Ident))
        if len(order) != len(w.order_by):
            raise NotImplementedError("ORDER BY expressions in OVER")
        name = p.alias or f"_w{i}"
        names[i] = name
        inp = None
        if w.fn.args:
            if not isinstance(w.fn.args[0], A.Ident):
                raise NotImplementedError("window arg must be a column")
            inp = w.fn.args[0].name
        specs.setdefault((part, order), []).append(
            WindowFunc(name, w.fn.name, input=inp))
    for (part, order), funcs in specs.items():
        f = f.window(list(part),
                     [SortKey(c, ascending=a) for c, a in order],
                     tuple(funcs))
    items = {}
    for i, p in enumerate(sel.projs):
        if isinstance(p.expr, A.WindowFn):
            items[names[i]] = None  # already a column
        elif isinstance(p.expr, A.Ident):
            items[p.alias or p.expr.name] = (
                _expr(p.expr) if p.alias and p.alias != p.expr.name
                else None)
        else:
            items[p.alias or f"_c{i}"] = _expr(p.expr)
    sel_names = [n for n, e in items.items() if e is None]
    sel_exprs = {n: e for n, e in items.items() if e is not None}
    f = f.select(*sel_names, **sel_exprs)
    if sel.order_by:
        keys = []
        for o in sel.order_by:
            if not isinstance(o.expr, A.Ident):
                raise NotImplementedError("ORDER BY expressions")
            keys.append(SortKey(o.expr.name, ascending=o.ascending))
        f = f.sort(*keys, limit=sel.limit)
    elif sel.limit is not None:
        f = f.limit(sel.limit)
    return f


def _query(ast, session) -> Frame:
    if isinstance(ast, A.UnionAll):
        f = _select(ast.selects[0], session)
        for s in ast.selects[1:]:
            f = f.union(_select(s, session))
        return f
    return _select(ast, session)


def compile_sql(sql: str, session) -> str:
    """SQL text -> wire-contract JSON (the front-end's only output)."""
    from auron_tpu.plan.wire import plan_to_json
    return plan_to_json(_query(A.parse_sql(sql), session).plan)


def run_sql(sql: str, session, jit: bool = False):
    """Execute SQL through the NEUTRAL wire contract: text -> wire JSON ->
    plan_from_json -> engine. The engine never sees this front-end's
    objects."""
    from auron_tpu.plan.wire import plan_from_json
    wire = compile_sql(sql, session)
    plan = plan_from_json(wire)
    return session.sql_result(plan)
