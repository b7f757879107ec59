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
            "collect_list", "collect_set", "first", "stddev",
            "stddev_samp"}

_TYPES = {"int": INT32, "integer": INT32, "bigint": INT64, "long": INT64,
          "smallint": INT16, "tinyint": INT8, "double": FLOAT64,
          "float": FLOAT32, "real": FLOAT32, "string": STRING,
          "varchar": STRING, "date": DATE32, "timestamp": TIMESTAMP64,
          "boolean": BOOL, "decimal": DECIMAL64(18, 2)}

# scalar functions whose trailing literal arguments are STATIC params
_PARAM_FNS = {"substring": 1, "substr": 1, "trunc": 1,
              "next_day": 1, "round": 1, "bround": 1, "like": 1,
              "left": 1, "right": 1, "btrim": 1, "locate": 1, "strpos": 1,
              "instr": 1, "regexp_replace": 1, "regexp_extract": 1,
              "find_in_set": 1, "lpad": 1, "rpad": 1, "repeat": 1,
              "split_part": 1}


def _fold_const(v):
    """Fold literal arithmetic (IN (1999, 1999 + 1, ...), -5, ...)."""
    if isinstance(v, A.Un) and v.op == "neg":
        inner = _fold_const(v.operand)
        if isinstance(inner, A.Lit):
            return A.Lit(-inner.value)
    if isinstance(v, A.Bin) and v.op in ("+", "-", "*", "/"):
        l, r = _fold_const(v.left), _fold_const(v.right)
        if isinstance(l, A.Lit) and isinstance(r, A.Lit):
            ops = {"+": lambda a, b: a + b, "-": lambda a, b: a - b,
                   "*": lambda a, b: a * b, "/": lambda a, b: a / b}
            return A.Lit(ops[v.op](l.value, r.value))
    return v


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


# compile-time context: the session + in-scope CTE frames (flat scoping,
# like the converter's single name space). Pushed by compile_sql /
# _query(WithQ); read by TableRef resolution and scalar subqueries.
_CTX_SESSION: List[Any] = []
_CTX_CTES: List[Dict[str, Frame]] = []


def _current_ctes() -> Dict[str, Frame]:
    return _CTX_CTES[-1] if _CTX_CTES else {}


def _expr(e) -> E.Expr:
    """SQL expression AST -> engine expression."""
    if isinstance(e, A.Ident):
        return E.col(e.name)
    if isinstance(e, A.Lit):
        return E.lit(e.value)
    if isinstance(e, A.IntervalE):
        # bare day-granular interval folds to an int literal (date32 IS
        # days-since-epoch, so +/- stays plain lane arithmetic); intervals
        # with month/micro parts are only meaningful under +/- (see Bin)
        if e.months == 0 and e.micros == 0:
            return E.lit(e.days)
        raise NotImplementedError(
            "month/sub-day INTERVAL outside date +/- context")
    if isinstance(e, A.SubqueryE):
        # scalar subquery -> evaluated INSIDE the traced program
        return _query(e.query, _CTX_SESSION[-1]).as_scalar_expr()
    if isinstance(e, A.Un):
        if e.op == "not":
            return ~_expr(e.operand)
        return E.lit(0) - _expr(e.operand)
    if isinstance(e, A.Bin):
        if e.op in ("+", "-") and (isinstance(e.right, A.IntervalE)
                                   or isinstance(e.left, A.IntervalE)):
            iv = e.right if isinstance(e.right, A.IntervalE) else e.left
            if iv is e.left and e.op == "-":
                raise NotImplementedError("INTERVAL - date")
            other = e.left if iv is e.right else e.right
            sign = 1 if e.op == "+" else -1
            # dtype-aware kernel: date32 stays day arithmetic, timestamp64
            # gets microsecond arithmetic, month parts clamp civil months
            return E.func("interval_add", _expr(other),
                          params=(iv.months, iv.days, iv.micros, sign))
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
            v = _fold_const(v)
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
        if e.to == "decimal" and getattr(e, "params", ()):
            from auron_tpu.dtypes import decimal_type
            p = e.params[0]
            s = e.params[1] if len(e.params) > 1 else 0
            return _expr(e.operand).cast(decimal_type(p, s))
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
        if name == "concat_ws":
            # SQL puts the SEPARATOR first; the kernel takes it as the
            # trailing static param
            sep = _fold_const(e.args[0])
            if not isinstance(sep, A.Lit):
                raise NotImplementedError("concat_ws separator expression")
            return E.func("concat_ws", *[_expr(a) for a in e.args[1:]],
                          params=(sep.value,))
        if name == "locate" and len(e.args) in (2, 3):
            # Spark: locate(substr, str[, pos]) — the substring LEADS; the
            # kernel takes (column, substr, pos) with substr/pos static
            sub = _fold_const(e.args[0])
            if not isinstance(sub, A.Lit):
                raise NotImplementedError("locate substring expression")
            params = [sub.value]
            if len(e.args) == 3:
                pos = _fold_const(e.args[2])
                if not isinstance(pos, A.Lit):
                    raise NotImplementedError("locate position expression")
                params.append(pos.value)
            return E.func("locate", _expr(e.args[1]), params=tuple(params))
        if name == "date_part" and len(e.args) == 2:
            # DataFusion: date_part(field, source) — the field LEADS
            fld = _fold_const(e.args[0])
            if not isinstance(fld, A.Lit):
                raise NotImplementedError("date_part field expression")
            return E.func("date_part", _expr(e.args[1]),
                          params=(fld.value,))
        if name == "digest" and len(e.args) == 2:
            alg = _fold_const(e.args[1])
            if not isinstance(alg, A.Lit):
                raise NotImplementedError("digest algorithm expression")
            return E.func("digest", _expr(e.args[0]), params=(alg.value,))
        if name == "date_trunc" and len(e.args) == 2:
            # Spark: date_trunc(fmt, ts) — the format LEADS
            fmt = _fold_const(e.args[0])
            if not isinstance(fmt, A.Lit):
                raise NotImplementedError("date_trunc format expression")
            return E.func("date_trunc", _expr(e.args[1]),
                          params=(fmt.value,))
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
    if isinstance(rel, A.FrameRef):
        return rel.frame
    if isinstance(rel, A.TableRef):
        env = _current_ctes()
        if rel.name in env:
            return env[rel.name]
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
        match = next((name for name, ast in group_asts.items()
                      if ast == p.expr), None)
        if match is not None:
            # projection repeats a GROUP BY expression — it is a key,
            # already materialized as a derived column
            out = alias or match
            out_cols.append(out)
            post.append((out, col(match) if out != match else None))
            continue
        e = p.expr
        if isinstance(e, A.Fn) and _is_agg(e):
            # plain aggregate call: the agg output IS the column, named
            # by its alias so HAVING/ORDER BY can address it
            name = alias or f"_c{n}"
            n += 1
            aggs[name] = _one_agg(e)
            post.append((name, None))
            out_cols.append(name)
            continue
        # composite: arithmetic over aggregates and/or group keys —
        # extract each aggregate into a hidden output, post-project
        rewritten = _extract_aggs(e, aggs)
        name = alias or f"_c{n}"
        n += 1
        post.append((name, _expr(rewritten)))
        out_cols.append(name)
    return aggs, out_cols, post


def _one_agg(e: A.Fn) -> tuple:
    if e.star or (e.name == "count" and not e.args):
        return ("count_star", None)
    if e.name == "count" and e.distinct:
        return ("count_distinct", _expr(e.args[0]))
    return (e.name, _expr(e.args[0]))


def _rewrite_ast(e, visit):
    """Generic bottom-less AST rewrite: visit(e) returns a replacement
    or None to recurse into children."""
    r = visit(e)
    if r is not None:
        return r
    if not hasattr(e, "__dataclass_fields__"):
        return e
    kw = {}
    for fld in e.__dataclass_fields__:
        v = getattr(e, fld)
        if isinstance(v, list):
            v = [tuple(_rewrite_ast(x, visit) for x in item)
                 if isinstance(item, tuple)
                 else _rewrite_ast(item, visit) for item in v]
        elif isinstance(v, tuple) and fld != "parts":
            v = tuple(_rewrite_ast(x, visit) for x in v)
        elif hasattr(v, "__dataclass_fields__"):
            v = _rewrite_ast(v, visit)
        kw[fld] = v
    return type(e)(**kw)


def _extract_aggs(e, aggs: Dict[str, tuple]):
    """Rewrite an AST, replacing every aggregate Fn with a reference to a
    hidden agg output column (the planner's aggregate-extraction pass)."""
    def visit(x):
        if _own_scope(x):
            return x  # subquery scopes own their aggregates
        if isinstance(x, A.Fn) and _is_agg(x):
            name = f"_a{len(aggs)}"
            aggs[name] = _one_agg(x)
            return A.Ident((name,))
        return None
    return _rewrite_ast(e, visit)


def _own_scope(x) -> bool:
    return isinstance(x, (A.SubqueryE, A.ExistsE)) or \
        (isinstance(x, A.InE) and x.query is not None)


def _apply_grouped(sel: A.Select, f: Frame):
    """The GROUP BY + aggregate + HAVING + projection pipeline. Returns
    (frame, proj_map, trim_to) for the shared ORDER BY tail."""
    from auron_tpu.expr.nodes import col as _col
    keys, pre, group_asts = _group_keys(sel)
    if pre:
        f = f.with_columns(**pre)
    aggs, out_cols, post = _agg_kwargs(sel.projs, keys, group_asts)
    having_expr = None
    if sel.having is not None:
        # HAVING may contain its own aggregates (HAVING count(*) > n)
        # — extract them into hidden agg outputs first
        having_expr = _expr(_extract_aggs(sel.having, aggs))
    f = f.groupby(*keys).agg(**aggs)
    if having_expr is not None:
        f = f.filter(having_expr)
    # ORDER BY may reference group keys that the SELECT list drops —
    # carry them through the projection, trimmed again after sorting
    post_names = [n for n, _ in post]
    order_idents = {o.expr.name for o in sel.order_by
                    if isinstance(o.expr, A.Ident)}
    carry = [k for k in keys
             if k in order_idents and k not in post_names]
    items = {n: (e if e is not None else _col(n)) for n, e in post}
    items.update({c: _col(c) for c in carry})
    f = f.select(**items)
    return f, list(zip(sel.projs, out_cols)), \
        (post_names if carry else None)


def _apply_rollup(sel: A.Select, f: Frame, rollup: A.Fn):
    """GROUP BY ROLLUP(k1..kn) / CUBE: union of grouping sets. Each
    level nulls its dropped keys BEFORE grouping (a NULL key collapses
    to one group AND surfaces as a typed NULL output — one mechanism
    for both effects); grouping(k) folds to a per-level literal."""
    nkeys = []
    for g in rollup.args:
        if not isinstance(g, A.Ident):
            raise NotImplementedError("ROLLUP over expressions")
        nkeys.append(g.name)
    if rollup.name == "cube":
        from itertools import combinations
        levels = [set(c) for d in range(len(nkeys), -1, -1)
                  for c in combinations(nkeys, d)]
    else:
        levels = [set(nkeys[:d]) for d in range(len(nkeys), -1, -1)]
    u = None
    for kept in levels:
        dropped = [k for k in nkeys if k not in kept]

        def sub(x, dropped=tuple(dropped)):
            if isinstance(x, A.Fn) and x.name == "grouping" and \
                    x.args and isinstance(x.args[0], A.Ident):
                return A.Lit(1 if x.args[0].name in dropped else 0)
            return None

        projs_d = [A.Proj(_rewrite_ast(p.expr, sub), p.alias)
                   for p in sel.projs]
        having_d = _rewrite_ast(sel.having, sub) \
            if sel.having is not None else None
        f_d = f
        if dropped:
            f_d = f.with_columns(**{
                k: E.when(E.lit(False), E.col(k)).end()
                for k in dropped})
        sel_d = A.Select(projs_d, sel.rel, None,
                         [A.Ident((k,)) for k in nkeys], having_d, [],
                         None, False)
        lvl, proj_map, _ = _apply_grouped(sel_d, f_d)
        u = lvl if u is None else u.union(lvl)
    return u, proj_map, None


def _group_keys(sel: A.Select):
    """GROUP BY clause -> (key names, pre-projection exprs, ast map).
    GROUP BY <expr> materializes as a derived column first, named by the
    SELECT alias that repeats the same expression or a synthetic name."""
    keys: List[str] = []
    pre: Dict[str, E.Expr] = {}
    group_asts: Dict[str, Any] = {}
    for i, g in enumerate(sel.group_by):
        if isinstance(g, A.Ident):
            keys.append(g.name)
            continue
        alias = next((p.alias for p in sel.projs
                      if p.alias and p.expr == g), None)
        name = alias or f"_g{i}"
        pre[name] = _expr(g)
        group_asts[name] = g
        keys.append(name)
    return keys, pre, group_asts


def _extract_aggs_mixed(e, aggs: Dict[str, tuple],
                        grs: Optional[Dict[str, str]] = None):
    """Like _extract_aggs but window-aware: the window's own function is
    kept, while grouped aggregates inside its args/partition/order (and
    anywhere else) become hidden agg outputs. With ``grs``, grouping(k)
    calls become hidden per-level indicator columns (ROLLUP)."""
    def visit(x):
        if isinstance(x, A.WindowFn):
            fn2 = A.Fn(x.fn.name,
                       [_extract_aggs_mixed(a, aggs, grs)
                        for a in x.fn.args],
                       x.fn.distinct, x.fn.star)
            part = [_extract_aggs_mixed(g, aggs, grs)
                    for g in x.partition_by]
            order = [A.OrderItem(_extract_aggs_mixed(o.expr, aggs, grs),
                                 o.ascending) for o in x.order_by]
            return A.WindowFn(fn2, part, order)
        if _own_scope(x):
            return x
        if grs is not None and isinstance(x, A.Fn) and \
                x.name == "grouping" and x.args and \
                isinstance(x.args[0], A.Ident):
            name = f"_gr{len(grs)}"
            grs[name] = x.args[0].name
            return A.Ident((name,))
        if isinstance(x, A.Fn) and _is_agg(x):
            name = f"_a{len(aggs)}"
            aggs[name] = _one_agg(x)
            return A.Ident((name,))
        return None
    return _rewrite_ast(e, visit)


def _has_window(e) -> bool:
    if isinstance(e, A.WindowFn):
        return True
    if not hasattr(e, "__dataclass_fields__"):
        return False
    for fld in e.__dataclass_fields__:
        v = getattr(e, fld)
        vs = v if isinstance(v, (list, tuple)) else [v]
        for item in vs:
            items = item if isinstance(item, tuple) else [item]
            for x in (items if isinstance(items, (list, tuple))
                      else [items]):
                if hasattr(x, "__dataclass_fields__") and _has_window(x):
                    return True
    return False


def _conjuncts(e):
    if isinstance(e, A.Bin) and e.op == "and":
        yield from _conjuncts(e.left)
        yield from _conjuncts(e.right)
    else:
        yield e


def _is_subquery_pred(c) -> bool:
    return isinstance(c, A.ExistsE) or (isinstance(c, A.InE) and
                                        c.query is not None)


def _apply_exists(f: Frame, p: A.ExistsE, session,
                  marker: Optional[str] = None) -> Frame:
    """[NOT] EXISTS with equality correlation -> semi/anti join, exactly
    how Spark decorrelates it (RewritePredicateSubquery). With ``marker``
    the match becomes an existence-join bool column instead of a filter
    (EXISTS nested under OR)."""
    sel = p.query
    if not isinstance(sel, A.Select):
        raise NotImplementedError("EXISTS over UNION")
    if isinstance(sel.rel, A.CrossRel):
        inner = None
        for r in sel.rel.rels:
            nxt = _rel(r, session)
            if inner is None:
                inner = nxt
                continue
            # equality conjuncts linking the inner tables are resolved
            # below with the correlation scan; join here on shared keys
            # found in sel.where between the two inner frames
            a, b = set(inner._names()), set(nxt._names())
            lk, rk = [], []
            for c in (_conjuncts(sel.where) if sel.where is not None
                      else ()):
                if isinstance(c, A.Bin) and c.op == "=" and \
                        isinstance(c.left, A.Ident) and \
                        isinstance(c.right, A.Ident):
                    ln, rn = c.left.name, c.right.name
                    if ln in a and rn in b and rn not in a:
                        lk.append(ln)
                        rk.append(rn)
                    elif rn in a and ln in b and ln not in a:
                        lk.append(rn)
                        rk.append(ln)
            if not lk:
                raise NotImplementedError(
                    "EXISTS inner cartesian product")
            inner = inner.join(nxt, tuple(lk), tuple(rk))
    else:
        inner = _rel(sel.rel, session)
    inner_names = set(inner._names())
    outer_names = set(f._names())
    aliases = _inner_aliases(sel.rel)

    def kind(i: A.Ident) -> str:
        if len(i.parts) > 1:
            return "inner" if i.parts[0] in aliases else "outer"
        if i.name in inner_names and i.name not in outer_names:
            return "inner"
        if i.name in outer_names and i.name not in inner_names:
            return "outer"
        return "unknown"

    def ident_sides(x, found):
        if isinstance(x, A.Ident):
            found.add(kind(x))
        for fld in getattr(x, "__dataclass_fields__", {}):
            v = getattr(x, fld)
            vs = v if isinstance(v, (list, tuple)) else [v]
            for item in vs:
                for y in (item if isinstance(item, tuple) else [item]):
                    if hasattr(y, "__dataclass_fields__"):
                        ident_sides(y, found)
        return found

    keys_outer, keys_inner = [], []
    inner_resid = None    # references only the inner scope
    cross_resid = []      # references both scopes -> join condition
    for c in (_conjuncts(sel.where) if sel.where is not None else ()):
        if isinstance(c, A.Bin) and c.op == "=" and \
                isinstance(c.left, A.Ident) and \
                isinstance(c.right, A.Ident):
            kl, kr = kind(c.left), kind(c.right)
            if {kl, kr} == {"inner", "outer"}:
                inner_i, outer_i = ((c.left, c.right) if kl == "inner"
                                    else (c.right, c.left))
                keys_inner.append(inner_i.name)
                keys_outer.append(outer_i.name)
                continue
        sides = ident_sides(c, set())
        if "outer" in sides:
            cross_resid.append(c)
        else:
            inner_resid = c if inner_resid is None \
                else A.Bin("and", inner_resid, c)
    if inner_resid is not None:
        inner = inner.filter(_expr(inner_resid))
    if not keys_outer:
        raise NotImplementedError(
            "EXISTS needs at least one equality correlation")
    # carry inner columns the cross-scope residual needs, renamed so the
    # join condition can tell the two scopes apart (same-table EXISTS)
    carry: Dict[str, str] = {}
    condition = None
    for c in cross_resid:
        def rewrite(x):
            if isinstance(x, A.Ident) and kind(x) == "inner":
                nm = carry.setdefault(x.name, f"__exv{len(carry)}")
                return A.Ident((nm,))
            if isinstance(x, A.Ident):
                return A.Ident((x.name,))
            return None
        ce = _expr(_rewrite_ast(c, rewrite))
        condition = ce if condition is None else (condition & ce)
    sub_cols = {f"__ex{i}": E.col(k)
                for i, k in enumerate(keys_inner)}
    sub_cols.update({nm: E.col(orig) for orig, nm in carry.items()})
    sub = inner.select(**sub_cols)
    how = "existence" if marker is not None else \
        ("left_anti" if p.negated else "left_semi")
    return f.join(sub, tuple(keys_outer),
                  tuple(f"__ex{i}" for i in range(len(keys_inner))),
                  how=how, condition=condition, existence_col=marker)


def _apply_in_subquery(f: Frame, p: A.InE, session,
                       marker: Optional[str] = None) -> Frame:
    """[NOT] IN (SELECT col ...) -> semi join / null-aware anti join.
    With ``marker`` the membership becomes an existence-join bool column
    instead of a filter (IN nested under OR)."""
    if not isinstance(p.operand, A.Ident):
        raise NotImplementedError("IN-subquery operand must be a column")
    sub = _query(p.query, session)
    names = sub._names()
    if len(names) != 1:
        raise NotImplementedError("IN subquery must select ONE column")
    sub = sub.select(__in0=E.col(names[0]))
    if marker is not None:
        return f.join(sub, (p.operand.name,), ("__in0",), how="existence",
                      existence_col=marker)
    how = "left_anti" if p.negated else "left_semi"
    # NOT IN is null-aware: one build-side NULL suppresses all probe rows
    return f.join(sub, (p.operand.name,), ("__in0",), how=how,
                  null_aware=p.negated)


def _apply_subquery_markers(f: Frame, c, session):
    """Rewrite [NOT] EXISTS / IN-subquery predicates NESTED inside a
    conjunct (typically under OR) into existence-join marker columns;
    returns (frame with markers joined, rewritten conjunct ast). NOT IN
    markers are plain negated existence (the null-aware edge case of a
    build-side NULL is not modelled under OR)."""
    state = {"f": f, "n": 0}

    def visit(x):
        if isinstance(x, (A.ExistsE, A.InE)) and \
                (isinstance(x, A.ExistsE) or x.query is not None):
            col = f"__m{state['n']}"
            state["n"] += 1
            if isinstance(x, A.ExistsE):
                state["f"] = _apply_exists(
                    state["f"], A.ExistsE(x.query, False), session,
                    marker=col)
            else:
                state["f"] = _apply_in_subquery(
                    state["f"], A.InE(x.operand, [], False, x.query),
                    session, marker=col)
            out = A.Ident((col,))
            return A.Un("not", out) if x.negated else out
        return None

    new_ast = _rewrite_ast(c, visit)  # mutates state["f"] — order matters
    return state["f"], new_ast


def _has_nested_setpred(c) -> bool:
    return any(isinstance(x, A.ExistsE) or
               (isinstance(x, A.InE) and x.query is not None)
               for x in _walk_ast(c))


def _walk_ast(e):
    """Yield every dataclass AST node reachable from ``e`` (incl. e)."""
    stack = [e]
    while stack:
        x = stack.pop()
        if isinstance(x, (list, tuple)):
            stack.extend(x)
        elif hasattr(x, "__dataclass_fields__"):
            yield x
            for fld in x.__dataclass_fields__:
                stack.append(getattr(x, fld))


def _has_subquery(c) -> bool:
    return any(isinstance(x, (A.SubqueryE, A.ExistsE)) or
               (isinstance(x, A.InE) and x.query is not None)
               for x in _walk_ast(c))


def _disjuncts(e):
    if isinstance(e, A.Bin) and e.op == "or":
        return _disjuncts(e.left) + _disjuncts(e.right)
    return [e]


def _or_factor(c):
    """Factor conjuncts common to every branch of an OR out of it:
    (a and x or a and y) -> [a, (x or y)]. TPC-DS repeats the equi-join
    key inside each OR branch (q13/q48/q85); factoring it out exposes
    the join edge to the comma-FROM planner."""
    ds = _disjuncts(c)
    if len(ds) < 2:
        return [c]
    sets = [list(_conjuncts(d)) for d in ds]
    common = [x for x in sets[0]
              if all(any(x == y for y in s) for s in sets[1:])]
    if not common:
        return [c]
    reduced = []
    for s in sets:
        rem = [x for x in s if not any(x == y for y in common)]
        if not rem:
            reduced = None  # one branch ⊆ common: OR of the rest is true
            break
        r = rem[0]
        for x in rem[1:]:
            r = A.Bin("and", r, x)
        reduced.append(r)
    out = list(common)
    if reduced is not None:
        o = reduced[0]
        for r in reduced[1:]:
            o = A.Bin("or", o, r)
        out.append(o)
    return out


def _compile_cross(rel: "A.CrossRel", where, session):
    """Comma-FROM implicit joins (the TPC-DS SQL style): push
    single-relation conjuncts below the joins, pull equality conjuncts
    (incl. expression equalities, and equalities OR-factored out of
    disjunctions) out of WHERE as join edges, and build the join tree
    greedily. Relations no equi-key reaches are cross-joined via a
    constant key (smallest estimated side first) — the overflow regrow
    loop sizes the product. Returns (frame, leftover WHERE ast)."""
    frames = [_rel(r, session) for r in rel.rels]
    names = [set(fr._names()) for fr in frames]
    alias_ix: Dict[str, int] = {}
    for i, r in enumerate(rel.rels):
        a = getattr(r, "alias", None)
        if a:
            alias_ix.setdefault(a, i)
        if isinstance(r, A.TableRef):
            alias_ix.setdefault(r.name, i)

    def owners(x):
        """Relation indexes referenced by idents under ``x``; None when
        any ident resolves nowhere (outer scope) or ambiguously."""
        out = set()
        for n in _walk_ast(x):
            if not isinstance(n, A.Ident):
                continue
            if len(n.parts) > 1 and n.parts[0] in alias_ix:
                out.add(alias_ix[n.parts[0]])
                continue
            own = [i for i, ns in enumerate(names) if n.name in ns]
            if len(own) != 1:
                return None
            out.add(own[0])
        return out

    conjs = []
    for c in (_conjuncts(where) if where is not None else ()):
        conjs.extend(_or_factor(c))
    edges = []  # (owner_l, owner_r, left ast, right ast, original ast)
    rest = []
    pushed: List[list] = [[] for _ in frames]
    for c in conjs:
        if _has_subquery(c):
            rest.append(c)
            continue
        own = owners(c)
        if own is not None and len(own) == 1:
            pushed[next(iter(own))].append(c)
            continue
        if isinstance(c, A.Bin) and c.op == "=":
            lo, ro = owners(c.left), owners(c.right)
            if lo and ro and len(lo) == 1 and len(ro) == 1 and lo != ro:
                edges.append((next(iter(lo)), next(iter(ro)),
                              c.left, c.right, c))
                continue
        rest.append(c)
    for i, cs in enumerate(pushed):
        if cs:
            e = _expr(cs[0])
            for c in cs[1:]:
                e = e & _expr(c)
            frames[i] = frames[i].filter(e)

    ck = 0

    def key_for(side, idx) -> str:
        nonlocal ck
        if isinstance(side, A.Ident) and side.name in names[idx]:
            return side.name
        cname = f"__ck{ck}"
        ck += 1
        frames[idx] = frames[idx].with_columns(**{cname: _expr(side)})
        names[idx].add(cname)
        return cname

    remaining = [(i, j, key_for(le, i), key_for(re_, j), c)
                 for i, j, le, re_, c in edges]
    joined = {0}
    cur = frames[0]
    while len(joined) < len(frames):
        pick = None
        for i, j, *_ in remaining:
            if (i in joined) != (j in joined):
                pick = j if i in joined else i
                break
        if pick is None:
            # cartesian fallback: cross-join the smallest remaining side
            left_ix = [i for i in range(len(frames)) if i not in joined]

            def est(i):
                r = frames[i]._estimated_rows()
                return r if r is not None else 10 ** 12
            pick = min(left_ix, key=est)
            cur = cur.with_columns(__cxl=E.lit(0)).join(
                frames[pick].with_columns(__cxr=E.lit(0)),
                ("__cxl",), ("__cxr",), how="inner")
            joined.add(pick)
            continue
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


def _inner_aliases(rel) -> set:
    out = set()

    def add(r):
        if isinstance(r, A.TableRef):
            out.add(r.name)
            if r.alias:
                out.add(r.alias)
        elif isinstance(r, A.SubqueryRef):
            out.add(r.alias)
        elif isinstance(r, A.JoinRel):
            add(r.left)
            add(r.right)
        elif isinstance(r, A.CrossRel):
            for x in r.rels:
                add(x)
    add(rel)
    return out


def _extract_one_subquery(e):
    """Rewrite the single SubqueryE inside ``e`` to Ident('_sc'); returns
    (rewritten, subquery) or (e, None) if there is not exactly one."""
    found: List[Any] = []

    def visit(x):
        if isinstance(x, A.SubqueryE):
            found.append(x)
            return A.Ident(("_sc",))
        return None
    rew = _rewrite_ast(e, visit)
    return (rew, found[0]) if len(found) == 1 else (e, None)


def _scalar_cmp_parts(c):
    """Conjunct comparing an expression against a scalar subquery — the
    subquery may sit inside arithmetic (q6: price > 1.2 * (SELECT avg..)).
    Returns (other_side, subquery, op, cmp_ast) where cmp_ast is the whole
    comparison with the subquery replaced by Ident('_sc')."""
    if isinstance(c, A.Bin) and c.op in ("<", "<=", ">", ">=", "=",
                                         "<>", "!="):
        lr, lsq = _extract_one_subquery(c.left)
        rr, rsq = _extract_one_subquery(c.right)
        if rsq is not None and lsq is None:
            return c.left, rsq, c.op, A.Bin(c.op, c.left, rr)
        if lsq is not None and rsq is None:
            flip = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}
            return c.right, lsq, flip.get(c.op, c.op), \
                A.Bin(c.op, lr, c.right)
    return None


def _correlation_pairs(sel: A.Select, inner_names: set,
                       inner_aliases: set, outer_names: set):
    """Split the subquery WHERE into outer-correlation equality pairs
    and residual conjuncts, resolving sides by alias qualifier first
    (a.col) and flat name second."""
    pairs, rest = [], []

    def kind(i: A.Ident) -> str:
        if len(i.parts) > 1:
            return "inner" if i.parts[0] in inner_aliases else "outer"
        if i.name in inner_names:
            return "inner"
        if i.name in outer_names:
            return "outer"
        return "unknown"

    conjs: List[Any] = []
    for c in (_conjuncts(sel.where) if sel.where is not None else ()):
        # q41 repeats the correlation equality inside every OR branch;
        # factoring it out exposes the pair
        conjs.extend(_or_factor(c))
    for c in conjs:
        if isinstance(c, A.Bin) and c.op == "=" and \
                isinstance(c.left, A.Ident) and \
                isinstance(c.right, A.Ident):
            kl, kr = kind(c.left), kind(c.right)
            if {kl, kr} == {"inner", "outer"}:
                inner_i, outer_i = ((c.left, c.right) if kl == "inner"
                                    else (c.right, c.left))
                pairs.append((inner_i.name, outer_i.name))
                continue
        rest.append(c)
    leftover = None
    for c in rest:
        leftover = c if leftover is None else A.Bin("and", leftover, c)
    return pairs, leftover


def _is_correlated_scalar(c, outer_names: set, session) -> bool:
    parts = _scalar_cmp_parts(c)
    if parts is None:
        return False
    sel = parts[1].query
    if not isinstance(sel, A.Select):
        return False
    try:
        inner = (_compile_cross(sel.rel, None, session)[0]
                 if isinstance(sel.rel, A.CrossRel)
                 else _rel(sel.rel, session))
    except NotImplementedError:
        # cross join edges live in WHERE; resolve names per-relation
        inner_names = set()
        for r in sel.rel.rels:
            inner_names |= set(_rel(r, session)._names())
        pairs, _ = _correlation_pairs(sel, inner_names,
                                      _inner_aliases(sel.rel),
                                      outer_names)
        return bool(pairs)
    pairs, _ = _correlation_pairs(sel, set(inner._names()),
                                  _inner_aliases(sel.rel), outer_names)
    return bool(pairs)


def _apply_scalar_cmp(f: Frame, c, session) -> Frame:
    """Correlated scalar-aggregate comparison -> grouped subquery joined
    on the correlation keys (Spark's RewriteCorrelatedScalarSubquery)."""
    _other_ast, sq, _op, cmp_ast = _scalar_cmp_parts(c)
    sel = sq.query
    outer_names = set(f._names())
    aliases = _inner_aliases(sel.rel)
    if isinstance(sel.rel, A.CrossRel):
        inner_names = set()
        for r in sel.rel.rels:
            inner_names |= set(_rel(r, session)._names())
    else:
        inner_names = set(_rel(sel.rel, session)._names())
    pairs, residual = _correlation_pairs(sel, inner_names, aliases,
                                         outer_names)
    if isinstance(sel.rel, A.CrossRel):
        inner, residual = _compile_cross(sel.rel, residual, session)
        if residual is not None:
            inner = inner.filter(_expr(residual))
    else:
        inner = _rel(sel.rel, session)
        if residual is not None:
            inner = inner.filter(_expr(residual))
    ikeys = [p[0] for p in pairs]
    okeys = [p[1] for p in pairs]
    sel_inner = A.Select([A.Proj(sel.projs[0].expr, "_sc")] +
                         [A.Proj(A.Ident((k,)), None) for k in ikeys],
                         sel.rel, None,
                         [A.Ident((k,)) for k in ikeys], None, [],
                         None, False)
    grouped, _, _ = _apply_grouped(sel_inner, inner)
    grouped = grouped.select(
        _sc=E.col("_sc"),
        **{f"__ck{i}": E.col(k) for i, k in enumerate(ikeys)})
    keep = list(f._names())
    f = f.join(grouped, tuple(okeys),
               tuple(f"__ck{i}" for i in range(len(ikeys))), how="left")
    return f.filter(_expr(cmp_ast)).select(*keep)


def _disambiguate(sel: A.Select, session) -> A.Select:
    """Self-join scoping: when FROM repeats a table/CTE, rename each
    colliding aliased relation's columns to alias__col and rewrite the
    qualified references throughout the SELECT (incl. subqueries that
    correlate on the outer aliases). Flat names stay flat for the
    non-colliding relations."""
    leaves: List[Any] = []

    def walk(r):
        if isinstance(r, (A.TableRef, A.SubqueryRef, A.FrameRef)):
            leaves.append(r)
        elif isinstance(r, A.JoinRel):
            walk(r.left)
            walk(r.right)
        elif isinstance(r, A.CrossRel):
            for x in r.rels:
                walk(x)
    walk(sel.rel)
    if len(leaves) < 2:
        return sel
    frames = []
    for lf in leaves:
        try:
            frames.append(_rel(lf, session))
        except Exception:
            return sel  # unresolvable leaf — let the normal path report
    name_sets = [set(fr._names()) for fr in frames]
    collide = [any(i != j and name_sets[i] & name_sets[j]
                   for j in range(len(leaves)))
               for i in range(len(leaves))]
    if not any(collide):
        return sel
    alias_map: Dict[str, set] = {}  # scope name -> renamed column set
    repl: Dict[int, A.FrameRef] = {}
    for i, lf in enumerate(leaves):
        if not collide[i]:
            continue
        alias = getattr(lf, "alias", None)
        if alias is None and isinstance(lf, A.TableRef):
            alias = lf.name  # unaliased table/CTE: its name IS the scope
        if alias is None or alias in alias_map:
            return sel  # unscopable or duplicate-scope ambiguity
        # rename ONLY the colliding columns so flat references to this
        # leaf's unique columns (q77: ws.sales) keep resolving
        clash = {c for j in range(len(leaves)) if j != i
                 for c in name_sets[i] & name_sets[j]}
        renamed = frames[i].select(**{
            (f"{alias}__{c}" if c in clash else c): E.col(c)
            for c in sorted(name_sets[i])})
        repl[id(lf)] = A.FrameRef(renamed,
                                  tuple(f"{alias}__{c}" if c in clash else c
                                        for c in sorted(name_sets[i])))
        alias_map[alias] = clash

    def sub_rel(r):
        if id(r) in repl:
            return repl[id(r)]
        if isinstance(r, A.JoinRel):
            return A.JoinRel(sub_rel(r.left), sub_rel(r.right), r.how,
                             r.on)
        if isinstance(r, A.CrossRel):
            return A.CrossRel([sub_rel(x) for x in r.rels])
        return r

    def visit(x):
        if isinstance(x, A.Ident) and len(x.parts) > 1 and \
                x.parts[0] in alias_map:
            col = x.parts[-1]
            if col in alias_map[x.parts[0]]:
                return A.Ident((f"{x.parts[0]}__{col}",))
            return A.Ident((col,))  # unique column: drop the qualifier
        return None

    def proj_alias(p: A.Proj):
        # SELECT a.col outputs "col"; keep that name once a.col has been
        # rewritten to the scoped a__col
        if p.alias is None and isinstance(p.expr, A.Ident) and \
                len(p.expr.parts) > 1 and p.expr.parts[0] in alias_map:
            return p.expr.parts[-1]
        return p.alias

    new_rel = sub_rel(sel.rel)
    out = A.Select([A.Proj(_rewrite_ast(p.expr, visit), proj_alias(p))
                    for p in sel.projs],
                   new_rel,
                   _rewrite_ast(sel.where, visit)
                   if sel.where is not None else None,
                   [_rewrite_ast(g, visit) for g in sel.group_by],
                   _rewrite_ast(sel.having, visit)
                   if sel.having is not None else None,
                   [A.OrderItem(_rewrite_ast(o.expr, visit),
                                o.ascending) for o in sel.order_by],
                   sel.limit, sel.distinct)
    # JoinRel ON clauses also carry qualified refs
    def fix_on(r):
        if isinstance(r, A.JoinRel):
            return A.JoinRel(fix_on(r.left), fix_on(r.right), r.how,
                             _rewrite_ast(r.on, visit))
        if isinstance(r, A.CrossRel):
            return A.CrossRel([fix_on(x) for x in r.rels])
        return r
    return A.Select(out.projs, fix_on(out.rel), out.where,
                    out.group_by, out.having, out.order_by, out.limit,
                    out.distinct)


def _ordinal_order_by(sel: A.Select) -> A.Select:
    """ORDER BY 1 — SQL ordinals address the SELECT list (q74's
    ORDER BY 1, 1, 1)."""
    if not any(isinstance(o.expr, A.Lit) and isinstance(o.expr.value, int)
               for o in sel.order_by):
        return sel

    def resolve(o: A.OrderItem) -> A.OrderItem:
        if isinstance(o.expr, A.Lit) and isinstance(o.expr.value, int) \
                and 1 <= o.expr.value <= len(sel.projs):
            p = sel.projs[o.expr.value - 1]
            e = A.Ident((p.alias,)) if p.alias else p.expr
            return A.OrderItem(e, o.ascending)
        return o
    return A.Select(sel.projs, sel.rel, sel.where, sel.group_by,
                    sel.having, [resolve(o) for o in sel.order_by],
                    sel.limit, sel.distinct)


def _uniq_name(taken, name: str) -> str:
    """SQL output lists may repeat a name; our dict-shaped projections
    cannot — suffix _2, _3, ... (positional consumers are unaffected)."""
    if name not in taken:
        return name
    k = 2
    while f"{name}_{k}" in taken:
        k += 1
    return f"{name}_{k}"


def _select(sel: A.Select, session) -> Frame:
    sel = _ordinal_order_by(sel)
    sel = _disambiguate(sel, session)
    if isinstance(sel.rel, A.CrossRel):
        f, where = _compile_cross(sel.rel, sel.where, session)
        sel = A.Select(sel.projs, sel.rel, where, sel.group_by,
                       sel.having, sel.order_by, sel.limit, sel.distinct)
    else:
        f = _rel(sel.rel, session)
    if sel.where is not None:
        plain = None
        subq = []
        scalar_cmp = []
        marked = []
        outer_names = set(f._names())
        for c in _conjuncts(sel.where):
            if _is_subquery_pred(c):
                subq.append(c)
            elif _is_correlated_scalar(c, outer_names, session):
                scalar_cmp.append(c)
            elif _has_nested_setpred(c):
                marked.append(c)
            else:
                e = _expr(c)
                plain = e if plain is None else (plain & e)
        if plain is not None:
            f = f.filter(plain)
        for c in subq:
            f = (_apply_exists(f, c, session)
                 if isinstance(c, A.ExistsE)
                 else _apply_in_subquery(f, c, session))
        for c in marked:
            # EXISTS/IN under OR: existence-join markers, then a plain
            # boolean filter over the rewritten conjunct
            f, ast2 = _apply_subquery_markers(f, c, session)
            f = f.filter(_expr(ast2))
        for c in scalar_cmp:
            f = _apply_scalar_cmp(f, c, session)
    has_window_any = any(_has_window(p.expr) for p in sel.projs)
    has_group_agg = bool(sel.group_by) or any(
        _is_agg(p.expr) for p in sel.projs)
    if has_window_any and has_group_agg:
        # SQL evaluates windows AFTER grouping (sum(sum(x)) OVER ...):
        # phase 1 aggregates, phase 2 windows over the agg outputs
        rollup_fn = None
        if len(sel.group_by) == 1 and \
                isinstance(sel.group_by[0], A.Fn) and \
                sel.group_by[0].name in ("rollup", "cube"):
            rollup_fn = sel.group_by[0]
        aggs: Dict[str, tuple] = {}
        grs: Optional[Dict[str, str]] = {} if rollup_fn else None
        new_projs = [A.Proj(_extract_aggs_mixed(p.expr, aggs, grs),
                            p.alias) for p in sel.projs]
        new_order = [A.OrderItem(_extract_aggs_mixed(o.expr, aggs, grs),
                                 o.ascending) for o in sel.order_by]
        having_expr = None
        if sel.having is not None:
            having_expr = _expr(_extract_aggs_mixed(sel.having, aggs,
                                                    grs))
        if rollup_fn is not None:
            if having_expr is not None:
                raise NotImplementedError("HAVING over ROLLUP windows")
            nkeys = []
            for g in rollup_fn.args:
                if not isinstance(g, A.Ident):
                    raise NotImplementedError("ROLLUP over expressions")
                nkeys.append(g.name)
            u = None
            for d in range(len(nkeys), -1, -1):
                dropped = nkeys[d:]
                f_d = f
                if dropped:
                    f_d = f.with_columns(**{
                        k: E.when(E.lit(False), E.col(k)).end()
                        for k in dropped})
                g2 = (f_d.groupby(*nkeys).agg(**aggs)
                      .with_columns(**{
                          gname: E.lit(1 if gkey in dropped else 0)
                          for gname, gkey in grs.items()})
                      .select(*nkeys, *aggs.keys(), *grs.keys()))
                u = g2 if u is None else u.union(g2)
            f = u
        else:
            keys, pre, group_asts = _group_keys(sel)
            if pre:
                f = f.with_columns(**pre)
            f = f.groupby(*keys).agg(**aggs)
            if having_expr is not None:
                f = f.filter(having_expr)
        sel = A.Select(new_projs, sel.rel, None, [], None, new_order,
                       sel.limit, sel.distinct)
    if any(_has_window(p.expr) and not isinstance(p.expr, A.WindowFn)
           for p in sel.projs):
        # windows nested inside expressions (x * 100 / sum(x) OVER ...):
        # extract each WindowFn into a hidden projection first
        hidden: List[A.Proj] = []

        def visit(x):
            if isinstance(x, A.WindowFn):
                name = f"_wx{len(hidden)}"
                hidden.append(A.Proj(x, name))
                return A.Ident((name,))
            return None

        new_projs = []
        for p in sel.projs:
            if isinstance(p.expr, A.WindowFn):
                new_projs.append(p)
            else:
                new_projs.append(A.Proj(_rewrite_ast(p.expr, visit),
                                        p.alias))
        sel = A.Select(hidden + new_projs, sel.rel, sel.where,
                       sel.group_by, sel.having, sel.order_by,
                       sel.limit, sel.distinct)
    win = [p for p in sel.projs if isinstance(p.expr, A.WindowFn)]
    if win:
        return _select_window(sel, f, win)
    has_agg = any(_is_agg(p.expr) for p in sel.projs) or sel.group_by
    rollup = None
    if len(sel.group_by) == 1 and isinstance(sel.group_by[0], A.Fn) \
            and sel.group_by[0].name in ("rollup", "cube"):
        rollup = sel.group_by[0]
    if has_agg and rollup is not None:
        f, proj_map, trim_to = _apply_rollup(sel, f, rollup)
    elif has_agg:
        f, proj_map, trim_to = _apply_grouped(sel, f)
    else:
        if not (len(sel.projs) == 1 and isinstance(sel.projs[0].expr,
                                                   A.Star)):
            items = {}
            for i, p in enumerate(sel.projs):
                if isinstance(p.expr, A.Star):
                    raise NotImplementedError("mixed * and expressions")
                name = p.alias or (p.expr.name if isinstance(p.expr, A.Ident)
                                   else f"_c{i}")
                # SQL allows duplicate output names (q39's inv1.x, inv2.x;
                # q64's cs1.s1, cs2.s1) — suffix to keep every column
                name = _uniq_name(items, name)
                items[name] = _expr(p.expr)
            out_names = list(items.keys())
            # carry ORDER BY columns the SELECT list drops
            avail = set(f._names())
            carry = [o.expr.name for o in sel.order_by
                     if isinstance(o.expr, A.Ident) and
                     o.expr.name not in items and o.expr.name in avail]
            items.update({c: E.col(c) for c in carry})
            f = f.select(**items)
            proj_map = list(zip(sel.projs, out_names))
            trim_to = out_names if carry else None
        else:
            # bare SELECT *: drop planner-internal helper columns
            # (__ck* join keys, __cxl/__cxr cross-join markers)
            keep = [n for n in f._names() if not n.startswith("__")]
            if len(keep) != len(f._names()):
                f = f.select(**{n: E.col(n) for n in keep})
            proj_map = []
            trim_to = None
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
            keep = trim_to or list(f._names())
            f = (f.with_columns(**helpers)
                 .sort(*sort_keys, limit=sel.limit)
                 .select(*keep))
        else:
            f = f.sort(*sort_keys, limit=sel.limit)
            if trim_to is not None:
                f = f.select(*trim_to)
    elif sel.limit is not None:
        f = f.limit(sel.limit)
    elif trim_to is not None:
        f = f.select(*trim_to)
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
    pre: Dict[str, E.Expr] = {}

    def as_col(expr, tag):
        """A column name for a window operand — materializing non-column
        expressions (partition keys, order keys, agg inputs) first."""
        if isinstance(expr, A.Ident):
            return expr.name
        name = f"_we_{tag}"
        pre[name] = _expr(expr)
        return name

    for i, p in enumerate(sel.projs):
        if not isinstance(p.expr, A.WindowFn):
            continue
        w = p.expr
        if w.fn.name not in _WINDOW_KINDS:
            raise NotImplementedError(f"window function {w.fn.name}")
        part = tuple(as_col(g, f"p{i}_{k}")
                     for k, g in enumerate(w.partition_by))
        order = tuple((as_col(o.expr, f"o{i}_{k}"), o.ascending)
                      for k, o in enumerate(w.order_by))
        name = p.alias or f"_w{i}"
        names[i] = name
        inp = None
        if w.fn.args:
            inp = as_col(w.fn.args[0], f"a{i}")
        specs.setdefault((part, order), []).append(
            WindowFunc(name, w.fn.name, input=inp))
    if pre:
        f = f.with_columns(**pre)
    for (part, order), funcs in specs.items():
        f = f.window(list(part),
                     [SortKey(c, ascending=a) for c, a in order],
                     tuple(funcs))
    items = {}
    for i, p in enumerate(sel.projs):
        if isinstance(p.expr, A.WindowFn):
            if names[i].startswith("_wx"):
                continue  # hidden extracted window — consumed by exprs
            items[names[i]] = None  # already a column
        elif isinstance(p.expr, A.Ident):
            name = _uniq_name(items, p.alias or p.expr.name)
            items[name] = (
                _expr(p.expr) if name != p.expr.name else None)
        else:
            items[_uniq_name(items, p.alias or f"_c{i}")] = _expr(p.expr)
    # carry ORDER BY columns the SELECT list drops (group keys etc.)
    avail = set(f._names())
    carry = [o.expr.name for o in sel.order_by
             if isinstance(o.expr, A.Ident) and
             o.expr.name not in items and o.expr.name in avail]
    # one ordered projection: the SELECT list's own order is the contract
    ordered = {n: (e if e is not None else E.col(n))
               for n, e in items.items()}
    ordered.update({c: E.col(c) for c in carry})
    f = f.select(**ordered)
    if sel.order_by:
        keys = []
        helpers: Dict[str, E.Expr] = {}
        for i, o in enumerate(sel.order_by):
            if isinstance(o.expr, A.Ident):
                keys.append(SortKey(o.expr.name, ascending=o.ascending))
            else:
                name = f"_o{i}"
                helpers[name] = _expr(o.expr)
                keys.append(SortKey(name, ascending=o.ascending))
        keep = list(items.keys())
        if helpers:
            f = (f.with_columns(**helpers)
                 .sort(*keys, limit=sel.limit).select(*keep))
        else:
            f = f.sort(*keys, limit=sel.limit)
            if carry:
                f = f.select(*keep)
    elif sel.limit is not None:
        f = f.limit(sel.limit)
    elif carry:
        f = f.select(*list(items.keys()))
    return f


def _align_positional(l: Frame, r: Frame) -> Frame:
    """SQL set ops match columns by POSITION; the output names come from
    the first branch (q74's second UNION branch carries no aliases)."""
    ln, rn = list(l._names()), list(r._names())
    if len(ln) != len(rn):
        raise NotImplementedError(
            f"set op column-count mismatch: {ln} vs {rn}")
    if ln == rn:
        return r
    return r.select(**{a: E.col(b) for a, b in zip(ln, rn)})


def _set_op(kind: str, l: Frame, r: Frame) -> Frame:
    if kind == "union_all":
        return l.union(_align_positional(l, r))
    if kind == "union":
        return l.union(_align_positional(l, r)).distinct()
    # INTERSECT/EXCEPT: joins of DISTINCT sets over ALL columns
    ln = list(l._names())
    rn = list(r._names())
    if len(ln) != len(rn):
        raise NotImplementedError("set op column-count mismatch")
    r2 = r.select(**{f"__s{i}": E.col(n) for i, n in enumerate(rn)})
    how = "left_semi" if kind == "intersect" else "left_anti"
    return (l.distinct()
            .join(r2, tuple(ln), tuple(f"__s{i}" for i in range(len(rn))),
                  how=how)
            .select(*ln))


def _query(ast, session) -> Frame:
    if isinstance(ast, A.WithQ):
        env = dict(_current_ctes())
        _CTX_CTES.append(env)
        try:
            for name, sub in ast.ctes:
                env[name] = _query(sub, session)
            return _query(ast.body, session)
        finally:
            _CTX_CTES.pop()
    if isinstance(ast, A.SetOp):
        return _set_op(ast.kind, _query(ast.left, session),
                       _query(ast.right, session))
    if isinstance(ast, A.UnionAll):
        f = _select(ast.selects[0], session)
        for s in ast.selects[1:]:
            f = f.union(_align_positional(f, _select(s, session)))
        return f
    return _select(ast, session)


def compile_sql(sql: str, session) -> str:
    """SQL text -> wire-contract JSON (the front-end's only output)."""
    from auron_tpu.plan.wire import plan_to_json
    _CTX_SESSION.append(session)
    try:
        return plan_to_json(_query(A.parse_sql(sql), session).plan)
    finally:
        _CTX_SESSION.pop()


def run_sql(sql: str, session, jit: bool = False):
    """Execute SQL through the NEUTRAL wire contract: text -> wire JSON ->
    plan_from_json -> engine. The engine never sees this front-end's
    objects."""
    from auron_tpu.plan.wire import plan_from_json
    wire = compile_sql(sql, session)
    plan = plan_from_json(wire)
    return session.sql_result(plan)
