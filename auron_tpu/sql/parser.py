"""SQL front-end: text -> AST (tokenizer + recursive-descent/Pratt parser).

This is the engine's SECOND front-end. The reference proves its plan IR is
engine-neutral by driving the same native engine from Spark and from Flink
(auron-flink, SURVEY §2.3); here the Frame builder is front-end #1 and this
SQL layer is front-end #2 — it compiles to the SAME wire contract
(plan/wire.py JSON), which the engine executes without knowing which
front-end produced it.

Supported grammar (the TPC-DS working subset):

  query     := select (UNION ALL select)*
  select    := SELECT [DISTINCT] proj ("," proj)* FROM rel
               [WHERE expr] [GROUP BY expr ("," expr)*] [HAVING expr]
               [ORDER BY ord ("," ord)*] [LIMIT n]
  rel       := table [alias] | "(" query ")" alias
               | rel join_type JOIN rel ON expr
  join_type := [INNER|LEFT [OUTER|SEMI|ANTI]|RIGHT [OUTER]|FULL [OUTER]]
  expr      := the usual precedence tower: OR > AND > NOT > cmp
               (=, <>, !=, <, <=, >, >=, [NOT] IN, [NOT] LIKE, [NOT]
               BETWEEN, IS [NOT] NULL) > add > mul > unary > primary
  primary   := literal | ident[.ident] | fn(args) | CAST(e AS type)
               | CASE WHEN ... END | "(" expr ")" | *
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<num>\d+\.\d+|\.\d+|\d+)
  | (?P<str>'(?:[^']|'')*')
  | (?P<bq>`[^`]*`)
  | (?P<op><=|>=|<>|!=|=|<|>|\+|-|\*|/|%|\(|\)|,|\.|;)
  | (?P<ident>[A-Za-z_][A-Za-z_0-9]*)
""", re.VERBOSE)

_KEYWORDS = {
    "select", "distinct", "from", "where", "group", "by", "having",
    "order", "limit", "join", "inner", "left", "right", "full", "outer",
    "semi", "anti", "on", "and", "or", "not", "in", "like", "between",
    "is", "null", "as", "case", "when", "then", "else", "end", "cast",
    "union", "all", "asc", "desc", "true", "false", "exists", "over",
    "partition", "with", "interval", "intersect", "except"}


@dataclass
class Tok:
    kind: str  # num | str | op | ident | kw | eof
    text: str


def tokenize(sql: str) -> List[Tok]:
    out, i = [], 0
    while i < len(sql):
        m = _TOKEN_RE.match(sql, i)
        if not m:
            raise SyntaxError(f"cannot tokenize at: {sql[i:i+20]!r}")
        i = m.end()
        if m.lastgroup == "ws":
            continue
        text = m.group()
        kind = m.lastgroup
        if kind == "ident" and text.lower() in _KEYWORDS:
            kind, text = "kw", text.lower()
        elif kind == "ident":
            # Spark resolves unquoted identifiers case-insensitively;
            # fold to lowercase (matching lowercase physical schemas)
            text = text.lower()
        elif kind == "bq":
            # backtick-quoted identifier (Spark style); inner spaces kept
            kind, text = "ident", text[1:-1].strip()
        out.append(Tok(kind, text))
    out.append(Tok("eof", ""))
    return out


# ---- AST -------------------------------------------------------------------

@dataclass
class Ident:
    parts: Tuple[str, ...]  # possibly qualified a.b

    @property
    def name(self):
        return self.parts[-1]


@dataclass
class Lit:
    value: Any


@dataclass
class Bin:
    op: str
    left: Any
    right: Any


@dataclass
class Un:
    op: str  # not | neg
    operand: Any


@dataclass
class Fn:
    name: str
    args: List[Any]
    distinct: bool = False
    star: bool = False


@dataclass
class WindowFn:
    fn: "Fn"
    partition_by: List[Any]
    order_by: List["OrderItem"]


@dataclass
class CastE:
    operand: Any
    to: str
    params: tuple = ()  # decimal(p, s)


@dataclass
class CaseE:
    branches: List[Tuple[Any, Any]]
    otherwise: Optional[Any]


@dataclass
class InE:
    operand: Any
    values: List[Any]
    negated: bool
    query: Any = None  # IN (SELECT ...): values is empty


@dataclass
class ExistsE:
    query: Any
    negated: bool


@dataclass
class LikeE:
    operand: Any
    pattern: str
    negated: bool


@dataclass
class BetweenE:
    operand: Any
    lo: Any
    hi: Any
    negated: bool


@dataclass
class IsNullE:
    operand: Any
    negated: bool


@dataclass
class Star:
    pass


@dataclass
class Proj:
    expr: Any
    alias: Optional[str]


@dataclass
class OrderItem:
    expr: Any
    ascending: bool = True


@dataclass
class TableRef:
    name: str
    alias: Optional[str] = None


@dataclass
class SubqueryRef:
    query: "Select"
    alias: str


@dataclass
class JoinRel:
    left: Any
    right: Any
    how: str
    on: Any


@dataclass
class CrossRel:
    """Comma-separated FROM list — implicit joins whose equi-keys live in
    the WHERE clause (the classic TPC-DS style)."""

    rels: List[Any]


@dataclass(eq=False)
class FrameRef:
    """A pre-compiled Frame standing in for a relation (the compiler's
    alias-disambiguation pass injects these)."""

    frame: Any
    names: Tuple[str, ...] = ()


@dataclass
class Select:
    projs: List[Proj]
    rel: Any
    where: Optional[Any] = None
    group_by: List[Any] = field(default_factory=list)
    having: Optional[Any] = None
    order_by: List[OrderItem] = field(default_factory=list)
    limit: Optional[int] = None
    distinct: bool = False


@dataclass
class UnionAll:
    selects: List[Select]


@dataclass
class WithQ:
    """WITH name AS (query), ... body."""

    ctes: List[Tuple[str, Any]]
    body: Any


@dataclass
class SetOp:
    """union_all | union (distinct) | intersect | except."""

    kind: str
    left: Any
    right: Any


@dataclass
class SubqueryE:
    """Scalar subquery used as an expression: (SELECT ...)."""

    query: Any


@dataclass
class IntervalE:
    """INTERVAL literal as a Spark CalendarInterval triple: any mix of
    (value, unit) pairs folds into (months, days, micros)."""

    months: int = 0
    days: int = 0
    micros: int = 0


class Parser:
    def __init__(self, sql: str):
        self.toks = tokenize(sql)
        self.i = 0

    # -- token helpers ------------------------------------------------------
    def peek(self, k=0) -> Tok:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Tok:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, kind, text=None) -> Optional[Tok]:
        t = self.peek()
        if t.kind == kind and (text is None or t.text == text):
            return self.next()
        return None

    def expect(self, kind, text=None) -> Tok:
        t = self.accept(kind, text)
        if t is None:
            got = self.peek()
            raise SyntaxError(
                f"expected {text or kind}, got {got.kind} {got.text!r}")
        return t

    # -- entry --------------------------------------------------------------
    def parse(self):
        q = self.query()
        self.accept("op", ";")
        self.expect("eof")
        return q

    def query(self):
        ctes = []
        if self.accept("kw", "with"):
            while True:
                name = self.expect("ident").text
                self.expect("kw", "as")
                self.expect("op", "(")
                sub = self.query()
                self.expect("op", ")")
                ctes.append((name, sub))
                if not self.accept("op", ","):
                    break
        body = self.set_expr()
        return WithQ(ctes, body) if ctes else body

    def set_expr(self):
        left = self.select_or_paren()
        while True:
            if self.accept("kw", "union"):
                all_ = bool(self.accept("kw", "all"))
                left = SetOp("union_all" if all_ else "union", left,
                             self.select_or_paren())
            elif self.accept("kw", "intersect"):
                left = SetOp("intersect", left, self.select_or_paren())
            elif self.accept("kw", "except"):
                left = SetOp("except", left, self.select_or_paren())
            else:
                return left

    def select_or_paren(self):
        if self.peek().kind == "op" and self.peek().text == "(":
            save = self.i
            self.next()
            if self.peek().kind == "kw" and \
                    self.peek().text in ("select", "with") or \
                    (self.peek().kind == "op" and
                     self.peek().text == "("):
                q = self.query()
                self.expect("op", ")")
                return q
            self.i = save
        return self.select()

    def select(self) -> Select:
        self.expect("kw", "select")
        distinct = bool(self.accept("kw", "distinct"))
        projs = [self.proj()]
        while self.accept("op", ","):
            projs.append(self.proj())
        self.expect("kw", "from")
        rel = self.rel()
        where = self.expr() if self.accept("kw", "where") else None
        group_by = []
        if self.accept("kw", "group"):
            self.expect("kw", "by")
            group_by = [self.expr()]
            while self.accept("op", ","):
                group_by.append(self.expr())
        having = self.expr() if self.accept("kw", "having") else None
        order_by = []
        if self.accept("kw", "order"):
            self.expect("kw", "by")
            order_by = [self.order_item()]
            while self.accept("op", ","):
                order_by.append(self.order_item())
        limit = None
        if self.accept("kw", "limit"):
            limit = int(self.expect("num").text)
        return Select(projs, rel, where, group_by, having, order_by, limit,
                      distinct)

    def proj(self) -> Proj:
        if self.accept("op", "*"):
            return Proj(Star(), None)
        e = self.expr()
        alias = None
        if self.accept("kw", "as"):
            alias = self.expect("ident").text
        elif self.peek().kind == "ident":
            alias = self.next().text
        return Proj(e, alias)

    def maybe_over(self, fn):
        if not self.accept("kw", "over"):
            return fn
        self.expect("op", "(")
        part, order = [], []
        if self.accept("kw", "partition"):
            self.expect("kw", "by")
            part = [self.expr()]
            while self.accept("op", ","):
                part.append(self.expr())
        if self.accept("kw", "order"):
            self.expect("kw", "by")
            order = [self.order_item()]
            while self.accept("op", ","):
                order.append(self.order_item())
        # frame clause: ROWS/RANGE BETWEEN ... — accepted and recorded
        # only as "cumulative" (the engine's default ordered frame);
        # ROWS==RANGE whenever the order keys are unique per partition
        if self.peek().kind == "ident" and \
                self.peek().text.lower() in ("rows", "range"):
            self.next()
            while not (self.peek().kind == "op" and
                       self.peek().text == ")"):
                self.next()
        self.expect("op", ")")
        return WindowFn(fn, part, order)

    def order_item(self) -> OrderItem:
        e = self.expr()
        asc = True
        if self.accept("kw", "desc"):
            asc = False
        else:
            self.accept("kw", "asc")
        return OrderItem(e, asc)

    # -- relations ----------------------------------------------------------
    def rel(self):
        parts = [self._rel_joins()]
        while self.accept("op", ","):
            parts.append(self._rel_joins())
        return parts[0] if len(parts) == 1 else CrossRel(parts)

    def _rel_joins(self):
        left = self.rel_primary()
        while True:
            how = self.join_type()
            if how is None:
                return left
            right = self.rel_primary()
            self.expect("kw", "on")
            on = self.expr()
            left = JoinRel(left, right, how, on)

    def join_type(self) -> Optional[str]:
        if self.accept("kw", "join") or (
                self.accept("kw", "inner") and self.expect("kw", "join")):
            return "inner"
        for lead, hows in (("left", {"outer": "left", "semi": "left_semi",
                                     "anti": "left_anti", None: "left"}),
                           ("right", {"outer": "right", None: "right"}),
                           ("full", {"outer": "full", None: "full"})):
            if self.peek().kind == "kw" and self.peek().text == lead and \
                    self.peek(1).kind == "kw" and \
                    self.peek(1).text in ("join", "outer", "semi", "anti"):
                self.next()
                sub = None
                t = self.peek()
                if t.kind == "kw" and t.text in ("outer", "semi", "anti"):
                    sub = self.next().text
                self.expect("kw", "join")
                return hows[sub]
        return None

    def rel_primary(self):
        if self.accept("op", "("):
            q = self.query()
            self.expect("op", ")")
            self.accept("kw", "as")
            alias = self.expect("ident").text
            return SubqueryRef(q, alias)
        name = self.expect("ident").text
        alias = None
        if self.accept("kw", "as"):
            alias = self.expect("ident").text
        elif self.peek().kind == "ident":
            alias = self.next().text
        return TableRef(name, alias)

    # -- expressions (precedence climbing) -----------------------------------
    def expr(self):
        return self.or_()

    def or_(self):
        e = self.and_()
        while self.accept("kw", "or"):
            e = Bin("or", e, self.and_())
        return e

    def and_(self):
        e = self.not_()
        while self.accept("kw", "and"):
            e = Bin("and", e, self.not_())
        return e

    def not_(self):
        if self.peek().kind == "kw" and self.peek().text == "not" and \
                self.peek(1).kind == "kw" and \
                self.peek(1).text == "exists":
            self.next()
            return self._exists(True)
        if self.accept("kw", "not"):
            return Un("not", self.not_())
        if self.peek().kind == "kw" and self.peek().text == "exists":
            return self._exists(False)
        return self.cmp()

    def _exists(self, negated: bool) -> "ExistsE":
        self.expect("kw", "exists")
        self.expect("op", "(")
        q = self.query()
        self.expect("op", ")")
        return ExistsE(q, negated)

    def cmp(self):
        e = self.add()
        t = self.peek()
        if t.kind == "op" and t.text in ("=", "<>", "!=", "<", "<=", ">",
                                         ">="):
            self.next()
            return Bin(t.text, e, self.add())
        negated = False
        if t.kind == "kw" and t.text == "not" and \
                self.peek(1).kind == "kw" and \
                self.peek(1).text in ("in", "like", "between"):
            self.next()
            negated = True
            t = self.peek()
        if t.kind == "kw" and t.text == "in":
            self.next()
            self.expect("op", "(")
            if self.peek().kind == "kw" and self.peek().text == "select":
                q = self.query()
                self.expect("op", ")")
                return InE(e, [], negated, query=q)
            vals = [self.expr()]
            while self.accept("op", ","):
                vals.append(self.expr())
            self.expect("op", ")")
            return InE(e, vals, negated)
        if t.kind == "kw" and t.text == "like":
            self.next()
            pat = self.expect("str").text
            return LikeE(e, pat[1:-1].replace("''", "'"), negated)
        if t.kind == "kw" and t.text == "between":
            self.next()
            lo = self.add()
            self.expect("kw", "and")
            hi = self.add()
            return BetweenE(e, lo, hi, negated)
        if t.kind == "kw" and t.text == "is":
            self.next()
            neg = bool(self.accept("kw", "not"))
            self.expect("kw", "null")
            return IsNullE(e, neg)
        return e

    def add(self):
        e = self.mul()
        while True:
            t = self.peek()
            if t.kind == "op" and t.text in ("+", "-"):
                self.next()
                e = Bin(t.text, e, self.mul())
            else:
                return e

    def mul(self):
        e = self.unary()
        while True:
            t = self.peek()
            if t.kind == "op" and t.text in ("*", "/", "%"):
                self.next()
                e = Bin(t.text, e, self.unary())
            else:
                return e

    def unary(self):
        if self.accept("op", "-"):
            return Un("neg", self.unary())
        return self.primary()

    def primary(self):
        t = self.peek()
        if t.kind == "num":
            self.next()
            v = float(t.text) if "." in t.text else int(t.text)
            return Lit(v)
        if t.kind == "str":
            self.next()
            return Lit(t.text[1:-1].replace("''", "'"))
        if t.kind == "kw" and t.text in ("true", "false"):
            self.next()
            return Lit(t.text == "true")
        if t.kind == "kw" and t.text == "null":
            self.next()
            return Lit(None)
        if t.kind == "kw" and t.text == "cast":
            self.next()
            self.expect("op", "(")
            e = self.expr()
            self.expect("kw", "as")
            ty = self.expect("ident").text.lower()
            params = []
            if self.accept("op", "("):  # decimal(p, s)
                while not self.accept("op", ")"):
                    tok = self.next()
                    if tok.kind == "num":
                        params.append(int(tok.text))
            self.expect("op", ")")
            return CastE(e, ty, tuple(params))
        if t.kind == "kw" and t.text == "case":
            self.next()
            # simple CASE (CASE x WHEN v THEN ...) desugars to searched
            # CASE with equality conditions
            operand = None
            if not (self.peek().kind == "kw" and
                    self.peek().text == "when"):
                operand = self.expr()
            branches = []
            while self.accept("kw", "when"):
                cond = self.expr()
                if operand is not None:
                    cond = Bin("=", operand, cond)
                self.expect("kw", "then")
                branches.append((cond, self.expr()))
            other = self.expr() if self.accept("kw", "else") else None
            self.expect("kw", "end")
            return CaseE(branches, other)
        if t.kind == "ident" and t.text.lower() in ("date", "timestamp") \
                and self.peek(1).kind == "str":
            # ANSI typed literal: DATE '2000-01-01' / TIMESTAMP '...'
            self.next()
            s = self.next().text.strip("'")
            return CastE(Lit(s), t.text.lower())
        if t.kind == "kw" and t.text == "interval":
            self.next()
            units = {  # unit -> (field index, multiplier)
                "year": (0, 12), "month": (0, 1),
                "week": (1, 7), "day": (1, 1),
                "hour": (2, 3_600_000_000), "minute": (2, 60_000_000),
                "second": (2, 1_000_000), "millisecond": (2, 1_000),
                "microsecond": (2, 1)}
            parts = [0, 0, 0]  # months, days, micros
            seen = False
            while True:
                tn = self.accept("num") or self.accept("str")
                if tn is None:
                    break
                n = int(tn.text.strip("'"))
                unit = self.expect("ident").text.lower().rstrip("s")
                if unit not in units:
                    raise NotImplementedError(f"INTERVAL unit {unit}")
                idx, mul = units[unit]
                parts[idx] += n * mul
                seen = True
            if not seen:
                raise NotImplementedError("empty INTERVAL literal")
            return IntervalE(parts[0], parts[1], parts[2])
        if t.kind == "op" and t.text == "(":
            self.next()
            if self.peek().kind == "kw" and \
                    self.peek().text in ("select", "with"):
                q = self.query()
                self.expect("op", ")")
                return SubqueryE(q)
            e = self.expr()
            self.expect("op", ")")
            return e
        if t.kind == "kw" and t.text in ("left", "right") and \
                self.peek(1).kind == "op" and self.peek(1).text == "(":
            # LEFT/RIGHT are join keywords AND Spark string functions;
            # a following "(" disambiguates to the function form
            t = Tok("ident", t.text)
            self.toks[self.i] = t
        if t.kind == "ident":
            self.next()
            if self.accept("op", "("):  # function call
                distinct = bool(self.accept("kw", "distinct"))
                if self.accept("op", "*"):
                    self.expect("op", ")")
                    fn = Fn(t.text.lower(), [], star=True)
                    return self.maybe_over(fn)
                args = []
                if not self.accept("op", ")"):
                    args = [self.expr()]
                    while self.accept("op", ","):
                        args.append(self.expr())
                    self.expect("op", ")")
                fn = Fn(t.text.lower(), args, distinct=distinct)
                return self.maybe_over(fn)
            parts = [t.text]
            while self.peek().kind == "op" and self.peek().text == "." and \
                    self.peek(1).kind == "ident":
                self.next()
                parts.append(self.expect("ident").text)
            return Ident(tuple(parts))
        raise SyntaxError(f"unexpected token {t.kind} {t.text!r}")


def parse_sql(sql: str):
    return Parser(sql).parse()
