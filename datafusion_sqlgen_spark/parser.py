"""SQL text -> plan IR: the front half of the reference's round trip.

The reference's full pipeline is SQL -> LogicalPlan -> SQL
(/root/reference/datafusion-sqlgen/tests/select.rs:57-68: DFParser ->
SqlToRel -> RelToSql, asserted as text round-trip identity). This module
supplies the text->IR direction for this repo, closing the loop: with it,
``parse_sql(q).to_sql(dialect)`` reaches a *fixpoint after one render* —
``parse_sql(render(parse_sql(q)))`` re-renders to the identical string —
and the parsed plan executes on both engines via the existing dual-render
paths.

Grammar: the reference's live surface (tests/select.rs:71-281 —
SELECT [DISTINCT] projections / WHERE / ORDER BY / LIMIT / CAST /
function calls / BETWEEN / IS [NOT] DISTINCT FROM / array index /
aliases / no-FROM literal selects) plus the clauses this repo's own
renderer emits (joins, GROUP BY/HAVING, OFFSET, IN / LIKE / CASE /
IS NULL, set ops), so the fixpoint property holds for rendered output
too. Hand-rolled tokenizer + Pratt expression parser; no dependencies.

Array indexing follows the REFERENCE's semantics: ``a[1]`` is the first
element (tests/select.rs:276), parsed to ``Index`` (1-based element_at on
the Spark side) — NOT Spark SQL's 0-based ``[]``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

from datafusion_sqlgen_spark.expressions.core import (
    Alias,
    Between,
    BinOp,
    Case,
    Cast,
    Col,
    Exists,
    Expr,
    Func,
    InList,
    InSubquery,
    Index,
    Interval,
    IsDistinctFrom,
    IsNotDistinctFrom,
    IsNotNull,
    IsNull,
    Like,
    Lit,
    Neg,
    Not,
    RLike,
    ScalarSubquery,
    SortKey,
    Star,
    TryCast,
)
from datafusion_sqlgen_spark.plans.core import EmptyRelation, Plan, scan

# --------------------------------------------------------------------------
# Tokenizer
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<number>\d+\.\d*(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
    | (?P<string>'(?:[^']|'')*')
    | (?P<qident>"(?:[^"]|"")*"|`(?:[^`]|``)*`)
    | (?P<op><=|>=|<>|!=|\|\||<=>|[=<>+\-*/%(),.;\[\]])
    | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)


@dataclass
class _Tok:
    kind: str  # number | string | qident | op | ident | eof
    text: str
    pos: int

    @property
    def upper(self) -> str:
        return self.text.upper()


def _tokenize(sql: str) -> list[_Tok]:
    out: list[_Tok] = []
    i = 0
    while i < len(sql):
        m = _TOKEN_RE.match(sql, i)
        if m is None:
            raise ParseError(f"unexpected character {sql[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        out.append(_Tok(kind, m.group(), m.start()))
    out.append(_Tok("eof", "", len(sql)))
    return out


class ParseError(ValueError):
    pass


# keywords that terminate an expression / projection item
_CLAUSE_KW = {
    "FROM", "WHERE", "GROUP", "HAVING", "ORDER", "LIMIT", "OFFSET",
    "UNION", "INTERSECT", "EXCEPT", "JOIN", "INNER", "LEFT", "RIGHT",
    "FULL", "CROSS", "ON", "AS", "AND", "OR", "NOT", "IS", "IN",
    "BETWEEN", "LIKE", "ILIKE", "RLIKE", "ASC", "DESC", "NULLS", "THEN",
    "WHEN", "ELSE", "END", "BY", "DISTINCT", "ALL", "SEMI", "ANTI",
}

_TYPE_MAP = {
    "INT": "int", "INTEGER": "int", "BIGINT": "bigint", "SMALLINT": "smallint",
    "TINYINT": "tinyint", "DOUBLE": "double", "FLOAT": "float", "REAL": "float",
    "VARCHAR": "string", "STRING": "string", "TEXT": "string", "CHAR": "string",
    "BOOLEAN": "boolean", "BOOL": "boolean", "DATE": "date",
    "TIMESTAMP": "timestamp", "DECIMAL": "decimal", "NUMERIC": "decimal",
    "LONG": "bigint",
}

_CMP_OPS = {"=", "<>", "!=", "<", "<=", ">", ">="}


class _Parser:
    def __init__(self, sql: str):
        self.toks = _tokenize(sql)
        self.i = 0

    # ---- token helpers ---------------------------------------------------
    def peek(self, ahead: int = 0) -> _Tok:
        return self.toks[min(self.i + ahead, len(self.toks) - 1)]

    def next(self) -> _Tok:
        t = self.toks[self.i]
        if t.kind != "eof":
            self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.kind == "ident" and t.upper in kws

    def eat_kw(self, *kws: str) -> bool:
        if self.at_kw(*kws):
            self.next()
            return True
        return False

    def expect_kw(self, kw: str) -> None:
        if not self.eat_kw(kw):
            raise ParseError(f"expected {kw}, got {self.peek().text!r}")

    def at_op(self, *ops: str) -> bool:
        t = self.peek()
        return t.kind == "op" and t.text in ops

    def eat_op(self, *ops: str) -> bool:
        if self.at_op(*ops):
            self.next()
            return True
        return False

    def expect_op(self, op: str) -> None:
        if not self.eat_op(op):
            raise ParseError(f"expected {op!r}, got {self.peek().text!r}")

    def ident(self) -> str:
        t = self.next()
        if t.kind == "ident":
            return t.text
        if t.kind == "qident":
            q = t.text[0]
            return t.text[1:-1].replace(q + q, q)
        raise ParseError(f"expected identifier, got {t.text!r}")

    # ---- statement -------------------------------------------------------
    def parse_statement(self) -> Plan:
        plan = self.parse_select()
        self.eat_op(";")
        if self.peek().kind != "eof":
            raise ParseError(f"trailing input at {self.peek().text!r}")
        return plan

    def parse_select(self) -> Plan:
        left = self.parse_select_core()
        # set operations, left-associative
        while self.at_kw("UNION", "INTERSECT", "EXCEPT"):
            op = self.next().upper
            all_ = self.eat_kw("ALL")
            right = self.parse_select_core()
            if op == "UNION":
                left = left.union(right) if all_ else left.union_distinct(right)
            elif op == "INTERSECT":
                left = left.intersect(right)
            else:
                left = left.except_(right)
        return left

    def parse_select_core(self) -> Plan:
        # parenthesized query operand: (SELECT ...) UNION ALL (SELECT ...)
        if self.at_op("("):
            self.next()
            sub = self.parse_select()
            self.expect_op(")")
            return sub
        self.expect_kw("SELECT")
        distinct = self.eat_kw("DISTINCT")
        projs = self.parse_projection_list()

        base: Optional[Plan] = None
        if self.eat_kw("FROM"):
            base = self.parse_relation()
            base = self.parse_joins(base)

        where = self.parse_expr() if self.eat_kw("WHERE") else None

        group_keys: Optional[list[Expr]] = None
        if self.eat_kw("GROUP"):
            self.expect_kw("BY")
            group_keys = [self.parse_expr()]
            while self.eat_op(","):
                group_keys.append(self.parse_expr())

        having = self.parse_expr() if self.eat_kw("HAVING") else None

        sort_keys: Optional[list[SortKey]] = None
        if self.eat_kw("ORDER"):
            self.expect_kw("BY")
            sort_keys = [self.parse_sort_key()]
            while self.eat_op(","):
                sort_keys.append(self.parse_sort_key())

        limit = offset = None
        if self.eat_kw("LIMIT"):
            limit = int(self.next().text)
        if self.eat_kw("OFFSET"):
            offset = int(self.next().text)

        # ---- assemble ----
        if base is None:
            if where is not None or group_keys is not None:
                raise ParseError("WHERE/GROUP BY require a FROM clause")
            plan: Plan = EmptyRelation(tuple(projs))
        else:
            plan = base
            if where is not None:
                plan = plan.filter(where)
            if group_keys is not None:
                plan = self._assemble_aggregate(plan, group_keys, projs)
            elif not (len(projs) == 1 and isinstance(projs[0], Star)
                      and projs[0].table is None):
                plan = plan.select(*projs)
        if having is not None:
            if group_keys is None:
                raise ParseError("HAVING requires GROUP BY")
            plan = plan.filter(having)
        if distinct:
            plan = plan.distinct()
        if sort_keys is not None:
            plan = plan.sort(*sort_keys)
        if offset is not None:
            plan = plan.offset(offset)
        if limit is not None:
            plan = plan.limit(limit)
        return plan

    def _assemble_aggregate(self, plan: Plan, keys: list[Expr],
                            projs: list[Expr]) -> Plan:
        """GROUP BY: split the select list into group keys and aggregates.

        The IR's Aggregate projects keys-then-aggs; when the SQL listed
        them in exactly that order the assembly is loss-free (and the
        render reproduces the input order). Other orders still parse —
        the output column ORDER follows keys-then-aggs, which is the
        fixpoint form."""
        key_sql = {k.to_sql() for k in keys}

        def is_key(e: Expr) -> bool:
            inner = e.operand if isinstance(e, Alias) else e
            return inner.to_sql() in key_sql

        aggs = [p for p in projs if not is_key(p)]
        return plan.group_by(*keys).agg(*aggs)

    # ---- projections / relations ----------------------------------------
    def parse_projection_list(self) -> list[Expr]:
        out = [self.parse_projection()]
        while self.eat_op(","):
            out.append(self.parse_projection())
        return out

    def parse_projection(self) -> Expr:
        if self.at_op("*"):
            self.next()
            return Star()
        # t.* (lookahead: ident . *)
        if (self.peek().kind in ("ident", "qident")
                and self.peek(1).kind == "op" and self.peek(1).text == "."
                and self.peek(2).kind == "op" and self.peek(2).text == "*"
                and self.peek().upper not in _CLAUSE_KW):
            t = self.ident()
            self.next()  # .
            self.next()  # *
            return Star(t)
        e = self.parse_expr()
        if self.eat_kw("AS"):
            return Alias(e, self.ident())
        # bare alias: a trailing identifier that is not a clause keyword
        t = self.peek()
        if t.kind in ("ident", "qident") and t.upper not in _CLAUSE_KW:
            return Alias(e, self.ident())
        return e

    def parse_relation(self) -> Plan:
        if self.eat_op("("):
            sub = self.parse_select()
            self.expect_op(")")
            self.eat_kw("AS")
            return sub.alias(self.ident())
        table = self.ident()
        if self.eat_kw("AS"):
            return scan(table).alias(self.ident())
        t = self.peek()
        if (t.kind in ("ident", "qident") and t.upper not in _CLAUSE_KW):
            return scan(table).alias(self.ident())
        return scan(table)

    def parse_joins(self, left: Plan) -> Plan:
        while True:
            how = None
            if self.at_kw("JOIN"):
                how = "inner"
                self.next()
            elif self.at_kw("INNER") and self.peek(1).upper == "JOIN":
                how = "inner"
                self.next(); self.next()
            elif self.at_kw("CROSS") and self.peek(1).upper == "JOIN":
                how = "cross"
                self.next(); self.next()
            elif self.at_kw("SEMI", "ANTI") and self.peek(1).upper == "JOIN":
                # DuckDB-dialect spelling (no LEFT prefix)
                how = "left_semi" if self.peek().upper == "SEMI" else "left_anti"
                self.next(); self.next()
            elif (self.at_kw("LEFT", "RIGHT", "FULL")
                  and self.peek(1).upper in ("OUTER", "SEMI", "ANTI", "JOIN")):
                d = self.next().upper
                base_how = {"LEFT": "left", "RIGHT": "right", "FULL": "full"}[d]
                if self.eat_kw("SEMI"):
                    how = "left_semi"
                elif self.eat_kw("ANTI"):
                    how = "left_anti"
                else:
                    self.eat_kw("OUTER")
                    how = base_how
                self.expect_kw("JOIN")
            else:
                break
            right = self.parse_relation()
            on = self.parse_expr() if self.eat_kw("ON") else None
            left = left.join(right, on=on, how=how)
        return left

    def parse_sort_key(self) -> SortKey:
        e = self.parse_expr()
        ascending = True
        if self.eat_kw("ASC"):
            ascending = True
        elif self.eat_kw("DESC"):
            ascending = False
        nulls_first = ascending  # Spark/DuckDB default: asc->first, desc->last
        if self.eat_kw("NULLS"):
            if self.eat_kw("FIRST"):
                nulls_first = True
            else:
                self.expect_kw("LAST")
                nulls_first = False
        return SortKey(e, ascending=ascending, nulls_first=nulls_first)

    # ---- expressions (Pratt) ---------------------------------------------
    def parse_expr(self, min_bp: int = 0) -> Expr:
        lhs = self.parse_prefix()
        while True:
            t = self.peek()
            if t.kind == "ident":
                kw = t.upper
                if kw == "OR" and min_bp < 1:
                    self.next()
                    lhs = BinOp("OR", lhs, self.parse_expr(1))
                    continue
                if kw == "AND" and min_bp < 2:
                    self.next()
                    lhs = BinOp("AND", lhs, self.parse_expr(2))
                    continue
                if kw == "IS" and min_bp <= 4:
                    self.next()
                    negated = self.eat_kw("NOT")
                    if self.eat_kw("NULL"):
                        lhs = IsNotNull(lhs) if negated else IsNull(lhs)
                    else:
                        self.expect_kw("DISTINCT")
                        self.expect_kw("FROM")
                        rhs = self.parse_expr(5)
                        lhs = (IsNotDistinctFrom(lhs, rhs) if negated
                               else IsDistinctFrom(lhs, rhs))
                    continue
                if kw in ("BETWEEN", "IN", "LIKE", "ILIKE", "RLIKE") and min_bp <= 4:
                    lhs = self.parse_postfix_predicate(lhs, negated=False)
                    continue
                if (kw == "NOT" and min_bp <= 4
                        and self.peek(1).upper in ("BETWEEN", "IN", "LIKE",
                                                   "ILIKE", "RLIKE")):
                    self.next()
                    lhs = self.parse_postfix_predicate(lhs, negated=True)
                    continue
                break
            if t.kind == "op":
                op = t.text
                if op in _CMP_OPS and min_bp <= 5:
                    self.next()
                    op = "<>" if op == "!=" else op
                    lhs = BinOp(op, lhs, self.parse_expr(6))
                    continue
                if op == "<=>" and min_bp <= 5:
                    self.next()
                    lhs = IsNotDistinctFrom(lhs, self.parse_expr(6))
                    continue
                if op == "||" and min_bp <= 6:
                    self.next()
                    lhs = BinOp("||", lhs, self.parse_expr(7))
                    continue
                if op in ("+", "-") and min_bp <= 7:
                    self.next()
                    lhs = BinOp(op, lhs, self.parse_expr(8))
                    continue
                if op in ("*", "/", "%") and min_bp <= 8:
                    self.next()
                    lhs = BinOp(op, lhs, self.parse_expr(9))
                    continue
                if op == "[":
                    self.next()
                    idx = self.parse_expr()
                    self.expect_op("]")
                    lhs = Index(lhs, idx)
                    continue
                break
            break
        return lhs

    def parse_postfix_predicate(self, lhs: Expr, negated: bool) -> Expr:
        if self.eat_kw("BETWEEN"):
            lo = self.parse_expr(5)
            self.expect_kw("AND")
            hi = self.parse_expr(5)
            return Between(lhs, lo, hi, negated=negated)
        if self.eat_kw("IN"):
            self.expect_op("(")
            if self.at_kw("SELECT"):
                sub = self.parse_select()
                self.expect_op(")")
                return InSubquery(lhs, sub, negated=negated)
            vals = [self.parse_expr()]
            while self.eat_op(","):
                vals.append(self.parse_expr())
            self.expect_op(")")
            return InList(lhs, tuple(vals), negated=negated)
        ci = False
        if self.eat_kw("ILIKE"):
            ci = True
        elif self.eat_kw("RLIKE"):
            pat = self.next()
            if pat.kind != "string":
                raise ParseError("RLIKE pattern must be a string literal")
            return RLike(lhs, _unquote(pat.text), negated=negated)
        else:
            self.expect_kw("LIKE")
        pat = self.next()
        if pat.kind != "string":
            raise ParseError("LIKE pattern must be a string literal")
        return Like(lhs, _unquote(pat.text), negated=negated,
                    case_insensitive=ci)

    def parse_prefix(self) -> Expr:
        t = self.peek()
        if t.kind == "number":
            self.next()
            txt = t.text
            if "." in txt or "e" in txt or "E" in txt:
                return Lit(float(txt))
            return Lit(int(txt))
        if t.kind == "string":
            self.next()
            return Lit(_unquote(t.text))
        if t.kind == "op":
            if t.text == "(":
                self.next()
                if self.at_kw("SELECT"):
                    sub = self.parse_select()
                    self.expect_op(")")
                    return ScalarSubquery(sub)
                e = self.parse_expr()
                self.expect_op(")")
                return self.parse_trailing_field(e)
            if t.text == "-":
                self.next()
                return Neg(self.parse_expr(9))
            if t.text == "+":
                self.next()
                return self.parse_expr(9)
            raise ParseError(f"unexpected {t.text!r}")
        if t.kind in ("ident", "qident"):
            kw = t.upper if t.kind == "ident" else ""
            if (kw in _CLAUSE_KW and kw != "NOT"
                    and self.peek(1).text != "("):
                # reserved clause word where an expression was expected
                # (keyword followed by "(" is a function call: left(s, 2))
                raise ParseError(f"unexpected keyword {t.text!r}")
            if kw == "NOT":
                self.next()
                return Not(self.parse_expr(3))
            if kw in ("TRUE", "FALSE"):
                self.next()
                return Lit(kw == "TRUE")
            if kw == "NULL":
                self.next()
                return Lit(None)
            if kw in ("CAST", "TRY_CAST"):
                self.next()
                self.expect_op("(")
                e = self.parse_expr()
                self.expect_kw("AS")
                dtype = self.parse_type()
                self.expect_op(")")
                return TryCast(e, dtype) if kw == "TRY_CAST" else Cast(e, dtype)
            if kw == "CASE":
                return self.parse_case()
            if kw == "EXISTS" and self.peek(1).text == "(":
                self.next()
                self.expect_op("(")
                sub = self.parse_select()
                self.expect_op(")")
                return Exists(sub)
            if kw == "INTERVAL":
                self.next()
                n = int(self.next().text)
                return Interval(n, self.ident().upper())
            if kw in ("DATE", "TIMESTAMP") and self.peek(1).kind == "string":
                import datetime as _dt
                self.next()
                s = _unquote(self.next().text)
                if kw == "DATE":
                    return Lit(_dt.date.fromisoformat(s))
                return Lit(_dt.datetime.fromisoformat(s))
            name = self.ident()
            if self.at_op("("):
                return self.parse_call(name)
            if self.eat_op("."):
                return Col(self.ident(), table=name)
            return Col(name)
        raise ParseError(f"unexpected token {t.text!r}")

    def parse_trailing_field(self, e: Expr) -> Expr:
        from datafusion_sqlgen_spark.expressions.core import Field
        while self.at_op("."):
            self.next()
            e = Field(e, self.ident())
        return e

    def parse_call(self, name: str) -> Expr:
        self.expect_op("(")
        distinct = self.eat_kw("DISTINCT")
        args: list[Expr] = []
        if not self.at_op(")"):
            if self.at_op("*"):
                self.next()  # count(*) -> zero-arg count
            else:
                args.append(self.parse_expr())
                while self.eat_op(","):
                    args.append(self.parse_expr())
        self.expect_op(")")
        return Func(name.lower(), tuple(args), distinct=distinct)

    def parse_case(self) -> Expr:
        self.expect_kw("CASE")
        whens = []
        while self.eat_kw("WHEN"):
            cond = self.parse_expr()
            self.expect_kw("THEN")
            whens.append((cond, self.parse_expr()))
        else_ = self.parse_expr() if self.eat_kw("ELSE") else None
        self.expect_kw("END")
        return Case(tuple(whens), else_)

    def parse_type(self) -> str:
        name = self.ident().upper()
        mapped = _TYPE_MAP.get(name)
        if mapped is None:
            raise ParseError(f"unsupported type {name}")
        if mapped == "decimal":
            if self.eat_op("("):
                p = int(self.next().text)
                self.expect_op(",")
                s = int(self.next().text)
                self.expect_op(")")
                return f"decimal({p},{s})"
            return "decimal(10,0)"
        # swallow CHAR(n)/VARCHAR(n) lengths
        if self.eat_op("("):
            self.next()
            self.expect_op(")")
        return mapped


def _unquote(s: str) -> str:
    return s[1:-1].replace("''", "'")


def parse_sql(sql: str) -> Plan:
    """Parse a SELECT statement into the plan IR.

    ``parse_sql(q).to_sql("spark")`` / ``.to_sql("duckdb")`` /
    ``.to_df(spark)`` then follow the normal dual-render contract."""
    return _Parser(sql).parse_statement()
