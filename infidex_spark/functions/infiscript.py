"""Infiscript (the reference's filter DSL) -> Spark SQL expression.

Grammar: /root/reference/src/Infidex/Api/Infiscript.bnf (SQL-like WHERE
clauses; keywords case-insensitive; precedence () > NOT > AND > OR >
ternary, ternary right-associative).

The reference compiles the AST to a stack-bytecode VM
(Filtering/FilterCompiler.cs, FilterVM.cs); on Spark, Catalyst IS that VM —
we only translate the surface syntax into a Spark SQL boolean expression
and let codegen do the rest. Operator mapping:

  = != < <= > >=            -> native comparisons
  AND/&&/& OR/||/| NOT/!    -> AND / OR / NOT
  x CONTAINS 'v'            -> contains(x, 'v')
  x STARTS WITH 'v'         -> startswith(x, 'v')
  x ENDS WITH 'v'           -> endswith(x, 'v')
  x LIKE 'p'                -> x LIKE 'p'
  x MATCHES 'regex'         -> x RLIKE 'regex'
  x IN ('a','b')            -> x IN ('a','b')
  x BETWEEN a AND b         -> x BETWEEN a AND b
  x IS [NOT] NULL           -> native
  c ? a : b                 -> CASE WHEN c THEN a ELSE b END
                               (boolean branches only; literal branches as
                               in `premium='yes' ? 100 : 50` have no
                               boolean meaning in a WHERE context and are
                               rejected)
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class InfiscriptError(ValueError):
    pass


_TOKEN_RE = re.compile(
    r"""
    \s*(?:
      (?P<string>'(?:[^'])*') |
      (?P<number>-?\d+(?:\.\d+)?) |
      (?P<op><=|>=|!=|=|<|>|\(|\)|,|\?|:|&&|\|\||&|\||!) |
      (?P<ident>[A-Za-z][A-Za-z0-9_]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {
    "and", "or", "not", "in", "between", "is", "null", "contains",
    "starts", "ends", "with", "like", "matches",
}


@dataclass
class _Tok:
    kind: str  # string | number | op | ident | kw
    text: str


def _tokenize(src: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip() == "":
                break
            raise InfiscriptError(f"unexpected character at {pos}: {src[pos:pos+10]!r}")
        pos = m.end()
        if m.lastgroup == "ident":
            text = m.group("ident")
            if text.lower() in _KEYWORDS:
                toks.append(_Tok("kw", text.lower()))
            else:
                toks.append(_Tok("ident", text))
        elif m.lastgroup == "string":
            toks.append(_Tok("string", m.group("string")))
        elif m.lastgroup == "number":
            toks.append(_Tok("number", m.group("number")))
        else:
            toks.append(_Tok("op", m.group("op")))
    return toks


class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.i = 0

    def peek(self, k: int = 0) -> _Tok | None:
        return self.toks[self.i + k] if self.i + k < len(self.toks) else None

    def take(self) -> _Tok:
        if self.i >= len(self.toks):
            raise InfiscriptError("unexpected end of expression")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect_op(self, text: str) -> None:
        t = self.take()
        if t.kind != "op" or t.text != text:
            raise InfiscriptError(f"expected {text!r}, got {t.text!r}")

    # precedence: ternary < OR < AND < NOT < primary
    def ternary(self) -> str:
        cond = self.or_expr()
        t = self.peek()
        if t and t.kind == "op" and t.text == "?":
            self.take()
            a = self.ternary()
            self.expect_op(":")
            b = self.ternary()
            return f"(CASE WHEN {cond} THEN {a} ELSE {b} END)"
        return cond

    def or_expr(self) -> str:
        left = self.and_expr()
        while True:
            t = self.peek()
            if t and ((t.kind == "kw" and t.text == "or") or (t.kind == "op" and t.text in ("||", "|"))):
                self.take()
                left = f"({left} OR {self.and_expr()})"
            else:
                return left

    def and_expr(self) -> str:
        left = self.not_expr()
        while True:
            t = self.peek()
            if t and ((t.kind == "kw" and t.text == "and") or (t.kind == "op" and t.text in ("&&", "&"))):
                self.take()
                left = f"({left} AND {self.not_expr()})"
            else:
                return left

    def not_expr(self) -> str:
        t = self.peek()
        if t and ((t.kind == "kw" and t.text == "not") or (t.kind == "op" and t.text == "!")):
            self.take()
            return f"(NOT {self.primary()})"
        return self.primary()

    def primary(self) -> str:
        t = self.peek()
        if t is None:
            raise InfiscriptError("unexpected end of expression")
        if t.kind == "op" and t.text == "(":
            self.take()
            inner = self.ternary()
            self.expect_op(")")
            return f"({inner})"
        if t.kind != "ident":
            raise InfiscriptError(f"expected identifier, got {t.text!r}")
        ident = self.take().text
        col = f"`{ident}`"
        nxt = self.peek()
        if nxt is None:
            raise InfiscriptError(f"dangling identifier {ident!r}")
        if nxt.kind == "kw":
            kw = nxt.text
            if kw == "is":
                self.take()
                t2 = self.take()
                if t2.kind == "kw" and t2.text == "not":
                    t3 = self.take()
                    if not (t3.kind == "kw" and t3.text == "null"):
                        raise InfiscriptError("expected NULL after IS NOT")
                    return f"({col} IS NOT NULL)"
                if t2.kind == "kw" and t2.text == "null":
                    return f"({col} IS NULL)"
                raise InfiscriptError("expected NULL after IS")
            if kw == "between":
                self.take()
                lo = self.value()
                t2 = self.take()
                if not (t2.kind == "kw" and t2.text == "and"):
                    raise InfiscriptError("expected AND in BETWEEN")
                hi = self.value()
                return f"({col} BETWEEN {lo} AND {hi})"
            if kw == "in":
                self.take()
                self.expect_op("(")
                vals = [self.value()]
                while self.peek() and self.peek().kind == "op" and self.peek().text == ",":
                    self.take()
                    vals.append(self.value())
                self.expect_op(")")
                return f"({col} IN ({', '.join(vals)}))"
            if kw == "contains":
                self.take()
                return f"contains({col}, {self.string_value()})"
            if kw == "starts":
                self.take()
                self._expect_kw("with")
                return f"startswith({col}, {self.string_value()})"
            if kw == "ends":
                self.take()
                self._expect_kw("with")
                return f"endswith({col}, {self.string_value()})"
            if kw == "like":
                self.take()
                return f"({col} LIKE {self.string_value()})"
            if kw == "matches":
                self.take()
                return f"({col} RLIKE {self.string_value()})"
            raise InfiscriptError(f"unexpected keyword {kw!r} after {ident!r}")
        if nxt.kind == "op" and nxt.text in ("=", "!=", "<", "<=", ">", ">="):
            op = self.take().text
            rhs = self.value()
            return f"({col} {op} {rhs})"
        raise InfiscriptError(f"unexpected token {nxt.text!r} after {ident!r}")

    def _expect_kw(self, kw: str) -> None:
        t = self.take()
        if not (t.kind == "kw" and t.text == kw):
            raise InfiscriptError(f"expected {kw.upper()}, got {t.text!r}")

    def value(self) -> str:
        t = self.take()
        if t.kind == "string":
            return t.text
        if t.kind == "number":
            return t.text
        if t.kind == "ident":
            return f"`{t.text}`"
        raise InfiscriptError(f"expected value, got {t.text!r}")

    def string_value(self) -> str:
        t = self.take()
        if t.kind != "string":
            raise InfiscriptError(f"expected string literal, got {t.text!r}")
        return t.text


def infiscript_to_sql(expr: str) -> str:
    """Translate an Infiscript filter expression into a Spark SQL boolean
    expression string (usable with F.expr / DataFrame.filter)."""
    if expr is None or not expr.strip():
        raise InfiscriptError("empty filter expression")
    p = _Parser(_tokenize(expr))
    out = p.ternary()
    if p.i != len(p.toks):
        raise InfiscriptError(f"trailing tokens: {p.toks[p.i].text!r}")
    return out
