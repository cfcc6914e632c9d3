"""Condition-expression language: parse once, evaluate vectorized.

Reference analog: the pyparsing infix grammar + per-row recursive
``eval`` at /root/reference/patternmatching/query/ConditionParser.py:
20-66 (grammar) and 68-133 (evaluator) — identifiers ``sym.prop``,
arithmetic ``+ - * /``, comparisons ``>= <= != > < == =``, boolean
``NOT/AND/OR``, numeric-string coercion (isdigit -> float,
ConditionParser.py:118-127).

Ray-Data-first re-expression: a hand-rolled recursive-descent parser
builds an AST **once** (driver side / actor __init__), and evaluation
runs per BATCH over pandas Series with numpy kernels — never per row.
Numeric-string coercion happens vectorized: when a comparison mixes a
string column with a numeric operand, the column passes through
``pd.to_numeric(errors="coerce")`` (digit-strings compare as floats,
non-numeric strings compare False — matching the reference's
isdigit-gated float()).

Usage:
    cond = compile_condition("l_extendedprice * (1 - l_discount) > 50000")
    ds.map_batches(lambda df: df[cond(df)], batch_format="pandas")
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Callable

import numpy as np
import pandas as pd

_TOKEN = re.compile(r"""
    \s*(?:
      (?P<num>\d+\.\d*|\.\d+|\d+)
    | (?P<str>'[^']*'|"[^"]*")
    | (?P<ident>[A-Za-z_][A-Za-z_0-9]*(?:\.[A-Za-z_][A-Za-z_0-9]*)*)
    | (?P<op><=|>=|!=|==|=|<|>|\+|-|\*|/|\(|\))
    )""", re.VERBOSE)

_KEYWORDS = {"and", "or", "not"}


def _tokenize(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m or m.end() == pos:
            rest = s[pos:].strip()
            if not rest:
                break
            raise ValueError(f"cannot tokenize condition at: {rest[:30]!r}")
        pos = m.end()
        kind = m.lastgroup
        text = m.group(kind)
        if kind == "ident" and text.lower() in _KEYWORDS:
            out.append(("kw", text.lower()))
        else:
            out.append((kind, text))
    return out


@dataclass
class Node:
    kind: str          # num | str | col | binop | cmp | not | and | or
    value: Any = None
    left: "Node | None" = None
    right: "Node | None" = None


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]) -> None:
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def eat(self, kind=None, text=None):
        k, t = self.peek()
        if k is None or (kind and k != kind) or (text and t != text):
            raise ValueError(f"unexpected token {t!r} (wanted {text or kind}) at {self.i}")
        self.i += 1
        return t

    # precedence: or < and < not < cmp < add < mul < unary/atom
    def parse(self) -> Node:
        n = self.p_or()
        if self.i != len(self.toks):
            raise ValueError(f"trailing tokens: {self.toks[self.i:]}")
        return n

    def p_or(self) -> Node:
        n = self.p_and()
        while self.peek() == ("kw", "or"):
            self.eat()
            n = Node("or", left=n, right=self.p_and())
        return n

    def p_and(self) -> Node:
        n = self.p_not()
        while self.peek() == ("kw", "and"):
            self.eat()
            n = Node("and", left=n, right=self.p_not())
        return n

    def p_not(self) -> Node:
        if self.peek() == ("kw", "not"):
            self.eat()
            return Node("not", left=self.p_not())
        return self.p_cmp()

    def p_cmp(self) -> Node:
        n = self.p_add()
        k, t = self.peek()
        if k == "op" and t in (">=", "<=", "!=", "==", "=", "<", ">"):
            self.eat()
            return Node("cmp", value="==" if t == "=" else t, left=n, right=self.p_add())
        return n

    def p_add(self) -> Node:
        n = self.p_mul()
        while self.peek()[0] == "op" and self.peek()[1] in "+-":
            op = self.eat()
            n = Node("binop", value=op, left=n, right=self.p_mul())
        return n

    def p_mul(self) -> Node:
        n = self.p_atom()
        while self.peek()[0] == "op" and self.peek()[1] in "*/":
            op = self.eat()
            n = Node("binop", value=op, left=n, right=self.p_atom())
        return n

    def p_atom(self) -> Node:
        k, t = self.peek()
        if k == "op" and t == "(":
            self.eat()
            n = self.p_or()
            self.eat("op", ")")
            return n
        if k == "op" and t == "-":
            self.eat()
            inner = self.p_atom()
            return Node("binop", value="-", left=Node("num", value=0.0), right=inner)
        if k == "num":
            self.eat()
            return Node("num", value=float(t))
        if k == "str":
            self.eat()
            return Node("str", value=t[1:-1])
        if k == "ident":
            self.eat()
            return Node("col", value=t)
        raise ValueError(f"unexpected token {t!r}")


def parse_condition(expr: str) -> Node:
    return _Parser(_tokenize(expr)).parse()


def _is_numericish(x) -> bool:
    if isinstance(x, (int, float, np.ndarray)):
        return not (isinstance(x, np.ndarray) and x.dtype == object)
    if isinstance(x, pd.Series):
        return pd.api.types.is_numeric_dtype(x)
    return False


def _coerce_pair(a, b):
    """Numeric-string coercion (reference ConditionParser.py:118-127):
    when one side is numeric and the other is a string series/value,
    coerce the string side with to_numeric (non-numeric -> NaN ->
    comparison False)."""
    if _is_numericish(a) and not _is_numericish(b):
        if isinstance(b, pd.Series):
            b = pd.to_numeric(b, errors="coerce")
        else:
            try:
                b = float(b)
            except (TypeError, ValueError):
                return a, None
    elif _is_numericish(b) and not _is_numericish(a):
        if isinstance(a, pd.Series):
            a = pd.to_numeric(a, errors="coerce")
        else:
            try:
                a = float(a)
            except (TypeError, ValueError):
                return None, b
    return a, b


_CMP = {
    "==": lambda a, b: a == b, "!=": lambda a, b: a != b,
    ">": lambda a, b: a > b, "<": lambda a, b: a < b,
    ">=": lambda a, b: a >= b, "<=": lambda a, b: a <= b,
}
_ARITH = {
    "+": lambda a, b: a + b, "-": lambda a, b: a - b,
    "*": lambda a, b: a * b, "/": lambda a, b: a / b,
}


def _eval(node: Node, df: pd.DataFrame):
    if node.kind == "num":
        return node.value
    if node.kind == "str":
        return node.value
    if node.kind == "col":
        name = node.value
        if name in df.columns:
            return df[name]
        # sym.prop form: try the bare prop (joined-in column)
        bare = name.split(".")[-1]
        if bare in df.columns:
            return df[bare]
        raise KeyError(f"unknown column {name!r}; have {list(df.columns)[:10]}")
    if node.kind == "binop":
        return _ARITH[node.value](_eval(node.left, df), _eval(node.right, df))
    if node.kind == "cmp":
        a, b = _coerce_pair(_eval(node.left, df), _eval(node.right, df))
        if a is None or b is None:  # un-coercible -> all False
            return np.zeros(len(df), dtype=bool)
        res = _CMP[node.value](a, b)
        if isinstance(res, pd.Series):
            res = res.fillna(False).to_numpy(dtype=bool)
        return res
    if node.kind == "not":
        return ~_as_mask(_eval(node.left, df), df)
    if node.kind == "and":
        return _as_mask(_eval(node.left, df), df) & _as_mask(_eval(node.right, df), df)
    if node.kind == "or":
        return _as_mask(_eval(node.left, df), df) | _as_mask(_eval(node.right, df), df)
    raise AssertionError(node.kind)


def _as_mask(x, df) -> np.ndarray:
    if isinstance(x, pd.Series):
        return x.fillna(False).to_numpy(dtype=bool)
    if isinstance(x, np.ndarray):
        return x.astype(bool)
    return np.full(len(df), bool(x))


def compile_condition(expr: str) -> Callable[[pd.DataFrame], np.ndarray]:
    """Parse once -> vectorized mask function over a pandas batch."""
    ast = parse_condition(expr)

    def fn(df: pd.DataFrame) -> np.ndarray:
        return _as_mask(_eval(ast, df), df)

    return fn


def filter_dataset(ds, expr: str):
    """ds.filter with the compiled condition, applied per batch
    (vectorized) instead of per row."""
    cond = compile_condition(expr)
    return ds.map_batches(lambda df: df[cond(df)], batch_format="pandas")
