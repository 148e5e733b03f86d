"""Groovy inline-transform expression subset.

Reference: GroovyTransformFunction / GroovyFunctionEvaluator
(pinot-core/.../function/GroovyFunctionEvaluator.java;
TransformFunctionType GROOVY) — Pinot evaluates an inline Groovy script
per row: ``groovy('{"returnType":"INT","isSingleValue":true}',
'arg0 * 2 + arg1', colA, colB)``.

There is no JVM Groovy runtime here, so this module implements the
EXPRESSION SUBSET that covers the documented inline-transform usage —
parsed with a small recursive-descent parser (never Python ``eval``)
and compiled to a row function executed in an Arrow-batched pandas UDF:

- arg references ``arg0..argN``
- literals: numbers, single/double-quoted strings, true/false/null
- arithmetic ``+ - * / %`` (+ is string concat when either side is a
  string, like Groovy), unary ``-``/``!``, parentheses
- comparisons ``== != < <= > >=``, boolean ``&& ||``
- ternary ``cond ? a : b``
- method calls: ``toUpperCase() toLowerCase() trim() length() size()
  contains(x) startsWith(x) endsWith(x) indexOf(x) substring(a[,b])
  replace(a,b) split(d) toString()``
- ``Math.max/min/abs/floor/ceil/round/pow/sqrt``

Full closures/loops/collections are NOT supported and raise
NotImplementedError at parse time — a loud, declared boundary rather
than silently-wrong results.
"""

from __future__ import annotations

import json
import math
import re

import pandas as _pd
from pyspark.sql.functions import pandas_udf as _pandas_udf

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<num>\d+\.\d+|\d+) |
        (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*") |
        (?P<name>[A-Za-z_][A-Za-z0-9_]*) |
        (?P<op>&&|\|\||==|!=|<=|>=|[-+*/%<>!?:().,\[\]])
    )""",
    re.X,
)

_METHODS = {
    "toUpperCase": lambda s: s.upper(),
    "toLowerCase": lambda s: s.lower(),
    "trim": lambda s: s.strip(),
    "length": lambda s: len(s),
    "size": lambda s: len(s),
    "toString": lambda s: str(s),
    "contains": lambda s, x: x in s,
    "startsWith": lambda s, x: s.startswith(x),
    "endsWith": lambda s, x: s.endswith(x),
    "indexOf": lambda s, x: s.find(x),
    "substring": lambda s, a, b=None: s[a:b] if b is not None else s[a:],
    "replace": lambda s, a, b: s.replace(a, b),
    "split": lambda s, d: s.split(d),
}

_MATH = {
    "max": max,
    "min": min,
    "abs": abs,
    "floor": math.floor,
    "ceil": math.ceil,
    "round": round,
    "pow": math.pow,
    "sqrt": math.sqrt,
}


def _lex(src: str):
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip():
                raise NotImplementedError(f"groovy subset: bad token at {src[pos:]!r}")
            break
        pos = m.end()
        if m.group("num"):
            t = m.group("num")
            out.append(("num", float(t) if "." in t else int(t)))
        elif m.group("str"):
            raw = m.group("str")
            out.append(("str", re.sub(r"\\(.)", r"\1", raw[1:-1])))
        elif m.group("name"):
            out.append(("name", m.group("name")))
        else:
            out.append(("op", m.group("op")))
    return out


class _P:
    """Recursive-descent parser → closure tree (row: list of arg values)."""

    def __init__(self, toks):
        self.t = toks
        self.i = 0

    def peek(self):
        return self.t[self.i] if self.i < len(self.t) else (None, None)

    def eat(self, kind=None, val=None):
        k, v = self.peek()
        if kind is not None and k != kind or (val is not None and v != val):
            raise NotImplementedError(f"groovy subset: expected {val or kind}, got {v!r}")
        self.i += 1
        return v

    def parse(self):
        fn = self.ternary()
        if self.peek()[0] is not None:
            raise NotImplementedError(f"groovy subset: trailing tokens {self.t[self.i:]}")
        return fn

    def ternary(self):
        cond = self.or_()
        if self.peek() == ("op", "?"):
            self.eat()
            a = self.ternary()
            self.eat("op", ":")
            b = self.ternary()
            return lambda r: a(r) if cond(r) else b(r)
        return cond

    def _binop(self, sub, ops, apply):
        left = sub()
        while self.peek()[0] == "op" and self.peek()[1] in ops:
            op = self.eat()
            right = sub()
            left = apply(left, op, right)
        return left

    def or_(self):
        return self._binop(self.and_, {"||"}, lambda a, o, b: lambda r: a(r) or b(r))

    def and_(self):
        return self._binop(self.eq, {"&&"}, lambda a, o, b: lambda r: a(r) and b(r))

    def eq(self):
        def apply(a, o, b):
            if o == "==":
                return lambda r: a(r) == b(r)
            return lambda r: a(r) != b(r)

        return self._binop(self.rel, {"==", "!="}, apply)

    def rel(self):
        def apply(a, o, b):
            return {
                "<": lambda r: a(r) < b(r),
                "<=": lambda r: a(r) <= b(r),
                ">": lambda r: a(r) > b(r),
                ">=": lambda r: a(r) >= b(r),
            }[o]

        return self._binop(self.add, {"<", "<=", ">", ">="}, apply)

    def add(self):
        def apply(a, o, b):
            if o == "+":

                def plus(r):
                    x, y = a(r), b(r)
                    if isinstance(x, str) or isinstance(y, str):
                        return f"{x}{y}"  # Groovy string concat
                    return x + y

                return plus
            return lambda r: a(r) - b(r)

        return self._binop(self.mul, {"+", "-"}, apply)

    def mul(self):
        def apply(a, o, b):
            if o == "*":
                return lambda r: a(r) * b(r)
            if o == "/":
                return lambda r: a(r) / b(r)
            return lambda r: a(r) % b(r)

        return self._binop(self.unary, {"*", "/", "%"}, apply)

    def unary(self):
        k, v = self.peek()
        if (k, v) == ("op", "-"):
            self.eat()
            inner = self.unary()
            return lambda r: -inner(r)
        if (k, v) == ("op", "!"):
            self.eat()
            inner = self.unary()
            return lambda r: not inner(r)
        return self.postfix()

    def postfix(self):
        base = self.primary()
        while self.peek() == ("op", "."):
            self.eat()
            name = self.eat("name")
            fn = _METHODS.get(name)
            if fn is None:
                raise NotImplementedError(f"groovy subset: method .{name}()")
            args = []
            self.eat("op", "(")
            if self.peek() != ("op", ")"):
                args.append(self.ternary())
                while self.peek() == ("op", ","):
                    self.eat()
                    args.append(self.ternary())
            self.eat("op", ")")
            base = (
                lambda b=base, f=fn, a=tuple(args): lambda r: f(b(r), *[x(r) for x in a])
            )()
        return base

    def primary(self):
        k, v = self.peek()
        if k == "num" or k == "str":
            self.eat()
            return lambda r, v=v: v
        if k == "name":
            self.eat()
            if v in ("true", "false"):
                return lambda r, b=(v == "true"): b
            if v == "null":
                return lambda r: None
            if v == "Math":
                self.eat("op", ".")
                name = self.eat("name")
                fn = _MATH.get(name)
                if fn is None:
                    raise NotImplementedError(f"groovy subset: Math.{name}")
                self.eat("op", "(")
                args = [self.ternary()]
                while self.peek() == ("op", ","):
                    self.eat()
                    args.append(self.ternary())
                self.eat("op", ")")
                return lambda r, f=fn, a=tuple(args): f(*[x(r) for x in a])
            m = re.fullmatch(r"arg(\d+)", v)
            if m:
                idx = int(m.group(1))
                return lambda r, i=idx: r[i]
            raise NotImplementedError(f"groovy subset: unknown identifier {v!r}")
        if (k, v) == ("op", "("):
            self.eat()
            inner = self.ternary()
            self.eat("op", ")")
            return inner
        raise NotImplementedError(f"groovy subset: unexpected {v!r}")


def compile_groovy(script: str):
    """Compile a Groovy expression-subset script to row_fn(args_tuple)."""
    return _P(_lex(script)).parse()


_SPARK_TYPES = {
    "INT": "int",
    "LONG": "long",
    "FLOAT": "float",
    "DOUBLE": "double",
    "STRING": "string",
    "BOOLEAN": "boolean",
}


def groovy_udf(metadata_json: str, script: str):
    """Build the pandas UDF for ``groovy(metadata, script, args...)``."""
    meta = json.loads(metadata_json)
    rt = _SPARK_TYPES.get(str(meta.get("returnType", "STRING")).upper())
    if rt is None:
        raise NotImplementedError(f"groovy returnType {meta.get('returnType')!r}")
    if meta.get("isSingleValue") is False:
        rt = f"array<{rt}>"
    row_fn = compile_groovy(script)

    def _isnull(a) -> bool:
        try:
            return a is None or bool(_pd.isna(a))
        except (TypeError, ValueError):  # array-valued arg
            return False

    @_pandas_udf(rt)
    def _udf(*cols: _pd.Series) -> _pd.Series:
        n = len(cols[0]) if cols else 0
        out = []
        for i in range(n):
            args = tuple(c.iloc[i] for c in cols)
            out.append(None if any(_isnull(a) for a in args) else row_fn(args))
        return _pd.Series(out, dtype="object")

    return _udf
