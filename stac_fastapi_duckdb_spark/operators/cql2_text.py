"""CQL2-text → CQL2-JSON parser (OGC 21-065, the text encoding of the
filter grammar the engine already compiles).

The reference repo only ever receives CQL2 as parsed JSON — its
``apply_cql2_filter`` takes a dict (/root/reference/stac_fastapi/duckdb/
database_logic.py:488-521) and nothing in the repo parses text. But the
upstream STAC API Filter extension the reference conforms to
(``app.py:29-31`` advertises ``...filter:cql2-text``) requires GET
``/search?filter=...&filter-lang=cql2-text``, so a user switching from
any conformant deployment will send text filters. This module closes
that gap: a small recursive-descent parser over exactly the operator
set ``cql2.supported_cql2_ops()`` compiles, emitting the SAME dict AST
``cql2_to_column`` consumes — one compiler, two encodings.

Grammar (case-insensitive keywords)::

    expr      := and_expr ( OR and_expr )*
    and_expr  := unary ( AND unary )*
    unary     := NOT unary | primary
    primary   := '(' expr ')' | predicate
    predicate := operand ( ('='|'<>'|'!='|'<'|'<='|'>'|'>=') operand
                         | NOT? LIKE   string
                         | NOT? ILIKE  string
                         | NOT? BETWEEN operand AND operand
                         | NOT? IN '(' operand (',' operand)* ')'
                         | IS NOT? NULL )
    operand   := TIMESTAMP '(' string ')' | DATE '(' string ')'
               | number | string | TRUE | FALSE
               | identifier | '"' quoted identifier '"'

Pure driver-side string processing — no Spark jobs; errors raise
``InvalidQueryError`` (fail-closed, same contract as the JSON path).
"""

from __future__ import annotations

import re
from typing import Any

from stac_fastapi_duckdb_spark.errors import InvalidQueryError

_TOKEN_RE = re.compile(
    r"""
    \s*(?:
        (?P<num>-?\d+\.\d+|-?\d+)
      | (?P<str>'(?:[^']|'')*')
      | (?P<qid>"(?:[^"]|"")*")
      | (?P<word>[A-Za-z_][A-Za-z0-9_:.\-]*)
      | (?P<op><=|>=|<>|!=|=|<|>)
      | (?P<lpar>\()
      | (?P<rpar>\))
      | (?P<comma>,)
    )
    """,
    re.VERBOSE,
)

_KEYWORDS = {
    "AND", "OR", "NOT", "LIKE", "ILIKE", "BETWEEN", "IN", "IS", "NULL",
    "TRUE", "FALSE", "TIMESTAMP", "DATE",
}


class _Tok:
    __slots__ = ("kind", "value")

    def __init__(self, kind: str, value: Any) -> None:
        self.kind = kind  # num str qid word op lpar rpar comma kw:<K>
        self.value = value

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"_Tok({self.kind}, {self.value!r})"


def _tokenize(text: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            if text[pos:].strip() == "":
                break
            raise InvalidQueryError(
                f"cql2-text: unexpected character at {pos}: {text[pos:pos+10]!r}"
            )
        pos = m.end()
        if m.lastgroup == "num":
            raw = m.group("num")
            toks.append(_Tok("num", float(raw) if "." in raw else int(raw)))
        elif m.lastgroup == "str":
            toks.append(_Tok("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "qid":
            toks.append(_Tok("qid", m.group("qid")[1:-1].replace('""', '"')))
        elif m.lastgroup == "word":
            w = m.group("word")
            if w.upper() in _KEYWORDS:
                toks.append(_Tok("kw:" + w.upper(), w))
            else:
                toks.append(_Tok("word", w))
        else:
            toks.append(_Tok(m.lastgroup, m.group(m.lastgroup)))
    return toks


class _Parser:
    def __init__(self, toks: list[_Tok]) -> None:
        self.toks = toks
        self.i = 0

    # -- token helpers --------------------------------------------------
    def _peek(self, kind: str) -> bool:
        return self.i < len(self.toks) and self.toks[self.i].kind == kind

    def _take(self, kind: str) -> _Tok:
        if not self._peek(kind):
            got = self.toks[self.i].kind if self.i < len(self.toks) else "end"
            raise InvalidQueryError(f"cql2-text: expected {kind}, got {got}")
        t = self.toks[self.i]
        self.i += 1
        return t

    def _accept(self, kind: str) -> bool:
        if self._peek(kind):
            self.i += 1
            return True
        return False

    # -- grammar --------------------------------------------------------
    def expr(self) -> dict:
        args = [self.and_expr()]
        while self._accept("kw:OR"):
            args.append(self.and_expr())
        return args[0] if len(args) == 1 else {"op": "or", "args": args}

    def and_expr(self) -> dict:
        args = [self.unary()]
        while self._accept("kw:AND"):
            args.append(self.unary())
        return args[0] if len(args) == 1 else {"op": "and", "args": args}

    def unary(self) -> dict:
        if self._accept("kw:NOT"):
            return {"op": "not", "args": [self.unary()]}
        return self.primary()

    def primary(self) -> dict:
        # '(' could open a grouped boolean expr OR wrap a predicate's
        # operand; a grouped BOOLEAN expr can only start at a position
        # where a predicate could also start, so try the group first and
        # fall back to predicate parsing on failure.
        if self._peek("lpar"):
            save = self.i
            try:
                self._take("lpar")
                node = self.expr()
                self._take("rpar")
                return node
            except InvalidQueryError:
                self.i = save
        return self.predicate()

    def predicate(self) -> dict:
        left = self.operand()
        if self._peek("op"):
            op = self._take("op").value
            right = self.operand()
            return {"op": op, "args": [left, right]}

        negated = self._accept("kw:NOT")

        if self._accept("kw:LIKE") or self._peek("kw:ILIKE"):
            is_ilike = self._accept("kw:ILIKE")
            pat = self._take("str").value
            node = {"op": "ilike" if is_ilike else "like", "args": [left, pat]}
            return {"op": "not", "args": [node]} if negated else node

        if self._accept("kw:BETWEEN"):
            lo = self.operand()
            self._take("kw:AND")
            hi = self.operand()
            node = {"op": "between", "args": [left, lo, hi]}
            return {"op": "not", "args": [node]} if negated else node

        if self._accept("kw:IN"):
            self._take("lpar")
            values: list[Any] = [self._literal_value()]
            while self._accept("comma"):
                values.append(self._literal_value())
            self._take("rpar")
            node = {"op": "in", "args": [left, values]}
            return {"op": "not", "args": [node]} if negated else node

        if negated:
            raise InvalidQueryError("cql2-text: NOT must precede LIKE/BETWEEN/IN")

        if self._accept("kw:IS"):
            neg = self._accept("kw:NOT")
            self._take("kw:NULL")
            node = {"op": "isNull", "args": [left]}
            return {"op": "not", "args": [node]} if neg else node

        raise InvalidQueryError("cql2-text: expected a predicate operator")

    def operand(self) -> Any:
        if self._accept("kw:TIMESTAMP"):
            self._take("lpar")
            v = self._take("str").value
            self._take("rpar")
            return {"timestamp": v}
        if self._accept("kw:DATE"):
            self._take("lpar")
            v = self._take("str").value
            self._take("rpar")
            return {"date": v}
        if self._peek("num"):
            return self._take("num").value
        if self._peek("str"):
            return self._take("str").value
        if self._accept("kw:TRUE"):
            return True
        if self._accept("kw:FALSE"):
            return False
        if self._peek("word"):
            return {"property": self._take("word").value}
        if self._peek("qid"):
            return {"property": self._take("qid").value}
        got = self.toks[self.i].kind if self.i < len(self.toks) else "end"
        raise InvalidQueryError(f"cql2-text: expected an operand, got {got}")

    def _literal_value(self) -> Any:
        """IN-list members: plain literals (the JSON encoding's ``in``
        takes a value list, cql2.py:125-128)."""
        if self._peek("num"):
            return self._take("num").value
        if self._peek("str"):
            return self._take("str").value
        if self._accept("kw:TRUE"):
            return True
        if self._accept("kw:FALSE"):
            return False
        raise InvalidQueryError("cql2-text: IN list takes literal values")


def parse_cql2_text(text: str) -> dict:
    """Parse a CQL2-text filter into the CQL2-JSON dict AST.

    The result feeds ``cql2.cql2_to_column`` unchanged — text and JSON
    filters compile through one code path.
    """
    if not isinstance(text, str) or not text.strip():
        raise InvalidQueryError("cql2-text: empty filter")
    p = _Parser(_tokenize(text))
    node = p.expr()
    if p.i != len(p.toks):
        raise InvalidQueryError(
            f"cql2-text: trailing tokens at {p.i}: {p.toks[p.i:][:3]}"
        )
    return node


def render_cql2_text(node: Any) -> str:
    """CQL2-JSON dict AST → text (the inverse of ``parse_cql2_text``,
    used by the round-trip property test and handy for logging)."""
    if isinstance(node, dict) and "op" in node:
        op = node["op"]
        args = node.get("args", [])
        if op in ("and", "or"):
            return "(" + f" {op.upper()} ".join(render_cql2_text(a) for a in args) + ")"
        if op == "not":
            return f"NOT {render_cql2_text(args[0])}"
        if op in ("like", "ilike"):
            return (
                f"{render_cql2_text(args[0])} {op.upper()} "
                + _render_literal(args[1])
            )
        if op == "between":
            f, lo, hi = (args if len(args) == 3 else (args[0], *args[1]))
            return (
                f"{render_cql2_text(f)} BETWEEN "
                f"{render_cql2_text(lo)} AND {render_cql2_text(hi)}"
            )
        if op == "in":
            vals = ", ".join(_render_literal(v) for v in args[1])
            return f"{render_cql2_text(args[0])} IN ({vals})"
        if op == "isNull":
            return f"{render_cql2_text(args[0])} IS NULL"
        return f"{render_cql2_text(args[0])} {op} {render_cql2_text(args[1])}"
    if isinstance(node, dict) and "property" in node:
        p = node["property"]
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_:.\-]*", p) and p.upper() not in _KEYWORDS:
            return p
        return '"' + p.replace('"', '""') + '"'
    if isinstance(node, dict) and "timestamp" in node:
        return f"TIMESTAMP('{node['timestamp']}')"
    if isinstance(node, dict) and "date" in node:
        return f"DATE('{node['date']}')"
    return _render_literal(node)


def _render_literal(v: Any) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise InvalidQueryError(f"cql2-text: cannot render literal {v!r}")
