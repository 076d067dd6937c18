"""CQL2-text front-end for the catalog query algebra — parses the
OGC Common Query Language (CQL2, the filter language of OGC API -
Features Part 3 / STAC filter extension; public spec) subset that maps
onto the engine's ``QueryF`` AST (query/ast.py), so API users can write

    name = 'layer' AND S_INTERSECTS(geom, BBOX(-10, 40, 5, 55))
        AND T_DURING(time, INTERVAL('2020-01-01T00:00:00Z',
                                    '2020-06-01T00:00:00Z'))

and get the same pushdown-compiled plan the JSON AST produces
(query/compile.py). The reference accepts its query algebra through
typed Scala / JSON; CQL2-text is the textual surface the same clients
speak to OGC/STAC services.

Supported grammar (hand recursive-descent, no dependencies):

    expr      := andExpr ( OR andExpr )*
    andExpr   := primary ( AND primary )*
    primary   := '(' expr ')' | predicate
    predicate := ident '=' string                     -> WithName
               | ident IN '(' string (',' string)* ')' -> WithNames
               | S_INTERSECTS '(' ident ',' geom ')'   -> Intersects
               | S_CONTAINS  '(' ident ',' geom ')'    -> Contains
               | T_DURING '(' ident ',' INTERVAL '(' string ',' string ')' ')'
                                                       -> Between
               | T_EQUALS '(' ident ',' TIMESTAMP '(' string ')' ')' -> At
    geom      := BBOX '(' num ',' num ',' num ',' num ')'
               | POLYGON '((' num num (',' num num)* '))'   (bbox taken)

Anything outside the subset (NOT — the algebra has no complement node,
arithmetic, property comparisons) raises ValueError with the offending
token, never a silent mis-parse.
"""

from __future__ import annotations

import datetime as dt
import re

from . import ast as Q

_TOKEN = re.compile(
    r"\s*(?:(?P<lpar>\()|(?P<rpar>\))|(?P<comma>,)|(?P<eq>=)"
    r"|(?P<str>'(?:[^']|'')*')"
    r"|(?P<num>-?\d+(?:\.\d+)?)"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_:]*))")

_NAME_PROPS = {"name", "collection", "id", "layer"}


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN.match(text, pos)
        if not m or m.end() == m.start():
            rest = text[pos:].strip()
            if not rest:
                break
            raise ValueError(f"CQL2: cannot tokenize at: {rest[:30]!r}")
        pos = m.end()
        for kind, val in m.groupdict().items():
            if val is not None:
                out.append((kind, val))
                break
    return out


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i] if self.i < len(self.toks) else ("eof", "")

    def next(self, want: str | None = None) -> str:
        kind, val = self.peek()
        if want and kind != want:
            raise ValueError(f"CQL2: expected {want}, got {val!r}")
        self.i += 1
        return val

    def kw(self, *words: str) -> bool:
        kind, val = self.peek()
        return kind == "ident" and val.upper() in words

    # -- grammar --------------------------------------------------------
    def expr(self) -> Q.Query:
        node = self.and_expr()
        while self.kw("OR"):
            self.next()
            node = Q.Or(node, self.and_expr())
        return node

    def and_expr(self) -> Q.Query:
        node = self.primary()
        while self.kw("AND"):
            self.next()
            node = Q.And(node, self.primary())
        return node

    def primary(self) -> Q.Query:
        kind, val = self.peek()
        if kind == "lpar":
            self.next()
            node = self.expr()
            self.next("rpar")
            return node
        if kind != "ident":
            raise ValueError(f"CQL2: expected a predicate, got {val!r}")
        up = val.upper()
        if up == "NOT":
            raise ValueError(
                "CQL2: NOT is outside the supported subset (the catalog "
                "algebra has no complement node)")
        if up in ("S_INTERSECTS", "S_CONTAINS"):
            return self.spatial(up)
        if up in ("T_DURING", "T_EQUALS"):
            return self.temporal(up)
        return self.name_pred()

    def spatial(self, fn: str) -> Q.Query:
        self.next()
        self.next("lpar")
        self.next("ident")  # the geometry property name
        self.next("comma")
        kind, val = self.peek()
        if (fn == "S_CONTAINS" and kind == "ident"
                and val.upper() == "POLYGON"):
            # The catalog algebra evaluates geometry as its bbox. For
            # S_INTERSECTS that is a sound (false-positive-only)
            # pre-filter; for S_CONTAINS it OVER-constrains — a layer
            # containing the polygon but not its bbox would be wrongly
            # excluded. Refuse rather than silently deviate from CQL2.
            raise ValueError(
                "CQL2: POLYGON is not supported under S_CONTAINS (the "
                "catalog evaluates geometry as its bbox, which is only "
                "a sound approximation for S_INTERSECTS); pass "
                "BBOX(xmin, ymin, xmax, ymax) explicitly")
        ext = self.geom()
        self.next("rpar")
        return Q.Intersects(ext) if fn == "S_INTERSECTS" else Q.Contains(ext)

    def geom(self) -> tuple:
        kind, val = self.peek()
        if kind != "ident":
            raise ValueError(f"CQL2: expected a geometry, got {val!r}")
        up = val.upper()
        self.next()
        if up == "BBOX":
            self.next("lpar")
            nums = [float(self.next("num"))]
            for _ in range(3):
                self.next("comma")
                nums.append(float(self.next("num")))
            self.next("rpar")
            return tuple(nums)
        if up == "POLYGON":
            self.next("lpar")
            self.next("lpar")
            xs, ys = [], []
            while True:
                xs.append(float(self.next("num")))
                ys.append(float(self.next("num")))
                kind, _ = self.peek()
                if kind == "comma":
                    self.next()
                    continue
                break
            self.next("rpar")
            self.next("rpar")
            return (min(xs), min(ys), max(xs), max(ys))
        raise ValueError(f"CQL2: unsupported geometry {val!r} "
                         "(BBOX and POLYGON only)")

    def temporal(self, fn: str) -> Q.Query:
        self.next()
        self.next("lpar")
        field = self.next("ident")
        self.next("comma")
        if fn == "T_DURING":
            kind, w = self.peek()
            if kind != "ident" or w.upper() != "INTERVAL":
                raise ValueError("CQL2: T_DURING needs INTERVAL(...)")
            self.next()
            self.next("lpar")
            t0 = self._time(self.next("str"))
            self.next("comma")
            t1 = self._time(self.next("str"))
            self.next("rpar")
            self.next("rpar")
            return Q.Between(t0, t1, field_name=field)
        kind, w = self.peek()
        if kind != "ident" or w.upper() != "TIMESTAMP":
            raise ValueError("CQL2: T_EQUALS needs TIMESTAMP(...)")
        self.next()
        self.next("lpar")
        t = self._time(self.next("str"))
        self.next("rpar")
        self.next("rpar")
        return Q.At(t, field_name=field)

    @staticmethod
    def _time(quoted: str) -> dt.datetime:
        s = quoted[1:-1].replace("''", "'")
        return Q._parse_iso(s)

    def name_pred(self) -> Q.Query:
        prop = self.next("ident")
        if prop.lower() not in _NAME_PROPS:
            raise ValueError(
                f"CQL2: property {prop!r} is outside the supported subset "
                f"(name predicates on {sorted(_NAME_PROPS)}, S_*, T_*)")
        kind, val = self.peek()
        if kind == "eq":
            self.next()
            s = self.next("str")
            return Q.WithName(s[1:-1].replace("''", "'"))
        if kind == "ident" and val.upper() == "IN":
            self.next()
            self.next("lpar")
            names = [self.next("str")]
            while self.peek()[0] == "comma":
                self.next()
                names.append(self.next("str"))
            self.next("rpar")
            return Q.WithNames(
                frozenset(n[1:-1].replace("''", "'") for n in names))
        raise ValueError(f"CQL2: expected = or IN after {prop!r}")


def parse_cql2(text: str) -> Q.Query:
    """CQL2-text → query AST; raises ValueError outside the subset."""
    p = _Parser(_tokenize(text))
    node = p.expr()
    if p.peek()[0] != "eof":
        raise ValueError(f"CQL2: trailing input at {p.peek()[1]!r}")
    return node
