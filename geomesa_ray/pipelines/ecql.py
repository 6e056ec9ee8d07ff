"""ECQL text front-end: filter strings -> vectorized predicates + QuerySpec.

Parity target: the reference accepts (E)CQL filter text everywhere queries
enter (GeoTools ``ECQL.toFilter``; evaluated locally by
geomesa-index-api/.../planning/LocalQueryRunner.scala, decomposed by
FilterHelper.extractGeometries/extractIntervals). This module implements a
practical ECQL subset as a recursive-descent parser over a regex tokenizer:

    comparison : attr = | <> | < | <= | > | >= literal
    BETWEEN    : attr BETWEEN lo AND hi
    IN         : attr IN (v1, v2, ...)
    LIKE/ILIKE : attr LIKE 'pat%'  (%% and _ wildcards; ILIKE case-insensitive)
    NULL       : attr IS [NOT] NULL
    spatial    : BBOX(geom, x0, y0, x1, y1) | INTERSECTS/CONTAINS/WITHIN/
                 DISJOINT/TOUCHES/CROSSES/OVERLAPS/EQUALS (geom, <WKT>)
                 | DWITHIN/BEYOND(geom, <WKT point>, dist, meters)
                 | RELATE(geom, <WKT polygon>, 'DE-9IM pattern')
    temporal   : attr DURING t0/t1 | attr AFTER t | attr BEFORE t
    logic      : AND, OR, NOT, parentheses

``compile_ecql`` returns a Filter whose ``mask(table)`` evaluates
vectorized over a pyarrow batch, and whose ``extract_geometries`` /
``extract_intervals`` pull the index-pushdown pieces out of top-level AND
conjuncts (FilterHelper.scala:101-214 semantics: only conjuncts constrain
the scan; OR'd spatial predicates stay residual unless all branches are
spatial)."""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<string>'(?:[^']|'')*')
      | (?P<datetime>\d{4}-\d{2}-\d{2}T[\d:.]+Z?)
      | (?P<number>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
      | (?P<op><=|>=|<>|!=|=|<|>)
      | (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<comma>,)
      | (?P<slash>/)
      | (?P<word>[A-Za-z_][A-Za-z0-9_.]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"AND", "OR", "NOT", "BETWEEN", "IN", "LIKE", "ILIKE", "IS", "NULL",
             "BBOX", "INTERSECTS", "CONTAINS", "WITHIN", "DWITHIN", "RELATE",
             "BEYOND", "DISJOINT", "TOUCHES", "CROSSES", "OVERLAPS", "EQUALS",
             "DURING", "AFTER", "BEFORE", "TRUE", "FALSE", "INCLUDE", "EXCLUDE"}


def _tokenize(text: str):
    out, pos = [], 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == pos:
            if text[pos:].strip():
                raise ValueError(f"ECQL tokenize error at: {text[pos:pos + 30]!r}")
            break
        pos = m.end()
        kind = m.lastgroup
        val = m.group(m.lastgroup)
        if kind == "word" and val.upper() in _KEYWORDS:
            out.append(("kw", val.upper()))
        elif kind == "string":
            out.append(("string", val[1:-1].replace("''", "'")))
        elif kind == "number":
            out.append(("number", float(val) if ("." in val or "e" in val.lower()) else int(val)))
        elif kind == "datetime":
            out.append(("datetime", val))
        else:
            out.append((kind, val))
    out.append(("eof", None))
    return out


def _parse_iso_ms(s: str) -> int:
    import datetime as dt

    s = s.rstrip("Z")
    if "." in s:
        d = dt.datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%f")
    else:
        d = dt.datetime.strptime(s, "%Y-%m-%dT%H:%M:%S")
    return int(d.replace(tzinfo=dt.timezone.utc).timestamp() * 1000)


# ------------------------------------------------------------------ AST


def _col(table: pa.Table, name: str) -> np.ndarray:
    return table.column(name).to_numpy(zero_copy_only=False)


def _ts_col(table: pa.Table, name: str) -> np.ndarray:
    from geomesa_ray.util import ts_to_millis

    return ts_to_millis(table.column(name))


@dataclass
class Filter:
    def mask(self, table: pa.Table) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError

    def extract_geometries(self) -> list[tuple]:
        """Top-level AND-conjunct bboxes usable for index pushdown."""
        return []

    def extract_intervals(self) -> list[tuple]:
        return []


@dataclass
class Cmp(Filter):
    attr: str
    op: str
    value: object

    def mask(self, t):
        v = _col(t, self.attr)
        ops = {"=": np.equal, "<>": np.not_equal, "<": np.less,
               "<=": np.less_equal, ">": np.greater, ">=": np.greater_equal}
        with np.errstate(invalid="ignore"):
            return ops[self.op](v, self.value)


@dataclass
class Between(Filter):
    attr: str
    lo: object
    hi: object

    def mask(self, t):
        v = _col(t, self.attr)
        return (v >= self.lo) & (v <= self.hi)


@dataclass
class In(Filter):
    attr: str
    values: tuple

    def mask(self, t):
        import pandas as pd

        return pd.Series(_col(t, self.attr)).isin(self.values).to_numpy()


@dataclass
class Like(Filter):
    attr: str
    pattern: str
    ci: bool = False  # ILIKE

    def mask(self, t):
        import pandas as pd

        # re.escape leaves % and _ unescaped (not regex-special), so the
        # wildcard substitution is safe after escaping everything else
        rx = "^" + re.escape(self.pattern).replace("%", ".*").replace("_", ".") + "$"
        # match on the ORIGINAL series with na=False: .astype(str) would turn
        # nulls into the literal 'None', spuriously matching e.g. '%one%'
        # (SQL/ECQL LIKE on null is false)
        s = pd.Series(_col(t, self.attr))
        return s.astype("string").str.match(
            rx, case=not self.ci, na=False).astype(bool).to_numpy()


@dataclass
class IsNull(Filter):
    attr: str
    negate: bool

    def mask(self, t):
        import pandas as pd

        isna = pd.isna(pd.Series(_col(t, self.attr))).to_numpy()
        return ~isna if self.negate else isna


@dataclass
class Bbox(Filter):
    x0: float
    y0: float
    x1: float
    y1: float
    lon_col: str = "lon"
    lat_col: str = "lat"

    def mask(self, t):
        from geomesa_ray.geo.antimeridian import split_bbox
        from geomesa_ray.geo.predicates import points_in_bbox

        lon = _col(t, self.lon_col)
        lat = _col(t, self.lat_col)
        m = np.zeros(len(lon), dtype=bool)
        for (a, b, c, d) in split_bbox(self.x0, self.y0, self.x1, self.y1):
            m |= points_in_bbox(lon, lat, a, b, c, d)
        return m

    def extract_geometries(self):
        from geomesa_ray.geo.antimeridian import split_bbox

        return split_bbox(self.x0, self.y0, self.x1, self.y1)


@dataclass
class SpatialWkt(Filter):
    op: str  # INTERSECTS | CONTAINS | WITHIN
    wkt: str
    lon_col: str = "lon"
    lat_col: str = "lat"

    def _poly(self):
        from geomesa_ray.geo.predicates import Polygon

        return Polygon.from_wkt(self.wkt)

    def mask(self, t):
        return self._poly().contains(_col(t, self.lon_col), _col(t, self.lat_col))

    def extract_geometries(self):
        from geomesa_ray.geo.antimeridian import split_bbox

        return split_bbox(*self._poly().bbox())


@dataclass
class Relate(Filter):
    """RELATE(geom, <WKT polygon>, 'DE-9IM pattern') — point rows against a
    polygon literal. A point relates to a polygon in exactly three ways
    (interior / boundary / exterior), so the three pattern matches are
    evaluated ONCE and rows classify vectorized."""

    wkt: str
    pattern: str
    lon_col: str = "lon"
    lat_col: str = "lat"

    _M_IN, _M_B, _M_OUT = "0FFFFF212", "F0FFFF212", "FF0FFF212"

    def _poly(self):
        from geomesa_ray.geo.predicates import Polygon

        return Polygon.from_wkt(self.wkt)

    def mask(self, t):
        from geomesa_ray.geo.relate import matches
        from geomesa_ray.geo.wkt import parse_wkt

        lon = np.asarray(_col(t, self.lon_col), dtype=np.float64)
        lat = np.asarray(_col(t, self.lat_col), dtype=np.float64)
        m_in = matches(self._M_IN, self.pattern)
        m_b = matches(self._M_B, self.pattern)
        m_out = matches(self._M_OUT, self.pattern)
        inside = self._poly().contains(lon, lat)  # inside-or-on (even-odd)
        ring = np.asarray(parse_wkt(self.wkt)["coords"][0], dtype=np.float64)
        on_b = _points_on_ring(ring, lon, lat)
        return np.where(on_b, m_b, np.where(inside, m_in, m_out))

    def extract_geometries(self):
        from geomesa_ray.geo.antimeridian import split_bbox
        from geomesa_ray.geo.relate import matches

        # pushdown only when exterior points can never match — then every
        # matching row lies inside-or-on the polygon, so its bbox is a
        # valid coarse superset
        if matches(self._M_OUT, self.pattern):
            return []
        return split_bbox(*self._poly().bbox())


def _points_on_ring(ring: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """Vectorized: is each point exactly on some segment of the ring?"""
    a = ring
    b = np.roll(ring, -1, axis=0)
    ex = (b[:, 0] - a[:, 0])[None, :]
    ey = (b[:, 1] - a[:, 1])[None, :]
    # a closed ring's wrap segment (last==first) is zero-length and would
    # classify EVERY point as collinear-within — mask degenerate segments
    nz = (ex != 0.0) | (ey != 0.0)
    rx = px[:, None] - a[None, :, 0]
    ry = py[:, None] - a[None, :, 1]
    collinear = ex * ry - ey * rx == 0.0
    t = rx * ex + ry * ey
    within = (t >= 0.0) & (t <= ex * ex + ey * ey)
    return (collinear & within & nz).any(axis=1)


@dataclass
class DWithin(Filter):
    wkt: str
    dist_m: float
    lon_col: str = "lon"
    lat_col: str = "lat"

    def mask(self, t):
        from geomesa_ray.geo.distance import haversine_m
        from geomesa_ray.geo.wkt import parse_wkt

        g = parse_wkt(self.wkt)
        qx, qy = g["coords"]
        return haversine_m(_col(t, self.lon_col), _col(t, self.lat_col), qx, qy) <= self.dist_m

    def extract_geometries(self):
        from geomesa_ray.geo.distance import geodesic_halfwidths
        from geomesa_ray.geo.wkt import parse_wkt

        g = parse_wkt(self.wkt)
        qx, qy = g["coords"]
        # exact superset bbox: this is only a pushdown pre-filter (mask() is
        # the exact haversine), so it must never UNDERcover the disk
        dlon, dlat = geodesic_halfwidths(qy, self.dist_m)
        return [(qx - float(dlon), qy - float(dlat), qx + float(dlon), qy + float(dlat))]


@dataclass
class Temporal(Filter):
    attr: str
    op: str  # DURING | AFTER | BEFORE | AFTER_EQ | BEFORE_EQ
    t0: int | None
    t1: int | None

    def mask(self, t):
        ms = _ts_col(t, self.attr)
        if self.op == "DURING":
            return (ms >= self.t0) & (ms < self.t1)
        if self.op == "AFTER":
            return ms > self.t0
        if self.op == "AFTER_EQ":  # attr >= <datetime> — inclusive, like GeoTools
            return ms >= self.t0
        if self.op == "BEFORE_EQ":  # attr <= <datetime>
            return ms <= self.t0
        return ms < self.t0  # BEFORE

    def extract_intervals(self):
        if self.op == "DURING":
            return [(self.t0, self.t1)]
        return []  # open intervals stay residual


@dataclass
class Logical(Filter):
    op: str  # AND | OR
    parts: tuple

    def mask(self, t):
        m = self.parts[0].mask(t)
        for p in self.parts[1:]:
            m = (m & p.mask(t)) if self.op == "AND" else (m | p.mask(t))
        return m

    def extract_geometries(self):
        if self.op == "AND":
            out = []
            for p in self.parts:
                out.extend(p.extract_geometries())
            return out
        # OR of conjuncts is pushable only if EVERY branch is spatial
        branches = [p.extract_geometries() for p in self.parts]
        if all(branches):
            return [b for bs in branches for b in bs]
        return []

    def extract_intervals(self):
        if self.op == "AND":
            out = []
            for p in self.parts:
                out.extend(p.extract_intervals())
            return out
        branches = [p.extract_intervals() for p in self.parts]
        if all(branches):
            return [b for bs in branches for b in bs]
        return []


@dataclass
class Not(Filter):
    part: Filter

    def mask(self, t):
        return ~self.part.mask(t)


@dataclass
class Const(Filter):
    value: bool

    def mask(self, t):
        return np.full(t.num_rows, self.value, dtype=bool)


@dataclass
class PointEquals(Filter):
    """EQUALS(geom, POINT (...)) — exact coordinate equality for point
    rows; EQUALS against a higher-dimension literal is constant false."""

    x: float
    y: float
    lon_col: str = "lon"
    lat_col: str = "lat"

    def mask(self, t):
        lon = np.asarray(_col(t, self.lon_col), dtype=np.float64)
        lat = np.asarray(_col(t, self.lat_col), dtype=np.float64)
        return (lon == self.x) & (lat == self.y)

    def extract_geometries(self):
        return [(self.x, self.y, self.x, self.y)]


# ------------------------------------------------------------------ parser


class _Parser:
    def __init__(self, tokens):
        self.toks = tokens
        self.i = 0

    def peek(self):
        return self.toks[self.i]

    def next(self):
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def expect(self, kind, val=None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"ECQL parse error: expected {kind} {val}, got {k} {v}")
        return v

    def parse(self) -> Filter:
        f = self.or_expr()
        self.expect("eof")
        return f

    def or_expr(self) -> Filter:
        parts = [self.and_expr()]
        while self.peek() == ("kw", "OR"):
            self.next()
            parts.append(self.and_expr())
        return parts[0] if len(parts) == 1 else Logical("OR", tuple(parts))

    def and_expr(self) -> Filter:
        parts = [self.unary()]
        while self.peek() == ("kw", "AND"):
            self.next()
            parts.append(self.unary())
        return parts[0] if len(parts) == 1 else Logical("AND", tuple(parts))

    def unary(self) -> Filter:
        k, v = self.peek()
        if (k, v) == ("kw", "NOT"):
            self.next()
            return Not(self.unary())
        if (k, v) == ("kw", "INCLUDE") or (k, v) == ("kw", "TRUE"):
            self.next()
            return Const(True)
        if (k, v) == ("kw", "EXCLUDE") or (k, v) == ("kw", "FALSE"):
            self.next()
            return Const(False)
        if k == "lparen":
            self.next()
            f = self.or_expr()
            self.expect("rparen")
            return f
        if k == "kw" and v in ("BBOX", "INTERSECTS", "CONTAINS", "WITHIN",
                               "DWITHIN", "RELATE", "BEYOND", "DISJOINT",
                               "TOUCHES", "CROSSES", "OVERLAPS", "EQUALS"):
            return self.spatial()
        return self.predicate()

    def _wkt_arg(self) -> str:
        """Consume a WKT literal (word + balanced parens) verbatim from the
        raw token stream."""
        kind, word = self.next()
        if kind != "word":
            raise ValueError(f"expected WKT geometry, got {kind} {word}")
        depth = 0
        parts = [word.upper(), " "]
        while True:
            k, v = self.next()
            if k == "lparen":
                depth += 1
                parts.append("(")
            elif k == "rparen":
                depth -= 1
                parts.append(")")
                if depth == 0:
                    return "".join(
                        p if isinstance(p, str) else str(p) for p in parts
                    )
            elif k == "comma":
                parts.append(", ")
            elif k == "number":
                parts.append(f"{v} " if self.peek()[0] == "number" else f"{v}")
            else:
                parts.append(str(v))

    def spatial(self) -> Filter:
        _, fn = self.next()
        self.expect("lparen")
        self.expect("word")  # geometry attribute name (engine-native lon/lat)
        self.expect("comma")
        if fn == "BBOX":
            vals = []
            for j in range(4):
                vals.append(float(self.next()[1]))
                if j < 3:
                    self.expect("comma")
            self.expect("rparen")
            return Bbox(*vals)
        wkt = self._wkt_arg()
        if fn in ("DWITHIN", "BEYOND"):
            self.expect("comma")
            dist = float(self.next()[1])
            self.expect("comma")
            unit = self.expect("word")
            self.expect("rparen")
            mult = {"meters": 1.0, "kilometers": 1000.0}.get(unit.lower())
            if mult is None:
                raise ValueError(f"{fn} unit {unit!r} not supported")
            dw = DWithin(wkt, dist * mult)
            # BEYOND = NOT DWITHIN; Not inherits the empty pushdown, so the
            # negated distance never prunes the read (correct: its matches
            # live OUTSIDE the window)
            return Not(dw) if fn == "BEYOND" else dw
        if fn == "RELATE":
            self.expect("comma")
            k, pat = self.next()  # quoted DE-9IM pattern, e.g. 'T*****FF*'
            if k != "string":
                raise ValueError("RELATE pattern must be a quoted string")
            self.expect("rparen")
            return Relate(wkt, pat)
        self.expect("rparen")
        if fn == "DISJOINT":
            # NOT intersects; negation never pushes a bbox down
            return Not(SpatialWkt("INTERSECTS", wkt))
        if fn == "TOUCHES":
            # point rows touch an areal literal iff they lie ON its
            # boundary: II empty, IB non-empty ('FT*******')
            return Relate(wkt, "FT*******")
        if fn in ("CROSSES", "OVERLAPS"):
            # point rows can never cross (needs a lower-dim intersection
            # WITH exterior reach) or overlap (needs equal dimensions) an
            # areal literal — constant false, matching JTS
            return Const(False)
        if fn == "EQUALS":
            from geomesa_ray.geo.wkt import parse_wkt

            g = parse_wkt(wkt)
            if g["type"] == "Point":
                return PointEquals(float(g["coords"][0]), float(g["coords"][1]))
            return Const(False)  # point row vs higher-dim literal
        return SpatialWkt(fn, wkt)

    def predicate(self) -> Filter:
        attr = self.expect("word")
        k, v = self.next()
        if k == "op":
            nk, nv = self.next()
            if nk not in ("number", "string", "datetime"):
                raise ValueError(f"bad literal {nk} {nv}")
            if nk == "datetime":
                ms = _parse_iso_ms(nv)
                # GeoTools ECQL comparison operators are INCLUSIVE for >=/<=
                # — strict AFTER/BEFORE would drop rows exactly at the bound
                op_map = {">": "AFTER", ">=": "AFTER_EQ", "<": "BEFORE", "<=": "BEFORE_EQ"}
                if v in op_map:
                    return Temporal(attr, op_map[v], ms, None)
                raise ValueError("datetime supports </>/<=/>= only")
            op = "<>" if v == "!=" else v
            return Cmp(attr, op, nv)
        if (k, v) == ("kw", "BETWEEN"):
            lo = self.next()[1]
            self.expect("kw", "AND")
            hi = self.next()[1]
            return Between(attr, lo, hi)
        if (k, v) == ("kw", "IN"):
            self.expect("lparen")
            vals = []
            while True:
                vals.append(self.next()[1])
                nk, _ = self.next()
                if nk == "rparen":
                    break
                if nk != "comma":
                    raise ValueError("bad IN list")
            return In(attr, tuple(vals))
        if (k, v) == ("kw", "LIKE"):
            return Like(attr, self.expect("string"))
        if (k, v) == ("kw", "ILIKE"):
            return Like(attr, self.expect("string"), ci=True)
        if (k, v) == ("kw", "IS"):
            negate = False
            if self.peek() == ("kw", "NOT"):
                self.next()
                negate = True
            self.expect("kw", "NULL")
            return IsNull(attr, negate)
        if (k, v) == ("kw", "DURING"):
            t0 = _parse_iso_ms(self.expect("datetime"))
            self.expect("slash")
            t1 = _parse_iso_ms(self.expect("datetime"))
            return Temporal(attr, "DURING", t0, t1)
        if (k, v) == ("kw", "AFTER"):
            return Temporal(attr, "AFTER", _parse_iso_ms(self.expect("datetime")), None)
        if (k, v) == ("kw", "BEFORE"):
            return Temporal(attr, "BEFORE", _parse_iso_ms(self.expect("datetime")), None)
        raise ValueError(f"ECQL parse error at {k} {v}")


def compile_ecql(text: str) -> Filter:
    """ECQL filter text -> Filter AST (vectorized ``mask``, pushdown
    extraction via ``extract_geometries`` / ``extract_intervals``)."""
    return _Parser(_tokenize(text)).parse()


def query_spec_from_ecql(text: str, columns=None, limit=None, sort_by=None):
    """ECQL -> (QuerySpec for pushdown, residual Filter for exact masking).
    The residual is the FULL filter (re-applied after the coarse scan —
    LocalQueryRunner semantics: cheap, correct, idempotent)."""
    from geomesa_ray.pipelines.query import QuerySpec

    f = compile_ecql(text)
    geoms = [
        f"POLYGON (({a} {b}, {c} {b}, {c} {d}, {a} {d}, {a} {b}))"
        for (a, b, c, d) in f.extract_geometries()
    ]
    spec = QuerySpec(geometries=geoms, intervals=f.extract_intervals(),
                     columns=columns, limit=limit, sort_by=sort_by)
    return spec, f
