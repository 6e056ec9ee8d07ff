"""Row-level visibility filtering: Accumulo-style boolean visibility
expressions evaluated against a user's authorization set.

Mirrors the reference's ``VisibilityEvaluator``
(``geomesa-security/src/main/scala/org/locationtech/geomesa/security/
VisibilityEvaluator.scala:43-180``):

- grammar: ``expr := term ('|' term)* ; term := factor ('&' factor)* ;
  factor := token | '"' escaped '"' | '(' expr ')'``
- ``&`` binds tighter than ``|`` (``user|admin&test`` == ``user|(admin&test)``)
- empty / null visibility string => visible to everyone (``VisibilityNone``)
- bare tokens are limited to ``[A-Za-z0-9_\\-:./]``; anything else must be
  double-quoted with Java-style ``\\"`` / ``\\\\`` escapes

Scale notes: expressions are parsed once per DISTINCT string (the reference
keeps a process-wide parse cache; we dictionary-encode each Arrow batch and
evaluate only the dictionary), so the per-row cost is a single int gather.
The filter is embarrassingly parallel — a plain ``map_batches`` stage, no
shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN_CHARS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_-:./"
)


class VisibilityError(ValueError):
    """Raised for malformed visibility expressions."""


def _parse(s: str):
    """Parse a visibility string into ('or'|'and', [children]) / ('val', tok).

    Hand-written recursive descent matching the reference parboiled grammar
    (VisibilityEvaluator.scala:155-180).
    """
    pos = 0
    n = len(s)

    def error(msg):
        raise VisibilityError(f"{msg} at {pos} in {s!r}")

    def value():
        nonlocal pos
        if pos < n and s[pos] == '"':
            pos += 1
            out = []
            while pos < n and s[pos] != '"':
                c = s[pos]
                if c == "\\":
                    if pos + 1 >= n:
                        error("dangling escape")
                    out.append(s[pos + 1])
                    pos += 2
                else:
                    out.append(c)
                    pos += 1
            if pos >= n:
                error("unterminated quote")
            pos += 1  # closing quote
            if not out:
                error("empty quoted token")
            return ("val", "".join(out))
        start = pos
        while pos < n and s[pos] in _TOKEN_CHARS:
            pos += 1
        if pos == start:
            error("expected token")
        return ("val", s[start:pos])

    def factor():
        nonlocal pos
        if pos < n and s[pos] == "(":
            pos += 1
            e = expression()
            if pos >= n or s[pos] != ")":
                error("expected ')'")
            pos += 1
            return e
        return value()

    def term():
        nonlocal pos
        parts = [factor()]
        while pos < n and s[pos] == "&":
            pos += 1
            parts.append(factor())
        return parts[0] if len(parts) == 1 else ("and", parts)

    def expression():
        nonlocal pos
        parts = [term()]
        while pos < n and s[pos] == "|":
            pos += 1
            parts.append(term())
        return parts[0] if len(parts) == 1 else ("or", parts)

    e = expression()
    if pos != n:
        error("trailing input")
    return e


def _evaluate(expr, auths: frozenset) -> bool:
    kind = expr[0]
    if kind == "val":
        return expr[1] in auths
    if kind == "and":
        return all(_evaluate(c, auths) for c in expr[1])
    return any(_evaluate(c, auths) for c in expr[1])  # or


class VisibilityFilter:
    """Vectorized visibility mask: duck-types the ``residual_filter`` API
    (``.mask(table) -> bool ndarray``) so it plugs straight into
    ``query_indexed`` and composes with ECQL residuals.

    Parsing is cached per distinct string across batches (actor-lifetime
    state when used inside an actor-pool stage).
    """

    def __init__(self, auths, column: str = "visibility"):
        self.auths = frozenset(auths)
        self.column = column
        self._cache: dict[str, bool] = {"": True}  # VisibilityNone

    def _visible(self, vis: str) -> bool:
        hit = self._cache.get(vis)
        if hit is None:
            hit = _evaluate(_parse(vis), self.auths)
            self._cache[vis] = hit
        return hit

    def mask(self, t: pa.Table) -> np.ndarray:
        col = t.column(self.column)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        null = pc.is_null(col).to_numpy(zero_copy_only=False)
        # evaluate the dictionary only — one parse per distinct string
        d = col.dictionary_encode()
        uniq = d.dictionary.to_pylist()
        if not len(uniq):  # all-null column: VisibilityNone everywhere
            return np.ones(len(col), dtype=bool)
        vis = np.fromiter(
            (self._visible(u) for u in uniq), dtype=bool, count=len(uniq)
        )
        idx = pc.fill_null(d.indices, 0).to_numpy().astype(np.int64)
        out = vis[idx]
        out[null] = True  # null visibility == VisibilityNone == public
        return out


def filter_visible(ds, auths, column: str = "visibility"):
    """Dataset -> Dataset keeping only rows whose ``column`` expression is
    satisfied by ``auths``. Streaming map_batches, no shuffle."""
    vf = VisibilityFilter(auths, column)

    def filt(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(vf.mask(t)))

    return ds.map_batches(filt, batch_format="pyarrow")
