"""Exact convex-polygon intersection — the non-point join refine kernel.

Parity target: the reference's exact JTS predicates applied after the
sweepline candidate pass in the partitioned spatial join
(reference geomesa-spark/.../GeoMesaJoinRelation.scala:41-91 +
OverlapAction.scala). Implemented as a vectorized separating-axis test
(SAT — standard computational-geometry result for convex shapes): two
convex polygons are disjoint iff some edge normal of either separates
their projections. Touching boundaries count as intersecting (JTS
``intersects`` semantics).

Arrays are (n_pairs, k, 2) fixed-vertex-count polygon stacks; the test is
vectorized over pairs (no Python per-pair loop).
"""

from __future__ import annotations

import numpy as np


def _axes(P: np.ndarray) -> np.ndarray:
    """(n, k, 2) vertices -> (n, k, 2) edge-normal axes (perp of each edge)."""
    e = np.roll(P, -1, axis=1) - P
    # perpendicular: (ex, ey) -> (-ey, ex)
    return np.stack([-e[..., 1], e[..., 0]], axis=-1)


def _separated_on(P: np.ndarray, Q: np.ndarray, axes: np.ndarray) -> np.ndarray:
    """For each pair, is there an axis in ``axes`` strictly separating the
    projections of P and Q? (n,) bool."""
    # projections: (n, n_axes, k)
    projP = np.einsum("nav,nkv->nak", axes, P)
    projQ = np.einsum("nav,nkv->nak", axes, Q)
    minP, maxP = projP.min(axis=2), projP.max(axis=2)
    minQ, maxQ = projQ.min(axis=2), projQ.max(axis=2)
    return ((maxP < minQ) | (maxQ < minP)).any(axis=1)


def convex_intersect(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Pairwise exact intersection test for convex polygons.

    A: (n, ka, 2) float64, B: (n, kb, 2) float64 (CCW or CW, either).
    Returns (n,) bool — True when the polygons share any point (boundary
    contact included)."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    if len(A) == 0:
        return np.zeros(0, dtype=bool)
    sep = _separated_on(A, B, _axes(A)) | _separated_on(A, B, _axes(B))
    return ~sep


def points_in_convex(P: np.ndarray, px: np.ndarray, py: np.ndarray) -> np.ndarray:
    """(n, k, 2) convex polygons x paired points -> inside-or-on mask (n,).
    Sign-consistency of cross products across the edges."""
    P = np.asarray(P, dtype=np.float64)
    e = np.roll(P, -1, axis=1) - P
    rx = px[:, None] - P[..., 0]
    ry = py[:, None] - P[..., 1]
    cross = e[..., 0] * ry - e[..., 1] * rx
    return (cross >= 0).all(axis=1) | (cross <= 0).all(axis=1)


# ------------------------------------------------------- polygon clipping

def _open_ring(ring: np.ndarray) -> np.ndarray:
    """Drop the WKT closing vertex (last == first) if present."""
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) > 1 and ring[0][0] == ring[-1][0] and ring[0][1] == ring[-1][1]:
        return ring[:-1]
    return ring


def signed_area(ring: np.ndarray) -> float:
    r = _open_ring(ring)
    x, y = r[:, 0], r[:, 1]
    return float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) / 2.0


def is_convex(ring: np.ndarray) -> bool:
    """Cross-product sign consistency over edges (zero crosses ignored —
    collinear vertices allowed)."""
    r = _open_ring(ring)
    if len(r) < 3:
        return False
    e = np.roll(r, -1, axis=0) - r
    cr = e[:, 0] * np.roll(e, -1, axis=0)[:, 1] - e[:, 1] * np.roll(e, -1, axis=0)[:, 0]
    nz = cr[np.abs(cr) > 0]
    return len(nz) == 0 or (nz > 0).all() or (nz < 0).all()


def clip_halfplane(ring: np.ndarray, a: float, b: float, c: float) -> np.ndarray:
    """Sutherland–Hodgman single-halfplane clip of an OPEN ring: keep the
    region a*x + b*y + c >= 0. Returns an open ring (possibly empty).
    Standard algorithm (Sutherland & Hodgman 1974, public)."""
    r = _open_ring(ring)
    n = len(r)
    if n == 0:
        return r
    f = a * r[:, 0] + b * r[:, 1] + c
    out: list[np.ndarray] = []
    for i in range(n):
        j = (i + 1) % n
        p, q, fp, fq = r[i], r[j], f[i], f[j]
        if fp >= 0:
            out.append(p)
            if fq < 0:
                out.append(p + (fp / (fp - fq)) * (q - p))
        elif fq >= 0:
            out.append(p + (fp / (fp - fq)) * (q - p))
    return np.array(out) if out else np.empty((0, 2))


def _ccw(ring: np.ndarray) -> np.ndarray:
    r = _open_ring(ring)
    return r if signed_area(r) >= 0 else r[::-1]


def _edge_halfplanes(clip_ring: np.ndarray):
    """CCW convex ring -> (a, b, c) halfplanes whose intersection is the
    polygon interior (left of each directed edge)."""
    r = _ccw(clip_ring)
    planes = []
    for i in range(len(r)):
        p, q = r[i], r[(i + 1) % len(r)]
        a, b = -(q[1] - p[1]), q[0] - p[0]
        planes.append((a, b, -(a * p[0] + b * p[1])))
    return planes


def convex_clip(subject_ring: np.ndarray, clip_ring: np.ndarray) -> np.ndarray:
    """Intersection of an arbitrary simple ring with a CONVEX ring: clip by
    each edge halfplane in turn. Returns an open ring (empty if disjoint)."""
    out = _open_ring(subject_ring)
    for a, b, c in _edge_halfplanes(clip_ring):
        out = clip_halfplane(out, a, b, c)
        if len(out) == 0:
            break
    return out


def convex_difference(subject_ring: np.ndarray, clip_ring: np.ndarray) -> list[np.ndarray]:
    """subject \\ clip for CONVEX clip: piece_i = subject clipped INSIDE the
    first i-1 edge halfplanes and OUTSIDE edge i (the standard convex-
    decomposition of a complement). Returns a list of open rings (the
    difference as a multipolygon; empty list when clip covers subject)."""
    pieces: list[np.ndarray] = []
    current = _open_ring(subject_ring)
    for a, b, c in _edge_halfplanes(clip_ring):
        outside = clip_halfplane(current, -a, -b, -c)
        if len(outside) >= 3:
            pieces.append(outside)
        current = clip_halfplane(current, a, b, c)
        if len(current) == 0:
            break
    return pieces


def _point_in_tri_closed(a, b, c, p) -> bool:
    """p inside-or-on CCW triangle abc."""
    c1 = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
    c2 = (c[0] - b[0]) * (p[1] - b[1]) - (c[1] - b[1]) * (p[0] - b[0])
    c3 = (a[0] - c[0]) * (p[1] - c[1]) - (a[1] - c[1]) * (p[0] - c[0])
    return c1 >= 0 and c2 >= 0 and c3 >= 0


def ear_clip(ring: np.ndarray) -> list[np.ndarray]:
    """Triangulate a SIMPLE polygon ring (no holes) by ear clipping
    (O(n^2); standard public algorithm, e.g. Meisters 1975 two-ears
    theorem). Returns CCW triangles covering the polygon exactly; zero-area
    (collinear) corners are dropped. The convex-decomposition primitive the
    concave set ops build on."""
    r = _ccw(ring)
    # drop consecutive duplicates
    keep = np.ones(len(r), dtype=bool)
    keep[1:] = (r[1:] != r[:-1]).any(axis=1)
    r = r[keep]
    idx = list(range(len(r)))
    tris: list[np.ndarray] = []
    guard = 0
    while len(idx) > 3 and guard <= 4 * len(r) * len(r):
        guard += 1
        n = len(idx)
        best_fallback = None
        clipped = False
        for k in range(n):
            i0, i1, i2 = idx[(k - 1) % n], idx[k], idx[(k + 1) % n]
            a, b, c = r[i0], r[i1], r[i2]
            cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            if cross == 0.0:  # collinear corner: remove, contributes no area
                idx.pop(k)
                clipped = True
                break
            if cross < 0.0:  # reflex
                continue
            if any(_point_in_tri_closed(a, b, c, r[j])
                   for j in idx if j not in (i0, i1, i2)):
                best_fallback = best_fallback or k
                continue
            tris.append(np.array([a, b, c]))
            idx.pop(k)
            clipped = True
            break
        if not clipped:
            # numerically stuck (near-degenerate input): clip the least-bad
            # convex corner so termination is guaranteed
            k = best_fallback if best_fallback is not None else 0
            i0, i1, i2 = idx[(k - 1) % len(idx)], idx[k], idx[(k + 1) % len(idx)]
            tris.append(np.array([r[i0], r[i1], r[i2]]))
            idx.pop(k)
    if len(idx) == 3:
        a, b, c = r[idx[0]], r[idx[1]], r[idx[2]]
        if (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]) > 0.0:
            tris.append(np.array([a, b, c]))
    return tris


def decompose_convex(ring: np.ndarray) -> list[np.ndarray]:
    """Simple ring -> list of convex open rings covering it exactly: the
    ring itself when convex, else its ear-clip triangles."""
    r = _open_ring(ring)
    if is_convex(r):
        return [_ccw(r)]
    return ear_clip(r)
