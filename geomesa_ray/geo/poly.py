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
