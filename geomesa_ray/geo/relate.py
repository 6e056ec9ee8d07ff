"""DE-9IM relate for points, lines and polygons (pure numpy).

Analog of the reference's ``st_relate`` / ``st_relateBool``
(``geomesa-spark/geomesa-spark-jts/src/main/scala/org/locationtech/geomesa/
spark/jts/udf/SpatialRelationFunctions.scala:62-83``, which delegates to JTS
``Geometry.relate``). The matrix is the standard row-major 9 characters
[II IB IE / BI BB BE / EI EB EE] with dims in {F, 0, 1, 2}.

Supported pairs: every combination of Point, MultiPoint, (Multi)LineString
and (Multi)Polygon, including CONCAVE polygons. A polygon is carried as
(boundary rings, convex cover): the cover is the ring itself when convex,
else its ear-clip triangles — whose vertices are all ORIGINAL input
vertices, so interior tests stay exact; the boundary keeps the original
rings, so cover seam edges never masquerade as boundary. Entries derive
from exact primitives — closed containment (sign-consistent cross
products), strict-interior separation (SAT with touching allowed),
pairwise edge-intersection dimension, even-odd ray parity — with no
constructive geometry. Line boundaries follow the JTS mod-2 rule (the two
global endpoints; EMPTY for a closed ring). Polygons with interior rings
(holes) are supported against EVERY operand kind: points classify by exact
even-odd parity over all rings; line/polygon operands probe the
hole-subtracted convex cover (``convex_difference`` pieces) for INTERIOR
membership only — the constructed seam vertices never participate in a
boundary test, which always reads the original ring edges. The poly x poly
exterior row adds a per-part interior-witness probe (the pure boundary
identity fails when one part exactly fills the other's hole).
"""

from __future__ import annotations

import numpy as np

from geomesa_ray.geo.poly import _axes, convex_intersect, points_in_convex

F = "F"


def _closed_contains(outer: np.ndarray, inner: np.ndarray) -> bool:
    """All of convex ``inner``'s vertices inside-or-on convex ``outer``."""
    k = len(inner)
    return bool(
        points_in_convex(np.repeat(outer[None], k, 0), inner[:, 0], inner[:, 1]).all()
    )


def _interiors_overlap(a: np.ndarray, b: np.ndarray) -> bool:
    """Open interiors of two convex polygons intersect: closed sets meet AND
    no (non-degenerate) axis separates them even non-strictly."""
    a3, b3 = a[None], b[None]
    if not convex_intersect(a3, b3)[0]:
        return False
    for axes in (_axes(a3), _axes(b3)):
        pa_ = np.einsum("nav,nkv->nak", axes, a3)
        pb_ = np.einsum("nav,nkv->nak", axes, b3)
        nz = (axes != 0).any(axis=2)
        sep = ((pa_.max(2) <= pb_.min(2)) | (pb_.max(2) <= pa_.min(2))) & nz
        if sep.any():
            return False
    return True


def _seg_dim(p0, p1, q0, q1) -> int:
    """Dimension of the intersection of two closed segments: -1/0/1."""
    d1 = p1 - p0
    d2 = q1 - q0
    c = d1[0] * d2[1] - d1[1] * d2[0]
    c_q0 = d1[0] * (q0[1] - p0[1]) - d1[1] * (q0[0] - p0[0])
    c_q1 = d1[0] * (q1[1] - p0[1]) - d1[1] * (q1[0] - p0[0])
    if c == 0 and c_q0 == 0 and c_q1 == 0:
        # collinear: overlap extent along the dominant axis of d1
        ax = 0 if abs(d1[0]) >= abs(d1[1]) else 1
        lo1, hi1 = sorted((p0[ax], p1[ax]))
        lo2, hi2 = sorted((q0[ax], q1[ax]))
        lo, hi = max(lo1, lo2), min(hi1, hi2)
        if lo > hi:
            return -1
        return 1 if hi > lo else 0
    # general position: both straddle tests (endpoint contact counts, dim 0)
    c_p0 = d2[0] * (p0[1] - q0[1]) - d2[1] * (p0[0] - q0[0])
    c_p1 = d2[0] * (p1[1] - q0[1]) - d2[1] * (p1[0] - q0[0])

    def straddle(x, y):
        return (x <= 0 <= y) or (y <= 0 <= x)

    return 0 if straddle(c_q0, c_q1) and straddle(c_p0, c_p1) else -1


def _boundary_dim(a: np.ndarray, b: np.ndarray) -> int:
    """max dim of intersection between the two boundary rings (-1/0/1)."""
    ea = np.stack([a, np.roll(a, -1, axis=0)], axis=1)
    eb = np.stack([b, np.roll(b, -1, axis=0)], axis=1)
    best = -1
    for p0, p1 in ea:
        for q0, q1 in eb:
            d = _seg_dim(p0, p1, q0, q1)
            if d > best:
                best = d
                if best == 1:
                    return 1
    return best


def _transpose(m: str) -> str:
    return "".join(m[j * 3 + i] for i in range(3) for j in range(3))


def _relate_point_point(pa, pb) -> str:
    return "0FFFFFFF2" if (pa == pb).all() else "FF0FFF0F2"


def _point_role_component(brings, x, y) -> str:
    """'i'/'b'/'e' of a point vs ONE polygon component given its ORIGINAL
    rings (shell first, then holes). Boundary first — exact closed-segment
    containment on every ring edge — then even-odd ray parity over ALL
    rings (a hole crossing flips parity, so hole interiors come back 'e').
    Works for arbitrary simple rings: concave and holed."""
    for r in brings:
        x1, y1 = r[:, 0], r[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        cr = (x2 - x1) * (y - y1) - (x - x1) * (y2 - y1)
        on = ((cr == 0)
              & (np.minimum(x1, x2) <= x) & (x <= np.maximum(x1, x2))
              & (np.minimum(y1, y2) <= y) & (y <= np.maximum(y1, y2)))
        if bool(on.any()):
            return "b"
    odd = False
    for r in brings:
        x1, y1 = r[:, 0], r[:, 1]
        x2, y2 = np.roll(x1, -1), np.roll(y1, -1)
        m = (y1 > y) != (y2 > y)  # half-open rule; on-edge already excluded
        cross = (x2[m] - x1[m]) * (y - y1[m]) - (x - x1[m]) * (y2[m] - y1[m])
        cnt = int(np.where(y2[m] > y1[m], cross > 0, cross < 0).sum())
        odd ^= cnt % 2 == 1
    return "i" if odd else "e"


def _point_role_comps(comps, x, y) -> str:
    """'i'/'b'/'e' vs a list of (boundary_rings, cover) components; a point
    interior to ANY component wins over boundary-of-another (OGC union
    semantics for valid interior-disjoint components)."""
    out = "e"
    for brings, _cov in comps:
        w = _point_role_component(brings, x, y)
        if w == "i":
            return "i"
        if w == "b":
            out = "b"
    return out


def _relate_point_poly(p, comps) -> str:
    where = _point_role_comps(comps, p[0], p[1])
    if where == "i":
        return "0FFFFF212"
    if where == "b":
        return "F0FFFF212"
    return "FF0FFF212"


def _dim_max(values) -> str:
    """Combine DE-9IM entry chars by max dimension (F < 0 < 1 < 2)."""
    order = {F: -1, "0": 0, "1": 1, "2": 2}
    best = F
    for v in values:
        if order[v] > order[best]:
            best = v
    return best


def _relate_poly_poly(comps_a, comps_b) -> str:
    """(Multi)Polygon x (Multi)Polygon DE-9IM. All-convex inputs keep the
    fully exact SAT/containment reduction over component pairs (the
    I/B rows combine as the max; the E row/column reduce to containment —
    a CONNECTED convex component lies in the closure of an
    interior-disjoint union iff it lies in ONE component). When either
    side has a concave component, the matrix is assembled from boundary
    probes instead: relate each side's boundary rings (as closed lines)
    against the other polygon, take II from pairwise cover-piece interior
    overlap (exact SAT over ear-clip triangles), and derive the E row/
    column from the topological identity
    int(A) ∩ ext(B) = ∅  ⟺  ∂A∩ext(B) = ∅  AND  ∂B∩int(A) = ∅
    (valid for OGC-valid polygons: any interior point of A outside B
    connects to ∂A through ext(B) or crosses ∂B inside A)."""

    def single(a, b) -> str:
        a_in_b = _closed_contains(b, a)
        b_in_a = _closed_contains(a, b)
        overlap = _interiors_overlap(a, b)
        bb = _boundary_dim(a, b)
        ii = "2" if overlap else F
        ib = "1" if overlap and not a_in_b else F
        ie = F if a_in_b else "2"
        bi = "1" if overlap and not b_in_a else F
        be = F if a_in_b else "1"
        ei = F if b_in_a else "2"
        eb = F if b_in_a else "1"
        return ii + ib + ie + bi + (str(bb) if bb >= 0 else F) + be + ei + eb + "2"

    def all_convex(comps):
        return all(len(br) == 1 and len(cov) == 1 for br, cov in comps)

    if all_convex(comps_a) and all_convex(comps_b):
        rings_a = [cov[0] for _, cov in comps_a]
        rings_b = [cov[0] for _, cov in comps_b]
        if len(rings_a) == 1 and len(rings_b) == 1:
            return single(rings_a[0], rings_b[0])
        ms = [single(a, b) for a in rings_a for b in rings_b]
        a_cov = all(any(_closed_contains(b, a) for b in rings_b) for a in rings_a)
        b_cov = all(any(_closed_contains(a, b) for a in rings_a) for b in rings_b)
        return (
            _dim_max(m[0] for m in ms)
            + _dim_max(m[1] for m in ms)
            + (F if a_cov else "2")
            + _dim_max(m[3] for m in ms)
            + _dim_max(m[4] for m in ms)
            + (F if a_cov else "1")
            + (F if b_cov else "2")
            + (F if b_cov else "1")
            + "2"
        )

    # concave path: boundary probes + exact cover-piece interior overlap
    cover_a = [p for _, cov in comps_a for p in cov]
    cover_b = [p for _, cov in comps_b for p in cov]
    chains_a = [np.vstack([r, r[:1]]) for br, _ in comps_a for r in br]
    chains_b = [np.vstack([r, r[:1]]) for br, _ in comps_b for r in br]
    lm_a = _relate_line_poly(chains_a, [], comps_b)  # ∂A vs B
    lm_b = _relate_line_poly(chains_b, [], comps_a)  # ∂B vs A
    ii = any(_interiors_overlap(a, b) for a in cover_a for b in cover_b)
    bb = _dim_max((lm_a[1], lm_b[1]))

    def ext_probe(comps_x, comps_other) -> bool:
        """Does some part of X have interior in the OTHER's exterior, given
        the boundary identities came back empty? Under those premises each
        part's interior never meets the other's boundary, so it lies
        entirely inside or entirely outside — ONE interior witness per
        part decides it. (The witness is needed at all because the
        boundary identity fails when a part fills a HOLE with its ring on
        the other's boundary — e.g. B equal to A's hole.)"""
        for _, cov in comps_x:
            if not cov:
                continue
            w = cov[0].mean(axis=0)  # strictly interior to the convex piece
            if _point_role_comps(comps_other, w[0], w[1]) == "e":
                return True
        return False

    ie = ("2" if not (lm_a[2] == F and lm_b[0] == F)
          or ext_probe(comps_a, comps_b) else F)
    ei = ("2" if not (lm_b[2] == F and lm_a[0] == F)
          or ext_probe(comps_b, comps_a) else F)
    return (
        ("2" if ii else F)  # II: open overlap of any cover-piece pair
        + lm_b[0]           # IB = ∂B ∩ int(A)
        + ie
        + lm_a[0]           # BI = ∂A ∩ int(B)
        + bb
        + lm_a[2]           # BE = ∂A ∩ ext(B)
        + ei
        + lm_b[2]           # EB = ∂B ∩ ext(A)
        + "2"
    )


def _clip_param(p0: np.ndarray, d: np.ndarray, poly: np.ndarray):
    """Liang-Barsky: parameter interval [t0, t1] of segment p0 + t*d inside
    the CLOSED convex polygon (None when empty). Polygon must be CCW."""
    e = np.roll(poly, -1, axis=0) - poly
    # inward normal of CCW edge (ex, ey) is (-ey, ex)
    nx, ny = -e[:, 1], e[:, 0]
    num = nx * (p0[0] - poly[:, 0]) + ny * (p0[1] - poly[:, 1])
    den = nx * d[0] + ny * d[1]
    t0, t1 = 0.0, 1.0
    for k in range(len(poly)):
        if den[k] == 0.0:
            if num[k] < 0.0:
                return None  # parallel and outside this half-plane
        else:
            t = -num[k] / den[k]
            if den[k] > 0.0:  # entering
                t0 = max(t0, t)
            else:  # leaving
                t1 = min(t1, t)
            if t0 > t1:
                return None
    return (t0, t1)


def _line_boundary(line: np.ndarray) -> list[np.ndarray]:
    """JTS mod-2 boundary rule for a single LineString: the two global
    endpoints, or EMPTY when the line is closed (ring)."""
    if len(line) >= 2 and (line[0] == line[-1]).all():
        return []
    return [line[0], line[-1]]


def _mls_boundary(chains: list[np.ndarray]) -> list[np.ndarray]:
    """JTS Mod2BoundaryNodeRule for a (Multi)LineString: endpoints whose
    valence across components is ODD (two chains meeting end-to-end fuse —
    the shared point is interior; closed components contribute nothing)."""
    counts: dict[tuple, int] = {}
    for ch in chains:
        if len(ch) >= 2 and (ch[0] == ch[-1]).all():
            continue
        for e in (ch[0], ch[-1]):
            key = (float(e[0]), float(e[1]))
            counts[key] = counts.get(key, 0) + 1
    return [np.array(k) for k, c in counts.items() if c % 2 == 1]


def _in_bnd(p, bnd) -> bool:
    return any((p == e).all() for e in bnd)


def _relate_line_poly(chains: list[np.ndarray], bnd: list[np.ndarray],
                      comps) -> str:
    """(Multi)LineString x (Multi)Polygon DE-9IM over (boundary rings,
    convex cover) components — concave components enter as their ear-clip
    triangle covers, so clips stay exact while seam edges never read as
    boundary.

    Each segment Liang-Barsky-clips against each closed cover piece; a
    clipped piece's collinear overlap with the TRUE boundary edges is
    interval-unioned — full coverage is interior∩boundary (dim 1), partial
    coverage contributes BOTH dim-1 boundary and interior, and the
    uncovered remainder (inside a closed piece, off the boundary) is
    int∩int. Clip touch points that are not boundary nodes of A contribute
    dim-0 interior∩boundary, classified against the WHOLE polygon (a point
    on one piece's edge may be a seam, interior overall). The
    line∩exterior entry uses the per-segment UNION of clip intervals —
    per-piece outside flags are wrong for multi-piece covers. ``bnd`` is
    the mod-2 boundary node set."""
    pieces = [p for _, cov in comps for p in cov]
    bsegs = [(cl[s], cl[s + 1])
             for br, _ in comps for r in br
             for cl in (np.vstack([r, r[:1]]),) for s in range(len(r))]
    eps = 1e-12

    def role_b(pt) -> str:
        return _point_role_comps(comps, pt[0], pt[1])

    def boundary_cover(pa_, pb_):
        """(full, any): interval-union of the piece's collinear overlaps
        with the true boundary edges."""
        ivs = []
        for q0, q1 in bsegs:
            iv = _seg_params_collinear(pa_, pb_, q0, q1)
            if iv is not None:
                ivs.append(iv)
        if not ivs:
            return False, False
        ivs.sort()
        reach = 0.0
        for lo, hi in ivs:
            if lo > reach + eps:
                return False, True
            reach = max(reach, hi)
        return reach >= 1.0 - eps, True

    ii = ie = False
    ib_dim = -1
    for line in chains:
        for s in range(len(line) - 1):
            p0, p1 = line[s], line[s + 1]
            d = p1 - p0
            ivs = []
            for poly in pieces:
                res = _clip_param(p0, d, poly)
                if res is None:
                    continue
                t0, t1 = res
                ivs.append((t0, t1))
                if t1 - t0 > eps:
                    full, part = boundary_cover(p0 + t0 * d, p0 + t1 * d)
                    if part:
                        ib_dim = 1  # runs along true boundary (≥ in part)
                    if not full:
                        ii = True   # off-boundary remainder inside a piece
                else:
                    tp = p0 + t0 * d
                    if not _in_bnd(tp, bnd) and role_b(tp) == "b":
                        ib_dim = max(ib_dim, 0)
                for t in (t0, t1):
                    pt = p0 + t * d
                    if not _in_bnd(pt, bnd) and role_b(pt) == "b":
                        ib_dim = max(ib_dim, 0)
            # exterior coverage: union of the clip intervals over pieces
            ivs.sort()
            reach = 0.0
            for lo, hi in ivs:
                if lo > reach + eps:
                    break
                reach = max(reach, hi)
            if reach < 1.0 - eps:
                ie = True
    ib = ib_dim >= 0

    bi = bb = be = False
    for pt in bnd:
        w = role_b(pt)
        bi |= w == "i"
        bb |= w == "b"
        be |= w == "e"

    return (
        ("1" if ii else F)
        + (str(ib_dim) if ib else F)
        + ("1" if ie else F)
        + ("0" if bi else F)
        + ("0" if bb else F)
        + ("0" if be else F)
        + "21"  # polygon interior/boundary always extend beyond a line
        + "2"
    )


def _pt_on_seg(p, q0, q1) -> bool:
    """Closed-segment containment (exact for float-representable inputs)."""
    d = q1 - q0
    cr = d[0] * (p[1] - q0[1]) - d[1] * (p[0] - q0[0])
    if cr != 0.0:
        return False
    lo0, hi0 = (q0[0], q1[0]) if q0[0] <= q1[0] else (q1[0], q0[0])
    lo1, hi1 = (q0[1], q1[1]) if q0[1] <= q1[1] else (q1[1], q0[1])
    return lo0 <= p[0] <= hi0 and lo1 <= p[1] <= hi1


def _pt_on_line(p, chains) -> bool:
    return any(_pt_on_seg(p, ch[s], ch[s + 1])
               for ch in chains for s in range(len(ch) - 1))


def _relate_point_line(p: np.ndarray, chains, bnd) -> str:
    """Point x (Multi)LineString DE-9IM (JTS mod-2 boundary rule)."""
    on_bnd = any((p == e).all() for e in bnd)
    on_line = _pt_on_line(p, chains)
    eb = "0" if bnd else F  # line endpoints (if any) are beyond the point
    if on_bnd:
        # the OTHER endpoint still sits in the point's exterior unless both
        # endpoints coincide with p (degenerate)
        other = [e for e in bnd if not (p == e).all()]
        return "F0FFFF1" + ("0" if other else F) + "2"
    if on_line:
        return "0FFFFF1" + eb + "2"
    return "FF0FFF1" + eb + "2"


def _seg_params_collinear(p0, p1, q0, q1):
    """If segments are collinear with positive-length overlap, return the
    (t_lo, t_hi) parameter interval of the overlap on segment p (else None)."""
    d1 = p1 - p0
    d2 = q1 - q0
    c = d1[0] * d2[1] - d1[1] * d2[0]
    c_q0 = d1[0] * (q0[1] - p0[1]) - d1[1] * (q0[0] - p0[0])
    if c != 0.0 or c_q0 != 0.0:
        return None
    den = float(d1[0] * d1[0] + d1[1] * d1[1])
    if den == 0.0:
        return None
    t_a = float((q0 - p0) @ d1) / den
    t_b = float((q1 - p0) @ d1) / den
    lo, hi = (t_a, t_b) if t_a <= t_b else (t_b, t_a)
    lo, hi = max(lo, 0.0), min(hi, 1.0)
    return (lo, hi) if hi > lo else None


def _covered_by(chains_a, chains_b) -> bool:
    """Every point of (multi)line ``a`` lies on ``b``: each a-segment's
    [0,1] parameter range is covered by the union of its collinear overlaps
    with b's segments (isolated crossings never cover dim-1)."""
    b_segs = [(ch[t], ch[t + 1]) for ch in chains_b for t in range(len(ch) - 1)]
    for a in chains_a:
        for s in range(len(a) - 1):
            p0, p1 = a[s], a[s + 1]
            if (p0 == p1).all():
                continue
            ivs = []
            for q0, q1 in b_segs:
                iv = _seg_params_collinear(p0, p1, q0, q1)
                if iv is not None:
                    ivs.append(iv)
            ivs.sort()
            reach = 0.0
            for lo, hi in ivs:
                if lo > reach + 1e-12:
                    return False
                reach = max(reach, hi)
            if reach < 1.0 - 1e-12:
                return False
    return True


def _proper_cross(p0, p1, q0, q1) -> bool:
    """Both segments STRICTLY straddle each other: the intersection point is
    interior to both segments (hence interior to both lines)."""
    d1 = p1 - p0
    d2 = q1 - q0
    c_q0 = d1[0] * (q0[1] - p0[1]) - d1[1] * (q0[0] - p0[0])
    c_q1 = d1[0] * (q1[1] - p0[1]) - d1[1] * (q1[0] - p0[0])
    c_p0 = d2[0] * (p0[1] - q0[1]) - d2[1] * (p0[0] - q0[0])
    c_p1 = d2[0] * (p1[1] - q0[1]) - d2[1] * (p1[0] - q0[0])
    return ((c_q0 > 0) != (c_q1 > 0) and c_q0 != 0 and c_q1 != 0
            and (c_p0 > 0) != (c_p1 > 0) and c_p0 != 0 and c_p1 != 0)


def _relate_line_line(chains_a, bnd_a, chains_b, bnd_b) -> str:
    """(Multi)LineString x (Multi)LineString DE-9IM from exact primitives.

    Every intersection point of two polylines is a proper interior-interior
    crossing, a vertex-of-one incidence on the other, or part of a collinear
    overlap (whose endpoints are vertices) — so classifying (i) collinear
    overlaps, (ii) proper crossings and (iii) vertex incidences by each
    point's interior/boundary role on both lines enumerates the whole
    matrix. Coverage (the *E entries) reduces to per-segment interval
    union over collinear overlaps (the interval-algebra view). Boundary
    node sets come from the mod-2 valence rule, so multi-component inputs
    whose chains fuse end-to-end behave like the merged line."""

    def role(p, chains, bnd):
        """'i' interior / 'b' boundary / 'e' not on the line."""
        if any((p == e).all() for e in bnd):
            return "b"
        return "i" if _pt_on_line(p, chains) else "e"

    a_segs = [(ch[s], ch[s + 1]) for ch in chains_a for s in range(len(ch) - 1)]
    b_segs = [(ch[t], ch[t + 1]) for ch in chains_b for t in range(len(ch) - 1)]
    ii = ib = bi = bb = False
    ii_dim1 = False
    for p0, p1 in a_segs:
        for q0, q1 in b_segs:
            if _seg_params_collinear(p0, p1, q0, q1) is not None:
                ii_dim1 = True  # a dim-1 overlap minus finite boundary pts
            elif _proper_cross(p0, p1, q0, q1):
                ii = True
    # vertex incidences: any non-crossing contact involves a vertex
    for va_ in (v for ch in chains_a for v in ch):
        rb = role(va_, chains_b, bnd_b)
        if rb == "e":
            continue
        ra = role(va_, chains_a, bnd_a)
        ii |= ra == "i" and rb == "i"
        ib |= ra == "i" and rb == "b"
        bi |= ra == "b" and rb == "i"
        bb |= ra == "b" and rb == "b"
    for vb_ in (v for ch in chains_b for v in ch):
        ra = role(vb_, chains_a, bnd_a)
        if ra == "e":
            continue
        rb = role(vb_, chains_b, bnd_b)
        ii |= ra == "i" and rb == "i"
        ib |= ra == "i" and rb == "b"
        bi |= ra == "b" and rb == "i"
        bb |= ra == "b" and rb == "b"

    a_cov = _covered_by(chains_a, chains_b)
    b_cov = _covered_by(chains_b, chains_a)
    be = any(role(e, chains_b, bnd_b) == "e" for e in bnd_a)
    eb = any(role(e, chains_a, bnd_a) == "e" for e in bnd_b)
    return (
        ("1" if ii_dim1 else "0" if ii else F)
        + ("0" if ib else F)
        + (F if a_cov else "1")
        + ("0" if bi else F)
        + ("0" if bb else F)
        + ("0" if be else F)
        + (F if b_cov else "1")
        + ("0" if eb else F)
        + "2"
    )


def _relate_mpoint_point(pts: np.ndarray, p: np.ndarray) -> str:
    hit = bool((pts == p).all(axis=1).any())
    extra = bool((~(pts == p).all(axis=1)).any())
    if hit:
        return "0F" + ("0" if extra else F) + "FFFFF2"
    return "FF0FFF0F2"


def _relate_mpoint_line(pts: np.ndarray, chains, bnd) -> str:
    on_b = np.array([any((p == e).all() for e in bnd) for p in pts], dtype=bool)
    on_l = np.array([_pt_on_line(p, chains) for p in pts], dtype=bool)
    covered = {tuple(p) for p in pts}
    eb = "0" if any(tuple(e) not in covered for e in bnd) else F
    return (("0" if bool((on_l & ~on_b).any()) else F)
            + ("0" if bool(on_b.any()) else F)
            + ("0" if bool((~on_l).any()) else F)
            + "FFF" + "1" + eb + "2")


def _relate_mpoint_poly(pts: np.ndarray, comps) -> str:
    where = [_point_role_comps(comps, p[0], p[1]) for p in pts]
    ii = "0" if "i" in where else F
    ib = "0" if "b" in where else F
    ie = "0" if "e" in where else F
    return ii + ib + ie + "FFF" + "212"


def relate(ga: dict, gb: dict) -> str:
    """DE-9IM matrix for two parse_wkt geometries: Point / MultiPoint /
    (Multi)LineString / (Multi)Polygon pair combinations — concave shells
    and interior rings (holes) included for every operand kind."""

    def classify(g):
        if g["type"] == "Point":
            return "pt", np.asarray(g["coords"], dtype=np.float64)
        if g["type"] == "MultiPoint":
            pts = np.asarray(g["coords"], dtype=np.float64).reshape(-1, 2)
            return "mpt", np.unique(pts, axis=0)
        if g["type"] == "LineString":
            return "line", [np.asarray(g["coords"], dtype=np.float64)]
        if g["type"] == "MultiLineString":
            return "line", [np.asarray(c, dtype=np.float64) for c in g["coords"]]
        if g["type"] in ("Polygon", "MultiPolygon"):
            from geomesa_ray.geo.poly import convex_difference, decompose_convex

            raw = [g["coords"]] if g["type"] == "Polygon" else g["coords"]
            comps = []
            for part in raw:
                brings = []
                for raw_ring in part:
                    ring = np.asarray(raw_ring, dtype=np.float64)
                    if (ring[0] == ring[-1]).all():
                        ring = ring[:-1]
                    brings.append(ring)
                # concave shells ear-clip to triangles over ORIGINAL
                # vertices — exact; convex shells are their own cover
                cover = decompose_convex(brings[0])
                # holes subtract convexly from the cover (the same
                # shell-minus-holes covering the set ops use). Seam/
                # constructed vertices only partition the INTERIOR — every
                # boundary classification below reads the ORIGINAL ring
                # edges (bsegs / _point_role_comps), so exactness of the
                # boundary tests is unaffected.
                for hole in brings[1:]:
                    for th in decompose_convex(hole):
                        cover = [q for p in cover
                                 for q in convex_difference(p, th)
                                 if len(q) >= 3]
                    if not cover:
                        break
                comps.append((brings, cover))
            return "poly", comps
        raise ValueError(
            "st_relate supports Point/MultiPoint/(Multi)LineString/"
            f"(Multi)Polygon, got {g['type']}")

    ka, va = classify(ga)
    kb, vb = classify(gb)
    bnd_a = _mls_boundary(va) if ka == "line" else None
    bnd_b = _mls_boundary(vb) if kb == "line" else None
    if ka == "mpt" or kb == "mpt":
        if ka == "mpt" and kb == "pt":
            return _relate_mpoint_point(va, vb)
        if ka == "pt" and kb == "mpt":
            return _transpose(_relate_mpoint_point(vb, va))
        if ka == "mpt" and kb == "mpt":
            a_in = np.array([(vb == p).all(axis=1).any() for p in va])
            b_in = np.array([(va == p).all(axis=1).any() for p in vb])
            return (("0" if a_in.any() else F) + F
                    + ("0" if (~a_in).any() else F) + "FFF"
                    + ("0" if (~b_in).any() else F) + F + "2")
        if ka == "mpt" and kb == "line":
            return _relate_mpoint_line(va, vb, bnd_b)
        if ka == "line" and kb == "mpt":
            return _transpose(_relate_mpoint_line(vb, va, bnd_a))
        if ka == "mpt" and kb == "poly":
            return _relate_mpoint_poly(va, vb)
        return _transpose(_relate_mpoint_poly(vb, va))
    if ka == "pt" and kb == "pt":
        return _relate_point_point(va, vb)
    if ka == "pt" and kb == "poly":
        return _relate_point_poly(va, vb)
    if ka == "poly" and kb == "pt":
        return _transpose(_relate_point_poly(vb, va))
    if ka == "pt" and kb == "line":
        return _relate_point_line(va, vb, bnd_b)
    if ka == "line" and kb == "pt":
        return _transpose(_relate_point_line(vb, va, bnd_a))
    if ka == "line" and kb == "line":
        return _relate_line_line(va, bnd_a, vb, bnd_b)
    if ka == "line" and kb == "poly":
        return _relate_line_poly(va, bnd_a, vb)
    if ka == "poly" and kb == "line":
        return _transpose(_relate_line_poly(vb, bnd_b, va))
    if ka == "poly" and kb == "poly":
        return _relate_poly_poly(va, vb)
    raise ValueError(f"st_relate does not support {ka} x {kb}")


def matches(matrix: str, pattern: str) -> bool:
    """JTS IntersectionMatrix.matches: T=any dim>=0, F=empty, *=any, 0/1/2
    exact."""
    if len(pattern) != 9:
        raise ValueError("DE-9IM pattern must be 9 characters")
    for m, p in zip(matrix, pattern.upper()):
        if p == "*":
            continue
        if p == "T":
            if m == "F":
                return False
        elif p != m:
            return False
    return True
