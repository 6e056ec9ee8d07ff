"""Pure-numpy S2 cell ids (point encoding, hierarchy ops, decoding).

The reference indexes points with Google S2 cells via ``S2SFC``
(reference geomesa-z3/.../curve/S2SFC.scala:23-58, delegating to the S2
library). No S2 binding exists in this environment, so this module
reimplements the public S2 cell-id algorithm (s2geometry.io docs / the
open-source s2geometry library's documented scheme) vectorized in numpy:

  lat/lng -> unit XYZ -> cube face + (u,v) tangent coords -> quadratic
  (s,t) -> 30-bit (i,j) -> Hilbert position via 4-bit lookup tables ->
  64-bit cell id  ``(face << 60 | hilbert_pos) * 2 + 1``.

Levels 0..30; a level-l id has the trailing-bit pattern 1000...0 with
2*(30-l) zeros. Hierarchy is prefix-based exactly like the reference's use
of S2CellId.parent/range_min/range_max.
"""

from __future__ import annotations

import numpy as np

MAX_LEVEL = 30
_LOOKUP_BITS = 4
_SWAP_MASK = 0x01
_INVERT_MASK = 0x02

# Hilbert sub-cell orderings (public constants of the S2/Hilbert scheme)
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],  # canonical
        [0, 2, 3, 1],  # axes swapped
        [3, 2, 0, 1],  # bits inverted
        [3, 1, 0, 2],  # swapped & inverted
    ],
    dtype=np.int64,
)
_POS_TO_ORIENTATION = np.array([_SWAP_MASK, 0, 0, _INVERT_MASK | _SWAP_MASK], dtype=np.int64)


def _build_lookups():
    size = 1 << (2 * _LOOKUP_BITS + 2)
    lookup_pos = np.zeros(size, dtype=np.int64)
    lookup_ij = np.zeros(size, dtype=np.int64)

    def init_cell(level, i, j, orig_orientation, pos, orientation):
        if level == _LOOKUP_BITS:
            ij = (i << _LOOKUP_BITS) + j
            lookup_pos[(ij << 2) + orig_orientation] = (pos << 2) + orientation
            lookup_ij[(pos << 2) + orig_orientation] = (ij << 2) + orientation
            return
        level += 1
        i <<= 1
        j <<= 1
        pos <<= 2
        r = _POS_TO_IJ[orientation]
        for index in range(4):
            init_cell(
                level,
                i + (int(r[index]) >> 1),
                j + (int(r[index]) & 1),
                orig_orientation,
                pos + index,
                orientation ^ int(_POS_TO_ORIENTATION[index]),
            )

    for orientation in range(4):
        init_cell(0, 0, 0, orientation, 0, orientation)
    return lookup_pos, lookup_ij


_LOOKUP_POS, _LOOKUP_IJ = _build_lookups()


def _xyz_from_latlng(lat_deg, lng_deg):
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    lng = np.radians(np.asarray(lng_deg, dtype=np.float64))
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lng), cos_lat * np.sin(lng), np.sin(lat)


def _face_uv_from_xyz(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    # negative major axis -> face + 3
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face).astype(np.int64)

    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [y / x, -x / y, -x / z, z / x, z / y],
            default=-y / z,  # face 5
        )
        v = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4],
            [z / x, z / y, -y / z, y / x, -x / y],
            default=-x / z,  # face 5
        )
    return face, u, v


def _st_from_uv(u):
    # S2's default quadratic projection (errstate: np.where evaluates both
    # branches, so the inactive branch may sqrt a negative — discarded)
    with np.errstate(invalid="ignore"):
        return np.where(u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u))


def _uv_from_st(s):
    return np.where(
        s >= 0.5, (1.0 / 3.0) * (4.0 * s * s - 1.0), (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))
    )


def _ij_from_st(s):
    return np.clip((np.floor((1 << MAX_LEVEL) * s)).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)


class S2CellId:
    """Vectorized S2 cell-id operations (static namespace)."""

    # -------------------------------------------------------------- encoding
    @staticmethod
    def from_latlng(lat_deg, lng_deg, level: int = MAX_LEVEL) -> np.ndarray:
        """lat/lng arrays -> int64 S2 cell ids at `level` (leaf then parent)."""
        x, y, z = _xyz_from_latlng(lat_deg, lng_deg)
        face, u, v = _face_uv_from_xyz(x, y, z)
        i = _ij_from_st(_st_from_uv(u))
        j = _ij_from_st(_st_from_uv(v))
        leaf = S2CellId.from_face_ij(face, i, j)
        if level >= MAX_LEVEL:
            return leaf
        return S2CellId.parent(leaf, level)

    @staticmethod
    def from_face_ij(face, i, j) -> np.ndarray:
        face = np.asarray(face, dtype=np.int64)
        i = np.asarray(i, dtype=np.int64)
        j = np.asarray(j, dtype=np.int64)
        n = face.astype(np.uint64) << np.uint64(60)
        bits = (face & _SWAP_MASK).astype(np.int64)
        mask = (1 << _LOOKUP_BITS) - 1
        for k in range(7, -1, -1):
            bits += ((i >> (k * _LOOKUP_BITS)) & mask) << (_LOOKUP_BITS + 2)
            bits += ((j >> (k * _LOOKUP_BITS)) & mask) << 2
            bits = _LOOKUP_POS[bits]
            n |= (bits >> 2).astype(np.uint64) << np.uint64(k * 2 * _LOOKUP_BITS)
            bits &= _SWAP_MASK | _INVERT_MASK
        return (n * np.uint64(2) + np.uint64(1)).astype(np.int64)

    # -------------------------------------------------------------- decoding
    @staticmethod
    def to_face_ij(cell_id) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """leaf-or-any-level id -> (face, i, j) of its min leaf corner-ish
        position (matches S2CellId::ToFaceIJOrientation for leaf cells)."""
        cid = np.asarray(cell_id).astype(np.uint64)
        face = (cid >> np.uint64(61)).astype(np.int64)
        bits = (face & _SWAP_MASK).astype(np.int64)
        i = np.zeros(cid.shape, dtype=np.int64)
        j = np.zeros(cid.shape, dtype=np.int64)
        for k in range(7, -1, -1):
            nbits = _LOOKUP_BITS if k != 7 else (MAX_LEVEL - 7 * _LOOKUP_BITS)
            pos_bits = ((cid >> np.uint64(k * 2 * _LOOKUP_BITS + 1)) & np.uint64((1 << (2 * nbits)) - 1)).astype(np.int64)
            bits += pos_bits << 2
            bits = _LOOKUP_IJ[bits]
            i += (bits >> (_LOOKUP_BITS + 2)) << (k * _LOOKUP_BITS)
            j += ((bits >> 2) & ((1 << _LOOKUP_BITS) - 1)) << (k * _LOOKUP_BITS)
            bits &= _SWAP_MASK | _INVERT_MASK
        return face, i, j

    @staticmethod
    def to_latlng(cell_id) -> tuple[np.ndarray, np.ndarray]:
        """cell id -> (lat, lng) of the cell center (degrees)."""
        cid = np.asarray(cell_id).astype(np.int64)
        face, i, j = S2CellId.to_face_ij(cid)
        # center in half-leaf (si/ti) units, the s2geometry GetCenterSiTi
        # rule: si = 2*i + delta with delta 1 for leaves, else 2 or 0 by the
        # parity of (i ^ (id >> 2))
        is_leaf = (cid & 1) == 1
        parity = ((i ^ (cid >> 2)) & 1) == 1
        delta = np.where(is_leaf, 1, np.where(parity, 2, 0)).astype(np.int64)
        si = 2 * i + delta
        ti = 2 * j + delta
        s = si.astype(np.float64) / (1 << (MAX_LEVEL + 1))
        t = ti.astype(np.float64) / (1 << (MAX_LEVEL + 1))
        u = _uv_from_st(s)
        v = _uv_from_st(t)
        # face uv -> xyz (inverse of _face_uv_from_xyz, s2 FaceUVtoXYZ)
        ones = np.ones_like(u)
        x = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [ones, -u, -u, -ones, v, v],
        )
        y = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [u, ones, -v, -v, -ones, u],
        )
        z = np.select(
            [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
            [v, v, ones, -u, -u, -ones],
        )
        norm = np.sqrt(x * x + y * y + z * z)
        lat = np.degrees(np.arcsin(z / norm))
        lng = np.degrees(np.arctan2(y, x))
        return lat, lng

    # ------------------------------------------------------------- hierarchy
    @staticmethod
    def level(cell_id) -> np.ndarray:
        cid = np.asarray(cell_id).astype(np.int64)
        lsb = (cid & -cid).astype(np.uint64)
        # lsb = 2^(2*(30-level)+... ) for valid ids: level = 30 - (tz >> 1)
        tz = np.zeros(cid.shape, dtype=np.int64)
        v = lsb.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask_ = (v & np.uint64((1 << shift) - 1)) == 0
            both = mask_ & (v != 0)
            tz = np.where(both, tz + shift, tz)
            v = np.where(both, v >> np.uint64(shift), v)
        return MAX_LEVEL - (tz >> 1)

    @staticmethod
    def parent(cell_id, level: int) -> np.ndarray:
        cid = np.asarray(cell_id).astype(np.uint64)
        new_lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
        return ((cid & (~(new_lsb - np.uint64(1)))) | new_lsb).astype(np.int64)

    @staticmethod
    def range_min(cell_id) -> np.ndarray:
        cid = np.asarray(cell_id).astype(np.int64)
        lsb = cid & -cid
        return cid - (lsb - 1)

    @staticmethod
    def range_max(cell_id) -> np.ndarray:
        cid = np.asarray(cell_id).astype(np.int64)
        lsb = cid & -cid
        return cid + (lsb - 1)

    @staticmethod
    def contains(parent_id, child_id) -> np.ndarray:
        return (S2CellId.range_min(parent_id) <= np.asarray(child_id)) & (
            np.asarray(child_id) <= S2CellId.range_max(parent_id)
        )
