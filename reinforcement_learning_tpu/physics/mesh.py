"""Triangle-mesh arena collision: .cmf files, baked lookup grid, queries.

The reference collides cars/balls against 16 triangle meshes loaded from
``.cmf`` files into ``btBvhTriangleMeshShape``s (reference:
CollisionMeshFile/CollisionMeshFile.{h,cpp}, RocketSim.cpp:102-212) and
skips suspension raycasts using a precomputed occupancy grid (reference:
Sim/SuspensionCollisionGrid/). A BVH walk is pointer-chasing — hostile to
TPU. Here the one-time host-side bake replaces both structures with a
single **uniform cell grid of padded triangle-index lists**: every query
(sphere contact, short raycast, box contact) gathers one cell's fixed-size
candidate list and evaluates all candidates branch-free, so lookups are
dense gathers + vectorized math under jit.

The actual game meshes are proprietary assets that ship with neither the
reference nor this repo (the reference loads them from a user-supplied
``collision_meshes/`` directory and verifies hashes, RocketSim.cpp:19-43).
This module therefore provides:

  * ``read_cmf``/``write_cmf``: the exact binary format (int32 tri count,
    int32 vert count, tris as 3x int32, verts as 3x float32 —
    CollisionMeshFile.cpp:11-61) plus ``cmf_hash`` replicating
    ``UpdateHash`` (CollisionMeshFile.cpp:75-99) so real assets can be
    verified and loaded when present;
  * ``build_soccar_mesh``: a procedural standard soccar arena — octagonal
    plan (45-degree corner walls at |x|+|y|=8064), curved floor->wall and
    wall->ceiling transition ramps, goal openings and goal boxes — used as
    the default asset;
  * ``MeshGrid``: the baked device-resident structure + jit-safe queries
    mirroring arena_geom's signatures.

Queries are exact triangle tests (Ericson closest-point, Moller-Trumbore),
not approximations; the *geometry* is the approximation when the procedural
mesh stands in for the game asset.
"""

from __future__ import annotations

import dataclasses
import struct as _struct

import jax
import jax.numpy as jnp
import numpy as np

from reinforcement_learning_tpu import constants as C

# ---------------------------------------------------------------------------
# .cmf file I/O (reference: CollisionMeshFile.cpp:11-73)
# ---------------------------------------------------------------------------

_MAX_VERT_OR_TRI_COUNT = 1000 * 1000


def read_cmf(path: str) -> tuple[np.ndarray, np.ndarray]:
    """Read a ``.cmf`` collision mesh. Returns (verts (V,3) f32,
    tris (T,3) i32)."""
    with open(path, "rb") as f:
        data = f.read()
    num_tris, num_verts = _struct.unpack_from("<ii", data, 0)
    if (min(num_tris, num_verts) <= 0
            or max(num_tris, num_verts) > _MAX_VERT_OR_TRI_COUNT):
        raise ValueError(f"bad triangle/vertex count [{num_tris}, "
                         f"{num_verts}] in {path}")
    off = 8
    tris = np.frombuffer(data, "<i4", num_tris * 3, off).reshape(-1, 3)
    off += num_tris * 12
    verts = np.frombuffer(data, "<f4", num_verts * 3, off).reshape(-1, 3)
    if tris.min() < 0 or tris.max() >= num_verts:
        raise ValueError(f"bad triangle vertex index in {path}")
    return np.array(verts), np.array(tris)


def write_cmf(path: str, verts: np.ndarray, tris: np.ndarray) -> None:
    verts = np.asarray(verts, "<f4")
    tris = np.asarray(tris, "<i4")
    with open(path, "wb") as f:
        f.write(_struct.pack("<ii", len(tris), len(verts)))
        f.write(tris.tobytes())
        f.write(verts.tobytes())


def cmf_hash(verts: np.ndarray, tris: np.ndarray) -> int:
    """Replicates CollisionMeshFile::UpdateHash (CollisionMeshFile.cpp:75-99).

    The reference converts each float coordinate to uint32 by C cast
    (truncation; negatives wrap through int64 as MSVC x64 does)."""
    verts = np.asarray(verts, np.float32)
    tris = np.asarray(tris, np.int64)
    h = np.uint32(len(verts) + len(tris) * len(verts))
    mueller = np.uint32(0x45D9F3B)
    shift = np.uint32(0x9E3779B9)
    # coords of tri vertices in reference iteration order: tri, corner, xyz
    coords = verts[tris.reshape(-1)].reshape(-1)            # (T*3*3,)
    vals = (np.trunc(coords.astype(np.float64)).astype(np.int64)
            .astype(np.uint32))
    with np.errstate(over="ignore"):
        for _ in range(2):
            vals = ((vals >> np.uint32(16)) ^ vals) * mueller
        vals = (vals >> np.uint32(16)) ^ vals
        for v in vals:
            h = h ^ np.uint32(
                (int(v) + int(shift) + ((int(h) << 6) & 0xFFFFFFFF)
                 + (int(h) >> 2)) & 0xFFFFFFFF)
    return int(h)


# ---------------------------------------------------------------------------
# Procedural soccar arena mesh
# ---------------------------------------------------------------------------

FLOOR_FILLET_RADIUS = 152.0    # floor -> wall transition ramp
CEILING_FILLET_RADIUS = 256.0  # wall -> ceiling transition ramp


def _octagon_planes() -> np.ndarray:
    """The 8 outward wall planes of the soccar plan, as (nx, ny, d) with the
    wall surface at n.p = d, n pointing out of the arena."""
    s = 1.0 / np.sqrt(2.0)
    return np.array([
        [1, 0, C.ARENA_EXTENT_X],
        [s, s, C.ARENA_CORNER_INTERCEPT * s],
        [0, 1, C.ARENA_EXTENT_Y],
        [-s, s, C.ARENA_CORNER_INTERCEPT * s],
        [-1, 0, C.ARENA_EXTENT_X],
        [-s, -s, C.ARENA_CORNER_INTERCEPT * s],
        [0, -1, C.ARENA_EXTENT_Y],
        [s, -s, C.ARENA_CORNER_INTERCEPT * s],
    ], np.float64)


def _fillet_inset(z: np.ndarray, r_floor: float, r_ceil: float,
                  height: float) -> np.ndarray:
    """Inward offset of a wall at height ``z`` due to the floor/ceiling
    quarter-circle fillets (0 on the straight wall section)."""
    z = np.asarray(z, np.float64)
    lo = np.clip(r_floor - z, 0.0, r_floor)
    hi = np.clip(r_ceil - (height - z), 0.0, r_ceil)
    inset_lo = r_floor - np.sqrt(np.maximum(r_floor**2 - lo**2, 0.0))
    inset_hi = r_ceil - np.sqrt(np.maximum(r_ceil**2 - hi**2, 0.0))
    return inset_lo + inset_hi


def _octagon_ring(z: float, planes: np.ndarray, r_floor: float,
                  r_ceil: float, height: float) -> np.ndarray:
    """(8, 2) plan-view corner vertices of the inward-offset octagon at
    height z: consecutive offset planes intersected pairwise. Ring vertex i
    joins plane i and plane i+1."""
    inset = _fillet_inset(np.array([z]), r_floor, r_ceil, height)[0]
    d = planes[:, 2] - inset
    pts = []
    for i in range(8):
        n1, n2 = planes[i, :2], planes[(i + 1) % 8, :2]
        d1, d2 = d[i], d[(i + 1) % 8]
        a = np.array([n1, n2])
        pts.append(np.linalg.solve(a, np.array([d1, d2])))
    return np.array(pts)


def _z_samples(height: float, r_floor: float, r_ceil: float,
               n_fillet: int) -> np.ndarray:
    """z levels: dense along both fillets (arc-uniform), sparse in between.

    GOAL_HEIGHT is included so the goal-opening cut in the back walls
    (quad-granular, keyed on band centers) ends exactly at the real
    opening height instead of at the next coarse band boundary."""
    th = np.linspace(0, np.pi / 2, n_fillet + 1)
    z_lo = r_floor * (1.0 - np.cos(th))           # 0 .. r_floor
    z_hi = height - r_ceil * (1.0 - np.cos(th))   # height .. height-r_ceil
    mid = np.array([height * 0.5, C.GOAL_HEIGHT])
    return np.unique(np.concatenate([z_lo, np.sort(z_hi), mid]))


class _MeshBuilder:
    def __init__(self):
        self.verts: list = []
        self.tris: list = []
        self._index: dict = {}

    def vert(self, p) -> int:
        key = (round(float(p[0]), 3), round(float(p[1]), 3),
               round(float(p[2]), 3))
        i = self._index.get(key)
        if i is None:
            i = len(self.verts)
            self._index[key] = i
            self.verts.append([float(p[0]), float(p[1]), float(p[2])])
        return i

    def tri(self, a, b, c):
        ia, ib, ic = self.vert(a), self.vert(b), self.vert(c)
        if ia != ib and ib != ic and ia != ic:
            self.tris.append([ia, ib, ic])

    def quad(self, a, b, c, d):
        """a-b-c-d in order around the quad."""
        self.tri(a, b, c)
        self.tri(a, c, d)

    def arrays(self) -> tuple[np.ndarray, np.ndarray]:
        return (np.asarray(self.verts, np.float32),
                np.asarray(self.tris, np.int32))


def _grid_patch(mb: _MeshBuilder, corner_fn, nu: int, nv: int,
                skip_fn=None):
    """Tessellate a parametric patch corner_fn(u, v) -> xyz over a
    (nu x nv) grid; skip_fn(uc, vc) True means drop that quad."""
    for i in range(nu):
        for j in range(nv):
            u0, u1 = i / nu, (i + 1) / nu
            v0, v1 = j / nv, (j + 1) / nv
            if skip_fn is not None and skip_fn((u0 + u1) / 2, (v0 + v1) / 2):
                continue
            mb.quad(corner_fn(u0, v0), corner_fn(u1, v0),
                    corner_fn(u1, v1), corner_fn(u0, v1))


def _clipped_sheet(mb: _MeshBuilder, planes: np.ndarray, z: float,
                   inset: float, ex: float, ey: float,
                   cell: float = 1024.0) -> None:
    """Horizontal sheet at height ``z``: a regular grid clipped to the
    inward-offset octagon (Sutherland-Hodgman against the 8 half-planes)."""
    clip = [(planes[i, :2], planes[i, 2] - inset) for i in range(8)]
    nx = int(np.ceil(ex / cell))
    ny = int(np.ceil(ey / cell))
    for i in range(-nx, nx):
        for j in range(-ny, ny):
            poly = [np.array([i * cell, j * cell]),
                    np.array([(i + 1) * cell, j * cell]),
                    np.array([(i + 1) * cell, (j + 1) * cell]),
                    np.array([i * cell, (j + 1) * cell])]
            for n2, d2 in clip:
                if not poly:
                    break
                out = []
                for k in range(len(poly)):
                    p, q = poly[k], poly[(k + 1) % len(poly)]
                    pin = p @ n2 <= d2 + 1e-9
                    qin = q @ n2 <= d2 + 1e-9
                    if pin:
                        out.append(p)
                    if pin != qin:
                        t = (d2 - p @ n2) / ((q - p) @ n2)
                        out.append(p + (q - p) * t)
                poly = out
            if len(poly) < 3:
                continue
            for k in range(1, len(poly) - 1):
                mb.tri(np.append(poly[0], z), np.append(poly[k], z),
                       np.append(poly[k + 1], z))


def build_soccar_mesh(n_fillet: int = 8, n_len: int = 8,
                      n_height: int = 2) -> tuple[np.ndarray, np.ndarray]:
    """Procedural soccar arena collision mesh.

    Octagonal plan footprint (matches the analytic planes of
    ``arena_geom``), curved floor->wall fillets (r=152) and wall->ceiling
    fillets (r=256), goal openings in the back walls, and sharp-edged goal
    boxes. Returns (verts (V,3) f32, tris (T,3) i32); triangle winding is
    not relied upon by the queries (normals are two-sided).
    """
    planes = _octagon_planes()
    H = C.ARENA_HEIGHT
    rf, rc = FLOOR_FILLET_RADIUS, CEILING_FILLET_RADIUS
    zs = _z_samples(H, rf, rc, n_fillet)
    rings = np.array([_octagon_ring(z, planes, rf, rc, H) for z in zs])

    mb = _MeshBuilder()
    gw, gh, gd = C.GOAL_HALF_WIDTH, C.GOAL_HEIGHT, C.GOAL_DEPTH
    ey = C.ARENA_EXTENT_Y

    # --- wall strips (8 octagon sides x len(zs)-1 bands)
    for side in range(8):
        is_back = planes[side][1] != 0 and planes[side][0] == 0
        for k in range(len(zs) - 1):
            z0, z1 = zs[k], zs[k + 1]
            # ring vertex side-1 joins planes side-1,side; vertex side joins
            # side,side+1 — so side's strip spans ring pts side-1 .. side.
            a0, b0 = rings[k][side - 1], rings[k][side]
            a1, b1 = rings[k + 1][side - 1], rings[k + 1][side]
            ubreaks = [j / n_len for j in range(n_len + 1)]
            if is_back and abs(b0[0] - a0[0]) > 1e-9:
                # insert u-breaks exactly at the goal-post x positions so
                # the quad-granular opening cut lands on +-GOAL_HALF_WIDTH
                # (keyed on this band's bottom edge, like the cut test)
                for gx in (-gw, gw):
                    u = (gx - a0[0]) / (b0[0] - a0[0])
                    if 1e-6 < u < 1 - 1e-6:
                        ubreaks.append(u)
                ubreaks = sorted(set(ubreaks))
            for u0, u1 in zip(ubreaks[:-1], ubreaks[1:]):
                p00 = np.append(a0 + (b0 - a0) * u0, z0)
                p10 = np.append(a0 + (b0 - a0) * u1, z0)
                p11 = np.append(a1 + (b1 - a1) * u1, z1)
                p01 = np.append(a1 + (b1 - a1) * u0, z1)
                if is_back:
                    # cut the goal opening out of the back wall
                    cx = (p00[0] + p10[0]) / 2
                    cz = (z0 + z1) / 2
                    if abs(cx) < gw and cz < gh:
                        continue
                mb.quad(p00, p10, p11, p01)

    # --- floor and ceiling: regular grid clipped to the octagon.  (A fan
    # from the center would put ~128 triangles in one lookup-grid cell and
    # pad every cell's candidate list to that width; a clipped grid keeps
    # triangles local, like the real game's floor assets.)
    for z in (0.0, H):
        inset = _fillet_inset(np.array([z]), rf, rc, H)[0]
        _clipped_sheet(mb, planes, z, inset, C.ARENA_EXTENT_X,
                       C.ARENA_EXTENT_Y)

    # --- goal boxes (sharp edges; the net/posts of the real asset are
    # curved but the reference's scoring threshold is behind the opening)
    for sy in (1.0, -1.0):
        y0, y1 = sy * ey, sy * (ey + gd)

        def P(x, y, z):
            return np.array([x, y, z])

        # goal floor
        _grid_patch(mb, lambda u, v: P(-gw + 2 * gw * u, y0 + (y1 - y0) * v,
                                       0.0), n_len, n_height)
        # goal ceiling
        _grid_patch(mb, lambda u, v: P(-gw + 2 * gw * u, y0 + (y1 - y0) * v,
                                       gh), n_len, n_height)
        # goal side walls
        for sx in (1.0, -1.0):
            _grid_patch(mb, lambda u, v: P(sx * gw, y0 + (y1 - y0) * u,
                                           gh * v), n_height, n_height)
        # goal back wall (net)
        _grid_patch(mb, lambda u, v: P(-gw + 2 * gw * u, y1, gh * v),
                    n_len, n_height)

    return mb.arrays()


def build_hoops_mesh(n_fillet: int = 8, n_len: int = 8,
                     n_ring: int = 16) -> tuple[np.ndarray, np.ndarray]:
    """Procedural hoops ("Dunk House") collision mesh.

    The reference loads real hoops meshes (RocketSim.cpp:102-212 with the
    hoops hash set); those assets don't ship, so — like the soccar mesh —
    this builds the arena from its known dimensions: the rounded-rectangle
    bowl (x/y walls + 45-degree corner walls from arena_geom's hoops plane
    table, floor->wall and wall->ceiling fillets) plus a basket at each
    end.  The basket rim follows the scoring ellipse exactly
    (Arena::IsBallScored hoops branch, Arena.cpp:958-971: |y|*0.9 - 2770
    with radius 716 -> ellipse center |y|=3077.8, semi-axes 716 x 795.6),
    modeled as a rim lip with inner (net) and outer (pedestal) walls —
    an approximation of the real basket geometry, self-consistent with
    the oracle (both engines collide against this same mesh).
    """
    from reinforcement_learning_tpu.physics import arena_geom as geom

    ex, ey = C.ARENA_EXTENT_X_HOOPS, C.ARENA_EXTENT_Y_HOOPS
    H = C.ARENA_HEIGHT_HOOPS
    rf, rc = FLOOR_FILLET_RADIUS, CEILING_FILLET_RADIUS
    s = 1.0 / np.sqrt(2.0)
    ci = float(geom._HOOPS_CORNER_INTERCEPT)
    # octagon order (consecutive around the perimeter), like soccar's
    planes = np.array([
        [1, 0, ex],
        [s, s, ci * s],
        [0, 1, ey],
        [-s, s, ci * s],
        [-1, 0, ex],
        [-s, -s, ci * s],
        [0, -1, ey],
        [s, -s, ci * s],
    ], np.float64)
    zs = _z_samples(H, rf, rc, n_fillet)
    rings = np.array([_octagon_ring(z, planes, rf, rc, H) for z in zs])

    mb = _MeshBuilder()
    # wall strips (no goal cut in hoops — solid walls)
    for side in range(8):
        for k in range(len(zs) - 1):
            z0, z1 = zs[k], zs[k + 1]
            a0, b0 = rings[k][side - 1], rings[k][side]
            a1, b1 = rings[k + 1][side - 1], rings[k + 1][side]
            for j in range(n_len):
                u0, u1 = j / n_len, (j + 1) / n_len
                mb.quad(np.append(a0 + (b0 - a0) * u0, z0),
                        np.append(a0 + (b0 - a0) * u1, z0),
                        np.append(a1 + (b1 - a1) * u1, z1),
                        np.append(a1 + (b1 - a1) * u0, z1))

    for z in (0.0, H):
        inset = _fillet_inset(np.array([z]), rf, rc, H)[0]
        _clipped_sheet(mb, planes, z, inset, ex, ey)

    # baskets: rim ellipse from the scoring test, both ends
    a_x = C.HOOPS_GOAL_RADIUS                       # 716
    b_y = C.HOOPS_GOAL_RADIUS / C.HOOPS_GOAL_SCALE_Y
    cy = C.HOOPS_GOAL_OFFSET_Y / C.HOOPS_GOAL_SCALE_Y
    rim_z, net_z, lip = 365.0, 120.0, 40.0
    for sy in (1.0, -1.0):
        th = np.linspace(0, 2 * np.pi, n_ring + 1)
        for t0, t1 in zip(th[:-1], th[1:]):
            pts = []
            for t, grow in ((t0, 0.0), (t1, 0.0), (t0, lip), (t1, lip)):
                x = (a_x + grow) * np.cos(t)
                y = sy * (cy + (b_y + grow) * np.sin(t))
                pts.append((x, y))
            (i0, i1, o0, o1) = pts
            # skip segments entirely behind the back wall
            if min(abs(i0[1]), abs(i1[1]), abs(o0[1]), abs(o1[1])) > ey:
                continue
            # inner (net) wall
            mb.quad((*i0, rim_z), (*i1, rim_z), (*i1, net_z), (*i0, net_z))
            # top lip
            mb.quad((*i0, rim_z), (*i1, rim_z), (*o1, rim_z), (*o0, rim_z))
            # outer (pedestal) wall
            mb.quad((*o0, rim_z), (*o1, rim_z), (*o1, net_z), (*o0, net_z))

    return mb.arrays()


# ---------------------------------------------------------------------------
# Internal-edge info (btGenerateInternalEdgeInfo replica)
# ---------------------------------------------------------------------------

def build_edge_info(verts: np.ndarray, tris: np.ndarray):
    """Per-triangle per-edge adjacency data for the internal-edge contact
    adjustment (reference: btInternalEdgeUtility.cpp —
    btGenerateInternalEdgeInfo / btConnectivityProcessor; RocketSim builds
    a btTriangleInfoMap per arena mesh, RocketSim.cpp:168-170, and the
    arena contact callback runs btAdjustInternalEdgeContacts on every
    mesh contact, Arena.cpp:275).

    Returns (internal (T,3) bool, angle (T,3) f32 — the stored
    m_edgeVxVyAngle (0 = coplanar seam), nb_normal (T,3,3) f32 — the
    neighbor normal as bullet's computedNormalB with the swap flag
    applied, convex (T,3) bool).  Edge e of triangle t is
    (v[e], v[(e+1)%3]).
    """
    verts = np.asarray(verts, np.float64)
    tris = np.asarray(tris, np.int64)
    T = len(tris)
    tv = verts[tris]                                  # (T, 3, 3)
    n_face = np.cross(tv[:, 1] - tv[:, 0], tv[:, 2] - tv[:, 0])
    n_face /= np.maximum(np.linalg.norm(n_face, axis=-1, keepdims=True),
                         1e-30)

    internal = np.zeros((T, 3), bool)
    angle = np.zeros((T, 3), np.float32)
    convex = np.zeros((T, 3), bool)
    nb_normal = np.zeros((T, 3, 3), np.float32)

    edge_map: dict = {}
    for t in range(T):
        for e in range(3):
            key = tuple(sorted((int(tris[t, e]), int(tris[t, (e + 1) % 3]))))
            edge_map.setdefault(key, []).append((t, e))

    # runtime edge vectors (the adjust code's per-case choices all equal
    # v[e] - v[(e+1)%3] for edge index e)
    def edge_vec(t, e):
        return tv[t, e] - tv[t, (e + 1) % 3]

    def rot(axis, ang, v):
        axis = axis / np.maximum(np.linalg.norm(axis), 1e-30)
        c, s = np.cos(ang), np.sin(ang)
        return (v * c + np.cross(axis, v) * s
                + axis * np.dot(axis, v) * (1 - c))

    for key, owners in edge_map.items():
        if len(owners) != 2:
            continue
        for (ta, ea), (tb, _eb) in (owners, owners[::-1]):
            # replicate btConnectivityProcessor for triangle A's edge ea
            i0, i1 = ea, (ea + 1) % 3
            egen = tv[ta, i1] - tv[ta, i0]
            egen = egen / np.maximum(np.linalg.norm(egen), 1e-30)
            other_a = tv[ta, 3 - i0 - i1]
            na, nb = n_face[ta], n_face[tb]
            ca = np.cross(egen, na)
            ca /= np.maximum(np.linalg.norm(ca), 1e-30)
            if np.dot(ca, other_a - tv[ta, i0]) < 0:
                ca = -ca
            shared = set(key)
            other_b_idx = [j for j in range(3)
                           if int(tris[tb, j]) not in shared][0]
            cb = np.cross(egen, nb)
            cb /= np.maximum(np.linalg.norm(cb), 1e-30)
            if np.dot(cb, tv[tb, other_b_idx] - tv[ta, i0]) < 0:
                cb = -cb

            calc_edge = np.cross(ca, cb)
            len2 = np.dot(calc_edge, calc_edge)
            if len2 < 1e-4:  # m_planarEpsilon
                stored = 0.0
                is_cx = False
            else:
                calc_edge /= np.sqrt(len2)
                calc_na = np.cross(calc_edge, ca)
                calc_na /= np.maximum(np.linalg.norm(calc_na), 1e-30)
                angle2 = np.arctan2(np.dot(cb, calc_na), np.dot(cb, ca))
                ang4 = np.pi - angle2
                is_cx = np.dot(na, cb) < 0
                corrected = ang4 if is_cx else -ang4
                stored = -corrected
            internal[ta, ea] = True
            angle[ta, ea] = np.float32(stored)
            convex[ta, ea] = is_cx
            # computedNormalB with the swap flag applied
            cnb = rot(edge_vec(ta, ea), stored, na)
            if np.dot(cnb, nb) < 0:
                cnb = -cnb
            nb_normal[ta, ea] = cnb.astype(np.float32)
    return internal, angle, nb_normal, convex


# ---------------------------------------------------------------------------
# Bullet BVH leaf order (btOptimizedBvh build replica)
# ---------------------------------------------------------------------------

def _bt_quantize(p, bmin, q, is_max):
    """btQuantizedBvh::quantize — float32 math, C-style uint16 casts."""
    v = ((p - bmin) * q).astype(np.float32)
    if is_max:
        return (np.trunc(v + np.float32(1.0)).astype(np.int64)
                .astype(np.uint16) | np.uint16(1))
    return (np.trunc(v).astype(np.int64).astype(np.uint16)
            & np.uint16(0xFFFE))


def bvh_leaf_order(verts: np.ndarray, tris: np.ndarray) -> np.ndarray:
    """Triangle indices in bullet BVH traversal order.

    Replicates btOptimizedBvh's quantized build (btQuantizedBvh.cpp:
    setQuantizationValues, calcSplittingAxis variance split,
    sortAndCalcSplittingIndex partition with the balance guard) so the
    leaf-array order — which is the order btBvhTriangleMeshShape reports
    triangles, and therefore bullet's manifold INSERTION order — can be
    reproduced without bullet.  Validated against tools/oracle/bvh_order.
    The manifold insertion order matters because the fork disables contact
    deduplication (btPersistentManifold.cpp getCacheEntry returns -1) and
    caps manifolds at 4 points via the keep-deepest/max-area heuristic.
    """
    verts = np.asarray(verts, np.float32)
    tris = np.asarray(tris, np.int64)

    # btTriangleMeshShape::recalcLocalAabb (margin 0 for concave shapes)
    amin = verts.min(0).astype(np.float32)
    amax = verts.max(0).astype(np.float32)

    # btQuantizedBvh::setQuantizationValues(margin=1.0) incl. the two
    # conservative re-derivation steps
    clamp = np.float32(1.0)
    bmin = (amin - clamp).astype(np.float32)
    bmax = (amax + clamp).astype(np.float32)
    q = (np.float32(65533.0) / (bmax - bmin)).astype(np.float32)
    v = (_bt_quantize(bmin, bmin, q, False).astype(np.float32) / q
         + bmin).astype(np.float32)
    bmin = np.minimum(bmin, v - clamp).astype(np.float32)
    q = (np.float32(65533.0) / (bmax - bmin)).astype(np.float32)
    v = (_bt_quantize(bmax, bmin, q, True).astype(np.float32) / q
         + bmin).astype(np.float32)
    bmax = np.maximum(bmax, v + clamp).astype(np.float32)
    q = (np.float32(65533.0) / (bmax - bmin)).astype(np.float32)

    # per-triangle AABBs with the PCK zero-dimension expansion
    tv = verts[tris]                                  # (T, 3, 3)
    tmin = tv.min(1).astype(np.float32)
    tmax = tv.max(1).astype(np.float32)
    thin = (tmax - tmin) < np.float32(0.002)
    tmax = np.where(thin, tmax + np.float32(0.001), tmax).astype(np.float32)
    tmin = np.where(thin, tmin - np.float32(0.001), tmin).astype(np.float32)
    qmin = _bt_quantize(tmin, bmin, q, False)
    qmax = _bt_quantize(tmax, bmin, q, True)
    # build-time centers: unQuantize then average (float32)
    umin = (qmin.astype(np.float32) / q + bmin).astype(np.float32)
    umax = (qmax.astype(np.float32) / q + bmin).astype(np.float32)
    centers = (np.float32(0.5) * (umax + umin)).astype(np.float32)

    order = np.arange(len(tris))

    def _seq_sum(rows):
        # bullet accumulates btVector3s one by one in float32; numpy's
        # pairwise summation rounds differently and flips split decisions
        acc = np.zeros(3, np.float32)
        for r in rows:
            acc = (acc + r).astype(np.float32)
        return acc

    # Subtree headers (btBvhSubtreeInfo): appended BOTTOM-UP during the
    # recursion unwind — a node whose subtree exceeds
    # MAX_SUBTREE_SIZE_IN_BYTES (2048B = 128 nodes) appends headers for
    # each child that fits; the traversal then walks headers in append
    # order, so the leaf visit order is NOT pre-order for big meshes.
    MAX_SUBTREE_NODES = 2048 // 16
    headers: list = []  # (start, end) leaf ranges in append order

    def build(start, end):
        """Returns this subtree's total node count (leaves + internals)."""
        n = end - start
        if n == 1:
            return 1
        c = centers[order[start:end]]
        means = (_seq_sum(c)
                 * (np.float32(1.0) / np.float32(n))).astype(np.float32)
        diff2 = ((c - means) * (c - means)).astype(np.float32)
        variance = _seq_sum(diff2) * (np.float32(1.0) / np.float32(n - 1))
        axis = int(np.argmax(variance))
        split_value = means[axis]
        # partition: centers > splitValue first, preserving bullet's swap
        # semantics (swap with the running splitIndex slot)
        split = start
        for i in range(start, end):
            if centers[order[i], axis] > split_value:
                order[i], order[split] = order[split], order[i]
                split += 1
        balanced = n // 3
        if (split <= start + balanced) or (split >= end - 1 - balanced):
            split = start + (n >> 1)
        left_nodes = build(start, split)
        right_nodes = build(split, end)
        total = 1 + left_nodes + right_nodes
        if total > MAX_SUBTREE_NODES:
            if left_nodes <= MAX_SUBTREE_NODES:
                headers.append((start, split))
            if right_nodes <= MAX_SUBTREE_NODES:
                headers.append((split, end))
        return total

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old, 10000))
    try:
        total = build(0, len(tris))
    finally:
        sys.setrecursionlimit(old)
    if total <= MAX_SUBTREE_NODES or not headers:
        return order
    return np.concatenate([order[s:e] for s, e in headers])


# ---------------------------------------------------------------------------
# Baked uniform grid (replaces btBvhTriangleMeshShape + the suspension grid)
# ---------------------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class MeshGrid:
    """Device-resident triangle soup + uniform candidate grid.

    ``cells[i, j, k]`` is a fixed-width list of triangle indices whose
    inflated AABB overlaps cell (i, j, k), padded with -1. ``margin`` is the
    inflation — any query (sphere center / ray origin / box center) whose
    reach stays under ``margin`` needs only its own cell's list.
    """
    tri_a: jnp.ndarray      # (T, 3)
    edge_ab: jnp.ndarray    # (T, 3)
    edge_ac: jnp.ndarray    # (T, 3)
    normal: jnp.ndarray     # (T, 3) unit
    cells: jnp.ndarray      # (Cx, Cy, Cz, K) int32, -1 padded
    origin: jnp.ndarray     # (3,)
    inv_cell: jnp.ndarray   # (3,)
    # Raw per-triangle AABB (no margin), for cheap candidate prefilters
    tri_mid: jnp.ndarray    # (T, 3) AABB center
    tri_half: jnp.ndarray   # (T, 3) AABB half extents
    # internal-edge info (btTriangleInfoMap equivalent), per tri edge
    # (v[e], v[(e+1)%3]):
    edge_internal: jnp.ndarray  # (T, 3) bool
    edge_angle: jnp.ndarray     # (T, 3) stored m_edgeAngle (0 = coplanar)
    edge_nb: jnp.ndarray        # (T, 3, 3) computedNormalB (swap applied)
    edge_convex: jnp.ndarray    # (T, 3) bool TRI_INFO_*_CONVEX
    margin: float

    def tree_flatten(self):
        return ((self.tri_a, self.edge_ab, self.edge_ac, self.normal,
                 self.cells, self.origin, self.inv_cell,
                 self.tri_mid, self.tri_half,
                 self.edge_internal, self.edge_angle, self.edge_nb,
                 self.edge_convex),
                self.margin)

    @classmethod
    def tree_unflatten(cls, margin, leaves):
        return cls(*leaves, margin)

    # -- bake ---------------------------------------------------------------
    @classmethod
    def bake(cls, verts: np.ndarray, tris: np.ndarray,
             cell_size: float = 512.0, margin: float = 160.0) -> "MeshGrid":
        verts = np.asarray(verts, np.float32)
        tris = np.asarray(tris, np.int64)
        a = verts[tris[:, 0]]
        b = verts[tris[:, 1]]
        c = verts[tris[:, 2]]
        tri_min = np.minimum(np.minimum(a, b), c) - margin
        tri_max = np.maximum(np.maximum(a, b), c) + margin

        lo = verts.min(0) - margin
        hi = verts.max(0) + margin
        dims = np.maximum(np.ceil((hi - lo) / cell_size).astype(int), 1)

        lo_cell = np.clip(((tri_min - lo) / cell_size).astype(int), 0,
                          dims - 1)
        hi_cell = np.clip(((tri_max - lo) / cell_size).astype(int), 0,
                          dims - 1)

        buckets: dict = {}
        for t in range(len(tris)):
            for i in range(lo_cell[t, 0], hi_cell[t, 0] + 1):
                for j in range(lo_cell[t, 1], hi_cell[t, 1] + 1):
                    for k in range(lo_cell[t, 2], hi_cell[t, 2] + 1):
                        buckets.setdefault((i, j, k), []).append(t)

        kmax = max((len(v) for v in buckets.values()), default=1)
        # round K up for friendlier gather shapes
        kmax = int(np.ceil(kmax / 8) * 8)
        cells = np.full((dims[0], dims[1], dims[2], kmax), -1, np.int32)
        for (i, j, k), lst in buckets.items():
            cells[i, j, k, :len(lst)] = lst

        n = np.cross(b - a, c - a)
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        e_int, e_ang, e_nb, e_cvx = build_edge_info(verts, tris)
        raw_min = tri_min + margin  # undo the inflation: raw AABB
        raw_max = tri_max - margin
        return cls(
            tri_a=jnp.asarray(a), edge_ab=jnp.asarray(b - a),
            edge_ac=jnp.asarray(c - a), normal=jnp.asarray(n),
            cells=jnp.asarray(cells), origin=jnp.asarray(lo, jnp.float32),
            inv_cell=jnp.asarray(1.0 / cell_size
                                 * np.ones(3), jnp.float32),
            tri_mid=jnp.asarray((raw_min + raw_max) * 0.5, jnp.float32),
            tri_half=jnp.asarray((raw_max - raw_min) * 0.5, jnp.float32),
            edge_internal=jnp.asarray(e_int), edge_angle=jnp.asarray(e_ang),
            edge_nb=jnp.asarray(e_nb), edge_convex=jnp.asarray(e_cvx),
            margin=float(margin))

    # -- candidate gather ---------------------------------------------------
    def candidates(self, pos: jnp.ndarray) -> jnp.ndarray:
        """(..., K) triangle indices (-1 padded) near ``pos`` (..., 3)."""
        cell = jnp.floor((pos - self.origin) * self.inv_cell).astype(jnp.int32)
        dims = jnp.asarray(self.cells.shape[:3], jnp.int32)
        cell = jnp.clip(cell, 0, dims - 1)
        return self.cells[cell[..., 0], cell[..., 1], cell[..., 2]]

    def _gather(self, idx: jnp.ndarray):
        safe = jnp.maximum(idx, 0)
        return (self.tri_a[safe], self.edge_ab[safe], self.edge_ac[safe],
                self.normal[safe])

    def compact_candidates(self, cell_pos: jnp.ndarray,
                           aabb_mid: jnp.ndarray, reach, k_out: int
                           ) -> jnp.ndarray:
        """Candidate triangles whose raw AABB overlaps the query AABB
        (``aabb_mid`` +- ``reach``), compacted to the FIRST ``k_out`` in
        BVH order.

        This is the structural fix for the K-padded narrowphase cost: the
        cell gather returns up to K(~128) candidates, but only a handful
        can be within contact range of any one body, so downstream exact
        tests (47-feature-pair box narrowphase, the 4-slot manifold
        retention scan) need only run on ``k_out``(8-16) compacted entries.
        The AABB prefilter is conservative (a superset of every triangle
        whose surface is within ``reach`` of the query AABB center-box),
        so compaction preserves exact contact semantics as long as at most
        ``k_out`` triangle AABBs overlap the query box —
        tests/test_mesh.py sweeps the arena to bound this.  Candidate cell
        lists are stored in BVH order and ``top_k`` keeps the first hits
        by rank, so the output order (= bullet manifold insertion order)
        is preserved.

        cell_pos (..., 3): position for the cell lookup (must be within
        ``margin`` of the whole query AABB).  aabb_mid (..., 3) / reach
        ((..., 3) or (3,) or scalar): the query AABB.  Returns
        (..., k_out) int32 triangle ids, -1 padded.
        """
        idx = self.candidates(cell_pos)                     # (..., K)
        safe = jnp.maximum(idx, 0)
        mid = self.tri_mid[safe]                            # (..., K, 3)
        half = self.tri_half[safe]
        reach = jnp.asarray(reach, jnp.float32)
        if reach.ndim == 0:
            reach = reach[None]
        hit = jnp.all(jnp.abs(aabb_mid[..., None, :] - mid)
                      <= half + reach[..., None, :], axis=-1)
        hit &= idx >= 0
        return compact_hits(idx, hit, k_out)

    def adjust_internal_edges(self, idx: jnp.ndarray, n: jnp.ndarray,
                              pos_b: jnp.ndarray, dist: jnp.ndarray):
        """btAdjustInternalEdgeContacts replica (btInternalEdgeUtility.cpp:
        414-797, run by the arena contact callback on every mesh contact).

        For a contact within 5uu (0.1bt m_edgeDistanceThreshold) of its
        triangle's nearest INTERNAL edge: coplanar seams snap the normal to
        the face normal (killing the spurious tilted edge normals a sphere
        or box picks up crossing tessellation seams); angled seams clamp
        the normal into the wedge between the two face normals.  The
        contact point reprojects along the new normal from positionWorldOnA.

        idx (..., K) triangle ids; n (..., K, 3) contact normals (toward
        the colliding body); pos_b (..., K, 3) point on the mesh;
        dist (..., K) contact distances.  Returns (n', pos_b').
        """
        safe = jnp.maximum(idx, 0)
        a = self.tri_a[safe]
        v = jnp.stack([a, a + self.edge_ab[safe], a + self.edge_ac[safe]],
                      axis=-2)                         # (..., K, 3verts, 3)
        tri_n = self.normal[safe]
        e_int = self.edge_internal[safe]               # (..., K, 3)
        e_ang = self.edge_angle[safe]
        e_nb = self.edge_nb[safe]                      # (..., K, 3, 3)
        e_cvx = self.edge_convex[safe]

        # nearest point on each edge segment to the contact point
        p0 = v
        p1 = jnp.roll(v, -1, axis=-2)
        seg = p1 - p0
        t = jnp.sum((pos_b[..., None, :] - p0) * seg, -1) / jnp.maximum(
            jnp.sum(seg * seg, -1), 1e-12)
        t = jnp.clip(t, 0.0, 1.0)
        near_pt = p0 + seg * t[..., None]
        e_dist = jnp.linalg.norm(pos_b[..., None, :] - near_pt, axis=-1)
        e_dist_m = jnp.where(e_int, e_dist, jnp.inf)
        best = jnp.argmin(e_dist_m, axis=-1)           # (..., K)
        best_dist = jnp.take_along_axis(e_dist_m, best[..., None],
                                        -1)[..., 0]
        near = best_dist < (0.1 * 50.0)                # 0.1bt in uu

        def _pick(arr):
            return jnp.take_along_axis(arr, best[..., None], -1)[..., 0]

        ang = _pick(e_ang)
        cvx = _pick(e_cvx)
        nb = jnp.take_along_axis(e_nb, best[..., None, None], -2)[..., 0, :]
        # runtime edge vector: v[e] - v[(e+1)%3]
        edge = -jnp.take_along_axis(seg, best[..., None, None],
                                    -2)[..., 0, :]
        s = jnp.where(cvx, 1.0, -1.0)[..., None]

        flat = ang == 0.0
        backfacing = (jnp.sum(n * s * tri_n, -1) < 0.0) & (
            jnp.sum(n * s * nb, -1) < 0.0)
        concave = flat | backfacing

        # concave path: snap to the face normal unless it opposes the
        # contact normal
        snap_ok = jnp.sum(tri_n * n, -1) >= 0.0
        n_snap = jnp.where((concave & snap_ok)[..., None], tri_n, n)

        # convex path: clamp into the wedge [0, storedAngle] around the
        # edge (btClampNormal)
        ec = s * tri_n
        edge_u = edge / jnp.maximum(
            jnp.linalg.norm(edge, axis=-1, keepdims=True), 1e-12)
        cross_ec = jnp.cross(edge, ec)
        cross_ec = cross_ec / jnp.maximum(
            jnp.linalg.norm(cross_ec, axis=-1, keepdims=True), 1e-12)
        cur = jnp.arctan2(jnp.sum(n * cross_ec, -1), jnp.sum(n * ec, -1))
        clamped = jnp.where(ang < 0, cur < ang, cur > ang)
        diff = ang - cur
        c, si = jnp.cos(diff)[..., None], jnp.sin(diff)[..., None]
        n_rot = (n * c + jnp.cross(edge_u, n) * si
                 + edge_u * jnp.sum(edge_u * n, -1, keepdims=True) * (1 - c))
        apply_clamp = clamped & (jnp.sum(n_rot * tri_n, -1) > 0.0)
        n_clamp = jnp.where(apply_clamp[..., None], n_rot, n)

        n_new = jnp.where(concave[..., None], n_snap, n_clamp)
        n_new = jnp.where(near[..., None], n_new, n)
        # reproject: posB' = posA - n'*d with posA = posB + n*d
        pos_a = pos_b + n * dist[..., None]
        pos_b_new = jnp.where((near & (jnp.any(n_new != n, -1)))[..., None],
                              pos_a - n_new * dist[..., None], pos_b)
        return n_new, pos_b_new

    # -- queries ------------------------------------------------------------
    def sphere_contacts(self, pos: jnp.ndarray, radius):
        """Sphere vs mesh. pos (..., 3) -> (normals (..., K, 3),
        depth (..., K), active (..., K)). Exact closest-point test
        (Ericson, RTCD 5.1.5), two-sided."""
        idx = self.candidates(pos)
        a, ab, ac, tri_n = self._gather(idx)
        p = pos[..., None, :]
        cp = _closest_point_triangle(p, a, ab, ac)
        delta = p - cp
        dist = jnp.linalg.norm(delta, axis=-1)
        # contact normal: from surface toward sphere center; for face
        # contacts this equals +-tri_n, for edge/vertex contacts it
        # interpolates — same as bullet's sphere-triangle
        face_side = jnp.sign(
            jnp.sum(delta * tri_n, axis=-1, keepdims=True))
        face_side = jnp.where(face_side == 0, 1.0, face_side)
        n = jnp.where(dist[..., None] > 1e-6,
                      delta / jnp.maximum(dist[..., None], 1e-6),
                      tri_n * face_side)
        depth = radius - dist
        active = (idx >= 0) & (depth > 0)
        return n, depth, active

    def raycast(self, start: jnp.ndarray, direction: jnp.ndarray, max_len,
                k_compact: int | None = None):
        """Short raycast vs mesh (suspension rays). start/direction (..., 3)
        -> (hit (...,), dist (...,), normal (..., 3)). Rays longer than
        ``margin`` may miss triangles binned to other cells.

        ``k_compact``: prefilter candidates by ray-segment AABB overlap and
        run the triangle test on only that many (the suspension rays are
        ~70uu; a handful of triangle AABBs can overlap them)."""
        if k_compact is not None:
            seg_mid = start + direction * (
                jnp.asarray(max_len)[..., None] * 0.5)
            seg_half = jnp.abs(direction) * (
                jnp.asarray(max_len)[..., None] * 0.5) + 1.0
            idx = self.compact_candidates(start, seg_mid, seg_half,
                                          k_compact)
        else:
            idx = self.candidates(start)
        a, ab, ac, tri_n = self._gather(idx)
        o = start[..., None, :]
        d = direction[..., None, :]
        t, valid = _ray_triangle(o, d, a, ab, ac)
        valid = valid & (idx >= 0) & (t >= 0)
        t = jnp.where(valid, t, jnp.inf)
        t_min = jnp.min(t, axis=-1)
        k = jnp.argmin(t, axis=-1)
        hit = t_min <= max_len
        dist = jnp.where(hit, t_min, max_len)
        n = jnp.take_along_axis(tri_n, k[..., None, None], axis=-2)
        n = jnp.squeeze(n, -2)
        # two-sided: normal faces back along the ray
        flip = jnp.sign(jnp.sum(n * direction, axis=-1, keepdims=True))
        n = jnp.where(flip > 0, -n, n)
        return hit, dist, n

    def box_contacts(self, pos: jnp.ndarray, rot: jnp.ndarray,
                     half_extents: jnp.ndarray):
        """Oriented box vs mesh, one contact per candidate triangle plane.

        Same convention as arena_geom.box_contacts: the deepest box support
        point against each triangle's plane, active when it penetrates and
        projects into the triangle. pos (..., 3), rot (..., 3, 3) ->
        (normal (..., K, 3), point (..., K, 3), depth (..., K),
        active (..., K))."""
        idx = self.candidates(pos)
        a, ab, ac, tri_n = self._gather(idx)
        # plane normal toward the box center (two-sided triangles)
        to_c = pos[..., None, :] - a
        side = jnp.sign(jnp.sum(to_c * tri_n, axis=-1, keepdims=True))
        side = jnp.where(side == 0, 1.0, side)
        n = tri_n * side                                     # (..., K, 3)
        # support radius of the oriented box along n
        proj = jnp.einsum('...kc,...cj->...kj', n, rot)      # n . axis_j
        r_eff = jnp.sum(jnp.abs(proj) * half_extents[..., None, :], axis=-1)
        dist = jnp.sum(to_c * n, axis=-1)                    # center to plane
        depth = r_eff - dist
        # support point: center - sum_j sign(n.a_j) h_j a_j
        signs = jnp.sign(proj)
        offset = jnp.einsum('...kj,...cj->...kc',
                            signs * half_extents[..., None, :], rot)
        point = pos[..., None, :] - offset
        # the contact must lie (projected along the normal) within the
        # triangle: barycentric test, scale-free (fp32-safe at arena scale)
        ap = point - a
        d00 = jnp.sum(ab * ab, -1)
        d01 = jnp.sum(ab * ac, -1)
        d11 = jnp.sum(ac * ac, -1)
        d20 = jnp.sum(ap * ab, -1)
        d21 = jnp.sum(ap * ac, -1)
        den = jnp.maximum(d00 * d11 - d01 * d01, 1e-20)
        v = (d11 * d20 - d01 * d21) / den
        w = (d00 * d21 - d01 * d20) / den
        eps = 1e-3
        inside = (v >= -eps) & (w >= -eps) & (v + w <= 1 + eps)
        active = (idx >= 0) & (depth > 0) & (dist > 0) & inside
        return n, point, depth, active


def compact_hits(idx: jnp.ndarray, hit: jnp.ndarray, k_out: int
                 ) -> jnp.ndarray:
    """Compact a padded candidate list to the first ``k_out`` entries whose
    ``hit`` flag is set, preserving order (candidate cell lists are stored
    in BVH order = bullet's manifold insertion order, so the compacted
    list keeps retention semantics).  Returns (..., k_out) int32, -1 pad.

    This is the structural fix for the K-padded narrowphase cost: a cell
    gather returns up to K(~128) candidates, but only a handful can be in
    contact range of one body, so the expensive exact tests and the 4-slot
    manifold retention scan need only run on the compacted entries.  If
    more than ``k_out`` candidates hit, the LAST ones in BVH order are
    dropped (bounded approximation; widths are sized from arena sweeps in
    tests/test_mesh.py so real configurations stay under the cap)."""
    K = idx.shape[-1]
    if K <= k_out:
        return jnp.where(hit, idx, -1)
    sel, ok = compact_sel(hit, k_out)
    out = jnp.take_along_axis(idx, sel, axis=-1)
    return jnp.where(ok, out, -1)


def compact_sel(hit: jnp.ndarray, k_out: int):
    """Positions of the first ``k_out`` set entries of ``hit`` along the
    last axis, order preserved.  Returns (sel (..., k_out) int32 positions,
    ok (..., k_out) bool).  Use with ``take_along_axis`` to compact
    per-candidate arrays computed before the cut.

    Sort-free: prefix-sum ranks + one-hot contraction (a (K, k_out)
    matmul-shaped reduction) — exact and far cheaper on TPU than a
    top_k/sort over the padded width."""
    K = hit.shape[-1]
    k_out = min(k_out, K)
    pos = jnp.cumsum(hit.astype(jnp.int32), axis=-1) - 1    # (..., K)
    oh = (pos[..., :, None] == jnp.arange(k_out)) & hit[..., :, None]
    sel = jnp.einsum('...ko,k->...o', oh.astype(jnp.float32),
                     jnp.arange(K, dtype=jnp.float32)).astype(jnp.int32)
    ok = jnp.any(oh, axis=-2)
    return sel, ok


def _closest_point_triangle(p, a, ab, ac):
    """Closest point on triangle (a, a+ab, a+ac) to p; branchless Ericson
    RTCD 5.1.5. All args broadcast over leading dims with trailing (3,)."""
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - (a + ab)
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp_ = p - (a + ac)
    d5 = jnp.sum(ab * cp_, -1)
    d6 = jnp.sum(ac * cp_, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    # interior barycentric
    denom = jnp.maximum(va + vb + vc, 1e-20)
    v_in = vb / denom
    w_in = vc / denom

    # start from interior, override with edge/vertex regions
    v, w = v_in, w_in
    # edge AC (vb <= 0): v=0, w = clamp(d2 / (d2 - d6))
    w_ac = d2 / jnp.where(jnp.abs(d2 - d6) < 1e-20, 1e-20, d2 - d6)
    in_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    v = jnp.where(in_ac, 0.0, v)
    w = jnp.where(in_ac, jnp.clip(w_ac, 0.0, 1.0), w)
    # edge BC (va <= 0): param t along (c - b)
    t_bc = (d4 - d3) / jnp.where(
        jnp.abs((d4 - d3) + (d5 - d6)) < 1e-20, 1e-20,
        (d4 - d3) + (d5 - d6))
    in_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
    t_bc = jnp.clip(t_bc, 0.0, 1.0)
    v = jnp.where(in_bc, 1.0 - t_bc, v)
    w = jnp.where(in_bc, t_bc, w)
    # edge AB (vc <= 0): w=0, v = clamp(d1 / (d1 - d3))
    v_ab = d1 / jnp.where(jnp.abs(d1 - d3) < 1e-20, 1e-20, d1 - d3)
    in_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    v = jnp.where(in_ab, jnp.clip(v_ab, 0.0, 1.0), v)
    w = jnp.where(in_ab, 0.0, w)
    # vertex regions
    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    v = jnp.where(in_c, 0.0, jnp.where(in_b, 1.0, jnp.where(in_a, 0.0, v)))
    w = jnp.where(in_c, 1.0, jnp.where(in_b, 0.0, jnp.where(in_a, 0.0, w)))

    return a + ab * v[..., None] + ac * w[..., None]


def _ray_triangle(o, d, a, ab, ac):
    """Moller-Trumbore, two-sided. Returns (t, valid)."""
    pvec = jnp.cross(d, ac)
    det = jnp.sum(ab * pvec, -1)
    inv_det = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
    tvec = o - a
    u = jnp.sum(tvec * pvec, -1) * inv_det
    qvec = jnp.cross(tvec, ab)
    v = jnp.sum(d * qvec, -1) * inv_det
    t = jnp.sum(ac * qvec, -1) * inv_det
    eps = 1e-6
    valid = ((jnp.abs(det) > 1e-12) & (u >= -eps) & (v >= -eps)
             & (u + v <= 1 + eps))
    return t, valid


# ---------------------------------------------------------------------------
# Asset loading (reference: RocketSim::Init, RocketSim.cpp:70-212)
# ---------------------------------------------------------------------------

# Known hashes of the real arena meshes (RocketSim.cpp:20-37) so real
# assets are verified exactly like the reference does.
SOCCAR_ARENA_MESH_HASHES = frozenset([
    0xA160BAF9, 0x2811EEE8, 0xB81AC8B9, 0x760358D3,
    0x73AE4940, 0x918F4A4E, 0x1F8EE550, 0x255BA8C1,
    0x14B84668, 0xEC759EBF, 0x94FB0D5C, 0xDEA07102,
    0xBD4FBEA8, 0x39A47F63, 0x3D79D25D, 0xD84C7A68,
])
HOOPS_ARENA_MESH_HASHES = frozenset([
    0x72F2359E, 0x5ED14A26, 0xFD5A0D07, 0x92AFA5B5,
    0x0E4133C7, 0x399E8B5F, 0xBB9D4FB5, 0x8C87FB93,
    0x1CFD0E16, 0xE19E1DF6, 0x9CA179DC, 0x16F3CC19,
])


def load_arena_mesh(mesh_dir: str | None = None,
                    cell_size: float = 512.0,
                    margin: float = 160.0,
                    verify_hashes: bool = False,
                    game_mode: str = "soccar") -> MeshGrid:
    """Build the arena MeshGrid: from real ``.cmf`` assets when
    ``mesh_dir`` is given (merging all meshes, like the reference adds every
    mesh to one static world), else from the procedural arena for the game
    mode (soccar or hoops — RocketSim.cpp GetArenaCollisionShapes)."""
    if mesh_dir is None:
        if game_mode == "hoops":
            verts, tris = build_hoops_mesh()
        else:
            verts, tris = build_soccar_mesh()
        # reorder triangles into bullet's BVH traversal order so candidate
        # index order == manifold insertion order (the BVH was built from
        # BT-unit coordinates — quantization is unit-sensitive)
        tris = tris[bvh_leaf_order(verts / 50.0, tris)]
        return MeshGrid.bake(verts, tris, cell_size, margin)
    import glob
    import os
    paths = sorted(glob.glob(os.path.join(mesh_dir, "*.cmf")))
    if not paths:
        raise FileNotFoundError(f"no .cmf meshes in {mesh_dir}")
    all_verts, all_tris = [], []
    base = 0
    for p in paths:
        v, t = read_cmf(p)
        if verify_hashes and cmf_hash(v, t) not in (
                SOCCAR_ARENA_MESH_HASHES | HOOPS_ARENA_MESH_HASHES):
            raise ValueError(f"unknown arena mesh hash for {p}")
        all_verts.append(v)
        all_tris.append(t + base)
        base += len(v)
    return MeshGrid.bake(np.concatenate(all_verts),
                         np.concatenate(all_tris), cell_size, margin)
