"""Closed-form facet arena: the procedural soccar mesh as analytic queries.

The XLA physics path collides against the baked triangle grid
(``physics/mesh.py``) — exact, but every query is a device gather, and on
TPU scattered gathers are the bottleneck (measured ~0.4 ms per 128-wide
candidate fetch at 1024 arenas — more than the entire per-tick compute
budget of the Pallas megakernel).  This module is the TPU-shaped answer:
the procedural arena is GENERATED from closed-form geometry
(``mesh.build_soccar_mesh``), so its exact tessellated surfaces can be
queried analytically — per-band profile segments, octagon sides, goal
box rectangles — with zero gathers and zero HBM traffic.  The facet set
is the same surface set as the mesh triangles (validated by
tests/test_facet_arena.py against ``MeshGrid``); only bookkeeping
differs, documented in PARITY.md:

  * coplanar tessellation seams (multiple triangles per planar band) are
    one facet here — identical geometry, fewer duplicate manifold points;
  * manifold insertion order is the fixed facet enumeration order, not
    bullet's BVH traversal order (differs only when >4 contacts are
    simultaneously active);
  * the arena floor / ceiling triangles are omitted — the infinite
    static floor/ceiling planes (present in both worlds, Arena.cpp:
    1060-1100) already produce the identical coplanar contacts.

Geometry recap (mirrors ``mesh.build_soccar_mesh``): an octagonal plan
(8 wall planes), each wall swept along a shared vertical profile —
floor fillet arc (radius 152, 8 chord bands), straight section (split at
GOAL_HEIGHT and mid-height), ceiling fillet arc (radius 256, 8 bands) —
with lateral bounds where adjacent walls meet, a quad-granular goal
opening cut in the back walls, and sharp goal boxes (reference arena
composition: RocketSim.cpp:102-212 + the 4 static planes).

Everything is x/y mirror symmetric, so queries fold into the first
quadrant and evaluate 3 sides (x+ wall, x+y+ corner wall, y+ back wall)
instead of 8.

All query functions are shape-generic: coordinates are passed as
separate component arrays (any broadcastable shape), so the same
formulas serve the batched XLA wrappers (tests) and the component-form
Pallas kernel (``ops/ctick.py``) — one source of truth for the math.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from reinforcement_learning_tpu import constants as C

N_PROFILE_BANDS = 19     # 8 floor-arc + 3 straight + 8 ceiling-arc
N_SIDES = 3              # folded: x+ wall, x+y+ corner, y+ back wall
N_GOAL_FACETS = 4        # goal floor, ceiling, side wall (|x|), back wall
N_FACETS = N_SIDES * N_PROFILE_BANDS + N_GOAL_FACETS


@dataclasses.dataclass(frozen=True)
class FacetTables:
    """Static arena tables (nested tuples of python floats — hashable,
    foldable into jit/Pallas kernels as compile-time constants)."""
    # profile bands (N_PROFILE_BANDS): segment from (w0, z0), unit tangent
    # (tw, tz), length, unit normal (nw, nz) with nw <= 0 (into arena).
    # w = signed distance outside the wall plane (wall surface: w=-inset).
    z0: tuple
    w0: tuple
    tw: tuple
    tz: tuple
    length: tuple
    nw: tuple
    nz: tuple
    # folded sides (N_SIDES): outward xy plane normal, offset, lateral dir
    side_nx: tuple
    side_ny: tuple
    side_d: tuple
    side_ux: tuple
    side_uy: tuple
    # lateral strip bounds, affine in the facet offset w (w = -inset on
    # the surface): t_lo(w) = lo0 - loS * w, t_hi(w) = hi0 - hiS * w.
    # NOT symmetric: the corner strips span from the x-wall ring vertex to
    # the y-wall ring vertex, and Ex != Ey.
    lo0: tuple           # (N_SIDES,)
    loS: tuple           # (N_SIDES,)
    hi0: tuple           # (N_SIDES,)
    hiS: tuple           # (N_SIDES,)
    # goal-opening cut of the back wall, per band: cut when |t| < cut_t
    # (cut_t <= 0 means no cut); affine in w like the bounds
    cut_t0: tuple        # (N_PROFILE_BANDS,)
    cut_ts: tuple        # (N_PROFILE_BANDS,)


def _octagon_planes() -> np.ndarray:
    from reinforcement_learning_tpu.physics.mesh import _octagon_planes
    return _octagon_planes()


def build_tables() -> FacetTables:
    """Derive the tables from the same parameters as build_soccar_mesh."""
    from reinforcement_learning_tpu.physics.mesh import (
        CEILING_FILLET_RADIUS, FLOOR_FILLET_RADIUS, _z_samples)

    H = C.ARENA_HEIGHT
    rf, rc = FLOOR_FILLET_RADIUS, CEILING_FILLET_RADIUS
    zs = _z_samples(H, rf, rc, 8)
    assert len(zs) == N_PROFILE_BANDS + 1, len(zs)

    def inset(z):
        lo = np.clip(rf - z, 0.0, rf)
        hi = np.clip(rc - (H - z), 0.0, rc)
        return (rf - np.sqrt(max(rf**2 - lo**2, 0.0))
                + rc - np.sqrt(max(rc**2 - hi**2, 0.0)))

    z0l, w0l, twl, tzl, Ll, nwl, nzl = [], [], [], [], [], [], []
    for b in range(N_PROFILE_BANDS):
        za, zb = float(zs[b]), float(zs[b + 1])
        wa, wb = -inset(za), -inset(zb)
        dw, dz = wb - wa, zb - za
        L = float(np.hypot(dw, dz))
        tw, tz = dw / L, dz / L
        # normal perpendicular to the tangent, pointing into the arena
        # (nw <= 0); (-dz, dw)/L satisfies nw = -dz/L <= 0 since dz > 0
        nw, nz = -dz / L, dw / L
        z0l.append(za)
        w0l.append(wa)
        twl.append(tw)
        tzl.append(tz)
        Ll.append(L)
        nwl.append(nw)
        nzl.append(nz)

    # folded sides: plane params from _octagon_planes rows 0 (x+),
    # 1 (x+y+ corner), 2 (y+ back)
    planes = _octagon_planes()
    side_rows = (0, 1, 2)
    s_nx, s_ny, s_d, s_ux, s_uy = [], [], [], [], []
    lo0l, loSl, hi0l, hiSl = [], [], [], []

    def ring(i, s):
        """Ring corner between (offset) sides i and i+1 at inset s."""
        n1 = planes[i % 8]
        n2 = planes[(i + 1) % 8]
        A = np.array([[n1[0], n1[1]], [n2[0], n2[1]]])
        return np.linalg.solve(A, [n1[2] - s, n2[2] - s])

    for i in side_rows:
        nx, ny, d = planes[i]
        s_nx.append(float(nx))
        s_ny.append(float(ny))
        s_d.append(float(d))
        u = np.array([-ny, nx])
        s_ux.append(float(u[0]))
        s_uy.append(float(u[1]))
        # strip spans ring[i-1] .. ring[i]; both corners move affinely
        # with the inset -> affine t bounds.  t(w) uses inset = -w.
        lo_0, lo_1 = float(u @ ring(i - 1, 0.0)), float(u @ ring(i - 1, 1.0))
        hi_0, hi_1 = float(u @ ring(i, 0.0)), float(u @ ring(i, 1.0))
        if lo_0 > hi_0:
            lo_0, lo_1, hi_0, hi_1 = hi_0, hi_1, lo_0, lo_1
        lo0l.append(lo_0)
        loSl.append(lo_1 - lo_0)     # t_lo(w) = lo0 - loS * w
        hi0l.append(hi_0)
        hiSl.append(hi_1 - hi_0)

    # goal-opening cut (back wall, folded side 2): the builder skips back
    # wall quads whose bottom-edge center has |cx| < GOAL_HALF_WIDTH and
    # band center z < GOAL_HEIGHT; with the u-breaks inserted exactly at
    # +-GOAL_HALF_WIDTH the cut interval is |x| < gw at each band's bottom
    # edge, widening linearly with the corner slope up the band.  In |t|
    # (= |x| for the back side) the cut bound scales with the strip half
    # width: cut_t(w) = gw * c(w)/c(w_bottom), c = hi bound (symmetric).
    gw, gh = C.GOAL_HALF_WIDTH, C.GOAL_HEIGHT
    cut_t0, cut_ts = [], []
    c0_back, cs_back = hi0l[2], hiSl[2]
    for b in range(N_PROFILE_BANDS):
        zc = (float(zs[b]) + float(zs[b + 1])) / 2.0
        if zc < gh:
            wbot = w0l[b]
            cbot = c0_back - cs_back * wbot
            scale = gw / cbot
            # cut_t(w) = scale * (c0 - cs*w)
            cut_t0.append(scale * c0_back)
            cut_ts.append(scale * cs_back)
        else:
            cut_t0.append(-1.0)
            cut_ts.append(0.0)

    return FacetTables(
        z0=tuple(z0l), w0=tuple(w0l), tw=tuple(twl), tz=tuple(tzl),
        length=tuple(Ll), nw=tuple(nwl), nz=tuple(nzl),
        side_nx=tuple(s_nx), side_ny=tuple(s_ny), side_d=tuple(s_d),
        side_ux=tuple(s_ux), side_uy=tuple(s_uy),
        lo0=tuple(lo0l), loS=tuple(loSl),
        hi0=tuple(hi0l), hiS=tuple(hiSl),
        cut_t0=tuple(cut_t0), cut_ts=tuple(cut_ts))


_TABLES = None


def tables() -> FacetTables:
    global _TABLES
    if _TABLES is None:
        _TABLES = build_tables()
    return _TABLES


# ---------------------------------------------------------------------------
# Core per-facet formulas (shape-generic; components in, components out)

def _band_closest(t: FacetTables, b: int, side: int, w_q, t_q, z_q):
    """Closest point on band ``b`` of folded side ``side`` to the query
    (w_q, t_q, z_q) in side coordinates.  Returns (w_c, t_c, z_c,
    convex_clamped) — convex_clamped marks a clamp onto the goal-opening
    rim (the only convex boundary; every other clamp is a concave seam
    where bullet's internal-edge adjustment snaps the contact normal to
    the face normal, btInternalEdgeUtility.cpp:414-797)."""
    w0, z0 = t.w0[b], t.z0[b]
    tw, tz, L = t.tw[b], t.tz[b], t.length[b]
    # profile clamp (the band is an extrusion along t, so the profile and
    # lateral clamps are independent except for the slanted corner edges,
    # handled by the neighbouring side's facet)
    ell = jnp.clip((w_q - w0) * tw + (z_q - z0) * tz, 0.0, L)
    w_c = w0 + tw * ell
    z_c = z0 + tz * ell
    # lateral bounds at the profile point
    t_lo = t.lo0[side] - t.loS[side] * w_c
    t_hi = t.hi0[side] - t.hiS[side] * w_c
    t_c = jnp.clip(t_q, t_lo, t_hi)
    convex = None
    if side == 2 and t.cut_t0[b] > 0:
        # goal-opening cut: |t| < cut_t is absent; snap to the rim
        cut = t.cut_t0[b] - t.cut_ts[b] * w_c
        in_cut = jnp.abs(t_c) < cut
        t_rim = jnp.sign(t_q) * cut
        t_rim = jnp.where(t_rim == 0.0, cut, t_rim)
        t_c = jnp.where(in_cut, t_rim, t_c)
        convex = in_cut
    return w_c, t_c, z_c, convex


def _side_coords(t: FacetTables, side: int, px, py):
    w_q = t.side_nx[side] * px + t.side_ny[side] * py - t.side_d[side]
    t_q = t.side_ux[side] * px + t.side_uy[side] * py
    return w_q, t_q


def _unfold_normal(side_nx, side_ny, ux, uy, n_w, n_t, n_z, sx, sy):
    """Side-frame normal components -> world, unfolded by quadrant signs."""
    nx = side_nx * n_w + ux * n_t
    ny = side_ny * n_w + uy * n_t
    return nx * sx, ny * sy, n_z


def sphere_contacts(px, py, pz, radius, break_gap, tab: FacetTables = None):
    """Sphere vs every wall/goal facet.  Inputs are component arrays of any
    (broadcast-compatible) shape.  Returns per-facet lists (len N_FACETS)
    of (nx, ny, nz, gap, active) — contact normal toward the sphere,
    surface gap (dist - radius), and the live-contact flag
    (gap < break_gap), mirroring the mesh sphere narrowphase
    (SphereTriangleDetector + the internal-edge callback)."""
    t = tab or tables()
    sx = jnp.sign(px)
    sx = jnp.where(sx == 0, 1.0, sx)
    sy = jnp.sign(py)
    sy = jnp.where(sy == 0, 1.0, sy)
    ax, ay = px * sx, py * sy

    out = []
    for side in range(N_SIDES):
        w_q, t_q = _side_coords(t, side, ax, ay)
        snx, sny = t.side_nx[side], t.side_ny[side]
        sux, suy = t.side_ux[side], t.side_uy[side]
        for b in range(N_PROFILE_BANDS):
            w_c, t_c, z_c, convex = _band_closest(t, b, side, w_q, t_q, pz)
            dw = w_q - w_c
            dt_ = t_q - t_c
            dz = pz - z_c
            dist = jnp.sqrt(dw * dw + dt_ * dt_ + dz * dz)
            # signed side of the facet plane (two-sided triangles)
            s_d = (w_q - t.w0[b]) * t.nw[b] + (pz - t.z0[b]) * t.nz[b]
            sgn = jnp.where(s_d >= 0, 1.0, -1.0)
            # face normal (concave seams snap to it — internal-edge adjust)
            fn_w, fn_z = t.nw[b] * sgn, t.nz[b] * sgn
            if convex is not None:
                inv = 1.0 / jnp.maximum(dist, 1e-6)
                use_delta = convex & (dist > 1e-6)
                n_w = jnp.where(use_delta, dw * inv, fn_w)
                n_t = jnp.where(use_delta, dt_ * inv, 0.0)
                n_z = jnp.where(use_delta, dz * inv, fn_z)
            else:
                n_w, n_t, n_z = fn_w, jnp.zeros_like(dist), fn_z
            nx, ny, nz = _unfold_normal(snx, sny, sux, suy,
                                        n_w, n_t, n_z, sx, sy)
            gap = dist - radius
            out.append((nx, ny, nz, gap, gap < break_gap))

    out.extend(_goal_sphere(ax, ay, pz, sx, sy, radius, break_gap))
    return out


def _rect_closest(u_q, v_q, u_lo, u_hi, v_lo, v_hi):
    return jnp.clip(u_q, u_lo, u_hi), jnp.clip(v_q, v_lo, v_hi)


def _goal_rects():
    """Goal-box rectangles in folded coordinates (x >= 0, y >= 0), as
    (plane_axis, plane_value, inward_normal_sign, (u_axis, u_lo, u_hi),
    (v_axis, v_lo, v_hi), mouth_axis) — mouth_axis marks the boundary at
    the goal mouth (y = Ey), the convex rim (reference goal-box geometry:
    mesh.build_soccar_mesh goal section).  Axes: 0=x(folded |x| for the
    side wall), 1=y, 2=z."""
    gw, gh, gd = C.GOAL_HALF_WIDTH, C.GOAL_HEIGHT, C.GOAL_DEPTH
    ey = C.ARENA_EXTENT_Y
    return (
        # goal floor (z=0): x in [0(folded: -gw..gw -> |x|<gw], y in goal
        (2, 0.0, +1.0, (0, 0.0, gw), (1, ey, ey + gd), None),
        # goal ceiling (z=gh)
        (2, gh, -1.0, (0, 0.0, gw), (1, ey, ey + gd), 1),
        # goal side wall (|x|=gw)
        (0, gw, -1.0, (1, ey, ey + gd), (2, 0.0, gh), 1),
        # goal back wall (y=ey+gd)
        (1, ey + gd, -1.0, (0, 0.0, gw), (2, 0.0, gh), None),
    )


def _goal_sphere(ax, ay, pz, sx, sy, radius, break_gap):
    out = []
    coords = (ax, ay, pz)
    for axis, value, nsign, (ua, ulo, uhi), (va, vlo, vhi), mouth in \
            _goal_rects():
        w_q = coords[axis] - value
        u_q, v_q = coords[ua], coords[va]
        u_c = jnp.clip(u_q, ulo, uhi)
        v_c = jnp.clip(v_q, vlo, vhi)
        du, dv = u_q - u_c, v_q - v_c
        dist = jnp.sqrt(w_q * w_q + du * du + dv * dv)
        sgn = jnp.where(w_q * nsign >= 0, nsign, -nsign)
        # convex rim: clamped onto the goal-mouth edge (posts/crossbar)
        if mouth is not None:
            at_mouth = ((u_q < ulo) if ua == mouth else (v_q < vlo))
            inv = 1.0 / jnp.maximum(dist, 1e-6)
            use_delta = at_mouth & (dist > 1e-6)
            comp = {axis: jnp.where(use_delta, w_q * inv, sgn),
                    ua: jnp.where(use_delta, du * inv, 0.0),
                    va: jnp.where(use_delta, dv * inv, 0.0)}
        else:
            comp = {axis: sgn, ua: jnp.zeros_like(dist),
                    va: jnp.zeros_like(dist)}
        nx, ny, nz = comp[0] * sx, comp[1] * sy, comp[2]
        gap = dist - radius
        out.append((nx, ny, nz, gap, gap < break_gap))
    return out


def box_contacts(px, py, pz, rot, he, brk, tab: FacetTables = None,
                 bounds_eps: float = 1.0):
    """Oriented box (center components px/py/pz, rotation ``rot`` as a
    nested 3x3 tuple of row components, half extents ``he`` 3-tuple of
    floats) vs every facet: one face-based contact per facet — the deepest
    box support point against the facet plane, active when within the
    breaking threshold and (projected) inside the facet bounds.  Returns
    per-facet list of (nx, ny, nz, sup_x, sup_y, sup_z, dist, active) with
    ``sup`` the support point (= positionWorldOnA for the solver rows) and
    ``dist`` the contact distance (negative = penetrating).

    This is the megakernel's narrowphase: face contacts are exact for
    box-face/vertex vs triangle-face configurations (all driving
    surfaces); box-edge vs facet-edge contacts take the face normal
    instead of the GJK edge normal (the XLA path's box_tri is the exact
    oracle)."""
    t = tab or tables()
    sx = jnp.sign(px)
    sx = jnp.where(sx == 0, 1.0, sx)
    sy = jnp.sign(py)
    sy = jnp.where(sy == 0, 1.0, sy)
    ax, ay = px * sx, py * sy

    out = []
    for side in range(N_SIDES):
        w_q, t_q = _side_coords(t, side, ax, ay)
        snx, sny = t.side_nx[side], t.side_ny[side]
        sux, suy = t.side_ux[side], t.side_uy[side]
        for b in range(N_PROFILE_BANDS):
            s_d = (w_q - t.w0[b]) * t.nw[b] + (pz - t.z0[b]) * t.nz[b]
            sgn = jnp.where(s_d >= 0, 1.0, -1.0)
            # world-frame face normal toward the box
            nx, ny, nz = _unfold_normal(snx, sny, sux, suy,
                                        t.nw[b] * sgn, 0.0, t.nz[b] * sgn,
                                        sx, sy)
            sup_x, sup_y, sup_z, r_eff = _box_support(px, py, pz, rot, he,
                                                      nx, ny, nz)
            dist = jnp.abs(s_d) - r_eff
            # bounds: support point projected into the facet
            sw, st_ = _side_coords(t, side, sup_x * sx, sup_y * sy)
            ell = (sw - t.w0[b]) * t.tw[b] + (sup_z - t.z0[b]) * t.tz[b]
            in_prof = (ell >= -bounds_eps) & (ell <= t.length[b] + bounds_eps)
            w_c = t.w0[b] + t.tw[b] * jnp.clip(ell, 0.0, t.length[b])
            t_lo = t.lo0[side] - t.loS[side] * w_c
            t_hi = t.hi0[side] - t.hiS[side] * w_c
            in_lat = ((st_ >= t_lo - bounds_eps)
                      & (st_ <= t_hi + bounds_eps))
            act = (dist < brk) & in_prof & in_lat
            if side == 2 and t.cut_t0[b] > 0:
                cut = t.cut_t0[b] - t.cut_ts[b] * w_c
                act &= jnp.abs(st_) >= cut - bounds_eps
            out.append((nx, ny, nz, sup_x, sup_y, sup_z, dist, act))

    coords = (ax, ay, pz)
    for axis, value, nsign, (ua, ulo, uhi), (va, vlo, vhi), mouth in \
            _goal_rects():
        w_q = coords[axis] - value
        sgn = jnp.where(w_q * nsign >= 0, nsign, -nsign)
        comp = {axis: sgn, ua: 0.0, va: 0.0}
        nx, ny, nz = comp[0] * sx, comp[1] * sy, comp[2]
        nx = nx * jnp.ones_like(pz)
        ny = ny * jnp.ones_like(pz)
        nz = nz * jnp.ones_like(pz)
        sup_x, sup_y, sup_z, r_eff = _box_support(px, py, pz, rot, he,
                                                  nx, ny, nz)
        dist = jnp.abs(w_q) - r_eff
        sup = (sup_x * sx, sup_y * sy, sup_z)
        in_u = (sup[ua] >= ulo - bounds_eps) & (sup[ua] <= uhi + bounds_eps)
        in_v = (sup[va] >= vlo - bounds_eps) & (sup[va] <= vhi + bounds_eps)
        act = (dist < brk) & in_u & in_v
        out.append((nx, ny, nz, sup_x, sup_y, sup_z, dist, act))
    return out


def _box_support(px, py, pz, rot, he, nx, ny, nz):
    """Deepest box point along -(n) and the support radius along n.
    ``rot`` rows as nested tuples; columns are the box axes."""
    sup_x, sup_y, sup_z = px, py, pz
    r_eff = 0.0
    for j in range(3):
        axj = (rot[0][j], rot[1][j], rot[2][j])
        d = nx * axj[0] + ny * axj[1] + nz * axj[2]
        r_eff = r_eff + jnp.abs(d) * he[j]
        s = jnp.where(d >= 0, -he[j], he[j])
        sup_x = sup_x + axj[0] * s
        sup_y = sup_y + axj[1] * s
        sup_z = sup_z + axj[2] * s
    return sup_x, sup_y, sup_z, r_eff


def raycasts(ox, oy, oz, dx, dy, dz, max_len, tab: FacetTables = None,
             bounds_eps: float = 0.5):
    """Ray (origin o, direction d, length max_len) vs every facet.
    Returns (dist, nx, ny, nz, hit): nearest facet hit over the whole set
    (reduced here — callers get the min directly)."""
    t = tab or tables()
    sx = jnp.sign(ox)
    sx = jnp.where(sx == 0, 1.0, sx)
    sy = jnp.sign(oy)
    sy = jnp.where(sy == 0, 1.0, sy)
    ax, ay = ox * sx, oy * sy
    adx, ady = dx * sx, dy * sy

    best = jnp.full_like(ox, jnp.inf)
    bnx = jnp.zeros_like(ox)
    bny = jnp.zeros_like(ox)
    bnz = jnp.zeros_like(ox)

    def consider(t_hit, valid, nx, ny, nz):
        nonlocal best, bnx, bny, bnz
        t_hit = jnp.where(valid & (t_hit >= 0) & (t_hit <= max_len),
                          t_hit, jnp.inf)
        closer = t_hit < best
        bnx = jnp.where(closer, nx, bnx)
        bny = jnp.where(closer, ny, bny)
        bnz = jnp.where(closer, nz, bnz)
        best = jnp.minimum(best, t_hit)

    for side in range(N_SIDES):
        w_o, t_o = _side_coords(t, side, ax, ay)
        w_d = t.side_nx[side] * adx + t.side_ny[side] * ady
        t_d = t.side_ux[side] * adx + t.side_uy[side] * ady
        snx, sny = t.side_nx[side], t.side_ny[side]
        sux, suy = t.side_ux[side], t.side_uy[side]
        for b in range(N_PROFILE_BANDS):
            denom = w_d * t.nw[b] + dz * t.nz[b]
            s_o = (w_o - t.w0[b]) * t.nw[b] + (oz - t.z0[b]) * t.nz[b]
            safe = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
            t_hit = -s_o / safe
            w_h = w_o + w_d * t_hit
            t_h = t_o + t_d * t_hit
            z_h = oz + dz * t_hit
            ell = (w_h - t.w0[b]) * t.tw[b] + (z_h - t.z0[b]) * t.tz[b]
            in_prof = (ell >= -bounds_eps) & (ell <= t.length[b]
                                              + bounds_eps)
            t_lo = t.lo0[side] - t.loS[side] * w_h
            t_hi = t.hi0[side] - t.hiS[side] * w_h
            ok = (jnp.abs(denom) > 1e-9) & in_prof \
                & (t_h >= t_lo - bounds_eps) & (t_h <= t_hi + bounds_eps)
            if side == 2 and t.cut_t0[b] > 0:
                cut = t.cut_t0[b] - t.cut_ts[b] * w_h
                ok &= jnp.abs(t_h) >= cut - bounds_eps
            # two-sided: normal faces back along the ray
            flip = jnp.where(denom > 0, -1.0, 1.0)
            nx, ny, nz = _unfold_normal(snx, sny, sux, suy,
                                        t.nw[b] * flip, 0.0,
                                        t.nz[b] * flip, sx, sy)
            consider(t_hit, ok, nx, ny, nz)

    coords_o = (ax, ay, oz)
    coords_d = (adx, ady, dz)
    for axis, value, nsign, (ua, ulo, uhi), (va, vlo, vhi), mouth in \
            _goal_rects():
        denom = coords_d[axis]
        safe = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        t_hit = (value - coords_o[axis]) / safe
        u_h = coords_o[ua] + coords_d[ua] * t_hit
        v_h = coords_o[va] + coords_d[va] * t_hit
        ok = ((jnp.abs(denom) > 1e-9)
              & (u_h >= ulo - bounds_eps) & (u_h <= uhi + bounds_eps)
              & (v_h >= vlo - bounds_eps) & (v_h <= vhi + bounds_eps))
        flip = jnp.where(denom > 0, -1.0, 1.0)
        comp = {axis: flip, ua: jnp.zeros_like(t_hit),
                va: jnp.zeros_like(t_hit)}
        consider(t_hit, ok, comp[0] * sx, comp[1] * sy, comp[2])

    hit = jnp.isfinite(best)
    dist = jnp.where(hit, best, max_len)
    return dist, bnx, bny, bnz, hit
