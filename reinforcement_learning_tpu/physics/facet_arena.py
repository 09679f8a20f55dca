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

import jax
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

def _side_coords(t: FacetTables, side: int, px, py):
    w_q = t.side_nx[side] * px + t.side_ny[side] * py - t.side_d[side]
    t_q = t.side_ux[side] * px + t.side_uy[side] * py
    return w_q, t_q


def _unfold_normal(side_nx, side_ny, ux, uy, n_w, n_t, n_z, sx, sy):
    """Side-frame normal components -> world, unfolded by quadrant signs."""
    nx = side_nx * n_w + ux * n_t
    ny = side_ny * n_w + uy * n_t
    return nx * sx, ny * sy, n_z


def _const_vec(values, sh):
    """Per-band python-float constants as a (B,)-leading traced
    expression (iota + selects).  A plain ``jnp.asarray`` literal would
    be closure-captured by the Pallas kernel trace, which rejects
    non-scalar captured constants; built this way the values fold into
    the kernel exactly like the old per-band scalar loops did."""
    iota = jax.lax.broadcasted_iota(jnp.int32, sh, 0)
    out = jnp.full(sh, jnp.float32(float(values[0])))
    for b in range(1, len(values)):
        out = jnp.where(iota == b, jnp.float32(float(values[b])), out)
    return out


_BAND_STACKS = {}


def _band_stack(t: FacetTables, side: int) -> dict:
    """Per-band constants of one folded side as (B,) float32 arrays
    (host-side, cached) — the leading band axis every vectorized query
    broadcasts over."""
    key = (id(t), side)
    got = _BAND_STACKS.get(key)
    if got is not None:
        return got
    B = N_PROFILE_BANDS
    f = lambda v: np.asarray(v, np.float32)

    def flat(b2, b):
        return (0 <= b2 < B and abs(t.nw[b2] - t.nw[b]) < 1e-9
                and abs(t.nz[b2] - t.nz[b]) < 1e-9)

    d = dict(
        z0=f(t.z0), w0=f(t.w0), tw=f(t.tw), tz=f(t.tz), L=f(t.length),
        nw=f(t.nw), nz=f(t.nz),
        lo_flat=f([1.0 if flat(b - 1, b) else 0.0 for b in range(B)]),
        hi_flat=f([1.0 if flat(b + 1, b) else 0.0 for b in range(B)]),
        cut_t0=f(t.cut_t0), cut_ts=f(t.cut_ts),
        has_cut=f([1.0 if (side == 2 and t.cut_t0[b] > 0) else 0.0
                   for b in range(B)]),
    )
    _BAND_STACKS[key] = d
    return d


def sphere_contacts(px, py, pz, radius, break_gap, tab: FacetTables = None):
    """Sphere vs every wall/goal facet, vectorized over the band axis.
    Inputs are component arrays of any shape S.  Returns STACKED arrays
    (nx, ny, nz, gap, active), each of shape (F,) + S — contact normal
    toward the sphere, surface gap (dist - radius), live flag
    (gap < break_gap) — mirroring the mesh sphere narrowphase
    (SphereTriangleDetector + the internal-edge callback), including the
    tessellation-seam DUPLICATE contacts of the real per-triangle
    manifold: per band facet the rows are [face/clamp, lateral u-break
    duplicate, fan-partner-triangle clamp, its lateral mirror]
    (PARITY.md "ramp rides")."""
    t = tab or tables()
    sx = jnp.sign(px)
    sx = jnp.where(sx == 0, 1.0, sx)
    sy = jnp.sign(py)
    sy = jnp.where(sy == 0, 1.0, sy)
    ax, ay = px * sx, py * sy

    n_len = 8          # lateral quads per strip (mesh.build_soccar_mesh)
    q_ndim = jnp.ndim(px)
    sh = (N_PROFILE_BANDS,) + (1,) * q_ndim

    NX, NY, NZ, GAP, ACT = [], [], [], [], []

    def emit(nx, ny, nz, gap):
        full = jnp.broadcast_to
        shape = gap.shape
        NX.append(full(nx, shape))
        NY.append(full(ny, shape))
        NZ.append(full(nz, shape))
        GAP.append(gap)
        ACT.append(gap < break_gap)

    for side in range(N_SIDES):
        bs = _band_stack(t, side)
        bc = lambda name: _const_vec(bs[name], sh)
        z0 = bc('z0')
        w0 = bc('w0')
        tw = bc('tw')
        tz = bc('tz')
        L = bc('L')
        nw = bc('nw')
        nzb = bc('nz')
        w_q, t_q = _side_coords(t, side, ax, ay)
        snx, sny = t.side_nx[side], t.side_ny[side]
        sux, suy = t.side_ux[side], t.side_uy[side]

        # closest point on each band (clamped profile + lateral bounds)
        ell_raw = (w_q - w0) * tw + (pz - z0) * tz          # (B,)+S
        ell = jnp.clip(ell_raw, 0.0, L)
        w_c = w0 + tw * ell
        z_c = z0 + tz * ell
        t_lo = t.lo0[side] - t.loS[side] * w_c
        t_hi = t.hi0[side] - t.hiS[side] * w_c
        t_c = jnp.clip(t_q, t_lo, t_hi)
        clamped_prof = (ell_raw < 0.0) | (ell_raw > L)
        clamped_lat = (t_q < t_lo) | (t_q > t_hi)
        # goal-opening cut (back side): snap to the rim, convex boundary
        has_cut = bc('has_cut') > 0
        cut = bc('cut_t0') - bc('cut_ts') * w_c
        in_cut = has_cut & (jnp.abs(t_c) < cut)
        t_rim = jnp.sign(t_q) * cut
        t_rim = jnp.where(t_rim == 0.0, cut, t_rim)
        t_c = jnp.where(in_cut, t_rim, t_c)

        dw = w_q - w_c
        dt_ = t_q - t_c
        dz = pz - z_c
        dist = jnp.sqrt(dw * dw + dt_ * dt_ + dz * dz)
        s_d = (w_q - w0) * nw + (pz - z0) * nzb
        sgn = jnp.where(s_d >= 0, 1.0, -1.0)
        fn_w, fn_z = nw * sgn, nzb * sgn
        # a clamp at a COPLANAR profile seam snaps to the face normal
        # (internal-edge flat case); angled seams keep the raw
        # interpolated edge normal (bullet's wedge clamp is a no-op for
        # a normal already inside the wedge)
        lo_flat = bc('lo_flat') > 0
        hi_flat = bc('hi_flat') > 0
        ell_lo = ell <= 0.0
        raw_prof = clamped_prof & ~((ell_lo & lo_flat)
                                    | (~ell_lo & hi_flat))
        use_raw = (raw_prof | clamped_lat | in_cut) & (dist > 1e-6)
        inv = 1.0 / jnp.maximum(dist, 1e-6)
        zeros = jnp.zeros_like(dist)
        n_w = jnp.where(use_raw, dw * inv, fn_w)
        n_t = jnp.where(use_raw, dt_ * inv, zeros)
        n_z = jnp.where(use_raw, dz * inv, fn_z)
        nx, ny, nz = _unfold_normal(snx, sny, sux, suy, n_w, n_t, n_z,
                                    sx, sy)
        emit(nx, ny, nz, dist - radius)

        # lateral u-break duplicate (same face normal — coplanar seam)
        face_ok = ~(clamped_prof | clamped_lat | in_cut)
        fnx, fny, fnz = _unfold_normal(snx, sny, sux, suy, fn_w, zeros,
                                       fn_z, sx, sy)
        span = t_hi - t_lo
        u_frac = (t_c - t_lo) / span
        perp2 = s_d * s_d
        t_s = t_lo + span * (jnp.round(u_frac * n_len) / n_len)
        d_lat = jnp.abs(t_c - t_s)
        if side == 2:
            # the back wall inserts extra u-breaks at the goal posts
            d_post = jnp.abs(jnp.abs(t_c) - C.GOAL_HALF_WIDTH)
            d_lat = jnp.minimum(d_lat, d_post)
        big = jnp.full_like(dist, 1e9)
        gap_lat = jnp.where(face_ok,
                            jnp.sqrt(perp2 + d_lat * d_lat) - radius, big)
        emit(fnx, fny, fnz, gap_lat)

        # fan-partner triangle of the containing quad: clamp onto its
        # boundary; a profile-edge witness keeps the raw interpolated
        # band-seam normal
        j0 = jnp.clip(jnp.floor(u_frac * n_len), 0, n_len - 1)
        t_a = t_lo + span * (j0 / n_len)
        dgt = span / n_len
        t_b = t_a + dgt
        below = ell * dgt <= (t_c - t_a) * L

        def _seg2(axp, ayp, bxp, byp):
            dx_, dy_ = bxp - axp, byp - ayp
            ss = jnp.clip(((t_c - axp) * dx_ + (ell - ayp) * dy_)
                          / jnp.maximum(dx_ * dx_ + dy_ * dy_, 1e-12),
                          0.0, 1.0)
            wx_, wy_ = axp + dx_ * ss, ayp + dy_ * ss
            return ((t_c - wx_) ** 2 + (ell - wy_) ** 2, wx_, wy_)

        d2_dg, wt_dg, wl_dg = _seg2(t_a, zeros, t_b, L + zeros)
        prof_l = jnp.where(below, L, 0.0)
        d2_pr, wt_pr, wl_pr = _seg2(t_a, prof_l, t_b, prof_l)
        lat_t = jnp.where(below, t_a, t_b)
        d2_la, wt_la, wl_la = _seg2(lat_t, zeros, lat_t, L + zeros)
        prof_best = (d2_pr <= d2_dg) & (d2_pr <= d2_la)
        d2_p = jnp.minimum(d2_dg, jnp.minimum(d2_pr, d2_la))
        t_w = jnp.where(prof_best, wt_pr,
                        jnp.where(d2_dg <= d2_la, wt_dg, wt_la))
        ell_w = jnp.where(prof_best, wl_pr,
                          jnp.where(d2_dg <= d2_la, wl_dg, wl_la))
        dist_p = jnp.sqrt(perp2 + d2_p)
        w_w = w0 + tw * ell_w
        z_w = z0 + tz * ell_w
        pdw = w_q - w_w
        pdt = t_q - t_w
        pdz = pz - z_w
        pinv = 1.0 / jnp.maximum(dist_p, 1e-6)
        # seam flatness: witness at ell=L -> seam with band b+1, else b-1
        not_flat = (below & ~hi_flat) | (~below & ~lo_flat)
        p_raw = prof_best & not_flat & (dist_p > 1e-6)
        pn_w = jnp.where(p_raw, pdw * pinv, fn_w)
        pn_t = jnp.where(p_raw, pdt * pinv, zeros)
        pn_z = jnp.where(p_raw, pdz * pinv, fn_z)
        pnx, pny, pnz = _unfold_normal(snx, sny, sux, suy, pn_w, pn_t,
                                       pn_z, sx, sy)
        gap_p = jnp.where(face_ok, dist_p - radius, big)
        emit(pnx, pny, pnz, gap_p)
        # the mirrored quad across the nearest lateral seam carries an
        # almost-identical partner contact (the oracle's +-y pairs)
        emit(pnx, pny, pnz,
             jnp.where(gap_lat < break_gap, gap_p, big))

    # goal-box rectangles (loop form — 4 rects x 2 rows)
    tail = GAP[0].shape[1:]
    for nx, ny, nz, gap, act in _goal_sphere(ax, ay, pz, sx, sy, radius,
                                             break_gap):
        NX.append(jnp.broadcast_to(nx, tail)[None])
        NY.append(jnp.broadcast_to(ny, tail)[None])
        NZ.append(jnp.broadcast_to(nz, tail)[None])
        GAP.append(jnp.broadcast_to(gap, tail)[None])
        ACT.append(jnp.broadcast_to(act, tail)[None])

    return (jnp.concatenate(NX), jnp.concatenate(NY), jnp.concatenate(NZ),
            jnp.concatenate(GAP), jnp.concatenate(ACT))


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
    # tessellation of the goal-box patches (mesh.build_soccar_mesh:
    # _grid_patch divisions): seam spacing per folded axis.  u folded
    # |x| seams start at 0; y/z seams start at the rect lower bound.
    gw, gh, gd = C.GOAL_HALF_WIDTH, C.GOAL_HEIGHT, C.GOAL_DEPTH
    ey = C.ARENA_EXTENT_Y
    seam = {0: (0.0, 2 * gw / 8), 1: (ey, gd / 2), 2: (0.0, gh / 2)}
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

        # tessellation-seam duplicate (nearest u/v grid seam of the
        # patch): one extra coplanar contact per neighbouring triangle,
        # face normal (flat internal edges snap) — e.g. the net bounce
        # at x=0 rides a u-break and the reference manifold carries the
        # contact twice (PARITY.md "goal mouth").  A folded-|x| axis
        # starts at 0, which is the MIRROR seam (and itself a u-break),
        # not a rect boundary — don't let it fail the interior gate.
        in_u = (u_q < uhi) if ua == 0 else ((u_q > ulo) & (u_q < uhi))
        in_v = (v_q < vhi) if va == 0 else ((v_q > vlo) & (v_q < vhi))
        interior = in_u & in_v
        fcomp = {axis: sgn, ua: jnp.zeros_like(dist),
                 va: jnp.zeros_like(dist)}
        fnx, fny, fnz = fcomp[0] * sx, fcomp[1] * sy, fcomp[2]
        big = jnp.full_like(dist, 1e9)
        d_seam = big
        for aid in (ua, va):
            o, s = seam[aid]
            q = coords[aid]
            d_ax = jnp.abs(q - (o + s * jnp.round((q - o) / s)))
            d_seam = jnp.minimum(d_seam, d_ax)
        gap_s = jnp.where(interior,
                          jnp.sqrt(w_q * w_q + d_seam * d_seam) - radius,
                          big)
        out.append((fnx, fny, fnz, gap_s, gap_s < break_gap))
    return out


def box_contacts(px, py, pz, rot, he, brk, tab: FacetTables = None,
                 bounds_eps: float = 1.0, off=None):
    """Oriented box (center components px/py/pz, rotation ``rot`` as a
    nested 3x3 tuple of row components, half extents ``he`` 3-tuple of
    floats) vs every facet, vectorized over the band axis.  Returns
    STACKED arrays (nx, ny, nz, pa_x, pa_y, pa_z, dist, active), each
    (F,) + S, with ``pa`` positionWorldOnA (the solver lever-arm point on
    the box) and ``dist`` the box_tri margin-law contact distance (core
    support height minus the safe margin; negative = penetrating).

    This is the megakernel's narrowphase.  Per band the rows are: [face
    contact (deepest core support corner), lateral u-break duplicate
    (the second witness the per-triangle mesh produces when the box
    spans two lateral quads), top band-seam, bottom band-seam] — the
    seam rows carry the RAW interpolated edge normals bullet keeps
    un-adjusted on angled internal edges (the impulse-bearing contacts
    of the oracle's wall-ride manifolds, PARITY.md)."""
    t = tab or tables()
    sx = jnp.sign(px)
    sx = jnp.where(sx == 0, 1.0, sx)
    sy = jnp.sign(py)
    sy = jnp.where(sy == 0, 1.0, sy)
    ax, ay = px * sx, py * sy

    n_len = 8
    q_ndim = jnp.ndim(px)
    sh = (N_PROFILE_BANDS,) + (1,) * q_ndim
    core_m = C.MESH_COLLISION_MARGIN
    dist_m = min(C.MESH_COLLISION_MARGIN,
                 0.1 * float(np.min(np.asarray(he))))
    hc = tuple(float(he[i]) - core_m for i in range(3))
    if off is None:
        off = (0.0, 0.0, 0.0)

    # core corner world positions (8), bullet corner order
    corners = []
    for sgn_c in _SHEET_CORNER_SIGNS:
        lx = tuple(off[i] + sgn_c[i] * hc[i] for i in range(3))
        wx = px + rot[0][0] * lx[0] + rot[0][1] * lx[1] + rot[0][2] * lx[2]
        wy = py + rot[1][0] * lx[0] + rot[1][1] * lx[1] + rot[1][2] * lx[2]
        wz = pz + rot[2][0] * lx[0] + rot[2][1] * lx[1] + rot[2][2] * lx[2]
        corners.append((wx, wy, wz))

    NX, NY, NZ, PX, PY, PZ, DIST, ACT = ([] for _ in range(8))

    def emit(nx, ny, nz, pxx, pyy, pzz, dist, act):
        shape = dist.shape
        bt = lambda a: jnp.broadcast_to(a, shape)
        NX.append(bt(nx))
        NY.append(bt(ny))
        NZ.append(bt(nz))
        PX.append(bt(pxx))
        PY.append(bt(pyy))
        PZ.append(bt(pzz))
        DIST.append(dist)
        ACT.append(bt(act))

    for side in range(N_SIDES):
        bs = _band_stack(t, side)
        bc = lambda name: _const_vec(bs[name], sh)
        z0 = bc('z0')
        w0 = bc('w0')
        tw = bc('tw')
        tz = bc('tz')
        L = bc('L')
        nw = bc('nw')
        nzb = bc('nz')
        hi_flat = bc('hi_flat') > 0
        lo_flat = bc('lo_flat') > 0
        snx, sny = t.side_nx[side], t.side_ny[side]
        sux, suy = t.side_ux[side], t.side_uy[side]
        sd_ = t.side_d[side]
        w_q, t_q = _side_coords(t, side, ax, ay)
        s_d = (w_q - w0) * nw + (pz - z0) * nzb
        sgn = jnp.where(s_d >= 0, 1.0, -1.0)
        fnw, fnz = nw * sgn, nzb * sgn
        nx, ny, nz = _unfold_normal(snx, sny, sux, suy, fnw, 0.0, fnz,
                                    sx, sy)

        def to_world(w_s, t_s2, z_s):
            """Side coords (w, t, z) -> world components."""
            axw = snx * (w_s + sd_) + sux * t_s2
            ayw = sny * (w_s + sd_) + suy * t_s2
            return axw * sx, ayw * sy, z_s

        # per-corner band coords; running argmin carries
        h_sup = None
        for i, (cwx, cwy, cwz) in enumerate(corners):
            caw, ct_ = _side_coords(t, side, cwx * sx, cwy * sy)
            h_i = sgn * ((caw - w0) * nw + (cwz - z0) * nzb)
            ell_i = (caw - w0) * tw + (cwz - z0) * tz
            d_top_i = jnp.sqrt((ell_i - L) ** 2 + h_i * h_i)
            d_bot_i = jnp.sqrt(ell_i * ell_i + h_i * h_i)
            if h_sup is None:
                h_sup, t_sup, ell_sup = h_i, ct_ + 0 * h_i, ell_i
                cx_s, cy_s, cz_s = (cwx + 0 * h_i, cwy + 0 * h_i,
                                    cwz + 0 * h_i)
                hs_list = [(h_i, ct_, ell_i, cwx, cwy, cwz)]
                d_top, t_top = d_top_i, ct_ + 0 * h_i
                htop = h_i
                elltop = ell_i
                d_bot, t_bot = d_bot_i, ct_ + 0 * h_i
                hbot = h_i
                ellbot = ell_i
            else:
                better = h_i < h_sup
                t_sup = jnp.where(better, ct_, t_sup)
                ell_sup = jnp.where(better, ell_i, ell_sup)
                cx_s = jnp.where(better, cwx, cx_s)
                cy_s = jnp.where(better, cwy, cy_s)
                cz_s = jnp.where(better, cwz, cz_s)
                h_sup = jnp.minimum(h_i, h_sup)
                bt_ = d_top_i < d_top
                t_top = jnp.where(bt_, ct_, t_top)
                htop = jnp.where(bt_, h_i, htop)
                elltop = jnp.where(bt_, ell_i, elltop)
                d_top = jnp.minimum(d_top_i, d_top)
                bb_ = d_bot_i < d_bot
                t_bot = jnp.where(bb_, ct_, t_bot)
                hbot = jnp.where(bb_, h_i, hbot)
                ellbot = jnp.where(bb_, ell_i, ellbot)
                d_bot = jnp.minimum(d_bot_i, d_bot)
                hs_list.append((h_i, ct_, ell_i, cwx, cwy, cwz))

        # --- face row (box_tri margin law: core support height - safe
        # margin; witness = the support corner projected onto the band)
        dist_f = h_sup - dist_m
        ell_cl = jnp.clip(ell_sup, 0.0, L)
        w_c = w0 + tw * ell_cl
        t_lo = t.lo0[side] - t.loS[side] * w_c
        t_hi = t.hi0[side] - t.hiS[side] * w_c
        in_prof = (ell_sup >= -bounds_eps) & (ell_sup <= L + bounds_eps)
        in_lat = (t_sup >= t_lo - bounds_eps) & (t_sup <= t_hi + bounds_eps)
        act_f = (dist_f < brk) & in_prof & in_lat
        has_cut = bc('has_cut') > 0
        cut = bc('cut_t0') - bc('cut_ts') * w_c
        act_f &= ~(has_cut & (jnp.abs(t_sup) < cut - bounds_eps))
        # posA = support corner pulled in by the safe margin
        emit(nx, ny, nz, cx_s - nx * dist_m, cy_s - ny * dist_m,
             cz_s - nz * dist_m, dist_f, act_f)

        # --- lateral u-break duplicate (the second witness the mesh
        # produces when the box spans two lateral quads — restores the
        # symmetric contact pairs of a wall ride)
        span = t_hi - t_lo
        u_frac = jnp.clip((t_sup - t_lo) / span, 0.0, 1.0)
        t_s = t_lo + span * (jnp.round(u_frac * n_len) / n_len)
        if side == 2:
            d_post = jnp.abs(jnp.abs(t_sup) - C.GOAL_HALF_WIDTH)
            t_post = jnp.sign(t_sup) * C.GOAL_HALF_WIDTH
            use_post = d_post < jnp.abs(t_sup - t_s)
            t_s = jnp.where(use_post, t_post, t_s)
        side_of = t_sup >= t_s
        dmin_R = jnp.full_like(h_sup, 1e9)
        t_R = t_sup
        ell_R = ell_sup
        d_seam = jnp.full_like(h_sup, 1e9)
        ell_sm = ell_sup
        for h_i, ct_, ell_i, cwx, cwy, cwz in hs_list:
            in_R = (ct_ >= t_s) != side_of
            hh = jnp.where(in_R, h_i, 1e9)
            better = hh < dmin_R
            t_R = jnp.where(better, ct_, t_R)
            ell_R = jnp.where(better, ell_i, ell_R)
            dmin_R = jnp.minimum(hh, dmin_R)
            ds_i = jnp.sqrt((ct_ - t_s) ** 2 + h_i * h_i)
            bsm = ds_i < d_seam
            ell_sm = jnp.where(bsm, ell_i, ell_sm)
            d_seam = jnp.minimum(ds_i, d_seam)
        overlap_R = dmin_R < 0.0
        use_corner = dmin_R < d_seam
        d_sep = jnp.minimum(dmin_R, d_seam)
        dist_l = jnp.where(overlap_R, h_sup, d_sep) - dist_m
        t_wit = jnp.where(overlap_R, t_s,
                          jnp.where(use_corner, t_R, t_s))
        ell_wit = jnp.clip(
            jnp.where(overlap_R, ell_sup,
                      jnp.where(use_corner, ell_R, ell_sm)), 0.0, L)
        wwx, wwy, wwz = to_world(w0 + tw * ell_wit, t_wit,
                                 z0 + tz * ell_wit)
        act_l = (dist_l < brk) & in_prof & act_f
        emit(nx, ny, nz, wwx + nx * dist_l, wwy + ny * dist_l,
             wwz + nz * dist_l, dist_l, act_l)

        # --- profile band-seam rows (raw interpolated normals — the
        # box-edge-vs-seam contacts bullet keeps un-adjusted on angled
        # internal edges; one row per seam from each adjacent band)
        for d_sm, t_sm, h_sm, dl_raw, ell_pos, flat_mask in (
                (d_top, t_top, htop, elltop - L, L, hi_flat),
                (d_bot, t_bot, hbot, ellbot, jnp.zeros_like(L), lo_flat)):
            dist_s = d_sm - dist_m
            t_wit2 = jnp.clip(t_sm, t_lo, t_hi)
            wx2, wy2, wz2 = to_world(w0 + tw * ell_pos, t_wit2,
                                     z0 + tz * ell_pos)
            # raw normal: from the seam witness toward the box feature
            # (in the band's (ell, h) plane; zero lateral component)
            inv = 1.0 / jnp.maximum(d_sm, 1e-6)
            dl = dl_raw * inv
            dh = h_sm * inv
            rn_w = (tw * dl + fnw * dh)
            rn_z = (tz * dl + fnz * dh)
            rnx, rny, rnz = _unfold_normal(snx, sny, sux, suy, rn_w,
                                           jnp.zeros_like(dl), rn_z,
                                           sx, sy)
            act_s = ((dist_s < brk) & ~flat_mask & (h_sm > 0.0)
                     & (t_sm >= t_lo - bounds_eps)
                     & (t_sm <= t_hi + bounds_eps))
            emit(rnx, rny, rnz, wx2 + rnx * dist_s, wy2 + rny * dist_s,
                 wz2 + rnz * dist_s, jnp.where(act_s, dist_s, 1e9), act_s)

    coords = (ax, ay, pz)
    tail = DIST[0].shape[1:]
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
        bt = lambda a: jnp.broadcast_to(a, tail)[None]
        NX.append(bt(nx))
        NY.append(bt(ny))
        NZ.append(bt(nz))
        PX.append(bt(sup_x))
        PY.append(bt(sup_y))
        PZ.append(bt(sup_z))
        DIST.append(bt(dist))
        ACT.append(bt(act))
    return (jnp.concatenate(NX), jnp.concatenate(NY), jnp.concatenate(NZ),
            jnp.concatenate(PX), jnp.concatenate(PY), jnp.concatenate(PZ),
            jnp.concatenate(DIST), jnp.concatenate(ACT))


def _seg_line_closest(ax, ay, ah, bx, by, bh, q0x, q0y, ux, uy):
    """Closest pair between segment [a, b] (components incl. height h) and
    the infinite line q0 + t*(ux, uy, 0) lying in the sheet plane (h = 0).
    Returns (cx, cy, dist) — the witness ON THE LINE and the distance."""
    dx, dy, dh = bx - ax, by - ay, bh - ah
    wx, wy = ax - q0x, ay - q0y
    b = dx * ux + dy * uy
    e = wx * ux + wy * uy
    # segment direction with the line component removed
    rx, ry, rh = dx - b * ux, dy - b * uy, dh
    vx, vy, vh = wx - e * ux, wy - e * uy, ah
    denom = rx * rx + ry * ry + rh * rh
    s = jnp.where(denom > 1e-12,
                  -(vx * rx + vy * ry + vh * rh)
                  / jnp.maximum(denom, 1e-12), 0.0)
    s = jnp.clip(s, 0.0, 1.0)
    t = e + s * b
    cx, cy = q0x + t * ux, q0y + t * uy
    px_, py_, ph_ = ax + s * dx, ay + s * dy, ah + s * dh
    dist = jnp.sqrt((px_ - cx) ** 2 + (py_ - cy) ** 2 + ph_ * ph_)
    return cx, cy, dist


# Box corner sign patterns and edge enumeration shared with the exact
# narrowphase (box_tri._CORNER_SIGNS order = bullet's support tie-break
# order); host-side constants.
_SHEET_CORNER_SIGNS = [(sx, sy, sz)
                       for sx in (-1.0, 1.0)
                       for sy in (-1.0, 1.0)
                       for sz in (-1.0, 1.0)]
_SHEET_EDGES = []
for _i in range(8):
    for _axis, _stride in ((0, 4), (1, 2), (2, 1)):
        _j = _i + _stride
        if _j < 8 and _SHEET_CORNER_SIGNS[_i][_axis] < 0 and sum(
                a * b for a, b in zip(_SHEET_CORNER_SIGNS[_i],
                                      _SHEET_CORNER_SIGNS[_j])) == 1.0:
            _SHEET_EDGES.append((_i, _j))
assert len(_SHEET_EDGES) == 12


def sheet_box_contacts(px, py, pz, rot, he, off, z0, up_sign,
                       core_margin, dist_margin, brk, cell=1024.0):
    """Oriented box vs ONE tessellated horizontal sheet — the floor (z=0)
    or ceiling (z=H) 1024-uu clipped grid of ``mesh.build_soccar_mesh``
    (``_clipped_sheet``: square cells fan-split along the (+1,+1)
    corner diagonal).

    Emulates the exact per-triangle narrowphase
    (``box_tri.box_triangle_contact``, the XLA engine's oracle-parity
    path) WITHOUT gathers, one contact per nearby triangle REGION:

      0. the region containing the deepest core support point
         (= box_tri's overlap witness: global support clamped = itself),
      1. the diagonal-partner region of the same cell,
      2. across the nearest x-seam (x = 1024 i),
      3. across the nearest y-seam.

    Per neighbor region the contact follows box_tri's feature cases:
    a core corner below the sheet inside the region -> the global SAT
    overlap law (dist = core support height - dist_margin, point = support
    clamped onto the seam); a corner hovering over the region -> its
    vertical projection; otherwise the closest box edge to the seam line
    (whose witness internal-edge-adjusts onto the face normal, like the
    y=0 seam contact Bullet produces at a rolling side landing).

    Components in, list of 4 rows (nx, ny, nz, cx, cy, cz, dist, active)
    out.  ``rot`` nested 3x3 row tuples; ``he``/``off`` 3-tuples of
    floats; ``up_sign`` +1 floor / -1 ceiling; heights are measured as
    ``up_sign * (z - z0)``.  Region membership ignores the octagon clip
    (sheet cells near the walls are cut; the fillet band facets cover
    those surfaces)."""
    hc = tuple(he[i] - core_margin for i in range(3))
    zero = jnp.zeros_like(px)

    def h_of(z):
        return up_sign * (z - z0)

    # deepest core support against the sheet normal (box_tri tie-break:
    # d >= 0 -> -he)
    sup_x, sup_y, sup_z = px, py, pz
    r_core = zero
    for j in range(3):
        axj = (rot[0][j], rot[1][j], rot[2][j])
        # rotate the hitbox offset into the support base
        sup_x = sup_x + axj[0] * off[j]
        sup_y = sup_y + axj[1] * off[j]
        sup_z = sup_z + axj[2] * off[j]
        d = up_sign * axj[2]
        r_core = r_core + jnp.abs(d) * hc[j]
        # bullet support tie-break (btFsels: dir >= 0 -> +he, with the
        # support direction being -n, so d == +-0 -> +he)
        s = jnp.where(-d >= 0, hc[j], -hc[j])
        sup_x = sup_x + axj[0] * s
        sup_y = sup_y + axj[1] * s
        sup_z = sup_z + axj[2] * s
    h_sup = h_of(sup_z)

    # core corner positions + heights
    cxs, cys, chs = [], [], []
    for sgn in _SHEET_CORNER_SIGNS:
        lx = tuple(off[i] + sgn[i] * hc[i] for i in range(3))
        wx = px + rot[0][0] * lx[0] + rot[0][1] * lx[1] + rot[0][2] * lx[2]
        wy = py + rot[1][0] * lx[0] + rot[1][1] * lx[1] + rot[1][2] * lx[2]
        wz = pz + rot[2][0] * lx[0] + rot[2][1] * lx[1] + rot[2][2] * lx[2]
        cxs.append(wx)
        cys.append(wy)
        chs.append(h_of(wz))

    # cell of the support point; nearest seams; cell-corner diagonal
    ox = jnp.floor(sup_x / cell) * cell
    oy = jnp.floor(sup_y / cell) * cell
    fx, fy = sup_x - ox, sup_y - oy
    xs = jnp.where(fx < cell / 2, ox, ox + cell)
    ys = jnp.where(fy < cell / 2, oy, oy + cell)
    sup_lower = (fx - fy) >= 0          # support in the fan's lower tri

    inv_sqrt2 = 0.7071067811865476

    def region_row(in_corner_fn, clamp_fn, line):
        """One neighbor-region contact row.  in_corner_fn(i) -> bool mask
        for core corner i inside the region; clamp_fn() -> (x, y) support
        clamped onto the region boundary; line = (q0x, q0y, ux, uy)."""
        dmin = jnp.full_like(px, jnp.inf)
        wx_c = zero
        wy_c = zero
        for i in range(8):
            inside = in_corner_fn(i)
            better = inside & (chs[i] < dmin)
            dmin = jnp.where(better, chs[i], dmin)
            wx_c = jnp.where(better, cxs[i], wx_c)
            wy_c = jnp.where(better, cys[i], wy_c)
        # closest box edge to the seam line (witness on the line)
        q0x, q0y, ux, uy = line
        d_seam = jnp.full_like(px, jnp.inf)
        sx_w = zero
        sy_w = zero
        for (i, j) in _SHEET_EDGES:
            ex, ey, ed = _seg_line_closest(cxs[i], cys[i], chs[i],
                                           cxs[j], cys[j], chs[j],
                                           q0x, q0y, ux, uy)
            closer = ed < d_seam
            d_seam = jnp.where(closer, ed, d_seam)
            sx_w = jnp.where(closer, ex, sx_w)
            sy_w = jnp.where(closer, ey, sy_w)
        clx, cly = clamp_fn()
        overlap = dmin < 0.0
        # separated: closest feature to the region — the lower of (an
        # in-region corner's vertical projection) and (the closest box
        # edge against the boundary seam line)
        use_corner = dmin < d_seam
        d_sep = jnp.minimum(dmin, d_seam)
        dist = jnp.where(overlap, h_sup, d_sep) - dist_margin
        cx = jnp.where(overlap, clx, jnp.where(use_corner, wx_c, sx_w))
        cy = jnp.where(overlap, cly, jnp.where(use_corner, wy_c, sy_w))
        return cx, cy, dist

    rows = []
    nz_ = jnp.full_like(px, float(up_sign))
    z_sheet = jnp.full_like(px, float(z0))

    # 0. containing region: box_tri's own-triangle contact
    dist0 = h_sup - dist_margin
    rows.append((zero, zero, nz_, sup_x, sup_y, z_sheet, dist0,
                 dist0 < brk))

    # 1. diagonal partner (line through (ox, oy), direction (1, 1))
    def diag_in(i):
        side_i = (cxs[i] - ox) - (cys[i] - oy) >= 0
        return side_i != sup_lower

    def diag_clamp():
        # project sup onto the diagonal
        t = ((sup_x - ox) + (sup_y - oy)) * 0.5
        return ox + t, oy + t

    cx1, cy1, d1 = region_row(diag_in, diag_clamp,
                              (ox, oy, inv_sqrt2, inv_sqrt2))
    rows.append((zero, zero, nz_, cx1, cy1, z_sheet, d1, d1 < brk))

    # 2. across the nearest x-seam
    sup_right = sup_x >= xs

    def xseam_in(i):
        return (cxs[i] >= xs) != sup_right

    cx2, cy2, d2 = region_row(xseam_in, lambda: (xs, sup_y),
                              (xs, oy, jnp.zeros_like(px) + 0.0, 1.0))
    rows.append((zero, zero, nz_, cx2, cy2, z_sheet, d2, d2 < brk))

    # 3. across the nearest y-seam
    sup_above = sup_y >= ys

    def yseam_in(i):
        return (cys[i] >= ys) != sup_above

    cx3, cy3, d3 = region_row(yseam_in, lambda: (sup_x, ys),
                              (ox, ys, 1.0, jnp.zeros_like(px) + 0.0))
    rows.append((zero, zero, nz_, cx3, cy3, z_sheet, d3, d3 < brk))
    return rows


def sheet_sphere_contacts(px, py, pz, radius, break_gap, z0, up_sign,
                          cell=1024.0):
    """Sphere vs one tessellated horizontal sheet (floor z=0 / ceiling
    z=H 1024-uu grid): per-triangle-region contacts — the containing
    triangle's foot contact (a coplanar duplicate of the static plane,
    which the reference world carries as a separate body) plus seam
    duplicates across the cell diagonal and the nearest x/y grid seams.
    All normals are the face normal (flat internal edges snap).  Returns
    a list of 4 (nx, ny, nz, cx, cy, gap, active) rows; cx/cy is the
    witness for the octagon-clip gate."""
    zero = jnp.zeros_like(px)
    nz_ = jnp.full_like(px, float(up_sign))
    h = up_sign * (pz - z0)
    ox = jnp.floor(px / cell) * cell
    oy = jnp.floor(py / cell) * cell
    fx, fy = px - ox, py - oy
    xs = jnp.where(fx < cell / 2, ox, ox + cell)
    ys = jnp.where(fy < cell / 2, oy, oy + cell)
    h2 = h * h
    rows = []
    gap0 = jnp.abs(h) - radius
    rows.append((zero, zero, nz_, px, py, gap0, gap0 < break_gap))
    inv_sqrt2 = 0.7071067811865476
    d_diag = jnp.abs(fx - fy) * inv_sqrt2
    t_d = (fx + fy) * 0.5
    gap_d = jnp.sqrt(h2 + d_diag * d_diag) - radius
    rows.append((zero, zero, nz_, ox + t_d, oy + t_d, gap_d,
                 gap_d < break_gap))
    d_x = jnp.abs(px - xs)
    gap_x = jnp.sqrt(h2 + d_x * d_x) - radius
    rows.append((zero, zero, nz_, xs, py, gap_x, gap_x < break_gap))
    d_y = jnp.abs(py - ys)
    gap_y = jnp.sqrt(h2 + d_y * d_y) - radius
    rows.append((zero, zero, nz_, px, ys, gap_y, gap_y < break_gap))
    return rows


def sheet_clip_ok(tab: FacetTables, cx, cy, inset: float, eps: float = 1.0):
    """True where (cx, cy) lies inside the sheet's octagon clip boundary
    (the inward-offset octagon at the sheet's fillet inset) — the region
    where floor/ceiling grid triangles exist (``mesh._clipped_sheet``)."""
    sx = jnp.where(cx >= 0, 1.0, -1.0)
    sy = jnp.where(cy >= 0, 1.0, -1.0)
    ax, ay = cx * sx, cy * sy
    ok = jnp.ones_like(cx, dtype=bool)
    for side in range(N_SIDES):
        w_q, _ = _side_coords(tab, side, ax, ay)
        ok &= w_q <= -inset + eps
    return ok


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

    q_ndim = jnp.ndim(ox)
    sh = (N_PROFILE_BANDS,) + (1,) * q_ndim
    for side in range(N_SIDES):
        bs = _band_stack(t, side)
        bc = lambda name: _const_vec(bs[name], sh)
        z0 = bc('z0')
        w0 = bc('w0')
        twb = bc('tw')
        tzb = bc('tz')
        L = bc('L')
        nw = bc('nw')
        nzb = bc('nz')
        w_o, t_o = _side_coords(t, side, ax, ay)
        w_d = t.side_nx[side] * adx + t.side_ny[side] * ady
        t_d = t.side_ux[side] * adx + t.side_uy[side] * ady
        snx, sny = t.side_nx[side], t.side_ny[side]
        sux, suy = t.side_ux[side], t.side_uy[side]
        # vectorized over the band axis: (B,) + S
        denom = w_d * nw + dz * nzb
        s_o = (w_o - w0) * nw + (oz - z0) * nzb
        safe = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        t_hit = -s_o / safe
        w_h = w_o + w_d * t_hit
        t_h = t_o + t_d * t_hit
        z_h = oz + dz * t_hit
        ell = (w_h - w0) * twb + (z_h - z0) * tzb
        in_prof = (ell >= -bounds_eps) & (ell <= L + bounds_eps)
        t_lo = t.lo0[side] - t.loS[side] * w_h
        t_hi = t.hi0[side] - t.hiS[side] * w_h
        ok = (jnp.abs(denom) > 1e-9) & in_prof \
            & (t_h >= t_lo - bounds_eps) & (t_h <= t_hi + bounds_eps)
        has_cut = bc('has_cut') > 0
        cut = bc('cut_t0') - bc('cut_ts') * w_h
        ok &= ~(has_cut & (jnp.abs(t_h) < cut - bounds_eps))
        # two-sided: normal faces back along the ray
        flip = jnp.where(denom > 0, -1.0, 1.0)
        nxb, nyb, nzb_ = _unfold_normal(snx, sny, sux, suy,
                                        nw * flip, 0.0, nzb * flip,
                                        sx, sy)
        # reduce the band axis to the nearest hit before considering
        t_hit = jnp.where(ok & (t_hit >= 0) & (t_hit <= max_len), t_hit,
                          jnp.inf)
        kmin = jnp.argmin(t_hit, axis=0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (N_PROFILE_BANDS,) + t_hit.shape[1:], 0)
        one = (iota == kmin[None]).astype(w_h.dtype)
        consider(jnp.min(t_hit, axis=0),
                 jnp.ones(jnp.shape(w_o), bool),
                 jnp.sum(jnp.broadcast_to(nxb, t_hit.shape) * one, axis=0),
                 jnp.sum(jnp.broadcast_to(nyb, t_hit.shape) * one, axis=0),
                 jnp.sum(jnp.broadcast_to(nzb_, t_hit.shape) * one,
                         axis=0))

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
