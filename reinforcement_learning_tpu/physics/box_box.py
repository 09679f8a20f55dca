"""Box-box narrowphase: a batched, branch-free port of the ODE dBoxBox
face-clipping detector that Bullet dispatches for box-box pairs
(reference: bullet3-3.24 btBoxBoxDetector.cpp:267-728 ``dBoxBox2``;
btBoxBoxCollisionAlgorithm feeds it ``2*getHalfExtentsWithMargin()`` and
``maxc=4``).

This is the algorithm the reference's car-car contacts actually run
(cars are compound(box) bodies; the child pair is box-box), producing an
up-to-4-point one-tick manifold: 15-axis SAT with a 1.05 fudge factor
favoring face axes, then reference/incident-face clipping and
angle-spread point culling.  All functions are shape-generic over
leading batch dims and use only where/one-hot compaction (no scatters),
so both the XLA tick and the ctick megakernel twin can consume them.

Conventions match the source: ``normal`` points from box1 toward box2;
the returned points are the positions Bullet passes to
``addContactPoint`` (on box2's incident face for face codes <=3, shifted
by depth for codes >=4, so positionWorldOnA = point + normal * depth in
every case); depths are >= 0 at emission.
"""

from __future__ import annotations

import jax.numpy as jnp

from reinforcement_learning_tpu import maths as m

SIMD_EPSILON = 1.19209290e-07
FUDGE_FACTOR = 1.05
FUDGE2 = 1.0e-5


def _compact(cands, valid, out_slots):
    """Stable order-preserving compaction: keep valid candidates in slot
    order, packed to the front of ``out_slots`` slots.

    cands: (..., K, D); valid: (..., K).  Returns (out (..., J, D),
    out_valid (..., J))."""
    K = valid.shape[-1]
    tgt = jnp.cumsum(valid.astype(jnp.int32), axis=-1) - 1     # (..., K)
    tgt = jnp.where(valid, tgt, -1)
    j = jnp.arange(out_slots)
    onehot = (tgt[..., :, None] == j).astype(cands.dtype)      # (..., K, J)
    out = jnp.einsum('...kd,...kj->...jd', cands, onehot)
    out_valid = jnp.any(tgt[..., :, None] == j, axis=-2)
    return out, out_valid


def _clip_rect_quad(h, quad):
    """intersectRectQuad2 (btBoxBoxDetector.cpp:117-175): chop the incident
    quad against the four reference-rect edges, preserving Bullet's
    emission order (each surviving vertex, then the crossing point after
    it).  h: (..., 2); quad: (..., 4, 2).  Returns (pts (..., 8, 2),
    valid (..., 8))."""
    pts = jnp.concatenate(
        [quad, jnp.zeros(quad.shape[:-2] + (4, 2), quad.dtype)], axis=-2)
    valid = jnp.concatenate(
        [jnp.ones(quad.shape[:-2] + (4,), bool),
         jnp.zeros(quad.shape[:-2] + (4,), bool)], axis=-1)
    # the source aborts (goto done) the moment the 8th point is written,
    # skipping any remaining chop lines; ``frozen`` reproduces that
    frozen = jnp.zeros(quad.shape[:-2], bool)
    for d in (0, 1):
        for sign in (-1.0, 1.0):
            n_val = jnp.sum(valid.astype(jnp.int32), -1)       # (...,)
            idx = jnp.arange(8)
            # next point in the prefix-dense list: (i+1) % n
            nxt = (idx + 1) % jnp.maximum(n_val[..., None], 1)  # (..., 8)
            p = pts
            pn = jnp.take_along_axis(p, nxt[..., None], axis=-2)
            hd = h[..., d][..., None]
            inside = sign * p[..., d] < hd                      # (..., 8)
            inside_n = sign * pn[..., d] < hd
            # crossing point on the chop line
            denom = pn[..., d] - p[..., d]
            t = (sign * hd - p[..., d]) / jnp.where(
                jnp.abs(denom) > 0, denom, 1.0)
            cross_other = p[..., 1 - d] + (pn[..., 1 - d]
                                           - p[..., 1 - d]) * t
            cross = jnp.stack(
                [jnp.where(d == 0, sign * hd, cross_other),
                 jnp.where(d == 0, cross_other, sign * hd)], axis=-1)
            emit_pt = valid & inside
            emit_cross = valid & (inside ^ inside_n)
            # interleave [pt_i, cross_i] in slot order 2i, 2i+1 (Bullet's
            # emission order), then compact back to 8 slots
            cands = jnp.stack([p, cross], axis=-2)              # (...,8,2,2)
            cands = cands.reshape(cands.shape[:-3] + (16, 2))
            vv = jnp.stack([emit_pt, emit_cross], axis=-1)
            vv = vv.reshape(vv.shape[:-2] + (16,))
            new_pts, new_valid = _compact(cands, vv, 8)
            pts = jnp.where(frozen[..., None, None], pts, new_pts)
            valid = jnp.where(frozen[..., None], valid, new_valid)
            frozen = frozen | (
                jnp.sum(valid.astype(jnp.int32), -1) >= 8)
    return pts, valid


def _cull_points(p2d, valid, depth, i0):
    """cullPoints2 (btBoxBoxDetector.cpp:183-266) for m=4: keep the
    deepest point ``i0`` plus the 3 points whose polar angles around the
    (shoelace) centroid are closest to A[i0] + j*pi/2.

    p2d: (..., 8, 2); valid/depth: (..., 8); i0: (...,) int.
    Returns sel (..., 4) int indices into the 8 slots."""
    n = jnp.sum(valid.astype(jnp.int32), -1)                    # (...,)
    x, y = p2d[..., 0], p2d[..., 1]
    xn = jnp.roll(x, -1, axis=-1)
    yn = jnp.roll(y, -1, axis=-1)
    # only the first n points form the polygon: for i<n-1 pair (i, i+1);
    # the wrap pair (n-1, 0) is handled by roll when slots beyond n are
    # masked out and slot n-1 rolls onto slot n (invalid) — so compute
    # the wrap term explicitly like the source does.
    idx = jnp.arange(x.shape[-1])
    interior = valid & (idx < (n - 1)[..., None])
    q = x * yn - xn * y
    a = jnp.sum(jnp.where(interior, q, 0.0), -1)
    cx = jnp.sum(jnp.where(interior, q * (x + xn), 0.0), -1)
    cy = jnp.sum(jnp.where(interior, q * (y + yn), 0.0), -1)
    last = jnp.maximum(n - 1, 0)
    xl = jnp.take_along_axis(x, last[..., None], -1)[..., 0]
    yl = jnp.take_along_axis(y, last[..., None], -1)[..., 0]
    qw = xl * y[..., 0] - x[..., 0] * yl
    denom = 3.0 * (a + qw)
    scale = jnp.where(jnp.abs(a + qw) > SIMD_EPSILON,
                      1.0 / jnp.where(denom != 0, denom, 1.0), 3.4e38)
    cx = scale * (cx + qw * (xl + x[..., 0]))
    cy = scale * (cy + qw * (yl + y[..., 0]))
    # n==1 / n==2 centroid special cases
    cx1, cy1 = x[..., 0], y[..., 0]
    cx2 = 0.5 * (x[..., 0] + x[..., 1])
    cy2 = 0.5 * (y[..., 0] + y[..., 1])
    cx = jnp.where(n == 1, cx1, jnp.where(n == 2, cx2, cx))
    cy = jnp.where(n == 1, cy1, jnp.where(n == 2, cy2, cy))

    ang = jnp.arctan2(y - cy[..., None], x - cx[..., None])     # (..., 8)
    a0 = jnp.take_along_axis(ang, i0[..., None], -1)[..., 0]

    avail = valid & (idx != i0[..., None])
    sel = [i0]
    pi = jnp.pi
    for j in range(1, 4):
        target = j * (2 * pi / 4) + a0
        target = jnp.where(target > pi, target - 2 * pi, target)
        diff = jnp.abs(ang - target[..., None])
        diff = jnp.where(diff > pi, 2 * pi - diff, diff)
        diff = jnp.where(avail, diff, jnp.inf)
        pick = jnp.argmin(diff, -1)
        avail = avail & (idx != pick[..., None])
        sel.append(pick)
    return jnp.stack(sel, axis=-1)


def box_box_manifold(p1, R1, he1, p2, R2, he2):
    """dBoxBox2, batched.  All inputs in consistent units (BT here).

    p1/p2: (..., 3) box centers; R1/R2: (..., 3, 3) rotation (columns =
    local axes in world); he1/he2: (..., 3) half extents INCLUDING
    Bullet's margin adjustment (use
    formulas.box_effective_half_extents_bt).

    Returns dict with:
      ``points``  (..., 4, 3) — Bullet's addContactPoint positions
      ``depth``   (..., 4)    — penetration depths (>= 0 where active)
      ``normal``  (..., 3)    — from box1 toward box2
      ``active``  (..., 4)    — slot validity
      ``overlap`` (...,)      — any contact
    """
    f32 = jnp.result_type(p1, jnp.float32)
    p = p2 - p1
    pp = m.inv_rotate(R1, p)                                   # R1^T p
    A = jnp.broadcast_to(he1, p1.shape).astype(f32)
    B = jnp.broadcast_to(he2, p2.shape).astype(f32)

    # relative rotation R_ij = col_i(R1) . col_j(R2)
    Rrel = jnp.einsum('...ki,...kj->...ij', R1, R2)            # (..., 3, 3)
    Q = jnp.abs(Rrel)

    batch = p.shape[:-1]
    s = jnp.full(batch, -jnp.inf, f32)
    code = jnp.zeros(batch, jnp.int32)
    invert = jnp.zeros(batch, bool)
    norm_face = jnp.zeros(batch + (3,), f32)   # face-axis normal (world)
    norm_edgeC = jnp.zeros(batch + (3,), f32)  # edge normal (box1 local)
    separated = jnp.zeros(batch, bool)

    def upd_face(expr1, expr2, axis_world, cc, s, code, invert, nf,
                 separated):
        s2 = jnp.abs(expr1) - expr2
        separated = separated | (s2 > 0)
        take = s2 > s
        s = jnp.where(take, s2, s)
        code = jnp.where(take, cc, code)
        invert = jnp.where(take, expr1 < 0, invert)
        nf = jnp.where(take[..., None], axis_world, nf)
        return s, code, invert, nf, separated

    # face axes of box1 (codes 1-3) and box2 (codes 4-6)
    for i in range(3):
        expr2 = A[..., i] + (B[..., 0] * Q[..., i, 0]
                             + B[..., 1] * Q[..., i, 1]
                             + B[..., 2] * Q[..., i, 2])
        s, code, invert, norm_face, separated = upd_face(
            pp[..., i], expr2, R1[..., :, i], i + 1,
            s, code, invert, norm_face, separated)
    p_in_2 = jnp.einsum('...ki,...k->...i', R2, p)             # R2^T p
    for i in range(3):
        expr2 = (A[..., 0] * Q[..., 0, i] + A[..., 1] * Q[..., 1, i]
                 + A[..., 2] * Q[..., 2, i] + B[..., i])
        s, code, invert, norm_face, separated = upd_face(
            p_in_2[..., i], expr2, R2[..., :, i], i + 4,
            s, code, invert, norm_face, separated)

    # edge-edge axes (codes 7-15): u_i x v_j, in box1-local coords
    Qf = Q + FUDGE2
    ecases = []
    for i in range(3):       # u_i (box1 axis)
        for j in range(3):   # v_j (box2 axis)
            i1, i2 = [k for k in range(3) if k != i]
            expr1 = (pp[..., i2] * Rrel[..., i1, j]
                     - pp[..., i1] * Rrel[..., i2, j])
            j1, j2 = [k for k in range(3) if k != j]
            expr2 = (A[..., i1] * Qf[..., i2, j]
                     + A[..., i2] * Qf[..., i1, j]
                     + B[..., j1] * Qf[..., i, j2]
                     + B[..., j2] * Qf[..., i, j1])
            # normal (box1-local) = e_i x Rrel[:, j]
            c = Rrel[..., :, j]
            e = jnp.zeros((3,), f32).at[i].set(1.0)
            nC = jnp.cross(jnp.broadcast_to(e, c.shape), c)
            ecases.append((expr1, expr2, nC, 7 + 3 * i + j))
    for expr1, expr2, nC, cc in ecases:
        s2 = jnp.abs(expr1) - expr2
        separated = separated | (s2 > SIMD_EPSILON)
        length = m.norm(nC)
        ok = length > SIMD_EPSILON
        s2n = s2 / jnp.maximum(length, SIMD_EPSILON)
        take = ok & (s2n * FUDGE_FACTOR > s)
        s = jnp.where(take, s2n, s)
        code = jnp.where(take, cc, code)
        invert = jnp.where(take, expr1 < 0, invert)
        norm_edgeC = jnp.where(take[..., None],
                               nC / jnp.maximum(length[..., None],
                                                SIMD_EPSILON), norm_edgeC)

    is_edge = code > 6
    normal = jnp.where(is_edge[..., None],
                       m.rotate(R1, norm_edgeC), norm_face)
    normal = jnp.where(invert[..., None], -normal, normal)
    depth_axis = -s

    # ---- edge-edge single contact (btBoxBoxDetector.cpp:429-478)
    sign_a = jnp.where(
        jnp.einsum('...i,...ij->...j', normal, R1) > 0, 1.0, -1.0)
    pa = p1 + jnp.einsum('...j,...ij->...i', sign_a * A, R1)
    sign_b = jnp.where(
        jnp.einsum('...i,...ij->...j', normal, R2) > 0, -1.0, 1.0)
    pb = p2 + jnp.einsum('...j,...ij->...i', sign_b * B, R2)
    ecode = jnp.maximum(code - 7, 0)
    ua = jnp.take_along_axis(
        R1, (ecode // 3)[..., None, None].astype(jnp.int32), -1)[..., 0]
    ub = jnp.take_along_axis(
        R2, (ecode % 3)[..., None, None].astype(jnp.int32), -1)[..., 0]
    pdiff = pb - pa
    uaub = m.dot(ua, ub)
    q1 = m.dot(ua, pdiff)
    q2 = -m.dot(ub, pdiff)
    dd = 1.0 - uaub * uaub
    good = dd > 1e-4
    ddi = 1.0 / jnp.where(good, dd, 1.0)
    alpha = jnp.where(good, (q1 + uaub * q2) * ddi, 0.0)
    beta = jnp.where(good, (uaub * q1 + q2) * ddi, 0.0)
    pb_edge = pb + ub * beta[..., None]

    # ---- face-face clip (btBoxBoxDetector.cpp:480-727)
    ref_is_1 = code <= 3
    r1 = ref_is_1[..., None, None]
    Ra = jnp.where(r1, R1, R2)
    Rb = jnp.where(r1, R2, R1)
    pa_f = jnp.where(ref_is_1[..., None], p1, p2)
    pb_f = jnp.where(ref_is_1[..., None], p2, p1)
    Sa = jnp.where(ref_is_1[..., None], A, B)
    Sb = jnp.where(ref_is_1[..., None], B, A)
    normal2 = jnp.where(ref_is_1[..., None], normal, -normal)

    nr = jnp.einsum('...ki,...k->...i', Rb, normal2)           # Rb^T n2
    anr = jnp.abs(nr)
    # lanr = largest |component|, with the source's exact tie-breaking
    # (strict comparisons favoring z on ties)
    lanr = jnp.where(
        anr[..., 1] > anr[..., 0],
        jnp.where(anr[..., 1] > anr[..., 2], 1, 2),
        jnp.where(anr[..., 0] > anr[..., 2], 0, 2)).astype(jnp.int32)
    a1 = jnp.where(lanr == 0, 1, 0).astype(jnp.int32)
    a2 = jnp.where(lanr == 2, 1, 2).astype(jnp.int32)

    nr_l = jnp.take_along_axis(nr, lanr[..., None], -1)[..., 0]
    Sb_l = jnp.take_along_axis(Sb, lanr[..., None], -1)[..., 0]
    Rb_l = jnp.take_along_axis(Rb, lanr[..., None, None], -1)[..., 0]
    center = (pb_f - pa_f
              + jnp.where((nr_l < 0)[..., None], Sb_l[..., None] * Rb_l,
                          -Sb_l[..., None] * Rb_l))

    codeN = jnp.where(ref_is_1, code - 1, code - 4).astype(jnp.int32)
    code1 = jnp.where(codeN == 0, 1, 0).astype(jnp.int32)
    code2 = jnp.where(codeN == 2, 1, 2).astype(jnp.int32)

    Ra_1 = jnp.take_along_axis(Ra, code1[..., None, None], -1)[..., 0]
    Ra_2 = jnp.take_along_axis(Ra, code2[..., None, None], -1)[..., 0]
    Rb_a1 = jnp.take_along_axis(Rb, a1[..., None, None], -1)[..., 0]
    Rb_a2 = jnp.take_along_axis(Rb, a2[..., None, None], -1)[..., 0]
    Sb_a1 = jnp.take_along_axis(Sb, a1[..., None], -1)[..., 0]
    Sb_a2 = jnp.take_along_axis(Sb, a2[..., None], -1)[..., 0]

    c1 = m.dot(center, Ra_1)
    c2 = m.dot(center, Ra_2)
    m11 = m.dot(Ra_1, Rb_a1)
    m12 = m.dot(Ra_1, Rb_a2)
    m21 = m.dot(Ra_2, Rb_a1)
    m22 = m.dot(Ra_2, Rb_a2)
    k1 = m11 * Sb_a1
    k2 = m21 * Sb_a1
    k3 = m12 * Sb_a2
    k4 = m22 * Sb_a2
    quad = jnp.stack([
        jnp.stack([c1 - k1 - k3, c2 - k2 - k4], -1),
        jnp.stack([c1 - k1 + k3, c2 - k2 + k4], -1),
        jnp.stack([c1 + k1 + k3, c2 + k2 + k4], -1),
        jnp.stack([c1 + k1 - k3, c2 + k2 - k4], -1)], axis=-2)
    rect = jnp.stack([jnp.take_along_axis(Sa, code1[..., None], -1)[..., 0],
                      jnp.take_along_axis(Sa, code2[..., None], -1)[..., 0]],
                     axis=-1)

    ret, ret_valid = _clip_rect_quad(rect, quad)               # (..., 8, 2)

    det1 = 1.0 / jnp.where(jnp.abs(m11 * m22 - m12 * m21) > 0,
                           m11 * m22 - m12 * m21, 1.0)
    n11, n12, n21, n22 = m11 * det1, m12 * det1, m21 * det1, m22 * det1
    kk1 = (n22[..., None] * (ret[..., 0] - c1[..., None])
           - n12[..., None] * (ret[..., 1] - c2[..., None]))
    kk2 = (-n21[..., None] * (ret[..., 0] - c1[..., None])
           + n11[..., None] * (ret[..., 1] - c2[..., None]))
    point = (center[..., None, :]
             + kk1[..., None] * Rb_a1[..., None, :]
             + kk2[..., None] * Rb_a2[..., None, :])           # (..., 8, 3)
    Sa_N = jnp.take_along_axis(Sa, codeN[..., None], -1)
    dep = Sa_N - jnp.einsum('...i,...ki->...k', normal2, point)
    pen_valid = ret_valid & (dep >= 0)

    # compact penetrating points (order-preserving, like the in-place
    # cnum++ pass in the source)
    packed, packed_valid = _compact(
        jnp.concatenate([point, dep[..., None], ret], axis=-1),
        pen_valid, 8)
    point8 = packed[..., :3]
    dep8 = packed[..., 3]
    ret8 = packed[..., 4:6]
    cnum = jnp.sum(packed_valid.astype(jnp.int32), -1)

    # deepest point index (first max, like the source's > scan)
    dep_masked = jnp.where(packed_valid, dep8, -jnp.inf)
    i1 = jnp.argmax(dep_masked, -1).astype(jnp.int32)

    sel = _cull_points(ret8, packed_valid, dep8, i1)           # (..., 4)
    # cnum <= 4: identity selection 0..3 (use them all, source order)
    sel = jnp.where((cnum <= 4)[..., None],
                    jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32),
                                     sel.shape), sel)
    pts4 = jnp.take_along_axis(point8, sel[..., None], -2)
    dep4 = jnp.take_along_axis(dep8, sel, -1)
    act4 = jnp.take_along_axis(packed_valid, sel, -1)

    # world positions: + pa; for ref=box2 codes also shift by -normal*dep
    pts4 = pts4 + pa_f[..., None, :]
    pts4 = jnp.where(r1, pts4,
                     pts4 - normal[..., None, :] * dep4[..., None])

    # ---- merge face / edge cases
    edge_pt = pb_edge[..., None, :]
    slot0 = jnp.arange(4) == 0
    points = jnp.where(is_edge[..., None, None],
                       jnp.where(slot0[:, None], edge_pt,
                                 jnp.zeros_like(pts4)), pts4)
    depth = jnp.where(is_edge[..., None],
                      jnp.where(slot0, depth_axis[..., None], 0.0), dep4)
    active = jnp.where(is_edge[..., None], slot0 & True, act4)
    active = active & ~separated[..., None] & (code > 0)[..., None]
    return dict(points=points, depth=depth, normal=normal, active=active,
                overlap=jnp.any(active, -1), code=code)


# ---------------------------------------------------------------------------
# Component-form variant for the Pallas megakernel (ops/ctick.py)

def box_box_clamped_components(p1, R1, he1, p2, R2, he2):
    """dBoxBox in component form (ops/cvec conventions: Vec = tuple of 3
    scalar arrays, mats as rows R[r][c]) for the megakernel, with ONE
    documented approximation: the incident-face polygon CLIP
    (intersectRectQuad2 + cullPoints2) is replaced by CLAMPING the four
    incident-face corners into the reference rect.  For face-aligned
    impacts (the overwhelmingly common car-car bump) the clamped corners
    equal the clipped-and-culled points; they differ when the faces are
    rotated in-plane enough that the true overlap polygon is >4-sided.
    The 15-axis SAT (order, 1.05 edge fudge, strict-> tie-breaks), the
    edge-edge single contact, depths, and the point/normal conventions
    are exact (btBoxBoxDetector.cpp:267-728).

    he1/he2: STATIC tuples of 3 floats (margin-adjusted, same units as
    positions).  Returns dict(points=[4 Vecs] (addContactPoint
    positions), depth=[4 scalars], normal=Vec (box1 -> box2),
    active=[4 bools], overlap=bool).
    """
    from reinforcement_learning_tpu.ops import cvec as cv
    from reinforcement_learning_tpu.ops.cvec import (
        mcol, vadd, vcross, vdot, vneg, vnorm, vscale, vsub, vwhere, vzero)

    d = vsub(p2, p1)
    ax1 = [mcol(R1, i) for i in range(3)]
    ax2 = [mcol(R2, j) for j in range(3)]
    pp = [vdot(a, d) for a in ax1]
    qq = [vdot(a, d) for a in ax2]
    Rr = [[vdot(ax1[i], ax2[j]) for j in range(3)] for i in range(3)]
    Q = [[jnp.abs(Rr[i][j]) for j in range(3)] for i in range(3)]

    zero = jnp.zeros_like(pp[0])
    s = zero - jnp.inf
    code = jnp.zeros_like(pp[0], jnp.int32)
    invert = zero > 1.0
    separated = zero > 1.0
    axis = vzero(zero)

    def upd(take, cc, inv_new, ax_new, s2, s, code, invert, axis):
        # bool select as logical ops (Mosaic can't lower select_n on i1)
        return (jnp.where(take, s2, s), jnp.where(take, cc, code),
                (take & inv_new) | (~take & invert),
                vwhere(take, ax_new, axis))

    for i in range(3):
        e2 = he1[i] + sum(he2[j] * Q[i][j] for j in range(3))
        s2 = jnp.abs(pp[i]) - e2
        separated = separated | (s2 > 0)
        s, code, invert, axis = upd(s2 > s, i + 1, pp[i] < 0, ax1[i],
                                    s2, s, code, invert, axis)
    for j in range(3):
        e2 = sum(he1[i] * Q[i][j] for i in range(3)) + he2[j]
        s2 = jnp.abs(qq[j]) - e2
        separated = separated | (s2 > 0)
        s, code, invert, axis = upd(s2 > s, j + 4, qq[j] < 0, ax2[j],
                                    s2, s, code, invert, axis)
    Qf = [[Q[i][j] + FUDGE2 for j in range(3)] for i in range(3)]
    for i in range(3):
        i1, i2 = [k for k in range(3) if k != i]
        for j in range(3):
            j1, j2 = [k for k in range(3) if k != j]
            expr1 = pp[i2] * Rr[i1][j] - pp[i1] * Rr[i2][j]
            e2 = (he1[i1] * Qf[i2][j] + he1[i2] * Qf[i1][j]
                  + he2[j1] * Qf[i][j2] + he2[j2] * Qf[i][j1])
            s2 = jnp.abs(expr1) - e2
            separated = separated | (s2 > SIMD_EPSILON)
            axv = vcross(ax1[i], ax2[j])
            length = vnorm(axv)
            ok = length > SIMD_EPSILON
            s2n = s2 / jnp.maximum(length, SIMD_EPSILON)
            axn = vscale(axv, 1.0 / jnp.maximum(length, SIMD_EPSILON))
            s, code, invert, axis = upd(ok & (s2n * FUDGE_FACTOR > s),
                                        7 + 3 * i + j, expr1 < 0, axn,
                                        s2n, s, code, invert, axis)

    normal = vwhere(invert, vneg(axis), axis)
    is_edge = code > 6
    depth_axis = -s

    # ---- edge-edge single contact
    pa_e = p1
    for jax_ in range(3):
        sg = jnp.where(vdot(normal, ax1[jax_]) > 0, 1.0, -1.0)
        pa_e = vadd(pa_e, vscale(ax1[jax_], sg * he1[jax_]))
    pb_e = p2
    for jax_ in range(3):
        sg = jnp.where(vdot(normal, ax2[jax_]) > 0, -1.0, 1.0)
        pb_e = vadd(pb_e, vscale(ax2[jax_], sg * he2[jax_]))
    ecode = jnp.maximum(code - 7, 0)

    def sel_axis(axes, idx):
        out = vzero(zero)
        for k in range(3):
            out = vwhere(idx == k, axes[k], out)
        return out

    ua = sel_axis(ax1, ecode // 3)
    ub = sel_axis(ax2, ecode % 3)
    pd = vsub(pb_e, pa_e)
    uaub = vdot(ua, ub)
    q1 = vdot(ua, pd)
    q2 = -vdot(ub, pd)
    dd = 1.0 - uaub * uaub
    good = dd > 1e-4
    ddi = 1.0 / jnp.where(good, dd, 1.0)
    beta = jnp.where(good, (uaub * q1 + q2) * ddi, 0.0)
    edge_pt = vadd(pb_e, vscale(ub, beta))

    # ---- face manifold via clamped incident corners
    def face_branch(axa, pa, Sa, axb, pb, Sb, normal2, base):
        nr = [vdot(a, normal2) for a in axb]
        anr = [jnp.abs(x) for x in nr]
        lanr = jnp.where(anr[1] > anr[0],
                         jnp.where(anr[1] > anr[2], 1, 2),
                         jnp.where(anr[0] > anr[2], 0, 2))
        a1 = jnp.where(lanr == 0, 1, 0)
        a2 = jnp.where(lanr == 2, 1, 2)

        def sel_s(vals, idx):
            out = zero
            for k in range(3):
                out = jnp.where(idx == k, vals[k], out)
            return out

        nr_l = sel_s(nr, lanr)
        Sb_l = sel_s([Sb[k] + zero for k in range(3)], lanr)
        Rb_l = sel_axis(axb, lanr)
        center = vadd(vsub(pb, pa),
                      vscale(Rb_l, jnp.where(nr_l < 0, Sb_l, -Sb_l)))
        codeN = code - base
        code1 = jnp.where(codeN == 0, 1, 0)
        code2 = jnp.where(codeN == 2, 1, 2)
        Ra1 = sel_axis(axa, code1)
        Ra2 = sel_axis(axa, code2)
        Rba1 = sel_axis(axb, a1)
        Rba2 = sel_axis(axb, a2)
        Sba1 = sel_s([Sb[k] + zero for k in range(3)], a1)
        Sba2 = sel_s([Sb[k] + zero for k in range(3)], a2)
        c1 = vdot(center, Ra1)
        c2 = vdot(center, Ra2)
        m11 = vdot(Ra1, Rba1)
        m12 = vdot(Ra1, Rba2)
        m21 = vdot(Ra2, Rba1)
        m22 = vdot(Ra2, Rba2)
        k1 = m11 * Sba1
        k2 = m21 * Sba1
        k3 = m12 * Sba2
        k4 = m22 * Sba2
        corners = [(c1 - k1 - k3, c2 - k2 - k4),
                   (c1 - k1 + k3, c2 - k2 + k4),
                   (c1 + k1 + k3, c2 + k2 + k4),
                   (c1 + k1 - k3, c2 + k2 - k4)]
        r1v = sel_s([Sa[k] + zero for k in range(3)], code1)
        r2v = sel_s([Sa[k] + zero for k in range(3)], code2)
        SaN = sel_s([Sa[k] + zero for k in range(3)], codeN)
        det = m11 * m22 - m12 * m21
        deti = 1.0 / jnp.where(jnp.abs(det) > 0, det, 1.0)
        pts, deps = [], []
        for (qx, qy) in corners:
            qx = jnp.clip(qx, -r1v, r1v)
            qy = jnp.clip(qy, -r2v, r2v)
            kk1 = (m22 * (qx - c1) - m12 * (qy - c2)) * deti
            kk2 = (-m21 * (qx - c1) + m11 * (qy - c2)) * deti
            # second projection: keep the point on the incident face
            # rect too (the rect clamp alone can leave the quad), which
            # bounds the clamp-vs-clip depth error to deep skewed
            # overlaps that car gameplay does not produce
            kk1 = jnp.clip(kk1, -Sba1, Sba1)
            kk2 = jnp.clip(kk2, -Sba2, Sba2)
            pt = vadd(center, vscale(Rba1, kk1), vscale(Rba2, kk2))
            dep = SaN - vdot(normal2, pt)
            pts.append(vadd(pt, pa))
            deps.append(dep)
        return pts, deps

    pts_a, deps_a = face_branch(ax1, p1, he1, ax2, p2, he2, normal, 1)
    pts_b, deps_b = face_branch(ax2, p2, he2, ax1, p1, he1, vneg(normal), 4)
    ref_is_1 = code <= 3
    points, depth, active = [], [], []
    for k in range(4):
        # ref=box2 codes shift the reported point by -normal*dep
        pb_shift = vsub(pts_b[k], vscale(normal, deps_b[k]))
        pt = vwhere(ref_is_1, pts_a[k], pb_shift)
        dp = jnp.where(ref_is_1, deps_a[k], deps_b[k])
        if k == 0:
            pt = vwhere(is_edge, edge_pt, pt)
            dp = jnp.where(is_edge, depth_axis, dp)
            act = is_edge | (~is_edge & (dp >= 0))
        else:
            act = (~is_edge) & (dp >= 0)
        act = act & ~separated & (code > 0)
        points.append(pt)
        depth.append(dp)
        active.append(act)
    overlap = active[0]
    for k in range(1, 4):
        overlap = overlap | active[k]
    return dict(points=points, depth=depth, normal=normal, active=active,
                overlap=overlap, code=code)
