"""The physics tick in component form — the body of the Pallas megakernel.

This is the TPU-kernel twin of ``physics/step.arena_tick`` (which remains
the XLA-path oracle): identical update order and formulas (reference:
Arena::Step, Arena.cpp:716-812; Car.cpp:58-193; btVehicleRL.cpp), but every
array is laid out for Mosaic:

  * per-car fields:   shape ``(C,) + S``  (C = cars/arena, S = env tiles)
  * per-env fields:   shape ``S``
  * vectors/matrices: component tuples (see ops/cvec.py)
  * wheels, planes, pads, car pairs: static python loops (no gathers)

The whole state lives in one flat dict so a ``lax.fori_loop`` can carry it
through ``tick_skip`` ticks inside a single kernel.  Teams are compile-time
constants.  The only randomness (demo respawn location) is hoisted: the
caller passes one pre-drawn respawn index per car per step.

Differences from the XLA path, by design:
  * respawn location uses one draw per step instead of per tick (a car can
    respawn at most once per 8-tick step — the demo timer is 3 s);
  * full-fidelity mode collides against the closed-form facet arena with
    kernel-shaped manifold bookkeeping (PARITY.md "Megakernel path");
  * no other semantic differences; tests assert trajectory equality
    (plane mode exact; mesh mode behavioral).

Source-of-truth policy (two tick implementations exist on purpose):
``physics/step.py`` + ``physics/contacts.py`` are CANONICAL — they are
the oracle-parity engine, validated tick-for-tick against the compiled
reference (tools/parity_battery).  This module is their kernel-layout
twin; any physics change lands in the canonical files first and is
mirrored here, with tests/test_ctick.py asserting the trajectories stay
in lockstep.  Game constants live once in constants.py, and the facet
geometry formulas live once in physics/facet_arena.py (shared by both).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu.physics import arena_geom as geom
from reinforcement_learning_tpu.physics import formulas
from reinforcement_learning_tpu.ops import cvec as cv
from reinforcement_learning_tpu.ops.cvec import (
    vadd, vcross, vdot, vnorm, vnormalize, vscale, vsub, vwhere, vzero)

THROTTLE, STEER, PITCH, YAW, ROLL, JUMP, BOOST, HANDBRAKE = range(8)


# ---------------------------------------------------------------------------
# Static per-compile constants

@dataclasses.dataclass(frozen=True)
class TickConsts:
    """Everything the tick needs as plain python floats/tuples (folded into
    the kernel at trace time).  Built from ArenaParams by make_consts."""
    num_cars: int
    teams: tuple            # per-slot team id (0/1)
    dt: float
    mut: object             # MutatorConfig (static dataclass)
    half_extents: tuple     # (3,)
    hitbox_offset: tuple    # (3,)
    inv_i_local: tuple      # (3,) diagonal inverse inertia (BT units)
    he_eff_bt: tuple        # (3,) margin-adjusted half extents (BT)
    wheel_offsets: tuple    # (4, 3)
    wheel_radii: tuple      # (4,)
    sus_rest: tuple         # (4,)
    sus_force_scale: tuple  # (4,)
    planes: tuple           # ((nx, ny, nz, d), ...) — arena_geom._PLANES
    corners_local: tuple    # (8, 3) hitbox corners (local, incl. offset)
    pad_locs: tuple         # (34, 3)
    pad_is_big: tuple       # (34,)
    respawn_table: tuple    # (K, 3): x, y, yaw
    # Full-fidelity configuration (step.ArenaParams.use_mesh /
    # dynamic_wheel_rays): collide against the closed-form facet arena
    # (physics/facet_arena.py — the procedural mesh's exact surfaces,
    # gather-free) + the 4 true static planes, and let wheel rays hit the
    # ball / other cars.
    use_mesh: bool = False
    dynamic_rays: bool = False
    facets: object = None   # facet_arena.FacetTables when use_mesh
    game_mode: str = "soccar"   # soccar | heatseeker | snowday (kernel)


def make_consts(params, teams) -> TickConsts:
    """params: physics.step.ArenaParams; teams: per-slot ints."""
    from reinforcement_learning_tpu.physics import arena_geom as geom

    cfg = params.car_config
    mut = params.mutators
    size = np.asarray(cfg.hitbox_size, np.float64)
    inv_i = formulas.box_inv_inertia_diag_bt(mut.car_mass, size)

    he = size / 2.0
    off = np.asarray(cfg.hitbox_offset, np.float64)
    corners = [(off[0] + sx * he[0], off[1] + sy * he[1], off[2] + sz * he[2])
               for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]

    use_mesh = bool(getattr(params, "use_mesh", False))
    facets = None
    if use_mesh:
        from reinforcement_learning_tpu.physics import facet_arena
        facets = facet_arena.tables()
    return TickConsts(
        num_cars=params.num_cars,
        teams=tuple(int(t) for t in np.asarray(teams)),
        dt=float(params.dt),
        mut=mut,
        half_extents=tuple(he),
        hitbox_offset=tuple(off),
        inv_i_local=tuple(float(v) for v in inv_i),
        he_eff_bt=tuple(
            float(v)
            for v in formulas.box_effective_half_extents_bt(size)),
        wheel_offsets=tuple(map(tuple, cfg.wheel_offsets())),
        wheel_radii=tuple(float(r) for r in cfg.wheel_radii()),
        sus_rest=tuple(float(r) for r in cfg.sus_rest_lengths()),
        sus_force_scale=tuple(float(r) for r in cfg.sus_force_scales()),
        planes=tuple(map(tuple, np.asarray(geom._PLANES, np.float64))),
        corners_local=tuple(corners),
        pad_locs=tuple(map(tuple, np.asarray(C.BOOST_PAD_LOCS_SOCCAR))),
        pad_is_big=tuple(bool(b) for b in C.BOOST_PAD_IS_BIG),
        respawn_table=tuple(map(tuple,
                                np.asarray(C.CAR_RESPAWN_LOCATIONS_SOCCAR))),
        use_mesh=use_mesh,
        dynamic_rays=bool(getattr(params, "dynamic_wheel_rays", False)),
        facets=facets,
        game_mode=str(getattr(params, "game_mode", "soccar")),
    )


# Plane indices (mirror arena_geom)
_FLOOR, _CEIL, _WXN, _WXP, _WYN, _WYP = range(6)
_GXN, _GXP, _GCEIL, _NYN, _NYP = 10, 11, 12, 13, 14


def _plane_validity(k: TickConsts, pos):
    """Per-plane validity masks for a query at ``pos`` (Vec).  Mirrors
    arena_geom.plane_validity.  Returns a list of 15 bool arrays (or True
    for unconditional planes)."""
    x, y, z = pos
    in_goal_xz = (jnp.abs(x) < C.GOAL_HALF_WIDTH) & (z < C.GOAL_HEIGHT)
    behind = jnp.abs(y) > C.ARENA_EXTENT_Y
    valid = [True] * len(k.planes)
    valid[_WYN] = ~(in_goal_xz & (y < 0))
    valid[_WYP] = ~(in_goal_xz & (y > 0))
    valid[_GXN] = behind
    valid[_GXP] = behind
    valid[_GCEIL] = behind
    valid[_NYN] = y < 0
    valid[_NYP] = y > 0
    return valid


def _plane_dist(plane, pos):
    nx, ny, nz, d = plane
    return nx * pos[0] + ny * pos[1] + nz * pos[2] + d


def _world_plane_ids(k: TickConsts):
    """Plane indices live in the world: in mesh mode only the 4 true
    btStaticPlaneShapes (floor/ceiling/side walls) — everything else comes
    from the facet arena (reference: Arena.cpp:1060-1100)."""
    if k.use_mesh:
        return (geom.FLOOR, geom.CEILING, geom.WALL_XN, geom.WALL_XP)
    return tuple(range(len(k.planes)))


def _raycast(k: TickConsts, start, direction, max_len):
    """Raycast against the arena planes (mirrors geom.raycast_down_dir;
    true planes only in mesh mode — the facet raycast covers the rest).
    start/direction: Vec; returns (hit, dist, normal Vec)."""
    valid = _plane_validity(k, start)
    big = jnp.full_like(start[0], 1e30)
    t_min = big
    nx = jnp.zeros_like(start[0])
    ny = jnp.zeros_like(start[0])
    nz = jnp.zeros_like(start[0])
    for p in _world_plane_ids(k):
        plane = k.planes[p]
        pn = plane[:3]
        dist_p = _plane_dist(plane, start)
        denom = -(direction[0] * pn[0] + direction[1] * pn[1]
                  + direction[2] * pn[2])
        ok = denom > 1e-6
        t = jnp.where(ok, dist_p / jnp.maximum(denom, 1e-6), big)
        t = jnp.where(valid[p] & (t >= 0) if valid[p] is not True
                      else (t >= 0), t, big)
        closer = t < t_min
        nx = jnp.where(closer, pn[0], nx)
        ny = jnp.where(closer, pn[1], ny)
        nz = jnp.where(closer, pn[2], nz)
        t_min = jnp.minimum(t_min, t)
    hit = t_min <= max_len
    dist = jnp.where(hit, t_min, max_len)
    return hit, dist, (nx, ny, nz)


def _iw_vec(iw, a):
    """Apply 3x3 matrix (nested tuple) to Vec."""
    return cv.matvec(iw, a)


def _restitution_rhs(rel_vel, combined_restitution):
    """Twin of contacts._restitution_rhs (0.2 bt/s threshold)."""
    rest = combined_restitution * -rel_vel
    rest = jnp.where(jnp.abs(rel_vel) < 0.2, 0.0, rest)
    return jnp.maximum(rest, 0.0)


def _contact_vs_static(vel_bt, ang_vel, r_bt, n, inv_mass, inv_iw,
                       restitution_coeff, friction_coeff,
                       vel_pre_bt=None, ang_vel_pre=None,
                       iterations: int = 1):
    """Component twin of contacts._contact_impulse_vs_static.
    Returns (dv Vec (bt), dw Vec, j_n).  ``vel_pre_bt``/``ang_vel_pre``:
    velocities BEFORE this tick's force integration — restitution reads
    them (bullet's externalForceImpulse split).  ``iterations``: repeats
    of the sequential normal+friction accumulator pair (Bullet: 10; one
    pass is exact for sphere contacts)."""
    vel_at = vadd(vel_bt, vcross(ang_vel, r_bt))
    rel_vel = vdot(n, vel_at)

    torque_axis = vcross(r_bt, n)
    ang_comp = _iw_vec(inv_iw, torque_axis)
    denom = jnp.maximum(inv_mass + vdot(n, vcross(ang_comp, r_bt)), 1e-12)

    if vel_pre_bt is None:
        rel_vel_rest = rel_vel
    else:
        wpre = ang_vel if ang_vel_pre is None else ang_vel_pre
        rel_vel_rest = vdot(n, vadd(vel_pre_bt, vcross(wpre, r_bt)))
    rest = _restitution_rhs(rel_vel_rest, restitution_coeff)

    # Friction direction fixed at SETUP from the pre-solve velocity
    # (bullet setupContactConstraint); magnitude rows see running vel.
    tang = vsub(vel_at, vscale(n, vdot(n, vel_at)))
    t_len = vnorm(tang)
    t_dir = vwhere(t_len > 1e-9, vscale(tang, 1.0 / jnp.maximum(t_len, 1e-9)),
                   vzero(t_len))
    t_axis = vcross(r_bt, t_dir)
    t_ang = _iw_vec(inv_iw, t_axis)
    t_denom = jnp.maximum(inv_mass + vdot(t_dir, vcross(t_ang, r_bt)), 1e-12)

    dv = vzero(rel_vel)
    dw = vzero(rel_vel)
    j_n = jnp.zeros_like(rel_vel)
    j_t = jnp.zeros_like(rel_vel)
    for _ in range(iterations):
        v_at = vadd(vadd(vel_bt, dv), vcross(vadd(ang_vel, dw), r_bt))
        dj = (rest - vdot(n, v_at)) / denom
        new_acc = jnp.maximum(j_n + dj, 0.0)
        imp = vscale(n, new_acc - j_n)
        dv = vadd(dv, vscale(imp, inv_mass))
        dw = vadd(dw, _iw_vec(inv_iw, vcross(r_bt, imp)))
        j_n = new_acc

        v_at = vadd(vadd(vel_bt, dv), vcross(vadd(ang_vel, dw), r_bt))
        djt = -vdot(t_dir, v_at) / t_denom
        lim = friction_coeff * j_n
        new_t = jnp.clip(j_t + djt, -lim, lim)
        imp_t = vscale(t_dir, new_t - j_t)
        dv = vadd(dv, vscale(imp_t, inv_mass))
        dw = vadd(dw, _iw_vec(inv_iw, vcross(r_bt, imp_t)))
        j_t = new_t
    return dv, dw, j_n


# ---------------------------------------------------------------------------
# Facet-arena contacts (mesh mode; physics/facet_arena.py supplies the
# closed-form per-facet formulas — one source of truth with the XLA tests)

def _keep_diverse4_stacked(d, pays, px, py, pz):
    """Bullet-flavoured 4-slot retention: deepest first, then greedy
    max-dispersion over the contact-point coordinates (px, py, pz) —
    the stacked-reduction stand-in for btPersistentManifold's
    sortCachedPoints (keep the deepest, then maximize the spanned
    area).  With <= 4 live candidates every one is kept (multiplicity
    preserved — the goal-mouth net bounce); with more, the spread
    criterion dedups near-coincident duplicates the way the area term
    does (the ramp-ride manifolds).  d: (K,)+S distances with inactive
    pre-masked to 1e30; pays: list of (K,)+S payloads."""
    big = jnp.float32(1e30)
    K = d.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (K,) + d.shape[1:], 0)
    avail = d < big
    mind = jnp.full_like(d, jnp.inf)
    slot_d, slot_occ, slot_pay = [], [], []
    for s in range(4):
        if s == 0:
            dm = jnp.where(avail, d, big)
            dmin = jnp.min(dm, axis=0)
            hit = dm == dmin[None]
            occ = dmin < big
        else:
            score = jnp.where(avail, mind, -jnp.inf)
            smax = jnp.max(score, axis=0)
            hit = score == smax[None]
            occ = jnp.isfinite(smax)
        first = jnp.min(jnp.where(hit & avail, iota, K), axis=0)
        one = iota == first[None]
        onef = one.astype(d.dtype)
        pick = lambda pp: jnp.sum(pp * onef, axis=0)
        slot_d.append(jnp.where(occ, pick(d), big))
        slot_occ.append(occ)
        slot_pay.append(tuple(jnp.where(occ, pick(pp),
                                        jnp.zeros_like(pick(pp)))
                              for pp in pays))
        nxp, nyp, nzp = pick(px), pick(py), pick(pz)
        dd = ((px - nxp[None]) ** 2 + (py - nyp[None]) ** 2
              + (pz - nzp[None]) ** 2)
        mind = jnp.where(occ[None], jnp.minimum(mind, dd), mind)
        avail = avail & ~one
    return slot_d, slot_occ, slot_pay


def _facet_sphere_manifold(k: TickConsts, pos, radius, break_gap):
    """Ball vs the facet arena: 4 retained contacts.
    Returns list of 4 (n Vec, gap, occ).

    Candidates include the tessellation-seam duplicates
    (facet_arena.sphere_contacts) and the floor/ceiling grid-triangle
    regions (sheet_sphere_contacts) — the duplicate rows weight the
    merged special contact's average normal exactly like the reference's
    per-triangle manifold (ramp rides, goal-mouth net bounces)."""
    from reinforcement_learning_tpu.physics import facet_arena as fa
    from reinforcement_learning_tpu.physics.mesh import (
        CEILING_FILLET_RADIUS, FLOOR_FILLET_RADIUS)
    big = jnp.float32(1e30)
    nx_s, ny_s, nz_s, gap_s, act_s = fa.sphere_contacts(
        pos[0], pos[1], pos[2], radius, break_gap, tab=k.facets)
    d_parts = [jnp.where(act_s, gap_s, big)]
    pay_parts = [[nx_s, ny_s, nz_s, gap_s]]
    H = C.ARENA_HEIGHT
    tail = gap_s.shape[1:]
    for z0, up, inset in ((0.0, 1.0, FLOOR_FILLET_RADIUS),
                          (H, -1.0, CEILING_FILLET_RADIUS)):
        for nx, ny, nz, cx, cy, gap, act in fa.sheet_sphere_contacts(
                pos[0], pos[1], pos[2], radius, break_gap, z0, up):
            act = act & fa.sheet_clip_ok(k.facets, cx, cy, inset)
            bt = lambda a: jnp.broadcast_to(a, tail)[None]
            d_parts.append(bt(jnp.where(act, gap, big)))
            pay_parts.append([bt(nx), bt(ny), bt(nz), bt(gap)])
    d = jnp.concatenate(d_parts)
    pays = [jnp.concatenate([pp[i] for pp in pay_parts]) for i in range(4)]
    # retention disperses over localPointA = -n * radius (bullet's area
    # heuristic operates on the contact points; for a sphere those are
    # the normals scaled by the radius)
    slot_d, slot_occ, slot_pay = _keep_diverse4_stacked(
        d, pays, pays[0], pays[1], pays[2])
    return [((p[0], p[1], p[2]), p[3], occ)
            for p, occ in zip(slot_pay, slot_occ)]


def _facet_box_manifold(k: TickConsts, st, brk):
    """Car hitbox vs the facet arena: 4 retained face-based contacts.
    Returns list of 4 (n Vec, sup Vec, dist, occ).

    The candidate set includes FLOOR/CEILING per-triangle-region
    contacts (facet_arena.sheet_box_contacts): the real mesh duplicates
    the infinite planes with floor/ceiling grid triangles, and the
    reference resolves a landing through one GJK contact PER overlapping
    triangle — the deepest support clamped into each region, a hovering
    corner's projection, or the closest box edge against a tessellation
    seam line — PLUS the plane's single support vertex (oracle: the
    rolling side landing of PARITY.md gets its dominant impulse from a
    y=0 grid-seam contact).  Round 4's per-corner approximation put rows
    at BOTH endpoints of a landing edge, which flattened edge-on side
    landings (air_roll 663 uu/s); this per-region form reproduces
    box_tri's actual witnesses."""
    from reinforcement_learning_tpu.physics import facet_arena as fa
    from reinforcement_learning_tpu.physics.mesh import (
        CEILING_FILLET_RADIUS, FLOOR_FILLET_RADIUS)
    big = jnp.float32(1e30)
    box_center = vadd(st['pos'], cv.matvec(st['rot'],
                                           cv.vconst(k.hitbox_offset,
                                                     st['pos'][0])))
    nx_s, ny_s, nz_s, px_s, py_s, pz_s, dist_s, act_s = fa.box_contacts(
        box_center[0], box_center[1], box_center[2],
        st['rot'], k.half_extents, brk, tab=k.facets)
    d_parts = [jnp.where(act_s, dist_s, big)]
    pay_parts = [[nx_s, ny_s, nz_s, px_s, py_s, pz_s, dist_s]]
    tail = dist_s.shape[1:]
    H = C.ARENA_HEIGHT
    he = k.half_extents
    off = k.hitbox_offset
    core_m = C.MESH_COLLISION_MARGIN
    dist_m = min(C.MESH_COLLISION_MARGIN,
                 0.1 * float(np.min(np.asarray(he))))
    for z0, up, inset in ((0.0, 1.0, FLOOR_FILLET_RADIUS),
                          (H, -1.0, CEILING_FILLET_RADIUS)):
        rows = fa.sheet_box_contacts(
            st['pos'][0], st['pos'][1], st['pos'][2], st['rot'], he, off,
            z0, up, core_m, dist_m, brk)
        for nx, ny, nz, cx, cy, cz, dist, act in rows:
            act = act & fa.sheet_clip_ok(k.facets, cx, cy, inset)
            # lever arms use positionWorldOnA (= posB + n*dist, on the
            # car), like resolve_car_world_mesh
            bt = lambda a: jnp.broadcast_to(a, tail)[None]
            d_parts.append(bt(jnp.where(act, dist, big)))
            pay_parts.append([bt(nx), bt(ny), bt(nz), bt(cx), bt(cy),
                              bt(cz + nz * dist), bt(dist)])
    d = jnp.concatenate(d_parts)
    pays = [jnp.concatenate([pp[i] for pp in pay_parts]) for i in range(7)]
    # retention disperses over positionWorldOnA (bullet's area heuristic)
    slot_d, slot_occ, slot_pay = _keep_diverse4_stacked(
        d, pays, pays[3], pays[4], pays[5])
    return [((p[0], p[1], p[2]), (p[3], p[4], p[5]), p[6], occ)
            for p, occ in zip(slot_pay, slot_occ)]


def _plane_space_k(n):
    """bullet btPlaneSpace1 first tangent (twin of
    contacts._plane_space_dir)."""
    nz_big = jnp.abs(n[2]) > 0.70710678
    a = n[1] * n[1] + n[2] * n[2]
    k1 = 1.0 / jnp.sqrt(jnp.maximum(a, 1e-12))
    t1 = (jnp.zeros_like(k1), -n[2] * k1, n[1] * k1)
    b = n[0] * n[0] + n[1] * n[1]
    k2 = 1.0 / jnp.sqrt(jnp.maximum(b, 1e-12))
    t2 = (-n[1] * k2, n[0] * k2, jnp.zeros_like(k2))
    return vwhere(nz_big, t1, t2)


def _pgs_rows_k(k: TickConsts, vel_bt, ang_vel, rows, inv_mass, inv_iw,
                restitution, friction, vel_pre_bt, ang_vel_pre,
                iterations: int = 10):
    """Component twin of contacts.pgs_rows_vs_static: bullet-order PGS
    over a static list of contact rows of one body vs the static world.

    rows: list of (n Vec, r Vec (bt), dist_bt, act).  Returns (dv Vec bt,
    dw Vec, push Vec bt, turn Vec)."""
    dt = k.dt
    setup = []
    for n, r, dist_bt, act in rows:
        torque_axis = vcross(r, n)
        ang_comp = _iw_vec(inv_iw, torque_axis)
        jac_inv = 1.0 / jnp.maximum(
            inv_mass + vdot(n, vcross(ang_comp, r)), 1e-12)
        wpre = ang_vel if ang_vel_pre is None else ang_vel_pre
        rel_rest = vdot(n, vadd(vel_pre_bt, vcross(wpre, r)))
        rest = _restitution_rhs(rel_rest, restitution)
        vel_at = vadd(vel_bt, vcross(ang_vel, r))
        tang = vsub(vel_at, vscale(n, vdot(n, vel_at)))
        t_len = vnorm(tang)
        t_dir = vwhere(t_len > 1.49e-8,
                       vscale(tang, 1.0 / jnp.maximum(t_len, 1e-12)),
                       _plane_space_k(n))
        t_axis = vcross(r, t_dir)
        t_ang = _iw_vec(inv_iw, t_axis)
        t_jac_inv = 1.0 / jnp.maximum(
            inv_mass + vdot(t_dir, vcross(t_ang, r)), 1e-12)
        push_target = jnp.maximum(-dist_bt, 0.0) * (C.SOLVER_ERP2 / dt)
        actf = act.astype(jac_inv.dtype)
        setup.append((n, r, jac_inv, rest, t_dir, t_jac_inv, push_target,
                      actf))

    zero3 = vzero(vel_bt[0])
    zeroR = tuple(jnp.zeros_like(vel_bt[0]) for _ in rows)

    def _vel_iter(_, carry):
        dv, dw, j_n, j_t = carry
        j_n, j_t = list(j_n), list(j_t)
        for i, (n, r, jac_inv, rest, t_dir, t_jac_inv, _pt, actf) in \
                enumerate(setup):
            rel = vdot(n, vadd(vadd(vel_bt, dv),
                               vcross(vadd(ang_vel, dw), r)))
            dj = (rest - rel) * jac_inv
            new_acc = jnp.maximum(j_n[i] + dj, 0.0)
            dj = (new_acc - j_n[i]) * actf
            imp = vscale(n, dj)
            dv = vadd(dv, vscale(imp, inv_mass))
            dw = vadd(dw, _iw_vec(inv_iw, vcross(r, imp)))
            j_n[i] = j_n[i] + dj
        for i, (n, r, jac_inv, rest, t_dir, t_jac_inv, _pt, actf) in \
                enumerate(setup):
            rel = vdot(t_dir, vadd(vadd(vel_bt, dv),
                                   vcross(vadd(ang_vel, dw), r)))
            dj = -rel * t_jac_inv
            lim = friction * j_n[i]
            new_acc = jnp.clip(j_t[i] + dj, -lim, lim)
            dj = (new_acc - j_t[i]) * actf
            dj = jnp.where(j_n[i] > 0, dj, 0.0)
            imp = vscale(t_dir, dj)
            dv = vadd(dv, vscale(imp, inv_mass))
            dw = vadd(dw, _iw_vec(inv_iw, vcross(r, imp)))
            j_t[i] = j_t[i] + dj
        return dv, dw, tuple(j_n), tuple(j_t)

    dv, dw, _, _ = jax.lax.fori_loop(
        0, iterations, _vel_iter, (zero3, zero3, zeroR, zeroR))

    def _pos_iter(_, carry):
        pv, pw, j_p = carry
        j_p = list(j_p)
        for i, (n, r, jac_inv, _rest, _td, _tj, push_target, actf) in \
                enumerate(setup):
            rel = vdot(n, vadd(pv, vcross(pw, r)))
            dj = (push_target - rel) * jac_inv
            new_acc = jnp.maximum(j_p[i] + dj, 0.0)
            dj = (new_acc - j_p[i]) * actf
            imp = vscale(n, dj)
            pv = vadd(pv, vscale(imp, inv_mass))
            pw = vadd(pw, _iw_vec(inv_iw, vcross(r, imp)))
            j_p[i] = j_p[i] + dj
        return pv, pw, tuple(j_p)

    pv, pw, _ = jax.lax.fori_loop(0, iterations, _pos_iter,
                                  (zero3, zero3, zeroR))
    push = vscale(pv, dt)
    turn = vscale(pw, C.SPLIT_IMPULSE_TURN_ERP * dt)
    return dv, dw, push, turn


# ---------------------------------------------------------------------------
# Suspension raycasts + friction (btVehicleRL; twin of physics/car.py)

def _ray_sphere_k(o, d, max_len, center, radius):
    """car._ray_sphere twin: (hit, t)."""
    oc = vsub(o, center)
    b = vdot(oc, d)
    c2 = vdot(oc, oc) - radius * radius
    disc = b * b - c2
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    hit = (disc > 0.0) & (c2 > 0.0) & (t >= 0.0) & (t <= max_len)
    return hit, jnp.where(hit, t, max_len)


def _ray_obb_k(o, d, max_len, box_center, box_rot, he):
    """car._ray_obb twin (slab method): (hit, t, normal Vec)."""
    lo = cv.mat_t_vec(box_rot, vsub(o, box_center))
    ld = cv.mat_t_vec(box_rot, d)
    tmin = jnp.full_like(o[0], -jnp.inf)
    tmax = jnp.full_like(o[0], jnp.inf)
    entry_ax = jnp.zeros_like(o[0], jnp.int32)
    sign = jnp.zeros_like(o[0])
    inside_all = jnp.ones_like(o[0], dtype=bool)
    for ax in range(3):
        safe = jnp.where(jnp.abs(ld[ax]) > 1e-9, ld[ax], 1e-9)
        t1 = (-he[ax] - lo[ax]) / safe
        t2 = (he[ax] - lo[ax]) / safe
        tmin_ax = jnp.minimum(t1, t2)
        tmax_ax = jnp.maximum(t1, t2)
        inside = (jnp.abs(lo[ax]) <= he[ax]) | (jnp.abs(ld[ax]) > 1e-9)
        inside_all &= inside
        better = tmin_ax > tmin
        entry_ax = jnp.where(better, ax, entry_ax)
        sign = jnp.where(better, -jnp.sign(ld[ax]), sign)
        tmin = jnp.maximum(tmin, tmin_ax)
        tmax = jnp.minimum(tmax, jnp.where(inside, tmax_ax, jnp.inf))
    hit = (tmax >= tmin) & (tmax >= 0.0) & (tmin >= 0.0) \
        & (tmin <= max_len) & inside_all
    n_local = tuple(jnp.where(entry_ax == ax, sign, 0.0) for ax in range(3))
    return hit, jnp.where(hit, tmin, max_len), cv.matvec(box_rot, n_local)


def _wheel_raycasts(k: TickConsts, st, inv_iw):
    """Per-wheel raycast data.  Returns a dict of lists (len 4):
    hit, in_world, contact_point (Vec), normal (Vec), susp_len,
    susp_rel_vel, clipped_inv_dot, extra_pushback, hard_point (Vec),
    ground_idx (-1 static, -2 ball, >=0 other car).

    Mesh mode raycasts the facet arena alongside the true planes; with
    dynamic rays the ball and other (alive) cars are overlaid like the
    reference's suspension-grid dynamic-object update (Arena.cpp:733-750,
    btVehicleRL.cpp:149-151)."""
    mut = k.mut
    dt = k.dt
    Cn = k.num_cars
    up = cv.up(st['rot'])
    wheel_dir = cv.vneg(up)
    sus_sub_uu = C.BTVehicle.SUSPENSION_SUBTRACTION * C.BT_TO_UU
    travel = C.BTVehicle.MAX_SUSPENSION_TRAVEL
    alive = ~st['is_demoed']
    if k.dynamic_rays:
        box_center = vadd(st['pos'], cv.matvec(
            st['rot'], cv.vconst(k.hitbox_offset, st['pos'][0])))
    out = dict(hit=[], in_world=[], cp=[], n=[], susp_len=[],
               susp_rel_vel=[], clipped_inv=[], extra_push=[], hard=[],
               ground_idx=[])
    for w in range(4):
        rest_len = k.sus_rest[w]
        radius = k.wheel_radii[w]
        hard = vadd(st['pos'], cv.matvec(st['rot'],
                                         cv.vconst(k.wheel_offsets[w],
                                                   st['pos'][0])))
        ray_len = rest_len + travel + radius - sus_sub_uu
        hit, dist, n = _raycast(k, hard, wheel_dir, ray_len)
        if k.use_mesh:
            from reinforcement_learning_tpu.physics import facet_arena as fa
            fdist, fnx, fny, fnz, fhit = fa.raycasts(
                hard[0], hard[1], hard[2],
                wheel_dir[0], wheel_dir[1], wheel_dir[2], ray_len,
                tab=k.facets)
            closer = fhit & (fdist < dist)
            hit = hit | fhit
            dist = jnp.where(closer, fdist, dist)
            n = vwhere(closer, (fnx, fny, fnz), n)
        ground_idx = jnp.full_like(hit, -1, jnp.int32)
        if k.dynamic_rays:
            # ball
            bhit, bt = _ray_sphere_k(hard, wheel_dir, ray_len,
                                     cv.vbroadcast(st['ball_pos'],
                                                   hard[0].shape),
                                     mut.ball_radius)
            closer = bhit & (bt < dist)
            bpt = vadd(hard, vscale(wheel_dir, bt))
            bn = vnormalize(vsub(bpt, st['ball_pos']))
            hit = hit | closer
            dist = jnp.where(closer, bt, dist)
            n = vwhere(closer, bn, n)
            ground_idx = jnp.where(closer, -2, ground_idx)
            # other cars' hitboxes
            for j in range(Cn):
                cj = _vslice(box_center, j)
                Rj = _mslice(st['rot'], j)
                ohit, ot, on = _ray_obb_k(
                    hard, wheel_dir, ray_len,
                    cv.vbroadcast(cj, hard[0].shape), Rj, k.half_extents)
                # static per-slot self mask (slot i's ray never hits car i)
                not_self = jnp.stack(
                    [jnp.full_like(hit[0], i != j)
                     for i in range(Cn)], axis=0)
                ok = ohit & not_self & alive[j]
                closer = ok & (ot < dist)
                hit = hit | closer
                dist = jnp.where(closer, ot, dist)
                n = vwhere(closer, on, n)
                ground_idx = jnp.where(closer, j, ground_idx)
        in_world = hit & (ground_idx == -1)
        cp = vadd(hard, vscale(wheel_dir, dist))
        trace_len = vdot(vsub(hard, cp), up)
        susp_len = jnp.clip(trace_len - radius, rest_len - travel,
                            rest_len + travel)
        susp_len = jnp.where(hit, susp_len, rest_len + travel)

        rel = vscale(vsub(cp, st['pos']), C.UU_TO_BT)
        vel_at = vadd(vscale(st['vel'], C.UU_TO_BT),
                      vcross(st['ang_vel'], rel))
        proj_vel = vdot(n, vel_at)
        denom = vdot(n, up)
        good = denom > 0.1
        inv = jnp.where(good, 1.0 / jnp.maximum(denom, 0.1), 10.0)
        susp_rel_vel = jnp.where(hit & good, proj_vel * inv, 0.0)
        clipped_inv = jnp.where(hit, jnp.where(good, inv, 10.0), 1.0)

        push_thresh = rest_len + radius - sus_sub_uu
        delta = (trace_len - push_thresh) * C.UU_TO_BT
        # extra pushback fires only against STATIC geometry
        # (btVehicleRL.cpp:184 "if (object->isStaticObject())")
        needs = in_world & (trace_len < push_thresh)
        # resolveSingleCollision hard-codes zero restitution
        # (btContactConstraint.cpp:59,82)
        pos_err = 0.2 * -delta / dt
        vel_err = -proj_vel
        r_cross_n = vcross(rel, n)
        ang_term = vdot(vcross(_iw_vec(inv_iw, r_cross_n), rel), n)
        denom0 = (1.0 / mut.car_mass) + ang_term
        imp = jnp.maximum((pos_err + vel_err) / jnp.maximum(denom0, 1e-9),
                          0.0)
        extra_push = jnp.where(needs, imp / 4.0, 0.0)

        n = vwhere(hit, n, up)
        out['hit'].append(hit)
        out['in_world'].append(in_world)
        out['cp'].append(cp)
        out['n'].append(n)
        out['susp_len'].append(susp_len)
        out['susp_rel_vel'].append(susp_rel_vel)
        out['clipped_inv'].append(clipped_inv)
        out['extra_push'].append(extra_push)
        out['hard'].append(hard)
        out['ground_idx'].append(ground_idx)
    return out


def _calc_friction_impulses(k: TickConsts, st, rc, wc, inv_iw):
    """Twin of car.calc_friction_impulses: list of 4 impulse Vecs (BT).

    With dynamic rays, wheels whose ray hit the ball / another car use
    that body's velocity in the relative-velocity terms and its
    mass/inertia in the bilateral jacobian (btVehicleRL.cpp:321-387),
    keeping the reference's quirk of sampling the ground object's point
    velocity at the CAR-relative offset for rolling friction."""
    mut = k.mut
    Cn = k.num_cars
    friction_scale = mut.car_mass / 3.0
    up = cv.up(st['rot'])
    rightv = cv.right(st['rot'])
    inv_mass_car = 1.0 / mut.car_mass
    if k.dynamic_rays:
        i_ball = 0.4 * mut.ball_mass * (mut.ball_radius * C.UU_TO_BT) ** 2
        inv_i_ball = 1.0 / i_ball
    impulses = []
    for w in range(4):
        steer = wc['steer_angle'] if w < 2 else jnp.zeros_like(
            wc['steer_angle'])
        cs, sn = jnp.cos(steer), jnp.sin(steer)
        axle0 = vadd(vscale(rightv, cs), vscale(vcross(up, rightv), sn))
        n = rc['n'][w]
        axle = vnormalize(vsub(axle0, vscale(n, vdot(axle0, n))))
        fwd_dir = vnormalize(vcross(n, axle))

        rel = vscale(vsub(rc['cp'][w], st['pos']), C.UU_TO_BT)
        vel_at = vadd(vscale(st['vel'], C.UU_TO_BT),
                      vcross(st['ang_vel'], rel))

        if k.dynamic_rays:
            gi = rc['ground_idx'][w]
            is_ball = gi == -2
            is_car = gi >= 0
            dyn = is_ball | is_car
            # ground object state: ball or the selected other car (static
            # one-hot select over the car slots — no gathers)
            zf = vzero(rel[0])
            g_vel = vwhere(is_ball, cv.vbroadcast(st['ball_vel'],
                                                  gi.shape), zf)
            g_ang = vwhere(is_ball, cv.vbroadcast(st['ball_ang_vel'],
                                                  gi.shape), zf)
            g_pos = vwhere(is_ball, cv.vbroadcast(st['ball_pos'],
                                                  gi.shape), zf)
            g_inv_mass = jnp.where(is_ball, 1.0 / mut.ball_mass,
                                   jnp.where(is_car, inv_mass_car, 0.0))
            for j in range(Cn):
                sel = gi == j
                g_vel = vwhere(sel, cv.vbroadcast(_vslice(st['vel'], j),
                                                  gi.shape), g_vel)
                g_ang = vwhere(sel, cv.vbroadcast(_vslice(st['ang_vel'],
                                                          j), gi.shape),
                               g_ang)
                g_pos = vwhere(sel, cv.vbroadcast(_vslice(st['pos'], j),
                                                  gi.shape), g_pos)
            r_b = vscale(vsub(rc['cp'][w], g_pos), C.UU_TO_BT)
            v2_at = vwhere(dyn, vadd(vscale(g_vel, C.UU_TO_BT),
                                     vcross(g_ang, r_b)), zf)
            v2_quirk = vwhere(dyn, vadd(vscale(g_vel, C.UU_TO_BT),
                                        vcross(g_ang, rel)), zf)
        else:
            v2_at = v2_quirk = vzero(rel[0])
            g_inv_mass = 0.0

        rel_vel_side = vdot(vsub(vel_at, v2_at), axle)
        r_cross_n = vcross(rel, axle)
        ang_term = vdot(vcross(_iw_vec(inv_iw, r_cross_n), rel), axle)
        jac = inv_mass_car + ang_term + g_inv_mass
        if k.dynamic_rays:
            rb_cross = vcross(r_b, axle)
            # ground angular term: ball has isotropic inertia; the other
            # car's world inverse-inertia tensor is selected per slot
            g_ang_term = jnp.zeros_like(jac)
            ball_term = vdot(vcross(vscale(rb_cross, inv_i_ball), r_b),
                             axle)
            g_ang_term = jnp.where(is_ball, ball_term, g_ang_term)
            for j in range(Cn):
                sel = gi == j
                iw_j = tuple(tuple(inv_iw[r][c][j] for c in range(3))
                             for r in range(3))
                car_term = vdot(vcross(cv.matvec(iw_j, rb_cross), r_b),
                                axle)
                g_ang_term = jnp.where(sel, car_term, g_ang_term)
            jac = jac + jnp.where(dyn, g_ang_term, 0.0)
        side = -C.SIDE_FRICTION_CONTACT_DAMPING * rel_vel_side / (
            jnp.maximum(jac, 1e-9))

        rel_vel_fwd = vdot(vsub(vel_at, v2_quirk), fwd_dir)
        brake = wc['brake']
        engine = wc['engine_force']
        rolling_brake = jnp.clip(
            -rel_vel_fwd * C.ROLLING_FRICTION_SCALE_MAGIC, -brake, brake)
        rolling = jnp.where(engine == 0.0,
                            jnp.where(brake > 0.0, rolling_brake, 0.0),
                            -engine / friction_scale)

        total = vadd(vscale(fwd_dir, rolling * wc['long_friction'][w]),
                     vscale(axle, side * wc['lat_friction'][w]))
        imp = vscale(total, friction_scale)
        impulses.append(vwhere(rc['hit'][w], imp, vzero(imp[0])))
    return impulses


def _apply_suspension(k: TickConsts, st, rc, inv_iw):
    """car.apply_suspension: returns (vel, ang_vel)."""
    mut, dt = k.mut, k.dt
    dv = vzero(st['vel'][0])
    torque = vzero(st['vel'][0])
    for w in range(4):
        spring = ((k.sus_rest[w] - rc['susp_len'][w]) * C.UU_TO_BT
                  * C.BTVehicle.SUSPENSION_STIFFNESS * rc['clipped_inv'][w])
        damping_scale = jnp.where(rc['susp_rel_vel'][w] < 0,
                                  C.BTVehicle.WHEELS_DAMPING_COMPRESSION,
                                  C.BTVehicle.WHEELS_DAMPING_RELAXATION)
        force = (spring - damping_scale * rc['susp_rel_vel'][w]) \
            * k.sus_force_scale[w]
        force = jnp.maximum(force, 0.0)
        force = jnp.where(rc['hit'][w], force, 0.0)
        base = force * dt + rc['extra_push'][w]
        imp = vscale(rc['n'][w], base)
        rel = vscale(vsub(rc['cp'][w], st['pos']), C.UU_TO_BT)
        dv = vadd(dv, imp)
        torque = vadd(torque, vcross(rel, imp))
    vel = vadd(st['vel'], vscale(dv, C.BT_TO_UU / mut.car_mass))
    ang_vel = vadd(st['ang_vel'], _iw_vec(inv_iw, torque))
    return vel, ang_vel


def _apply_friction_impulses(k: TickConsts, st, rc, impulses, inv_iw):
    """car.apply_friction_impulses: impulse * dt at contact offset with the
    up-component removed."""
    mut, dt = k.mut, k.dt
    up = cv.up(st['rot'])
    dv = vzero(st['vel'][0])
    torque = vzero(st['vel'][0])
    for w in range(4):
        offset = vscale(vsub(rc['cp'][w], st['pos']), C.UU_TO_BT)
        rel = vsub(offset, vscale(up, vdot(offset, up)))
        imp = vscale(impulses[w], dt)
        dv = vadd(dv, imp)
        torque = vadd(torque, vcross(rel, imp))
    vel = vadd(st['vel'], vscale(dv, C.BT_TO_UU / mut.car_mass))
    ang_vel = vadd(st['ang_vel'], _iw_vec(inv_iw, torque))
    return vel, ang_vel


def _update_wheels(k: TickConsts, st, rc, wc, controls, fwd_speed,
                   num_contact):
    """car.update_wheels: returns (new wc dict, hb_val, sticky_accel Vec,
    real_throttle)."""
    dt = k.dt
    abs_speed = jnp.abs(fwd_speed)

    hb_input = controls[HANDBRAKE] > 0
    hb_val = jnp.where(hb_input,
                       st['handbrake_val'] + C.POWERSLIDE_RISE_RATE * dt,
                       st['handbrake_val'] - C.POWERSLIDE_FALL_RATE * dt)
    hb_val = jnp.clip(hb_val, 0.0, 1.0)

    throttle = controls[THROTTLE]
    boosting = (controls[BOOST] > 0) & (st['boost'] > 0)
    real_throttle = jnp.where(boosting, 1.0, throttle)

    drive_scale = cv.curve(C.DRIVE_SPEED_TORQUE_FACTOR_CURVE, abs_speed)
    abs_throttle = jnp.abs(real_throttle)

    opposite = (abs_speed > C.STOPPING_FORWARD_VEL) & (
        jnp.sign(real_throttle) != jnp.sign(fwd_speed))
    engine_throttle_nh = jnp.where(
        abs_throttle >= C.THROTTLE_DEADZONE,
        jnp.where(opposite & (abs_speed > C.BRAKING_NO_THROTTLE_SPEED_THRESH),
                  0.0, real_throttle),
        0.0)
    brake_nh = jnp.where(
        abs_throttle >= C.THROTTLE_DEADZONE,
        jnp.where(opposite, 1.0, 0.0),
        jnp.where(abs_speed < C.STOPPING_FORWARD_VEL, 1.0,
                  C.COASTING_BRAKE_FACTOR))
    engine_throttle = jnp.where(hb_input, real_throttle, engine_throttle_nh)
    real_brake = jnp.where(hb_input, 0.0, brake_nh)

    drive_scale = jnp.where(num_contact < 3, drive_scale / 4.0, drive_scale)
    engine_force = engine_throttle * (C.THROTTLE_TORQUE_AMOUNT
                                      * C.UU_TO_BT) * drive_scale
    brake_force = real_brake * (C.BRAKE_TORQUE_AMOUNT * C.UU_TO_BT)

    steer_angle = cv.curve(C.STEER_ANGLE_FROM_SPEED_CURVE, abs_speed)
    ps_angle = cv.curve(C.POWERSLIDE_STEER_ANGLE_FROM_SPEED_CURVE, abs_speed)
    steer_angle = steer_angle + (ps_angle - steer_angle) * hb_val
    steer_angle = steer_angle * controls[STEER]

    up = cv.up(st['rot'])
    rightv = cv.right(st['rot'])
    # Friction latDir comes from the wheel m_worldTransform, last refreshed
    # at tick start — i.e. with the PREVIOUS tick's steer (car.update_wheels)
    cs, sn = jnp.cos(wc['steer_angle']), jnp.sin(wc['steer_angle'])
    steered_right = vadd(vscale(rightv, cs), vscale(vcross(up, rightv), sn))

    new_lat, new_long = [], []
    sticky = real_throttle != 0.0
    for w in range(4):
        lat_dir = steered_right if w < 2 else rightv
        long_dir = vcross(lat_dir, rc['n'][w])
        rel = vsub(rc['hard'][w], st['pos'])
        cross_vec = vscale(
            vadd(vcross(st['ang_vel'], vscale(rel, C.UU_TO_BT)),
                 vscale(st['vel'], C.UU_TO_BT)), C.BT_TO_UU)
        base_fric = jnp.abs(vdot(cross_vec, lat_dir))
        fric_input = jnp.where(
            base_fric > 5.0,
            base_fric / (jnp.abs(vdot(cross_vec, long_dir)) + base_fric),
            0.0)
        lat_f = cv.curve(C.LAT_FRICTION_CURVE, fric_input)
        long_f = cv.curve(C.LONG_FRICTION_CURVE, fric_input)

        lat_hb = lat_f * ((cv.curve(C.HANDBRAKE_LAT_FRICTION_FACTOR_CURVE,
                                    fric_input) - 1.0) * hb_val + 1.0)
        long_hb = long_f * ((cv.curve(C.HANDBRAKE_LONG_FRICTION_FACTOR_CURVE,
                                      fric_input) - 1.0) * hb_val + 1.0)
        has_hb = hb_val > 0
        lat_f = jnp.where(has_hb, lat_hb, lat_f)
        long_f = jnp.where(has_hb, long_hb, jnp.ones_like(long_f))

        non_sticky_scale = cv.curve(C.NON_STICKY_FRICTION_FACTOR_CURVE,
                                    rc['n'][w][2])
        lat_f = jnp.where(sticky, lat_f, lat_f * non_sticky_scale)
        long_f = jnp.where(sticky, long_f, long_f * non_sticky_scale)

        lat_f = jnp.where(rc['hit'][w], lat_f, wc['lat_friction'][w])
        long_f = jnp.where(rc['hit'][w], long_f, wc['long_friction'][w])
        new_lat.append(lat_f)
        new_long.append(long_f)

    # Sticky force (Car.cpp:463-474): gated on WORLD contact (a wheel
    # resting on the ball / another car does not stick, car.py)
    any_world = (rc['in_world'][0] | rc['in_world'][1]
                 | rc['in_world'][2] | rc['in_world'][3])
    sum_n = vzero(st['pos'][0])
    for w in range(4):
        sum_n = vadd(sum_n, vwhere(rc['hit'][w], rc['n'][w],
                                   vzero(sum_n[0])))
    up_dir = vwhere(vnorm(sum_n) > 1e-9, vnormalize(sum_n), up)
    full_stick = (real_throttle != 0.0) | (abs_speed > C.STOPPING_FORWARD_VEL)
    sticky_scale = 0.5 + jnp.where(full_stick,
                                   1.0 - jnp.abs(up_dir[2]), 0.0)
    sticky_accel = vscale(up_dir, sticky_scale * C.GRAVITY_Z)
    sticky_accel = vwhere(any_world, sticky_accel, vzero(sticky_accel[0]))

    new_wc = dict(steer_angle=steer_angle, engine_force=engine_force,
                  brake=brake_force, lat_friction=new_lat,
                  long_friction=new_long)
    return new_wc, hb_val, sticky_accel, real_throttle


# ---------------------------------------------------------------------------
# Car state machines (twins of physics/car.py)

def _update_air_torque(k: TickConsts, st, controls, in_air_mask, zero_wheels):
    """car.update_air_torque: (ang_accel Vec, accel Vec, is_flipping)."""
    fwd = cv.forward(st['rot'])
    rightv = cv.right(st['rot'])
    upv = cv.up(st['rot'])
    dir_pitch = cv.vneg(rightv)
    dir_yaw = upv
    dir_roll = cv.vneg(fwd)

    is_flipping = st['is_flipping'] & st['has_flipped'] & (
        st['flip_time'] < C.FLIP_TORQUE_TIME)

    rt = st['flip_rel_torque']
    has_rel_torque = (rt[0] != 0.0) | (rt[1] != 0.0) | (rt[2] != 0.0)

    pitch_in = controls[PITCH]
    flip_cancel = (rt[1] != 0.0) & (pitch_in != 0.0) & (
        jnp.sign(rt[1]) == jnp.sign(pitch_in))
    pitch_scale = jnp.where(flip_cancel,
                            1.0 - jnp.minimum(jnp.abs(pitch_in), 1.0), 1.0)
    dodge_torque = (rt[0] * C.FLIP_TORQUE_X, rt[1] * pitch_scale
                    * C.FLIP_TORQUE_Y, jnp.zeros_like(rt[2]))
    flip_ang_accel = cv.matvec(st['rot'], dodge_torque)
    flip_ang_accel = vwhere(is_flipping & has_rel_torque, flip_ang_accel,
                            vzero(rt[0]))

    do_air_control = cv.bsel(
        is_flipping, has_rel_torque & flip_cancel | ~has_rel_torque,
        jnp.ones_like(is_flipping))
    do_air_control &= ~st['is_auto_flipping']
    do_air_control &= zero_wheels

    pitch_lock = is_flipping | (
        st['has_flipped']
        & (st['flip_time'] < C.FLIP_TORQUE_TIME + C.FLIP_PITCHLOCK_EXTRA_TIME))
    pitch_torque_scale = jnp.where(pitch_lock, 0.0, 1.0)

    yaw_in = controls[YAW]
    roll_in = controls[ROLL]
    any_input = (pitch_in != 0) | (yaw_in != 0) | (roll_in != 0)
    tx, ty, tz = C.CAR_AIR_CONTROL_TORQUE
    torque = vadd(vscale(dir_pitch, pitch_in * pitch_torque_scale * tx),
                  vscale(dir_yaw, yaw_in * ty),
                  vscale(dir_roll, roll_in * tz))
    torque = vwhere(any_input, torque, vzero(torque[0]))

    dx, dy, dz = C.CAR_AIR_CONTROL_DAMPING
    damp_pitch = vdot(dir_pitch, st['ang_vel']) * dx * (
        1.0 - jnp.abs(jnp.where(do_air_control,
                                pitch_in * pitch_torque_scale, 0.0)))
    damp_yaw = vdot(dir_yaw, st['ang_vel']) * dy * (
        1.0 - jnp.abs(jnp.where(do_air_control, yaw_in, 0.0)))
    damp_roll = vdot(dir_roll, st['ang_vel']) * dz
    damping = vadd(vscale(dir_yaw, damp_yaw), vscale(dir_pitch, damp_pitch),
                   vscale(dir_roll, damp_roll))
    control_ang_accel = vscale(vsub(torque, damping), C.CAR_TORQUE_SCALE)
    control_ang_accel = vwhere(do_air_control, control_ang_accel,
                               vzero(torque[0]))

    throttle = controls[THROTTLE]
    air_accel = vscale(fwd, throttle * C.THROTTLE_AIR_ACCEL)
    air_accel = vwhere(throttle != 0.0, air_accel, vzero(throttle))

    ang_accel = vadd(flip_ang_accel, control_ang_accel)
    ang_accel = vwhere(in_air_mask, ang_accel, vzero(ang_accel[0]))
    accel = vwhere(in_air_mask, air_accel, vzero(air_accel[0]))
    is_flipping = cv.bsel(in_air_mask, is_flipping, False)
    return ang_accel, accel, is_flipping


def _update_jump(k: TickConsts, st, controls, jump_pressed):
    """car.update_jump: returns (updates dict, dv Vec, accel Vec)."""
    mut, dt = k.mut, k.dt
    on_ground = st['is_on_ground']
    is_jumping = st['is_jumping']
    has_jumped = st['has_jumped']
    jump_time = st['jump_time']

    reset_ok = on_ground & ~is_jumping & ~(
        has_jumped & (jump_time < C.JUMP_MIN_TIME + C.JUMP_RESET_TIME_PAD))
    has_jumped = cv.bsel(reset_ok, False, has_jumped)
    jump_time = jnp.where(reset_ok, 0.0, jump_time)

    cont = (jump_time < C.JUMP_MIN_TIME) | (
        (controls[JUMP] > 0) & (jump_time < C.JUMP_MAX_TIME))
    start = ~is_jumping & on_ground & jump_pressed
    new_is_jumping = cv.bsel(is_jumping, cont, start)
    jump_time = jnp.where(start, 0.0, jump_time)

    upv = cv.up(st['rot'])
    dv = vwhere(start, vscale(upv, mut.jump_immediate_force),
                vzero(jump_time))

    has_jumped = cv.bsel(new_is_jumping, True, has_jumped)
    accel_scale = jnp.where(jump_time < C.JUMP_MIN_TIME,
                            C.JUMP_PRE_MIN_ACCEL_SCALE, 1.0)
    accel = vwhere(new_is_jumping,
                   vscale(upv, mut.jump_accel * accel_scale),
                   vzero(jump_time))

    jump_time = jnp.where(new_is_jumping | has_jumped,
                          jump_time + dt, jump_time)
    updates = dict(is_jumping=new_is_jumping, has_jumped=has_jumped,
                   jump_time=jump_time)
    return updates, dv, accel


def _update_auto_flip(k: TickConsts, st, controls, jump_pressed):
    """car.update_auto_flip."""
    dt = k.dt
    roll_ang = cv.roll_angle(st['rot'])
    abs_roll = jnp.abs(roll_ang)
    trigger = (jump_pressed & st['has_world_contact']
               & (st['world_contact_normal'][2] > C.CAR_AUTOFLIP_NORMZ_THRESH)
               & (abs_roll > C.CAR_AUTOFLIP_ROLL_THRESH))

    timer = jnp.where(trigger, C.CAR_AUTOFLIP_TIME * (abs_roll / np.pi),
                      st['auto_flip_timer'])
    scale = jnp.where(trigger, jnp.where(roll_ang > 0, 1.0, -1.0),
                      st['auto_flip_torque_scale'])
    is_af = cv.bsel(trigger, True, st['is_auto_flipping'])

    upv = cv.up(st['rot'])
    dv = vwhere(trigger, vscale(cv.vneg(upv), C.CAR_AUTOFLIP_IMPULSE),
                vzero(timer))

    active = is_af & (timer > 0)
    expired = is_af & ~active
    fwd = cv.forward(st['rot'])
    dw = vwhere(active,
                vscale(fwd, C.CAR_AUTOFLIP_TORQUE * scale * dt),
                vzero(timer))
    timer = jnp.where(active, timer - dt, jnp.where(expired, 0.0, timer))
    is_af = cv.bsel(expired, False, is_af)
    updates = dict(is_auto_flipping=is_af, auto_flip_timer=timer,
                   auto_flip_torque_scale=scale)
    return updates, dv, dw


def _update_double_jump_or_flip(k: TickConsts, st, controls, jump_pressed,
                                fwd_speed, is_jumping, has_jumped, jump_time,
                                is_flipping):
    """car.update_double_jump_or_flip: (updates, dv Vec, z_damp_maybe,
    z_damp_always)."""
    mut, dt = k.mut, k.dt
    cfg_deadzone = C.DODGE_DEADZONE
    on_ground = st['is_on_ground']
    air = ~on_ground

    has_double_jumped = cv.bsel(on_ground, False,
                                st['has_double_jumped'])
    has_flipped = cv.bsel(on_ground, False, st['has_flipped'])
    air_time = jnp.where(on_ground, 0.0, st['air_time'] + dt)
    atsj = jnp.where(
        on_ground, 0.0,
        jnp.where(has_jumped & ~is_jumping,
                  st['air_time_since_jump'] + dt, 0.0))
    flip_time = jnp.where(on_ground, 0.0, st['flip_time'])
    frt = st['flip_rel_torque']

    press_window = air & jump_pressed & (atsj < C.DOUBLEJUMP_MAX_DELAY)
    yaw_in, pitch_in, roll_in = controls[YAW], controls[PITCH], controls[ROLL]
    input_mag = jnp.abs(yaw_in) + jnp.abs(pitch_in) + jnp.abs(roll_in)
    is_flip_input = input_mag >= cfg_deadzone

    fresh = ~has_double_jumped & ~has_flipped
    can_flip = fresh | mut.unlimited_flips
    can_dj = fresh | mut.unlimited_double_jumps
    can_use = cv.bsel(is_flip_input, can_flip, can_dj)
    can_use &= ~st['is_auto_flipping']

    do_flip = press_window & can_use & is_flip_input
    do_dj = press_window & can_use & ~is_flip_input

    # --- flip initiation (Car.cpp:677-737)
    fwd_ratio = jnp.abs(fwd_speed) / C.CAR_MAX_SPEED
    yaw_roll = yaw_in + roll_in
    dodge_dir = (-pitch_in, yaw_roll, jnp.zeros_like(pitch_in))
    stall = (jnp.abs(yaw_roll) < 0.1) & (jnp.abs(pitch_in) < 0.1)
    dodge_dir = vwhere(stall, vzero(pitch_in), vnormalize(dodge_dir))
    new_rel_torque = (-dodge_dir[1], dodge_dir[0], jnp.zeros_like(pitch_in))
    ddx = jnp.where(jnp.abs(dodge_dir[0]) < 0.1, 0.0, dodge_dir[0])
    ddy = jnp.where(jnp.abs(dodge_dir[1]) < 0.1, 0.0, dodge_dir[1])
    nonzero_dd = (jnp.abs(ddx) > 1e-7) | (jnp.abs(ddy) > 1e-7)

    backwards = cv.bsel(jnp.abs(fwd_speed) < 100.0,
                        ddx < 0.0,
                        (ddx >= 0.0) != (fwd_speed >= 0.0))
    ivx = ddx * C.FLIP_INITIAL_VEL_SCALE
    ivy = ddy * C.FLIP_INITIAL_VEL_SCALE
    max_x = jnp.where(backwards, C.FLIP_BACKWARD_IMPULSE_MAX_SPEED_SCALE,
                      C.FLIP_FORWARD_IMPULSE_MAX_SPEED_SCALE)
    vx = ivx * ((max_x - 1.0) * fwd_ratio + 1.0)
    vy = ivy * ((C.FLIP_SIDE_IMPULSE_MAX_SPEED_SCALE - 1.0) * fwd_ratio + 1.0)
    vx = jnp.where(backwards, vx * C.FLIP_BACKWARD_IMPULSE_SCALE_X, vx)

    fwd = cv.forward(st['rot'])
    # cos/sin of atan2(f1, f0) computed directly (no atan2 in Mosaic):
    h = jnp.sqrt(fwd[0] * fwd[0] + fwd[1] * fwd[1])
    ca = jnp.where(h > 1e-12, fwd[0] / jnp.maximum(h, 1e-12), 1.0)
    sa = jnp.where(h > 1e-12, fwd[1] / jnp.maximum(h, 1e-12), 0.0)
    dvx = vx * ca + vy * sa
    dvy = -vx * sa + vy * ca
    flip_dv = (dvx, dvy, jnp.zeros_like(dvx))
    flip_dv = vwhere(do_flip & nonzero_dd, flip_dv, vzero(dvx))

    flip_time = jnp.where(do_flip, 0.0, flip_time)
    has_flipped = cv.bsel(do_flip, True, has_flipped)
    is_flipping = cv.bsel(do_flip, True, is_flipping)
    frt = vwhere(do_flip, new_rel_torque, frt)

    # --- double jump
    upv = cv.up(st['rot'])
    dj_dv = vwhere(do_dj, vscale(upv, C.JUMP_IMMEDIATE_FORCE), vzero(dvx))
    has_double_jumped = cv.bsel(do_dj, True, has_double_jumped)

    # --- flip timing + z damping
    flip_time_next = jnp.where(is_flipping | has_flipped,
                               flip_time + dt, flip_time)
    in_torque_window = is_flipping & (flip_time_next <= C.FLIP_TORQUE_TIME)
    z_damp = in_torque_window & (flip_time_next >= C.FLIP_Z_DAMP_START)
    z_damp_maybe = z_damp
    z_damp_always = z_damp & (flip_time_next < C.FLIP_Z_DAMP_END)

    updates = dict(
        has_double_jumped=has_double_jumped, has_flipped=has_flipped,
        air_time=air_time, air_time_since_jump=atsj,
        flip_time=flip_time_next, is_flipping=is_flipping,
        flip_rel_torque=frt)
    dv = vadd(flip_dv, dj_dv)
    return updates, dv, z_damp_maybe, z_damp_always


def _update_auto_roll(k: TickConsts, st, rc, num_contact):
    """car.update_auto_roll: (accel Vec, ang_accel Vec); caller masks."""
    upv = cv.up(st['rot'])
    sum_n = vzero(st['pos'][0])
    for w in range(4):
        sum_n = vadd(sum_n, vwhere(rc['hit'][w], rc['n'][w], vzero(sum_n[0])))
    wheels_up = vwhere(vnorm(sum_n) > 1e-9, vnormalize(sum_n), upv)
    ground_up = vwhere(num_contact > 0, wheels_up,
                       st['world_contact_normal'])
    ground_down = cv.vneg(ground_up)

    fdir = cv.forward(st['rot'])
    rdir = cv.right(st['rot'])
    cross_right = vcross(ground_up, fdir)
    cross_fwd = vcross(ground_down, cross_right)

    right_factor = 1.0 - jnp.clip(vdot(rdir, cross_right), 0.0, 1.0)
    fwd_factor = 1.0 - jnp.clip(vdot(fdir, cross_fwd), 0.0, 1.0)

    t_dir_right = vscale(fdir, jnp.where(vdot(rdir, ground_up) >= 0,
                                         -1.0, 1.0))
    t_dir_fwd = vscale(rdir, jnp.where(vdot(fdir, ground_up) >= 0,
                                       1.0, -1.0))
    torque = vadd(vscale(t_dir_right, right_factor),
                  vscale(t_dir_fwd, fwd_factor))

    accel = vscale(ground_down, C.CAR_AUTOROLL_FORCE)
    ang_accel = vscale(torque, C.CAR_AUTOROLL_TORQUE)
    return accel, ang_accel


def _update_boost(k: TickConsts, st, controls):
    """car.update_boost: (updates dict, accel Vec)."""
    mut, dt = k.mut, k.dt
    boosting_input = controls[BOOST] > 0
    tsb = st['time_spent_boosting']
    stop = ~boosting_input & (tsb >= C.BOOST_MIN_TIME)
    tsb = jnp.where(tsb > 0,
                    jnp.where(stop, 0.0, tsb + dt),
                    jnp.where(boosting_input, dt, 0.0))

    active = (st['boost'] > 0) & (tsb > 0)
    boost_amt = jnp.where(
        active,
        jnp.maximum(st['boost'] - mut.boost_used_per_second * dt, 0.0),
        st['boost'])
    boost_amt = jnp.minimum(boost_amt, C.BOOST_MAX)

    accel_mag = jnp.where(st['is_on_ground'], mut.boost_accel_ground,
                          mut.boost_accel_air)
    fwd = cv.forward(st['rot'])
    accel = vwhere(active, vscale(fwd, accel_mag), vzero(tsb))
    return dict(boost=boost_amt, time_spent_boosting=tsb), accel


# ---------------------------------------------------------------------------
# Contacts (twins of physics/contacts.py)

def _slot_const(values, sample):
    """Per-car-slot constant as a (C,)+S array.  Built from ``sample``
    (a traced (C,)+S array) via full_like so Pallas kernels don't capture
    array constants."""
    return jnp.stack([jnp.full_like(sample[0], float(v)) for v in values],
                     axis=0)


def _resolve_car_world(k: TickConsts, st, inv_iw, vel_pre, ang_vel_pre):
    """contacts.resolve_car_world twin.

    True planes (floor/ceiling/side walls, geom.TRUE_PLANE): single
    support-vertex manifold point per tick (btConvexPlaneCollisionAlgorithm
    through the compound child), active below the 0.02*(|he+2uu|+|offset|)
    contact breaking threshold, tie toward +half_extent.  Mesh stand-in
    planes: corner centroid at the 2uu triangle collision-margin surface.
    Restitution reads pre-force velocities.
    Returns (dvel Vec uu, dang Vec, push Vec uu, has_contact, normal Vec)."""
    mut = k.mut
    inv_mass = 1.0 / mut.car_mass
    valid = _plane_validity(k, st['pos'])
    true_plane = np.asarray(geom._TRUE_PLANE)
    he = k.half_extents
    off = k.hitbox_offset
    # 0.02 * compound angular motion disc (margin already inside he;
    # see contacts.resolve_car_world)
    brk = C.CONTACT_BREAK_FRAC * (
        float(np.linalg.norm(np.asarray(he)))
        + float(np.linalg.norm(np.asarray(off))))

    # 8 hitbox corners in world frame (corners_local includes the offset)
    corners = [vadd(st['pos'], cv.matvec(st['rot'],
                                         cv.vconst(cl, st['pos'][0])))
               for cl in k.corners_local]

    zero = jnp.zeros_like(st['pos'][0])
    dvel = vzero(zero)
    dang = vzero(zero)
    push = vzero(zero)
    nsum = vzero(zero)
    has_contact = jnp.zeros_like(st['is_on_ground'])

    vel_bt = vscale(st['vel'], C.UU_TO_BT)
    vel_pre_bt = vscale(vel_pre, C.UU_TO_BT)
    for p, plane in enumerate(k.planes):
        pn = plane[:3]
        n = cv.vconst(pn, zero)
        if true_plane[p]:
            # Support vertex along -n in box local frame, >=0 tie -> +he
            ldir = cv.mat_t_vec(st['rot'], cv.vneg(n))
            sup_local = tuple(
                jnp.where(ldir[i] >= 0.0, off[i] + he[i], off[i] - he[i])
                for i in range(3))
            sup = vadd(st['pos'], cv.matvec(st['rot'], sup_local))
            d = _plane_dist(plane, sup)
            act = d < brk if valid[p] is True else valid[p] & (d < brk)
            plane_active = act
            contact_pt = sup
            max_depth = jnp.maximum(-d, 0.0)
        else:
            ncont = zero
            cx, cy, cz = zero, zero, zero
            max_depth = zero
            for corner in corners:
                d = _plane_dist(plane, corner)
                pen = -d + C.MESH_COLLISION_MARGIN
                act = pen > 0 if valid[p] is True else valid[p] & (pen > 0)
                actf = act.astype(zero.dtype)
                ncont = ncont + actf
                cx = cx + actf * corner[0]
                cy = cy + actf * corner[1]
                cz = cz + actf * corner[2]
                max_depth = jnp.maximum(max_depth, jnp.where(act, pen, 0.0))
            plane_active = ncont > 0
            inv_n = 1.0 / jnp.maximum(ncont, 1.0)
            contact_pt = (cx * inv_n, cy * inv_n, cz * inv_n)

        r_bt = vscale(vsub(contact_pt, st['pos']), C.UU_TO_BT)
        dv_bt, dw, _ = _contact_vs_static(
            vel_bt, st['ang_vel'], r_bt, n, inv_mass, inv_iw,
            mut.car_world_restitution, mut.car_world_friction,
            vel_pre_bt=vel_pre_bt, ang_vel_pre=ang_vel_pre, iterations=10)

        dvel = vadd(dvel, vwhere(plane_active, dv_bt, vzero(zero)))
        dang = vadd(dang, vwhere(plane_active, dw, vzero(zero)))
        push_p = vscale(n, max_depth * C.SOLVER_ERP2)
        push = vadd(push, vwhere(plane_active, push_p, vzero(zero)))
        nsum = vadd(nsum, vwhere(plane_active, n, vzero(zero)))
        has_contact = has_contact | plane_active

    normal = vwhere(has_contact, vnormalize(nsum), vzero(zero))
    return (vscale(dvel, C.BT_TO_UU), dang, push, has_contact, normal)


def _resolve_car_world_mesh_k(k: TickConsts, st, inv_iw, vel_pre,
                              ang_vel_pre):
    """Full-fidelity car-world resolve: 4 retained facet contacts + the 4
    true-plane support-vertex contacts, solved JOINTLY by bullet-order PGS
    (twin of contacts.resolve_car_world_mesh).  Returns (dvel uu, dang,
    push uu, turn Vec, has_contact, normal Vec)."""
    mut = k.mut
    inv_mass = 1.0 / mut.car_mass
    he = k.half_extents
    off = k.hitbox_offset
    brk = C.CONTACT_BREAK_FRAC * (
        float(np.linalg.norm(np.asarray(he)))
        + float(np.linalg.norm(np.asarray(off))))

    rows = []
    slots = _facet_box_manifold(k, st, brk)
    for n, sup, dist, occ in slots:
        r = vscale(vsub(sup, st['pos']), C.UU_TO_BT)
        rows.append((n, r, dist * C.UU_TO_BT, occ))

    valid = _plane_validity(k, st['pos'])
    zero = jnp.zeros_like(st['pos'][0])
    for p in _world_plane_ids(k):
        plane = k.planes[p]
        pn = plane[:3]
        n = cv.vconst(pn, zero)
        ldir = cv.mat_t_vec(st['rot'], cv.vneg(n))
        sup_local = tuple(
            jnp.where(ldir[i] >= 0.0, off[i] + he[i], off[i] - he[i])
            for i in range(3))
        sup = vadd(st['pos'], cv.matvec(st['rot'], sup_local))
        d = _plane_dist(plane, sup)
        act = d < brk if valid[p] is True else valid[p] & (d < brk)
        r = vscale(vsub(sup, st['pos']), C.UU_TO_BT)
        rows.append((n, r, d * C.UU_TO_BT, act))

    vel_bt = vscale(st['vel'], C.UU_TO_BT)
    vel_pre_bt = vscale(vel_pre, C.UU_TO_BT)
    dv_bt, dw, push_bt, turn = _pgs_rows_k(
        k, vel_bt, st['ang_vel'], rows, inv_mass, inv_iw,
        mut.car_world_restitution, mut.car_world_friction,
        vel_pre_bt, ang_vel_pre)

    has_contact = rows[0][3]
    nsum = vzero(zero)
    for n, _r, _d, act in rows:
        has_contact = has_contact | act
        nsum = vadd(nsum, vwhere(act, n, vzero(zero)))
    normal = vwhere(has_contact, vnormalize(nsum), vzero(zero))
    return (vscale(dv_bt, C.BT_TO_UU), dw, vscale(push_bt, C.BT_TO_UU),
            turn, has_contact, normal)


def _resolve_ball_world_mesh_k(k: TickConsts, ball_pos, ball_vel,
                               ball_ang_vel, ball_vel_pre):
    """Full-fidelity ball-world resolve: ROCKETSIM merged special contact
    over the true planes + 4 retained facet contacts (twin of
    contacts.resolve_ball_world with a grid)."""
    mut = k.mut
    radius = mut.ball_radius
    break_gap = C.CONTACT_BREAK_FRAC * (radius + C.SPHERE_BOUND_EXTRA)
    valid = _plane_validity(k, ball_pos)
    zero = jnp.zeros_like(ball_pos[0])

    num = zero
    navg = vzero(zero)
    max_depth = zero
    for p in _world_plane_ids(k):
        plane = k.planes[p]
        dist = _plane_dist(plane, ball_pos)
        gap = dist - radius
        act = gap < break_gap if valid[p] is True \
            else valid[p] & (gap < break_gap)
        actf = act.astype(zero.dtype)
        num = num + actf
        navg = vadd(navg, vscale(cv.vconst(plane[:3], zero), actf))
        max_depth = jnp.maximum(max_depth, jnp.where(act, -gap, 0.0))
    for n, gap, occ in _facet_sphere_manifold(k, ball_pos, radius,
                                              break_gap):
        actf = occ.astype(zero.dtype)
        num = num + actf
        navg = vadd(navg, vscale(n, actf))
        max_depth = jnp.maximum(max_depth, jnp.where(occ, -gap, 0.0))

    touching = num > 0
    inv_n = 1.0 / jnp.maximum(num, 1.0)
    navg = vscale(navg, inv_n)
    r_bt = vscale(navg, -radius * C.UU_TO_BT)

    ball_inv_mass = 1.0 / mut.ball_mass
    inertia = 0.4 * mut.ball_mass * (radius * C.UU_TO_BT) ** 2
    s = 1.0 / inertia
    inv_iw = ((s, 0.0, 0.0), (0.0, s, 0.0), (0.0, 0.0, s))

    restitution = max(mut.ball_world_restitution, C.WORLD_RESTITUTION)
    friction = min(mut.ball_world_friction, C.WORLD_FRICTION)

    # 10 iterations: the multi-surface average normal couples the normal
    # and friction rows (see contacts.resolve_ball_world)
    dv_bt, dw, _ = _contact_vs_static(
        vscale(ball_vel, C.UU_TO_BT), ball_ang_vel, r_bt, navg,
        ball_inv_mass, inv_iw, restitution, friction,
        vel_pre_bt=vscale(ball_vel_pre, C.UU_TO_BT), iterations=10)

    push = vscale(navg, jnp.maximum(max_depth, 0.0) * C.SOLVER_ERP2)
    z = vzero(zero)
    return (vwhere(touching, vscale(dv_bt, C.BT_TO_UU), z),
            vwhere(touching, dw, z), vwhere(touching, push, z), touching,
            navg)


def _resolve_ball_world(k: TickConsts, ball_pos, ball_vel, ball_ang_vel,
                        ball_vel_pre):
    """contacts.resolve_ball_world: (dvel uu, dang, push uu, touching).
    Contact live while gap < 0.02*(radius_bt + 0.08) (sphere breaking
    threshold); pushout only at true overlap; restitution reads the
    pre-gravity velocity."""
    mut = k.mut
    radius = mut.ball_radius
    break_gap = C.CONTACT_BREAK_FRAC * (radius + C.SPHERE_BOUND_EXTRA)
    valid = _plane_validity(k, ball_pos)
    zero = jnp.zeros_like(ball_pos[0])

    num = zero
    navg = vzero(zero)
    max_depth = zero
    for p, plane in enumerate(k.planes):
        dist = _plane_dist(plane, ball_pos)
        gap = dist - radius
        act = gap < break_gap if valid[p] is True \
            else valid[p] & (gap < break_gap)
        actf = act.astype(zero.dtype)
        num = num + actf
        navg = vadd(navg, vscale(cv.vconst(plane[:3], zero), actf))
        max_depth = jnp.maximum(max_depth, jnp.where(act, -gap, 0.0))
    touching = num > 0
    inv_n = 1.0 / jnp.maximum(num, 1.0)
    navg = vscale(navg, inv_n)
    # rel_pos magnitude: contact point on the sphere surface
    r_bt = vscale(navg, -radius * C.UU_TO_BT)

    ball_inv_mass = 1.0 / mut.ball_mass
    inertia = 0.4 * mut.ball_mass * (radius * C.UU_TO_BT) ** 2
    s = 1.0 / inertia
    inv_iw = ((s, 0.0, 0.0), (0.0, s, 0.0), (0.0, 0.0, s))

    restitution = max(mut.ball_world_restitution, C.WORLD_RESTITUTION)
    friction = min(mut.ball_world_friction, C.WORLD_FRICTION)

    dv_bt, dw, _ = _contact_vs_static(
        vscale(ball_vel, C.UU_TO_BT), ball_ang_vel, r_bt, navg,
        ball_inv_mass, inv_iw, restitution, friction,
        vel_pre_bt=vscale(ball_vel_pre, C.UU_TO_BT))

    push = vscale(navg, jnp.maximum(max_depth, 0.0) * C.SOLVER_ERP2)
    z = vzero(zero)
    return (vwhere(touching, vscale(dv_bt, C.BT_TO_UU), z),
            vwhere(touching, dw, z), vwhere(touching, push, z), touching,
            navg)


def _resolve_ball_world_snowday(k: TickConsts, ball_pos, ball_vel,
                                ball_ang_vel, ball_rot, ball_vel_pre):
    """Snowday puck vs arena: the merged special contact over the FULL
    analytic plane set with the exact cylinder support distance per plane
    (twin of contacts.resolve_ball_world's puck branch — the reference's
    20-sided cylinder mesh converges to this support function; the puck
    does NOT collide the triangle mesh, Ball.cpp:53-82).  Returns
    (dvel uu, dang, push uu, touching, navg)."""
    mut = k.mut
    a = (ball_rot[0][2], ball_rot[1][2], ball_rot[2][2])   # cylinder axis
    r_p = C.Snowday.PUCK_RADIUS
    h_half = C.Snowday.PUCK_HEIGHT / 2
    disc = float(np.hypot(r_p, h_half))
    break_gap = C.CONTACT_BREAK_FRAC * disc
    valid = _plane_validity(k, ball_pos)
    zero = jnp.zeros_like(ball_pos[0])

    num = zero
    navg = vzero(zero)
    max_depth = zero
    supp_sum = zero
    for p, plane in enumerate(k.planes):
        pn = cv.vconst(plane[:3], zero)
        a_dot_n = vdot(a, pn)
        support = (r_p * jnp.sqrt(jnp.maximum(1.0 - a_dot_n ** 2, 0.0))
                   + h_half * jnp.abs(a_dot_n))
        dist = _plane_dist(plane, ball_pos)
        gap = dist - support
        act = gap < break_gap if valid[p] is True \
            else valid[p] & (gap < break_gap)
        actf = act.astype(zero.dtype)
        num = num + actf
        navg = vadd(navg, vscale(pn, actf))
        supp_sum = supp_sum + support * actf
        max_depth = jnp.maximum(max_depth, jnp.where(act, -gap, 0.0))
    touching = num > 0
    inv_n = 1.0 / jnp.maximum(num, 1.0)
    navg = vscale(navg, inv_n)
    r_bt = vscale(navg, -(supp_sum * inv_n) * C.UU_TO_BT)

    ball_inv_mass = 1.0 / mut.ball_mass
    # solid cylinder about its own axes, rotated to world
    r_bt_len = r_p * C.UU_TO_BT
    h_bt = C.Snowday.PUCK_HEIGHT * C.UU_TO_BT
    i_axis = 0.5 * mut.ball_mass * r_bt_len ** 2
    i_perp = mut.ball_mass * (3 * r_bt_len ** 2 + h_bt ** 2) / 12.0
    inv_iw = cv.inv_inertia_world(
        ball_rot, (1.0 / i_perp, 1.0 / i_perp, 1.0 / i_axis))

    restitution = max(mut.ball_world_restitution, C.WORLD_RESTITUTION)
    friction = min(mut.ball_world_friction, C.WORLD_FRICTION)
    dv_bt, dw, _ = _contact_vs_static(
        vscale(ball_vel, C.UU_TO_BT), ball_ang_vel, r_bt, navg,
        ball_inv_mass, inv_iw, restitution, friction,
        vel_pre_bt=vscale(ball_vel_pre, C.UU_TO_BT), iterations=10)

    push = vscale(navg, jnp.maximum(max_depth, 0.0) * C.SOLVER_ERP2)
    z = vzero(zero)
    return (vwhere(touching, vscale(dv_bt, C.BT_TO_UU), z),
            vwhere(touching, dw, z), vwhere(touching, push, z), touching,
            navg)


def _resolve_car_ball(k: TickConsts, st, ball_pos, ball_vel, ball_ang_vel,
                      tick_count, inv_iw, alive, cars_vel_pre, ball_vel_pre):
    """contacts.resolve_car_ball.  Ball quantities are env-shaped and
    broadcast against the (C,)+S car arrays.  Manifold live within the box
    breaking threshold; coupled normal+friction rows iterated 10x; psyonix
    callback reads pre-force velocities.

    Returns (car_dv, car_dw, ball_dv, ball_dw, ball_cache_dv, hit_updates,
    touched)."""
    mut = k.mut
    he = k.half_extents
    box_center = vadd(st['pos'], cv.matvec(st['rot'],
                                           cv.vconst(k.hitbox_offset,
                                                     st['pos'][0])))
    # closest point on box to ball center
    local = cv.mat_t_vec(st['rot'], vsub(ball_pos, box_center))
    clamped = (jnp.clip(local[0], -he[0], he[0]),
               jnp.clip(local[1], -he[1], he[1]),
               jnp.clip(local[2], -he[2], he[2]))
    closest = vadd(box_center, cv.matvec(st['rot'], clamped))
    delta = vsub(ball_pos, closest)
    dist = vnorm(delta)
    break_gap = C.CONTACT_BREAK_FRAC * float(
        np.linalg.norm(np.asarray(he)))
    touching = (dist < mut.ball_radius + break_gap) & alive
    n = vwhere(dist > 1e-6, vnormalize(delta),
               vnormalize(vsub(ball_pos, box_center)))

    car_inv_mass = 1.0 / mut.car_mass
    ball_inv_mass = 1.0 / mut.ball_mass
    inertia_ball = 0.4 * mut.ball_mass * (mut.ball_radius * C.UU_TO_BT) ** 2
    s = 1.0 / inertia_ball
    iw_ball = ((s, 0.0, 0.0), (0.0, s, 0.0), (0.0, 0.0, s))

    r_car = vscale(vsub(closest, st['pos']), C.UU_TO_BT)
    r_ball = vscale(vsub(closest, ball_pos), C.UU_TO_BT)

    v_car = vadd(vscale(st['vel'], C.UU_TO_BT), vcross(st['ang_vel'], r_car))
    v_ball = vadd(vscale(ball_vel, C.UU_TO_BT), vcross(ball_ang_vel, r_ball))
    rel_vel = vdot(n, vsub(v_ball, v_car))

    ta_car = _iw_vec(inv_iw, vcross(r_car, n))
    ta_ball = _iw_vec(iw_ball, vcross(r_ball, n))
    denom = (car_inv_mass + ball_inv_mass
             + vdot(n, vcross(ta_car, r_car))
             + vdot(n, vcross(ta_ball, r_ball)))

    # Friction direction: tangential relative velocity at setup
    rel_t0 = vsub(vsub(v_ball, v_car), vscale(n, rel_vel))
    t_len = vnorm(rel_t0)
    t_dir = vwhere(t_len > 1e-9,
                   vscale(rel_t0, 1.0 / jnp.maximum(t_len, 1e-9)),
                   vzero(t_len))
    tt_car = _iw_vec(inv_iw, vcross(r_car, t_dir))
    tt_ball = _iw_vec(iw_ball, vcross(r_ball, t_dir))
    t_denom = (car_inv_mass + ball_inv_mass
               + vdot(t_dir, vcross(tt_car, r_car))
               + vdot(t_dir, vcross(tt_ball, r_ball)))
    mu = C.CARBALL_COLLISION_FRICTION

    # Sequential-impulse iterations over the coupled rows (bullet runs 10);
    # restitution 0, |j_t| <= mu * j_n
    zero3 = vzero(rel_vel)
    dvb, dwb, dvc, dwc = zero3, zero3, zero3, zero3
    jn_acc = jnp.zeros_like(rel_vel)
    jt_acc = jnp.zeros_like(rel_vel)
    for _ in range(10):
        rv = vdot(n, vsub(vadd(v_ball, dvb, vcross(dwb, r_ball)),
                          vadd(v_car, dvc, vcross(dwc, r_car))))
        djn = -rv / jnp.maximum(denom, 1e-12)
        djn = jnp.maximum(jn_acc + djn, 0.0) - jn_acc
        djn = jnp.where(touching, djn, 0.0)
        jn_acc = jn_acc + djn
        dimp = vscale(n, djn)
        dvb = vadd(dvb, vscale(dimp, ball_inv_mass))
        dwb = vadd(dwb, _iw_vec(iw_ball, vcross(r_ball, dimp)))
        dvc = vsub(dvc, vscale(dimp, car_inv_mass))
        dwc = vadd(dwc, _iw_vec(inv_iw, vcross(r_car, cv.vneg(dimp))))

        rt = vdot(t_dir, vsub(vadd(v_ball, dvb, vcross(dwb, r_ball)),
                              vadd(v_car, dvc, vcross(dwc, r_car))))
        djt = -rt / jnp.maximum(t_denom, 1e-12)
        djt = jnp.clip(jt_acc + djt, -mu * jn_acc, mu * jn_acc) - jt_acc
        djt = jnp.where(touching, djt, 0.0)
        jt_acc = jt_acc + djt
        dimp = vscale(t_dir, djt)
        dvb = vadd(dvb, vscale(dimp, ball_inv_mass))
        dwb = vadd(dwb, _iw_vec(iw_ball, vcross(r_ball, dimp)))
        dvc = vsub(dvc, vscale(dimp, car_inv_mass))
        dwc = vadd(dwc, _iw_vec(inv_iw, vcross(r_car, cv.vneg(dimp))))

    imp_total = vadd(vscale(n, jn_acc), vscale(t_dir, jt_acc))
    j_n = jn_acc

    def car_sum(vec):
        return tuple(jnp.sum(c, axis=0) for c in vec)

    imp_masked = vwhere(touching, imp_total, vzero(j_n))
    ball_dv = vscale(car_sum(imp_masked), ball_inv_mass * C.BT_TO_UU)
    ball_dw = _iw_vec(iw_ball, car_sum(vwhere(touching,
                                              vcross(r_ball, imp_total),
                                              vzero(j_n))))
    car_dv = vscale(vwhere(touching, cv.vneg(imp_total), vzero(j_n)),
                    car_inv_mass * C.BT_TO_UU)
    car_dw = _iw_vec(inv_iw, vwhere(touching, vcross(r_car, cv.vneg(imp_total)),
                                    vzero(j_n)))

    # --- Psyonix extra impulse (Arena.cpp:304-331)
    can_extra = touching & (
        (tick_count > st['ball_hit_extra_impulse_tick'] + 1)
        | (st['ball_hit_extra_impulse_tick'] > tick_count))
    # GetState() at callback time reads pre-force velocities
    rel_pos = vsub(ball_pos, st['pos'])
    rel_v = vsub(ball_vel_pre, cars_vel_pre)
    rel_speed = jnp.minimum(vnorm(rel_v),
                            C.BALL_CAR_EXTRA_IMPULSE_MAXDELTAVEL_UU)
    z_scale = C.BALL_CAR_EXTRA_IMPULSE_Z_SCALE
    hit_dir = vnormalize((rel_pos[0], rel_pos[1], rel_pos[2] * z_scale))
    fwd = cv.forward(st['rot'])
    fwd_adj = vscale(fwd, vdot(hit_dir, fwd)
                     * (1.0 - C.BALL_CAR_EXTRA_IMPULSE_FORWARD_SCALE))
    hit_dir = vnormalize(vsub(hit_dir, fwd_adj))
    factor = cv.curve(C.BALL_CAR_EXTRA_IMPULSE_FACTOR_CURVE, rel_speed)
    added_vel = vscale(hit_dir,
                       rel_speed * factor * k.mut.ball_hit_extra_force_scale)
    apply_extra = can_extra & (rel_speed > 0)
    ball_cache_dv = car_sum(vwhere(apply_extra, added_vel, vzero(rel_speed)))

    hit_updates = dict(
        ball_hit_valid=cv.bsel(touching, True, st['ball_hit_valid']),
        ball_hit_rel_pos=vwhere(touching, vsub(closest, ball_pos),
                                st['ball_hit_rel_pos']),
        ball_hit_tick=jnp.where(touching, tick_count, st['ball_hit_tick']),
        ball_hit_extra_impulse_tick=jnp.where(
            can_extra, tick_count, st['ball_hit_extra_impulse_tick']),
        ball_hit_ball_pos=vwhere(touching, cv.vbroadcast(
            ball_pos, st['pos'][0].shape), st['ball_hit_ball_pos']),
        ball_hit_extra_vel=vwhere(apply_extra, added_vel,
                                  vwhere(touching, vzero(rel_speed),
                                         st['ball_hit_extra_vel'])),
    )
    return car_dv, car_dw, ball_dv, ball_dw, ball_cache_dv, hit_updates, \
        touching


def _vslice(vec, i):
    return (vec[0][i], vec[1][i], vec[2][i])


def _mslice(M, i):
    return tuple(tuple(M[r][c][i] for c in range(3)) for r in range(3))


def _pgs_pair(v0, w0, v1, w1, r0s, r1s, n, act, inv_mass, I0, I1,
              rest_coef, mu, deps, dt, v0_pre, v1_pre, iterations=10):
    """Component-form twin of contacts.pgs_rows_two_body for ONE pair's
    4-row manifold: bullet-order sequential impulse (normal rows then
    friction rows per iteration, 10 iterations), restitution from
    pre-force velocities, one setup-time friction direction per row,
    split-impulse positional rows.

    r0s/r1s: list of 4 lever-arm Vecs (BT); act: list of 4 bools; deps:
    list of 4 penetration depths (>= 0).  Returns (dv0, dw0, dv1, dw1,
    push0, push1, turn0, turn1)."""
    zero = jnp.zeros_like(v0[0])
    jac_inv, rest, t_dir, t_jac_inv, push_tgt, actf = [], [], [], [], [], []
    for p in range(4):
        r0, r1 = r0s[p], r1s[p]
        ang0 = cv.matvec(I0, vcross(r0, n))
        ang1 = cv.matvec(I1, vcross(r1, n))
        denom = (2.0 * inv_mass + vdot(n, vcross(ang0, r0))
                 + vdot(n, vcross(ang1, r1)))
        jac_inv.append(1.0 / jnp.maximum(denom, 1e-12))
        rel_rest = vdot(n, vsub(vadd(v0_pre, vcross(w0, r0)),
                                vadd(v1_pre, vcross(w1, r1))))
        rest.append(_restitution_rhs(rel_rest, rest_coef))
        rel_v = vsub(vadd(v0, vcross(w0, r0)), vadd(v1, vcross(w1, r1)))
        tang = vsub(rel_v, vscale(n, vdot(n, rel_v)))
        t_len = vnorm(tang)
        td = vwhere(t_len > 1.49e-8,
                    vscale(tang, 1.0 / jnp.maximum(t_len, 1e-12)),
                    _plane_space_k(n))
        t_dir.append(td)
        f_ang0 = cv.matvec(I0, vcross(r0, td))
        f_ang1 = cv.matvec(I1, vcross(r1, td))
        t_den = (2.0 * inv_mass + vdot(td, vcross(f_ang0, r0))
                 + vdot(td, vcross(f_ang1, r1)))
        t_jac_inv.append(1.0 / jnp.maximum(t_den, 1e-12))
        push_tgt.append(jnp.maximum(deps[p], 0.0) * (C.SOLVER_ERP2 / dt))
        actf.append(act[p].astype(zero.dtype))

    def _apply(acc, direction, r0, r1, dj):
        dv0, dw0, dv1, dw1 = acc
        imp = vscale(direction, dj)
        dv0 = vadd(dv0, vscale(imp, inv_mass))
        dw0 = vadd(dw0, cv.matvec(I0, vcross(r0, imp)))
        dv1 = vsub(dv1, vscale(imp, inv_mass))
        dw1 = vsub(dw1, cv.matvec(I1, vcross(r1, imp)))
        return dv0, dw0, dv1, dw1

    def _vel_iter(_, carry):
        (dv0, dw0, dv1, dw1), j_n, j_t = carry
        j_n, j_t = list(j_n), list(j_t)
        acc = (dv0, dw0, dv1, dw1)
        for p in range(4):
            r0, r1 = r0s[p], r1s[p]
            dv0, dw0, dv1, dw1 = acc
            rel = vdot(n, vsub(vadd(vadd(v0, dv0), vcross(vadd(w0, dw0),
                                                          r0)),
                               vadd(vadd(v1, dv1), vcross(vadd(w1, dw1),
                                                          r1))))
            dj = (rest[p] - rel) * jac_inv[p]
            new_acc = jnp.maximum(j_n[p] + dj, 0.0)
            dj = (new_acc - j_n[p]) * actf[p]
            acc = _apply(acc, n, r0, r1, dj)
            j_n[p] = j_n[p] + dj
        for p in range(4):
            r0, r1 = r0s[p], r1s[p]
            td = t_dir[p]
            dv0, dw0, dv1, dw1 = acc
            rel = vdot(td, vsub(vadd(vadd(v0, dv0), vcross(vadd(w0, dw0),
                                                           r0)),
                                vadd(vadd(v1, dv1), vcross(vadd(w1, dw1),
                                                           r1))))
            dj = -rel * t_jac_inv[p]
            lim = mu * j_n[p]
            new_acc = jnp.clip(j_t[p] + dj, -lim, lim)
            dj = (new_acc - j_t[p]) * actf[p]
            dj = jnp.where(j_n[p] > 0, dj, 0.0)
            acc = _apply(acc, td, r0, r1, dj)
            j_t[p] = j_t[p] + dj
        return acc, tuple(j_n), tuple(j_t)

    z3 = vzero(zero)
    init = ((z3, z3, z3, z3), (zero,) * 4, (zero,) * 4)
    (dv0, dw0, dv1, dw1), _, _ = jax.lax.fori_loop(
        0, iterations, _vel_iter, init)

    def _pos_iter(_, carry):
        (pv0, pw0, pv1, pw1), j_p = carry
        j_p = list(j_p)
        acc = (pv0, pw0, pv1, pw1)
        for p in range(4):
            r0, r1 = r0s[p], r1s[p]
            pv0, pw0, pv1, pw1 = acc
            rel = vdot(n, vsub(vadd(pv0, vcross(pw0, r0)),
                               vadd(pv1, vcross(pw1, r1))))
            dj = (push_tgt[p] - rel) * jac_inv[p]
            new_acc = jnp.maximum(j_p[p] + dj, 0.0)
            dj = (new_acc - j_p[p]) * actf[p]
            acc = _apply(acc, n, r0, r1, dj)
            j_p[p] = j_p[p] + dj
        return acc, tuple(j_p)

    (pv0, pw0, pv1, pw1), _ = jax.lax.fori_loop(
        0, iterations, _pos_iter, ((z3, z3, z3, z3), (zero,) * 4))

    te = C.SPLIT_IMPULSE_TURN_ERP * dt
    return (dv0, dw0, dv1, dw1, vscale(pv0, dt), vscale(pv1, dt),
            vscale(pw0, te), vscale(pw1, te))


def _car_car(k: TickConsts, st, inv_iw, alive, vel_pre):
    """contacts.car_car_interactions over static unordered pairs: dBoxBox
    clamped-corner manifold (box_box.box_box_clamped_components), 4-row
    two-body sequential impulse with per-point friction and split-impulse
    pushout; bump logic reads pre-force velocities.

    Returns (dvel (C Vec), dang, push, turn, cache_dv, got_demoed,
    contact_updates, bump_latch (4 per-car bools dict))."""
    from reinforcement_learning_tpu.physics import box_box
    mut = k.mut
    Cn = k.num_cars
    inv_mass = 1.0 / mut.car_mass

    box_center = vadd(st['pos'], cv.matvec(st['rot'],
                                           cv.vconst(k.hitbox_offset,
                                                     st['pos'][0])))
    zeroS = jnp.zeros_like(st['pos'][0][0])
    falseS = jnp.zeros_like(st['is_demoed'][0])

    dvel = [vzero(zeroS) for _ in range(Cn)]
    dang = [vzero(zeroS) for _ in range(Cn)]
    push = [vzero(zeroS) for _ in range(Cn)]
    turn = [vzero(zeroS) for _ in range(Cn)]
    cache_dv = [vzero(zeroS) for _ in range(Cn)]
    got_demoed = [falseS for _ in range(Cn)]
    bumped_any = [falseS for _ in range(Cn)]
    bumped_id = [jnp.zeros_like(st['car_contact_other_id'][0])
                 for _ in range(Cn)]
    lat_bump = [falseS for _ in range(Cn)]
    lat_bumped = [falseS for _ in range(Cn)]
    lat_demo = [falseS for _ in range(Cn)]
    lat_demoed = [falseS for _ in range(Cn)]

    ups = cv.up(st['rot'])

    for i in range(Cn):
        for j in range(i + 1, Cn):
            ci = _vslice(box_center, i)
            cj = _vslice(box_center, j)
            Ri = _mslice(st['rot'], i)
            Rj = _mslice(st['rot'], j)

            mfc = box_box.box_box_clamped_components(
                vscale(ci, C.UU_TO_BT), Ri, k.he_eff_bt,
                vscale(cj, C.UU_TO_BT), Rj, k.he_eff_bt)
            pair_alive = alive[i] & alive[j]
            overlap = mfc['overlap'] & pair_alive
            act = [a & pair_alive for a in mfc['active']]
            n_on_b = cv.vneg(mfc['normal'])   # +impulse on car i
            pos_i_bt = vscale(_vslice(st['pos'], i), C.UU_TO_BT)
            pos_j_bt = vscale(_vslice(st['pos'], j), C.UU_TO_BT)
            posB = mfc['points']
            posA = [vadd(posB[p], vscale(mfc['normal'], mfc['depth'][p]))
                    for p in range(4)]
            r0s = [vsub(posA[p], pos_i_bt) for p in range(4)]
            r1s = [vsub(posB[p], pos_j_bt) for p in range(4)]

            Ii = _mslice(inv_iw, i)
            Ij = _mslice(inv_iw, j)
            dv0, dw0, dv1, dw1, push0, push1, turn0, turn1 = _pgs_pair(
                vscale(_vslice(st['vel'], i), C.UU_TO_BT),
                _vslice(st['ang_vel'], i),
                vscale(_vslice(st['vel'], j), C.UU_TO_BT),
                _vslice(st['ang_vel'], j),
                r0s, r1s, n_on_b, act, inv_mass, Ii, Ij,
                C.CARCAR_COLLISION_RESTITUTION,
                C.CARCAR_COLLISION_FRICTION, mfc['depth'], k.dt,
                vscale(_vslice(vel_pre, i), C.UU_TO_BT),
                vscale(_vslice(vel_pre, j), C.UU_TO_BT))
            dvel[i] = vadd(dvel[i], vscale(dv0, C.BT_TO_UU))
            dvel[j] = vadd(dvel[j], vscale(dv1, C.BT_TO_UU))
            dang[i] = vadd(dang[i], dw0)
            dang[j] = vadd(dang[j], dw1)
            push[i] = vadd(push[i], vscale(push0, C.BT_TO_UU))
            push[j] = vadd(push[j], vscale(push1, C.BT_TO_UU))
            turn[i] = vadd(turn[i], turn0)
            turn[j] = vadd(turn[j], turn1)

            # per-point local contact points for the bump test
            # (m_localPointA/B in the parent body frame)
            lp_i = [cv.mat_t_vec(Ri, vsub(vscale(posA[p], C.BT_TO_UU),
                                          _vslice(st['pos'], i)))
                    for p in range(4)]
            lp_j = [cv.mat_t_vec(Rj, vsub(vscale(posB[p], C.BT_TO_UU),
                                          _vslice(st['pos'], j)))
                    for p in range(4)]
            hwb = {}
            hwb[i] = falseS
            hwb[j] = falseS
            for p in range(4):
                hwb[i] = hwb[i] | (act[p]
                                   & (lp_i[p][0] > C.BUMP_MIN_FORWARD_DIST))
                hwb[j] = hwb[j] | (act[p]
                                   & (lp_j[p][0] > C.BUMP_MIN_FORWARD_DIST))

            # --- bump / demo, both directions (a bumps b); GetState() at
            # callback time reads pre-force velocities
            for a, b in ((i, j), (j, i)):
                pos_a = _vslice(st['pos'], a)
                pos_b = _vslice(st['pos'], b)
                va = _vslice(vel_pre, a)
                vb = _vslice(vel_pre, b)

                delta_pos = vsub(pos_b, pos_a)
                going_towards = vdot(va, delta_pos) > 0
                vel_dir = vnormalize(va)
                dir_to_other = vnormalize(delta_pos)
                speed_towards = vdot(va, dir_to_other)
                other_away = vdot(vb, vel_dir)
                in_cooldown = (st['car_contact_other_id'][a] == (b + 1)) & (
                    st['car_contact_cooldown'][a] > 0)
                hit_with_bumper = hwb[a]

                bump = (overlap & going_towards & ~in_cooldown
                        & (speed_towards > other_away) & hit_with_bumper)

                if mut.demo_mode == "ON_CONTACT":
                    is_demo = bump
                elif mut.demo_mode == "DISABLED":
                    is_demo = falseS
                else:
                    is_demo = bump & st['is_supersonic'][a]
                if not mut.enable_team_demos and k.teams[a] == k.teams[b]:
                    is_demo = falseS

                plain_bump = bump & ~is_demo
                ground_hit = st['is_on_ground'][b]
                base_scale = jnp.where(
                    ground_hit,
                    cv.curve(C.BUMP_VEL_AMOUNT_GROUND_CURVE, speed_towards),
                    cv.curve(C.BUMP_VEL_AMOUNT_AIR_CURVE, speed_towards))
                up_b = _vslice(ups, b)
                hit_up_dir = vwhere(ground_hit, up_b,
                                    cv.vconst((0.0, 0.0, 1.0), zeroS))
                bump_imp = vadd(
                    vscale(vel_dir, base_scale),
                    vscale(hit_up_dir,
                           cv.curve(C.BUMP_UPWARD_VEL_AMOUNT_CURVE,
                                    speed_towards)
                           * mut.bump_force_scale))
                cache_dv[b] = vadd(cache_dv[b],
                                   vwhere(plain_bump, bump_imp, vzero(zeroS)))
                got_demoed[b] = got_demoed[b] | is_demo
                bumped_any[a] = bumped_any[a] | bump
                bumped_id[a] = jnp.maximum(bumped_id[a],
                                           jnp.where(bump, b + 1, 0))
                if k.teams[a] != k.teams[b]:
                    lat_bump[a] = lat_bump[a] | bump
                    lat_bumped[b] = lat_bumped[b] | bump
                    lat_demo[a] = lat_demo[a] | is_demo
                    lat_demoed[b] = lat_demoed[b] | is_demo

    def stack_vec(lst):
        return tuple(jnp.stack([v[c] for v in lst], axis=0)
                     for c in range(3))

    contact_updates = dict(
        car_contact_other_id=jnp.where(
            jnp.stack(bumped_any, 0), jnp.stack(bumped_id, 0),
            st['car_contact_other_id']),
        car_contact_cooldown=jnp.where(
            jnp.stack(bumped_any, 0), mut.bump_cooldown_time,
            st['car_contact_cooldown']),
    )
    latches = dict(step_bump=jnp.stack(lat_bump, 0),
                   step_bumped=jnp.stack(lat_bumped, 0),
                   step_demo=jnp.stack(lat_demo, 0),
                   step_demoed=jnp.stack(lat_demoed, 0))
    return (stack_vec(dvel), stack_vec(dang), stack_vec(push),
            stack_vec(turn), stack_vec(cache_dv), jnp.stack(got_demoed, 0),
            contact_updates, latches)


def _pads_pickup(k: TickConsts, st, pads_active, pads_cooldown,
                 pads_locked, alive):
    """step._pads_check_and_pickup incl. the lock hysteresis
    (BoostPad.cpp:62-105): the previously-locked car keeps the pad via a
    pad-box vs car-AABB test, others need the cylinder-origin test; the
    LAST colliding car (highest index, Arena.cpp:783-796 iteration order)
    takes the lock and the pickup.  Returns (pads_active, pads_cooldown,
    pads_locked, new_boost)."""
    mut = k.mut
    Cn = k.num_cars
    x, y, z = st['pos']
    he_m = tuple(v * 50.0 for v in k.he_eff_bt)   # margin-adjusted, uu
    box_center = vadd(st['pos'], cv.matvec(st['rot'],
                                           cv.vconst(k.hitbox_offset,
                                                     st['pos'][0])))
    # |R| @ he — world AABB half extents of the hitbox
    aabb_half = tuple(
        sum(jnp.abs(st['rot'][r][c]) * he_m[c] for c in range(3))
        for r in range(3))
    gained = jnp.zeros_like(st['boost'])
    new_active, new_cd, new_locked = [], [], []
    for p in range(len(k.pad_locs)):
        lx, ly, lz = k.pad_locs[p]
        big = k.pad_is_big[p]
        rad = C.BoostPads.CYL_RAD_BIG if big else C.BoostPads.CYL_RAD_SMALL
        box_rad = (C.BoostPads.BOX_RAD_BIG if big
                   else C.BoostPads.BOX_RAD_SMALL)
        d2 = (x - lx) ** 2 + (y - ly) ** 2
        cyl_hit = (d2 < rad * rad) & (jnp.abs(z - lz)
                                      < C.BoostPads.CYL_HEIGHT)
        aabb_hit = (
            (lx + box_rad > box_center[0] - aabb_half[0])
            & (lx - box_rad < box_center[0] + aabb_half[0])
            & (ly + box_rad > box_center[1] - aabb_half[1])
            & (ly - box_rad < box_center[1] + aabb_half[1])
            & (lz + C.BoostPads.BOX_HEIGHT > box_center[2] - aabb_half[2])
            & (lz < box_center[2] + aabb_half[2]))
        any_collide = None
        winner = jnp.zeros_like(pads_locked[p])
        colliding = []
        for c in range(Cn):
            lock_c = pads_locked[p] == (c + 1)
            col_c = cv.bsel(lock_c, aabb_hit[c], cyl_hit[c]) & alive[c]
            colliding.append(col_c)
            any_collide = col_c if any_collide is None \
                else (any_collide | col_c)
            winner = jnp.where(col_c, c + 1, winner)
        colliding = jnp.stack(colliding, 0)
        pickup = any_collide & pads_active[p]
        amount = (C.BoostPads.BOOST_AMOUNT_BIG if big
                  else C.BoostPads.BOOST_AMOUNT_SMALL)
        win_rows = jnp.stack([pickup & (winner == c + 1)
                              for c in range(Cn)], 0)
        gained = gained + win_rows.astype(gained.dtype) * amount
        cd_new = (mut.boost_pad_cooldown_big if big
                  else mut.boost_pad_cooldown_small)
        new_active.append(pads_active[p] & ~pickup)
        new_cd.append(jnp.where(pickup, cd_new, pads_cooldown[p]))
        new_locked.append(winner)
    new_boost = jnp.minimum(st['boost'] + gained, C.BOOST_MAX)
    return (jnp.stack(new_active, 0), jnp.stack(new_cd, 0),
            jnp.stack(new_locked, 0), new_boost)


def _respawn(k: TickConsts, st, mask, respawn_idx):
    """step._respawn_cars on the component state (in place via wheres)."""
    mut = k.mut
    zero = jnp.zeros_like(st['pos'][0])
    sx = zero
    sy = zero
    syaw = zero
    for kk, (tx, ty, tyaw) in enumerate(k.respawn_table):
        sel = respawn_idx == kk
        sx = jnp.where(sel, tx, sx)
        sy = jnp.where(sel, ty, sy)
        syaw = jnp.where(sel, tyaw, syaw)
    team_sign = _slot_const([1.0 if t == 0 else -1.0 for t in k.teams], zero)
    yaw_off = _slot_const([0.0 if t == 0 else np.pi for t in k.teams], zero)
    pos = (sx, sy * team_sign, jnp.full_like(zero, C.CAR_RESPAWN_Z))
    rot = cv.yaw_mat(syaw + yaw_off)

    def w(field, new):
        return cv.sel(mask, new, field)

    def wv(field, new):
        return vwhere(mask, new, field)

    st = dict(st)
    st['pos'] = wv(st['pos'], pos)
    st['rot'] = cv.mwhere(mask, rot, st['rot'])
    st['vel'] = wv(st['vel'], vzero(zero))
    st['ang_vel'] = wv(st['ang_vel'], vzero(zero))
    st['is_on_ground'] = w(st['is_on_ground'], jnp.ones_like(mask))
    st['wheels_with_contact'] = [w(c, jnp.zeros_like(mask))
                                 for c in st['wheels_with_contact']]
    for f in ('has_jumped', 'has_double_jumped', 'has_flipped', 'is_flipping',
              'is_jumping', 'is_supersonic', 'is_auto_flipping',
              'has_world_contact', 'is_demoed'):
        st[f] = w(st[f], jnp.zeros_like(mask))
    st['flip_rel_torque'] = wv(st['flip_rel_torque'], vzero(zero))
    st['world_contact_normal'] = wv(st['world_contact_normal'], vzero(zero))
    for f in ('jump_time', 'flip_time', 'air_time', 'air_time_since_jump',
              'time_spent_boosting', 'supersonic_time', 'handbrake_val',
              'auto_flip_timer', 'auto_flip_torque_scale',
              'car_contact_cooldown', 'demo_respawn_timer'):
        st[f] = w(st[f], zero)
    st['boost'] = w(st['boost'], jnp.full_like(zero,
                                               mut.car_spawn_boost_amount))
    st['car_contact_other_id'] = w(st['car_contact_other_id'],
                                   jnp.zeros_like(st['car_contact_other_id']))
    return st


# ---------------------------------------------------------------------------
# The tick (twin of step.arena_tick) and the multi-tick step loop

# Keys of per-car state (everything restored from the frozen snapshot for
# cars that were demolished at tick start), including the wheel-drive
# sub-dict ('wc').
CAR_KEYS = (
    'pos', 'rot', 'vel', 'ang_vel', 'is_on_ground', 'wheels_with_contact',
    'has_jumped', 'has_double_jumped', 'has_flipped', 'flip_rel_torque',
    'jump_time', 'flip_time', 'is_flipping', 'is_jumping', 'air_time',
    'air_time_since_jump', 'boost', 'time_spent_boosting', 'is_supersonic',
    'supersonic_time', 'handbrake_val', 'is_auto_flipping', 'auto_flip_timer',
    'auto_flip_torque_scale', 'has_world_contact', 'world_contact_normal',
    'car_contact_other_id', 'car_contact_cooldown', 'is_demoed',
    'demo_respawn_timer', 'ball_hit_valid', 'ball_hit_rel_pos',
    'ball_hit_tick', 'ball_hit_extra_impulse_tick', 'ball_hit_ball_pos',
    'ball_hit_extra_vel', 'last_controls', 'controls', 'wc')


def _clamp_controls(controls):
    """step.clamp_controls on a tuple of 8 arrays."""
    out = [jnp.clip(c, -1.0, 1.0) for c in controls[:5]]
    out += [(c > 0).astype(c.dtype) for c in controls[5:]]
    return tuple(out)


def tick(k: TickConsts, st: dict, respawn_idx) -> dict:
    """One 1/120 s physics tick on the component state dict."""
    mut, dt, Cn = k.mut, k.dt, k.num_cars
    st = dict(st)

    controls = _clamp_controls(st['controls'])
    st['controls'] = controls

    # --- demo / respawn (Car.cpp:68-87)
    demo_timer = jnp.where(st['is_demoed'],
                           jnp.maximum(st['demo_respawn_timer'] - dt, 0.0),
                           st['demo_respawn_timer'])
    respawn_now = st['is_demoed'] & (demo_timer == 0.0)
    st['demo_respawn_timer'] = demo_timer
    st = _respawn(k, st, respawn_now, respawn_idx)
    alive = ~st['is_demoed']
    frozen = {key: st[key] for key in CAR_KEYS}

    inv_iw = cv.inv_inertia_world(st['rot'], k.inv_i_local)

    # --- updateVehicleFirst: raycasts + stale friction impulses
    rc = _wheel_raycasts(k, st, inv_iw)
    wheel_impulses = _calc_friction_impulses(k, st, rc, st['wc'], inv_iw)

    num_contact = sum(h.astype(jnp.int32) for h in rc['hit'])
    st['wheels_with_contact'] = list(rc['hit'])
    st['is_on_ground'] = num_contact >= 3

    jump_pressed = (controls[JUMP] > 0) & ~(st['last_controls'][JUMP] > 0)
    fwd_speed = vdot(st['vel'], cv.forward(st['rot']))

    # --- _UpdateWheels
    new_wc, hb_val, sticky_accel, real_throttle = _update_wheels(
        k, st, rc, st['wc'], controls, fwd_speed, num_contact)
    st['handbrake_val'] = hb_val
    st['wc'] = new_wc

    # --- air torque / flipping clear
    air_mask = num_contact < 3
    zero_wheels = num_contact == 0
    air_ang_accel, air_accel, is_flipping = _update_air_torque(
        k, st, controls, air_mask, zero_wheels)
    st['is_flipping'] = cv.bsel(air_mask, is_flipping, False)

    # --- jump
    jump_updates, jump_dv, jump_accel = _update_jump(k, st, controls,
                                                     jump_pressed)
    st['vel'] = vadd(st['vel'], jump_dv)
    st.update(jump_updates)

    # --- auto flip
    af_updates, af_dv, af_dw = _update_auto_flip(k, st, controls,
                                                 jump_pressed)
    st['vel'] = vadd(st['vel'], af_dv)
    st['ang_vel'] = vadd(st['ang_vel'], af_dw)
    st.update(af_updates)

    # --- double jump / flip
    dj_updates, dj_dv, zdamp_maybe, zdamp_always = \
        _update_double_jump_or_flip(
            k, st, controls, jump_pressed, fwd_speed,
            st['is_jumping'], st['has_jumped'], st['jump_time'],
            st['is_flipping'])
    vel = vadd(st['vel'], dj_dv)
    do_damp = zdamp_always | (zdamp_maybe & (vel[2] < 0))
    damp_factor = (1.0 - C.FLIP_Z_DAMP_120) ** (dt * 120.0)
    vel = (vel[0], vel[1], vel[2] * jnp.where(do_damp, damp_factor, 1.0))
    st['vel'] = vel
    st.update(dj_updates)

    # --- auto roll
    ar_cond = (controls[THROTTLE] != 0) & (
        ((num_contact > 0) & (num_contact < 4)) | st['has_world_contact'])
    ar_accel, ar_ang_accel = _update_auto_roll(k, st, rc, num_contact)
    ar_accel = vwhere(ar_cond, ar_accel, vzero(ar_accel[0]))
    ar_ang_accel = vwhere(ar_cond, ar_ang_accel, vzero(ar_ang_accel[0]))

    st['has_world_contact'] = jnp.zeros_like(alive)

    # --- updateVehicleSecond: suspension + friction application
    vel, ang_vel = _apply_suspension(k, st, rc, inv_iw)
    st['vel'], st['ang_vel'] = vel, ang_vel
    vel, ang_vel = _apply_friction_impulses(k, st, rc, wheel_impulses, inv_iw)
    st['vel'], st['ang_vel'] = vel, ang_vel

    # --- boost
    boost_updates, boost_accel = _update_boost(k, st, controls)
    st.update(boost_updates)

    # --- boost pad pre-tick
    pads_cd = jnp.maximum(st['pads_cooldown'] - dt, 0.0)
    st['pads_cooldown'] = pads_cd
    st['pads_active'] = pads_cd == 0.0

    # ===================== World step ======================================
    gravity = (0.0, 0.0, mut.gravity_z)

    # Pre-force velocities: bullet defers forces into the solver's
    # externalForceImpulse; restitution + contact callbacks read velocities
    # WITHOUT them (see physics/contacts.py docstrings)
    cars_vel_pre = st['vel']
    cars_ang_vel_pre = st['ang_vel']

    total_accel = vadd(cv.vconst(gravity, sticky_accel[0]), sticky_accel,
                       air_accel, jump_accel, ar_accel, boost_accel)
    total_ang_accel = vadd(air_ang_accel, ar_ang_accel)
    st['vel'] = vadd(st['vel'], vscale(total_accel, dt))
    st['ang_vel'] = vadd(st['ang_vel'], vscale(total_ang_accel, dt))

    # Ball pre-tick (heatseeker steering, Ball.cpp:153-200)
    if k.game_mode == "heatseeker":
        st = _hs_steer(k, st)

    # Ball: sleeping + gravity + drag
    bvel, bang = st['ball_vel'], st['ball_ang_vel']
    ball_awake = (vnorm(bvel) > 0) | (vnorm(bang) > 0)
    ball_vel_pre = bvel
    drag = (1.0 - mut.ball_drag) ** dt
    st['ball_vel'] = vwhere(
        ball_awake,
        vscale(vadd(bvel, vscale(cv.vconst(gravity, bvel[0]), dt)), drag),
        bvel)

    # --- car-world
    if k.use_mesh:
        cw_dv, cw_dw, cw_push, cw_turn, cw_contact, cw_normal = \
            _resolve_car_world_mesh_k(k, st, inv_iw, cars_vel_pre,
                                      cars_ang_vel_pre)
    else:
        cw_dv, cw_dw, cw_push, cw_contact, cw_normal = _resolve_car_world(
            k, st, inv_iw, cars_vel_pre, cars_ang_vel_pre)
        cw_turn = None
    st['vel'] = vadd(st['vel'], cw_dv)
    st['ang_vel'] = vadd(st['ang_vel'], cw_dw)
    st['has_world_contact'] = cw_contact
    st['world_contact_normal'] = vwhere(cw_contact, cw_normal,
                                        st['world_contact_normal'])

    # --- car-ball (+psyonix impulse cache)
    cb_car_dv, cb_car_dw, cb_ball_dv, cb_ball_dw, ball_cache_dv, \
        hit_updates, ball_touched = _resolve_car_ball(
            k, st, st['ball_pos'], st['ball_vel'], st['ball_ang_vel'],
            st['tick_count'], inv_iw, alive, cars_vel_pre, ball_vel_pre)
    st['vel'] = vadd(st['vel'], cb_car_dv)
    st['ang_vel'] = vadd(st['ang_vel'], cb_car_dw)
    st.update(hit_updates)
    st['ball_vel'] = vadd(st['ball_vel'], cb_ball_dv)
    st['ball_ang_vel'] = vadd(st['ball_ang_vel'], cb_ball_dw)

    # Ball::_OnHit (heatseeker target/speedup, Ball.cpp:203-216)
    if k.game_mode == "heatseeker":
        st = _hs_on_hit(k, st, [ball_touched[c] & alive[c]
                                for c in range(Cn)])

    # --- ball-world
    if k.game_mode == "snowday":
        # the puck collides the analytic planes with its exact cylinder
        # support (never the triangle mesh), like the XLA path
        bw_dv, bw_dw, bw_push, bw_touch, bw_navg = \
            _resolve_ball_world_snowday(
                k, st['ball_pos'], st['ball_vel'], st['ball_ang_vel'],
                st['ball_rot'], ball_vel_pre)
    elif k.use_mesh:
        bw_dv, bw_dw, bw_push, bw_touch, bw_navg = \
            _resolve_ball_world_mesh_k(
                k, st['ball_pos'], st['ball_vel'], st['ball_ang_vel'],
                ball_vel_pre)
    else:
        bw_dv, bw_dw, bw_push, bw_touch, bw_navg = _resolve_ball_world(
            k, st['ball_pos'], st['ball_vel'], st['ball_ang_vel'],
            ball_vel_pre)
    st['ball_vel'] = vadd(st['ball_vel'], bw_dv)
    st['ball_ang_vel'] = vadd(st['ball_ang_vel'], bw_dw)

    # Ball::_OnWorldCollision (heatseeker backwall flip, Ball.cpp:218-246;
    # snowday puck ground stick, step.arena_tick)
    if k.game_mode == "heatseeker":
        st, hs_cache = _hs_wall_bounce(k, st, bw_touch, bw_navg)
        ball_cache_dv = vadd(ball_cache_dv, hs_cache)
    elif k.game_mode == "snowday":
        stick = (C.Snowday.PUCK_GROUND_STICK_FORCE / mut.ball_mass
                 * dt * C.BT_TO_UU)
        st['ball_vel'] = vwhere(
            bw_touch, vsub(st['ball_vel'], vscale(bw_navg, stick)),
            st['ball_vel'])

    # --- car-car (+bump/demo)
    if Cn > 1:
        cc_dv, cc_dw, cc_push, cc_turn, cc_cache_dv, got_demoed, \
            cc_updates, latches = _car_car(k, st, inv_iw, alive,
                                           cars_vel_pre)
        st['vel'] = vadd(st['vel'], cc_dv)
        st['ang_vel'] = vadd(st['ang_vel'], cc_dw)
        st.update(cc_updates)
        st['is_demoed'] = st['is_demoed'] | got_demoed
        st['demo_respawn_timer'] = jnp.where(got_demoed, mut.respawn_delay,
                                             st['demo_respawn_timer'])
    else:
        cc_push = vzero(st['vel'][0])
        cc_turn = None
        cc_cache_dv = vzero(st['vel'][0])
        latches = None

    # --- integrate transforms
    st['pos'] = vadd(st['pos'], vscale(st['vel'], dt), cw_push, cc_push)
    st['rot'] = cv.integrate_rotation(st['rot'], st['ang_vel'], dt)
    if cw_turn is not None:
        # split-impulse turn pseudo-velocity writeback (step.arena_tick)
        st['rot'] = cv.integrate_rotation(st['rot'], cw_turn, 1.0)
    if cc_turn is not None:
        st['rot'] = cv.integrate_rotation(st['rot'], cc_turn, 1.0)
    ball_awake = (vnorm(st['ball_vel']) > 0) | (vnorm(st['ball_ang_vel']) > 0)
    st['ball_pos'] = vwhere(
        ball_awake,
        vadd(st['ball_pos'], vscale(st['ball_vel'], dt), bw_push),
        st['ball_pos'])
    st['ball_rot'] = cv.mwhere(
        ball_awake,
        cv.integrate_rotation(st['ball_rot'], st['ball_ang_vel'], dt),
        st['ball_rot'])

    # ===================== Post-tick + finish ==============================
    speed_sq = cv.vnorm2(st['vel'])
    maintain = st['is_supersonic'] & (
        st['supersonic_time'] < C.SUPERSONIC_MAINTAIN_MAX_TIME)
    thresh = jnp.where(maintain, C.SUPERSONIC_MAINTAIN_MIN_SPEED,
                       C.SUPERSONIC_START_SPEED)
    is_ss = speed_sq >= thresh * thresh
    st['is_supersonic'] = is_ss
    st['supersonic_time'] = jnp.where(is_ss, st['supersonic_time'] + dt, 0.0)
    st['car_contact_cooldown'] = jnp.maximum(
        st['car_contact_cooldown'] - dt, 0.0)
    st['last_controls'] = controls

    st['vel'] = cv.vclamp_norm(vadd(st['vel'], cc_cache_dv), C.CAR_MAX_SPEED)
    st['ang_vel'] = cv.vclamp_norm(st['ang_vel'], C.CAR_MAX_ANG_SPEED)

    st['ball_vel'] = cv.vclamp_norm(vadd(st['ball_vel'], ball_cache_dv),
                                    mut.ball_max_speed)
    st['ball_ang_vel'] = cv.vclamp_norm(st['ball_ang_vel'],
                                        C.BALL_MAX_ANG_SPEED)

    # --- restore frozen state for cars demoed at tick start
    car_now = {key: st[key] for key in CAR_KEYS}
    car_sel = jax.tree.map(lambda u, f: cv.sel(alive, u, f),
                           car_now, frozen)
    st.update(car_sel)

    # --- boost pad pickup
    pa, pc, pl, new_boost = _pads_pickup(k, st, st['pads_active'],
                                         st['pads_cooldown'],
                                         st['pads_locked'], alive)
    st['pads_active'], st['pads_cooldown'] = pa, pc
    st['pads_locked'] = pl
    st['boost'] = new_boost

    goal = jnp.abs(st['ball_pos'][1]) > (mut.goal_base_threshold_y
                                         + mut.ball_radius)
    st['goal_scored'] = st['goal_scored'] | goal
    if latches is not None:
        for f in ('step_bump', 'step_bumped', 'step_demo', 'step_demoed'):
            st[f] = st[f] | latches[f]
    st['tick_count'] = st['tick_count'] + 1
    return st


def _bools_to_f32(st):
    """Bool leaves -> f32 0/1 (Mosaic can't round-trip i1 through a
    fori_loop carry: i8->i1 truncation is unsupported)."""
    return jax.tree.map(
        lambda x: x.astype(jnp.float32) if x.dtype == jnp.bool_ else x, st)


def _restore_bools(st, ref):
    return jax.tree.map(
        lambda x, r: (x != 0) if r.dtype == jnp.bool_ else x, st, ref)


def _wrap_k(x, minmax):
    """Math::WrapNormalizeFloat (step._wrap twin)."""
    r = jnp.fmod(x, minmax * 2)
    r = jnp.where(r > minmax, r - minmax * 2, r)
    return jnp.where(r < -minmax, r + minmax * 2, r)


def _round_angle_ue3_k(ang):
    """Math::RoundAngleUE3 (step._round_angle_ue3 twin)."""
    to_ints = float(1 << 15) / np.pi
    back = (1.0 / to_ints) * 4.0
    r = (ang * to_ints).astype(jnp.int32) >> 2
    return (r & (0x4000 - 1)).astype(jnp.float32) * back


def _hs_steer(k: TickConsts, st):
    """Ball::_PreTickUpdate heatseeker branch (step._heatseeker_steer
    twin, Ball.cpp:153-200) on component state."""
    HS = C.Heatseeker
    dt = k.dt
    ytd, tspeed, tsince = st['ball_hs']
    active = ytd != 0

    vel = st['ball_vel']
    speed = vnorm(vel)
    d2 = jnp.sqrt(vel[0] ** 2 + vel[1] ** 2)
    v_yaw = cv.atan2(vel[1], vel[0])
    v_pitch = cv.atan2(vel[2], d2)

    tx = jnp.zeros_like(ytd)
    ty = HS.TARGET_Y * ytd
    tz = jnp.full_like(ytd, HS.TARGET_Z)
    gx = tx - st['ball_pos'][0]
    gy = ty - st['ball_pos'][1]
    gz = tz - st['ball_pos'][2]
    g_d2 = jnp.sqrt(gx ** 2 + gy ** 2)
    g_yaw = cv.atan2(gy, gx)
    g_pitch = cv.atan2(gz, g_d2)

    d_yaw = _wrap_k(g_yaw - v_yaw, np.pi)
    d_pitch = _wrap_k(g_pitch - v_pitch, np.pi / 2)

    f = (speed / HS.MAX_SPEED) * dt
    new_yaw = _wrap_k(v_yaw + d_yaw * f * HS.HORIZONTAL_BLEND, np.pi)
    new_pitch = jnp.clip(_wrap_k(v_pitch + d_pitch * f * HS.VERTICAL_BLEND,
                                 np.pi / 2),
                         -HS.MAX_TURN_PITCH, HS.MAX_TURN_PITCH)
    new_yaw = _round_angle_ue3_k(new_yaw)
    new_pitch = _round_angle_ue3_k(new_pitch)

    new_speed = speed + (tspeed - speed) * HS.SPEED_BLEND
    cp, sp = jnp.cos(new_pitch), jnp.sin(new_pitch)
    new_vel = (cp * jnp.cos(new_yaw) * new_speed,
               cp * jnp.sin(new_yaw) * new_speed,
               sp * new_speed)

    st = dict(st)
    st['ball_vel'] = vwhere(active, new_vel, st['ball_vel'])
    st['ball_hs'] = (ytd, tspeed,
                     jnp.where(active, tsince + dt, tsince))
    return st


def _hs_on_hit(k: TickConsts, st, touched):
    """Ball::_OnHit heatseeker branch (step._heatseeker_on_hit twin):
    the reference fires _OnHit once PER touching car in index order,
    each call reading the previous call's writes — folded sequentially
    so same-tick opposite-team touches sequence identically."""
    HS = C.Heatseeker
    ytd, tspeed, tsince = st['ball_hs']
    for c in range(k.num_cars):
        t = touched[c]
        d = 1.0 if k.teams[c] == 0 else -1.0
        can_increase = (tsince > HS.MIN_SPEEDUP_INTERVAL) | (ytd == 0)
        sp = t & can_increase & (d != ytd)
        ytd = jnp.where(t, d, ytd)
        tspeed = jnp.where(
            sp, jnp.minimum(tspeed + HS.TARGET_SPEED_INCREMENT,
                            HS.MAX_SPEED), tspeed)
        tsince = jnp.where(sp, 0.0, tsince)
    st = dict(st)
    st['ball_hs'] = (ytd, tspeed, tsince)
    return st


def _hs_wall_bounce(k: TickConsts, st, touching, navg):
    """Ball::_OnWorldCollision heatseeker branch (step.
    _heatseeker_wall_bounce twin): deep backwall hits flip the target and
    add a goal-ward bounce into the velocity cache.  Returns (st,
    cache_dv Vec)."""
    HS = C.Heatseeker
    ytd, tspeed, tsince = st['ball_hs']
    rel_normal_y = navg[1] * ytd
    rel_y = st['ball_pos'][1] * ytd
    flip = (touching & (ytd != 0)
            & (rel_normal_y <= -HS.WALL_BOUNCE_CHANGE_Y_NORMAL)
            & (rel_y >= C.ARENA_EXTENT_Y - HS.WALL_BOUNCE_CHANGE_Y_THRESH))
    new_ytd = jnp.where(flip, -ytd, ytd)
    tx = -st['ball_pos'][0]
    ty = HS.TARGET_Y * new_ytd - st['ball_pos'][1]
    tz = HS.TARGET_Z - st['ball_pos'][2]
    dir_to_goal = vnormalize((tx, ty, tz))
    up_frac = HS.WALL_BOUNCE_UP_FRAC
    bx = dir_to_goal[0] * (1.0 - up_frac)
    by = dir_to_goal[1] * (1.0 - up_frac)
    bz = dir_to_goal[2] * (1.0 - up_frac) + up_frac
    mag = vnorm(st['ball_vel']) * HS.WALL_BOUNCE_FORCE_SCALE
    zero = jnp.zeros_like(ytd)
    cache_dv = vwhere(flip, (bx * mag, by * mag, bz * mag),
                      (zero, zero, zero))
    st = dict(st)
    st['ball_hs'] = (new_ytd, tspeed, tsince)
    return st, cache_dv


def step(k: TickConsts, st: dict, new_controls, respawn_idx,
         tick_skip: int = 8, action_delay: int = 7) -> dict:
    """Multi-tick env step with action delay (twin of step.arena_step).
    ``new_controls``: tuple of 8 (C,)+S arrays; ``respawn_idx``: (C,)+S i32
    (one pre-drawn respawn-location index per car for this step)."""
    st = dict(st)
    st['goal_scored'] = jnp.zeros_like(st['goal_scored'])
    for f in ('step_bump', 'step_bumped', 'step_demo', 'step_demoed'):
        st[f] = jnp.zeros_like(st[f])
    st0 = st

    def body(i, carry):
        s = _restore_bools(carry, st0)
        sw = i == action_delay
        s = dict(s)
        s['controls'] = tuple(
            jnp.where(sw, new_controls[c], s['controls'][c])
            for c in range(8))
        return _bools_to_f32(tick(k, s, respawn_idx))

    out = jax.lax.fori_loop(0, tick_skip, body, _bools_to_f32(st))
    return _restore_bools(out, st0)
