"""Contact generation + impulse resolution for one arena.

Reimplements the subset of the reference's patched Bullet solver that the
game actually exercises:

  * sequential-impulse contact with restitution threshold and split-impulse
    positional pushout (reference: btSequentialImpulseConstraintSolver.cpp
    :795-980 setupContactConstraint; erp2=0.8 and huge split threshold set in
    Arena.cpp:485-489)
  * the ROCKETSIM "special" ball-world resolve that merges all ball-world
    manifold points into one averaged contact with no positional term
    (reference: btSequentialImpulseConstraintSolver.cpp:1164-1212)
  * material combination rules: vs static -> friction=min, restitution=max;
    dynamic pairs -> product, except pairs overridden by the arena callbacks
    (reference: btManifoldResult.cpp:56-77, Arena.cpp:283-427)
  * car-ball "psyonix impulse" + BallHitInfo (reference: Arena.cpp:283-334)
  * car-car bumps and demos (reference: Arena.cpp:336-418)

All math is in BT units inside this module (1 bt = 50 uu) because impulse
denominators involve the inertia tensor; inputs/outputs are uu.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu import maths as m
from reinforcement_learning_tpu.physics import arena_geom as geom
from reinforcement_learning_tpu.physics.state import (BallState, CarsState,
                                                      MutatorConfig)


def _restitution_rhs(rel_vel, combined_restitution):
    """bullet restitutionCurve with the velocity threshold
    (Arena default: 0.2 bt/s)."""
    rest = combined_restitution * -rel_vel
    rest = jnp.where(jnp.abs(rel_vel) < 0.2, 0.0, rest)
    return jnp.maximum(rest, 0.0)


def _plane_space_dir(n):
    """bullet btPlaneSpace1 first tangent: the fallback friction direction
    when the tangential relative velocity is ~zero."""
    nz_big = jnp.abs(n[..., 2]) > 0.70710678
    # (0, -n.z, n.y) branch normalized
    a = n[..., 1] ** 2 + n[..., 2] ** 2
    k1 = 1.0 / jnp.sqrt(jnp.maximum(a, 1e-12))
    t1 = jnp.stack([jnp.zeros_like(k1), -n[..., 2] * k1, n[..., 1] * k1],
                   axis=-1)
    # (-n.y, n.x, 0) branch normalized
    b = n[..., 0] ** 2 + n[..., 1] ** 2
    k2 = 1.0 / jnp.sqrt(jnp.maximum(b, 1e-12))
    t2 = jnp.stack([-n[..., 1] * k2, n[..., 0] * k2, jnp.zeros_like(k2)],
                   axis=-1)
    return jnp.where(nz_big[..., None], t1, t2)


def pgs_rows_vs_static(vel_bt, ang_vel, r_bt, n, active, inv_mass, inv_iw,
                       restitution_coeff, friction_coeff, dist_bt, dt,
                       vel_pre_bt=None, ang_vel_pre=None, iterations=10):
    """Bullet-order PGS over R contact rows of one dynamic body against the
    static world (btSequentialImpulseConstraintSolver with the fork's
    settings: 10 iterations, split impulse always on, erp2=0.8, no creep
    allowance, restitution threshold 0.2, one velocity-dependent friction
    direction per row with btPlaneSpace1 fallback).

    Per iteration all normal rows are solved in row order, then all friction
    rows in row order (SOLVER_INTERLEAVE_CONTACT_AND_FRICTION off), exactly
    like solveSingleIteration.  A second PGS with the same jacobians solves
    the split-impulse positional rows (resolveSplitPenetrationImpulse);
    the angular pseudo-velocity is scaled by splitImpulseTurnErp=0.1 at
    writeback.

    Shapes: vel_bt/ang_vel (..., 3); r_bt/n (..., R, 3); active/dist_bt
    (..., R); inv_iw (..., 3, 3).  dist_bt: full-shape contact distance
    (negative = penetration) in BT units.

    Returns (dv_bt (...,3), dw (...,3), push_bt (...,3) position delta,
    turn (...,3) extra rotation vector, j_n (...,R) accumulated normal
    impulses).
    """
    R = n.shape[-2]
    vel_at = vel_bt[..., None, :] + jnp.cross(ang_vel[..., None, :], r_bt)

    torque_axis = jnp.cross(r_bt, n)
    ang_comp = jnp.einsum('...ij,...rj->...ri', inv_iw, torque_axis)
    denom = inv_mass + m.dot(n, jnp.cross(ang_comp, r_bt))
    jac_inv = 1.0 / jnp.maximum(denom, 1e-12)

    # restitution from pre-force velocities (see module docstring)
    if vel_pre_bt is None:
        rel_rest = m.dot(n, vel_at)
    else:
        wpre = ang_vel if ang_vel_pre is None else ang_vel_pre
        rel_rest = m.dot(n, vel_pre_bt[..., None, :]
                         + jnp.cross(wpre[..., None, :], r_bt))
    rest = _restitution_rhs(rel_rest, restitution_coeff)

    # friction direction at setup: tangential relative velocity (with
    # forces); btPlaneSpace1 fallback when ~zero (convertContactInner)
    tang = vel_at - n * m.dot(n, vel_at, keepdims=True)
    t_len = m.norm(tang, keepdims=True)
    t_dir = jnp.where(t_len > 1.49e-8, tang / jnp.maximum(t_len, 1e-12),
                      _plane_space_dir(n))
    t_axis = jnp.cross(r_bt, t_dir)
    t_ang = jnp.einsum('...ij,...rj->...ri', inv_iw, t_axis)
    t_denom = inv_mass + m.dot(t_dir, jnp.cross(t_ang, r_bt))
    t_jac_inv = 1.0 / jnp.maximum(t_denom, 1e-12)

    # positional rhs: -penetration * erp2 / dt when penetrating
    push_target = jnp.maximum(-dist_bt, 0.0) * (C.SOLVER_ERP2 / dt)

    zero3 = jnp.zeros_like(vel_bt)
    zeroR = jnp.zeros(n.shape[:-1])
    act = active.astype(n.dtype)

    def _row(i, arr):
        return arr[..., i, :]

    # --- velocity PGS ---
    # One fori_loop per PGS (body = the unrolled Gauss-Seidel row sweep):
    # a fully unrolled 10x(2R) solve chain compiles pathologically slowly
    # on XLA (~90s for R=8); the loop form is ~10x smaller with identical
    # iteration order.
    def _vel_iter(_, carry):
        dv, dw, j_n, j_t = carry
        for i in range(R):
            ni, ri = _row(i, n), _row(i, r_bt)
            rel = m.dot(ni, (vel_bt + dv) + jnp.cross(ang_vel + dw, ri))
            dj = (rest[..., i] - rel) * jac_inv[..., i]
            new_acc = jnp.maximum(j_n[..., i] + dj, 0.0)
            dj = (new_acc - j_n[..., i]) * act[..., i]
            imp = ni * dj[..., None]
            dv = dv + imp * inv_mass
            dw = dw + jnp.einsum('...ij,...j->...i', inv_iw,
                                 jnp.cross(ri, imp))
            j_n = j_n.at[..., i].add(dj)
        for i in range(R):
            ti, ri = _row(i, t_dir), _row(i, r_bt)
            rel = m.dot(ti, (vel_bt + dv) + jnp.cross(ang_vel + dw, ri))
            dj = -rel * t_jac_inv[..., i]
            lim = friction_coeff * j_n[..., i]
            new_acc = jnp.clip(j_t[..., i] + dj, -lim, lim)
            dj = (new_acc - j_t[..., i]) * act[..., i]
            # bullet skips friction rows whose normal impulse is 0
            dj = jnp.where(j_n[..., i] > 0, dj, 0.0)
            imp = ti * dj[..., None]
            dv = dv + imp * inv_mass
            dw = dw + jnp.einsum('...ij,...j->...i', inv_iw,
                                 jnp.cross(ri, imp))
            j_t = j_t.at[..., i].add(dj)
        return dv, dw, j_n, j_t

    dv, dw, j_n, _ = jax.lax.fori_loop(
        0, iterations, _vel_iter, (zero3, zero3, zeroR, zeroR))

    # --- split-impulse positional PGS (same jacobians, push target) ---
    def _pos_iter(_, carry):
        pv, pw, j_p = carry
        for i in range(R):
            ni, ri = _row(i, n), _row(i, r_bt)
            rel = m.dot(ni, pv + jnp.cross(pw, ri))
            dj = (push_target[..., i] - rel) * jac_inv[..., i]
            new_acc = jnp.maximum(j_p[..., i] + dj, 0.0)
            dj = (new_acc - j_p[..., i]) * act[..., i]
            imp = ni * dj[..., None]
            pv = pv + imp * inv_mass
            pw = pw + jnp.einsum('...ij,...j->...i', inv_iw,
                                 jnp.cross(ri, imp))
            j_p = j_p.at[..., i].add(dj)
        return pv, pw, j_p

    pv, pw, _ = jax.lax.fori_loop(
        0, iterations, _pos_iter, (zero3, zero3, zeroR))

    push = pv * dt
    turn = pw * (C.SPLIT_IMPULSE_TURN_ERP * dt)
    return dv, dw, push, turn, j_n


def pgs_rows_two_body(v0, w0, v1, w1, r0, r1, n, active, inv_mass0,
                      inv_mass1, inv_iw0, inv_iw1, restitution_coeff,
                      friction_coeff, dist_bt, dt,
                      v0_pre=None, v1_pre=None, iterations=10):
    """Bullet-order PGS over R contact rows between TWO dynamic bodies
    (the car-car case; same solver settings as :func:`pgs_rows_vs_static`).

    ``n`` is the manifold normal on B (impulse +n on body 0, -n on body
    1, bullet's m_contactNormal1/2 convention); ``r0``/``r1`` are the
    lever arms positionWorldOnA - com0 / positionWorldOnB - com1.

    Shapes: v0/w0/v1/w1 (..., 3); r0/r1/n (..., R, 3); active/dist_bt
    (..., R).  Returns (dv0, dw0, dv1, dw1, push0, push1, turn0, turn1,
    j_n)."""
    R = n.shape[-2]

    def _vel_at(v, w, r):
        return v[..., None, :] + jnp.cross(w[..., None, :], r)

    t0_axis = jnp.cross(r0, n)
    t1_axis = jnp.cross(r1, n)
    ang0 = jnp.einsum('...ij,...rj->...ri', inv_iw0, t0_axis)
    ang1 = jnp.einsum('...ij,...rj->...ri', inv_iw1, t1_axis)
    denom = (inv_mass0 + inv_mass1
             + m.dot(n, jnp.cross(ang0, r0))
             + m.dot(n, jnp.cross(ang1, r1)))
    jac_inv = 1.0 / jnp.maximum(denom, 1e-12)

    # restitution from pre-force velocities
    v0r = v0 if v0_pre is None else v0_pre
    v1r = v1 if v1_pre is None else v1_pre
    rel_rest = m.dot(n, _vel_at(v0r, w0, r0) - _vel_at(v1r, w1, r1))
    rest = _restitution_rhs(rel_rest, restitution_coeff)

    # one friction direction per row from the setup-time relative
    # tangential velocity, with btPlaneSpace1 fallback
    rel_v = _vel_at(v0, w0, r0) - _vel_at(v1, w1, r1)
    tang = rel_v - n * m.dot(n, rel_v, keepdims=True)
    t_len = m.norm(tang, keepdims=True)
    t_dir = jnp.where(t_len > 1.49e-8, tang / jnp.maximum(t_len, 1e-12),
                      _plane_space_dir(n))
    f0_axis = jnp.cross(r0, t_dir)
    f1_axis = jnp.cross(r1, t_dir)
    f_ang0 = jnp.einsum('...ij,...rj->...ri', inv_iw0, f0_axis)
    f_ang1 = jnp.einsum('...ij,...rj->...ri', inv_iw1, f1_axis)
    t_denom = (inv_mass0 + inv_mass1
               + m.dot(t_dir, jnp.cross(f_ang0, r0))
               + m.dot(t_dir, jnp.cross(f_ang1, r1)))
    t_jac_inv = 1.0 / jnp.maximum(t_denom, 1e-12)

    push_target = jnp.maximum(-dist_bt, 0.0) * (C.SOLVER_ERP2 / dt)

    zero3 = jnp.zeros_like(v0)
    zeroR = jnp.zeros(n.shape[:-1])
    act = active.astype(n.dtype)

    def _row(i, arr):
        return arr[..., i, :]

    def _apply(dv0, dw0, dv1, dw1, direction, ri0, ri1, dj):
        imp = direction * dj[..., None]
        dv0 = dv0 + imp * inv_mass0
        dw0 = dw0 + jnp.einsum('...ij,...j->...i', inv_iw0,
                               jnp.cross(ri0, imp))
        dv1 = dv1 - imp * inv_mass1
        dw1 = dw1 - jnp.einsum('...ij,...j->...i', inv_iw1,
                               jnp.cross(ri1, imp))
        return dv0, dw0, dv1, dw1

    def _vel_iter(_, carry):
        dv0, dw0, dv1, dw1, j_n, j_t = carry
        for i in range(R):
            ni, ri0, ri1 = _row(i, n), _row(i, r0), _row(i, r1)
            rel = m.dot(ni, (v0 + dv0) + jnp.cross(w0 + dw0, ri0)
                        - (v1 + dv1) - jnp.cross(w1 + dw1, ri1))
            dj = (rest[..., i] - rel) * jac_inv[..., i]
            new_acc = jnp.maximum(j_n[..., i] + dj, 0.0)
            dj = (new_acc - j_n[..., i]) * act[..., i]
            dv0, dw0, dv1, dw1 = _apply(dv0, dw0, dv1, dw1, ni, ri0, ri1,
                                        dj)
            j_n = j_n.at[..., i].add(dj)
        for i in range(R):
            ti, ri0, ri1 = _row(i, t_dir), _row(i, r0), _row(i, r1)
            rel = m.dot(ti, (v0 + dv0) + jnp.cross(w0 + dw0, ri0)
                        - (v1 + dv1) - jnp.cross(w1 + dw1, ri1))
            dj = -rel * t_jac_inv[..., i]
            lim = friction_coeff * j_n[..., i]
            new_acc = jnp.clip(j_t[..., i] + dj, -lim, lim)
            dj = (new_acc - j_t[..., i]) * act[..., i]
            dj = jnp.where(j_n[..., i] > 0, dj, 0.0)
            dv0, dw0, dv1, dw1 = _apply(dv0, dw0, dv1, dw1, ti, ri0, ri1,
                                        dj)
            j_t = j_t.at[..., i].add(dj)
        return dv0, dw0, dv1, dw1, j_n, j_t

    dv0, dw0, dv1, dw1, j_n, _ = jax.lax.fori_loop(
        0, iterations, _vel_iter,
        (zero3, zero3, zero3, zero3, zeroR, zeroR))

    def _pos_iter(_, carry):
        pv0, pw0, pv1, pw1, j_p = carry
        for i in range(R):
            ni, ri0, ri1 = _row(i, n), _row(i, r0), _row(i, r1)
            rel = m.dot(ni, pv0 + jnp.cross(pw0, ri0)
                        - pv1 - jnp.cross(pw1, ri1))
            dj = (push_target[..., i] - rel) * jac_inv[..., i]
            new_acc = jnp.maximum(j_p[..., i] + dj, 0.0)
            dj = (new_acc - j_p[..., i]) * act[..., i]
            pv0, pw0, pv1, pw1 = _apply(pv0, pw0, pv1, pw1, ni, ri0, ri1,
                                        dj)
            j_p = j_p.at[..., i].add(dj)
        return pv0, pw0, pv1, pw1, j_p

    pv0, pw0, pv1, pw1, _ = jax.lax.fori_loop(
        0, iterations, _pos_iter, (zero3, zero3, zero3, zero3, zeroR))

    return (dv0, dw0, dv1, dw1, pv0 * dt, pv1 * dt,
            pw0 * (C.SPLIT_IMPULSE_TURN_ERP * dt),
            pw1 * (C.SPLIT_IMPULSE_TURN_ERP * dt), j_n)


def _contact_impulse_vs_static(vel_bt, ang_vel, r_bt, n, inv_mass, inv_iw,
                               restitution_coeff, friction_coeff,
                               vel_pre_bt=None, ang_vel_pre=None,
                               iterations: int = 1):
    """One contact of a dynamic body against the static world.

    Returns (dv_bt (3,), dw (3,), normal_impulse ()).  Solves the normal row
    (accumulated impulse clamped >= 0) and a friction row along the
    setup-time tangential direction (accumulated impulse clamped to
    mu * j_n), sequentially like Bullet's solver.  ``iterations`` > 1
    repeats the normal+friction pair with running velocities, converging
    to the coupled solution (Bullet default is 10 iterations; for sphere
    contacts the rows decouple and one pass is exact).
    Shapes support leading batch axes.

    ``vel_pre_bt``/``ang_vel_pre``: velocity BEFORE this tick's force
    integration (gravity/boost/...).  Bullet keeps forces in the solver
    body's ``m_externalForceImpulse`` and evaluates restitution on the
    velocity WITHOUT it while the constraint drives the velocity WITH it
    (reference bullet btSequentialImpulseConstraintSolver.cpp:458-476 and
    setupContactConstraint restitution path).
    """
    vel_at = vel_bt + jnp.cross(ang_vel, r_bt)
    rel_vel = m.dot(n, vel_at)

    torque_axis = jnp.cross(r_bt, n)
    ang_comp = jnp.einsum('...ij,...j->...i', inv_iw, torque_axis)
    denom = jnp.maximum(inv_mass + m.dot(n, jnp.cross(ang_comp, r_bt)),
                        1e-12)

    if vel_pre_bt is None:
        rel_vel_rest = rel_vel
    else:
        wpre = ang_vel if ang_vel_pre is None else ang_vel_pre
        rel_vel_rest = m.dot(n, vel_pre_bt + jnp.cross(wpre, r_bt))
    rest = _restitution_rhs(rel_vel_rest, restitution_coeff)

    # Friction direction is fixed at constraint SETUP from the pre-solve
    # relative velocity (bullet setupContactConstraint:
    # cp.m_lateralFrictionDir1 = vel - vel.dot(n)*n before any solver
    # iteration); only the magnitude rows see running velocities.
    tang = vel_at - n * m.dot(n, vel_at, keepdims=True)
    t_len = m.norm(tang, keepdims=True)
    t_dir = jnp.where(t_len > 1e-9, tang / jnp.maximum(t_len, 1e-9), 0.0)
    t_axis = jnp.cross(r_bt, t_dir)
    t_ang = jnp.einsum('...ij,...j->...i', inv_iw, t_axis)
    t_denom = jnp.maximum(
        inv_mass + m.dot(t_dir, jnp.cross(t_ang, r_bt)), 1e-12)

    iw = inv_iw

    def _apply(imp):
        return (imp * inv_mass,
                jnp.einsum('...ij,...j->...i', iw, jnp.cross(r_bt, imp)))

    def _iter(_, carry):
        dv, dw, j_n, j_t = carry
        # Normal row
        v_at = (vel_bt + dv) + jnp.cross(ang_vel + dw, r_bt)
        dj = (rest - m.dot(n, v_at)) / denom
        new_acc = jnp.maximum(j_n + dj, 0.0)
        ddv, ddw = _apply(n * (new_acc - j_n)[..., None])
        dv, dw, j_n = dv + ddv, dw + ddw, new_acc
        # Friction row (limit from the current normal accumulator)
        v_at = (vel_bt + dv) + jnp.cross(ang_vel + dw, r_bt)
        djt = -m.dot(t_dir, v_at) / t_denom
        lim = friction_coeff * j_n
        new_t = jnp.clip(j_t + djt, -lim, lim)
        ddv, ddw = _apply(t_dir * (new_t - j_t)[..., None])
        return dv + ddv, dw + ddw, j_n, new_t

    zero3 = jnp.zeros_like(vel_at)
    zeroR = jnp.zeros_like(rel_vel)
    if iterations == 1:
        dv, dw, j_n, _ = _iter(0, (zero3, zero3, zeroR, zeroR))
    else:
        dv, dw, j_n, _ = jax.lax.fori_loop(
            0, iterations, _iter, (zero3, zero3, zeroR, zeroR))
    return dv, dw, j_n


def resolve_ball_world(ball: BallState, mut: MutatorConfig,
                       puck_axis=None, game_mode: str = "soccar",
                       vel_pre_uu=None, grid=None):
    """Ball vs arena: the ROCKETSIM merged special contact.

    A contact is live while the surface gap is inside the pair's contact
    breaking threshold, 0.02*(radius_bt + 0.08) for the ball sphere
    (btCollisionShape.cpp:130-133,147-149) = 1.905uu at soccar radius —
    which is why BALL_REST_Z (93.15) sits 1.9uu above the radius.  While
    live, approach along the normal is fully blocked (no creep allowance
    in the fork) and restitution fires off the PRE-gravity velocity
    (``vel_pre_uu``); split-impulse pushout happens only at true overlap
    (gap < 0), matching SphereTriangleDetector's depth = dist - radius.

    ``puck_axis`` (snowday): the puck cylinder's axis in world frame.  The
    reference collides a 20-sided cylinder mesh (Ball.cpp:53-82); here the
    exact cylinder support distance against each plane replaces the sphere
    radius — analytically what the dense point cloud converges to.

    Returns (dvel_uu (3,), dang_vel (3,), pos_push_uu (3,), touching (),
    navg (3,) average contact normal).
    """
    pn, _ = geom.get_planes(game_mode)
    dist_p = geom.signed_distances(ball.pos, game_mode)
    valid = geom.plane_validity(ball.pos, game_mode)
    if grid is not None and puck_axis is None:
        # Mesh world: only the 4 btStaticPlaneShapes remain as planes
        # (Arena.cpp:1060-1100); back walls / corners / goals come from
        # the triangle mesh below.
        valid = valid & geom.get_true_plane_mask(game_mode)
    if puck_axis is None:
        support = jnp.full(dist_p.shape, mut.ball_radius)
        break_gap = C.CONTACT_BREAK_FRAC * (mut.ball_radius
                                            + C.SPHERE_BOUND_EXTRA)
    else:
        a_dot_n = jnp.einsum('i,pi->p', puck_axis, pn)
        support = (C.Snowday.PUCK_RADIUS
                   * jnp.sqrt(jnp.maximum(1.0 - a_dot_n ** 2, 0.0))
                   + (C.Snowday.PUCK_HEIGHT / 2) * jnp.abs(a_dot_n))
        # Cylinder convex hull: disc = bounding sphere of the point cloud
        disc = float(np.hypot(C.Snowday.PUCK_RADIUS,
                              C.Snowday.PUCK_HEIGHT / 2))
        break_gap = C.CONTACT_BREAK_FRAC * disc
    normals = jnp.broadcast_to(pn, pn.shape)
    gap = dist_p - support
    active = valid & (gap < break_gap)

    if grid is not None and puck_axis is None:
        # mesh manifold points: one SphereTriangleDetector contact per
        # candidate triangle (closest point; face OR edge/vertex normal),
        # merged into the same special average.  |rel_pos| on the ball is
        # exactly the radius for every sphere contact (pointOnA = center
        # - n*radius), so the support column extends unchanged.
        # The sphere narrowphase (closest point per candidate) runs on the
        # full padded cell list — it is cheap and IS the active predicate —
        # then the candidate set is compacted to the first
        # MESH_COMPACT_K_BALL actives in BVH order, so the sequential
        # manifold-retention scan and the internal-edge adjustment run on
        # a short list instead of the padded width.
        from reinforcement_learning_tpu.physics.mesh import (
            _closest_point_triangle, compact_sel)
        idx = grid.candidates(ball.pos)
        a, ab, ac, tri_n = grid._gather(idx)
        cp = _closest_point_triangle(ball.pos[None, :], a, ab, ac)
        delta = ball.pos[None, :] - cp
        dist_c = m.norm(delta)
        near = (idx >= 0) & (dist_c < mut.ball_radius + break_gap + 0.25)
        selk, ok = compact_sel(near, MESH_COMPACT_K_BALL)
        idx = jnp.where(ok, jnp.take_along_axis(idx, selk, -1), -1)
        cp = jnp.take_along_axis(cp, selk[..., None], -2)
        delta = jnp.take_along_axis(delta, selk[..., None], -2)
        dist_c = jnp.take_along_axis(dist_c, selk, -1)
        tri_n = jnp.take_along_axis(tri_n, selk[..., None], -2)
        side = jnp.sign(jnp.sum(delta * tri_n, axis=-1, keepdims=True))
        side = jnp.where(side == 0, 1.0, side)
        n_mesh = jnp.where(dist_c[:, None] > 1e-6,
                           delta / jnp.maximum(dist_c[:, None], 1e-6),
                           tri_n * side)
        gap_mesh = dist_c - mut.ball_radius
        act_mesh = (idx >= 0) & (gap_mesh < break_gap)
        # bullet 4-slot manifold retention (insertion in BVH order);
        # localPointA on the sphere is -n * radius, set BEFORE the
        # contact-added callback adjusts the normal
        slot = manifold_insert(-n_mesh * mut.ball_radius, gap_mesh,
                               act_mesh)                    # (4,)
        # select the 4 retained slots FIRST, then run the internal-edge
        # normal adjustment (arena contact callback) on just those —
        # elementwise per contact, so adjust-after-select is identical to
        # the reference's adjust-per-manifold-point
        sel = jnp.maximum(slot, 0)
        act_mesh = slot >= 0
        idx4 = jnp.where(act_mesh, idx[sel], 0)
        n_mesh, _ = grid.adjust_internal_edges(idx4, n_mesh[sel], cp[sel],
                                               gap_mesh[sel])
        gap_mesh = gap_mesh[sel]
        normals = jnp.concatenate([normals, n_mesh], axis=0)
        gap = jnp.concatenate([gap, gap_mesh], axis=0)
        active = jnp.concatenate([active, act_mesh], axis=0)
        support = jnp.concatenate(
            [support, jnp.full(gap_mesh.shape, mut.ball_radius)], axis=0)

    num = jnp.sum(active)
    touching = num > 0

    navg = jnp.sum(jnp.where(active[:, None], normals, 0.0), axis=0) / (
        jnp.maximum(num, 1))
    # rel_pos magnitude: contact point on the shape surface
    dists = support * C.UU_TO_BT
    dist = jnp.sum(jnp.where(active, dists, 0.0)) / jnp.maximum(num, 1)
    r_bt = -navg * dist

    ball_inv_mass = 1.0 / mut.ball_mass
    if puck_axis is None:
        # Solid-sphere inertia (btSphereShape::calculateLocalInertia)
        inertia = 0.4 * mut.ball_mass * (mut.ball_radius * C.UU_TO_BT) ** 2
        inv_iw = jnp.eye(3) / inertia
    else:
        # Solid cylinder about its own axes, rotated to world
        r_bt_len = C.Snowday.PUCK_RADIUS * C.UU_TO_BT
        h_bt = C.Snowday.PUCK_HEIGHT * C.UU_TO_BT
        i_axis = 0.5 * mut.ball_mass * r_bt_len ** 2
        i_perp = mut.ball_mass * (3 * r_bt_len ** 2 + h_bt ** 2) / 12.0
        inv_local = jnp.diag(jnp.array([1.0 / i_perp, 1.0 / i_perp,
                                        1.0 / i_axis]))
        inv_iw = ball.rot @ inv_local @ ball.rot.T

    restitution = max(mut.ball_world_restitution, C.WORLD_RESTITUTION)
    friction = min(mut.ball_world_friction, C.WORLD_FRICTION)

    vel_pre_bt = (None if vel_pre_uu is None else vel_pre_uu * C.UU_TO_BT)
    # 10 iterations like bullet: with a multi-surface (non-unit) average
    # normal the friction direction is NOT orthogonal to it, so the two
    # rows couple and one pass under-resolves (a single flat contact still
    # converges in one pass)
    dv_bt, dw, _ = _contact_impulse_vs_static(
        ball.vel * C.UU_TO_BT, ball.ang_vel, r_bt, navg,
        ball_inv_mass, inv_iw, restitution, friction,
        vel_pre_bt=vel_pre_bt, iterations=10)

    # The merged special contact carries no positional term (its distance
    # is the positive rel-pos length), but the per-point manifolds still
    # get split-impulse pushout when the core shape truly overlaps
    # (cp.distance = gap < 0).  A ball that settles inside the margin zone
    # stays wherever it was blocked (observed oracle behavior).
    max_depth = jnp.max(jnp.where(active, -gap, 0.0))
    push = navg * jnp.maximum(max_depth, 0.0) * C.SOLVER_ERP2

    zero = jnp.zeros(3)
    return (jnp.where(touching, dv_bt * C.BT_TO_UU, zero),
            jnp.where(touching, dw, zero),
            jnp.where(touching, push, zero),
            touching, navg)


def resolve_car_world(cars: CarsState, half_extents, hitbox_offset,
                      mut: MutatorConfig, inv_iw,
                      game_mode: str = "soccar", vel_pre_uu=None,
                      ang_vel_pre=None):
    """Car hitbox vs arena planes.

    Two contact families, matching the reference arena's two static body
    kinds (Arena.cpp:1060-1100):

    * True planes (floor/ceiling/side walls, btStaticPlaneShape): Bullet's
      btConvexPlaneCollisionAlgorithm produces exactly ONE manifold point
      per tick — the box support vertex along -n, with the >=0 tie broken
      toward +half_extent (btBoxShape::localGetSupportingVertex via
      btFsels) — active while its plane distance is below the pair's
      contact breaking threshold 0.02 * (|he + 0.04bt| + |child offset|)
      (btCollisionDispatcher.cpp:70-80 with the compound's
      getAngularMotionDisc).  Perturbation iterations never run
      (minimumPointsPerturbationThreshold defaults to 0).  Oracle-verified
      on flip landings: a y-symmetric nose-down landing kicks the +y
      corner first.
    * Mesh stand-in planes (back walls/corners/goal box): box-vs-trimesh
      GJK behavior — centroid of corners inside the triangle's 2uu margin.

    Pushout fires only on true overlap; restitution (0.3) reads the
    pre-force velocity (see ``_contact_impulse_vs_static``).
    Returns (dvel_uu (C,3), dang_vel (C,3), pos_push_uu (C,3),
    has_contact (C,), contact_normal (C,3)).
    """
    # Hitbox center is offset from the center of mass
    # (reference: Car.cpp:196-203 compound shape child offset)
    box_center = cars.pos + m.rotate(cars.rot, hitbox_offset)

    # 8 corners in local box frame
    sx, sy, sz = half_extents
    he = jnp.asarray(half_extents, jnp.float32)
    corners_local = jnp.array(
        [[ix * sx, iy * sy, iz * sz]
         for ix in (-1, 1) for iy in (-1, 1) for iz in (-1, 1)],
        jnp.float32)  # (8, 3)
    corners = box_center[:, None, :] + m.rotate(cars.rot[:, None], corners_local)

    # (C, 8, P) signed distance of each corner to each plane
    pn, pd = geom.get_planes(game_mode)
    d = jnp.einsum('cki,pi->ckp', corners, pn) + pd
    valid = geom.plane_validity(cars.pos, game_mode)  # (C, P)
    true_plane = geom.get_true_plane_mask(game_mode)  # (P,)

    # --- mesh stand-in planes: corner centroid inside the 2uu margin ---
    # Box-vs-trimesh runs through the GJK convex-triangle path where the
    # triangle's 0.04bt (2uu) collision margin extends outward: the contact
    # zero point sits 2uu above the surface (unlike the ball's special
    # sphere-triangle detector, which ignores it).  GJK adds manifold
    # points at margin-surface touch (oracle-calibrated: a flipping car's
    # corner bounces when it crosses 2uu, not 2uu + breaking threshold).
    pen = -d + C.MESH_COLLISION_MARGIN  # > 0 inside the margin surface
    corner_active = valid[:, None, :] & (pen > 0)

    ncontacts = jnp.sum(corner_active, axis=1)  # (C, P)
    mesh_active = (ncontacts > 0) & ~true_plane

    w = corner_active.astype(jnp.float32)
    centroid = jnp.einsum('ckp,cki->cpi', w, corners) / jnp.maximum(
        ncontacts, 1)[..., None]
    mesh_depth = jnp.max(jnp.where(corner_active, pen, 0.0), axis=1)  # (C, P)

    # --- true planes: single support-vertex contact ---
    # local support dir = R^T (-n); corner = where(dir >= 0, +he, -he)
    ldir = -jnp.einsum('cji,pj->cpi', cars.rot, pn)          # (C, P, 3)
    sup_local = jnp.where(ldir >= 0.0, he, -he)              # (C, P, 3)
    sup = box_center[:, None, :] + jnp.einsum(
        'cij,cpj->cpi', cars.rot, sup_local)                 # (C, P, 3)
    sup_d = m.dot(sup, jnp.broadcast_to(pn, sup.shape)) + pd  # (C, P)
    # Pair contact-breaking threshold: 0.02 * the compound's angular
    # motion disc = 0.02 * (|he| + |off|) — the box AABB half extents ARE
    # the constructed half extents (margin folded inside, btBoxShape ctor),
    # so no margin term is added (btCollisionDispatcher::getNewManifold +
    # btCollisionShape::getAngularMotionDisc)
    brk = C.CONTACT_BREAK_FRAC * (
        jnp.linalg.norm(he)
        + jnp.linalg.norm(jnp.asarray(hitbox_offset, jnp.float32)))
    plane_point_active = valid & true_plane & (sup_d < brk)

    plane_active = mesh_active | plane_point_active
    contact_pt = jnp.where(true_plane[None, :, None], sup, centroid)
    max_depth = jnp.where(true_plane, jnp.maximum(-sup_d, 0.0), mesh_depth)

    inv_mass = 1.0 / mut.car_mass

    # Resolve each active plane contact (independent/jacobi over planes;
    # simultaneous multi-plane car contacts are rare outside corners)
    n = jnp.broadcast_to(pn, contact_pt.shape)  # (C, P, 3)
    r_bt = (contact_pt - cars.pos[:, None, :]) * C.UU_TO_BT
    vel_pre_bt = (None if vel_pre_uu is None
                  else vel_pre_uu[:, None, :] * C.UU_TO_BT)
    wpre = (None if ang_vel_pre is None
            else jnp.broadcast_to(ang_vel_pre[:, None, :], contact_pt.shape))
    dv_bt, dw, _ = _contact_impulse_vs_static(
        cars.vel[:, None, :] * C.UU_TO_BT,
        jnp.broadcast_to(cars.ang_vel[:, None, :], contact_pt.shape),
        r_bt, n, inv_mass, inv_iw[:, None],
        mut.car_world_restitution, mut.car_world_friction,
        vel_pre_bt=vel_pre_bt, ang_vel_pre=wpre, iterations=10)

    act = plane_active[..., None]
    dvel = jnp.sum(jnp.where(act, dv_bt, 0.0), axis=1) * C.BT_TO_UU
    dang = jnp.sum(jnp.where(act, dw, 0.0), axis=1)
    push = jnp.sum(jnp.where(act, n * (max_depth * C.SOLVER_ERP2)[..., None],
                             0.0), axis=1)

    has_contact = jnp.any(plane_active, axis=1)
    nsum = jnp.sum(jnp.where(act, n, 0.0), axis=1)
    contact_normal = jnp.where(has_contact[:, None], m.normalize(nsum),
                               jnp.zeros_like(nsum))
    return dvel, dang, push, has_contact, contact_normal


MAX_MESH_CONTACTS = 4  # btPersistentManifold MANIFOLD_CACHE_SIZE

# Compacted-candidate widths for the mesh narrowphase.  Cheap prefilters
# bound how many triangles can be in contact range of one body; these
# widths are validated by arena-sweep tests (tests/test_mesh.py) — at the
# procedural mesh's tessellation the observed maxima (worst: the
# goal-mouth seam, 14 simultaneous ball actives; the corner floor
# fillets, ~26 near-candidates for a car) stay under these caps.
MESH_COMPACT_K_BALL = 32
MESH_COMPACT_K_CAR = 24
MESH_COMPACT_K_RAY = 12


def manifold_insert(local_a, dist, active):
    """Simulate btPersistentManifold point retention for one tick.

    The fork DISABLES contact deduplication (btPersistentManifold.cpp
    getCacheEntry returns -1: "makes ball-arena collisions far less
    accurate to the game" otherwise), so every narrowphase contact is
    inserted; once 4 slots are full, sortCachedPoints picks the slot to
    replace (keep the deepest point, then maximize the area spanned by
    m_localPointA differences — the gContactCalcArea3Points branch).
    Candidates MUST be supplied in bullet's BVH traversal order
    (mesh.bvh_leaf_order) since insertion order decides retention.

    local_a: (..., K, 3) contact point relative to the body (any frame
    with rigid relation to localPointA — the heuristic only uses
    differences and cross-product magnitudes).
    dist: (..., K) manifold point distances.  active: (..., K).

    Returns slot_cand (..., 4) int32: candidate index held by each slot
    (-1 = empty), in slot order (= bullet's constraint row order).
    """
    K = dist.shape[-1]
    batch = dist.shape[:-1]
    f32 = local_a.dtype
    # scan over candidates: K sequential steps of tiny vector math.  With
    # compacted candidates (K <= ~16) the scan is fully unrolled — the
    # sequential chain is short and XLA fuses the steps; at large K the
    # rolled loop keeps the traced graph bounded.
    la_seq = jnp.moveaxis(local_a, -2, 0)                  # (K, ..., 3)
    d_seq = jnp.moveaxis(dist, -1, 0)                      # (K, ...)
    act_seq = jnp.moveaxis(active, -1, 0)

    def _area(p, q):
        c = jnp.cross(p, q)
        return jnp.sum(c * c, axis=-1)

    def step(carry, inp):
        slot_cand, slot_la, slot_d, slot_occ = carry
        k, la, d, act = inp
        count = jnp.sum(slot_occ, axis=-1)                 # (...,)

        # replacement slot via sortCachedPoints
        deeper = slot_d < d[..., None]
        has_deeper = jnp.any(deeper & slot_occ, axis=-1)
        maxpen = jnp.where(has_deeper, jnp.argmin(
            jnp.where(slot_occ, slot_d, jnp.inf), axis=-1), -1)
        c0, c1, c2, c3 = (slot_la[..., i, :] for i in range(4))
        res = jnp.stack([
            jnp.where(maxpen != 0, _area(la - c1, c3 - c2), 0.0),
            jnp.where(maxpen != 1, _area(la - c0, c3 - c2), 0.0),
            jnp.where(maxpen != 2, _area(la - c0, c3 - c1), 0.0),
            jnp.where(maxpen != 3, _area(la - c0, c2 - c1), 0.0),
        ], axis=-1)
        replace_slot = jnp.argmax(res, axis=-1)

        slot = jnp.where(count >= 4, replace_slot,
                         count).astype(jnp.int32)          # append at count
        write = act[..., None] & (jnp.arange(4) == slot[..., None])
        slot_cand = jnp.where(write, k, slot_cand)
        slot_la = jnp.where(write[..., None], la[..., None, :], slot_la)
        slot_d = jnp.where(write, d[..., None], slot_d)
        slot_occ = slot_occ | write
        return (slot_cand, slot_la, slot_d, slot_occ), None

    init = (jnp.full(batch + (4,), -1, jnp.int32),
            jnp.zeros(batch + (4, 3), f32),
            jnp.zeros(batch + (4,), f32),
            jnp.zeros(batch + (4,), bool))
    (slot_cand, _, _, _), _ = jax.lax.scan(
        step, init, (jnp.arange(K, dtype=jnp.int32), la_seq, d_seq, act_seq),
        unroll=K <= 32)
    return slot_cand


def resolve_car_world_mesh(cars: CarsState, half_extents, hitbox_offset,
                           mut: MutatorConfig, inv_iw, grid, dt,
                           game_mode: str = "soccar", vel_pre_uu=None,
                           ang_vel_pre=None):
    """Car hitbox vs the triangle-mesh arena + the 4 btStaticPlaneShapes.

    Mirrors the reference world composition (Arena.cpp:1020-1100: every
    soccar arena = 16 BVH mesh bodies PLUS floor/ceiling/side-wall planes)
    and Bullet's narrowphase: one GJK contact per overlapping triangle
    (box_tri.box_triangle_contact), persistent-manifold cap of 4 points,
    single support-vertex contact per static plane.  All rows are solved
    jointly by :func:`pgs_rows_vs_static` in manifold order (mesh manifold
    first, then the planes — dispatcher pair order).

    Returns (dvel_uu (C,3), dang (C,3), push_uu (C,3), turn (C,3),
    has_contact (C,), contact_normal (C,3)).
    """
    from reinforcement_learning_tpu.physics import box_tri

    he = jnp.asarray(half_extents, jnp.float32)
    box_center = cars.pos + m.rotate(cars.rot, hitbox_offset)

    # btBoxShape's "safe margin": min(0.04bt, 0.1 * smallest half extent)
    # (btConvexInternalShape::setSafeMargin) — 1.808uu for the octane
    # hitbox.  See box_triangle_contact for the calibrated margin law.
    safe_margin = min(C.MESH_COLLISION_MARGIN,
                      0.1 * float(np.min(np.asarray(half_extents))))

    # Pair contact-breaking threshold = 0.02 * compound angular motion
    # disc = 0.02 * (|he| + |off|); the box AABB already contains the
    # margin (btBoxShape ctor), so no margin term here
    # (btCollisionDispatcher::getNewManifold)
    brk = C.CONTACT_BREAK_FRAC * (
        float(np.linalg.norm(np.asarray(half_extents)))
        + float(np.linalg.norm(np.asarray(hitbox_offset, np.float32))))

    # --- mesh contacts: one per candidate triangle, capped at 4.
    # Two-stage narrowphase: a cheap prune over the padded cell list
    # (bounding-sphere distance to the triangle + box-to-plane gap, both
    # of which lower-bound the exact core distance, so pruning is
    # conservative), then candidate compaction to MESH_COMPACT_K_CAR in
    # BVH order, then the exact 47-feature-pair test on only those.
    from reinforcement_learning_tpu.physics.mesh import (
        _closest_point_triangle, compact_sel)
    idx = grid.candidates(box_center)                       # (C, K)
    a, ab, ac, tri_n = grid._gather(idx)
    cut = brk + safe_margin + 0.5
    cp0 = _closest_point_triangle(box_center[:, None, :], a, ab, ac)
    d0 = m.norm(box_center[:, None, :] - cp0)
    sphere_ok = d0 - float(np.linalg.norm(np.asarray(half_extents))) <= cut
    plane_dist = jnp.abs(jnp.sum((box_center[:, None, :] - a) * tri_n, -1))
    proj = jnp.einsum('cki,cij->ckj', tri_n, cars.rot)
    r_eff = jnp.sum(jnp.abs(proj) * he, axis=-1)
    plane_ok = plane_dist - r_eff <= cut
    near = (idx >= 0) & sphere_ok & plane_ok
    selk, ok = compact_sel(near, MESH_COMPACT_K_CAR)
    idx = jnp.where(ok, jnp.take_along_axis(idx, selk, -1), -1)  # (C, Kc)
    a, ab, ac, _ = grid._gather(idx)
    n_k, pt_k, dist_k = box_tri.box_triangle_contact(
        box_center[:, None, :], cars.rot[:, None], he,
        C.MESH_COLLISION_MARGIN, safe_margin,
        a, a + ab, a + ac)                                  # (C,Kc,·)
    act_k = (idx >= 0) & (dist_k < brk)
    # bullet's 4-slot manifold retention over BVH-ordered candidates;
    # localPointA is set BEFORE the contact-added callback, so retention
    # uses the un-adjusted normal
    pos_a_k = pt_k + n_k * dist_k[..., None]                # on the car
    local_a = pos_a_k - cars.pos[:, None, :]
    slot = manifold_insert(local_a, dist_k, act_k)          # (C, 4)
    mesh_act = slot >= 0
    sel = jnp.maximum(slot, 0)
    # select the 4 retained slots, THEN run the internal-edge adjustment
    # (arena contact callback) on just those — elementwise per contact,
    # identical result to adjusting every candidate first
    idx4 = jnp.where(mesh_act, jnp.take_along_axis(idx, sel, axis=1), 0)
    n4 = jnp.take_along_axis(n_k, sel[..., None], axis=1)
    pt4 = jnp.take_along_axis(pt_k, sel[..., None], axis=1)
    mesh_dist = jnp.take_along_axis(dist_k, sel, axis=1)
    mesh_n, _ = grid.adjust_internal_edges(idx4, n4, pt4, mesh_dist)
    # constraint lever arms use positionWorldOnA (unchanged by the
    # callback)
    mesh_pt = jnp.take_along_axis(pos_a_k, sel[..., None], axis=1)

    # --- true-plane contacts: single support vertex per plane
    pn, pd = geom.get_planes(game_mode)
    true_plane = geom.get_true_plane_mask(game_mode)
    keep = np.flatnonzero(np.asarray(true_plane))
    pn = pn[keep]
    pd = pd[keep]
    ldir = -jnp.einsum('cji,pj->cpi', cars.rot, pn)
    sup_local = jnp.where(ldir >= 0.0, he, -he)
    sup = box_center[:, None, :] + jnp.einsum('cij,cpj->cpi', cars.rot,
                                              sup_local)
    sup_d = m.dot(sup, jnp.broadcast_to(pn, sup.shape)) + pd  # (C, P)
    plane_act = sup_d < brk
    plane_n = jnp.broadcast_to(pn, sup.shape)

    # --- assemble rows: mesh manifold first, then planes
    n_rows = jnp.concatenate([mesh_n, plane_n], axis=1)
    pt_rows = jnp.concatenate([mesh_pt, sup], axis=1)
    dist_rows = jnp.concatenate([mesh_dist, sup_d], axis=1)
    act_rows = jnp.concatenate([mesh_act, plane_act], axis=1)

    r_bt = (pt_rows - cars.pos[:, None, :]) * C.UU_TO_BT
    dist_bt = dist_rows * C.UU_TO_BT
    inv_mass = 1.0 / mut.car_mass
    vel_pre_bt = None if vel_pre_uu is None else vel_pre_uu * C.UU_TO_BT

    dv_bt, dw, push_bt, turn, j_n = pgs_rows_vs_static(
        cars.vel * C.UU_TO_BT, cars.ang_vel, r_bt, n_rows, act_rows,
        inv_mass, inv_iw, mut.car_world_restitution, mut.car_world_friction,
        dist_bt, dt, vel_pre_bt=vel_pre_bt, ang_vel_pre=ang_vel_pre)

    has_contact = jnp.any(act_rows, axis=1)
    nsum = jnp.sum(jnp.where(act_rows[..., None], n_rows, 0.0), axis=1)
    contact_normal = jnp.where(has_contact[:, None], m.normalize(nsum),
                               jnp.zeros_like(nsum))
    return (dv_bt * C.BT_TO_UU, dw, push_bt * C.BT_TO_UU, turn,
            has_contact, contact_normal)


def closest_point_on_box(point, box_center, box_rot, half_extents):
    """Closest point on an oriented box to ``point`` (world frame)."""
    local = m.inv_rotate(box_rot, point - box_center)
    clamped = jnp.clip(local, -half_extents, half_extents)
    return box_center + m.rotate(box_rot, clamped), local, clamped


def resolve_car_ball(cars: CarsState, ball: BallState, tick_count,
                     half_extents, hitbox_offset, mut: MutatorConfig,
                     inv_iw_cars, alive=None, game_mode: str = "soccar",
                     cars_vel_pre=None, ball_vel_pre=None):
    """Car-ball contact: physical impulse (friction 2.0, restitution 0 —
    Arena.cpp:289-291) + the psyonix extra impulse into the ball's velocity
    cache (Arena.cpp:283-334).

    Returns (car dvel (C,3), car dang (C,3), ball dvel (3,),
    ball dang (3,), ball_cache_dv (3,), hit_info_updates dict,
    touched (C,)).
    """
    box_center = cars.pos + m.rotate(cars.rot, hitbox_offset)
    # Bullet runs box-vs-sphere through convex-convex GJK: closest point
    # on the margin-SHRUNK box core (he - 0.04bt) against the sphere's
    # center point, margins added back along the core-to-core direction.
    # On faces this matches the full box; on edges/corners the shrunk core
    # tilts the normal (oracle-verified on a bumper-edge ball hit:
    # n=(-.9102,0,-.4141) vs the full-box (-.9154,0,-.4026)).
    he_core = jnp.asarray(half_extents, jnp.float32) - C.MESH_COLLISION_MARGIN
    closest, local, _ = closest_point_on_box(
        jnp.broadcast_to(ball.pos, cars.pos.shape), box_center, cars.rot,
        he_core)
    delta = ball.pos - closest
    dist = m.norm(delta)
    # Hull gap and pair breaking threshold 0.02 * min(sphere disc
    # radius+0.08bt, compound disc |he+0.04bt| + |child offset|)
    gap = dist - C.MESH_COLLISION_MARGIN - mut.ball_radius
    break_gap = C.CONTACT_BREAK_FRAC * jnp.minimum(
        mut.ball_radius + C.SPHERE_BOUND_EXTRA,
        jnp.linalg.norm(jnp.asarray(half_extents, jnp.float32)
                        + C.MESH_COLLISION_MARGIN)
        + jnp.linalg.norm(jnp.asarray(hitbox_offset, jnp.float32)))
    touching = gap < break_gap
    if alive is not None:
        # Demoed cars have no contact response (Car.cpp:74-77)
        touching = touching & alive
    # Normal from car to ball; if center inside the core, fall back to
    # center-to-center direction
    n = jnp.where((dist > 1e-6)[:, None], m.normalize(delta),
                  m.normalize(ball.pos - box_center))

    car_inv_mass = 1.0 / mut.car_mass
    ball_inv_mass = 1.0 / mut.ball_mass
    inertia_ball = 0.4 * mut.ball_mass * (mut.ball_radius * C.UU_TO_BT) ** 2
    inv_iw_ball = jnp.eye(3) / inertia_ball

    # Manifold points: on the sphere surface (B) and gap-offset from it on
    # the box margin surface (A); the solver's lever arms use these
    # (btManifoldResult convention, oracle posA = posB + n*d).
    pt_ball = ball.pos - n * mut.ball_radius
    pt_car = pt_ball + n * gap[:, None]
    r_car = (pt_car - cars.pos) * C.UU_TO_BT
    r_ball = (pt_ball - ball.pos) * C.UU_TO_BT

    v_car = cars.vel * C.UU_TO_BT + jnp.cross(cars.ang_vel, r_car)
    v_ball = ball.vel * C.UU_TO_BT + jnp.cross(
        jnp.broadcast_to(ball.ang_vel, r_ball.shape), r_ball)
    rel_vel = m.dot(n, v_ball - v_car)  # ball relative to car along n

    ta_car = jnp.einsum('cij,cj->ci', inv_iw_cars, jnp.cross(r_car, n))
    ta_ball = jnp.einsum('ij,cj->ci', inv_iw_ball, jnp.cross(r_ball, n))
    denom = (car_inv_mass + ball_inv_mass
             + m.dot(n, jnp.cross(ta_car, r_car))
             + m.dot(n, jnp.cross(ta_ball, r_ball)))

    # Friction direction: tangential relative velocity at setup (bullet's
    # velocity-dependent lateral dir, convertContactInner)
    rel_t0 = (v_ball - v_car) - n * rel_vel[:, None]
    t_len = m.norm(rel_t0, keepdims=True)
    t_dir = jnp.where(t_len > 1e-9, rel_t0 / jnp.maximum(t_len, 1e-9), 0.0)
    tt_car = jnp.einsum('cij,cj->ci', inv_iw_cars, jnp.cross(r_car, t_dir))
    tt_ball = jnp.einsum('ij,cj->ci', inv_iw_ball, jnp.cross(r_ball, t_dir))
    t_denom = (car_inv_mass + ball_inv_mass
               + m.dot(t_dir, jnp.cross(tt_car, r_car))
               + m.dot(t_dir, jnp.cross(tt_ball, r_ball)))
    mu = C.CARBALL_COLLISION_FRICTION

    # Sequential-impulse iterations over the coupled normal + friction rows
    # (bullet runs 10; the rows couple through the angular terms).
    # Accumulators carry (j_n, j_t) with bullet's clamping rules:
    # restitution 0 (CARBALL_COLLISION_RESTITUTION), |j_t| <= mu * j_n.
    def _cb_iter(_, carry):
        dvb, dwb, dvc, dwc, jn_acc, jt_acc = carry
        rv = m.dot(n, (v_ball + dvb + jnp.cross(dwb, r_ball))
                   - (v_car + dvc + jnp.cross(dwc, r_car)))
        djn = -rv / jnp.maximum(denom, 1e-12)
        djn = jnp.maximum(jn_acc + djn, 0.0) - jn_acc
        djn = jnp.where(touching, djn, 0.0)
        jn_acc = jn_acc + djn
        dimp = n * djn[:, None]
        dvb = dvb + dimp * ball_inv_mass
        dwb = dwb + jnp.einsum('ij,cj->ci', inv_iw_ball,
                               jnp.cross(r_ball, dimp))
        dvc = dvc - dimp * car_inv_mass
        dwc = dwc + jnp.einsum('cij,cj->ci', inv_iw_cars,
                               jnp.cross(r_car, -dimp))

        rt = m.dot(t_dir, (v_ball + dvb + jnp.cross(dwb, r_ball))
                   - (v_car + dvc + jnp.cross(dwc, r_car)))
        djt = -rt / jnp.maximum(t_denom, 1e-12)
        djt = jnp.clip(jt_acc + djt, -mu * jn_acc, mu * jn_acc) - jt_acc
        djt = jnp.where(touching, djt, 0.0)
        jt_acc = jt_acc + djt
        dimp = t_dir * djt[:, None]
        dvb = dvb + dimp * ball_inv_mass
        dwb = dwb + jnp.einsum('ij,cj->ci', inv_iw_ball,
                               jnp.cross(r_ball, dimp))
        dvc = dvc - dimp * car_inv_mass
        dwc = dwc + jnp.einsum('cij,cj->ci', inv_iw_cars,
                               jnp.cross(r_car, -dimp))
        return dvb, dwb, dvc, dwc, jn_acc, jt_acc

    zero3 = jnp.zeros_like(v_ball)
    zeroC = jnp.zeros(n.shape[0])
    _, _, _, _, jn_acc, jt_acc = jax.lax.fori_loop(
        0, 10, _cb_iter, (zero3, zero3, jnp.zeros_like(v_car),
                          jnp.zeros_like(v_car), zeroC, zeroC))

    imp_total = n * jn_acc[:, None] + t_dir * jt_acc[:, None]
    j_n = jn_acc

    tmask = touching[:, None]
    ball_dv = jnp.sum(jnp.where(tmask, imp_total, 0.0), axis=0) \
        * ball_inv_mass * C.BT_TO_UU
    ball_dw = jnp.einsum('ij,j->i', inv_iw_ball, jnp.sum(
        jnp.where(tmask, jnp.cross(r_ball, imp_total), 0.0), axis=0))
    car_dv = jnp.where(tmask, -imp_total, 0.0) * car_inv_mass * C.BT_TO_UU
    car_dw = jnp.einsum('cij,cj->ci', inv_iw_cars,
                        jnp.where(tmask, jnp.cross(r_car, -imp_total), 0.0))

    # --- Psyonix extra impulse (Arena.cpp:304-331)
    can_extra = touching & (
        (tick_count > cars.ball_hit_extra_impulse_tick + 1)
        | (cars.ball_hit_extra_impulse_tick > tick_count))
    # GetState() at callback time reads pre-force velocities (the callback
    # fires during narrowphase, before the solver integrates forces)
    cv = cars.vel if cars_vel_pre is None else cars_vel_pre
    bv = ball.vel if ball_vel_pre is None else ball_vel_pre
    rel_pos = ball.pos - cars.pos
    rel_v = bv - cv
    rel_speed = jnp.minimum(m.norm(rel_v),
                            C.BALL_CAR_EXTRA_IMPULSE_MAXDELTAVEL_UU)
    if game_mode == "hoops":
        # Hoops boosts the z component for grounded upright cars
        # (Arena.cpp:318-322)
        extra_z = cars.is_on_ground & (
            cars.up[:, 2] > C.BALL_CAR_EXTRA_IMPULSE_Z_SCALE_HOOPS_NORMAL_Z_THRESH)
        z_scale = jnp.where(extra_z,
                            C.BALL_CAR_EXTRA_IMPULSE_Z_SCALE_HOOPS_GROUND,
                            C.BALL_CAR_EXTRA_IMPULSE_Z_SCALE)[:, None]
        hit_dir = m.normalize(
            rel_pos * jnp.concatenate(
                [jnp.ones_like(z_scale), jnp.ones_like(z_scale), z_scale],
                axis=-1))
    else:
        z_scale = C.BALL_CAR_EXTRA_IMPULSE_Z_SCALE
        hit_dir = m.normalize(rel_pos * jnp.array([1.0, 1.0, z_scale]))
    fwd = cars.forward
    fwd_adj = fwd * (m.dot(hit_dir, fwd)
                     * (1.0 - C.BALL_CAR_EXTRA_IMPULSE_FORWARD_SCALE))[:, None]
    hit_dir = m.normalize(hit_dir - fwd_adj)
    factor = m.curve(C.BALL_CAR_EXTRA_IMPULSE_FACTOR_CURVE, rel_speed)
    added_vel = (hit_dir * (rel_speed * factor)[:, None]
                 * mut.ball_hit_extra_force_scale)
    apply_extra = can_extra & (rel_speed > 0)
    ball_cache_dv = jnp.sum(
        jnp.where(apply_extra[:, None], added_vel, 0.0), axis=0)

    # BallHitInfo updates (Arena.cpp:293-327)
    hit_updates = dict(
        ball_hit_valid=jnp.where(touching, True, cars.ball_hit_valid),
        ball_hit_rel_pos=jnp.where(tmask, pt_ball - ball.pos,
                                   cars.ball_hit_rel_pos),
        ball_hit_tick=jnp.where(touching, tick_count, cars.ball_hit_tick),
        ball_hit_extra_impulse_tick=jnp.where(
            can_extra, tick_count, cars.ball_hit_extra_impulse_tick),
        ball_hit_ball_pos=jnp.where(tmask, ball.pos, cars.ball_hit_ball_pos),
        ball_hit_extra_vel=jnp.where(apply_extra[:, None], added_vel,
                                     jnp.where(tmask, 0.0,
                                               cars.ball_hit_extra_vel)),
    )
    return car_dv, car_dw, ball_dv, ball_dw, ball_cache_dv, hit_updates, \
        touching


def car_car_interactions(cars: CarsState, teams, half_extents, hitbox_offset,
                         mut: MutatorConfig, inv_iw, vel_pre=None,
                         dt: float = 1.0 / 120.0):
    """All-pairs car-car contact + bump/demo logic (Arena.cpp:336-418).

    The physical contact replicates the reference's actual path: Bullet
    dispatches box-box child pairs to the dBoxBox face-clipping detector
    (btBoxBoxDetector.cpp; see physics/box_box.py), producing an
    up-to-4-point one-tick manifold solved by the sequential-impulse
    solver with per-point friction and split-impulse pushout.  Pairs are
    solved independently (the reference solves all manifolds jointly;
    this differs only in >=3-car pileups where one car touches two).

    Returns (dvel (C,3), dang (C,3), push (C,3), turn (C,3), cache_dv
    (C,3), got_demoed (C,), bumped (C,C) bool [i bumped j], is_demo
    (C,C) bool [i demoed j], contact_updates dict).
    """
    from reinforcement_learning_tpu.physics import box_box, formulas

    num_cars = cars.pos.shape[0]
    if vel_pre is None:
        vel_pre = cars.vel

    he_eff = jnp.asarray(
        formulas.box_effective_half_extents_bt(
            np.asarray(half_extents, np.float64) * 2.0), jnp.float32)
    box_center_bt = (cars.pos + m.rotate(cars.rot, hitbox_offset)) \
        * C.UU_TO_BT
    pos_bt = cars.pos * C.UU_TO_BT
    inv_mass = 1.0 / mut.car_mass

    ii, jj = np.triu_indices(num_cars, k=1)
    mf = box_box.box_box_manifold(
        box_center_bt[ii], cars.rot[ii], he_eff,
        box_center_bt[jj], cars.rot[jj], he_eff)      # batch (P,)
    pair_alive = (~cars.is_demoed[ii]) & (~cars.is_demoed[jj])
    act = mf["active"] & pair_alive[:, None]          # (P, 4)

    n_on_b = -mf["normal"]                            # +imp on car ii
    posB = mf["points"]                               # (P, 4, 3) bt
    posA = posB + mf["normal"][:, None, :] * mf["depth"][..., None]
    r0 = posA - pos_bt[ii][:, None, :]
    r1 = posB - pos_bt[jj][:, None, :]

    dv0, dw0, dv1, dw1, push0, push1, turn0, turn1, _ = pgs_rows_two_body(
        cars.vel[ii] * C.UU_TO_BT, cars.ang_vel[ii],
        cars.vel[jj] * C.UU_TO_BT, cars.ang_vel[jj],
        r0, r1, jnp.broadcast_to(n_on_b[:, None, :], posB.shape), act,
        inv_mass, inv_mass, inv_iw[ii], inv_iw[jj],
        C.CARCAR_COLLISION_RESTITUTION, C.CARCAR_COLLISION_FRICTION,
        -mf["depth"], dt,
        v0_pre=vel_pre[ii] * C.UU_TO_BT, v1_pre=vel_pre[jj] * C.UU_TO_BT)

    def _scatter(a0, a1):
        out = jnp.zeros((num_cars, 3), a0.dtype)
        return out.at[ii].add(a0).at[jj].add(a1)

    dvel = _scatter(dv0, dv1) * C.BT_TO_UU
    dang = _scatter(dw0, dw1)
    push = _scatter(push0, push1) * C.BT_TO_UU
    turn = _scatter(turn0, turn1)

    # (C, C) views for the bump/demo logic below
    overlap = jnp.zeros((num_cars, num_cars), bool)
    overlap = overlap.at[ii, jj].set(mf["overlap"] & pair_alive)
    overlap = overlap | overlap.T

    # per-point local contact points on each car (bullet m_localPointA/B,
    # mapped to the parent body frame by the compound algorithm)
    lp_i = m.inv_rotate(cars.rot[ii][:, None],
                        posA * C.BT_TO_UU - cars.pos[ii][:, None])
    lp_j = m.inv_rotate(cars.rot[jj][:, None],
                        posB * C.BT_TO_UU - cars.pos[jj][:, None])
    hwb_i = jnp.any(act & (lp_i[..., 0] > C.BUMP_MIN_FORWARD_DIST), -1)
    hwb_j = jnp.any(act & (lp_j[..., 0] > C.BUMP_MIN_FORWARD_DIST), -1)
    hit_with_bumper = jnp.zeros((num_cars, num_cars), bool)
    hit_with_bumper = hit_with_bumper.at[ii, jj].set(hwb_i)
    hit_with_bumper = hit_with_bumper.at[jj, ii].set(hwb_j)

    # --- bump / demo logic, evaluated both directions (i bumps j);
    # Car::GetState() at callback time reads pre-force velocities
    state_i_vel = vel_pre[:, None, :]
    state_j_vel = vel_pre[None, :, :]
    delta_pos = cars.pos[None, :, :] - cars.pos[:, None, :]  # i -> j
    going_towards = m.dot(state_i_vel, delta_pos) > 0

    vel_dir = m.normalize(state_i_vel)
    dir_to_other = m.normalize(delta_pos)
    speed_towards = m.dot(state_i_vel, dir_to_other)
    other_away_speed = m.dot(state_j_vel, vel_dir)

    ids = jnp.arange(1, num_cars + 1)
    in_cooldown = (cars.car_contact_other_id[:, None] == ids[None, :]) & (
        cars.car_contact_cooldown[:, None] > 0)

    bump = (overlap & going_towards & ~in_cooldown
            & (speed_towards > other_away_speed) & hit_with_bumper)

    if mut.demo_mode == "ON_CONTACT":
        is_demo = bump
    elif mut.demo_mode == "DISABLED":
        is_demo = jnp.zeros_like(bump)
    else:
        is_demo = bump & cars.is_supersonic[:, None]
    if not mut.enable_team_demos:
        is_demo &= teams[:, None] != teams[None, :]

    plain_bump = bump & ~is_demo
    ground_hit = cars.is_on_ground[None, :]
    base_scale = jnp.where(
        ground_hit,
        m.curve(C.BUMP_VEL_AMOUNT_GROUND_CURVE, speed_towards),
        m.curve(C.BUMP_VEL_AMOUNT_AIR_CURVE, speed_towards))
    hit_up_dir = jnp.where(ground_hit[..., None],
                           cars.up[None, :, :],
                           jnp.array([0.0, 0.0, 1.0]))
    bump_impulse = (vel_dir * base_scale[..., None]
                    + hit_up_dir * m.curve(C.BUMP_UPWARD_VEL_AMOUNT_CURVE,
                                           speed_towards)[..., None]
                    * mut.bump_force_scale)
    cache_dv = jnp.sum(jnp.where(plain_bump[..., None], bump_impulse, 0.0),
                       axis=0)  # sum over bumpers i for each bumped j

    got_demoed = jnp.any(is_demo, axis=0)

    # Contact cooldown bookkeeping for the bumper (car i)
    bumped_any = jnp.any(bump, axis=1)
    # id of (last) bumped car j for each i
    bumped_id = jnp.max(jnp.where(bump, ids[None, :], 0), axis=1)
    contact_updates = dict(
        car_contact_other_id=jnp.where(bumped_any, bumped_id,
                                       cars.car_contact_other_id),
        car_contact_cooldown=jnp.where(bumped_any, mut.bump_cooldown_time,
                                       cars.car_contact_cooldown),
    )
    return (dvel, dang, push, turn, cache_dv, got_demoed, bump, is_demo,
            contact_updates)
