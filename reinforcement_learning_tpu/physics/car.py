"""Car dynamics: suspension raycast vehicle + control state machine.

Branch-free vectorized re-derivation of the reference car physics:
  * ``btVehicleRL`` suspension/friction (reference:
    RocketSim/src/Sim/btVehicleRL/btVehicleRL.cpp)
  * ``Car::_PreTickUpdate`` and its ``_Update*`` helpers (reference:
    RocketSim/src/Sim/Car/Car.cpp:58-833)

Every car field carries a leading car axis ``(C,)``; all reference branches
become masked ``jnp.where`` updates.  One quirk faithfully kept: the wheel
engine/brake/steer/friction values used for this tick's friction impulses are
the ones computed on the PREVIOUS tick (reference calls updateVehicleFirst
*before* _UpdateWheels — Car.cpp:90 vs :109), so those live in
``WheelControlsState``.

Unit policy: state is uu/seconds; impulse math that involves the inertia
tensor is done in BT units (1 bt = 50 uu) to match the reference solver
exactly; angular quantities are unit-independent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu import maths as m
from reinforcement_learning_tpu.physics import arena_geom as geom
from reinforcement_learning_tpu.physics import formulas
from reinforcement_learning_tpu.physics.state import (
    BOOST, HANDBRAKE, JUMP, PITCH, ROLL, STEER, THROTTLE, YAW, CarConfig,
    CarsState, MutatorConfig)


@struct.dataclass
class WheelControlsState:
    """Wheel drive values persisted across ticks (see module docstring)."""
    steer_angle: jnp.ndarray    # (C,) front-wheel steering angle
    engine_force: jnp.ndarray   # (C,) BT units
    brake: jnp.ndarray          # (C,) BT units
    lat_friction: jnp.ndarray   # (C, 4)
    long_friction: jnp.ndarray  # (C, 4)

    @staticmethod
    def make(num_cars: int) -> "WheelControlsState":
        return WheelControlsState(
            steer_angle=jnp.zeros((num_cars,), jnp.float32),
            engine_force=jnp.zeros((num_cars,), jnp.float32),
            brake=jnp.zeros((num_cars,), jnp.float32),
            # btWheelInfoRL inits m_latFriction/m_longFriction to ZERO
            # (btVehicleRL.h:16); wheels that have never touched ground
            # produce no friction impulse on their first contact tick —
            # the values only update in _UpdateWheels AFTER that tick's
            # calcFrictionImpulses consumed the stale ones.
            lat_friction=jnp.zeros((num_cars, 4), jnp.float32),
            long_friction=jnp.zeros((num_cars, 4), jnp.float32),
        )


def box_inv_inertia_local(mass: float, full_size_uu) -> jnp.ndarray:
    """Diagonal inverse inertia of the hitbox in BT units
    (bullet btBoxShape::calculateLocalInertia on the margin-adjusted
    extents — see formulas.box_inv_inertia_diag_bt)."""
    return jnp.asarray(formulas.box_inv_inertia_diag_bt(mass, full_size_uu),
                       jnp.float32)


def inv_inertia_world(rot: jnp.ndarray, inv_inertia_diag: jnp.ndarray
                      ) -> jnp.ndarray:
    """R diag(invI) R^T — world-frame inverse inertia tensor, (..., 3, 3)."""
    return jnp.einsum('...ij,j,...kj->...ik', rot, inv_inertia_diag, rot)


def apply_impulse_bt(vel_uu, ang_vel, imp_bt, rel_pos_bt, inv_mass,
                     inv_inertia_ws):
    """bullet btRigidBody::applyImpulse in BT units; returns updated
    (vel_uu, ang_vel)."""
    dv_bt = imp_bt * inv_mass
    dw = jnp.einsum('...ij,...j->...i', inv_inertia_ws,
                    jnp.cross(rel_pos_bt, imp_bt))
    return vel_uu + dv_bt * C.BT_TO_UU, ang_vel + dw


# ---------------------------------------------------------------------------
# Suspension raycasts (btVehicleRL::rayCast, btVehicleRL.cpp:118-212)

@struct.dataclass
class WheelRaycast:
    is_in_contact: jnp.ndarray    # (C, 4) bool
    in_world_contact: jnp.ndarray  # (C, 4) bool (vs static arena only)
    contact_point: jnp.ndarray    # (C, 4, 3) uu
    contact_normal: jnp.ndarray   # (C, 4, 3)
    susp_length: jnp.ndarray      # (C, 4) uu
    susp_rel_vel: jnp.ndarray     # (C, 4) bt/s
    clipped_inv_dot: jnp.ndarray  # (C, 4)
    extra_pushback: jnp.ndarray   # (C, 4) bt impulse magnitude
    hard_point: jnp.ndarray       # (C, 4, 3) uu
    # Dynamic ground object the ray hit (Arena.cpp:733-750 suspension-grid
    # dynamic overlay: wheel rays also hit the ball and other cars):
    # -1 = static world / none, -2 = ball, >= 0 = other car index
    ground_idx: jnp.ndarray       # (C, 4) int32


def _ray_sphere(origin, direction, max_len, center, radius):
    """Ray vs sphere: (hit, t).  ``direction`` unit; starts outside."""
    oc = origin - center
    b = m.dot(oc, direction)
    c2 = m.dot(oc, oc) - radius * radius
    disc = b * b - c2
    t = -b - jnp.sqrt(jnp.maximum(disc, 0.0))
    hit = (disc > 0.0) & (c2 > 0.0) & (t >= 0.0) & (t <= max_len)
    return hit, jnp.where(hit, t, max_len)


def _ray_obb(origin, direction, max_len, box_center, box_rot, he):
    """Ray vs oriented box (slab method in box local frame).
    Returns (hit, t, normal_world)."""
    lo = m.inv_rotate(box_rot, origin - box_center)
    ld = m.inv_rotate(box_rot, direction)
    safe = jnp.where(jnp.abs(ld) > 1e-9, ld, 1e-9)
    t1 = (-he - lo) / safe
    t2 = (he - lo) / safe
    tmin_ax = jnp.minimum(t1, t2)
    tmax_ax = jnp.maximum(t1, t2)
    # parallel rays miss unless origin within the slab
    inside = (jnp.abs(lo) <= he) | (jnp.abs(ld) > 1e-9)
    tmin = jnp.max(tmin_ax, axis=-1)
    tmax = jnp.min(jnp.where(inside, tmax_ax, jnp.inf), axis=-1)
    hit = (tmax >= tmin) & (tmax >= 0.0) & (tmin >= 0.0) \
        & (tmin <= max_len) & jnp.all(inside, axis=-1)
    entry_ax = jnp.argmax(tmin_ax, axis=-1)
    sign = -jnp.sign(jnp.take_along_axis(ld, entry_ax[..., None],
                                         axis=-1))[..., 0]
    n_local = jax.nn.one_hot(entry_ax, 3) * sign[..., None]
    n_world = m.rotate(box_rot, n_local)
    return hit, jnp.where(hit, tmin, max_len), n_world


def wheel_raycasts(cars: CarsState, cfg: CarConfig, mut: MutatorConfig,
                   dt: float, inv_inertia_ws,
                   game_mode: str = "soccar", grid=None, ball=None,
                   alive=None) -> WheelRaycast:
    offsets = jnp.asarray(cfg.wheel_offsets())      # (4, 3)
    radii = jnp.asarray(cfg.wheel_radii())          # (4,)
    rest_len = jnp.asarray(cfg.sus_rest_lengths())  # (4,)
    travel = C.BTVehicle.MAX_SUSPENSION_TRAVEL

    up = cars.up                                         # (C, 3)
    hard_point = cars.pos[:, None, :] + m.rotate(
        cars.rot[:, None, :, :], offsets[None, :, :])    # (C, 4, 3)
    wheel_dir = -up[:, None, :]                          # ray direction

    # SUSPENSION_SUBTRACTION is in BT units (0.05 bt = 2.5 uu); the
    # reference computes ray lengths in BT (btVehicleRL.cpp:124)
    sus_sub_uu = C.BTVehicle.SUSPENSION_SUBTRACTION * C.BT_TO_UU
    ray_len = rest_len + travel + radii - sus_sub_uu
    hit, dist, normal = geom.raycast_down_dir(
        hard_point, jnp.broadcast_to(wheel_dir, hard_point.shape),
        ray_len[None, :], game_mode, true_planes_only=grid is not None)
    if grid is not None:
        # the reference raycasts against the whole static world (meshes +
        # planes, btVehicleRL.cpp:118-212): closest hit wins
        from reinforcement_learning_tpu.physics.contacts import \
            MESH_COMPACT_K_RAY
        mhit, mdist, mnormal = grid.raycast(
            hard_point, jnp.broadcast_to(wheel_dir, hard_point.shape),
            jnp.broadcast_to(ray_len[None, :], hit.shape),
            k_compact=MESH_COMPACT_K_RAY)
        closer = mhit & (mdist < dist)
        hit = hit | mhit
        dist = jnp.where(closer, mdist, dist)
        normal = jnp.where(closer[..., None], mnormal, normal)

    ground_idx = jnp.full(hit.shape, -1, jnp.int32)

    # --- dynamic objects (Arena.cpp:733-750: the suspension grid gets a
    # per-tick dynamic-object overlay so wheel rays hit the ball and other
    # cars; a dynamic hit sets isInContact but NOT isInContactWithWorld,
    # btVehicleRL.cpp:149-150)
    if ball is not None:
        C_cars = cars.pos.shape[0]
        dir_b = jnp.broadcast_to(wheel_dir, hard_point.shape)
        max_b = jnp.broadcast_to(ray_len[None, :], hit.shape)
        bhit, bt_ = _ray_sphere(hard_point, dir_b, max_b,
                                ball.pos[None, None, :], mut.ball_radius)
        closer = bhit & (bt_ < dist)
        hit = hit | closer
        dist = jnp.where(closer, bt_, dist)
        bpt = hard_point + wheel_dir * bt_[..., None]
        bnormal = m.normalize(bpt - ball.pos[None, None, :])
        normal = jnp.where(closer[..., None], bnormal, normal)
        ground_idx = jnp.where(closer, -2, ground_idx)

        # other cars' hitboxes (alive only, not self)
        box_center = cars.pos + m.rotate(cars.rot, jnp.asarray(
            cfg.hitbox_offset, jnp.float32))                  # (C, 3)
        he_box = jnp.asarray(cfg.hitbox_size, jnp.float32) / 2.0
        ohit, ot, onorm = _ray_obb(
            hard_point[:, :, None, :], dir_b[:, :, None, :],
            max_b[:, :, None], box_center[None, None, :, :],
            cars.rot[None, None, :, :, :], he_box)            # (C, 4, C)
        not_self = ~jnp.eye(C_cars, dtype=bool)[:, None, :]
        ok = ohit & not_self
        if alive is not None:
            ok &= alive[None, None, :]
        ot = jnp.where(ok, ot, jnp.inf)
        j = jnp.argmin(ot, axis=-1)                           # (C, 4)
        ct = jnp.take_along_axis(ot, j[..., None], axis=-1)[..., 0]
        chit = jnp.isfinite(ct)
        cn = jnp.take_along_axis(onorm, j[..., None, None], axis=2)[..., 0, :]
        closer = chit & (ct < dist)
        hit = hit | closer
        dist = jnp.where(closer, ct, dist)
        normal = jnp.where(closer[..., None], cn, normal)
        ground_idx = jnp.where(closer, j.astype(jnp.int32), ground_idx)

    # World contact comes from the single NEAREST hit: when a dynamic
    # object (ball/car) is closer than static geometry, the wheel is NOT
    # in world contact — the reference sets m_isInContactWithWorld =
    # object->isStaticObject() for the nearest hit (btVehicleRL.cpp:151)
    # and gates sticky forces + extra pushback on it.
    in_world = hit & (ground_idx == -1)

    contact_point = hard_point + wheel_dir * dist[..., None]
    # wheelTraceLen = (hardPoint - contactPoint) . up  (btVehicleRL.cpp:154)
    trace_len = m.dot(hard_point - contact_point, up[:, None, :])
    susp_len = jnp.clip(trace_len - radii, rest_len - travel,
                        rest_len + travel)
    susp_len = jnp.where(hit, susp_len, rest_len + travel)

    # Velocity of chassis at contact point
    rel = (contact_point - cars.pos[:, None, :]) * C.UU_TO_BT
    vel_at = cars.vel[:, None, :] * C.UU_TO_BT + jnp.cross(
        jnp.broadcast_to(cars.ang_vel[:, None, :], rel.shape), rel)
    proj_vel = m.dot(normal, vel_at)
    denom = m.dot(normal, up[:, None, :])
    good_denom = denom > 0.1
    inv = jnp.where(good_denom, 1.0 / jnp.maximum(denom, 0.1), 10.0)
    susp_rel_vel = jnp.where(hit & good_denom, proj_vel * inv, 0.0)
    clipped_inv = jnp.where(hit, jnp.where(good_denom, inv, 10.0), 1.0)

    # Extra pushback (btVehicleRL.cpp:184-201): wheel ray hit closer than
    # the no-travel rest distance -> hard contact impulse.
    push_thresh = rest_len + radii - sus_sub_uu
    delta = (trace_len - push_thresh) * C.UU_TO_BT  # negative = penetration
    # extra pushback is computed ONLY against static objects
    # (btVehicleRL.cpp:184: "if (object->isStaticObject())")
    needs_push = in_world & (trace_len < push_thresh)
    # resolveSingleCollision vs static: impulse along normal.  Restitution
    # is hard-coded ZERO there ("no friction and no restitution",
    # btContactConstraint.cpp:59,82) regardless of body materials.
    rel_vel_n = proj_vel  # normal . velocity at contact (bt)
    positional_err = 0.2 * -delta / dt
    velocity_err = -rel_vel_n
    r_cross_n = jnp.cross(rel, normal)
    ang_term = m.dot(
        jnp.cross(jnp.einsum('cij,cwj->cwi', inv_inertia_ws, r_cross_n), rel),
        normal)
    denom0 = (1.0 / mut.car_mass) + ang_term
    imp = (positional_err + velocity_err) / jnp.maximum(denom0, 1e-9)
    imp = jnp.maximum(imp, 0.0)
    extra_pushback = jnp.where(needs_push, imp / 4.0, 0.0)

    normal = jnp.where(hit[..., None], normal, -wheel_dir)
    return WheelRaycast(
        is_in_contact=hit, in_world_contact=in_world,
        contact_point=contact_point, contact_normal=normal,
        susp_length=susp_len, susp_rel_vel=susp_rel_vel,
        clipped_inv_dot=clipped_inv, extra_pushback=extra_pushback,
        hard_point=hard_point,
        ground_idx=jnp.where(hit, ground_idx,
                             jnp.full(hit.shape, -1, jnp.int32)))


# ---------------------------------------------------------------------------
# Friction impulse calculation (btVehicleRL::calcFrictionImpulses, :313-387)

def calc_friction_impulses(cars: CarsState, rc: WheelRaycast,
                           wc: WheelControlsState, mut: MutatorConfig,
                           dt: float, inv_inertia_ws,
                           ball=None) -> jnp.ndarray:
    """Returns wheel impulse vectors (C, 4, 3) in BT units (pre-dt-scaling,
    matching wheel.m_impulse).

    With ``ball`` given, wheels whose ray hit a dynamic ground object
    (rc.ground_idx: -2 ball, >=0 other car) use that object's velocity in
    the relative-velocity terms and its mass/inertia in the bilateral
    jacobian, like the reference's resolveSingleBilateral against a
    dynamic groundObject (btVehicleRL.cpp:321-387).  The rolling-friction
    branch keeps the reference's quirk of evaluating the ground object's
    point velocity at the CAR-relative contact offset
    (btVehicleRL.cpp:352-356).
    """
    friction_scale = mut.car_mass / 3.0

    up = cars.up[:, None, :]
    right = cars.right[:, None, :]
    # Steered axle dir: rotate chassis right about up by steer angle
    # (front wheels only; steering basis from updateWheelTransform).
    steer = jnp.stack([wc.steer_angle, wc.steer_angle,
                       jnp.zeros_like(wc.steer_angle),
                       jnp.zeros_like(wc.steer_angle)], axis=1)  # (C, 4)
    cs, sn = jnp.cos(steer)[..., None], jnp.sin(steer)[..., None]
    # Rotation of right about up by steer angle (Rodrigues with u = up,
    # u . right = 0): v' = v cos + (u x v) sin
    axle0 = right * cs + jnp.cross(jnp.broadcast_to(up, right.shape),
                                   jnp.broadcast_to(right, right.shape)) * sn

    n = rc.contact_normal
    axle = axle0 - n * m.dot(axle0, n, keepdims=True)
    axle = m.normalize(axle)
    fwd_dir = m.normalize(jnp.cross(n, axle))

    rel = (rc.contact_point - cars.pos[:, None, :]) * C.UU_TO_BT
    vel_at = cars.vel[:, None, :] * C.UU_TO_BT + jnp.cross(
        jnp.broadcast_to(cars.ang_vel[:, None, :], rel.shape), rel)

    # Dynamic ground object state (zeros / no-ops for static hits)
    if ball is not None:
        gi = rc.ground_idx
        is_ball = gi == -2
        is_car = gi >= 0
        dyn = is_ball | is_car
        gidx = jnp.maximum(gi, 0)
        gb = is_ball[..., None]
        g_vel = jnp.where(gb, ball.vel, cars.vel[gidx])       # (C,4,3) uu
        g_ang = jnp.where(gb, ball.ang_vel, cars.ang_vel[gidx])
        g_pos = jnp.where(gb, ball.pos, cars.pos[gidx])
        i_ball = 0.4 * mut.ball_mass * (mut.ball_radius * C.UU_TO_BT) ** 2
        g_inv_iw = jnp.where(
            is_ball[..., None, None], jnp.eye(3) / i_ball,
            inv_inertia_ws[gidx])                             # (C,4,3,3)
        g_inv_mass = jnp.where(
            dyn, jnp.where(is_ball, 1.0 / mut.ball_mass,
                           1.0 / mut.car_mass), 0.0)          # (C,4)
        r_b = (rc.contact_point - g_pos) * C.UU_TO_BT
        v2_at = jnp.where(
            dyn[..., None],
            g_vel * C.UU_TO_BT + jnp.cross(g_ang, r_b), 0.0)
        # reference quirk: rolling friction samples the ground object's
        # point velocity at the CAR-relative offset
        v2_quirk = jnp.where(
            dyn[..., None],
            g_vel * C.UU_TO_BT + jnp.cross(g_ang, rel), 0.0)
    else:
        v2_at = v2_quirk = 0.0
        g_inv_mass = 0.0
        g_inv_iw = None
        r_b = None

    # Side impulse (bullet resolveSingleBilateral; both bodies' terms when
    # the ground object is dynamic)
    rel_vel_side = m.dot(vel_at - v2_at, axle)
    r_cross_n = jnp.cross(rel, axle)
    ang_term = m.dot(
        jnp.cross(jnp.einsum('cij,cwj->cwi', inv_inertia_ws, r_cross_n), rel),
        axle)
    jac_diag = (1.0 / mut.car_mass) + ang_term + g_inv_mass
    if g_inv_iw is not None:
        rb_cross = jnp.cross(r_b, axle)
        g_ang_term = m.dot(
            jnp.cross(jnp.einsum('cwij,cwj->cwi', g_inv_iw, rb_cross), r_b),
            axle)
        jac_diag = jac_diag + jnp.where(dyn, g_ang_term, 0.0)
    side_impulse = -C.SIDE_FRICTION_CONTACT_DAMPING * rel_vel_side / (
        jnp.maximum(jac_diag, 1e-9))

    # Rolling friction
    rel_vel_fwd = m.dot(vel_at - v2_quirk, fwd_dir)
    brake = wc.brake[:, None]
    engine = wc.engine_force[:, None]
    # (dt <= 1/80 in training, so the sub-80tps rounding branch is skipped;
    # reference btVehicleRL.cpp:362-366)
    rolling_brake = jnp.clip(-rel_vel_fwd * C.ROLLING_FRICTION_SCALE_MAGIC,
                             -brake, brake)
    rolling = jnp.where(engine == 0.0,
                        jnp.where(brake > 0.0, rolling_brake, 0.0),
                        -engine / friction_scale)

    total = (fwd_dir * (rolling * wc.long_friction)[..., None]
             + axle * (side_impulse * wc.lat_friction)[..., None])
    impulse = total * friction_scale
    return jnp.where(rc.is_in_contact[..., None], impulse,
                     jnp.zeros_like(impulse))


def apply_friction_impulses(cars: CarsState, rc: WheelRaycast,
                            impulses: jnp.ndarray, dt: float,
                            mut: MutatorConfig, inv_inertia_ws):
    """btVehicleRL::applyFrictionImpulses (:390-402): impulse * dt at the
    contact offset with the up-component removed (rolling influence fix)."""
    up = cars.up
    offset = (rc.contact_point - cars.pos[:, None, :]) * C.UU_TO_BT
    up_dot = m.dot(offset, up[:, None, :], keepdims=True)
    rel = offset - up[:, None, :] * up_dot

    imp = impulses * dt  # (C, 4, 3)
    dv = jnp.sum(imp, axis=1) / mut.car_mass * C.BT_TO_UU
    torque = jnp.sum(jnp.cross(rel, imp), axis=1)
    dw = jnp.einsum('cij,cj->ci', inv_inertia_ws, torque)
    return cars.vel + dv, cars.ang_vel + dw


def apply_suspension(cars: CarsState, rc: WheelRaycast, cfg: CarConfig,
                     mut: MutatorConfig, dt: float, inv_inertia_ws):
    """btVehicleRL::updateSuspension (:277-310): spring + damper forces
    applied as impulses at the contact points."""
    rest_len = jnp.asarray(cfg.sus_rest_lengths())[None, :]
    force_scale = jnp.asarray(cfg.sus_force_scales())[None, :]

    spring = ((rest_len - rc.susp_length) * C.UU_TO_BT
              * C.BTVehicle.SUSPENSION_STIFFNESS * rc.clipped_inv_dot)
    damping_scale = jnp.where(rc.susp_rel_vel < 0,
                              C.BTVehicle.WHEELS_DAMPING_COMPRESSION,
                              C.BTVehicle.WHEELS_DAMPING_RELAXATION)
    force = (spring - damping_scale * rc.susp_rel_vel) * force_scale
    force = jnp.maximum(force, 0.0)
    force = jnp.where(rc.is_in_contact, force, 0.0)

    base = force * dt + rc.extra_pushback  # (C, 4) bt impulse magnitude
    imp = rc.contact_normal * base[..., None]
    rel = (rc.contact_point - cars.pos[:, None, :]) * C.UU_TO_BT
    dv = jnp.sum(imp, axis=1) / mut.car_mass * C.BT_TO_UU
    torque = jnp.sum(jnp.cross(rel, imp), axis=1)
    dw = jnp.einsum('cij,cj->ci', inv_inertia_ws, torque)
    return cars.vel + dv, cars.ang_vel + dw


# ---------------------------------------------------------------------------
# Car::_UpdateWheels (Car.cpp:330-475): new drive values + friction params

def update_wheels(cars: CarsState, rc: WheelRaycast, wc: WheelControlsState,
                  controls, fwd_speed, dt: float):
    """Returns (new WheelControlsState, handbrake_val, sticky_accel (C,3),
    real_throttle)."""
    abs_speed = jnp.abs(fwd_speed)

    hb_input = controls[:, HANDBRAKE] > 0
    hb_val = jnp.where(hb_input,
                       cars.handbrake_val + C.POWERSLIDE_RISE_RATE * dt,
                       cars.handbrake_val - C.POWERSLIDE_FALL_RATE * dt)
    hb_val = jnp.clip(hb_val, 0.0, 1.0)

    throttle = controls[:, THROTTLE]
    boosting = (controls[:, BOOST] > 0) & (cars.boost > 0)
    real_throttle = jnp.where(boosting, 1.0, throttle)

    drive_scale = m.curve(C.DRIVE_SPEED_TORQUE_FACTOR_CURVE, abs_speed)
    abs_throttle = jnp.abs(real_throttle)

    opposite = (abs_speed > C.STOPPING_FORWARD_VEL) & (
        jnp.sign(real_throttle) != jnp.sign(fwd_speed))
    # not handbraking branch (Car.cpp:359-382)
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

    num_contact = jnp.sum(rc.is_in_contact, axis=1)
    drive_scale = jnp.where(num_contact < 3, drive_scale / 4.0, drive_scale)

    engine_force = engine_throttle * (C.THROTTLE_TORQUE_AMOUNT
                                      * C.UU_TO_BT) * drive_scale
    brake_force = real_brake * (C.BRAKE_TORQUE_AMOUNT * C.UU_TO_BT)

    # Steering (Car.cpp:395-407)
    steer_angle = m.curve(C.STEER_ANGLE_FROM_SPEED_CURVE, abs_speed)
    ps_angle = m.curve(C.POWERSLIDE_STEER_ANGLE_FROM_SPEED_CURVE, abs_speed)
    steer_angle = steer_angle + (ps_angle - steer_angle) * hb_val
    steer_angle = steer_angle * controls[:, STEER]

    # Friction params (Car.cpp:409-461).  latDir comes from the wheel's
    # m_worldTransform, which was last refreshed in updateWheelTransform at
    # tick start — i.e. with the PREVIOUS tick's steer angle (the new steer
    # set a few lines above only takes effect next tick).
    lat_dir0 = cars.right[:, None, :]
    cs = jnp.cos(wc.steer_angle)[:, None, None]
    sn = jnp.sin(wc.steer_angle)[:, None, None]
    up = cars.up[:, None, :]
    steered_right = lat_dir0 * cs + jnp.cross(
        jnp.broadcast_to(up, lat_dir0.shape),
        jnp.broadcast_to(lat_dir0, lat_dir0.shape)) * sn
    lat_dir = jnp.concatenate([
        jnp.broadcast_to(steered_right, (steer_angle.shape[0], 2, 3)),
        jnp.broadcast_to(lat_dir0, (steer_angle.shape[0], 2, 3))], axis=1)
    long_dir = jnp.cross(lat_dir, rc.contact_normal)

    rel = (rc.hard_point - cars.pos[:, None, :])
    cross_vec = (jnp.cross(
        jnp.broadcast_to(cars.ang_vel[:, None, :], rel.shape),
        rel * C.UU_TO_BT) + cars.vel[:, None, :] * C.UU_TO_BT) * C.BT_TO_UU
    base_fric = jnp.abs(m.dot(cross_vec, lat_dir))
    fric_input = jnp.where(
        base_fric > 5.0,
        base_fric / (jnp.abs(m.dot(cross_vec, long_dir)) + base_fric),
        0.0)
    lat_f = m.curve(C.LAT_FRICTION_CURVE, fric_input)
    long_f = m.curve(C.LONG_FRICTION_CURVE, fric_input)

    hb = hb_val[:, None]
    lat_hb = lat_f * ((m.curve(C.HANDBRAKE_LAT_FRICTION_FACTOR_CURVE,
                               fric_input) - 1.0) * hb + 1.0)
    long_hb = long_f * ((m.curve(C.HANDBRAKE_LONG_FRICTION_FACTOR_CURVE,
                                 fric_input) - 1.0) * hb + 1.0)
    has_hb = hb > 0
    lat_f = jnp.where(has_hb, lat_hb, lat_f)
    long_f = jnp.where(has_hb, long_hb, jnp.ones_like(long_f))

    sticky = real_throttle != 0.0
    non_sticky_scale = m.curve(C.NON_STICKY_FRICTION_FACTOR_CURVE,
                               rc.contact_normal[..., 2])
    lat_f = jnp.where(sticky[:, None], lat_f, lat_f * non_sticky_scale)
    long_f = jnp.where(sticky[:, None], long_f, long_f * non_sticky_scale)

    # Preserve previous values where no ground contact (reference only
    # updates wheels with a ground object)
    lat_f = jnp.where(rc.is_in_contact, lat_f, wc.lat_friction)
    long_f = jnp.where(rc.is_in_contact, long_f, wc.long_friction)

    # Sticky force (Car.cpp:463-474)
    any_world = jnp.any(rc.in_world_contact, axis=1)
    sum_n = jnp.sum(jnp.where(rc.is_in_contact[..., None],
                              rc.contact_normal, 0.0), axis=1)
    up_dir = jnp.where(m.norm(sum_n, keepdims=True) > 1e-9,
                       m.normalize(sum_n), cars.up)
    full_stick = (real_throttle != 0.0) | (abs_speed > C.STOPPING_FORWARD_VEL)
    sticky_scale = 0.5 + jnp.where(full_stick,
                                   1.0 - jnp.abs(up_dir[:, 2]), 0.0)
    sticky_accel = up_dir * (sticky_scale * C.GRAVITY_Z)[:, None]
    sticky_accel = jnp.where(any_world[:, None], sticky_accel, 0.0)

    new_wc = WheelControlsState(
        steer_angle=steer_angle,
        engine_force=engine_force,
        brake=brake_force,
        lat_friction=lat_f,
        long_friction=long_f)
    return new_wc, hb_val, sticky_accel, real_throttle


# ---------------------------------------------------------------------------
# Air control / jump / flip state machines

def update_air_torque(cars: CarsState, controls, in_air_mask, zero_wheels,
                      dt: float):
    """Car::_UpdateAirTorque (Car.cpp:556-641).

    Returns (ang_accel (C,3), accel (C,3), is_flipping).  ``in_air_mask`` is
    numWheelsInContact < 3 (whether this update runs at all);
    ``zero_wheels`` is numWheelsInContact == 0 (air control allowed).
    """
    dir_pitch = -cars.right
    dir_yaw = cars.up
    dir_roll = -cars.forward

    is_flipping = cars.is_flipping & cars.has_flipped & (
        cars.flip_time < C.FLIP_TORQUE_TIME)

    rel_torque = cars.flip_rel_torque
    has_rel_torque = jnp.any(rel_torque != 0.0, axis=-1)

    pitch_in = controls[:, PITCH]
    flip_cancel = (rel_torque[:, 1] != 0.0) & (pitch_in != 0.0) & (
        jnp.sign(rel_torque[:, 1]) == jnp.sign(pitch_in))
    pitch_scale = jnp.where(flip_cancel,
                            1.0 - jnp.minimum(jnp.abs(pitch_in), 1.0), 1.0)
    rel_t = rel_torque.at[:, 1].multiply(pitch_scale)
    dodge_torque = rel_t * jnp.array([C.FLIP_TORQUE_X, C.FLIP_TORQUE_Y, 0.0])
    flip_ang_accel = m.rotate(cars.rot, dodge_torque)
    flip_ang_accel = jnp.where(
        (is_flipping & has_rel_torque)[:, None], flip_ang_accel, 0.0)

    do_air_control = jnp.where(
        is_flipping, has_rel_torque & flip_cancel | ~has_rel_torque,
        jnp.ones_like(is_flipping))
    do_air_control &= ~cars.is_auto_flipping
    do_air_control &= zero_wheels

    # pitch lock during/after flips
    pitch_lock = is_flipping | (
        cars.has_flipped
        & (cars.flip_time < C.FLIP_TORQUE_TIME + C.FLIP_PITCHLOCK_EXTRA_TIME))
    pitch_torque_scale = jnp.where(pitch_lock, 0.0, 1.0)

    any_input = (pitch_in != 0) | (controls[:, YAW] != 0) | (
        controls[:, ROLL] != 0)
    tx, ty, tz = C.CAR_AIR_CONTROL_TORQUE
    torque = (pitch_in * pitch_torque_scale)[:, None] * dir_pitch * tx \
        + controls[:, YAW][:, None] * dir_yaw * ty \
        + controls[:, ROLL][:, None] * dir_roll * tz
    torque = jnp.where(any_input[:, None], torque, 0.0)

    dx, dy, dz = C.CAR_AIR_CONTROL_DAMPING
    damp_pitch = m.dot(dir_pitch, cars.ang_vel) * dx * (
        1.0 - jnp.abs(jnp.where(do_air_control,
                                pitch_in * pitch_torque_scale, 0.0)))
    damp_yaw = m.dot(dir_yaw, cars.ang_vel) * dy * (
        1.0 - jnp.abs(jnp.where(do_air_control, controls[:, YAW], 0.0)))
    damp_roll = m.dot(dir_roll, cars.ang_vel) * dz
    damping = (dir_yaw * damp_yaw[:, None] + dir_pitch * damp_pitch[:, None]
               + dir_roll * damp_roll[:, None])
    control_ang_accel = (torque - damping) * C.CAR_TORQUE_SCALE
    control_ang_accel = jnp.where(do_air_control[:, None],
                                  control_ang_accel, 0.0)

    # Air throttle (Car.cpp:639-640) — applies whenever _UpdateAirTorque runs
    throttle = controls[:, THROTTLE]
    air_accel = cars.forward * (throttle * C.THROTTLE_AIR_ACCEL)[:, None]
    air_accel = jnp.where((throttle != 0.0)[:, None], air_accel, 0.0)

    ang_accel = flip_ang_accel + control_ang_accel
    ang_accel = jnp.where(in_air_mask[:, None], ang_accel, 0.0)
    accel = jnp.where(in_air_mask[:, None], air_accel, 0.0)
    is_flipping = jnp.where(in_air_mask, is_flipping, False)
    return ang_accel, accel, is_flipping


def update_jump(cars: CarsState, controls, jump_pressed, mut: MutatorConfig,
                dt: float):
    """Car::_UpdateJump (Car.cpp:507-554).  Returns (state updates dict,
    dv (C,3), accel (C,3))."""
    on_ground = cars.is_on_ground
    is_jumping = cars.is_jumping
    has_jumped = cars.has_jumped
    jump_time = cars.jump_time

    # Ground reset with time pad
    reset_ok = on_ground & ~is_jumping & ~(
        has_jumped & (jump_time < C.JUMP_MIN_TIME + C.JUMP_RESET_TIME_PAD))
    has_jumped = jnp.where(reset_ok, False, has_jumped)
    jump_time = jnp.where(reset_ok, 0.0, jump_time)

    # Continue or stop jumping
    cont = (jump_time < C.JUMP_MIN_TIME) | (
        (controls[:, JUMP] > 0) & (jump_time < C.JUMP_MAX_TIME))
    start = ~is_jumping & on_ground & jump_pressed
    new_is_jumping = jnp.where(is_jumping, cont, start)
    jump_time = jnp.where(start, 0.0, jump_time)

    dv = jnp.where(start[:, None],
                   cars.up * mut.jump_immediate_force, 0.0)

    has_jumped = jnp.where(new_is_jumping, True, has_jumped)
    accel_scale = jnp.where(jump_time < C.JUMP_MIN_TIME,
                            C.JUMP_PRE_MIN_ACCEL_SCALE, 1.0)
    accel = jnp.where(new_is_jumping[:, None],
                      cars.up * (mut.jump_accel * accel_scale)[:, None], 0.0)

    jump_time = jnp.where(new_is_jumping | has_jumped,
                          jump_time + dt, jump_time)
    updates = dict(is_jumping=new_is_jumping, has_jumped=has_jumped,
                   jump_time=jump_time)
    return updates, dv, accel


def update_auto_flip(cars: CarsState, controls, jump_pressed, dt: float):
    """Car::_UpdateAutoFlip (Car.cpp:763-797)."""
    _, _, roll_ang = m.rotmat_to_euler(cars.rot)
    abs_roll = jnp.abs(roll_ang)
    trigger = (jump_pressed & cars.has_world_contact
               & (cars.world_contact_normal[:, 2] > C.CAR_AUTOFLIP_NORMZ_THRESH)
               & (abs_roll > C.CAR_AUTOFLIP_ROLL_THRESH))

    timer = jnp.where(trigger,
                      C.CAR_AUTOFLIP_TIME * (abs_roll / jnp.pi),
                      cars.auto_flip_timer)
    scale = jnp.where(trigger, jnp.where(roll_ang > 0, 1.0, -1.0),
                      cars.auto_flip_torque_scale)
    is_af = jnp.where(trigger, True, cars.is_auto_flipping)

    dv = jnp.where(trigger[:, None], -cars.up * C.CAR_AUTOFLIP_IMPULSE, 0.0)

    active = is_af & (timer > 0)
    expired = is_af & ~active
    dw = jnp.where(active[:, None],
                   cars.forward * (C.CAR_AUTOFLIP_TORQUE * scale * dt)[:, None],
                   0.0)
    timer = jnp.where(active, timer - dt, jnp.where(expired, 0.0, timer))
    is_af = jnp.where(expired, False, is_af)
    updates = dict(is_auto_flipping=is_af, auto_flip_timer=timer,
                   auto_flip_torque_scale=scale)
    return updates, dv, dw


def update_double_jump_or_flip(cars: CarsState, controls, jump_pressed,
                               fwd_speed, cfg: CarConfig, mut: MutatorConfig,
                               dt: float, is_jumping, has_jumped, jump_time,
                               is_flipping):
    """Car::_UpdateDoubleJumpOrFlip (Car.cpp:643-761).

    Takes the already-updated jump state from update_jump.  Returns
    (updates dict, dv (C,3), z_damp_scale (C,))."""
    on_ground = cars.is_on_ground
    air = ~on_ground

    has_double_jumped = jnp.where(on_ground, False, cars.has_double_jumped)
    has_flipped = jnp.where(on_ground, False, cars.has_flipped)
    air_time = jnp.where(on_ground, 0.0, cars.air_time + dt)
    atsj = jnp.where(
        on_ground, 0.0,
        jnp.where(has_jumped & ~is_jumping,
                  cars.air_time_since_jump + dt, 0.0))
    flip_time = jnp.where(on_ground, 0.0, cars.flip_time)
    flip_rel_torque = cars.flip_rel_torque

    press_window = air & jump_pressed & (atsj < C.DOUBLEJUMP_MAX_DELAY)
    input_mag = (jnp.abs(controls[:, YAW]) + jnp.abs(controls[:, PITCH])
                 + jnp.abs(controls[:, ROLL]))
    is_flip_input = input_mag >= cfg.dodge_deadzone

    fresh = ~has_double_jumped & ~has_flipped
    can_flip = fresh | mut.unlimited_flips
    can_dj = fresh | mut.unlimited_double_jumps
    can_use = jnp.where(is_flip_input, can_flip, can_dj)
    can_use &= ~cars.is_auto_flipping

    do_flip = press_window & can_use & is_flip_input
    do_dj = press_window & can_use & ~is_flip_input

    # --- flip initiation (Car.cpp:677-737)
    fwd_ratio = jnp.abs(fwd_speed) / C.CAR_MAX_SPEED
    pitch_in = controls[:, PITCH]
    yaw_roll = controls[:, YAW] + controls[:, ROLL]
    dodge_dir = jnp.stack([-pitch_in, yaw_roll, jnp.zeros_like(pitch_in)],
                          axis=-1)
    stall = (jnp.abs(yaw_roll) < 0.1) & (jnp.abs(pitch_in) < 0.1)
    dodge_dir = jnp.where(stall[:, None], 0.0, m.normalize(dodge_dir))
    new_rel_torque = jnp.stack([-dodge_dir[:, 1], dodge_dir[:, 0],
                                jnp.zeros_like(pitch_in)], axis=-1)
    dd = dodge_dir
    dd = dd.at[:, 0].set(jnp.where(jnp.abs(dd[:, 0]) < 0.1, 0.0, dd[:, 0]))
    dd = dd.at[:, 1].set(jnp.where(jnp.abs(dd[:, 1]) < 0.1, 0.0, dd[:, 1]))
    nonzero_dd = jnp.any(jnp.abs(dd) > 1e-7, axis=-1)

    backwards = jnp.where(jnp.abs(fwd_speed) < 100.0,
                          dd[:, 0] < 0.0,
                          (dd[:, 0] >= 0.0) != (fwd_speed >= 0.0))
    init_vel = dd * C.FLIP_INITIAL_VEL_SCALE
    max_x = jnp.where(backwards, C.FLIP_BACKWARD_IMPULSE_MAX_SPEED_SCALE,
                      C.FLIP_FORWARD_IMPULSE_MAX_SPEED_SCALE)
    vx = init_vel[:, 0] * ((max_x - 1.0) * fwd_ratio + 1.0)
    vy = init_vel[:, 1] * (
        (C.FLIP_SIDE_IMPULSE_MAX_SPEED_SCALE - 1.0) * fwd_ratio + 1.0)
    vx = jnp.where(backwards, vx * C.FLIP_BACKWARD_IMPULSE_SCALE_X, vx)

    f = cars.forward
    fwd_ang = jnp.arctan2(f[:, 1], f[:, 0])
    ca, sa = jnp.cos(fwd_ang), jnp.sin(fwd_ang)
    # xVelDir = (cos, -sin, 0), yVelDir = (sin, cos, 0); delta =
    # (v . xVelDir, v . yVelDir, 0) with v = (vx, vy, 0)
    dvx = vx * ca + vy * sa
    dvy = -vx * sa + vy * ca
    flip_dv = jnp.stack([dvx, dvy, jnp.zeros_like(dvx)], axis=-1)
    flip_dv = jnp.where((do_flip & nonzero_dd)[:, None], flip_dv, 0.0)

    flip_time = jnp.where(do_flip, 0.0, flip_time)
    has_flipped = jnp.where(do_flip, True, has_flipped)
    is_flipping = jnp.where(do_flip, True, is_flipping)
    flip_rel_torque = jnp.where(do_flip[:, None], new_rel_torque,
                                flip_rel_torque)

    # --- double jump
    dj_dv = jnp.where(do_dj[:, None],
                      cars.up * C.JUMP_IMMEDIATE_FORCE, 0.0)
    has_double_jumped = jnp.where(do_dj, True, has_double_jumped)

    # --- flip timing + z damping (Car.cpp:749-760)
    flip_time_next = jnp.where(is_flipping | has_flipped,
                               flip_time + dt, flip_time)
    in_torque_window = is_flipping & (flip_time_next <= C.FLIP_TORQUE_TIME)
    z_damp = in_torque_window & (flip_time_next >= C.FLIP_Z_DAMP_START)
    # (vel.z < 0 check applied by caller since vel is threaded there)
    z_damp_maybe = z_damp
    z_damp_always = z_damp & (flip_time_next < C.FLIP_Z_DAMP_END)

    updates = dict(
        has_double_jumped=has_double_jumped, has_flipped=has_flipped,
        air_time=air_time, air_time_since_jump=atsj,
        flip_time=flip_time_next, is_flipping=is_flipping,
        flip_rel_torque=flip_rel_torque)
    dv = flip_dv + dj_dv
    return updates, dv, z_damp_maybe, z_damp_always


def update_auto_roll(cars: CarsState, rc: WheelRaycast, controls,
                     num_contact):
    """Car::_UpdateAutoRoll (Car.cpp:799-833).  Returns (accel, ang_accel);
    caller masks by the trigger condition."""
    sum_n = jnp.sum(jnp.where(rc.is_in_contact[..., None],
                              rc.contact_normal, 0.0), axis=1)
    wheels_up = jnp.where(m.norm(sum_n, keepdims=True) > 1e-9,
                          m.normalize(sum_n), cars.up)
    ground_up = jnp.where((num_contact > 0)[:, None], wheels_up,
                          cars.world_contact_normal)
    ground_down = -ground_up

    fdir, rdir = cars.forward, cars.right
    cross_right = jnp.cross(ground_up, fdir)
    cross_fwd = jnp.cross(ground_down, cross_right)

    right_factor = 1.0 - jnp.clip(m.dot(rdir, cross_right), 0.0, 1.0)
    fwd_factor = 1.0 - jnp.clip(m.dot(fdir, cross_fwd), 0.0, 1.0)

    t_dir_right = fdir * jnp.where(m.dot(rdir, ground_up) >= 0, -1.0,
                                   1.0)[:, None]
    t_dir_fwd = rdir * jnp.where(m.dot(fdir, ground_up) >= 0, 1.0,
                                 -1.0)[:, None]
    torque = (t_dir_right * right_factor[:, None]
              + t_dir_fwd * fwd_factor[:, None])

    accel = ground_down * C.CAR_AUTOROLL_FORCE
    ang_accel = torque * C.CAR_AUTOROLL_TORQUE
    return accel, ang_accel


def update_boost(cars: CarsState, controls, mut: MutatorConfig, dt: float):
    """Car::_UpdateBoost (Car.cpp:477-505).  Returns (updates, accel)."""
    boosting_input = controls[:, BOOST] > 0
    tsb = cars.time_spent_boosting
    stop = ~boosting_input & (tsb >= C.BOOST_MIN_TIME)
    tsb = jnp.where(tsb > 0,
                    jnp.where(stop, 0.0, tsb + dt),
                    jnp.where(boosting_input, dt, 0.0))

    active = (cars.boost > 0) & (tsb > 0)
    boost_amt = jnp.where(
        active,
        jnp.maximum(cars.boost - mut.boost_used_per_second * dt, 0.0),
        cars.boost)
    boost_amt = jnp.minimum(boost_amt, C.BOOST_MAX)

    accel_mag = jnp.where(cars.is_on_ground, mut.boost_accel_ground,
                          mut.boost_accel_air)
    accel = jnp.where(active[:, None], cars.forward * accel_mag[:, None], 0.0)
    return dict(boost=boost_amt, time_spent_boosting=tsb), accel
