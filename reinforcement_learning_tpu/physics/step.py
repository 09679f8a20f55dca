"""Arena stepping: one physics tick and the multi-tick env step.

Replicates the reference per-tick pipeline order exactly
(reference: Arena::Step, Arena.cpp:716-812):

  1. ball zero-velocity sleeping
  2. per-car ``_PreTickUpdate`` (Car.cpp:58-131): demo/respawn, suspension
     raycasts + stale-control friction impulses (btVehicleRL quirk), drive
     update, air torque, jump/auto-flip/double-jump-flip/auto-roll state
     machines, suspension + friction impulse application, boost
  3. boost pad pre-tick (cooldowns)
  4. world step: integrate forces into velocities, resolve contacts
     (car-world, car-ball, ball-world, car-car), integrate transforms
  5. per-car ``_PostTickUpdate`` + ``_FinishPhysicsTick``: supersonic
     hysteresis, velocity-impulse caches, speed clamps
  6. boost pad pickup + post-tick
  7. goal detection

The whole tick is pure: ``(PhysicsState, key) -> PhysicsState``; a
``lax.scan`` runs ``tick_skip`` ticks per env step with the new actions
applied ``action_delay`` ticks in (reference split-step semantics,
EnvSet.cpp:113-156).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu import maths as m
from reinforcement_learning_tpu.physics import arena_geom as geom
from reinforcement_learning_tpu.physics import car as carmod
from reinforcement_learning_tpu.physics import contacts
from reinforcement_learning_tpu.physics import world as worldmod
from reinforcement_learning_tpu.physics.car import WheelControlsState
from reinforcement_learning_tpu.physics.state import (
    BOOST, HANDBRAKE, JUMP, PITCH, ROLL, STEER, THROTTLE, YAW, ArenaState,
    BallState, CarConfig, CarsState, MutatorConfig, make_arena_state)


@struct.dataclass
class PhysicsState:
    """ArenaState plus the cross-tick wheel drive state."""
    arena: ArenaState
    wheels: WheelControlsState

    @property
    def cars(self):
        return self.arena.cars

    @property
    def ball(self):
        return self.arena.ball


@dataclasses.dataclass(frozen=True)
class ArenaParams:
    """Static (compile-time) arena configuration.

    ``game_mode``: soccar | hoops | heatseeker | snowday (reference:
    GameMode.h).  Mode-specific physics compiles in only when selected.
    Pass ``mutators=MutatorConfig.for_mode(game_mode)`` (or leave None) to
    get the reference's mode defaults (MutatorConfig.cpp:5-34)."""
    num_cars: int
    mutators: MutatorConfig = None
    car_config: CarConfig = CarConfig()
    tick_rate: float = 120.0
    game_mode: str = "soccar"
    # Collide against the triangle-mesh arena (reference world composition:
    # 16 BVH meshes + 4 static planes, Arena.cpp:1020-1100).  False falls
    # back to the analytic-plane arena (faster; sharp corners/ramps).
    use_mesh: bool = True
    # Wheel suspension rays also hit the ball and other cars (the
    # reference's suspension-grid dynamic-object overlay,
    # Arena.cpp:733-750) so cars can drive on the ball / other roofs.
    # The pallas megakernel path disables this (like use_mesh).
    dynamic_wheel_rays: bool = True

    def __post_init__(self):
        if self.mutators is None:
            object.__setattr__(self, "mutators",
                               MutatorConfig.for_mode(self.game_mode))

    @property
    def dt(self) -> float:
        return 1.0 / self.tick_rate


def make_physics_state(params: ArenaParams) -> PhysicsState:
    return PhysicsState(
        arena=make_arena_state(params.num_cars, params.mutators,
                               params.game_mode),
        wheels=WheelControlsState.make(params.num_cars))


def clamp_controls(controls: jnp.ndarray) -> jnp.ndarray:
    """CarControls::ClampFix (CarControls.h:26-32) + booleanize buttons."""
    analog = jnp.clip(controls[..., :5], -1.0, 1.0)
    buttons = (controls[..., 5:] > 0).astype(controls.dtype)
    return jnp.concatenate([analog, buttons], axis=-1)


def _respawn_cars(cars: CarsState, teams, respawn_mask, key,
                  mut: MutatorConfig, num_cars: int,
                  game_mode: str = "soccar") -> CarsState:
    """Car::Respawn (Car.cpp:43-56): fresh default state at a random respawn
    location, mirrored for orange."""
    idx = jax.random.randint(key, (num_cars,), 0,
                             C.CAR_RESPAWN_LOCATION_AMOUNT)
    table = jnp.asarray(C.CAR_RESPAWN_LOCATIONS_HOOPS
                        if game_mode == "hoops"
                        else C.CAR_RESPAWN_LOCATIONS_SOCCAR)
    spawn = table[idx]  # (C, 3): x, y, yaw
    team_sign = jnp.where(teams == 0, 1.0, -1.0)
    pos = jnp.stack([spawn[:, 0], spawn[:, 1] * team_sign,
                     jnp.full((num_cars,), C.CAR_RESPAWN_Z)], axis=-1)
    yaw = spawn[:, 2] + jnp.where(teams == 0, 0.0, jnp.pi)
    rot = m.euler_to_rotmat(yaw)

    mask = respawn_mask
    mk = mask[:, None]
    mkk = mask[:, None, None]

    def w(field, new):
        return jnp.where(jnp.reshape(mask, mask.shape + (1,) * (field.ndim - 1)),
                         new, field)

    return cars.replace(
        pos=jnp.where(mk, pos, cars.pos),
        rot=jnp.where(mkk, rot, cars.rot),
        vel=w(cars.vel, 0.0), ang_vel=w(cars.ang_vel, 0.0),
        is_on_ground=w(cars.is_on_ground, True),
        wheels_with_contact=w(cars.wheels_with_contact, False),
        has_jumped=w(cars.has_jumped, False),
        has_double_jumped=w(cars.has_double_jumped, False),
        has_flipped=w(cars.has_flipped, False),
        flip_rel_torque=w(cars.flip_rel_torque, 0.0),
        jump_time=w(cars.jump_time, 0.0), flip_time=w(cars.flip_time, 0.0),
        is_flipping=w(cars.is_flipping, False),
        is_jumping=w(cars.is_jumping, False),
        air_time=w(cars.air_time, 0.0),
        air_time_since_jump=w(cars.air_time_since_jump, 0.0),
        boost=w(cars.boost, mut.car_spawn_boost_amount),
        time_spent_boosting=w(cars.time_spent_boosting, 0.0),
        is_supersonic=w(cars.is_supersonic, False),
        supersonic_time=w(cars.supersonic_time, 0.0),
        handbrake_val=w(cars.handbrake_val, 0.0),
        is_auto_flipping=w(cars.is_auto_flipping, False),
        auto_flip_timer=w(cars.auto_flip_timer, 0.0),
        auto_flip_torque_scale=w(cars.auto_flip_torque_scale, 0.0),
        has_world_contact=w(cars.has_world_contact, False),
        world_contact_normal=w(cars.world_contact_normal, 0.0),
        car_contact_other_id=w(cars.car_contact_other_id, 0),
        car_contact_cooldown=w(cars.car_contact_cooldown, 0.0),
        is_demoed=w(cars.is_demoed, False),
        demo_respawn_timer=w(cars.demo_respawn_timer, 0.0),
    )


def arena_tick(phys: PhysicsState, teams: jnp.ndarray, key,
               params: ArenaParams) -> PhysicsState:
    """One 1/120s physics tick for a single arena.

    Structure note: all per-car updates run UNMASKED for every car; one
    tree-level select at the end restores the frozen state of cars that
    were demolished at tick start (reference: DISABLE_SIMULATION,
    Car.cpp:74-87).  Only cross-object effects (ball impulses, car-car,
    pad pickup) carry explicit alive masks.  This keeps the kernel count
    per tick low — selects fuse, per-stage masking chains don't.

    Matmul precision: the tick's einsums (inertia-tensor applications,
    rotations) MUST run at true float32 — TPU's default bf16 matmul
    passes silently degrade the solver (~0.3 uu/s per step of drift vs
    the CPU/reference semantics; the component-form megakernel is scalar
    math and unaffected).
    """
    with jax.default_matmul_precision("float32"):
        return _arena_tick_impl(phys, teams, key, params)


def _arena_tick_impl(phys: PhysicsState, teams: jnp.ndarray, key,
                     params: ArenaParams) -> PhysicsState:
    mut = params.mutators
    cfg = params.car_config
    dt = params.dt
    num_cars = params.num_cars
    grid = (worldmod.get_grid(params.game_mode) if params.use_mesh
            else None)

    arena = phys.arena
    cars = arena.cars
    ball = arena.ball
    wc = phys.wheels

    # numpy (static) so contact-margin scalars derived from it stay python
    # floats under tracing
    half_extents = np.asarray(cfg.hitbox_size, np.float32) / 2.0
    hitbox_offset = np.asarray(cfg.hitbox_offset, np.float32)
    inv_i_local = carmod.box_inv_inertia_local(mut.car_mass, cfg.hitbox_size)

    controls = clamp_controls(cars.controls)
    cars = cars.replace(controls=controls)

    # --- demo / respawn (Car.cpp:68-87)
    demo_timer = jnp.where(cars.is_demoed,
                           jnp.maximum(cars.demo_respawn_timer - dt, 0.0),
                           cars.demo_respawn_timer)
    respawn_now = cars.is_demoed & (demo_timer == 0.0)
    cars = cars.replace(demo_respawn_timer=demo_timer)
    key, krespawn = jax.random.split(key)
    cars = _respawn_cars(cars, teams, respawn_now, krespawn, mut, num_cars,
                         params.game_mode)
    alive = ~cars.is_demoed
    # Frozen snapshot: demoed cars keep exactly this state this tick
    frozen_cars = cars
    frozen_wc = wc

    # World-frame inverse inertia: rotation is constant until transform
    # integration, so one computation serves the whole tick (bullet
    # updates it once per step too).
    inv_iw = carmod.inv_inertia_world(cars.rot, inv_i_local)

    # --- updateVehicleFirst: raycasts + stale friction impulses.
    # Rays also hit the ball and other (alive) cars — the reference's
    # suspension-grid dynamic-object overlay (Arena.cpp:733-750), so a car
    # can drive on the ball or on another car's roof.
    ray_ball = ball if params.dynamic_wheel_rays else None
    rc = carmod.wheel_raycasts(cars, cfg, mut, dt, inv_iw,
                               params.game_mode, grid=grid, ball=ray_ball,
                               alive=alive)
    wheel_impulses = carmod.calc_friction_impulses(cars, rc, wc, mut, dt,
                                                   inv_iw, ball=ray_ball)

    num_contact = jnp.sum(rc.is_in_contact, axis=1)
    cars = cars.replace(wheels_with_contact=rc.is_in_contact,
                        is_on_ground=num_contact >= 3)

    jump_pressed = (controls[:, JUMP] > 0) & ~(cars.last_controls[:, JUMP] > 0)
    fwd_speed = m.dot(cars.vel, cars.forward)

    # --- _UpdateWheels
    new_wc, hb_val, sticky_accel, real_throttle = carmod.update_wheels(
        cars, rc, wc, controls, fwd_speed, dt)
    cars = cars.replace(handbrake_val=hb_val)

    # --- air torque / flipping clear (Car.cpp:111-115)
    air_mask = num_contact < 3
    zero_wheels = num_contact == 0
    air_ang_accel, air_accel, is_flipping = carmod.update_air_torque(
        cars, controls, air_mask, zero_wheels, dt)
    cars = cars.replace(is_flipping=jnp.where(air_mask, is_flipping, False))

    # --- jump
    jump_updates, jump_dv, jump_accel = carmod.update_jump(
        cars, controls, jump_pressed, mut, dt)
    cars = cars.replace(vel=cars.vel + jump_dv, **jump_updates)

    # --- auto flip
    af_updates, af_dv, af_dw = carmod.update_auto_flip(cars, controls,
                                                       jump_pressed, dt)
    cars = cars.replace(vel=cars.vel + af_dv, ang_vel=cars.ang_vel + af_dw,
                        **af_updates)

    # --- double jump / flip
    dj_updates, dj_dv, zdamp_maybe, zdamp_always = \
        carmod.update_double_jump_or_flip(
            cars, controls, jump_pressed, fwd_speed, cfg, mut, dt,
            cars.is_jumping, cars.has_jumped, cars.jump_time,
            cars.is_flipping)
    vel = cars.vel + dj_dv
    # Flip z-damping (Car.cpp:749-755)
    do_damp = zdamp_always | (zdamp_maybe & (vel[:, 2] < 0))
    damp_factor = (1.0 - C.FLIP_Z_DAMP_120) ** (dt * 120.0)
    vel = vel.at[:, 2].multiply(jnp.where(do_damp, damp_factor, 1.0))
    cars = cars.replace(vel=vel, **dj_updates)

    # --- auto roll (Car.cpp:122-123)
    ar_cond = (controls[:, THROTTLE] != 0) & (
        ((num_contact > 0) & (num_contact < 4)) | cars.has_world_contact)
    ar_accel, ar_ang_accel = carmod.update_auto_roll(cars, rc, controls,
                                                     num_contact)
    ar_accel = jnp.where(ar_cond[:, None], ar_accel, 0.0)
    ar_ang_accel = jnp.where(ar_cond[:, None], ar_ang_accel, 0.0)

    # worldContact cleared after use (Car.cpp:125)
    cars = cars.replace(has_world_contact=jnp.zeros_like(alive))

    # --- updateVehicleSecond: suspension + friction application
    vel, ang_vel = carmod.apply_suspension(cars, rc, cfg, mut, dt, inv_iw)
    cars = cars.replace(vel=vel, ang_vel=ang_vel)
    vel, ang_vel = carmod.apply_friction_impulses(cars, rc, wheel_impulses,
                                                  dt, mut, inv_iw)
    cars = cars.replace(vel=vel, ang_vel=ang_vel)

    # --- boost
    boost_updates, boost_accel = carmod.update_boost(cars, controls, mut, dt)
    cars = cars.replace(**boost_updates)

    # --- boost pad pre-tick (BoostPad.cpp:52-60)
    pads = arena.pads
    cooldown = jnp.maximum(pads.cooldown - dt, 0.0)
    pads = pads.replace(cooldown=cooldown, is_active=cooldown == 0.0)

    # =======================================================================
    # World step (bullet stepSimulation)

    gravity = jnp.array([0.0, 0.0, mut.gravity_z])

    # Pre-force velocities: bullet defers forces (gravity/boost/sticky/...)
    # into the solver's externalForceImpulse; restitution and the contact
    # callbacks read velocities WITHOUT them (see contacts.py docstrings)
    cars_vel_pre = cars.vel
    cars_ang_vel_pre = cars.ang_vel

    total_accel = (gravity[None, :] + sticky_accel + air_accel + jump_accel
                   + ar_accel + boost_accel)
    total_ang_accel = air_ang_accel + ar_ang_accel
    cars = cars.replace(vel=cars.vel + total_accel * dt,
                        ang_vel=cars.ang_vel + total_ang_accel * dt)

    # Ball pre-tick (Ball::_PreTickUpdate, Ball.cpp:152-201)
    if params.game_mode == "heatseeker":
        ball = _heatseeker_steer(ball, dt)

    # Ball: sleeping + gravity + drag (Arena.cpp:721-727, Ball.cpp:95-98)
    ball_awake = (m.norm(ball.vel) > 0) | (m.norm(ball.ang_vel) > 0)
    ball_vel_pre = ball.vel
    drag = (1.0 - mut.ball_drag) ** dt
    ball = ball.replace(vel=jnp.where(ball_awake,
                                      (ball.vel + gravity * dt) * drag,
                                      ball.vel))

    # --- contacts (rotations unchanged so inv_iw is still valid)
    if grid is not None:
        cw_dv, cw_dw, cw_push, cw_turn, cw_contact, cw_normal = \
            contacts.resolve_car_world_mesh(
                cars, half_extents, hitbox_offset, mut, inv_iw, grid, dt,
                params.game_mode, vel_pre_uu=cars_vel_pre,
                ang_vel_pre=cars_ang_vel_pre)
    else:
        cw_dv, cw_dw, cw_push, cw_contact, cw_normal = \
            contacts.resolve_car_world(
                cars, half_extents, hitbox_offset, mut, inv_iw,
                params.game_mode, vel_pre_uu=cars_vel_pre,
                ang_vel_pre=cars_ang_vel_pre)
        cw_turn = None
    cars = cars.replace(
        vel=cars.vel + cw_dv,
        ang_vel=cars.ang_vel + cw_dw,
        has_world_contact=cw_contact,
        world_contact_normal=jnp.where(cw_contact[:, None], cw_normal,
                                       cars.world_contact_normal))

    # car-ball (+psyonix impulse cache); demoed cars have no contact
    # response so their ball-side effects are masked by `alive`
    cb_car_dv, cb_car_dw, cb_ball_dv, cb_ball_dw, ball_cache_dv, \
        hit_updates, ball_touched = contacts.resolve_car_ball(
            cars, ball, arena.tick_count, half_extents, hitbox_offset, mut,
            inv_iw, alive, params.game_mode,
            cars_vel_pre=cars_vel_pre, ball_vel_pre=ball_vel_pre)
    cars = cars.replace(vel=cars.vel + cb_car_dv,
                        ang_vel=cars.ang_vel + cb_car_dw, **hit_updates)
    ball = ball.replace(vel=ball.vel + cb_ball_dv,
                        ang_vel=ball.ang_vel + cb_ball_dw)

    # Ball::_OnHit (heatseeker target/speedup, Ball.cpp:203-216)
    if params.game_mode == "heatseeker":
        ball = _heatseeker_on_hit(ball, ball_touched & alive, teams, dt)

    # ball-world (merged special contact)
    puck_axis = ball.rot[:, 2] if params.game_mode == "snowday" else None
    bw_dv, bw_dw, bw_push, bw_touch, bw_normal = contacts.resolve_ball_world(
        ball, mut, puck_axis, params.game_mode, vel_pre_uu=ball_vel_pre,
        grid=grid)
    ball = ball.replace(vel=ball.vel + bw_dv, ang_vel=ball.ang_vel + bw_dw)

    # Ball::_OnWorldCollision (Ball.cpp:218-252)
    if params.game_mode == "heatseeker":
        ball, hs_bounce_dv = _heatseeker_wall_bounce(ball, bw_touch,
                                                     bw_normal)
        ball_cache_dv = ball_cache_dv + hs_bounce_dv
    elif params.game_mode == "snowday":
        # Puck ground stick: central force -normal * 70 (BT), once per tick
        stick_dv = jnp.where(
            bw_touch, -bw_normal * (C.Snowday.PUCK_GROUND_STICK_FORCE
                                    / mut.ball_mass * dt * C.BT_TO_UU),
            jnp.zeros(3))
        ball = ball.replace(vel=ball.vel + stick_dv)

    # car-car (+bump/demo); masks demoed cars internally
    if num_cars > 1:
        cc_dv, cc_dw, cc_push, cc_turn, cc_cache_dv, got_demoed, bumped, \
            demo_mat, cc_updates = contacts.car_car_interactions(
                cars, teams, half_extents, hitbox_offset, mut, inv_iw,
                vel_pre=cars_vel_pre, dt=dt)
        cars = cars.replace(vel=cars.vel + cc_dv,
                            ang_vel=cars.ang_vel + cc_dw, **cc_updates)
        # Demolish (Car.cpp:38-41)
        cars = cars.replace(
            is_demoed=cars.is_demoed | got_demoed,
            demo_respawn_timer=jnp.where(got_demoed, mut.respawn_delay,
                                         cars.demo_respawn_timer))
    else:
        cc_push = jnp.zeros_like(cars.vel)
        cc_turn = None
        cc_cache_dv = jnp.zeros_like(cars.vel)
        bumped = jnp.zeros((num_cars, num_cars), bool)
        demo_mat = jnp.zeros((num_cars, num_cars), bool)
        got_demoed = jnp.zeros((num_cars,), bool)

    # --- integrate transforms
    new_rot = m.integrate_rotation(cars.rot, cars.ang_vel, dt)
    if cw_turn is not None:
        # split-impulse turn pseudo-velocity writeback (scaled by
        # splitImpulseTurnErp inside the solver)
        new_rot = m.integrate_rotation(new_rot, cw_turn, 1.0)
    if cc_turn is not None:
        new_rot = m.integrate_rotation(new_rot, cc_turn, 1.0)
    cars = cars.replace(
        pos=cars.pos + cars.vel * dt + cw_push + cc_push,
        rot=new_rot)
    ball_awake = (m.norm(ball.vel) > 0) | (m.norm(ball.ang_vel) > 0)
    ball = ball.replace(
        pos=ball.pos + jnp.where(ball_awake, ball.vel * dt + bw_push, 0.0),
        rot=jnp.where(ball_awake,
                      m.integrate_rotation(ball.rot, ball.ang_vel, dt),
                      ball.rot))

    # =======================================================================
    # Post-tick (Car.cpp:133-163) + finish (Car.cpp:165-193)

    speed_sq = jnp.sum(cars.vel ** 2, axis=-1)
    maintain = cars.is_supersonic & (
        cars.supersonic_time < C.SUPERSONIC_MAINTAIN_MAX_TIME)
    thresh = jnp.where(maintain, C.SUPERSONIC_MAINTAIN_MIN_SPEED,
                       C.SUPERSONIC_START_SPEED)
    is_ss = speed_sq >= thresh ** 2
    cars = cars.replace(
        is_supersonic=is_ss,
        supersonic_time=jnp.where(is_ss, cars.supersonic_time + dt, 0.0),
        car_contact_cooldown=jnp.maximum(cars.car_contact_cooldown - dt,
                                         0.0),
        last_controls=controls)

    # Finish: bump velocity cache + clamps
    cars = cars.replace(
        vel=m.clamp_norm(cars.vel + cc_cache_dv, C.CAR_MAX_SPEED),
        ang_vel=m.clamp_norm(cars.ang_vel, C.CAR_MAX_ANG_SPEED))

    # Ball finish (Ball.cpp:113-137): psyonix cache + clamps
    ball = ball.replace(
        vel=m.clamp_norm(ball.vel + ball_cache_dv, mut.ball_max_speed),
        ang_vel=m.clamp_norm(ball.ang_vel, C.BALL_MAX_ANG_SPEED))

    # --- restore frozen state for cars demoed at tick start (the single
    # alive-select; reference disables their simulation entirely)
    def _sel(upd, froz):
        return jnp.where(jnp.reshape(alive, alive.shape
                                     + (1,) * (upd.ndim - 1)), upd, froz)

    cars = jax.tree.map(_sel, cars, frozen_cars)
    new_wc = jax.tree.map(_sel, new_wc, frozen_wc)
    ball_touched = ball_touched & alive

    # --- boost pad pickup (BoostPad.cpp:62-105)
    pads, cars = _pads_check_and_pickup(pads, cars, alive, half_extents,
                                        hitbox_offset, mut,
                                        params.game_mode)

    if params.game_mode == "hoops":
        goal = _is_ball_scored_hoops(ball.pos)
    else:
        goal = geom.is_ball_scored(ball.pos, mut.ball_radius,
                                   mut.goal_base_threshold_y)

    # Event latches: bump/demo vs the opposing team only (EnvSet.cpp:31-42)
    opp = teams[:, None] != teams[None, :]
    bump_opp = bumped & opp  # (C, C): i bumped j
    demo_opp = demo_mat & opp
    arena = arena.replace(
        cars=cars, ball=ball, pads=pads,
        tick_count=arena.tick_count + 1,
        goal_scored=arena.goal_scored | goal,
        step_bump=arena.step_bump | jnp.any(bump_opp, axis=1),
        step_bumped=arena.step_bumped | jnp.any(bump_opp, axis=0),
        step_demo=arena.step_demo | jnp.any(demo_opp, axis=1),
        step_demoed=arena.step_demoed | jnp.any(demo_opp, axis=0))
    return PhysicsState(arena=arena, wheels=new_wc)


def _wrap(x, minmax):
    """Math::WrapNormalizeFloat (Math.cpp:66-73)."""
    r = jnp.fmod(x, minmax * 2)
    r = jnp.where(r > minmax, r - minmax * 2, r)
    return jnp.where(r < -minmax, r + minmax * 2, r)


def _round_angle_ue3(ang):
    """Math::RoundAngleUE3 (Math.cpp:75-88): UE3 rotator quantization."""
    to_ints = float(1 << 15) / jnp.pi
    back = (1.0 / to_ints) * 4.0
    r = (ang * to_ints).astype(jnp.int32) >> 2
    return (r & (0x4000 - 1)).astype(jnp.float32) * back


def _heatseeker_steer(ball: BallState, dt: float) -> BallState:
    """Ball::_PreTickUpdate heatseeker branch (Ball.cpp:153-200): rotate
    the velocity toward the target goal point and blend the speed."""
    HS = C.Heatseeker
    ytd = ball.hs_y_target_dir
    active = ytd != 0

    vel = ball.vel
    speed = m.norm(vel)
    d2 = jnp.sqrt(vel[0] ** 2 + vel[1] ** 2)
    v_yaw = jnp.arctan2(vel[1], vel[0])
    v_pitch = jnp.arctan2(vel[2], d2)

    target = jnp.array([0.0, 1.0, 0.0]) * (HS.TARGET_Y * ytd) + jnp.array(
        [0.0, 0.0, HS.TARGET_Z])
    to_goal = target - ball.pos
    g_d2 = jnp.sqrt(to_goal[0] ** 2 + to_goal[1] ** 2)
    g_yaw = jnp.arctan2(to_goal[1], to_goal[0])
    g_pitch = jnp.arctan2(to_goal[2], g_d2)

    # Angle::GetDeltaTo wraps yaw to +-pi and pitch to +-pi/2
    d_yaw = _wrap(g_yaw - v_yaw, jnp.pi)
    d_pitch = _wrap(g_pitch - v_pitch, jnp.pi / 2)

    f = (speed / HS.MAX_SPEED) * dt
    new_yaw = v_yaw + d_yaw * f * HS.HORIZONTAL_BLEND
    new_pitch = v_pitch + d_pitch * f * HS.VERTICAL_BLEND
    new_yaw = _wrap(new_yaw, jnp.pi)
    new_pitch = jnp.clip(_wrap(new_pitch, jnp.pi / 2),
                         -HS.MAX_TURN_PITCH, HS.MAX_TURN_PITCH)
    new_yaw = _round_angle_ue3(new_yaw)
    new_pitch = _round_angle_ue3(new_pitch)

    new_speed = speed + (ball.hs_target_speed - speed) * HS.SPEED_BLEND
    cp, sp = jnp.cos(new_pitch), jnp.sin(new_pitch)
    new_vel = jnp.array(1.0) * jnp.stack(
        [cp * jnp.cos(new_yaw), cp * jnp.sin(new_yaw), sp]) * new_speed

    return ball.replace(
        vel=jnp.where(active, new_vel, ball.vel),
        hs_time_since_hit=jnp.where(active,
                                    ball.hs_time_since_hit + dt,
                                    ball.hs_time_since_hit))


def _heatseeker_on_hit(ball: BallState, touched, teams, dt: float
                       ) -> BallState:
    """Ball::_OnHit heatseeker branch (Ball.cpp:204-216).  The reference
    fires _OnHit once PER touching car in index order, each call reading
    the previous call's dir/speed/timer writes — folded sequentially
    here so same-tick opposite-team touches sequence identically."""
    HS = C.Heatseeker
    n = touched.shape[0]
    ytd = ball.hs_y_target_dir
    speed = ball.hs_target_speed
    tsince = ball.hs_time_since_hit
    for c in range(n):
        t = touched[c]
        new_dir = jnp.where(teams[c] == 0, 1.0, -1.0)
        can_increase = (tsince > HS.MIN_SPEEDUP_INTERVAL) | (ytd == 0)
        sp = t & can_increase & (new_dir != ytd)
        ytd = jnp.where(t, new_dir, ytd)
        speed = jnp.where(
            sp, jnp.minimum(speed + HS.TARGET_SPEED_INCREMENT,
                            HS.MAX_SPEED), speed)
        tsince = jnp.where(sp, 0.0, tsince)
    return ball.replace(hs_time_since_hit=tsince,
                        hs_target_speed=speed,
                        hs_y_target_dir=ytd)


def _heatseeker_wall_bounce(ball: BallState, touching, normal):
    """Ball::_OnWorldCollision heatseeker branch (Ball.cpp:220-246): deep
    backwall hits flip the target and add a goal-ward bounce impulse (into
    the velocity cache).  Returns (ball, cache_dv)."""
    HS = C.Heatseeker
    ytd = ball.hs_y_target_dir
    rel_normal_y = normal[1] * ytd
    rel_y = ball.pos[1] * ytd
    flip = (touching & (ytd != 0)
            & (rel_normal_y <= -HS.WALL_BOUNCE_CHANGE_Y_NORMAL)
            & (rel_y >= C.ARENA_EXTENT_Y - HS.WALL_BOUNCE_CHANGE_Y_THRESH))
    new_ytd = jnp.where(flip, -ytd, ytd)
    target = jnp.array([0.0, 1.0, 0.0]) * (HS.TARGET_Y * new_ytd) + \
        jnp.array([0.0, 0.0, HS.TARGET_Z])
    dir_to_goal = m.normalize(target - ball.pos)
    bounce_dir = (dir_to_goal * (1.0 - HS.WALL_BOUNCE_UP_FRAC)
                  + jnp.array([0.0, 0.0, 1.0]) * HS.WALL_BOUNCE_UP_FRAC)
    cache_dv = jnp.where(flip,
                         bounce_dir * m.norm(ball.vel)
                         * HS.WALL_BOUNCE_FORCE_SCALE,
                         jnp.zeros(3))
    return ball.replace(hs_y_target_dir=new_ytd), cache_dv


def _is_ball_scored_hoops(ball_pos):
    """Arena::IsBallScored hoops branch (Arena.cpp:958-971): below the rim
    height and within the basket's xy region."""
    below = ball_pos[2] < C.HOOPS_GOAL_SCORE_THRESHOLD_Z
    dy = jnp.abs(ball_pos[1]) * C.HOOPS_GOAL_SCALE_Y - C.HOOPS_GOAL_OFFSET_Y
    dist_sq = ball_pos[0] ** 2 + dy ** 2
    return below & (dist_sq < C.HOOPS_GOAL_RADIUS ** 2)


def _pads_check_and_pickup(pads, cars: CarsState, alive, half_extents,
                           hitbox_offset, mut: MutatorConfig,
                           game_mode: str = "soccar"):
    """Boost pad collision + pickup with the reference's lock hysteresis
    (BoostPad.cpp:62-105): the car that collided with a pad last tick
    (``pads.prev_locked``) keeps it via a pad-box vs car-AABB test; every
    other car must pass the cylinder test on its ORIGIN.  Cars are
    checked in index order and each colliding car overwrites the lock
    (Arena.cpp:783-796), so the HIGHEST colliding index wins the tick's
    pickup; the lock persists even while the pad is on cooldown.
    """
    if game_mode == "hoops":
        locs = jnp.asarray(C.BOOST_PAD_LOCS_HOOPS)   # (20, 3)
        is_big = jnp.asarray(C.BOOST_PAD_IS_BIG_HOOPS)
    else:
        locs = jnp.asarray(C.BOOST_PAD_LOCS_SOCCAR)  # (34, 3)
        is_big = jnp.asarray(C.BOOST_PAD_IS_BIG)
    num_cars = cars.pos.shape[0]
    cyl_rad = jnp.where(is_big, C.BoostPads.CYL_RAD_BIG,
                        C.BoostPads.CYL_RAD_SMALL)

    # cylinder test on the car origin (the non-locked path)
    d2 = jnp.sum((cars.pos[:, None, :2] - locs[None, :, :2]) ** 2, axis=-1)
    dz = jnp.abs(cars.pos[:, None, 2] - locs[None, :, 2])
    cyl_hit = (d2 < (cyl_rad ** 2)[None, :]) & (
        dz < C.BoostPads.CYL_HEIGHT)  # (C, P)

    # AABB test (the locked path): pad box (+-BOX_RAD xy, z in [0, 64])
    # vs the car compound's world AABB — |R| * margin-adjusted extents
    # around the hitbox center (bullet btBoxShape::getAabb semantics)
    from reinforcement_learning_tpu.physics import formulas
    he_m = jnp.asarray(formulas.box_effective_half_extents_bt(
        np.asarray(half_extents, np.float64) * 2.0) * 50.0, jnp.float32)
    box_center = cars.pos + m.rotate(cars.rot, hitbox_offset)
    aabb_half = jnp.einsum('cij,j->ci', jnp.abs(cars.rot), he_m)  # (C, 3)
    car_min = box_center - aabb_half
    car_max = box_center + aabb_half
    box_rad = jnp.where(is_big, C.BoostPads.BOX_RAD_BIG,
                        C.BoostPads.BOX_RAD_SMALL)
    pad_min = jnp.stack([locs[:, 0] - box_rad, locs[:, 1] - box_rad,
                         locs[:, 2]], axis=-1)                   # (P, 3)
    pad_max = jnp.stack([locs[:, 0] + box_rad, locs[:, 1] + box_rad,
                         locs[:, 2] + C.BoostPads.BOX_HEIGHT], axis=-1)
    aabb_hit = jnp.all((pad_max[None] > car_min[:, None])
                       & (pad_min[None] < car_max[:, None]), axis=-1)

    ids = jnp.arange(1, num_cars + 1)                            # (C,)
    locked = pads.prev_locked[None, :] == ids[:, None]           # (C, P)
    colliding = jnp.where(locked, aabb_hit, cyl_hit) & alive[:, None]

    any_collide = jnp.any(colliding, axis=0)                     # (P,)
    # last colliding car in iteration order wins the lock
    winner = num_cars - 1 - jnp.argmax(colliding[::-1], axis=0)  # (P,)
    pickup = any_collide & pads.is_active
    winner_cp = (jax.nn.one_hot(winner, num_cars, dtype=jnp.float32).T
                 * pickup[None, :].astype(jnp.float32))
    amount = jnp.where(is_big, C.BoostPads.BOOST_AMOUNT_BIG,
                       C.BoostPads.BOOST_AMOUNT_SMALL)
    gained = jnp.sum(winner_cp * amount[None, :], axis=1)
    new_boost = jnp.minimum(cars.boost + gained, C.BOOST_MAX)

    cooldown_new = jnp.where(is_big, mut.boost_pad_cooldown_big,
                             mut.boost_pad_cooldown_small)
    pads = pads.replace(
        is_active=pads.is_active & ~pickup,
        cooldown=jnp.where(pickup, cooldown_new, pads.cooldown),
        prev_locked=jnp.where(any_collide, winner + 1, 0))
    cars = cars.replace(boost=new_boost)
    return pads, cars


# ---------------------------------------------------------------------------
# Multi-tick env step with action delay

def arena_step(phys: PhysicsState, new_controls: jnp.ndarray,
               teams: jnp.ndarray, key, params: ArenaParams,
               tick_skip: int = 8, action_delay: int = 7) -> PhysicsState:
    """Step ``tick_skip`` ticks; the first ``action_delay`` ticks run with
    the controls already in the state (the previous action), then
    ``new_controls`` applies (reference: EnvSet::StepFirstHalf /
    StepSecondHalf, EnvSet.cpp:113-156)."""

    def tick_fn(carry, i):
        st, k = carry
        k, sub = jax.random.split(k)
        cars = st.arena.cars
        swap = i == action_delay
        ctrl = jnp.where(swap, new_controls, cars.controls)
        st = st.replace(arena=st.arena.replace(
            cars=cars.replace(controls=ctrl)))
        st = arena_tick(st, teams, sub, params)
        return (st, k), None

    # Clear the per-step latches (EnvSet GameState::ResetBeforeStep)
    phys = phys.replace(arena=phys.arena.replace(
        goal_scored=jnp.zeros_like(phys.arena.goal_scored),
        step_bump=jnp.zeros_like(phys.arena.step_bump),
        step_bumped=jnp.zeros_like(phys.arena.step_bumped),
        step_demo=jnp.zeros_like(phys.arena.step_demo),
        step_demoed=jnp.zeros_like(phys.arena.step_demoed)))
    (phys, _), _ = jax.lax.scan(tick_fn, (phys, key),
                                jnp.arange(tick_skip))
    return phys
