"""Layout conversion: batched PhysicsState pytree <-> component state dict.

The env layer stores state as ``PhysicsState`` pytrees with a leading env
axis ``(E, C, ...)`` (trailing xyz axes).  The kernel path (ops/ctick)
wants car-slot-leading component arrays ``(C,) + S`` with the env axis
tiled into ``S`` (e.g. ``(E//128, 128)`` for full VPU lanes).  These
transposes happen once per env step (not per tick) and fuse into a handful
of XLA kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

from reinforcement_learning_tpu.physics.car import WheelControlsState
from reinforcement_learning_tpu.physics.state import (ArenaState, BallState,
                                                      CarsState, PadsState)
from reinforcement_learning_tpu.physics.step import PhysicsState

# Field groups (must match state.CarsState / ops/ctick expectations)
CAR_SCALARS_F32 = (
    'jump_time', 'flip_time', 'air_time', 'air_time_since_jump', 'boost',
    'time_spent_boosting', 'supersonic_time', 'handbrake_val',
    'auto_flip_timer', 'auto_flip_torque_scale', 'car_contact_cooldown',
    'demo_respawn_timer')
CAR_BOOLS = (
    'is_on_ground', 'has_jumped', 'has_double_jumped', 'has_flipped',
    'is_flipping', 'is_jumping', 'is_supersonic', 'is_auto_flipping',
    'has_world_contact', 'is_demoed', 'ball_hit_valid')
CAR_VECS = (
    'pos', 'vel', 'ang_vel', 'flip_rel_torque', 'world_contact_normal',
    'ball_hit_rel_pos', 'ball_hit_ball_pos', 'ball_hit_extra_vel')
CAR_INTS = ('car_contact_other_id', 'ball_hit_tick',
            'ball_hit_extra_impulse_tick')


def _to_S(a, S):
    """(E,) trailing-env array -> S."""
    return a.reshape(S)


def _car_to_S(a, S):
    """(E, C) -> (C,) + S."""
    return jnp.swapaxes(a, 0, 1).reshape((a.shape[1],) + S)


def to_components(phys: PhysicsState, S=None) -> dict:
    """Batched PhysicsState (leading env axis E) -> component dict with env
    shape S (default ``(E,)``)."""
    arena = phys.arena
    cars = arena.cars
    E, C = cars.pos.shape[:2]
    if S is None:
        S = (E,)

    d = {}
    for f in CAR_SCALARS_F32 + CAR_BOOLS + CAR_INTS:
        d[f] = _car_to_S(getattr(cars, f), S)
    for f in CAR_VECS:
        a = getattr(cars, f)
        d[f] = tuple(_car_to_S(a[..., i], S) for i in range(3))
    d['rot'] = tuple(tuple(_car_to_S(cars.rot[..., i, j], S)
                           for j in range(3)) for i in range(3))
    d['wheels_with_contact'] = [
        _car_to_S(cars.wheels_with_contact[..., w], S) for w in range(4)]
    d['last_controls'] = tuple(_car_to_S(cars.last_controls[..., c], S)
                               for c in range(8))
    d['controls'] = tuple(_car_to_S(cars.controls[..., c], S)
                          for c in range(8))

    wc = phys.wheels
    d['wc'] = dict(
        steer_angle=_car_to_S(wc.steer_angle, S),
        engine_force=_car_to_S(wc.engine_force, S),
        brake=_car_to_S(wc.brake, S),
        lat_friction=[_car_to_S(wc.lat_friction[..., w], S)
                      for w in range(4)],
        long_friction=[_car_to_S(wc.long_friction[..., w], S)
                       for w in range(4)])

    ball = arena.ball
    d['ball_pos'] = tuple(_to_S(ball.pos[..., i], S) for i in range(3))
    d['ball_vel'] = tuple(_to_S(ball.vel[..., i], S) for i in range(3))
    d['ball_ang_vel'] = tuple(_to_S(ball.ang_vel[..., i], S)
                              for i in range(3))
    d['ball_rot'] = tuple(tuple(_to_S(ball.rot[..., i, j], S)
                                for j in range(3)) for i in range(3))
    # Heatseeker scalars ride along untouched (the megakernel is
    # soccar-only; the XLA path owns the other game modes)
    d['ball_hs'] = (_to_S(ball.hs_y_target_dir, S),
                    _to_S(ball.hs_target_speed, S),
                    _to_S(ball.hs_time_since_hit, S))

    pads = arena.pads
    d['pads_active'] = jnp.swapaxes(pads.is_active, 0, 1).reshape(
        (pads.is_active.shape[1],) + S)
    d['pads_cooldown'] = jnp.swapaxes(pads.cooldown, 0, 1).reshape(
        (pads.cooldown.shape[1],) + S)
    d['pads_locked'] = jnp.swapaxes(pads.prev_locked, 0, 1).reshape(
        (pads.prev_locked.shape[1],) + S)

    d['tick_count'] = _to_S(arena.tick_count, S)
    d['goal_scored'] = _to_S(arena.goal_scored, S)
    for f in ('step_bump', 'step_bumped', 'step_demo', 'step_demoed'):
        d[f] = _car_to_S(getattr(arena, f), S)
    return d


def _from_S(a, E):
    return a.reshape((E,))


def _car_from_S(a, E):
    C = a.shape[0]
    return jnp.swapaxes(a.reshape((C, E)), 0, 1)


def from_components(d: dict, E: int) -> PhysicsState:
    """Inverse of to_components."""
    def vec(t):
        return jnp.stack([_car_from_S(c, E) for c in t], axis=-1)

    def mat(t):
        return jnp.stack(
            [jnp.stack([_car_from_S(t[i][j], E) for j in range(3)], axis=-1)
             for i in range(3)], axis=-2)

    kw = {}
    for f in CAR_SCALARS_F32 + CAR_BOOLS + CAR_INTS:
        kw[f] = _car_from_S(d[f], E)
    for f in CAR_VECS:
        kw[f] = vec(d[f])
    kw['rot'] = mat(d['rot'])
    kw['wheels_with_contact'] = jnp.stack(
        [_car_from_S(w, E) for w in d['wheels_with_contact']], axis=-1)
    kw['last_controls'] = jnp.stack(
        [_car_from_S(c, E) for c in d['last_controls']], axis=-1)
    kw['controls'] = jnp.stack(
        [_car_from_S(c, E) for c in d['controls']], axis=-1)
    cars = CarsState(**kw)

    ball = BallState(
        pos=jnp.stack([_from_S(c, E) for c in d['ball_pos']], axis=-1),
        rot=jnp.stack(
            [jnp.stack([_from_S(d['ball_rot'][i][j], E) for j in range(3)],
                       axis=-1) for i in range(3)], axis=-2),
        vel=jnp.stack([_from_S(c, E) for c in d['ball_vel']], axis=-1),
        ang_vel=jnp.stack([_from_S(c, E) for c in d['ball_ang_vel']],
                          axis=-1),
        hs_y_target_dir=_from_S(d['ball_hs'][0], E),
        hs_target_speed=_from_S(d['ball_hs'][1], E),
        hs_time_since_hit=_from_S(d['ball_hs'][2], E))

    P = d['pads_active'].shape[0]
    pads = PadsState(
        is_active=jnp.swapaxes(d['pads_active'].reshape((P, E)), 0, 1),
        cooldown=jnp.swapaxes(d['pads_cooldown'].reshape((P, E)), 0, 1),
        prev_locked=jnp.swapaxes(d['pads_locked'].reshape((P, E)), 0, 1))

    arena = ArenaState(
        cars=cars, ball=ball, pads=pads,
        tick_count=_from_S(d['tick_count'], E),
        goal_scored=_from_S(d['goal_scored'], E),
        step_bump=_car_from_S(d['step_bump'], E),
        step_bumped=_car_from_S(d['step_bumped'], E),
        step_demo=_car_from_S(d['step_demo'], E),
        step_demoed=_car_from_S(d['step_demoed'], E))

    wcd = d['wc']
    wheels = WheelControlsState(
        steer_angle=_car_from_S(wcd['steer_angle'], E),
        engine_force=_car_from_S(wcd['engine_force'], E),
        brake=_car_from_S(wcd['brake'], E),
        lat_friction=jnp.stack(
            [_car_from_S(w, E) for w in wcd['lat_friction']], axis=-1),
        long_friction=jnp.stack(
            [_car_from_S(w, E) for w in wcd['long_friction']], axis=-1))

    return PhysicsState(arena=arena, wheels=wheels)
