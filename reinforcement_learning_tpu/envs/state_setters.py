"""State setters: episode-reset state distributions.

Reference: RLGymCPP/StateSetters/ + Arena::ResetToRandomKickoff
(Arena.cpp:112-216).  Each setter is ``fn(key, params, teams) ->
PhysicsState`` for one arena, keyed by an explicit per-env PRNG (the one
deliberate improvement over the reference's single global engine,
Math.h:22 — see SURVEY §4.6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu import maths as m
from reinforcement_learning_tpu.physics import step as stepmod
from reinforcement_learning_tpu.physics.state import MutatorConfig


def _kickoff_positions(key, teams, fuzz: float = 0.0,
                       game_mode: str = "soccar"):
    """Car kickoff placement (Arena.cpp:112-193): shuffle the spawn slots,
    assign the i-th car of each team to shuffled slot i, mirrored for
    orange.  Returns (pos (Cn,3), yaw (Cn,))."""
    num_cars = teams.shape[0]
    kshuf, kfuzz = jax.random.split(key)
    if game_mode == "heatseeker":
        n_slots = C.CAR_SPAWN_LOCATION_AMOUNT_HEATSEEKER
        table = jnp.asarray(C.CAR_SPAWN_LOCATIONS_HEATSEEKER)
    elif game_mode == "hoops":
        n_slots = C.CAR_SPAWN_LOCATION_AMOUNT
        table = jnp.asarray(C.CAR_SPAWN_LOCATIONS_HOOPS)
    else:
        n_slots = C.CAR_SPAWN_LOCATION_AMOUNT
        table = jnp.asarray(C.CAR_SPAWN_LOCATIONS_SOCCAR)
    order = jax.random.permutation(kshuf, n_slots)

    # i-th car within its team (stable order, like the reference lists)
    team_rank = jnp.cumsum(jnp.ones_like(teams)) - 1
    blue_rank = jnp.cumsum((teams == 0).astype(jnp.int32)) - 1
    orange_rank = jnp.cumsum((teams == 1).astype(jnp.int32)) - 1
    rank = jnp.where(teams == 0, blue_rank, orange_rank)
    rank = jnp.minimum(rank, n_slots - 1)

    slot = order[rank]
    spawn = table[slot]  # (Cn, 3): x, y, yaw
    sign = jnp.where(teams == 0, 1.0, -1.0)
    pos = jnp.stack([spawn[:, 0] * sign, spawn[:, 1] * sign,
                     jnp.full((num_cars,), C.CAR_SPAWN_REST_Z)], axis=-1)
    yaw = spawn[:, 2] + jnp.where(teams == 0, 0.0, jnp.pi)
    if fuzz > 0:
        pos = pos + jax.random.uniform(kfuzz, pos.shape, minval=-fuzz,
                                       maxval=fuzz)
    return pos, yaw


def kickoff_state(fuzz: float = 0.0):
    """KickoffState (StateSetters/KickoffState.h) /
    FuzzedKickoffState (fuzz=0.1)."""
    def fn(key, params: stepmod.ArenaParams, teams) -> stepmod.PhysicsState:
        phys = stepmod.make_physics_state(params)
        kcars, kball = jax.random.split(key)
        pos, yaw = _kickoff_positions(kcars, teams, fuzz, params.game_mode)
        cars = phys.arena.cars.replace(
            pos=pos, rot=m.euler_to_rotmat(yaw),
            boost=jnp.full(teams.shape,
                           params.mutators.car_spawn_boost_amount,
                           jnp.float32))
        ball = phys.arena.ball
        # Mode-specific kickoff ball state (Arena.cpp:196-208)
        if params.game_mode == "heatseeker":
            side = jnp.where(jax.random.bernoulli(kball), 1.0, -1.0)
            scale = jnp.stack([jnp.ones(()), side, jnp.ones(())])
            ball = ball.replace(
                pos=jnp.asarray(C.Heatseeker.BALL_START_POS) * scale,
                vel=jnp.asarray(C.Heatseeker.BALL_START_VEL) * scale)
        elif params.game_mode == "snowday":
            # don't freeze (FLT_EPSILON z vel keeps the puck awake)
            ball = ball.replace(vel=jnp.array([0.0, 0.0, 1.19e-7]))
        elif params.game_mode == "hoops":
            ball = ball.replace(vel=jnp.array([0.0, 0.0,
                                               C.BALL_HOOPS_Z_VEL]))
        return phys.replace(arena=phys.arena.replace(cars=cars, ball=ball))
    fn.__name__ = "KickoffState" if fuzz == 0 else "FuzzedKickoffState"
    return fn


def random_state(cars_on_ground_only: bool = False,
                 rand_ball_speed: bool = True,
                 rand_car_speed: bool = True):
    """RandomState (RandomState.cpp:11-62)."""
    X_MAX, Y_MAX, Z_MAX, CAR_Z_MIN = 3500.0, 4000.0, 1820.0, 150.0

    def fn(key, params: stepmod.ArenaParams, teams) -> stepmod.PhysicsState:
        phys = stepmod.make_physics_state(params)
        n = teams.shape[0]
        keys = jax.random.split(key, 12)

        bpos = jax.random.uniform(
            keys[0], (3,),
            minval=jnp.array([-X_MAX, -Y_MAX, 92.75]),
            maxval=jnp.array([X_MAX, Y_MAX, Z_MAX]))
        ball = phys.arena.ball.replace(pos=bpos)
        if rand_ball_speed:
            bdir = m.normalize(jax.random.uniform(keys[1], (3,), minval=-1,
                                                  maxval=1))
            bspeed = jax.random.uniform(keys[2], (), maxval=4000.0)
            bang = jax.random.uniform(keys[3], (3,), minval=-4.0, maxval=4.0)
            ball = ball.replace(vel=bdir * bspeed, ang_vel=bang)

        cpos = jax.random.uniform(
            keys[4], (n, 3),
            minval=jnp.array([-X_MAX, -Y_MAX, CAR_Z_MIN]),
            maxval=jnp.array([X_MAX, Y_MAX, Z_MAX]))
        yaw = jax.random.uniform(keys[5], (n,), minval=-jnp.pi, maxval=jnp.pi)
        pitch = jax.random.uniform(keys[6], (n,), minval=-jnp.pi / 2,
                                   maxval=jnp.pi / 2)
        roll = jax.random.uniform(keys[7], (n,), minval=-jnp.pi,
                                  maxval=jnp.pi)
        vel = jnp.zeros((n, 3))
        ang_vel = jnp.zeros((n, 3))
        if rand_car_speed:
            vdir = m.normalize(jax.random.uniform(keys[8], (n, 3), minval=-1,
                                                  maxval=1))
            speed = jax.random.uniform(keys[9], (n, 1),
                                       maxval=C.CAR_MAX_SPEED)
            vel = vdir * speed
            adir = m.normalize(jax.random.uniform(keys[10], (n, 3),
                                                  minval=-1, maxval=1))
            ang_vel = adir * C.CAR_MAX_ANG_SPEED

        if cars_on_ground_only:
            on_ground = jnp.ones((n,), bool)
        else:
            on_ground = jax.random.uniform(keys[11], (n,)) > 0.5
        cpos = cpos.at[:, 2].set(jnp.where(on_ground, 17.0, cpos[:, 2]))
        pitch = jnp.where(on_ground, 0.0, pitch)
        roll = jnp.where(on_ground, 0.0, roll)
        vel = vel.at[:, 2].set(jnp.where(on_ground, 0.0, vel[:, 2]))
        ang_vel = jnp.where(on_ground[:, None], 0.0, ang_vel)

        kb = jax.random.fold_in(keys[11], 1)
        boost = jax.random.uniform(kb, (n,), maxval=100.0)

        cars = phys.arena.cars.replace(
            pos=cpos, rot=m.euler_to_rotmat(yaw, pitch, roll), vel=vel,
            ang_vel=ang_vel, boost=boost,
            is_on_ground=on_ground)
        return phys.replace(arena=phys.arena.replace(ball=ball, cars=cars))
    fn.__name__ = "RandomState"
    return fn


def combined_state(setters_and_weights):
    """CombinedState (CombinedState.h:10-49): weighted random choice of
    child setters per reset."""
    setters = [s for s, _ in setters_and_weights]
    weights = jnp.array([w for _, w in setters_and_weights])
    probs = weights / jnp.sum(weights)

    def fn(key, params, teams) -> stepmod.PhysicsState:
        kpick, kchild = jax.random.split(key)
        idx = jax.random.choice(kpick, len(setters), p=probs)
        states = [s(kchild, params, teams) for s in setters]
        return jax.tree.map(lambda *xs: jnp.select(
            [idx == i for i in range(len(xs))], list(xs)), *states)
    fn.__name__ = "CombinedState"
    return fn
