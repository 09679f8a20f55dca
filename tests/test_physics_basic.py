"""Basic physics sanity: resting states, gravity, driving, jumping,
boost, ball bounce — the behaviors the reference guarantees by
construction (RLConst.h values + Car.cpp/Ball.cpp state machines).

All tests share ONE compiled rollout program (compile is expensive on the
tiny test CPU): a 240-tick scan that records a small trajectory summary.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu import maths as m
from reinforcement_learning_tpu.physics import step as stepmod
from reinforcement_learning_tpu.physics.state import (BOOST, JUMP, STEER,
                                                      THROTTLE)

PARAMS = stepmod.ArenaParams(num_cars=1)
TEAMS = jnp.zeros((1,), jnp.int32)
N_TICKS = 240


@jax.jit
def _rollout(phys, controls):
    """240 ticks with fixed controls; returns (final, per-tick traj dict)."""
    phys = phys.replace(arena=phys.arena.replace(
        cars=phys.arena.cars.replace(
            controls=jnp.broadcast_to(controls,
                                      phys.arena.cars.controls.shape))))

    def tick(carry, _):
        st, k = carry
        k, sub = jax.random.split(k)
        st = stepmod.arena_tick(st, TEAMS, sub, PARAMS)
        out = dict(car_pos=st.arena.cars.pos[0],
                   car_vel=st.arena.cars.vel[0],
                   ball_pos=st.arena.ball.pos,
                   ball_vel=st.arena.ball.vel,
                   on_ground=st.arena.cars.is_on_ground[0])
        return (st, k), out

    (phys, _), traj = jax.lax.scan(tick, (phys, jax.random.PRNGKey(0)),
                                   None, length=N_TICKS)
    return phys, traj


def rollout(phys, controls=None):
    c = jnp.zeros(8, jnp.float32) if controls is None else jnp.asarray(
        controls, jnp.float32)
    phys, traj = _rollout(phys, c)
    return jax.device_get(phys), jax.device_get(traj)


def fresh():
    """Default state with the car moved off the ball spawn point (a car at
    the origin overlaps the resting ball)."""
    phys = stepmod.make_physics_state(PARAMS)
    cars = phys.arena.cars.replace(
        pos=phys.arena.cars.pos + jnp.array([[-1000.0, 0.0, 0.0]]))
    return phys.replace(arena=phys.arena.replace(cars=cars))


def ctrl(**kw):
    c = np.zeros(8, np.float32)
    idx = dict(throttle=THROTTLE, steer=STEER, jump=JUMP, boost=BOOST)
    for k, v in kw.items():
        c[idx[k]] = v
    return c


def test_car_rests_on_ground():
    phys, traj = rollout(fresh())
    cars = phys.arena.cars
    assert cars.is_on_ground[0]
    z = float(cars.pos[0, 2])
    assert 10.0 < z < 25.0, z
    assert float(np.linalg.norm(cars.vel[0])) < 15.0
    assert abs(float(cars.pos[0, 0]) + 1000.0) < 5.0
    assert abs(float(cars.pos[0, 1])) < 5.0


def test_ball_rests():
    """Zero-velocity ball sleeps exactly (Arena.cpp:721-727)."""
    phys, _ = rollout(fresh())
    np.testing.assert_allclose(phys.arena.ball.pos,
                               [0.0, 0.0, C.BALL_REST_Z], atol=1e-5)


def test_throttle_drives_forward():
    phys, traj = rollout(fresh(), ctrl(throttle=1))
    cars = phys.arena.cars
    # Speed 1 second in (tick 120)
    v120 = traj["car_vel"][119]
    fwd_speed = float(v120 @ np.asarray(cars.rot[0])[:, 0])
    assert 400.0 < fwd_speed < 1410.0, fwd_speed
    # Reaches (close to) the 1410 engine cap by 2s
    vend = float(np.linalg.norm(traj["car_vel"][-1]))
    assert 1200.0 < vend < 1500.0, vend
    assert float(cars.pos[0, 0]) > -500.0


def test_boost_accelerates_and_drains():
    phys, traj = rollout(fresh(), ctrl(throttle=1, boost=1))
    speed120 = float(np.linalg.norm(traj["car_vel"][119]))
    assert speed120 > 900.0, speed120
    # 33.33 boost drains in 1s at 33.3/s
    assert float(phys.arena.cars.boost[0]) < 1.0
    # Max speed clamp respected
    vmax = np.max(np.linalg.norm(traj["car_vel"], axis=-1))
    assert vmax <= C.CAR_MAX_SPEED + 1.0


def test_jump_leaves_ground():
    _, traj = rollout(fresh(), ctrl(jump=1))
    z = traj["car_pos"][:, 2]
    vz = traj["car_vel"][:, 2]
    assert not traj["on_ground"][30]
    assert float(np.max(z)) > 100.0  # held jump reaches > 100uu
    assert float(np.max(vz)) > 250.0


def test_ball_falls_and_bounces():
    phys = fresh()
    ball = phys.arena.ball.replace(
        pos=jnp.array([0.0, 0.0, 1000.0]),
        vel=jnp.array([0.0, 0.0, -1.0]))  # nonzero vel so it's awake
    phys = phys.replace(arena=phys.arena.replace(ball=ball))
    _, traj = rollout(phys)
    zs = traj["ball_pos"][:, 2]
    vzs = traj["ball_vel"][:, 2]
    assert float(np.min(zs)) > 80.0  # never tunnels through the floor
    assert float(np.max(vzs)) > 200.0  # bounced back up
    impact_speed = -float(np.min(vzs))
    bounce_speed = float(np.max(vzs))
    ratio = bounce_speed / impact_speed
    assert 0.45 < ratio < 0.75, ratio


def test_gravity_in_air():
    phys = fresh()
    cars = phys.arena.cars.replace(
        pos=jnp.array([[0.0, 0.0, 1500.0]]),
        is_on_ground=jnp.zeros((1,), bool))
    phys = phys.replace(arena=phys.arena.replace(cars=cars))
    _, traj = rollout(phys)
    vz = traj["car_vel"][:, 2]
    # ~0.1s in: v = -65 uu/s
    assert -80.0 < float(vz[11]) < -50.0, vz[11]


def test_steering_turns_car():
    phys, _ = rollout(fresh(), ctrl(throttle=1, steer=1))
    yaw, _, _ = m.rotmat_to_euler(jnp.asarray(phys.arena.cars.rot[0]))
    assert abs(float(yaw)) > 0.5


def test_supersonic_flag():
    phys = fresh()
    cars = phys.arena.cars.replace(vel=jnp.array([[2300.0, 0.0, 0.0]]))
    phys = phys.replace(arena=phys.arena.replace(cars=cars))
    _, traj = rollout(phys, ctrl(throttle=1))
    # Supersonic reached immediately; can't assert final state after 2s of
    # coasting, so check speed at tick 0 exceeded the start threshold
    assert float(np.linalg.norm(traj["car_vel"][0])) > 2000.0


def test_boost_pad_pickup():
    phys = fresh()
    cars = phys.arena.cars.replace(
        pos=jnp.array([[-3584.0, 0.0, C.CAR_SPAWN_REST_Z]]),
        boost=jnp.array([10.0]))
    phys = phys.replace(arena=phys.arena.replace(cars=cars))
    phys, _ = rollout(phys)
    assert float(phys.arena.cars.boost[0]) == 100.0
    # Pad went on cooldown at pickup (10s for big pads), so after 2s the
    # remaining cooldown is ~8s
    assert 7.0 < float(phys.arena.pads.cooldown[0]) <= 10.0


def test_goal_detection():
    phys = fresh()
    ball = phys.arena.ball.replace(
        pos=jnp.array([0.0, 5000.0, 300.0]),
        vel=jnp.array([0.0, 2000.0, 0.0]))
    phys = phys.replace(arena=phys.arena.replace(ball=ball))
    phys, _ = rollout(phys)
    assert bool(phys.arena.goal_scored)


def test_wheel_rays_hit_dynamic_objects():
    """Suspension rays hit the ball and other cars (the reference's
    suspension-grid dynamic-object overlay, Arena.cpp:733-750): a car
    dropped onto the resting ball ends up on_ground with all four wheels
    in (non-world) contact, and wheels over another car's roof report
    that car's index."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from reinforcement_learning_tpu import constants as C
    from reinforcement_learning_tpu.physics import car as carmod
    from reinforcement_learning_tpu.physics import step as stepmod

    params = stepmod.ArenaParams(num_cars=2, use_mesh=False)
    phys = stepmod.make_physics_state(params)
    f = lambda v: jnp.asarray(v, jnp.float32)
    ball_top = 93.15 + 91.25
    cars = phys.arena.cars.replace(
        pos=f([[0.0, 0.0, ball_top + 40.0], [2000.0, 2000.0, 17.01]]))
    ball = phys.arena.ball.replace(pos=f([0.0, 0.0, 93.15]))
    phys = phys.replace(arena=phys.arena.replace(cars=cars, ball=ball))
    teams = jnp.asarray([0, 1], jnp.int32)
    tick = jax.jit(lambda p: stepmod.arena_tick(
        p, teams, jax.random.PRNGKey(0), params))
    for _ in range(90):
        phys = tick(phys)
    a = jax.device_get(phys.arena)
    assert bool(a.cars.is_on_ground[0])
    assert a.cars.pos[0, 2] > 150.0  # still up on the ball

    cfg = params.car_config
    inv_iw = carmod.inv_inertia_world(
        phys.arena.cars.rot,
        carmod.box_inv_inertia_local(params.mutators.car_mass,
                                     cfg.hitbox_size))
    rc = carmod.wheel_raycasts(
        phys.arena.cars, cfg, params.mutators, params.dt, inv_iw,
        "soccar", grid=None, ball=phys.arena.ball,
        alive=jnp.array([True, True]))
    assert np.all(np.asarray(rc.ground_idx[0]) == -2)
    assert not np.any(np.asarray(rc.in_world_contact[0]))
    assert np.all(np.asarray(rc.ground_idx[1]) == -1)

    # car 0 hovering over car 1's roof: rays report car index 1
    roof_z = 17.01 + 36.16 + 12.0
    cars2 = phys.arena.cars.replace(
        pos=f([[2000.0, 2000.0, roof_z], [2000.0, 2000.0, 17.01]]))
    rc2 = carmod.wheel_raycasts(
        cars2, cfg, params.mutators, params.dt, inv_iw, "soccar",
        grid=None, ball=phys.arena.ball.replace(pos=f([0.0, 0.0, 93.15])),
        alive=jnp.array([True, True]))
    assert np.all(np.asarray(rc2.ground_idx[0]) == 1)
    # demoed target car is transparent to the rays
    rc3 = carmod.wheel_raycasts(
        cars2, cfg, params.mutators, params.dt, inv_iw, "soccar",
        grid=None, ball=phys.arena.ball.replace(pos=f([0.0, 0.0, 93.15])),
        alive=jnp.array([True, False]))
    assert np.all(np.asarray(rc3.ground_idx[0]) == -1)
