"""Game modes beyond soccar: heatseeker ball steering, snowday puck,
hoops scoring/pads/spawns (reference: GameMode.h, Ball.cpp:152-252,
Arena.cpp:112-216, 949-974, MutatorConfig.cpp:5-34)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu import maths as m
from reinforcement_learning_tpu.envs import state_setters
from reinforcement_learning_tpu.physics import step as stepmod
from reinforcement_learning_tpu.physics.state import MutatorConfig


def _params(mode, num_cars=2):
    return stepmod.ArenaParams(num_cars=num_cars, game_mode=mode)


def _step_n(phys, params, teams, n, key=None):
    key = key if key is not None else jax.random.PRNGKey(0)

    @jax.jit
    def run(phys, key):
        def body(carry, _):
            p, k = carry
            k, sub = jax.random.split(k)
            return (stepmod.arena_step(
                p, p.arena.cars.controls, teams, sub, params, 8, 7), k), 0
        (p, _), _ = jax.lax.scan(body, (phys, key), None, length=n)
        return p
    return run(phys, key)


def test_mutator_mode_defaults():
    hoops = MutatorConfig.for_mode("hoops")
    assert hoops.ball_radius == pytest.approx(C.BALL_COLLISION_RADIUS_HOOPS)
    snow = MutatorConfig.for_mode("snowday")
    assert snow.ball_mass == pytest.approx(C.Snowday.PUCK_MASS_BT)
    assert snow.ball_world_friction == pytest.approx(C.Snowday.PUCK_FRICTION)
    hs = MutatorConfig.for_mode("heatseeker")
    assert hs.boost_used_per_second == 0.0
    assert hs.car_spawn_boost_amount == 100.0


def test_heatseeker_kickoff_and_seek():
    """After kickoff the heatseeker ball has its reference start state;
    once given a target it accelerates toward the goal."""
    params = _params("heatseeker")
    teams = jnp.array([0, 1])
    setter = state_setters.kickoff_state()
    phys = setter(jax.random.PRNGKey(3), params, teams)
    bp = np.asarray(phys.arena.ball.pos)
    assert abs(bp[0]) == pytest.approx(1000.0)
    assert abs(bp[1]) == pytest.approx(2220.0)

    # Give the ball a target manually (as if a blue player touched it)
    ball = phys.arena.ball.replace(
        hs_y_target_dir=jnp.asarray(1.0),
        vel=jnp.asarray([0.0, 800.0, 0.0]),
        pos=jnp.asarray([0.0, 0.0, 500.0]))
    phys = phys.replace(arena=phys.arena.replace(ball=ball))
    # move the cars away so they don't interfere
    cars = phys.arena.cars.replace(pos=phys.arena.cars.pos
                                   + jnp.asarray([[-3000.0, -3000.0, 0.0],
                                                  [3000.0, -3000.0, 0.0]]))
    phys = phys.replace(arena=phys.arena.replace(cars=cars))

    out = _step_n(phys, params, teams, 15)
    v = np.asarray(out.arena.ball.vel)
    speed = np.linalg.norm(v)
    # seeks toward +y goal and blends toward the target speed (2900)
    assert v[1] > 700.0
    assert speed > 2000.0


def test_heatseeker_speed_capped():
    params = _params("heatseeker")
    ball = stepmod.make_physics_state(params).arena.ball
    assert float(ball.hs_target_speed) == pytest.approx(
        C.Heatseeker.INITIAL_TARGET_SPEED)


def test_snowday_puck_rests_on_floor():
    """The puck (cylinder) settles at z ~ PUCK_HEIGHT/2 on the floor, not
    at a sphere radius."""
    params = _params("snowday")
    teams = jnp.array([0, 1])
    setter = state_setters.kickoff_state()
    phys = setter(jax.random.PRNGKey(0), params, teams)
    # drop the puck flat from low height
    ball = phys.arena.ball.replace(pos=jnp.asarray([1000.0, 0.0, 200.0]),
                                   vel=jnp.asarray([0.0, 0.0, -10.0]))
    phys = phys.replace(arena=phys.arena.replace(ball=ball))
    out = _step_n(phys, params, teams, 60)
    z = float(out.arena.ball.pos[2])
    assert z < C.Snowday.PUCK_RADIUS * 0.8      # below sphere rest height
    assert z > C.Snowday.PUCK_HEIGHT / 2 - 8.0  # near cylinder half-height


def test_hoops_goal_detection():
    params = _params("hoops")
    # in the +y basket region, below the rim threshold
    scored = stepmod._is_ball_scored_hoops(
        jnp.asarray([0.0, C.HOOPS_GOAL_OFFSET_Y / C.HOOPS_GOAL_SCALE_Y,
                     100.0]))
    assert bool(scored)
    # midfield: no
    assert not bool(stepmod._is_ball_scored_hoops(
        jnp.asarray([0.0, 0.0, 100.0])))
    # in basket xy but above the rim: no
    assert not bool(stepmod._is_ball_scored_hoops(
        jnp.asarray([0.0, C.HOOPS_GOAL_OFFSET_Y / C.HOOPS_GOAL_SCALE_Y,
                     500.0])))


def test_hoops_pads_and_kickoff():
    params = _params("hoops")
    teams = jnp.array([0, 1])
    phys = stepmod.make_physics_state(params)
    assert phys.arena.pads.is_active.shape == (C.NUM_BOOST_PADS_HOOPS,)

    setter = state_setters.kickoff_state()
    phys = setter(jax.random.PRNGKey(1), params, teams)
    # hoops kickoff launches the ball upward
    assert float(phys.arena.ball.vel[2]) == pytest.approx(C.BALL_HOOPS_Z_VEL)
    # cars at hoops spawn table positions
    pos = np.asarray(phys.arena.cars.pos)
    tab = np.asarray(C.CAR_SPAWN_LOCATIONS_HOOPS)
    d = np.abs(np.abs(pos[:, None, :2]) - np.abs(tab[None, :, :2])).min(1)
    assert d.max() < 1e-3


def test_soccar_unaffected_by_mode_plumbing():
    """Default soccar still produces the standard kickoff."""
    params = _params("soccar")
    teams = jnp.array([0, 1])
    setter = state_setters.kickoff_state()
    phys = setter(jax.random.PRNGKey(2), params, teams)
    assert float(phys.arena.ball.pos[2]) == pytest.approx(C.BALL_REST_Z)
    assert float(m.norm(phys.arena.ball.vel)) == 0.0


def test_hoops_arena_geometry():
    """Hoops uses its own (smaller) plane set: a query outside the hoops
    side wall but inside the soccar arena contacts in hoops only."""
    from reinforcement_learning_tpu.physics import arena_geom as geom
    pos = jnp.asarray([C.ARENA_EXTENT_X_HOOPS - 50.0, 0.0, 500.0])
    _, _, act_h = geom.sphere_contacts(pos, 96.4, "hoops")
    _, _, act_s = geom.sphere_contacts(pos, 96.4, "soccar")
    assert bool(jnp.any(act_h))
    assert not bool(jnp.any(act_s))
    # hoops ceiling is lower
    top = jnp.asarray([0.0, 0.0, C.ARENA_HEIGHT_HOOPS - 50.0])
    _, _, act_top = geom.sphere_contacts(top, 96.4, "hoops")
    assert bool(jnp.any(act_top))
