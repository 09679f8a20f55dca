"""Obs builder tests: layout sizes, team inversion symmetry, pad values
(reference: AdvancedObs.cpp:193-270, GameState.cpp:92-125)."""

import jax.numpy as jnp
import numpy as np

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu import maths as m
from reinforcement_learning_tpu.envs.obs import (PAD_PERMUTATION,
                                                 AdvancedObs,
                                                 canonical_pads)
from reinforcement_learning_tpu.physics.state import (make_ball_state,
                                                      make_cars_state,
                                                      make_pads_state)


def test_obs_sizes():
    assert AdvancedObs(2, np.array([0, 1])).obs_size == 109
    assert AdvancedObs(4, np.array([0, 0, 1, 1])).obs_size == 167


def test_pad_permutation_is_bijection():
    assert sorted(PAD_PERMUTATION.tolist()) == list(range(34))


def test_pad_inversion_reverses():
    pads = make_pads_state()
    cool = jnp.arange(34, dtype=jnp.float32)
    act, c = canonical_pads(pads.is_active, cool, jnp.array([False]))
    act_i, c_i = canonical_pads(pads.is_active, cool, jnp.array([True]))
    np.testing.assert_array_equal(np.asarray(c)[0][::-1], np.asarray(c_i)[0])


def _mirrored_state(num_cars, teams):
    """Build a state and its 180-degree-mirrored twin with teams swapped."""
    cars = make_cars_state(num_cars)
    key_pos = np.array([[1000.0, -2000.0, 30.0], [-500.0, 1500.0, 17.0]],
                       np.float32)[:num_cars]
    vel = np.array([[100.0, 300.0, 10.0], [-50.0, 20.0, 0.0]],
                   np.float32)[:num_cars]
    yaw = np.array([0.7, -2.1], np.float32)[:num_cars]
    cars = cars.replace(pos=jnp.asarray(key_pos), vel=jnp.asarray(vel),
                        rot=m.euler_to_rotmat(jnp.asarray(yaw)))
    ball = make_ball_state().replace(
        pos=jnp.array([800.0, -300.0, 200.0]),
        vel=jnp.array([-100.0, 900.0, 50.0]))

    flip = jnp.array([-1.0, -1.0, 1.0])
    cars_m = cars.replace(pos=cars.pos * flip, vel=cars.vel * flip,
                          rot=m.euler_to_rotmat(jnp.asarray(yaw) + jnp.pi))
    ball_m = ball.replace(pos=ball.pos * flip, vel=ball.vel * flip)
    return (cars, ball), (cars_m, ball_m)


def test_team_inversion_symmetry():
    """A blue player's obs of a state must equal an orange player's obs of
    the mirrored state (the whole point of the inversion)."""
    teams = np.array([0, 1])
    builder = AdvancedObs(2, teams)
    pads = make_pads_state()
    prev_actions = jnp.zeros((2, 8))

    (cars, ball), (cars_m, ball_m) = _mirrored_state(2, teams)

    obs = builder.build(cars, ball, pads, prev_actions, jnp.asarray(teams))
    # mirrored world, teams swapped: player 0 (now orange) sees the same
    builder_sw = AdvancedObs(2, np.array([1, 0]))
    obs_m = builder_sw.build(cars_m, ball_m, pads, prev_actions,
                             jnp.asarray(np.array([1, 0])))
    np.testing.assert_allclose(np.asarray(obs[0]), np.asarray(obs_m[0]),
                               atol=2e-5)


def test_obs_block_values():
    """Spot-check the ball block scaling."""
    teams = np.array([0, 1])
    builder = AdvancedObs(2, teams)
    pads = make_pads_state()
    cars = make_cars_state(2)
    ball = make_ball_state().replace(pos=jnp.array([2300.0, 0.0, 93.15]))
    obs = np.asarray(builder.build(cars, ball, pads, jnp.zeros((2, 8)),
                                   jnp.asarray(teams)))
    assert abs(obs[0, 0] - 1.0) < 1e-5          # ball x / 2300
    assert abs(obs[1, 0] + 1.0) < 1e-5          # inverted for orange
    # all pads active -> 34 ones after ball(9)+prev(8)
    np.testing.assert_allclose(obs[0, 17:51], 1.0)
