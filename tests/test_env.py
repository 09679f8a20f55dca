"""Env-layer behavior: determinism, auto-reset, kickoff layout, action
delay semantics (reference: EnvSet.cpp, Arena.cpp:112-216)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu.envs import terminals
from reinforcement_learning_tpu.envs.env import EnvConfig, RocketLeagueEnv


@pytest.fixture(scope="module")
def env():
    return RocketLeagueEnv(EnvConfig(num_envs=2, team_size=1))


@pytest.fixture(scope="module")
def jitted(env):
    return jax.jit(env.reset), jax.jit(env.step)


def test_reset_kickoff_layout(env, jitted):
    reset, _ = jitted
    states, obs, masks = reset(jax.random.PRNGKey(0))
    cars = states.phys.arena.cars
    pos = np.asarray(cars.pos)  # (N, P, 3)
    # Ball at center
    np.testing.assert_allclose(np.asarray(states.phys.arena.ball.pos),
                               np.tile([0, 0, C.BALL_REST_Z], (2, 1)),
                               atol=1e-4)
    # Blue car (idx 0) on blue half, orange mirrored exactly
    assert np.all(pos[:, 0, 1] < 0)
    np.testing.assert_allclose(pos[:, 1, :2], -pos[:, 0, :2], atol=1e-4)
    # Spawn position must be one of the kickoff table entries
    table = C.CAR_SPAWN_LOCATIONS_SOCCAR[:, :2]
    for n in range(2):
        d = np.linalg.norm(table - pos[n, 0, :2], axis=1)
        assert d.min() < 1.0, pos[n, 0]


def test_determinism(env, jitted):
    reset, step = jitted
    s1, o1, m1 = reset(jax.random.PRNGKey(42))
    s2, o2, m2 = reset(jax.random.PRNGKey(42))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    acts = jnp.zeros((2, 2), jnp.int32)
    for _ in range(3):
        s1, out1 = step(s1, acts)
        s2, out2 = step(s2, acts)
    np.testing.assert_array_equal(np.asarray(out1.obs), np.asarray(out2.obs))


def test_different_envs_decorrelated(env, jitted):
    """Per-env PRNG keys: different arenas get different kickoff shuffles
    eventually (SURVEY §4.6)."""
    reset, _ = jitted
    diffs = 0
    for seed in range(5):
        states, _, _ = reset(jax.random.PRNGKey(seed))
        pos = np.asarray(states.phys.arena.cars.pos)
        if not np.allclose(pos[0, 0], pos[1, 0]):
            diffs += 1
    assert diffs > 0


def test_goal_triggers_terminal_and_reset(env, jitted):
    reset, step = jitted
    states, obs, masks = reset(jax.random.PRNGKey(0))
    # Launch the ball into the orange goal
    ball = states.phys.arena.ball.replace(
        pos=jnp.tile(jnp.array([0.0, 5000.0, 300.0]), (2, 1)),
        vel=jnp.tile(jnp.array([0.0, 3000.0, 0.0]), (2, 1)))
    states = states.replace(phys=states.phys.replace(
        arena=states.phys.arena.replace(ball=ball)))
    acts = jnp.zeros((2, 2), jnp.int32)
    terminal_seen = False
    for _ in range(10):
        states, out = step(states, acts)
        t = np.asarray(out.terminal_type)
        if (t == terminals.NORMAL).any():
            terminal_seen = True
            break
    assert terminal_seen
    # After the terminal step the env auto-reset: ball back at center
    np.testing.assert_allclose(
        np.asarray(states.phys.arena.ball.pos)[t == terminals.NORMAL],
        np.tile([0, 0, C.BALL_REST_Z], ((t == terminals.NORMAL).sum(), 1)),
        atol=1e-4)
    # Goal reward was delivered with opposite signs to the two players
    r = np.asarray(out.reward)
    idx = int(np.argmax(t == terminals.NORMAL))
    assert r[idx, 0] > 0  # blue scored on orange net
    assert r[idx, 1] < 0 or r[idx, 1] == 0  # concede (goal_reward default -1)


def test_no_touch_truncation():
    env = RocketLeagueEnv(EnvConfig(num_envs=1, team_size=1,
                                    no_touch_timeout=0.5))
    reset = jax.jit(env.reset)
    step = jax.jit(env.step)
    states, *_ = reset(jax.random.PRNGKey(0))
    acts = jnp.zeros((1, 2), jnp.int32)
    seen_trunc = False
    for _ in range(12):
        states, out = step(states, acts)
        if (np.asarray(out.terminal_type) == terminals.TRUNCATED).any():
            seen_trunc = True
            break
    assert seen_trunc


def test_obs_finite_under_random_play(env, jitted):
    reset, step = jitted
    states, obs, masks = reset(jax.random.PRNGKey(3))
    key = jax.random.PRNGKey(7)
    for _ in range(10):
        key, k = jax.random.split(key)
        acts = jax.random.randint(k, (2, 2), 0, env.num_actions)
        states, out = step(states, acts)
        assert bool(jnp.all(jnp.isfinite(out.obs)))
        assert bool(jnp.all(jnp.isfinite(out.reward)))
