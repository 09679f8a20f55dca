"""Env-level parity of the Pallas physics backend (interpret mode on CPU)
against the XLA backend over a few steps."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_tpu.envs.env import EnvConfig, RocketLeagueEnv

# See test_pallas_step.py: interpret-mode megakernel runs are
# minutes-per-test on CPU; TPU runs them compiled, always.
pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu"
    and not os.environ.get("RLT_PALLAS_TESTS"),
    reason="interpret-mode pallas parity: set RLT_PALLAS_TESTS=1 or run "
           "on TPU")


def test_env_pallas_backend_matches_xla():
    from reinforcement_learning_tpu.physics import step as stepmod
    # compare against the analytic-plane arena (what the megakernel models)
    arena = stepmod.ArenaParams(num_cars=2, use_mesh=False,
                                dynamic_wheel_rays=False)
    cfg_x = EnvConfig(num_envs=4, team_size=1, physics_backend="xla",
                      arena=arena)
    cfg_p = dataclasses.replace(cfg_x, physics_backend="pallas")
    env_x = RocketLeagueEnv(cfg_x)
    env_p = RocketLeagueEnv(cfg_p)

    key = jax.random.PRNGKey(0)
    sx, ox, _ = env_x.reset(key)
    sp, op, _ = env_p.reset(key)
    np.testing.assert_allclose(np.asarray(ox), np.asarray(op))

    akey = jax.random.PRNGKey(1)
    for i in range(3):
        akey, k = jax.random.split(akey)
        act = jax.random.randint(k, (4, env_x.config.cars_per_arena), 0,
                                 env_x.num_actions)
        sx, outx = env_x.step(sx, act)
        sp, outp = env_p.step(sp, act)
        # Physics numerics differ at float-accumulation level only
        # (no demos this early, so respawn RNG never fires).
        np.testing.assert_allclose(np.asarray(outx.obs),
                                   np.asarray(outp.obs), atol=2e-3)
        np.testing.assert_allclose(np.asarray(outx.reward),
                                   np.asarray(outp.reward), atol=2e-3)
        np.testing.assert_array_equal(np.asarray(outx.terminal_type),
                                      np.asarray(outp.terminal_type))
