"""Data-parallel sharding tests on the 8-device virtual CPU mesh
(SURVEY §4.5: DP semantics without a cluster; BASELINE config #4 logic).

The sharded train iteration must produce the same parameters as the
unsharded one — XLA's psum gradient reduction is the only difference, so
agreement verifies the DP gradient sync is semantically a no-op.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_tpu.envs.env import EnvConfig, RocketLeagueEnv
from reinforcement_learning_tpu.learn.ppo import PPOConfig
from reinforcement_learning_tpu.learn.trainer import Trainer, TrainerConfig
from reinforcement_learning_tpu.parallel import mesh as meshmod


@pytest.fixture(scope="module")
def trainer():
    env = RocketLeagueEnv(EnvConfig(num_envs=8, team_size=1))
    ppo_cfg = PPOConfig(policy_layers=(32, 32), critic_layers=(32, 32),
                        shared_head_layers=(32,), batch_size=4096, epochs=1,
                        half_precision=False)
    return Trainer(env, ppo_cfg, TrainerConfig(ts_per_itr=64))


def test_mesh_creation():
    mesh = meshmod.make_mesh(8)
    assert mesh.devices.shape == (8,)
    assert mesh.axis_names == (meshmod.ENV_AXIS,)


def test_sharded_matches_unsharded(trainer):
    assert len(jax.devices()) == 8

    state0 = trainer.init(jax.random.PRNGKey(0))
    state_a, metrics_a = trainer.train_iteration(state0)

    mesh = meshmod.make_mesh(8)
    state_sharded = meshmod.shard_train_state(
        trainer.init(jax.random.PRNGKey(0)), mesh)
    state_b, metrics_b = trainer.train_iteration(state_sharded)

    pa = jax.tree.leaves(state_a.ppo.params)
    pb = jax.tree.leaves(state_b.ppo.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    assert abs(float(metrics_a["reward_mean"])
               - float(metrics_b["reward_mean"])) < 1e-4


def test_sharded_env_state_placement(trainer):
    mesh = meshmod.make_mesh(8)
    state = meshmod.shard_train_state(trainer.init(jax.random.PRNGKey(1)),
                                      mesh)
    obs_sharding = state.obs.sharding
    assert obs_sharding.is_equivalent_to(
        meshmod.env_sharding(mesh), state.obs.ndim)
    # params replicated
    leaf = jax.tree.leaves(state.ppo.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_host_mesh_2d_matches_unsharded(trainer):
    """BASELINE #4 logic on a 2-D (host, env) mesh: leading env axis
    sharded over both axes; params must match the unsharded run (the DCN
    psum composes with the ICI psum into the same reduction)."""
    state0 = trainer.init(jax.random.PRNGKey(2))
    state_a, _ = trainer.train_iteration(state0)

    mesh = meshmod.make_host_mesh(n_hosts=2, devices_per_host=4)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == (meshmod.HOST_AXIS, meshmod.ENV_AXIS)
    state_sharded = meshmod.shard_train_state(
        trainer.init(jax.random.PRNGKey(2)), mesh)
    state_b, _ = trainer.train_iteration(state_sharded)

    for a, b in zip(jax.tree.leaves(state_a.ppo.params),
                    jax.tree.leaves(state_b.ppo.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_initialize_distributed_noop_single_process(monkeypatch):
    """Without a coordinator configured the entry point is a no-op and
    single-process code paths continue to work."""
    for var in ("JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES",
                "JAX_PROCESS_ID", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert meshmod.initialize_distributed() is False
