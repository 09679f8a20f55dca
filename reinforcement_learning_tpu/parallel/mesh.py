"""Device mesh + sharding layout for the data-parallel trainer.

The reference is single-process/single-GPU (SURVEY §2e); scaling here is
the standard TPU recipe: a 1-D ``env`` mesh axis, env/batch state sharded
over it, parameters and running stats replicated.  XLA's GSPMD partitioner
then turns the PPO update's batch means into ``psum`` collectives over ICI
— no hand-written gradient sync (the psum IS the DP gradient all-reduce).

Multi-host: the same layout holds on a multi-host mesh created from
``jax.distributed``; env state lives on each host's local shard.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis (env) sharded."""
    return NamedSharding(mesh, P(ENV_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_train_state(state, mesh: Mesh):
    """Place a TrainState: env-batched pytrees sharded on their leading
    axis, everything else (params, opt state, stats, counters) replicated."""
    env_s = env_sharding(mesh)
    rep = replicated(mesh)

    def place_env(x):
        return jax.device_put(x, env_s)

    def place_rep(x):
        return jax.device_put(x, rep)

    return state.replace(
        ppo=jax.tree.map(place_rep, state.ppo),
        env_states=jax.tree.map(place_env, state.env_states),
        obs=place_env(state.obs),
        masks=place_env(state.masks),
        return_stat=jax.tree.map(place_rep, state.return_stat),
        obs_stat=jax.tree.map(place_rep, state.obs_stat),
        total_timesteps=place_rep(state.total_timesteps),
        iterations=place_rep(state.iterations),
        key=place_rep(state.key),
    )
