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
HOST_AXIS = "host"


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> bool:
    """Multi-host entry point: bring up the jax.distributed runtime.

    On a real multi-host TPU slice (the BASELINE #4 north-star topology)
    each host calls this before building the mesh; afterwards
    ``jax.devices()`` is the GLOBAL device list and :func:`make_mesh` /
    :func:`make_host_mesh` span all hosts, with gradient psums riding ICI.

    Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID);
    TPU pods auto-detect all three.  Returns True if the distributed
    runtime was initialized, False when running single-process (no
    coordinator configured) — callers can use the same code path either
    way.
    """
    import os
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None \
            and "TPU_WORKER_HOSTNAMES" not in os.environ:
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    elif os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None:
        kwargs["process_id"] = process_id
    elif os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (ENV_AXIS,))


def make_host_mesh(n_hosts: int | None = None,
                   devices_per_host: int | None = None) -> Mesh:
    """2-D (host, env) mesh: rows = hosts (DCN), columns = local devices
    (ICI).  Env/batch leading axes shard over BOTH axes (see
    env_sharding), so collectives that stay within a row ride ICI and
    only the gradient psum crosses DCN — the standard multi-host DP
    layout."""
    devices = jax.devices()
    if n_hosts is None:
        n_hosts = jax.process_count()
    if devices_per_host is None:
        devices_per_host = len(devices) // n_hosts
    grid = np.asarray(devices[:n_hosts * devices_per_host]).reshape(
        n_hosts, devices_per_host)
    return Mesh(grid, (HOST_AXIS, ENV_AXIS))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading axis (env) sharded over every mesh axis (works for the 1-D
    env mesh and the 2-D (host, env) mesh alike)."""
    return NamedSharding(mesh, P(tuple(mesh.axis_names)))


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
