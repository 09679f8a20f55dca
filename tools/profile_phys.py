"""Physics-step throughput probe: mesh vs planes vs pallas backends.

Not a test — a perf triage tool.  Run on the TPU chip:
    python tools/profile_phys.py [num_envs] [backends...]
backends default: mesh planes pallas
"""
import sys
import time

import jax
import jax.numpy as jnp

from reinforcement_learning_tpu.envs.env import EnvConfig, RocketLeagueEnv

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
which = sys.argv[2:] or ["mesh", "planes", "pallas"]


def probe(label, **arena_kw):
    import dataclasses

    from reinforcement_learning_tpu.physics import step as stepmod
    cfg = EnvConfig(num_envs=N, team_size=2,
                    physics_backend=arena_kw.pop("backend", "xla"))
    cfg = dataclasses.replace(
        cfg, arena=stepmod.ArenaParams(num_cars=cfg.cars_per_arena,
                                       **arena_kw))
    env = RocketLeagueEnv(cfg)
    key = jax.random.PRNGKey(0)
    states, obs, mask = env.reset(key)
    act = jnp.zeros((N, cfg.cars_per_arena), jnp.int32)
    step = jax.jit(env.step)
    t0 = time.perf_counter()
    states, out = step(states, act)
    jax.block_until_ready(jax.tree.leaves(states))
    compile_s = time.perf_counter() - t0
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        states, out = step(states, act)
    jax.block_until_ready(jax.tree.leaves(states))
    dt = time.perf_counter() - t0
    sps = N * iters / dt
    print(f"{label:8s} compile {compile_s:7.1f}s  "
          f"{dt / iters * 1e3:8.2f} ms/step  {sps:12,.0f} env-steps/s "
          f"({sps * cfg.cars_per_arena:12,.0f} player-steps/s)", flush=True)


print(f"# devices={jax.devices()} num_envs={N}")
if "mesh" in which:
    probe("mesh", use_mesh=True, dynamic_wheel_rays=True, backend="xla")
if "planes" in which:
    probe("planes", use_mesh=False, dynamic_wheel_rays=False,
          backend="xla")
if "pallas" in which:
    probe("pallas", use_mesh=False, dynamic_wheel_rays=False,
          backend="pallas")
if "pallas_mesh" in which:
    probe("pl_mesh", use_mesh=True, dynamic_wheel_rays=True,
          backend="pallas")
