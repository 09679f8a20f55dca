"""Scaling-efficiency harness (BASELINE #4).

Measures trainer throughput as the env axis is sharded over 1..N devices
and reports per-device efficiency.  Without multi-chip hardware the
devices are virtual CPU devices (XLA_FLAGS
--xla_force_host_platform_device_count), which exercises the identical
GSPMD partitioning + psum program XLA emits for a real ICI mesh; on a
TPU slice the same child command measures real chips, and across hosts
``parallel.mesh.initialize_distributed`` extends the mesh over DCN.

Usage:
  python -m tools.bench_scaling                 # orchestrate 1,2,4,8
  python -m tools.bench_scaling --devices 1 4   # chosen counts
  python -m tools.bench_scaling --child N       # one measurement (internal)

Writes SCALING.json: per-count steps/s, per-device steps/s, efficiency
vs the 1-device run.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def run_child(n_devices: int, num_envs: int, iters: int) -> dict:
    import jax
    jax.config.update("jax_platforms", "cpu")

    from reinforcement_learning_tpu.envs.env import (EnvConfig,
                                                     RocketLeagueEnv)
    from reinforcement_learning_tpu.learn.ppo import PPOConfig
    from reinforcement_learning_tpu.learn.trainer import Trainer, TrainerConfig
    from reinforcement_learning_tpu.parallel import mesh as meshmod
    from reinforcement_learning_tpu.physics import step as stepmod

    assert len(jax.devices()) >= n_devices, (
        f"need {n_devices} devices, have {len(jax.devices())}")

    # analytic-plane arena keeps the CPU-harness compile time sane; the
    # partitioning/psum structure under test is identical with the mesh
    env = RocketLeagueEnv(EnvConfig(
        num_envs=num_envs, team_size=1,
        arena=stepmod.ArenaParams(num_cars=2, use_mesh=False)))
    ppo_cfg = PPOConfig(policy_layers=(64, 64), critic_layers=(64, 64),
                        shared_head_layers=(64,), batch_size=num_envs * 16,
                        epochs=1, half_precision=False)
    trainer = Trainer(env, ppo_cfg, TrainerConfig(ts_per_itr=num_envs * 16))

    mesh = meshmod.make_mesh(n_devices)
    state = meshmod.shard_train_state(trainer.init(jax.random.PRNGKey(0)),
                                      mesh)
    # warmup/compile
    state, _ = trainer.train_iteration(state)
    import jax as _j
    _j.block_until_ready(state.ppo.params)

    steps_per_itr = trainer.steps_per_itr * trainer.players_per_step
    t0 = time.perf_counter()
    steps = 0
    for _ in range(iters):
        state, _ = trainer.train_iteration(state)
        steps += steps_per_itr
    _j.block_until_ready(state.ppo.params)
    dt = time.perf_counter() - t0
    return {"n_devices": n_devices, "num_envs": num_envs,
            "steps": steps, "seconds": dt, "steps_per_sec": steps / dt}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", type=int, default=None)
    ap.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    ap.add_argument("--envs-per-device", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", default="SCALING.json")
    args = ap.parse_args()

    if args.child is not None:
        n = args.child
        res = run_child(n, args.envs_per_device * n, args.iters)
        print("CHILD_RESULT " + json.dumps(res))
        return

    results = []
    for n in args.devices:
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count={n}")
        cmd = [sys.executable, "-m", "tools.bench_scaling", "--child",
               str(n), "--envs-per-device", str(args.envs_per_device),
               "--iters", str(args.iters)]
        print(f"--- {n} device(s): {' '.join(cmd)}", flush=True)
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True,
                              timeout=1800)
        line = [ln for ln in proc.stdout.splitlines()
                if ln.startswith("CHILD_RESULT ")]
        if not line:
            print(proc.stdout[-2000:])
            print(proc.stderr[-2000:])
            raise RuntimeError(f"child for {n} devices failed")
        results.append(json.loads(line[0][len("CHILD_RESULT "):]))
        print(f"    {results[-1]['steps_per_sec']:,.0f} steps/s")

    base = results[0]
    base_per_dev = base["steps_per_sec"] / base["n_devices"]
    for r in results:
        r["steps_per_sec_per_device"] = r["steps_per_sec"] / r["n_devices"]
        r["efficiency_vs_1dev"] = (r["steps_per_sec_per_device"]
                                   / base_per_dev)
    out = {"harness": "virtual-cpu-mesh",
           "note": ("weak scaling: envs per device fixed; efficiency = "
                    "per-device throughput vs the 1-device run.  On a "
                    f"{os.cpu_count()}-core host, virtual-device counts "
                    "beyond the physical cores measure CPU "
                    "oversubscription, not interconnect scaling — "
                    "efficiency numbers are meaningful on real "
                    "multi-chip hardware (same command)"),
           "host_cpus": os.cpu_count(),
           "results": results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
