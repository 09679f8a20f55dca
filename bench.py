"""End-to-end training throughput benchmark.

Mirrors the reference's logged run configuration (BASELINE.md: tickSkip
8 / actionDelay 7, AdvancedObs 167, DefaultAction 90, shared 384x2 +
policy 384x3 + critic 384x3 ≈ 1.14M params, ~100k timesteps/iteration,
minibatch 50k, 2 epochs) at 1024 arenas x 2v2 = 4096 players (the
reference's run used 512 arenas; a TPU chip wants the larger batch —
README's perf table states both) and measures overall env-steps/s of
the fused collect+GAE+learn iteration on the local accelerator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"compile_cache" ("cold"|"warm"), "warmup_s"} — so recorded BENCH files
are self-describing about whether warmup hit the persistent compilation
cache.  Baseline: 100,677 steps/s overall steady state (reference
run_out.log, iter 690).
"""

import json
import sys
import time

BASELINE_STEPS_PER_SEC = 100_677.8


def main():
    import os

    import jax

    # Persistent compilation cache: first-compile of the fused train
    # iteration through the TPU tunnel is slow and highly variable
    # (~30s-900s observed for the same program); cache compiled
    # executables next to the repo so repeat benches start in seconds.
    cache_dir = os.environ.get(
        "RLT_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    cache_state = ("warm" if os.path.isdir(cache_dir) and os.listdir(
        cache_dir) else "cold")

    from reinforcement_learning_tpu.envs.env import EnvConfig, RocketLeagueEnv
    from reinforcement_learning_tpu.learn.ppo import PPOConfig
    from reinforcement_learning_tpu.learn.trainer import (Trainer,
                                                          TrainerConfig)

    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    env_cfg = EnvConfig(num_envs=num_envs, team_size=2)
    env = RocketLeagueEnv(env_cfg)
    ppo_cfg = PPOConfig(
        policy_layers=(384, 384, 384),
        critic_layers=(384, 384, 384),
        shared_head_layers=(384, 384),
        batch_size=50_000,
        epochs=2,
        half_precision=True,
    )
    n_players = num_envs * env_cfg.cars_per_arena
    trainer = Trainer(env, ppo_cfg, TrainerConfig(ts_per_itr=100_000))

    counts = trainer.learner.param_counts()
    print(f"# devices={jax.devices()} players={n_players} "
          f"steps/itr={trainer.steps_per_itr} params={counts}",
          file=sys.stderr)

    state = trainer.init(jax.random.PRNGKey(0))

    # Warmup (compile)
    t0 = time.perf_counter()
    state, metrics = trainer.train_iteration(state)
    jax.block_until_ready((state, metrics))
    warmup_s = time.perf_counter() - t0
    print(f"# warmup (compile+run, {cache_state} cache): {warmup_s:.1f}s",
          file=sys.stderr)

    # Sustained measurement: wall time over many iterations with ONE
    # host sync at the end (device_get forces real completion even on
    # async backends; per-iteration syncs are not part of training).
    t_start = time.perf_counter()
    for _ in range(iters):
        state, metrics = trainer.train_iteration(state)
    _ = float(jax.device_get(metrics["reward_mean"]))
    total = time.perf_counter() - t_start

    steps_per_itr = trainer.steps_per_itr * n_players
    best = steps_per_itr * iters / total
    print(f"# {iters} iterations in {total:.2f}s "
          f"({total / iters:.3f}s/iter), steps/itr={steps_per_itr}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "env-steps/s (2v2 soccar, full PPO loop, 1 chip)",
        "value": round(best, 1),
        "unit": "steps/s",
        "vs_baseline": round(best / BASELINE_STEPS_PER_SEC, 3),
        "compile_cache": cache_state,
        "warmup_s": round(warmup_s, 1),
    }))


if __name__ == "__main__":
    main()
