"""Timing split: rollout-only vs PPO-update-only vs raw physics step.

Not a test — a perf triage tool.  Run on the TPU chip:
    python tools/profile_split.py [num_envs]
"""
import sys
import time

import jax
import jax.numpy as jnp

from reinforcement_learning_tpu.envs.env import EnvConfig, RocketLeagueEnv
from reinforcement_learning_tpu.learn.ppo import PPOConfig
from reinforcement_learning_tpu.learn.trainer import Trainer, TrainerConfig

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

env_cfg = EnvConfig(num_envs=N, team_size=2)
env = RocketLeagueEnv(env_cfg)
ppo_cfg = PPOConfig(policy_layers=(384, 384, 384),
                    critic_layers=(384, 384, 384),
                    shared_head_layers=(384, 384),
                    batch_size=50_000, epochs=2, half_precision=True)
trainer = Trainer(env, ppo_cfg, TrainerConfig(ts_per_itr=100_000))
T = trainer.steps_per_itr
P = env_cfg.cars_per_arena
state = trainer.init(jax.random.PRNGKey(0))
learner = trainer.learner


def bench(name, fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    steps = T * N * P
    print(f"{name:28s} {dt*1e3:9.2f} ms/iter   "
          f"({steps/dt:,.0f} steps/s at T={T})")
    return dt


# 1. raw physics+env step, no policy: scan T steps of env.step w/ fixed action
@jax.jit
def env_only(env_states, obs, masks, key):
    def step_fn(carry, _):
        env_states, key = carry
        key, k = jax.random.split(key)
        act = jax.random.randint(k, (N, P), 0, 90)
        env_states2, out = env.step(env_states, act)
        return (env_states2, key), out.reward
    (env_states, _), rews = jax.lax.scan(step_fn, (env_states, key), None,
                                         length=T)
    return rews


# 2. rollout with policy sampling (the collect loop), no learn
@jax.jit
def rollout_only(env_states, obs, masks, key, params):
    def step_fn(carry, _):
        env_states, obs, masks, key = carry
        key, ks = jax.random.split(key)
        flat_obs = obs.reshape(-1, obs.shape[-1])
        flat_masks = masks.reshape(-1, masks.shape[-1])
        actions, logp = learner.sample_actions(params, flat_obs, flat_masks,
                                               ks)
        env_states2, out = env.step(env_states, actions.reshape(N, P))
        return (env_states2, out.obs, out.action_mask, key), (out.reward,
                                                              logp)
    carry, ys = jax.lax.scan(step_fn, (env_states, obs, masks, key), None,
                             length=T)
    return ys


# 3. inference only: T policy-sample calls on the resident obs
@jax.jit
def infer_only(obs, masks, key, params):
    def f(carry, _):
        key, acc = carry
        key, ks = jax.random.split(key)
        a, logp = learner.sample_actions(params, obs.reshape(-1, obs.shape[-1]),
                                         masks.reshape(-1, masks.shape[-1]),
                                         ks)
        return (key, acc + logp.sum()), None
    (key, acc), _ = jax.lax.scan(f, (key, jnp.float32(0)), None, length=T)
    return acc


# 4. PPO update only on synthetic data of the same shape
key = jax.random.PRNGKey(1)
B = T * N * P
obs_dim = state.obs.shape[-1]
data = dict(
    obs=jax.random.normal(key, (B, obs_dim), jnp.float32),
    mask=jnp.ones((B, 90), bool),
    action=jax.random.randint(key, (B,), 0, 90),
    old_logp=jnp.full((B,), -4.5),
    advantage=jax.random.normal(key, (B,)),
    target_value=jax.random.normal(key, (B,)),
)
update = jax.jit(lambda s, d, k: learner.update(s, d, k))

# 5. critic value pass on the full buffer (done twice in train_iteration)
values = jax.jit(lambda p, o: learner.values(p, o, half=False))

print(f"# N={N} T={T} players={N*P} buffer={B}")
d_env = bench("env-only (random actions)", env_only, state.env_states,
              state.obs, state.masks, state.key)
d_roll = bench("rollout (policy+env)", rollout_only, state.env_states,
               state.obs, state.masks, state.key, state.ppo.params)
d_inf = bench("inference only (T fwd)", infer_only, state.obs, state.masks,
              state.key, state.ppo.params)
d_upd = bench("ppo update (2 epochs)", update, state.ppo, data,
              state.key)
d_val = bench("critic value pass (x1)", values, state.ppo.params,
              data["obs"])
d_full = bench("full train_iteration", lambda s: trainer.train_iteration(s),
               state, iters=5)
print(f"# rollout+update+2*values = "
      f"{(d_roll + d_upd + 2 * d_val)*1e3:.1f} ms vs full "
      f"{d_full*1e3:.1f} ms")
