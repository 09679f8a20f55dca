"""Generalized Advantage Estimation.

Exact re-derivation of the reference GAE (reference:
GigaLearnCPP/PPO/GAE.cpp:7-208) on a fixed ``(T, B)`` layout:

  * rewards optionally normalized by the running return STD and clipped to
    ``reward_clip_range`` (GAE.cpp:104-167); raw rewards still drive the
    ``returns`` output used for the return-STD Welford stat
  * terminal handling (GAE.cpp:68-102): NORMAL -> next value 0;
    TRUNCATED -> bootstrap from the critic value of the final (pre-reset)
    obs; otherwise the next step's value prediction
  * reverse scan recurrence adv = delta + gamma*lambda*notDone*adv
  * target values = value_preds + advantages (GAE.cpp:200)

The reference runs this over per-player concatenated episodes; with
terminal flags resetting the scan carry, a single ``(T, B)`` reverse scan
is step-for-step identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from reinforcement_learning_tpu.envs.terminals import NORMAL, TRUNCATED


def compute_gae(rewards, terminal_types, value_preds, next_value_preds,
                gamma: float = 0.99, lam: float = 0.95,
                return_std=None, reward_clip_range: float = 200.0):
    """All inputs (T, B); time-major, oldest first.

    next_value_preds[t] = critic value of the post-step obs of step t
    (pre-auto-reset), used both as V(s_{t+1}) and the truncation bootstrap.

    Returns (advantages, target_values, returns, reward_clip_portion).
    """
    is_normal = terminal_types == NORMAL
    is_trunc = terminal_types == TRUNCATED
    not_done = (~is_normal & ~is_trunc).astype(jnp.float32)

    if return_std is not None:
        inv = 1.0 / jnp.maximum(return_std, 1e-8)
        should_norm = (return_std != 0.0) & (return_std != 1.0)
        norm_rew = jnp.where(should_norm, rewards * inv, rewards)
        total = jnp.sum(jnp.abs(norm_rew))
        if reward_clip_range > 0:
            clipped = jnp.clip(norm_rew, -reward_clip_range,
                               reward_clip_range)
        else:
            clipped = norm_rew
        total_clipped = jnp.sum(jnp.abs(clipped))
        clip_portion = jnp.where(
            should_norm, (total - total_clipped) / jnp.maximum(total, 1e-7),
            0.0)
        used_rewards = jnp.where(should_norm, clipped, rewards)
    else:
        used_rewards = rewards
        clip_portion = jnp.zeros(())

    # next value per step: 0 if NORMAL else V(final obs) (covers both the
    # continuation V(s_{t+1}) and the truncation bootstrap)
    next_vals = jnp.where(is_normal, 0.0, next_value_preds)
    # GAE delta never bootstraps beyond terminal; trunc uses the bootstrap
    delta = used_rewards + gamma * next_vals - value_preds

    def scan_fn(carry, xs):
        prev_adv, prev_ret = carry
        d, nd, raw_r = xs
        adv = d + gamma * lam * nd * prev_adv
        ret = raw_r + gamma * nd * prev_ret
        return (adv, ret), (adv, ret)

    B = rewards.shape[1]
    init = (jnp.zeros((B,)), jnp.zeros((B,)))
    _, (advs, rets) = jax.lax.scan(scan_fn, init,
                                   (delta, not_done, rewards), reverse=True)
    target_values = value_preds + advs
    return advs, target_values, rets, clip_portion
