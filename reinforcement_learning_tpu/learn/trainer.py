"""Trainer: the fused on-device collect -> GAE -> PPO loop.

The reference orchestrates four hot loops across CPU/GPU with marshaling
(reference: Learner.cpp:482-1056).  Here one jitted ``train_iteration``
does everything on-device:

  rollout: lax.scan of (policy sample -> env step -> store)   [collect]
  value pass: batched critic on stored + final obs            [consume]
  GAE reverse scan with truncation bootstrap                  [consume]
  PPO epochs x shuffled batches                               [learn]

The experience "buffer" is just the stacked scan output — device-resident,
fixed (T, N, P) layout (no ragged per-player trajectory lists: terminals
travel as masks and the GAE scan reproduces the reference's
concatenated-episode semantics, SURVEY §7).
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from reinforcement_learning_tpu.envs.env import RocketLeagueEnv
from reinforcement_learning_tpu.learn import gae as gaemod
from reinforcement_learning_tpu.learn import selfplay as sp
from reinforcement_learning_tpu.learn import welford
from reinforcement_learning_tpu.learn.ppo import (PPOConfig, PPOLearner,
                                                  PPOTrainState)


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    """Mirror of LearnerConfig (reference: LearnerConfig.h:14-71), minus
    fields that don't apply on TPU (device selection, render pacing)."""
    ts_per_itr: int = 50_000
    standardize_returns: bool = True
    standardize_obs: bool = False
    min_obs_std: float = 0.1
    max_obs_mean_range: float = 3.0
    checkpoint_folder: str = ""
    ts_per_save: int = 10_000_000
    checkpoints_to_keep: int = 8
    random_seed: int = 123


@struct.dataclass
class TrainState:
    """Everything that changes across iterations, in one pytree."""
    ppo: PPOTrainState
    env_states: Any
    obs: jnp.ndarray           # (N, P, D) current obs
    masks: jnp.ndarray         # (N, P, A)
    return_stat: welford.WelfordState
    obs_stat: welford.WelfordState
    total_timesteps: jnp.ndarray  # () int64-ish float
    iterations: jnp.ndarray       # () int32
    key: jnp.ndarray


class Trainer:
    def __init__(self, env: RocketLeagueEnv, ppo_config: PPOConfig,
                 config: TrainerConfig = TrainerConfig(),
                 selfplay: "sp.SelfPlayConfig | None" = None,
                 step_metrics_fn=None, guiding_params=None):
        """``step_metrics_fn(env_states, out) -> dict[str, array]`` is the
        jit-compatible equivalent of the reference's per-step user metric
        callback (reference: StepCallback, ExampleMain.cpp:232-254 wired in
        Learner.cpp:796-797); values are averaged over the iteration and
        reported alongside the built-in metrics.

        ``guiding_params``: a frozen ``PPOParams`` whose policy
        distribution is pulled toward by an L1 auxiliary loss scaled by
        ``ppo_config.guiding_strength`` (reference: guiding policy,
        PPOLearnerConfig.h:55-57, PPOLearner.cpp:458-468).  Load one with
        ``utils.checkpoint.load_params``."""
        self.env = env
        self.config = config
        self.ppo_config = ppo_config
        self.step_metrics_fn = step_metrics_fn
        self.guiding_params = guiding_params
        if guiding_params is not None and ppo_config.guiding_strength <= 0:
            raise ValueError("guiding_params given but "
                             "ppo_config.guiding_strength is 0")
        self.learner = PPOLearner(env.obs_size, env.num_actions, ppo_config)

        n_players = env.config.num_envs * env.config.cars_per_arena
        # env steps per iteration so that collected player-steps >= target
        self.steps_per_itr = max(config.ts_per_itr // n_players, 1)
        self.players_per_step = n_players

        # Self-play services (reference: PolicyVersionManager + opponent
        # mixing, Learner.cpp:587-625)
        self.selfplay = selfplay
        self.bank: "sp.VersionBank | None" = None
        self.skill_tracker = None
        self._host_rng = np.random.RandomState(config.random_seed)
        if selfplay is not None and selfplay.skill.enabled:
            self.skill_tracker = sp.SkillTracker(
                self.learner, env.config.team_size, selfplay.skill,
                env.config.tick_skip, env.config.action_delay)

        # NOTE: no buffer donation — EnvState.prev_arena aliases phys.arena
        # right after a reset, and XLA rejects donating the same buffer
        # twice.
        self._train_iteration = jax.jit(self._train_iteration_impl,
                                        static_argnames=("use_old",))

    # ------------------------------------------------------------------
    def init(self, key=None) -> TrainState:
        key = key if key is not None else jax.random.PRNGKey(
            self.config.random_seed)
        kppo, kenv, knext = jax.random.split(key, 3)
        ppo_state = self.learner.init(kppo)
        env_states, obs, masks = self.env.reset(kenv)
        return TrainState(
            ppo=ppo_state, env_states=env_states, obs=obs, masks=masks,
            return_stat=welford.WelfordState.make(()),
            obs_stat=welford.WelfordState.make((self.env.obs_size,)),
            total_timesteps=jnp.zeros((), jnp.int64)
            if jax.config.jax_enable_x64 else jnp.zeros((), jnp.int32),
            iterations=jnp.zeros((), jnp.int32),
            key=knext)

    # ------------------------------------------------------------------
    def _train_iteration_impl(self, state: TrainState, opp_policy=None,
                              opp_head=None, old_team=0, use_old=False):
        cfg = self.config
        learner = self.learner
        T = self.steps_per_itr
        N, P = state.obs.shape[0], state.obs.shape[1]

        key, kroll, kupdate = jax.random.split(state.key, 3)

        # --- collect
        params = state.ppo.params
        if use_old:
            opp_params = params.replace(policy=opp_policy,
                                        shared_head=opp_head)
            is_old_player = (self.env.teams == old_team)  # (P,)
        else:
            is_old_player = jnp.zeros((P,), bool)
        obs_stat = state.obs_stat

        def maybe_std(o):
            if cfg.standardize_obs:
                return welford.standardize_obs(obs_stat, o, cfg.min_obs_std,
                                               cfg.max_obs_mean_range)
            return o

        def step_fn(carry, _):
            env_states, obs, masks, key = carry
            key, ksample, kold = jax.random.split(key, 3)
            obs_in = maybe_std(obs)
            flat_obs = obs_in.reshape(-1, obs.shape[-1])
            flat_masks = masks.reshape(-1, masks.shape[-1])
            actions, logp = learner.sample_actions(params, flat_obs,
                                                   flat_masks, ksample)
            act_grid = actions.reshape(obs.shape[:-1])
            if use_old:
                old_actions, _ = learner.sample_actions(
                    opp_params, flat_obs, flat_masks, kold)
                act_grid = jnp.where(is_old_player[None, :],
                                     old_actions.reshape(obs.shape[:-1]),
                                     act_grid)
            env_states2, out = self.env.step(env_states, act_grid)
            data = dict(
                obs=obs_in, mask=masks, action=act_grid,
                old_logp=logp.reshape(obs.shape[:-1]),
                reward=out.reward,
                terminal=out.terminal_type,
                final_obs=maybe_std(out.final_obs),
                goal=out.goal_scored,
                touch=out.ball_touched,
                # per-reward-component means (reference samples these per
                # arena, EnvSet.cpp:227-249 / Learner.cpp:805-820; a full
                # mean costs one scalar per component per step)
                reward_components={k: jnp.mean(v) for k, v in
                                   out.reward_components.items()},
            )
            if self.step_metrics_fn is not None:
                data["user_metrics"] = self.step_metrics_fn(env_states2, out)
            return (env_states2, out.obs, out.action_mask, key), data

        (env_states, obs, masks, _), traj = jax.lax.scan(
            step_fn, (state.env_states, state.obs, state.masks, kroll),
            None, length=T)

        # --- values (batched critic pass; reference Learner.cpp:927-944)
        flat = lambda x: x.reshape((T * N * P,) + x.shape[3:])
        v_obs = learner.values(params, flat(traj["obs"]), half=False)
        v_final = learner.values(params, flat(traj["final_obs"]), half=False)

        # --- GAE over (T, N*P): broadcast per-arena terminal to players
        terminal_tb = jnp.repeat(traj["terminal"], P, axis=-1).reshape(T,
                                                                       N * P)
        rewards_tb = traj["reward"].reshape(T, N * P)
        v_tb = v_obs.reshape(T, N * P)
        vf_tb = v_final.reshape(T, N * P)

        return_std = jnp.where(cfg.standardize_returns,
                               state.return_stat.std, 1.0)
        advs, target_values, returns, clip_portion = gaemod.compute_gae(
            rewards_tb, terminal_tb, v_tb, vf_tb,
            gamma=self.ppo_config.gae_gamma, lam=self.ppo_config.gae_lambda,
            return_std=return_std,
            reward_clip_range=self.ppo_config.reward_clip_range)

        return_stat = welford.update_batch(state.return_stat,
                                           returns.reshape(-1))
        obs_stat = state.obs_stat
        if cfg.standardize_obs:
            obs_stat = welford.update_batch(
                obs_stat, traj["obs"].reshape(-1, traj["obs"].shape[-1]))

        # --- PPO update
        data = dict(
            obs=flat(traj["obs"]),
            mask=flat(traj["mask"]),
            action=flat(traj["action"]),
            old_logp=flat(traj["old_logp"]),
            advantage=advs.reshape(-1),
            target_value=target_values.reshape(-1),
        )
        if use_old:
            # Exclude old-version opponent rows from training
            w = jnp.broadcast_to((~is_old_player).astype(jnp.float32)
                                 [None, None, :], (T, N, P))
            data["weight"] = w.reshape(-1)
        ppo_state, ppo_metrics = learner.update(
            state.ppo, data, kupdate, guiding_params=self.guiding_params)

        steps_collected = T * N * P
        metrics = dict(ppo_metrics)
        metrics["reward_mean"] = jnp.mean(traj["reward"])
        metrics["goal_rate"] = jnp.mean(traj["goal"].astype(jnp.float32))
        metrics["touch_rate"] = jnp.mean(traj["touch"].astype(jnp.float32))
        metrics["episode_terminals"] = jnp.sum(
            (traj["terminal"] > 0).astype(jnp.float32))
        metrics["return_std"] = return_stat.std
        metrics["reward_clip_portion"] = clip_portion
        metrics["value_mean"] = jnp.mean(v_obs)
        for name, v in traj["reward_components"].items():
            metrics[f"reward/{name}"] = jnp.mean(v)
        if self.step_metrics_fn is not None:
            # a (value, weight-mask) tuple = conditional average, matching
            # Report::AddAvg called only on qualifying events
            for name, vals in traj["user_metrics"].items():
                if isinstance(vals, tuple):
                    v, w = vals
                    w = w.astype(jnp.float32)
                    metrics[name] = (jnp.sum(v * w)
                                     / jnp.maximum(jnp.sum(w), 1.0))
                else:
                    metrics[name] = jnp.mean(vals)

        new_state = TrainState(
            ppo=ppo_state, env_states=env_states, obs=obs, masks=masks,
            return_stat=return_stat, obs_stat=obs_stat,
            total_timesteps=state.total_timesteps + steps_collected,
            iterations=state.iterations + 1,
            key=key)
        return new_state, metrics

    # ------------------------------------------------------------------
    def train_iteration(self, state: TrainState):
        """One iteration, with the self-play host logic around the jitted
        core (reference: Learner.cpp:587-625 + versionMgr->OnIteration)."""
        spc = self.selfplay
        self.last_selfplay_metrics = {}
        extra = self.last_selfplay_metrics
        if spc is None:
            return self._train_iteration(state)

        if self.bank is None:
            self.bank = sp.VersionBank.make(
                state.ppo.params, spc.max_versions,
                spc.skill.initial_rating)

        # Snapshot a version on the ts_per_version boundary (OnIteration)
        ts = int(jax.device_get(state.total_timesteps))
        if spc.save_versions:
            count = int(jax.device_get(self.bank.count))
            prev_ts = ts - self.steps_per_itr * self.players_per_step
            if count == 0 or (ts // spc.ts_per_version
                              > max(prev_ts, 0) // spc.ts_per_version):
                self.bank = sp.add_version(self.bank, state.ppo.params,
                                           jnp.int32(min(ts, 2**31 - 1)))

        # Opponent mixing
        count = int(jax.device_get(self.bank.count))
        use_old = (spc.train_against_old and count > 0
                   and self._host_rng.rand() < spc.train_against_old_chance)
        if use_old:
            idx = int(self._host_rng.randint(0, count))
            old_team = int(self._host_rng.randint(0, 2))
            opp_policy, opp_head = sp.get_version(self.bank, idx)
            result = self._train_iteration(state, opp_policy, opp_head,
                                           old_team, use_old=True)
            extra["trained_against_old"] = 1.0
        else:
            result = self._train_iteration(state)

        # Skill matches on the update interval
        if self.skill_tracker is not None:
            self.skill_tracker.iterations_since_ran += 1
            if (self.skill_tracker.iterations_since_ran
                    >= spc.skill.update_interval and count > 0):
                self.skill_tracker.iterations_since_ran = 0
                new_state, _ = result
                self.bank, rating, info = self.skill_tracker.run_matches(
                    new_state.ppo.params, self.bank, self._host_rng)
                extra.update({k: float(v) for k, v in info.items()})
        return result

    def init_or_resume(self, key=None) -> TrainState:
        """init(), then auto-resume from the newest checkpoint in
        ``config.checkpoint_folder`` if one exists (the reference's
        auto-Load-newest on construction, Learner.cpp:145-146,259-279)."""
        from reinforcement_learning_tpu.utils import checkpoint as ckpt

        state = self.init(key)
        if self.config.checkpoint_folder:
            restored, stats = ckpt.load_latest(self.config.checkpoint_folder,
                                               state)
            if restored is not None:
                return restored
        return state

    def save(self, state: TrainState) -> str | None:
        """Checkpoint now (reference: Learner::Save, Learner.cpp:224-257)."""
        from reinforcement_learning_tpu.utils import checkpoint as ckpt

        if not self.config.checkpoint_folder:
            return None
        return ckpt.save_checkpoint(self.config.checkpoint_folder, state,
                                    keep=self.config.checkpoints_to_keep)

    def train(self, state: TrainState, num_iterations: int,
              log_fn=None, stop_fn=None) -> TrainState:
        """Run iterations; checkpoints every ``ts_per_save`` collected
        steps (Learner.cpp:1011-1015).  ``stop_fn()`` True ends training
        after a final save (the reference's 'Q' save-and-quit,
        Learner.cpp:281-298,1005-1009)."""
        last_save_ts = int(jax.device_get(state.total_timesteps))
        for _ in range(num_iterations):
            t0 = time.perf_counter()
            state, metrics = self.train_iteration(state)
            jax.block_until_ready(metrics["reward_mean"])
            dt = time.perf_counter() - t0
            if log_fn is not None:
                m = {k: float(v) for k, v in metrics.items()}
                m.update(getattr(self, "last_selfplay_metrics", {}))
                m["steps_per_second"] = (
                    self.steps_per_itr * self.players_per_step / dt)
                m["iteration_time"] = dt
                log_fn(int(state.iterations), m)
            ts = int(jax.device_get(state.total_timesteps))
            if (self.config.checkpoint_folder
                    and ts - last_save_ts >= self.config.ts_per_save):
                self.save(state)
                last_save_ts = ts
            if stop_fn is not None and stop_fn():
                break
        if self.config.checkpoint_folder:
            self.save(state)
        return state
