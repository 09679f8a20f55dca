"""Self-play services: policy version bank, ELO skill tracking, and
train-against-old-version opponent mixing.

Re-design of the reference PolicyVersionManager (reference:
PolicyVersionManager.{h,cpp}) for TPU: old versions are a STACKED pytree
(leading version axis) so selecting an opponent is a gather, not a model
reload, and the eval envs are just another batch of the same jitted env.

  * version ring buffer, snapshot every ``ts_per_version`` (:38-62)
  * ELO skill matches on dedicated eval envs (fuzzed kickoff + goal-score
    terminal), rating += inc * (1 - expected), expected from the 400-based
    logistic (:156-169)
  * train-against-old mixing: with probability p an old version plays one
    team; its rows are excluded from the PPO batch
    (reference: Learner.cpp:587-625, 733-778)
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from reinforcement_learning_tpu.envs import state_setters, terminals
from reinforcement_learning_tpu.envs.env import EnvConfig, RocketLeagueEnv
from reinforcement_learning_tpu.learn.ppo import PPOLearner


@dataclasses.dataclass(frozen=True)
class SkillTrackerConfig:
    """Reference: SkillTrackerConfig.h."""
    enabled: bool = False
    num_arenas: int = 16
    sim_time: float = 45.0
    max_sim_time: float = 240.0
    update_interval: int = 16
    rating_inc: float = 5.0
    initial_rating: float = 0.0
    deterministic: bool = False


@dataclasses.dataclass(frozen=True)
class SelfPlayConfig:
    save_versions: bool = True
    ts_per_version: int = 25_000_000
    max_versions: int = 32
    train_against_old: bool = True
    train_against_old_chance: float = 0.15
    skill: SkillTrackerConfig = SkillTrackerConfig()


@struct.dataclass
class VersionBank:
    """Ring buffer of policy snapshots as stacked pytrees."""
    policy: Any               # stacked (V, ...) pytree
    shared_head: Any          # stacked or None
    ratings: jnp.ndarray      # (V,)
    timesteps: jnp.ndarray    # (V,) int
    count: jnp.ndarray        # () int32
    next_slot: jnp.ndarray    # () int32

    @staticmethod
    def make(params, max_versions: int, initial_rating: float):
        stack = lambda t: (jax.tree.map(
            lambda x: jnp.zeros((max_versions,) + x.shape, x.dtype), t)
            if t is not None else None)
        return VersionBank(
            policy=stack(params.policy),
            shared_head=stack(params.shared_head),
            ratings=jnp.full((max_versions,), initial_rating),
            timesteps=jnp.zeros((max_versions,), jnp.int32),
            count=jnp.zeros((), jnp.int32),
            next_slot=jnp.zeros((), jnp.int32))


def add_version(bank: VersionBank, params, timesteps) -> VersionBank:
    """Insert a snapshot at the ring position (PolicyVersionManager.cpp
    AddVersion; oldest evicted once full)."""
    slot = bank.next_slot
    V = bank.ratings.shape[0]
    set_at = lambda stacked, t: (jax.tree.map(
        lambda s, x: s.at[slot].set(x), stacked, t)
        if t is not None else None)
    return bank.replace(
        policy=set_at(bank.policy, params.policy),
        shared_head=set_at(bank.shared_head, params.shared_head),
        ratings=bank.ratings.at[slot].set(
            current_rating(bank)),
        timesteps=bank.timesteps.at[slot].set(timesteps),
        count=jnp.minimum(bank.count + 1, V),
        next_slot=(slot + 1) % V)


def current_rating(bank: VersionBank) -> jnp.ndarray:
    """New snapshots inherit the latest rating (so ratings form a
    continuous curve); initial rating when empty."""
    has_any = bank.count > 0
    last = (bank.next_slot - 1) % bank.ratings.shape[0]
    return jnp.where(has_any, bank.ratings[last], bank.ratings[0])


def get_version(bank: VersionBank, idx) -> tuple:
    """(policy, shared_head) params of version ``idx`` (gather)."""
    take = lambda stacked: (jax.tree.map(lambda s: s[idx], stacked)
                            if stacked is not None else None)
    return take(bank.policy), take(bank.shared_head)


def elo_update(winner_rating, loser_rating, inc: float):
    """Reference: PolicyVersionManager.cpp:159-169."""
    exp_delta = (loser_rating - winner_rating) / 400.0
    expected = 1.0 / (10.0 ** exp_delta + 1.0)
    return (winner_rating + inc * (1.0 - expected),
            loser_rating - inc * (1.0 - expected))


class SkillTracker:
    """ELO evaluation: current policy vs a random old version on dedicated
    eval envs (reference: RunSkillMatches, PolicyVersionManager.cpp:
    156-300)."""

    def __init__(self, learner: PPOLearner, team_size: int,
                 config: SkillTrackerConfig, tick_skip: int = 8,
                 action_delay: int = 7):
        self.config = config
        self.learner = learner
        env_cfg = EnvConfig(num_envs=config.num_arenas, team_size=team_size,
                            tick_skip=tick_skip, action_delay=action_delay,
                            max_episode_seconds=1e9, no_touch_timeout=1e9)
        self.env = RocketLeagueEnv(
            env_cfg,
            reward_fns=[],
            terminal_conds=[terminals.goal_score_condition()],
            state_setter=state_setters.kickoff_state(fuzz=0.1))
        self.steps_per_run = int(round(
            config.sim_time / env_cfg.step_seconds))
        self._run = jax.jit(self._run_impl)
        self.env_states = None
        self.mode_name = f"{team_size}v{team_size}"
        self.iterations_since_ran = 0
        # continuation state (PolicyVersionManager.cpp:289-299)
        self.continuation = False
        self.cur_goals = 0
        self.prev_old_idx = 0
        self.prev_new_team = 0
        self.prev_sim_time = 0.0

    def _run_impl(self, cur_params, old_policy, old_head, env_states,
                  new_team, key):
        """Scan eval steps; count goals for new vs old team."""
        env = self.env
        learner = self.learner
        teams = env.teams
        old_params = cur_params.replace(policy=old_policy,
                                        shared_head=old_head)

        def step_fn(carry, _):
            states, obs, masks, key, new_goals, old_goals = carry
            key, k1, k2 = jax.random.split(key, 3)
            del _
            flat_obs = obs.reshape(-1, obs.shape[-1])
            flat_masks = masks.reshape(-1, masks.shape[-1])
            a_new, _ = learner.sample_actions(
                cur_params, flat_obs, flat_masks, k1,
                deterministic=self.config.deterministic)
            a_old, _ = learner.sample_actions(
                old_params, flat_obs, flat_masks, k2,
                deterministic=self.config.deterministic)
            is_new = (teams == new_team)[None, :]
            actions = jnp.where(is_new, a_new.reshape(obs.shape[:-1]),
                                a_old.reshape(obs.shape[:-1]))
            states, out = env.step(states, actions)
            # Scoring team from ball y-sign at the goal tick
            ball_y = states.prev_arena.ball.pos[:, 1]
            # (env auto-reset already applied; use out.goal + prev snapshot)
            scored_on_team = jnp.where(ball_y < 0, 0, 1)  # net side
            new_scored = out.goal_scored & (scored_on_team != new_team)
            old_scored = out.goal_scored & (scored_on_team == new_team)
            return (states, out.obs, out.action_mask, key,
                    new_goals + jnp.sum(new_scored),
                    old_goals + jnp.sum(old_scored)), None

        states, obs, masks = env_states
        carry = (states, obs, masks, key, jnp.zeros((), jnp.int32),
                 jnp.zeros((), jnp.int32))
        carry, _ = jax.lax.scan(step_fn, carry, None,
                                length=self.steps_per_run)
        return (carry[0], carry[1], carry[2]), carry[4], carry[5]

    def run_matches(self, cur_params, bank: VersionBank, rng: np.random.RandomState):
        """Host-side wrapper: pick version/team, run, apply per-goal ELO.

        When too few goals were scored the eval CONTINUES next time —
        same env states, same opponent version and team, with the
        accumulated sim time capped at ``max_sim_time`` (reference:
        PolicyVersionManager.cpp:289-299 "Forcing continuation").

        Returns (bank, current_rating, info dict)."""
        count = int(jax.device_get(bank.count))
        if count == 0:
            return bank, float(current_rating(bank)), {}
        key = jax.random.PRNGKey(int(rng.randint(0, 2 ** 31 - 1)))
        if self.continuation and self.env_states is not None:
            idx = min(self.prev_old_idx, count - 1)
            new_team = self.prev_new_team
            total_sim_time = self.prev_sim_time + self.config.sim_time
        else:
            idx = int(rng.randint(0, count))
            new_team = int(rng.randint(0, 2))
            total_sim_time = self.config.sim_time
            self.env_states = None
            self.cur_goals = 0
        if self.env_states is None:
            self.env_states = self.env.reset(key)
        old_policy, old_head = get_version(bank, idx)
        self.env_states, new_goals, old_goals = self._run(
            cur_params, old_policy, old_head, self.env_states,
            jnp.int32(new_team), key)
        new_goals = int(jax.device_get(new_goals))
        old_goals = int(jax.device_get(old_goals))
        self.cur_goals += new_goals + old_goals
        if (self.cur_goals < self.config.num_arenas
                and total_sim_time < self.config.max_sim_time):
            self.continuation = True
            self.prev_old_idx = idx
            self.prev_new_team = new_team
            self.prev_sim_time = total_sim_time
        else:
            self.continuation = False
            self.cur_goals = 0

        cur = float(jax.device_get(current_rating(bank)))
        old = float(jax.device_get(bank.ratings[idx]))
        inc = self.config.rating_inc
        for _ in range(new_goals):
            cur, old = elo_update(cur, old, inc)
        for _ in range(old_goals):
            old, cur = elo_update(old, cur, inc)

        # write old version's rating back; current rating propagates into
        # the next snapshot via current_rating()
        last = (int(jax.device_get(bank.next_slot)) - 1) % \
            bank.ratings.shape[0]
        bank = bank.replace(
            ratings=bank.ratings.at[idx].set(old).at[last].set(cur))
        info = {"new_goals": new_goals, "old_goals": old_goals,
                "opponent_idx": idx,
                f"Rating/{self.mode_name}": cur}
        return bank, cur, info
