"""Self-play: version bank ring buffer, ELO math, opponent-mixing
iteration (reference: PolicyVersionManager.{h,cpp})."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reinforcement_learning_tpu.envs.env import EnvConfig, RocketLeagueEnv
from reinforcement_learning_tpu.learn import selfplay as sp
from reinforcement_learning_tpu.learn.ppo import PPOConfig
from reinforcement_learning_tpu.learn.trainer import Trainer, TrainerConfig


def test_elo_update():
    # Equal ratings: winner gains inc/2
    w, l = sp.elo_update(0.0, 0.0, 5.0)
    assert abs(w - 2.5) < 1e-6
    assert abs(l + 2.5) < 1e-6
    # Strong favorite winning gains little
    w2, _ = sp.elo_update(400.0, 0.0, 5.0)
    assert w2 - 400.0 < 1.0


def make_trainer(selfplay=None):
    env = RocketLeagueEnv(EnvConfig(num_envs=2, team_size=1))
    return Trainer(env, PPOConfig(policy_layers=(16, 16),
                                  critic_layers=(16,),
                                  shared_head_layers=(16,),
                                  batch_size=64, epochs=1,
                                  half_precision=False),
                   TrainerConfig(ts_per_itr=16),
                   selfplay=selfplay)


def test_version_bank_ring():
    trainer = make_trainer()
    state = trainer.init(jax.random.PRNGKey(0))
    bank = sp.VersionBank.make(state.ppo.params, max_versions=3,
                               initial_rating=0.0)
    for i in range(5):
        # perturb params each time so versions are distinguishable
        p = jax.tree.map(lambda x: x + i, state.ppo.params)
        bank = sp.add_version(bank, p, jnp.int32(i * 100))
    assert int(bank.count) == 3
    # ring: slots hold versions 2, 3, 4 (timesteps 200, 300, 400)
    assert sorted(np.asarray(bank.timesteps).tolist()) == [200, 300, 400]
    pol, head = sp.get_version(bank, 0)
    assert pol is not None and head is not None


def test_train_against_old_iteration():
    cfg = sp.SelfPlayConfig(
        save_versions=True, ts_per_version=1,  # snapshot immediately
        train_against_old=True, train_against_old_chance=1.0,
        skill=sp.SkillTrackerConfig(enabled=False))
    trainer = make_trainer(cfg)
    state = trainer.init(jax.random.PRNGKey(0))
    # iteration 1: snapshots a version; iteration 2 must mix
    state, m1 = trainer.train_iteration(state)
    state, m2 = trainer.train_iteration(state)
    assert trainer.bank is not None
    assert int(trainer.bank.count) >= 1
    assert trainer.last_selfplay_metrics.get("trained_against_old") == 1.0
    assert np.isfinite(float(m2["reward_mean"]))


def test_skill_tracker_runs():
    cfg = sp.SelfPlayConfig(
        save_versions=True, ts_per_version=1,
        train_against_old=False,
        skill=sp.SkillTrackerConfig(enabled=True, num_arenas=2,
                                    sim_time=1.0, update_interval=1))
    trainer = make_trainer(cfg)
    state = trainer.init(jax.random.PRNGKey(0))
    state, _ = trainer.train_iteration(state)
    state, _ = trainer.train_iteration(state)
    # Ratings were produced (possibly unchanged if no goals in 1s)
    assert any(k.startswith("Rating/")
               for k in trainer.last_selfplay_metrics) or \
        trainer.last_selfplay_metrics.get("new_goals") is not None
