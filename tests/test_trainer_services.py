"""Orchestration services around the trainer: score-limit terminals, the
losing-team penalty, per-step user metrics, checkpoint cadence/auto-resume,
and the canonical 2v2 example's config construction."""

import jax
import jax.numpy as jnp
import numpy as np

from reinforcement_learning_tpu.envs import rewards as R
from reinforcement_learning_tpu.envs import terminals as T
from reinforcement_learning_tpu.envs.env import EnvConfig, RocketLeagueEnv
from reinforcement_learning_tpu.learn.ppo import PPOConfig
from reinforcement_learning_tpu.learn.trainer import Trainer, TrainerConfig


def _small_ppo():
    return PPOConfig(policy_layers=(32,), critic_layers=(32,),
                     shared_head_layers=(), batch_size=256, epochs=1,
                     half_precision=False)


def _small_env(**kw):
    return RocketLeagueEnv(EnvConfig(num_envs=4, team_size=1, **kw))


def test_score_limit_condition():
    cond = T.score_limit_condition(3)

    class Ctx:
        blue_score = jnp.asarray(2, jnp.int32)
        orange_score = jnp.asarray(0, jnp.int32)
    assert int(cond(Ctx())) == T.NOT_TERMINAL

    class Ctx3:
        blue_score = jnp.asarray(3, jnp.int32)
        orange_score = jnp.asarray(1, jnp.int32)
    assert int(cond(Ctx3())) == T.NORMAL


def test_losing_penalty_reward():
    fn = R.losing_penalty_reward(0.02)

    class Ctx:
        teams = jnp.asarray([0, 1])
        blue_score = jnp.asarray(1, jnp.int32)
        orange_score = jnp.asarray(3, jnp.int32)
    r = np.asarray(fn(Ctx()))
    # blue trails by 2 -> -0.04; orange leads -> 0
    np.testing.assert_allclose(r, [-0.04, 0.0], atol=1e-6)


def test_env_tracks_scores():
    """Scores increment while goal_scored holds and reset with the arena."""
    env = _small_env()
    states, obs, masks = env.reset(jax.random.PRNGKey(0))
    # Place the ball deep in the +y goal of arena 0 so IsBallScored holds.
    ball = states.phys.arena.ball
    pos = np.asarray(ball.pos).copy()
    pos[0] = [0.0, 5400.0, 100.0]
    vel = np.asarray(ball.vel).copy()
    vel[0] = [0.0, 100.0, 0.0]    # awake so physics integrate it
    ball = ball.replace(pos=jnp.asarray(pos), vel=jnp.asarray(vel))
    arena = states.phys.arena.replace(ball=ball)
    states = states.replace(phys=states.phys.replace(arena=arena))

    acts = jnp.zeros((4, env.config.cars_per_arena), jnp.int32)
    states2, out = jax.jit(env.step)(states, acts)
    assert bool(out.goal_scored[0])
    # goal-score terminal fires by default -> arena 0 auto-reset, scores 0
    assert int(states2.blue_score[0]) == 0


def test_step_metrics_fn_and_conditional_average():
    env = _small_env()

    def step_metrics(env_states, out):
        cars = env_states.phys.arena.cars
        return {
            "Player/Boost": cars.boost,
            "Player/Touch Height": (
                jnp.broadcast_to(env_states.phys.arena.ball.pos[:, None, 2],
                                 out.ball_touched.shape),
                out.ball_touched),
        }

    trainer = Trainer(env, _small_ppo(),
                      TrainerConfig(ts_per_itr=64),
                      step_metrics_fn=step_metrics)
    state = trainer.init()
    state, metrics = trainer.train_iteration(state)
    assert "Player/Boost" in metrics
    assert 0.0 <= float(metrics["Player/Boost"]) <= 100.0
    # no touches in a few kickoff steps -> conditional average is 0/eps = 0
    assert np.isfinite(float(metrics["Player/Touch Height"]))


def test_checkpoint_cadence_and_resume(tmp_path):
    env = _small_env()
    cfg = TrainerConfig(ts_per_itr=64, checkpoint_folder=str(tmp_path),
                        ts_per_save=1, checkpoints_to_keep=2)
    trainer = Trainer(env, _small_ppo(), cfg)
    state = trainer.init()
    state = trainer.train(state, 2)
    import os
    saved = sorted(int(d) for d in os.listdir(tmp_path) if d.isdigit())
    assert len(saved) >= 1

    state2 = trainer.init_or_resume()
    assert int(jax.device_get(state2.iterations)) == 2
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(state2.ppo.params)[0]),
        np.asarray(jax.tree_util.tree_leaves(state.ppo.params)[0]))


def test_train_2v2_example_constructs():
    """The canonical example's factories build (smoke; no training)."""
    import sys
    sys.path.insert(0, "examples")
    import importlib
    mod = importlib.import_module("train_2v2")
    env = mod.make_env(num_envs=2, render_mode=False)
    assert env.obs_size == 167          # AdvancedObs 2v2 (run_out.log:53)
    assert env.num_actions == 90
    assert mod.scaled_sizes((512, 512), 1.5) == (768, 768)
    assert 1.0 <= mod.auto_scale(512) <= 3.0
    # the step-metrics callback is jit-compatible on a real env state
    states, obs, masks = env.reset(jax.random.PRNGKey(0))
    acts = jnp.zeros((2, 4), jnp.int32)
    states, out = jax.jit(env.step)(states, acts)
    metrics = mod.step_metrics(states, out)
    assert "Player/Speed" in metrics and "Game/Goal Speed" in metrics


def test_guiding_policy_affects_update():
    """guiding_params must flow through Trainer into the PPO loss
    (reference: PPOLearnerConfig.h:55-57, PPOLearner.cpp:458-468)."""
    import dataclasses

    env = _small_env()
    cfg = dataclasses.replace(_small_ppo(), guiding_strength=10.0)
    tr0 = Trainer(env, _small_ppo(),
                  TrainerConfig(ts_per_itr=32, random_seed=99))
    s0 = tr0.init()
    guide = s0.ppo.params  # any frozen params work as the guide
    tr = Trainer(env, cfg, TrainerConfig(ts_per_itr=32, random_seed=7),
                 guiding_params=guide)
    state = tr.init()
    state, metrics = tr.train_iteration(state)
    assert float(metrics["guiding_loss"]) > 0.0


def test_transfer_learn_collection_loop():
    """StartTransferLearn equivalent: dual obs building + distillation
    (reference: Learner.cpp:299-480)."""
    from reinforcement_learning_tpu.envs.obs import DefaultObs
    from reinforcement_learning_tpu.learn.ppo import PPOLearner
    from reinforcement_learning_tpu.learn.transfer import (TransferLearner,
                                                           TransferLearnConfig)

    env = _small_env()
    learner = PPOLearner(env.obs_size, env.num_actions, _small_ppo())
    key = jax.random.PRNGKey(0)
    params = learner.init(key).params

    # teacher: DefaultObs layout (different obs size), same action table
    P = env.config.cars_per_arena
    old_builder = DefaultObs(P, env.teams_np)
    old_obs_size = old_builder.obs_size
    old_learner = PPOLearner(old_obs_size, env.num_actions, _small_ppo())
    old_params = old_learner.init(jax.random.PRNGKey(1)).params

    tl = TransferLearner(learner, old_learner,
                         TransferLearnConfig(batch_size=64, epochs=2))
    new_params, metrics = tl.run(env, params, old_params, old_builder,
                                 iterations=2, key=jax.random.PRNGKey(2))
    assert "transfer_learn_loss" in metrics
    assert "transfer_learn_accuracy" in metrics
    # the distilled policy must have moved
    diff = jax.tree_util.tree_reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.sum(jnp.abs(a - b))),
                     params.policy, new_params.policy))
    assert diff > 0.0


def test_skill_tracker_continuation():
    """Too few goals force a continuation with persisted env states
    (reference: PolicyVersionManager.cpp:289-299)."""
    from reinforcement_learning_tpu.learn import selfplay as sp
    from reinforcement_learning_tpu.learn.ppo import PPOLearner

    cfg = sp.SkillTrackerConfig(enabled=True, num_arenas=2, sim_time=0.2,
                                max_sim_time=10.0)
    env = _small_env()
    learner = PPOLearner(env.obs_size, env.num_actions, _small_ppo())
    params = learner.init(jax.random.PRNGKey(0)).params
    tracker = sp.SkillTracker(learner, 1, cfg)
    bank = sp.VersionBank.make(params, 4, cfg.initial_rating)
    bank = sp.add_version(bank, params, jnp.int32(1))

    rng = np.random.RandomState(0)
    bank, rating, info = tracker.run_matches(params, bank, rng)
    # 0.2s of kickoff play cannot produce 2 goals -> continuation
    assert tracker.continuation
    assert tracker.env_states is not None
    states_before = tracker.env_states
    prev_idx, prev_team = tracker.prev_old_idx, tracker.prev_new_team
    bank, rating, info = tracker.run_matches(params, bank, rng)
    # the second run must still be a continuation (0.2s more of kickoff
    # play cannot reach 2 goals) and must have kept the SAME choices
    assert tracker.continuation
    assert tracker.prev_old_idx == prev_idx
    assert tracker.prev_sim_time > 0
