"""The canonical training program: 2v2 soccar PPO with self-play.

TPU-native mirror of the reference's example app (reference:
src/ExampleMain.cpp:289-612), knob for knob:

  * the full reward stack incl. KickoffProximityReward2v2Enhanced,
    zero-sum wrappers, and the losing-team penalty (ExampleMain.cpp:132-177)
  * NoTouchCondition(8 s) + ScoreLimitCondition(3)  (ExampleMain.cpp:179-189)
  * AdvancedObs / DefaultAction / KickoffState      (ExampleMain.cpp:216-220)
  * per-step user metrics callback                  (ExampleMain.cpp:232-254)
  * ``--render`` mode (1 arena, stream to RocketSimVis) and
    ``--scale[=]`` model auto-scaling               (ExampleMain.cpp:300-330,
                                                     436-522)
  * tickSkip 8 / actionDelay 7, 512 games, seed 123, 100k ts/iter,
    minibatch 50k, 2 epochs, entropy 0.035 on normalized entropy,
    gamma 0.99, LR 2.5e-4, AdamW + LayerNorm + leaky-relu,
    shared 512x2 + policy 512x3 + critic 512x3 before scaling
                                                    (ExampleMain.cpp:352-584)
  * wandb metrics, checkpointing every 10M steps with auto-resume,
    'Q' save-and-quit                               (Learner.cpp:145-161,
                                                     224-298, 1011-1048)

Run:  python examples/train_2v2.py [iterations] [--render] [--scale=1.5]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from reinforcement_learning_tpu import maths as m
from reinforcement_learning_tpu.envs import rewards as R
from reinforcement_learning_tpu.envs import terminals as T
from reinforcement_learning_tpu.envs.env import EnvConfig, RocketLeagueEnv
from reinforcement_learning_tpu.envs.kickoff_reward import (
    kickoff_proximity_reward_2v2)
from reinforcement_learning_tpu.envs.rewards import WeightedReward
from reinforcement_learning_tpu.learn import selfplay as sp
from reinforcement_learning_tpu.learn.ppo import PPOConfig
from reinforcement_learning_tpu.learn.trainer import Trainer, TrainerConfig
from reinforcement_learning_tpu.utils.keypress import KeyPressDetector
from reinforcement_learning_tpu.utils.metrics import MetricSender
from reinforcement_learning_tpu.utils.report import Report


# --- env factory (reference: EnvCreateFunc, ExampleMain.cpp:128-226) -------

def make_env(num_envs: int, render_mode: bool,
             backend: str = "auto") -> RocketLeagueEnv:
    cfg = EnvConfig(
        num_envs=1 if render_mode else num_envs,
        team_size=2,                      # playersPerTeam = 2
        tick_skip=8, action_delay=7,      # actionDelay = tickSkip - 1
        no_touch_timeout=8.0,
        max_episode_seconds=300.0,        # cfg.ppo.maxEpisodeDuration
        physics_backend=backend,
    )
    rewards = [
        # Movement
        WeightedReward(R.air_reward(), 0.25),
        WeightedReward(R.wavedash_reward(), 0.12),
        WeightedReward(kickoff_proximity_reward_2v2(), 5.0),
        # Player-ball
        WeightedReward(R.velocity_player_to_ball_reward(), 4.0),
        WeightedReward(R.strong_touch_reward(20, 120), 60.0),
        WeightedReward(R.touch_accel_reward(), 6.0),
        # Ball-goal
        WeightedReward(R.zero_sum(R.velocity_ball_to_goal_reward(), 1.0),
                       8.0),
        # Boost
        WeightedReward(R.pickup_boost_reward(), 0.1),
        WeightedReward(R.save_boost_reward(), 0.010),
        # Game events
        WeightedReward(R.zero_sum(R.bump_reward(), 0.5), 20.0),
        WeightedReward(R.zero_sum(R.demo_reward(), 0.5), 80.0),
        WeightedReward(R.zero_sum(R.goal_reward(), 1.0), 150.0),
        # Losing-team catch-up penalty
        WeightedReward(R.losing_penalty_reward(0.02), 1.0),
    ]
    conds = [
        T.no_touch_condition(8.0, cfg.step_seconds),
        T.score_limit_condition(3),
        T.timeout_condition(cfg.max_episode_seconds, cfg.step_seconds),
    ]
    return RocketLeagueEnv(cfg, reward_fns=rewards, terminal_conds=conds)


# --- per-step user metrics (reference: StepCallback, ExampleMain.cpp:232-254)

def step_metrics(env_states, out):
    cars = env_states.phys.arena.cars
    ball = env_states.phys.arena.ball
    speed = m.norm(cars.vel)
    to_ball = m.normalize(ball.pos[:, None, :] - cars.pos)
    toward = jnp.maximum(0.0, jnp.sum(cars.vel * to_ball, axis=-1))
    return {
        "Player/In Air Ratio": (~cars.is_on_ground).astype(jnp.float32),
        "Player/Ball Touch Ratio": out.ball_touched.astype(jnp.float32),
        "Player/Demoed Ratio": cars.is_demoed.astype(jnp.float32),
        "Player/Speed": speed,
        "Player/Speed Towards Ball": toward,
        "Player/Boost": cars.boost,
        "Player/Touch Height": (
            jnp.broadcast_to(ball.pos[:, None, 2], out.ball_touched.shape),
            out.ball_touched),
        "Game/Goal Speed": (m.norm(ball.vel), out.goal_scored),
    }


# --- model scaling (reference: ExampleMain.cpp:436-522) ---------------------

def scaled_sizes(base: tuple, scale: float) -> tuple:
    out = []
    for v in base:
        nv = max(1, round(v * scale))
        if nv % 8:
            nv += 8 - nv % 8       # keep multiples of 8 for MXU tiling
        out.append(nv)
    return tuple(out)


def auto_scale(num_games: int) -> float:
    try:
        plat = jax.devices()[0].platform
    except Exception:
        plat = "cpu"
    if plat != "cpu":
        scale = 1.4                # single accelerator baseline
        if len(jax.devices()) >= 2:
            scale = 1.8
        if len(jax.devices()) >= 4:
            scale = 2.2
        if num_games >= 512:
            scale += 0.1
    else:
        import os
        hc = os.cpu_count() or 4
        scale = 1.25 if hc >= 16 else (1.15 if hc >= 8 else 1.05)
    return min(max(scale, 1.0), 3.0)


# --- render mode (reference: Learner.cpp:799-802 + RenderSender) ------------

def run_render(env: RocketLeagueEnv, trainer: Trainer, state,
               time_scale: float = 1.0):
    from reinforcement_learning_tpu.utils.render import RenderSender

    sender = RenderSender(time_scale=time_scale,
                          step_seconds=env.config.step_seconds)
    learner = trainer.learner
    env_states, obs, masks = env.reset(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)

    @jax.jit
    def step(env_states, obs, masks, key):
        key, k = jax.random.split(key)
        actions, _ = learner.sample_actions(
            state.ppo.params, obs.reshape(-1, obs.shape[-1]),
            masks.reshape(-1, masks.shape[-1]), k)
        env_states, out = env.step(env_states, actions.reshape(obs.shape[:-1]))
        return env_states, out, key

    print("render mode: streaming to RocketSimVis (UDP 127.0.0.1:9273)")
    while True:
        env_states, out, key = step(env_states, obs, masks, key)
        obs, masks = out.obs, out.action_mask
        arena0 = jax.tree.map(lambda x: np.asarray(x[0]),
                              env_states.phys.arena)
        sender.send(arena0, env.teams_np,
                    ball_touched=np.asarray(out.ball_touched[0]))


def main():
    iterations = 1_000_000
    render_mode = False
    scale = -1.0
    backend = "auto"
    for arg in sys.argv[1:]:
        if arg == "--render":
            render_mode = True
        elif arg.startswith("--scale="):
            scale = float(arg.split("=", 1)[1])
        elif arg.startswith("--backend="):
            backend = arg.split("=", 1)[1]
        elif arg.isdigit():
            iterations = int(arg)

    num_games = 512
    env = make_env(num_games, render_mode, backend)

    if scale <= 0:
        scale = auto_scale(num_games)
    print(f"model scale factor: {scale}")
    shared = scaled_sizes((512, 512), scale)
    policy = scaled_sizes((512, 512, 512), scale)
    critic = scaled_sizes((512, 512, 512), scale)
    print(f"shared head sizes: {list(shared)}")
    print(f"policy sizes: {list(policy)}")
    print(f"critic sizes: {list(critic)}")

    ts_per_itr = 100_000
    ppo = PPOConfig(
        ts_per_itr=ts_per_itr,
        batch_size=ts_per_itr,
        mini_batch_size=50_000,
        max_episode_duration=300.0,
        epochs=2,
        entropy_scale=0.035,
        gae_gamma=0.99,
        policy_lr=2.5e-4, critic_lr=2.5e-4,
        shared_head_layers=shared,
        policy_layers=policy,
        critic_layers=critic,
        optim="adamw",
        activation="leaky_relu",
        layer_norm=True,
        half_precision=True,
    )
    trainer_cfg = TrainerConfig(
        ts_per_itr=ts_per_itr,
        random_seed=123,
        checkpoint_folder="checkpoints/train_2v2",
        ts_per_save=10_000_000,
        checkpoints_to_keep=8,
    )
    selfplay = sp.SelfPlayConfig(
        save_versions=True, ts_per_version=25_000_000, max_versions=32,
        train_against_old=True, train_against_old_chance=0.15,
        skill=sp.SkillTrackerConfig(enabled=True, num_arenas=16,
                                    update_interval=16, rating_inc=5.0))

    trainer = Trainer(env, ppo, trainer_cfg, selfplay=selfplay,
                      step_metrics_fn=step_metrics)
    print("param counts:", trainer.learner.param_counts())
    state = trainer.init_or_resume()
    start_iter = int(jax.device_get(state.iterations))
    if start_iter:
        print(f"resumed from iteration {start_iter}")

    if render_mode:
        run_render(env, trainer, state)
        return

    sender = MetricSender(project="Reinforcement Learning",
                          group="Rocket League", run_name="tpu-2v2")
    quit_key = KeyPressDetector("qQ")

    def log(it, metrics):
        rep = Report(metrics)
        print(f"--- iteration {it} "
              f"({metrics['steps_per_second']:,.0f} steps/s) ---")
        print(rep.display())
        sender.send(metrics, step=it)

    try:
        trainer.train(state, iterations, log_fn=log,
                      stop_fn=quit_key.pressed)
    finally:
        sender.close()


if __name__ == "__main__":
    main()
