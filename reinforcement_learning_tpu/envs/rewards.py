"""Reward functions.

Re-design of the reference reward system (reference: RLGymCPP/Rewards/):
each reward is a pure function ``fn(ctx) -> (P,) float`` over a per-arena
``RewardCtx``; the env computes a weighted sum exactly like
``EnvSet::StepSecondHalf`` (EnvSet.cpp:202-250).  ``ZeroSumReward`` wraps a
child function with team-spirit mixing (ZeroSumReward.cpp:18-48).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu import maths as m
from flax import struct


@struct.dataclass
class RewardCtx:
    """Everything a reward can see for one arena (leading axis P where
    per-player).  Mirrors GameState/Player (Gamestates/GameState.h:20-75)."""
    cars: object          # CarsState, current
    prev_cars: object     # CarsState, previous step (valid if has_prev)
    ball: object          # BallState
    prev_ball: object
    teams: jnp.ndarray    # (P,) int32, 0=blue 1=orange
    ball_touched_step: jnp.ndarray  # (P,) bool
    goal_scored: jnp.ndarray        # () bool
    has_prev: jnp.ndarray           # () bool — False on the reset step
    is_final: jnp.ndarray           # () int32 TerminalType for this step
    events: dict                    # name -> (P,) bool event flags
    blue_score: jnp.ndarray = dataclasses.field(       # goals this episode
        default_factory=lambda: jnp.zeros((), jnp.int32))
    orange_score: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))


RewardFn = Callable[[RewardCtx], jnp.ndarray]

ORANGE_GOAL_BACK = jnp.array([0.0, 6000.0, C.GOAL_HEIGHT / 2])
BLUE_GOAL_BACK = jnp.array([0.0, -6000.0, C.GOAL_HEIGHT / 2])


# --- event rewards (CommonRewards.h:7-28) ---------------------------------

def event_reward(name: str, negative: bool = False) -> RewardFn:
    def fn(ctx: RewardCtx) -> jnp.ndarray:
        val = ctx.events[name].astype(jnp.float32)
        return -val if negative else val
    fn.__name__ = f"Event_{name}{'_neg' if negative else ''}"
    return fn


def player_goal_reward():
    return event_reward("goal")


def assist_reward():
    return event_reward("assist")


def shot_reward():
    return event_reward("shot")


def save_reward():
    return event_reward("save")


def bump_reward():
    return event_reward("bump")


def bumped_penalty():
    return event_reward("bumped", negative=True)


def demo_reward():
    return event_reward("demo")


def demoed_penalty():
    return event_reward("demoed", negative=True)


# --- continuous rewards ----------------------------------------------------

def goal_reward(concede_scale: float = -1.0) -> RewardFn:
    """Team goal reward, already zero-sum (CommonRewards.h:31-45)."""
    def fn(ctx: RewardCtx) -> jnp.ndarray:
        # RS_TEAM_FROM_Y(y): y<0 -> blue.  The ball is in the net on its
        # y-sign side; the scoring team is the other one.
        net_side_team = jnp.where(ctx.ball.pos[1] < 0, 0, 1)
        scored = (ctx.teams != net_side_team).astype(jnp.float32)
        val = jnp.where(scored > 0, 1.0, concede_scale)
        return jnp.where(ctx.goal_scored, val, 0.0)
    fn.__name__ = "GoalReward"
    return fn


def velocity_reward(is_negative: bool = False) -> RewardFn:
    def fn(ctx):
        return m.norm(ctx.cars.vel) / C.CAR_MAX_SPEED * (1 - 2 * is_negative)
    fn.__name__ = "VelocityReward"
    return fn


def velocity_ball_to_goal_reward(own_goal: bool = False) -> RewardFn:
    def fn(ctx):
        target_orange = (ctx.teams == 0) ^ own_goal
        target = jnp.where(target_orange[:, None], ORANGE_GOAL_BACK,
                           BLUE_GOAL_BACK)
        dir_to_goal = m.normalize(target - ctx.ball.pos)
        return m.dot(dir_to_goal, ctx.ball.vel / C.BALL_MAX_SPEED)
    fn.__name__ = "VelocityBallToGoalReward"
    return fn


def velocity_player_to_ball_reward() -> RewardFn:
    def fn(ctx):
        dir_to_ball = m.normalize(ctx.ball.pos - ctx.cars.pos)
        return m.dot(dir_to_ball, ctx.cars.vel / C.CAR_MAX_SPEED)
    fn.__name__ = "VelocityPlayerToBallReward"
    return fn


def face_ball_reward() -> RewardFn:
    def fn(ctx):
        dir_to_ball = m.normalize(ctx.ball.pos - ctx.cars.pos)
        return m.dot(ctx.cars.forward, dir_to_ball)
    fn.__name__ = "FaceBallReward"
    return fn


def touch_ball_reward() -> RewardFn:
    def fn(ctx):
        return ctx.ball_touched_step.astype(jnp.float32)
    fn.__name__ = "TouchBallReward"
    return fn


def speed_reward() -> RewardFn:
    def fn(ctx):
        return m.norm(ctx.cars.vel) / C.CAR_MAX_SPEED
    fn.__name__ = "SpeedReward"
    return fn


def wavedash_reward() -> RewardFn:
    """CommonRewards.h:107-119: landed while previously flipping."""
    def fn(ctx):
        r = (ctx.cars.is_on_ground & ctx.prev_cars.is_flipping
             & ~ctx.prev_cars.is_on_ground).astype(jnp.float32)
        return jnp.where(ctx.has_prev, r, 0.0)
    fn.__name__ = "WavedashReward"
    return fn


def pickup_boost_reward() -> RewardFn:
    """CommonRewards.h:120-132: sqrt-difference of boost on pickup."""
    def fn(ctx):
        gained = ctx.cars.boost > ctx.prev_cars.boost
        r = jnp.sqrt(ctx.cars.boost / 100.0) - jnp.sqrt(
            ctx.prev_cars.boost / 100.0)
        return jnp.where(ctx.has_prev & gained, r, 0.0)
    fn.__name__ = "PickupBoostReward"
    return fn


def save_boost_reward(exponent: float = 0.5) -> RewardFn:
    def fn(ctx):
        return jnp.clip((ctx.cars.boost / 100.0) ** exponent, 0.0, 1.0)
    fn.__name__ = "SaveBoostReward"
    return fn


def air_reward() -> RewardFn:
    def fn(ctx):
        return (~ctx.cars.is_on_ground).astype(jnp.float32)
    fn.__name__ = "AirReward"
    return fn


def touch_accel_reward() -> RewardFn:
    """CommonRewards.h:153-178: reward for speeding the ball up, total 1.0
    from 0 to 110 kph."""
    max_speed = C.kph_to_vel(110)

    def fn(ctx):
        prev_frac = jnp.minimum(1.0, m.norm(ctx.prev_ball.vel) / max_speed)
        cur_frac = jnp.minimum(1.0, m.norm(ctx.ball.vel) / max_speed)
        gain = jnp.maximum(cur_frac - prev_frac, 0.0)
        return jnp.where(ctx.has_prev & ctx.ball_touched_step, gain, 0.0)
    fn.__name__ = "TouchAccelReward"
    return fn


def strong_touch_reward(min_kph: float = 20, max_kph: float = 130) -> RewardFn:
    """CommonRewards.h:181-203."""
    min_vel, max_vel = C.kph_to_vel(min_kph), C.kph_to_vel(max_kph)

    def fn(ctx):
        hit_force = m.norm(ctx.ball.vel - ctx.prev_ball.vel)
        r = jnp.where(hit_force < min_vel, 0.0,
                      jnp.minimum(1.0, hit_force / max_vel))
        return jnp.where(ctx.has_prev & ctx.ball_touched_step, r, 0.0)
    fn.__name__ = "StrongTouchReward"
    return fn


# --- wrappers --------------------------------------------------------------

def losing_penalty_reward(penalty_per_goal_behind: float = 0.01) -> RewardFn:
    """Continuous penalty for players whose team trails on the episode
    score, proportional to the deficit (reference: LosingPenaltyReward,
    ExampleMain.cpp:86-124)."""
    def fn(ctx: RewardCtx) -> jnp.ndarray:
        blue = ctx.blue_score.astype(jnp.float32)
        orange = ctx.orange_score.astype(jnp.float32)
        deficit = jnp.where(ctx.teams == 0, orange - blue, blue - orange)
        return -penalty_per_goal_behind * jnp.maximum(deficit, 0.0)
    fn.__name__ = "LosingPenaltyReward"
    return fn


def zero_sum(child: RewardFn, team_spirit: float = 1.0,
             opponent_scale: float = 1.0) -> RewardFn:
    """ZeroSumReward (ZeroSumReward.cpp:18-48):
    own*(1-spirit) + avgTeam*spirit - avgOpp*scale."""
    def fn(ctx: RewardCtx) -> jnp.ndarray:
        raw = child(ctx)
        blue = (ctx.teams == 0).astype(jnp.float32)
        orange = 1.0 - blue
        n_blue = jnp.maximum(jnp.sum(blue), 1.0)
        n_orange = jnp.maximum(jnp.sum(orange), 1.0)
        avg_blue = jnp.sum(raw * blue) / n_blue
        avg_orange = jnp.sum(raw * orange) / n_orange
        avg_team = jnp.where(ctx.teams == 0, avg_blue, avg_orange)
        avg_opp = jnp.where(ctx.teams == 0, avg_orange, avg_blue)
        return (raw * (1.0 - team_spirit) + avg_team * team_spirit
                - avg_opp * opponent_scale)
    fn.__name__ = f"ZeroSum_{getattr(child, '__name__', 'child')}"
    return fn


@dataclasses.dataclass
class WeightedReward:
    fn: RewardFn
    weight: float

    @property
    def name(self):
        return getattr(self.fn, "__name__", "reward")


def combine_rewards(weighted: list[WeightedReward]):
    """Returns fn(ctx) -> (total (P,), per_reward dict name->(P,))."""
    def fn(ctx: RewardCtx):
        per = {}
        total = None
        for wr in weighted:
            r = wr.fn(ctx)
            per[wr.name] = r
            total = r * wr.weight if total is None else total + r * wr.weight
        return total, per
    return fn
