"""Game event tracking: shot / goal / save / assist inference.

Vectorized re-design of ``GameEventTracker`` (reference:
RocketSim/src/Sim/GameEventTracker/GameEventTracker.{h,cpp}) plus the
bump/demo arena callbacks (EnvSet.cpp:31-42).  Runs once per env step as a
pure function over (tracker state, arena state) -> (tracker state, events).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import struct

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu import maths as m


@dataclasses.dataclass(frozen=True)
class EventConfig:
    """GameEventTrackerConfig defaults (GameEventTracker.h:10-40)."""
    shot_min_speed: float = 1750.0
    shot_touch_min_delay: float = 0.3
    pred_score_extra_margin: float = 0.0
    shot_event_cooldown: float = 1.0
    shot_min_score_time: float = 2.0
    goal_max_touch_time: float = 4.0
    pass_max_touch_time: float = 2.0


@struct.dataclass
class TrackerState:
    ball_shot: jnp.ndarray        # () bool
    shot_goal_team: jnp.ndarray   # () int32 — net being shot at
    shot_cooldown: jnp.ndarray    # () float
    ball_scored_last: jnp.ndarray  # () bool

    @staticmethod
    def make():
        return TrackerState(
            ball_shot=jnp.zeros((), bool),
            shot_goal_team=jnp.zeros((), jnp.int32),
            shot_cooldown=jnp.zeros((), jnp.float32),
            ball_scored_last=jnp.zeros((), bool))


EVENT_NAMES = ("goal", "assist", "shot", "shot_pass", "save", "bump",
               "bumped", "demo", "demoed")


def is_ball_probably_going_in(ball_pos, ball_vel, mut, max_time,
                              extra_margin):
    """Arena::IsBallProbablyGoingIn, soccar path (Arena.cpp:827-863).
    Returns (going_in (), goal_team ())."""
    vy = ball_vel[1]
    has_vy = jnp.abs(vy) > 1e-7
    score_sign = jnp.sign(vy)
    goal_y = mut.goal_base_threshold_y * score_sign
    dist = jnp.abs(ball_pos[1] - goal_y)
    time_to_goal = dist / jnp.maximum(jnp.abs(vy), 1e-7)

    gravity = jnp.array([0.0, 0.0, mut.gravity_z])
    extrap = ball_pos + ball_vel * time_to_goal \
        + gravity * time_to_goal ** 2 / 2

    margin = mut.ball_radius * 0.1 + extra_margin
    ok = (has_vy & (time_to_goal <= max_time)
          & (extrap[2] <= C.GOAL_HEIGHT + margin)
          & (jnp.abs(extrap[0]) <= C.GOAL_HALF_WIDTH + margin))
    goal_team = jnp.where(score_sign > 0, 1, 0).astype(jnp.int32)
    return ok, goal_team


def _shooter_passer(cars, teams, team, tick_count, max_shooter_ticks,
                    max_passer_ticks):
    """GetShooterPasser (GameEventTracker.cpp:5-46): returns
    (found (), shooter_onehot (P,), passer_onehot (P,))."""
    valid = cars.ball_hit_valid & (teams == team)
    recent = valid & (cars.ball_hit_tick + max_shooter_ticks >= tick_count)
    # shooter: most recent hit among eligible
    hit_ticks = jnp.where(recent, cars.ball_hit_tick, -1)
    shooter_idx = jnp.argmax(hit_ticks)
    found = jnp.any(recent)
    shooter = (jnp.arange(teams.shape[0]) == shooter_idx) & found

    shoot_tick = cars.ball_hit_tick[shooter_idx]
    passer_ok = valid & ~shooter & (
        cars.ball_hit_tick + max_passer_ticks >= shoot_tick)
    passer_ticks = jnp.where(passer_ok, cars.ball_hit_tick, -1)
    passer_idx = jnp.argmax(passer_ticks)
    passer = (jnp.arange(teams.shape[0]) == passer_idx) & jnp.any(passer_ok) \
        & found
    return found, shooter, passer


def update_tracker(tracker: TrackerState, cars, ball, teams, tick_count,
                   goal_scored, tick_skip: int, mut,
                   cfg: EventConfig = EventConfig()):
    """One env-step update (GameEventTracker::Update, :48-158).

    Returns (new TrackerState, events dict name -> (P,) bool).
    """
    tickrate = 120.0
    delta_ticks = tick_skip
    delta_time = delta_ticks / tickrate
    P = teams.shape[0]
    no_event = jnp.zeros((P,), bool)
    events = {k: no_event for k in
              ("goal", "assist", "shot", "shot_pass", "save")}

    scored = goal_scored
    new_goal = scored & ~tracker.ball_scored_last

    # --- goal / assist
    scoring_team = jnp.where(ball.pos[1] < 0, 1, 0).astype(jnp.int32)
    gfound, gshooter, gpasser = _shooter_passer(
        cars, teams, scoring_team, tick_count,
        jnp.int32(cfg.goal_max_touch_time * tickrate),
        jnp.int32(cfg.pass_max_touch_time * tickrate))
    events["goal"] = jnp.where(new_goal & gfound, gshooter, no_event)
    events["assist"] = jnp.where(new_goal & gfound, gpasser, no_event)

    # --- shot detection (only when not scored)
    going_in, goal_team = is_ball_probably_going_in(
        ball.pos, ball.vel, mut, cfg.shot_min_score_time,
        cfg.pred_score_extra_margin)
    speed_ok = jnp.sum(ball.vel ** 2) >= cfg.shot_min_speed ** 2
    cooldown = jnp.maximum(tracker.shot_cooldown - delta_time, 0.0)
    can_shoot = ~tracker.ball_shot & (tracker.shot_cooldown <= 0)

    shooter_team = 1 - goal_team
    min_delay_ticks = jnp.int32(cfg.shot_touch_min_delay * tickrate)
    sfound, sshooter, spasser = _shooter_passer(
        cars, teams, shooter_team, tick_count,
        delta_ticks + min_delay_ticks,
        jnp.int32(cfg.pass_max_touch_time * tickrate))
    shooter_hit_tick = jnp.sum(jnp.where(sshooter, cars.ball_hit_tick, 0))
    delay_ok = (tick_count - shooter_hit_tick) >= min_delay_ticks

    shot_fires = (~scored & can_shoot & speed_ok & going_in & sfound
                  & delay_ok)
    events["shot"] = jnp.where(shot_fires, sshooter, no_event)
    events["shot_pass"] = jnp.where(shot_fires, spasser, no_event)

    # --- save detection (ball was shot, no longer going in)
    still_going_in, _ = is_ball_probably_going_in(
        ball.pos, ball.vel, mut, cfg.shot_min_score_time,
        cfg.pred_score_extra_margin)
    save_check = ~scored & tracker.ball_shot & ~still_going_in
    # saver: defending team (= shot_goal_team's side) touched within
    # delta_ticks
    vfound, vsaver, _ = _shooter_passer(
        cars, teams, tracker.shot_goal_team, tick_count, delta_ticks, 0)
    events["save"] = jnp.where(save_check & vfound, vsaver, no_event)

    new_ball_shot = jnp.where(shot_fires, True,
                              jnp.where(save_check, False,
                                        tracker.ball_shot & ~scored))
    new_cooldown = jnp.where(shot_fires, cfg.shot_event_cooldown,
                             jnp.where(can_shoot, cooldown,
                                       tracker.shot_cooldown))
    new_team = jnp.where(shot_fires, goal_team, tracker.shot_goal_team)

    new_tracker = TrackerState(
        ball_shot=new_ball_shot,
        shot_goal_team=new_team,
        shot_cooldown=new_cooldown,
        ball_scored_last=scored)
    return new_tracker, events
