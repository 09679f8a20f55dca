"""Terminal conditions.

Reference: RLGymCPP/TerminalConditions/ — conditions return a
``TerminalType`` (NOT / NORMAL / TRUNCATED, TerminalCondition.h:6-22);
NORMAL wins over TRUNCATED when both fire (EnvSet.cpp:166-180).  The
terminal-vs-truncation distinction drives GAE bootstrapping.
"""

from __future__ import annotations

import jax.numpy as jnp

NOT_TERMINAL = 0
NORMAL = 1
TRUNCATED = 2


def goal_score_condition():
    """Terminal when a goal was scored this step (GoalScoreCondition.h)."""
    def fn(ctx) -> jnp.ndarray:
        return jnp.where(ctx.goal_scored, NORMAL, NOT_TERMINAL)
    fn.__name__ = "GoalScoreCondition"
    return fn


def no_touch_condition(timeout_seconds: float, step_seconds: float):
    """Truncation after no player touches the ball for ``timeout_seconds``
    (NoTouchCondition.h:5-33).  Uses ctx.steps_since_touch maintained by
    the env."""
    limit = int(round(timeout_seconds / step_seconds))

    def fn(ctx) -> jnp.ndarray:
        return jnp.where(ctx.steps_since_touch >= limit, TRUNCATED,
                         NOT_TERMINAL)
    fn.__name__ = "NoTouchCondition"
    return fn


def timeout_condition(timeout_seconds: float, step_seconds: float):
    """Truncation after a fixed episode length."""
    limit = int(round(timeout_seconds / step_seconds))

    def fn(ctx) -> jnp.ndarray:
        return jnp.where(ctx.steps_since_reset >= limit, TRUNCATED,
                         NOT_TERMINAL)
    fn.__name__ = "TimeoutCondition"
    return fn


def score_limit_condition(limit_goals: int):
    """Terminal when either team reaches ``limit_goals`` this episode
    (reference: ScoreLimitCondition, ExampleMain.cpp:46-82).  Uses the
    per-episode score counters maintained by the env (which, like the
    reference, count every goalScored step)."""
    def fn(ctx) -> jnp.ndarray:
        done = (ctx.blue_score >= limit_goals) | (
            ctx.orange_score >= limit_goals)
        return jnp.where(done, NORMAL, NOT_TERMINAL)
    fn.__name__ = "ScoreLimitCondition"
    return fn


def combine_conditions(conds):
    """EnvSet.cpp:166-180: NOT < TRUNCATED < NORMAL precedence."""
    def fn(ctx) -> jnp.ndarray:
        result = jnp.asarray(NOT_TERMINAL, jnp.int32)
        for cond in conds:
            cur = cond(ctx)
            result = jnp.where(cur == NORMAL, NORMAL,
                               jnp.where(result == NOT_TERMINAL, cur, result))
        return result.astype(jnp.int32)
    return fn
