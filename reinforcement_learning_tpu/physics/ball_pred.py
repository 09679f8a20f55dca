"""Ball trajectory prediction — the BallPredTracker equivalent.

The reference keeps a car-less internal arena and steps only the ball
forward ``numPredTicks`` to serve bots a lookahead trajectory
(reference: Sim/BallPredTracker/BallPredTracker.{h,cpp}:1-80 —
``UpdatePredFromArena`` re-simulates from the first changed tick,
``GetBallStateForTime`` samples by delta time).  Here the predictor is a
jitted ``lax.scan`` of the ball-only subset of the engine tick — the
same contact resolve and integration the full tick uses
(physics/step.arena_tick ball path, physics/contacts.resolve_ball_world)
— so the prediction is exactly what the engine would simulate with no
cars touching the ball.  Incremental re-use of the old prediction is a
CPU-side optimization the reference needs (BallPredTracker.cpp:37-60);
one fused scan re-predicts the whole horizon in microseconds on TPU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu import maths as m
from reinforcement_learning_tpu.physics import contacts
from reinforcement_learning_tpu.physics import world as worldmod
from reinforcement_learning_tpu.physics.state import BallState, MutatorConfig


def ball_only_tick(ball: BallState, mut: MutatorConfig,
                   game_mode: str = "soccar", use_mesh: bool = True,
                   dt: float = 1.0 / 120.0) -> BallState:
    """One physics tick of the ball with no cars (the ball-relevant subset
    of Arena::Step, Arena.cpp:716-812: sleep, gravity+drag, world contact,
    transform integration, clamps)."""
    with jax.default_matmul_precision("float32"):
        return _ball_only_tick(ball, mut, game_mode, use_mesh, dt)


def _ball_only_tick(ball, mut, game_mode, use_mesh, dt):
    # float32 matmul precision matches arena_tick (see step.arena_tick)
    grid = worldmod.get_grid(game_mode) if use_mesh else None
    gravity = jnp.array([0.0, 0.0, mut.gravity_z])

    ball_awake = (m.norm(ball.vel) > 0) | (m.norm(ball.ang_vel) > 0)
    ball_vel_pre = ball.vel
    drag = (1.0 - mut.ball_drag) ** dt
    ball = ball.replace(vel=jnp.where(ball_awake,
                                      (ball.vel + gravity * dt) * drag,
                                      ball.vel))

    puck_axis = ball.rot[:, 2] if game_mode == "snowday" else None
    bw_dv, bw_dw, bw_push, _, _ = contacts.resolve_ball_world(
        ball, mut, puck_axis, game_mode, vel_pre_uu=ball_vel_pre,
        grid=grid)
    ball = ball.replace(vel=ball.vel + bw_dv, ang_vel=ball.ang_vel + bw_dw)

    ball_awake = (m.norm(ball.vel) > 0) | (m.norm(ball.ang_vel) > 0)
    ball = ball.replace(
        pos=ball.pos + jnp.where(ball_awake, ball.vel * dt + bw_push, 0.0),
        rot=jnp.where(ball_awake,
                      m.integrate_rotation(ball.rot, ball.ang_vel, dt),
                      ball.rot),
        vel=m.clamp_norm(ball.vel, mut.ball_max_speed),
        ang_vel=m.clamp_norm(ball.ang_vel, C.BALL_MAX_ANG_SPEED))
    return ball


@partial(jax.jit,
         static_argnames=("mut", "num_ticks", "game_mode", "use_mesh"))
def predict_ball(ball: BallState, mut: MutatorConfig, num_ticks: int,
                 game_mode: str = "soccar",
                 use_mesh: bool = True) -> BallState:
    """Predict ``num_ticks`` future ball states (BallPredTracker.cpp:62-69
    re-predict loop).  Returns a BallState pytree with a leading (T,)
    axis; entry t is the state after t+1 ticks."""

    def tick(b, _):
        nb = ball_only_tick(b, mut, game_mode, use_mesh)
        return nb, nb

    _, traj = jax.lax.scan(tick, ball, None, length=num_ticks)
    return traj


class BallPredTracker:
    """API mirror of the reference tracker (BallPredTracker.h:10-38)."""

    def __init__(self, num_pred_ticks: int = 120,
                 mut: MutatorConfig | None = None,
                 game_mode: str = "soccar", use_mesh: bool = True):
        self.num_pred_ticks = num_pred_ticks
        self.mut = mut or MutatorConfig.for_mode(game_mode)
        self.game_mode = game_mode
        self.use_mesh = use_mesh
        self.pred: BallState | None = None

    def update(self, ball: BallState) -> BallState:
        """UpdatePredFromArena: refresh the whole horizon from the current
        ball state (full re-predict; one fused scan).  Like the reference's
        ``predData`` (BallPredTracker.cpp:37-60), entry 0 is the CURRENT
        state and entry t is the state after t ticks."""
        traj = predict_ball(ball, self.mut, self.num_pred_ticks - 1,
                            self.game_mode, self.use_mesh)
        self.pred = jax.tree.map(
            lambda cur, fut: jnp.concatenate([cur[None], fut], axis=0),
            ball, traj)
        return self.pred

    def get_ball_state_for_time(self, delta_time: float) -> BallState:
        """GetBallStateForTime (BallPredTracker.cpp:71-79): floors
        ``predTime / tickTime`` into predData, so delta_time=0 returns the
        current state."""
        assert self.pred is not None, "call update() first"
        idx = int(delta_time * 120.0)
        idx = max(0, min(self.num_pred_ticks - 1, idx))
        return jax.tree.map(lambda x: x[idx], self.pred)
