"""Vectorized environment: the TPU-native equivalent of ``EnvSet``.

The reference steps N C++ arenas on a thread pool with a split-step that
overlaps CPU physics with GPU inference (reference: EnvSet/EnvSet.cpp).
Here all N arenas live in one batched pytree and one jitted program steps
them in lockstep; the split-step overlap is unnecessary (physics and policy
fuse into one XLA program) but the action-delay semantics are preserved in
``physics.step.arena_step``.

Auto-reset: terminal arenas are re-seeded by the state setter inside the
same jitted step (reference: EnvSet::Reset called from the learner loop).
The pre-reset ("final") observation is returned separately for GAE
truncation bootstrapping.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from reinforcement_learning_tpu import constants as C
from reinforcement_learning_tpu import maths as m
from reinforcement_learning_tpu.envs import events as eventsmod
from reinforcement_learning_tpu.envs import state_setters, terminals
from reinforcement_learning_tpu.envs.actions import DefaultAction
from reinforcement_learning_tpu.envs.obs import AdvancedObs
from reinforcement_learning_tpu.envs.rewards import (RewardCtx,
                                                     WeightedReward,
                                                     combine_rewards)
from reinforcement_learning_tpu.physics import step as stepmod
from reinforcement_learning_tpu.physics import world as worldmod
from reinforcement_learning_tpu.physics.state import NUM_CONTROLS


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """Mirror of EnvSetConfig + plugin set (reference: EnvSet.h:26-33 and
    ExampleMain.cpp:128-226)."""
    num_envs: int = 64
    team_size: int = 1
    spawn_opponents: bool = True
    tick_skip: int = 8
    action_delay: int = 7
    game_mode: str = "soccar"  # soccar | hoops | heatseeker | snowday
    arena: stepmod.ArenaParams = None  # filled in __post_init__
    no_touch_timeout: float = 30.0
    max_episode_seconds: float = 300.0
    # "pallas": whole multi-tick physics step as ONE TPU megakernel
    # (ops/pallas_step) — state stays in VMEM across ticks.  "xla": the
    # per-arena vmapped lax.scan reference path (runs anywhere).
    # "auto": pallas on TPU, xla elsewhere.
    physics_backend: str = "auto"

    @property
    def cars_per_arena(self) -> int:
        return self.team_size * (2 if self.spawn_opponents else 1)

    @property
    def step_seconds(self) -> float:
        return self.tick_skip / 120.0

    def make_teams(self) -> np.ndarray:
        n = self.cars_per_arena
        teams = np.zeros(n, np.int32)
        if self.spawn_opponents:
            teams[self.team_size:] = 1
        return teams


@struct.dataclass
class EnvState:
    """Per-arena env state (vmap over leading N axis)."""
    phys: stepmod.PhysicsState
    prev_arena: object            # ArenaState snapshot of previous step
    has_prev: jnp.ndarray         # () bool
    prev_actions: jnp.ndarray     # (P, 8) action floats shown in obs
    steps_since_touch: jnp.ndarray  # () int32
    steps_since_reset: jnp.ndarray  # () int32
    blue_score: jnp.ndarray       # () int32 goals since episode reset
    orange_score: jnp.ndarray     # () int32
    tracker: eventsmod.TrackerState
    key: jnp.ndarray              # per-env PRNG key


@struct.dataclass
class StepOutput:
    obs: jnp.ndarray          # (P, obs_size) — post-auto-reset
    final_obs: jnp.ndarray    # (P, obs_size) — pre-reset (for truncation)
    reward: jnp.ndarray       # (P,)
    terminal_type: jnp.ndarray  # () int32
    action_mask: jnp.ndarray  # (P, A) bool
    ball_touched: jnp.ndarray  # (P,) bool
    goal_scored: jnp.ndarray  # () bool
    reward_components: dict   # name -> (P,) raw per-reward values


@struct.dataclass
class TerminalCtx:
    goal_scored: jnp.ndarray
    steps_since_touch: jnp.ndarray
    steps_since_reset: jnp.ndarray
    blue_score: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))
    orange_score: jnp.ndarray = dataclasses.field(
        default_factory=lambda: jnp.zeros((), jnp.int32))


class RocketLeagueEnv:
    """Vectorized N-arena environment with pure jittable reset/step."""

    def __init__(self, config: EnvConfig,
                 reward_fns: Sequence[WeightedReward] | None = None,
                 obs_builder=None, action_parser=None,
                 terminal_conds=None, state_setter=None,
                 event_config: eventsmod.EventConfig | None = None):
        self.config = config
        if config.arena is None:
            config = dataclasses.replace(
                config, arena=stepmod.ArenaParams(
                    num_cars=config.cars_per_arena,
                    game_mode=config.game_mode))
            self.config = config
        if (config.game_mode not in ("soccar", "heatseeker", "snowday")
                and config.physics_backend == "pallas"):
            raise ValueError("the pallas megakernel backend supports "
                             "soccar, heatseeker and snowday (soccar "
                             "geometry); use physics_backend='xla' for "
                             f"{config.game_mode}")
        if (config.physics_backend == "pallas" and config.arena.use_mesh
                and not worldmod.is_procedural()):
            # Real .cmf assets: only the XLA grid path collides against
            # them; the megakernel's facet arena models the procedural
            # soccar mesh.
            raise ValueError(
                "physics_backend='pallas' with use_mesh requires the "
                "procedural arena (world.init(mesh_dir=None)); the XLA "
                "backend collides against real .cmf assets")
        self.params = config.arena
        self.teams_np = config.make_teams()
        self.teams = jnp.asarray(self.teams_np)
        P = config.cars_per_arena

        self.obs_builder = obs_builder or AdvancedObs(P, self.teams_np)
        self.action_parser = action_parser or DefaultAction()
        from reinforcement_learning_tpu.envs import rewards as R
        self.reward_fns = list(reward_fns) if reward_fns is not None else [
            WeightedReward(R.velocity_player_to_ball_reward(), 0.3),
            WeightedReward(R.touch_ball_reward(), 1.0),
            WeightedReward(R.goal_reward(), 30.0),
        ]
        self.reward_combined = combine_rewards(self.reward_fns)
        self.terminal_fn = terminals.combine_conditions(
            terminal_conds if terminal_conds is not None else [
                terminals.goal_score_condition(),
                terminals.no_touch_condition(config.no_touch_timeout,
                                             config.step_seconds),
                terminals.timeout_condition(config.max_episode_seconds,
                                            config.step_seconds),
            ])
        self.state_setter = state_setter or state_setters.kickoff_state()
        self.event_config = event_config or eventsmod.EventConfig()

        self.num_actions = self.action_parser.num_actions
        self.obs_size = self.obs_builder.obs_size

    # --- single-arena fns (vmapped by the public API) ---------------------

    def _reset_one(self, key) -> EnvState:
        kset, knext = jax.random.split(key)
        phys = self.state_setter(kset, self.params, self.teams)
        P = self.config.cars_per_arena
        return EnvState(
            phys=phys,
            prev_arena=phys.arena,
            has_prev=jnp.zeros((), bool),
            prev_actions=jnp.zeros((P, NUM_CONTROLS), jnp.float32),
            steps_since_touch=jnp.zeros((), jnp.int32),
            steps_since_reset=jnp.zeros((), jnp.int32),
            blue_score=jnp.zeros((), jnp.int32),
            orange_score=jnp.zeros((), jnp.int32),
            tracker=eventsmod.TrackerState.make(),
            key=knext)

    def _obs_one(self, state: EnvState) -> jnp.ndarray:
        arena = state.phys.arena
        return self.obs_builder.build(arena.cars, arena.ball, arena.pads,
                                      state.prev_actions, self.teams)

    def _mask_one(self, state: EnvState) -> jnp.ndarray:
        return self.action_parser.action_mask(state.phys.arena.cars)

    def _step_one(self, state: EnvState, action_idx: jnp.ndarray
                  ) -> tuple[EnvState, StepOutput]:
        cfg = self.config
        key, kstep, kreset = jax.random.split(state.key, 3)
        controls = self.action_parser.parse(action_idx)

        phys = stepmod.arena_step(
            state.phys, controls, self.teams, kstep, self.params,
            cfg.tick_skip, cfg.action_delay)
        return self._post_physics_one(state, phys, controls, key, kreset)

    def _post_physics_one(self, state: EnvState, phys, controls,
                          key, kreset) -> tuple[EnvState, StepOutput]:
        """Everything after the physics advance: touch attribution, events,
        terminals, rewards, auto-reset, obs."""
        cfg = self.config
        prev_arena = state.phys.arena
        arena = phys.arena

        # Ball touch attribution (Player.cpp:18-23)
        touched = arena.cars.ball_hit_valid & (
            arena.cars.ball_hit_tick >= arena.tick_count - cfg.tick_skip)

        # Events
        tracker, ev = eventsmod.update_tracker(
            state.tracker, arena.cars, arena.ball, self.teams,
            arena.tick_count, arena.goal_scored, cfg.tick_skip,
            self.params.mutators, self.event_config)
        ev = dict(ev)
        ev["bump"] = arena.step_bump
        ev["bumped"] = arena.step_bumped
        ev["demo"] = arena.step_demo
        ev["demoed"] = arena.step_demoed

        steps_since_touch = jnp.where(jnp.any(touched), 0,
                                      state.steps_since_touch + 1)
        steps_since_reset = state.steps_since_reset + 1

        # Episode score counters (team from ball y, like the reference's
        # ScoreLimitCondition/LosingPenaltyReward in ExampleMain.cpp:46-124;
        # counts every goalScored step, including repeats while the ball
        # sits in the net — faithful to the positional IsBallScored)
        blue_inc = arena.goal_scored & (arena.ball.pos[1] > 0)
        orange_inc = arena.goal_scored & ~(arena.ball.pos[1] > 0)
        blue_score = state.blue_score + blue_inc.astype(jnp.int32)
        orange_score = state.orange_score + orange_inc.astype(jnp.int32)

        tctx = TerminalCtx(goal_scored=arena.goal_scored,
                           steps_since_touch=steps_since_touch,
                           steps_since_reset=steps_since_reset,
                           blue_score=blue_score,
                           orange_score=orange_score)
        terminal_type = self.terminal_fn(tctx)

        rctx = RewardCtx(
            cars=arena.cars, prev_cars=prev_arena.cars,
            ball=arena.ball, prev_ball=prev_arena.ball,
            teams=self.teams, ball_touched_step=touched,
            goal_scored=arena.goal_scored, has_prev=state.has_prev,
            is_final=terminal_type, events=ev,
            blue_score=blue_score, orange_score=orange_score)
        reward, reward_components = self.reward_combined(rctx)

        next_state = EnvState(
            phys=phys, prev_arena=arena,
            has_prev=jnp.ones((), bool),
            prev_actions=controls,
            steps_since_touch=steps_since_touch,
            steps_since_reset=steps_since_reset,
            blue_score=blue_score, orange_score=orange_score,
            tracker=tracker, key=key)

        final_obs = self._obs_one(next_state)

        # Auto-reset on terminal (EnvSet::Reset semantics)
        reset_state = self._reset_one(kreset)
        is_terminal = terminal_type != terminals.NOT_TERMINAL

        def _sel(r, n):
            return jnp.where(jnp.reshape(is_terminal, (1,) * n.ndim), r, n)

        next_state = jax.tree.map(_sel, reset_state, next_state)

        obs = self._obs_one(next_state)
        mask = self._mask_one(next_state)

        out = StepOutput(
            obs=obs, final_obs=final_obs, reward=reward,
            terminal_type=terminal_type, action_mask=mask,
            ball_touched=touched, goal_scored=arena.goal_scored,
            reward_components=reward_components)
        return next_state, out

    # --- vectorized public API --------------------------------------------

    def reset(self, key) -> tuple[EnvState, jnp.ndarray, jnp.ndarray]:
        """Returns (states, obs (N,P,D), masks (N,P,A))."""
        keys = jax.random.split(key, self.config.num_envs)
        states = jax.vmap(self._reset_one)(keys)
        # Strip weak_type from every leaf: step() outputs are strongly
        # typed, and a weak-typed leaf here would make the first
        # post-reset jit signature differ from the steady-state one,
        # silently recompiling the (expensive) train iteration once.
        states = jax.tree.map(
            lambda a: a.astype(a.dtype) if isinstance(a, jnp.ndarray) else a,
            states)
        obs = jax.vmap(self._obs_one)(states)
        masks = jax.vmap(self._mask_one)(states)
        return states, obs, masks

    def _use_pallas(self) -> bool:
        b = self.config.physics_backend
        if self.config.game_mode not in ("soccar", "heatseeker",
                                         "snowday"):
            return False
        if self.params.use_mesh and not worldmod.is_procedural():
            return False  # real .cmf assets: XLA grid path only
        if b == "auto":
            try:
                plat = jax.devices()[0].platform
            except Exception:
                plat = "cpu"
            return plat not in ("cpu",)
        return b == "pallas"

    def _step_pallas(self, states: EnvState, action_idx: jnp.ndarray
                     ) -> tuple[EnvState, StepOutput]:
        """Batched step with the physics advance as one Pallas megakernel;
        pre/post processing stays vmapped XLA."""
        from reinforcement_learning_tpu.ops import pallas_step

        cfg = self.config
        P = cfg.cars_per_arena
        ks = jax.vmap(lambda k: jax.random.split(k, 3))(states.key)
        key, kstep, kreset = ks[:, 0], ks[:, 1], ks[:, 2]
        controls = jax.vmap(self.action_parser.parse)(action_idx)
        respawn_idx = jax.vmap(
            lambda k: jax.random.randint(
                k, (P,), 0, C.CAR_RESPAWN_LOCATION_AMOUNT))(kstep)
        interpret = jax.devices()[0].platform == "cpu"
        phys = pallas_step.pallas_arena_step(
            states.phys, controls, respawn_idx,
            params=self.params, teams=tuple(int(t) for t in self.teams_np),
            tick_skip=cfg.tick_skip, action_delay=cfg.action_delay,
            interpret=interpret)
        return jax.vmap(self._post_physics_one)(states, phys, controls,
                                                key, kreset)

    def step(self, states: EnvState, action_idx: jnp.ndarray
             ) -> tuple[EnvState, StepOutput]:
        """action_idx: (N, P) int32.  Returns batched (states, StepOutput)."""
        if self._use_pallas():
            return self._step_pallas(states, action_idx)
        return jax.vmap(self._step_one)(states, action_idx)
